"""Corpus-statistics text scoring: TF-IDF keywords, unigram log-prob.

Extension beyond reference parity (the reference has no text analytics;
SURVEY.md §7.1 step 6): per-document characteristic terms are a standard
feature for corpus curation — topical clustering, boilerplate spotting,
searchable doc summaries.

Scale design (100 TB corpus):

* one explode + groupBy for term frequencies — map-side partial
  aggregation absorbs the token explosion before the shuffle;
* document frequencies derive from the tf frame (already distinct
  (doc, term)), so no second pass over raw text;
* the tf x df join is keyed on term; both sides exit their aggregations
  hash-partitioned by compatible keys and AQE coalesces; the corpus
  document count joins as a 1-row broadcast (no driver collect);
* top-k per doc is a single window over the scored frame — rank data
  never leaves its doc partition.

Numeric parity: score = tf * (ln((N+1)/(df+1)) + 1) rounded to 6 dp.
The ratio is an exact IEEE division of integers on both engines; ln is
within 1 ulp across libms, far below the rounding grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import segment_unsegmented, tokens


def tfidf_topk_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    script_aware: bool = False,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF.

    Returns ``(doc_id, term, tf, score, rank)``; terms are lowercased
    whitespace tokens; ties break lexically. Documents with no tokens
    produce no rows.  ``script_aware=True`` (r12) char-tokenizes
    unsegmented-script runs first (:func:`segment_unsegmented`) so a
    CJK document yields per-character terms instead of one giant
    token; Latin text is byte-identical either way.
    """
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    docs = df.select(F.col(id_col).alias("doc_id"), low.alias("__t"))
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("__t"))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = df.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))

    # df_t via a count window over the term partition (round 13): the
    # former groupBy+join shape re-ran the whole tf aggregation subtree
    # for the dfreq side and paid a second term-keyed exchange; the
    # window computes identical values off one exchange of the
    # (already doc+term-aggregated, so partial-agg concerns don't
    # apply) tf frame.  A/B at sf0.1: 0.68 -> 0.66 s, one less
    # exchange and no tf recompute.
    scored = (
        tf.withColumn(
            "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1))
                        / (F.col("df_t") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the classic cheap LM quality proxy: docs
    dominated by rare tokens (OCR noise, codes, lorem) score very
    negative; docs of common words score near the corpus mode.

    Returns ``(doc_id, n_tokens, avg_logprob)``; docs with no tokens
    are omitted. ``avg_logprob = avg(ln(count(t)/total_tokens))``
    rounded to 4 dp (cross-engine double-summation drift is ~1e-13,
    far below the grid).

    Same two-aggregation shape as :func:`tfidf_topk_terms`: token
    explosion absorbed by map-side partial counts, corpus totals as a
    1-row broadcast, term-count join keyed on term.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    # groupBy+join deliberately (round 13 A/B): a count window over the
    # term partition exchanges the FULL token stream with no map-side
    # partial aggregation (0.37 -> 0.45 s at sf0.1); the groupBy
    # compresses tokens to distinct terms before both exchanges
    term_counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    totals = toks.agg(F.count(F.lit(1)).alias("total"))
    return (
        toks.join(term_counts, on="term")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("cnt") / F.col("total"))), 4
            ).alias("avg_logprob"),
        )
    )


def vocab_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Corpus vocabulary report: the ``top_n`` most frequent terms as
    ``(term, cnt, doc_freq, rank)`` — the first look at any new corpus
    (tokenizer sanity, boilerplate spotting, stop-word selection).

    One explode + one groupBy computing both counts (map-side partial);
    the global order runs on the aggregated vocabulary, not the data.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    counts = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    top = counts.orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    ).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "term", "cnt", "doc_freq", "rank"
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram log-probability
    ``avg(ln(C(prev,cur) / C(prev)))`` under the corpus's own bigram
    counts — one step up from :func:`unigram_logprob`: word-salad text
    (right words, wrong order) scores near the unigram floor while
    natural word order scores higher. Docs need >= 2 tokens to appear.

    Shape: ``posexplode`` keeps token order; the per-doc ``lag`` window
    builds bigrams with ONE shuffle on doc_id; bigram and unigram
    context counts are two aggregations joined back on their keys.
    Rounded to 4 dp (summation-order drift ~1e-13).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "term"),
    ).filter(F.col("term") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = (
        toks.withColumn("prev", F.lag("term").over(w))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", F.col("term").alias("cur"))
    )
    # groupBy+join-back deliberately (round 13 A/B): count windows over
    # (prev,cur)/(prev) exchange the full bigram stream twice with no
    # partial aggregation (0.58 -> 0.69 s at sf0.1); the groupBys
    # shuffle only aggregated counts even though the bigram subtree is
    # recomputed per side.
    big_counts = bigrams.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("big_cnt")
    )
    # context count = occurrences of `prev` with a successor (so that
    # sum over cur of P(cur|prev) == 1 within the corpus)
    ctx_counts = bigrams.groupBy("prev").agg(
        F.count(F.lit(1)).alias("ctx_cnt")
    )
    return (
        bigrams.join(big_counts, on=["prev", "cur"])
        .join(ctx_counts, on="prev")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("big_cnt") / F.col("ctx_cnt"))), 4
            ).alias("avg_logprob"),
        )
    )


def hashing_vectorize(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    portable: bool = True,
) -> DataFrame:
    """Hashing-trick bag-of-words featurizer: each token maps to bucket
    ``base_hash31(term) % dim``; output is a dense ``array<double>``
    count vector per document — text becomes an embedding column
    WITHOUT any model, ready for the cosine ANN / near-dup operators
    (cheap content-similarity joins over raw text).

    Pure expressions end-to-end: explode -> two-level groupBy (map-side
    partial counts) -> map lookup against a ``sequence`` — no UDF, no
    vocabulary broadcast (the hash IS the vocabulary). ``portable=True``
    uses the md5-based hash (cross-engine reproducible), ``False`` the
    faster xxhash64.

    Returns ``(doc_id, features)``; docs with no tokens are omitted.
    """
    from ..functions.hashing import base_hash31

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    ).filter(F.col("term") != "")
    bucketed = toks.select(
        "doc_id", (base_hash31(F.col("term"), portable=portable) % dim).cast("int").alias("bucket")
    )
    counts = bucketed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    as_map = counts.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "cnt"))
        ).alias("__m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("__m"), i.cast("int")), F.lit(0)
        ).cast("double"),
    )
    return as_map.select("doc_id", vec.alias("features"))


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    script_aware: bool = False,
) -> DataFrame:
    """BM25 ranking of documents against a bag of query terms
    (Robertson-Sparck Jones; the standard retrieval baseline).

    Returns the top ``k`` ``(doc_id, score, rank)`` rows with
    ``score = sum over query terms of idf(t) * tf*(k1+1) /
    (tf + k1*(1 - b + b*len/avglen))`` and
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Scale shape: term frequencies aggregate once (partial-agg groupBy on
    (doc, term)), document stats ride the same pass, the query-term
    filter prunes the tf frame BEFORE any join, and the corpus constants
    (N, avglen, per-term df) are broadcast.  Ties break by doc id.

    ``script_aware=True`` (r12): unsegmented-script runs are
    char-tokenized on BOTH sides — document text via
    :func:`segment_unsegmented` and the query terms via the identical
    Python regex — so a query like 机器学习 matches documents
    containing those characters instead of requiring the whole page as
    one term.  Latin queries/corpora are byte-identical either way.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    if script_aware:
        import re as _re

        from ..functions.text import UNSEGMENTED_CLASS

        unseg_re = _re.compile("(" + UNSEGMENTED_CLASS + ")")
        terms = [
            w for t in terms for w in unseg_re.sub(r" \1 ", t).split() if w
        ]
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    docs = df.select(F.col(id_col).alias("doc_id"), low.alias("__t"))
    toks = docs.select(
        "doc_id", F.explode(tokens(F.col("__t"))).alias("term")
    ).filter(F.col("term") != "")
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    consts = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    per_term = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(doclen, on="doc_id")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            (idf * F.col("tf") * F.lit(k1 + 1.0) / norm).alias("__s"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(F.round(F.sum("__s"), 6).alias("score"))
    # global top-k via TakeOrderedAndProject (distributed per-partition
    # top-k + driver merge), NOT an empty-partition window — an unkeyed
    # row_number() would drag every scored doc through one partition
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.partitionBy().orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "score", "rank"
    )


def oov_rate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
    script_aware: bool = False,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` terms.

    The tokenizer-coverage QA step of a training pipeline: documents
    whose tokens largely miss the (frequency-ranked) vocabulary are
    encoding junk, foreign-script spills, or OCR noise — and a planned
    tokenizer/vocab budget can be validated by sweeping ``vocab_size``.

    Returns ``(doc_id, n_tokens, n_oov, oov_rate)`` with the rate
    rounded to 6 dp; vocabulary ties at the frequency boundary break
    lexically (deterministic on any engine). Token-less documents get
    rate 0.0.

    Scale: one explode + map-side-combined count builds term
    frequencies; the vocabulary is ``vocab_size`` rows (broadcast into
    the membership join); the per-doc aggregate is one keyed shuffle of
    ``(doc, term, count)`` partials — raw text is scanned once.
    ``script_aware=True`` (r12) char-tokenizes unsegmented-script runs
    first, so a CJK share contributes per-character terms to the vocab
    instead of one always-OOV token per page; Latin unchanged.
    """
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(low)).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n"))
    freq = counts.groupBy("term").agg(F.sum("n").alias("tot"))
    wv = Window.orderBy(F.col("tot").desc(), F.col("term").asc())
    vocab = (
        freq.withColumn("__r", F.row_number().over(wv))
        .filter(F.col("__r") <= vocab_size)
        .select("term")
    )
    flagged = counts.join(
        F.broadcast(vocab.withColumn("__in", F.lit(1))), on="term", how="left"
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__in").isNull(), F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_oov"),
    )
    base = df.select(F.col(id_col).alias("doc_id"))
    return (
        base.join(per_doc, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.round(
                F.coalesce(F.col("n_oov"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )

"""Corpus-level n-gram statistics: frequent-phrase mining and novelty.

Extension beyond reference parity (the reference has no text analytics;
see ``SURVEY.md`` §2 extension table). Two curation signals every large
training-data pipeline wants:

* ``topk_ngrams`` — the most frequent word n-grams corpus-wide.
  Boilerplate discovery: the top of this list at web scale is cookie
  banners, nav chrome, and license headers — exactly what
  ``strip_boilerplate`` should be fed.
* ``ngram_novelty`` — per document, the fraction of its distinct
  n-grams whose FIRST corpus occurrence (min doc id) is this document.
  Low novelty ⇒ the document is re-assembled from phrases the corpus
  already contains (template spam, near-dup tails that survived
  fingerprint dedup).

Scale design (100 TB):

* Both operators explode to ``(doc, gram)`` and aggregate per
  ``(doc, gram)`` FIRST — a hash aggregate whose map-side partial
  combine collapses within-document repeats before anything shuffles,
  so the exchange carries ~(distinct grams per doc) narrow rows, never
  one row per token occurrence.
* ``topk_ngrams`` then re-aggregates by gram (second narrow exchange)
  and finishes with ``orderBy().limit(k)`` — Spark plans that as
  ``TakeOrderedAndProject``: each task keeps a k-row heap, the driver
  merges ``numPartitions × k`` rows; no global sort materializes.
* ``ngram_novelty`` deliberately avoids a ``PARTITION BY gram`` window:
  token grams are Zipf-distributed, and a sort-window puts a hot gram's
  every occurrence into ONE task — a guaranteed straggler at corpus
  scale. Instead it composes only *algebraic aggregates* (``min``,
  ``count``), which Spark partially aggregates map-side, so a
  billion-document stop-gram collapses to one row per input partition
  before it ever shuffles:
  - unbounded path: gram stats ``(first_doc, df)`` via groupBy(gram),
    then ``novel_grams = stats.groupBy(first_doc).count()`` — the
    argmin count needs NO join back to the exploded frame at all;
  - df-bounded path: the per-doc side must know each gram's ``df``, so
    it joins ``(doc, gram)`` against the stats frame — an equi-join
    AQE can skew-split, unlike a window sort.
* Everything is built-in hash aggregates + whole-stage codegen; zero
  Python, exact counts, so a SQL oracle reproduces the output
  bit-for-bit. ``min_doc_freq``/``max_doc_freq`` drop the stop-gram
  head (novelty of "of the" carries no signal anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import segment_unsegmented, tokens, word_ngrams

__all__ = ["topk_ngrams", "ngram_novelty", "pmi_collocations"]


def _doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int,
    script_aware: bool = False,
) -> DataFrame:
    """Distinct ``(id, gram)`` pairs with per-doc occurrence counts.

    One explode + one hash aggregate; the map-side partial combine
    collapses repeats before the shuffle.

    The token array is materialized as a projection FIRST: inside
    ``word_ngrams``'s per-gram lambda the token expression is a free
    variable, and Spark inlines free variables — handing it the raw
    ``split(...)`` would re-tokenize the document once per gram
    (~150× per doc). A bound column reference makes it one split per
    row.
    """
    low = F.lower(F.col(text_col))
    if script_aware:
        # r12: char-tokenize unsegmented-script runs (a CJK doc is
        # otherwise ~1 token and produces no n-grams at all)
        low = segment_unsegmented(low)
    toked = df.select(F.col(id_col), tokens(low).alias("__toks"))
    grams = word_ngrams(F.col("__toks"), n)
    return (
        toked.select(F.col(id_col), F.explode(grams).alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).alias("__occ"))
    )


def topk_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    k: int = 100,
    script_aware: bool = False,
) -> DataFrame:
    """Top-``k`` word ``n``-grams corpus-wide.

    Returns ``(gram, doc_freq, total_count, rank)`` ordered by
    ``total_count`` desc with the gram string as deterministic
    tiebreak. ``doc_freq`` is the number of distinct documents
    containing the gram; ``total_count`` counts every occurrence.
    """
    per_doc = _doc_grams(df, id_col, text_col, n, script_aware)
    totals = per_doc.groupBy("gram").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("__occ").alias("total_count"),
    )
    w = Window.orderBy(F.col("total_count").desc(), F.col("gram"))
    # limit-first keeps the rank window on k rows, not the whole vocab;
    # TakeOrderedAndProject does the heavy lifting distributed
    return (
        totals.orderBy(F.col("total_count").desc(), F.col("gram"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    min_doc_freq: int = 1,
    max_doc_freq: int | None = None,
    script_aware: bool = False,
) -> DataFrame:
    """Per-document n-gram novelty against the corpus.

    A gram is *novel to* a document when the document's id equals the
    corpus-wide minimum id over all documents containing that gram —
    i.e. reading the corpus in id order, this document introduced the
    phrase. Returns ``(id, n_grams, novel_grams, novelty)`` where
    ``novelty = novel_grams / n_grams`` rounded to 6 dp; documents with
    no grams (fewer than ``n`` tokens) are absent.

    ``min_doc_freq``/``max_doc_freq`` bound which grams participate
    (both sides of the ratio): drop hapax noise with the former, the
    stop-gram head with the latter.
    """
    per_doc = _doc_grams(
        df, id_col, text_col, n, script_aware
    ).select(id_col, "gram")
    stats = per_doc.groupBy("gram").agg(
        F.min(id_col).alias("__first"), F.count(F.lit(1)).alias("__df")
    )
    bounded = min_doc_freq > 1 or max_doc_freq is not None
    if bounded:
        if min_doc_freq > 1:
            stats = stats.filter(F.col("__df") >= min_doc_freq)
        if max_doc_freq is not None:
            stats = stats.filter(F.col("__df") <= max_doc_freq)
        # the per-doc side needs each gram's df -> equi-join (AQE can
        # skew-split a hot gram here; a window sort could not)
        flagged = per_doc.join(stats, "gram")
        novel = F.when(F.col(id_col) == F.col("__first"), 1).otherwise(0)
        return flagged.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("novel_grams"),
            F.round(F.sum(novel).cast("double") / F.count(F.lit(1)), 6).alias(
                "novelty"
            ),
        )
    # unbounded: both sides reduce to per-doc aggregates — no join back
    # to the exploded frame, every aggregate partial-combines map-side
    totals = per_doc.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    firsts = stats.groupBy(F.col("__first").alias(id_col)).agg(
        F.count(F.lit(1)).alias("__novel")
    )
    novel_col = F.coalesce(F.col("__novel"), F.lit(0)).cast("long")
    return totals.join(firsts, id_col, "left").select(
        F.col(id_col),
        F.col("n_grams"),
        novel_col.alias("novel_grams"),
        F.round(novel_col.cast("double") / F.col("n_grams"), 6).alias("novelty"),
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 100,
    min_count: int = 5,
) -> DataFrame:
    """Top-``k`` collocations (statistically associated word pairs) by
    normalized pointwise mutual information.

    For adjacent word pair (a, b)::

        pmi  = ln( p(a,b) / (p(a) * p(b)) )
        npmi = pmi / -ln(p(a,b))            in (-1, 1], 1 = always together

    where p(a,b) is the bigram's share of all bigram occurrences and
    p(a), p(b) are unigram shares. High-NPMI pairs are multi-word
    expressions ("new york", "machine learning") — input for tokenizer
    vocabulary design and phrase-aware dedup; ``min_count`` suppresses
    the hapax noise NPMI is infamous for.

    Returns ``(gram, pair_count, pmi, npmi, rank)`` ordered by rounded
    NPMI desc (gram string as deterministic tiebreak — ordering on the
    ROUNDED value keeps the top-k cut reproducible across engines).

    Scale: two corpus passes (unigram counts, bigram counts), each a
    single explode + map-side-combined hash aggregate; both count
    frames are vocabulary-sized and ``localCheckpoint``-ed so the
    totals aggregate and the two count joins don't re-scan the corpus.
    The final top-k is ``orderBy().limit(k)`` — TakeOrderedAndProject,
    no global sort.
    """
    toked = df.select(tokens(F.lower(F.col(text_col))).alias("__toks"))
    uni = (
        toked.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint(eager=True)
    )
    bi = (
        toked.select(F.explode(word_ngrams(F.col("__toks"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .localCheckpoint(eager=True)
    )
    n1 = uni.agg(F.sum("__c").alias("__n1"))
    n2 = bi.agg(F.sum("pair_count").alias("__n2"))
    cand = (
        bi.filter(F.col("pair_count") >= min_count)
        .withColumn("__w1", F.element_at(F.split("gram", " "), 1))
        .withColumn("__w2", F.element_at(F.split("gram", " "), 2))
    )
    scored = (
        cand.join(uni.select(F.col("w").alias("__w1"), F.col("__c").alias("__c1")), "__w1")
        .join(uni.select(F.col("w").alias("__w2"), F.col("__c").alias("__c2")), "__w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    p_ab = F.col("pair_count").cast("double") / F.col("__n2").cast("double")
    p_a = F.col("__c1").cast("double") / F.col("__n1").cast("double")
    p_b = F.col("__c2").cast("double") / F.col("__n1").cast("double")
    pmi = F.log(p_ab / (p_a * p_b))
    npmi = pmi / -F.log(p_ab)
    out = scored.select(
        "gram",
        "pair_count",
        F.round(pmi, 6).alias("pmi"),
        F.round(npmi, 6).alias("npmi"),
    )
    w = Window.orderBy(F.col("npmi").desc(), F.col("gram"))
    return (
        out.orderBy(F.col("npmi").desc(), F.col("gram"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )

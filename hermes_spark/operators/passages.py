"""Passage-level dedup and benchmark decontamination.

Training-data curation operators beyond whole-document dedup (the
reference's comparison kernel has no sub-document notion at all; its only
duplicate machinery is the keyed duplicate gate,
``datasetComparison/.../DatasetComparator.scala:278-289``):

* **Passage-level dedup** (RefinedWeb/CCNet-style span dedup): split each
  document into non-overlapping ``window``-word passages, hash each, and
  measure per-document how much of it is duplicated *anywhere else in the
  corpus*. Catches boilerplate shared across otherwise-distinct pages
  that document-level fingerprints miss.
* **Benchmark decontamination** (GPT-3 appendix-C style): flag corpus
  documents sharing any word ``n``-gram with a benchmark/eval set, so
  eval data can be held out of training.

Scale design (100 TB):

* ``passage_hashes`` is map-side only — tokenize/chunk/hash inside one
  projection, no shuffle; ~(8 B id + 16 B hash) per passage leaves the
  scan.
* ``duplicate_passage_stats`` shuffles those narrow (id, hash) rows
  twice: once partitioned by hash (corpus-wide occurrence counts via a
  window aggregate — a map-side-combinable count), once by doc id for the
  per-document rollup. The document *text* never shuffles.
* ``decontaminate`` never shuffles the corpus n-grams against each other:
  the benchmark side is aggregated to a distinct 8-byte-hash set and
  broadcast; corpus grams stream through a broadcast-hash semi-join and
  only the (rare) hits reach the per-doc aggregation. Benchmark sets are
  small (10^3–10^6 grams) by construction — that is what makes the
  broadcast valid at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64
from ..functions.text import segment_unsegmented, tokens, word_ngrams


def passage_chunks(col: Column, window: int = 16) -> Column:
    """Non-overlapping ``window``-word chunks of lowercased text, as
    ``array<string>``; the final chunk may be shorter. Empty text yields
    an empty array. SQL-portable (DuckDB: slice ``t[i*w+1:(i+1)*w]`` over
    ``range(0, ceil(len(t)/w))``)."""
    from ..functions.text import bind_once

    def chunks(toks: Column) -> Column:
        n_chunks = F.ceil(F.size(toks) / F.lit(float(window))).cast("int")
        return F.when(
            F.size(toks) == 0, F.array().cast("array<string>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * window + 1, window)),
            )
        )

    # bind the token array once — the slice in the lambda would
    # otherwise inline and re-run the split per chunk
    return bind_once(tokens(F.lower(col)), chunks)


def passage_hashes(
    df: DataFrame, id_col: str, text_col: str, window: int = 16
) -> DataFrame:
    """One row per passage: ``(id, passage_idx, passage_hash)``.

    ``passage_hash`` is the md5 hex of the space-joined chunk (portable:
    identical in any engine with md5). Documents with no tokens emit no
    rows. Map-side only — no shuffle.
    """
    return (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col),
            F.posexplode(passage_chunks(F.col(text_col), window)).alias(
                "passage_idx", "__chunk"
            ),
        )
        .select(
            id_col,
            F.col("passage_idx").cast("long").alias("passage_idx"),
            F.md5(F.col("__chunk")).alias("passage_hash"),
        )
    )


def duplicate_passage_stats(
    df: DataFrame, id_col: str, text_col: str, window: int = 16
) -> DataFrame:
    """Per-document duplicated-passage profile against the whole corpus.

    Returns ``(id, n_passages, n_dup_passages, dup_fraction)`` where a
    passage is *duplicated* when its hash occurs in more than one passage
    corpus-wide (including elsewhere in the same document). Documents
    whose ``dup_fraction`` is high are near-copies or heavy boilerplate
    even when their document-level fingerprint is unique.
    """
    hashes = passage_hashes(df, id_col, text_col, window)
    from pyspark.sql import Window

    w = Window.partitionBy("passage_hash")
    counted = hashes.withColumn("__occ", F.count(F.lit(1)).over(w))
    return counted.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.when(F.col("__occ") > 1, 1).otherwise(0)).alias("n_dup_passages"),
        F.round(
            F.sum(F.when(F.col("__occ") > 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_fraction"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    bench_text_col: str | None = None,
    broadcast: bool = True,
    script_aware: bool = False,
) -> DataFrame:
    """Flag corpus documents sharing any word ``n``-gram with the
    benchmark set.

    Returns every corpus row's id plus ``n_contaminated_grams`` (distinct
    benchmark n-grams present in the doc) and ``contaminated`` (bool).
    Documents shorter than ``n`` words have no n-grams and are never
    flagged.

    Grams are compared by :func:`portable_hash64` (8-byte keys — both the
    broadcast set and the join run on longs, not strings; the same hash
    is computable in the DuckDB oracle).

    ``broadcast=True`` (default) ships the distinct benchmark-gram hash
    set to every executor — right for eval suites (10^3–10^6 grams).
    ``broadcast=False`` switches the probe to a hash-partitioned shuffle
    join for DECONTAMINATE-AGAINST-CORPUS jobs where the "benchmark"
    side is itself web-scale (e.g. held-out shard vs training shard):
    both sides exchange only 8-byte gram keys, never text, and Spark's
    AQE still downgrades to broadcast when the aggregated set turns out
    small. Results are identical either way.

    ``script_aware=True`` (round 11) segments Han/Kana/Thai text per
    character on BOTH sides, so contamination from unsegmented-script
    benchmarks (a CJK eval suite) is caught as character n-grams —
    without it such docs are one "word" and never match.
    """
    bench_text = bench_text_col or text_col

    def gram_rows(df: DataFrame, text: str, *keep: str) -> DataFrame:
        # materialize the token array in its own projection first: the
        # n-gram transform references it per element, and a lambda body
        # re-evaluates free variables — against a real column that is an
        # attribute read, against an inline expression it would re-run
        # the regex split per gram
        low = F.lower(F.col(text))
        if script_aware:
            low = segment_unsegmented(low)
        toked = df.select(
            *[F.col(c) for c in keep],
            tokens(low).alias("__toks"),
        )
        return toked.select(
            *keep,
            F.explode(
                F.transform(
                    F.array_distinct(word_ngrams(F.col("__toks"), n)),
                    lambda g: portable_hash64(g),
                )
            ).alias("__gram_h"),
        )

    bench_set = gram_rows(benchmark, bench_text).distinct()
    if broadcast:
        bench_set = F.broadcast(bench_set)
    corpus_grams = gram_rows(corpus, text_col, id_col)
    hits = (
        corpus_grams.join(bench_set, "__gram_h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )

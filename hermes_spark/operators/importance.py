"""DSIR-style importance weighting of a raw corpus against a target.

Extension beyond reference parity (see ``SURVEY.md`` §2 extension
table). Data Selection via Importance Resampling (Xie et al., 2023,
arXiv:2302.03169): estimate how target-like each raw document is with a
bag-of-hashed-ngrams bigram-of-words model — here hashed unigrams —
and weight each document by the log-likelihood ratio

    log w(x) = Σ_tokens  [ log p_target(bucket) − log p_raw(bucket) ]

with add-α smoothing over ``B`` hash buckets. Documents scoring high
look like the target distribution (e.g. curated prose); resampling the
raw corpus by ``softmax``-ish weights yields a target-shaped subset.

Scale design (100 TB raw corpus, small-to-any-size target):

* Token features hash into ``B`` buckets (default 4096) with the
  engine-portable md5 hash (``functions/hashing.py``), so the
  *model* is two B-row tables no matter how large either corpus is.
* The raw corpus is tokenized + hashed ONCE: scoring explodes it to
  per-``(id, bucket)`` counts (map-side combine), and the raw-corpus
  model is derived from that same aggregate — persisted narrow
  (lambda-bearing plans defeat exchange reuse), never re-scanned. The
  target aggregates its own ≤B-row ``(bucket, count)`` table. The two
  distributions
  full-outer-join into a single λ(bucket) table of ≤B rows; corpus
  totals attach via a 1-row cross join (all auto-broadcast).
* Scoring is then a **broadcast** join of the per-doc counts against
  the λ table and one groupBy(id) sum. One real shuffle end to end on
  the big side.
* Zero Python, exact integer counts + double log arithmetic →
  SQL-oracle reproducible at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import fast_hash64, portable_hash64
from ..functions.text import segment_unsegmented, tokens

__all__ = ["token_buckets", "bucket_distribution", "dsir_weights"]


def token_buckets(
    text_col: Column, buckets: int, portable: bool = True,
    script_aware: bool = False,
) -> Column:
    """``array<long>`` of hashed-unigram bucket ids (one per token
    occurrence, order preserved).  ``script_aware=True`` (r12)
    char-tokenizes unsegmented-script runs first, so DSIR's hashed
    unigram model sees CJK characters instead of one whole-page token;
    Latin identical either way."""
    low = F.lower(text_col)
    if script_aware:
        low = segment_unsegmented(low)
    toks = tokens(low)
    if portable:
        h = lambda t: portable_hash64(F.concat(F.lit("dsir:"), t))  # noqa: E731
    else:
        h = lambda t: F.abs(fast_hash64(t, seed=0x5D51))  # noqa: E731
    return F.transform(toks, lambda t: h(t) % buckets)


def bucket_distribution(
    df: DataFrame, text_col: str, buckets: int, portable: bool = True,
    script_aware: bool = False,
) -> DataFrame:
    """``(bucket, cnt)`` occurrence counts over a corpus — the hashed
    unigram model, ≤``buckets`` rows regardless of corpus size."""
    return (
        df.select(
            F.explode(
                token_buckets(F.col(text_col), buckets, portable, script_aware)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    buckets: int = 4096,
    alpha: float = 0.5,
    portable: bool = True,
    cache_doc_buckets: bool = True,
    script_aware: bool = False,
) -> DataFrame:
    """Per-document log importance weight of ``raw`` against ``target``.

    Returns ``(id, n_tokens, log_weight)`` with ``log_weight`` rounded
    to 6 dp; empty documents score 0.0 with ``n_tokens = 0`` only if
    they tokenize to nothing (they are still returned). Smoothed
    probabilities use ``(cnt + alpha) / (total + alpha * buckets)`` so
    buckets unseen in either corpus stay finite.

    ``cache_doc_buckets`` (default on) persists the per-``(doc,
    bucket)`` count frame (MEMORY_AND_DISK) because it feeds BOTH the
    raw-corpus model and the scoring join and Spark cannot
    exchange-reuse lambda-bearing subtrees; pass ``False`` to trade one
    extra tokenize+hash scan for zero cache footprint, and
    ``spark.catalog.clearCache()`` to drop the block eagerly.
    ``script_aware`` char-tokenizes unsegmented-script runs on BOTH
    corpora (r12 — see :func:`token_buckets`).
    """
    t_dist = bucket_distribution(target, text_col, buckets, portable, script_aware)

    doc_buckets = (
        raw.select(
            F.col(id_col),
            F.explode_outer(
                token_buckets(F.col(text_col), buckets, portable, script_aware)
            ).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("__occ"))
    )
    # Derive the raw-corpus model FROM the per-doc aggregate instead of
    # re-tokenizing + re-hashing the whole corpus a second time. Plan
    # reuse alone cannot dedupe the subtree (lambda-bearing expressions
    # defeat Catalyst canonicalization, so ReuseExchange never fires) —
    # persist the narrow (id, bucket, occ) frame, which is ~20 B/row
    # versus re-scanning and re-hashing every token of the corpus.
    if cache_doc_buckets:
        from pyspark import StorageLevel

        doc_buckets = doc_buckets.persist(StorageLevel.MEMORY_AND_DISK)
    r_dist = (
        doc_buckets.filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.sum("__occ").alias("cnt"))
    )
    t_tot = t_dist.agg(F.sum("cnt").alias("__t_total"))
    r_tot = r_dist.agg(F.sum("cnt").alias("__r_total"))

    lam = (
        t_dist.withColumnRenamed("cnt", "__t_cnt")
        .join(r_dist.withColumnRenamed("cnt", "__r_cnt"), "bucket", "full_outer")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("__t_cnt"), F.lit(0)) + alpha)
                    / (F.col("__t_total") + alpha * buckets)
                )
                - F.log(
                    (F.coalesce(F.col("__r_cnt"), F.lit(0)) + alpha)
                    / (F.col("__r_total") + alpha * buckets)
                )
            ).alias("__lam"),
        )
    )

    scored = doc_buckets.join(F.broadcast(lam), "bucket", "left").groupBy(id_col).agg(
        F.sum(F.when(F.col("bucket").isNull(), 0).otherwise(F.col("__occ"))).alias(
            "n_tokens"
        ),
        F.round(
            F.coalesce(F.sum(F.col("__occ") * F.col("__lam")), F.lit(0.0)), 6
        ).alias("log_weight"),
    )
    return scored

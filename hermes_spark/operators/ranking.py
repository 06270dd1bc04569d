"""Retrieval-quality evaluation: recall@k, MRR, nDCG@k.

Extension beyond reference parity (the reference has no retrieval
surface; see ``SURVEY.md`` §2 extension table). Closes the evaluation
loop for this package's retrieval stack: the ANN family
(``operators/similarity.py``), BM25 (``operators/tfidf.py``) and RRF
fusion (``operators/fusion.py``) produce rankings — this operator
scores them against a relevance set, which is how you pick nprobe /
num_planes / fusion weights on real data (``pick_nprobe`` tunes for
recall only; this gives the full metric set).

Scale design (100 TB corpus, top-k rankings):

* Inputs are top-k frames: O(queries x k) rows regardless of corpus
  size. One left join on (query, item) + one aggregation per query —
  both shuffles carry k rows per query at most.
* Engine-stable floats: DCG terms ``gain / log2(rank + 1)`` are
  quantized to a 1e-6 integer grid and summed as int64 (associative,
  partitioning- and engine-independent — the same trick as
  ``operators/logreg.py``), then the final nDCG is ONE double division
  of two exact integers, rounded to 6 dp. recall and MRR are single
  divisions of exact integers. Every output value is bit-identical
  across engines.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ranking_metrics"]

_SCALE = 1_000_000.0


def _dcg_term(rank_col):
    """1e-6-quantized binary-gain DCG term at ``rank`` (1-based)."""
    return F.round(F.lit(_SCALE) / F.log2(rank_col.cast("double") + 1.0)).cast(
        "long"
    )


def ranking_metrics(
    results: DataFrame,
    relevant: DataFrame,
    group_cols: Sequence[str] = ("query_id",),
    item_col: str = "item",
    rank_col: str = "rank",
    k: Optional[int] = None,
) -> DataFrame:
    """Per-query binary-relevance metrics of a ranking against a
    relevance set.

    ``results``: ``(*group_cols, item_col, rank_col)`` — 1-based ranks,
    ties broken upstream. ``relevant``: ``(*group_cols, item_col)`` —
    the relevant items per query (e.g. exact brute-force top-k as
    ground truth for an ANN index). ``k`` caps the ranking depth
    (default: use every row in ``results``).

    Returns one row per query:
    ``(*group_cols, n_relevant, n_retrieved, n_hit, recall_at_k,
    mrr, ndcg_at_k)`` where ``ndcg_at_k`` uses binary gains with
    ``IDCG = sum_{r=1..min(n_relevant, depth)} 1/log2(r+1)``; the join
    is FULL outer, so queries in ``relevant`` with no retrieved rows
    still appear (all-zero metrics) AND queries in ``results`` with no
    relevance judgments appear with ``n_relevant = 0`` (all-zero
    metrics) instead of being dropped. All floats are
    exact-integer-derived (see module docstring)."""
    g = list(group_cols)
    res = results.select(
        *g, F.col(item_col).alias("__item"), F.col(rank_col).cast("long").alias("__r")
    )
    if k is not None:
        res = res.filter(F.col("__r") <= k)
    rel = relevant.select(
        *g, F.col(item_col).alias("__item"), F.lit(1).alias("__rel")
    ).distinct()

    # per-query relevant counts (drives recall denominator and IDCG)
    rel_counts = rel.groupBy(*g).agg(F.count(F.lit(1)).alias("n_relevant"))

    joined = res.join(rel, [*g, "__item"], "left")
    hit = F.col("__rel").isNotNull()
    per_q = joined.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(hit.cast("long")).alias("n_hit"),
        F.min(F.when(hit, F.col("__r"))).alias("__first_hit"),
        F.sum(F.when(hit, _dcg_term(F.col("__r"))).otherwise(F.lit(0))).alias(
            "__dcg"
        ),
        F.max("__r").alias("__depth"),
    )

    # FULL outer: queries present only in ``relevant`` appear with
    # all-zero retrieval metrics, and queries present only in
    # ``results`` (no relevance judgments) appear with n_relevant = 0
    # rather than being silently dropped
    out = rel_counts.join(per_q, g, "full").withColumn(
        "n_relevant", F.coalesce(F.col("n_relevant"), F.lit(0))
    )
    # IDCG over min(n_relevant, depth) ideal positions — exact int64,
    # computed in-task from a generated sequence (no extra shuffle)
    ideal_n = F.least(
        F.col("n_relevant"), F.coalesce(F.col("__depth"), F.lit(0))
    ).cast("int")
    idcg = F.when(ideal_n <= 0, F.lit(0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), F.greatest(ideal_n, F.lit(1))),
            F.lit(0).cast("long"),
            lambda acc, r: acc + _dcg_term(r),
        )
    )
    return out.select(
        *g,
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.coalesce(F.col("n_retrieved"), F.lit(0)).cast("long").alias("n_retrieved"),
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.round(
            F.coalesce(F.col("n_hit"), F.lit(0))
            / F.greatest(F.col("n_relevant"), F.lit(1)).cast("double"),
            6,
        ).alias("recall_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("__first_hit"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.coalesce(F.col("__dcg"), F.lit(0))
            / F.greatest(idcg, F.lit(1)).cast("double"),
            6,
        ).alias("ndcg_at_k"),
    )

"""Reciprocal-rank fusion for hybrid retrieval.

Extension beyond reference parity (the reference has no retrieval
surface; see ``SURVEY.md`` §2 extension table). RRF (Cormack et al.,
SIGIR 2009) is the standard way to combine a lexical ranking (BM25)
with a semantic one (embedding cosine) without score calibration:

    rrf(d) = sum over rankings r of  w_r / (k + rank_r(d))

Only the *rank* of each item in each list matters, so wildly different
score scales fuse cleanly.

Scale design (100 TB corpus, per-query top-k inputs):

* The inputs are already-ranked top-k frames (BM25 / ANN operators in
  this package), so each ranking contributes at most ``k`` rows per
  query — the fusion works on O(queries x k) rows regardless of corpus
  size.
* One union + one hash aggregation on (group, item) + one bounded
  window per group for the fused rank. Spark 4 rewrites the
  ``row_number() <= k`` filter into a Partial/Final ``WindowGroupLimit``
  (map-side top-k pruning before the exchange), so the shuffle carries
  at most ``k`` rows per group per map task.
* Floating-point note: with exactly two rankings the fused score is a
  single IEEE addition (commutative, order-independent — bit-identical
  regardless of aggregation order). With three or more, aggregation
  order can perturb the last ulp; the 6-dp output round absorbs that in
  practice but is not an absolute guarantee (same caveat as
  ``operators/mmr.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rrf_fuse"]


def rrf_fuse(
    rankings: Sequence[DataFrame],
    item_col: str,
    rank_col: str = "rank",
    k: int = 60,
    weights: Optional[Sequence[float]] = None,
    group_cols: Optional[Sequence[str]] = None,
    top: Optional[int] = None,
) -> DataFrame:
    """Fuse ranked lists into one ranking by reciprocal-rank scores.

    Each input frame must have ``item_col``, an integer ``rank_col``
    (1-based; ties already broken upstream), and ``group_cols`` if
    given (e.g. a query id for per-query fusion). Items missing from a
    list simply contribute nothing for it (the standard RRF convention).

    Returns one row per (group, item):
    ``(*group_cols, item, n_lists, rrf_score, fused_rank)`` with
    ``rrf_score = round(sum(w_i / (k + rank_i)), 6)`` and
    ``fused_rank`` dense 1-based per group (score desc, item asc —
    deterministic). ``top`` keeps only ``fused_rank <= top``.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if weights is None:
        weights = [1.0] * len(rankings)
    if len(weights) != len(rankings):
        raise ValueError(
            f"got {len(rankings)} rankings but {len(weights)} weights"
        )
    gcols = list(group_cols or [])

    parts = []
    for df, w in zip(rankings, weights):
        parts.append(
            df.select(
                *[F.col(c) for c in gcols],
                F.col(item_col).alias("__item"),
                (
                    F.lit(float(w))
                    / (F.lit(float(k)) + F.col(rank_col).cast("double"))
                ).alias("__contrib"),
            )
        )
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)

    fused = union.groupBy(*gcols, "__item").agg(
        F.count(F.lit(1)).alias("n_lists"),
        F.round(F.sum("__contrib"), 6).alias("rrf_score"),
    )
    w = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    out = fused.withColumn(
        "fused_rank",
        F.row_number().over(
            w.orderBy(F.col("rrf_score").desc(), F.col("__item").asc())
        ).cast("long"),
    ).withColumnRenamed("__item", item_col)
    if top is not None:
        out = out.filter(F.col("fused_rank") <= top)
    return out.select(*gcols, item_col, "n_lists", "rrf_score", "fused_rank")

"""Embedding preprocessing: per-dimension profiling and whitening.

Extensions (no reference counterpart): before an embedding corpus feeds
ANN indexes, clustering, or a training run, two standing checks/fixes:

- :func:`embedding_dim_profile` — per-dimension mean/std/min/max. Dead
  or exploding dimensions (std ~ 0, extreme ranges) are the usual sign
  of an upstream encoder bug; quantizers (``sq8_quantize``) also key
  off these ranges.
- :func:`standardize_embeddings` — per-dimension z-scoring (whitening
  without rotation). Centering + unit variance repairs anisotropic
  embedding spaces where a few high-variance dimensions dominate every
  cosine (a known failure mode of contrastive encoders).

Scale design: the profile is one ``posexplode`` + one hash aggregate —
the exploded rows are narrow ``(pos, double)`` pairs and partial
aggregation collapses them map-side to ``dim`` rows per input
partition. Standardization folds the (dim-sized) mean/std arrays into a
one-row broadcast frame and applies a single indexed ``transform`` per
vector — scan-side expression work, no shuffle of the vectors.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["embedding_dim_profile", "standardize_embeddings"]


def _dim_stats(df: DataFrame, vec_col: str) -> DataFrame:
    e = df.select(F.posexplode(F.col(vec_col))).select(
        F.col("pos"), F.col("col").cast("double").alias("x")
    )
    return e.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mean"),
        F.stddev_samp("x").alias("std"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
    )


def embedding_dim_profile(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``(pos, n, mean, std, min_x, max_x)`` with the
    float outputs rounded to 6 dp (oracle-reproducible)."""
    s = _dim_stats(df, vec_col)
    return s.select(
        F.col("pos").cast("long").alias("pos"),
        F.col("n").cast("long").alias("n"),
        F.round("mean", 6).alias("mean"),
        F.round("std", 6).alias("std"),
        F.round("min_x", 6).alias("min_x"),
        F.round("max_x", 6).alias("max_x"),
    )


def standardize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 0.0,
    out_col: str = "z",
    stats: Optional[DataFrame] = None,
) -> DataFrame:
    """Z-score every dimension against the corpus: ``z_i = (x_i -
    mean_i) / (std_i + eps)``.

    Degenerate dimensions are handled explicitly rather than leaking
    nulls/inf: when ``std_i + eps`` is not positive (a constant
    dimension with ``eps=0``, or a single-row corpus where
    ``stddev_samp`` is null), ``z_i`` is 0.0 — the limit value, since
    ``x_i == mean_i`` in exactly those cases. Dead dimensions therefore
    surface as all-zero z columns (visible in
    :func:`embedding_dim_profile`), never as silent nulls.

    Pass a persisted ``stats`` frame (``_dim_stats`` layout: pos, mean,
    std) to reuse a training-corpus profile when transforming held-out
    data — the train/serve consistency requirement. Returns the input
    columns plus ``out_col`` as ``array<double>``.
    """
    s = stats if stats is not None else _dim_stats(df, vec_col)
    row = s.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean"))),
            lambda t: t["mean"],
        ).alias("__means"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "std"))),
            lambda t: t["std"],
        ).alias("__stds"),
    )
    def _z(x, i):
        d = F.coalesce(F.element_at(F.col("__stds"), i + 1), F.lit(0.0)) + F.lit(eps)
        num = x.cast("double") - F.element_at(F.col("__means"), i + 1)
        return F.when(d > 0, num / d).otherwise(F.lit(0.0))

    z = F.transform(F.col(vec_col), _z)
    return (
        df.crossJoin(F.broadcast(row))
        .withColumn(out_col, z)
        .drop("__means", "__stds")
    )

"""Scalar (int8) embedding quantization and quantized similarity search.

Extension beyond reference parity (the reference engine has no vector
machinery at all; its nearest analog is the typed column diff kernel,
``datasetComparison/.../DatasetComparator.scala``): training-data
pipelines store billions of embeddings, and a float32 64-dim vector is
256 bytes/row while the int8 code book is 64 bytes/row — a 4x reduction
in scan, shuffle, and cache volume that usually costs <1% recall.

Design (all pure Column expressions — JVM-side, whole-stage codegen):

* :func:`sq8_stats` computes the global per-dimension ``[min, max]`` in
  ONE partial-aggregating pass (``F.min(vec[i])`` per dimension inside a
  single ``agg``). The result is a single tiny row (2 x dim doubles) —
  at any corpus scale the stats stage moves O(partitions * dim) values,
  never O(rows).
* :func:`sq8_quantize` broadcast-joins that one row and maps each vector
  through ``level_i = clamp(floor((v_i - mn_i) / (mx_i - mn_i) * 256))``
  — a scan-side projection, zero shuffle.
* :func:`sq8_topk` is the asymmetric-distance search (ADC): queries stay
  float, corpus codes are dequantized to bucket midpoints on the fly.
  Same top-k shape as ``brute_force_cosine_topk`` (broadcast queries,
  per-query window) but the corpus side reads 4x fewer bytes — at 100 TB
  the scan is the bottleneck, so this is the production search path, with
  the float variant kept as the recall baseline.

Everything is floor/double arithmetic, so the DuckDB oracle reproduces
codes and scores bit-for-bit (rounded to 6 dp).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: number of quantization levels (int8 codes 0..255)
SQ_LEVELS = 256


def sq8_stats(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Global per-dimension min/max as ONE row ``(mins array<double>,
    maxs array<double>)``.

    A single aggregate pass: each executor folds its partition into
    2 x ``dim`` partial extrema, the driver merges O(partitions) such
    rows — no explode, no per-dimension shuffle.
    """
    v = F.col(vec_col)
    return df.agg(
        F.array(*[F.min(v[i].cast("double")) for i in range(dim)]).alias("mins"),
        F.array(*[F.max(v[i].cast("double")) for i in range(dim)]).alias("maxs"),
    )


def _levels(vec: Column, mins: Column, maxs: Column) -> Column:
    """Quantization levels 0..255 for one vector (elementwise, JVM-side).

    Degenerate dimensions (``mx == mn``) quantize to level 0 and
    dequantize back to ``mn`` exactly.
    """
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    return F.transform(
        idx,
        lambda i: F.when(maxs[i] == mins[i], F.lit(0)).otherwise(
            F.least(
                F.lit(SQ_LEVELS - 1),
                F.floor(
                    (vec[i].cast("double") - mins[i])
                    / (maxs[i] - mins[i])
                    * F.lit(float(SQ_LEVELS))
                ).cast("int"),
            )
        ),
    )


def sq8_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: Optional[DataFrame] = None,
    dim: Optional[int] = None,
) -> DataFrame:
    """Quantize every vector to int8 levels: ``(id, codes array<int>)``.

    ``stats`` (the :func:`sq8_stats` row) is broadcast — the corpus
    streams through one projection, so the whole operator is a scan plus
    the O(1)-row stats job. Pass a precomputed ``stats`` to share one
    code book across corpus + queries (required for search parity).
    """
    if stats is None:
        if dim is None:
            raise ValueError("either stats or dim must be given")
        stats = sq8_stats(df, vec_col, dim)
    out = df.crossJoin(F.broadcast(stats))
    return out.select(
        F.col(id_col),
        _levels(F.col(vec_col), F.col("mins"), F.col("maxs")).alias("codes"),
    )


def dequantize_expr(codes: Column, mins: Column, maxs: Column) -> Column:
    """Reconstruct approximate values from levels (bucket midpoints):
    ``v_i ~ mn_i + (level_i + 0.5) * (mx_i - mn_i) / 256``."""
    idx = F.sequence(F.lit(0), F.size(codes) - 1)
    return F.transform(
        idx,
        lambda i: mins[i]
        + (codes[i].cast("double") + F.lit(0.5))
        * (maxs[i] - mins[i])
        / F.lit(float(SQ_LEVELS)),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    k: int = 10,
    dim: Optional[int] = None,
    stats: Optional[DataFrame] = None,
) -> DataFrame:
    """Asymmetric top-k: float queries against the int8-quantized corpus.

    Returns ``(query_id, vec_id, score, rank)`` where ``score`` is the
    cosine between the float query and the dequantized corpus vector.
    The corpus-side input to the ranking stage is the 4x-smaller code
    column; queries are broadcast; one per-query window ranks. At scale
    you would persist :func:`sq8_quantize`'s output once and run every
    search against it — the stats row is the only full-corpus pass.
    """
    if stats is None:
        if dim is None:
            raise ValueError("either stats or dim must be given")
        stats = sq8_stats(corpus, vec_col, dim)
    qid = query_id_col or id_col
    codes = sq8_quantize(corpus, id_col, vec_col, stats=stats)

    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(codes.crossJoin(F.broadcast(stats)))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            F.col("__qvec"),
            dequantize_expr(F.col("codes"), F.col("mins"), F.col("maxs")).alias(
                "__dvec"
            ),
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("__qvec"), F.col("__dvec"), lambda x, y: x.cast("double") * y
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__qvec"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    dnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__dvec"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    ranked = scored.select(
        "query_id",
        "vec_id",
        F.round(dot / (qnorm * dnorm), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return ranked.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )

"""Distributed logistic-regression training via exact integer gradients.

Extension beyond reference parity (the reference has no ML surface;
see ``SURVEY.md`` §2 extension table). Closes the loop left open by
``operators/classify.py``: that module *scores* documents with a
fixed-weight logistic model and says "callers drop in weights trained
offline" — this one trains those weights in-engine, on the same
engine-portable features, with full-batch gradient ascent.

The trainer is deliberately *deterministic across engines*, not just
across runs. Floating-point summation order differs between Spark's
partial aggregates and any oracle engine, so a naive ``sum(residual *
x)`` is only reproducible to an ulp. Instead each row's gradient
contribution is quantized to a 1e-6 grid and summed as a 64-bit
integer — integer addition is associative, so the gradient (and hence
the whole training trajectory) is bit-identical regardless of
partitioning, parallelism, or engine. This is the same
quantize-before-aggregate trick the ANN/k-means oracles in this repo
use (``__spark_entry__.py`` ``_sql_mmr_select`` notes), applied to
training. The quantization is a (tiny, deterministic) gradient
perturbation of at most 5e-7 per row per weight — irrelevant next to
the sampling noise of the data itself.

Scale design (100 TB):

* One map-side-combined aggregation per iteration over the cached
  feature frame — 6 long columns through the final reduce, nothing
  else. No shuffle of rows, ever; the model (5 doubles) rides the plan
  as literals.
* Feature extraction runs once (cache the frame); at real scale you
  train on a deterministic sample (``sampling.deterministic_sample``)
  — full-batch GD on 100 TB is a statement about the aggregation
  path, not a recommendation to train on every row.
* The weight update runs inside a 1-row Spark ``select`` so the 6-dp
  round uses Spark's rounding semantics (HALF_UP via BigDecimal), the
  same semantics every oracle-paired query in this repo relies on.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_train", "train_quality_weights", "weights_trace_df"]

_SCALE = 1_000_000.0


def _z(bias: float, weights: Sequence[float], feats: Sequence[Column]) -> Column:
    """Left-associated ``b + w1*x1 + ... + wk*xk`` — the association
    order is part of the cross-engine contract (the oracle SQL writes
    the same chain), so identical inputs give identical bits."""
    z = F.lit(float(bias))
    for w, x in zip(weights, feats):
        z = z + F.lit(float(w)) * x
    return z


def logreg_train(
    feat_df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lr: float = 1.0,
    iters: int = 3,
    init: Optional[Sequence[float]] = None,
) -> list[dict[str, float]]:
    """Full-batch logistic-regression gradient ascent; returns the
    per-iteration weight trace (element 0 = init, element ``iters`` =
    final), each a dict ``{"bias": b, <feature>: w, ...}``.

    ``feature_cols`` must be double columns whose values are already
    engine-stable (e.g. 6-dp-rounded ratios of integers — see
    ``classify.quality_features``); ``label_col`` is 0/1. Per
    iteration, with ``p = round(sigmoid(z), 6)`` and residual
    ``r = y - p``:

        G_j = sum over rows of round(r * x_j * 1e6)   (exact int64)
        w_j <- round(w_j + lr * G_j / (1e6 * n), 6)

    The trajectory is bit-identical across partitionings and engines
    (integer-sum gradient, see module docstring). Runs ``iters`` tiny
    aggregate jobs; cache ``feat_df`` before calling.
    """
    k = len(feature_cols)
    ws = [0.0] * (k + 1) if init is None else [float(v) for v in init]
    if len(ws) != k + 1:
        raise ValueError(f"init must have {k + 1} values (bias first)")
    n = feat_df.count()
    if n == 0:
        raise ValueError("cannot train on an empty frame")

    trace = [_as_dict(ws, feature_cols)]
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        p = F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(ws[0], ws[1:], xs))), 6
        )
        r = y - p
        aggs = [F.sum(F.round(r * _SCALE).cast("long")).alias("g0")] + [
            F.sum(F.round(r * x * _SCALE).cast("long")).alias(f"g{j + 1}")
            for j, x in enumerate(xs)
        ]
        updates = [
            F.round(
                F.lit(ws[j])
                + F.lit(float(lr)) * F.col(f"g{j}") / F.lit(_SCALE * n),
                6,
            ).alias(f"w{j}")
            for j in range(k + 1)
        ]
        row = feat_df.agg(*aggs).select(*updates).first()
        ws = [row[f"w{j}"] for j in range(k + 1)]
        trace.append(_as_dict(ws, feature_cols))
    return trace


def _as_dict(ws: Sequence[float], feature_cols: Sequence[str]) -> dict[str, float]:
    out = {"bias": ws[0]}
    for name, w in zip(feature_cols, ws[1:]):
        out[name] = w
    return out


def train_quality_weights(
    docs: DataFrame,
    text_col: str,
    label: Column,
    lr: float = 1.0,
    iters: int = 3,
) -> list[dict[str, float]]:
    """Train ``classify.linear_quality_score``-shaped weights on
    documents: features are the four engine-stable quality features
    (with ``log_n_tokens = round(ln(n_tokens + 1), 6)`` as the length
    feature, matching the scorer). ``label`` is any deterministic 0/1
    column expression (e.g. ``F.col("lang") == "en"``)."""
    from .classify import quality_features

    feats = quality_features(F.col(text_col))
    feat_df = docs.select(
        F.round(F.log(feats["n_tokens"].cast("double") + 1.0), 6).alias(
            "log_n_tokens"
        ),
        feats["mean_tok_len"].alias("mean_tok_len"),
        feats["distinct_ratio"].alias("distinct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        label.cast("int").alias("__y"),
    ).cache()
    try:
        return logreg_train(
            feat_df,
            ["log_n_tokens", "mean_tok_len", "distinct_ratio", "stopword_ratio"],
            "__y",
            lr=lr,
            iters=iters,
        )
    finally:
        feat_df.unpersist()


def weights_trace_df(spark, trace: list[dict[str, float]]) -> DataFrame:
    """Render a weight trace as a small DataFrame
    ``(iteration, weight, value)`` — stable long/string/double schema,
    one row per (iteration, coefficient)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("iteration", LongType()),
            StructField("weight", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    rows = [
        (i, name, float(v))
        for i, ws in enumerate(trace)
        for name, v in ws.items()
    ]
    return spark.createDataFrame(rows, schema)

"""Gap-filled time-bucket rollup (hypertable-style dense series).

Downstream consumers of time-series rollups (dashboards, anomaly
detectors, models trained on regular grids) need EVERY bucket present,
including empty ones — a plain groupBy silently omits them. This
operator densifies:

1. bucket + aggregate (one shuffle);
2. build the bucket spine with ``sequence(min, max, 1 unit)`` exploded
   once on the driver-side bounds row — NOT a per-group scan;
3. cross-join the (tiny) spine with the distinct group keys and
   left-join the aggregates back;
4. fill misses with zero, or carry the last observation forward
   (``fill="locf"``) via one more window over the same partitioning.

Scale: the spine is |buckets| × |groups| rows — small by construction
(time grids are bounded); the only data-sized operation is the initial
aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_UNIT_INTERVAL = {"hour": "interval 1 hour", "day": "interval 1 day",
                  "minute": "interval 1 minute"}


def gapfill_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    group_cols: Sequence[str] = (),
    fill: str = "zero",
) -> DataFrame:
    """Dense per-bucket rollup: ``(bucket, *group_cols, n_events,
    sum_value)`` with every bucket between the global min and max
    present for every group. ``fill="zero"`` fills empty buckets with
    0 / 0.0; ``fill="locf"`` carries the previous bucket's ``sum_value``
    forward (count stays 0)."""
    if unit not in _UNIT_INTERVAL:
        raise ValueError(f"unsupported unit {unit!r}; use {sorted(_UNIT_INTERVAL)}")
    if fill not in ("zero", "locf"):
        raise ValueError(f"unsupported fill {fill!r}")
    groups = list(group_cols)

    bucketed = (
        df.groupBy(
            F.date_trunc(unit, F.col(ts_col)).alias("bucket"),
            *[F.col(c) for c in groups],
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
    )

    bounds = bucketed.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.expr(f"sequence(lo, hi, {_UNIT_INTERVAL[unit]})")
        ).alias("bucket")
    )
    if groups:
        spine = spine.crossJoin(df.select(*groups).distinct())

    dense = spine.join(bucketed, on=["bucket"] + groups, how="left")
    n_filled = F.coalesce(F.col("n_events"), F.lit(0)).cast("long")
    if fill == "zero":
        value_filled = F.coalesce(F.col("sum_value"), F.lit(0.0))
    else:
        w = (
            Window.partitionBy(*groups)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        value_filled = F.coalesce(
            F.last("sum_value", ignorenulls=True).over(w), F.lit(0.0)
        )
    return dense.select(
        "bucket",
        *groups,
        n_filled.alias("n_events"),
        value_filled.alias("sum_value"),
    )


def rolling_anomalies(
    counts: DataFrame,
    bucket_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    lookback: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Trailing-window z-score anomaly detection over a (dense) bucketed
    series: flag buckets whose value deviates >= ``z_threshold`` sample
    standard deviations from the mean of the previous ``lookback``
    buckets (the bucket itself excluded, so a spike can't mask itself).

    Input should be a gap-filled rollup (see :func:`gapfill_rollup`) so
    the ROWS frame counts real time steps.  Returns the input columns
    plus ``expected``, ``zscore`` (both rounded, null for the warm-up
    prefix or zero-variance windows) and ``is_anomaly``.  One window
    over the series partitioning — at 100 TB the series frame is
    already aggregated, so this is a cheap second pass.
    """
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg(F.col(value_col)).over(w)
    std = F.stddev_samp(F.col(value_col)).over(w)
    n_prev = F.count(F.col(value_col)).over(w)
    z = (F.col(value_col) - mean) / F.nullif(std, F.lit(0.0))
    full_window = n_prev >= F.lit(lookback)
    return (
        counts.withColumn("expected", F.when(full_window, F.round(mean, 4)))
        .withColumn("zscore", F.when(full_window, F.round(z, 4)))
        .withColumn(
            "is_anomaly",
            # zero-variance windows have a null zscore -> not anomalous
            F.coalesce(
                F.when(full_window, F.abs(F.col("zscore")) >= z_threshold),
                F.lit(False),
            ),
        )
    )


def ewma_smooth(
    series: DataFrame,
    bucket_col: str,
    value_col: str,
    group_cols: Sequence[str] = (),
    alpha: float = 0.3,
    lookback: int = 16,
    out_col: str = "ewma",
    decimals: int = 4,
) -> DataFrame:
    """Trailing truncated-window EWMA over a (dense) bucketed series.

    For each bucket t the smoothed value is the normalized exponential
    mix of the last ``lookback`` observations::

        ewma_t = sum_{i=0..K-1} (1-alpha)^i * v_{t-i}
                 / sum_{i=0..K-1} (1-alpha)^i     (K = lookback)

    Normalizing by the realized weight mass makes the warm-up prefix
    unbiased (the first bucket is just its own value) instead of
    decaying toward zero, and truncation keeps the computation a ROWS
    window instead of an unbounded recursion.

    Shape: one window ``collect_list`` of the trailing ``lookback``
    values (frame order = bucket order, so the fold sees
    oldest->newest) and one ``aggregate`` fold computing the recursive
    form ``num' = num*(1-alpha) + v``, ``den' = den*(1-alpha) + 1`` —
    algebraically identical to the sum above, all JVM-side expression
    code. The array is at most ``lookback`` doubles per row; at 100 TB
    the input is an already-aggregated series, so this pass is cheap.
    Input should be gap-filled (:func:`gapfill_rollup`) so ROWS frames
    count real time steps.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if lookback < 1:
        raise ValueError("lookback must be >= 1")
    keep = F.lit(1.0 - alpha)
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(bucket_col).asc())
        .rowsBetween(-(lookback - 1), 0)
    )
    trail = F.collect_list(F.col(value_col).cast("double")).over(w)
    folded = F.aggregate(
        trail,
        F.struct(F.lit(0.0).alias("num"), F.lit(0.0).alias("den")),
        lambda acc, x: F.struct(
            (acc["num"] * keep + x).alias("num"),
            (acc["den"] * keep + F.lit(1.0)).alias("den"),
        ),
        lambda acc: acc["num"] / acc["den"],
    )
    return series.withColumn(out_col, F.round(folded, decimals))

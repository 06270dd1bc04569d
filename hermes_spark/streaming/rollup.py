"""Watermarked tumbling/hopping window rollup over an event stream.

Streaming analogue of the batch ``events_hourly_rollup`` query: group by
``window(ts, size)`` plus dimension columns, aggregate, tolerate late
data up to the watermark. State is bounded by (windows in flight ×
dimension cardinality); expired windows are evicted once the watermark
passes, which is what keeps this runnable forever on an unbounded
stream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    stream: DataFrame,
    ts_col: str,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    slide_duration: str = None,
) -> DataFrame:
    """Tumbling (default) or hopping window aggregation with late-data
    handling — pass ``slide_duration`` shorter than the window for
    overlapping windows (each event then contributes to
    window/slide windows; state grows by the same factor).

    Returns a streaming DataFrame with ``window_start``/``window_end``,
    the group columns, and the aggregates (default: ``n_events`` count).
    Works identically on a batch DataFrame (window + groupBy are
    batch-compatible), which is how the tests pin its semantics against
    the batch rollup query.
    """
    agg_list = list(aggs) or [F.count(F.lit(1)).alias("n_events")]
    windowed = stream
    if stream.isStreaming:
        windowed = stream.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(ts_col), window_duration)
    )
    aggregated = windowed.groupBy(
        win.alias("__w"),
        *[F.col(c) for c in group_cols],
    ).agg(*agg_list)
    value_cols = [c for c in aggregated.columns if c not in {"__w", *group_cols}]
    return aggregated.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *[F.col(c) for c in group_cols],
        *[F.col(c) for c in value_cols],
    )

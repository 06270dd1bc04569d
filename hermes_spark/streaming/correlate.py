"""Watermarked stream-stream interval join (event correlation).

Extension beyond reference parity (the reference is batch-only; see
``SURVEY.md`` §2 extension table). The one Structured Streaming shape
this package's streaming surface was missing: joining TWO live streams
— click↔impression attribution, request↔response latency pairing,
sensor↔actuation correlation — where each left event matches right
events on the same key within a bounded time interval.

Built directly on Spark's native stream-stream join: equality keys
plus a time-range predicate. The time bound is not a convenience — it
is what makes the join runnable forever. Spark keeps both sides' join
state until the watermark passes the interval, then evicts; without
the range predicate the state grows without bound and the query dies
at 100 TB/day rates. State size ≈ (events per key-interval) ×
(watermark + interval) of history per side.

The same function applied to batch DataFrames produces the identical
join (watermarks are a no-op on batch frames), which is how the tests
pin streaming semantics against a plain batch interval join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_streams", "last_touch"]


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    lookahead: str = "0 seconds",
    watermark: str = "2 hours",
    join_type: str = "inner",
    right_prefix: str = "",
) -> DataFrame:
    """Join events where ``right.right_ts`` falls in
    ``[left.left_ts - lookback, left.left_ts + lookahead]`` on equal
    ``keys``.

    ``left_ts`` and ``right_ts`` must be distinct column names (rename
    upstream if both streams call it ``ts``). ``right_prefix`` renames
    every non-key right column (including ``right_ts``) to avoid
    collisions. ``join_type``: ``inner`` or ``left_outer`` (outer
    emits unmatched left rows only after the watermark closes their
    interval — that is Spark's correctness contract, not a bug).

    Watermarks are applied to BOTH sides when streaming (required for
    state eviction on inner joins and for outer-join results at all);
    on batch inputs the function degrades to a plain interval join.

    Gotcha: watermarks require ``TIMESTAMP`` (with local timezone) —
    parquet round-trips can silently yield ``TIMESTAMP_NTZ``, which
    Spark rejects for event time; ``.cast("timestamp")`` upstream."""
    if left_ts == right_ts and not right_prefix:
        raise ValueError(
            "left_ts and right_ts must differ (or set right_prefix)"
        )
    key_list = list(keys)
    if right_prefix:
        renames = {
            c: right_prefix + c for c in right.columns if c not in key_list
        }
        right = right.select(
            *key_list,
            *[F.col(c).alias(n) for c, n in renames.items()],
        )
        right_ts = right_prefix + right_ts
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    # qualified column refs (left[...]) — a bare name in F.expr would be
    # ambiguous if the right side carries a same-named payload column
    cond = [left[k] == right[k] for k in key_list] + [
        right[right_ts] >= left[left_ts] - F.expr(f"INTERVAL {lookback}"),
        right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {lookahead}"),
    ]
    joined = left.join(right, cond, join_type)
    # collapse the duplicated key columns (keep left's)
    for k in key_list:
        joined = joined.drop(right[k])
    return joined


def last_touch(
    joined: DataFrame,
    event_cols: Sequence[str],
    order_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Last-touch attribution over an interval-join result: keep, per
    left event (identified by ``event_cols``), the single matched row
    with the greatest ``order_col`` (ties broken by ``tie_break`` desc,
    deterministically).

    Batch finishing step: stream-stream join output feeds a
    ``foreachBatch`` sink where this runs per micro-batch, or the
    joined stream is persisted and attributed in a batch pass — window
    ranking directly on top of a stream-stream join is restricted by
    Spark's stateful-op chaining rules, so the package does not pretend
    otherwise."""
    from pyspark.sql import Window

    order = [F.col(order_col).desc()] + [F.col(c).desc() for c in tie_break]
    w = Window.partitionBy(*[F.col(c) for c in event_cols]).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

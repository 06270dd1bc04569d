"""Custom stateful operator: gap-based sessionization via
``applyInPandasWithState``.

A pure extension (no streaming exists in the reference, SURVEY.md §2.8).
Demonstrates the engine's pattern for operators Structured Streaming
lacks natively: per-key state (the open session) carried across
micro-batches, Arrow-batched pandas on the worker side, event-time
timeout to flush idle sessions.

Batch-mode equivalent: :func:`hermes_spark.operators.sessionize` (window
functions; oracle-checkable) — semantics are pinned against it in tests.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# open session carried across micro-batches: (start, last_seen, count)
_STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last_seen", LongType()),
        StructField("n_events", LongType()),
    ]
)

_US = 1_000_000


def _session_func(gap_seconds: int):
    gap_us = gap_seconds * _US

    def func(
        key: Tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                start, last_seen, count = state.get
                closed.append((start, last_seen, count))
                state.remove()
        else:
            if state.exists:
                start, last_seen, count = state.get
            else:
                start = last_seen = count = None
            ts_values: list[int] = []
            for pdf in pdf_iter:
                ts_values.extend(
                    int(v.value) for v in pd.to_datetime(pdf["ts"])
                )
            for ts_us in sorted(v // 1000 for v in ts_values):
                if start is None:
                    start, last_seen, count = ts_us, ts_us, 1
                elif ts_us - last_seen > gap_us:
                    closed.append((start, last_seen, count))
                    start, last_seen, count = ts_us, ts_us, 1
                else:
                    last_seen, count = max(last_seen, ts_us), count + 1
            if start is not None:
                state.update((start, last_seen, count))
                state.setTimeoutTimestamp(last_seen // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return func


def sessionize_stream(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit closed sessions ``(user_id, session_start, session_end,
    n_events)`` from an event stream; a session closes when ``gap_seconds``
    pass without an event for that user (flushed by event-time timeout).

    State per key is three longs — bounded by the number of concurrently
    active users, independent of stream length.
    """
    from pyspark.sql import functions as F

    prepared = (
        stream.withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("string").alias("user_id"),
            F.col(ts_col).alias("ts"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_seconds),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

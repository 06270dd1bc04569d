"""Stateful streaming anomaly detection: trailing z-score per key.

Streaming twin of ``operators/gapfill.py::rolling_anomalies`` composed
over ``gapfill_rollup(fill="zero")`` — the batch pair is the oracle the
tests pin against (the reference has no streaming at all, SURVEY.md
§2.8; this extends the engine's stateful-operator pattern alongside
``streaming/sessionize.py``).

Semantics: events are bucketed to ``bucket_seconds`` grids per key; a
bucket CLOSES when a later bucket for the key arrives (or event-time
timeout fires), and closing emits the bucket's event count plus
``expected`` / ``zscore`` / ``is_anomaly`` computed against the previous
``lookback`` closed buckets (sample stddev, spike excluded from its own
baseline — identical to the batch operator). Missing buckets between
events are zero-filled in state, so quiet periods score as the batch
gap-filled series would.

State per key is ``lookback + 2`` numbers (open bucket, open count,
trailing values) — bounded by key cardinality, independent of stream
length. Arrow-batched ``applyInPandasWithState``; no per-row Python.
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

ANOMALY_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("bucket", TimestampType()),
        StructField("n_events", LongType()),
        StructField("expected", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

# (frontier bucket id, its count — null once closed by timeout —
#  trailing closed-bucket counts oldest-first)
_STATE_SCHEMA = StructType(
    [
        StructField("frontier", LongType()),
        StructField("open_count", LongType()),
        StructField("recent", ArrayType(DoubleType())),
    ]
)


def _close(
    key: str,
    bucket_id: int,
    count: int,
    recent: list,
    bucket_seconds: int,
    lookback: int,
    z_threshold: float,
    out: list,
) -> None:
    """Emit one closed bucket against the trailing window, then push its
    value into the window (mirrors the batch ROWS (-lookback, -1) frame,
    including the round-4 / null-on-warm-up / zero-variance rules)."""
    expected = zscore = None
    anomaly = False
    if len(recent) >= lookback:
        window = recent[-lookback:]
        mean = sum(window) / lookback
        var = sum((v - mean) ** 2 for v in window) / (lookback - 1)
        std = math.sqrt(var)
        expected = round(mean, 4)
        if std > 0.0:
            zscore = round((count - mean) / std, 4)
            anomaly = abs(zscore) >= z_threshold
    out.append(
        (
            key,
            pd.Timestamp(bucket_id * bucket_seconds, unit="s"),
            count,
            expected,
            zscore,
            anomaly,
        )
    )
    recent.append(float(count))
    del recent[: max(0, len(recent) - lookback)]


def _anomaly_func(bucket_seconds: int, lookback: int, z_threshold: float):
    def func(
        key: Tuple[Any, ...],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        out: list = []
        if state.hasTimedOut:
            if state.exists:
                frontier, open_count, recent = state.get
                recent = list(recent)
                if open_count is not None:
                    _close(
                        key[0], frontier, open_count, recent,
                        bucket_seconds, lookback, z_threshold, out,
                    )
                # frontier stays as the high-water mark (open_count null
                # = already closed); the next event re-arms the timeout
                state.update((frontier, None, recent))
        else:
            if state.exists:
                frontier, open_count, recent = state.get
                recent = list(recent)
            else:
                frontier = open_count = None
                recent = []
            counts: dict[int, int] = {}
            for pdf in pdf_iter:
                ids = (
                    pd.to_datetime(pdf["ts"]).astype("int64")
                    // 1_000_000_000
                    // bucket_seconds
                )
                for b, c in ids.value_counts().items():
                    counts[int(b)] = counts.get(int(b), 0) + int(c)
            if frontier is not None:
                # late events for already-closed buckets are dropped
                # (watermark semantics); the still-open frontier absorbs
                # its own stragglers
                min_allowed = frontier if open_count is not None else frontier + 1
                counts = {b: c for b, c in counts.items() if b >= min_allowed}
                if open_count is not None:
                    counts[frontier] = counts.get(frontier, 0) + open_count
            if counts:
                hi = max(counts)
                lo = min(counts)
                if frontier is not None and open_count is None:
                    # quiet stretch after a timeout-closed bucket:
                    # zero-close the skipped buckets too
                    lo = min(lo, frontier + 1)
                # zero-fill the gaps so quiet buckets close with count 0,
                # exactly like the batch gap-filled series
                for b in range(lo, hi):
                    _close(
                        key[0], b, counts.get(b, 0), recent,
                        bucket_seconds, lookback, z_threshold, out,
                    )
                state.update((hi, counts[hi], recent))
                state.setTimeoutTimestamp((hi + 2) * bucket_seconds * 1000)
            elif state.exists:
                state.update((frontier, open_count, recent))

        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "key", "bucket", "n_events", "expected", "zscore",
                    "is_anomaly",
                ],
            )

    return func


def anomaly_stream(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    lookback: int = 24,
    z_threshold: float = 3.0,
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit per-key closed-bucket anomaly rows ``(key, bucket, n_events,
    expected, zscore, is_anomaly)`` from an event stream.

    A bucket closes when a later event for the key arrives or when event
    time passes one full bucket beyond it (timeout); warm-up buckets
    (fewer than ``lookback`` predecessors) emit null expected/zscore,
    zero-variance windows a null zscore — matching the batch operator.
    """
    from pyspark.sql import functions as F

    prepared = stream.withWatermark(ts_col, watermark).select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _anomaly_func(bucket_seconds, lookback, z_threshold),
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

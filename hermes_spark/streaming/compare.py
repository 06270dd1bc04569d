"""Continuous dataset comparison: stream vs static reference.

A pure extension (the reference is batch-only, SURVEY.md §2.8): each
micro-batch is diffed against the static reference DataFrame with the
same compare kernel used by the batch job, and the per-batch
``ComparisonResult`` is handed to a caller callback (metrics export,
alerting, dead-letter sink, ...).

Scale notes: the static side is re-used across batches — persist it
before starting the query if it fits the cluster's storage memory. The
per-batch diff only shuffles the micro-batch plus the matching keys of
the reference; with AQE on, small batches broadcast automatically.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from hermes_spark.comparator import DatasetComparator
from hermes_spark.config import ComparisonConfig, DEFAULT_CONFIG
from hermes_spark.result import ComparisonResult


def compare_stream(
    reference: DataFrame,
    stream: DataFrame,
    keys: Sequence[str] = (),
    config: ComparisonConfig = DEFAULT_CONFIG,
    on_result: Optional[Callable[[int, ComparisonResult], None]] = None,
    restrict_to_batch_keys: bool = True,
    **start_kwargs,
) -> StreamingQuery:
    """Start a streaming query diffing each micro-batch against
    ``reference``.

    With ``restrict_to_batch_keys`` (default) the reference side is
    semi-joined down to the keys present in the micro-batch first, so a
    batch of N rows compares against ≤N reference rows no matter how big
    the reference is — without it every batch would re-scan the full
    reference (only sensible when batches are full snapshots).

    ``start_kwargs`` pass through to ``writeStream`` (e.g.
    ``trigger(availableNow=True)`` args, checkpointLocation, queryName).
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        ref = reference
        if restrict_to_batch_keys and keys:
            ref = reference.join(
                batch_df.select(*keys).distinct(), on=list(keys), how="left_semi"
            )
        comparator = DatasetComparator(ref, batch_df, keys=keys, config=config)
        result = comparator.compare()
        comparator.release()
        if on_result is not None:
            on_result(batch_id, result)

    writer = stream.writeStream.foreachBatch(process_batch)
    trigger = start_kwargs.pop("trigger", None)
    if trigger:
        writer = writer.trigger(**trigger)
    for key, value in start_kwargs.items():
        writer = writer.option(key, value)
    return writer.start()

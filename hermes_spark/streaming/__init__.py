"""Structured Streaming extensions.

The reference has NO streaming surface (SURVEY.md §2.8) — everything
here is a scale extension built on the same kernels:

- :func:`compare_stream` — continuous comparison of a stream against a
  static reference via ``foreachBatch`` running the batch compare core.
- :func:`windowed_rollup` — watermarked tumbling-window aggregation
  (the streaming analogue of the ``events_hourly_rollup`` query).
- :func:`sessionize_stream` — custom stateful sessionization via
  ``applyInPandasWithState``.
- :func:`anomaly_stream` — stateful trailing z-score anomaly detection
  (streaming twin of ``operators/gapfill.py::rolling_anomalies``).
- :func:`interval_join_streams` — watermarked stream-stream interval
  join (click↔impression attribution, request↔response pairing).
"""

from hermes_spark.streaming.anomaly import anomaly_stream
from hermes_spark.streaming.compare import compare_stream
from hermes_spark.streaming.correlate import interval_join_streams, last_touch
from hermes_spark.streaming.dedup import (
    compact_minhash_store,
    compact_fingerprint_store,
    stream_exact_dedup,
    stream_fingerprint_dedup,
    stream_minhash_dedup,
)
from hermes_spark.streaming.distinct import (
    hll_distinct_sink,
    hll_store_estimates,
    read_hll_store,
)
from hermes_spark.streaming.enrich import enrich_stream, read_upsert_store, upsert_sink
from hermes_spark.streaming.ingest import curated_wet_stream
from hermes_spark.streaming.metrics import ProgressRecorder
from hermes_spark.streaming.rollup import windowed_rollup
from hermes_spark.streaming.sessionize import sessionize_stream

__all__ = [
    "anomaly_stream",
    "hll_distinct_sink",
    "hll_store_estimates",
    "read_hll_store",
    "compare_stream",
    "curated_wet_stream",
    "interval_join_streams",
    "last_touch",
    "enrich_stream",
    "read_upsert_store",
    "upsert_sink",
    "sessionize_stream",
    "compact_fingerprint_store",
    "stream_exact_dedup",
    "stream_fingerprint_dedup",
    "stream_minhash_dedup",
    "compact_minhash_store",
    "ProgressRecorder",
    "windowed_rollup",
]

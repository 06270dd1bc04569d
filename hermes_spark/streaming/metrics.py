"""Streaming progress metrics: a listener that turns Spark's
``StreamingQueryProgress`` events into flat records for dashboards.

Extension beyond reference parity (the reference is batch-only): every
streaming operator in this package (continuous compare, rollups,
sessionize, dedup) runs as a StreamingQuery, and at production scale
the numbers that matter are rows/sec, batch duration, and state-store
growth — exactly what this surfaces, without the caller touching the
listener API or the nested progress JSON.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Collects one flat dict per micro-batch:

    ``{query_id, batch_id, num_input_rows, input_rows_per_second,
    processed_rows_per_second, batch_duration_ms, state_rows,
    watermark}``

    Thread-safe (listener callbacks arrive on Spark's listener bus
    thread). Pass ``on_progress`` to stream records out (e.g. to a
    metrics sink); ``records`` keeps them for inspection either way.

    Usage::

        rec = ProgressRecorder()
        rec.attach(spark)
        try:
            ...run streaming queries...
        finally:
            rec.detach(spark)
    """

    def __init__(
        self, on_progress: Optional[Callable[[dict], None]] = None
    ) -> None:
        self.records: list[dict] = []
        self._on_progress = on_progress
        self._lock = threading.Lock()

    # -- StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802 (Spark API)
        p = event.progress
        state_rows = 0
        for op in p.stateOperators or []:
            state_rows += op.numRowsTotal or 0
        record = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "input_rows_per_second": p.inputRowsPerSecond,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "batch_duration_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": state_rows,
            "watermark": (p.eventTime or {}).get("watermark"),
        }
        with self._lock:
            self.records.append(record)
        if self._on_progress is not None:
            self._on_progress(record)

    def onQueryIdle(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    # -- lifecycle -----------------------------------------------------
    def attach(self, spark: SparkSession) -> "ProgressRecorder":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def total_input_rows(self) -> int:
        with self._lock:
            return sum(r["num_input_rows"] or 0 for r in self.records)

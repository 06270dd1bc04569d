"""Stream-static enrichment and a partition-overwrite upsert sink.

Extensions (the reference has no streaming surface, SURVEY.md §2.8).
Two pieces a production event pipeline needs around the stateful
operators that already exist here:

- :func:`enrich_stream` — join a stream against a static dimension
  table. Spark re-evaluates the static side per micro-batch, so a
  broadcast hint keeps every batch an exchange-free map-side join;
  without it each batch would shuffle the (possibly large) stream side
  against the dimension.
- :func:`upsert_sink` — keyed "latest state" materialization into plain
  parquet without a transactional table format: the store is
  partitioned by a key-hash bucket, and each micro-batch rewrites ONLY
  the buckets it touches via dynamic partition overwrite. Work per
  batch is proportional to touched buckets, not store size, and replays
  of the same batch converge to the same store state (newest-wins merge
  is idempotent), which is what checkpoint recovery needs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.utils import AnalysisException

_BUCKET = "__kb"
_SEQ = "__seq"


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static equi-join (works identically on a batch frame,
    which is how tests pin its semantics).

    ``broadcast_dim=True`` (default) hints the dimension side so every
    micro-batch plans a broadcast hash join — the stream side never
    shuffles. Turn it off only when the dimension is too big to
    broadcast; then pre-bucket both sides instead (see
    ``operators.joins.write_bucketed``).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=list(on), how=how)


def _latest_per_key(df: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    # Order: newest order_col, then highest ingest sequence (batch_id —
    # so a restated key with a TIED order_col resolves to the most
    # recently ingested row, not to whichever value columns happen to
    # sort higher), then the value columns descending as a final
    # deterministic tiebreak for equal-seq duplicates within one batch.
    tail = [F.col(c).desc() for c in df.columns
            if c not in keys and c not in (order_col, _SEQ)]
    seq = [F.col(_SEQ).desc()] if _SEQ in df.columns else []
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(order_col).desc(), *seq, *tail)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_sink(
    stream: DataFrame,
    path: str,
    keys: Sequence[str],
    order_col: str,
    num_buckets: int = 64,
) -> DataStreamWriter:
    """``writeStream`` sink maintaining a keyed latest-state parquet
    store at ``path``. Newest ``order_col`` per key wins; an
    ``order_col`` tie goes to the most recently ingested row (each batch
    stamps ``batch_id`` as an internal sequence column, so restating a
    key with an unchanged ``order_col`` — e.g. re-aggregating a window
    keyed by ``window_end`` — still replaces the stale value), and any
    remaining equal-seq duplicates break by the value columns descending
    so the merge stays deterministic. Batch/store schema drift is merged
    with ``unionByName(allowMissingColumns=True)`` — new columns appear
    null-filled in old rows rather than being silently dropped.

    Per micro-batch:

    1. bucket the batch rows by key hash (``pmod(xxhash64(keys), N)``);
    2. read ONLY the store buckets the batch touches (partition-pruned
       scan — the bucket list is a tiny driver digest);
    3. merge newest-wins, localCheckpoint to cut the read-what-you-write
       dependency, and rewrite just those buckets with dynamic partition
       overwrite.

    Attach checkpointing/trigger on the returned writer::

        upsert_sink(stream, path, ["k"], "ts")\\
            .option("checkpointLocation", ckpt)\\
            .trigger(availableNow=True).start()
    """
    keys = list(keys)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        b = batch.withColumn(
            _BUCKET, F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets))
        ).withColumn(_SEQ, F.lit(int(batch_id)).cast("long"))
        b = _latest_per_key(b, keys, order_col)
        touched = [r[_BUCKET] for r in b.select(_BUCKET).distinct().collect()]
        try:
            # mergeSchema: after an evolution, untouched buckets still
            # hold the old column set — the union of footers is the
            # store schema, not whichever file is sampled first.
            existing = (
                spark.read.option("mergeSchema", "true")
                .parquet(path)
                .filter(F.col(_BUCKET).isin(touched))
            )
            if _SEQ not in existing.columns:  # store predates seq stamping
                existing = existing.withColumn(_SEQ, F.lit(-1).cast("long"))
            # Monotonic epoch: batch_id restarts at 0 when the stream is
            # resumed with a FRESH checkpoint directory, and a raw
            # batch_id stamp would then lose order_col ties to rows the
            # previous incarnation stored with a higher seq — reverting
            # restated keys to stale values.  Re-stamp the batch with
            # max(existing seq over the touched buckets) + 1 (a key's
            # rows always live in its own bucket, so the touched-bucket
            # max covers every key this batch can tie with); the scan is
            # column-pruned to _SEQ on partition-pruned buckets.
            store_max = existing.agg(F.max(_SEQ)).collect()[0][0]
            if store_max is not None and store_max >= int(batch_id):
                b = b.withColumn(_SEQ, F.lit(int(store_max) + 1).cast("long"))
            # Schema evolution: a column present on only one side is kept
            # and null-filled on the other (never silently dropped).
            merged = _latest_per_key(
                existing.unionByName(b, allowMissingColumns=True), keys, order_col
            )
        except AnalysisException as exc:
            # only a MISSING path means "first batch" — a corrupt or
            # unreadable store must fail the batch, not silently reset
            # the touched buckets to this batch's rows
            if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
                raise
            merged = b
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.localCheckpoint(eager=True).write.mode("overwrite").partitionBy(
                _BUCKET
            ).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return stream.writeStream.foreachBatch(process_batch).outputMode("update")


def read_upsert_store(spark, path: str) -> DataFrame:
    """Read the latest-state store written by :func:`upsert_sink`
    (drops the internal bucket and ingest-sequence columns)."""
    return (
        spark.read.option("mergeSchema", "true").parquet(path).drop(_BUCKET, _SEQ)
    )

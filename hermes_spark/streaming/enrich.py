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
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(order_col).desc(), *[F.col(c).desc() for c in df.columns
                                            if c not in keys and c != order_col])
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
    store at ``path`` (newest ``order_col`` per key wins; ties broken by
    the remaining columns descending, so the merge is deterministic).

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
        )
        b = _latest_per_key(b, keys, order_col)
        touched = [r[_BUCKET] for r in b.select(_BUCKET).distinct().collect()]
        try:
            existing = spark.read.parquet(path).filter(F.col(_BUCKET).isin(touched))
            merged = _latest_per_key(
                existing.unionByName(b.select(existing.columns)), keys, order_col
            )
        except AnalysisException:  # first batch: no store yet
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
    (drops the internal bucket column)."""
    return spark.read.parquet(path).drop(_BUCKET)

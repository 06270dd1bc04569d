"""Streaming distinct-count maintenance over a persistent HLL store.

Extension (the reference has no streaming surface, SURVEY.md §2.8).
"How many distinct users per segment, updated continuously" is the
canonical streaming dashboard ask, and the exact answer needs unbounded
state (every key ever seen).  The HyperLogLog register store from
:mod:`hermes_spark.operators.sketch` bounds state at ``m = 2^p`` rows
per group *forever* and — unlike additive counters — is **naturally
replay-idempotent**: the merge is a register-wise ``max``, so
re-processing a micro-batch after checkpoint recovery converges to the
same store instead of double counting.  (A count-min store does NOT
have this property — its merge is additive — which is why there is no
``cms_sink`` here; frequency sketches need an exactly-once sink or the
upsert-keyed layout of :func:`hermes_spark.streaming.enrich.upsert_sink`.)

Per micro-batch, work is proportional to the batch plus the touched
store buckets, never to history: the batch collapses to ≤ m register
rows per group map-side, the store scan is partition-pruned to the
group-hash buckets the batch touches, and only those buckets are
rewritten (dynamic partition overwrite), mirroring ``upsert_sink``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter
from pyspark.sql.utils import AnalysisException

from ..operators.sketch import hll_estimate, hll_state

_BUCKET = "__gb"


def _with_bucket(state: DataFrame, group_cols: Sequence[str], n: int) -> DataFrame:
    return state.withColumn(
        _BUCKET, F.pmod(F.xxhash64(*[F.col(c) for c in group_cols]), F.lit(n))
    )


def hll_distinct_sink(
    stream: DataFrame,
    path: str,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 12,
    portable: bool = False,
    num_buckets: int = 16,
) -> DataStreamWriter:
    """``writeStream`` sink maintaining per-group HLL registers at
    ``path``.  Defaults to the xxhash64 production hash; pass
    ``portable=True`` only when the store must be verifiable from
    another engine.

    Attach checkpointing/trigger on the returned writer::

        hll_distinct_sink(stream, store, ["segment"], "user_id")\\
            .option("checkpointLocation", ckpt)\\
            .trigger(availableNow=True).start()

    Read results back with :func:`read_hll_store` /
    :func:`hll_store_estimates`.
    """
    groups = list(group_cols)

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        spark = batch.sparkSession
        b = _with_bucket(
            hll_state(batch, groups, value_col, p=p, portable=portable),
            groups,
            num_buckets,
        )
        touched = [r[_BUCKET] for r in b.select(_BUCKET).distinct().collect()]
        try:
            existing = spark.read.parquet(path).filter(
                F.col(_BUCKET).isin(touched)
            )
            merged = (
                existing.unionByName(b)
                .groupBy(*groups, "bucket", _BUCKET)
                .agg(F.max("max_rank").alias("max_rank"))
            )
        except AnalysisException as exc:
            # only a MISSING path means "first batch" — a corrupt or
            # unreadable store must fail the batch, not silently reset
            # the touched buckets to this batch's registers
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


def read_hll_store(spark: SparkSession, path: str) -> DataFrame:
    """The raw register store ``(group..., bucket, max_rank)`` — feed it
    to :func:`hermes_spark.operators.sketch.hll_merge` to fold several
    stores (e.g. per-region pipelines) before estimating."""
    return spark.read.parquet(path).drop(_BUCKET)


def hll_store_estimates(
    spark: SparkSession, path: str, group_cols: Sequence[str], p: int = 12
) -> DataFrame:
    """Current distinct-count estimates from the store."""
    return hll_estimate(read_hll_store(spark, path), list(group_cols), p=p)

"""End-to-end streaming pipeline example.

Composes the streaming surface over the synthetic events table:

  file stream of events
    -> stream-static enrichment (user dimension, broadcast per batch)
    -> watermarked hourly windowed rollup (late data tolerated)
    -> keyed upsert sink: latest rollup row per (window, event_type)
       maintained in plain parquet via dynamic partition overwrite

Run twice and the second invocation only processes files added since the
checkpoint; kill it mid-run and the replay converges to the same store
(the sink's newest-wins merge is idempotent).

Usage (from the repo root):

    python examples/stream_events_pipeline.py [sf_dir] [work_dir]

Defaults: sf_dir=/root/testdata/sf0.001, work_dir=/tmp/stream_pipeline.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hermes_spark.streaming import (
    enrich_stream,
    read_upsert_store,
    upsert_sink,
    windowed_rollup,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/stream_pipeline"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("stream-events-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # stage the batch events as a streaming-readable file source
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not dict(events.dtypes).get("ts", "").startswith("timestamp"):
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = f"{work}/src"
    events.write.mode("overwrite").parquet(src)

    # a tiny user dimension derived from the same data (stands in for a
    # real profile table)
    dim = events.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.count(F.lit(1)).alias("lifetime_events"),
    )

    stream = spark.readStream.schema(events.schema).parquet(src)
    enriched = enrich_stream(stream, dim, on=["user_id"])
    rolled = windowed_rollup(
        enriched,
        "ts",
        "1 hour",
        watermark="2 hours",
        group_cols=("event_type",),
        aggs=(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            # exact distinct is unsupported on streams; HLL sketch instead
            F.approx_count_distinct("user_id").alias("n_users"),
        ),
    )
    query = (
        upsert_sink(
            rolled,
            f"{work}/rollup_store",
            keys=["window_start", "event_type"],
            order_col="window_end",
            num_buckets=16,
        )
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)

    store = read_upsert_store(spark, f"{work}/rollup_store")
    n = store.count()
    print(f"\nrollup store: {n} (window, event_type) rows")
    store.orderBy("window_start", "event_type").show(8, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()

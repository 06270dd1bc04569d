"""Streaming HLL distinct store: batch equivalence, cross-batch
accumulation, and replay idempotency (the property additive counters
lack)."""

from pyspark.sql import functions as F

from hermes_spark.operators import hll_distinct, hll_state
from hermes_spark.streaming import (
    hll_distinct_sink,
    hll_store_estimates,
    read_hll_store,
)


def _write_batch(spark, src, lo, hi, mod):
    spark.range(lo, hi).select(
        (F.col("id") % 3).cast("string").alias("seg"),
        (F.col("id") % mod).alias("uid"),
    ).write.mode("append").parquet(src)


def _run(spark, src, store, ckpt, portable=True):
    stream = spark.readStream.schema("seg string, uid long").parquet(src)
    q = (
        hll_distinct_sink(stream, store, ["seg"], "uid", p=10, portable=portable)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_store_matches_batch_state(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, 0, 5000, 700)
    _run(spark, src, store, ckpt)

    batch = spark.read.parquet(src)
    direct = hll_state(batch, ["seg"], "uid", p=10)
    stored = read_hll_store(spark, store)
    assert stored.exceptAll(direct).count() == 0
    assert direct.exceptAll(stored).count() == 0

    est = {r["seg"]: r["distinct_est"] for r in
           hll_store_estimates(spark, store, ["seg"], p=10).collect()}
    want = {r["seg"]: r["e"] for r in
            hll_distinct(batch, ["seg"], "uid", p=10)
            .select("seg", F.col("distinct_est").alias("e")).collect()}
    assert est == want


def test_stream_store_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, 0, 3000, 900)
    _run(spark, src, store, ckpt)
    _write_batch(spark, src, 3000, 6000, 900)
    _run(spark, src, store, ckpt)

    direct = hll_state(spark.read.parquet(src), ["seg"], "uid", p=10)
    stored = read_hll_store(spark, store)
    assert stored.exceptAll(direct).count() == 0
    assert direct.exceptAll(stored).count() == 0


def test_stream_store_replay_idempotent(spark, tmp_path):
    """Re-processing the same data from a FRESH checkpoint (full replay)
    must not change the store — the register max-merge absorbs
    duplicates, where an additive counter would double count."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    _write_batch(spark, src, 0, 4000, 800)
    _run(spark, src, store, str(tmp_path / "ckpt1"))
    before = sorted(map(tuple, read_hll_store(spark, store).collect()))
    # fresh checkpoint: the whole source replays into the existing store
    _run(spark, src, store, str(tmp_path / "ckpt2"))
    after = sorted(map(tuple, read_hll_store(spark, store).collect()))
    assert before == after


def test_stream_store_fast_hash_variant(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    _write_batch(spark, src, 0, 4000, 650)
    _run(spark, src, store, str(tmp_path / "ckpt"), portable=False)
    est = hll_store_estimates(spark, store, ["seg"], p=10).collect()
    exact = {r["seg"]: r["x"] for r in spark.read.parquet(src)
             .groupBy("seg").agg(F.countDistinct("uid").alias("x")).collect()}
    for r in est:
        assert abs(r["distinct_est"] - exact[r["seg"]]) / exact[r["seg"]] < 0.15

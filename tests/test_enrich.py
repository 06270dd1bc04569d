"""Stream-static enrichment + partition-overwrite upsert sink
(streaming/enrich.py)."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators.cdc import latest_by_key
from hermes_spark.streaming import enrich_stream, read_upsert_store, upsert_sink


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()


def test_enrich_batch_semantics_and_broadcast_plan(spark):
    events = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "zzz", 5.0)], ["eid", "k", "v"]
    )
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")], ["k", "name"])
    out = enrich_stream(events, dim, on=["k"])
    rows = {r["eid"]: r["name"] for r in out.collect()}
    assert rows == {1: "alpha", 2: "beta", 3: None}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_enrich_stream_joins_static_dim(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "a"), (2, "b")], ["eid", "k"]).write.parquet(src)
    dim = spark.createDataFrame([("a", "alpha"), ("b", "beta")], ["k", "name"])
    stream = spark.readStream.schema("eid long, k string").parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        enrich_stream(stream, dim, on=["k"])
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    got = {r["eid"]: r["name"] for r in spark.read.parquet(out_dir).collect()}
    assert got == {1: "alpha", 2: "beta"}


def test_upsert_sink_latest_state_across_batches(spark, tmp_path):
    """Two availableNow runs over a growing file source; the store must
    equal latest_by_key over ALL updates (newest ts wins)."""
    src = str(tmp_path / "updates")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [(1, 100, "v1"), (2, 100, "v1"), (1, 200, "v2")]
    spark.createDataFrame(batch1, ["k", "ts", "val"]).write.mode(
        "append"
    ).parquet(src)

    def run():
        stream = spark.readStream.schema("k long, ts long, val string").parquet(src)
        q = (
            upsert_sink(stream, store, keys=["k"], order_col="ts", num_buckets=4)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    run()
    got = {r["k"]: (r["ts"], r["val"]) for r in read_upsert_store(spark, store).collect()}
    assert got == {1: (200, "v2"), 2: (100, "v1")}

    # second run: update key 2, add key 3; key 1 untouched (its bucket may
    # not even be rewritten)
    batch2 = [(2, 300, "v9"), (3, 50, "new")]
    spark.createDataFrame(batch2, ["k", "ts", "val"]).write.mode(
        "append"
    ).parquet(src)
    run()
    got = {r["k"]: (r["ts"], r["val"]) for r in read_upsert_store(spark, store).collect()}
    all_updates = spark.createDataFrame(batch1 + batch2, ["k", "ts", "val"])
    want = {
        r["k"]: (r["ts"], r["val"])
        for r in latest_by_key(all_updates, ["k"], "ts").collect()
    }
    assert got == want


def test_upsert_sink_replay_idempotent(spark, tmp_path):
    """Re-processing the same data with a FRESH checkpoint (worst-case
    full replay) leaves the store in the same state."""
    src = str(tmp_path / "updates")
    store = str(tmp_path / "store")
    rows = [(1, 1, "a"), (1, 2, "b"), (2, 1, "x")]
    spark.createDataFrame(rows, ["k", "ts", "val"]).write.parquet(src)

    for attempt in range(2):  # second pass replays everything
        stream = spark.readStream.schema("k long, ts long, val string").parquet(src)
        q = (
            upsert_sink(stream, store, keys=["k"], order_col="ts", num_buckets=2)
            .option("checkpointLocation", str(tmp_path / f"ckpt{attempt}"))
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        got = sorted(
            (r["k"], r["ts"], r["val"])
            for r in read_upsert_store(spark, store).collect()
        )
        assert got == [(1, 2, "b"), (2, 1, "x")]


def test_upsert_sink_order_tie_goes_to_newest_batch(spark, tmp_path):
    """Restating a key with an UNCHANGED order_col (e.g. re-aggregating
    a window keyed by window_end) must replace the stale value even when
    the new value sorts lower — recency is the batch_id stamp, not the
    value columns."""
    src = str(tmp_path / "updates")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    def run(rows):
        spark.createDataFrame(rows, ["k", "ts", "val"]).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema("k long, ts long, val string").parquet(src)
        q = (
            upsert_sink(stream, store, keys=["k"], order_col="ts", num_buckets=2)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    run([(1, 100, "zzz")])
    run([(1, 100, "aaa")])  # same ts, lexically SMALLER value — must still win
    got = {r["k"]: r["val"] for r in read_upsert_store(spark, store).collect()}
    assert got == {1: "aaa"}


def test_upsert_sink_tie_survives_fresh_checkpoint_restart(spark, tmp_path):
    """Round-6 (r5 advisory): batch_id restarts at 0 when the stream is
    resumed with a NEW checkpoint directory; a restated key with a tied
    order_col must STILL replace the stored value (monotonic epoch
    re-stamp), not lose to the old incarnation's higher seq."""
    store = str(tmp_path / "store")

    def run(rows, src_name, ckpt_name):
        src = str(tmp_path / src_name)
        spark.createDataFrame(rows, ["k", "ts", "val"]).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema("k long, ts long, val string").parquet(src)
        q = (
            upsert_sink(stream, store, keys=["k"], order_col="ts", num_buckets=2)
            .option("checkpointLocation", str(tmp_path / ckpt_name))
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    # first incarnation: two micro-batch runs push the stored seq past 0
    run([(1, 100, "old1")], "src_a", "ckpt_a")
    run([(1, 100, "old2"), (2, 10, "x")], "src_a", "ckpt_a")
    got = {r["k"]: r["val"] for r in read_upsert_store(spark, store).collect()}
    assert got[1] == "old2"
    # fresh checkpoint + fresh source: batch_id is 0 again; the tied
    # restatement must still win
    run([(1, 100, "fresh")], "src_b", "ckpt_b")
    got = {r["k"]: r["val"] for r in read_upsert_store(spark, store).collect()}
    assert got == {1: "fresh", 2: "x"}


def test_upsert_sink_schema_evolution_keeps_new_columns(spark, tmp_path):
    """A batch with a column the store lacks must surface it (null in
    old rows), not silently drop it."""
    store = str(tmp_path / "store")

    def run(df, schema, src, ckpt):
        df.write.parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            upsert_sink(stream, store, keys=["k"], order_col="ts", num_buckets=2)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    run(
        spark.createDataFrame([(1, 100, "a")], ["k", "ts", "val"]),
        "k long, ts long, val string",
        str(tmp_path / "src1"),
        str(tmp_path / "ckpt1"),
    )
    run(
        spark.createDataFrame([(2, 100, "b", 7.5)], ["k", "ts", "val", "score"]),
        "k long, ts long, val string, score double",
        str(tmp_path / "src2"),
        str(tmp_path / "ckpt2"),
    )
    got = {
        r["k"]: (r["val"], r["score"])
        for r in read_upsert_store(spark, store).collect()
    }
    assert got == {1: ("a", None), 2: ("b", 7.5)}

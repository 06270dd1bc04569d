"""Structured Streaming extension tests: rollup vs batch equivalence,
continuous compare via foreachBatch, stateful sessionization."""

import time

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators.sessionize import sessionize
from hermes_spark.streaming import compare_stream, sessionize_stream, windowed_rollup


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written as micros-timestamp parquet (streaming-readable)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = str(tmp_path_factory.mktemp("stream") / "events")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not dict(events.dtypes).get("ts", "").startswith("timestamp"):
        # nanos-as-long path: truncate to micros
        events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    events.withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(out)
    return out


def _await(query, timeout=120):
    query.awaitTermination(timeout)
    if query.isActive:
        query.stop()


def test_windowed_rollup_stream_matches_batch(spark, events_dir):
    batch = spark.read.parquet(events_dir)
    expected = {
        (r.window_start, r.event_type): r.n_events
        for r in windowed_rollup(
            batch, "ts", "1 hour", group_cols=("event_type",)
        ).collect()
    }

    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    rolled = windowed_rollup(
        stream, "ts", "1 hour", watermark="2 hours", group_cols=("event_type",)
    )
    query = (
        rolled.writeStream.format("memory")
        .queryName("rollup_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(query)
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM rollup_out").collect()
    }
    assert got == expected


def test_compare_stream_detects_differences(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(500)
    mutated_dir = str(tmp_path / "mutated")
    (
        orders.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 50 == 0, F.lit(0.0)).otherwise(
                F.col("o_totalprice")
            ),
        ).write.parquet(mutated_dir)
    )
    results = []
    stream = spark.readStream.schema(orders.schema).parquet(mutated_dir)
    query = compare_stream(
        orders,
        stream,
        keys=["o_orderkey"],
        on_result=lambda bid, res: results.append(res),
        trigger={"availableNow": True},
        checkpointLocation=str(tmp_path / "ckpt"),
    )
    _await(query)
    assert len(results) >= 1
    total_diff = sum(r.diff_count for r in results)
    expected_bad = orders.filter(F.col("o_orderkey") % 50 == 0).count()
    assert total_diff == expected_bad
    # restricted-reference mode: each batch compares against <= batch rows
    assert all(r.ref_row_count <= 500 for r in results)


def test_sessionize_stream_closes_sessions_on_timeout(spark, tmp_path):
    """Two bursts 2h apart for one user: the event-time timeout (driven
    past by the second burst's watermark) closes the first session."""
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 10:20:00"),
        (2, "2024-01-01 10:05:00"),
        (1, "2024-01-01 14:00:00"),
        (1, "2024-01-01 14:05:00"),
    ]
    src = str(tmp_path / "events")
    (
        spark.createDataFrame(rows, ["user_id", "ts_str"])
        .select("user_id", F.to_timestamp("ts_str").alias("ts"))
        .write.parquet(src)
    )
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    sessions = sessionize_stream(
        stream, "user_id", "ts", gap_seconds=1800, watermark="0 seconds"
    )
    query = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(query)
    got = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # the 10:00-10:20 session (3 events) closes once the 14:00 burst moves
    # event time past its timeout; open sessions (14:00 burst, user 2's
    # single event) remain in state
    assert ("1", "2024-01-01 10:00:00", 3) in got


def test_batch_sessionize_semantics(spark):
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-01 10:10:00"),
        (1, "2024-01-01 11:30:00"),
        (2, "2024-01-01 09:00:00"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_str"]).select(
        "user_id", F.to_timestamp("ts_str").alias("ts")
    )
    got = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events)
        for r in sessionize(df, "user_id", "ts", gap_seconds=1800).collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2),
        (1, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1),
        (2, "2024-01-01 09:00:00", "2024-01-01 09:00:00", 1),
    }


def test_rollup_watermark_drops_late_rows(spark, tmp_path):
    """Late rows beyond the watermark are dropped, on-time windows emit
    once the watermark passes them — exercised across two checkpointed
    availableNow runs (state persists between runs)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(rows, path):
        (
            spark.createDataFrame(rows, ["ts_str", "k"])
            .select(F.to_timestamp("ts_str").alias("ts"), "k")
            .write.mode("append").parquet(path)
        )

    # run 1: events 10:00-12:00; watermark 1h -> max 12:00 puts the
    # watermark at 11:00, so only the [10:00, 11:00) window emits
    write_batch(
        [("2024-01-01 10:05:00", "a"), ("2024-01-01 10:40:00", "a"),
         ("2024-01-01 11:10:00", "a"), ("2024-01-01 12:00:00", "a")],
        src,
    )
    schema = spark.read.parquet(src).schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            windowed_rollup(stream, "ts", "1 hour", watermark="1 hour",
                            group_cols=("k",))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        _await(q)

    run_once()
    # run 2: one LATE row (08:30, window long past the watermark -> must
    # be dropped) and one on-time row advancing the watermark
    write_batch(
        [("2024-01-01 08:30:00", "a"), ("2024-01-01 12:30:00", "a")], src
    )
    run_once()

    got = {
        (str(r.window_start), r.n_events)
        for r in spark.read.parquet(out).collect()
    }
    assert ("2024-01-01 10:00:00", 2) in got     # on-time window emitted
    assert not any(w.startswith("2024-01-01 08") for w, _ in got)  # late dropped


def test_gapfill_rollup_zero_and_locf(spark):
    from hermes_spark.operators import gapfill_rollup

    rows = [
        ("2024-01-01 10:15:00", "a", 5.0),
        ("2024-01-01 13:45:00", "a", 7.0),  # 11:00 and 12:00 are gaps
    ]
    df = spark.createDataFrame(rows, ["ts_str", "k", "value"]).select(
        F.to_timestamp("ts_str").alias("ts"), "k", "value"
    )
    zero = {
        str(r.bucket): (r.n_events, r.sum_value)
        for r in gapfill_rollup(df, "ts", "value", group_cols=("k",)).collect()
    }
    assert zero == {
        "2024-01-01 10:00:00": (1, 5.0),
        "2024-01-01 11:00:00": (0, 0.0),
        "2024-01-01 12:00:00": (0, 0.0),
        "2024-01-01 13:00:00": (1, 7.0),
    }
    locf = {
        str(r.bucket): r.sum_value
        for r in gapfill_rollup(
            df, "ts", "value", group_cols=("k",), fill="locf"
        ).collect()
    }
    assert locf["2024-01-01 11:00:00"] == 5.0
    assert locf["2024-01-01 12:00:00"] == 5.0
    assert locf["2024-01-01 13:00:00"] == 7.0


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    from hermes_spark.streaming import stream_exact_dedup

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def write_batch(rows):
        spark.createDataFrame(rows, ["doc_id", "text", "ts_str"]).select(
            "doc_id", "text", F.to_timestamp("ts_str").alias("ts")
        ).write.mode("append").parquet(src)

    def run_once(schema):
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_exact_dedup(stream, "text", ts_col="ts", watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        _await(q)

    write_batch([
        (1, "the quick brown fox", "2024-01-01 10:00:00"),
        (2, "THE  quick brown fox", "2024-01-01 10:01:00"),  # normalized dup
        (3, "something else", "2024-01-01 10:02:00"),
    ])
    schema = spark.read.parquet(src).schema
    run_once(schema)
    # second batch: a cross-batch duplicate within the watermark + new doc
    write_batch([
        (4, "the quick  BROWN fox", "2024-01-01 10:30:00"),
        (5, "genuinely new", "2024-01-01 10:31:00"),
    ])
    run_once(schema)

    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # one of {1,2} survives, 3 survives, 4 deduped cross-batch, 5 survives
    assert 3 in ids and 5 in ids and 4 not in ids
    assert len([i for i in ids if i in (1, 2)]) == 1


def test_stream_minhash_dedup_across_batches(spark, tmp_path):
    """Near-dup (not byte-identical) re-posts are dropped across
    micro-batches; genuinely new docs survive and enter the store."""
    from hermes_spark.streaming import stream_minhash_dedup

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the rain in spain stays mainly on the plain"
    )
    other = (
        "completely different content about spark structured streaming "
        "watermarks state stores and micro batch execution semantics"
    )

    def write_batch(rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "append"
        ).parquet(src)

    def run_once(schema):
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_minhash_dedup(
            stream,
            state_path=state,
            output_path=out,
            min_jaccard=0.5,
            checkpointLocation=ckpt,
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

    # within-batch near-dups: 1 and 2 differ by one word
    write_batch([(1, base), (2, base + " extra"), (3, other)])
    schema = spark.read.parquet(src).schema
    run_once(schema)
    # cross-batch near-dup of 1, plus a new doc
    write_batch([(4, base.replace("lazy", "sleepy")), (5, "short new thing")])
    run_once(schema)

    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 3, 5], ids


def test_progress_recorder_collects_batch_metrics(spark, tmp_path):
    import time

    from hermes_spark.streaming import ProgressRecorder

    src = str(tmp_path / "psrc")
    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    rec = ProgressRecorder().attach(spark)
    try:
        q = (
            spark.readStream.schema(schema).parquet(src)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "pckpt"))
            .trigger(availableNow=True)
            .start()
        )
        _await(q)
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline and rec.total_input_rows() < 50:
            time.sleep(0.5)
    finally:
        rec.detach(spark)

    assert rec.total_input_rows() == 50
    assert rec.records[0]["batch_id"] == 0
    assert rec.records[0]["batch_duration_ms"] is not None


def test_windowed_rollup_sliding_batch_semantics(spark):
    """slide_duration produces hopping windows: each event lands in
    window/slide windows (batch-mode check, same code path)."""
    from hermes_spark.streaming import windowed_rollup

    df = spark.createDataFrame(
        [("2024-01-01 00:07:00", "a", 1.0)], ["ts_s", "event_type", "value"]
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    out = windowed_rollup(
        df, "ts", "10 minutes", group_cols=("event_type",),
        slide_duration="5 minutes",
    ).collect()
    starts = sorted(str(r.window_start) for r in out)
    assert starts == ["2024-01-01 00:00:00", "2024-01-01 00:05:00"]
    assert all(r.n_events == 1 for r in out)


def test_stream_minhash_dedup_replay_idempotent(spark, tmp_path):
    """Checkpoint-loss replay is idempotent: reprocessing an already-
    accepted batch appends no new output rows and no new unique store
    entries, because each replayed doc matches its own signature in the
    store (the docstring's at-least-once claim).  A fresh batch after
    the replay still processes normally."""
    import shutil

    from hermes_spark.streaming import stream_minhash_dedup

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different content about spark shuffle partitions"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_minhash_dedup(
            stream,
            state_path=state,
            output_path=out,
            min_jaccard=0.5,
            checkpointLocation=str(tmp_path / ckpt),
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

    run_once("ckpt1")
    ids_before = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids_before == [1, 2]
    store_unique_before = (
        spark.read.parquet(state).dropDuplicates(["__band", "__id"]).count()
    )

    # lose the checkpoint -> the whole source replays (at-least-once)
    run_once("ckpt2")
    ids_after = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids_after == ids_before  # no duplicate survivors
    store_unique_after = (
        spark.read.parquet(state).dropDuplicates(["__band", "__id"]).count()
    )
    assert store_unique_after == store_unique_before

    # engine still accepts genuinely new docs after the replay
    spark.createDataFrame(
        [(3, "yet another unique document body entirely")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run_once("ckpt2")
    ids_final = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids_final == [1, 2, 3]


def test_stream_minhash_store_compaction(spark, tmp_path):
    """Store compaction (r12): replay-appended duplicate rows are
    reclaimed, the surviving document set is unchanged when compaction
    runs BETWEEN replayed batches, and the compact_every knob compacts
    from inside the query.  Near-dups are still caught against the
    compacted store."""
    import glob

    from hermes_spark.streaming import (
        compact_minhash_store,
        stream_minhash_dedup,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different content about spark shuffle partitions"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def run_once(ckpt, **kw):
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_minhash_dedup(
            stream, state_path=state, output_path=out, min_jaccard=0.5,
            checkpointLocation=str(tmp_path / ckpt),
            trigger={"availableNow": True}, **kw,
        )
        q.awaitTermination(120)

    run_once("ckpt1", compact_every=1)  # knob exercised in-query
    raw_rows = spark.read.parquet(state).count()

    # a clean replay appends NOTHING (replayed docs match their own
    # store signatures and are dropped) — store duplicates only arise
    # from partial-append crash windows, so manufacture that state
    run_once("ckpt2")
    assert spark.read.parquet(state).count() == raw_rows
    bloat = spark.read.parquet(state)
    bloat.write.mode("append").parquet(state)
    assert spark.read.parquet(state).count() == 2 * raw_rows
    n = compact_minhash_store(spark, state)
    assert n == raw_rows  # back to the unique (band, id) set
    assert spark.read.parquet(state).count() == raw_rows
    assert not glob.glob(state + "__*")  # tmp/trash cleaned up

    # replay after compaction: survivors unchanged (idempotent)
    run_once("ckpt3")
    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 2]

    # a near-dup of doc 1 is still caught against the compacted store
    spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog again and again!")],
        "doc_id long, text string",
    ).write.mode("append").parquet(src)
    run_once("ckpt3")
    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 2]


def test_anomaly_stream_matches_batch(spark, tmp_path):
    """Streaming trailing z-score equals rolling_anomalies over the
    gap-filled batch rollup, for every bucket the stream has closed."""
    from hermes_spark.operators.gapfill import gapfill_rollup, rolling_anomalies
    from hermes_spark.streaming import anomaly_stream

    base = 1_700_000_000 - (1_700_000_000 % 3600)
    rows = []
    for i in range(48):
        for key, extra in (("a", 0), ("b", 1)):
            n = 1 + (i % 3) + extra
            if key == "a" and i == 40:
                n = 60  # spike
            if key == "a" and i == 20:
                n = 0  # quiet bucket -> zero-filled by both paths
            for j in range(n):
                rows.append((key, base + i * 3600 + 60 * j))
    src = str(tmp_path / "anom_events")
    (
        spark.createDataFrame(rows, "event_type string, epoch long")
        .select("event_type", F.timestamp_seconds("epoch").alias("ts"))
        .write.parquet(src)
    )
    batch = spark.read.parquet(src)

    LOOKBACK = 6
    dense = gapfill_rollup(batch, "ts", "ts", unit="hour", group_cols=("event_type",))
    expected_rows = rolling_anomalies(
        dense, "bucket", "n_events", group_cols=("event_type",), lookback=LOOKBACK
    ).collect()
    expected = {
        (r.event_type, r.bucket): (r.n_events, r.expected, r.zscore, r.is_anomaly)
        for r in expected_rows
    }

    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = anomaly_stream(
        stream, "event_type", "ts", bucket_seconds=3600, lookback=LOOKBACK
    )
    query = (
        out.writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(query)
    got = spark.sql("SELECT * FROM anom_out").collect()

    # every bucket except each key's last (still open) must have closed
    assert len(got) >= 2 * 46
    spike_seen = False
    for r in got:
        exp = expected[(r.key, r.bucket)]
        assert r.n_events == exp[0], (r.key, r.bucket)
        for got_v, exp_v in ((r.expected, exp[1]), (r.zscore, exp[2])):
            if exp_v is None:
                assert got_v is None, (r.key, r.bucket)
            else:
                assert got_v is not None and abs(got_v - exp_v) <= 1e-3
        assert r.is_anomaly == exp[3], (r.key, r.bucket)
        if r.key == "a" and r.n_events == 60:
            spike_seen = True
            assert r.is_anomaly
    assert spike_seen


def test_anomaly_stream_state_across_batches(spark, tmp_path):
    """State (trailing window + open frontier) carries across
    micro-batches: a second file closes the first file's open bucket."""
    from hermes_spark.streaming import anomaly_stream

    base = 1_700_000_000 - (1_700_000_000 % 3600)
    src = str(tmp_path / "anom_two")
    first = [("k", base + i * 3600 + 60 * j) for i in range(10) for j in range(1 + i % 2)]
    second = [("k", base + i * 3600 + 60 * j) for i in range(10, 16) for j in range(2)]
    schema = "event_type string, epoch long"
    (
        spark.createDataFrame(first, schema)
        .select("event_type", F.timestamp_seconds("epoch").alias("ts"))
        .coalesce(1).write.mode("append").parquet(src)
    )
    (
        spark.createDataFrame(second, schema)
        .select("event_type", F.timestamp_seconds("epoch").alias("ts"))
        .coalesce(1).write.mode("append").parquet(src)
    )
    batch = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = anomaly_stream(stream, "event_type", "ts", bucket_seconds=3600, lookback=4)
    query = (
        out.writeStream.format("memory")
        .queryName("anom_two_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(query)
    got = {r.bucket.timestamp(): r.n_events for r in spark.sql(
        "SELECT * FROM anom_two_out WHERE key = 'k'").collect()}
    # buckets 0..14 closed (15 still open); no duplicates
    assert len(got) == 15
    for i in range(15):
        want = (1 + i % 2) if i < 10 else 2
        assert got[base + i * 3600] == want, i


def test_stream_minhash_dedup_mega_cluster_in_batch(spark, tmp_path):
    """Round-6: a micro-batch containing a near-identical cluster LARGER
    than max_bucket_size must still collapse to one survivor (the
    oversized-bucket collapse is shared with the batch operator), and a
    later re-post must be dropped against the stored survivor."""
    from hermes_spark.streaming import stream_minhash_dedup

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = (
        "boilerplate template page shared by every mirror of this site "
        "with navigation headers footers and the same inline disclaimers"
    )
    other = "genuinely novel document about star connected components"

    def write_batch(rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.mode(
            "append"
        ).parquet(src)

    def run_once(schema):
        stream = spark.readStream.schema(schema).parquet(src)
        q = stream_minhash_dedup(
            stream,
            state_path=state,
            output_path=out,
            min_jaccard=0.5,
            max_bucket_size=50,  # << the 300-member cluster
            checkpointLocation=ckpt,
            trigger={"availableNow": True},
        )
        q.awaitTermination(180)

    # 300 byte-distinct near-identical docs (unique suffix) + 1 novel
    write_batch(
        [(i, f"{base} v{i}") for i in range(300)] + [(900, other)]
    )
    schema = spark.read.parquet(src).schema
    run_once(schema)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == [0, 900], first  # pre-fix: all 300 survived

    # re-post of the cluster in a later batch: dropped against history
    write_batch([(1000, f"{base} v1000"), (1001, "another new topic entirely")])
    run_once(schema)
    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids == [0, 900, 1001], ids


def test_stream_minhash_compaction_crash_recovery(spark, tmp_path):
    """r12 review fix: a crash between the two compaction swap moves
    must NOT present as an empty store on the next batch (which would
    silently re-accept the entire history).  Both crash windows roll
    back automatically; remote store paths are refused loudly."""
    import os
    import shutil

    import pytest as _pytest

    from hermes_spark.streaming import (
        compact_minhash_store,
        stream_minhash_dedup,
    )
    from hermes_spark.streaming.dedup import _recover_minhash_store

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words entirely here for the second doc")],
        "doc_id long, text string",
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def run(ck):
        q = stream_minhash_dedup(
            spark.readStream.schema(schema).parquet(src),
            state_path=state, output_path=out, min_jaccard=0.5,
            checkpointLocation=str(tmp_path / ck),
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)

    run("ck1")
    rows = spark.read.parquet(state).count()

    # window A: old store in trash, tmp incomplete (no _SUCCESS) —
    # the next batch's read must recover, not start from empty
    shutil.move(state, state + "__trash")
    os.makedirs(state + "__compact_tmp")
    run("ck2")  # replay everything
    assert spark.read.parquet(state).count() == rows
    ids = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert ids == [1, 2]  # history NOT re-accepted

    # window B: tmp complete (_SUCCESS), store gone — roll forward
    shutil.move(state, state + "__compact_tmp")
    _recover_minhash_store(state)
    assert spark.read.parquet(state).count() == rows
    assert not os.path.exists(state + "__compact_tmp")

    # remote paths refused before any swap is attempted
    with _pytest.raises(ValueError, match="remote URI"):
        compact_minhash_store(spark, "s3a://bucket/state")

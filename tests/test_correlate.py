"""Stream-stream interval join (streaming/correlate.py): batch
equivalence, state-bounded inner join, last-touch attribution."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hermes_spark.streaming import interval_join_streams, last_touch

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def clicks_and_imps(spark):
    clicks = spark.createDataFrame(
        [
            ("u1", "c1", _ts(60)),
            ("u1", "c2", _ts(200)),
            ("u2", "c3", _ts(65)),
            ("u3", "c4", _ts(70)),  # no impression for u3
        ],
        "user string, click_id string, click_ts timestamp",
    )
    imps = spark.createDataFrame(
        [
            ("u1", "i1", _ts(10)),  # 50 min before c1 -> match
            ("u1", "i2", _ts(55)),  # 5 min before c1 -> match (last touch)
            ("u1", "i3", _ts(90)),  # after c1, 110 min before c2 -> no match
            ("u2", "i4", _ts(64)),  # 1 min before c3 -> match
            ("u2", "i5", _ts(66)),  # after c3 -> no match
        ],
        "user string, imp_id string, imp_ts timestamp",
    )
    return clicks, imps


EXPECTED = {("c1", "i1"), ("c1", "i2"), ("c3", "i4")}


def test_batch_interval_join(clicks_and_imps):
    clicks, imps = clicks_and_imps
    out = interval_join_streams(
        clicks, imps, ["user"], "click_ts", "imp_ts", lookback="1 hour"
    )
    assert {(r.click_id, r.imp_id) for r in out.collect()} == EXPECTED


def test_stream_matches_batch(spark, clicks_and_imps, tmp_path):
    clicks, imps = clicks_and_imps
    cdir, idir = str(tmp_path / "clicks"), str(tmp_path / "imps")
    clicks.write.parquet(cdir)
    imps.write.parquet(idir)
    cs = spark.readStream.schema(clicks.schema).parquet(cdir)
    ims = spark.readStream.schema(imps.schema).parquet(idir)
    joined = interval_join_streams(
        cs, ims, ["user"], "click_ts", "imp_ts", lookback="1 hour",
        watermark="2 hours",
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("corr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()
    got = {
        (r.click_id, r.imp_id)
        for r in spark.sql("SELECT * FROM corr_out").collect()
    }
    assert got == EXPECTED


def test_right_prefix_and_collision_guard(spark):
    left = spark.createDataFrame(
        [("k", "a", _ts(0))], "key string, v string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", "b", _ts(0))], "key string, v string, ts timestamp"
    )
    with pytest.raises(ValueError):
        interval_join_streams(left, right, ["key"], "ts", "ts")
    out = interval_join_streams(
        left, right, ["key"], "ts", "ts", right_prefix="r_"
    )
    assert set(out.columns) == {"key", "v", "ts", "r_v", "r_ts"}
    row = out.collect()[0]
    assert row.v == "a" and row.r_v == "b"


def test_lookahead_window(clicks_and_imps):
    clicks, imps = clicks_and_imps
    # widen forward: impressions up to 5 min AFTER the click also match
    out = interval_join_streams(
        clicks, imps, ["user"], "click_ts", "imp_ts",
        lookback="1 hour", lookahead="5 minutes",
    )
    got = {(r.click_id, r.imp_id) for r in out.collect()}
    assert got == EXPECTED | {("c3", "i5")}


def test_left_outer_keeps_unmatched(clicks_and_imps):
    clicks, imps = clicks_and_imps
    out = interval_join_streams(
        clicks, imps, ["user"], "click_ts", "imp_ts",
        lookback="1 hour", join_type="left_outer",
    )
    rows = out.collect()
    unmatched = {r.click_id for r in rows if r.imp_id is None}
    assert unmatched == {"c2", "c4"}
    assert len(rows) == len(EXPECTED) + len(unmatched)


def test_last_touch_attribution(clicks_and_imps):
    clicks, imps = clicks_and_imps
    joined = interval_join_streams(
        clicks, imps, ["user"], "click_ts", "imp_ts", lookback="1 hour"
    )
    out = last_touch(joined, ["click_id"], "imp_ts", tie_break=["imp_id"])
    got = {(r.click_id, r.imp_id) for r in out.collect()}
    assert got == {("c1", "i2"), ("c3", "i4")}

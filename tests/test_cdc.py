"""CDC compaction + SCD2 history tests."""

from pyspark.sql import functions as F

from hermes_spark.operators.cdc import latest_by_key, scd2_history


def log(spark, rows):
    return spark.createDataFrame(rows, "k long, ts long, v string, op string")


def test_latest_by_key_picks_newest(spark):
    rows = [
        (1, 10, "a", "U"), (1, 20, "b", "U"),          # k=1 -> b
        (2, 10, "x", "U"),                              # k=2 -> x
        (3, 10, "m", "U"), (3, 30, "n", "D"),          # k=3 deleted last -> gone
        (4, 10, "p", "D"), (4, 20, "q", "U"),          # k=4 re-inserted -> q
    ]
    out = {r["k"]: r["v"] for r in latest_by_key(
        log(spark, rows), ["k"], "ts", op_col="op"
    ).collect()}
    assert out == {1: "b", 2: "x", 4: "q"}


def test_latest_by_key_tiebreak(spark):
    rows = [(1, 10, "a", "U"), (1, 10, "b", "U")]
    out = latest_by_key(log(spark, rows), ["k"], "ts", tiebreak=["v"]).collect()
    assert len(out) == 1 and out[0]["v"] == "b"  # 'b' > 'a' desc


def test_scd2_history_intervals(spark):
    rows = [
        (1, 10, "a", "U"), (1, 20, "b", "U"), (1, 40, "c", "U"),
        (2, 15, "x", "U"),
    ]
    out = scd2_history(log(spark, rows), ["k"], "ts").orderBy("k", "valid_from").collect()
    k1 = [r for r in out if r["k"] == 1]
    assert [(r["valid_from"], r["valid_to"], r["is_current"]) for r in k1] == [
        (10, 20, False), (20, 40, False), (40, None, True),
    ]
    k2 = [r for r in out if r["k"] == 2]
    assert k2[0]["valid_to"] is None and k2[0]["is_current"]


def test_scd2_collapses_same_timestamp(spark):
    rows = [(1, 10, "a", "U"), (1, 10, "b", "U"), (1, 20, "c", "U")]
    out = scd2_history(log(spark, rows), ["k"], "ts").orderBy("valid_from").collect()
    assert len(out) == 2                    # the two ts=10 rows collapsed
    assert out[0]["v"] == "b"               # deterministic: greatest remaining
    assert out[0]["valid_to"] == 20


def test_scd2_rerun_is_stable(spark):
    rows = [(1, 10, "a", "U"), (1, 20, "b", "U")]
    df = log(spark, rows)
    a = scd2_history(df, ["k"], "ts")
    b = scd2_history(df.repartition(7), ["k"], "ts")
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0

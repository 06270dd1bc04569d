"""As-of join semantics: backward match, equal-timestamp inclusion,
left-join nulls, per-key isolation."""

from pyspark.sql import functions as F

from hermes_spark.operators import asof_join


def _ts(spark, df, cols):
    return df.select(
        *[F.to_timestamp(c).alias(c) if c in cols else F.col(c)
          for c in df.columns]
    )


def test_asof_basic(spark):
    left = _ts(spark, spark.createDataFrame(
        [("A", "2024-01-01 10:00:00"),
         ("A", "2024-01-01 10:30:00"),
         ("A", "2024-01-01 09:00:00"),
         ("B", "2024-01-01 10:15:00")],
        ["k", "ts"]), ["ts"])
    right = _ts(spark, spark.createDataFrame(
        [("A", "2024-01-01 09:30:00", 1.0),
         ("A", "2024-01-01 10:30:00", 2.0),
         ("B", "2024-01-01 11:00:00", 9.0)],
        ["k", "rts", "rate"]), ["rts"])

    out = {(r.k, str(r.ts)): r.rate
           for r in asof_join(left, right, "ts", by=("k",),
                              right_ts_col="rts").collect()}
    assert out == {
        ("A", "2024-01-01 09:00:00"): None,   # no prior right row
        ("A", "2024-01-01 10:00:00"): 1.0,    # backward match
        ("A", "2024-01-01 10:30:00"): 2.0,    # equal timestamp included
        ("B", "2024-01-01 10:15:00"): None,   # B's rate is in the future
    }


def test_asof_no_by_keys(spark):
    left = _ts(spark, spark.createDataFrame(
        [("2024-01-01 10:00:00",), ("2024-01-01 12:00:00",)], ["ts"]), ["ts"])
    right = _ts(spark, spark.createDataFrame(
        [("2024-01-01 11:00:00", 5.0)], ["rts", "v"]), ["rts"])
    out = {str(r.ts): r.v
           for r in asof_join(left, right, "ts", right_ts_col="rts").collect()}
    assert out == {"2024-01-01 10:00:00": None, "2024-01-01 12:00:00": 5.0}


def test_asof_column_collision_rejected(spark):
    left = spark.createDataFrame([(1, 1.0)], ["ts", "v"])
    right = spark.createDataFrame([(1, 2.0)], ["ts", "v"])
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, "ts")

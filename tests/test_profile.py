"""Profiling report tests (operators/profile.py)."""

from pyspark.sql import functions as F


def test_skew_report_orders_and_pct(spark):
    from hermes_spark.operators import skew_report

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, ["k"]
    )
    rows = skew_report(df, ["k"], top_n=2).collect()
    assert [(r.k, r.cnt, r.rank) for r in rows] == [("a", 6, 1), ("b", 3, 2)]
    assert abs(rows[0].pct - 0.6) < 1e-9


def test_column_profile_counts(spark):
    from hermes_spark.operators import column_profile

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")],
        "a int, b string",
    )
    got = {r.column: r for r in column_profile(df, ["a", "b"]).collect()}
    assert got["a"].n_rows == 4 and got["a"].n_null == 1
    assert got["a"].n_distinct == 3
    assert got["b"].n_null == 1 and got["b"].n_distinct == 2
    assert abs(got["b"].null_pct - 0.25) < 1e-9

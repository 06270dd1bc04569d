"""Profiling report tests (operators/profile.py)."""

import pytest
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


def test_winsorize_clips_outliers(spark):
    from hermes_spark.operators import winsorize

    rows = [("a", float(i)) for i in range(1, 100)] + [("a", 1e9), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", ["g"], lower=0.1, upper=0.9)
    got = out.filter("g = 'a'").agg(F.max("v_w"), F.min("v_w")).collect()[0]
    assert got[0] < 1e6  # the 1e9 outlier is clipped to ~p90
    assert got[1] >= 10.0  # low tail clipped to ~p10
    # group b untouched shape: single value clips to itself
    assert out.filter("g = 'b'").collect()[0]["v_w"] == 5.0


def test_histogram_buckets(spark):
    from hermes_spark.operators import histogram

    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = histogram(df, "v", bins=4, lo=0.0, hi=100.0).collect()
    assert [r.bucket for r in out] == [0, 1, 2, 3]
    assert [r.cnt for r in out] == [25, 25, 25, 25]
    assert out[0].lo == 0.0 and out[-1].hi == 100.0
    # out-of-range clamps to edge buckets
    df2 = spark.createDataFrame([(-5.0,), (500.0,)], "v double")
    got = {r.bucket: r.cnt for r in histogram(df2, "v", bins=4, lo=0.0, hi=100.0).collect()}
    assert got == {0: 1, 3: 1}


def test_approx_profile_close_to_exact(spark, sf_dir):
    from hermes_spark.operators import approx_column_profile, column_profile

    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {r.column: r for r in column_profile(df, ["o_custkey"]).collect()}
    approx = {
        r.column: r
        for r in approx_column_profile(df, ["o_custkey"], rsd=0.05).collect()
    }
    e, a = exact["o_custkey"], approx["o_custkey"]
    assert a.n_rows == e.n_rows and a.n_null == e.n_null
    assert abs(a.n_distinct - e.n_distinct) <= max(3, 0.15 * e.n_distinct)


def test_zorder_key_interleaves_bits(spark):
    from hermes_spark.operators import zorder_key

    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "x int, y int")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=4).alias("z")).collect()
    }
    # x occupies even bit positions, y odd: z(1,0)=1, z(0,1)=2, z(3,3)=15
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 3): 15}


def test_zorder_sort_clusters_both_dims(spark):
    """Rows adjacent in z-order are close in both dimensions: the key's
    upper bits partition the plane into quadrant blocks."""
    from hermes_spark.operators import zorder_key

    df = spark.createDataFrame(
        [(x, y) for x in range(8) for y in range(8)], "x int, y int"
    )
    rows = (
        df.select("x", "y", zorder_key(["x", "y"], bits=3).alias("z"))
        .orderBy("z")
        .collect()
    )
    # first quarter of the sort order is exactly the low-low quadrant
    first16 = rows[:16]
    assert all(r.x < 4 and r.y < 4 for r in first16)


def test_rolling_anomalies_flags_spike(spark):
    from hermes_spark.operators.gapfill import rolling_anomalies
    from pyspark.sql import functions as F

    # 30 steady buckets of ~10 then one 100-spike, per one group
    rows = [("a", i, 10 + (i % 3)) for i in range(30)] + [("a", 30, 100)]
    df = spark.createDataFrame(rows, "g string, bucket int, n long")
    out = rolling_anomalies(df, "bucket", "n", group_cols=["g"], lookback=24)
    flagged = [r["bucket"] for r in out.filter(F.col("is_anomaly")).collect()]
    assert flagged == [30]
    # warm-up prefix (first 24 buckets) carries no expectation
    warm = out.filter(F.col("bucket") < 24).filter(F.col("expected").isNotNull())
    assert warm.count() == 0
    spike = out.filter(F.col("bucket") == 30).first()
    assert spike["zscore"] > 3 and abs(spike["expected"] - 11.0) < 1.5


def test_rolling_anomalies_zero_variance_not_anomalous(spark):
    from hermes_spark.operators.gapfill import rolling_anomalies
    from pyspark.sql import functions as F

    rows = [("a", i, 5) for i in range(40)]  # perfectly flat series
    df = spark.createDataFrame(rows, "g string, bucket int, n long")
    out = rolling_anomalies(df, "bucket", "n", group_cols=["g"], lookback=24)
    assert out.filter(F.col("is_anomaly")).count() == 0


def test_mad_outlier_summary_matches_numpy(spark):
    import numpy as np

    from hermes_spark.operators import mad_outlier_summary

    rng = [float(v) for v in range(100)] + [1e6, -1e6]  # two gross outliers
    df = spark.createDataFrame([("a", v) for v in rng], ["g", "value"])
    row = mad_outlier_summary(df, "value", group_cols=["g"], k=3.0).collect()[0]
    arr = np.array(rng)
    med = np.median(arr)
    mad = np.median(np.abs(arr - med))
    assert row["med"] == pytest.approx(med, abs=1e-6)
    assert row["mad"] == pytest.approx(mad, abs=1e-6)
    assert row["n"] == len(rng)
    want_out = int((np.abs(arr - med) > 3.0 * 1.4826 * mad).sum())
    assert row["n_outliers"] == want_out == 2
    # med/mad themselves are uncontaminated by the outliers: they match
    # the clean subset's median/MAD
    clean = np.array(rng[:100])
    assert row["med"] == pytest.approx(np.median(clean), abs=1.0)
    assert row["mad"] == pytest.approx(
        np.median(np.abs(clean - np.median(clean))), abs=1.5
    )


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from hermes_spark.operators import weighted_sample

    rows = [(i, 1.0) for i in range(200)] + [(999, 1e9), (998, 0.0), (997, -1.0)]
    df = spark.createDataFrame(rows, ["id", "w"])
    s1 = {r["id"] for r in weighted_sample(df, "id", "w", n=20).collect()}
    s2 = {r["id"] for r in weighted_sample(df, "id", "w", n=20).collect()}
    assert s1 == s2 and len(s1) == 20  # deterministic, exact size
    assert 999 in s1  # astronomically-weighted row always drawn
    assert 998 not in s1 and 997 not in s1  # non-positive weights excluded
    # a different salt draws a different (but still deterministic) sample
    s3 = {r["id"] for r in weighted_sample(df, "id", "w", n=20, salt="other").collect()}
    assert 999 in s3 and s3 != s1

"""Funnel + cohort retention operator tests."""

from datetime import datetime

from pyspark.sql import functions as F

from hermes_spark.operators.funnel import cohort_retention, funnel_counts


def ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def t(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_funnel_counts_ordered_subsequence(spark):
    rows = [
        # user 1: full funnel in order
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "buy"),
        # user 2: clicks before viewing -> stops at view
        (2, t(1), "click"), (2, t(2), "view"),
        # user 3: view then click, no buy
        (3, t(1), "view"), (3, t(5), "click"),
        # user 4: nothing relevant
        (4, t(1), "error"),
        # user 5: full funnel with noise interleaved
        (5, t(1), "error"), (5, t(2), "view"), (5, t(3), "error"),
        (5, t(4), "click"), (5, t(5), "buy"),
    ]
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev(spark, rows), ["view", "click", "buy"]).collect()
    }
    assert out == {"view": 4, "click": 3, "buy": 2}


def test_funnel_requires_strict_time_order(spark):
    rows = [(1, t(1), "a"), (1, t(1), "b")]  # same timestamp: not strictly after
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev(spark, rows), ["a", "b"]).collect()
    }
    assert out == {"a": 1, "b": 0}


def test_cohort_retention_triangle(spark):
    # weeks are epoch-based buckets; use large day gaps to be unambiguous
    rows = [
        (1, t(1), "x"), (1, t(9), "x"),   # user 1: week w, back 1 week later
        (2, t(1), "x"),                    # user 2: week w only
        (3, t(9), "x"), (3, t(23), "x"),  # user 3: week w+1, back 2 weeks later
    ]
    out = cohort_retention(ev(spark, rows), granularity="week").collect()
    tri = {(r["cohort"], r["period_offset"]): r["n_users"] for r in out}
    cohorts = sorted({c for c, _ in tri})
    assert len(cohorts) == 2
    w0, w1 = cohorts
    assert tri[(w0, 0)] == 2      # users 1 and 2 start in week w
    assert tri[(w0, 1)] == 1      # user 1 returns next week
    assert tri[(w1, 0)] == 1      # user 3 starts in week w+1
    assert tri[(w1, 2)] == 1      # user 3 returns two weeks later
    assert sum(n for (_, o), n in tri.items() if o == 0) == 3


def test_cohort_day_granularity(spark):
    rows = [(1, t(1), "x"), (1, t(2), "x"), (1, t(4), "x")]
    out = cohort_retention(ev(spark, rows), granularity="day").collect()
    offsets = sorted(r["period_offset"] for r in out)
    assert offsets == [0, 1, 3]

"""Fractional-epoch upsampling: factor semantics, determinism,
monotonicity, budget planning, and the zero-shuffle plan."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import epoch_mix, plan_epochs
from hermes_spark.plans import count_exchanges, plan_operators


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("s"),
    )


def test_integer_factors_exact_copies(spark, corpus):
    out = epoch_mix(corpus, "k", "s", {"a": 3.0, "b": 1.0})
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 1500, "b": 500}
    # epoch index is 0-based and dense for whole copies
    assert sorted(
        r["epoch"] for r in out.filter("s = 'a' and k = 0").collect()
    ) == [0, 1, 2]


def test_fractional_factor_rate(spark, corpus):
    out = epoch_mix(corpus, "k", "s", {"a": 1.5})
    n = out.count()  # 500 base rows * 1.5 ~= 750
    assert abs(n - 750) < 60, n


def test_monotone_in_factor_and_deterministic(spark, corpus):
    lo = epoch_mix(corpus, "k", "s", {"a": 1.2})
    hi = epoch_mix(corpus, "k", "s", {"a": 1.9})
    assert lo.exceptAll(hi).count() == 0  # raising the factor only adds
    again = epoch_mix(corpus.repartition(7), "k", "s", {"a": 1.2})
    assert lo.exceptAll(again).count() == 0
    assert again.exceptAll(lo).count() == 0


def test_unlisted_strata_dropped_and_validation(spark, corpus):
    out = epoch_mix(corpus, "k", "s", {"a": 1.0})
    assert out.filter("s = 'b'").count() == 0
    with pytest.raises(ValueError):
        epoch_mix(corpus, "k", "s", {})
    with pytest.raises(ValueError):
        epoch_mix(corpus, "k", "s", {"a": -1.0})


def test_zero_shuffle_plan(spark, corpus):
    out = epoch_mix(corpus, "k", "s", {"a": 2.5, "b": 0.5})
    assert count_exchanges(out) == 0
    assert not any("Join" in op for op in plan_operators(out))


def test_plan_epochs_budget_math(spark):
    counts = {"wiki": 1_000, "crawl": 100_000}
    plan = plan_epochs(counts, {"wiki": 0.2, "crawl": 0.8}, budget_tokens=50_000)
    assert plan == {"wiki": 10.0, "crawl": 0.4}
    capped = plan_epochs(counts, {"wiki": 0.9, "crawl": 0.1},
                         budget_tokens=500_000, max_epochs=5)
    assert capped["wiki"] == 5.0  # capped, not 450
    with pytest.raises(ValueError):
        plan_epochs(counts, {"wiki": 0.5, "nope": 0.5}, budget_tokens=1000)


def test_plan_feeds_mix(spark, corpus):
    plan = plan_epochs({"a": 500, "b": 500}, {"a": 0.75, "b": 0.25}, 1000)
    out = epoch_mix(corpus.withColumn("tok", F.lit(1)), "k", "s", plan)
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["a"] - 750) < 60 and abs(counts["b"] - 250) < 50

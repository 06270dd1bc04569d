"""Count-min inner-product join-size estimation (sketch.py)."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators.sketch import cms_inner_product, cms_merge, cms_state

W = 4096  # wide enough that tiny key sets collide with ~0 probability


def _est(a_state, b_state, depth=3):
    return cms_inner_product(a_state, b_state, depth=depth).collect()[0].join_size_est


def test_exact_on_collision_free_sketch(spark):
    # f_a = {k1:2, k2:1}, f_b = {k1:3, k3:5} -> inner product 6
    a = spark.createDataFrame([("k1",), ("k1",), ("k2",)], "k string")
    b = spark.createDataFrame([("k1",)] * 3 + [("k3",)] * 5, "k string")
    sa = cms_state(a, "k", width=W)
    sb = cms_state(b, "k", width=W)
    assert _est(sa, sb) == 6
    # and it IS the equi-join cardinality
    assert a.join(b, "k").count() == 6


def test_zero_overlap(spark):
    a = spark.createDataFrame([("x%d" % i,) for i in range(10)], "k string")
    b = spark.createDataFrame([("y%d" % i,) for i in range(10)], "k string")
    assert _est(cms_state(a, "k", width=W), cms_state(b, "k", width=W)) == 0


def test_never_underestimates(spark):
    a = spark.range(500).select((F.col("id") % 37).cast("string").alias("k"))
    b = spark.range(800).select((F.col("id") % 53).cast("string").alias("k"))
    true_size = a.join(b, "k").count()
    # even at a narrow width the estimate can only exceed the truth
    for width in (64, 1024):
        est = _est(cms_state(a, "k", width=width), cms_state(b, "k", width=width))
        assert est >= true_size


def test_merge_then_estimate(spark):
    """Batch-accumulated states predict the union's join size."""
    b1 = spark.createDataFrame([("k1",), ("k2",)], "k string")
    b2 = spark.createDataFrame([("k1",), ("k1",)], "k string")
    probe = spark.createDataFrame([("k1",), ("k9",)], "k string")
    merged = cms_merge(
        cms_state(b1, "k", width=W), cms_state(b2, "k", width=W)
    )
    # union has f(k1)=3 -> inner product with probe (f(k1)=1) is 3
    assert _est(merged, cms_state(probe, "k", width=W)) == 3


def test_estimate_reads_only_state(spark):
    """The estimate plan touches no base table — only the two states."""
    a = spark.range(100).select(F.col("id").cast("string").alias("k"))
    sa = cms_state(a, "k", width=W).localCheckpoint(eager=True)
    sb = cms_state(a, "k", width=W).localCheckpoint(eager=True)
    plan = (
        cms_inner_product(sa, sb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "parquet" not in plan.lower()

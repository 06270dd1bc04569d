"""Property-based tests for the sketch family (hypothesis).

Invariants pinned on arbitrary small inputs:

- HLL registers are a pure function of the value SET (duplicates and
  partitioning never matter), merge is associative/commutative/
  idempotent, and estimates are exact-set-size-free of row order;
- a Python re-implementation of the register computation agrees with
  the Spark expressions for any values (the md5-portable path);
- CMS estimates never underestimate for any data/width, and the sketch
  of a union equals the merged sketches;
- KMV states are the true k smallest hashes (verified against a Python
  recomputation) and estimates are exact below k;
- q-digest bucket ids are monotone in the value (bucket order == value
  order) and decode brackets the original value within the documented
  relative error for in-range magnitudes.
"""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hermes_spark.operators.sketch import (
    HASH_BITS,
    _qd_cap,
    cms_estimate,
    cms_merge,
    cms_state,
    hll_merge,
    hll_state,
    kmv_state,
    qdigest_quantiles,
    qdigest_state,
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60)


def _py_hash60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _py_registers(values, p):
    w = HASH_BITS - p
    regs = {}
    for v in set(values):
        h = _py_hash60(v)
        bucket = h >> w
        rem = h & ((1 << w) - 1)
        rank = w + 1 - rem.bit_length() if rem else w + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


@given(vals=_vals)
@_settings
def test_hll_registers_match_python(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long").withColumn(
        "g", F.lit("g")
    )
    got = {
        r["bucket"]: r["max_rank"]
        for r in hll_state(df, ["g"], "v", p=10).collect()
    }
    assert got == _py_registers(vals, 10)


@given(vals=_vals, pivot=st.integers(min_value=0, max_value=500))
@_settings
def test_hll_merge_algebra(spark, vals, pivot):
    df = spark.createDataFrame([(v,) for v in vals], "v long").withColumn(
        "g", F.lit("g")
    )
    a = hll_state(df.filter(F.col("v") <= pivot), ["g"], "v", p=10)
    b = hll_state(df.filter(F.col("v") > pivot), ["g"], "v", p=10)
    ab = hll_merge(["g"], a, b)
    ba = hll_merge(["g"], b, a)
    aa = hll_merge(["g"], ab, a)  # idempotent: re-merging a is a no-op
    direct = hll_state(df, ["g"], "v", p=10)
    for m in (ab, ba, aa):
        assert m.exceptAll(direct).count() == 0
        assert direct.exceptAll(m).count() == 0


@given(vals=_vals)
@_settings
def test_cms_overestimates_only(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    state = cms_state(df, "v", depth=2, width=8)  # tiny: force collisions
    est = {
        r["v"]: r["est_count"]
        for r in cms_estimate(
            state, df.select("v").distinct(), "v", depth=2, width=8
        ).collect()
    }
    from collections import Counter

    truth = Counter(vals)
    assert all(est[v] >= c for v, c in truth.items())


@given(vals=_vals, pivot=st.integers(min_value=0, max_value=500))
@_settings
def test_cms_merge_is_union_sketch(spark, vals, pivot):
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    a = cms_state(df.filter(F.col("v") <= pivot), "v", depth=2, width=16)
    b = cms_state(df.filter(F.col("v") > pivot), "v", depth=2, width=16)
    merged = cms_merge(a, b)
    direct = cms_state(df, "v", depth=2, width=16)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


@given(vals=_vals)
@_settings
def test_kmv_state_is_true_k_smallest(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "v long").withColumn(
        "g", F.lit("g")
    )
    got = sorted(r["h"] for r in kmv_state(df, ["g"], "v", k=8).collect())
    want = sorted({_py_hash60(v) for v in vals})[:8]
    assert got == want


_doubles = st.lists(
    st.floats(
        min_value=1e-6, max_value=1e7, allow_nan=False, allow_infinity=False
    ),
    min_size=2,
    max_size=40,
)


@given(xs=_doubles)
@_settings
def test_qdigest_bucket_monotone_and_decode_brackets(spark, xs):
    k, scale = 64, 1 << 30
    df = spark.createDataFrame([(x,) for x in xs], "v double").withColumn(
        "g", F.lit("g")
    )
    from hermes_spark.operators.sketch import _qd_bucket, _qd_midpoint

    rows = df.select(
        "v",
        _qd_bucket(F.col("v"), k, scale).alias("qb"),
    ).collect()
    # bucket order == value order (ties allowed)
    by_v = sorted(rows, key=lambda r: r["v"])
    for a, b in zip(by_v, by_v[1:]):
        assert a["qb"] <= b["qb"]
    # decode brackets the value within the relative error bound for
    # in-range magnitudes (plus the 1/scale absolute quantization floor)
    decoded = df.select(
        "v",
        F.round(
            _qd_midpoint(_qd_bucket(F.col("v"), k, scale), k, scale), 9
        ).alias("mid"),
    ).collect()
    for r in decoded:
        if r["v"] * scale < 1:  # collapses to the zero bucket
            assert r["mid"] == 0.0
        else:
            rel = abs(r["mid"] - r["v"]) / r["v"]
            assert rel <= (1.0 / k) + (2.0 / (r["v"] * scale)), (r["v"], r["mid"])


@given(
    xs=st.lists(
        st.floats(min_value=0.001, max_value=1000, allow_nan=False),
        min_size=5,
        max_size=50,
    ),
    q=st.sampled_from([0.1, 0.5, 0.9]),
)
@_settings
def test_qdigest_quantile_rank_correct(spark, xs, q):
    """The selected bucket must contain the true rank-ceil(q*n) value."""
    import math

    df = spark.createDataFrame([(x,) for x in xs], "v double").withColumn(
        "g", F.lit("g")
    )
    est = {
        r["q"]: r["est"]
        for r in qdigest_quantiles(
            qdigest_state(df, ["g"], "v"), ["g"], [q]
        ).collect()
    }[q]
    true_val = sorted(xs)[max(1, math.ceil(q * len(xs))) - 1]
    # the estimate is the midpoint of the bucket holding true_val
    assert abs(est - true_val) / true_val <= 1.0 / 64 + 1e-6

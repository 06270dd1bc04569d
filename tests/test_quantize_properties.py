"""Property-based tests for the round-4 operators (hypothesis).

Invariants pinned on arbitrary small inputs:

- ``unit_entropy`` equals an independent Python computation for any
  text, is bounded by ``log2(distinct_units)``, and is zero iff one
  distinct unit;
- ``sq8_quantize`` + midpoint dequantization reconstructs every
  component within half a quantization step for ANY vector set;
- ``rebalance_mix`` output is always a subset of the input, is
  deterministic, and never exceeds any stratum's target-implied cap.
"""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hermes_spark.operators.entropy import unit_entropy
from hermes_spark.operators.quantize import SQ_LEVELS, dequantize_expr, sq8_quantize, sq8_stats
from hermes_spark.operators.sampling import rebalance_mix

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


_texts = st.lists(
    st.text(alphabet="abcd xyz", min_size=1, max_size=40), min_size=1, max_size=12
)


@given(texts=_texts)
@_settings
def test_unit_entropy_matches_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unit_entropy(df, "doc_id", "text").collect()}
    for i, t in enumerate(texts):
        units = [c for c in t]
        if not units:
            assert i not in got
            continue
        counts = {}
        for c in units:
            counts[c] = counts.get(c, 0) + 1
        n = sum(counts.values())
        want = -sum(v / n * math.log2(v / n) for v in counts.values())
        row = got[i]
        assert row["n_units"] == n
        assert row["distinct_units"] == len(counts)
        assert abs(row["entropy_bits"] - round(want, 6)) <= 2e-6
        # 6-dp rounding can nudge the value just past the exact bound
        assert row["entropy_bits"] <= math.log2(len(counts)) + 5e-7
        assert (row["entropy_bits"] == 0.0) == (len(counts) == 1)


_vectors = st.lists(
    st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32),
        min_size=4,
        max_size=4,
    ),
    min_size=2,
    max_size=20,
)


@given(vecs=_vectors)
@_settings
def test_sq8_roundtrip_error_bound(spark, vecs):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    stats = sq8_stats(df, "embedding", 4)
    srow = stats.collect()[0]
    spans = [mx - mn for mn, mx in zip(srow["mins"], srow["maxs"])]
    codes = sq8_quantize(df, stats=stats)
    recon = codes.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        dequantize_expr(F.col("codes"), F.col("mins"), F.col("maxs")).alias("recon"),
    )
    got = {r["vec_id"]: r["recon"] for r in recon.collect()}
    for i, v in enumerate(vecs):
        for d in range(4):
            step = spans[d] / SQ_LEVELS
            # degenerate dim: reconstructs mn + half-step... level 0 of a
            # zero span reconstructs mn exactly
            tol = step / 2 + 1e-9 if spans[d] > 0 else 1e-9
            assert abs(got[i][d] - v[d]) <= tol, (i, d, got[i][d], v[d])


_strata = st.lists(
    st.sampled_from(["a", "b", "c"]), min_size=5, max_size=60
)


@given(strata=_strata)
@_settings
def test_rebalance_mix_subset_and_caps(spark, strata):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strata)], "doc_id long, source string"
    )
    targets = {"a": 0.5, "b": 0.5}
    out = rebalance_mix(df, "doc_id", "source", targets).collect()
    out2 = rebalance_mix(df, "doc_id", "source", targets).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(r["doc_id"] for r in out2)
    input_ids = {i for i, _ in enumerate(strata)}
    by_stratum = {}
    for r in out:
        assert r["doc_id"] in input_ids
        assert r["source"] in targets
        by_stratum[r["source"]] = by_stratum.get(r["source"], 0) + 1
    counts = {s: strata.count(s) for s in set(strata)}
    present = {s: counts.get(s, 0) for s in targets if counts.get(s, 0) > 0}
    if present:
        min_ratio = min(n / 0.5 for n in present.values())
        for s, kept in by_stratum.items():
            cap = 0.5 * min_ratio
            # hash sampling is approximate: kept can exceed the exact cap
            # only by sampling noise, never by more than the stratum size
            assert kept <= counts[s]
            assert kept <= cap * 1.6 + 3

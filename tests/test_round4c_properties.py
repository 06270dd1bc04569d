"""Property-based tests for the round-4c operators (hypothesis).

Invariants pinned on arbitrary small inputs:

- ``ewma_smooth`` output is a convex combination of its trailing window:
  min(window) <= ewma <= max(window) for any alpha/lookback, and with
  alpha=1 it degenerates to the identity;
- ``pagerank`` conserves total rank mass (sum == 1) and keeps every
  rank >= (1-d)/n for any deterministic edge set;
- ``check_expectations`` violation counts are consistent: 0 <= v <=
  n_rows, the rate matches v/n, and passed == (rounded rate <= max_rate).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hermes_spark.operators import Rule, check_expectations, ewma_smooth, pagerank

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    values=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=20,
    ),
    alpha=st.floats(min_value=0.05, max_value=1.0, allow_nan=False),
    lookback=st.integers(min_value=1, max_value=8),
)
@_settings
def test_ewma_is_convex_combination(spark, values, alpha, lookback):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(values)], ["bucket", "v"]
    )
    rows = ewma_smooth(
        df, "bucket", "v", alpha=alpha, lookback=lookback, decimals=6
    ).collect()
    by_bucket = {r["bucket"]: r["ewma"] for r in rows}
    for t in range(len(values)):
        window = values[max(0, t - lookback + 1) : t + 1]
        assert min(window) - 1e-4 <= by_bucket[t] <= max(window) + 1e-4
    if alpha == 1.0:
        for t, v in enumerate(values):
            assert by_bucket[t] == pytest.approx(v, abs=1e-5)


@given(
    n=st.integers(min_value=2, max_value=25),
    mults=st.lists(
        st.tuples(st.integers(1, 30), st.integers(0, 30)), min_size=1, max_size=3
    ),
    damping=st.floats(min_value=0.5, max_value=0.95, allow_nan=False),
)
@_settings
def test_pagerank_mass_and_floor(spark, n, mults, damping):
    edge_list = sorted(
        {(s, (s * a + b) % n) for s in range(n) for a, b in mults if s != (s * a + b) % n}
    )
    if not edge_list:
        return
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    ranks = pagerank(edges, iterations=3, damping=damping)
    rows = ranks.collect()
    n_nodes = len(rows)
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    floor = (1.0 - damping) / n_nodes
    assert all(r["rank"] >= floor - 1e-12 for r in rows)


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 5)),
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
    lo=st.floats(min_value=-5, max_value=0),
    max_rate=st.sampled_from([0.0, 0.25, 0.5, 1.0]),
)
@_settings
def test_expectations_consistency(spark, rows, lo, max_rate):
    df = spark.createDataFrame(rows, "k int, v double")
    report = check_expectations(
        df,
        [
            Rule.not_null("nn", "k", max_rate=max_rate),
            Rule.unique("uq", "k", max_rate=max_rate),
            Rule.in_range("rng", "v", lo, 5.0, max_rate=max_rate),
        ],
    ).collect()
    n = len(rows)
    for r in report:
        assert r["n_rows"] == n
        assert 0 <= r["n_violations"] <= n
        assert r["violation_rate"] == pytest.approx(
            round(r["n_violations"] / n, 6), abs=1e-9
        )
        assert r["passed"] == (r["violation_rate"] <= max_rate)
    by = {r["rule"]: r["n_violations"] for r in report}
    assert by["nn"] == sum(1 for k, _ in rows if k is None)
    nonnull = [k for k, _ in rows if k is not None]
    assert by["uq"] == len(nonnull) - len(set(nonnull))
    assert by["rng"] == sum(1 for _, v in rows if v < lo or v > 5.0)


@given(
    changes=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 99)),
        min_size=1,
        max_size=25,
    ),
    facts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-5, 60)), min_size=1, max_size=25
    ),
)
@_settings
def test_scd2_lookup_equals_interval_join(spark, changes, facts):
    """As-of formulation == direct [valid_from, valid_to) interval join
    for ANY changelog/fact set (the algebraic identity scd2_lookup
    relies on)."""
    from hermes_spark.operators import scd2_history, scd2_lookup

    cdf = spark.createDataFrame(changes, "k int, ts int, payload int")
    fdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(facts)], "k int, fts int, fid int"
    )
    hist = scd2_history(cdf, ["k"], "ts")
    got = {
        (r["fid"]): r["payload"]
        for r in scd2_lookup(
            fdf, hist.select("k", "payload", "valid_from", "valid_to", "is_current"),
            ["k"], "fts",
        ).collect()
    }
    # direct interval join (the naive-but-obviously-correct formulation)
    h = hist.select(
        F.col("k").alias("hk"), F.col("payload").alias("p"),
        "valid_from", "valid_to",
    )
    cond = (
        (fdf["k"] == h["hk"])
        & (h["valid_from"] <= fdf["fts"])
        & (h["valid_to"].isNull() | (fdf["fts"] < h["valid_to"]))
    )
    want = {r["fid"]: r["p"] for r in fdf.join(h, on=cond, how="left").collect()}
    assert got == want

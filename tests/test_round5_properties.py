"""Property-based tests (hypothesis) for the round-5 operators.

Invariants pinned on arbitrary small inputs:

- ``jaccard_set_join`` equals the naive all-pairs join for ANY corpus
  and threshold (prefix filtering is lossless, not just on the one
  fixture);
- ``containment_join`` likewise, and containment is correctly
  directional;
- ``collapse_runs`` round-trips against a pure-Python run-length
  reference for arbitrary event streams (ties broken by event_id);
- ``cap_per_group`` never returns more than ``cap`` per group, loses
  no group, and its pick set is invariant under repartitioning;
- ``training_order`` emits a dense 1..n_s position sequence per shard
  and a bijection over the input keys for any shard count.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hermes_spark.operators import (
    cap_per_group,
    collapse_runs,
    containment_join,
    jaccard_set_join,
    training_order,
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary ON PURPOSE: forces heavy set overlap, the worst case
# for prefix-filter bookkeeping
_word = st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_text, min_size=2, max_size=14)


def _naive_pairs(texts, t, containment=False):
    sets = {}
    for i, txt in enumerate(texts):
        toks = [x for x in txt.lower().split() if x]
        s = set(toks)
        if s:
            sets[i] = s
    out = set()
    for a in sets:
        for b in sets:
            if containment:
                if a == b:
                    continue
                c = round(len(sets[a] & sets[b]) / len(sets[a]), 6)
                if c >= t:
                    out.add((a, b))
            else:
                if a >= b:
                    continue
                inter = len(sets[a] & sets[b])
                j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
                if j >= t:
                    out.add((a, b))
    return out


@given(texts=_corpus, t=st.sampled_from([0.3, 0.5, 0.8, 1.0]))
@_settings
def test_jaccard_join_lossless_for_any_corpus(spark, texts, t):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"])
        for r in jaccard_set_join(df, min_jaccard=t).collect()
    }
    assert got == _naive_pairs(texts, t)


@given(texts=_corpus, t=st.sampled_from([0.4, 0.8, 1.0]))
@_settings
def test_containment_join_lossless_for_any_corpus(spark, texts, t):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_join(df, min_containment=t, ngram=1).collect()
    }
    assert got == _naive_pairs(texts, t, containment=True)


_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5), st.sampled_from("ABC")),
    min_size=0,
    max_size=25,
)


@given(events=_events)
@_settings
def test_collapse_runs_matches_python_reference(spark, events):
    rows = [
        (eid, ts, user, val) for eid, (user, ts, val) in enumerate(events)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["event_type"], r["run_length"])
        for r in collapse_runs(df).collect()
    )
    # python reference: sort per user by (ts, event_id), collapse runs
    by_user = {}
    for eid, ts, user, val in rows:
        by_user.setdefault(user, []).append((ts, eid, val))
    want = []
    for user, evs in by_user.items():
        evs.sort()
        i = 0
        while i < len(evs):
            j = i
            while j < len(evs) and evs[j][2] == evs[i][2]:
                j += 1
            want.append((user, evs[i][0], evs[i][1], evs[i][2], j - i))
            i = j
    assert got == sorted(want)


@given(
    groups=st.lists(st.integers(0, 4), min_size=1, max_size=40),
    cap=st.integers(1, 5),
)
@_settings
def test_cap_per_group_invariants(spark, groups, cap):
    rows = [(i, f"g{g}") for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = cap_per_group(df, "doc_id", "source", cap=cap).collect()
    sizes = {}
    for r in out:
        sizes[r["source"]] = sizes.get(r["source"], 0) + 1
    orig = {}
    for _, g in rows:
        orig[g] = orig.get(g, 0) + 1
    assert set(sizes) == set(orig)
    for g, n in sizes.items():
        assert n == min(cap, orig[g])
    again = {
        (r["doc_id"], r["source"])
        for r in cap_per_group(df.repartition(5), "doc_id", "source", cap=cap).collect()
    }
    assert {(r["doc_id"], r["source"]) for r in out} == again


@given(n=st.integers(1, 60), shards=st.integers(1, 6))
@_settings
def test_training_order_dense_bijection(spark, n, shards):
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = training_order(df, "doc_id", num_shards=shards).collect()
    assert len(out) == n and len({r["doc_id"] for r in out}) == n
    per_shard = {}
    for r in out:
        per_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, positions in per_shard.items():
        assert 0 <= shard < shards
        assert sorted(positions) == list(range(1, len(positions) + 1))

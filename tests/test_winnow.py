"""Winnowing fingerprint tests: the SIGMOD'03 guarantee (any shared
substring of length >= k + w - 1 yields a common fingerprint), density,
determinism, and the near-dup pair operator."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import winnow_fingerprints, winnow_near_dup_pairs

K, W = 4, 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shared_substring_guarantee(spark):
    # guarantee threshold: substrings of length >= k + w - 1 = 6
    shared = "zqxjkwvbn"  # 9 chars, rare-looking, > threshold
    df = _docs(
        spark,
        [(1, f"aaaa {shared} bbbb"), (2, f"cccc dddd {shared} eeee")],
    )
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    a = {r["fp_hash"] for r in fps.filter("doc_id = 1").collect()}
    b = {r["fp_hash"] for r in fps.filter("doc_id = 2").collect()}
    assert a & b, "winnowing guarantee violated: no common fingerprint"


def test_identical_docs_identical_fingerprints(spark):
    text = "the quick brown fox jumps over the lazy dog"
    df = _docs(spark, [(1, text), (2, text)])
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    a = sorted(
        (r["fp_pos"], r["fp_hash"]) for r in fps.filter("doc_id = 1").collect()
    )
    b = sorted(
        (r["fp_pos"], r["fp_hash"]) for r in fps.filter("doc_id = 2").collect()
    )
    assert a == b and len(a) > 0


def test_density_bound(spark):
    # expected selection density is ~2/(w+1); assert the hard upper bound
    # (every window selects at most one fingerprint) and non-triviality
    text = " ".join(f"token{i}" for i in range(100))
    df = _docs(spark, [(1, text)])
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    n_positions = len(text) - K + 1
    n_selected = fps.count()
    assert 0 < n_selected <= n_positions - W + 1
    # density should be well under 1 (roughly 2/(w+1) ~ 0.5 for w=3)
    assert n_selected / n_positions < 0.8


def test_short_docs_dropped(spark):
    df = _docs(spark, [(1, "ab"), (2, "this one is long enough to fingerprint")])
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    ids = {r["doc_id"] for r in fps.collect()}
    assert ids == {2}


def test_normalization_collapses_whitespace_and_case(spark):
    df = _docs(spark, [(1, "Hello   World Example"), (2, "hello world example")])
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    a = {(r["fp_pos"], r["fp_hash"]) for r in fps.filter("doc_id = 1").collect()}
    b = {(r["fp_pos"], r["fp_hash"]) for r in fps.filter("doc_id = 2").collect()}
    assert a == b


def test_near_dup_pairs_finds_duplicate(spark):
    base = "some reasonably long document text that repeats across copies " * 3
    df = _docs(spark, [(1, base), (2, base + " tail"), (3, "completely different unrelated content here")])
    pairs = winnow_near_dup_pairs(df, "doc_id", "text", k=K, w=W, min_common=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert all(p[1] != 3 and p[0] != 3 for p in got)


def test_fast_hash_variant_same_shape(spark):
    text = "the quick brown fox jumps over the lazy dog"
    df = _docs(spark, [(1, text)])
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W, portable=False)
    rows = fps.collect()
    assert len(rows) > 0
    assert all(r["fp_hash"] >= 0 for r in rows)


def test_single_shuffle_plan(spark):
    """One exchange (the window partition by doc_id) before the distinct —
    the scan->explode->hash stage must not shuffle on its own."""
    from hermes_spark.plans import count_exchanges

    df = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
    # window partition + distinct: at most 2 exchanges, AQE may merge
    assert count_exchanges(fps) <= 2

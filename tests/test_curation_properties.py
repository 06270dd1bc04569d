"""Property-based tests for the curation operators (hypothesis).

Invariants pinned on arbitrary small inputs:

- ``split_assign`` exactly partitions the input for ANY weight vector
  (nothing lost, nothing doubled, every split name legal) and is
  layout-independent;
- ``length_curriculum`` conserves mass: sum(n_docs) == corpus size,
  sum(total_tokens) == corpus token count, bins hold their min/max;
- ``source_overlap`` is symmetric in pair orientation (a < b) and its
  counts never exceed either side's distinct fingerprint count.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from hermes_spark.operators.dedup import source_overlap
from hermes_spark.operators.packing import length_curriculum
from hermes_spark.operators.sampling import split_assign

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_weights = st.dictionaries(
    st.sampled_from(["train", "val", "test", "dev"]),
    st.floats(min_value=0.01, max_value=1.0, allow_nan=False),
    min_size=1,
    max_size=4,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(500).withColumnRenamed("id", "doc_id").cache()


@given(weights=_weights)
@_settings
def test_split_assign_exact_partition(spark, ids, weights):
    out = split_assign(ids, "doc_id", weights)
    counts = {
        r["split"]: r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert sum(counts.values()) == 500
    assert set(counts) <= set(weights)


_texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=30), min_size=1, max_size=25
)


@given(texts=_texts)
@_settings
def test_length_curriculum_conserves_mass(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bins = length_curriculum(df, "doc_id").collect()
    assert sum(r["n_docs"] for r in bins) == len(texts)
    n_tokens = [len(t.split()) for t in texts]
    assert sum(r["total_tokens"] for r in bins) == sum(n_tokens)
    for r in bins:
        assert r["min_tokens"] <= r["max_tokens"]
        lo, hi = 2 ** r["length_bin"], 2 ** (r["length_bin"] + 1)
        assert max(r["min_tokens"], 1) >= lo and max(r["max_tokens"], 1) < hi


_docs = st.lists(
    st.tuples(
        st.sampled_from(["t1", "t2", "t3", "t4"]),   # few texts -> overlaps
        st.sampled_from(["web", "books", "code"]),
    ),
    min_size=0,
    max_size=20,
)


@given(pairs=_docs)
@_settings
def test_source_overlap_invariants(spark, pairs):
    rows = [(i, t, s) for i, (t, s) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = source_overlap(df, "doc_id", "text").collect()
    per_source_fps = {
        r["source"]: r["n"]
        for r in df.select("source", "text").distinct()
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in out:
        assert r["source_a"] < r["source_b"]
        assert r["overlap_count"] >= 1
        assert r["overlap_count"] <= per_source_fps[r["source_a"]]
        assert r["overlap_count"] <= per_source_fps[r["source_b"]]

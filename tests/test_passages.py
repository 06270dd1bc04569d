"""Passage-level dedup + benchmark decontamination tests."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import (
    decontaminate,
    duplicate_passage_stats,
    passage_hashes,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0 and 1 share their first 4-word passage; doc 1's tail differs
        (0, "alpha beta gamma delta one two three four"),
        (1, "alpha beta gamma delta five six seven eight"),
        # 2 is fully unique
        (2, "red orange yellow green blue indigo violet plum"),
        # 3 repeats its own first passage (self-duplication counts)
        (3, "ping pong ping pong ping pong ping pong"),
        # 4 is empty -> no passages
        (4, "   "),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_passage_hashes_shape(docs):
    rows = passage_hashes(docs, "doc_id", "text", window=4).collect()
    # docs 0-3 produce 2 passages each; the empty doc produces none
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {0, 1, 2, 3}
    assert all(len(v) == 2 for v in by_doc.values())
    # shared first passage hashes identically across docs 0 and 1
    h0 = {r.passage_idx: r.passage_hash for r in by_doc[0]}
    h1 = {r.passage_idx: r.passage_hash for r in by_doc[1]}
    assert h0[0] == h1[0]
    assert h0[1] != h1[1]
    # doc 3's two passages are identical to each other
    h3 = [r.passage_hash for r in by_doc[3]]
    assert h3[0] == h3[1]


def test_duplicate_passage_stats(docs):
    out = {
        r.doc_id: r
        for r in duplicate_passage_stats(docs, "doc_id", "text", window=4).collect()
    }
    assert out[0].n_passages == 2 and out[0].n_dup_passages == 1
    assert out[0].dup_fraction == 0.5
    assert out[1].n_dup_passages == 1
    assert out[2].n_dup_passages == 0 and out[2].dup_fraction == 0.0
    # self-duplication: both of doc 3's passages occur twice corpus-wide
    assert out[3].n_dup_passages == 2 and out[3].dup_fraction == 1.0
    assert 4 not in out


def test_passage_window_boundary(spark):
    # 5 tokens at window=4 -> one full + one short tail passage
    df = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    rows = passage_hashes(df, "doc_id", "text", window=4).collect()
    assert len(rows) == 2


def test_decontaminate(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over something else entirely here"),
            (2, "completely unrelated text with many distinct words inside it"),
            (3, "too short"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in decontaminate(corpus, bench, "doc_id", "text", n=6).collect()
    }
    assert len(out) == 4
    # doc 0 contains several benchmark 6-grams; doc 1 contains exactly one
    # ("the quick brown fox jumps over"); docs 2-3 contain none
    assert out[0].contaminated and out[0].n_contaminated_grams >= 2
    assert out[1].contaminated and out[1].n_contaminated_grams == 1
    assert not out[2].contaminated and out[2].n_contaminated_grams == 0
    assert not out[3].contaminated


def test_decontaminate_plan_broadcasts_benchmark(spark, docs):
    """The benchmark gram set must reach the corpus side as a broadcast
    hash join — a shuffled join here would repartition every corpus
    n-gram and not survive a 100x scale-up."""
    from hermes_spark.plans import plan_operators

    out = decontaminate(docs, docs.limit(2), "doc_id", "text", n=4)
    ops = plan_operators(out)
    assert any(op.startswith("BroadcastHashJoin") for op in ops)


def test_decontaminate_case_insensitive(spark):
    corpus = spark.createDataFrame(
        [(0, "One Two Three Four Five Six extra words")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame(
        [(9, "one two three four five six")], ["doc_id", "text"]
    )
    out = decontaminate(corpus, bench, "doc_id", "text", n=6).collect()
    assert out[0].contaminated

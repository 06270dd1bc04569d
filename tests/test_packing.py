"""Sequence packing / context-window chunking tests."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import (
    pack_sequences,
    packed_sequence_stats,
    token_chunks,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, " ".join(f"w{i}" for i in range(10))),
        (1, " ".join(f"x{i}" for i in range(5))),
        (2, "single"),
        (3, "   "),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_chunks_nonoverlapping(docs):
    out = token_chunks(docs, "doc_id", "text", size=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # 10 tokens @ size 4 -> 3 chunks (4, 4, 2)
    assert [r.n_tokens for r in sorted(by_doc[0], key=lambda r: r.chunk_idx)] == [4, 4, 2]
    # 5 tokens -> 2 chunks; 1 token -> itself; empty -> nothing
    assert len(by_doc[1]) == 2
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "single"
    assert 3 not in by_doc


def test_token_chunks_overlapping(docs):
    out = sorted(
        token_chunks(docs, "doc_id", "text", size=4, stride=2)
        .filter(F.col("doc_id") == 0)
        .collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts at 0,2,4,6 -> last covers tokens [6,10) fully; 4 chunks
    assert len(out) == 4
    assert out[0].chunk_text == "w0 w1 w2 w3"
    assert out[1].chunk_text == "w2 w3 w4 w5"
    assert out[3].chunk_text == "w6 w7 w8 w9"


def test_pack_sequences_single_shard(spark):
    # one shard -> pure greedy prefix-sum packing in doc_id order
    df = spark.createDataFrame(
        [(i, 30) for i in range(10)], ["doc_id", "n_tokens"]
    )
    out = sorted(
        pack_sequences(
            df, "doc_id", token_count_col="n_tokens", budget=100, num_shards=1
        ).collect(),
        key=lambda r: r.doc_id,
    )
    # cum_before: 0,30,60,90,120,... -> seq 0,0,0,0,1,1,1,2,2,2
    assert [r.seq_in_shard for r in out] == [0, 0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert all(r.shard == 0 for r in out)


def test_pack_sequences_sharded_deterministic(spark):
    df = spark.createDataFrame([(i, 10) for i in range(200)], ["doc_id", "n_tokens"])
    a = pack_sequences(df, "doc_id", token_count_col="n_tokens", budget=50, num_shards=8)
    b = pack_sequences(
        df.repartition(7), "doc_id", token_count_col="n_tokens", budget=50, num_shards=8
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    shards = {r.shard for r in a.collect()}
    assert len(shards) > 1  # docs actually spread over shards


def test_packed_sequence_stats(spark):
    df = spark.createDataFrame([(i, 40) for i in range(5)], ["doc_id", "n_tokens"])
    stats = packed_sequence_stats(
        df, "doc_id", token_count_col="n_tokens", budget=100, num_shards=1
    ).collect()
    # 5*40=200 tokens -> seqs: docs 0-2 (seq0: 120), docs 3-4 (seq1: 80)
    by_seq = {r.seq_in_shard: r for r in stats}
    assert by_seq[0].n_docs == 3 and by_seq[0].total_tokens == 120
    assert by_seq[0].fill_ratio == 1.2
    assert by_seq[1].n_docs == 2 and by_seq[1].total_tokens == 80


def test_pack_sequences_plan_is_sharded_sort(spark):
    """The packing window must partition by shard — a global ordered
    window would sort the whole corpus on one partition. The plan has to
    show a hash-partitioned exchange, not a SinglePartition one."""
    from hermes_spark.plans.inspect import explain_formatted

    df = spark.createDataFrame([(i, 10) for i in range(100)], ["doc_id", "n_tokens"])
    out = pack_sequences(df, "doc_id", token_count_col="n_tokens", budget=50, num_shards=8)
    text = explain_formatted(out)
    assert "hashpartitioning(shard" in text
    assert "SinglePartition" not in text


def test_pack_sequences_from_text(docs):
    out = {
        r.doc_id: r
        for r in pack_sequences(
            docs, "doc_id", text_col="text", budget=8, num_shards=1
        ).collect()
    }
    assert out[0].n_tokens == 10
    assert out[3].n_tokens == 0  # blank doc counts zero tokens

    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", budget=8)

"""Real BPE tokenizer (operators/bpe.py): merge learning pinned to the
classic worked example, distributed encode round-trip."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import bpe_encode, bpe_token_counts, bpe_train_merges

# Sennrich et al. word-frequency corpus: low x5, lower x2, newest x6,
# widest x3 — one word per row, repeated to the target counts.
WORDS = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def merges(corpus):
    return bpe_train_merges(corpus, num_merges=10)


def test_learned_merges_match_hand_computation(merges):
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
        ("ew", "est</w>"),
        ("n", "ewest</w>"),
        ("low", "</w>"),
        ("d", "est</w>"),
    ]


def test_encode_classic_results(spark, merges):
    docs = spark.createDataFrame(
        [(1, "low"), (2, "lowest"), (3, "newest"), (4, "xyz"), (5, "  ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: list(r.pieces) for r in bpe_encode(docs, merges).collect()}
    assert out[1] == ["low</w>"]
    # "lowest" was never seen, but its pieces were learned
    assert out[2] == ["low", "est</w>"]
    assert out[3] == ["newest</w>"]
    # fully OOV word falls back to characters
    assert out[4] == ["x", "y", "z", "</w>"]
    assert out[5] == []


def test_encode_reconstructs_text(spark, corpus, merges):
    """Concatenated pieces with </w> -> space reproduce the input."""
    enc = bpe_encode(corpus, merges)
    joined = enc.select(
        "doc_id",
        F.regexp_replace(
            F.trim(F.regexp_replace(F.concat_ws("", "pieces"), "</w>", " ")),
            r"\s+",
            " ",
        ).alias("rebuilt"),
    )
    src = corpus.select("doc_id", F.lower(F.trim("text")).alias("orig"))
    bad = joined.join(src, "doc_id").filter(F.col("rebuilt") != F.col("orig"))
    assert bad.count() == 0


def test_counts_and_partitioning_invariance(spark, corpus, merges):
    base = {r.doc_id: r.n_pieces for r in bpe_token_counts(corpus, merges).collect()}
    again = {
        r.doc_id: r.n_pieces
        for r in bpe_token_counts(corpus.repartition(7), merges).collect()
    }
    assert base == again
    enc = {r.doc_id: len(r.pieces) for r in bpe_encode(corpus, merges).collect()}
    assert base == enc


def test_train_determinism_and_early_stop(spark):
    tiny = spark.createDataFrame([(0, "ab ab")], "doc_id long, text string")
    m1 = bpe_train_merges(tiny, num_merges=50)
    m2 = bpe_train_merges(tiny.repartition(5), num_merges=50)
    assert m1 == m2
    # "ab ab" -> word 'ab' x2: merges (a,b) then (ab,</w>), then no pair
    # reaches count >= 2 -> early stop
    assert m1 == [("a", "b"), ("ab", "</w>")]


def test_real_corpus_beats_estimate(spark, sf_dir):
    """On real documents the learned tokenizer compresses: mean pieces
    per doc is below the whitespace+chars floor and above word count."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    merges = bpe_train_merges(docs, num_merges=100)
    assert len(merges) == 100
    stats = (
        bpe_token_counts(docs, merges)
        .join(
            docs.select(
                "doc_id",
                F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n_words"),
            ),
            "doc_id",
        )
        .agg(
            F.sum("n_pieces").alias("pieces"), F.sum("n_words").alias("words")
        )
        .collect()[0]
    )
    assert stats.pieces >= stats.words  # subwords can't undercut words
    assert stats.pieces <= stats.words * 8  # and the merges actually fuse

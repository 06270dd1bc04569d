"""Unigram-LM tokenizer (r12c): training on the bounded aggregate,
Viterbi encoding, unsegmented-script lattice segmentation, and
determinism.
"""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators.unigram import (
    _viterbi,
    unigram_encode,
    unigram_token_counts,
    unigram_train,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    base = (
        "the quick brown fox jumps over the lazy dog "
        "while the rain in spain stays mainly on the plain "
    )
    for i in range(60):
        rows.append((i, base + f"variant {i % 7} of the training corpus"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_viterbi_prefers_high_probability_pieces():
    import math

    logp = {"a": math.log(0.1), "b": math.log(0.1),
            "ab": math.log(0.5), "abab": math.log(0.3)}
    pieces, lp = _viterbi("ababab", logp, 8)
    # {abab, ab} (0.3*0.5) beats ab*3 (0.125) and char paths; the two
    # orders tie and the longer-LAST-piece rule picks ab+abab
    assert pieces == ["ab", "abab"]
    assert abs(lp - (math.log(0.3) + math.log(0.5))) < 1e-12
    # unknown chars never fail
    pieces, _ = _viterbi("axb", {"a": -1.0, "b": -1.0}, 8)
    assert pieces == ["a", "x", "b"]


def test_unigram_train_learns_frequent_words(corpus):
    vocab = unigram_train(corpus, vocab_size=300, em_iters=2)
    pieces = {p for p, _ in vocab}
    # closure: every corpus character is a piece
    for c in "thequickbrownfox ".replace(" ", ""):
        assert c in pieces, c
    # the most frequent word becomes a single piece
    assert "the" in pieces
    # vocab respects the size bound (chars may push slightly over the
    # multi-piece budget, never the total)
    assert len(vocab) <= 300
    # probabilities normalize-ish: all logprobs negative, sorted desc
    lps = [lp for _, lp in vocab]
    assert all(lp < 0 for lp in lps)
    assert lps == sorted(lps, reverse=True)


def test_unigram_train_deterministic(corpus):
    v1 = unigram_train(corpus, vocab_size=200, em_iters=2)
    v2 = unigram_train(corpus, vocab_size=200, em_iters=2)
    assert v1 == v2


def test_unigram_encode_roundtrip_and_budget(corpus):
    vocab = unigram_train(corpus, vocab_size=300, em_iters=2)
    enc = unigram_encode(corpus, vocab, "doc_id", "text")
    rows = {r["doc_id"]: r for r in enc.collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for i, r in rows.items():
        # lossless: concatenated pieces reproduce the whitespace-split
        # lowercased text
        assert "".join(r["pieces"]) == "".join(texts[i].lower().split())
        assert r["n_tokens"] == len(r["pieces"])
        assert r["logprob"] < 0
        # subword compression: fewer tokens than characters
        assert r["n_tokens"] < len(texts[i].replace(" ", ""))
    counts = {r["doc_id"]: r["n_tokens"] for r in unigram_token_counts(
        corpus, vocab, "doc_id", "text").collect()}
    assert counts == {i: rows[i]["n_tokens"] for i in rows}


def test_unigram_handles_unsegmented_runs(spark):
    """The lattice needs no whitespace: a repeated Han phrase becomes
    high-probability multi-char pieces and long runs chunk at count
    time without breaking encoding."""
    phrase = "机器学习"
    rows = [(i, (phrase + "的应用") * 10) for i in range(30)]
    rows += [(100 + i, "plain latin filler text here") for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    vocab = unigram_train(df, vocab_size=200, em_iters=2, max_piece_len=6)
    pieces = {p for p, _ in vocab}
    assert phrase in pieces  # the frequent phrase is ONE piece
    enc = {r["doc_id"]: r for r in unigram_encode(
        df, vocab, "doc_id", "text").collect()}
    assert "".join(enc[0]["pieces"]) == (phrase + "的应用") * 10
    # dramatic compression vs characters (70 chars -> few pieces)
    assert enc[0]["n_tokens"] <= 25


def test_unigram_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "some words here"), (2, ""), (3, None)],
        "doc_id long, text string")
    vocab = unigram_train(df, vocab_size=100, em_iters=1)
    got = {r["doc_id"]: r for r in unigram_encode(
        df, vocab, "doc_id", "text").collect()}
    assert got[2]["n_tokens"] == 0 and got[2]["pieces"] == []
    assert got[3]["n_tokens"] == 0
    assert got[1]["n_tokens"] >= 1


def test_unigram_counts_feed_pack_sequences(corpus):
    """Composition: exact learned-token budgets drive the packer via
    token_count_col — the accounting pack_sequences exists for."""
    from hermes_spark.operators.packing import pack_sequences

    vocab = unigram_train(corpus, vocab_size=200, em_iters=2)
    counts = unigram_token_counts(corpus, vocab, "doc_id", "text")
    packed = pack_sequences(
        corpus.join(counts, "doc_id"), "doc_id",
        token_count_col="n_tokens", budget=64,
    )
    rows = packed.collect()
    assert len(rows) == corpus.count()
    # every sequence respects the budget in LEARNED tokens: the sum of
    # n_tokens per (shard, seq) stays under budget + one max doc
    from collections import defaultdict

    per_seq = defaultdict(int)
    max_doc = 0
    for r in rows:
        per_seq[(r["shard"], r["seq_in_shard"])] += r["n_tokens"]
        max_doc = max(max_doc, r["n_tokens"])
    assert all(v < 64 + max_doc for v in per_seq.values())

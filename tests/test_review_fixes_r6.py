"""Regression pins for the round-6 late-session review findings:
NBSP mojibake single-pass repair, phantom empty-conversation turn,
NULL-content flag poisoning, editsim domain-key blocking, interval-join
column ambiguity, BPE train/encode word-split agreement."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from hermes_spark.functions.clean import clean_text
from hermes_spark.operators import (
    bpe_encode,
    bpe_train_merges,
    conversation_stats,
    edit_distance_pairs,
    turns_from_text,
)
from hermes_spark.streaming import interval_join_streams


def test_nbsp_mojibake_single_pass(spark):
    """UTF-8 NBSP read as cp1252 ("Â ") repairs in ONE pass."""
    df = spark.createDataFrame([("foo\u00C2\u00A0bar",)], "s string")
    (once,) = [
        r.o for r in df.select(clean_text(F.col("s")).alias("o")).collect()
    ]
    assert once == "foo bar"
    (twice,) = [
        r.o
        for r in df.select(
            clean_text(clean_text(F.col("s"))).alias("o")
        ).collect()
    ]
    assert twice == once


def test_turns_from_text_empty_is_empty(spark):
    """No non-empty fragments -> [] (not a phantom null-content turn)."""
    df = spark.createDataFrame(
        [(1, ""), (2, " . . "), (3, "real. text.")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: list(r.t)
        for r in df.select(
            "doc_id", turns_from_text(F.col("text")).alias("t")
        ).collect()
    }
    assert rows[1] == [] and rows[2] == []
    assert len(rows[3]) == 2 and rows[3][0].content == "real"


def test_null_content_reads_as_violation(spark):
    from tests.test_chatformat import SCHEMA

    df = spark.createDataFrame(
        [(1, [("user", "q"), ("assistant", None)])], SCHEMA
    )
    row = conversation_stats(df).collect()[0]
    assert row.all_nonempty is False  # False, not NULL
    assert row.well_formed is False


def test_editsim_domain_key_blocking(spark):
    """block= resolves against the caller's frame (e.g. a host column)."""
    df = spark.createDataFrame(
        [(1, "the quick fox", "a.com"), (2, "the quick fix", "a.com"),
         (3, "the quick fox", "b.com")],
        "doc_id long, text string, host string",
    )
    pairs = edit_distance_pairs(
        df, "doc_id", "text", max_distance=2, block=F.col("host")
    )
    got = {(r.id_a, r.id_b): r.distance for r in pairs.collect()}
    # same host a.com: fox/fix distance 1; cross-host identical text NOT paired
    assert got == {(1, 2): 1}


def test_interval_join_same_named_payload(spark):
    """A right-side payload column named like left_ts must not make the
    range predicate ambiguous."""
    t0 = dt.datetime(2026, 1, 1)
    left = spark.createDataFrame(
        [("k", "c1", t0)], "key string, click_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", "i1", t0 - dt.timedelta(minutes=5), t0)],
        "key string, imp_id string, imp_ts timestamp, ts timestamp",
    )
    out = interval_join_streams(
        left, right, ["key"], "ts", "imp_ts", lookback="1 hour"
    )
    assert out.count() == 1


def test_bpe_unicode_whitespace_agreement(spark):
    """Train and encode agree that NBSP is NOT a word separator."""
    df = spark.createDataFrame(
        [(i, "a b a b plain") for i in range(3)],
        "doc_id long, text string",
    )
    merges = bpe_train_merges(df, num_merges=10)
    enc = bpe_encode(df, merges).collect()[0]
    eow = sum(1 for p in enc.pieces if p.endswith("</w>"))
    # 3 words per doc under ASCII splitting on BOTH sides
    assert eow == 3

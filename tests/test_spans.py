"""Span-level exact substring duplication (operators/spans.py):
hand-computed maximal spans, cap behavior, stats rollup."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hermes_spark.operators import duplicate_spans, gram_positions, span_dedup_stats

W = "w{} "  # distinct filler words


def _text(*idx):
    return " ".join(f"w{i}" for i in idx)


@pytest.fixture(scope="module")
def span_docs(spark):
    # doc 1 and 2 share tokens 10..19 (10 tokens), placed at different
    # offsets; doc 3 is unrelated; doc 4 shares a too-short 7-token run
    shared = list(range(10, 20))
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=_text(*range(100, 105), *shared, *range(200, 205))),
            Row(doc_id=2, text=_text(*range(300, 302), *shared, *range(400, 410))),
            Row(doc_id=3, text=_text(*range(500, 520))),
            Row(doc_id=4, text=_text(*range(600, 605), *shared[:7], *range(700, 705))),
        ]
    )


def test_single_maximal_span(spark, span_docs):
    out = duplicate_spans(span_docs, "doc_id", "text", min_tokens=8).collect()
    assert len(out) == 1
    r = out[0]
    # doc1 offset 5, doc2 offset 2, 10 shared tokens
    assert (r.id_a, r.id_b, r.start_a, r.start_b, r.span_tokens) == (1, 2, 5, 2, 10)


def test_below_min_tokens_not_reported(spark, span_docs):
    # the 7-token overlap of doc 4 never forms an 8-gram
    out = duplicate_spans(span_docs, "doc_id", "text", min_tokens=8).collect()
    assert not any(r.id_a == 4 or r.id_b == 4 for r in out)


def test_two_separate_spans_two_rows(spark):
    a = _text(*range(0, 10)) + " x1 x2 x3 " + _text(*range(20, 30))
    b = _text(*range(0, 10)) + " y1 y2 y3 y4 " + _text(*range(20, 30))
    df = spark.createDataFrame([Row(doc_id=1, text=a), Row(doc_id=2, text=b)])
    out = sorted(
        duplicate_spans(df, "doc_id", "text", min_tokens=8).collect(),
        key=lambda r: r.start_a,
    )
    assert [(r.start_a, r.start_b, r.span_tokens) for r in out] == [
        (0, 0, 10),
        (13, 14, 10),
    ]


def test_exact_copy_is_full_doc_span(spark):
    t = _text(*range(0, 25))
    df = spark.createDataFrame([Row(doc_id=1, text=t), Row(doc_id=2, text=t)])
    out = duplicate_spans(df, "doc_id", "text", min_tokens=8).collect()
    assert len(out) == 1 and out[0].span_tokens == 25
    assert out[0].start_a == 0 and out[0].start_b == 0


def test_boilerplate_cap_skips_hot_grams(spark):
    t = _text(*range(0, 12))
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i in range(10)])
    capped = duplicate_spans(df, "doc_id", "text", min_tokens=8, max_docs_per_gram=5)
    assert capped.count() == 0  # every gram sits in 10 docs > cap
    uncapped = duplicate_spans(df, "doc_id", "text", min_tokens=8, max_docs_per_gram=50)
    assert uncapped.count() == 45  # all C(10,2) pairs


def test_gram_positions_short_doc_empty(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    assert gram_positions(df, "doc_id", "text", n=8).count() == 0


def test_span_dedup_stats_rollup(spark, span_docs):
    out = {r.doc_id: r for r in
           span_dedup_stats(span_docs, "doc_id", "text", min_tokens=8).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1].dup_spans == 1 and out[1].dup_span_tokens == 10 and out[1].max_span == 10
    assert out[2].dup_spans == 1 and out[2].n_tokens == 22
    assert out[3].dup_spans == 0 and out[3].dup_span_tokens == 0
    assert out[4].dup_spans == 0


def test_checkpoint_grams_parity(spark, span_docs):
    # round 13: the gram stream is materialized once by default; the
    # off-switch must produce the identical span set
    on = duplicate_spans(span_docs, "doc_id", "text", min_tokens=8).collect()
    off = duplicate_spans(
        span_docs, "doc_id", "text", min_tokens=8, checkpoint_grams=False
    ).collect()
    key = lambda r: (r.id_a, r.id_b, r.start_a, r.start_b, r.span_tokens)
    assert sorted(map(key, on)) == sorted(map(key, off))

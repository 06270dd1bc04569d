"""Cross-corpus n-gram LM scoring (operators/lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import (
    bucket_by_bounds,
    lm_score,
    lm_train,
    perplexity_ntile,
)

TRAIN = [
    (0, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (4, "the cat ate the fish"),
]
TARGET = [
    (1, "the cat sat on the mat"),  # seen verbatim
    (3, "zz qq xx yy ww vv"),  # all OOV
    (5, "the dog ate the fish"),  # plausible recombination
    (7, "one"),  # single token -> no bigrams
    (9, "   "),  # blank -> no tokens
]


@pytest.fixture(scope="module")
def lm_and_scored(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    lm = lm_train(train, vocab_size=100)
    scored = lm_score(target, lm)
    return lm, scored, {r.doc_id: r.asDict() for r in scored.collect()}


def test_known_bigram_probability(spark, lm_and_scored):
    lm, _, _ = lm_and_scored
    # C(the, cat) = 2, C(the, .) = 6, V = 9 distinct train terms
    assert lm.n_vocab == 9
    target = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    row = lm_score(target, lm).collect()[0]
    expected = math.log((2 * 2 + 1) / (2 * 6 + (9 + 1)))
    assert row.n_bigrams == 1
    assert row.avg_logprob == pytest.approx(
        round(round(expected * 1e6) / 1e6, 6), abs=1e-9
    )


def test_oov_floor_and_ordering(lm_and_scored):
    lm, _, rows = lm_and_scored
    # all-OOV doc: every bigram is (<unk>, <unk>) with zero counts
    floor = math.log(1 / (lm.n_vocab + 1))
    assert rows[3]["avg_logprob"] == pytest.approx(floor, abs=1e-5)
    assert rows[1]["avg_logprob"] > rows[5]["avg_logprob"] > rows[3]["avg_logprob"]


def test_short_and_blank_docs_omitted(lm_and_scored):
    _, _, rows = lm_and_scored
    assert 7 not in rows and 9 not in rows


def test_ntile_buckets(lm_and_scored):
    _, scored, _ = lm_and_scored
    out = {r.doc_id: r.ppl_bucket for r in perplexity_ntile(scored).collect()}
    assert out == {1: "head", 5: "middle", 3: "tail"}
    with pytest.raises(ValueError):
        perplexity_ntile(scored, parts=3, labels=("a", "b"))


def test_bucket_by_bounds(lm_and_scored):
    _, scored, _ = lm_and_scored
    out = {
        r.doc_id: r.ppl_bucket
        for r in bucket_by_bounds(
            scored, head_min_logprob=-1.5, tail_max_logprob=-2.2
        ).collect()
    }
    assert out == {1: "head", 5: "middle", 3: "tail"}


def test_partitioning_invariance(spark, lm_and_scored):
    """The 1e-6 int64 term sum makes scores independent of layout."""
    lm, _, rows = lm_and_scored
    target = spark.createDataFrame(TARGET, "doc_id long, text string").repartition(7)
    again = {r.doc_id: r.asDict() for r in lm_score(target, lm).collect()}
    assert again == rows


def test_score_plan_broadcasts_model(spark, lm_and_scored):
    lm, _, _ = lm_and_scored
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    # join engine (the any-size-model path): vocab map join,
    # bigram-count model join, context join — all broadcast
    plan = (
        lm_score(target, lm, broadcast_model=True, score_engine="join")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_score_arrow_engine_zero_shuffle(spark, lm_and_scored):
    from hermes_spark.plans import count_exchanges

    lm, _, _ = lm_and_scored
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    # broadcast_model=True now routes auto -> arrow: model ships as a
    # broadcast variable, scoring is one scan stage, zero shuffles
    arrow = lm_score(target, lm, broadcast_model=True)
    assert count_exchanges(arrow) == 0
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    join_rows = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in lm_score(target, lm, score_engine="join").collect()
    }
    arrow_rows = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in arrow.collect()
    }
    assert join_rows == arrow_rows


def test_arrow_exactness_guard_trips_past_2_53(spark, lm_and_scored):
    # the arrow scorer's int64 smoothing operands must stay under 2^53
    # for float64 division to be the exact rounded ratio; a k_den that
    # blows the bound must fail loudly at model-freeze, not drift
    lm, _, _ = lm_and_scored
    target = spark.createDataFrame([(1, "the cat")], "doc_id long, text string")
    with pytest.raises(ValueError, match="2\\^53"):
        lm_score(
            target, lm, broadcast_model=True, k_num=1, k_den=1 << 53
        ).collect()
    # and the join engine (exact big-int fractions) still accepts it
    assert lm_score(
        target, lm, score_engine="join", k_num=1, k_den=1 << 53
    ).count() == 1


def test_lm_quantile_filter_single_scan(spark, lm_and_scored):
    from hermes_spark.operators import lm_quantile_filter

    lm, _, _ = lm_and_scored
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    kept = lm_quantile_filter(
        target, lm, keep_frac=0.5, broadcast_model=True
    )
    # 3 scoreable docs (1, 3, 5); the median cutoff keeps the two at
    # or above it, so the all-OOV doc 3 (worst score) drops and the
    # short/blank docs are omitted entirely
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [1, 5]
    # keep_frac=1.0 keeps every scoreable doc, no quantile needed
    all_ids = sorted(
        r.doc_id
        for r in lm_quantile_filter(target, lm, keep_frac=1.0).collect()
    )
    assert all_ids == [1, 3, 5]
    # original columns survive the id join
    assert set(kept.columns) == {"doc_id", "text"}
    with pytest.raises(ValueError, match="keep_frac"):
        lm_quantile_filter(target, lm, keep_frac=0.0)

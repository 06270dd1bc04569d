"""Regression pins for the round-7 advisor findings: Ã+NBSP mojibake
single-pass repair, cms_inner_product phantom-depth underestimate,
ranking_metrics dropping unjudged queries, BPE train/encode case-fold
agreement."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.functions.clean import clean_text
from hermes_spark.operators import bpe_encode, bpe_train_merges, ranking_metrics
from hermes_spark.operators.sketch import cms_inner_product, cms_state


def _clean_one(spark, s):
    df = spark.createDataFrame([(s,)], "s string")
    (once,) = [r.o for r in df.select(clean_text(F.col("s")).alias("o")).collect()]
    (twice,) = [
        r.o
        for r in df.select(clean_text(clean_text(F.col("s"))).alias("o")).collect()
    ]
    return once, twice


def test_a_grave_nbsp_mojibake_single_pass(spark):
    """True cp1252 mojibake of 'à' is Ã+NBSP (0xC3 0xA0): must repair in
    ONE pass, and clean_text must stay idempotent on it."""
    once, twice = _clean_one(spark, "voilÃ  fini")
    assert once == "voilà fini"
    assert twice == once


@pytest.mark.parametrize(
    "damaged",
    [
        "voilÃ ",  # Ã + NBSP (the r7 finding)
        "voilÃ ",  # Ã + already-normalized space (fallback rule)
        "cafÃ© Â x",  # é damage + Â+NBSP from r6
        "Ã Ã Ã ",  # repeated damage
    ],
)
def test_clean_text_idempotent_damage_alphabet(spark, damaged):
    once, twice = _clean_one(spark, damaged)
    assert once == twice, (damaged, once, twice)


def test_cms_inner_product_ignores_oversized_depth(spark):
    """depth larger than the states' real depth must not coalesce the
    estimate to 0 (never-underestimate guarantee)."""
    a = spark.createDataFrame([(i % 50,) for i in range(500)], "k long")
    b = spark.createDataFrame([(i % 50,) for i in range(300)], "k long")
    true_size = a.join(b, "k").count()
    sa = cms_state(a, "k", depth=3, width=1024)
    sb = cms_state(b, "k", depth=3, width=1024)
    est_ok = cms_inner_product(sa, sb, depth=3).collect()[0].join_size_est
    est_big = cms_inner_product(sa, sb, depth=99).collect()[0].join_size_est
    assert est_ok == est_big  # depth is advisory now
    assert est_big >= true_size  # never an underestimate


def test_cms_inner_product_empty_states(spark):
    empty = spark.createDataFrame([], "k long")
    s = cms_state(empty, "k", depth=3, width=64)
    assert cms_inner_product(s, s).collect()[0].join_size_est == 0


def test_ranking_metrics_keeps_unjudged_queries(spark):
    """A query present in results but absent from relevant must appear
    with n_relevant = 0 and all-zero metrics, not vanish."""
    results = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "a", 1)],
        "query_id long, item string, rank long",
    )
    relevant = spark.createDataFrame([(1, "a")], "query_id long, item string")
    rows = {r.query_id: r for r in ranking_metrics(results, relevant).collect()}
    assert set(rows) == {1, 2}
    q2 = rows[2]
    assert q2.n_relevant == 0 and q2.n_retrieved == 1 and q2.n_hit == 0
    assert q2.recall_at_k == 0.0 and q2.mrr == 0.0 and q2.ndcg_at_k == 0.0
    q1 = rows[1]
    assert q1.n_relevant == 1 and q1.n_hit == 1 and q1.recall_at_k == 1.0


def test_bpe_case_fold_agreement(spark):
    """Train and encode must use the SAME (JVM) case folding: words with
    code points where Python and Java lowercasing disagree (e.g. 'İ')
    still hit merges learned at train time."""
    word = "İSTANBUL"  # dotted capital I + STANBUL
    df = spark.createDataFrame(
        [(i, f"{word} {word}") for i in range(4)], "doc_id long, text string"
    )
    merges = bpe_train_merges(df, num_merges=50)
    enc = bpe_encode(df, merges).collect()[0]
    # fully merged: each word collapses to ONE piece under the learned
    # merges, which only happens if encode's fold matches train's fold
    assert enc.n_pieces == 2, enc.pieces

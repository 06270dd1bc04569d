"""Gopher rule gate: per-rule behavior, composition, and the
zero-shuffle plan contract."""

from pyspark.sql import functions as F

from hermes_spark.operators import gopher_filter, gopher_quality_flags
from hermes_spark.plans import count_exchanges, plan_operators


def _frame(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


GOOD = "the cat and the dog have fun with all of that stuff " * 5


def test_each_rule_fires(spark):
    rows = [
        (1, GOOD),                                       # passes everything
        (2, "too short to have many words"),             # n_words
        (3, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j\n" + GOOD),  # bullets
        (4, GOOD + " " + "#" * 40),                      # symbols
        (5, ("the and of to be that have with " * 8) + "\nx...\ny...\nz..."),  # ellipsis lines
        (6, "1 2 3 4 5 6 7 8 9 0 " * 10),                # alpha words
        (7, "zz qq ww ee rr tt yy uu ii oo " * 10),      # stopwords
    ]
    flags = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            _frame(spark, rows), "doc_id", "text", min_words=20
        ).collect()
    }
    assert flags[1]["keep"]
    assert not flags[2]["keep"] and flags[2]["n_words"] < 20
    assert not flags[3]["keep"] and flags[3]["bullet_ratio"] > 0.9
    assert not flags[4]["keep"] and flags[4]["symbol_ratio"] > 0.1
    assert not flags[5]["keep"] and flags[5]["ellipsis_ratio"] > 0.3
    assert not flags[6]["keep"] and flags[6]["alpha_word_ratio"] < 0.8
    assert not flags[7]["keep"] and flags[7]["n_stopwords"] < 2


def test_filter_returns_original_rows(spark):
    rows = [(1, GOOD), (2, "tiny")]
    kept = gopher_filter(_frame(spark, rows), "doc_id", "text", min_words=20)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    assert kept.columns == ["doc_id", "text"]


def test_mean_word_len_bounds(spark):
    rows = [
        (1, "a b c d e " * 20 + "the of"),               # mean len 1 -> fail
        (2, ("supercalifragilistic " * 30) + "the of"),  # mean len 21 -> fail
    ]
    flags = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            _frame(spark, rows), "doc_id", "text", min_words=20
        ).collect()
    }
    assert flags[1]["mean_word_len"] < 3 and not flags[1]["keep"]
    assert flags[2]["mean_word_len"] > 10 and not flags[2]["keep"]


def test_flags_zero_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_quality_flags(docs, "doc_id", "text")
    assert count_exchanges(out) == 0
    assert not any("Join" in op or "Window" in op for op in plan_operators(out))


def test_filter_zero_shuffle_single_scan(spark, sf_dir):
    """The gate must ride the scan: no join, no exchange, no second
    corpus pass (a semi-join against the flags frame would add both)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_filter(docs, "doc_id", "text")
    ops = plan_operators(out)
    assert count_exchanges(out) == 0
    assert not any("Join" in op for op in ops), ops
    assert sum("Scan parquet" in op for op in ops) == 1


def test_filter_agrees_with_flags(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    via_filter = sorted(
        r["doc_id"]
        for r in gopher_filter(docs, "doc_id", "text", min_words=20,
                               min_stopwords=1).select("doc_id").collect()
    )
    via_flags = sorted(
        r["doc_id"]
        for r in gopher_quality_flags(docs, "doc_id", "text", min_words=20,
                                      min_stopwords=1)
        .filter("keep").select("doc_id").collect()
    )
    assert via_filter == via_flags and via_filter


def test_thresholds_parameterizable(spark):
    rows = [(1, "five words here right now the of")]
    strict = gopher_quality_flags(
        _frame(spark, rows), "doc_id", "text", min_words=100
    ).collect()[0]
    loose = gopher_quality_flags(
        _frame(spark, rows), "doc_id", "text", min_words=5
    ).collect()[0]
    assert not strict["keep"] and loose["keep"]


def test_flags_plan_splits_text_once(spark, sf_dir):
    """r7 split-once pin: the optimized flags plan materializes the
    token and line arrays in ONE prior projection (exactly two split()
    calls total — tokens + lines), instead of re-splitting the text
    inside each of the seven metric expressions (measured 7.7x on 1M
    docs)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = gopher_quality_flags(docs, "doc_id", "text")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 2, plan
    # the pre-projection survives optimization: metrics reference the
    # materialized arrays, not inline re-splits
    assert "__toks" in plan and "__lines" in plan

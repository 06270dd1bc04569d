"""The datasheet job: section completeness and value sanity."""

import pytest

from hermes_spark.cli.datasheet_job import run
from hermes_spark.exceptions import MissingArgumentException


def test_datasheet_sections(spark, sf_dir):
    recs = run(spark, [
        "--format", "parquet", "--path", f"{sf_dir}/documents.parquet",
        "--source-col", "source", "--lang-col", "lang",
    ])
    by_kind = {}
    for r in recs:
        by_kind.setdefault(r["report"], []).append(r)

    corpus = by_kind["corpus"][0]
    assert corpus["n_docs"] == 500 and corpus["n_sources"] == 20
    assert corpus["total_tokens_bpe"] >= corpus["total_tokens_ws"] > 0

    assert abs(sum(r["share"] for r in by_kind["lang_mix"]) - 1.0) < 0.01

    dup = by_kind["dup"][0]
    assert 0 <= dup["exact_dup_rate"] <= dup["bag_dup_rate"] <= 1

    assert len(by_kind["source"]) == 20
    assert sum(r["n_docs"] for r in by_kind["source"]) == 500

    qs = {r["q"]: r["est"] for r in by_kind["length_tokens"]}
    assert qs[0.1] <= qs[0.5] <= qs[0.9] <= qs[0.99]

    gopher = by_kind["gopher"][0]
    assert 0 <= gopher["pass_rate"] <= 1 and "avg_n_words" in gopher
    c4 = by_kind["c4"][0]
    assert 0 <= c4["avg_line_keep_ratio"] <= 1


def test_datasheet_without_optional_columns(spark, sf_dir):
    recs = run(spark, [
        "--format", "parquet", "--path", f"{sf_dir}/documents.parquet",
    ])
    kinds = {r["report"] for r in recs}
    # heuristic lang-id replaces the label; no per-source section
    assert "lang_mix" in kinds and "source" not in kinds


def test_datasheet_missing_column_raises(spark, sf_dir):
    with pytest.raises(MissingArgumentException, match="not in source"):
        run(spark, [
            "--format", "parquet", "--path", f"{sf_dir}/documents.parquet",
            "--id-col", "nope",
        ])
    # optional columns are validated too (a typo must not surface as an
    # opaque AnalysisException later)
    with pytest.raises(MissingArgumentException, match="not in source"):
        run(spark, [
            "--format", "parquet", "--path", f"{sf_dir}/documents.parquet",
            "--source-col", "sorce",
        ])


def test_datasheet_empty_corpus(spark, tmp_path):
    p = str(tmp_path / "empty")
    spark.createDataFrame([], "doc_id long, text string").write.parquet(p)
    recs = run(spark, ["--format", "parquet", "--path", p])
    kinds = [r["report"] for r in recs]
    assert kinds[0] == "corpus" and recs[0]["n_docs"] == 0
    assert "empty" in kinds  # clean early return, no ZeroDivisionError


def test_datasheet_script_aware_flag(spark, tmp_path):
    """--script-aware true: the card's Gopher pass rate must count
    fluent CJK docs as passes instead of reporting the bogus near-zero
    rate the plain rules give unsegmented scripts."""
    from hermes_spark.cli.datasheet_job import run

    zh = "机器学习是人工智能的一个分支，它使计算机能够从数据中学习。" * 4
    en = "the cat and the dog have fun with all of that stuff here. " * 5
    df = spark.createDataFrame(
        [(i, zh if i % 2 else en) for i in range(20)], "doc_id long, text string"
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    args = ["--format", "parquet", "--path", path,
            "--id-col", "doc_id", "--text-col", "text"]
    plain = {r["report"]: r for r in run(spark, args)}
    aware = {r["report"]: r for r in run(spark, args + ["--script-aware", "true"])}
    # min_words default 50: en docs ~55 words pass, zh pass only when
    # the char proxy counts them
    assert aware["gopher"]["pass_rate"] > plain["gopher"]["pass_rate"]
    assert aware["gopher"]["pass_rate"] == 1.0

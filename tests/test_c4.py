"""C4 line-cleaning rules: per-rule behavior, doc drops, composition
with the Gopher gate, and the zero-shuffle plan contract."""

from pyspark.sql import functions as F

from hermes_spark.operators import c4_clean, c4_line_stats
from hermes_spark.plans import count_exchanges, plan_operators


def _frame(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_line_rules(spark):
    rows = [
        (1, "This is a good sentence.\nHome | About | Contact\nAnother fine line here!"),
    ]
    out = c4_clean(_frame(spark, rows), "doc_id", "text").collect()[0]
    # the nav fragment (no terminal punctuation) is dropped, both real
    # sentences survive
    assert out["n_lines_in"] == 3 and out["n_lines_kept"] == 2
    assert "Home" not in out["text"]
    assert out["text"].count("\n") == 1


def test_doc_rules_drop_poisoned(spark):
    rows = [
        (1, "A perfectly good sentence here."),
        (2, "function f() { return 1; }\nA good sentence here."),
        (3, "Lorem ipsum dolor sit amet.\nReal text follows here."),
        (4, "No surviving lines here"),  # no terminal punctuation
    ]
    kept = [r["doc_id"] for r in c4_clean(_frame(spark, rows), "doc_id", "text").collect()]
    assert kept == [1]


def test_short_line_threshold(spark):
    rows = [(1, "Tiny one.\nThis line has enough words in it.")]
    strict = c4_clean(_frame(spark, rows), "doc_id", "text", min_line_words=4).collect()[0]
    loose = c4_clean(_frame(spark, rows), "doc_id", "text", min_line_words=2).collect()[0]
    assert strict["n_lines_kept"] == 1 and loose["n_lines_kept"] == 2


def test_stats_view_drops_nothing(spark):
    rows = [
        (1, "Good sentence number one."),
        (2, "code { brace }"),
    ]
    stats = c4_line_stats(_frame(spark, rows), "doc_id", "text").collect()
    assert len(stats) == 2
    by_id = {r["doc_id"]: r for r in stats}
    assert not by_id[1]["doc_poisoned"] and by_id[2]["doc_poisoned"]
    assert by_id[1]["keep_ratio"] == 1.0


def test_composes_with_gopher_gate(spark):
    from hermes_spark.operators import gopher_quality_flags

    body = "the cat and the dog have fun with all of that stuff. " * 5
    rows = [(1, body + "\nHome | Nav | Menu\n" + body)]
    cleaned = c4_clean(_frame(spark, rows), "doc_id", "text")
    flags = gopher_quality_flags(cleaned, "doc_id", "text", min_words=20).collect()[0]
    assert flags["keep"]


def test_zero_shuffle_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = c4_line_stats(docs, "doc_id", "text")
    assert count_exchanges(out) == 0
    assert not any("Join" in op or "Window" in op for op in plan_operators(out))
    cleaned = c4_clean(docs, "doc_id", "text")
    assert count_exchanges(cleaned) == 0

"""Outlink extraction and host-graph aggregation: quote styles, case,
relative-link skipping, multiplicity, canonicalization, plan shape."""

from pyspark.sql import functions as F

from hermes_spark.operators import extract_outlinks, host_link_graph, outlinks
from hermes_spark.plans import count_exchanges

PAGE = (
    '<html><body>'
    '<a href="https://www.Example.COM/a/?utm_source=x&z=1&b=2">one</a>'
    "<A HREF='http://example.com/a?b=2&z=1'>two</A>"
    '<a href="/relative/path">rel</a>'
    '<a href="mailto:x@example.com">mail</a>'
    '<a href="https://cdn.example.net:8080/x.js">port</a>'
    '<a href="https://www.example.com/a?z=1&b=2&utm_source=y">dup</a>'
    "</body></html>"
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, html string")


def test_outlinks_raw_order_and_skips(spark):
    raw = (
        _frame(spark, [(1, PAGE)])
        .select(outlinks(F.col("html")).alias("l"))
        .collect()[0]["l"]
    )
    # relative + mailto skipped; double-quoted style first, then single
    assert len(raw) == 4
    assert raw[0].startswith("https://www.Example.COM")
    assert sum(1 for u in raw if u.startswith("http://")) == 1


def test_canonicalization_merges_variants(spark):
    out = extract_outlinks(_frame(spark, [(1, PAGE)]), "doc_id", "html")
    targets = [r["target"] for r in out.collect()]
    # all three /a variants canonicalize to one key: host lowercased,
    # www/tracking stripped, params sorted, trailing slash dropped
    assert targets.count("example.com/a?b=2&z=1") == 3
    assert "cdn.example.net:8080/x.js" in targets


def test_host_graph_weights_parallel_edges(spark):
    df = _frame(spark, [(1, PAGE), (2, PAGE)]).withColumn(
        "src_host", F.concat(F.lit("h"), F.col("doc_id").cast("string"))
    )
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(df, "src_host", "html").collect()
    }
    assert edges[("h1", "example.com")] == 3
    assert edges[("h1", "cdn.example.net:8080")] == 1
    assert edges[("h2", "example.com")] == 3


def test_null_and_malformed(spark):
    rows = [(1, None), (2, '<a href="https://ok.org/x">y</a><a href="broken'),
            (3, "no links at all")]
    out = extract_outlinks(_frame(spark, rows), "doc_id", "html").collect()
    assert [(r["doc_id"], r["target"]) for r in out] == [(2, "ok.org/x")]


def test_plan_shapes(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.col("text").alias("html"),
        F.lit("src.example.org").alias("src_host"),
    )
    assert count_exchanges(extract_outlinks(docs, "doc_id", "html")) == 0
    # ONE shuffle for the edge aggregation (AQE may plan it as a single
    # exchange pair; assert no more than the groupBy's)
    assert count_exchanges(host_link_graph(docs, "src_host", "html")) == 1

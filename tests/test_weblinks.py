"""Outlink extraction and host-graph aggregation: quote styles, case,
document order, script/comment stripping, unquoted values, relative
resolution (+ <base href>), multiplicity, canonicalization, plan shape."""

from pyspark.sql import functions as F

from hermes_spark.operators import extract_outlinks, host_link_graph, outlinks
from hermes_spark.operators.weblinks import base_href, resolve_href
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

MESSY = (
    "<html><head><base href='https://www.Base.example.net/dir/sub/'>"
    "<script>var u = \"https://evil.example.com/x\"; "
    'document.write(\'<a href="https://snek.example.com/">\');</script>'
    "<style>.x { background: url(https://css.example.com/b.png) }</style>"
    '</head><body>'
    '<!-- <a href="https://ghost.example.com/gone">commented out</a> -->'
    "<a href=https://unquoted.example.com/u?z=9>unquoted</a>"
    '<div data-href="https://datahref.example.com/no">not a link</div>'
    '<a href="../up/one.html">dotdot</a>'
    "<a href='/rooted/r.html'>rooted</a>"
    '<a href="plain/child.html">child</a>'
    '<a href="//proto.example.io/p">protocol-relative</a>'
    '<a href="#frag">fragment</a>'
    '<a href="javascript:void(0)">js</a>'
    "</body></html>"
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, html string")


def test_outlinks_raw_document_order(spark):
    raw = (
        _frame(spark, [(1, PAGE)])
        .select(outlinks(F.col("html")).alias("l"))
        .collect()[0]["l"]
    )
    # raw values in TRUE document order, every form kept (resolution
    # and scheme filtering are the callers' choice)
    assert raw == [
        "https://www.Example.COM/a/?utm_source=x&z=1&b=2",
        "http://example.com/a?b=2&z=1",
        "/relative/path",
        "mailto:x@example.com",
        "https://cdn.example.net:8080/x.js",
        "https://www.example.com/a?z=1&b=2&utm_source=y",
    ]


def test_outlinks_strips_and_unquoted(spark):
    raw = (
        _frame(spark, [(1, MESSY)])
        .select(outlinks(F.col("html")).alias("l"))
        .collect()[0]["l"]
    )
    # script/style/comment spans, data-href and the <base> tag's own
    # href (resolution metadata, not a link) never contribute
    assert raw == [
        "https://unquoted.example.com/u?z=9",
        "../up/one.html",
        "/rooted/r.html",
        "plain/child.html",
        "//proto.example.io/p",
        "#frag",
        "javascript:void(0)",
    ]


def test_base_href_and_resolution(spark):
    out = (
        _frame(spark, [(1, MESSY)])
        .select(base_href(F.col("html")).alias("b"))
        .collect()[0]["b"]
    )
    assert out == "https://www.Base.example.net/dir/sub/"

    cases = [
        ("https://h.org/a/b/page.html", "x/y.html", "https://h.org/a/b/x/y.html"),
        ("https://h.org/a/b/page.html", "../up.html", "https://h.org/a/up.html"),
        ("https://h.org/a/b/", "../../../too/deep", "https://h.org/too/deep"),
        ("https://h.org/a/b/page.html", "/rooted", "https://h.org/rooted"),
        ("https://h.org/a/b/page.html", "//cdn.io/x", "https://cdn.io/x"),
        ("http://h.org/p", "//cdn.io/x", "http://cdn.io/x"),
        ("https://h.org/p?q=1", "?q=2", "https://h.org/p?q=2"),
        # base's last segment strips before merging; dot segments collapse
        ("https://h.org/a/./b/../c", "./d", "https://h.org/a/d"),
        ("https://h.org", "child", "https://h.org/child"),
        ("https://h.org/p", "https://abs.example.com/x", "https://abs.example.com/x"),
        ("https://h.org/p", "mailto:x@y.z", None),
        ("https://h.org/p", "javascript:void(0)", None),
        ("https://h.org/p", "#frag", None),
        ("https://h.org/p", "", None),
        ("not a url", "child", None),
    ]
    df = spark.createDataFrame(cases, "base string, href string, want string")
    got = df.select(
        "want", resolve_href(F.col("base"), F.col("href")).alias("got")
    ).collect()
    for r in got:
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_extract_outlinks_resolved_vs_absolute_only(spark):
    pages = _frame(spark, [(1, MESSY)]).withColumn(
        "page_url", F.lit("https://www.Host.example.org/a/b/page.html")
    )
    # absolute-only floor (no page_url): just the unquoted absolute
    abs_only = {
        r["target"]
        for r in extract_outlinks(pages, "doc_id", "html").collect()
    }
    assert abs_only == {"unquoted.example.com/u?z=9"}
    # resolved: relative links land on the BASE TAG host (it overrides
    # the page URL), protocol-relative keeps the base scheme
    resolved = sorted(
        r["target"]
        for r in extract_outlinks(
            pages, "doc_id", "html", page_url_col="page_url"
        ).collect()
    )
    assert resolved == sorted(
        [
            "unquoted.example.com/u?z=9",
            "base.example.net/dir/up/one.html",
            "base.example.net/rooted/r.html",
            "base.example.net/dir/sub/plain/child.html",
            "proto.example.io/p",
        ]
    )


def test_canonicalization_merges_variants(spark):
    out = extract_outlinks(_frame(spark, [(1, PAGE)]), "doc_id", "html")
    targets = [r["target"] for r in out.collect()]
    # all three /a variants canonicalize to one key: host lowercased,
    # www/tracking stripped, params sorted, trailing slash dropped
    assert targets.count("example.com/a?b=2&z=1") == 3
    assert "cdn.example.net:8080/x.js" in targets


def test_host_graph_weights_and_same_host_resolution(spark):
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
    # relative links now resolve to the page's own host instead of
    # dropping (pre-r9 undercount): /relative/path -> self-edge
    assert edges[("h1", "h1")] == 1
    assert edges[("h2", "h2")] == 1


def test_host_graph_page_url_base(spark):
    rows = [(1, '<a href="../x.html">up</a><a href="https://other.org/y">o</a>')]
    df = _frame(spark, rows).withColumn(
        "src_host", F.lit("pages.example.org")
    ).withColumn(
        "page_url", F.lit("https://pages.example.org/a/b/c.html")
    )
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(
            df, "src_host", "html", page_url_col="page_url"
        ).collect()
    }
    assert edges == {
        ("pages.example.org", "pages.example.org"): 1,
        ("pages.example.org", "other.org"): 1,
    }


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

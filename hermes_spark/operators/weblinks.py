"""Web-graph construction from crawled HTML: outlink extraction and
host-level edge aggregation.

The link-authority stage of a crawl-curation pipeline (PageRank priors,
link-farm detection, crawl-frontier expansion) needs (source, target)
edges, and at 100 TB the edges come straight out of the page scan —
there is no separate "graph ETL".  This module turns a page frame into
that edge list with pure expressions:

1. ``outlinks``        — every ``href="..."`` target of a page, as an
                         array column (document order, absolute
                         http(s) URLs only — crawls resolve relative
                         links against the fetch URL before this point,
                         or simply skip them for host-graph purposes);
2. ``host_link_graph`` — aggregated ``(src_host, dst_host, n_links)``
                         edges, link targets canonicalized with
                         ``canonical_url`` (tracking params dropped,
                         ``www.`` folded) so byte-distinct URLs of one
                         resource don't inflate edge weights.

Self-loops (links within ``src_host``) are kept — callers filter them
when ranking cross-site authority; they carry real signal for
navigation-template detection.

Scale design: extraction is a zero-shuffle scan expression; the edge
aggregation is ONE groupBy over (src_host, dst_host) with map-side
partial aggregation, and the output is host-cardinality (millions),
not page-cardinality (billions).  Feeds ``operators.graph.pagerank`` /
``degree_stats`` directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import canonical_url

#: href attribute with an absolute http(s) target, either quote style.
#: Group 1/2: the URL (double-/single-quoted).  Lazy parsing of broken
#: markup is deliberate — crawls are full of it, and a missing close
#: quote must not swallow the rest of the page.
#: explicit whitespace class (Java \s includes \x0b, RE2 \s does not —
#: the oracle shares this pattern byte-for-byte)
_WS = r"[ \t\n\f\r\x0b]"
_HREF = (
    r"(?is)\bhref" + _WS + r"*=" + _WS
    + r"""*(?:"(https?://[^"]+)"|'(https?://[^']+)')"""
)


def outlinks(html: Column) -> Column:
    """``array<string>`` of the page's absolute http(s) link targets,
    in document order (duplicates kept — multiplicity is the edge
    weight)."""
    dq = F.regexp_extract_all(html, F.lit(_HREF), 1)
    sq = F.regexp_extract_all(html, F.lit(_HREF), 2)
    # the alternation leaves the non-matching quote style's group
    # empty; drop the empties and keep document order within each style
    return F.filter(F.concat(dq, sq), lambda u: u != "")


def extract_outlinks(
    df: DataFrame,
    id_col: str,
    html_col: str,
    *,
    canonicalize: bool = True,
    out_col: str = "target",
) -> DataFrame:
    """One row per (page, link target): ``(id_col, out_col)``.

    With ``canonicalize=True`` targets are normalized dedup keys
    (``canonical_url``: host without www, no tracking params, sorted
    query, no scheme/fragment); unparseable URLs drop out.  Zero
    shuffle — explode is a scan-side generator.
    """
    links = df.select(
        F.col(id_col), F.explode(outlinks(F.col(html_col))).alias("__raw")
    )
    target = canonical_url(F.col("__raw")) if canonicalize else F.col("__raw")
    return links.select(
        id_col, target.alias(out_col)
    ).filter(F.col(out_col).isNotNull())


def host_link_graph(
    df: DataFrame,
    src_host_col: str,
    html_col: str,
) -> DataFrame:
    """Aggregated host-level edges ``(src_host, dst_host, n_links)``.

    ``src_host_col`` is the page's own host (crawl metadata — WARC
    records carry it; ``canonical_url`` of the fetch URL yields it).
    ``n_links`` counts every href occurrence, so parallel edges from
    one page weight the edge — the input PageRank and link-farm
    heuristics expect.  ONE shuffle (the groupBy), map-side combined.
    """
    # canonical_url output starts with the (lowercased, www-stripped)
    # host; the first /?# ends it.  A non-default port stays — distinct
    # origins are distinct graph nodes.
    dst_host = F.regexp_extract(F.col("__t"), r"^([^/?#]+)", 1)
    exploded = df.select(
        F.col(src_host_col).alias("src_host"),
        F.explode(outlinks(F.col(html_col))).alias("__raw"),
    ).select(
        "src_host", canonical_url(F.col("__raw")).alias("__t")
    ).filter(F.col("__t").isNotNull())
    return (
        exploded.select("src_host", dst_host.alias("dst_host"))
        .filter(F.col("dst_host") != "")
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )

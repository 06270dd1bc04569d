"""Quality-prior example: link authority decides which duplicate wins.

Real crawls carry the same article on many mirrors; naive dedup keeps
an arbitrary copy.  The classic fix (used by CommonCrawl-derived
corpora) is an authority prior: rank hosts by link analysis, then keep
each duplicate group's copy from the MOST AUTHORITATIVE host — that
copy tends to be the canonical origin with the cleanest markup.

Pipeline (each stage an engine operator):

  1. ``host_link_graph``   — host-level edges from raw page HTML
     (relative links resolved against the page URL);
  2. ``pagerank``          — 10 power iterations over the host graph;
  3. ``extract_main_text`` — chrome-free document text;
  4. ``exact_dedup(keep_by=host_rank)`` — duplicate groups keep the
     highest-ranked host's copy (ties: lowest doc_id, deterministic).

Usage (from the repo root):  python examples/quality_prior.py
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hermes_spark.operators import exact_dedup, extract_main_text
from hermes_spark.operators.graph import pagerank
from hermes_spark.operators.weblinks import host_link_graph


def synth_pages(spark):
    """40 pages on 4 hosts. ``origin.example`` is linked by everyone
    (the authority); ``mirror-?.example`` syndicate its articles
    byte-for-byte but collect no inlinks."""
    rows = []
    for i in range(10):
        body = (
            f"<p>Article {i} explains the topic with enough words to "
            "matter and a couple of sentences of actual content.</p>"
        )
        # the canonical copy links around its own site (relative) and
        # to a couple of peers (absolute)
        rows.append((
            "origin.example", f"https://origin.example/a/{i}",
            f"<html><body><nav><a href='/'>Home</a></nav>{body}"
            f"<a href='/a/{(i + 1) % 10}'>next</a>"
            "<a href='https://peer.example/'>peer</a></body></html>",
        ))
        for m in (1, 2):
            # mirrors host the same body and link BACK to the origin
            rows.append((
                f"mirror-{m}.example",
                f"https://mirror-{m}.example/copy/{i}",
                f"<html><body>{body}"
                "<a href='https://origin.example/'>source</a></body></html>",
            ))
    for i in range(10):
        rows.append((
            "peer.example", f"https://peer.example/{i}",
            f"<html><body><p>Peer page {i} with its own words and one "
            "link.</p><a href='https://origin.example/'>ref</a></body></html>",
        ))
    return spark.createDataFrame(rows, "src_host string, url string, html string")


def main() -> int:
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("quality-prior-example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        pages = synth_pages(spark)

        # 1-2. authority prior: host graph -> PageRank (host_rank is a
        # HOST-count-sized frame -> broadcast join against the docs)
        edges = host_link_graph(pages, "src_host", "html", page_url_col="url")
        ranks = pagerank(
            edges.select(F.col("src_host").alias("src"),
                         F.col("dst_host").alias("dst")),
            iterations=10,
        ).withColumnRenamed("node", "src_host").withColumnRenamed(
            "rank", "host_rank"
        )
        print("host authority (PageRank):")
        for r in ranks.orderBy(F.desc("host_rank")).collect():
            print(f"  {r['src_host']:20s} {r['host_rank']:.4f}")

        # 3. chrome-free text (extract_main_text keeps only the id —
        # the host re-derives from the URL id, no join needed)
        docs = extract_main_text(
            pages.select(F.col("url").alias("doc_id"), "html"),
            "doc_id", "html",
        ).select(
            "doc_id",
            F.regexp_extract("doc_id", r"^https?://([^/]+)", 1).alias("src_host"),
            F.col("main_text").alias("text"),
        )

        # 4. dedup keeps the copy from the most authoritative host
        scored = docs.join(F.broadcast(ranks), on="src_host", how="left")
        kept = exact_dedup(
            scored, "doc_id", "text", keep_by=F.col("host_rank")
        )
        n_in, n_out = docs.count(), kept.count()
        by_host = {
            r["src_host"]: r["n"]
            for r in kept.groupBy("src_host").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
        print(f"\ndocs {n_in} -> {n_out} after authority-keep dedup")
        print(f"survivors by host: {by_host}")
        assert by_host.get("origin.example") == 10, by_host
        assert "mirror-1.example" not in by_host, by_host
        assert "mirror-2.example" not in by_host, by_host
        print("every duplicate group kept the canonical origin copy")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())

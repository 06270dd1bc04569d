"""Round-9 scale probes (VERDICT r8 items 4 and 6).

Usage: python tools/r9_probes.py [probe ...]   (default: warc_funnel_1m)

Probes — each prints one JSON line per result:

* ``warc_funnel_1m`` — the raw-crawl entry point the 100 TB pipeline
  starts from, end-to-end for the first time: gzipped WARC ``response``
  shards (HTML body behind an HTTP envelope) → ``read_warc`` →
  ``http_response_text(extractor="main")`` → clean+C4 → Gopher gate →
  exact dedup, per-stage walls + docs/s.  The prior funnels started
  from synthetic parquet docs; this one verifies the claim that "WARC
  parse bounds ingestion" with numbers.
* ``pagerank_1m`` — the authority-prior pipeline composed end-to-end
  for the first time: ``host_link_graph`` over the same 1M raw pages →
  ``pagerank`` (10 iterations) → ``degree_stats``, on a power-law host
  distribution (log-uniform host ranks: the #1 host hosts ~7% of all
  pages, exercising AQE's skew handling on the hub keys).

Corpus (shared, generated once per run): 1M synthetic HTML pages in
1000 gzipped WARC shards, written by Spark tasks (one task per shard;
in local mode executors share /tmp — on a real cluster the writer
would target shared storage, but shard SYNTHESIS is fixture code, not
engine code).  Pages are deterministic functions of their page id:
Zipf-ish prose paragraphs, nav/footer chrome for the main-content
extractor to drop, a <base href> on every 9th page, absolute links to
log-uniform-popular hosts plus relative/unquoted/trap links for the
resolver, and every 37th page an exact body-duplicate of its
predecessor for the dedup stage.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = "/tmp/r9_warc1m"
N_PAGES = int(os.environ.get("WARC_PAGES", "1000000"))
PAGES_PER_SHARD = 1000
N_HOSTS = 10_000


def out(obj) -> None:
    print(json.dumps(obj), flush=True)


def get_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r9-probes")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # CPU-bound text scans starve on IO-sized splits (r8 lesson)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


# ---------------------------------------------------------------- fixtures

def _vocab():
    """5k deterministic word-shaped tokens (lengths 2-11) so the Gopher
    mean-word-length and stopword gates see realistic prose."""
    import random

    rng = random.Random(99)
    words = ["the", "of", "and", "to", "in", "is", "that", "for", "with", "was"]
    letters = "abcdefghijklmnopqrstuvwxyz"
    while len(words) < 5000:
        n = rng.randint(2, 11)
        words.append("".join(rng.choice(letters) for _ in range(n)))
    # log-uniform sampling weights (Zipf-ish, exponent ~1)
    cum = []
    total = 0.0
    for r in range(1, len(words) + 1):
        total += 1.0 / r
        cum.append(total)
    return words, cum


def _host(rng, n_hosts=N_HOSTS) -> str:
    # log-uniform rank: host 1 drawn ~ln(n_hosts)x more often than the
    # median — the hub skew PageRank/AQE must survive
    rank = max(1, int(n_hosts ** rng.random()))
    return f"site{rank:05d}.example"


def _main_paragraphs(page_id: int, words, cum) -> str:
    """Pure function of page_id — the duplicate planting below relies
    on calling this with a DIFFERENT id to get that page's exact body."""
    import random

    rng = random.Random(page_id * 2 + 1)
    paras = []
    for _ in range(rng.randint(3, 7)):
        k = rng.randint(25, 70)
        toks = rng.choices(words, cum_weights=cum, k=k)
        toks[0] = toks[0].capitalize()
        paras.append("<p>" + " ".join(toks) + ".</p>")
    return "\n".join(paras)


def _page_html(page_id: int, host: str, words, cum) -> str:
    import random

    rng = random.Random(page_id)
    title = " ".join(rng.choices(words, cum_weights=cum, k=4))
    base = (
        f'<base href="https://{host}/section/">' if page_id % 9 == 0 else ""
    )
    nav = (
        '<nav><a href="/">Home</a> <a href="/about">About us</a> '
        '<a href="/contact">Contact sales</a></nav>'
    )
    # exact duplicate of the previous page's body on every 37th page
    body_id = page_id - 1 if (page_id % 37 == 36 and page_id > 0) else page_id
    body = _main_paragraphs(body_id, words, cum)
    links = []
    for _ in range(rng.randint(4, 12)):
        r = rng.random()
        n = rng.randint(1, 99)
        if r < 0.55:  # absolute cross-host, log-uniform popularity
            links.append(f'<a href="https://{_host(rng)}/p{n}">more</a>')
        elif r < 0.75:  # root-relative (resolves to own host)
            links.append(f'<a href="/p{n}">local</a>')
        elif r < 0.85:  # dot-segment relative
            links.append(f'<a href="../p{n}">up</a>')
        elif r < 0.92:  # unquoted (old markup)
            links.append(f"<a href=https://{_host(rng)}/q{n}>bare</a>")
        else:  # traps the extractor must ignore
            links.append(
                '<a href="mailto:x@y.z">mail</a><a href="#frag">jump</a>'
                '<script>u="https://evil.example/js"</script>'
            )
    footer = (
        '<div class="footer"><a href="/privacy">Privacy policy</a> '
        '<a href="/terms">Terms of service</a> We use cookies.</div>'
    )
    return (
        f"<html><head><title>{title}</title>{base}"
        "<style>p{margin:0}</style></head>"
        f"<body>{nav}<h1>{title}</h1>\n{body}\n"
        f"<div>{' '.join(links)}</div>{footer}</body></html>"
    )


def _shard_bytes(shard_id: int, words, cum) -> bytes:
    import gzip
    import random

    recs = []
    for j in range(PAGES_PER_SHARD):
        page_id = shard_id * PAGES_PER_SHARD + j
        host = _host(random.Random(page_id * 3 + 2))
        uri = f"https://{host}/page/{page_id}"
        html = _page_html(page_id, host, words, cum)
        http = (
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n\r\n"
        ) + html
        payload = http.encode()
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{page_id}>\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"WARC-Date: 2026-08-16T00:00:00Z\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        recs.append(gzip.compress(head + payload + b"\r\n\r\n"))
    return b"".join(recs)


def ensure_corpus(spark) -> str:
    """Generate the WARC shards once (distributed: one task per shard)."""
    shards_dir = f"{CORPUS_DIR}/shards"
    marker = f"{CORPUS_DIR}/.complete-{N_PAGES}"
    if os.path.exists(marker):
        return shards_dir
    shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    os.makedirs(shards_dir, exist_ok=True)
    n_shards = (N_PAGES + PAGES_PER_SHARD - 1) // PAGES_PER_SHARD

    def write_shards(it):
        words, cum = _vocab()
        for row in it:
            sid = row.id
            data = _shard_bytes(sid, words, cum)
            with open(f"{shards_dir}/shard-{sid:05d}.warc.gz", "wb") as f:
                f.write(data)

    t0 = time.time()
    spark.range(0, n_shards, 1, n_shards).foreachPartition(write_shards)
    size = sum(
        os.path.getsize(f"{shards_dir}/{f}") for f in os.listdir(shards_dir)
    )
    out({"probe": "corpus", "pages": N_PAGES, "shards": n_shards,
         "gz_bytes": size, "wall": round(time.time() - t0, 1)})
    open(marker, "w").close()
    return shards_dir


# ------------------------------------------------------------------ probes

def probe_warc_funnel_1m(spark) -> None:
    """Raw-WARC entry point end-to-end (VERDICT r8 item 4)."""
    from pyspark.sql import functions as F

    from hermes_spark.functions.clean import clean_text
    from hermes_spark.operators import c4_clean, exact_dedup, gopher_filter
    from hermes_spark.sources.warc import http_response_text, read_warc

    shards = ensure_corpus(spark)
    work = f"{CORPUS_DIR}/funnel"
    stages = []

    def stage(name, wall, rows):
        stages.append({"stage": name, "wall": round(wall, 1), "rows": rows})
        out({"probe": "warc_funnel_1m_stage", "stage": name,
             "wall": round(wall, 1), "rows": rows,
             "docs_per_s": round(rows / max(wall, 1e-9))})

    try:
        # 1. WARC parse + HTTP split + main-content extraction — all
        # one scan stage (zero shuffle), the ingestion bound under test
        t0 = time.time()
        recs = read_warc(spark, shards, types=("response",))
        docs = http_response_text(recs, extractor="main").select(
            F.col("record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            "text",
        )
        docs.write.mode("overwrite").parquet(f"{work}/parsed")
        docs = spark.read.parquet(f"{work}/parsed")
        stage("warc_parse+extract_main", time.time() - t0, docs.count())

        # 2. text repair + C4 line rules (scan-side)
        t0 = time.time()
        c4d = c4_clean(
            docs.select("doc_id", "url",
                        clean_text(F.col("text")).alias("text")),
            "doc_id", "text",
        )
        c4d.write.mode("overwrite").parquet(f"{work}/c4")
        c4d = spark.read.parquet(f"{work}/c4")
        stage("clean+c4", time.time() - t0, c4d.count())

        # 3. Gopher quality gate (stopwords exist in the vocab head);
        # min_words=120 drops the short 3-paragraph pages so the gate
        # has real selectivity, like a production threshold would
        t0 = time.time()
        gated = gopher_filter(
            c4d, "doc_id", "text", min_words=120, min_stopwords=1,
            min_mean_word_len=2.0, max_mean_word_len=12.0,
        )
        gated.write.mode("overwrite").parquet(f"{work}/gated")
        gated = spark.read.parquet(f"{work}/gated")
        stage("gopher", time.time() - t0, gated.count())

        # 4. exact dedup (keep the lexicographically-first URL — a
        # deterministic keep_by, like crawl dedup keeps canonical URLs)
        t0 = time.time()
        deduped = exact_dedup(gated, "doc_id", "text")
        # window/join outputs land AQE-coalesced (a handful of coarse
        # single-row-group files); write them WIDE so the next
        # CPU-bound stage scans at full core count instead of paying
        # a recovery exchange (docs/TUNING.md, round-10 lm_decomp)
        deduped.repartition(128).write.mode("overwrite").parquet(f"{work}/dedup")
        deduped = spark.read.parquet(f"{work}/dedup")
        stage("exact_dedup", time.time() - t0, deduped.count())

        out({"probe": "warc_funnel_1m", "pages": N_PAGES, "stages": stages,
             "total_wall": round(sum(s["wall"] for s in stages), 1)})
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_pagerank_1m(spark) -> None:
    """host_link_graph → pagerank → degree_stats (VERDICT r8 item 6)."""
    from pyspark.sql import functions as F

    from hermes_spark.operators.graph import degree_stats, pagerank
    from hermes_spark.operators.weblinks import host_link_graph
    from hermes_spark.sources.warc import read_warc

    shards = ensure_corpus(spark)
    work = f"{CORPUS_DIR}/graph"
    try:
        # 1. parse + href extraction + host collapse (one groupBy)
        t0 = time.time()
        recs = read_warc(spark, shards, types=("response",))
        # split the HTTP envelope off the body (same expression
        # http_response_text uses); headers never contain hrefs but the
        # <base href> scan should see only markup
        s = F.expr("make_valid_utf8(CAST(payload AS STRING))")
        sep = F.instr(s, "\r\n\r\n")
        body = F.when(sep > 0, F.substring(s, (sep + 4).cast("int"), F.length(s))).otherwise(s)
        pages = recs.select(
            F.regexp_extract("target_uri", r"^https?://([^/]+)", 1).alias("src_host"),
            F.col("target_uri").alias("url"),
            body.alias("html"),
        )
        edges = host_link_graph(pages, "src_host", "html", page_url_col="url")
        edges.write.mode("overwrite").parquet(f"{work}/edges")
        edges = spark.read.parquet(f"{work}/edges")
        n_edges = edges.count()
        wall_graph = time.time() - t0
        out({"probe": "pagerank_1m_stage", "stage": "host_link_graph",
             "wall": round(wall_graph, 1), "edges": n_edges,
             "pages_per_s": round(N_PAGES / wall_graph)})

        # hub skew the iterations must survive
        top = (
            edges.groupBy("dst_host").agg(F.sum("n_links").alias("in_links"))
            .orderBy(F.desc("in_links")).limit(3).collect()
        )
        out({"probe": "pagerank_1m_skew",
             "top_hosts": [(r["dst_host"], int(r["in_links"])) for r in top]})

        # 2. PageRank, 10 power iterations
        t0 = time.time()
        e = edges.select(
            F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
        )
        ranks = pagerank(e, iterations=10)
        ranks.write.mode("overwrite").parquet(f"{work}/ranks")
        ranks = spark.read.parquet(f"{work}/ranks")
        n_nodes = ranks.count()
        wall_pr = time.time() - t0
        mass = ranks.agg(F.sum("rank")).collect()[0][0]
        out({"probe": "pagerank_1m_stage", "stage": "pagerank10",
             "wall": round(wall_pr, 1), "nodes": n_nodes,
             "rank_mass": round(float(mass), 6)})

        # 3. degree stats
        t0 = time.time()
        deg = degree_stats(e)
        stats = deg.agg(
            F.count(F.lit(1)).alias("n"), F.max("in_deg").alias("max_in"),
            F.max("out_deg").alias("max_out"),
        ).collect()[0]
        out({"probe": "pagerank_1m_stage", "stage": "degree_stats",
             "wall": round(time.time() - t0, 1), "nodes": int(stats["n"]),
             "max_in_deg": int(stats["max_in"]),
             "max_out_deg": int(stats["max_out"])})
        out({"probe": "pagerank_1m", "pages": N_PAGES, "edges": n_edges,
             "nodes": n_nodes,
             "total_wall": round(wall_graph + wall_pr, 1)})
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_warc_full_funnel_1m(spark) -> None:
    """The COMPLETE pipeline from raw crawl bytes to packed training
    shards — every stage a user of the engine would run, composed once:
    WARC parse -> main extraction -> host graph + PageRank authority
    prior (round 10) -> clean+C4 -> Gopher -> exact dedup with
    keep_by=host_rank -> MinHash near-dup dedup -> LM perplexity filter
    -> epoch mix -> sequence packing."""
    from pyspark.sql import functions as F

    from hermes_spark.functions.clean import clean_text
    from hermes_spark.operators import (
        c4_clean,
        epoch_mix,
        exact_dedup,
        fuzzy_dedup_keep_one,
        gopher_filter,
        lm_quantile_filter,
        lm_train,
        minhash_lsh_pairs,
        pack_sequences,
    )
    from hermes_spark.operators.graph import pagerank
    from hermes_spark.operators.weblinks import host_link_graph
    from hermes_spark.sources.warc import http_response_text, read_warc

    shards = ensure_corpus(spark)
    work = f"{CORPUS_DIR}/full"
    stages = []

    def stage(name, wall, rows):
        stages.append({"stage": name, "wall": round(wall, 1), "rows": rows})
        out({"probe": "warc_full_funnel_1m_stage", "stage": name,
             "wall": round(wall, 1), "rows": rows})

    try:
        t0 = time.time()
        recs = read_warc(spark, shards, types=("response",))
        docs = http_response_text(
            recs, extractor="main", keep_body=True
        ).select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("target_uri").alias("url"),
            "html",
            "text",
        )
        docs.write.mode("overwrite").parquet(f"{work}/parsed")
        docs = spark.read.parquet(f"{work}/parsed")
        stage("warc_parse+extract_main", time.time() - t0, docs.count())

        # round-10: link-authority prior (examples/quality_prior.py at
        # 1M pages) — host graph from the kept html, 10 PageRank
        # iterations; ranks are host-cardinality (tiny, broadcastable)
        t0 = time.time()
        pages = docs.select(
            "doc_id", "url", "html",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias(
                "src_host"
            ),
        )
        edges = host_link_graph(
            pages, "src_host", "html", page_url_col="url"
        )
        ranks = pagerank(
            edges.select(
                F.col("src_host").alias("src"),
                F.col("dst_host").alias("dst"),
            ),
            iterations=10,
        ).select(
            F.col("node").alias("src_host"), F.col("rank").alias("host_rank")
        )
        ranks.write.mode("overwrite").parquet(f"{work}/ranks")
        ranks = spark.read.parquet(f"{work}/ranks")
        stage("host_graph+pagerank", time.time() - t0, ranks.count())
        docs = docs.select("doc_id", "url", "text")

        # Materialize the cleaned text BEFORE the Gopher gate: the gate
        # references the text column once per rule, and without a
        # barrier each reference re-evaluates the whole clean+C4 regex
        # chain (measured 350 s fused vs 77 s materialized at 1M pages
        # — expression trees don't CSE across a filter's rule columns).
        t0 = time.time()
        c4d = c4_clean(
            docs.select(
                "doc_id", "url", clean_text(F.col("text")).alias("text")
            ),
            "doc_id", "text",
            keep_cols=("url",),  # the keep_by stage re-derives src_host
        )
        c4d.write.mode("overwrite").parquet(f"{work}/c4")
        c4d = spark.read.parquet(f"{work}/c4")
        gated = gopher_filter(
            c4d, "doc_id", "text", min_words=120, min_stopwords=1,
            min_mean_word_len=2.0, max_mean_word_len=12.0,
        )
        gated.write.mode("overwrite").parquet(f"{work}/gated")
        gated = spark.read.parquet(f"{work}/gated")
        stage("clean+c4+gopher", time.time() - t0, gated.count())

        # round-10: the dedup keeps each duplicate group's copy from
        # the most AUTHORITATIVE host (keep_by=host_rank, broadcast
        # join against the host-cardinality rank frame) — the
        # canonical-origin-wins policy of examples/quality_prior.py,
        # costed composed at 1M pages
        t0 = time.time()
        with_rank = gated.withColumn(
            "src_host", F.regexp_extract("url", r"^https?://([^/]+)", 1)
        ).join(F.broadcast(ranks), "src_host", "left")
        deduped = exact_dedup(
            with_rank, "doc_id", "text", keep_by=F.col("host_rank")
        ).select("doc_id", "text")
        # window/join outputs land AQE-coalesced (a handful of coarse
        # single-row-group files); write them WIDE so the next
        # CPU-bound stage scans at full core count instead of paying
        # a recovery exchange (docs/TUNING.md, round-10 lm_decomp)
        deduped.repartition(128).write.mode("overwrite").parquet(f"{work}/dedup")
        deduped = spark.read.parquet(f"{work}/dedup")
        stage("exact_dedup_keep_by_rank", time.time() - t0, deduped.count())

        t0 = time.time()
        pairs = minhash_lsh_pairs(
            deduped, "doc_id", "text", shingle_n=3, num_hashes=32,
            num_bands=4, min_jaccard=0.7, portable=False,
        )
        neared = fuzzy_dedup_keep_one(
            deduped, "doc_id", pairs, algorithm="auto",
            keep_by=F.length("text"),
        )
        neared.repartition(128).write.mode("overwrite").parquet(f"{work}/neardedup")
        neared = spark.read.parquet(f"{work}/neardedup")
        stage("minhash_dedup", time.time() - t0, neared.count())

        t0 = time.time()
        lm = lm_train(
            neared.filter(F.col("doc_id") % 10 == 0), vocab_size=20_000
        )
        # lm_quantile_filter materializes (doc_id, avg_logprob) before
        # the quantile — the TUNING.md barrier rule (round 10): the
        # naive two-action pattern re-runs the scoring scan per action
        kept = lm_quantile_filter(
            neared, lm, keep_frac=0.8, broadcast_model=True
        ).select("doc_id", "text")
        kept.write.mode("overwrite").parquet(f"{work}/lm")
        kept = spark.read.parquet(f"{work}/lm")
        stage("lm_filter", time.time() - t0, kept.count())

        t0 = time.time()
        tagged = kept.withColumn(
            "source",
            F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"),
        )
        mixed = epoch_mix(
            tagged, "doc_id", "source", {"even": 2.0, "odd": 1.0}
        )
        packed = pack_sequences(
            mixed, "doc_id", text_col="text", budget=512, num_shards=64
        )
        packed.write.mode("overwrite").parquet(f"{work}/packed")
        packed = spark.read.parquet(f"{work}/packed")
        stage("mix+pack", time.time() - t0, packed.count())

        total = round(sum(s["wall"] for s in stages), 1)
        out({"probe": "warc_full_funnel_1m", "pages": N_PAGES,
             "stages": stages, "total_wall": total,
             "pages_per_s": round(N_PAGES / total)})
    finally:
        shutil.rmtree(work, ignore_errors=True)


PROBES = {
    "warc_funnel_1m": probe_warc_funnel_1m,
    "pagerank_1m": probe_pagerank_1m,
    "warc_full_funnel_1m": probe_warc_full_funnel_1m,
}


def main() -> int:
    names = sys.argv[1:] or ["warc_funnel_1m"]
    spark = get_spark()
    try:
        for name in names:
            PROBES[name](spark)
    finally:
        if os.environ.get("KEEP_CORPUS") != "1":
            shutil.rmtree(CORPUS_DIR, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

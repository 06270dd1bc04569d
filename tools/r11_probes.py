"""Round-11 scale probes (VERDICT r10 items 4-8 + new-feature scale
evidence).

* ``bench_ab``        — same-session interleaved A/B for the three
  bench rows that moved >=1.5x in r10 on untouched code
  (dedup_exact_docs 4.2x, simhash_near_dups 1.6x, minhash_fast_hash
  1.6x): 6 reps each, cycling the three queries so neighbor drift
  cancels (VERDICT item 4 — rules regression in or out).
* ``graph_decomp``    — decompose the composed graph+rank stage
  (110.6 s in-funnel vs 42.7 s standalone r9, VERDICT item 5):
  interleave {from WARC shards (r9 standalone shape)} vs {from the
  keep_body parquet (funnel shape)} vs {from a slim html-only parquet}
  in ONE session.
* ``stream_minhash_1m`` — the last streaming surface without a 1M-page
  number (VERDICT item 6): drop-zone WET corpus with planted near-dups
  through ``stream_minhash_dedup``; pages/s, signature-store growth,
  recall vs the batch operator on the same corpus.
* ``repetition_batch`` — the repetition stage's variance source
  (VERDICT item 7): interleave Arrow batch sizes for the Counter
  kernel (maxRecordsPerBatch 10000 default vs 2000) at 5M docs.
* ``script_aware_1m`` — round-11 script-aware gates at 1M docs:
  (a) Latin-path overhead of script_aware=True (must be ~free),
  (b) mixed Latin+Han+Kana+Thai corpus keep rates with and without
  the switch (the round-10 'CJK gated to near-zero' trap, quantified).
* ``lm_by_lang_1m``   — round-11 per-language LM at 1M docs, 4
  languages: per-lang quantile filter wall + keep rates vs the
  single-model filter interleaved.
* ``funnel_datasheet`` — the full 1M-page raw-WARC funnel regenerated
  with ``cli datasheet`` as the LAST stage (VERDICT item 8), folding
  in whatever graph_decomp recommends.

Usage: python tools/r11_probes.py [probe ...]   (default: bench_ab)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def out(obj) -> None:
    print(json.dumps(obj), flush=True)


def get_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r11-probes")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def zipf_corpus(spark, n, seed=23):
    from pyspark.sql import functions as F

    from hermes_spark.synth import zipf_documents

    work = f"/tmp/diag_minhash_{n}"
    if not os.path.exists(f"{work}/raw/_SUCCESS"):
        zipf_documents(
            spark, n, vocab_size=30_000, doc_len=80, seed=seed,
            near_dup_every=50, partitions=128,
        ).select(
            "doc_id", F.concat(F.col("text"), F.lit(".")).alias("text")
        ).write.mode("overwrite").parquet(f"{work}/raw")
    return spark.read.parquet(f"{work}/raw")


# ------------------------------------------------------------ bench_ab

def probe_bench_ab(spark) -> None:
    """Interleaved re-measurement of the three r10 bench movers at
    sf0.1 — same noop-sink materialization bench.py uses."""
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def _mat(df):
        df.write.mode("overwrite").format("noop").save()

    # minhash_fast_hash mirrors bench.py's _minhash_fast lambda
    import bench as _bench

    queries = {
        "dedup_exact_docs": lambda: _mat(entry.q_dedup_exact_docs(spark, sf_dir)),
        "minhash_fast_hash": lambda: _mat(_bench._minhash_fast(spark, sf_dir)),
        "simhash_near_dups": lambda: _mat(entry.q_simhash_near_dups(spark, sf_dir)),
    }
    walls = {k: [] for k in queries}
    for k in queries:  # one untimed warm-up pass each (JIT, file cache)
        queries[k]()
    reps = int(os.environ.get("BENCH_AB_REPS", "6"))
    for i in range(reps):
        for k, fn in queries.items():
            t0 = time.time()
            fn()
            walls[k].append(round(time.time() - t0, 2))
            out({"probe": "bench_ab", "rep": i, "query": k,
                 "wall": walls[k][-1]})
    r9 = {"dedup_exact_docs": 0.37, "minhash_fast_hash": 1.91,
          "simhash_near_dups": 3.61}
    r10 = {"dedup_exact_docs": 1.54, "minhash_fast_hash": 3.06,
           "simhash_near_dups": 5.71}
    for k, ws in walls.items():
        s = sorted(ws)
        med = s[len(s) // 2]
        out({"probe": "bench_ab_summary", "query": k, "walls": s,
             "median": med, "spread": round(s[-1] / max(s[0], 1e-9), 2),
             "r9_wall": r9[k], "r10_wall": r10[k],
             "verdict": "regression" if med > 1.5 * r9[k] else "box-noise"})


# --------------------------------------------------------- graph_decomp

def probe_graph_decomp(spark) -> None:
    """Interleaved decomposition of the graph+rank stage at 1M pages.

    Variants (2 passes each, A/B/C interleaved):
    * ``shards``     — r9 standalone shape: WARC parse + link extract
      from the gz shards, edges written, then PageRank(10).
    * ``keep_body``  — funnel shape: read the parsed parquet carrying
      (doc_id, url, html, text), build the graph from the html column.
    * ``slim_html``  — same parquet MINUS the text column (isolates
      whether column pruning already makes keep_body free, or the wide
      file itself costs).
    """
    from pyspark.sql import functions as F

    import tools.r9_probes as r9

    from hermes_spark.operators.graph import pagerank
    from hermes_spark.operators.weblinks import host_link_graph
    from hermes_spark.sources.warc import http_response_text, read_warc

    shards = r9.ensure_corpus(spark)
    work = "/tmp/r11_graphdecomp"
    os.makedirs(work, exist_ok=True)

    # one-time parsed parquets (not timed — the funnel pays this in its
    # own parse stage)
    if not os.path.exists(f"{work}/parsed/_SUCCESS"):
        recs = read_warc(spark, shards, types=("response",))
        docs = http_response_text(recs, extractor="main", keep_body=True).select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("target_uri").alias("url"),
            "html",
            "text",
        )
        docs.write.mode("overwrite").parquet(f"{work}/parsed")
    if not os.path.exists(f"{work}/slim/_SUCCESS"):
        spark.read.parquet(f"{work}/parsed").select("url", "html").write.mode(
            "overwrite"
        ).parquet(f"{work}/slim")

    def graph_rank(pages):
        edges = host_link_graph(pages, "src_host", "html", page_url_col="url")
        ranks = pagerank(
            edges.select(F.col("src_host").alias("src"),
                         F.col("dst_host").alias("dst")),
            iterations=10,
        )
        ranks.write.mode("overwrite").parquet(f"{work}/ranks")
        return spark.read.parquet(f"{work}/ranks").count()

    def v_shards():
        recs = read_warc(spark, shards, types=("response",))
        s = F.expr("make_valid_utf8(CAST(payload AS STRING))")
        sep = F.instr(s, "\r\n\r\n")
        body = F.when(
            sep > 0, F.substring(s, (sep + 4).cast("int"), F.length(s))
        ).otherwise(s)
        pages = recs.select(
            F.regexp_extract("target_uri", r"^https?://([^/]+)", 1).alias("src_host"),
            F.col("target_uri").alias("url"),
            body.alias("html"),
        )
        return graph_rank(pages)

    def v_parquet(path):
        pages = spark.read.parquet(path).select(
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("src_host"),
            "url", "html",
        )
        return graph_rank(pages)

    variants = {
        "shards": v_shards,
        "keep_body": lambda: v_parquet(f"{work}/parsed"),
        "slim_html": lambda: v_parquet(f"{work}/slim"),
    }
    try:
        walls = {k: [] for k in variants}
        for i in range(2):
            for k, fn in variants.items():
                t0 = time.time()
                nodes = fn()
                walls[k].append(round(time.time() - t0, 1))
                out({"probe": "graph_decomp", "rep": i, "variant": k,
                     "nodes": nodes, "wall": walls[k][-1]})
        out({"probe": "graph_decomp_summary",
             **{k: sorted(v) for k, v in walls.items()}})
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ----------------------------------------------------- stream_minhash_1m

def probe_stream_minhash_1m(spark) -> None:
    """Streaming NEAR-dup dedup at 1M pages: WET drop-zone where every
    23rd page is a near-duplicate of its predecessor (one token per
    paragraph changed, Jaccard ~0.95 on 3-shingles), consumed by
    ``stream_minhash_dedup`` in 50-shard micro-batches.  Records
    per-batch walls, signature-store growth, sustained pages/s, and
    recall vs the BATCH operator (same hash pipeline, portable=True)
    on the identical corpus."""
    import glob as _glob
    import gzip
    import random

    from pyspark.sql import functions as F

    from hermes_spark.sources.warc import read_warc, wet_text
    from hermes_spark.streaming.dedup import stream_minhash_dedup
    from hermes_spark.streaming.ingest import stream_warc

    n_pages = int(os.environ.get("WET_PAGES", "1000000"))
    per_shard = 1000
    work = "/tmp/r11_stream_minhash"
    shards_dir = f"{work}/dropzone"
    marker = f"{work}/.complete-{n_pages}"

    def _vocab():
        rng = random.Random(99)
        words = ["the", "of", "and", "to", "in", "is", "that", "for",
                 "with", "was"]
        letters = "abcdefghijklmnopqrstuvwxyz"
        while len(words) < 5000:
            k = rng.randint(2, 11)
            words.append("".join(rng.choice(letters) for _ in range(k)))
        cum, total = [], 0.0
        for r in range(1, len(words) + 1):
            total += 1.0 / r
            cum.append(total)
        return words, cum

    def page_text(page_id: int, words, cum) -> str:
        # every 23rd page: near-dup of the predecessor (last token of
        # each paragraph swapped for a marker token)
        base_id = page_id - 1 if (page_id % 23 == 22 and page_id > 0) else page_id
        rng = random.Random(base_id * 2 + 1)
        paras = []
        for _ in range(rng.randint(3, 7)):
            k = rng.randint(25, 70)
            toks = rng.choices(words, cum_weights=cum, k=k)
            toks[0] = toks[0].capitalize()
            paras.append(" ".join(toks))
        if base_id != page_id:
            paras = [p.rsplit(" ", 1)[0] + " zzedit" for p in paras]
        return ".\n".join(paras) + "."

    def shard_bytes(shard_id: int, words, cum) -> bytes:
        recs = []
        for j in range(per_shard):
            page_id = shard_id * per_shard + j
            text = page_text(page_id, words, cum)
            payload = text.encode()
            head = (
                f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                f"WARC-Record-ID: <urn:uuid:wet-{page_id}>\r\n"
                f"WARC-Target-URI: https://site{page_id % 9999:05d}.example/p/{page_id}\r\n"
                f"WARC-Date: 2026-08-16T00:00:00Z\r\n"
                f"Content-Type: text/plain\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            recs.append(gzip.compress(head + payload + b"\r\n\r\n"))
        return b"".join(recs)

    if not os.path.exists(marker):
        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(shards_dir, exist_ok=True)
        n_shards = (n_pages + per_shard - 1) // per_shard

        def write_shards(it):
            words, cum = _vocab()
            for row in it:
                with open(
                    f"{shards_dir}/shard-{row.id:05d}.warc.gz", "wb"
                ) as f:
                    f.write(shard_bytes(row.id, words, cum))

        t0 = time.time()
        spark.range(0, n_shards, 1, n_shards).foreachPartition(write_shards)
        out({"probe": "stream_minhash_corpus", "pages": n_pages,
             "shards": n_shards, "wall": round(time.time() - t0, 1)})
        open(marker, "w").close()

    state = f"{work}/sigstore"
    sink = f"{work}/accepted"
    ckpt = f"{work}/ckpt"
    for p in (state, sink, ckpt):
        shutil.rmtree(p, ignore_errors=True)

    recs = stream_warc(
        spark, shards_dir, types=("conversion",), max_files_per_trigger=50
    )
    docs = wet_text(recs).select(
        F.regexp_extract("record_id", r"wet-(\d+)", 1).cast("long").alias("doc_id"),
        "text",
    )
    store_sizes = []

    def on_batch(survivors, batch_id):
        try:
            rows = spark.read.parquet(state).count()
        except Exception:
            rows = 0
        store_sizes.append({"batch": int(batch_id), "store_rows": rows})

    t0 = time.time()
    q = stream_minhash_dedup(
        docs, state_path=state, output_path=sink,
        shingle_n=3, num_hashes=16, num_bands=4, min_jaccard=0.7,
        on_batch=on_batch,
        checkpointLocation=ckpt, trigger={"availableNow": True},
    )
    q.awaitTermination()
    wall = time.time() - t0
    for p in (q.recentProgress or []):
        if p.get("numInputRows"):
            out({"probe": "stream_minhash_1m_batch", "batch": p["batchId"],
                 "shards_in": p["numInputRows"], "ms": p["batchDuration"]})
    for s in store_sizes:
        out({"probe": "stream_minhash_1m_store", **s})
    kept = spark.read.parquet(sink).count()
    store_rows = spark.read.parquet(state).count()
    store_bytes = sum(
        os.path.getsize(f) for f in _glob.glob(f"{state}/*.parquet")
    )
    out({"probe": "stream_minhash_1m", "pages": n_pages, "kept": kept,
         "dropped": n_pages - kept, "total_wall": round(wall, 1),
         "pages_per_s": round(n_pages / wall),
         "store_rows": store_rows, "store_bytes": store_bytes})

    # batch-operator recall reference on the SAME corpus (identical
    # portable hash pipeline)
    from hermes_spark.operators import fuzzy_dedup_keep_one, minhash_lsh_pairs

    allr = wet_text(read_warc(spark, shards_dir, types=("conversion",))).select(
        F.regexp_extract("record_id", r"wet-(\d+)", 1).cast("long").alias("doc_id"),
        "text",
    )
    allr.persist()
    t0 = time.time()
    pairs = minhash_lsh_pairs(
        allr, "doc_id", "text", shingle_n=3, num_hashes=16, num_bands=4,
        min_jaccard=0.7, portable=True,
    )
    batch_kept = fuzzy_dedup_keep_one(
        allr, "doc_id", pairs, algorithm="auto", keep_by=F.col("doc_id") * -1
    ).count()
    batch_wall = round(time.time() - t0, 1)
    planted = sum(1 for i in range(n_pages) if i % 23 == 22 and i > 0)
    # recall on the planted set: a planted page i is caught if it is
    # NOT in the accepted sink
    accepted_planted = (
        spark.read.parquet(sink)
        .filter((F.col("doc_id") % 23 == 22) & (F.col("doc_id") > 0))
        .count()
    )
    allr.unpersist()
    out({"probe": "stream_minhash_1m_recall", "planted": planted,
         "stream_caught": planted - accepted_planted,
         "stream_recall": round((planted - accepted_planted) / planted, 4),
         "batch_kept": batch_kept, "batch_dropped": n_pages - batch_kept,
         "batch_wall": batch_wall})


# ---------------------------------------------------- repetition_batch

def probe_repetition_batch(spark) -> None:
    """Arrow batch-size A/B for the repetition Counter kernel at 5M
    docs (VERDICT item 7): interleave maxRecordsPerBatch 10000
    (default) vs 2000 vs 500, 3 reps each — if smaller batches cut the
    wall or the variance, the kernel is memory-bandwidth-bound on
    batch-sized state and the TUNING rule changes; if not, the r10
    variance stays attributed to host contention."""
    from hermes_spark.operators import gopher_repetition_filter

    n = int(os.environ.get("STAGE_DOCS", "5000000"))
    docs = zipf_corpus(spark, n)
    work = f"/tmp/r11_repbatch_{n}"
    if not os.path.exists(f"{work}/wide128/_SUCCESS"):
        docs.repartition(128).write.mode("overwrite").parquet(f"{work}/wide128")
    d = spark.read.parquet(f"{work}/wide128")
    d.count()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key)
    sizes = [int(x) for x in os.environ.get(
        "REP_BATCH_SIZES", "10000,2000,500").split(",")]
    try:
        walls = {s: [] for s in sizes}
        for i in range(3):
            for s in sizes:
                spark.conf.set(key, str(s))
                t0 = time.time()
                rows = gopher_repetition_filter(d, "doc_id", "text").count()
                walls[s].append(round(time.time() - t0, 1))
                out({"probe": "repetition_batch", "rep": i, "batch_size": s,
                     "rows": rows, "wall": walls[s][-1]})
        out({"probe": "repetition_batch_summary",
             **{str(s): sorted(v) for s, v in walls.items()}})
    finally:
        spark.conf.set(key, default)
        shutil.rmtree(work, ignore_errors=True)


# ----------------------------------------------------- script_aware_1m

# 36-char alphabets (a-z + 0-9): the zipf corpus tokens are letter+digit
# strings ("w0000620"), so digits must transliterate too or the letter-
# ratio gates see digit soup.  The trailing space in _LATIN37 is DELETED
# by translate() (genuinely unsegmented text); the LM probe keeps spaces
# by using _LATIN36.
_HAN36 = "的一是了在和不人有上中大来国个到说们为子与就那要下出山水火木金土田口日月"
_KANA36 = "のはをにがたなかでしてもこれそあうえきくけさすせつとぬねひふへほまみむも"
_THAI36 = "กขคงจชซดตทนบปผพฟมยรลวสหอะเฉญฎฐณธภฤศฮ"
_CYR36 = "абвгдежзиклмнопрстуфхцчшщэюяёйъыьѐѝў"
_LATIN36 = "abcdefghijklmnopqrstuvwxyz0123456789"
_LATIN37 = _LATIN36 + " "


def probe_script_aware_1m(spark) -> None:
    """Script-aware gate scale probe at 1M docs.

    (a) Latin overhead: plain vs script_aware gopher_filter on the SAME
    all-Latin corpus, interleaved 2x — the extra per-doc regex counts
    must not tax the 100 TB Latin hot path.
    (b) Mixed corpus (70% Latin, 10% each Han/Kana/Thai via
    translate()): keep rates per script with script_aware on/off — the
    round-10 'CJK gated to near-zero' trap, quantified at scale — plus
    the c4_clean(script_aware) wall."""
    from pyspark.sql import functions as F

    from hermes_spark.operators import c4_clean, gopher_filter

    n = int(os.environ.get("STAGE_DOCS", "1000000"))
    docs = zipf_corpus(spark, n)
    work = f"/tmp/r11_script_{n}"

    if not os.path.exists(f"{work}/mixed/_SUCCESS"):
        low = F.lower(F.col("text"))
        script = (
            F.when(F.col("doc_id") % 10 == 7, F.lit("han"))
            .when(F.col("doc_id") % 10 == 8, F.lit("kana"))
            .when(F.col("doc_id") % 10 == 9, F.lit("thai"))
            .otherwise(F.lit("latin"))
        )
        body = (
            F.when(script == "han", F.translate(low, _LATIN37, _HAN36))
            .when(script == "kana", F.translate(low, _LATIN37, _KANA36))
            .when(
                script == "thai",
                F.concat(F.translate(low, _LATIN37, _THAI36), F.lit("ที่ของ")),
            )
            .otherwise(F.col("text"))
        )
        docs.select(
            "doc_id", script.alias("script"), body.alias("text")
        ).repartition(128).write.mode("overwrite").parquet(f"{work}/mixed")
    mixed = spark.read.parquet(f"{work}/mixed")
    docs.count()
    mixed.count()

    try:
        # (a) Latin-path overhead, interleaved
        for i in range(2):
            for variant, aware in (("plain", False), ("script_aware", True)):
                t0 = time.time()
                rows = gopher_filter(
                    docs, "doc_id", "text", min_words=20, min_stopwords=0,
                    script_aware=aware,
                ).count()
                out({"probe": "script_aware_latin_overhead", "rep": i,
                     "variant": variant, "rows": rows,
                     "wall": round(time.time() - t0, 1)})

        # (b) mixed-corpus keep rates, both modes
        for variant, aware in (("plain", False), ("script_aware", True)):
            t0 = time.time()
            kept = gopher_filter(
                mixed, "doc_id", "text", min_words=20, min_stopwords=0,
                script_aware=aware,
            )
            rates = {
                r["script"]: int(r["n"])
                for r in kept.groupBy("script").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            totals = {
                r["script"]: int(r["n"])
                for r in mixed.groupBy("script").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            out({"probe": "script_aware_mixed", "variant": variant,
                 "wall": round(time.time() - t0, 1),
                 "kept": rates,
                 "keep_rate": {
                     k: round(rates.get(k, 0) / totals[k], 4) for k in totals
                 }})

        # c4_clean script-aware wall on the mixed corpus
        t0 = time.time()
        rows = c4_clean(
            mixed, "doc_id", "text", min_line_words=3, script_aware=True
        ).count()
        out({"probe": "script_aware_c4", "rows": rows,
             "wall": round(time.time() - t0, 1)})
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ------------------------------------------------------- lm_by_lang_1m



def probe_lm_by_lang_1m(spark) -> None:
    """Per-language LM filter at 1M docs across 4 languages (Latin,
    Cyrillic, Han, Thai token alphabets — spaces KEPT so the bigram
    tokenizer sees words): lm_quantile_filter_by_lang (train + score +
    per-lang cutoffs) wall and per-language keep rates, interleaved
    with the single-model lm_quantile_filter on the same corpus (the
    conflation baseline)."""
    from pyspark.sql import functions as F

    from hermes_spark.operators import (
        lm_quantile_filter,
        lm_quantile_filter_by_lang,
        lm_train,
        lm_train_by_lang,
    )

    n = int(os.environ.get("STAGE_DOCS", "1000000"))
    docs = zipf_corpus(spark, n)
    work = f"/tmp/r11_lmlang_{n}"

    if not os.path.exists(f"{work}/mixed/_SUCCESS"):
        low = F.lower(F.col("text"))
        lang = (
            F.when(F.col("doc_id") % 4 == 1, F.lit("ru"))
            .when(F.col("doc_id") % 4 == 2, F.lit("zh"))
            .when(F.col("doc_id") % 4 == 3, F.lit("th"))
            .otherwise(F.lit("en"))
        )
        body = (
            F.when(lang == "ru", F.translate(low, _LATIN36, _CYR36))
            .when(lang == "zh", F.translate(low, _LATIN36, _HAN36))
            .when(lang == "th", F.translate(low, _LATIN36, _THAI36))
            .otherwise(F.col("text"))
        )
        docs.select(
            "doc_id", lang.alias("lang"), body.alias("text")
        ).repartition(128).write.mode("overwrite").parquet(f"{work}/mixed")
    mixed = spark.read.parquet(f"{work}/mixed")
    mixed.count()

    try:
        for variant in ("by_lang", "single_model"):
            t0 = time.time()
            if variant == "by_lang":
                lm = lm_train_by_lang(
                    mixed.filter(F.col("doc_id") % 7 == 0),  # 7 coprime 4:
                    # every lang residue lands in the train slice
                    vocab_size=20_000,
                )
                kept = lm_quantile_filter_by_lang(
                    mixed, lm, keep_frac=0.8, broadcast_model=True,
                    score_engine="arrow",
                )
            else:
                lm = lm_train(
                    mixed.filter(F.col("doc_id") % 7 == 0),
                    vocab_size=20_000,
                )
                kept = lm_quantile_filter(
                    mixed, lm, keep_frac=0.8, broadcast_model=True,
                    score_engine="arrow",
                )
            rates = {
                r["lang"]: int(r["n"])
                for r in kept.groupBy("lang").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            wall = round(time.time() - t0, 1)
            totals = {
                r["lang"]: int(r["n"])
                for r in mixed.groupBy("lang").agg(
                    F.count(F.lit(1)).alias("n")
                ).collect()
            }
            out({"probe": "lm_by_lang_1m", "variant": variant,
                 "docs": n, "wall": wall, "kept": rates,
                 "keep_rate": {
                     k: round(rates.get(k, 0) / totals[k], 4)
                     for k in sorted(totals)
                 }})
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------- funnel_datasheet

def probe_funnel_datasheet(spark) -> None:
    """The full 1M-page raw-WARC funnel (r9 probe shape + round-10
    authority prior) with ``cli datasheet`` appended as the LAST stage
    (VERDICT item 8): the one-command dataset card costed at scale,
    its JSON sections recorded as funnel output artifacts."""
    from pyspark.sql import functions as F

    import tools.r9_probes as r9
    from hermes_spark.cli.datasheet_job import run as datasheet_run
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

    shards = r9.ensure_corpus(spark)
    work = f"{r9.CORPUS_DIR}/full11"
    stages = []

    def stage(name, wall, rows):
        stages.append({"stage": name, "wall": round(wall, 1), "rows": rows})
        out({"probe": "funnel_datasheet_stage", "stage": name,
             "wall": round(wall, 1), "rows": rows})

    try:
        t0 = time.time()
        recs = read_warc(spark, shards, types=("response",))
        docs = http_response_text(recs, extractor="main", keep_body=True).select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("target_uri").alias("url"),
            "html",
            "text",
        )
        docs.write.mode("overwrite").parquet(f"{work}/parsed")
        docs = spark.read.parquet(f"{work}/parsed")
        stage("warc_parse+extract_main", time.time() - t0, docs.count())

        t0 = time.time()
        pages = docs.select(
            "doc_id", "url", "html",
            F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("src_host"),
        )
        edges = host_link_graph(pages, "src_host", "html", page_url_col="url")
        ranks = pagerank(
            edges.select(F.col("src_host").alias("src"),
                         F.col("dst_host").alias("dst")),
            iterations=10,
        ).select(F.col("node").alias("src_host"),
                 F.col("rank").alias("host_rank"))
        ranks.write.mode("overwrite").parquet(f"{work}/ranks")
        ranks = spark.read.parquet(f"{work}/ranks")
        stage("host_graph+pagerank", time.time() - t0, ranks.count())
        docs = docs.select("doc_id", "url", "text")

        t0 = time.time()
        c4d = c4_clean(
            docs.select("doc_id", "url", clean_text(F.col("text")).alias("text")),
            "doc_id", "text", keep_cols=("url",),
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

        t0 = time.time()
        with_rank = gated.withColumn(
            "src_host", F.regexp_extract("url", r"^https?://([^/]+)", 1)
        ).join(F.broadcast(ranks), "src_host", "left")
        deduped = exact_dedup(
            with_rank, "doc_id", "text", keep_by=F.col("host_rank")
        ).select("doc_id", "text")
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
        mixed = epoch_mix(tagged, "doc_id", "source", {"even": 2.0, "odd": 1.0})
        packed = pack_sequences(
            mixed, "doc_id", text_col="text", budget=512, num_shards=64
        )
        packed.write.mode("overwrite").parquet(f"{work}/packed")
        packed = spark.read.parquet(f"{work}/packed")
        stage("mix+pack", time.time() - t0, packed.count())

        # NEW (round 11): the dataset card as the funnel's final stage —
        # over the LM-filtered corpus (the frame a user would ship)
        t0 = time.time()
        tagged.write.mode("overwrite").parquet(f"{work}/final")
        sections = datasheet_run(spark, [
            "--format", "parquet", "--path", f"{work}/final",
            "--id-col", "doc_id", "--text-col", "text",
            "--source-col", "source",
        ])
        stage("datasheet", time.time() - t0, len(sections))
        for sec in sections:
            out({"probe": "funnel_datasheet_card", **sec})

        total = round(sum(s["wall"] for s in stages), 1)
        out({"probe": "funnel_datasheet", "pages": r9.N_PAGES,
             "stages": stages, "total_wall": total,
             "pages_per_s": round(r9.N_PAGES / total)})
    finally:
        shutil.rmtree(work, ignore_errors=True)


# -------------------------------------------------- multilingual_funnel

def probe_multilingual_funnel(spark) -> None:
    """The round-11 multilingual story composed END-TO-END at 1M docs:
    a 70% Latin / 10% each Han/Kana/Thai corpus through the full
    curation chain with every script-aware switch ON —
    c4_clean(script_aware) -> gopher_filter(script_aware) -> MinHash
    near-dup dedup (codepoint kernel lane) -> per-language LM quantile
    filter -> pack_sequences(script_aware).  Records per-script
    survival at each stage (the plain pipeline loses the entire CJK
    share at the first gate) plus stage walls."""
    from pyspark.sql import functions as F

    from hermes_spark.functions.text import add_lang_id
    from hermes_spark.operators import (
        c4_clean,
        fuzzy_dedup_keep_one,
        gopher_filter,
        lm_quantile_filter_by_lang,
        lm_train_by_lang,
        minhash_lsh_pairs,
        pack_sequences,
    )

    n = int(os.environ.get("STAGE_DOCS", "1000000"))
    docs = zipf_corpus(spark, n)
    work = f"/tmp/r11_mlfunnel_{n}"

    if not os.path.exists(f"{work}/mixed/_SUCCESS"):
        low = F.lower(F.col("text"))
        script = (
            F.when(F.col("doc_id") % 10 == 7, F.lit("han"))
            .when(F.col("doc_id") % 10 == 8, F.lit("kana"))
            .when(F.col("doc_id") % 10 == 9, F.lit("thai"))
            .otherwise(F.lit("latin"))
        )
        # sentence terminators so the C4 line rule sees prose; spaces
        # deleted for the unsegmented scripts (genuine CJK shape)
        body = (
            F.when(script == "han",
                   F.concat(F.translate(low, _LATIN37, _HAN36), F.lit("。")))
            .when(script == "kana",
                  F.concat(F.translate(low, _LATIN37, _KANA36), F.lit("。")))
            .when(script == "thai",
                  F.concat(F.translate(low, _LATIN37, _THAI36),
                           F.lit("ที่ของ")))
            .otherwise(F.concat(F.col("text"), F.lit(".")))
        )
        docs.select(
            "doc_id", script.alias("script"), body.alias("text")
        ).repartition(128).write.mode("overwrite").parquet(f"{work}/mixed")
    mixed = spark.read.parquet(f"{work}/mixed")
    totals = {r["script"]: r["n"] for r in mixed.groupBy("script").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    stages = []

    def stage(name, wall, df):
        counts = {r["script"]: r["n"] for r in df.groupBy("script").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        stages.append({"stage": name, "wall": round(wall, 1),
                       "by_script": counts})
        out({"probe": "multilingual_funnel_stage", "stage": name,
             "wall": round(wall, 1), "by_script": counts,
             "survival": {k: round(counts.get(k, 0) / totals[k], 4)
                          for k in sorted(totals)}})

    try:
        t0 = time.time()
        cleaned = c4_clean(
            mixed, "doc_id", "text", min_line_words=3,
            keep_cols=("script",), script_aware=True,
        )
        gated = gopher_filter(
            cleaned, "doc_id", "text", min_words=20, min_stopwords=0,
            script_aware=True,
        )
        gated.repartition(128).write.mode("overwrite").parquet(f"{work}/gated")
        gated = spark.read.parquet(f"{work}/gated")
        stage("c4+gopher(script_aware)", time.time() - t0, gated)

        t0 = time.time()
        pairs = minhash_lsh_pairs(
            gated, "doc_id", "text", shingle_n=3, num_hashes=16,
            num_bands=4, min_jaccard=0.7, portable=False,
        )
        deduped = fuzzy_dedup_keep_one(
            gated, "doc_id", pairs, algorithm="auto",
            keep_by=F.length("text"),
        )
        deduped.repartition(128).write.mode("overwrite").parquet(f"{work}/dedup")
        deduped = spark.read.parquet(f"{work}/dedup")
        stage("minhash_dedup(codepoint lane)", time.time() - t0, deduped)

        t0 = time.time()
        tagged = add_lang_id(deduped, "text", "lang")
        lm = lm_train_by_lang(
            tagged.filter(F.col("doc_id") % 7 == 0), vocab_size=20_000,
            script_aware=True,  # char-level modeling for Han/Kana/Thai
        )
        kept = lm_quantile_filter_by_lang(
            tagged, lm, keep_frac=0.8, broadcast_model=True,
            score_engine="arrow", script_aware=True,
        )
        kept.repartition(128).write.mode("overwrite").parquet(f"{work}/lm")
        kept = spark.read.parquet(f"{work}/lm")
        stage("add_lang_id+lm_by_lang", time.time() - t0, kept)

        t0 = time.time()
        packed = pack_sequences(
            kept, "doc_id", text_col="text", budget=512, num_shards=64,
            script_aware=True,
        )
        packed.write.mode("overwrite").parquet(f"{work}/packed")
        n_seqs = (
            spark.read.parquet(f"{work}/packed")
            .select("shard", "seq_in_shard").distinct().count()
        )
        stages.append({"stage": "pack(script_aware)",
                       "wall": round(time.time() - t0, 1),
                       "sequences": n_seqs})
        out({"probe": "multilingual_funnel_stage",
             "stage": "pack(script_aware)",
             "wall": stages[-1]["wall"], "sequences": n_seqs})

        # the counterfactual: the SAME corpus through the plain gates
        t0 = time.time()
        plain = gopher_filter(
            c4_clean(mixed, "doc_id", "text", min_line_words=3,
                     keep_cols=("script",)),
            "doc_id", "text", min_words=20, min_stopwords=0,
        )
        counts = {r["script"]: r["n"] for r in plain.groupBy("script").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        out({"probe": "multilingual_funnel_plain_gates",
             "wall": round(time.time() - t0, 1),
             "survival": {k: round(counts.get(k, 0) / totals[k], 4)
                          for k in sorted(totals)}})

        total = round(sum(s["wall"] for s in stages), 1)
        out({"probe": "multilingual_funnel", "docs": n, "stages": stages,
             "total_wall": total, "docs_per_s": round(n / total)})
    finally:
        shutil.rmtree(work, ignore_errors=True)


PROBES = {
    "bench_ab": probe_bench_ab,
    "multilingual_funnel": probe_multilingual_funnel,
    "graph_decomp": probe_graph_decomp,
    "stream_minhash_1m": probe_stream_minhash_1m,
    "repetition_batch": probe_repetition_batch,
    "script_aware_1m": probe_script_aware_1m,
    "lm_by_lang_1m": probe_lm_by_lang_1m,
    "funnel_datasheet": probe_funnel_datasheet,
}


def main() -> int:
    names = sys.argv[1:] or ["bench_ab"]
    spark = get_spark()
    for name in names:
        PROBES[name](spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())

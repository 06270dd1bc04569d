"""Round-6 scale probes (VERDICT r5 items 2, 5, 6, 7).

Usage: python tools/r6_probes.py [probe ...]   (default: all)

Probes — each prints one JSON line:

* ``setjoin_zipf``   — jaccard_set_join on a 200k-doc Zipfian corpus
  (20k-term vocabulary): wall time + candidate-pair count vs n^2/2,
  the evidence that prefix filtering prunes on realistic vocabularies.
* ``cc_star``        — connected_components_star on a 5M-edge chain
  graph (1000-node chains — label propagation's worst case): wall,
  ROUND COUNT (the O(log^2 n) claim), component count verified.
* ``hash_60m_disk``  — compare mode=fast vs mode=hash on a 60M-row
  lineitem table read FROM PARQUET ON DISK (not in-memory exploded):
  the 100 TB monitoring-mode evidence.
* ``ann_clustered``  — 1M-vector mixture-of-Gaussians corpus (64
  clusters): ivf_sq8_rescore recall@10 curve via pick_nprobe with a
  0.9 target — the clustered complement of the adversarial uniform
  floor in scale_smoke.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def out(obj) -> None:
    print(json.dumps(obj), flush=True)


def get_spark():
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r6-probes")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.maxResultSize", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def probe_setjoin_zipf(spark) -> None:
    from pyspark.sql import functions as F

    from hermes_spark.operators import jaccard_set_join
    from hermes_spark.synth import zipf_documents

    n = 200_000
    docs = zipf_documents(
        spark, n, vocab_size=20_000, doc_len=60, seed=6, near_dup_every=100,
        partitions=64,
    ).localCheckpoint(eager=True)
    stats: dict = {}
    t0 = time.time()
    pairs = jaccard_set_join(docs, min_jaccard=0.8, stats=stats)
    n_pairs = pairs.count()
    wall = time.time() - t0
    planted = n // 100 - 1
    found = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1) & (F.col("id_b") % 100 == 0)
    ).count()
    out({
        "probe": f"jaccard_set_join_zipf_{n}docs_20kvocab",
        "rows": n_pairs,
        "candidates": stats["candidates"],
        "all_pairs": n * (n - 1) // 2,
        "candidate_ratio": round(stats["candidates"] / (n * (n - 1) / 2), 6),
        "planted_recall": round(found / planted, 4),
        "wall": round(wall, 1),
    })


def probe_cc_star(spark) -> None:
    from pyspark.sql import functions as F

    from hermes_spark.operators import connected_components_star

    # 5M edges as 5000 chains of 1000 nodes: diameter 1000 — min-label
    # propagation would need ~O(log diameter) pointer-jump rounds on the
    # LABEL table; star rounds contract the EDGE set itself
    n_edges = 5_000_000
    chain = 1_000
    pairs = spark.range(0, n_edges + 5_000, 1, 64).filter(
        F.col("id") % chain != chain - 1  # break between chains
    ).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    ).limit(n_edges)
    stats: dict = {}
    t0 = time.time()
    comp = connected_components_star(pairs, stats=stats)
    n_components = comp.select("component").distinct().count()
    n_nodes = comp.count()
    out({
        "probe": f"cc_star_{n_edges}edges_chain{chain}",
        "rows": n_nodes,
        "components": n_components,
        "rounds": stats.get("rounds"),
        "wall": round(time.time() - t0, 1),
    })


def probe_hash_60m_disk(spark) -> None:
    from pyspark.sql import functions as F

    from hermes_spark import ComparisonConfig, compare

    work = "/tmp/r6_hash60m"
    factor = 100
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    big = li.select("*", copies).withColumn(
        "l_orderkey", F.col("l_orderkey") * factor + F.col("__copy")
    ).drop("__copy")
    t0 = time.time()
    big.repartition(64).write.mode("overwrite").parquet(f"{work}/ref")
    ref = spark.read.parquet(f"{work}/ref")
    mutated = ref.withColumn(
        "l_quantity",
        F.when(
            F.xxhash64("l_orderkey", "l_linenumber") % 1000 == 0,
            F.col("l_quantity") + 1,
        ).otherwise(F.col("l_quantity")),
    )
    mutated.repartition(64).write.mode("overwrite").parquet(f"{work}/act")
    act = spark.read.parquet(f"{work}/act")
    n = ref.count()
    out({"probe": "hash60m_write", "rows": n, "wall": round(time.time() - t0, 1)})

    keys = ["l_orderkey", "l_linenumber"]
    try:
        for mode in ("fast", "hash"):
            t0 = time.time()
            res = compare(
                ref, act, keys=keys,
                config=ComparisonConfig(mode=mode, allow_duplicates=True),
            )
            diff = res.result_df.count()
            out({
                "probe": f"compare_{mode}_{n}rows_on_disk",
                "rows": diff,
                "wall": round(time.time() - t0, 1),
            })
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_hash_wide_disk(spark) -> None:
    """The other branch of mode=auto: WIDE rows (~1.5 kB of text) on
    disk, where hash mode's 16 B/row classification shuffle should beat
    fast mode's full-row shuffle even though hash scans the inputs
    twice more."""
    from pyspark.sql import functions as F

    from hermes_spark import ComparisonConfig, compare

    work = "/tmp/r6_hashwide"
    factor = 2_000  # sf0.1 documents ~5k rows -> ~10M wide rows
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    big = docs.select("doc_id", "text", copies).withColumn(
        "doc_id", F.col("doc_id") * factor + F.col("__copy")
    ).withColumn(
        # make every row's payload unique so parquet can't dictionary-
        # collapse the copies to nothing
        "text", F.concat(F.col("text"), F.lit(" copy"), F.col("__copy"))
    ).drop("__copy")
    t0 = time.time()
    big.repartition(64).write.mode("overwrite").parquet(f"{work}/ref")
    ref = spark.read.parquet(f"{work}/ref")
    mutated = ref.withColumn(
        "text",
        F.when(
            F.xxhash64("doc_id") % 1000 == 0, F.concat(F.col("text"), F.lit(" MUT"))
        ).otherwise(F.col("text")),
    )
    mutated.repartition(64).write.mode("overwrite").parquet(f"{work}/act")
    act = spark.read.parquet(f"{work}/act")
    n = ref.count()
    out({"probe": "hashwide_write", "rows": n, "wall": round(time.time() - t0, 1)})
    try:
        for mode in ("fast", "hash"):
            t0 = time.time()
            res = compare(
                ref, act, keys=["doc_id"],
                config=ComparisonConfig(mode=mode, allow_duplicates=True),
            )
            diff = res.result_df.count()
            out({
                "probe": f"compare_{mode}_{n}widerows_on_disk",
                "rows": diff,
                "wall": round(time.time() - t0, 1),
            })
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_ann_clustered(spark) -> None:
    from pyspark.sql import functions as F

    from hermes_spark.operators import kmeans_centroids, pick_nprobe
    from hermes_spark.operators.quantize import sq8_stats

    nvec = 1_000_000
    n_clusters = 64
    dim = 64

    # mixture of Gaussians, fully hash-derived: center[c][d] uniform in
    # [-3, 3]; point = center + N(0, 0.5) via Box-Muller from two hashes
    def unif(seed_cols, lo, hi):
        return (
            F.pmod(F.xxhash64(*seed_cols), F.lit(1_000_003)) / 1_000_003.0
        ) * (hi - lo) + lo

    def gauss(doc, d, tag):
        u1 = (
            F.pmod(F.xxhash64(doc, d, F.lit(tag)), F.lit(999_983)) + 0.5
        ) / 999_983.0
        u2 = (
            F.pmod(F.xxhash64(doc, d, F.lit(tag + 1)), F.lit(999_979)) + 0.5
        ) / 999_979.0
        return F.sqrt(-2.0 * F.log(u1)) * F.cos(
            F.lit(2.0 * 3.141592653589793) * u2
        )

    base = spark.range(0, nvec, 1, 64)
    cluster = F.pmod(F.col("id"), F.lit(n_clusters))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: unif([cluster, d, F.lit(777)], -3.0, 3.0)
        + 0.5 * gauss(F.col("id"), d, 1),
    )
    corpus = base.select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).localCheckpoint(eager=True)
    out({"probe": "ann_clustered_corpus", "rows": corpus.count(), "wall": 0.0})

    t0 = time.time()
    sample = corpus.filter(F.col("vec_id") % 20 == 0)  # 50k fit sample
    cents = kmeans_centroids(sample, k=n_clusters, dim=dim, max_iter=4) \
        .localCheckpoint(eager=True)
    stats = sq8_stats(corpus, "embedding", dim).localCheckpoint(eager=True)
    out({"probe": "ann_clustered_index_build", "rows": n_clusters,
         "wall": round(time.time() - t0, 1)})

    queries = corpus.filter(F.col("vec_id") % 100_000 == 17)  # 10 queries
    t0 = time.time()
    nprobe, curve = pick_nprobe(
        corpus, cents, queries, target_recall=0.9, k=10, shortlist=100,
        dim=dim, stats=stats,
    )
    out({
        "probe": f"ann_clustered_recall_{nvec}vecs_{n_clusters}cells",
        "rows": nvec,
        "picked_nprobe": nprobe,
        "curve": curve,
        "wall": round(time.time() - t0, 1),
    })


def probe_png_throughput(spark) -> None:
    """Throughput of the pure-Python PNG decoder through mapInPandas:
    50k generated 32x32 RGB images, end-to-end decode + feature
    extraction.  Sets the honest swap-in threshold for a Pillow-backed
    decoder (the Spark contract is identical either way)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType, LongType, StructField, StructType

    from hermes_spark.operators import extract_image_features

    n = 50_000

    def gen(batches):
        import numpy as np
        import pandas as pd

        from hermes_spark.operators.codecs import encode_png

        for pdf in batches:
            rng = np.random.default_rng(int(pdf["id"].iloc[0]))
            yield pd.DataFrame({
                "media_id": pdf["id"],
                "data": [
                    encode_png(
                        rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
                    )
                    for _ in range(len(pdf))
                ],
            })

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("data", BinaryType()),
    ])
    imgs = spark.range(0, n, 1, 32).mapInPandas(gen, schema) \
        .localCheckpoint(eager=True)
    t0 = time.time()
    decoded = extract_image_features(imgs, "media_id", "data")
    n_ok = decoded.filter(F.col("decode_error").isNull()).count()
    wall = time.time() - t0
    out({
        "probe": f"png_decode_throughput_{n}imgs_32x32",
        "rows": n_ok,
        "imgs_per_sec": round(n / wall),
        "wall": round(wall, 1),
    })


def probe_sketches_60m(spark) -> None:
    """Sketch family at 60M rows on disk: HLL distinct vs exact
    COUNT(DISTINCT), q-digest quantiles vs exact percentile, and the
    Bloom prefilter's shuffle reduction with broadcast joins DISABLED
    (the 100 TB regime where the dimension no longer broadcasts)."""
    from pyspark.sql import functions as F

    from hermes_spark.operators import (
        bloom_prefilter_join,
        hll_distinct,
        qdigest_quantiles,
        qdigest_state,
    )

    work = "/tmp/r6_sketch60m"
    factor = 100
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    big = li.select("*", copies).withColumn(
        "l_orderkey", F.col("l_orderkey") * factor + F.col("__copy")
    ).drop("__copy")
    t0 = time.time()
    big.repartition(64).write.mode("overwrite").parquet(f"{work}/li")
    ref = spark.read.parquet(f"{work}/li")
    n = ref.count()
    out({"probe": "sketch60m_write", "rows": n, "wall": round(time.time() - t0, 1)})

    try:
        # HLL (p=14, xxhash64) vs exact distinct orderkeys per flag
        t0 = time.time()
        est = {
            r["l_returnflag"]: r["distinct_est"]
            for r in hll_distinct(
                ref, ["l_returnflag"], "l_orderkey", p=14, portable=False
            ).collect()
        }
        hll_wall = time.time() - t0
        t0 = time.time()
        exact = {
            r["l_returnflag"]: r["x"]
            for r in ref.groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("x"))
            .collect()
        }
        exact_wall = time.time() - t0
        err = max(abs(est[k] - exact[k]) / exact[k] for k in exact)
        out({
            "probe": "hll60m_p14_vs_exact",
            "hll_wall": round(hll_wall, 1),
            "exact_wall": round(exact_wall, 1),
            "max_rel_err": round(err, 4),
        })

        # q-digest quantiles vs exact percentile on l_extendedprice
        t0 = time.time()
        qd = qdigest_quantiles(
            qdigest_state(ref, ["l_returnflag"], "l_extendedprice", k=64),
            ["l_returnflag"],
            [0.5, 0.95, 0.99],
        ).collect()
        qd_wall = time.time() - t0
        t0 = time.time()
        px = {
            r["l_returnflag"]: r["p"]
            for r in ref.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_extendedprice, array(0.5,0.95,0.99))").alias("p"))
            .collect()
        }
        px_wall = time.time() - t0
        qerr = max(
            abs(r["est"] - px[r["l_returnflag"]][[0.5, 0.95, 0.99].index(r["q"])])
            / px[r["l_returnflag"]][[0.5, 0.95, 0.99].index(r["q"])]
            for r in qd
        )
        out({
            "probe": "qdigest60m_vs_exact_percentile",
            "qdigest_wall": round(qd_wall, 1),
            "exact_wall": round(px_wall, 1),
            "max_rel_err": round(qerr, 4),
        })

        # Bloom prefilter with broadcast disabled: plain shuffle join of
        # 60M x 2k-part subset vs the prefiltered one
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter("p_size <= 2")
        renamed = ref.withColumnRenamed("l_partkey", "p_partkey")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t0 = time.time()
            plain = renamed.join(part, "p_partkey").count()
            plain_wall = time.time() - t0
            t0 = time.time()
            bloomed = bloom_prefilter_join(
                renamed, part, "p_partkey", m_bits=1 << 17, k=5, portable=False
            ).count()
            bloom_wall = time.time() - t0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        out({
            "probe": "bloom60m_shuffle_join",
            "plain_wall": round(plain_wall, 1),
            "bloom_wall": round(bloom_wall, 1),
            "rows": plain,
            "agree": plain == bloomed,
        })
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_text_gates_1m(spark) -> None:
    """Rule gates + epoch mix at 1M Zipf documents: one scan each, no
    shuffle — wall should track scan size, not corpus structure."""
    from pyspark.sql import functions as F

    from hermes_spark.operators import (
        c4_line_stats,
        epoch_mix,
        gopher_quality_flags,
    )
    from hermes_spark.synth import zipf_documents

    n = 1_000_000
    docs = (
        zipf_documents(spark, n, vocab_size=20_000, doc_len=60, seed=9,
                       partitions=64)
        .withColumn(
            "text",
            F.concat(F.col("text"), F.lit(".\nHome | Nav\nThe second good line is here.")),
        )
        .withColumn(
            "src",
            F.when(F.col("doc_id") % 5 == 0, "wiki").otherwise("crawl"),
        )
        .localCheckpoint(eager=True)
    )
    t0 = time.time()
    gq = gopher_quality_flags(docs, "doc_id", "text", min_words=20,
                              min_stopwords=0)
    passed = gq.filter("keep").count()
    gopher_wall = time.time() - t0
    t0 = time.time()
    c4 = c4_line_stats(docs, "doc_id", "text")
    kept_lines = c4.agg(F.sum("n_lines_kept")).collect()[0][0]
    c4_wall = time.time() - t0
    t0 = time.time()
    mixed = epoch_mix(docs.select("doc_id", "src"), "doc_id", "src",
                      {"wiki": 2.5, "crawl": 0.8})
    mixed_rows = mixed.count()
    mix_wall = time.time() - t0
    out({
        "probe": f"text_gates_{n}docs",
        "gopher_pass": passed,
        "gopher_wall": round(gopher_wall, 1),
        "c4_kept_lines": kept_lines,
        "c4_wall": round(c4_wall, 1),
        "epoch_mix_rows": mixed_rows,
        "epoch_mix_wall": round(mix_wall, 1),
    })


def probe_newops_1m(spark) -> None:
    """Round-6 late-session operators at 1M Zipf documents: cross-corpus
    LM scoring, real-BPE token accounting, edit-distance blocking,
    conversation-format audit, and the batch form of the interval join.
    Each prints wall + an output-sanity number."""
    from pyspark.sql import functions as F

    from hermes_spark.operators import (
        bpe_token_counts,
        bpe_train_merges,
        bucket_by_bounds,
        conversation_stats,
        edit_distance_pairs,
        lm_score,
        lm_train,
        turns_from_text,
    )
    from hermes_spark.streaming import interval_join_streams
    from hermes_spark.synth import zipf_documents

    n = 1_000_000
    docs = zipf_documents(
        spark, n, vocab_size=20_000, doc_len=60, seed=17,
        near_dup_every=50, partitions=64,
    ).localCheckpoint(eager=True)

    # -- cross-corpus LM: train on 20% of docs, score all 1M
    t0 = time.time()
    lm = lm_train(docs.filter(F.col("doc_id") % 5 == 0), vocab_size=10_000)
    train_wall = time.time() - t0
    t0 = time.time()
    scored = lm_score(docs, lm, broadcast_model=True)
    buckets = {
        r.ppl_bucket: r.n
        for r in bucket_by_bounds(scored, -7.0, -8.5)
        .groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()
    }
    score_wall = time.time() - t0
    out({
        "probe": f"lm_{n}docs", "n_vocab": lm.n_vocab,
        "train_wall": round(train_wall, 1),
        "score_wall": round(score_wall, 1), "buckets": buckets,
    })

    # -- real BPE: train merges on 10% (driver loop over the capped
    # word aggregate), Arrow-encode all 1M docs (60M words)
    t0 = time.time()
    merges = bpe_train_merges(
        docs.filter(F.col("doc_id") % 10 == 0),
        num_merges=200, max_words=20_000,
    )
    bpe_train_wall = time.time() - t0
    t0 = time.time()
    total_pieces = (
        bpe_token_counts(docs, merges).agg(F.sum("n_pieces")).collect()[0][0]
    )
    bpe_enc_wall = time.time() - t0
    out({
        "probe": f"bpe_{n}docs", "n_merges": len(merges),
        "train_wall": round(bpe_train_wall, 1),
        "encode_wall": round(bpe_enc_wall, 1),
        "total_pieces": int(total_pieces),
    })

    # -- edit-distance blocking: 3-token prefix blocks; planted
    # near-dups (every 50th doc copies its predecessor's head) must
    # surface as distance-0 pairs on the 40-char key
    t0 = time.time()
    pairs = edit_distance_pairs(
        docs, "doc_id", "text", max_distance=3,
        prefix_len=24, match_len=40, max_block_size=2000,
    ).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    planted = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_b") % 50 == 0)
    ).count()
    edit_wall = time.time() - t0
    out({
        "probe": f"editsim_{n}docs", "wall": round(edit_wall, 1),
        "pairs": n_pairs, "planted_found": planted,
        "planted_total": n // 50 - 1,
    })

    # -- conversation audit: split on the modal token, full stats scan
    t0 = time.time()
    convs = docs.select(
        "doc_id", turns_from_text(F.col("text"), sep=r"\s+w0000001\s+").alias("turns")
    )
    wf = conversation_stats(convs).filter("well_formed").count()
    chat_wall = time.time() - t0
    out({"probe": f"chat_{n}docs", "wall": round(chat_wall, 1),
         "well_formed": wf})

    # -- interval join (batch form of the stream-stream join): 1M x 1M
    # events over 100k users, 60 s lookback
    ev = lambda tag, shift: spark.range(0, n, 1, 64).select(  # noqa: E731
        (F.col("id") % 100_000).alias("user_id"),
        F.col("id").alias(f"{tag}_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.xxhash64(F.col("id"), F.lit(shift)) % 86_400)
        ).alias(f"{tag}_ts"),
    )
    t0 = time.time()
    joined = interval_join_streams(
        ev("l", 1), ev("r", 2), ["user_id"], "l_ts", "r_ts", lookback="60 seconds"
    )
    n_joined = joined.count()
    join_wall = time.time() - t0
    out({"probe": f"interval_join_{n}x{n}", "wall": round(join_wall, 1),
         "pairs": n_joined})


PROBES = {
    "setjoin_zipf": probe_setjoin_zipf,
    "newops_1m": probe_newops_1m,
    "sketches_60m": probe_sketches_60m,
    "text_gates_1m": probe_text_gates_1m,
    "png_throughput": probe_png_throughput,
    "cc_star": probe_cc_star,
    "hash_60m_disk": probe_hash_60m_disk,
    "hash_wide_disk": probe_hash_wide_disk,
    "ann_clustered": probe_ann_clustered,
}


def main() -> int:
    names = sys.argv[1:] or list(PROBES)
    unknown = [n for n in names if n not in PROBES]
    if unknown:
        print(f"unknown probes: {unknown}; known: {list(PROBES)}", file=sys.stderr)
        return 2
    spark = get_spark()
    for n in names:
        PROBES[n](spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Scale smoke: run the headline operators at ~10x the bench scale to
check sub-linear scaling (BASELINE.md "Scale smoke" section).

Usage: python tools/scale_smoke.py [sf_dir] [factor]

- compare (fast + hash modes) on lineitem exploded `factor`x in-memory
  with 0.1% mutations, 4-column key
- exact_dedup + minhash_lsh_pairs on documents exploded `factor`x with
  per-copy variant suffixes (so near-dup density stays realistic)

Prints one JSON line per probe: {"probe": ..., "rows": N, "wall": sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hermes_spark import ComparisonConfig, compare
    from hermes_spark.operators.dedup import exact_dedup, minhash_lsh_pairs

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("scale-smoke")
        .config("spark.sql.shuffle.partitions", str(int(cpus) * 2))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def probe(name, fn):
        t0 = time.time()
        rows = fn()
        print(json.dumps({"probe": name, "rows": rows, "wall": round(time.time() - t0, 1)}), flush=True)

    # ---- compare at ~6M rows -------------------------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    big = li.select("*", copies).withColumn(
        "l_orderkey", F.col("l_orderkey") * factor + F.col("__copy")
    ).drop("__copy")
    mutated = big.withColumn(
        "l_quantity",
        F.when(F.xxhash64("l_orderkey", "l_linenumber") % 1000 == 0,
               F.col("l_quantity") * 2).otherwise(F.col("l_quantity")),
    )
    keys = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    n = big.count()
    print(json.dumps({"probe": "rows_compare_input", "rows": n, "wall": 0.0}), flush=True)
    for mode in ("fast", "hash"):
        probe(
            f"compare_{mode}_{n}rows",
            lambda m=mode: compare(
                big, mutated, keys=keys,
                config=ComparisonConfig(mode=m, allow_duplicates=True),
            ).diff_count,
        )

    # ---- dedup at ~factor x documents ----------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vdocs = (
        docs.select("doc_id", "text", "lang", copies)
        .withColumn("doc_id", F.col("doc_id") * factor + F.col("__copy"))
        .withColumn(
            "text",
            F.when(F.col("__copy") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" variant "), F.col("__copy").cast("string"))
            ),
        )
        .drop("__copy")
    )
    nd = vdocs.count()
    print(json.dumps({"probe": "rows_docs_input", "rows": nd, "wall": 0.0}), flush=True)
    probe(f"exact_dedup_{nd}docs", lambda: exact_dedup(vdocs, "doc_id", text_col="text").count())
    probe(
        f"minhash_lsh_pairs_{nd}docs",
        lambda: minhash_lsh_pairs(
            vdocs, "doc_id", "text", portable=False, min_jaccard=0.5
        ).count(),
    )

    # ---- round-4b curation ops on the exploded docs ----------------------
    from hermes_spark.operators.classify import linear_quality_score
    from hermes_spark.operators.importance import dsir_weights
    from hermes_spark.operators.ngrams import ngram_novelty, topk_ngrams

    probe(
        f"topk_ngrams_{nd}docs",
        lambda: topk_ngrams(vdocs, "doc_id", "text", n=2, k=100).count(),
    )
    probe(
        f"ngram_novelty_{nd}docs",
        lambda: ngram_novelty(vdocs, "doc_id", "text", n=2).count(),
    )
    probe(
        f"quality_classifier_{nd}docs",
        lambda: linear_quality_score(vdocs, "doc_id", "text").count(),
    )
    probe(
        f"dsir_weights_{nd}docs",
        lambda: dsir_weights(
            vdocs, vdocs.filter(F.col("lang") == "en"), "doc_id", "text",
            buckets=4096,
        ).count(),
    )

    # ---- round-4b vector ops on the exploded embeddings ------------------
    from hermes_spark.operators.mmr import mmr_select
    from hermes_spark.operators.projection import random_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bigv = (
        emb.select(
            "vec_id", "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__c"),
        )
        .withColumn("vec_id", F.col("vec_id") * factor + F.col("__c"))
        .drop("__c")
    )
    nv = bigv.count()
    print(json.dumps({"probe": "rows_vecs_input", "rows": nv, "wall": 0.0}), flush=True)
    probe(
        f"random_project_{nv}vecs",
        lambda: random_project(bigv, "vec_id", "embedding", 64, 16).count(),
    )
    probe(
        f"mmr_select_{nv}vecs",
        lambda: mmr_select(
            bigv, bigv.filter(F.col("vec_id") < 10), k=10, pool_size=50
        ).count(),
    )

    # ---- analytics at ~5M events -----------------------------------------
    from hermes_spark.operators.funnel import cohort_retention, funnel_counts
    from hermes_spark.operators.gapfill import gapfill_rollup, rolling_anomalies

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts", "").startswith("timestamp"):
        ts = F.col("ts")
    else:
        ts = F.timestamp_micros(F.expr("ts div 1000"))
    factor_e = factor * 5
    bige = (
        ev.select(
            ts.cast("timestamp").alias("ts"), "user_id", "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(factor_e - 1))).alias("__c"),
        )
        .withColumn("user_id", F.col("user_id") * factor_e + F.col("__c"))
        .drop("__c")
    )
    ne = bige.count()
    print(json.dumps({"probe": "rows_events_input", "rows": ne, "wall": 0.0}), flush=True)
    probe(
        f"funnel_{ne}events",
        lambda: funnel_counts(bige, ["view", "click", "purchase"]).count(),
    )
    probe(f"cohort_{ne}events", lambda: cohort_retention(bige).count())

    def _anom():
        hourly = gapfill_rollup(
            bige.withColumn("value", F.lit(1.0)), "ts", "value",
            group_cols=["event_type"], unit="hour",
        )
        return rolling_anomalies(
            hourly, "bucket", "n_events", group_cols=["event_type"]
        ).count()

    probe(f"anomalies_{ne}events", _anom)

    # ---- round-4c: PageRank on a ~1.5M-edge graph, EWMA, upsert sink -----
    from hermes_spark.operators.gapfill import ewma_smooth
    from hermes_spark.operators.graph import pagerank
    from hermes_spark.streaming.enrich import upsert_sink

    n_nodes = 500_000
    nodes = spark.range(n_nodes).select(F.col("id").alias("src"))
    edges = nodes.select(
        "src",
        F.explode(
            F.array(
                (F.col("src") * 7 + 3) % n_nodes,
                (F.col("src") * 13 + 5) % n_nodes,
                (F.col("src") * 29 + 11) % n_nodes,
            )
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    probe(
        f"pagerank_{n_nodes}nodes_5iter",
        lambda: pagerank(edges, iterations=5).count(),
    )

    def _ewma():
        hourly = gapfill_rollup(
            bige.withColumn("value", F.lit(1.0)), "ts", "value",
            group_cols=["event_type"], unit="hour",
        )
        return ewma_smooth(
            hourly, "bucket", "n_events", group_cols=["event_type"]
        ).count()

    probe(f"ewma_{ne}events", _ewma)

    def _upsert():
        # 1M keyed updates (~3 versions/key) through the partition-
        # overwrite sink in one availableNow batch, then a second batch
        # touching 10% of keys — batch 2's cost should reflect touched
        # buckets, not store size.
        import tempfile

        tmp = tempfile.mkdtemp(prefix="smoke_upsert_")
        src, store, ckpt = f"{tmp}/src", f"{tmp}/store", f"{tmp}/ckpt"
        updates = spark.range(1_000_000).select(
            (F.col("id") % 333_333).alias("k"),
            F.col("id").alias("ts"),
            F.xxhash64("id").cast("string").alias("val"),
        )
        updates.write.parquet(src)
        stream = spark.readStream.schema("k long, ts long, val string").parquet(src)
        q = (
            upsert_sink(stream, store, keys=["k"], order_col="ts", num_buckets=64)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        spark.range(100_000).select(
            (F.col("id") * 10 % 333_333).alias("k"),
            (F.col("id") + 2_000_000).alias("ts"),
            F.lit("v2").alias("val"),
        ).write.mode("append").parquet(src)
        stream2 = spark.readStream.schema("k long, ts long, val string").parquet(src)
        q2 = (
            upsert_sink(stream2, store, keys=["k"], order_col="ts", num_buckets=64)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(300)
        return spark.read.parquet(store).count()

    probe("upsert_sink_1M_updates_plus_100k_batch", _upsert)

    # ---- round-5 curation/event ops at the exploded scales ---------------
    from hermes_spark.operators import (
        cap_per_group,
        collapse_runs,
        psi_report,
        training_order,
    )

    probe(
        f"cap_per_group_{nd}docs",
        lambda: cap_per_group(vdocs, "doc_id", "source", cap=100).count(),
    )
    probe(
        f"training_order_{nd}docs",
        lambda: training_order(vdocs, "doc_id", num_shards=64).count(),
    )
    probe(
        f"collapse_runs_{ne}events",
        lambda: collapse_runs(
            bige.withColumn("event_id", F.monotonically_increasing_id()),
            key_col="user_id",
            order_cols=("ts", "event_id"),
            value_col="event_type",
        ).count(),
    )

    def _psi():
        cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
        ev2 = bige.withColumn("value", (F.col("user_id") % 100).cast("double"))
        return psi_report(
            ev2.filter(F.col("ts") < cut), ev2.filter(F.col("ts") >= cut),
            "value", bins=10, lo=0.0, hi=100.0,
        ).count()

    probe(f"psi_report_{ne}events", _psi)

    # ---- ANN recall@10 at ~1M vectors: ivf_sq8_rescore vs exact ---------
    # Fully synthetic hash-derived vectors (uniform [-1, 1] per
    # component): exploded near-duplicate copies would sit in their
    # query's own cell and report a vacuous recall of 1.0; a genuinely
    # spread corpus is what exercises the cell-boundary recall loss
    # that nprobe exists to recover.
    from hermes_spark.operators.quantize import ivf_sq8_rescore_topk, sq8_stats
    from hermes_spark.operators.similarity import (
        brute_force_cosine_topk,
        kmeans_centroids,
    )

    nvec_target = 100_000 * factor  # factor 10 -> 1M vectors
    bigvec = (
        spark.range(nvec_target)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: F.pmod(
                    F.xxhash64(F.col("id"), i), F.lit(100_000)
                ).cast("double")
                / 50_000.0
                - 1.0,
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    nvec = bigvec.count()
    print(json.dumps({"probe": "rows_ann_corpus", "rows": nvec, "wall": 0.0}), flush=True)
    qs = bigvec.filter(F.col("vec_id") < 10)
    # index build once: centroids from a deterministic ~20k sample + stats
    t0 = time.time()
    sample = bigvec.filter(F.col("vec_id") % 50 == 0)
    cents = kmeans_centroids(sample, k=64, dim=64, max_iter=3).localCheckpoint()
    stats = sq8_stats(bigvec, "embedding", 64).localCheckpoint()
    print(json.dumps({"probe": f"ivf_index_build_{nvec}vecs_64cells",
                      "rows": 64, "wall": round(time.time() - t0, 1)}), flush=True)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_cosine_topk(bigvec, qs, k=10).collect()
    }
    nq = len({q for q, _ in exact})
    for nprobe in (1, 4, 8):
        t0 = time.time()
        got = ivf_sq8_rescore_topk(
            bigvec, cents, qs, k=10, shortlist=50, nprobe=nprobe, stats=stats
        ).collect()
        hits = sum((r["query_id"], r["vec_id"]) in exact for r in got)
        print(json.dumps({
            "probe": f"ivf_sq8_rescore_recall@10_nprobe{nprobe}_{nvec}vecs",
            "rows": len(got),
            "recall": round(hits / (10 * nq), 3),
            "wall": round(time.time() - t0, 1),
        }), flush=True)

    # ---- composed curation pipeline at ~500k docs -----------------------
    # The operators are individually proven; this runs the WHOLE
    # examples/curate_documents.py flow (expectations gate -> strip ->
    # gates -> dedup -> novelty -> mix -> decontaminate -> split ->
    # pack -> shard writer) as one job and records the stage funnel.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples"))
    from curate_documents import curate

    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="scale_curate_")
    try:
        doc_factor = factor * 10  # sf0.1 has ~5k docs -> ~500k
        # Per-copy token DROPOUT (drop every (i%10==c%10)-th token), not a
        # suffix: a pure-suffix variant family has ~0 n-gram novelty, so
        # the novelty gate (correctly) annihilates the whole corpus and
        # the later pipeline stages go untested. Dropout keeps variants
        # near-duplicate (minhash-visible) yet each carries ~30% novel
        # grams, so rows keep flowing through mix/decontaminate/pack.
        toks = F.split(F.trim(F.col("text")), r"\s+")
        dropped = F.filter(
            toks, lambda t, i: F.pmod(i, F.lit(10)) != F.pmod(F.col("__c"), F.lit(10))
        )
        big_docs = (
            docs.select(
                "*", F.explode(F.sequence(F.lit(0), F.lit(doc_factor - 1))).alias("__c")
            )
            .withColumn("doc_id", F.col("doc_id") * doc_factor + F.col("__c"))
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.concat(
                        dropped,
                        F.array(F.concat(F.lit("variant"), F.col("__c").cast("string"))),
                    ),
                ),
            )
            .drop("__c")
        )
        big_docs.write.mode("overwrite").parquet(f"{work}/src/documents.parquet")
        funnel: dict = {}
        t0 = time.time()
        curate(spark, f"{work}/src", f"{work}/out", funnel=funnel)
        print(json.dumps({
            "probe": f"curation_pipeline_{funnel.get('input', -1)}docs",
            "rows": funnel.get("input", -1),
            "funnel": funnel,
            "wall": round(time.time() - t0, 1),
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Round-7 scale probes (VERDICT r6 items 4 and 7).

Usage: python tools/r7_probes.py [probe ...]   (default: all)

Probes — each prints one JSON line per result:

* ``bloom_auto_60m`` — the Bloom-prefilter engagement decision on a
  60M-row on-disk join: ``bloom_join_decision`` must pick the PLAIN
  join under the local cost model (measured: prefilter loses locally)
  and ENGAGE under a network-bound cost model (5 ns/byte) at ~1%
  selectivity; the auto path's row count must equal the plain join's.
* ``funnel_5m``      — the composed curation funnel at 5M documents
  (10x the r5 500k probe, now including the r6/r7 stages): synth corpus
  -> clean_text -> C4 line rules -> Gopher gate -> exact dedup ->
  MinHash near-dup -> LM perplexity filter -> epoch mix -> pack.
  Per-stage wall + rows table, the end-to-end 100 TB-shape evidence.
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
        .appName("r7-probes")
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


def probe_bloom_auto_60m(spark) -> None:
    from pyspark.sql import functions as F

    from hermes_spark.operators import bloom_join_decision, bloom_prefilter_join

    work = "/tmp/r7_bloom60m"
    factor = 100
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    big = li.select("*", copies).withColumn(
        "l_orderkey", F.col("l_orderkey") * factor + F.col("__copy")
    ).drop("__copy")
    big.repartition(64).write.mode("overwrite").parquet(f"{work}/li")
    try:
        ref = spark.read.parquet(f"{work}/li").withColumnRenamed(
            "l_partkey", "p_partkey"
        )
        part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter("p_size <= 2")
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # the decision itself, under both cost models
            t0 = time.time()
            local = bloom_join_decision(ref, part, "p_partkey", portable=False)
            cluster = bloom_join_decision(
                ref, part, "p_partkey", portable=False,
                shuffle_cost_ns_per_byte=5.0,
            )
            decide_wall = time.time() - t0

            t0 = time.time()
            plain = ref.join(part, "p_partkey").count()
            plain_wall = time.time() - t0
            t0 = time.time()
            auto = bloom_prefilter_join(
                ref, part, "p_partkey", portable=False, auto=True
            ).count()
            auto_wall = time.time() - t0
            t0 = time.time()
            forced = bloom_prefilter_join(
                ref, part, "p_partkey", m_bits=1 << 17, k=5, portable=False
            ).count()
            forced_wall = time.time() - t0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        out({
            "probe": "bloom_auto_60m",
            "local_engage": local["engage"],
            "cluster_engage": cluster["engage"],
            "selectivity_est": local["selectivity_est"],
            "decide_wall": round(decide_wall, 1),
            "plain_wall": round(plain_wall, 1),
            "auto_wall": round(auto_wall, 1),
            "forced_bloom_wall": round(forced_wall, 1),
            "rows": plain,
            "agree": plain == auto == forced,
            "auto_picked_winner": (not local["engage"])
            and auto_wall <= forced_wall * 1.5,
        })
    finally:
        shutil.rmtree(work, ignore_errors=True)


def probe_funnel_5m(spark) -> None:
    from pyspark.sql import functions as F

    from hermes_spark.functions.clean import clean_text
    from hermes_spark.operators import (
        c4_clean,
        epoch_mix,
        exact_dedup,
        gopher_filter,
        lm_score,
        lm_train,
        minhash_lsh_pairs,
        pack_sequences,
    )
    from hermes_spark.synth import zipf_documents

    n = int(os.environ.get("FUNNEL_DOCS", "5000000"))
    work = "/tmp/r7_funnel5m"
    stages = []

    def stage(name, wall, rows):
        stages.append({"stage": name, "wall": round(wall, 1), "rows": rows})
        out({"probe": "funnel_5m_stage", "stage": name,
             "wall": round(wall, 1), "rows": rows})

    t0 = time.time()
    # sentence-shape the synthetic text (terminal period) so the C4
    # line rule evaluates it like real prose instead of zeroing the
    # corpus; the uniform suffix changes no dedup/near-dup signal
    synth = zipf_documents(
        spark, n, vocab_size=30_000, doc_len=80, seed=23,
        near_dup_every=50, partitions=128,
    ).select("doc_id", F.concat(F.col("text"), F.lit(".")).alias("text"))
    synth.write.mode("overwrite").parquet(f"{work}/raw")
    docs = spark.read.parquet(f"{work}/raw")
    stage("synth+write", time.time() - t0, docs.count())

    try:
        # 1. text repair (scan-side, zero shuffle) — keep lazy into C4
        t0 = time.time()
        cleaned = docs.select(
            "doc_id", clean_text(F.col("text")).alias("text")
        )
        # 2. C4 line rules
        c4d = c4_clean(cleaned, "doc_id", "text")
        c4d.write.mode("overwrite").parquet(f"{work}/c4")
        c4d = spark.read.parquet(f"{work}/c4")
        stage("clean+c4", time.time() - t0, c4d.count())

        # 3. Gopher gate (tuned to the synthetic corpus: no stopwords)
        t0 = time.time()
        gated = gopher_filter(
            c4d, "doc_id", "text", min_words=20, min_stopwords=0,
            min_mean_word_len=0.0, max_mean_word_len=100.0,
        )
        gated.write.mode("overwrite").parquet(f"{work}/gated")
        gated = spark.read.parquet(f"{work}/gated")
        stage("gopher", time.time() - t0, gated.count())

        # 4. exact dedup
        t0 = time.time()
        deduped = exact_dedup(gated, "doc_id", "text")
        deduped.write.mode("overwrite").parquet(f"{work}/dedup")
        deduped = spark.read.parquet(f"{work}/dedup")
        stage("exact_dedup", time.time() - t0, deduped.count())

        # 5. MinHash near-dup pairs -> drop the higher id of each pair
        t0 = time.time()
        # 8 rows/band: the Zipf head makes 4-row bands collide far too
        # often (random-doc candidate volume, not true near-dups)
        pairs = minhash_lsh_pairs(
            deduped, "doc_id", "text", shingle_n=3, num_hashes=32,
            num_bands=4, min_jaccard=0.7, portable=False,
        )
        drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        neared = deduped.join(F.broadcast(drop), "doc_id", "left_anti")
        neared.write.mode("overwrite").parquet(f"{work}/neardedup")
        neared = spark.read.parquet(f"{work}/neardedup")
        stage("minhash_dedup", time.time() - t0, neared.count())

        # 6. LM perplexity filter: train on 10%, keep the best 80%
        t0 = time.time()
        lm = lm_train(
            neared.filter(F.col("doc_id") % 10 == 0), vocab_size=20_000
        )
        scored = lm_score(neared, lm, broadcast_model=True)
        cut = scored.approxQuantile("avg_logprob", [0.2], 0.01)[0]
        kept_ids = scored.filter(F.col("avg_logprob") >= cut).select("doc_id")
        kept = neared.join(kept_ids, "doc_id").select("doc_id", "text")
        kept.write.mode("overwrite").parquet(f"{work}/lm")
        kept = spark.read.parquet(f"{work}/lm")
        stage("lm_filter", time.time() - t0, kept.count())

        # 7. epoch mix: 2 sources by doc_id parity, weights 2:1
        t0 = time.time()
        tagged = kept.withColumn(
            "source",
            F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd"),
        )
        mixed = epoch_mix(
            tagged, "doc_id", "source", {"even": 2.0, "odd": 1.0}
        )
        mixed.write.mode("overwrite").parquet(f"{work}/mix")
        mixed = spark.read.parquet(f"{work}/mix")
        stage("epoch_mix", time.time() - t0, mixed.count())

        # 8. pack into 512-token training sequences
        t0 = time.time()
        packed = pack_sequences(
            mixed, "doc_id", text_col="text", budget=512, num_shards=64
        )
        packed.write.mode("overwrite").parquet(f"{work}/packed")
        packed = spark.read.parquet(f"{work}/packed")
        stage("pack", time.time() - t0, packed.count())

        out({
            "probe": "funnel_5m",
            "n_input": n,
            "total_wall": round(sum(s["wall"] for s in stages), 1),
            "stages": stages,
        })
    finally:
        shutil.rmtree(work, ignore_errors=True)


PROBES = {
    "bloom_auto_60m": probe_bloom_auto_60m,
    "funnel_5m": probe_funnel_5m,
}


def main() -> int:
    names = sys.argv[1:] or list(PROBES)
    spark = get_spark()
    for name in names:
        PROBES[name](spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

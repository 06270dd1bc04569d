"""Round-13 optimization probes (guide §1: measure first).

Usage: python tools/r13_probes.py <probe> [args]

Probes:
  setjoin_cand   — candidate counts + walls for containment/jaccard at sf0.1
  bench_some Q.. — repeated noop-sink walls for the named bench queries
  compare_decomp — phase decomposition of compare fast/hash
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _spark(cpus=None):
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r13-probes")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def _noop(df):
    df.write.mode("overwrite").format("noop").save()


def setjoin_cand(sf_dir="/root/testdata/sf0.1"):
    from hermes_spark.operators import containment_join, jaccard_set_join

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for name, fn in [
        ("containment", lambda st: containment_join(
            docs, min_containment=0.8, ngram=3, stats=st)),
        ("jaccard", lambda st: jaccard_set_join(
            docs, min_jaccard=0.7, stats=st)),
    ]:
        st: dict = {}
        t0 = time.perf_counter()
        out = fn(st)
        _noop(out)
        wall = time.perf_counter() - t0
        print(f"{name}: candidates={st['candidates']} docs={st['docs']} "
              f"wall_with_stats={wall:.2f}s", flush=True)


def bench_some(*names, reps=5):
    import bench

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm pass, untimed
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100000).groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()
    allq = dict(bench.BENCH_QUERIES)
    allq.update(bench.OUTPUT_BOUND_QUERIES)
    raw = {n: [] for n in names}
    for _ in range(int(reps)):
        for n in names:
            t0 = time.perf_counter()
            allq[n](spark, sf_dir)
            raw[n].append(round(time.perf_counter() - t0, 2))
    for n, vals in raw.items():
        s = sorted(vals)
        med = s[len(s) // 2]
        print(f"{n}: median={med} raw={vals}", flush=True)


def compare_decomp(mode="fast", cpus=None):
    from hermes_spark import ComparisonConfig, DatasetComparator

    spark = _spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    actual = li.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") % 97 == 0, F.col("l_quantity") * 2).otherwise(
            F.col("l_quantity")
        ),
    )
    # warm
    _noop(li.limit(100000).groupBy("l_returnflag").count())
    for _ in range(3):
        t0 = time.perf_counter()
        cmp = DatasetComparator(
            li, actual,
            keys=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
            config=ComparisonConfig(mode=mode, allow_duplicates=True),
        )
        result = cmp.compare()
        t1 = time.perf_counter()
        if result.result_df is not None:
            _noop(result.result_df)
        t2 = time.perf_counter()
        nparts = None
        if cmp._persisted:
            nparts = cmp._persisted[0].rdd.getNumPartitions()
        cmp.release()
        print(
            f"mode={mode} cpus={spark.sparkContext.defaultParallelism} "
            f"compare={t1-t0:.2f}s write={t2-t1:.2f}s "
            f"classified_parts={nparts}", flush=True,
        )


def containment_decomp(sf_dir="/root/testdata/sf0.1"):
    """Phase decomposition of containment_join at bench settings."""
    from hermes_spark.operators.setjoin import (
        THRESHOLD_DENOM, _word_ngrams,
    )

    spark = _spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs_in = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t_scaled = 8000
    grams = docs_in.select(
        F.col("doc_id"),
        F.explode(_word_ngrams(F.col("text"), 3)).alias("term"),
    ).filter(F.col("term") != "")
    freq = grams.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    ordered = (
        grams.join(freq, on="term")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df_t", "term"))),
                lambda s: s["term"],
            ).alias("terms")
        )
        .withColumn("n", F.size("terms").cast("long"))
    )
    ceil_tn = (
        (F.col("n") * F.lit(t_scaled) + F.lit(THRESHOLD_DENOM - 1))
        / F.lit(THRESHOLD_DENOM)
    ).cast("long")
    docs = ordered.withColumn(
        "prefix", F.slice(F.col("terms"), 1, (F.col("n") - ceil_tn + 1).cast("int"))
    )
    t0 = time.perf_counter()
    _noop(docs)
    t1 = time.perf_counter()
    print(f"index build (1x): {t1-t0:.2f}s", flush=True)

    pre_a = docs.select(
        F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"),
        F.posexplode("prefix").alias("pos_a", "term"),
    )
    all_b = docs.select(
        F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"),
        F.posexplode("terms").alias("pos_b", "term"),
    )
    joined = pre_a.join(all_b, on="term").filter(
        (F.col("id_a") != F.col("id_b"))
        & (F.col("n_b") * THRESHOLD_DENOM >= F.col("n_a") * t_scaled)
    )
    t0 = time.perf_counter()
    cells = joined.count()
    t1 = time.perf_counter()
    print(f"join cells (no pos filter): {cells} in {t1-t0:.2f}s", flush=True)
    posf = joined.filter(
        (F.col("n_b") - F.col("pos_b")) * THRESHOLD_DENOM
        >= F.col("n_a") * t_scaled
    )
    t0 = time.perf_counter()
    cells2 = posf.count()
    t1 = time.perf_counter()
    print(f"join cells (pos filter): {cells2} in {t1-t0:.2f}s", flush=True)
    cand = posf.select("id_a", "id_b").distinct()
    t0 = time.perf_counter()
    ncand = cand.count()
    t1 = time.perf_counter()
    print(f"distinct cand: {ncand} in {t1-t0:.2f}s (incl re-join)", flush=True)
    left = docs.select(
        F.col("doc_id").alias("id_a"), F.col("terms").alias("__ta"),
        F.col("n").alias("n_a"),
    )
    right = docs.select(
        F.col("doc_id").alias("id_b"), F.col("terms").alias("__tb"),
        F.col("n").alias("n_b"),
    )
    ver = (
        cand.join(left, on="id_a").join(right, on="id_b")
        .withColumn("n_common", F.size(F.array_intersect("__ta", "__tb")).cast("long"))
        .filter(F.col("n_common") * THRESHOLD_DENOM >= F.lit(t_scaled) * F.col("n_a"))
    )
    t0 = time.perf_counter()
    _noop(ver)
    t1 = time.perf_counter()
    print(f"full pipeline via verify: {t1-t0:.2f}s", flush=True)


if __name__ == "__main__":
    probe = sys.argv[1]
    globals()[probe](*sys.argv[2:])

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
        docs.select("doc_id", "text", copies)
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
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

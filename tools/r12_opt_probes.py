"""Round-12 optimization probes: phase decomposition of the heaviest
bench rows and an interleaved A/B timer for focused re-measurement.

Usage:
    python tools/r12_opt_probes.py ab <query> [query ...]   # interleaved medians
    python tools/r12_opt_probes.py compare_decomp
    python tools/r12_opt_probes.py bloom_decomp
    python tools/r12_opt_probes.py jobs <query> [...]       # count Spark jobs/actions

Same session settings as bench.py (local[$SPARK_GRAFT_CPUS], AQE on,
noop sink) so numbers are comparable to the bench medians.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def out(obj) -> None:
    print(json.dumps(obj), flush=True)


def get_spark():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r12-opt-probes")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _mat(df):
    df.write.mode("overwrite").format("noop").save()


def _bench_fn(name):
    import bench as _bench

    return _bench.BENCH_QUERIES.get(name) or _bench.OUTPUT_BOUND_QUERIES.get(name)


def probe_ab(spark, names) -> None:
    """Interleaved median walls for the named bench queries (bench.py
    lambdas, noop sink, one untimed warm-up pass)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fns = {}
    for n in names:
        fn = _bench_fn(n)
        if fn is None:
            out({"error": f"unknown bench query {n}"})
            continue
        fns[n] = fn
    walls = {n: [] for n in fns}
    for n, fn in fns.items():
        fn(spark, sf_dir)  # warm-up
    reps = int(os.environ.get("BENCH_AB_REPS", "5"))
    for i in range(reps):
        for n, fn in fns.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            walls[n].append(round(time.perf_counter() - t0, 3))
    for n, ws in walls.items():
        s = sorted(ws)
        out({"probe": "ab", "query": n, "walls": s, "median": s[len(s) // 2]})


def probe_jobs(spark, names) -> None:
    """Job/stage counts per bench query — how many Spark actions the
    query path fires (fixed scheduling overhead is per job)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for n in names:
        fn = _bench_fn(n)
        if fn is None:
            continue
        fn(spark, sf_dir)  # warm-up so codegen caches don't count
        before = tracker.getJobIdsForGroup(None)
        base = max(before) if before else -1
        t0 = time.perf_counter()
        fn(spark, sf_dir)
        wall = round(time.perf_counter() - t0, 3)
        after = tracker.getJobIdsForGroup(None)
        new_jobs = [j for j in after if j > base]
        n_stages = 0
        for j in new_jobs:
            info = tracker.getJobInfo(j)
            if info is not None:
                n_stages += len(info.stageIds)
        out({"probe": "jobs", "query": n, "wall": wall,
             "jobs": len(new_jobs), "stages": n_stages})


def probe_compare_decomp(spark) -> None:
    """Phase walls inside the three compare modes at sf0.1."""
    import bench as _bench
    from hermes_spark import ComparisonConfig, DatasetComparator

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for mode in ("fast", "hash", "reference"):
        for rep in range(3):
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            actual = _bench._mutated_lineitem(spark, sf_dir)
            t0 = time.perf_counter()
            cmp_ = DatasetComparator(
                li, actual,
                keys=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
                config=ComparisonConfig(mode=mode, allow_duplicates=True),
            )
            result = cmp_.compare()
            t1 = time.perf_counter()
            if result.result_df is not None:
                _mat(result.result_df)
            t2 = time.perf_counter()
            cmp_.release()
            out({"probe": "compare_decomp", "mode": mode, "rep": rep,
                 "metrics_phase_s": round(t1 - t0, 3),
                 "diff_mat_s": round(t2 - t1, 3),
                 "diff_count": result.diff_count})


def probe_bloom_decomp(spark) -> None:
    """bloom_join_parts phase walls: bitmap build (distributed agg +
    collect), member-expression construction (driver/py4j), filter+join
    noop execution."""
    import __spark_entry__ as entry
    from hermes_spark.operators.sketch import bloom_bitmap_hex, bloom_member

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m_bits, k = entry.BLOOM_M, entry.BLOOM_K
    for rep in range(3):
        li = entry._read(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_partkey", "p_partkey"
        )
        part = entry._read(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
        t0 = time.perf_counter()
        bitmap = bloom_bitmap_hex(part, "p_partkey", m_bits=m_bits, k=k)
        t1 = time.perf_counter()
        member = bloom_member(F.col("p_partkey"), bitmap, m_bits, k, True)
        t2 = time.perf_counter()
        filtered = li.filter(F.col("p_partkey").isNotNull() & member)
        joined = filtered.join(part, "p_partkey", "inner")
        agg = joined.groupBy("p_brand").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        t3 = time.perf_counter()
        _mat(agg)
        t4 = time.perf_counter()
        out({"probe": "bloom_decomp", "rep": rep,
             "bitmap_build_s": round(t1 - t0, 3),
             "member_expr_s": round(t2 - t1, 3),
             "plan_build_s": round(t3 - t2, 3),
             "exec_s": round(t4 - t3, 3)})


def main() -> int:
    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm the JVM like bench.py does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(100000).groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    cmd, rest = args[0], args[1:]
    if cmd == "ab":
        probe_ab(spark, rest)
    elif cmd == "jobs":
        probe_jobs(spark, rest)
    elif cmd == "compare_decomp":
        probe_compare_decomp(spark)
    elif cmd == "bloom_decomp":
        probe_bloom_decomp(spark)
    else:
        print(f"unknown probe {cmd}")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())



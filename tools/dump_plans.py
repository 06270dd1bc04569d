"""Dump .explain("formatted") for every bench query to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before")
and prints a one-line red-flag summary per query: number of Exchange
nodes, join strategies, Python-eval nodes, and whether the parquet
scans carry PushedFilters.  Plan *capture* only — no query execution
(building a frame may still run bounded model-fit jobs for operators
that train on collect()ed aggregates; that is part of their plan cost).
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(text: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", text))
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", text
    )
    pyeval = re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|"
                        r"MapInPandas|FlatMapGroupsInPandas)", text)
    scans = len(re.findall(r"Scan parquet", text))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", text))
    from collections import Counter
    jc = dict(Counter(joins))
    pc = dict(Counter(pyeval))
    return (f"exchanges={n_ex} scans={scans} pushed_scans={pushed} "
            f"joins={jc or '-'} pyeval={pc or '-'}")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("hermes-plan-dump")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    frames = {}
    qs = entry.queries()
    # bench queries that are plain entry functions
    import bench

    for name in bench.BENCH_QUERIES:
        if only and name not in only:
            continue
        if name.startswith("compare_"):
            continue  # multi-action comparator; handled by its own probes
        fn = getattr(entry, f"q_{name}", None)
        if fn is None and name in qs:
            fn = qs[name]
        if fn is None:
            special = {
                "minhash_fast_hash": bench._minhash_fast,
                "simhash_fast_hash": bench._simhash_fast,
                "hll_distinct_fast": bench._hll_fast,
                "bloom_join_fast": bench._bloom_fast,
            }
            if name in bench.BENCH_QUERIES and name in special:
                fn = special[name]
            elif name in ("q9_product_profit", "q13_order_distribution",
                          "q21_sole_return_blame"):
                fn = entry.TPCH_EXTRA_QUERIES[name]
        if fn is None:
            print(f"SKIP {name}: no builder found")
            continue
        frames[name] = fn
    for name in bench.OUTPUT_BOUND_QUERIES:
        if not only or name in only:
            frames[name] = getattr(entry, f"q_{name}")

    for name, fn in frames.items():
        try:
            df = fn(spark, sf_dir)
            text = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {summarize(text)}")


if __name__ == "__main__":
    main()

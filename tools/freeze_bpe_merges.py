"""Freeze the BPE merge table for the oracle-paired encode query.

Trains ``bpe_train_merges`` ONCE on the sf0.001 even-doc_id half (the
same train/eval split the old rows-only ``bpe_token_stats`` used) and
prints the merge list as a Python literal to inline into
``__spark_entry__.py`` as ``BPE_FROZEN_MERGES``.

This is the r5 ``pq_topk`` train/search split applied to BPE (VERDICT
r7 item 4): the iterative argmax-merge TRAINING loop is not
SQL-expressible, so it runs once offline; the deterministic greedy
ENCODE stage over the frozen table is what the registry checks, and
THAT stage has an exact DuckDB oracle (recursive-CTE greedy merge).

Usage: python tools/freeze_bpe_merges.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hermes_spark.operators import bpe_train_merges

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("freeze-bpe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe_train_merges(
        docs.filter(F.col("doc_id") % 2 == 0), num_merges=100, max_words=10_000
    )
    print("# trained on", sf_dir, "even doc_ids, num_merges=100, max_words=10000")
    print("BPE_FROZEN_MERGES = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

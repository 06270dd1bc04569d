"""Diagnose the simhash_fast_hash bench anomaly (VERDICT r3 #2).

Times the portable (md5) vs fast (xxhash64) simhash near-dup paths at
$SPARK_GRAFT_SF_DIR stage by stage, and prints the block-bucket-size
histogram for each so a hot-bucket (quadratic in-bucket pairing) cause
is distinguishable from a raw hash-CPU cause.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hermes_spark.operators.dedup import simhash_fingerprints, simhash_near_dup_pairs

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.driver.memory", "16g")
        .appName("diag_simhash")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.write.mode("overwrite").format("noop").save()  # warm IO

    for portable in (True, False):
        tag = "portable(md5)" if portable else "fast(xxhash64)"

        t0 = time.time()
        fps = simhash_fingerprints(docs, "doc_id", "text", portable=portable)
        fps.write.mode("overwrite").format("noop").save()
        t_fp = time.time() - t0

        # bucket histogram: same blocking as simhash_near_dup_pairs
        bits, block_bits, max_hamming = 32, 8, 3
        n_blocks = max(max_hamming + 1, bits // block_bits)
        width = bits // n_blocks
        bucketed = fps.select(
            "id",
            F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1))).alias("__blk"),
            "simhash",
        ).select(
            F.concat_ws(
                "_",
                F.col("__blk").cast("string"),
                F.expr(f"shiftright(simhash, __blk * {width})")
                .bitwiseAND(F.lit((1 << width) - 1))
                .cast("string"),
            ).alias("__k")
        )
        hist = (
            bucketed.groupBy("__k").count()
            .groupBy().agg(
                F.count("*").alias("buckets"),
                F.max("count").alias("max_bucket"),
                F.expr("percentile_approx(count, 0.99)").alias("p99"),
                F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("total_pairs"),
            )
            .collect()[0]
        )

        t0 = time.time()
        pairs = simhash_near_dup_pairs(docs, "doc_id", "text", portable=portable)
        pairs.write.mode("overwrite").format("noop").save()
        t_pairs = time.time() - t0

        print(
            f"{tag}: fingerprints={t_fp:.2f}s  near_dups={t_pairs:.2f}s  "
            f"buckets={hist['buckets']}  max_bucket={hist['max_bucket']}  "
            f"p99={hist['p99']}  in-bucket pairs={int(hist['total_pairs'])}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

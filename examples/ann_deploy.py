"""ANN deployment example: build an IVF+SQ8 index, TUNE it to a recall
target with measurements (not guesses), then serve a query batch with
the two-stage rescore path.

The round-6 workflow this demonstrates:

  1. fit coarse centroids on a sample (`kmeans_centroids`) and compute
     the scalar-quantization stats once (`sq8_stats`) — the "index";
  2. `pick_nprobe`: measure recall@k on a held-out query sample against
     brute-force ground truth, walking nprobe up a doubling schedule
     until the target is met — and LOG the curve, because its shape
     says whether nprobe, the shortlist, or the quantizer is the
     bottleneck;
  3. serve with `ivf_sq8_rescore_topk` at the tuned nprobe: the scan
     stage reads 4x-smaller int8 codes and prunes by cell, the rescore
     touches only |queries| x shortlist float vectors and returns
     exact cosines.

Usage (from the repo root):

    python examples/ann_deploy.py [sf_dir] [target_recall]

Default sf_dir=/root/testdata/sf0.001, target 0.9.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    target = float(sys.argv[2]) if len(sys.argv) > 2 else 0.9

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("ann-deploy")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hermes_spark.operators import (
        ivf_sq8_rescore_topk,
        kmeans_centroids,
        pick_nprobe,
    )
    from hermes_spark.operators.quantize import sq8_stats

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    n = emb.count()
    k_cells = max(4, min(64, n // 100))
    print(f"corpus: {n} vectors x {dim} dims -> {k_cells} IVF cells")

    # 1. index build
    cents = kmeans_centroids(emb, k=k_cells, dim=dim, max_iter=4).localCheckpoint()
    stats = sq8_stats(emb, "embedding", dim).localCheckpoint()

    # 2. tune nprobe empirically on a held-out sample
    sample = emb.filter(F.col("vec_id") % max(n // 8, 1) == 3)
    nprobe, curve = pick_nprobe(
        emb, cents, sample, target_recall=target, k=10, shortlist=50, dim=dim,
        stats=stats,
    )
    print(f"tuned nprobe={nprobe} for recall>={target}:")
    for point in curve:
        print(f"  nprobe {point['nprobe']:>3}: recall@10 {point['recall']:.3f}")

    # 3. serve a query batch at the tuned setting
    queries = emb.filter(F.col("vec_id") % 97 == 11)
    hits = ivf_sq8_rescore_topk(
        emb, cents, queries, k=5, shortlist=50, nprobe=nprobe, dim=dim,
        stats=stats,
    )
    print("sample results (exact cosines from the rescore stage):")
    hits.filter(F.col("rank") <= 2).orderBy("query_id", "rank").show(10)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

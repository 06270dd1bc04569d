"""Source-triage example: decide WHERE curation effort goes before
spending any of it.

Composes the round-5 triage operators into the pre-curation report a
crawl pipeline runs first:

  1. per-source duplicate-rate report (token-bag fingerprints) — which
     sources are pasting the same content around;
  2. distribution drift (PSI) of document length vs a baseline slice —
     has the crawl's shape changed since the corpus the gates were
     tuned on;
  3. per-source contribution caps + per-stratum quality gate — the two
     cheap interventions, applied and accounted;
  4. deterministic training order for what survives — the loader-ready
     (shard, pos) assignment.

Usage (from the repo root):

    python examples/triage_sources.py [sf_dir]

Default sf_dir=/root/testdata/sf0.001.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hermes_spark.functions.text import bag_fingerprint
from hermes_spark.operators import (
    cap_per_group,
    percentile_gate,
    psi_report,
    training_order,
)


def triage(spark: SparkSession, sf_dir: str) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. who is duplicating content (order/repetition-blind key)
    dup_report = (
        docs.select("source", bag_fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            F.round(F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 4).alias(
                "dup_rate"
            ),
        )
        .orderBy(F.col("dup_rate").desc())
    )
    print("most-duplicating sources:")
    dup_report.show(5, truncate=False)

    # 2. length-distribution drift: first half of sources (by hash) as
    # the "tuned-on" baseline vs the rest — in production this is
    # last-month's corpus vs this week's crawl
    left = docs.filter(F.crc32(F.col("source")) % 2 == 0)
    right = docs.filter(F.crc32(F.col("source")) % 2 == 1)
    psi = psi_report(left, right, "n_chars", bins=10)
    total_psi = psi.agg(F.round(F.sum("psi_term"), 4).alias("psi")).collect()[0][
        "psi"
    ]
    print(f"length-distribution PSI between slices: {total_psi}"
          f"  ({'investigate' if total_psi and total_psi > 0.2 else 'stable'})")

    # 3. interventions: cap each source, then keep its longest 50%
    capped = cap_per_group(docs, "doc_id", "source", cap=15)
    gated = percentile_gate(capped, "source", "n_chars", 0.5, key_col="doc_id")
    print(
        f"interventions: {docs.count()} docs -> cap 15/source -> "
        f"{capped.count()} -> top-50% length/source -> {gated.count()}"
    )

    # 4. loader-ready deterministic order for the survivors
    ordered = training_order(gated, "doc_id", num_shards=8)
    ordered.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos_in_shard").alias("max_pos")
    ).orderBy("shard").show()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("triage-sources")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    triage(spark, sf_dir)


if __name__ == "__main__":
    main()

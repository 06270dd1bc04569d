"""Continuous metrics example: a daily dashboard maintained from
mergeable states — counts/sums, distinct users, and tail latencies —
without ever rescanning history.

The round-6 workflow this demonstrates:

  1. each "day" batch folds into three parquet state stores:
     ``rollup_state`` (count/sum/min/max), ``hll_state`` (distinct
     users, register-wise max-merge), ``qdigest_state`` (latency
     quantile buckets, additive merge);
  2. the dashboard query reads ONLY the three small state tables:
     ``finalize_rollup`` + ``hll_estimate`` + ``qdigest_quantiles``
     joined per segment — no raw-event scan;
  3. day N's cost is O(batch + state), independent of N: the stores
     stay bounded (registers/buckets per group), which is what makes
     this the 100 TB shape for "metrics since launch" dashboards.

The same states also merge ACROSS pipelines (e.g. per-region stores →
global dashboard) because every merge is a plain groupBy aggregate.

Usage (from the repo root):

    python examples/continuous_metrics.py [days]

Default 4 synthetic days of events.
"""

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from hermes_spark.incremental import (
    finalize_rollup,
    merge_rollup_states,
    rollup_state,
)
from hermes_spark.operators import (
    hll_estimate,
    hll_merge,
    hll_state,
    qdigest_merge,
    qdigest_quantiles,
    qdigest_state,
)

GROUPS = ["segment"]
P = 12
QS = [0.5, 0.95, 0.99]


def day_batch(spark, day: int):
    """Deterministic synthetic events for one day: 3 segments, per-day
    user churn, log-normal-ish latency."""
    n = 200_000
    return spark.range(n).select(
        (F.col("id") % 3).cast("string").alias("segment"),
        # users drift day to day: each day introduces a new cohort
        ((F.col("id") * 7 + day * 40_000) % 130_000).alias("user_id"),
        (
            F.pow(F.lit(1.35), (F.xxhash64("id", F.lit(day)) % 20).cast("double"))
            + F.lit(float(day))
        ).alias("latency_ms"),
    )


def fold_day(spark, stores: dict, batch) -> None:
    """Merge one day's partial states into the persistent stores."""

    def fold(path, batch_state, merge):
        try:
            existing = spark.read.parquet(path)
            merged = merge(existing, batch_state)
        except Exception:
            merged = batch_state
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    fold(
        stores["rollup"],
        rollup_state(batch, GROUPS, "latency_ms"),
        lambda a, b: merge_rollup_states([a, b], GROUPS),
    )
    fold(
        stores["hll"],
        hll_state(batch, GROUPS, "user_id", p=P, portable=False),
        lambda a, b: hll_merge(GROUPS, a, b),
    )
    fold(
        stores["qdigest"],
        qdigest_state(batch, GROUPS, "latency_ms"),
        lambda a, b: qdigest_merge(GROUPS, a, b),
    )


def dashboard(spark, stores: dict):
    """The since-launch dashboard from states alone (no event scan)."""
    roll = finalize_rollup(spark.read.parquet(stores["rollup"]))
    dau = hll_estimate(spark.read.parquet(stores["hll"]), GROUPS, p=P).select(
        *GROUPS, F.col("distinct_est").alias("distinct_users_est")
    )
    lat = (
        qdigest_quantiles(spark.read.parquet(stores["qdigest"]), GROUPS, QS)
        .groupBy(*GROUPS)
        .pivot("q", [str(q) for q in map(float, QS)])
        .agg(F.first("est"))
        .select(
            *GROUPS,
            # backticks: a bare "0.5" would parse as field access 0.5
            F.col("`0.5`").alias("p50_ms"),
            F.col("`0.95`").alias("p95_ms"),
            F.col("`0.99`").alias("p99_ms"),
        )
    )
    return roll.join(dau, GROUPS).join(lat, GROUPS).orderBy(*GROUPS)


def main() -> int:
    days = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("continuous-metrics-example")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="continuous_metrics_")
    stores = {k: f"{root}/{k}" for k in ("rollup", "hll", "qdigest")}
    try:
        import time

        for day in range(days):
            t0 = time.time()
            fold_day(spark, stores, day_batch(spark, day))
            sizes = {
                k: spark.read.parquet(p).count() for k, p in stores.items()
            }
            print(
                f"day {day}: folded in {time.time()-t0:.1f}s; "
                f"state rows {sizes} (bounded — not growing with history)"
            )
        print("\nsince-launch dashboard (from states only):")
        dashboard(spark, stores).show(truncate=False)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

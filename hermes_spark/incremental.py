"""Incremental (partition-pruned) dataset comparison.

Extension beyond reference parity: the reference always diffs the full
inputs (``DatasetComparator.scala:65-113``). At 100 TB the typical
comparison is "yesterday's certified snapshot vs today's rerun" where
almost every partition is byte-identical — paying a full-data shuffle
for unchanged partitions is the difference between minutes and hours.

Two-phase plan:

1. **Digest pass** — one aggregation per side computes an
   order-insensitive per-partition digest ``(row_count,
   sum(xxhash64(row)))``. This reads every row once (unavoidable — any
   cheaper check needs a trusted manifest) but shuffles only one tiny
   row per partition. Digests are joined full-outer to classify each
   partition: unchanged / changed / ref_only / actual_only.
2. **Diff pass** — the full comparison kernel
   (:class:`~hermes_spark.comparator.DatasetComparator`) runs on the
   CHANGED partitions only. The partition filter is a broadcast
   semi-join on the partition column, so on partitioned parquet the
   scan prunes at the source (dynamic partition pruning) — unchanged
   data is not re-read, not shuffled, not joined.

Digest collision caveat: two different partitions collide when their
hash-sums AND counts both match — xxhash64 sums make that ~2^-64 per
partition pair; use a full compare for certification runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .comparator import DatasetComparator
from .config import ComparisonConfig, DEFAULT_CONFIG
from .result import ComparisonResult

#: partition digest statuses
UNCHANGED = "unchanged"
CHANGED = "changed"
REF_ONLY = "ref_only"
ACTUAL_ONLY = "actual_only"


def partition_digests(
    ref: DataFrame, actual: DataFrame, partition_col: str
) -> DataFrame:
    """Classify every partition value:
    ``(partition_col, ref_rows, actual_rows, status)``.

    The digest is order-insensitive (sum of row hashes) so it is stable
    under repartitioning and task scheduling; sums are DECIMAL(38,0) to
    stay exact and ANSI-overflow-safe.
    """

    def digest(df: DataFrame, rows: str, hsum: str) -> DataFrame:
        cols = [F.col(f"`{c}`") for c in df.columns]
        return df.groupBy(F.col(f"`{partition_col}`").alias("__p")).agg(
            F.count(F.lit(1)).alias(rows),
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias(hsum),
        )

    r = digest(ref, "ref_rows", "__rh")
    a = digest(actual, "actual_rows", "__ah")
    joined = r.join(a, on="__p", how="full")
    status = (
        F.when(F.col("ref_rows").isNull(), F.lit(ACTUAL_ONLY))
        .when(F.col("actual_rows").isNull(), F.lit(REF_ONLY))
        .when(
            (F.col("ref_rows") == F.col("actual_rows"))
            & F.col("__rh").eqNullSafe(F.col("__ah")),
            F.lit(UNCHANGED),
        )
        .otherwise(F.lit(CHANGED))
    )
    return joined.select(
        F.col("__p").alias(partition_col),
        F.coalesce("ref_rows", F.lit(0)).alias("ref_rows"),
        F.coalesce("actual_rows", F.lit(0)).alias("actual_rows"),
        status.alias("status"),
    )


@dataclass
class IncrementalResult:
    """Digest classification plus the diff of non-unchanged partitions.

    ``result`` is None when every partition digest matched (nothing was
    re-compared). ``digests`` is small (one row per partition value) and
    already collected.
    """

    partition_col: str
    digests: list = field(default_factory=list)
    result: Optional[ComparisonResult] = None

    @property
    def changed_partitions(self) -> list:
        return [
            r[self.partition_col]
            for r in self.digests
            if r["status"] != UNCHANGED
        ]

    @property
    def passed(self) -> bool:
        if not all(r["status"] == UNCHANGED for r in self.digests):
            return self.result is not None and self.result.passed
        return True


def incremental_compare(
    ref: DataFrame,
    actual: DataFrame,
    partition_col: str,
    keys: Sequence[str] = (),
    config: ComparisonConfig = DEFAULT_CONFIG,
) -> IncrementalResult:
    """Compare only the partitions whose digests differ.

    Returns :class:`IncrementalResult`; its ``result`` holds the usual
    :class:`ComparisonResult` restricted to changed/one-sided
    partitions (None when all digests matched). Call pattern mirrors
    :func:`hermes_spark.compare`.
    """
    digests = partition_digests(ref, actual, partition_col).collect()
    changed = [
        r[partition_col] for r in digests if r["status"] != UNCHANGED
    ]
    if not changed:
        return IncrementalResult(partition_col, digests, None)

    spark = ref.sparkSession
    changed_df = F.broadcast(
        spark.createDataFrame(
            [(v,) for v in changed], [partition_col]
        )
    )
    ref_changed = ref.join(changed_df, on=partition_col, how="left_semi")
    actual_changed = actual.join(changed_df, on=partition_col, how="left_semi")
    comparator = DatasetComparator(
        ref_changed, actual_changed, keys=keys, config=config
    )
    return IncrementalResult(partition_col, digests, comparator.compare())


def probe_compare(
    ref: DataFrame,
    actual: DataFrame,
    keys: Sequence[str],
    fraction: float = 0.01,
    config: ComparisonConfig = DEFAULT_CONFIG,
) -> dict:
    """Sampled pre-check before a full certification run: compare a
    deterministic ~``fraction`` key slice of both sides and extrapolate
    the drift rate.

    The slice is hash-based (``xxhash64(keys) % 10^6``), so BOTH sides
    keep exactly the same keys — unlike ``DataFrame.sample`` this never
    produces one-sided rows, and the probe's diff rate is an unbiased
    estimate of the keyed diff rate. Costs one scan of each side plus a
    compare over ~fraction of the data; at 100 TB a 1% probe answers
    "is this rerun even close?" ~100x cheaper than certifying.

    Returns ``{sampled_ref_rows, sampled_actual_rows, sampled_diff,
    est_diff_rate, result}`` where ``result`` is the probe's
    :class:`ComparisonResult`.
    """
    if not keys:
        raise ValueError("probe_compare requires explicit keys")
    threshold = int(fraction * 1_000_000)

    def slice_side(df: DataFrame) -> DataFrame:
        h = F.pmod(
            F.xxhash64(*[F.col(k).cast("string") for k in keys]),
            F.lit(1_000_000),
        )
        return df.filter(h < threshold)

    ref_s, act_s = slice_side(ref), slice_side(actual)
    comparator = DatasetComparator(ref_s, act_s, keys=keys, config=config)
    result = comparator.compare()
    sampled = max(result.ref_row_count, 1)
    out = {
        "sampled_ref_rows": result.ref_row_count,
        "sampled_actual_rows": result.new_row_count,
        "sampled_diff": result.diff_count,
        "est_diff_rate": result.diff_count / sampled,
        "result": result,
    }
    comparator.release()
    return out


# ---------------------------------------------------------------------------
# mergeable rollup state (incremental aggregate maintenance)
# ---------------------------------------------------------------------------
#
# The comparison helpers above answer "did anything change"; these
# maintain a keyed rollup WITHOUT rescanning history: keep a mergeable
# state per key (count/sum/min/max are all associative+commutative),
# aggregate only the new batch, and merge.  At 100 TB the saved state is
# keys-sized while the history stays untouched — the same partial-
# aggregate algebra Spark uses map-side, lifted to cross-run persistence.


def rollup_state(df: DataFrame, keys: Sequence[str], value_col: str) -> DataFrame:
    """Mergeable per-key aggregate state ``(keys, n, sum_v, min_v,
    max_v)`` of ``value_col`` (``n`` counts non-null values, matching
    SQL ``avg`` semantics at finalize time)."""
    return df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.col(value_col)).alias("n"),
        F.sum(F.col(value_col)).alias("sum_v"),
        F.min(F.col(value_col)).alias("min_v"),
        F.max(F.col(value_col)).alias("max_v"),
    )


def merge_rollup_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Merge any number of :func:`rollup_state` frames into one: counts
    and sums add, mins/maxs fold — associativity is what makes the
    incremental path exact, not approximate."""
    if not states:
        raise ValueError("states must be non-empty")
    combined = states[0]
    for s in states[1:]:
        combined = combined.unionByName(s)
    return combined.groupBy(*[F.col(k) for k in keys]).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_rollup(state: DataFrame, decimals: int = 4) -> DataFrame:
    """Derive the non-mergeable outputs from a rollup state: the rounded
    sum as ``sum_v_rounded`` and the rounded mean as ``avg_v``. The raw
    ``sum_v`` is kept UNROUNDED so the frame can keep serving as state —
    feeding a finalized frame back into :func:`merge_rollup_states` must
    not accumulate rounding drift (rounding in place would break the
    exactness guarantee this module advertises)."""
    return state.select(
        *state.columns,
        F.round(F.col("sum_v"), decimals).alias("sum_v_rounded"),
        F.round(F.col("sum_v") / F.col("n"), decimals).alias("avg_v"),
    )

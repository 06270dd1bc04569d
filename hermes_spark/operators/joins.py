"""Scale-join utilities: skew salting and bucketed co-located joins.

Extensions (the reference's only joins are the two diff joins,
SURVEY.md §2.3); these are the patterns a 100 TB pipeline reaches for
when AQE's automatic handling isn't enough:

- :func:`salted_join` — explicit key salting for joins where one key
  dominates (AQE's skew-join split only kicks in for sort-merge joins
  above thresholds, and can't help a broadcast-ineligible skewed hash
  join).
- :func:`write_bucketed` / :func:`read_bucketed` — persist both sides
  bucketed by the join key so repeated joins are exchange-free (classic
  fact/fact co-location; verified by plan in tests).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    num_salts: int = 16,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``num_salts``
    partitions.

    The left side gets a random-ish (hash-derived, deterministic) salt;
    the right side is replicated once per salt value, and the join key
    becomes ``on + [salt]``. Each left row joins exactly once. Use when
    the LEFT side is large and skewed on ``on`` and the right side is
    small enough that ``num_salts``-fold replication is acceptable
    (dimension-ish, but above the broadcast threshold).
    """
    on = list(on)
    salt = "__hermes_salt"
    left_salted = left.withColumn(
        salt, F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    )
    right_salted = right.withColumn(
        salt, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return left_salted.join(right_salted, on=on + [salt], how=how).drop(salt)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join: each point row matched with every interval
    row where ``start <= ts < end`` (and the ``by`` keys agree).

    Without help Spark plans this as BroadcastNestedLoopJoin (quadratic)
    or an equi-join only on ``by`` (one partition per key doing the full
    per-key cross product). Bucketizing fixes both: each point lands in
    one ``bucket_seconds``-wide bucket, each interval replicates into
    every bucket it covers, and the join becomes an equi-join on
    ``by + bucket`` followed by the exact range filter. Each (point,
    interval) pair meets in exactly one bucket (the point's), so no
    dedup pass is needed. Shuffle volume: points once, intervals ×
    (average interval length / bucket width) — pick ``bucket_seconds``
    near the typical interval length.
    """
    on = list(by)
    bucket = "__hermes_range_bucket"
    p = points.withColumn(
        bucket,
        F.floor(F.col(ts_col).cast("double") / F.lit(bucket_seconds)).cast("long"),
    )
    i = intervals.withColumn(
        bucket,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / F.lit(bucket_seconds)).cast(
                    "long"
                ),
                F.floor(F.col(end_col).cast("double") / F.lit(bucket_seconds)).cast(
                    "long"
                ),
            )
        ),
    )
    return (
        p.join(i, on=on + [bucket])
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop(bucket)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Two tables bucketed identically on the join key join WITHOUT a
    shuffle — the scan partitioning already satisfies the join's
    distribution requirement. This is the preparation step you amortize
    across many downstream joins of the same big tables.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

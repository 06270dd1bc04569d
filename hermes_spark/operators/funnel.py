"""Event-sequence analytics: funnels and cohort retention.

Extension surface (no counterpart in the reference — its events exist
only as comparison inputs); these are the standard product-analytics
operators a query engine over an events table is expected to ship.

Scale design (100 TB of events):

* ``cohort_retention`` — two keyed aggregations: (user -> cohort) then
  ((cohort, offset) -> distinct users).  The first shuffle carries
  (user, ts-trunc) pairs, the second carries one row per (user, period)
  — both narrow.  No windows, no self-joins.
* ``funnel_counts`` — per-user ordered step matching WITHOUT collecting
  event arrays: step k's reach time is ``min(ts) where type = step_k and
  ts > reach_{k-1}``, computed as one conditional aggregation per step
  over the same user-keyed shuffle.  len(steps) passes over a frame
  that holds only (user, ts, type) — the events table's other columns
  are pruned at the scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRANULARITIES = {"day": 86400, "week": 604800}


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    granularity: str = "week",
) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity period
    (cohort), counted per activity-period offset.

    Returns ``(cohort, period_offset, n_users)`` — ``n_users`` distinct
    users from ``cohort`` active ``period_offset`` periods after their
    first activity (offset 0 = the cohort period itself).
    """
    if granularity not in _GRANULARITIES:
        raise ValueError(f"granularity must be one of {sorted(_GRANULARITIES)}")
    secs = _GRANULARITIES[granularity]
    # integer period index: epoch seconds // period length (timezone-free,
    # engine-portable; date_trunc('week') anchors differ across engines).
    # timestamp_ntz can't cast straight to long — hop through timestamp
    # (the UTC session makes the naive reading unambiguous).
    period = (F.col(ts_col).cast("timestamp").cast("long") / secs).cast("long")
    activity = df.select(
        F.col(user_col).alias("user"), period.alias("period")
    ).distinct()
    cohorts = activity.groupBy("user").agg(F.min("period").alias("cohort_period"))
    return (
        activity.join(cohorts, on="user")
        .groupBy(
            F.col("cohort_period").alias("cohort"),
            (F.col("period") - F.col("cohort_period")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel reach counts: how many users performed ``steps`` in
    order (strictly increasing timestamps).

    Returns one row per step: ``(step_index, step, n_users)`` with
    ``n_users`` = users whose events contain the first ``step_index + 1``
    steps as a time-ordered subsequence.  Greedy earliest-match is
    optimal for subsequence containment, so each step needs only the
    min matching timestamp after the previous step's match.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    # only the funnel's own event types matter — the IN filter pushes to
    # the scan, so a 3-step funnel over a 100-type events table reads a
    # fraction of the rows into every later aggregation
    events = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(list(steps)))
    reach_cols = []
    for i, step in enumerate(steps):
        if i == 0:
            cond = F.col("etype") == step
        else:
            prev = F.col(f"__r{i - 1}")
            cond = (F.col("etype") == step) & prev.isNotNull() & (F.col("ts") > prev)
        reach_cols.append(F.min(F.when(cond, F.col("ts"))).alias(f"__r{i}"))

    # one user-keyed aggregation per step: step i's condition depends on
    # step i-1's reach time, so fold left over len(steps) aggregations,
    # each on the (small) per-user frame after the first
    per_user = events.groupBy("user").agg(reach_cols[0])
    for i in range(1, len(steps)):
        per_user = (
            events.join(per_user, on="user")
            .groupBy("user", *[f"__r{j}" for j in range(i)])
            .agg(reach_cols[i])
        )

    counts = per_user.agg(
        *[
            F.sum(F.when(F.col(f"__r{i}").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("step_index"),
                F.lit(step).alias("step"),
                F.col(f"__n{i}").alias("n_users"),
            )
            for i, step in enumerate(steps)
        ]
    )
    return (
        counts.select(F.explode(rows).alias("__s"))
        .select("__s.step_index", "__s.step", "__s.n_users")
    )

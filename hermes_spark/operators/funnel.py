"""Event-sequence analytics: funnels and cohort retention.

Extension surface (no counterpart in the reference — its events exist
only as comparison inputs); these are the standard product-analytics
operators a query engine over an events table is expected to ship.

Scale design (100 TB of events):

* ``cohort_retention`` — one distinct pass, one user-keyed window for
  the cohort, one keyed aggregation.  Shuffles carry only
  (user, period) pairs — narrow.  No self-joins.
* ``funnel_counts`` — ONE user-keyed shuffle for any number of steps:
  each user's funnel-typed events are gathered into a time-sorted
  array and the greedy earliest-match reach times come from a single
  ``aggregate()`` fold over that array (greedy earliest-match is
  optimal for subsequence containment).  The trade: per-user memory is
  O(funnel-typed events of that user).  The IN-filter on the step
  types pushes to the scan, so only funnel-relevant rows are gathered
  — a 3-step funnel over a 100-type events table shuffles a fraction
  of the table; a pathological user would need millions of events *of
  the funnel's own types* to matter.  (The previous implementation
  re-joined the events frame once per step — k−1 extra shuffles for a
  k-step funnel; at 100 TB with a 6-step funnel that is 5 extra passes
  over the filtered events.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
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
    # integer period index: floor(epoch seconds / period length)
    # (timezone-free, engine-portable; date_trunc('week') anchors differ
    # across engines).  floor, not cast — cast truncates toward zero, so
    # pre-1970 timestamps would round the wrong way vs a SQL `//` oracle.
    # timestamp_ntz can't cast straight to long — hop through timestamp
    # (the UTC session makes the naive reading unambiguous).
    period = F.floor(F.col(ts_col).cast("timestamp").cast("long") / secs).cast("long")
    activity = df.select(
        F.col(user_col).alias("user"), period.alias("period")
    ).distinct()
    # cohort via a user-keyed window on the distinct activity frame —
    # one shuffle; the groupBy(user)+re-join shape costs an extra join
    cohort = F.min("period").over(Window.partitionBy("user"))
    return (
        activity.withColumn("cohort_period", cohort)
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
    optimal for subsequence containment: one forward pass over each
    user's time-sorted events assigns every step its earliest reach
    time after the previous step's reach.

    Single shuffle for any k: ``groupBy(user)`` gathers the (scan-
    filtered) funnel events as a sorted array, and an ``aggregate()``
    fold computes all k reach times in-task (see module docstring for
    the per-user memory trade).
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)
    # only the funnel's own event types matter — the IN filter pushes to
    # the scan, so a 3-step funnel over a 100-type events table reads a
    # fraction of the rows into the single aggregation
    events = df.select(
        F.col(user_col).alias("user"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("etype"),
    ).filter(F.col("etype").isin(list(steps)))

    steps_arr = F.array(*[F.lit(s) for s in steps])

    # fold state: array<timestamp> of length k, reach[i] = earliest time
    # step i completed (null = unreached).  For each event in time
    # order, step i fires iff unreached, etype matches, and (i == 0 or
    # step i-1 was reached strictly earlier).  The transform reads the
    # PRE-update state, so one event never satisfies two steps — which
    # is also what strict ts ordering requires.
    init = F.array_repeat(F.lit(None).cast("timestamp"), k)

    def step_fold(acc, ev):
        return F.transform(
            acc,
            lambda r, i: F.coalesce(
                r,
                F.when(
                    (ev["etype"] == F.element_at(steps_arr, i + 1))
                    & (
                        (i == F.lit(0))
                        | (
                            F.element_at(acc, i).isNotNull()
                            & (ev["ts"] > F.element_at(acc, i))
                        )
                    ),
                    ev["ts"],
                ),
            ),
        )

    per_user = events.groupBy("user").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("ts", "etype"))),
            init,
            step_fold,
        ).alias("__reach")
    )

    counts = per_user.agg(
        *[
            F.sum(
                F.when(F.element_at(F.col("__reach"), i + 1).isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"__n{i}")
            for i in range(k)
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

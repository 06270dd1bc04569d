"""Batch sessionization: gap-based sessions via window functions.

Extension operator (nothing comparable in the reference; sorts/windows
are absent there, SURVEY.md §2.6). The classic lag/flag/cumsum plan:

1. ``lag(ts)`` per user (one shuffle on ``user_id``);
2. new-session flag where the gap exceeds the timeout;
3. running sum of flags = session index;
4. aggregate per (user, session index).

Scale notes: steps 1–3 share ONE window partitioning (``user_id``) so
Catalyst runs them in a single exchange + sort; step 4 re-uses the same
hash partitioning, so the whole operator is one shuffle end-to-end.
Skewed users (bots) are the hazard — mitigate upstream by capping
events per user per day, or salt the window with a date bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Sessions ``(user_id, session_start, session_end, n_events)`` where
    consecutive events of a user more than ``gap_seconds`` apart start a
    new session."""
    events = df.select(
        F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts")
    )
    by_user = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts")).over(by_user).cast("double")
    flagged = events.select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0).alias("__new"),
    )
    with_session = flagged.withColumn(
        "session_idx",
        F.sum("__new").over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_session.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_idx")
        .select("user_id", "session_start", "session_end", "n_events")
    )


def collapse_runs(
    df: DataFrame,
    key_col: str = "user_id",
    order_cols: tuple = ("ts", "event_id"),
    value_col: str = "event_type",
    count_runs: bool = True,
) -> DataFrame:
    """Run-length collapse: within each key's ordered event stream, keep
    only the FIRST event of every run of consecutive equal values.

    The event-stream de-noising step (double-clicks, repeated sensor
    readings, retry storms): unlike a keyed ``dropDuplicates`` this
    preserves re-occurrences that are separated by something else —
    A A B A collapses to A B A, not A B.

    ``order_cols`` must be a deterministic total order per key (pass a
    unique id as the tiebreak — equal timestamps otherwise make run
    boundaries engine-dependent). ``count_runs=True`` appends
    ``run_length`` (how many rows the kept event absorbed).

    Scale: one shuffle on ``key_col``; the lag, the boundary flag, and
    (for run lengths) the running count all reuse that single window
    partitioning, so Catalyst plans one exchange + one sort end-to-end.
    """
    order = [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(F.col(key_col)).orderBy(*order)
    flagged = df.withColumn(
        "__new_run",
        F.when(
            F.lag(F.col(value_col)).over(w).isNull()
            | (F.lag(F.col(value_col)).over(w) != F.col(value_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    if not count_runs:
        return flagged.filter(F.col("__new_run") == 1).drop("__new_run")
    # Run length WITHOUT a self-join: a run spans from its boundary row
    # to just before the NEXT boundary, so length = lead(rn) - rn over
    # the boundary rows only (last run: per-key total + 1 - rn). The
    # filter preserves the user partitioning AND sort, so the post-
    # filter lead window adds no exchange — one shuffle end-to-end.
    numbered = flagged.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__total",
        F.count(F.lit(1)).over(Window.partitionBy(F.col(key_col))),
    )
    boundaries = numbered.filter(F.col("__new_run") == 1)
    wb = Window.partitionBy(F.col(key_col)).orderBy(F.col("__rn").asc())
    return (
        boundaries.withColumn(
            "run_length",
            (
                F.coalesce(F.lead("__rn").over(wb), F.col("__total") + 1)
                - F.col("__rn")
            ).cast("long"),
        )
        .drop("__new_run", "__rn", "__total")
    )

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

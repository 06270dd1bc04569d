"""As-of (backward temporal) join.

Spark has no native as-of join (an operator the reference also lacks —
SURVEY.md §2.3 notes no theta/range/as-of joins anywhere). The naive
formulations are range-join (cross-join + filter: quadratic) or
per-key collect (memory-bound). This is the scalable shape:

1. tag both sides and union them (``unionByName`` fills the other
   side's columns with nulls);
2. one window over ``by`` keys ordered by ``(ts, side)`` with the right
   side sorting FIRST at equal timestamps (so a right row effective at
   exactly the left row's timestamp matches, DuckDB ``ASOF JOIN``
   ``>=`` semantics);
3. ``last(value, ignorenulls=True)`` carries the most recent right-side
   values forward onto each left row;
4. keep only left rows.

Cost: ONE shuffle (the window partitioning) over rows ∝ |left|+|right|,
no row multiplication — survives a 100× scale-up where a range join
explodes. Skewed ``by`` keys are the hazard (same mitigation as any
window: pre-bucket hot keys by coarse time range).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: Sequence[str] = (),
    right_ts_col: Optional[str] = None,
) -> DataFrame:
    """For every left row, attach the right row's value columns with the
    greatest ``right_ts`` <= the left row's ``ts`` within the same
    ``by`` group (null when no prior right row exists — left-join
    semantics).

    Right value columns must not collide with left column names.
    """
    by = list(by)
    rts = right_ts_col or ts_col
    value_cols = [c for c in right.columns if c not in set(by) | {rts}]
    collisions = set(value_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right value columns collide with left columns: {sorted(collisions)}"
        )

    side = "__hermes_asof_side"
    prepared_right = right.select(
        *by, F.col(rts).alias(ts_col), *value_cols
    ).withColumn(side, F.lit(0))
    combined = left.withColumn(side, F.lit(1)).unionByName(
        prepared_right, allowMissingColumns=True
    )

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col), F.col(side))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = combined.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in value_cols
        ],
    )
    return (
        filled.filter(F.col(side) == 1)
        .select(
            *left.columns,
            *[F.col(f"__f_{c}").alias(c) for c in value_cols],
        )
    )

"""Change-data-capture / warehouse maintenance operators.

Extension surface (the reference compares snapshots; these produce the
snapshots): compacting a change stream to current state, and building
SCD2 (slowly-changing-dimension type 2) validity intervals from a
change log.  Both are one window over the key — the canonical
scale-safe shape for keyed history (no self-joins, no collects).

Scale notes (100 TB):

* ``latest_by_key`` — one hash-partitioned window; with billions of
  keys the shuffle is the unavoidable key re-partition and nothing
  else.  Deletes are dropped AFTER picking the latest row so a delete
  followed by re-insert resolves correctly.
* ``scd2_history`` — same single window; ``valid_to`` is the next
  change's timestamp (``lead``), open rows carry null.  Append-only
  friendly: re-running over a grown log only extends intervals.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    op_col: Optional[str] = None,
    delete_value: str = "D",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Compact a change log to current state: one row per key — the one
    with the greatest ``order_col`` (ties broken by ``tiebreak`` columns,
    then arbitrarily-but-deterministically by the remaining row).

    When ``op_col`` is given, rows whose final operation equals
    ``delete_value`` are dropped AFTER selection, so the newest change
    wins even when it is a delete (CDC upsert semantics).
    """
    # remaining non-key columns close the order so the kept row is
    # deterministic even when (order_col, tiebreak) leaves ties — without
    # this the winner depends on partitioning/run order
    claimed = set(keys) | {order_col} | set(tiebreak)
    rest = [c for c in df.columns if c not in claimed]
    order = (
        [F.col(order_col).desc()]
        + [F.col(c).desc() for c in tiebreak]
        + [F.col(c).desc() for c in rest]
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if op_col is not None:
        out = out.filter(F.col(op_col) != delete_value)
    return out


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    current_flag: str = "is_current",
) -> DataFrame:
    """Build SCD2 validity intervals from a change log: every change row
    becomes a version with ``valid_from`` (its own timestamp),
    ``valid_to`` (the key's next change, null while open) and a current
    flag.

    Equal-timestamp changes for one key are collapsed to the last one
    (deterministic: greatest remaining column order) so intervals never
    have zero width.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(ts_col).asc())
    # collapse same-timestamp duplicates first (keep one per (key, ts))
    # when keys + ts are the only columns the tied rows are fully
    # identical, so any pick is the same content — but orderBy() needs at
    # least one expression
    rest = [c for c in df.columns if c not in keys and c != ts_col]
    dedup_order = (
        [F.col(c).desc() for c in rest] if rest else [F.lit(1)]
    )
    dedup_w = Window.partitionBy(
        *[F.col(k) for k in keys], F.col(ts_col)
    ).orderBy(*dedup_order)
    collapsed = (
        df.withColumn("__rn", F.row_number().over(dedup_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return (
        collapsed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
        .withColumn(current_flag, F.col("valid_to").isNull())
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    keys: Sequence[str],
    fact_ts: str,
    valid_from: str = "valid_from",
    drop_cols: Sequence[str] = ("valid_to", "is_current"),
) -> DataFrame:
    """Temporal dimension lookup: attach to every fact row the dimension
    version (from an SCD2 ``history``, see :func:`scd2_history`) whose
    validity interval contains the fact's timestamp; facts before the
    key's first version get nulls.

    Because SCD2 intervals partition each key's timeline, "the interval
    containing ts" is exactly "the greatest ``valid_from`` <= ts" — so
    this delegates to the single-shuffle union+window as-of join instead
    of an interval range join: rows ∝ |facts| + |history|, no
    interval replication, no BETWEEN filter pass. ``drop_cols`` removes
    history bookkeeping columns from the attached payload (set it to ()
    to keep them).
    """
    from .asof import asof_join

    dim = history.drop(*drop_cols)
    return asof_join(facts, dim, ts_col=fact_ts, by=list(keys), right_ts_col=valid_from)

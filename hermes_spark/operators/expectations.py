"""Declarative data-quality expectations (single-scan rule checking).

Extension (the reference validates datasets by full comparison against a
reference frame; these are the standing assertions a pipeline runs when
there IS no reference): not-null, uniqueness, value-range, regex,
membership, and referential-integrity rules evaluated into one metrics
report — the deequ/"expectations" pattern, Spark-first.

Scale design:

- Every aggregate rule (not_null / unique / in_range / matches / isin)
  compiles into ONE ``agg`` over the frame — a single scan with
  map-side partial aggregation, regardless of rule count. The metrics
  row is then exploded into one row per rule (array-of-structs, no
  second scan).
- ``ref_integrity`` rules need a join by nature: each one runs a
  left-anti count against the (deduplicated, broadcast-hinted) key set
  of the referenced frame. Null foreign keys are skipped — pair with a
  ``not_null`` rule when nulls are themselves violations.
- The one-row metrics frame is ``localCheckpoint``-ed before fan-out so
  attaching the total row count to ref-rule branches does not rescan
  the input.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "check_expectations"]


@dataclass(frozen=True)
class Rule:
    """One expectation. Use the class-method constructors."""

    name: str
    kind: str
    column: str
    max_rate: float = 0.0
    lo: Optional[float] = None
    hi: Optional[float] = None
    pattern: Optional[str] = None
    values: tuple = ()
    ref: Optional[DataFrame] = field(default=None, compare=False)
    ref_column: Optional[str] = None

    @classmethod
    def not_null(cls, name: str, column: str, max_rate: float = 0.0) -> "Rule":
        return cls(name, "not_null", column, max_rate)

    @classmethod
    def unique(cls, name: str, column: str, max_rate: float = 0.0) -> "Rule":
        """Duplicate rows among non-null values (count - count distinct)."""
        return cls(name, "unique", column, max_rate)

    @classmethod
    def in_range(
        cls, name: str, column: str, lo: float, hi: float, max_rate: float = 0.0
    ) -> "Rule":
        """Non-null values outside [lo, hi] are violations."""
        return cls(name, "in_range", column, max_rate, lo=lo, hi=hi)

    @classmethod
    def matches(
        cls, name: str, column: str, pattern: str, max_rate: float = 0.0
    ) -> "Rule":
        """Non-null values NOT fully matching ``pattern`` are violations."""
        return cls(name, "matches", column, max_rate, pattern=pattern)

    @classmethod
    def isin(
        cls, name: str, column: str, values: Sequence, max_rate: float = 0.0
    ) -> "Rule":
        return cls(name, "isin", column, max_rate, values=tuple(values))

    @classmethod
    def ref_integrity(
        cls,
        name: str,
        column: str,
        ref: DataFrame,
        ref_column: str,
        max_rate: float = 0.0,
    ) -> "Rule":
        """Non-null values absent from ``ref[ref_column]`` are violations."""
        return cls(name, "ref_integrity", column, max_rate, ref=ref, ref_column=ref_column)


def _violation_expr(rule: Rule) -> F.Column:
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0))
    if rule.kind == "unique":
        return F.count(c) - F.count_distinct(c)
    if rule.kind == "in_range":
        bad = c.isNotNull() & ((c < F.lit(rule.lo)) | (c > F.lit(rule.hi)))
        return F.sum(F.when(bad, 1).otherwise(0))
    if rule.kind == "matches":
        # rlike() is substring search; anchor so "fully matching" (the
        # documented contract) holds — '[0-9]+' must reject 'abc123'.
        bad = c.isNotNull() & ~c.rlike(f"^(?:{rule.pattern})$")
        return F.sum(F.when(bad, 1).otherwise(0))
    if rule.kind == "isin":
        bad = c.isNotNull() & ~c.isin(list(rule.values))
        return F.sum(F.when(bad, 1).otherwise(0))
    raise ValueError(f"unknown aggregate rule kind {rule.kind!r}")


def check_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    ``(rule, kind, col, n_rows, n_violations, violation_rate, passed)``
    with the rate rounded to 6 dp and ``passed = rate <= max_rate``
    (on the rounded rate, so verdicts are reproducible across engines).
    """
    rules = list(rules)
    if not rules:
        raise ValueError("rules must be non-empty")
    agg_rules = [r for r in rules if r.kind != "ref_integrity"]
    ref_rules = [r for r in rules if r.kind == "ref_integrity"]

    aggs = [F.count(F.lit(1)).alias("__n")] + [
        _violation_expr(r).cast("long").alias(f"__m_{i}")
        for i, r in enumerate(agg_rules)
    ]
    metrics = df.agg(*aggs).localCheckpoint(eager=True)

    def finish(frame: DataFrame, rule: Rule) -> DataFrame:
        rate = F.round(
            F.when(F.col("n_rows") > 0,
                   F.col("n_violations").cast("double") / F.col("n_rows"))
            .otherwise(F.lit(0.0)),
            6,
        )
        return frame.select(
            F.lit(rule.name).alias("rule"),
            F.lit(rule.kind).alias("kind"),
            F.lit(rule.column).alias("col"),
            "n_rows",
            "n_violations",
            rate.alias("violation_rate"),
            (rate <= F.lit(rule.max_rate)).alias("passed"),
        )

    parts = []
    for i, r in enumerate(agg_rules):
        parts.append(
            finish(
                metrics.select(
                    F.col("__n").alias("n_rows"),
                    F.coalesce(F.col(f"__m_{i}"), F.lit(0)).alias("n_violations"),
                ),
                r,
            )
        )
    total = metrics.select(F.col("__n").alias("n_rows"))
    for r in ref_rules:
        keys = (
            r.ref.select(F.col(r.ref_column).alias(r.column))
            .where(F.col(r.column).isNotNull())
            .distinct()
        )
        missing = (
            df.select(r.column)
            .where(F.col(r.column).isNotNull())
            .join(F.broadcast(keys), on=r.column, how="left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
        parts.append(finish(missing.crossJoin(F.broadcast(total)), r))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

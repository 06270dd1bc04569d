"""Configuration of the dataset comparison.

Defaults mirror the reference's ``reference.conf``
(``datasetComparison/src/main/resources/reference.conf:16-21``):
``errCol`` / ``actual`` / ``expected`` / ``allowDuplicates=false``.
Column-name validation mirrors
``config/DatasetComparisonConfig.scala:27-45`` (forbidden-character regex).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_FORBIDDEN_COLUMN_CHARS = re.compile(r".*[ ,;{}()\n\t=].*", re.DOTALL)


@dataclass(frozen=True)
class ComparisonConfig:
    error_column_name: str = "errCol"
    actual_prefix: str = "actual"
    expected_prefix: str = "expected"
    allow_duplicates: bool = False

    # --- extensions beyond reference parity (SURVEY.md §7.1 step 6) ---
    #: "reference" replays the reference dataflow action-for-action;
    #: "fast" runs the single-shuffle/cached plan designed for very large
    #: inputs; "hash" classifies by (key, xxhash64(row)) so the shuffle
    #: moves ~16 bytes/row and only unmatched rows rematerialize — but it
    #: scans the inputs twice more, so it wins only when rows are WIDE
    #: (documents/embeddings) or shuffle is network-bound; on narrow
    #: (~100 B) fact rows fast mode wins even at 60M rows on disk
    #: (measured both ways — BASELINE.md round-6 probes; 2^-64 per-pair
    #: collision caveat in comparator.py); "auto" resolves to
    #: "hash"/"fast" from the estimated row width, matching exactly the
    #: measured crossover. Results are identical across modes (tested).
    mode: str = "fast"
    #: Use EXCEPT ALL instead of EXCEPT DISTINCT semantics (scale-friendly
    #: variant; reference always uses EXCEPT DISTINCT, SURVEY.md §2.5).
    except_all: bool = False
    #: In "hash" mode, broadcast the unmatched (key, hash) set into the
    #: rematerialization joins when it has at most this many rows.
    hash_mode_broadcast_rows: int = 1_000_000
    #: In "reference" mode, piggyback the two input row counts on the
    #: duplicate-count jobs via ``DataFrame.observe`` instead of running
    #: dedicated ``count()`` actions — two fewer full input scans, bitwise
    #: identical results. Disable to replay the reference action-for-action.
    observe_metrics: bool = True
    #: "auto" mode picks "hash" when the estimated serialized row width
    #: exceeds this many bytes (wide rows -> classification shuffle moves
    #: key+hash only), else "fast".
    auto_hash_row_bytes: int = 128
    #: Fast/hash modes key the classification exchange on the synthetic
    #: key (round 12, one exchange feeds classification + rollup + diff
    #: joins) — which concentrates every row of a hot user-supplied key
    #: in ONE partition with no map-side partial aggregation, and AQE
    #: skew handling does NOT apply (user repartition + reused exchange).
    #: The guard samples the raw key columns (column-pruned scan) and
    #: falls back to the pre-round-12 full-row-keyed shape when one key
    #: owns more than ``skew_guard_factor`` partitions' fair share.
    #: Results are identical either way; see docs/TUNING.md.
    skew_guard: bool = True
    #: Inputs below this on-disk size skip the sampling job entirely —
    #: the worst-case single partition is bounded by the input itself,
    #: and the guard would cost more than it protects.
    skew_guard_min_bytes: int = 4 * 1024**3
    #: Fraction of rows sampled (key columns only) by the guard.
    skew_guard_fraction: float = 0.001
    #: A key is hot when its sampled share exceeds ``factor / P`` where
    #: ``P = spark.sql.shuffle.partitions`` (factor x the fair share).
    skew_guard_factor: float = 4.0

    def validate(self) -> "ComparisonConfig":
        for value, name in (
            (self.error_column_name, "errorColumnName"),
            (self.actual_prefix, "actualPrefix"),
            (self.expected_prefix, "expectedPrefix"),
        ):
            if _FORBIDDEN_COLUMN_CHARS.match(value):
                raise ValueError(
                    f"{name} configuration options has forbidden characters "
                    "for a column name"
                )
        if self.mode not in ("reference", "fast", "hash", "auto"):
            raise ValueError(f"unknown comparison mode: {self.mode!r}")
        return self

    def loggable_string(self) -> str:
        return (
            "Effective DatasetComparison configuration:\n"
            f' Error Column Name (errorColumnName) -> "{self.error_column_name}"\n'
            f' Prefix of original columns (expectedPrefix) -> "{self.expected_prefix}"\n'
            f' Prefix of new columns (actualPrefix) -> "{self.actual_prefix}"\n'
            f' Allow duplicities in dataframes (allowDuplicates) -> "{self.allow_duplicates}"'
        )


DEFAULT_CONFIG = ComparisonConfig()

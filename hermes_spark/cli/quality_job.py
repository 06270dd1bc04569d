"""The data-quality job: evaluate a JSON rule file against one source
and print the per-rule report as JSON lines; exit 1 when any rule fails.

An extension command (the reference validates data by comparing against
a reference dataset; this is the standing-assertions path when there is
no reference — SURVEY.md §8 expectations row). The CI contract matches
``compare``: exit code 0 = all expectations hold.

Usage::

    python -m hermes_spark.cli quality --format parquet --path /data/t \\
        --rules rules.json [--<reader-opt> v]

Rule file: a JSON array of objects with ``name``, ``kind`` (not_null |
unique | in_range | matches | isin | ref_integrity), ``column``, and
kind-specific fields (``lo``/``hi``, ``pattern``, ``values``,
``ref_path``/``ref_format``/``ref_column``), plus optional
``max_rate`` (default 0.0). Example::

    [{"name": "id_nn", "kind": "not_null", "column": "id"},
     {"name": "amt", "kind": "in_range", "column": "amt", "lo": 0, "hi": 1e6,
      "max_rate": 0.01},
     {"name": "fk", "kind": "ref_integrity", "column": "cust_id",
      "ref_format": "parquet", "ref_path": "/data/customers",
      "ref_column": "id"}]
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from hermes_spark.cli.parser import _args_to_map
from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.io import load_dataframe
from hermes_spark.sources.parameters import Parameters

_RESERVED = ("rules",)


def _build_rules(spark: SparkSession, specs: list[dict]):
    from hermes_spark.operators import Rule

    rules = []
    for s in specs:
        kind = s.get("kind")
        name, column = s["name"], s["column"]
        max_rate = float(s.get("max_rate", 0.0))
        if kind == "not_null":
            rules.append(Rule.not_null(name, column, max_rate))
        elif kind == "unique":
            rules.append(Rule.unique(name, column, max_rate))
        elif kind == "in_range":
            rules.append(
                Rule.in_range(name, column, float(s["lo"]), float(s["hi"]), max_rate)
            )
        elif kind == "matches":
            rules.append(Rule.matches(name, column, s["pattern"], max_rate))
        elif kind == "isin":
            rules.append(Rule.isin(name, column, s["values"], max_rate))
        elif kind == "ref_integrity":
            ref = load_dataframe(
                spark,
                Parameters.validate_and_create(
                    {"format": s["ref_format"], "path": s["ref_path"]}
                ),
            )
            rules.append(
                Rule.ref_integrity(name, column, ref, s["ref_column"], max_rate)
            )
        else:
            raise MissingArgumentException(f"unknown rule kind: {kind!r}")
    return rules


def run(spark: SparkSession, argv: list[str]) -> list[dict]:
    """Execute the quality job described by ``argv``; returns the
    per-rule report records (also usable as a library entry point)."""
    options = _args_to_map(argv)
    rules_path = options.get("rules")
    if not rules_path:
        raise MissingArgumentException("--rules <file.json> is required")
    reader_opts = {k: v for k, v in options.items() if k not in _RESERVED}
    df = load_dataframe(spark, Parameters.validate_and_create(reader_opts))
    with open(rules_path) as fh:
        specs = json.load(fh)

    from hermes_spark.operators import check_expectations

    rules = _build_rules(spark, specs)
    return [row.asDict() for row in check_expectations(df, rules).collect()]


def main(argv: list[str]) -> int:
    try:
        spark = SparkSession.builder.appName("Data quality").getOrCreate()
        records = run(spark, argv)
        for record in records:
            print(json.dumps(record, default=str))
    except (MissingArgumentException, FileNotFoundError, KeyError) as exc:
        print(exc, file=sys.stderr)
        return 2
    return 0 if all(r["passed"] for r in records) else 1

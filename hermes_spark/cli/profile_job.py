"""The data-profiling job: load one source, print column and key-skew
reports as JSON lines.

An extension command (the reference CLI has no profiling; SURVEY.md
§7.1 step 6): the pre-flight for comparing or joining a huge table —
null/distinct counts per column and the heaviest key groups, feeding
the mode/salting decisions in docs/TUNING.md.

Usage::

    python -m hermes_spark.cli profile --format parquet --path /data/t \\
        [--cols a,b,c] [--skew-cols k1,k2] [--top-n 20] [--<reader-opt> v]
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from hermes_spark.cli.parser import _args_to_map
from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.io import load_dataframe
from hermes_spark.sources.parameters import Parameters

_RESERVED = ("cols", "skew-cols", "top-n")


def run(spark: SparkSession, argv: list[str]) -> list[dict]:
    """Execute the profile described by ``argv``; returns the report
    records (also usable as a library entry point)."""
    options = _args_to_map(argv)
    cols = options.get("cols")
    skew_cols = options.get("skew-cols")
    top_n = int(options.get("top-n", "20"))
    reader_opts = {k: v for k, v in options.items() if k not in _RESERVED}
    df = load_dataframe(spark, Parameters.validate_and_create(reader_opts))

    from hermes_spark.operators import column_profile, skew_report

    records: list[dict] = []
    profile_cols = cols.split(",") if cols else df.columns
    for row in column_profile(df, profile_cols).collect():
        records.append({"report": "column_profile", **row.asDict()})
    if skew_cols:
        keys = skew_cols.split(",")
        for row in skew_report(df, keys, top_n=top_n).collect():
            records.append({"report": "skew", **row.asDict()})
    return records


def main(argv: list[str]) -> int:
    try:
        spark = SparkSession.builder.appName("Dataset profile").getOrCreate()
        for record in run(spark, argv):
            print(json.dumps(record, default=str))
    except MissingArgumentException as exc:
        print(exc, file=sys.stderr)
        return 2
    return 0

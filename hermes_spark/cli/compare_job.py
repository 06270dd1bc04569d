"""The dataset-comparison job: CLI → load → compare → write diff +
``_METRICS`` → exception-as-exit-code.

Mirrors the lifecycle of
``datasetComparison/.../DatasetComparisonJob.scala:36-109`` (SURVEY.md §3.1):
load both sides via the generic reader, optionally load a cherry-pick
schema, run the comparator, write the diff DataFrame to a collision-free
path, write the pretty-JSON ``_METRICS`` file next to it, and raise
``DatasetsDifferException`` when differences were found (the process exit
code is the CI contract).
"""

from __future__ import annotations

import logging
import os
from dataclasses import replace as _dc_replace
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.types import StructType

from hermes_spark.comparator import DatasetComparator
from hermes_spark.config import ComparisonConfig, DEFAULT_CONFIG
from hermes_spark.config_file import CONFIG_ENV_VAR, load_comparison_config
from hermes_spark.exceptions import DatasetsDifferException
from hermes_spark.result import ComparisonResult
from hermes_spark.sources.io import (
    get_unique_file_path,
    load_dataframe,
    read_text_file,
    write_dataframe,
    write_metrics_file,
)
from hermes_spark.sources.parameters import CliParameters

log = logging.getLogger(__name__)


def load_cherry_pick_schema(spark: SparkSession, schema_path: str) -> StructType:
    """Load a user-provided Spark JSON schema restricting the comparison
    (reference ``DatasetComparisonJob.scala:84-89``)."""
    return StructType.fromJson(__import__("json").loads(read_text_file(spark, schema_path)))


def run(
    spark: SparkSession,
    cli: CliParameters,
    config: ComparisonConfig = DEFAULT_CONFIG,
) -> ComparisonResult:
    """Execute the comparison described by ``cli``; returns the result and
    raises :class:`DatasetsDifferException` if the datasets differ."""
    schema: Optional[StructType] = None
    if cli.schema_path:
        schema = load_cherry_pick_schema(spark, cli.schema_path)

    if cli.config_path or (
        config is DEFAULT_CONFIG and os.environ.get(CONFIG_ENV_VAR)
    ):
        # reference parity: TypesafeConfig file layering (reference.conf
        # defaults <- file <- CLI flags); explicit `config` args win over
        # the environment variable, CLI flags below win over both
        config = load_comparison_config(cli.config_path, base=config)

    if cli.mode or cli.allow_duplicates:
        config = _dc_replace(
            config,
            allow_duplicates=cli.allow_duplicates or config.allow_duplicates,
            mode=cli.mode or config.mode,
        ).validate()

    ref_df = load_dataframe(spark, cli.reference)
    actual_df = load_dataframe(spark, cli.actual)

    if cli.common_columns and schema is None:
        from hermes_spark.schema_utils import intersect_schemas, strip_metadata

        schema = intersect_schemas(
            strip_metadata(ref_df.schema), strip_metadata(actual_df.schema)
        )

    if cli.incremental_partition_col:
        from hermes_spark.incremental import UNCHANGED, partition_digests

        pcol = cli.incremental_partition_col
        digests = partition_digests(ref_df, actual_df, pcol).collect()
        changed = [r[pcol] for r in digests if r["status"] != UNCHANGED]
        if not changed:
            # every partition digest matched: synthesize the passing
            # result from the digest counts — no full compare needed
            result = ComparisonResult(
                ref_row_count=sum(r["ref_rows"] for r in digests),
                new_row_count=sum(r["actual_rows"] for r in digests),
                ref_duplicate_count=0,
                new_duplicate_count=0,
                passed_count=sum(r["ref_rows"] for r in digests),
                used_schema_selector=[],
                result_df=None,
                diff_count=0,
                additional_info={
                    "incremental": pcol,
                    "changed_partitions": "0",
                },
            )
            result.passed_options = cli.raw_options
            comparator = None
        else:
            from pyspark.sql import functions as sf

            changed_df = sf.broadcast(
                spark.createDataFrame([(v,) for v in changed], [pcol])
            )
            ref_df = ref_df.join(changed_df, on=pcol, how="left_semi")
            actual_df = actual_df.join(changed_df, on=pcol, how="left_semi")
            comparator = DatasetComparator(
                ref_df, actual_df, keys=cli.keys, config=config,
                optional_schema=schema,
            )
            result = comparator.compare()
            result.additional_info["incremental"] = pcol
            result.additional_info["changed_partitions"] = str(len(changed))
            result.passed_options = cli.raw_options
    else:
        comparator = DatasetComparator(
            ref_df, actual_df, keys=cli.keys, config=config, optional_schema=schema
        )
        result = comparator.compare()
        result.passed_options = cli.raw_options

    out_path = ""
    if cli.output is not None:
        out_path = get_unique_file_path(spark, cli.output.path)
        if result.result_df is not None:
            write_dataframe(
                result.result_df,
                cli.output.__class__(
                    format=cli.output.format,
                    options=cli.output.options,
                    path=out_path,
                ),
            )
        write_metrics_file(spark, out_path, result.get_pretty_json())
    if comparator is not None:
        comparator.release()

    if not result.passed:
        raise DatasetsDifferException(
            cli.reference.path,
            cli.actual.path,
            out_path,
            result.ref_row_count,
            result.new_row_count,
        )
    log.info("Expected and actual datasets are the same.")
    return result


def main(argv: list[str]) -> int:
    from hermes_spark.cli.parser import parse_cli_parameters

    from hermes_spark import ensure_spark_version

    cli = parse_cli_parameters(argv)
    spark = SparkSession.builder.appName("Dataset comparison").getOrCreate()
    ensure_spark_version(spark)
    try:
        run(spark, cli)
    except DatasetsDifferException as exc:
        print(exc)
        return 1
    return 0

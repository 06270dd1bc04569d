"""Profile plugin: data-quality gates as an e2e test step.

Extension beyond the reference's three plugins: a pipeline test suite
usually wants "the output has no null keys and no pathological skew"
asserted next to "the output matches the reference". Step args are the
profile CLI's options plus the gate thresholds:

    --format parquet --path /data/out --cols id,name
    --skew-cols id --max-null-pct 0.0 --max-top-key-pct 0.05

The step FAILS when any profiled column's null fraction exceeds
``max-null-pct``, or the heaviest ``skew-cols`` group exceeds
``max-top-key-pct`` of all rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from hermes_spark.cli.parser import _args_to_map
from hermes_spark.cli.profile_job import run as profile_run
from hermes_spark.e2e.definitions import TestDefinition
from hermes_spark.e2e.plugin import Plugin, PluginResult, register_plugin


@dataclass
class ProfileResult(PluginResult):
    records: list = field(default_factory=list)
    violations: list = field(default_factory=list)

    def result_log(self) -> str:
        state = "passed" if self.passed else "FAILED"
        extra = f" ({'; '.join(self.violations)})" if self.violations else ""
        return f"Profile gate {self.test_name} (#{self.order}) {state}{extra}"


@register_plugin
class ProfilePlugin(Plugin):
    @property
    def name(self) -> str:
        return "Profile"

    def perform_action(
        self, test_definition: TestDefinition, actual_order: int
    ) -> PluginResult:
        opts = _args_to_map(list(test_definition.args))
        max_null = float(opts.pop("max-null-pct", "1.0"))
        max_key = float(opts.pop("max-top-key-pct", "1.0"))
        argv: list[str] = []
        for k, v in opts.items():
            argv += [f"--{k}", v]

        spark = SparkSession.builder.appName("Dataset profile").getOrCreate()
        records = profile_run(spark, argv)

        violations: list[str] = []
        for r in records:
            if r["report"] == "column_profile" and r["null_pct"] > max_null:
                violations.append(
                    f"column {r['column']} null_pct {r['null_pct']} > {max_null}"
                )
            if (
                r["report"] == "skew"
                and r["rank"] == 1
                and r["pct"] > max_key
            ):
                key_desc = {
                    k: v
                    for k, v in r.items()
                    if k not in ("report", "cnt", "pct", "rank")
                }
                violations.append(
                    f"top key {key_desc} holds {r['pct']} > {max_key} of rows"
                )

        return ProfileResult(
            arguments=test_definition.args,
            returned_value=records,
            order=actual_order,
            test_name=test_definition.name,
            passed=not violations,
            additional_info={"n_records": str(len(records))},
            records=records,
            violations=violations,
        )

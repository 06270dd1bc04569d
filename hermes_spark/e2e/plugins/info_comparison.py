"""InfoFileComparison plugin: `_INFO` document diff as a test step.

Mirrors ``e2eRunner/.../plugins/InfoFileComparisonPlugin.scala:63-83``:
args are ``[ref_path, new_path, out_path]`` (or ``--ref-path`` style
pairs); passes iff the documents match; the diff JSON is written by the
job itself when differences exist.
"""

from __future__ import annotations

from dataclasses import dataclass

from hermes_spark.e2e.definitions import TestDefinition
from hermes_spark.e2e.plugin import Plugin, PluginResult, register_plugin
from hermes_spark.exceptions import InfoFilesDifferException
from hermes_spark.infofile.job import execute


def _parse_args(args: tuple[str, ...]) -> tuple[str, str, str]:
    if len(args) == 3 and not args[0].startswith("--"):
        return args[0], args[1], args[2]
    options = {args[i].lstrip("-"): args[i + 1] for i in range(0, len(args), 2)}
    return options["ref-path"], options["new-path"], options["out-path"]


@dataclass
class InfoComparisonResult(PluginResult):
    def result_log(self) -> str:
        state = "passed" if self.passed else "FAILED"
        return f"Info file comparison {self.test_name} (#{self.order}) {state}"


@register_plugin
class InfoFileComparisonPlugin(Plugin):
    @property
    def name(self) -> str:
        return "InfoComparison"

    def perform_action(
        self, test_definition: TestDefinition, actual_order: int
    ) -> PluginResult:
        ref_path, new_path, out_path = _parse_args(test_definition.args)
        try:
            execute(ref_path, new_path, out_path)
            passed, value = True, "[]"
        except InfoFilesDifferException as exc:
            passed, value = False, str(exc)
        return InfoComparisonResult(
            arguments=test_definition.args,
            returned_value=value,
            order=actual_order,
            test_name=test_definition.name,
            passed=passed,
            additional_info={"outPath": out_path},
        )

"""Bash plugin: run a shell command as a test step.

Mirrors ``e2eRunner/.../plugins/BashPlugin.scala:50-71``: the args are
joined into one command line, run through the shell, and the step passes
iff the exit code is zero; stdout is the returned value.
"""

from __future__ import annotations

import subprocess
from dataclasses import dataclass

from hermes_spark.e2e.definitions import TestDefinition
from hermes_spark.e2e.plugin import Plugin, PluginResult, register_plugin


@dataclass
class BashPluginResult(PluginResult):
    def result_log(self) -> str:
        state = "passed" if self.passed else "FAILED"
        return (
            f"Bash test {self.test_name} (#{self.order}) {state} with "
            f"output: {self.returned_value!r}"
        )


@register_plugin
class BashPlugin(Plugin):
    @property
    def name(self) -> str:
        return "BashPlugin"

    def perform_action(
        self, test_definition: TestDefinition, actual_order: int
    ) -> PluginResult:
        command = " ".join(test_definition.args)
        proc = subprocess.run(
            command, shell=True, capture_output=True, text=True, check=False
        )
        return BashPluginResult(
            arguments=test_definition.args,
            returned_value=proc.stdout,
            order=actual_order,
            test_name=test_definition.name,
            passed=proc.returncode == 0,
            additional_info={"returnCode": str(proc.returncode)},
        )

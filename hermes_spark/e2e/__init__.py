"""Plugin-driven end-to-end test orchestrator (SURVEY.md §2.11, §3.3).

Python re-expression of the reference ``e2eRunner`` module: test
definitions come from a JSON file with ``#{var}#`` substitution, are
scheduled by ``(order, pluginName)``, validated for dependency ordering,
and executed sequentially through named plugins; results carry a
pass/fail state and an optional ``write(writeArgs)`` side-effect.

Plugin discovery is a Python registry (decorator / explicit register)
instead of the reference's JVM classpath scan
(``PluginDefinitions.scala:65-86``) — idiomatic for Python, same contract.
"""

from hermes_spark.e2e.definitions import TestDefinition, TestDefinitions
from hermes_spark.e2e.plugin import (
    FailedPluginResult,
    Plugin,
    PluginResult,
    get_plugin,
    register_plugin,
    registered_plugin_names,
)
from hermes_spark.e2e.runner import run_tests, validate_plugins_to_be_used

__all__ = [
    "FailedPluginResult",
    "Plugin",
    "PluginResult",
    "TestDefinition",
    "TestDefinitions",
    "get_plugin",
    "register_plugin",
    "registered_plugin_names",
    "run_tests",
    "validate_plugins_to_be_used",
]

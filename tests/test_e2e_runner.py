"""E2E orchestrator tests, mirroring the reference's
``E2ERunnerJobSuite`` / ``TestDefinitionTest`` / ``PluginDefinitionsTest``
coverage: var substitution, scheduling, dependency gating, fail-fast,
bash plugin behavior."""

import json

import pytest

import hermes_spark.e2e.plugins  # noqa: F401 - registers bundled plugins
from hermes_spark.e2e import (
    FailedPluginResult,
    Plugin,
    PluginResult,
    TestDefinitions,
    register_plugin,
    run_tests,
)
from hermes_spark.e2e.definitions import (
    TestDefinitionDependenciesOutOfOrder,
    UndefinedVariablesInTestDefinitionJson,
)
from hermes_spark.e2e.runner import PluginsMissing, TestFailedWithFailFastOn

BASE = {
    "vars": {"prefix": "XYZ"},
    "runs": [
        {
            "pluginName": "BashPlugin",
            "name": "Test1",
            "order": 0,
            "args": ["echo", "#{prefix}#"],
        },
        {
            "pluginName": "BashPlugin",
            "name": "Test2",
            "order": 1,
            "args": ["true"],
            "dependsOn": "Test1",
        },
    ],
}


def test_var_substitution_and_parse():
    defs = TestDefinitions.from_string(json.dumps(BASE))
    assert defs.size == 2
    assert defs.get_sorted()[0].args == ("echo", "XYZ")


def test_extra_vars_override():
    defs = TestDefinitions.from_string(json.dumps(BASE), {"prefix": "ABC"})
    assert defs.get_sorted()[0].args == ("echo", "ABC")


def test_unresolved_var_raises():
    bad = {"runs": [{"pluginName": "BashPlugin", "name": "T", "order": 0,
                     "args": ["#{nope}#"]}]}
    with pytest.raises(UndefinedVariablesInTestDefinitionJson):
        TestDefinitions.from_string(json.dumps(bad))


def test_schedule_sorted_by_order_then_plugin_name():
    defs = TestDefinitions.from_string(json.dumps({
        "runs": [
            {"pluginName": "ZPlug", "name": "b", "order": 0, "args": []},
            {"pluginName": "APlug", "name": "a", "order": 0, "args": []},
            {"pluginName": "APlug", "name": "c", "order": -1, "args": []},
        ]
    }))
    assert [td.name for td in defs.get_sorted()] == ["c", "a", "b"]
    assert [t.actual_order for t in defs.get_sorted_with_index()] == [1, 2, 3]


def test_dependency_must_be_scheduled_earlier():
    defs = TestDefinitions.from_string(json.dumps({
        "runs": [
            {"pluginName": "BashPlugin", "name": "first", "order": 0,
             "args": [], "dependsOn": "later"},
            {"pluginName": "BashPlugin", "name": "later", "order": 1, "args": []},
        ]
    }))
    with pytest.raises(TestDefinitionDependenciesOutOfOrder):
        defs.ensure_order_and_dependencies_correct()


def test_run_tests_bash_pass_and_fail():
    defs = TestDefinitions.from_string(json.dumps({
        "runs": [
            {"pluginName": "BashPlugin", "name": "ok", "order": 0,
             "args": ["echo hi"]},
            {"pluginName": "BashPlugin", "name": "bad", "order": 1,
             "args": ["false"]},
        ]
    }))
    results = run_tests(defs)
    assert [r.passed for r in results] == [True, False]
    assert results[0].returned_value.strip() == "hi"


def test_dependee_failure_gates_dependent():
    defs = TestDefinitions.from_string(json.dumps({
        "runs": [
            {"pluginName": "BashPlugin", "name": "bad", "order": 0,
             "args": ["false"]},
            {"pluginName": "BashPlugin", "name": "child", "order": 1,
             "args": ["echo hi"], "dependsOn": "bad"},
        ]
    }))
    results = run_tests(defs)
    assert not results[1].passed
    assert isinstance(results[1], FailedPluginResult)
    assert "dependee" in str(results[1].returned_value).lower()


def test_fail_fast_raises():
    defs = TestDefinitions.from_string(json.dumps({
        "runs": [
            {"pluginName": "BashPlugin", "name": "bad", "order": 0,
             "args": ["false"]},
            {"pluginName": "BashPlugin", "name": "never", "order": 1,
             "args": ["echo hi"]},
        ]
    }))
    with pytest.raises(TestFailedWithFailFastOn):
        run_tests(defs, fail_fast=True)


def test_unknown_plugin_rejected_up_front():
    defs = TestDefinitions.from_string(json.dumps({
        "runs": [{"pluginName": "NoSuch", "name": "x", "order": 0, "args": []}]
    }))
    with pytest.raises(PluginsMissing):
        run_tests(defs)


def test_custom_plugin_registration():
    @register_plugin
    class EchoPlugin(Plugin):
        @property
        def name(self):
            return "EchoPlugin"

        def perform_action(self, td, actual_order):
            return PluginResult(
                arguments=td.args,
                returned_value=list(td.args),
                order=actual_order,
                test_name=td.name,
                passed=True,
            )

    defs = TestDefinitions.from_string(json.dumps({
        "runs": [{"pluginName": "EchoPlugin", "name": "x", "order": 0,
                  "args": ["a", "b"]}]
    }))
    results = run_tests(defs)
    assert results[0].returned_value == ["a", "b"]

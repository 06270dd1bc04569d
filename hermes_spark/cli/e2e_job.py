"""The e2e-runner job CLI.

Mirrors ``e2eRunner/.../E2ERunnerConfig.scala:50-81``:
``--test-definition-path`` (required), ``--fail-fast``,
``--extra-vars k=v,...``. The reference's ``--jar-path`` (extra plugin
jars) becomes ``--plugin-module`` — importable Python modules whose
import registers additional plugins.
"""

from __future__ import annotations

import argparse
import importlib
import logging

from hermes_spark.e2e.definitions import TestDefinitions
from hermes_spark.e2e.runner import run_tests

log = logging.getLogger(__name__)


def main(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(prog="hermes e2e")
    parser.add_argument("--test-definition-path", required=True)
    parser.add_argument("--fail-fast", action="store_true")
    parser.add_argument("--extra-vars", default="")
    parser.add_argument(
        "--plugin-module", action="append", default=[],
        help="importable module registering extra plugins (repeatable)",
    )
    args = parser.parse_args(argv)

    # bundled plugins register on import
    importlib.import_module("hermes_spark.e2e.plugins")
    for module in args.plugin_module:
        importlib.import_module(module)

    extra_vars = {}
    if args.extra_vars:
        for pair in args.extra_vars.split(","):
            key, _, value = pair.partition("=")
            extra_vars[key] = value

    definitions = TestDefinitions.from_file(
        args.test_definition_path, extra_vars
    )
    results = run_tests(definitions, fail_fast=args.fail_fast)
    failed = [r for r in results if not r.passed]
    return 1 if failed else 0

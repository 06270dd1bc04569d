"""Command-line interface: ``python -m hermes_spark.cli <command> ...``.

Commands:
- ``compare``      — dataset comparison job (SURVEY.md §3.1)
- ``info-compare`` — `_INFO` control-measure document diff (SURVEY.md §3.4)
- ``e2e``          — plugin-driven test orchestrator (SURVEY.md §3.3)
"""

from hermes_spark.cli.parser import parse_cli_parameters

__all__ = ["parse_cli_parameters"]

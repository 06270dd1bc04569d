"""``python -m hermes_spark.cli <command> ...`` dispatcher.

Commands map to the reference's three spark-submit main classes
(SURVEY.md §3): ``compare`` → DatasetComparisonJob, ``info-compare`` →
InfoFileComparisonJob, ``e2e`` → E2ERunnerJob. Exit codes follow the
reference's exception-as-exit-code CI contract.
"""

from __future__ import annotations

import sys


def main(argv: list[str]) -> int:
    if not argv:
        print(
            "usage: python -m hermes_spark.cli "
            "{compare|info-compare|e2e|profile|dedup|split|quality|sketch|datasheet} ...",
            file=sys.stderr,
        )
        return 2
    command, rest = argv[0], argv[1:]
    if command == "compare":
        from hermes_spark.cli.compare_job import main as compare_main

        return compare_main(rest)
    if command == "info-compare":
        from hermes_spark.infofile.job import main as info_main

        return info_main(rest)
    if command == "e2e":
        from hermes_spark.cli.e2e_job import main as e2e_main

        return e2e_main(rest)
    if command == "profile":
        from hermes_spark.cli.profile_job import main as profile_main

        return profile_main(rest)
    if command == "dedup":
        from hermes_spark.cli.curate_job import dedup_main

        return dedup_main(rest)
    if command == "split":
        from hermes_spark.cli.curate_job import split_main

        return split_main(rest)
    if command == "quality":
        from hermes_spark.cli.quality_job import main as quality_main

        return quality_main(rest)
    if command == "sketch":
        from hermes_spark.cli.sketch_job import main as sketch_main

        return sketch_main(rest)
    if command == "datasheet":
        from hermes_spark.cli.datasheet_job import main as datasheet_main

        return datasheet_main(rest)
    print(f"unknown command: {command}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))

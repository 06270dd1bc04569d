"""Info-file comparison job: load two `_INFO` JSON docs, diff, write the
diff JSON, raise ``InfoFilesDifferException`` when they differ.

Mirrors ``infoFileComparison/.../InfoFileComparisonJob.scala:55-109``
(SURVEY.md §3.4). Arguments: ``--new-path``, ``--ref-path``,
``--out-path`` — all required and mutually distinct
(``InfoComparisonArguments.scala:45-101``).

File IO: ``file://`` or bare paths use local ``open``; anything else is
handed to ``fsspec`` if available (HDFS/S3 deployments).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

from hermes_spark.exceptions import InfoFilesDifferException
from hermes_spark.infofile.compare import compare_control_measures
from hermes_spark.infofile.config import DEFAULT_INFO_CONFIG, InfoFileComparisonConfig
from hermes_spark.infofile.model import differences_as_json

log = logging.getLogger(__name__)


def _open(path: str, mode: str):
    if path.startswith("file://"):
        path = path[len("file://"):]
    if "://" in path:
        try:
            import fsspec
        except ImportError as exc:  # pragma: no cover - depends on deployment
            raise NotImplementedError(
                f"non-local path {path!r} requires fsspec"
            ) from exc
        return fsspec.open(path, mode).open()
    if "w" in mode:
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
    return open(path, mode, encoding="utf-8")


def load_control_measure(path: str) -> dict:
    with _open(path, "r") as fh:
        return json.load(fh)


def save_data_to_file(data: str, path: str) -> None:
    with _open(path, "w") as fh:
        fh.write(data)


def execute(
    ref_path: str,
    new_path: str,
    out_path: str,
    config: InfoFileComparisonConfig = DEFAULT_INFO_CONFIG,
) -> list:
    """Run the comparison; raises InfoFilesDifferException on differences."""
    reference = load_control_measure(ref_path)
    actual = load_control_measure(new_path)
    log.info(config.loggable_string())

    diff = compare_control_measures(reference, actual, config)
    if diff:
        save_data_to_file(differences_as_json(diff), out_path)
        raise InfoFilesDifferException(ref_path, new_path, out_path)
    log.info("Expected and actual _INFO files are the same.")
    return diff


def main(argv: list[str]) -> int:
    parser = argparse.ArgumentParser(prog="hermes info-compare")
    parser.add_argument("--ref-path", required=True)
    parser.add_argument("--new-path", required=True)
    parser.add_argument("--out-path", required=True)
    args = parser.parse_args(argv)

    paths = [args.ref_path, args.new_path, args.out_path]
    if len(set(paths)) != len(paths):
        parser.error("ref/new/out paths must be mutually distinct")

    try:
        execute(args.ref_path, args.new_path, args.out_path)
    except InfoFilesDifferException as exc:
        print(exc)
        return 1
    return 0

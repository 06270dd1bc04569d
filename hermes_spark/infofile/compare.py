"""Recursive control-measure diff.

Behavior mirrors ``infoFileComparison/.../AtumModelUtils.scala:35-205``
(SURVEY.md §2.10 D1–D6) with one deliberate fix: the reference zips
checkpoints/controls by index and throws IndexOutOfBounds when the other
side is shorter (``AtumModelUtils.scala:37-42``); we length-check and
report the mismatch as a difference instead (SURVEY.md §2.10 caveat).

Diff ordering matches the reference: for metadata, the 7 named fields in
declaration order, then additionalInfo diffs sorted by path; checkpoint
diffs are accumulated via ``foldLeft(...) :: agg`` which REVERSES their
order — we reproduce that so diff JSON files are byte-comparable.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

from hermes_spark.infofile.config import DEFAULT_INFO_CONFIG, InfoFileComparisonConfig
from hermes_spark.infofile.model import ModelDifference

log = logging.getLogger(__name__)

_METADATA_FIELDS = [
    "sourceApplication",
    "country",
    "historyType",
    "dataFilename",
    "sourceType",
    "version",
    "informationDate",
]

_CHECKPOINT_FIELDS = ["name", "workflowName", "order"]
_MEASUREMENT_FIELDS = ["controlName", "controlType", "controlCol", "controlValue"]


def _simple_compare(
    was: Any, is_: Any, path: str
) -> Optional[ModelDifference]:
    if was != is_:
        return ModelDifference(path, was, is_)
    return None


def _field_diffs(
    was: dict, is_: dict, fields: list[str], cur_path: str
) -> list[ModelDifference]:
    out = []
    for f in fields:
        d = _simple_compare(was.get(f), is_.get(f), f"{cur_path}.{f}")
        if d is not None:
            out.append(d)
    return out


def _additional_info_diff(
    was: dict[str, str],
    is_: dict[str, str],
    cur_path: str,
    config: InfoFileComparisonConfig,
) -> list[ModelDifference]:
    diffs: list[ModelDifference] = []
    for was_key, was_value in was.items():
        if was_key in config.version_meta_keys:
            log.info(
                "%s versions is: Reference - %s, New - %s",
                was_key, was_value, is_.get(was_key, "NOT SPECIFIED"),
            )
            continue
        if was_key in config.keys_to_ignore:
            log.info(
                "%s key ignored. Values: Reference - %s, New - %s",
                was_key, was_value, is_.get(was_key, "NOT SPECIFIED"),
            )
            continue
        if was_key not in is_:
            # missing key on the new side reports is="Null"
            # (AtumModelUtils.scala:104)
            diffs.append(ModelDifference(f"{cur_path}.{was_key}", was_value, "Null"))
        elif is_[was_key] != was_value:
            diffs.append(
                ModelDifference(f"{cur_path}.{was_key}", was_value, is_[was_key])
            )
    return sorted(diffs, key=lambda d: d.path)


def _metadata_diff(
    was: dict, is_: dict, cur_path: str, config: InfoFileComparisonConfig
) -> list[ModelDifference]:
    diffs = _field_diffs(was, is_, _METADATA_FIELDS, cur_path)
    diffs += _additional_info_diff(
        was.get("additionalInfo", {}),
        is_.get("additionalInfo", {}),
        f"{cur_path}.additionalInfo",
        config,
    )
    return diffs


def _measurement_diff(was: dict, is_: dict, cur_path: str) -> list[ModelDifference]:
    return _field_diffs(was, is_, _MEASUREMENT_FIELDS, cur_path)


def _checkpoint_diff(was: dict, is_: dict, cur_path: str) -> list[ModelDifference]:
    diffs = _field_diffs(was, is_, _CHECKPOINT_FIELDS, cur_path)

    was_controls = was.get("controls", [])
    is_controls = is_.get("controls", [])
    if len(was_controls) != len(is_controls):
        diffs.append(
            ModelDifference(
                f"{cur_path}.controls.length", len(was_controls), len(is_controls)
            )
        )
    controls: list[ModelDifference] = []
    for index in range(min(len(was_controls), len(is_controls))):
        controls = (
            _measurement_diff(
                was_controls[index], is_controls[index], f"{cur_path}.controls[{index}]"
            )
            + controls
        )

    was_sw = was.get("software", "NOT SPECIFIED")
    is_sw = is_.get("software", "NOT SPECIFIED")
    was_ver = was.get("version", "NOT SPECIFIED")
    is_ver = is_.get("version", "NOT SPECIFIED")
    if was_sw != is_sw or was_ver != is_ver:
        log.warning(
            "Software that generated checkpoints in %s differs. "
            "Was - %s(%s) Is - %s(%s)",
            cur_path, was_sw, was_ver, is_sw, is_ver,
        )

    return diffs + controls


def compare_control_measures(
    reference: dict,
    actual: dict,
    config: InfoFileComparisonConfig = DEFAULT_INFO_CONFIG,
) -> list[ModelDifference]:
    """Diff two control-measure documents (parsed JSON dicts); returns
    ``ModelDifference`` records, empty when identical."""
    metadata = _metadata_diff(
        reference.get("metadata", {}), actual.get("metadata", {}), "metadata", config
    )

    ref_cps = reference.get("checkpoints", [])
    act_cps = actual.get("checkpoints", [])
    length: list[ModelDifference] = []
    if len(ref_cps) != len(act_cps):
        length.append(
            ModelDifference("checkpoints.length", len(ref_cps), len(act_cps))
        )
    checkpoints: list[ModelDifference] = []
    for index in range(min(len(ref_cps), len(act_cps))):
        checkpoints = (
            _checkpoint_diff(ref_cps[index], act_cps[index], f"checkpoints[{index}]")
            + checkpoints
        )
    return metadata + length + checkpoints

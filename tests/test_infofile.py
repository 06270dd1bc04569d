"""Info-file document diff tests, mirroring the reference's
``AtumModelUtilsSuite`` / ``InfoFileComparisonJobSuite`` coverage
(fixture family from FIXTURES.md: original / correct / wrong)."""

import copy
import json

import pytest

from hermes_spark.exceptions import InfoFilesDifferException
from hermes_spark.infofile import (
    InfoFileComparisonConfig,
    compare_control_measures,
    differences_as_json,
    execute,
)

ORIGINAL = {
    "metadata": {
        "sourceApplication": "Test PC",
        "country": "CZ",
        "historyType": "Snapshot",
        "dataFilename": "ConformanceRules.json",
        "sourceType": "Golden",
        "version": 1,
        "informationDate": "01-01-2019",
        "additionalInfo": {
            "raw_format": "json",
            "std_application_id": "local-1568617193345",
            "std_records_succeeded": "21",
            "std_enceladus_version": "1.2.0-SNAPSHOT",
        },
    },
    "checkpoints": [
        {
            "name": "Source",
            "workflowName": "Source",
            "order": 1,
            "controls": [
                {
                    "controlName": "recordCount",
                    "controlType": "count",
                    "controlCol": "id",
                    "controlValue": "21",
                }
            ],
        },
        {
            "name": "Raw",
            "software": "Atum",
            "version": "2.5.0",
            "workflowName": "Raw",
            "order": 2,
            "controls": [
                {
                    "controlName": "recordCount",
                    "controlType": "count",
                    "controlCol": "*",
                    "controlValue": "21",
                }
            ],
        },
    ],
}


def test_identical_documents_no_diff():
    assert compare_control_measures(ORIGINAL, copy.deepcopy(ORIGINAL)) == []


def test_metadata_field_and_additional_info_diffs():
    changed = copy.deepcopy(ORIGINAL)
    changed["metadata"]["country"] = "SA"
    changed["metadata"]["additionalInfo"]["std_records_succeeded"] = "20"
    diffs = compare_control_measures(ORIGINAL, changed)
    paths = [d.path for d in diffs]
    assert "metadata.country" in paths
    assert "metadata.additionalInfo.std_records_succeeded" in paths
    country = next(d for d in diffs if d.path == "metadata.country")
    assert country.was == "CZ" and country.is_ == "SA"


def test_ignored_and_version_keys_not_diffed():
    changed = copy.deepcopy(ORIGINAL)
    changed["metadata"]["additionalInfo"]["std_application_id"] = "other-id"
    changed["metadata"]["additionalInfo"]["std_enceladus_version"] = "9.9.9"
    assert compare_control_measures(ORIGINAL, changed) == []


def test_missing_additional_info_key_reports_null():
    changed = copy.deepcopy(ORIGINAL)
    del changed["metadata"]["additionalInfo"]["raw_format"]
    diffs = compare_control_measures(ORIGINAL, changed)
    assert diffs == [d for d in diffs if d.path.startswith("metadata.additionalInfo")]
    assert diffs[0].is_ == "Null"


def test_control_value_diff_path():
    changed = copy.deepcopy(ORIGINAL)
    changed["checkpoints"][1]["controls"][0]["controlValue"] = "22"
    diffs = compare_control_measures(ORIGINAL, changed)
    assert [d.path for d in diffs] == ["checkpoints[1].controls[0].controlValue"]


def test_checkpoint_count_mismatch_reported_not_crash():
    changed = copy.deepcopy(ORIGINAL)
    changed["checkpoints"] = changed["checkpoints"][:1]
    diffs = compare_control_measures(ORIGINAL, changed)
    assert any(d.path == "checkpoints.length" for d in diffs)


def test_custom_config_ignores_extra_keys():
    changed = copy.deepcopy(ORIGINAL)
    changed["metadata"]["additionalInfo"]["raw_format"] = "csv"
    config = InfoFileComparisonConfig(keys_to_ignore=["raw_format"])
    assert compare_control_measures(ORIGINAL, changed, config) == []


def test_job_execute_writes_diff_and_raises(tmp_path):
    ref = tmp_path / "ref.json"
    new = tmp_path / "new.json"
    out = tmp_path / "out.json"
    changed = copy.deepcopy(ORIGINAL)
    changed["metadata"]["version"] = 2
    ref.write_text(json.dumps(ORIGINAL))
    new.write_text(json.dumps(changed))
    with pytest.raises(InfoFilesDifferException):
        execute(str(ref), str(new), str(out))
    written = json.loads(out.read_text())
    assert written == [{"path": "metadata.version", "was": 1, "is": 2}]


def test_job_execute_identical_ok(tmp_path):
    ref = tmp_path / "ref.json"
    new = tmp_path / "new.json"
    ref.write_text(json.dumps(ORIGINAL))
    new.write_text(json.dumps(ORIGINAL))
    assert execute(str(ref), str(new), str(tmp_path / "out.json")) == []


def test_diff_json_round_trip():
    changed = copy.deepcopy(ORIGINAL)
    changed["metadata"]["country"] = "SA"
    diffs = compare_control_measures(ORIGINAL, changed)
    parsed = json.loads(differences_as_json(diffs))
    assert parsed == [{"path": "metadata.country", "was": "CZ", "is": "SA"}]

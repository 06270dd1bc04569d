"""Round-6 parity: config-file loading (TypesafeConfig/ManualConfig
behavior) and JSON-driven CLI help (CliHelp/CliHelpJsonProtocol)."""

import json

import pytest

from hermes_spark.config import DEFAULT_CONFIG, ComparisonConfig
from hermes_spark.config_file import (
    CONFIG_ENV_VAR,
    ConfigFileError,
    load_comparison_config,
    parse_hocon_lite,
)

REFERENCE_CONF = """
#
# Copyright-style header comment
#

dataset-comparison {
  errColumn = "errCol"
  actualPrefix = "actual"
  expectedPrefix = "expected"
  allowDuplicates = false
}
"""


def test_parse_reference_conf_verbatim():
    flat = parse_hocon_lite(REFERENCE_CONF)
    assert flat == {
        "dataset-comparison.errColumn": "errCol",
        "dataset-comparison.actualPrefix": "actual",
        "dataset-comparison.expectedPrefix": "expected",
        "dataset-comparison.allowDuplicates": False,
    }


def test_parse_hocon_variants():
    text = """
// C-style comment
dataset-comparison {
  errColumn: "e"          # trailing comment
  allowDuplicates = TRUE
  hashModeBroadcastRows = 42
}
other-section { ignored = "yes" }
dataset-comparison.mode = hash
"""
    flat = parse_hocon_lite(text)
    assert flat["dataset-comparison.errColumn"] == "e"
    assert flat["dataset-comparison.allowDuplicates"] is True
    assert flat["dataset-comparison.hashModeBroadcastRows"] == 42
    assert flat["dataset-comparison.mode"] == "hash"
    assert flat["other-section.ignored"] == "yes"


def test_parse_json_document():
    doc = {"dataset-comparison": {"errColumn": "E", "allowDuplicates": True}}
    flat = parse_hocon_lite(json.dumps(doc))
    assert flat == {
        "dataset-comparison.errColumn": "E",
        "dataset-comparison.allowDuplicates": True,
    }


def test_unsupported_hocon_rejected():
    with pytest.raises(ConfigFileError):
        parse_hocon_lite('a = ${b}\n')
    with pytest.raises(ConfigFileError):
        parse_hocon_lite('include "other.conf"\n')
    with pytest.raises(ConfigFileError):
        parse_hocon_lite('a {\n b = 1\n')  # unclosed block


def test_load_round_trip(tmp_path):
    p = tmp_path / "app.conf"
    p.write_text(
        'dataset-comparison {\n'
        '  errColumn = "ERR"\n'
        '  actualPrefix = "act"\n'
        '  expectedPrefix = "exp"\n'
        '  allowDuplicates = true\n'
        '  mode = "hash"\n'
        '}\n'
    )
    cfg = load_comparison_config(str(p))
    assert cfg == ComparisonConfig(
        error_column_name="ERR",
        actual_prefix="act",
        expected_prefix="exp",
        allow_duplicates=True,
        mode="hash",
    )


def test_layering_defaults_file_overrides(tmp_path):
    p = tmp_path / "app.conf"
    p.write_text('dataset-comparison { errColumn = "fromFile"\n mode = "hash" }\n')
    # file over defaults
    cfg = load_comparison_config(str(p))
    assert cfg.error_column_name == "fromFile"
    assert cfg.actual_prefix == DEFAULT_CONFIG.actual_prefix
    # explicit overrides (CLI) win over the file
    cfg2 = load_comparison_config(str(p), overrides={"mode": "fast"})
    assert cfg2.mode == "fast" and cfg2.error_column_name == "fromFile"


def test_env_var_fallback(tmp_path, monkeypatch):
    p = tmp_path / "env.conf"
    p.write_text('dataset-comparison { errColumn = "fromEnv" }\n')
    monkeypatch.setenv(CONFIG_ENV_VAR, str(p))
    assert load_comparison_config().error_column_name == "fromEnv"
    # explicit path wins over the env var
    q = tmp_path / "explicit.conf"
    q.write_text('dataset-comparison { errColumn = "explicit" }\n')
    assert load_comparison_config(str(q)).error_column_name == "explicit"


def test_forbidden_chars_validated_on_load(tmp_path):
    p = tmp_path / "bad.conf"
    p.write_text('dataset-comparison { errColumn = "err Col" }\n')
    with pytest.raises(ValueError, match="forbidden characters"):
        load_comparison_config(str(p))


def test_unknown_key_in_block_raises(tmp_path):
    p = tmp_path / "typo.conf"
    p.write_text('dataset-comparison { errColum = "oops" }\n')
    with pytest.raises(ConfigFileError, match="unknown dataset-comparison"):
        load_comparison_config(str(p))


def test_missing_file_raises(tmp_path):
    with pytest.raises(ConfigFileError, match="cannot read"):
        load_comparison_config(str(tmp_path / "nope.conf"))


# --- CliHelp parity -------------------------------------------------------


def test_clihelp_tostring_matches_reference_golden():
    # Golden strings from the reference's CliHelpSuite.scala:24-47
    from hermes_spark.cli.clihelp import CliHelp, CliHelpOptions

    ch = CliHelp(
        "MyCoolRuning tool",
        "Run this after this and tadaaaaaa",
        "The most awesome app there is in the world",
        [
            CliHelpOptions("alfa", "YES", "Why?"),
            CliHelpOptions(
                "--help", "111",
                "This should help you a lot and a lot and a lot and a lot "
                "and a lot and a lot and a lot",
            ),
        ],
    )
    expected = (
        "MyCoolRuning tool\n"
        "The most awesome app there is in the world\n"
        "Run this after this and tadaaaaaa\n"
        "Options:\n"
        "alfa                      YES        Why?\n"
        "--help                    111        This should help you a lot "
        "and a lot and a lot and a lot and a lot and a lot and a lot"
    )
    assert str(ch) == expected


def test_clihelp_json_round_trip():
    from hermes_spark.cli.clihelp import COMPARE_CLI_SPEC, cli_help_from_json

    again = cli_help_from_json(COMPARE_CLI_SPEC.to_json())
    assert again == COMPARE_CLI_SPEC
    assert str(again) == str(COMPARE_CLI_SPEC)


def test_help_json_flag_exits_zero(capsys):
    from hermes_spark.cli.parser import parse_cli_parameters

    with pytest.raises(SystemExit) as exc:
        parse_cli_parameters(["--help-json"])
    assert exc.value.code == 0
    out = capsys.readouterr().out
    assert "Dataset Comparison Tool" in out
    assert '"options"' in out


def test_cli_config_flag_reaches_run(spark, tmp_path):
    # end-to-end: --config file sets the error column name in _METRICS
    import hermes_spark.cli.compare_job as job
    from hermes_spark.cli.parser import parse_cli_parameters

    ref = spark.range(5).selectExpr("id", "id * 2 AS v")
    ref.write.mode("overwrite").parquet(str(tmp_path / "ref"))
    ref.withColumn("v", ref.v + (ref.id % 2)).write.mode("overwrite").parquet(
        str(tmp_path / "new")
    )
    conf = tmp_path / "cmp.conf"
    conf.write_text('dataset-comparison { errColumn = "diffReasons" }\n')
    cli = parse_cli_parameters(
        [
            "--format", "parquet",
            "--ref-path", str(tmp_path / "ref"),
            "--new-path", str(tmp_path / "new"),
            "--out-path", str(tmp_path / "out"),
            "--keys", "id",
            "--config", str(conf),
        ]
    )
    assert cli.config_path == str(conf)
    from hermes_spark.exceptions import DatasetsDifferException

    with pytest.raises(DatasetsDifferException):
        job.run(spark, cli)
    diff = spark.read.parquet(str(tmp_path / "out"))
    assert "diffReasons" in diff.columns

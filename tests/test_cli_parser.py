"""CLI prefix-routing tests, mirroring the reference's
``CliParametersParserSuite`` / ``ParametersSuite`` coverage."""

import pytest

from hermes_spark.cli.parser import parse_cli_parameters
from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.parameters import Parameters


def test_generic_options_route_to_both_sides():
    cli = parse_cli_parameters(
        "--format csv --ref-path /r --new-path /n --out-path /o".split()
    )
    assert cli.reference.format == "csv"
    assert cli.reference.path == "/r"
    assert cli.actual.format == "csv"
    assert cli.actual.path == "/n"
    # output format is NOT inherited from generic format: defaults to parquet
    assert cli.output.format == "parquet"
    assert cli.output.path == "/o"


def test_prefixed_overrides_generic():
    cli = parse_cli_parameters(
        "--format csv --new-format json --path /x --out-path /o".split()
    )
    assert cli.reference.format == "csv"
    assert cli.actual.format == "json"
    assert cli.reference.path == "/x"
    assert cli.actual.path == "/x"


def test_keys_and_schema():
    cli = parse_cli_parameters(
        "--format parquet --path /x --out-path /o --keys a,b --schema /s".split()
    )
    assert cli.keys == ("a", "b")
    assert cli.schema_path == "/s"


def test_reader_options_pass_through():
    cli = parse_cli_parameters(
        "--format csv --delimiter ; --header true --path /x --out-path /o".split()
    )
    assert cli.reference.options["delimiter"] == ";"
    assert cli.reference.options["header"] == "true"


def test_jdbc_requires_dbtable():
    with pytest.raises(MissingArgumentException) as err:
        Parameters.validate_and_create({"format": "jdbc"})
    assert "dbtable" in str(err.value)
    params = Parameters.validate_and_create(
        {"format": "jdbc", "dbtable": "t", "url": "jdbc:x"}
    )
    assert params.path == "t"


def test_missing_format_error_is_enriched():
    with pytest.raises(MissingArgumentException) as err:
        parse_cli_parameters("--path /x --out-path /o".split())
    assert '"--format" or "--ref-format"' in str(err.value)


def test_missing_path_error_is_enriched():
    with pytest.raises(MissingArgumentException) as err:
        parse_cli_parameters("--format csv --ref-path /r --out-path /o".split())
    assert '"--path" or "--new-path"' in str(err.value)


def test_odd_arg_count_rejected():
    with pytest.raises(MissingArgumentException):
        parse_cli_parameters(["--format", "csv", "--path"])


def test_mode_and_allow_duplicates_options():
    from hermes_spark.cli.parser import parse_cli_parameters

    cli = parse_cli_parameters(
        [
            "--format", "parquet", "--ref-path", "/r", "--new-path", "/n",
            "--out-path", "/o", "--keys", "id",
            "--mode", "auto", "--allow-duplicates", "true",
        ]
    )
    assert cli.mode == "auto"
    assert cli.allow_duplicates is True
    # comparison-level options must NOT leak into reader options
    assert "mode" not in cli.reference.options
    assert "allow-duplicates" not in cli.actual.options


def test_mode_defaults_to_none():
    from hermes_spark.cli.parser import parse_cli_parameters

    cli = parse_cli_parameters(
        ["--format", "parquet", "--ref-path", "/r", "--new-path", "/n",
         "--out-path", "/o"]
    )
    assert cli.mode is None and cli.allow_duplicates is False


def test_common_columns_option():
    from hermes_spark.cli.parser import parse_cli_parameters

    cli = parse_cli_parameters(
        ["--format", "parquet", "--ref-path", "/r", "--new-path", "/n",
         "--out-path", "/o", "--common-columns", "true"]
    )
    assert cli.common_columns is True
    assert "common-columns" not in cli.reference.options

"""CLI argument parsing with ``--ref-* / --new-* / --out-*`` prefix routing.

Reproduces the behavior of
``datasetComparison/.../cliUtils/CliParametersParser.scala:62-133``:

- args come in ``--key value`` pairs (count must be even; a single arg
  prints help);
- ``--keys a,b`` → comparison keys; ``--schema path`` → cherry-pick schema;
- every other un-prefixed option is *generic* and is merged into all three
  routed maps as a default (``format`` is NOT defaulted into the output
  map — the output format defaults to parquet instead,
  CliParametersParser.scala:51,73);
- prefixed options override generics after the 4-char prefix is dropped;
- missing format/path errors are enriched with the prefixed alternative
  (e.g. ``"--format" or "--ref-format"``, CliParametersParser.scala:160-168).
"""

from __future__ import annotations

import re

from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.parameters import CliParameters, Parameters

_REF_PREFIX = "ref-"
_NEW_PREFIX = "new-"
_OUT_PREFIX = "out-"
_OUTPUT_DEFAULTS = {"format": "parquet"}

HELP_TEXT = """Dataset comparison options (all as "--key value" pairs):
  --format FORMAT        input format for both sides (csv/json/parquet/xml/avro/jdbc/...)
  --path PATH            input path for both sides
  --ref-format/--ref-path/--ref-<option>   reference-side overrides
  --new-format/--new-path/--new-<option>   actual-side overrides
  --out-format/--out-path/--out-<option>   output overrides (format defaults to parquet)
  --keys A,B             comparison key columns (optional; whole-row hash without)
  --schema PATH          cherry-pick Spark JSON schema restricting the comparison
  --mode MODE            comparison mode: fast (default) / hash / auto / reference
  --config PATH          HOCON/JSON file with dataset-comparison defaults
                         (also via $HERMES_SPARK_CONFIG; CLI flags win)
  --allow-duplicates BOOL   allow duplicate keys on both sides (default false)
  --common-columns BOOL  compare only columns both sides share (schema-evolution tolerant)
  --incremental-partition-col COL  digest partitions first; diff only changed ones
  any other --option value is passed to the Spark DataFrameReader/Writer
"""


def _args_to_map(args: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for i in range(0, len(args), 2):
        key, value = args[i], args[i + 1]
        if not key.startswith("--"):
            raise MissingArgumentException(
                f'Expected an option starting with "--", got {key!r}'
            )
        out[key[2:]] = value
    return out


def _route(options: dict[str, str]) -> tuple[dict, dict, dict, dict]:
    ref = {k[4:]: v for k, v in options.items() if k.startswith(_REF_PREFIX)}
    new = {k[4:]: v for k, v in options.items() if k.startswith(_NEW_PREFIX)}
    out = {k[4:]: v for k, v in options.items() if k.startswith(_OUT_PREFIX)}
    generic = {
        k: v
        for k, v in options.items()
        if not k.startswith((_REF_PREFIX, _NEW_PREFIX, _OUT_PREFIX))
        and k not in ("keys", "schema", "mode", "allow-duplicates", "common-columns", "incremental-partition-col", "config")
    }
    return ref, new, out, generic


def _enrich_message(message: str, key_prefix: str) -> str:
    match = re.match(r'(.*) ("--[a-z\-]+")', message)
    if not match:
        return message
    extracted, key = match.groups()
    enriched = key[:3] + key_prefix + key[3:]
    return f"{extracted} {key} or {enriched}"


def _load_options(options: dict[str, str], key_prefix: str) -> Parameters:
    try:
        return Parameters.validate_and_create(options)
    except MissingArgumentException as exc:
        raise MissingArgumentException(
            _enrich_message(str(exc), key_prefix)
        ) from exc


def parse_cli_parameters(
    args: list[str], require_output: bool = True
) -> CliParameters:
    """Parse compare-job CLI args into a :class:`CliParameters` bundle."""
    if not args:
        raise MissingArgumentException("No arguments for reader and writer passed")
    if len(args) == 1:
        if args[0] == "--help-json":
            # reference CliHelp parity: structured help rendered from the
            # JSON spec, plus the machine-readable spec itself
            from hermes_spark.cli.clihelp import COMPARE_CLI_SPEC

            print(COMPARE_CLI_SPEC)
            print(COMPARE_CLI_SPEC.to_json())
            raise SystemExit(0)
        print(HELP_TEXT)
        if args[0] == "--help":
            raise SystemExit(0)
        raise MissingArgumentException(
            "Single unknown argument provided. Printed help"
        )
    if len(args) % 2 != 0:
        raise MissingArgumentException(
            "Number of arguments must be either one, for help, or even"
        )

    options = _args_to_map(args)
    schema = options.get("schema")
    keys = tuple(options["keys"].split(",")) if "keys" in options else ()
    mode = options.get("mode")
    allow_duplicates = options.get("allow-duplicates", "false").lower() in (
        "true", "1", "yes",
    )
    common_columns = options.get("common-columns", "false").lower() in (
        "true", "1", "yes",
    )
    incremental_partition_col = options.get("incremental-partition-col")
    config_path = options.get("config")

    ref_map, new_map, out_map, generic = _route(options)
    ref_merged = {**generic, **ref_map}
    new_merged = {**generic, **new_map}
    generic_no_format = {k: v for k, v in generic.items() if k != "format"}
    out_merged = {**_OUTPUT_DEFAULTS, **generic_no_format, **out_map}

    reference = _load_options(ref_merged, _REF_PREFIX)
    actual = _load_options(new_merged, _NEW_PREFIX)
    output = _load_options(out_merged, _OUT_PREFIX) if require_output else None

    return CliParameters(
        reference=reference,
        actual=actual,
        output=output,
        keys=keys,
        raw_options=" ".join(args),
        schema_path=schema,
        mode=mode,
        allow_duplicates=allow_duplicates,
        common_columns=common_columns,
        incremental_partition_col=incremental_partition_col,
        config_path=config_path,
    )

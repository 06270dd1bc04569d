"""Source/sink descriptors.

Mirrors ``datasetComparison/.../dataFrame/Parameters.scala:19-47`` (the
``(format, options, path)`` triple with jdbc's ``dbtable``-instead-of-path
rule) and ``cliUtils/CliParameters.scala:21-26`` (the ref/actual/out trio
plus keys and optional cherry-pick schema path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from hermes_spark.exceptions import MissingArgumentException
from hermes_spark.sources.s3location import validate_path


@dataclass(frozen=True)
class Parameters:
    """A single source or sink: Spark DataSource format + options + path.

    For ``format == "jdbc"`` the ``path`` carries the ``dbtable`` value and
    is not passed to ``load()``/``save()`` (reference
    ``dataFrame/Utils.scala:30-38``).
    """

    format: str
    options: dict[str, str] = field(default_factory=dict)
    path: str = ""

    @classmethod
    def validate_and_create(cls, options: dict[str, str]) -> "Parameters":
        if "format" not in options:
            raise MissingArgumentException(
                'Format is mandatory option. Use "--format"'
            )
        fmt = options["format"]
        if fmt == "jdbc":
            if "dbtable" not in options:
                raise MissingArgumentException(
                    'DB table name is mandatory option for format type jdbc. '
                    'Use "--dbtable"'
                )
            path = options["dbtable"]
        else:
            if "path" not in options:
                raise MissingArgumentException(
                    'Path is mandatory option for all format types except '
                    'jdbc. Use "--path"'
                )
            # fail fast on malformed S3 URIs (reference S3Location.scala:28-43)
            path = validate_path(options["path"])
        other = {k: v for k, v in options.items() if k not in ("format", "path")}
        return cls(format=fmt, options=other, path=path)

    @classmethod
    def validate_with_defaults_and_create(
        cls, options: dict[str, str], defaults: dict[str, str]
    ) -> "Parameters":
        return cls.validate_and_create({**defaults, **options})


@dataclass(frozen=True)
class CliParameters:
    """Parsed CLI bundle: reference + actual (+ optional output) sources,
    comparison keys, the raw arg string, and an optional cherry-pick
    schema path (reference ``cliUtils/CliParameters.scala:21-26``)."""

    reference: Parameters
    actual: Parameters
    output: Optional[Parameters] = None
    keys: tuple[str, ...] = ()
    raw_options: str = ""
    schema_path: Optional[str] = None
    #: extensions beyond the reference CLI: execution mode + duplicate
    #: gate + schema-evolution tolerant column intersection
    mode: Optional[str] = None
    allow_duplicates: bool = False
    common_columns: bool = False
    incremental_partition_col: Optional[str] = None
    #: ``--config`` file with comparator defaults (reference parity:
    #: TypesafeConfig's ``-Dconfig.file`` override path)
    config_path: Optional[str] = None

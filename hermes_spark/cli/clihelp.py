"""JSON-driven CLI help rendering.

Reference parity: ``datasetComparison/.../cliUtils/CliHelp.scala`` +
``CliHelpJsonProtocol.scala`` render structured help from a JSON spec
(``src/main/resources/cli_options.json``).  The layout is pinned to the
reference's ``toString`` formats: option rows are
``f"$key%-26s$optional%-11s$text"`` and the block is
``title \\n description \\n example \\n Options: \\n <rows>`` (note the
description/example order — the reference prints description BEFORE the
example even though the constructor takes example first).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Sequence


@dataclass(frozen=True)
class CliHelpOptions:
    """One option row (reference ``CliHelp.scala:19-21``)."""

    key: str
    optional: str
    text: str

    def __str__(self) -> str:
        return f"{self.key:<26}{self.optional:<11}{self.text}"


@dataclass(frozen=True)
class CliHelp:
    """The full help block (reference ``CliHelp.scala:23-31``)."""

    title: str
    example: str
    description: str
    options: Sequence[CliHelpOptions]

    def __str__(self) -> str:
        rows = "\n".join(str(o) for o in self.options)
        return (
            f"{self.title}\n{self.description}\n{self.example}\n"
            f"Options:\n{rows}"
        )

    def to_json(self) -> str:
        """Round-trip back to the JSON wire format
        (``CliHelpJsonProtocol.scala``)."""
        return json.dumps(
            {
                "title": self.title,
                "example": self.example,
                "description": self.description,
                "options": [
                    {"key": o.key, "optional": o.optional, "text": o.text}
                    for o in self.options
                ],
            },
            indent=2,
        )


def cli_help_from_json(text: str) -> CliHelp:
    """Deserialize a ``cli_options.json``-shaped document."""
    doc = json.loads(text)
    return CliHelp(
        title=doc["title"],
        example=doc["example"],
        description=doc["description"],
        options=tuple(
            CliHelpOptions(o["key"], o["optional"], o["text"])
            for o in doc["options"]
        ),
    )


#: this engine's compare-command spec, mirroring the shape (and the
#: shared rows) of the reference's ``cli_options.json``
COMPARE_CLI_SPEC = CliHelp(
    title="Dataset Comparison Tool",
    example="python -m hermes_spark.cli compare [OPTIONS]",
    description=(
        "Dataset comparison is a command line tool for comparison of two "
        "different data sets"
    ),
    options=(
        CliHelpOptions("--[ref|new|out]-format", "mandatory", "Format of the sources"),
        CliHelpOptions(
            "--out-path", "mandatory",
            "Path where will the difference output will be writen to",
        ),
        CliHelpOptions(
            "--new-path|--new-dbtable", "mandatory",
            "Path to the newly created source or name of the table",
        ),
        CliHelpOptions(
            "--ref-path|--ref-dbtable", "mandatory",
            "Path to the referential source or name of the table",
        ),
        CliHelpOptions(
            "--keys", "optional",
            "Unique columns that will be used as an anchor for data "
            "comparison. Without them, the comparison cannot give paths "
            "to differences",
        ),
        CliHelpOptions(
            "--schema", "optional",
            "A schema path on HDFS. This will allow to cherry pick columns "
            "from the two data sets to compare",
        ),
        CliHelpOptions(
            "--mode", "optional",
            "Comparison execution mode: fast (default) / hash / auto / "
            "reference",
        ),
        CliHelpOptions(
            "--config", "optional",
            "HOCON or JSON config file with dataset-comparison defaults "
            "(also via $HERMES_SPARK_CONFIG)",
        ),
        CliHelpOptions(
            "others", "optional",
            "Options like delimiter, header, rowTag, user, password, url, "
            "... These are the specific options for specific formats used. "
            "For more information, check sparks documentation on what all "
            "the options for the format you are using",
        ),
    ),
)

"""Fixed-width text reader.

The reference bundles the ``za.co.absa:spark-fixed-width`` datasource
(``project/Dependencies.scala:63-66``, README format list). Rather than
porting a custom DataSource V2, we express it as a plain projection over
``spark.read.text``: one ``substring`` per column — fully pushdown/
codegen-friendly, no Python in the row path.

Column spec: ordered ``(name, width)`` pairs, or the CLI option form
``"name1:5,name2:12"``. Values are trimmed by default (``trimValues`` in
the reference datasource); types come from an optional Spark schema
applied by cast after slicing.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def parse_widths_option(option: str) -> list[tuple[str, int]]:
    """``"id:4,name:12"`` → ``[("id", 4), ("name", 12)]``."""
    out = []
    for part in option.split(","):
        name, _, width = part.rpartition(":")
        out.append((name, int(width)))
    return out


def read_fixed_width(
    spark: SparkSession,
    path: str,
    widths: Sequence[tuple[str, int]],
    trim: bool = True,
    schema: Optional[StructType] = None,
) -> DataFrame:
    """Read a fixed-width text file into typed columns."""
    lines = spark.read.text(path)
    cols = []
    offset = 1  # substring() is 1-based
    by_name = {f.name: f.dataType for f in schema.fields} if schema else {}
    for name, width in widths:
        col = F.substring(F.col("value"), offset, width)
        if trim:
            col = F.trim(col)
        if name in by_name:
            col = col.cast(by_name[name])
        cols.append(col.alias(name))
        offset += width
    return lines.select(*cols)

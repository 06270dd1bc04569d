"""Corpus-level boilerplate line removal (the C4-style cleanup pass).

Navigation bars, cookie banners and footers repeat verbatim across many
pages; per-document filters can't see them. This operator counts each
normalized line's document frequency across the corpus and strips lines
that appear in too many documents, reassembling the remaining lines in
their original order.

Dataflow: posexplode lines -> docfreq per normalized line (one shuffle
on the line hash) -> anti-join the boilerplate set (broadcast — the
high-frequency tail is small by definition) -> groupBy doc re-assembly
(one shuffle on the doc id). Text travels the shuffles once each way;
the line-frequency table never materializes raw text beyond distinct
lines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_line(line: Column) -> Column:
    return F.trim(F.lower(line))


def boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 3
) -> DataFrame:
    """Normalized lines appearing in at least ``min_docs`` distinct
    documents: ``(line, n_docs)``."""
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("__line"),
    )
    return (
        lines.select("__id", _norm_line(F.col("__line")).alias("line"))
        .filter(F.col("line") != "")
        .groupBy("line")
        .agg(F.count_distinct("__id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str, min_docs: int = 3
) -> DataFrame:
    """Remove corpus-boilerplate lines from every document; all other
    columns pass through, ``text_col`` is rebuilt with the surviving
    lines in original order. A document whose EVERY line was boilerplate
    drops out entirely (nothing left to reassemble)."""
    boiler = boilerplate_lines(df, id_col, text_col, min_docs).select(
        F.col("line").alias("__boiler")
    )
    exploded = df.select(
        "*", F.posexplode(F.split(F.col(text_col), "\n")).alias("__pos", "__line")
    )
    kept = exploded.join(
        F.broadcast(boiler),
        _norm_line(exploded["__line"]) == boiler["__boiler"],
        how="left_anti",
    )
    other_cols = [c for c in df.columns if c != text_col]
    rebuilt = (
        kept.groupBy(*[F.col(c) for c in other_cols])
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias(text_col)
        )
    )
    return rebuilt.select(*df.columns)

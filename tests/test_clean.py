"""Text repair (functions/clean.py)."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.functions.clean import (
    MOJIBAKE_MAP,
    clean_text,
    damage_stats,
    fix_mojibake,
    normalize_unicode_spaces,
    strip_control_chars,
)


def _run(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r.o for r in df.select(col_fn(F.col("s")).alias("o")).collect()]


def test_every_mojibake_pair_repairs(spark):
    bads = [f"x{bad}y" for bad, _ in MOJIBAKE_MAP]
    outs = _run(spark, fix_mojibake, bads)
    for (bad, good), out in zip(MOJIBAKE_MAP, outs):
        assert out == f"x{good}y", (bad, good, out)


def test_smart_quote_sentence(spark):
    s = "Itâ€™s â€œfineâ€\x9d â€” says MÃ¼ller, cafÃ© rÃ©sumÃ©"
    (out,) = _run(spark, fix_mojibake, [s])
    assert out == "It’s “fine” — says Müller, café résumé"


def test_control_chars(spark):
    (out,) = _run(spark, strip_control_chars, ["a\x00b\x07c\td\ne\rf\x7fg"])
    assert out == "abc\td\ne\rfg"


def test_unicode_spaces_and_zero_width(spark):
    (out,) = _run(
        spark, normalize_unicode_spaces, ["a b c​d﻿e　f"]
    )
    assert out == "a b c" + "de f"


def test_clean_text_idempotent(spark):
    damaged = "Ã©tÃ© â€¦\x07end​"
    (once,) = _run(spark, clean_text, [damaged])
    (twice,) = _run(spark, lambda c: clean_text(clean_text(c)), [damaged])
    assert once == "été …end" and once == twice


def test_clean_on_clean_is_noop(spark):
    vals = ["already clean text", "tabs\tand\nnewlines stay", ""]
    assert _run(spark, clean_text, vals) == vals


def test_damage_stats(spark):
    df = spark.createDataFrame(
        [("cafÃ©",), ("clean",)], "s string"
    ).select(damage_stats(F.col("s")).alias("d"))
    rows = [r.d.asDict() for r in df.collect()]
    assert rows[0] == {"changed": True, "len_before": 5, "len_after": 4}
    assert rows[1] == {"changed": False, "len_before": 5, "len_after": 5}

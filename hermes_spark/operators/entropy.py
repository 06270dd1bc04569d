"""Shannon-entropy quality signals over document text.

Extension beyond reference parity (the reference has no text analytics;
see ``SURVEY.md`` §2 extension table): character- and token-level entropy
are classic cheap quality filters for LLM training corpora — gibberish
and encoding damage score HIGH char entropy, boilerplate and template
spam score LOW token entropy, and both are robust to document length.

Scale design (100 TB):

* The text column never shuffles. Stage 1 explodes to ``(id, unit)``
  pairs and counts per ``(id, unit)`` — a hash aggregate whose map-side
  partial combine collapses each document's repeats BEFORE the exchange,
  so the shuffle carries ~(distinct units per doc) rows of
  (8 B id, small string, 8 B count), not one row per character.
* Stage 2 re-aggregates by id (second narrow exchange) folding counts
  into ``-sum(p * log2 p)``; both stages are built-in hash aggregates
  with whole-stage codegen, zero Python.
* Entropy is computed from exact counts (no sketch): the formula is
  pure double arithmetic, so a SQL oracle reproduces it bit-for-bit
  (rounded to 6 dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import segment_unsegmented, tokens


def unit_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    unit: str = "char",
    script_aware: bool = False,
) -> DataFrame:
    """Per-document Shannon entropy (bits/unit) of the unit distribution.

    ``unit='char'`` splits into single characters; ``unit='token'``
    into lowercased whitespace tokens. Returns ``(id, n_units,
    distinct_units, entropy_bits)``; documents with no units (empty or
    whitespace-only text) are absent from the output.

    ``script_aware=True`` (r12, token path only) char-tokenizes
    unsegmented-script runs first — a CJK page otherwise collapses to
    ~1 token with entropy 0 and reads as template spam.  The char path
    is script-fair already; Latin text identical either way.
    """
    if unit == "char":
        units = F.split(F.col(text_col), "")
    elif unit == "token":
        low = F.lower(F.col(text_col))
        if script_aware:
            low = segment_unsegmented(low)
        units = tokens(low)
    else:
        raise ValueError(f"unit must be 'char' or 'token', got {unit!r}")

    exploded = df.select(F.col(id_col), F.explode(units).alias("__u")).filter(
        F.col("__u") != ""
    )
    counted = exploded.groupBy(id_col, "__u").agg(
        F.count(F.lit(1)).alias("__c")
    )
    n = F.sum("__c").cast("double")
    # -sum(c/n * log2(c/n)) == log2(n) - sum(c*log2(c))/n : the second
    # form folds in one pass without needing n inside the per-row term
    plogp = F.sum(F.col("__c").cast("double") * F.log2(F.col("__c").cast("double")))
    return counted.groupBy(id_col).agg(
        F.sum("__c").alias("n_units"),
        F.count(F.lit(1)).alias("distinct_units"),
        F.round(F.log2(n) - plogp / n, 6).alias("entropy_bits"),
    )


def entropy_profile(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Char- and token-entropy side by side: ``(id, char_entropy,
    token_entropy, chars_per_token)`` — the joint signal separates
    'binary junk' (high char, high token) from 'template spam' (normal
    char, low token) better than either alone. Two narrow aggregates
    joined on id (both sides are one row per doc)."""
    ch = unit_entropy(df, id_col, text_col, unit="char").select(
        F.col(id_col),
        F.col("n_units").alias("n_chars"),
        F.col("entropy_bits").alias("char_entropy"),
    )
    tk = unit_entropy(df, id_col, text_col, unit="token").select(
        F.col(id_col),
        F.col("n_units").alias("n_tokens"),
        F.col("entropy_bits").alias("token_entropy"),
    )
    return ch.join(tk, id_col, "inner").select(
        id_col,
        "char_entropy",
        "token_entropy",
        F.round(F.col("n_chars") / F.col("n_tokens").cast("double"), 6).alias(
            "chars_per_token"
        ),
    )

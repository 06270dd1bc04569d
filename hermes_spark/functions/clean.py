"""Text repair: mojibake fixes, control-char stripping, whitespace
normalization (ftfy-lite).

Extension beyond reference parity (see ``SURVEY.md`` §2 extension
table). Web-crawled corpora are full of UTF-8 text that was decoded as
cp1252/Latin-1 somewhere upstream and re-encoded — the classic
"â€™" for "’", "Ã©" for "é" damage — plus control characters and
exotic whitespace that break tokenizers and dedup keys. This module is
the deterministic, expression-only repair pass that runs before any
fingerprinting: every transform is a chain of literal ``replace`` /
portable ``regexp_replace`` calls (RE2-safe character classes, no
backreferences), so it is JVM-side, codegen-fused, zero-shuffle, and
reproducible in any engine.

Scope is the high-frequency damage, not full ftfy: the ~25 cp1252
mojibake sequences that cover the vast majority of observed cases.
Unknown damage passes through unchanged (no guessing)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "MOJIBAKE_MAP",
    "fix_mojibake",
    "strip_control_chars",
    "normalize_unicode_spaces",
    "clean_text",
    "damage_stats",
]

#: (damaged, repaired) pairs, applied IN ORDER — longer sequences
#: first so e.g. "â€™" is consumed before any "â€" prefix rule could
#: split it. UTF-8 bytes of the target char read as cp1252.
MOJIBAKE_MAP: tuple = (
    ("â€™", "’"),
    ("â€˜", "‘"),
    ("â€œ", "“"),
    ("â€\x9d", "”"),
    ("â€“", "–"),
    ("â€”", "—"),
    ("â€¦", "…"),
    ("â€¢", "•"),
    ("Ã©", "é"),
    ("Ã¨", "è"),
    ("Ãª", "ê"),
    ("Ã¡", "á"),
    ("Ã ", "à"),  # true cp1252 damage: 0xC3 0xA0 -> Ã + NBSP
    ("Ã ", "à"),  # fallback once spaces were already normalized
    ("Ã¢", "â"),
    ("Ã³", "ó"),
    ("Ã²", "ò"),
    ("Ã´", "ô"),
    ("Ãº", "ú"),
    ("Ã¼", "ü"),
    ("Ã¶", "ö"),
    ("Ã¤", "ä"),
    ("Ã±", "ñ"),
    ("Ã§", "ç"),
    ("Ã\x9f", "ß"),
    ("Â«", "«"),
    ("Â»", "»"),
    ("Â°", "°"),
    ("Â ", " "),  # UTF-8 NBSP read as cp1252: Â + real NBSP
    ("Â ", " "),  # stray Â before an NBSP already turned into a space
)

#: C0/C1 control characters except tab/newline/carriage-return.
_CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

#: Unicode spaces normalized to ASCII space; zero-widths deleted.
_SPACE_CLASS = "[\u00A0\u1680\u2000-\u200A\u202F\u205F\u3000]"
_ZERO_WIDTH_CLASS = "[\u200B\u200C\u200D\u2060\uFEFF]"


def fix_mojibake(col: Column) -> Column:
    """Apply the ordered cp1252-mojibake repair table."""
    out = col
    for bad, good in MOJIBAKE_MAP:
        out = F.replace(out, F.lit(bad), F.lit(good))
    return out


def strip_control_chars(col: Column) -> Column:
    """Delete C0/C1 controls (keeps tab / newline / CR)."""
    return F.regexp_replace(col, _CONTROL_CLASS, "")


def normalize_unicode_spaces(col: Column) -> Column:
    """NBSP & friends -> ASCII space; zero-width characters deleted."""
    return F.regexp_replace(
        F.regexp_replace(col, _SPACE_CLASS, " "), _ZERO_WIDTH_CLASS, ""
    )


def clean_text(col: Column) -> Column:
    """Full repair pass: mojibake -> controls -> spaces. Idempotent
    (a second application is a no-op on already-clean text)."""
    return normalize_unicode_spaces(strip_control_chars(fix_mojibake(col)))


def damage_stats(col: Column) -> Column:
    """``struct(changed boolean, len_before, len_after)`` — the cheap
    corpus-health signal: fraction of changed docs per source tells
    you which upstream feed has the broken decoder."""
    cleaned = clean_text(col)
    return F.struct(
        (cleaned != col).alias("changed"),
        F.length(col).cast("long").alias("len_before"),
        F.length(cleaned).cast("long").alias("len_after"),
    )

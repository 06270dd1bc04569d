"""C4-style line-level cleaning rules (Raffel et al. '20, §2.2).

Extension beyond reference parity (the reference has no text analytics;
see ``SURVEY.md`` §2 extension table).  Where the Gopher rules
(:mod:`hermes_spark.operators.gopher`) GATE whole documents, the C4
rules EDIT them: boilerplate lines are dropped line-by-line and only
structurally poisoned documents are removed outright.  The two compose:
C4-clean first (line edits change the Gopher ratios), gate second.

Line rules (drop the line):
* does not end in terminal punctuation (``.``, ``!``, ``?``, ``"``,
  ``'``) — navigation/menu fragments;
* fewer than ``min_line_words`` words;
* contains a cookie/javascript boilerplate marker.

Document rules (drop the document):
* contains ``{`` or ``}`` (source code);
* contains ``lorem ipsum``;
* fewer than ``min_lines`` surviving lines.

Scale design (100 TB): one text scan, all line edits are array
expressions (``split`` → ``filter`` → ``array_join``) inside
whole-stage codegen — zero shuffles, zero UDFs (plan-asserted), and the
document drops prune scan-side.  RE2-portable regexes only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    EXPLICIT_WS,
    NO_TERMINAL_SCRIPTS,
    SCRIPT_MIN_RATIO,
    UNSEGMENTED_CLASS,
    UNSEGMENTED_SCRIPTS,
    has_unsegmented_chars,
    units_from_counts,
    unsegmented_script_counts,
)

#: Lowercase substrings that mark a line as web boilerplate.
C4_LINE_MARKERS = ("javascript", "cookie policy", "privacy policy", "terms of use")

#: Lowercase substrings that poison the whole document.
C4_DOC_MARKERS = ("lorem ipsum",)

_TERMINAL = r'[.!?"\x27]$'

#: Unsegmented-script terminal punctuation — a Chinese/Japanese
#: sentence never ends in an ASCII period: ideographic full stop /
#: fullwidth !?…, closing corner brackets, plus (r12) Khmer khan ។ and
#: bariyoosan ៕, Myanmar section ။, Tibetan shad ། and nyis shad ༎.
#: Thai and Lao use no terminal punctuation at all, so for lines those
#: scripts dominate the terminal rule is length-gated instead (a whole
#: clause's worth of letters), mirroring how mC4 relaxed the "end in
#: punctuation" rule outside Latin scripts.
_TERMINAL_UNSEG = r'[。！？…」』។៕။།༎]$'


def _keep_line(min_line_words: int, script_aware: bool = False):
    def cond(line: Column) -> Column:
        t = F.trim(line)
        ends_ok = t.rlike(_TERMINAL)
        long_enough = F.size(F.split(t, r"\s+")) >= min_line_words
        low = F.lower(t)
        marked = F.lit(False)
        for m in C4_LINE_MARKERS:
            marked = marked | low.contains(m)
        keep = ends_ok & long_enough & ~marked
        if not script_aware:
            return keep
        # line-level script switch: a line whose non-ws chars are
        # mostly unsegmented-script letters gets char-proxy length +
        # script terminals.  Units include embedded ASCII words at 2
        # chars/word (r12, matching gopher's proxy — a mixed line above
        # the switch ratio previously got zero credit for its Latin
        # words and could be dropped despite having enough real words).
        nonspace = F.greatest(
            F.length(F.regexp_replace(t, EXPLICIT_WS + "+", "")), F.lit(1)
        )
        n_unseg = F.size(F.regexp_extract_all(t, F.lit(UNSEGMENTED_CLASS), 0))
        is_unseg = (
            n_unseg.cast("double") / nonspace.cast("double")
            >= F.lit(float(SCRIPT_MIN_RATIO))
        )
        counts = unsegmented_script_counts(t)
        ascii_l = F.size(
            F.regexp_extract_all(t, F.lit("[A-Za-z]"), 0)
        ).cast("long")
        units = units_from_counts(counts, ascii_l)
        long_enough_u = units >= min_line_words
        no_term = None
        term_scripts = None
        for name in UNSEGMENTED_SCRIPTS:
            if name in NO_TERMINAL_SCRIPTS:
                no_term = counts[name] if no_term is None else no_term + counts[name]
            else:
                term_scripts = (
                    counts[name] if term_scripts is None
                    else term_scripts + counts[name]
                )
        ends_ok_u = t.rlike(_TERMINAL) | t.rlike(_TERMINAL_UNSEG) | (
            # Thai/Lao (no terminal punctuation): a full clause of letters
            (no_term > term_scripts)
            & (units >= F.lit(max(min_line_words, 5)))
        )
        keep_unseg = ends_ok_u & long_enough_u & ~marked
        # Latin fast screen (r12): lines with no unsegmented char take
        # the plain rule after one first-match rlike — identical
        # decisions (zero such chars means is_unseg is false anyway)
        return F.when(
            has_unsegmented_chars(t),
            F.when(is_unseg, keep_unseg).otherwise(keep),
        ).otherwise(keep)

    return cond


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_words: int = 3,
    min_lines: int = 1,
    keep_cols: tuple[str, ...] = (),
    script_aware: bool = False,
) -> DataFrame:
    """Line-filtered corpus: ``(id, text, n_lines_in, n_lines_kept)``.

    ``text`` is the surviving lines re-joined with newlines; documents
    failing a document rule (code braces, lorem ipsum, too few
    surviving lines) are REMOVED from the output.  Deterministic and
    engine-reproducible (pure string/array expressions).  ``keep_cols``
    carries extra metadata columns through the projection — re-joining
    them afterwards would cost a shuffle (and is not even expressible
    on a stream).  ``script_aware=True`` (round 11) switches
    Han/Kana/Thai-dominant LINES to a char-proxy length rule and CJK
    terminal punctuation (see :func:`_keep_line`); Latin lines are
    judged identically either way.
    """
    text = F.col(text_col)
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    kept = F.filter(lines, _keep_line(min_line_words, script_aware))

    low = F.lower(text)
    doc_poisoned = low.contains("{") | low.contains("}")
    for m in C4_DOC_MARKERS:
        doc_poisoned = doc_poisoned | low.contains(m)

    out = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.array_join(kept, "\n").alias(text_col),
        F.size(lines).cast("long").alias("n_lines_in"),
        F.size(kept).cast("long").alias("n_lines_kept"),
        doc_poisoned.alias("__poisoned"),
    )
    return (
        out.filter(~F.col("__poisoned") & (F.col("n_lines_kept") >= min_lines))
        .drop("__poisoned")
    )


def c4_line_stats(
    df: DataFrame, id_col: str, text_col: str, min_line_words: int = 3,
    script_aware: bool = False,
) -> DataFrame:
    """Per-document line-survival metrics WITHOUT editing the corpus:
    ``(id, n_lines_in, n_lines_kept, keep_ratio, doc_poisoned)`` — the
    monitoring view of :func:`c4_clean` (same rules, nothing dropped),
    for dashboards that track boilerplate rates per source over time.
    """
    text = F.col(text_col)
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    kept = F.filter(lines, _keep_line(min_line_words, script_aware))
    low = F.lower(text)
    poisoned = low.contains("{") | low.contains("}")
    for m in C4_DOC_MARKERS:
        poisoned = poisoned | low.contains(m)
    n_in = F.size(lines).cast("long")
    n_kept = F.size(kept).cast("long")
    return df.select(
        F.col(id_col),
        n_in.alias("n_lines_in"),
        n_kept.alias("n_lines_kept"),
        F.round(
            n_kept.cast("double") / F.greatest(n_in, F.lit(1)).cast("double"), 6
        ).alias("keep_ratio"),
        poisoned.alias("doc_poisoned"),
    )

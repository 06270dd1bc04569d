"""Chat/SFT conversation-format operators.

Extension beyond reference parity (the reference has no chat surface;
see ``SURVEY.md`` §2 extension table). Instruction-tuning datasets are
conversations — ``array<struct<role,content>>`` columns — and the
curation checks differ from plain-document checks: is the turn
structure well-formed (user first, strict alternation, ends on the
assistant), how much of the token mass is assistant-authored (the part
loss is computed on), and is the conversation a duplicate of another
up to whitespace.

Everything here is built from Spark higher-order array functions
(``transform`` / ``filter`` / ``zip_with`` / ``forall`` /
``aggregate``) over the turns column — per-row, JVM-side, zero
shuffles and zero Python. The only shuffle in the family is the
groupBy inside :func:`dedup_conversations`, keyed on the 16-byte
fingerprint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count, word_units

__all__ = [
    "turns_from_text",
    "conversation_stats",
    "conversation_fingerprint",
    "dedup_conversations",
    "last_assistant_reply",
]


def turns_from_text(
    text_col: Column, sep: str = r"\.", roles: tuple = ("user", "assistant")
) -> Column:
    """Build a synthetic ``array<struct<role,content>>`` by splitting
    ``text_col`` on ``sep`` and alternating roles — a test/demo
    adapter for corpora stored as flat text (real chat data arrives
    already structured). Empty fragments are dropped BEFORE role
    assignment so alternation is well-defined."""
    frags = F.filter(
        F.transform(F.split(text_col, sep), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    n_roles = len(roles)
    role_arr = F.array(*[F.lit(r) for r in roles])
    zipped = F.zip_with(
        frags,
        F.sequence(F.lit(0), F.greatest(F.size(frags) - 1, F.lit(0))),
        lambda c, i: F.struct(
            F.element_at(role_arr, (i % n_roles) + 1).alias("role"),
            c.alias("content"),
        ),
    )
    # guard the no-fragment case: sequence(0, 0) would otherwise zip a
    # phantom (null-content, role[0]) turn out of the empty array
    return F.when(F.size(frags) == 0, F.slice(zipped, 1, 0)).otherwise(zipped)


def conversation_stats(
    df: DataFrame, turns_col: str = "turns", id_col: str = "doc_id",
    script_aware: bool = False,
) -> DataFrame:
    """Per-conversation structural report:

    ``(id, n_turns, starts_with_user, ends_with_assistant, alternates,
    all_nonempty, assistant_tokens, total_tokens, assistant_share,
    well_formed)`` — ``alternates`` checks every adjacent pair changes
    role; ``assistant_share`` is assistant tokens / total (6 dp; 0.0
    for an empty conversation); ``well_formed`` is the conjunction the
    SFT loader would gate on.  ``script_aware=True`` (round 11) counts
    tokens with the :func:`~hermes_spark.functions.text.word_units`
    proxy so Han/Kana/Thai turns contribute real weight to
    ``assistant_share`` instead of ~1 token each; the structural flags
    are token-free and identical either way."""
    t = F.col(turns_col)
    # both slices length size-1 (zip_with would null-pad a shorter side);
    # the greatest() floor only guards the n<=1 branch never taken below
    pair_len = F.greatest(F.size(t) - 1, F.lit(1))
    adjacent_ok = F.forall(
        F.zip_with(
            F.slice(t, 1, pair_len),
            F.slice(t, 2, pair_len),
            lambda a, b: a["role"] != b["role"],
        ),
        lambda x: x,
    )
    starts = F.when(F.size(t) > 0, F.element_at(t, 1)["role"] == "user").otherwise(
        F.lit(False)
    )
    ends = F.when(
        F.size(t) > 0, F.element_at(t, -1)["role"] == "assistant"
    ).otherwise(F.lit(False))
    # coalesce: a NULL content must read as a violation (False), not
    # poison the conjunction to NULL
    nonempty = F.forall(
        t, lambda x: F.coalesce(F.trim(x["content"]) != "", F.lit(False))
    )
    counter = word_units if script_aware else token_count
    tok = lambda c: counter(c)  # noqa: E731
    assistant_toks = F.aggregate(
        F.filter(t, lambda x: x["role"] == "assistant"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + tok(x["content"]),
    )
    total_toks = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + tok(x["content"])
    )
    alternates = F.when(F.size(t) <= 1, F.size(t) == 1).otherwise(adjacent_ok)
    well_formed = starts & ends & alternates & nonempty & (F.size(t) >= 2)
    return df.select(
        F.col(id_col),
        F.size(t).cast("long").alias("n_turns"),
        starts.alias("starts_with_user"),
        ends.alias("ends_with_assistant"),
        alternates.alias("alternates"),
        nonempty.alias("all_nonempty"),
        assistant_toks.alias("assistant_tokens"),
        total_toks.alias("total_tokens"),
        F.round(
            assistant_toks / F.greatest(total_toks, F.lit(1)).cast("double"), 6
        ).alias("assistant_share"),
        well_formed.alias("well_formed"),
    )


def conversation_fingerprint(turns_col: Column) -> Column:
    """md5 over the whitespace-normalized ``role\\x1f content\\x1e``
    turn serialization — two conversations equal up to inter-token
    whitespace collide, formatting-distinct ones don't."""
    norm = F.transform(
        turns_col,
        lambda x: F.concat_ws(
            "\x1f",
            x["role"],
            F.regexp_replace(F.trim(x["content"]), r"\s+", " "),
        ),
    )
    return F.md5(F.array_join(norm, "\x1e"))


def dedup_conversations(
    df: DataFrame, turns_col: str = "turns", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one conversation (min id) per fingerprint — exact dedup up
    to whitespace normalization. One shuffle on the 16-byte hash."""
    fp = conversation_fingerprint(F.col(turns_col))
    keyed = df.withColumn("__fp", fp)
    keep = keyed.groupBy("__fp").agg(F.min(id_col).alias(id_col))
    return keyed.join(keep, [ "__fp", id_col], "inner").drop("__fp")


def last_assistant_reply(turns_col: Column) -> Column:
    """Content of the final assistant turn (NULL if none) — the target
    completion for single-target SFT extraction."""
    assistant = F.filter(turns_col, lambda x: x["role"] == "assistant")
    return F.when(
        F.size(assistant) > 0, F.element_at(assistant, -1)["content"]
    )

"""Span-level exact substring duplication (dedup of repeated passages).

Extension beyond reference parity (see ``SURVEY.md`` §2 extension
table). Substring-level dedup in the style of Lee et al., "Deduplicating
Training Data Makes Language Models Better" (arXiv:2107.06499): find
every MAXIMAL run of ≥ ``min_tokens`` consecutive tokens shared verbatim
between two documents. Whole-document and near-dup dedup miss these —
a news article quoted inside an otherwise-unique page, license
boilerplate mid-document, copy-pasted code blocks.

Algorithm (all built-in expressions — no suffix array needed for the
fixed-minimum-length variant):

1. Slide a ``gram`` window of ``n = min_tokens`` tokens over each
   document and hash each window with the engine-portable 60-bit hash →
   ``(doc, pos, ghash)``. Two documents share an ≥n-token span iff they
   share a run of consecutive equal grams.
2. Group by ``ghash`` and pair up documents inside each group
   (gather-and-pair with a ``max_docs_per_gram`` cap — a gram sitting
   in thousands of documents is boilerplate, and pairing it would be
   quadratic; the cap mirrors ``minhash_lsh_pairs``).
3. A shared span lies on a DIAGONAL: consecutive shared grams have
   ``pos_a - pos_b`` constant. Within each ``(id_a, id_b, diag)``
   partition, consecutive ``pos_a`` values (step 1) belong to one
   maximal span; the classic islands trick (``pos_a - row_number()``)
   labels them without iteration.
4. One aggregate per island → ``(id_a, id_b, start_a, start_b,
   span_tokens)`` with ``span_tokens = gram_count + n - 1``.

Scale design (100 TB):

* Everything is explode → hash aggregate / window on narrow rows
  (id, pos, 8-byte hash); the document text never shuffles.
* The only quadratic surface — in-gram pairing — is capped and
  happens map-side inside the gathered array (no self-join of the
  exploded frame; same shape the minhash/simhash operators use).
  Boilerplate grams are dropped BEFORE gathering via a broadcast
  anti-join against the (tiny) hot-gram set, so no aggregation buffer
  ever holds an ultra-hot gram's member list.
* The islands window partitions by ``(id_a, id_b, diag)`` — millions
  of tiny partitions, no Zipf key (a hot gram contributes pairs, not a
  hot window partition).
* Exact counts + deterministic hashing → reproducible in ANSI SQL;
  the operator is oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import fast_hash64, portable_hash64
from ..functions.text import segment_unsegmented, tokens

__all__ = ["gram_positions", "duplicate_spans", "span_dedup_stats"]


def gram_positions(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    portable: bool = True,
    script_aware: bool = False,
) -> DataFrame:
    """``(id, pos, ghash)`` — hash of the ``n``-token window starting at
    0-based token position ``pos``. Documents shorter than ``n`` tokens
    yield no rows.  ``script_aware=True`` (round 11) segments
    Han/Kana/Thai text per character first, so substring dedup sees
    character n-grams for unsegmented scripts — without it a CJK doc
    is ONE token and produces no grams at all."""
    # materialize the token array first: the slice inside the per-gram
    # lambda references it as a free variable, and Spark inlines free
    # variables — a raw split(...) there would re-tokenize per gram
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    toked = df.select(F.col(id_col), tokens(low).alias("__toks"))
    toks = F.col("__toks")
    n_tokens = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n_tokens - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    grams = F.when(n_tokens < n, F.array().cast("array<string>")).otherwise(grams)
    hashed = (
        F.transform(grams, lambda g: portable_hash64(g))
        if portable
        else F.transform(grams, lambda g: fast_hash64(g))
    )
    return toked.select(
        F.col(id_col), F.posexplode(hashed).alias("pos", "ghash")
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
    portable: bool = True,
    max_docs_per_gram: int = 50,
    script_aware: bool = False,
    checkpoint_grams: bool = True,
) -> DataFrame:
    """Maximal verbatim token spans (≥ ``min_tokens``) shared between
    document pairs.  ``script_aware`` as in :func:`gram_positions`
    (token offsets then count each Han/Kana/Thai CHARACTER as one
    token for unsegmented text).

    Returns ``(id_a, id_b, start_a, start_b, span_tokens)`` with
    ``id_a < id_b`` and 0-based token offsets; one row per maximal
    span per diagonal. Within-document repeats are ignored (pairs only
    cross documents). Grams occurring in more than
    ``max_docs_per_gram`` documents are treated as boilerplate and
    skipped — strip them first (``strip_boilerplate_lines``) if those
    spans matter.

    Hash collisions: the 60-bit gram hash makes a false shared-gram
    ~2^-60 per pair; at corpus scale verify hits downstream if exact
    guarantees are required (the reference-style rematerialize check).

    ``checkpoint_grams`` (round 13, default on) materializes the gram
    stream once instead of running the tokenize + per-gram hash pass
    twice (hot-gram census + kept branch) — measured −23% at sf0.1,
    and at scale the recompute is a second full corpus scan.  The
    materialized rows are narrow (id, pos, 8-byte hash) but one per
    token position; turn it off if executor storage is tighter than a
    recompute, or if the returned frame must survive executor loss
    (localCheckpoint truncates lineage).
    """
    grams = gram_positions(
        df, id_col, text_col, min_tokens, portable, script_aware
    )
    if checkpoint_grams:
        grams = grams.localCheckpoint(eager=False)
    # Drop boilerplate grams BEFORE gathering: filtering after
    # collect_list would still build one aggregation buffer per hot
    # gram (a gram in millions of documents = an OOM-sized buffer).
    # The hot set itself is tiny — corpus-wide boilerplate phrases —
    # so it broadcast-anti-joins onto the gram stream; doc_freq is an
    # algebraic aggregate (map-side combined, skew-immune).
    hot = (
        grams.groupBy("ghash")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") > max_docs_per_gram)
        .select("ghash")
    )
    kept = grams.join(F.broadcast(hot), "ghash", "left_anti")
    # gather (doc, pos) per surviving gram map-side, pair inside the
    # array — no exploded self-join
    gathered = kept.groupBy("ghash").agg(
        F.collect_list(F.struct(F.col(id_col).alias("id"), "pos")).alias("__m")
    )
    capped = gathered.filter(F.size("__m") >= 2)
    pairs = (
        capped.select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "__m",
                            lambda a: F.transform(
                                F.col("__m"),
                                lambda b: F.struct(
                                    a["id"].alias("id_a"),
                                    b["id"].alias("id_b"),
                                    a["pos"].alias("pos_a"),
                                    b["pos"].alias("pos_b"),
                                ),
                            ),
                        )
                    ),
                    lambda p: p["id_a"] < p["id_b"],
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.pos_a", "p.pos_b")
        # no dedup needed: (doc, pos) carries exactly one gram, so a
        # given (id_a, id_b, pos_a, pos_b) can only arise from one group
    )
    diag = (F.col("pos_a") - F.col("pos_b")).alias("__diag")
    w = Window.partitionBy("id_a", "id_b", "__diag").orderBy("pos_a")
    islands = pairs.select("id_a", "id_b", "pos_a", "pos_b", diag).withColumn(
        "__island", F.col("pos_a") - F.row_number().over(w)
    )
    return islands.groupBy("id_a", "id_b", "__diag", "__island").agg(
        F.min("pos_a").alias("start_a"),
        F.min("pos_b").alias("start_b"),
        (F.count(F.lit(1)) + F.lit(min_tokens - 1)).alias("span_tokens"),
    ).select("id_a", "id_b", "start_a", "start_b", "span_tokens")


def span_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
    portable: bool = True,
    max_docs_per_gram: int = 50,
    script_aware: bool = False,
    checkpoint_grams: bool = True,
) -> DataFrame:
    """Per-document duplicated-span exposure: how much of each document
    is covered by verbatim spans shared with ANY other document.

    Returns ``(id, n_tokens, dup_spans, dup_span_tokens, max_span)``
    where ``dup_span_tokens`` sums maximal-span lengths touching the
    document (both sides of each pair count; overlapping spans on
    different diagonals each count — an upper bound on coverage).
    """
    spans = duplicate_spans(
        df, id_col, text_col, min_tokens, portable, max_docs_per_gram,
        script_aware, checkpoint_grams,
    )
    sides = spans.select(
        F.col("id_a").alias(id_col), F.col("span_tokens")
    ).unionByName(spans.select(F.col("id_b").alias(id_col), F.col("span_tokens")))
    per_doc = sides.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum("span_tokens").alias("dup_span_tokens"),
        F.max("span_tokens").alias("max_span"),
    )
    lengths = df.select(
        F.col(id_col),
        F.size(tokens(
            segment_unsegmented(F.lower(F.col(text_col))) if script_aware
            else F.lower(F.col(text_col))
        )).cast("long").alias("n_tokens"),
    )
    return lengths.join(per_doc, id_col, "left").select(
        id_col,
        "n_tokens",
        F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
        F.coalesce("dup_span_tokens", F.lit(0)).cast("long").alias("dup_span_tokens"),
        F.coalesce("max_span", F.lit(0)).cast("long").alias("max_span"),
    )

"""Exact set-similarity join with prefix filtering (PPJoin-style).

Extension operator (the reference has no similarity joins; SURVEY.md §2
extension table). Complements the *approximate* near-dup stack
(MinHash/SimHash banding in ``operators/dedup.py``): this join returns
EXACTLY the pairs with token-set Jaccard >= t — no banding recall loss —
while still never materializing the all-pairs cross product.

Prefix filtering (Chaudhuri et al., ICDE'06; Xiao et al., WWW'08
"PPJoin"): order every document's distinct tokens by a global canonical
order (rarest first), and keep only each document's first
``n - ceil(t*n) + 1`` tokens as its *prefix*. Any pair with Jaccard >= t
must overlap by ``i >= t*max(|A|,|B|)`` tokens, which forces at least
one SHARED PREFIX token under the common order — so candidate pairs are
generated only inside per-token buckets of prefix tokens, and rare-first
ordering keeps those buckets small. The filter is lossless: the exact
verify stage can only REMOVE candidates, never miss a qualifying pair.

Scale shape (100 TB):

* one scan tokenizes; token document-frequencies are a map-side-combined
  aggregate (term-sized, not corpus-sized);
* the candidate join is keyed on single prefix tokens — the classic
  bucket join, with bucket sizes driven by the rarest tokens of each
  doc, plus integer length pruning ``t*|A| <= |B| <= |A|/t`` applied
  inside the join before any pair materializes;
* the exact verify touches candidate pairs only, comparing two sorted
  token arrays per pair (``array_intersect``), never raw text.

All threshold arithmetic is integer (threshold scaled by 1e4), because
``ceil(0.7 * n)`` in floating point is engine-dependent at exact
multiples; the oracle replays the identical integer expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import segment_unsegmented, tokens

#: threshold scale: Jaccard thresholds resolve to 1e-4
THRESHOLD_DENOM = 10_000


def jaccard_set_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard: float = 0.7,
    stats: "dict | None" = None,
    script_aware: bool = False,
    checkpoint_index: bool = True,
) -> DataFrame:
    """All pairs ``(id_a, id_b, n_a, n_b, n_common, jaccard)`` with
    ``id_a < id_b`` and distinct-token Jaccard >= ``min_jaccard``.
    The cut is exact integer arithmetic on the UNROUNDED ratio at 1e-4
    threshold granularity; the ``jaccard`` column is rounded to 6 dp
    for display only.

    Exact — returns every qualifying pair — but candidate generation is
    prefix-filtered, not all-pairs (see module docstring).
    ``script_aware=True`` (r12) char-tokenizes unsegmented-script runs
    first — a CJK doc's token SET is otherwise ~1 element and its
    Jaccard degenerate; Latin text identical either way.

    ``checkpoint_index=True`` (default; measured ~5x on the bench
    corpus, round 12) materializes the tokenize + df-count join +
    rare-first-sort index ONCE via ``localCheckpoint`` instead of
    recomputing it for the candidate branch and both verify sides.
    Caveats (round 13, mirrors ``containment_join``): lineage is
    truncated, so executor loss/decommission makes the returned frame
    unrecomputable, checkpoint blocks linger until RDD GC, and the
    checkpointed table is a full-corpus executor-storage
    materialization — pass ``False`` to trade the 3x recompute for
    zero storage footprint (the right call when executor storage is
    the binding constraint).
    """
    if not 0.0 < min_jaccard <= 1.0:
        raise ValueError(f"min_jaccard must be in (0, 1], got {min_jaccard}")
    t_scaled = int(round(min_jaccard * THRESHOLD_DENOM))

    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.array_distinct(tokens(low))).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    # canonical rare-first order: (document frequency asc, term asc);
    # per-doc array sorted by that order via struct sort.  df_t comes
    # from a count window over the term partition (round 13): ONE
    # exchange of the gram stream instead of the former groupBy+join
    # shape's two (aggregate exchange + join-side re-exchange) —
    # measured −44% on the containment bench query.  Skew exposure is
    # identical (a hot term lands in one task either way).
    ordered = (
        toks.withColumn(
            "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df_t", "term"))),
                lambda s: s["term"],
            ).alias("terms")
        )
        .withColumn("n", F.size("terms").cast("long"))
    )
    # ceil(t*n) in exact integer arithmetic: (t_scaled*n + DENOM-1) div DENOM
    ceil_tn = (
        (F.col("n") * F.lit(t_scaled) + F.lit(THRESHOLD_DENOM - 1))
        / F.lit(THRESHOLD_DENOM)
    ).cast("long")
    docs = ordered.withColumn(
        "prefix", F.slice(F.col("terms"), 1, (F.col("n") - ceil_tn + 1).cast("int"))
    )
    # materialize the PPJoin index table once (round 12) — see
    # containment_join; the candidate branch and both verify sides
    # otherwise each re-run the explode + df-count join + per-doc sort
    if checkpoint_index:
        docs = docs.localCheckpoint(eager=False)

    pre = docs.select(
        "doc_id", "n", F.posexplode("prefix").alias("pos", "term")
    )
    a = pre.select(
        F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"),
        F.col("pos").alias("pos_a"), "term",
    )
    b = pre.select(
        F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"),
        F.col("pos").alias("pos_b"), "term",
    )
    shj = a.hint("shuffle_hash") if checkpoint_index else a
    cand = (
        # shuffled hash join on the gram key (round 12) — see
        # containment_join: keeps the quadratic in-bucket pairing at
        # shuffle-partition parallelism instead of the checkpointed docs
        # table's coalesced partition count
        shj.join(b, on="term")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # length pruning, integer form of t*na <= nb and t*nb <= na
            & (F.col("n_a") * t_scaled <= F.col("n_b") * THRESHOLD_DENOM)
            & (F.col("n_b") * t_scaled <= F.col("n_a") * THRESHOLD_DENOM)
            # PPJoin positional filter (round 13, lossless — see
            # containment_join): with 0-indexed match positions, shared
            # tokens beyond this one fit in min(n_a - pos_a, n_b -
            # pos_b) - 1 slots, bounding the overlap c for the pair's
            # FIRST shared token (which for a qualifying pair lies in
            # BOTH prefixes, so its row survives).  Qualifying needs
            # c*(DENOM + t) >= t*(n_a + n_b) (c/(na+nb-c) >= t in
            # integers), so prune when even the bound cannot reach it.
            & (
                F.least(
                    F.col("n_a") - F.col("pos_a"),
                    F.col("n_b") - F.col("pos_b"),
                )
                * (THRESHOLD_DENOM + t_scaled)
                >= (F.col("n_a") + F.col("n_b")) * t_scaled
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    if stats is not None:
        # instrumentation for pruning-effectiveness probes: materialize
        # the candidate set once (the verify join below reuses it) and
        # record how far below n^2/2 the prefix filter landed
        cand = cand.localCheckpoint(eager=True)
        stats["candidates"] = cand.count()
        stats["docs"] = docs.count()

    # order-insensitive verify: without the checkpoint, skip the
    # df-count window + canonical sort in the verify recomputes
    # (see containment_join, round 13)
    if checkpoint_index:
        vdocs = docs
    else:
        vdocs = toks.groupBy("doc_id").agg(
            F.collect_set("term").alias("terms")
        ).withColumn("n", F.size("terms").cast("long"))
    left = vdocs.select(
        F.col("doc_id").alias("id_a"),
        F.col("terms").alias("__ta"),
        F.col("n").alias("n_a"),
    )
    right = vdocs.select(
        F.col("doc_id").alias("id_b"),
        F.col("terms").alias("__tb"),
        F.col("n").alias("n_b"),
    )
    verified = (
        cand.join(left, on="id_a")
        .join(right, on="id_b")
        .withColumn(
            "n_common", F.size(F.array_intersect("__ta", "__tb")).cast("long")
        )
        # the CUT is exact integer arithmetic on the unrounded ratio
        # (n_common/(n_a+n_b-n_common) >= t_scaled/DENOM) — prefix
        # filtering guarantees candidates for TRUE similarity >= t, so
        # cutting on the 6-dp ROUNDED value would re-admit pairs in
        # [t-5e-7, t) only when they happened to share a prefix token
        # (data-dependent).  The rounded value is output-only.
        .filter(
            F.col("n_common") * THRESHOLD_DENOM
            >= F.lit(t_scaled) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
    )
    return verified.select("id_a", "id_b", "n_a", "n_b", "n_common", "jaccard")


def _word_ngrams(col, n: int):
    """Distinct word n-grams (space-joined) of a lowercased text column."""
    toks = tokens(F.lower(col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # shorter-than-n docs: the whole token string is the single gram
    whole = F.array(F.concat_ws(" ", toks))
    return F.array_distinct(
        F.when(F.size(toks) < n, whole).otherwise(grams)
    )


def containment_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_containment: float = 0.8,
    ngram: int = 3,
    stats: "dict | None" = None,
    checkpoint_index: bool = False,
) -> DataFrame:
    """Asymmetric containment pairs: ``(id_a, id_b, n_a, n_b, n_common,
    containment)`` where ``containment = |A ∩ B| / |A| >=
    min_containment`` over distinct word ``ngram``-gram sets (``id_a !=
    id_b``; both directions can appear — containment is directional).

    The doc-inside-doc detector Jaccard misses: a paragraph fully
    quoted inside a 100x-longer page has tiny Jaccard but containment
    1.0 from the paragraph's side. Word n-grams (not single tokens)
    keep the element space distinctive on small vocabularies.

    Prefix filtering adapts to the asymmetry: ``i >= t*|A|`` bounds only
    the CONTAINED side, so A contributes its ``|A| - ceil(t*|A|) + 1``
    rarest grams and B is indexed on ALL grams — candidates are pairs
    sharing one of A's rare grams, plus nothing else (no length pruning
    exists for the containing side; that is inherent to containment).
    Lossless, same integer threshold arithmetic as
    :func:`jaccard_set_join`.
    """
    if not 0.0 < min_containment <= 1.0:
        raise ValueError(
            f"min_containment must be in (0, 1], got {min_containment}"
        )
    t_scaled = int(round(min_containment * THRESHOLD_DENOM))

    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_word_ngrams(F.col(text_col), ngram)).alias("term"),
    ).filter(F.col("term") != "")
    # df_t via a count window over the term partition (round 13): one
    # gram-stream exchange instead of groupBy+join's two — see
    # jaccard_set_join; identical values, measured −44% on this query
    ordered = (
        grams.withColumn(
            "df_t", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df_t", "term"))),
                lambda s: s["term"],
            ).alias("terms")
        )
        .withColumn("n", F.size("terms").cast("long"))
    )
    ceil_tn = (
        (F.col("n") * F.lit(t_scaled) + F.lit(THRESHOLD_DENOM - 1))
        / F.lit(THRESHOLD_DENOM)
    ).cast("long")
    docs = ordered.withColumn(
        "prefix", F.slice(F.col("terms"), 1, (F.col("n") - ceil_tn + 1).cast("int"))
    )
    # ``checkpoint_index=True`` materializes the tokenized/ordered docs
    # table once for the candidate branch and both verify sides — the
    # right shape when the index recompute (3 scans + wide shuffles)
    # dominates, i.e. large corpora.  Default OFF: the round-12
    # interleaved A/B at sf0.1 measured plain 10.2 s vs checkpointed
    # 11.0 s — at small scale the overlapping recomputes are cheaper
    # than serializing the (AQE-coalesced) index materialization, and
    # unlike the Jaccard join the containment candidate join indexes
    # ALL grams, so its wall is pair volume, not the index.
    if checkpoint_index:
        docs = docs.localCheckpoint(eager=False)
    pre_a = docs.select(
        F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"),
        F.posexplode("prefix").alias("pos_a", "term"),
    )
    all_b = docs.select(
        F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"),
        F.posexplode("terms").alias("pos_b", "term"),
    )
    lhs = pre_a.hint("shuffle_hash") if checkpoint_index else pre_a
    cand = (
        # with the checkpointed index the docs table is AQE-coalesced to
        # few partitions and a broadcast candidate join would run the
        # quadratic in-bucket pairing at the probe side's starved
        # parallelism — the shuffle_hash hint spreads the exploded rows
        # by gram (build side = the rare prefix grams); without the
        # checkpoint AQE's own choice measured fastest (round 12)
        lhs.join(all_b, on="term")
        .filter(
            (F.col("id_a") != F.col("id_b"))
            # size prune: i <= n_b and i >= t*n_a force n_b >= t*n_a —
            # a short doc can never contain a long one's required overlap
            & (F.col("n_b") * THRESHOLD_DENOM >= F.col("n_a") * t_scaled)
            # PPJoin positional filter (round 13, lossless): both gram
            # arrays share the global rare-first order, so when the
            # matched gram sits at 0-indexed position pos_b of B, every
            # LATER shared gram lies in B's remaining n_b - pos_b slots
            # — an upper bound on |A ∩ B| for the pair's FIRST shared
            # gram, which for a qualifying pair is always inside A's
            # prefix (positions 1..|prefix_a| cover the first shared
            # gram whenever overlap >= ceil(t*n_a)) and so always
            # generates a candidate row that passes.  The A-side bound
            # n_a - pos_a >= ceil(t*n_a) holds for every prefix
            # position by construction, so only B's side can prune.
            & (
                (F.col("n_b") - F.col("pos_b")) * THRESHOLD_DENOM
                >= F.col("n_a") * t_scaled
            )
        )
        .select("id_a", "id_b")
        .distinct()
    )
    if stats is not None:
        cand = cand.localCheckpoint(eager=True)
        stats["candidates"] = cand.count()
        stats["docs"] = docs.count()
    # verify needs each doc's distinct gram SET and size only —
    # array_intersect is order-insensitive, so without the checkpoint
    # the two verify branches use a frame with NO df-count window and
    # NO canonical sort (round 13: each full-index recompute measured
    # ~1.7 s vs ~0.8 s for the set-only frame; the plain shape
    # recomputes its index for every branch)
    if checkpoint_index:
        vdocs = docs
    else:
        vdocs = grams.groupBy("doc_id").agg(
            F.collect_set("term").alias("terms")
        ).withColumn("n", F.size("terms").cast("long"))
    left = vdocs.select(
        F.col("doc_id").alias("id_a"), F.col("terms").alias("__ta"),
        F.col("n").alias("n_a"),
    )
    right = vdocs.select(
        F.col("doc_id").alias("id_b"), F.col("terms").alias("__tb"),
        F.col("n").alias("n_b"),
    )
    return (
        cand.join(left, on="id_a")
        .join(right, on="id_b")
        .withColumn(
            "n_common", F.size(F.array_intersect("__ta", "__tb")).cast("long")
        )
        # unrounded integer cut (see jaccard_set_join): lossless against
        # the prefix filter's TRUE-similarity guarantee; rounded value
        # is output-only
        .filter(
            F.col("n_common") * THRESHOLD_DENOM >= F.lit(t_scaled) * F.col("n_a")
        )
        .withColumn(
            "containment", F.round(F.col("n_common") / F.col("n_a"), 6)
        )
        .select("id_a", "id_b", "n_a", "n_b", "n_common", "containment")
    )

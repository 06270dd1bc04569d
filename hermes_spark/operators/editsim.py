"""Edit-distance similarity join (Levenshtein near-duplicate pairs).

Extension beyond reference parity (the reference has no fuzzy-match
surface; see ``SURVEY.md`` §2 extension table). The classic
data-cleaning / record-linkage primitive the set-similarity joins
(``operators/setjoin.py``) don't cover: token-ORDER-sensitive
near-matches on short strings — titles, names, URLs, product codes —
where "jaccard of token sets" is blind (anagram-like reorderings) and
character edits are the right distance.

Scale design (100 TB):

* Never all-pairs. Candidates come from deterministic prefix blocking
  (share the first ``prefix_len`` normalized characters) — the same
  single-shuffle gather-and-pair shape as ``blocking_key_pairs``:
  one groupBy on the block key, in-task pair generation from the
  gathered array, ``max_block_size`` caps pathological blocks.
* Length pruning inside the block: ``|len(a) - len(b)| > max_distance``
  can never pass, so the O(len^2) Levenshtein DP only runs on pairs
  that survive the integer length check.
* Strings are normalized (lower, whitespace-collapsed) and TRUNCATED
  to ``match_len`` chars before anything else — this operator is for
  short-string keys; running Levenshtein on whole documents is the
  wrong tool (use MinHash/SimHash/spans for that). The truncation also
  bounds both the shuffle width and the DP cost per pair.
* Recall caveat (inherent to prefix blocking): a pair whose edits fall
  inside the first ``prefix_len`` characters lands in different blocks
  and is missed. Lower ``prefix_len`` (or block on a domain key —
  e.g. url host — via ``block``) to trade recall for block size.
* Capped blocks are SALVAGED, not dropped: members of a block larger
  than ``max_block_size`` get a second blocking pass on two finer keys
  — the extended prefix (first ``2*prefix_len`` chars) and the
  content-anchored suffix (last ``prefix_len`` chars, indel-robust
  because it is measured from the END of the string) — the same
  collapse-don't-drop move as the MinHash mega-bucket fix
  (``dedup.py``). A residue pair is missed only when it has edits in
  BOTH the ``(prefix_len, 2*prefix_len]`` region AND the final
  ``prefix_len`` chars; in particular every exact-duplicate (distance
  0) pair is always recalled. :func:`edit_block_stats` reports what
  the cap costs AFTER salvage.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_distance_pairs", "edit_block_stats", "normalized_short_key"]


def normalized_short_key(text_col: Column, match_len: int = 40) -> Column:
    """Lowercased, whitespace-collapsed, trimmed, truncated match key.

    The normalization reads only the first ``4 * match_len`` RAW chars:
    whitespace collapse can only shrink text, so that window covers the
    full ``match_len`` normalized chars unless more than 3/4 of the
    window is whitespace (in which case the key is simply shorter —
    deterministically, on every engine). Bounding the regex input is
    what makes key extraction O(match_len) instead of O(document):
    running lower+trim+regex over a megabyte-long document to produce a
    40-char key would dominate the whole join at corpus scale."""
    return F.substring(
        F.regexp_replace(
            F.lower(F.trim(F.substring(text_col, 1, 4 * match_len))),
            r"\s+",
            " ",
        ),
        1,
        match_len,
    )


def edit_block_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    prefix_len: int = 8,
    match_len: int = 40,
    max_block_size: int = 1000,
    block: Optional[Column] = None,
) -> DataFrame:
    """Coverage report for the cap in :func:`edit_distance_pairs` —
    no silent drops: run this with the SAME parameters to see exactly
    what the cap costs before trusting the pair output.

    One row: ``(n_docs, n_blocks, n_capped_blocks, n_docs_in_capped,
    n_docs_salvaged, n_docs_unpaired_final, max_block, p99_block)``.
    ``n_docs_in_capped`` counts members of over-cap primary blocks (the
    salvage tier's input); ``n_docs_salvaged`` of them land in a usable
    (2..cap) salvage block under at least one secondary key;
    ``n_docs_unpaired_final`` is the true residual the cap still costs
    AFTER salvage. A large final residual means the blocking key is too
    coarse for this corpus — widen ``prefix_len`` or switch to a domain
    ``block`` key rather than raising the cap."""
    s = normalized_short_key(F.col(text_col), match_len)
    blk = block if block is not None else F.substring(s, 1, prefix_len)
    keyed = df.select(
        F.col(id_col).alias("__id"), s.alias("__s"), blk.alias("__blk")
    ).filter(F.length("__s") > 0)
    sizes = keyed.groupBy("__blk").agg(F.count(F.lit(1)).alias("n"))
    capped = F.col("n") > max_block_size
    primary = sizes.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(capped.cast("long")).cast("long").alias("n_capped_blocks"),
        F.sum(F.when(capped, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_docs_in_capped"),
        F.max("n").cast("long").alias("max_block"),
        F.percentile_approx("n", 0.99).cast("long").alias("p99_block"),
    )
    # mirror the salvage tier of edit_distance_pairs over the residue
    residue = keyed.join(
        sizes.filter(capped).select("__blk"), "__blk"
    ).select("__id", "__s")
    skeys = residue.select(
        "__id",
        F.explode(_salvage_keys(F.col("__s"), prefix_len)).alias("__sk"),
    )
    ssizes = skeys.groupBy("__sk").agg(F.count(F.lit(1)).alias("sn"))
    usable = (F.col("sn") >= 2) & (F.col("sn") <= max_block_size)
    per_doc = (
        skeys.join(ssizes, "__sk")
        .groupBy("__id")
        .agg(F.max(usable.cast("int")).alias("ok"))
    )
    salvage = per_doc.agg(
        F.coalesce(F.sum("ok"), F.lit(0)).cast("long").alias("n_docs_salvaged"),
        F.coalesce(F.sum(1 - F.col("ok")), F.lit(0))
        .cast("long")
        .alias("n_docs_unpaired_final"),
    )
    return primary.crossJoin(salvage).select(
        "n_docs",
        "n_blocks",
        "n_capped_blocks",
        "n_docs_in_capped",
        "n_docs_salvaged",
        "n_docs_unpaired_final",
        "max_block",
        "p99_block",
    )


def _pairs_from_blocks(grouped: DataFrame, max_distance: int) -> DataFrame:
    """In-task pair generation from gathered ``(__blk, __ms)`` blocks:
    sort the member array, emit upper-triangle pairs that survive the
    length prune, score with exact Levenshtein."""
    ms = F.array_sort(F.col("__ms"))  # (id, s) asc -> id_a < id_b in pairs
    pairs = F.flatten(
        F.transform(
            ms,
            lambda a, i: F.transform(
                # length pruning before the DP: |len difference| > d can
                # never be within d edits
                F.filter(
                    F.slice(ms, i + 2, F.size(ms)),
                    lambda b: F.abs(
                        F.length(a["__s"]) - F.length(b["__s"])
                    ) <= max_distance,
                ),
                lambda b: F.struct(
                    a["__id"].alias("id_a"),
                    b["__id"].alias("id_b"),
                    F.levenshtein(a["__s"], b["__s"]).alias("distance"),
                ),
            ),
        )
    )
    return (
        grouped.select(F.explode(pairs).alias("__p"))
        .select(
            "__p.id_a",
            "__p.id_b",
            F.col("__p.distance").cast("long").alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


def _salvage_keys(s: Column, prefix_len: int) -> Column:
    """The two secondary blocking keys for capped-block residue: the
    extended prefix and the content-anchored (end-measured, so
    indel-robust) suffix. Tagged so the two families can never merge."""
    return F.array(
        F.concat(F.lit("p|"), F.substring(s, 1, 2 * prefix_len)),
        F.concat(F.lit("s|"), F.substring(s, -prefix_len, prefix_len)),
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 3,
    prefix_len: int = 8,
    match_len: int = 40,
    max_block_size: int = 1000,
    block: Optional[Column] = None,
) -> DataFrame:
    """Pairs whose normalized short keys are within ``max_distance``
    Levenshtein edits, candidate-generated by prefix blocking.

    Returns ``(id_a, id_b, distance)`` with ``id_a < id_b``; distance
    is the exact Levenshtein distance between the two ``match_len``-char
    normalized keys. Pass ``block`` to replace the default
    first-``prefix_len``-chars blocking key with any expression.

    Blocks over ``max_block_size`` are not dropped: their members are
    re-blocked on the extended prefix and the end-anchored suffix (see
    module docstring) and paired there, so hot prefixes degrade recall
    gracefully instead of silently zeroing it.

    Shuffle shape (one corpus gather, NOT two): hot block keys come
    from a map-side-combined count whose over-cap survivors are at most
    ``n_docs / max_block_size`` rows — broadcast back as an anti-set.
    Each row then emits its FINAL blocking key(s) in the same pass
    (primary key if its block is under the cap, the two salvage keys
    otherwise), so the expensive gather-and-pair shuffle runs exactly
    once over the corpus. A branching design (filter grouped twice) was
    measured to re-run the full collect_list exchange per branch —
    Spark's ReuseExchange does not canonicalize the two subtrees — and
    doubled the probe wall-clock. The only post-shuffle extra is a
    pairs-sized distinct (salvage pairs can surface under both keys)."""
    s = normalized_short_key(F.col(text_col), match_len)
    # resolve the block expression against the CALLER's frame so domain
    # keys (e.g. a url-host column) work as the docstring promises
    blk = block if block is not None else F.substring(s, 1, prefix_len)
    keyed = df.select(
        F.col(id_col).alias("__id"), s.alias("__s"), blk.alias("__blk")
    ).filter(F.length("__s") > 0)
    # hot = block keys over the cap: tiny by construction (each carries
    # > max_block_size rows), map-side combined, broadcastable
    hot = (
        keyed.groupBy("__blk")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_block_size)
        .select("__blk", F.lit(True).alias("__hot"))
    )
    flagged = keyed.join(F.broadcast(hot), "__blk", "left")
    # tag the primary family ("b|") so a document whose text begins
    # with "p|"/"s|" can never merge a primary block into a salvage
    # block; the string cast is injective for atomic block types
    final_keys = F.when(
        F.col("__hot").isNull(),
        F.array(F.concat(F.lit("b|"), F.col("__blk").cast("string"))),
    ).otherwise(_salvage_keys(F.col("__s"), prefix_len))
    grouped = (
        flagged.select(
            "__id", "__s", F.explode(final_keys).alias("__k")
        )
        .groupBy("__k")
        .agg(F.collect_list(F.struct("__id", "__s")).alias("__ms"))
        .filter((F.size("__ms") >= 2) & (F.size("__ms") <= max_block_size))
    )
    # distinct: a salvage pair can co-occur under both salvage keys;
    # primary-block pairs are already unique (one key per row) and
    # distance is a pure function of the two keys, so this is an exact
    # set-dedup over pair-sized (not corpus-sized) data
    return _pairs_from_blocks(grouped, max_distance).distinct()

"""Cross-corpus n-gram language-model scoring (CCNet-style filter).

Extension beyond reference parity (the reference has no LM surface;
see ``SURVEY.md`` §2 extension table). The missing half of the LM
quality-proxy family in ``operators/tfidf.py``: ``unigram_logprob`` /
``bigram_logprob`` score a corpus under its OWN statistics, which is a
noise detector but not a domain filter. The CCNet / CC-100 recipe
trains the LM on a TRUSTED reference corpus (Wikipedia) and scores the
crawled TARGET corpus against it, bucketing documents into
head / middle / tail by perplexity — head goes to pretraining, tail is
dropped. This module is that step: train on one frame, score another.

Model: capped-vocabulary bigram LM with add-k smoothing.

* The vocabulary is the top ``vocab_size`` training terms (count desc,
  term asc — deterministic); everything else maps to ``<unk>`` at BOTH
  train and score time, so the event space is closed and every scored
  bigram has a well-defined probability.
* ``P(cur | prev) = (C(prev,cur) + k) / (C(prev,·) + k·(V+1))`` where
  ``V+1`` counts the vocab plus ``<unk>`` and ``k = k_num / k_den`` is
  kept as an integer fraction: each log argument is
  ``(k_den·C(prev,cur) + k_num) / (k_den·C(prev,·) + k_num·(V+1))`` —
  a ratio of exact int64s, so both engines feed ``ln`` the identical
  IEEE double. Each term's log-prob is quantized to a 1e-6 grid and
  summed as int64 (associative, partitioning-independent); the final
  mean is one division, rounded to 6 dp. Cross-engine agreement relies
  on the 1e-6 rounding absorbing ulp-level libm ``ln`` differences on
  identical inputs — the same honest guarantee as ``operators/logreg``.

Scale design (100 TB target corpus, bounded model):

* Context counts are at most ``V+1`` rows (every context is an
  in-vocab term or ``<unk>``) — always broadcast. The vocab list is
  ``V`` rows — always broadcast. Only the bigram-count table grows
  with training data (bounded by min(tokens, (V+1)^2) distinct pairs);
  scoring joins it on ``(prev, cur)``, broadcast when it fits
  (``broadcast_model=True``), hash-join otherwise.
* Per-frame work: bigram adjacency is built scan-side from the token
  array (``zip_with`` of the array and its shift — no token-stream
  window shuffle; round 8 removed the old posexplode→lag exchange),
  then map-side-combined count aggregations and one final per-doc
  aggregation. No driver-side collection anywhere.
* ``perplexity_ntile`` ranks with a GLOBAL window — exact and
  engine-stable, but single-partition in the ranking stage: use it for
  reports and oracle checks. The 100 TB path is
  ``bucket_by_bounds`` with thresholds taken from a sample or a
  previous run (exactly how CCNet ships per-language cutoffs).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import UNSEGMENTED_CLASS, segment_unsegmented, tokens

__all__ = [
    "NgramLM",
    "LangNgramLM",
    "lm_train",
    "lm_score",
    "lm_quantile_filter",
    "lm_train_by_lang",
    "lm_score_by_lang",
    "lm_quantile_filter_by_lang",
    "perplexity_ntile",
    "bucket_by_bounds",
    "UNK",
]

UNK = "<unk>"
_SCALE = 1_000_000.0


@dataclass(frozen=True)
class NgramLM:
    """A trained capped-vocab bigram model.

    ``vocab``: ``(term)`` — the in-vocabulary terms (no ``<unk>``).
    ``bigram_counts``: ``(prev, cur, cnt)`` over mapped train tokens.
    ``context_counts``: ``(prev, ctx_cnt)`` — occurrences of ``prev``
    with a successor; at most ``n_vocab + 1`` rows.
    ``n_vocab``: |vocab| actually selected (≤ requested size)."""

    vocab: DataFrame
    bigram_counts: DataFrame
    context_counts: DataFrame
    n_vocab: int


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str,
                 vocab: DataFrame, script_aware: bool = False) -> DataFrame:
    """``(doc_id, prev, cur)`` bigram rows with out-of-vocab terms
    collapsed to ``<unk>``.

    Adjacency is built SCAN-SIDE from the token array (``zip_with``
    over the array and its shift — ``slice(1..n-1)`` paired with
    ``slice(2..n)``), so no window shuffle of the exploded token
    stream ever happens: the original posexplode→lag formulation
    exchanged and sorted every token (~160 rows/doc) once per action,
    which at 5M docs was an ~800M-row exchange repeated by each
    consumer action (quantile, count, write).  The vocab collapse then
    joins the exploded PAIRS against the broadcast vocab once per side.
    Bigram multiset, counts, and the int64-quantized per-doc sums are
    identical — order was only ever needed to find neighbors.
    """
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    toks = F.filter(tokens(low), lambda t: t != "")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), n1),
        F.slice(toks, F.lit(2), n1),
        lambda a, b: F.struct(a.alias("p"), b.alias("c")),
    )
    bg = df.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("bg")
    ).select(
        "doc_id",
        F.col("bg.p").alias("prev_raw"),
        F.col("bg.c").alias("cur_raw"),
    )
    vp = F.broadcast(
        vocab.select(F.col("term").alias("prev_raw"), F.lit(True).alias("__pv"))
    )
    vc = F.broadcast(
        vocab.select(F.col("term").alias("cur_raw"), F.lit(True).alias("__cv"))
    )
    return (
        bg.join(vp, on="prev_raw", how="left")
        .join(vc, on="cur_raw", how="left")
        .select(
            "doc_id",
            F.when(F.col("__pv"), F.col("prev_raw"))
            .otherwise(F.lit(UNK))
            .alias("prev"),
            F.when(F.col("__cv"), F.col("cur_raw"))
            .otherwise(F.lit(UNK))
            .alias("cur"),
        )
    )


def lm_train(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 50_000,
    script_aware: bool = False,
) -> NgramLM:
    """Train the capped-vocab bigram LM on a reference corpus.

    Two passes over the token stream (vocab selection, then counting
    with OOV collapsed) — cache the input upstream if it is expensive
    to rescan. Vocab ties break on term asc, so the model is fully
    deterministic.  ``script_aware=True`` (round 11) segments
    Han/Kana/Thai text per CHARACTER first (char-level modeling, the
    standard fallback for unsegmented scripts) — without it such docs
    whitespace-tokenize to <2 tokens and are unscoreable; train and
    score must use the same setting."""
    from ..plans import rebalance_for_cpu

    df = rebalance_for_cpu(df)
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    raw = df.select(
        F.explode(tokens(low)).alias("term")
    ).filter(F.col("term") != "")
    vocab = (
        raw.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(vocab_size)
        .select("term")
    )
    n_vocab = vocab.count()
    bg = _doc_bigrams(df, id_col, text_col, vocab, script_aware)
    bigram_counts = bg.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    context_counts = bg.groupBy("prev").agg(
        F.count(F.lit(1)).alias("ctx_cnt")
    )
    return NgramLM(vocab, bigram_counts, context_counts, n_vocab)


#: Java regex \s — ASCII-only, includes \x0b; Python \s is Unicode-wide
_JAVA_WS = "[ \\t\\n\\x0b\\f\\r]+"


def _freeze_model_tables(vocab_terms, bcp, ccp, n_vocab, k_num, k_den):
    """Freeze one model's DataFrame tables into the numpy probe tables
    the arrow kernel broadcasts: ``(vidx, bg_keys, bg_cnts, ctx_arr,
    types)``.  ``vocab_terms`` is the collected term list, ``bcp`` /
    ``ccp`` the bigram/context-count pandas frames.  Shared by the
    single-model and per-language scorers so the arithmetic (dense-id
    mapping, sorted key array, 2^53 exactness assertion) cannot drift
    between them."""
    import numpy as np

    types = n_vocab + 1
    vocab_sorted = sorted(vocab_terms)
    vidx = {t: i for i, t in enumerate(vocab_sorted)}
    unk_id = vidx.get(UNK, len(vocab_sorted))
    if len(bcp):
        pi = bcp["prev"].map(vidx).fillna(unk_id).to_numpy(np.int64)
        ci = bcp["cur"].map(vidx).fillna(unk_id).to_numpy(np.int64)
        keys = pi * np.int64(types) + ci
        order = np.argsort(keys, kind="stable")
        bg_keys = keys[order]
        bg_cnts = bcp["cnt"].to_numpy(np.int64)[order]
    else:
        bg_keys = np.zeros(0, np.int64)
        bg_cnts = np.zeros(0, np.int64)
    ctx_arr = np.zeros(types, dtype=np.int64)
    if len(ccp):
        ctx_arr[ccp["prev"].map(vidx).fillna(unk_id).to_numpy(np.int64)] = (
            ccp["ctx_cnt"].to_numpy(np.int64)
        )
    _max_operand = k_den * max(
        int(bg_cnts.max()) if len(bg_cnts) else 0, int(ctx_arr.max())
    ) + max(k_num, k_num * types)
    if _max_operand >= 1 << 53:
        raise ValueError(
            f"lm arrow scorer: smoothing operand reaches {_max_operand} "
            ">= 2^53, so float64 division would no longer be exact; "
            "use score_engine='join' (exact fraction join path) or "
            "reduce k_den"
        )
    return vidx, unk_id, bg_keys, bg_cnts, ctx_arr, types


def _score_token_lists(toklists, vmap, unk, bgk, bgc, ctx_tab, types,
                       knum, kden, ktypes):
    """Vectorized per-doc scoring over already-tokenized docs under one
    frozen model — the exact r10 arrow-kernel arithmetic (dense-id
    lookup, searchsorted bigram probe, 1e-6 HALF-AWAY term grid, int64
    sums).  Returns ``(n_bigrams int64[], avg_logprob float64[])``.
    Module-level so the single-model and per-language kernels share it
    bit-for-bit."""
    import numpy as np

    typ64 = np.int64(types)
    n_keys = len(bgk)
    lens = np.fromiter((len(t) for t in toklists), np.int64, len(toklists))
    flat = np.fromiter(
        (vmap.get(t, unk) for ts in toklists for t in ts),
        np.int64,
        int(lens.sum()),
    )
    starts = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    adj = flat[:-1] * typ64 + flat[1:]
    if n_keys:
        pos = np.searchsorted(bgk, adj)
        posc = np.minimum(pos, n_keys - 1)
        cnt = np.where((pos < n_keys) & (bgk[posc] == adj), bgc[posc], 0)
    else:
        cnt = np.zeros(len(adj), np.int64)
    ctx = ctx_tab[flat[:-1]]
    x = np.log((kden * cnt + knum) / (kden * ctx + ktypes)) * _SCALE
    # HALF_UP (away from zero); x <= 0 always (p <= 1)
    q = np.where(x < 0, -np.floor(-x + 0.5), 0.0)
    q[starts[1:-1] - 1] = 0.0  # doc-boundary crossings
    s = np.add.reduceat(q, starts[:-1])
    n = (lens - 1).astype(np.float64)
    avg = s / (_SCALE * n)
    r = np.where(
        avg < 0,
        np.floor(-avg * 1e6 + 0.5) / -1e6,
        np.floor(avg * 1e6 + 0.5) / 1e6,
    )
    return (lens - 1).astype(np.int64), r


def _score_arrow(
    df: DataFrame,
    lm: NgramLM,
    id_col: str,
    text_col: str,
    k_num: int,
    k_den: int,
    script_aware: bool = False,
) -> DataFrame:
    """Zero-shuffle scoring: the bounded model (vocab + bigram +
    context counts — the user asserted it fits by broadcasting it)
    ships to every worker ONCE as a Spark broadcast, and each doc's
    bigram log-prob sum is computed in-task over the scan.  Removes
    the ~160-rows/doc explode, the bigram-count join and the per-doc
    re-aggregation shuffle of the join engine — at 5M docs that is an
    ~800M-row exchange that simply stops existing.

    Model transfer is NUMPY TABLES, not Python dicts: terms freeze to
    dense int ids driver-side, the bigram counts become a sorted
    ``prev*types+cur`` int64 key array probed with ``searchsorted``,
    and context counts a dense array indexed by prev id.  (The first
    cut broadcast the counts as a tuple-keyed dict — at a 20k vocab
    that is a multi-GB pickle unpickled once per Python worker, and
    the r9 funnel decomposition measured the stage at 758 s, 2.6x
    SLOWER than the join engine it replaced.  The same table as
    ndarrays is ~100x smaller on the wire and unpickles at
    buffer-copy speed.)  Scoring is vectorized end-to-end: one
    searchsorted + log over the batch-flattened bigram array, per-doc
    sums via ``add.reduceat`` with doc-boundary positions zeroed.
    The input is widened with ``rebalance_for_cpu`` first — the join
    engine always did this, and skipping it starved the CPU-bound
    scan on AQE-coalesced upstream writes (10 of 32 cores busy).

    Exactness: same tokenization (Spark ``trim`` strips 0x20 only;
    Java ``\\s`` is ASCII; ``lower`` is full Unicode mapping — all
    matched by ``str.strip(' ')`` / the explicit class / ``str.lower``,
    pinned in tests), same exact-integer smoothing ratio (operands
    stay far under 2^53, so float64 division is the correctly-rounded
    true ratio in numpy exactly as in the JVM), same 1e-6 term
    quantization with HALF-AWAY rounding, integer-exact sums.  The
    1e-6 grid absorbs libm-vs-JVM ``ln`` ulp differences — the
    identical honest guarantee the DuckDB oracle already relies on.
    """
    import re

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    from ..plans import rebalance_for_cpu

    sc = df.sparkSession.sparkContext
    types = lm.n_vocab + 1
    # Freeze terms to dense ids (shared _freeze_model_tables: a corpus
    # token that literally equals the UNK marker is indistinguishable
    # from OOV in the string engines; mapping OOV to the vocab id of
    # the marker when present preserves that exact behavior).  The
    # "operands stay far under 2^53" exactness claim is CHECKED at
    # freeze time inside the helper — else int64/int64 division
    # silently stops being the correctly-rounded true ratio and the
    # arrow engine drifts from the expression/oracle engines.
    vidx, unk_id, bg_keys, bg_cnts, ctx_arr, types = _freeze_model_tables(
        [r["term"] for r in lm.vocab.collect()],
        lm.bigram_counts.toPandas(),
        lm.context_counts.toPandas(),
        lm.n_vocab, k_num, k_den,
    )
    vocab_b = sc.broadcast(vidx)
    tables_b = sc.broadcast((bg_keys, bg_cnts, ctx_arr))

    ws = re.compile(_JAVA_WS)
    # mirror of segment_unsegmented: per-char spacing for Han/Kana/Thai
    # (Python spells the group ref \1 where Java spells $1 — same
    # literal class, same inserted 0x20 spaces)
    unseg_re = (
        re.compile("(" + UNSEGMENTED_CLASS + ")") if script_aware else None
    )
    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("n_bigrams", LongType()),
            StructField("avg_logprob", DoubleType()),
        ]
    )
    narrow = rebalance_for_cpu(df).select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__t")
    )
    knum, kden, ktypes = k_num, k_den, k_num * types
    typs = types

    def kernel(batches):
        import pandas as pd

        vmap = vocab_b.value
        bgk, bgc, ctx_tab = tables_b.value
        unk = unk_id
        for pdf in batches:
            out_ids, toklists = [], []
            for did, txt in zip(pdf["__id"], pdf["__t"]):
                if txt is None:
                    continue
                t2 = str(txt).lower()
                if unseg_re is not None:
                    t2 = unseg_re.sub(r" \1 ", t2)
                toks = [t for t in ws.split(t2.strip(" ")) if t]
                if len(toks) < 2:
                    continue
                out_ids.append(did)
                toklists.append(toks)
            if not out_ids:
                continue
            nbg, r = _score_token_lists(
                toklists, vmap, unk, bgk, bgc, ctx_tab, typs,
                knum, kden, ktypes,
            )
            yield pd.DataFrame(
                {id_col: out_ids, "n_bigrams": nbg, "avg_logprob": r}
            )

    return narrow.mapInPandas(kernel, out_schema)


def lm_score(
    df: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_num: int = 1,
    k_den: int = 2,
    broadcast_model: bool = False,
    score_engine: str = "auto",
    script_aware: bool = False,
) -> DataFrame:
    """Score a target corpus under a trained model.

    Returns ``(doc_id, n_bigrams, avg_logprob)`` — higher (less
    negative) means more reference-like; perplexity is
    ``exp(-avg_logprob)``, strictly monotone in it, so ordering /
    bucketing uses ``avg_logprob`` directly and never materializes an
    ``exp``. Docs with fewer than two tokens have no bigrams and are
    omitted. ``k_num/k_den`` is the add-k smoothing constant as an
    exact integer fraction (default 1/2, Jeffreys).

    ``score_engine``: ``"join"`` explodes bigrams and joins the count
    tables (works for models of ANY size — the 100 TB-model path);
    ``"arrow"`` broadcasts the collected model dicts and scores each
    doc in-task with zero shuffles (requires a bounded model — exactly
    what ``broadcast_model=True`` already asserts).  ``"auto"``
    (default) picks ``"arrow"`` when ``broadcast_model`` else
    ``"join"``.  Both engines produce identical rows (oracle-checked;
    r9 funnel decomposition: the join engine's exchange was the #2
    wall at 5M docs)."""
    if score_engine == "auto":
        score_engine = "arrow" if broadcast_model else "join"
    if score_engine == "arrow":
        return _score_arrow(
            df, lm, id_col, text_col, k_num, k_den, script_aware
        )
    if score_engine != "join":
        raise ValueError(
            f"score_engine must be 'auto', 'arrow' or 'join', got {score_engine!r}"
        )
    # tokenize+explode runs in the SAME stage as the input scan, so an
    # AQE-coalesced narrow input starves it (see plans.rebalance_for_cpu)
    from ..plans import rebalance_for_cpu

    df = rebalance_for_cpu(df)
    types = lm.n_vocab + 1  # vocab plus <unk>
    bg = _doc_bigrams(df, id_col, text_col, lm.vocab, script_aware)
    bc = lm.bigram_counts
    if broadcast_model:
        bc = F.broadcast(bc)
    scored = (
        bg.join(bc, on=["prev", "cur"], how="left")
        .join(
            F.broadcast(lm.context_counts), on="prev", how="left"
        )
        .select(
            "doc_id",
            (
                (
                    F.lit(k_den) * F.coalesce(F.col("cnt"), F.lit(0))
                    + F.lit(k_num)
                ).cast("double")
                / (
                    F.lit(k_den) * F.coalesce(F.col("ctx_cnt"), F.lit(0))
                    + F.lit(k_num * types)
                ).cast("double")
            ).alias("p"),
        )
    )
    term = F.round(F.log(F.col("p")) * F.lit(_SCALE)).cast("long")
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            F.sum(term) / (F.lit(_SCALE) * F.count(F.lit(1))), 6
        ).alias("avg_logprob"),
    )


def lm_quantile_filter(
    df: DataFrame,
    lm: NgramLM,
    keep_frac: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    relative_error: float = 0.01,
    **score_kwargs,
) -> DataFrame:
    """Keep the best ``keep_frac`` of ``df`` by LM score — the standard
    perplexity-filter stage, with the scoring scan run EXACTLY ONCE.

    The naive composition (``scored = lm_score(df, lm)`` then
    ``approxQuantile`` for the cutoff then ``filter``+join) executes
    the CPU-bound scoring scan once per action — measured as the
    entire 194-vs-143 s funnel gap at 5M docs (BASELINE.md round 10;
    docs/TUNING.md "score-then-threshold" rule).  Here the tiny
    ``(id, avg_logprob)`` frame is eagerly ``localCheckpoint``-ed
    first, so both the quantile and the filter read ~16 bytes/doc of
    materialized state.  Docs with no bigrams (null text or under two
    tokens) are OMITTED by ``lm_score`` — they never reach the
    quantile and are never kept; if NO doc is scoreable the result is
    simply empty (round-11 guard: ``approxQuantile`` returns ``[]``
    on an empty frame, which used to escape as a bare IndexError).

    The cutoff is an ``approxQuantile`` at ``1 - keep_frac`` with
    ``relative_error`` — the kept fraction is approximate in the same
    way every production perplexity filter's is.  Extra ``lm_score``
    options (``k_num``/``k_den``/``broadcast_model``/``score_engine``)
    pass through."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    scored = lm_score(
        df, lm, id_col=id_col, text_col=text_col, **score_kwargs
    ).select(id_col, "avg_logprob").localCheckpoint()
    if keep_frac == 1.0:
        kept_ids = scored.select(id_col)
    else:
        qs = scored.approxQuantile(
            "avg_logprob", [1.0 - keep_frac], relative_error
        )
        if not qs:  # no scoreable doc at all -> empty result
            return df.join(scored.select(id_col), id_col)
        kept_ids = scored.filter(
            F.col("avg_logprob") >= F.lit(qs[0])
        ).select(id_col)
    return df.join(kept_ids, id_col)


@dataclass(frozen=True)
class LangNgramLM:
    """Per-language capped-vocab bigram models in ONE set of keyed
    frames (round 11 — CCNet's actual design ships per-language models
    and cutoffs; a single LM over a multilingual corpus conflates
    language ID with quality).

    ``vocab``: ``(lang, term)`` — top ``vocab_size`` terms PER
    language.  ``bigram_counts``: ``(lang, prev, cur, cnt)``.
    ``context_counts``: ``(lang, prev, ctx_cnt)`` — ≤ L×(V+1) rows.
    ``n_vocab``: ``(lang, n_vocab)`` — L rows, always broadcast.
    Everything stays bounded by L×V model rows, so the whole model
    still broadcasts exactly like the single-language one."""

    vocab: DataFrame
    bigram_counts: DataFrame
    context_counts: DataFrame
    n_vocab: DataFrame


def _doc_bigrams_by_lang(df: DataFrame, id_col: str, text_col: str,
                         lang_col: str, vocab: DataFrame,
                         script_aware: bool = False) -> DataFrame:
    """``(doc_id, lang, prev, cur)`` — :func:`_doc_bigrams` with the
    language carried through and the OOV collapse joined on
    ``(lang, term)`` so each document is mapped under ITS language's
    vocabulary.  Same scan-side zip_with adjacency, no window."""
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    toks = F.filter(tokens(low), lambda t: t != "")
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(toks, F.lit(1), n1),
        F.slice(toks, F.lit(2), n1),
        lambda a, b: F.struct(a.alias("p"), b.alias("c")),
    )
    bg = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.explode(pairs).alias("bg"),
    ).select(
        "doc_id", "lang",
        F.col("bg.p").alias("prev_raw"),
        F.col("bg.c").alias("cur_raw"),
    )
    vp = F.broadcast(vocab.select(
        F.col("lang"), F.col("term").alias("prev_raw"),
        F.lit(True).alias("__pv"),
    ))
    vc = F.broadcast(vocab.select(
        F.col("lang"), F.col("term").alias("cur_raw"),
        F.lit(True).alias("__cv"),
    ))
    return (
        bg.join(vp, on=["lang", "prev_raw"], how="left")
        .join(vc, on=["lang", "cur_raw"], how="left")
        .select(
            "doc_id", "lang",
            F.when(F.col("__pv"), F.col("prev_raw"))
            .otherwise(F.lit(UNK)).alias("prev"),
            F.when(F.col("__cv"), F.col("cur_raw"))
            .otherwise(F.lit(UNK)).alias("cur"),
        )
    )


def lm_train_by_lang(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    vocab_size: int = 50_000,
    script_aware: bool = False,
) -> LangNgramLM:
    """Train one bigram LM per language partition of ``df``.

    Identical semantics to running :func:`lm_train` once per language
    slice (property-tested), in ONE pass: per-language vocab selection
    is a ``row_number`` over ``(lang)`` partitions (count desc, term
    asc tie-break — the per-lang window shuffles the bounded
    ``(lang, term, cnt)`` aggregate, not the token stream), then one
    bigram/context count aggregation keyed by lang."""
    from ..plans import rebalance_for_cpu

    df = rebalance_for_cpu(df)
    low = F.lower(F.col(text_col))
    if script_aware:
        low = segment_unsegmented(low)
    raw = df.select(
        F.col(lang_col).alias("lang"),
        F.explode(tokens(low)).alias("term"),
    ).filter(F.col("term") != "")
    counts = raw.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    vocab = (
        counts.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= vocab_size)
        .select("lang", "term")
    )
    n_vocab = vocab.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab")
    )
    bg = _doc_bigrams_by_lang(
        df, id_col, text_col, lang_col, vocab, script_aware
    )
    bigram_counts = bg.groupBy("lang", "prev", "cur").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    context_counts = bg.groupBy("lang", "prev").agg(
        F.count(F.lit(1)).alias("ctx_cnt")
    )
    return LangNgramLM(vocab, bigram_counts, context_counts, n_vocab)


def _score_arrow_by_lang(
    df: DataFrame,
    lm: LangNgramLM,
    id_col: str,
    text_col: str,
    lang_col: str,
    k_num: int,
    k_den: int,
    script_aware: bool = False,
) -> DataFrame:
    """Zero-shuffle per-language scoring: ALL language models freeze to
    numpy tables driver-side (dict lang -> tables, still ~L×V ints on
    the wire), broadcast once, and each batch is scored per present
    language with the shared :func:`_score_token_lists` kernel — same
    1e-6 grid, same exactness assertion per language.  Docs whose
    language has no model are omitted (mirrors the join engine's inner
    ``n_vocab`` join)."""
    import re
    from collections import defaultdict

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    from ..plans import rebalance_for_cpu

    sc = df.sparkSession.sparkContext
    nv = {r["lang"]: int(r["n_vocab"]) for r in lm.n_vocab.collect()}
    terms_by_lang = defaultdict(list)
    for r in lm.vocab.collect():
        terms_by_lang[r["lang"]].append(r["term"])
    bcp_all = lm.bigram_counts.toPandas()
    ccp_all = lm.context_counts.toPandas()
    tables = {}
    for lang, n_vocab in nv.items():
        vidx, unk_id, bg_keys, bg_cnts, ctx_arr, types = (
            _freeze_model_tables(
                terms_by_lang.get(lang, []),
                bcp_all[bcp_all["lang"] == lang],
                ccp_all[ccp_all["lang"] == lang],
                n_vocab, k_num, k_den,
            )
        )
        tables[lang] = (vidx, unk_id, bg_keys, bg_cnts, ctx_arr, types)
    # drop the guard's persisted model frames now the tables are frozen
    # (no-op when the caller skipped the guard)
    for frame in (lm.vocab, lm.bigram_counts, lm.context_counts, lm.n_vocab):
        frame.unpersist()
    tables_b = sc.broadcast(tables)

    ws = re.compile(_JAVA_WS)
    unseg_re = (
        re.compile("(" + UNSEGMENTED_CLASS + ")") if script_aware else None
    )
    id_type = df.schema[id_col].dataType
    out_schema = StructType([
        StructField(id_col, id_type),
        StructField("lang", StringType()),
        StructField("n_bigrams", LongType()),
        StructField("avg_logprob", DoubleType()),
    ])
    narrow = rebalance_for_cpu(df).select(
        F.col(id_col).alias("__id"),
        F.col(lang_col).alias("__lang"),
        F.col(text_col).alias("__t"),
    )
    knum, kden = k_num, k_den

    def kernel(batches):
        import pandas as pd

        tab = tables_b.value
        for pdf in batches:
            per_lang = {}
            for did, lang, txt in zip(pdf["__id"], pdf["__lang"], pdf["__t"]):
                if txt is None or lang not in tab:
                    continue
                t2 = str(txt).lower()
                if unseg_re is not None:
                    t2 = unseg_re.sub(r" \1 ", t2)
                toks = [t for t in ws.split(t2.strip(" ")) if t]
                if len(toks) < 2:
                    continue
                ids, tls = per_lang.setdefault(lang, ([], []))
                ids.append(did)
                tls.append(toks)
            for lang in sorted(per_lang):
                ids, tls = per_lang[lang]
                vmap, unk, bgk, bgc, ctx_tab, types = tab[lang]
                nbg, r = _score_token_lists(
                    tls, vmap, unk, bgk, bgc, ctx_tab, types,
                    knum, kden, knum * types,
                )
                yield pd.DataFrame({
                    id_col: ids,
                    "lang": lang,
                    "n_bigrams": nbg,
                    "avg_logprob": r,
                })

    return narrow.mapInPandas(kernel, out_schema)


def _guard_model_bytes(lm: "LangNgramLM", max_model_bytes: int) -> None:
    """Estimate the driver-side footprint of freezing every language's
    model tables and fail LOUDLY before collecting anything if it
    exceeds ``max_model_bytes``.

    Per-row costs (numpy tables + python string overhead, calibrated
    against the r12 L=50 probe): a vocab term ~90 B (python str in the
    index dict + key), a bigram row ~16 B (int64 key + int64 count), a
    context row ~8 B.  One aggregation pass over the bounded count
    frames — never the corpus."""
    # persist the three bounded (<= L x V row) frames BEFORE counting:
    # they are lazy aggregations over the full training corpus, and the
    # arrow scorer collects the very same frames right after this guard
    # — without the persist the guard would re-run the whole
    # model-build lineage once per frame (r12 review finding).  The
    # scorer unpersists them once the numpy tables are frozen.
    for frame in (lm.vocab, lm.bigram_counts, lm.context_counts):
        frame.persist()
    sizes = (
        lm.vocab.groupBy().agg(
            F.count(F.lit(1)).alias("v"),
            F.sum(F.length("term")).alias("vchars"),
        ).collect()[0]
    )
    n_bigrams = lm.bigram_counts.count()
    n_ctx = lm.context_counts.count()
    n_vocab = int(sizes["v"] or 0)
    vchars = int(sizes["vchars"] or 0)
    est = n_vocab * 90 + vchars * 2 + n_bigrams * 16 + n_ctx * 8
    if est > max_model_bytes:
        n_langs = lm.n_vocab.count()
        raise ValueError(
            "lm_score_by_lang(score_engine='arrow'): estimated driver "
            f"model footprint ~{est / 1e9:.2f} GB "
            f"({n_langs} languages, {n_vocab} vocab terms, {n_bigrams} "
            f"bigram rows, {n_ctx} context rows) exceeds max_model_bytes="
            f"{max_model_bytes / 1e9:.2f} GB. Lower vocab_size per "
            "language, score language shards separately, raise "
            "max_model_bytes (with driver memory to match), or use "
            "score_engine='join' (model stays distributed)."
        )


def lm_score_by_lang(
    df: DataFrame,
    lm: LangNgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    k_num: int = 1,
    k_den: int = 2,
    broadcast_model: bool = False,
    score_engine: str = "auto",
    script_aware: bool = False,
    max_model_bytes: int = 2_000_000_000,
) -> DataFrame:
    """Score each document under ITS language's model.

    Returns ``(doc_id, lang, n_bigrams, avg_logprob)``.  Documents
    whose language has no trained model are OMITTED (explicit: scoring
    French under a Chinese model is the exact conflation this operator
    exists to prevent), as are docs with fewer than two tokens.
    Engines as in :func:`lm_score`; both produce identical rows
    (property-tested, and each language slice matches the
    single-language :func:`lm_score` bit-for-bit).

    ``max_model_bytes`` guards the arrow engine's driver-side model
    build (r12): it collects and broadcasts ALL language tables —
    bounded by L×vocab_size but a 100-language crawl at 50k vocab is
    ~5M vocab rows plus bigram arrays, which would otherwise fail as
    an opaque driver OOM mid-collect.  The estimate is computed from
    distributed counts BEFORE anything is collected; breach raises
    ``ValueError`` naming the measured sizes and the knobs (lower
    ``vocab_size`` per language, score language shards separately, or
    use ``score_engine="join"``, which never drivers the model).
    Estimated ~1 GiB per ~10M bigram rows (probed at L=50 in
    BASELINE.md r12)."""
    if score_engine == "auto":
        score_engine = "arrow" if broadcast_model else "join"
    if score_engine == "arrow":
        _guard_model_bytes(lm, max_model_bytes)
        return _score_arrow_by_lang(
            df, lm, id_col, text_col, lang_col, k_num, k_den, script_aware
        )
    if score_engine != "join":
        raise ValueError(
            f"score_engine must be 'auto', 'arrow' or 'join', got {score_engine!r}"
        )
    from ..plans import rebalance_for_cpu

    df = rebalance_for_cpu(df)
    bg = _doc_bigrams_by_lang(
        df, id_col, text_col, lang_col, lm.vocab, script_aware
    )
    bc = lm.bigram_counts
    if broadcast_model:
        bc = F.broadcast(bc)
    scored = (
        bg.join(bc, on=["lang", "prev", "cur"], how="left")
        .join(F.broadcast(lm.context_counts), on=["lang", "prev"], how="left")
        .join(F.broadcast(lm.n_vocab), on="lang", how="inner")
        .select(
            "doc_id", "lang",
            (
                (
                    F.lit(k_den) * F.coalesce(F.col("cnt"), F.lit(0))
                    + F.lit(k_num)
                ).cast("double")
                / (
                    F.lit(k_den) * F.coalesce(F.col("ctx_cnt"), F.lit(0))
                    + F.lit(k_num) * (F.col("n_vocab") + 1)
                ).cast("double")
            ).alias("p"),
        )
    )
    term = F.round(F.log(F.col("p")) * F.lit(_SCALE)).cast("long")
    return scored.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            F.sum(term) / (F.lit(_SCALE) * F.count(F.lit(1))), 6
        ).alias("avg_logprob"),
    )


def lm_quantile_filter_by_lang(
    df: DataFrame,
    lm: LangNgramLM,
    keep_frac: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    accuracy: int = 10_000,
    **score_kwargs,
) -> DataFrame:
    """Keep the best ``keep_frac`` of EACH LANGUAGE by LM score — the
    per-language perplexity filter CCNet actually ships (one cutoff per
    language, so a high-resource language's score distribution never
    starves a low-resource one).

    One scoring scan (localCheckpointed ~24 B/doc score frame, same
    rule as :func:`lm_quantile_filter`), then per-language cutoffs via
    a ``percentile_approx`` GROUP BY — L rows, broadcast back onto the
    score frame.  Unscoreable docs (no model for their language, <2
    tokens) are dropped; an entirely unscoreable input yields an empty
    frame (no crash)."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    scored = lm_score_by_lang(
        df, lm, id_col=id_col, text_col=text_col, lang_col=lang_col,
        **score_kwargs,
    ).select(id_col, "lang", "avg_logprob").localCheckpoint()
    if keep_frac == 1.0:
        kept_ids = scored.select(id_col)
    else:
        cuts = scored.groupBy("lang").agg(
            F.percentile_approx(
                "avg_logprob", F.lit(1.0 - keep_frac), F.lit(accuracy)
            ).alias("__cut")
        )
        kept_ids = (
            scored.join(F.broadcast(cuts), "lang")
            .filter(F.col("avg_logprob") >= F.col("__cut"))
            .select(id_col)
        )
    return df.join(kept_ids, id_col)


def perplexity_ntile(
    scored: DataFrame,
    parts: int = 3,
    labels: tuple = ("head", "middle", "tail"),
    id_col: str = "doc_id",
    by: tuple = (),
) -> DataFrame:
    """CCNet-style equal-count buckets: rank by ``avg_logprob`` desc
    (i.e. perplexity asc) with ``doc_id`` tie-break, ``ntile(parts)``,
    label bucket 1..parts (``head`` = most reference-like).

    ``by`` partitions the ranking (e.g. ``("lang",)`` buckets each
    language against its own distribution — pair with
    :func:`lm_score_by_lang`).  Exact and engine-stable (the ordering
    key is the already-rounded output value), but an empty ``by`` is a
    global window — use :func:`bucket_by_bounds` at scale."""
    if len(labels) != parts:
        raise ValueError(f"need {parts} labels, got {len(labels)}")
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col("avg_logprob").desc(), F.col(id_col).asc()
    )
    tile = F.ntile(parts).over(w)
    label = F.element_at(
        F.array(*[F.lit(x) for x in labels]), tile
    )
    return scored.withColumn("ppl_bucket", label)


def bucket_by_bounds(
    scored: DataFrame,
    head_min_logprob: float,
    tail_max_logprob: float,
    labels: tuple = ("head", "middle", "tail"),
) -> DataFrame:
    """Fixed-threshold bucketing — the shuffle-free 100 TB path.

    ``avg_logprob >= head_min_logprob`` → head;
    ``avg_logprob < tail_max_logprob`` → tail; else middle. Thresholds
    come from a sample run or a previous :func:`perplexity_ntile`
    (CCNet ships them per language)."""
    h, m, t = labels
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col("avg_logprob") >= head_min_logprob, F.lit(h))
        .when(F.col("avg_logprob") < tail_max_logprob, F.lit(t))
        .otherwise(F.lit(m)),
    )

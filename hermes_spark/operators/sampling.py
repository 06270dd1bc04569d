"""Deterministic (hash-threshold) sampling for corpus curation.

``df.sample()`` is seed-dependent on partitioning and row order, which
makes training-data subsets irreproducible across re-runs/re-shards.
Hash-threshold sampling keys the decision to the ROW ITSELF: keep a row
iff ``hash(key) mod D < fraction * D`` — the same row is always in or
out regardless of cluster layout, and nested subsets compose (a 1%
sample is a strict subset of the 10% sample of the same key). Pure
expressions, no shuffle at all — the filter rides the scan.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

#: denominator of the sampling ratio: fraction resolution of 0.01%
SAMPLE_DENOMINATOR = 10_000


def _bucket(key: Column, salt: str) -> Column:
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:"), key.cast("string"))),
        F.lit(SAMPLE_DENOMINATOR),
    )


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by a hash of ``key_col``.

    Same key ⇒ same decision in every run and on every engine (the hash
    is the portable md5 variant, so the result is oracle-checkable).
    Change ``salt`` to draw an independent sample.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * SAMPLE_DENOMINATOR)
    return df.filter(_bucket(F.col(key_col), salt) < threshold)


def mix_corpora(
    corpora: list[tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
    source_col: Optional[str] = "mix_source",
) -> DataFrame:
    """Reproducible weighted mixture of corpora: each input keeps its
    fraction via deterministic sampling, then all are unioned (schemas
    merged by name). The standard pretraining-mix step — e.g. 100% of a
    curated set, 30% of a crawl — and because membership is keyed to the
    rows, re-running with a changed weight only adds/removes rows, never
    reshuffles the rest. ``source_col`` (optional) tags each row with
    its corpus index for downstream per-source accounting."""
    sampled = []
    for index, (df, fraction) in enumerate(corpora):
        part = deterministic_sample(df, key_col, fraction, salt=f"{salt}{index}")
        if source_col:
            part = part.withColumn(source_col, F.lit(index))
        sampled.append(part)
    out = sampled[0]
    for part in sampled[1:]:
        out = out.unionByName(part, allowMissingColumns=True)
    return out


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps a stratum
    value (e.g. language) to its keep-fraction; unlisted strata use
    ``default_fraction``. This is how corpus language/source mixes are
    rebalanced reproducibly."""
    threshold = F.lit(int(default_fraction * SAMPLE_DENOMINATOR))
    for value, fraction in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value,
            F.lit(int(fraction * SAMPLE_DENOMINATOR)),
        ).otherwise(threshold)
    return df.filter(_bucket(F.col(key_col), salt) < threshold)


def split_assign(
    df: DataFrame,
    key_col: str,
    splits: Mapping[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in exactly
    one named split, with probability proportional to its weight.

    The decision is the row's hash bucket against the cumulative weight
    boundaries, so (a) assignment is reproducible across runs, engines
    and repartitions, (b) the full input is exactly partitioned (no row
    lost or doubled), and (c) growing one split's weight only MOVES the
    boundary — rows never shuffle between the surviving splits (stable
    holdout sets as the corpus evolves). Pure expression, no shuffle.

    Boundary resolution is 1/SAMPLE_DENOMINATOR (1e-4): weights closer
    than that collapse to the same boundary.  Each boundary is computed
    independently from the exact prefix sum (never a float running
    accumulator), so an oracle computing ``round(sum(w[:i])/total *
    SAMPLE_DENOMINATOR)`` lands on identical buckets regardless of the
    number of splits.
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    total = sum(splits.values())
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    bucket = _bucket(F.col(key_col), salt)
    expr = None
    items = list(splits.items())
    weights = [w for _, w in items]
    for i, (name, _) in enumerate(items[:-1]):
        # exact prefix sum per boundary: float accumulation (acc += w/total)
        # drifts for thirds-like weights or many splits
        boundary = int(round(sum(weights[: i + 1]) / total * SAMPLE_DENOMINATOR))
        cond = bucket < F.lit(boundary)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, assigned)


def sample_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int,
    salt: str = "pergroup",
) -> DataFrame:
    """Deterministic k-per-group sample: rank each group's rows by a
    portable hash of the key and keep the ``k`` smallest — a reproducible
    "show me N examples per source / language / length-bin" that needs
    no global sort and no RNG state.

    One shuffle (the per-group window); the hash ordering makes the
    pick independent of input layout, and the key tiebreak makes it
    total.  Adds ``sample_rank`` (1-based) to the kept rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql.window import Window

    order = _bucket(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def rebalance_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    targets: Mapping[str, float],
    salt: str = "rebalance",
) -> DataFrame:
    """Downsample to the LARGEST corpus matching a target stratum mix.

    ``targets`` maps stratum values (language, source domain, ...) to
    desired proportions (normalized internally). The achievable total is
    limited by the scarcest stratum: ``min_ratio = min(count_s /
    share_s)``; each stratum then keeps ``share_s * min_ratio / count_s``
    of its rows via the same deterministic hash threshold as
    :func:`deterministic_sample` (reproducible across runs, engines and
    layouts). Strata not in ``targets`` are dropped.

    Unlike :func:`stratified_sample` (caller-fixed fractions), the rates
    here are DERIVED from the data, so the output mix tracks the target
    even as the corpus grows unevenly.

    Target strata with ZERO observed rows are ignored when computing
    ``min_ratio`` (a literal reading would force an empty result); the
    output mix then holds the target ratios among the strata that exist.

    Scale: stratum counts are one tiny hash aggregate (map-side
    combined); thresholds are a few rows broadcast back onto the scan —
    the corpus itself is read once and never shuffled.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    total_share = sum(targets.values())
    if total_share <= 0:
        raise ValueError("target shares must sum to > 0")

    share = None
    for value, weight in sorted(targets.items()):
        lit = F.lit(weight / total_share)
        share = (
            F.when(F.col(strata_col) == value, lit)
            if share is None
            else share.when(F.col(strata_col) == value, lit)
        )
    share = share.otherwise(F.lit(None))

    counts = (
        df.filter(F.col(strata_col).isin(*targets.keys()))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("double").alias("__n"))
        .withColumn("__share", share)
    )
    min_ratio = counts.agg(F.min(F.col("__n") / F.col("__share")).alias("__min_ratio"))
    thresholds = counts.crossJoin(F.broadcast(min_ratio)).select(
        strata_col,
        F.floor(
            F.lit(float(SAMPLE_DENOMINATOR))
            * F.col("__share")
            * F.col("__min_ratio")
            / F.col("__n")
        ).alias("__threshold"),
    )
    return (
        df.join(F.broadcast(thresholds), strata_col, "inner")
        .filter(_bucket(F.col(key_col), salt) < F.col("__threshold"))
        .drop("__threshold")
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    temperature: float = 2.0,
    salt: str = "tempmix",
) -> DataFrame:
    """Temperature-flattened stratum mix (multilingual-sampling style,
    cf. the alpha-sampling of mBERT/T5/XLM-R): target share of stratum
    ``s`` is ``p_s^(1/T) / Z`` where ``p_s`` is its observed share.
    ``T=1`` keeps the natural mix; ``T→∞`` approaches uniform; the
    output is the LARGEST corpus achieving the flattened mix by pure
    downsampling (the scarcest-after-flattening stratum caps the total,
    exactly as :func:`rebalance_mix`).

    Unlike :func:`rebalance_mix` the targets are DERIVED from the
    observed counts, so rare strata (languages, source domains) are
    boosted relative to their natural share without anyone hand-writing
    a target table.

    Scale: one tiny stratum-count aggregate (map-side combined), share /
    normalizer / threshold arithmetic over ≤|strata| rows via broadcast
    cross joins, then the same zero-shuffle deterministic hash-threshold
    filter riding the scan as every sampler in this module. Shares are
    rounded to 9 dp before the threshold so the floor() boundary is
    engine-stable (pow() may differ in the last ulp across engines).
    """
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("double").alias("__n")
    )
    tot = counts.agg(F.sum("__n").alias("__total"))
    raw = counts.crossJoin(F.broadcast(tot)).withColumn(
        "__qraw", F.pow(F.col("__n") / F.col("__total"), 1.0 / temperature)
    )
    z = raw.agg(F.sum("__qraw").alias("__z"))
    shares = raw.crossJoin(F.broadcast(z)).select(
        strata_col,
        "__n",
        F.round(F.col("__qraw") / F.col("__z"), 9).alias("__share"),
    )
    min_ratio = shares.agg(
        F.min(F.col("__n") / F.col("__share")).alias("__min_ratio")
    )
    thresholds = shares.crossJoin(F.broadcast(min_ratio)).select(
        strata_col,
        F.floor(
            F.lit(float(SAMPLE_DENOMINATOR))
            * F.col("__share")
            * F.col("__min_ratio")
            / F.col("__n")
        ).alias("__threshold"),
    )
    return (
        df.join(F.broadcast(thresholds), strata_col, "inner")
        .filter(_bucket(F.col(key_col), salt) < F.col("__threshold"))
        .drop("__threshold")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsample",
    key_col: str = "sample_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-RES): each row gets key ``u^(1/w)`` with ``u`` a deterministic
    uniform derived from the portable hash of its id; the global top-n
    keys ARE a weighted sample without replacement.

    Deterministic and layout-independent like every sampler here (same
    id + salt => same key on any cluster), so it is reproducible AND
    oracle-checkable. Rows with non-positive weight are excluded.
    Spark plans the cut as TakeOrderedAndProject (per-task heaps, no
    global sort); ordering ties break on the rounded key then the id,
    keeping the boundary engine-stable.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    # u in (0, 1): 1e6-resolution uniform from the portable hash (finer
    # than the 1e-4 _bucket grid — sampling keys need low collision odds)
    u = (
        F.pmod(
            portable_hash64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            F.lit(1_000_000),
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    key = F.round(
        F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double")), 9
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col).asc())
        .limit(n)
    )


def cap_per_group(
    df: DataFrame,
    key_col: str,
    group_col: str,
    cap: int,
    salt: str = "cap",
    keep_rank: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically.

    The per-source contribution cap of a crawl pipeline: one spammy
    domain must not dominate the corpus, so each group keeps ``cap``
    rows picked by hash order — reproducible across runs, engines and
    repartitions (same posture as :func:`deterministic_sample`), and
    unbiased w.r.t. any upstream ordering.

    Scale: the ``row_number() <= cap`` idiom compiles to a pair of
    WindowGroupLimit nodes — every input partition is pruned to its own
    top-``cap`` per group BEFORE the exchange, so a 10M-doc spam domain
    ships ``cap * partitions`` rows, not 10M, through the shuffle.
    ``keep_rank=True`` exposes the rank as ``cap_rank``.
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    order_key = _bucket(F.col(key_col), salt)
    w = Window.partitionBy(F.col(group_col)).orderBy(
        order_key.asc(), F.col(key_col).asc()
    )
    out = df.withColumn("cap_rank", F.row_number().over(w)).filter(
        F.col("cap_rank") <= cap
    )
    return out if keep_rank else out.drop("cap_rank")


def percentile_gate(
    df: DataFrame,
    group_col: str,
    score_col: str,
    keep_frac: float,
    key_col: str,
    keep_score_rank: bool = False,
) -> DataFrame:
    """Keep the top ``keep_frac`` fraction of each group by score.

    The per-stratum quality gate ("top 30% quality per source"): a
    global score cutoff lets one high-quality source crowd out the
    rest, while a per-group percentile keeps the corpus mix. Rows rank
    by ``(score desc, key asc)`` inside their group and survive when
    ``percent_rank <= keep_frac`` — percent_rank (rank-1)/(n-1) is
    rounded to 6 dp before the comparison so the verdict is
    engine-reproducible. Groups with one row always survive
    (percent_rank 0). One keyed shuffle, no global pass.
    """
    if not 0.0 <= keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in [0, 1], got {keep_frac}")
    from pyspark.sql import Window

    w = Window.partitionBy(F.col(group_col)).orderBy(
        F.col(score_col).desc(), F.col(key_col).asc()
    )
    out = df.withColumn(
        "score_pct", F.round(F.percent_rank().over(w), 6)
    ).filter(F.col("score_pct") <= keep_frac)
    return out if keep_score_rank else out.drop("score_pct")


def training_order(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    salt: str = "order",
) -> DataFrame:
    """Deterministic global training order without a global sort.

    Assigns each row ``(shard, pos_in_shard)``: the epoch order is
    "shard 0 positions ascending, then shard 1, ...". Both coordinates
    derive from portable hashes of the key, so the order is (a) as good
    as a random shuffle w.r.t. any upstream clustering (hash-scattered),
    (b) identical on every engine/run/partitioning, and (c) computed
    with ONE keyed shuffle into ``num_shards`` groups and a per-shard
    window — never a single-partition global ``row_number`` (the cliff a
    naive "shuffle then number" hits at 100 TB; shards are also exactly
    the write-granularity a loader consumes, see
    ``sources.io.write_training_shards``).

    Ties in the position hash break by the key itself, so duplicate
    hash values cannot make the order ambiguous.
    """
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    from pyspark.sql import Window

    key = F.col(key_col).cast("string")
    shard = F.pmod(
        portable_hash64(F.concat(F.lit(f"{salt}:shard:"), key)),
        F.lit(num_shards),
    )
    pos_hash = portable_hash64(F.concat(F.lit(f"{salt}:pos:"), key))
    out = df.withColumn("shard", shard.cast("long")).withColumn("__ph", pos_hash)
    w = Window.partitionBy("shard").orderBy(F.col("__ph").asc(), F.col(key_col).asc())
    return (
        out.withColumn("pos_in_shard", F.row_number().over(w).cast("long"))
        .drop("__ph")
    )


def plan_epochs(
    token_counts: Mapping[str, int],
    targets: Mapping[str, float],
    budget_tokens: int,
    max_epochs: float = 10.0,
) -> dict[str, float]:
    """Per-stratum epoch factors hitting a token budget at a target mix.

    The mixing calculator for pretraining runs: given observed per-source
    token counts (e.g. from the datasheet), desired mix shares, and a
    total token budget, stratum ``s`` should contribute ``share_s *
    budget`` tokens — i.e. be repeated ``share_s * budget / count_s``
    times (fractional epochs; > 1 means upsampling, the thing the
    downsampling-only mixers cannot do).  Factors are capped at
    ``max_epochs`` (repeating a tiny source dozens of times degrades
    models faster than it fills budget — cap and redistribute
    deliberately rather than silently).  Driver-side pure arithmetic;
    feed the result to :func:`epoch_mix`.
    """
    total_share = sum(targets.values())
    if total_share <= 0:
        raise ValueError("targets must have positive total share")
    plan: dict[str, float] = {}
    for stratum, share in targets.items():
        count = token_counts.get(stratum, 0)
        if count <= 0:
            raise ValueError(f"stratum {stratum!r} has no tokens")
        want = share / total_share * budget_tokens
        plan[stratum] = min(round(want / count, 4), max_epochs)
    return plan


def epoch_mix(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    epochs: Mapping[str, float],
    salt: str = "epoch",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Replicate each stratum by a (fractional) epoch factor.

    A row of stratum ``s`` with factor ``e`` appears ``floor(e)`` times
    plus one more with probability ``frac(e)`` — decided by the same
    deterministic hash-threshold as :func:`deterministic_sample`, keyed
    on ``(key, copy_index)`` so every copy's membership is reproducible
    across runs, engines, and layouts, and raising a factor only ADDS
    copies.  Output carries ``epoch_col`` (0-based copy index) so
    packing/shuffling stages can interleave epochs deterministically
    (e.g. ``training_order`` on ``(key, epoch)``).  Strata not in
    ``epochs`` are dropped (explicit mix, like ``rebalance_mix``).

    Scale shape: one ``explode(sequence(...))`` per row bounded by the
    LARGEST factor, then a scan-side filter — no shuffle, no join; the
    per-stratum factors fold in as a CASE literal.
    """
    if not epochs:
        raise ValueError("epochs must be non-empty")
    bad = {s: e for s, e in epochs.items() if e < 0}
    if bad:
        raise ValueError(f"epoch factors must be >= 0: {bad}")
    import math

    max_copies = max(1, math.ceil(max(epochs.values())))
    # fold the factor map into one CASE expression (strata sets are
    # small: languages, sources); unknown strata get factor 0 -> dropped
    expr = None
    for stratum, e in epochs.items():
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, F.lit(float(e))) if expr is None else expr.when(
            cond, F.lit(float(e))
        )
    factor = expr.otherwise(F.lit(0.0))

    copies = F.explode(F.sequence(F.lit(0), F.lit(max_copies - 1))).alias(
        epoch_col
    )
    out = df.select("*", copies).withColumn("__factor", factor)
    whole = F.col(epoch_col) < F.floor(F.col("__factor"))
    frac_scaled = F.round(
        (F.col("__factor") - F.floor(F.col("__factor")))
        * SAMPLE_DENOMINATOR
    ).cast("long")
    partial_key = F.concat(
        F.col(key_col).cast("string"), F.lit("#"), F.col(epoch_col).cast("string")
    )
    partial = (F.col(epoch_col) == F.floor(F.col("__factor"))) & (
        _bucket(partial_key, salt) < frac_scaled
    )
    return out.filter(whole | partial).drop("__factor")

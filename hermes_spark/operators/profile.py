"""Data profiling for shuffle planning: key-skew and column reports.

Extension beyond reference parity (SURVEY.md §7.1 step 6). Before
running a 100 TB join or aggregation, the question is always "how bad
is the key skew?" — these reports answer it with one aggregation pass,
and their output feeds the choice between a plain shuffle join,
``salted_join``, or AQE skew handling (docs/TUNING.md).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame, cols: Sequence[str], top_n: int = 20
) -> DataFrame:
    """Top-``top_n`` heaviest key groups of ``cols``:
    ``(*cols, cnt, pct, rank)``, heaviest first; ties break by key.

    One groupBy pass (map-side partial counts), a 1-row broadcast for
    the total, and the global order happens on the already-aggregated
    count frame — the raw data is never resorted. A ``pct`` near
    ``1/shuffle_partitions`` or above means one task will receive that
    whole group: salt or split that key.
    """
    counts = df.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    top = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("pct", F.round(F.col("cnt") / F.col("__total"), 6))
        .orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in cols])
        .limit(top_n)
    )
    w = Window.orderBy(F.col("cnt").desc(), *[F.col(c).asc() for c in cols])
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select(*cols, "cnt", "pct", "rank")
    )


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile: ``(column, n_rows, n_null, null_pct,
    n_distinct)`` — exact counts (deterministic, oracle-checkable), one
    aggregation job for null counts plus one count-distinct per column
    folded into the same plan via a single multi-aggregate.

    Exact distincts shuffle per column; for quick looks at petabyte
    inputs swap ``approx_count_distinct`` in (not oracle-stable, hence
    not the default here).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__null_{c}").cast("long").alias("n_null"),
            F.round(F.col(f"__null_{c}") / F.col("__n"), 6).alias("null_pct"),
            F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str = None,
) -> DataFrame:
    """Clip ``value_col`` to its [lower, upper] quantiles, optionally per
    group — the robust-statistics guard before averaging noisy metrics
    (a handful of corrupt readings otherwise dominate a 100 TB mean).

    Exact interpolated percentiles (``percentile``, one aggregation per
    group, map-side partial) joined back broadcast — groups are few;
    the data itself is never shuffled. Appends ``out_col`` (default
    ``<value_col>_w``).
    """
    out = out_col or f"{value_col}_w"
    v = F.col(value_col).cast("double")
    if group_cols:
        bounds = df.groupBy(*[F.col(c) for c in group_cols]).agg(
            F.percentile(v, F.lit(lower)).alias("__lo"),
            F.percentile(v, F.lit(upper)).alias("__hi"),
        )
        joined = df.join(F.broadcast(bounds), on=list(group_cols))
    else:
        bounds = df.agg(
            F.percentile(v, F.lit(lower)).alias("__lo"),
            F.percentile(v, F.lit(upper)).alias("__hi"),
        )
        joined = df.crossJoin(F.broadcast(bounds))
    return joined.withColumn(
        out, F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    ).drop("__lo", "__hi")


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float = None,
    hi: float = None,
) -> DataFrame:
    """Fixed-width histogram of ``value_col``:
    ``(bucket, lo, hi, cnt)`` with ``bins`` buckets over [lo, hi]
    (data min/max when not given — one extra cheap aggregation).
    Out-of-range values clamp into the edge buckets; one groupBy on the
    computed bucket id (map-side partial counts).
    """
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    width = (hi - lo) / bins if hi > lo else 1.0
    bucket = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("long")
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6).alias("hi"),
            "cnt",
        )
        .orderBy("bucket")
    )


def approx_column_profile(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.05
) -> DataFrame:
    """Sketch-based variant of :func:`column_profile` for petabyte quick
    looks: same shape, but ``n_distinct`` comes from HyperLogLog++
    (``approx_count_distinct``, relative error ``rsd``) — no per-column
    distinct shuffle, the whole report is ONE aggregation pass over the
    data. Not oracle-stable (sketch estimates), hence the exact variant
    stays the default.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}")
        )
        aggs.append(
            F.approx_count_distinct(F.col(c), rsd=rsd).alias(f"__dist_{c}")
        )
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__null_{c}").cast("long").alias("n_null"),
            F.round(F.col(f"__null_{c}") / F.col("__n"), 6).alias("null_pct"),
            F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
        )
        for c in cols
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


def zorder_key(cols: Sequence[str], bits: int = 16) -> "F.Column":
    """Morton (Z-order) key: interleaves the low ``bits`` bits of the
    given non-negative integer columns into one long.

    Sort/repartitionByRange by this key before writing parquet and rows
    close in EVERY dimension land in the same files — min/max row-group
    stats then prune multi-dimensional range filters, the classic
    layout move for "filter by (user, day)"-shaped scans. Pure bit
    arithmetic, JVM-side, no UDF.
    """
    n = len(cols)
    parts = []
    for j, c in enumerate(cols):
        x = F.col(c).cast("long")
        for i in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def mad_outlier_summary(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    k: float = 3.0,
) -> DataFrame:
    """Robust (median/MAD) outlier summary per group: ``(groups, med,
    mad, n, n_outliers, outlier_rate)`` flagging values beyond
    ``k * 1.4826 * MAD`` of the median — the z-score's
    contamination-proof sibling (one bot's spike inflates a stddev but
    not a median).

    Two exact-percentile aggregations (median, then median absolute
    deviation) with the tiny per-group stats broadcast back between
    them — three scans of the (scan-pruned) value column, no window
    over raw rows, no sort of the full data.
    """
    groups = [F.col(c) for c in group_cols]
    med = df.groupBy(*groups).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    joined = df.join(F.broadcast(med), on=list(group_cols)) if group_cols else (
        df.crossJoin(F.broadcast(med))
    )
    absdev = joined.withColumn(
        "__absdev", F.abs(F.col(value_col) - F.col("__med"))
    )
    mad = absdev.groupBy(*groups).agg(
        F.first("__med").alias("__med2"),
        F.expr("percentile(__absdev, 0.5)").alias("__mad"),
    )
    j2 = absdev.drop("__med").join(F.broadcast(mad), on=list(group_cols)) if group_cols else (
        absdev.drop("__med").crossJoin(F.broadcast(mad))
    )
    is_out = F.col("__absdev") > F.lit(k * 1.4826) * F.col("__mad")
    return j2.groupBy(*groups).agg(
        F.round(F.first("__med2"), 6).alias("med"),
        F.round(F.first("__mad"), 6).alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
        F.round(
            F.sum(F.when(is_out, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("outlier_rate"),
    )


def psi_report(
    baseline: DataFrame,
    current: DataFrame,
    value_col: str,
    bins: int = 10,
    lo: float = None,
    hi: float = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a column —
    the standing drift monitor for a training-data pipeline (is this
    week's crawl distributed like the corpus the model was tuned on?).

    Fixed-width bins over ``[lo, hi]`` (baseline min/max when not
    given; pass explicit bounds for reproducible monitoring), clamped
    edge buckets as in :func:`histogram`. Returns one row per bucket:
    ``(bucket, lo, hi, p, q, psi_term)`` where ``p``/``q`` are the
    baseline/current share (6 dp) and ``psi_term = (q - p) *
    ln(q/p)`` (6 dp, shares floored at ``eps`` so empty buckets
    contribute a finite, documented penalty). ``sum(psi_term)`` is the
    PSI; > 0.2 is the usual "investigate" line.

    Scale: one map-side-combined count per frame (bucket-sized
    aggregates), a 1-row total broadcast each, and a ``bins``-row join —
    the snapshots are scanned once and never shuffled row-wise.
    """
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = baseline.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).collect()[0]
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                "psi_report: baseline frame has no non-null "
                f"{value_col!r} values to derive [lo, hi] from — pass "
                "explicit lo/hi bounds"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    width = (hi - lo) / bins if hi > lo else 1.0

    def shares(df: DataFrame, name: str) -> DataFrame:
        bucket = F.least(
            F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(bins - 1),
        ).cast("long")
        counts = (
            # nulls are excluded BEFORE totals: a null value has no
            # bucket, and counting it into the denominator would make
            # p/q silently sum below 1
            df.filter(v.isNotNull())
            .select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        total = counts.agg(F.sum("__n").alias("__tot"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bucket", (F.col("__n") / F.col("__tot")).alias(name)
        )

    spine = baseline.sparkSession.range(bins).select(
        F.col("id").cast("long").alias("bucket")
    )
    p = shares(baseline, "__p")
    q = shares(current, "__q")
    pe = F.greatest(F.coalesce(F.col("__p"), F.lit(0.0)), F.lit(eps))
    qe = F.greatest(F.coalesce(F.col("__q"), F.lit(0.0)), F.lit(eps))
    return (
        spine.join(F.broadcast(p), on="bucket", how="left")
        .join(F.broadcast(q), on="bucket", how="left")
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 6).alias("hi"),
            F.round(pe, 6).alias("p"),
            F.round(qe, 6).alias("q"),
            F.round((qe - pe) * F.log(qe / pe), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )

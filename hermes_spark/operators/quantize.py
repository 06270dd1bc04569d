"""Scalar (int8) embedding quantization and quantized similarity search.

Extension beyond reference parity (the reference engine has no vector
machinery at all; its nearest analog is the typed column diff kernel,
``datasetComparison/.../DatasetComparator.scala``): training-data
pipelines store billions of embeddings, and a float32 64-dim vector is
256 bytes/row while the int8 code book is 64 bytes/row — a 4x reduction
in scan, shuffle, and cache volume that usually costs <1% recall.

Design (all pure Column expressions — JVM-side, whole-stage codegen):

* :func:`sq8_stats` computes the global per-dimension ``[min, max]`` in
  ONE partial-aggregating pass (``F.min(vec[i])`` per dimension inside a
  single ``agg``). The result is a single tiny row (2 x dim doubles) —
  at any corpus scale the stats stage moves O(partitions * dim) values,
  never O(rows).
* :func:`sq8_quantize` broadcast-joins that one row and maps each vector
  through ``level_i = clamp(floor((v_i - mn_i) / (mx_i - mn_i) * 256))``
  — a scan-side projection, zero shuffle.
* :func:`sq8_topk` is the asymmetric-distance search (ADC): queries stay
  float, corpus codes are dequantized to bucket midpoints on the fly.
  Same top-k shape as ``brute_force_cosine_topk`` (broadcast queries,
  per-query window) but the corpus side reads 4x fewer bytes — at 100 TB
  the scan is the bottleneck, so this is the production search path, with
  the float variant kept as the recall baseline.

Everything is floor/double arithmetic, so the DuckDB oracle reproduces
codes and scores bit-for-bit (rounded to 6 dp).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: number of quantization levels (int8 codes 0..255)
SQ_LEVELS = 256


def sq8_stats(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Global per-dimension min/max as ONE row ``(mins array<double>,
    maxs array<double>)``.

    A single aggregate pass: each executor folds its partition into
    2 x ``dim`` partial extrema, the driver merges O(partitions) such
    rows — no explode, no per-dimension shuffle.
    """
    v = F.col(vec_col)
    return df.agg(
        F.array(*[F.min(v[i].cast("double")) for i in range(dim)]).alias("mins"),
        F.array(*[F.max(v[i].cast("double")) for i in range(dim)]).alias("maxs"),
    )


def _levels(vec: Column, mins: Column, maxs: Column) -> Column:
    """Quantization levels 0..255 for one vector (elementwise, JVM-side).

    Degenerate dimensions (``mx == mn``) quantize to level 0 and
    dequantize back to ``mn`` exactly.
    """
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    return F.transform(
        idx,
        lambda i: F.when(maxs[i] == mins[i], F.lit(0)).otherwise(
            F.least(
                F.lit(SQ_LEVELS - 1),
                F.floor(
                    (vec[i].cast("double") - mins[i])
                    / (maxs[i] - mins[i])
                    * F.lit(float(SQ_LEVELS))
                ).cast("int"),
            )
        ),
    )


def sq8_quantize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: Optional[DataFrame] = None,
    dim: Optional[int] = None,
) -> DataFrame:
    """Quantize every vector to int8 levels: ``(id, codes array<int>)``.

    ``stats`` (the :func:`sq8_stats` row) is broadcast — the corpus
    streams through one projection, so the whole operator is a scan plus
    the O(1)-row stats job. Pass a precomputed ``stats`` to share one
    code book across corpus + queries (required for search parity).
    """
    if stats is None:
        if dim is None:
            raise ValueError("either stats or dim must be given")
        stats = sq8_stats(df, vec_col, dim)
    out = df.crossJoin(F.broadcast(stats))
    return out.select(
        F.col(id_col),
        _levels(F.col(vec_col), F.col("mins"), F.col("maxs")).alias("codes"),
    )


def dequantize_expr(codes: Column, mins: Column, maxs: Column) -> Column:
    """Reconstruct approximate values from levels (bucket midpoints):
    ``v_i ~ mn_i + (level_i + 0.5) * (mx_i - mn_i) / 256``."""
    idx = F.sequence(F.lit(0), F.size(codes) - 1)
    return F.transform(
        idx,
        lambda i: mins[i]
        + (codes[i].cast("double") + F.lit(0.5))
        * (maxs[i] - mins[i])
        / F.lit(float(SQ_LEVELS)),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    k: int = 10,
    dim: Optional[int] = None,
    stats: Optional[DataFrame] = None,
) -> DataFrame:
    """Asymmetric top-k: float queries against the int8-quantized corpus.

    Returns ``(query_id, vec_id, score, rank)`` where ``score`` is the
    cosine between the float query and the dequantized corpus vector.
    The corpus-side input to the ranking stage is the 4x-smaller code
    column; queries are broadcast; ranking goes through
    ``topk_per_query`` (partition-pruned via WindowGroupLimit). At scale
    you would persist :func:`sq8_quantize`'s output once and run every
    search against it — the stats row is the only full-corpus pass.
    """
    if stats is None:
        if dim is None:
            raise ValueError("either stats or dim must be given")
        stats = sq8_stats(corpus, vec_col, dim)
    qid = query_id_col or id_col
    codes = sq8_quantize(corpus, id_col, vec_col, stats=stats)

    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec"))
    scored = (
        F.broadcast(q)
        .crossJoin(codes.crossJoin(F.broadcast(stats)))
        .select(
            "query_id",
            F.col(id_col).alias("vec_id"),
            F.col("__qvec"),
            dequantize_expr(F.col("codes"), F.col("mins"), F.col("maxs")).alias(
                "__dvec"
            ),
        )
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("__qvec"), F.col("__dvec"), lambda x, y: x.cast("double") * y
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__qvec"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    dnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__dvec"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    ranked = scored.select(
        "query_id",
        "vec_id",
        F.round(dot / (qnorm * dnorm), 6).alias("score"),
    )
    # Catalyst's partial WindowGroupLimit prunes each input partition
    # to top-k before the exchange (see topk_per_query's docstring)
    from .similarity import topk_per_query

    return topk_per_query(ranked, "score", k)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the billion-vector production layout
# ---------------------------------------------------------------------------


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    max_iter: int = 5,
) -> DataFrame:
    """Train ``m`` per-subspace codebooks of ``k`` centroids each
    (Jegou et al., "Product Quantization for Nearest Neighbor Search",
    IEEE TPAMI 2011): the vector is split into ``m`` contiguous
    ``dim/m``-dim subvectors and each subspace gets its own k-means.

    Returns ``(subspace, code, centroid array<double>)`` with dense
    codes 0..k-1 — ``m * k`` rows total, always broadcastable. Each
    subspace fit reuses :func:`~hermes_spark.operators.similarity.
    kmeans_centroids` (deterministic init, single-shuffle iterations);
    at 100 TB you fit on a deterministic sample, not the full corpus —
    pass the sampled frame.
    """
    from .similarity import kmeans_centroids

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    books = []
    for s in range(m):
        sub = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("__sub"),
        )
        cents = kmeans_centroids(
            sub, k=k, id_col=id_col, vec_col="__sub", dim=d_sub, max_iter=max_iter
        )
        # remap the arbitrary init-row centroid ids to dense 0..k-1 in
        # centroid-id order (deterministic)
        w = Window.orderBy("centroid_id")
        books.append(
            cents.select(
                F.lit(s).alias("subspace"),
                (F.row_number().over(w) - 1).alias("code"),
                F.col("__sub").alias("centroid"),
            )
        )
    out = books[0]
    for b in books[1:]:
        out = out.unionByName(b)
    return out


def _sub_dist2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Encode each vector as ``m`` small codes: ``(id, codes array<int>)``.

    One explode to ``(id, subspace, subvector)`` (``m`` narrow rows per
    vector), one broadcast join against the ``m*k``-row codebook, one
    min-distance pick, one regroup — the corpus is scanned once and the
    shuffled rows carry ``8+4+4`` bytes, never the float vector. A
    64-dim float32 vector (256 B) becomes ``m`` bytes (32x with m=8,
    k<=256).
    """
    d_sub = dim // m
    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col(vec_col), s * d_sub + 1, d_sub),
            )
        ).alias("subspace", "__sub"),
    )
    scored = exploded.join(F.broadcast(codebooks), "subspace").select(
        id_col,
        "subspace",
        "code",
        _sub_dist2(F.col("__sub"), F.col("centroid")).alias("__d2"),
    )
    w = Window.partitionBy(id_col, "subspace").orderBy(
        F.col("__d2").asc(), F.col("code").asc()
    )
    best = scored.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    return (
        best.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("subspace"), F.col("code")))
                ),
                lambda sc: sc["code"],
            ).alias("codes")
        )
    )


def pq_topk(
    corpus_codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: per query, the inner
    product is approximated as the sum over subspaces of
    ``<query_sub, centroid[code_s]>`` — a per-query lookup table (m*k
    entries) joined against the exploded codes.

    Pass L2-normalized vectors for cosine semantics. Scale shape: the
    LUT (queries x m x k rows) is broadcast; the corpus side streams
    ``(id, subspace, code)`` triples — 16 bytes/row, no floats — into a
    broadcast-hash join plus one (query, id) aggregation.
    Returns ``(query_id, vec_id, score, rank)``.
    """
    d_sub = dim // m
    qid = query_id_col or id_col
    q_subs = queries.select(
        F.col(qid).alias("query_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice(F.col(vec_col), s * d_sub + 1, d_sub),
            )
        ).alias("subspace", "__qsub"),
    )
    lut = q_subs.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        "subspace",
        "code",
        F.aggregate(
            F.zip_with(
                F.col("__qsub"), F.col("centroid"), lambda x, y: x.cast("double") * y
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("__partial"),
    )
    triples = corpus_codes.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(F.col("codes")).alias("subspace", "code"),
    )
    scored = (
        triples.join(F.broadcast(lut), ["subspace", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("__partial"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_sq8_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    centroid_id_col: str = "centroid_id",
    k: int = 10,
    nprobe: int = 1,
    dim: Optional[int] = None,
    stats: Optional[DataFrame] = None,
) -> DataFrame:
    """IVF routing + int8 asymmetric scoring — the combined production
    search layout: each query probes only its ``nprobe`` nearest cells
    (a centroids-fold cut in candidates) AND the candidates are scored
    from 4x-smaller int8 codes instead of float vectors.

    The corpus-side frame that reaches the candidate join carries
    ``(vec_id, cell, codes)`` — at a billion vectors that is the index
    you persist once and serve from. Exact floor/double arithmetic
    end-to-end, so the full pipeline (assignment, quantization,
    dequantized cosine) is oracle-checkable. Returns ``(query_id,
    vec_id, score, rank)``.
    """
    from .similarity import ivf_assign

    if stats is None:
        if dim is None:
            raise ValueError("either stats or dim must be given")
        stats = sq8_stats(corpus, vec_col, dim)
    qid = query_id_col or id_col

    cells = ivf_assign(corpus, centroids, id_col, vec_col, centroid_id_col).select(
        "vec_id", F.col(centroid_id_col).alias("__cell")
    )
    codes = sq8_quantize(corpus, id_col, vec_col, stats=stats).select(
        F.col(id_col).alias("vec_id"), "codes"
    )
    indexed = codes.join(cells, on="vec_id")

    query_cells = (
        ivf_assign(queries, centroids, qid, vec_col, centroid_id_col, top_n=nprobe)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col(centroid_id_col).alias("__cell"),
        )
        .join(
            queries.select(
                F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec")
            ),
            on="query_id",
        )
    )

    scored = (
        F.broadcast(query_cells)
        .join(indexed, on="__cell")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "vec_id",
            F.col("__qvec"),
            dequantize_expr(F.col("codes"), F.col("mins"), F.col("maxs")).alias(
                "__dvec"
            ),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("__qvec"), F.col("__dvec"), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__qvec"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    dnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("__dvec"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    ranked = scored.select(
        "query_id", "vec_id", F.round(dot / (qnorm * dnorm), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return ranked.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_sq8_rescore_topk(
    corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    centroid_id_col: str = "centroid_id",
    k: int = 10,
    shortlist: int = 50,
    nprobe: int = 1,
    dim: Optional[int] = None,
    stats: Optional[DataFrame] = None,
) -> DataFrame:
    """Two-stage production ANN: IVF + int8 approximate search produces a
    per-query ``shortlist``, then ONLY those candidates are re-scored
    against the original float vectors and the exact top-``k`` returned.

    This is the standard accuracy-recovery pattern for quantized
    indexes: the scan stage still reads 4x-smaller codes and prunes by
    cell, while the rescore touches |queries| x shortlist float vectors
    — driver-independent, broadcast-joined, negligible next to the scan.
    Returns ``(query_id, vec_id, score, rank)`` where score is the
    exact cosine.
    """
    from .similarity import cosine_similarity

    approx = ivf_sq8_topk(
        corpus,
        centroids,
        queries,
        id_col,
        vec_col,
        query_id_col,
        centroid_id_col,
        k=shortlist,
        nprobe=nprobe,
        dim=dim,
        stats=stats,
    )
    qid = query_id_col or id_col
    cand = approx.select("query_id", "vec_id")
    qvecs = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    rescored = (
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cvec"))
        .join(F.broadcast(cand), on="vec_id")
        .join(F.broadcast(qvecs), on="query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                cosine_similarity(F.col("__qvec"), F.col("__cvec")), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def pick_nprobe(
    corpus: DataFrame,
    centroids: DataFrame,
    sample_queries: DataFrame,
    target_recall: float = 0.9,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    dim: Optional[int] = None,
    stats: Optional[DataFrame] = None,
    max_nprobe: Optional[int] = None,
) -> "tuple[int, list[dict]]":
    """Empirically pick the smallest ``nprobe`` whose measured recall@k
    on a QUERY SAMPLE meets ``target_recall`` — the operational answer
    to "what accuracy knob do I set": measure on a held-out sample, not
    guess from theory.

    Doubling schedule (1, 2, 4, ... up to the centroid count), ground
    truth from :func:`~hermes_spark.operators.similarity.
    brute_force_cosine_topk` on the sample; returns ``(nprobe, curve)``
    where ``curve`` is ``[{"nprobe": n, "recall": r}, ...]`` for every
    probe evaluated (log it — the curve's shape tells you whether the
    index or the quantizer is the recall bottleneck).

    Scale shape: the sample is small (tens of queries), so each
    evaluation is one IVF search plus a broadcast brute-force pass over
    the corpus for truth — the truth pass runs ONCE and is reused
    across the schedule.  Only (query_id, vec_id) id pairs are
    collected.  Cost is O(log max_nprobe) index searches; run it on a
    corpus sample for very large deployments.
    """
    from .similarity import brute_force_cosine_topk

    if not 0.0 < target_recall <= 1.0:
        raise ValueError(f"target_recall must be in (0, 1], got {target_recall}")
    n_centroids = centroids.count()
    cap = min(max_nprobe or n_centroids, n_centroids)

    truth_rows = brute_force_cosine_topk(
        corpus, sample_queries, id_col, vec_col, query_id_col, k=k
    ).select("query_id", "vec_id").collect()
    truth: dict = {}
    for r in truth_rows:
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    denom = sum(len(v) for v in truth.values())
    if denom == 0:
        raise ValueError("empty ground truth: sample_queries or corpus is empty")

    curve: "list[dict]" = []
    nprobe = 1
    while True:
        got_rows = ivf_sq8_rescore_topk(
            corpus, centroids, sample_queries, id_col, vec_col,
            query_id_col, k=k, shortlist=shortlist, nprobe=nprobe,
            dim=dim, stats=stats,
        ).select("query_id", "vec_id").collect()
        hits = sum(
            1 for r in got_rows if r["vec_id"] in truth.get(r["query_id"], ())
        )
        recall = hits / denom
        curve.append({"nprobe": nprobe, "recall": round(recall, 4)})
        if recall >= target_recall or nprobe >= cap:
            return nprobe, curve
        nprobe = min(nprobe * 2, cap)

"""Deterministic synthetic corpora for benchmarks and scale probes.

The bundled test corpus (``documents.parquet``) has a ~31-token
vocabulary — fine for oracle checks, degenerate for anything whose
scale behavior depends on term statistics (prefix-filtered set joins,
TF-IDF, LSH bucket sizes).  This module generates REALISTIC-vocabulary
corpora fully Spark-side (hash-derived, no driver data, no RNG state):

* term ranks are log-uniform — ``rank = floor(V^u)`` for ``u`` uniform
  on [0,1) — which gives the classic Zipf ``P(rank=r) ∝ 1/r`` law over
  a ``V``-term vocabulary (the inverse-CDF of the truncated zeta with
  s=1 is exactly exponential in u);
* everything derives from ``xxhash64(doc_id, position, seed)``: the
  corpus is reproducible per (n_docs, vocab_size, doc_len, seed) with
  zero shuffle — one project over ``spark.range``.

Scale shape: generation is embarrassingly parallel; ``spark.range``
partitions evenly, so 10M docs generate as fast as the cluster can
write them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zipf_documents(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 20_000,
    doc_len: int = 60,
    seed: int = 0,
    near_dup_every: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """``(doc_id long, text string)`` with Zipf-distributed tokens.

    ``near_dup_every=k`` (k > 0) plants near-duplicates: every k-th
    document is a copy of the previous document with its last ~10% of
    tokens regenerated — giving the similarity joins a known signal to
    find (pairs ``(i-1, i)`` for ``i % k == 0`` at token-Jaccard ~0.8+).
    """
    if vocab_size < 2:
        raise ValueError("vocab_size must be >= 2")
    rng = spark.range(0, n_docs, 1, partitions) if partitions else spark.range(n_docs)
    ln_v = math.log(vocab_size)

    def term(doc: F.Column, pos: F.Column) -> F.Column:
        # u in [0, 1) from a 64-bit hash; rank = floor(V^u) in [1, V]
        u = (
            F.pmod(F.xxhash64(doc, pos, F.lit(seed)), F.lit(1_000_000_007))
            / F.lit(1_000_000_007.0)
        )
        rank = F.least(
            F.floor(F.exp(u * F.lit(ln_v))).cast("long"), F.lit(int(vocab_size))
        )
        return F.concat(F.lit("w"), F.lpad(rank.cast("string"), 7, "0"))

    if near_dup_every and near_dup_every > 1:
        # near-dups re-use the PREVIOUS doc's hash stream for the first
        # 90% of positions and fresh hashes for the tail
        is_dup = (F.col("id") % near_dup_every == 0) & (F.col("id") > 0)
        cut = int(doc_len * 0.9)
        src = F.when(is_dup, F.col("id") - 1).otherwise(F.col("id"))
        toks = F.transform(
            F.sequence(F.lit(1), F.lit(doc_len)),
            lambda j: F.when(
                is_dup & (j > cut), term(F.col("id"), j + F.lit(1_000_000))
            ).otherwise(term(src, j)),
        )
    else:
        toks = F.transform(
            F.sequence(F.lit(1), F.lit(doc_len)),
            lambda j: term(F.col("id"), j),
        )
    return rng.select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", toks).alias("text")
    )

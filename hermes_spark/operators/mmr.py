"""Maximal Marginal Relevance (MMR) diversified top-k selection.

Extension beyond reference parity (see ``SURVEY.md`` §2 extension
table). MMR (Carbonell & Goldstein, SIGIR'98) re-ranks a candidate
pool so results are relevant to the query *and* dissimilar to each
other:

    MMR = argmax_{d ∈ C\\S} [ λ·sim(d, q) − (1−λ)·max_{s∈S} sim(d, s) ]

with ``max`` over the empty selected set taken as 0 (so the first pick
maximizes λ·relevance); once anything is selected the penalty is the
TRUE maximum similarity — which may be negative, in which case it acts
as a bonus, exactly as the formula says.

Uses in a training-data pipeline: picking a *diverse* few-shot set per
query, diversified retrieval for RAG eval sets, spreading semantic
clusters in curated subsets.

Scale design (100 TB corpus, many queries):

* MMR is greedy-sequential in k, so it CANNOT be a corpus-wide
  distributed loop — and doesn't need to be: the standard shape is
  candidate-generation (distributed ANN; here exact or IVF top-N) down
  to ``pool_size`` ≪ corpus per query, then the greedy selection runs
  inside one Arrow batch per query via ``applyInPandas``. Each group
  is (pool_size × dim) floats — a few hundred KB — and the selection
  is O(k · pool) BLAS dot products.
* Every query group is independent → embarrassingly parallel across
  executors; the corpus itself is touched only by the candidate
  generator, which is the already-plan-audited top-k operator.
* The greedy trace is oracle-checkable: relevance and the
  candidate-candidate similarities are both quantized to 6 dp before
  any comparison, so the selection compares identical doubles on both
  engines *provided the unrounded cosines agree to within the 6-dp
  rounding slack*.  The unrounded values come from different summation
  orders per engine (NumPy pairwise/BLAS dots vs DuckDB sequential
  ``list_sum``), so the guarantee is rounded-input agreement up to
  ulp-level effects — a cosine landing within an ulp of a ``.5e-6``
  boundary could round apart (never observed on the test corpora; the
  driver gate would surface it as a hash mismatch).  The fixed-k loop
  unrolls into a plain CTE chain (see ``_sql_mmr_select`` in
  ``__spark_entry__.py``); a NumPy reference implementation
  (``tests/test_curation_r4b.py``) guards the semantics independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from .similarity import brute_force_cosine_topk

__all__ = ["mmr_select", "mmr_rerank_pandas"]


def _greedy_mmr(qids, vids, rel, vecs, k: int, lam: float):
    """NumPy greedy MMR over one candidate pool. Returns row tuples.

    Ids pass through untouched (whatever type the caller's id columns
    carry); only relevance/score are coerced to float.
    """
    import numpy as np

    n = len(vids)
    mat = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    rel = np.asarray(rel, dtype=np.float64)

    selected: list[int] = []
    # max over the EMPTY selected set is 0 (first pick = lam * rel);
    # after the first selection max_sim holds the true maximum, which
    # is allowed to be negative (the formula's penalty becomes a bonus)
    max_sim = np.zeros(n)
    out = []
    for rank in range(1, min(k, n) + 1):
        score = lam * rel - (1.0 - lam) * max_sim
        # deterministic tiebreak: highest score, then smallest id
        best = min(
            (i for i in range(n) if i not in selected),
            key=lambda i: (-score[i], vids[i]),
        )
        out.append(
            (
                qids[best],
                vids[best],
                round(float(rel[best]), 6),
                round(float(score[best]), 6),
                rank,
            )
        )
        # candidate-candidate similarities are quantized to 6 dp — the
        # same quantization the relevance scores already carry — so the
        # greedy trace is engine-reproducible (the SQL oracle replays
        # the identical arithmetic on identical rounded inputs)
        sims = np.round(unit @ unit[best], 6)
        if selected:
            max_sim = np.maximum(max_sim, sims)
        else:
            max_sim = sims  # replace the empty-set zeros, keep sign
        selected.append(best)
    return out


def _out_schema(candidates: DataFrame) -> StructType:
    """Output schema with id types inherited from the candidate frame
    (string/int/long ids all work — same posture as
    ``brute_force_cosine_topk_pandas``)."""
    by_name = {f.name: f.dataType for f in candidates.schema.fields}
    return StructType(
        [
            StructField("query_id", by_name["query_id"]),
            StructField("vec_id", by_name["vec_id"]),
            StructField("relevance", DoubleType()),
            StructField("mmr_score", DoubleType()),
            StructField("mmr_rank", LongType()),
        ]
    )


def mmr_rerank_pandas(
    candidates: DataFrame,
    vec_col: str = "embedding",
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Greedy MMR inside each ``query_id`` group of a candidate frame.

    ``candidates`` must carry ``(query_id, vec_id, relevance,
    <vec_col>)``. Returns ``(query_id, vec_id, relevance, mmr_score,
    mmr_rank)`` with ``mmr_rank`` 1..k per query; id column types are
    inherited from the input.
    """
    schema = _out_schema(candidates)

    def select_group(pdf):
        import pandas as pd

        rows = _greedy_mmr(
            pdf["query_id"].to_numpy(),
            pdf["vec_id"].to_numpy(),
            pdf["relevance"].to_numpy(),
            list(pdf[vec_col]),
            k,
            lam,
        )
        return pd.DataFrame(
            rows, columns=["query_id", "vec_id", "relevance", "mmr_score", "mmr_rank"]
        )

    return candidates.groupBy("query_id").applyInPandas(select_group, schema)


def mmr_select(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    k: int = 10,
    pool_size: int = 50,
    lam: float = 0.7,
) -> DataFrame:
    """Candidate-gen + greedy MMR: diversified top-``k`` per query.

    Stage 1 is the exact broadcast top-``pool_size`` (swap in
    ``ivf_topk`` for billion-row corpora — same candidate contract);
    stage 2 re-joins the tiny pool (broadcast — the corpus must never
    shuffle for it) to its vectors and runs greedy MMR per query group
    in one Arrow batch.
    """
    pool = brute_force_cosine_topk(
        corpus, queries, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, k=pool_size,
    ).select("query_id", "vec_id", F.col("cosine").alias("relevance"))
    with_vecs = F.broadcast(pool).join(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col)), "vec_id"
    )
    return mmr_rerank_pandas(with_vecs, vec_col=vec_col, k=k, lam=lam)

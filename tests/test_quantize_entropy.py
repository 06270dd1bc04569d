"""Tests for int8 scalar quantization, entropy signals, link stats, and
target-mix rebalancing (round-4 extension operators)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hermes_spark.functions.text import extract_urls, link_density, url_domains
from hermes_spark.operators import (
    entropy_profile,
    pq_encode,
    pq_topk,
    pq_train,
    rebalance_mix,
    sq8_quantize,
    sq8_stats,
    sq8_topk,
    unit_entropy,
    brute_force_cosine_topk,
)
from hermes_spark.operators.quantize import SQ_LEVELS

DIM = 64


# ---------------------------------------------------------------------------
# sq8 quantization
# ---------------------------------------------------------------------------


def test_sq8_stats_single_row(spark, embeddings):
    row = sq8_stats(embeddings, "embedding", DIM).collect()
    assert len(row) == 1
    mins, maxs = row[0]["mins"], row[0]["maxs"]
    assert len(mins) == DIM and len(maxs) == DIM
    assert all(mn <= mx for mn, mx in zip(mins, maxs))


def test_sq8_quantize_matches_numpy(spark, embeddings):
    stats = sq8_stats(embeddings, "embedding", DIM)
    out = sq8_quantize(embeddings, stats=stats).orderBy("vec_id").collect()
    src = embeddings.orderBy("vec_id").collect()
    mins = np.array(stats.collect()[0]["mins"])
    maxs = np.array(stats.collect()[0]["maxs"])
    span = maxs - mins
    span[span == 0] = 1.0
    for got, want in zip(out[:50], src[:50]):
        assert got["vec_id"] == want["vec_id"]
        v = np.array([float(x) for x in want["embedding"]], dtype=np.float64)
        levels = np.minimum(
            SQ_LEVELS - 1, np.floor((v - mins) / span * SQ_LEVELS)
        ).astype(int)
        levels[maxs == mins] = 0
        assert list(got["codes"]) == list(levels)
        assert all(0 <= c <= 255 for c in got["codes"])


def test_sq8_degenerate_dimension(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [1.0, 7.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: list(r["codes"]) for r in sq8_quantize(df, dim=2).collect()}
    # dim 0 is constant -> level 0 for everyone; dim 1 spans [5, 7]
    assert out[1][0] == 0 and out[2][0] == 0
    assert out[1][1] == 0 and out[2][1] == SQ_LEVELS - 1


def test_sq8_topk_recall_vs_exact(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 5)
    exact = brute_force_cosine_topk(embeddings, queries, k=10).collect()
    quant = sq8_topk(embeddings, queries, k=10, dim=DIM).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    quant_sets = {}
    for r in quant:
        quant_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & quant_sets[q]) / len(exact_sets[q]) for q in exact_sets
    ]
    # int8 over 64 dims loses little: demand strong average recall@10
    assert sum(recalls) / len(recalls) >= 0.8
    # self-match must survive quantization at rank 1 for every query
    for r in quant:
        if r["query_id"] == r["vec_id"]:
            assert r["rank"] == 1


def test_sq8_topk_plan_broadcasts(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 3)
    plan = sq8_topk(embeddings, queries, k=5, dim=DIM)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# entropy
# ---------------------------------------------------------------------------


def _py_entropy(counts):
    n = sum(counts)
    return -sum(c / n * math.log2(c / n) for c in counts)


def test_unit_entropy_char_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "  "), (5, "aab")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in unit_entropy(df, "doc_id", "text").collect()}
    assert out[1]["entropy_bits"] == 0.0
    assert abs(out[2]["entropy_bits"] - 1.0) < 1e-9
    assert abs(out[3]["entropy_bits"] - 2.0) < 1e-9
    # whitespace-only text: spaces ARE units at char level (entropy 0)
    assert out[4]["entropy_bits"] == 0.0 and out[4]["distinct_units"] == 1
    assert abs(out[5]["entropy_bits"] - _py_entropy([2, 1])) < 1e-6
    assert out[3]["n_units"] == 4 and out[3]["distinct_units"] == 4


def test_unit_entropy_token_mode(spark):
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unit_entropy(df, "doc_id", "text", unit="token").collect()}
    assert out[1]["entropy_bits"] == 0.0 and out[1]["distinct_units"] == 1
    assert abs(out[2]["entropy_bits"] - 2.0) < 1e-9


def test_entropy_profile_on_corpus(spark, documents):
    out = entropy_profile(documents, "doc_id", "text")
    rows = out.collect()
    assert len(rows) == documents.filter(F.trim("text") != "").count()
    for r in rows[:20]:
        assert 0.0 <= r["char_entropy"] <= 8.0
        assert r["token_entropy"] >= 0.0
        assert r["chars_per_token"] > 0


# ---------------------------------------------------------------------------
# link stats
# ---------------------------------------------------------------------------


def test_extract_urls_and_domains(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://a.example.com/x and http://b.org plus https://a.example.com/y"),
            (2, "no links here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            extract_urls(F.col("text")).alias("urls"),
            url_domains(F.col("text")).alias("domains"),
            link_density(F.col("text")).alias("density"),
        ).collect()
    }
    assert len(out[1]["urls"]) == 3
    assert out[1]["domains"] == ["a.example.com", "b.org"]
    assert abs(out[1]["density"] - 0.5) < 1e-9  # 3 URLs / 6 tokens
    assert out[2]["urls"] == [] and out[2]["domains"] == [] and out[2]["density"] == 0.0


# ---------------------------------------------------------------------------
# rebalance_mix
# ---------------------------------------------------------------------------


def test_rebalance_mix_hits_target(spark, documents):
    targets = {"web": 0.5, "books": 0.5}
    out = rebalance_mix(documents, "doc_id", "source", targets)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(targets)
    if len(counts) == 2:
        a, b = counts["web"], counts["books"]
        # equal target shares -> counts within hash-sampling noise of each other
        assert abs(a - b) / max(a, b) < 0.35
    # subset of the input, deterministic across invocations
    assert out.count() == rebalance_mix(documents, "doc_id", "source", targets).count()
    assert out.join(documents, "doc_id", "left_anti").count() == 0


def test_rebalance_mix_drops_unlisted_strata(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(200)],
        "doc_id long, source string",
    )
    out = rebalance_mix(df, "doc_id", "source", {"keep": 1.0})
    assert out.filter(F.col("source") == "drop").count() == 0
    # single stratum at share 1.0 keeps (nearly) everything: threshold
    # floor can shave at most 1/10000
    assert out.count() >= 99


def test_rebalance_mix_scarce_stratum_caps_total(spark):
    rows = [(i, "big") for i in range(1000)] + [(10_000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = rebalance_mix(df, "doc_id", "source", {"big": 0.5, "small": 0.5})
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # 'small' (100 rows) is the limiting stratum: it keeps ~everything,
    # 'big' downsamples to ~100 to hold the 50/50 mix
    assert counts["small"] >= 85
    assert counts["big"] <= 135


def test_decontaminate_shuffle_path_matches_broadcast(spark, documents):
    from hermes_spark.operators import decontaminate

    bench = documents.filter(F.col("doc_id") < 20).select("text")
    a = decontaminate(documents, bench, "doc_id", "text", broadcast=True)
    b = decontaminate(documents, bench, "doc_id", "text", broadcast=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def normalized_embeddings(spark, embeddings):
    """L2-normalized vectors so inner product == cosine for PQ tests."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda a, v: a + v,
        )
    )
    return embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double") / norm).alias(
            "embedding"
        ),
    ).cache()


def test_pq_train_shape(spark, normalized_embeddings):
    books = pq_train(normalized_embeddings, m=8, k=8, dim=DIM, max_iter=3)
    rows = books.collect()
    by_sub = {}
    for r in rows:
        by_sub.setdefault(r["subspace"], []).append(r)
        assert len(r["centroid"]) == DIM // 8
    assert set(by_sub) == set(range(8))
    for s, cents in by_sub.items():
        codes = sorted(r["code"] for r in cents)
        assert codes == list(range(len(codes)))  # dense 0..k'-1
        assert len(codes) <= 8


def test_pq_encode_roundtrip_and_topk_recall(spark, normalized_embeddings):
    emb = normalized_embeddings
    books = pq_train(emb, m=8, k=16, dim=DIM, max_iter=3)
    codes = pq_encode(emb, books, m=8, dim=DIM).cache()
    got = codes.collect()
    assert len(got) == emb.count()
    for r in got[:20]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])

    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_cosine_topk(emb, queries, k=10).collect()
    approx = pq_topk(codes, books, queries, k=10, m=8, dim=DIM).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets[q]) / len(exact_sets[q]) for q in exact_sets
    ]
    # 8x16 PQ on 64-dim random vectors is lossy; demand the self-match
    # plus a meaningful fraction of true neighbors
    assert sum(recalls) / len(recalls) >= 0.3
    for q in exact_sets:
        assert q in approx_sets[q]  # self-match always survives


def test_pq_topk_plan_is_broadcast_only(spark, normalized_embeddings):
    emb = normalized_embeddings
    books = pq_train(emb.limit(100), m=4, k=4, dim=DIM, max_iter=1)
    codes = pq_encode(emb, books, m=4, dim=DIM)
    queries = emb.filter(F.col("vec_id") < 2)
    plan = (
        pq_topk(codes, books, queries, k=5, m=4, dim=DIM)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan


def test_ivf_sq8_topk_agrees_with_ivf_cells(spark, embeddings):
    """The combined IVF+SQ8 search returns the same cells' candidates as
    float IVF, with quantization-level score error only."""
    from hermes_spark.operators import ivf_sq8_topk
    from hermes_spark.operators.similarity import ivf_topk

    centroids = embeddings.filter(F.col("vec_id") < 8).withColumnRenamed(
        "vec_id", "centroid_id"
    )
    queries = embeddings.filter(F.col("vec_id") < 5)
    fl = ivf_topk(embeddings, centroids, queries, k=10).collect()
    qz = ivf_sq8_topk(embeddings, centroids, queries, k=10, dim=DIM).collect()
    fl_sets, qz_sets = {}, {}
    for r in fl:
        fl_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in qz:
        qz_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(fl_sets[q] & qz_sets[q]) / len(fl_sets[q]) for q in fl_sets]
    assert sum(recalls) / len(recalls) >= 0.8
    # scores approximate the float cosine within int8 quantization error
    fl_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in fl}
    for r in qz:
        key = (r["query_id"], r["vec_id"])
        if key in fl_scores:
            assert abs(r["score"] - fl_scores[key]) < 0.05


def test_ivf_rescore_recovers_exact_ordering(spark, embeddings):
    """Two-stage search: the rescore stage must (a) return exact cosine
    scores for everything it keeps, and (b) beat-or-match the pure
    quantized path's recall against brute force."""
    from hermes_spark.operators import ivf_sq8_rescore_topk, ivf_sq8_topk

    centroids = embeddings.filter(F.col("vec_id") < 4).withColumnRenamed(
        "vec_id", "centroid_id"
    )
    queries = embeddings.filter(F.col("vec_id") < 5)
    exact = brute_force_cosine_topk(embeddings, queries, k=10).collect()
    quant = ivf_sq8_topk(embeddings, centroids, queries, k=10, dim=DIM).collect()
    resc = ivf_sq8_rescore_topk(
        embeddings, centroids, queries, k=10, shortlist=50, dim=DIM
    ).collect()

    exact_scores = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact}
    for r in resc:
        key = (r["query_id"], r["vec_id"])
        if key in exact_scores:  # rescored score IS the exact cosine
            assert r["score"] == pytest.approx(exact_scores[key], abs=1e-6)

    def sets(rows):
        d = {}
        for r in rows:
            d.setdefault(r["query_id"], set()).add(r["vec_id"])
        return d

    es, qs, rs = sets(exact), sets(quant), sets(resc)
    q_recall = sum(len(es[q] & qs[q]) / len(es[q]) for q in es) / len(es)
    r_recall = sum(len(es[q] & rs[q]) / len(es[q]) for q in es) / len(es)
    assert r_recall >= q_recall - 1e-9
    # every query keeps exactly k results, ranked 1..k
    per_q = {}
    for r in resc:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, 11)) for v in per_q.values())


def test_pick_nprobe_meets_target_on_clustered_data(spark):
    """Round-6: empirical nprobe auto-tuning — on clustered (mixture)
    data the tuner must find an nprobe whose measured recall@k on the
    sample meets the target, with a monotone non-decreasing curve."""
    import numpy as np

    from hermes_spark.operators import kmeans_centroids, pick_nprobe

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, DIM)) * 3.0
    rows = []
    for i in range(1600):
        c = i % 8
        v = centers[c] + rng.normal(size=DIM) * 0.3
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(emb, k=8, dim=DIM, max_iter=5)
    sample = emb.filter(F.col("vec_id") % 200 == 7)  # 8 sample queries

    nprobe, curve = pick_nprobe(
        emb, cents, sample, target_recall=0.9, k=10, shortlist=60, dim=DIM
    )
    assert curve[-1]["recall"] >= 0.9, curve
    assert nprobe == curve[-1]["nprobe"]
    assert nprobe <= 8
    recalls = [c["recall"] for c in curve]
    assert all(b >= a - 0.05 for a, b in zip(recalls, recalls[1:])), curve

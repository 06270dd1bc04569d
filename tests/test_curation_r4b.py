"""Round-4b curation operators: n-gram mining, quality classifier,
random projection, DSIR importance weighting, MMR diversification.

Each operator is checked against a hand-computed or independent NumPy
reference on tiny data, plus plan-shape assertions pinning the 100 TB
posture (no shuffle where none is needed, TakeOrderedAndProject for
top-k, broadcast for the λ-table join)."""

import math

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hermes_spark.operators import (
    dsir_weights,
    linear_quality_score,
    mmr_select,
    ngram_novelty,
    random_project,
    sign_matrix,
    topk_ngrams,
)
from hermes_spark.operators.classify import QUALITY_WEIGHTS, STOPWORDS
from hermes_spark.plans import count_exchanges, plan_operators


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="the cat sat on the hat"),
            Row(doc_id=3, text="a dog ran fast"),
            Row(doc_id=4, text="the cat sat"),
        ]
    )


# ---------------------------------------------------------------- ngrams
def test_topk_ngrams_counts(spark, tiny_docs):
    out = topk_ngrams(tiny_docs, "doc_id", "text", n=2, k=3).collect()
    # "the cat" and "cat sat" appear in docs 1,2,4 once each (total 3);
    # tie broken alphabetically: "cat sat" < "the cat"
    assert [(r.gram, r.doc_freq, r.total_count, r.rank) for r in out] == [
        ("cat sat", 3, 3, 1),
        ("the cat", 3, 3, 2),
        ("on the", 2, 2, 3),
    ]


def test_topk_ngrams_counts_repeats_within_doc(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="go go go")])
    out = topk_ngrams(df, "doc_id", "text", n=2, k=1).collect()
    assert [(r.gram, r.doc_freq, r.total_count) for r in out] == [("go go", 1, 2)]


def test_topk_ngrams_uses_take_ordered(spark, documents):
    plan_ops = plan_operators(topk_ngrams(documents, "doc_id", "text", n=2, k=10))
    assert any("TakeOrderedAndProject" in op for op in plan_ops)


def test_ngram_novelty_first_doc_wins(spark, tiny_docs):
    out = {r.doc_id: r for r in ngram_novelty(tiny_docs, "doc_id", "text", n=2).collect()}
    # doc 1 introduces all 5 of its bigrams
    assert out[1].n_grams == 5 and out[1].novel_grams == 5 and out[1].novelty == 1.0
    # doc 2: "the cat","cat sat","on the" seen in doc 1; "sat on" also doc1;
    # novel: "the hat" only -> 1/5
    assert out[2].n_grams == 5 and out[2].novel_grams == 1
    assert out[2].novelty == round(1 / 5, 6)
    # doc 4's bigrams all introduced by doc 1
    assert out[4].novel_grams == 0 and out[4].novelty == 0.0
    # doc 3 is all-new
    assert out[3].novelty == 1.0


def test_ngram_novelty_doc_freq_bounds(spark, tiny_docs):
    # max_doc_freq=2 drops "the cat"/"cat sat" (df=3) from both ratio sides
    out = {
        r.doc_id: r
        for r in ngram_novelty(
            tiny_docs, "doc_id", "text", n=2, max_doc_freq=2
        ).collect()
    }
    assert out[1].n_grams == 3  # sat on, on the, the mat
    # doc 4's only bigrams both have df=3 -> nothing left, doc absent
    assert 4 not in out


# ------------------------------------------------------------- classifier
def test_quality_features_hand_computed(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="The cat and the cat")])
    r = linear_quality_score(df, "doc_id", "text").first()
    assert r.n_tokens == 5
    assert r.mean_tok_len == round(15 / 5, 6)  # Thecatandthecat = 15 chars
    assert r.distinct_ratio == round(3 / 5, 6)  # the, cat, and
    assert r.stopword_ratio == round(3 / 5, 6)  # the, and, the
    z = (
        QUALITY_WEIGHTS["bias"]
        + QUALITY_WEIGHTS["log_n_tokens"] * math.log(6.0)
        + QUALITY_WEIGHTS["mean_tok_len"] * r.mean_tok_len
        + QUALITY_WEIGHTS["distinct_ratio"] * r.distinct_ratio
        + QUALITY_WEIGHTS["stopword_ratio"] * r.stopword_ratio
    )
    assert r.quality == round(1.0 / (1.0 + math.exp(-z)), 6)
    assert r.keep == (r.quality >= 0.5)


def test_quality_score_zero_shuffle(spark, documents):
    out = linear_quality_score(documents, "doc_id", "text")
    assert count_exchanges(out) == 0


def test_quality_weights_override(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="x y z")])
    hi = linear_quality_score(df, "doc_id", "text", weights={"bias": 50.0}).first()
    lo = linear_quality_score(df, "doc_id", "text", weights={"bias": -50.0}).first()
    assert hi.quality == 1.0 and hi.keep
    assert lo.quality == 0.0 and not lo.keep


# ------------------------------------------------------------- projection
def test_random_project_matches_numpy(spark, embeddings):
    dim = len(embeddings.first()["embedding"])
    out = random_project(embeddings.limit(20), "vec_id", "embedding", dim, 8, seed=7)
    got = {r.vec_id: np.array(r.proj) for r in out.collect()}
    S = np.array(sign_matrix(dim, 8, seed=7), dtype=np.float64)
    for r in embeddings.limit(20).collect():
        v = np.array(r.embedding, dtype=np.float64)
        want = np.round(S @ v / math.sqrt(8), 6)
        assert np.allclose(got[r.vec_id], want, atol=1e-9), r.vec_id
    assert count_exchanges(out) == 0  # pure per-row expression


def test_sign_matrix_deterministic_and_pm1(spark):
    a = sign_matrix(16, 4, seed=1)
    assert a == sign_matrix(16, 4, seed=1)
    assert a != sign_matrix(16, 4, seed=2)
    assert {s for row in a for s in row} <= {-1, 1}


def test_random_project_preserves_distances_jl(spark, embeddings):
    # JL sanity (not a tight bound): relative distance distortion over a
    # sample stays moderate for 64 -> 32
    rows = embeddings.limit(30).collect()
    dim = len(rows[0]["embedding"])
    S = np.array(sign_matrix(dim, 32, seed=3), dtype=np.float64)
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    P = X @ S.T / math.sqrt(32)
    d0 = np.linalg.norm(X[:1] - X[1:], axis=1)
    d1 = np.linalg.norm(P[:1] - P[1:], axis=1)
    ratio = d1 / d0
    assert 0.5 < ratio.mean() < 1.5
    assert ratio.std() < 0.5


# ------------------------------------------------------------------ DSIR
def test_dsir_weights_reference(spark):
    raw = spark.createDataFrame(
        [
            Row(doc_id=1, text="aa bb aa", lang="en"),
            Row(doc_id=2, text="cc dd", lang="de"),
            Row(doc_id=3, text="aa cc", lang="en"),
        ]
    )
    target = raw.filter(F.col("lang") == "en")
    B, alpha = 64, 0.5
    out = {r.doc_id: r for r in
           dsir_weights(raw, target, "doc_id", "text", buckets=B, alpha=alpha).collect()}

    import hashlib

    def bucket(tok):
        return int(hashlib.md5(f"dsir:{tok}".encode()).hexdigest()[:15], 16) % B

    from collections import Counter

    t_cnt = Counter(bucket(t) for txt in ["aa bb aa", "aa cc"] for t in txt.split())
    r_cnt = Counter(
        bucket(t) for txt in ["aa bb aa", "cc dd", "aa cc"] for t in txt.split()
    )
    tt, rt = sum(t_cnt.values()), sum(r_cnt.values())

    def lam(b):
        return math.log((t_cnt.get(b, 0) + alpha) / (tt + alpha * B)) - math.log(
            (r_cnt.get(b, 0) + alpha) / (rt + alpha * B)
        )

    for doc_id, txt in [(1, "aa bb aa"), (2, "cc dd"), (3, "aa cc")]:
        toks = txt.split()
        want = round(sum(lam(bucket(t)) for t in toks), 6)
        assert out[doc_id].n_tokens == len(toks)
        assert abs(out[doc_id].log_weight - want) < 1e-6, doc_id


def test_dsir_target_docs_score_higher(spark, documents):
    target = documents.filter(F.col("lang") == "en")
    out = dsir_weights(documents, target, "doc_id", "text", buckets=256)
    joined = out.join(documents.select("doc_id", "lang"), "doc_id")
    means = {
        r.lang: r.m
        for r in joined.groupBy("lang").agg(F.avg("log_weight").alias("m")).collect()
    }
    non_en = [v for k, v in means.items() if k != "en"]
    assert non_en and means["en"] > max(non_en)


def test_dsir_lambda_join_is_broadcast(spark, documents):
    from hermes_spark.plans import has_broadcast_join

    target = documents.filter(F.col("lang") == "en")
    out = dsir_weights(documents, target, "doc_id", "text", buckets=128)
    assert has_broadcast_join(out)


# ------------------------------------------------------------------- MMR
def _mmr_reference(unit, rel, vids, k, lam):
    """Independent greedy MMR: max over the EMPTY selected set is 0
    (first pick = lam*rel); afterwards the TRUE max similarity, sign
    preserved (a negative max acts as a bonus, per the formula)."""
    n = len(vids)
    selected, max_sim, out = [], np.zeros(n), []
    for rank in range(1, min(k, n) + 1):
        score = lam * rel - (1 - lam) * max_sim
        order = sorted(
            (i for i in range(n) if i not in selected),
            key=lambda i: (-score[i], vids[i]),
        )
        best = order[0]
        out.append((vids[best], rank))
        sims = np.round(unit @ unit[best], 6)  # 6-dp quantized, as documented
        max_sim = np.maximum(max_sim, sims) if selected else sims
        selected.append(best)
    return out


def test_mmr_matches_numpy_reference(spark, embeddings):
    queries = embeddings.filter(F.col("vec_id") < 3)
    got = mmr_select(embeddings, queries, k=6, pool_size=25, lam=0.6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)

    from hermes_spark.operators.similarity import brute_force_cosine_topk

    pool = brute_force_cosine_topk(embeddings, queries, k=25).collect()
    vecs = {r.vec_id: np.array(r.embedding, float) for r in embeddings.collect()}
    for qid in [0, 1, 2]:
        cand = sorted(
            [(r.vec_id, r.cosine) for r in pool if r.query_id == qid],
            key=lambda t: t[0],
        )
        vids = [c[0] for c in cand]
        rel = np.array([c[1] for c in cand])
        mat = np.array([vecs[v] for v in vids])
        unit = mat / np.linalg.norm(mat, axis=1)[:, None]
        want = _mmr_reference(unit, rel, vids, k=6, lam=0.6)
        have = sorted(
            [(r.vec_id, r.mmr_rank) for r in by_q[qid]], key=lambda t: t[1]
        )
        assert [v for v, _ in sorted(have, key=lambda t: t[1])] == [
            v for v, _ in want
        ], qid


def test_mmr_diversifies_vs_plain_topk(spark, embeddings):
    # the MMR pick set should not be identical to relevance order beyond
    # rank 1, on at least one of the queries (diversity term active)
    queries = embeddings.filter(F.col("vec_id") < 5)
    mmr = mmr_select(embeddings, queries, k=8, pool_size=40, lam=0.5).collect()
    from hermes_spark.operators.similarity import brute_force_cosine_topk

    plain = brute_force_cosine_topk(embeddings, queries, k=8).collect()
    mmr_sets = {}
    plain_sets = {}
    for r in mmr:
        mmr_sets.setdefault(r.query_id, []).append((r.mmr_rank, r.vec_id))
    for r in plain:
        plain_sets.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    diffs = sum(
        1
        for q in mmr_sets
        if [v for _, v in sorted(mmr_sets[q])] != [v for _, v in sorted(plain_sets[q])]
    )
    assert diffs >= 1


# -------------------------------------------------------- temperature mix
def test_temperature_mix_t1_keeps_everything(spark, documents):
    from hermes_spark.operators import temperature_mix

    out = temperature_mix(documents, "doc_id", "lang", temperature=1.0)
    assert out.count() == documents.count()


def test_temperature_mix_flattens_ratios(spark, documents):
    from hermes_spark.operators import temperature_mix

    nat = {r.lang: r.c for r in documents.groupBy("lang").count()
           .withColumnRenamed("count", "c").collect()}
    out = temperature_mix(documents, "doc_id", "lang", temperature=8.0)
    mixed = {r.lang: r.c for r in out.groupBy("lang").count()
             .withColumnRenamed("count", "c").collect()}
    nat_ratio = max(nat.values()) / min(nat.values())
    mix_ratio = max(mixed.values()) / max(1, min(mixed.values()))
    assert mix_ratio < nat_ratio  # high T flattens the stratum imbalance
    # downsample-only: every stratum keeps at most its natural count
    assert all(mixed[k] <= nat[k] for k in mixed)


def test_temperature_mix_deterministic_subset(spark, documents):
    from hermes_spark.operators import temperature_mix

    a = sorted(r.doc_id for r in
               temperature_mix(documents, "doc_id", "lang", 3.0).collect())
    b = sorted(r.doc_id for r in
               temperature_mix(documents, "doc_id", "lang", 3.0)
               .repartition(13).collect())
    assert a == b  # layout-independent determinism


def test_temperature_mix_rejects_bad_t(spark, documents):
    from hermes_spark.operators import temperature_mix

    with pytest.raises(ValueError):
        temperature_mix(documents, "doc_id", "lang", temperature=0.0)


# ------------------------------------------------- semantic decontaminate
def test_semantic_decontaminate_drops_ref_overlap(spark):
    from hermes_spark.operators import semantic_decontaminate

    corpus = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0, 0.0, 0.0]),
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0, 0.0]),
            Row(vec_id=3, embedding=[0.999, 0.04, 0.0, 0.0]),  # ~ref dup
            Row(vec_id=4, embedding=[0.0, 0.0, 0.7, 0.7]),
        ]
    )
    ref = spark.createDataFrame([Row(vec_id=100, embedding=[1.0, 0.0, 0.0, 0.0])])
    kept = sorted(
        r.vec_id
        for r in semantic_decontaminate(
            corpus, ref, min_cosine=0.95, dim=4, exact=True
        ).collect()
    )
    assert kept == [2, 4]  # 1 is identical, 3 is cosine ~0.9992


def test_semantic_decontaminate_lsh_catches_exact_dups(spark, embeddings):
    from hermes_spark.operators import semantic_decontaminate

    ref = embeddings.filter(F.col("vec_id") < 10)
    out = semantic_decontaminate(embeddings, ref, min_cosine=0.999, dim=64)
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    # identical vectors share every hyperplane sign -> always caught
    assert kept.isdisjoint(set(range(10)))


def test_cross_near_dup_pairs_exact_vs_lsh_on_identicals(spark, embeddings):
    from hermes_spark.operators import cross_near_dup_pairs

    ref = embeddings.filter(F.col("vec_id") < 5)
    exact = cross_near_dup_pairs(embeddings, ref, min_cosine=1.0, dim=64, exact=True)
    lsh = cross_near_dup_pairs(embeddings, ref, min_cosine=1.0, dim=64)
    e = {(r.corpus_id, r.ref_id) for r in exact.collect()}
    l = {(r.corpus_id, r.ref_id) for r in lsh.collect()}
    assert e and l == e  # at cosine == 1.0 the LSH path has full recall

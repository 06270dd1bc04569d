from pyspark.sql import functions as F

from hermes_spark.operators import (
    duplicate_clusters,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_dup_pairs,
)


def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
            (3, "The  quick brown fox jumps over the lazy dog"),  # normalized dup
            (4, "the quick brown fox jumped over the lazy dogs"),  # near dup
            (5, "completely different content about spark engines"),
        ],
        "doc_id int, text string",
    )


def test_exact_dedup(spark):
    out = exact_dedup(docs(spark), "doc_id", text_col="text")
    rows = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    assert set(rows) == {1, 4, 5}
    assert rows[1] == 3  # docs 1, 2, 3 collapse


def test_duplicate_clusters(spark):
    out = duplicate_clusters(docs(spark), "doc_id", "text").collect()
    assert len(out) == 1
    assert out[0]["cluster_size"] == 3
    assert out[0]["member_ids"] == [1, 2, 3]


def test_minhash_lsh_finds_near_dups(spark):
    out = minhash_lsh_pairs(docs(spark), "doc_id", "text").collect()
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out}
    assert pairs[(1, 2)] == 1.0  # identical docs agree on every component
    # near-dup 4 should be caught against at least one of 1/2
    near = [p for p in pairs if 4 in p and (1 in p or 2 in p)]
    assert near, pairs
    # unrelated doc 5 must not pair with jaccard 1.0
    assert all(v < 1.0 for k, v in pairs.items() if 5 in k)


def test_ngram_jaccard(spark):
    out = ngram_jaccard_pairs(docs(spark), "doc_id", "text", min_jaccard=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs  # near dup above 0.5
    assert not any(5 in k for k in pairs)


def test_simhash_near_dups(spark):
    fps = {r["id"]: r["simhash"] for r in simhash_fingerprints(docs(spark), "doc_id", "text").collect()}
    assert fps[1] == fps[2]
    assert all(0 <= v < 2 ** 32 for v in fps.values())
    out = simhash_near_dup_pairs(spark and docs(spark), "doc_id", "text", max_hamming=6).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs[(1, 2)] == 0
    assert (1, 4) in pairs or (2, 4) in pairs


def test_connected_components_basic(spark):
    from hermes_spark.operators import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], ["id_a", "id_b"]
    )
    got = {
        (r.id, r.component) for r in connected_components(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (9, 1), (5, 5), (6, 5)}


def test_connected_components_chain_converges(spark):
    """A long path graph needs diameter rounds — pins the iteration loop."""
    from hermes_spark.operators import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    got = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert got == {(i, 0) for i in range(13)}


def test_fuzzy_dedup_keep_one(spark, documents):
    from pyspark.sql import functions as F

    from hermes_spark.operators import fuzzy_dedup_keep_one, minhash_lsh_pairs

    dups = documents.filter(F.col("doc_id") < 10).withColumn(
        "doc_id", (F.col("doc_id") + 100000).cast("long")
    )
    corpus = documents.unionByName(dups)
    pairs = minhash_lsh_pairs(corpus, "doc_id", "text").filter(
        F.col("est_jaccard") >= 0.999
    )
    kept = fuzzy_dedup_keep_one(corpus, "doc_id", pairs)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # every re-keyed copy is dropped, every original kept
    assert all(i + 100000 not in kept_ids for i in range(10))
    assert all(i in kept_ids for i in range(10))


def test_deterministic_sample_invariants(spark, documents):
    from hermes_spark.operators import deterministic_sample

    s10 = deterministic_sample(documents, "doc_id", 0.10)
    s50 = deterministic_sample(documents, "doc_id", 0.50)
    ids10 = {r.doc_id for r in s10.select("doc_id").collect()}
    ids50 = {r.doc_id for r in s50.select("doc_id").collect()}
    # nested-subset property: smaller fraction ⊆ larger fraction
    assert ids10 <= ids50
    # determinism across runs and repartitioning
    again = {
        r.doc_id
        for r in deterministic_sample(documents.repartition(7), "doc_id", 0.10)
        .select("doc_id").collect()
    }
    assert again == ids10
    # fraction roughly honored
    n = documents.count()
    assert 0.03 * n <= len(ids10) <= 0.2 * n
    # independent salt draws a different sample
    other = {
        r.doc_id
        for r in deterministic_sample(documents, "doc_id", 0.10, salt="v2")
        .select("doc_id").collect()
    }
    assert other != ids10


def test_stratified_sample_fractions(spark, documents):
    from pyspark.sql import functions as F

    from hermes_spark.operators import stratified_sample

    out = stratified_sample(
        documents, "doc_id", "lang", {"en": 1.0}, default_fraction=0.0
    )
    langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == documents.filter(F.col("lang") == "en").count()


def test_mix_corpora(spark, documents):
    from pyspark.sql import functions as F

    from hermes_spark.operators import mix_corpora

    curated = documents.filter(F.col("doc_id") < 200)
    crawl = documents.filter(F.col("doc_id") >= 200)
    mixed = mix_corpora([(curated, 1.0), (crawl, 0.3)], "doc_id")
    n_cur, n_crawl = curated.count(), crawl.count()
    by_src = {r.mix_source: r.n for r in mixed.groupBy("mix_source")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_src[0] == n_cur                     # 100% kept
    assert 0.1 * n_crawl < by_src[1] < 0.5 * n_crawl  # ~30%
    # reproducible
    again = mix_corpora([(curated, 1.0), (crawl, 0.3)], "doc_id")
    assert {r.doc_id for r in again.select("doc_id").collect()} == {
        r.doc_id for r in mixed.select("doc_id").collect()
    }


def test_star_components_match_label_propagation(spark):
    """large-star/small-star must agree with min-label propagation on a
    basic graph, a long chain, and a seeded random graph."""
    import random

    from hermes_spark.operators import (
        connected_components,
        connected_components_star,
    )

    cases = [
        [(1, 2), (2, 3), (5, 6), (9, 3)],
        [(i, i + 1) for i in range(40)],  # path graph: worst diameter
    ]
    rng = random.Random(42)
    cases.append(
        list({(rng.randrange(60), rng.randrange(60)) for _ in range(80)})
    )
    for edges in cases:
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        lp = {
            (r.id, r.component)
            for r in connected_components(pairs).collect()
        }
        star = {
            (r.id, r.component)
            for r in connected_components_star(pairs).collect()
        }
        # star drops nodes only ever seen in self-loops (a,a); label
        # propagation keeps them — align before comparing
        self_only = {a for a, b in edges if a == b}
        linked = {x for a, b in edges if a != b for x in (a, b)}
        lp = {(i, c) for i, c in lp if i in linked or i not in self_only}
        assert star == lp, edges


def test_star_components_converges_fast_on_chain(spark):
    """O(log^2 n) rounds: a 64-node path must finish well under the
    diameter-many rounds label propagation would need."""
    from hermes_spark.operators import connected_components_star

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], ["id_a", "id_b"]
    )
    got = {
        (r.id, r.component)
        for r in connected_components_star(pairs, max_iter=8).collect()
    }
    assert got == {(i, 0) for i in range(64)}


def test_blocking_key_pairs(spark):
    from hermes_spark.operators import blocking_key_pairs

    df = spark.createDataFrame(
        [
            (1, "The  quick brown fox ran far away"),
            (2, "the quick brown fox ran far away!!"),
            (3, "completely different text here"),
            (4, "the quick brown dog"),  # shares the 12-char prefix too
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    rows = blocking_key_pairs(df, "doc_id", "text", prefix_len=12).collect()
    pairs = {(r.id_a, r.id_b) for r in rows}
    assert pairs == {(1, 2), (1, 4), (2, 4)}
    assert all(r.block_key == "the quick br" for r in rows)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0,
    max_size=25,
)


def _union_find_components(edges):
    """Driver-side ground truth: min-id component per node."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_cc_algorithms_match_union_find(spark, edges):
    from hermes_spark.operators import (
        connected_components,
        connected_components_star,
    )

    oracle = _union_find_components(edges)
    pairs = spark.createDataFrame(edges, "id_a int, id_b int") if edges else None
    if pairs is None:
        return
    lp = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert lp == set(oracle.items())
    # star drops nodes only ever seen in self-loops
    non_self = {x for a, b in edges if a != b for x in (a, b)}
    star_expected = {(n, c) for n, c in oracle.items() if n in non_self}
    star = {
        (r.id, r.component)
        for r in connected_components_star(pairs).collect()
    }
    assert star == star_expected


def test_simhash_fast_hash_variant(spark, documents):
    from hermes_spark.operators import simhash_near_dup_pairs

    sub = documents.limit(300)
    fast = simhash_near_dup_pairs(sub, "doc_id", "text", portable=False)
    # xxhash64 path produces a valid pair set with the same contract
    rows = fast.collect()
    assert all(r.id_a < r.id_b and r.hamming <= 3 for r in rows)


def test_linkage_scores_fellegi_sunter(spark):
    import math
    from hermes_spark.operators.dedup import linkage_scores

    people = spark.createDataFrame(
        [
            (1, "smith", "london"),
            (2, "smith", "london"),    # agrees with 1 on both
            (3, "smith", "paris"),     # agrees on name only
            (4, "jones", "berlin"),
        ],
        "pid long, name string, city string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    fields = {"name": (0.9, 0.1), "city": (0.8, 0.05)}
    out = {
        (r["id_a"], r["id_b"]): r["match_score"]
        for r in linkage_scores(people, pairs, "pid", fields).collect()
    }
    w_name, w_city = math.log(9.0), math.log(16.0)
    l_name, l_city = math.log(0.1 / 0.9), math.log(0.2 / 0.95)
    assert abs(out[(1, 2)] - round(w_name + w_city, 6)) < 1e-6
    assert abs(out[(1, 3)] - round(w_name + l_city, 6)) < 1e-6
    assert abs(out[(1, 4)] - round(l_name + l_city, 6)) < 1e-6
    assert out[(1, 2)] > out[(1, 3)] > out[(1, 4)]


def test_linkage_scores_validates_probs(spark):
    import pytest as _pytest
    from hermes_spark.operators.dedup import linkage_scores

    df = spark.createDataFrame([(1, "x")], "pid long, name string")
    pairs = spark.createDataFrame([(1, 1)], "id_a long, id_b long")
    with _pytest.raises(ValueError):
        linkage_scores(df, pairs, "pid", {"name": (0.2, 0.9)})


def test_dedup_against_history_and_batch(spark):
    from hermes_spark.operators.dedup import dedup_against

    long_a = "the quick brown fox jumps over the lazy dog again and again"
    long_b = "completely different content about spark shuffle partitions"
    # round 1: empty store
    empty_store = spark.createDataFrame(
        [], "__band string, __id long, __sig array<bigint>"
    )
    batch1 = spark.createDataFrame(
        [(1, long_a), (2, long_a + " extra"), (3, long_b)],
        "doc_id long, text string",
    )
    surv1, store1 = dedup_against(batch1, empty_store, "doc_id", "text")
    ids1 = sorted(r["doc_id"] for r in surv1.collect())
    assert 1 in ids1 and 3 in ids1 and 2 not in ids1  # in-batch near-dup dropped
    assert store1.select("__id").distinct().count() == len(ids1)

    # round 2: a replay of doc 1's text and a fresh doc
    batch2 = spark.createDataFrame(
        [(10, long_a), (11, "yet another unique document body entirely")],
        "doc_id long, text string",
    )
    surv2, store2 = dedup_against(batch2, store1, "doc_id", "text")
    ids2 = sorted(r["doc_id"] for r in surv2.collect())
    assert ids2 == [11]  # 10 matched history via the store, never re-hashed corpus
    # store layout is streaming-compatible
    assert store2.columns == ["__band", "__id", "__sig"]


def test_dedup_against_component_keeps_representative(spark):
    """A near-dup cluster whose minimum-id member matches history must
    still keep one surviving representative (keep_policy='component');
    greedy min-id semantics may drop the whole cluster."""
    from hermes_spark.operators.dedup import dedup_against

    # transitive chain (est_jaccard, 16 hashes): hist≈10 at 0.875,
    # 10≈11/12 at 0.8125, but hist vs 11/12 only 0.6875 — so history
    # drops 10 while 11/12 survive it and form an in-batch cluster
    hist = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa"
    )
    d10 = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november quebec romeo"
    )
    d11 = (
        "alpha bravo charlie delta echo foxtrot golf hotel sierra tango "
        "kilo lima mike november quebec romeo"
    )
    empty_store = spark.createDataFrame(
        [], "__band string, __id long, __sig array<bigint>"
    )
    _, store1 = dedup_against(
        spark.createDataFrame([(1, hist)], "doc_id long, text string"),
        empty_store,
        "doc_id",
        "text",
    )
    batch = spark.createDataFrame(
        [(10, d10), (11, d11), (12, d11 + " x")],
        "doc_id long, text string",
    )
    surv, _ = dedup_against(batch, store1, "doc_id", "text")
    ids = sorted(r["doc_id"] for r in surv.collect())
    # 10 dropped against history; the cluster keeps exactly one of 11/12
    assert ids == [11]

    surv_greedy, _ = dedup_against(
        batch, store1, "doc_id", "text", keep_policy="greedy"
    )
    greedy_ids = sorted(r["doc_id"] for r in surv_greedy.collect())
    assert greedy_ids == []  # documented greedy behavior: cluster vanishes


def test_dedup_against_hot_band_bounded(spark):
    """One boilerplate-heavy batch (hot band) must complete with the
    in-bucket pairing COLLAPSED (round-6 semantics: identical-signature
    chains, O(n)), not go quadratic — and not silently under-dedup."""
    from hermes_spark.operators.dedup import banded_match_pairs, dedup_against

    body = "identical boilerplate body shared by every single document here"
    n = 500
    batch = spark.createDataFrame(
        [(i, body) for i in range(n)], "doc_id long, text string"
    )
    empty_store = spark.createDataFrame(
        [], "__band string, __id long, __sig array<bigint>"
    )
    # even with a cap far below the cluster size, the oversized bucket
    # collapses via identical-signature chaining: ONE survivor
    surv, store_rows = dedup_against(
        batch, empty_store, "doc_id", "text", max_bucket_size=50
    )
    assert surv.count() == 1
    # with the cap above the bucket size, same answer via all-pairs
    surv2, _ = dedup_against(
        batch, empty_store, "doc_id", "text", max_bucket_size=5000
    )
    assert surv2.count() == 1

    # pair count from the capped helper is bounded by cap^2 * bands
    from pyspark.sql import functions as F
    from hermes_spark.functions.hashing import (
        band_keys,
        base_hash31,
        minhash_signature_from_hashes,
        shingles,
    )

    banded = (
        batch.select(
            F.col("doc_id").alias("__id"),
            F.transform(
                shingles(F.col("text")), lambda s: base_hash31(s)
            ).alias("__hs"),
        )
        .select(
            "__id",
            minhash_signature_from_hashes(F.col("__hs"), 16).alias("__sig"),
        )
        .select(
            "__id",
            "__sig",
            F.explode(band_keys(F.col("__sig"), 4, 4)).alias("__band"),
        )
    )
    # identical-signature collapse: exactly n-1 chain pairs (O(n)),
    # never the n*(n-1)/2 quadratic blow-up and never zero
    assert banded_match_pairs(banded, 0.8, 16, max_bucket_size=50).count() == n - 1


def test_exact_dedup_keep_by_quality(spark):
    """r7: keep the MAX-keep_by row per group (ties -> min id)."""
    df = spark.createDataFrame(
        [(1, "same text", 0.2), (2, "same text", 0.9), (3, "same text", 0.9),
         (4, "other text", 0.1)],
        "doc_id int, text string, quality double",
    )
    out = exact_dedup(df, "doc_id", text_col="text", keep_by=F.col("quality"))
    rows = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    # quality 0.9 tie between 2 and 3 -> min id 2 survives
    assert set(rows) == {2, 4}
    assert rows[2] == 3
    # original schema + dup_count, no temp columns
    assert sorted(out.columns) == ["doc_id", "dup_count", "quality", "text"]


def test_exact_dedup_keep_by_default_unchanged(spark):
    a = exact_dedup(docs(spark), "doc_id", text_col="text")
    b = exact_dedup(docs(spark), "doc_id", text_col="text",
                    keep_by=F.lit(1))  # constant -> ties -> min id everywhere
    assert sorted(r["doc_id"] for r in a.collect()) == \
           sorted(r["doc_id"] for r in b.collect())


def test_fuzzy_dedup_keep_by_quality(spark):
    """r7: fuzzy dedup keeps each component's max-keep_by member."""
    from hermes_spark.operators import fuzzy_dedup_keep_one

    df = spark.createDataFrame(
        [(1, "a", 0.1), (2, "b", 0.9), (3, "c", 0.9),   # component {1,2,3}
         (9, "z", 0.5)],                                  # untouched
        "doc_id long, text string, quality double",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = fuzzy_dedup_keep_one(
        df, "doc_id", pairs, keep_by=F.col("quality")
    )
    ids = sorted(r.doc_id for r in kept.collect())
    # quality tie 0.9 between 2 and 3 -> min id 2; 9 untouched
    assert ids == [2, 9]
    # default policy still keeps the component minimum
    kept_min = fuzzy_dedup_keep_one(df, "doc_id", pairs)
    assert sorted(r.doc_id for r in kept_min.collect()) == [1, 9]


def _pair_set(df):
    return {
        (r["id_a"], r["id_b"], r["est_jaccard"]) for r in df.collect()
    }


def test_minhash_pair_engines_bit_identical(spark, documents):
    """The Arrow pair kernel and the expression path must produce the
    SAME (id_a, id_b, est_jaccard) set — including the oversized-bucket
    collapse (forced here with a tiny cap) and the min_jaccard push-down."""
    corpus = documents.limit(400)
    for kwargs in (
        dict(),  # default: all-pairs path
        dict(max_bucket_size=3),  # force chain/reps/star collapse
        dict(min_jaccard=0.5),  # kernel-side prefilter
        dict(max_bucket_size=3, min_jaccard=0.25, num_hashes=32, num_bands=8),
    ):
        arrow = minhash_lsh_pairs(
            corpus, "doc_id", "text", pair_engine="arrow", **kwargs
        )
        expr = minhash_lsh_pairs(
            corpus, "doc_id", "text", pair_engine="expr", **kwargs
        )
        assert _pair_set(arrow) == _pair_set(expr), kwargs


def test_minhash_pair_engine_string_ids(spark):
    """Non-numeric ids go through the kernel's Python-sort fallback and
    string least/greatest — must still match the expression path."""
    rows = [(f"doc-{i:03d}", f"shared boilerplate text {i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    arrow = minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=4)
    expr = minhash_lsh_pairs(
        df, "doc_id", "text", max_bucket_size=4, pair_engine="expr"
    )
    assert _pair_set(arrow) == _pair_set(expr)
    assert len(_pair_set(arrow)) > 0


def test_minhash_rejects_unknown_engine(spark, documents):
    import pytest

    with pytest.raises(ValueError, match="pair_engine"):
        minhash_lsh_pairs(
            documents, "doc_id", "text", pair_engine="nope"
        )


def test_exact_dedup_incremental(spark):
    from hermes_spark.operators import exact_dedup_incremental, fingerprint_store

    # snapshot 1: docs 1 + 5 accepted
    snap1 = docs(spark).filter(F.col("doc_id").isin(1, 5))
    store = fingerprint_store(snap1, text_col="text")
    # snapshot 2: 2/3 normalize to snap1's doc 1 (store knockout),
    # 4 is new; in-batch the batch has no exact dups
    batch = docs(spark).filter(F.col("doc_id").isin(2, 3, 4))
    out = exact_dedup_incremental(batch, "doc_id", text_col="text", store=store)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {4}
    assert rows[4]["dup_count"] == 1
    assert "fingerprint" in out.columns

    # store round-trip: appending survivors makes a rerun emit nothing
    store2 = store.unionByName(out.select("fingerprint")).distinct()
    again = exact_dedup_incremental(batch, "doc_id", text_col="text", store=store2)
    assert again.count() == 0


def test_exact_dedup_incremental_in_batch_and_keep_by(spark):
    from hermes_spark.operators import exact_dedup_incremental

    # no store: behaves like exact_dedup (min id, in-batch counts)
    out = exact_dedup_incremental(docs(spark), "doc_id", text_col="text")
    rows = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    assert rows == {1: 3, 4: 1, 5: 1}
    # keep_by: highest doc_id wins its group instead
    best = exact_dedup_incremental(
        docs(spark), "doc_id", text_col="text", keep_by=F.col("doc_id")
    )
    assert {r["doc_id"] for r in best.collect()} == {3, 4, 5}


def test_exact_dedup_incremental_matches_batch_union(spark):
    """Incremental over two snapshots keeps exactly the union-batch
    winners that landed in snapshot order (store-first wins)."""
    from hermes_spark.operators import exact_dedup_incremental, fingerprint_store

    all_docs = docs(spark)
    snap1 = all_docs.filter(F.col("doc_id") <= 2)
    snap2 = all_docs.filter(F.col("doc_id") > 2)
    store = fingerprint_store(snap1, text_col="text")
    survivors2 = exact_dedup_incremental(
        snap2, "doc_id", text_col="text", store=store
    )
    union_winners = exact_dedup(all_docs, "doc_id", text_col="text")
    # every incremental survivor's fingerprint group also surfaces a
    # winner in the from-scratch union dedup
    assert {r["doc_id"] for r in survivors2.collect()} == {4, 5}
    assert {r["doc_id"] for r in union_winners.collect()} == {1, 4, 5}

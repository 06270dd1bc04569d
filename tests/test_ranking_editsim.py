"""Retrieval-metric evaluation and the edit-distance similarity join."""

import math

from pyspark.sql import functions as F

from hermes_spark.operators import (
    edit_distance_pairs,
    ranking_metrics,
)


def _q6(x):
    return round(x, 6)


class TestRankingMetrics:
    def test_perfect_and_partial_rankings(self, spark):
        results = spark.createDataFrame(
            [
                # q1 retrieves its whole truth in order
                (1, "a", 1), (1, "b", 2), (1, "c", 3),
                # q2 hits 1 of 2 relevant, at rank 2
                (2, "x", 1), (2, "r1", 2), (2, "y", 3),
            ],
            "query_id long, item string, rank long",
        )
        relevant = spark.createDataFrame(
            [(1, "a"), (1, "b"), (1, "c"), (2, "r1"), (2, "r2")],
            "query_id long, item string",
        )
        out = {r["query_id"]: r for r in ranking_metrics(results, relevant).collect()}

        q1 = out[1]
        assert (q1["n_relevant"], q1["n_hit"]) == (3, 3)
        assert q1["recall_at_k"] == 1.0
        assert q1["mrr"] == 1.0
        assert q1["ndcg_at_k"] == 1.0

        q2 = out[2]
        assert (q2["n_relevant"], q2["n_hit"]) == (2, 1)
        assert q2["recall_at_k"] == 0.5
        assert q2["mrr"] == 0.5
        # dcg = term(2); idcg = term(1) + term(2), on the 1e-6 int grid
        t = lambda r: round(1e6 / math.log2(r + 1))
        assert q2["ndcg_at_k"] == _q6(t(2) / (t(1) + t(2)))

    def test_zero_hits_and_missing_query(self, spark):
        results = spark.createDataFrame(
            [(1, "z", 1)], "query_id long, item string, rank long"
        )
        relevant = spark.createDataFrame(
            [(1, "a"), (7, "b")], "query_id long, item string"
        )
        out = {r["query_id"]: r for r in ranking_metrics(results, relevant).collect()}
        assert out[1]["recall_at_k"] == 0.0
        assert out[1]["mrr"] == 0.0
        assert out[1]["ndcg_at_k"] == 0.0
        # query 7 never retrieved anything: present, all-zero
        assert out[7]["n_retrieved"] == 0
        assert out[7]["recall_at_k"] == 0.0

    def test_k_caps_depth(self, spark):
        results = spark.createDataFrame(
            [(1, "a", 1), (1, "b", 2), (1, "c", 3)],
            "query_id long, item string, rank long",
        )
        relevant = spark.createDataFrame([(1, "c")], "query_id long, item string")
        out = ranking_metrics(results, relevant, k=2).collect()[0]
        assert out["n_hit"] == 0  # the only hit is at rank 3, cut by k=2

    def test_self_evaluation_is_perfect(self, spark, sf_dir):
        """Brute-force truth scored against itself: every metric 1.0."""
        from hermes_spark.operators.similarity import brute_force_cosine_topk

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        truth = brute_force_cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
        m = ranking_metrics(
            truth, truth.select("query_id", "vec_id"), item_col="vec_id"
        ).collect()
        assert len(m) == 3
        for r in m:
            assert r["recall_at_k"] == 1.0 and r["ndcg_at_k"] == 1.0


class TestEditDistancePairs:
    def test_finds_near_matches_within_blocks(self, spark):
        df = spark.createDataFrame(
            [
                (1, "The Quick   Brown Fox"),
                (2, "the quick brown fax"),   # 1 edit from 1 (normalized)
                (3, "the quick brown foxes"), # 2 edits from 1, 3 from 2
                (4, "a completely different title"),
            ],
            "id long, title string",
        )
        out = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in edit_distance_pairs(df, "id", "title", max_distance=3).collect()
        }
        assert out[(1, 2)] == 1
        assert out[(1, 3)] == 2
        assert out[(2, 3)] == 3
        assert not any(4 in p for p in out)

    def test_prefix_blocking_misses_prefix_edits(self, spark):
        # documented recall trade-off: an edit inside the blocking
        # prefix separates the pair into different blocks
        df = spark.createDataFrame(
            [(1, "abcdefgh same tail"), (2, "Xbcdefgh same tail")],
            "id long, title string",
        )
        assert edit_distance_pairs(df, "id", "title", max_distance=2).count() == 0
        # blocking on a coarser key recovers it
        out = edit_distance_pairs(
            df, "id", "title", max_distance=2, block=F.lit("one")
        ).collect()
        assert len(out) == 1 and out[0]["distance"] == 1

    def test_length_prune_and_threshold(self, spark):
        df = spark.createDataFrame(
            [(1, "prefix00 a"), (2, "prefix00 abcdefghijklm")],
            "id long, title string",
        )
        # length gap 12 > max_distance 3 -> pruned before any DP
        assert edit_distance_pairs(df, "id", "title", max_distance=3).count() == 0

    def test_block_cap_salvages_megablocks(self, spark):
        # one 30-member primary block, over the cap 10 — the salvage
        # tier re-blocks the residue on ext-prefix/suffix keys; here
        # every salvage block is a singleton, so no pairs emerge (the
        # graceful-degradation floor, formerly the silent-drop outcome)
        rows = [(i, f"same-pref {i}") for i in range(30)]
        df = spark.createDataFrame(rows, "id long, title string")
        out = edit_distance_pairs(
            df, "id", "title", max_distance=4, max_block_size=10
        )
        assert out.count() == 0

    def test_salvage_recovers_exact_dups_in_megablock(self, spark):
        # a hot prefix block over the cap contains planted exact
        # duplicates: pre-r7 these were silently dropped; the salvage
        # tier must recover them at distance 0
        rows = [(i, f"hotprefix filler {i:06d} tail") for i in range(40)]
        rows += [(100, "hotprefix planted duplicate xx"),
                 (101, "hotprefix planted duplicate xx")]
        df = spark.createDataFrame(rows, "id long, title string")
        out = edit_distance_pairs(
            df, "id", "title", max_distance=2,
            prefix_len=8, max_block_size=10,
        )
        got = {(r.id_a, r.id_b): r.distance for r in out.collect()}
        assert got[(100, 101)] == 0

    def test_salvage_recovers_tail_and_head_edits(self, spark):
        # residue pair with ONE edit mid-string: caught by BOTH salvage
        # keys yet emitted once (dedup); an edit in the last prefix_len
        # chars is still caught via the extended prefix
        filler = [(i, f"sameblok pad {i:08d} padding") for i in range(40)]
        mid = [(200, "sameblok aaaaaaaaaaaaaaaaaaaa zz"),
               (201, "sameblok aaaaaaaaaaaaaaaaaaaa zy")]
        df = spark.createDataFrame(filler + mid, "id long, title string")
        out = edit_distance_pairs(
            df, "id", "title", max_distance=2,
            prefix_len=8, max_block_size=10,
        )
        got = {(r.id_a, r.id_b): r.distance for r in out.collect()}
        assert got[(200, 201)] == 1
        assert sum(1 for k in got if k == (200, 201)) == 1  # deduped


def test_edit_block_stats(spark):
    from hermes_spark.operators import edit_block_stats

    df = spark.createDataFrame(
        [(i, f"shared prefix doc {i}") for i in range(6)]
        + [(100, "unique text one"), (101, "other text two")],
        "doc_id long, text string",
    )
    row = edit_block_stats(
        df, "doc_id", "text", prefix_len=8, max_block_size=4
    ).collect()[0]
    # "shared p" block has 6 docs (> cap 4 -> salvage tier); two
    # singleton blocks. Salvage keys for the residue: ext-prefix16
    # "shared prefix do" is one 6-member block (still > cap) and the
    # suffix8 keys are all singletons -> nothing salvageable here
    assert row.n_docs == 8
    assert row.n_blocks == 3
    assert row.n_capped_blocks == 1
    assert row.n_docs_in_capped == 6
    assert row.n_docs_salvaged == 0
    assert row.n_docs_unpaired_final == 6
    assert row.max_block == 6


def test_edit_block_stats_salvage_coverage(spark):
    from hermes_spark.operators import edit_block_stats

    # hot block with exact duplicates: salvage covers the dups
    df = spark.createDataFrame(
        [(i, f"hotprefix filler {i:06d} tail") for i in range(40)]
        + [(100, "hotprefix planted duplicate xx"),
           (101, "hotprefix planted duplicate xx")],
        "doc_id long, text string",
    )
    row = edit_block_stats(
        df, "doc_id", "text", prefix_len=8, max_block_size=10
    ).collect()[0]
    assert row.n_docs_in_capped == 42
    assert row.n_docs_salvaged >= 2  # the planted dups land together
    assert row.n_docs_salvaged + row.n_docs_unpaired_final == 42

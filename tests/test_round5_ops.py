"""Round-5 extension operators: per-group caps, percentile gating,
deterministic training order, OOV rate, run-length collapse, and the
prefix-filtered exact Jaccard join."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import (
    cap_per_group,
    collapse_runs,
    jaccard_set_join,
    oov_rate,
    percentile_gate,
    training_order,
)


# ------------------------------------------------------------ cap_per_group
def test_cap_per_group_bounds_and_determinism(spark, documents):
    capped = cap_per_group(documents, "doc_id", "source", cap=5)
    sizes = {
        r["source"]: r["n"]
        for r in capped.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        r["source"]: r["n"]
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(orig)  # no group vanishes
    for src, n in sizes.items():
        assert n == min(5, orig[src])
    # deterministic: same pick set on re-run and after repartition
    again = cap_per_group(documents.repartition(7), "doc_id", "source", cap=5)
    assert sorted(r["doc_id"] for r in capped.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_cap_per_group_rank_and_validation(spark, documents):
    with pytest.raises(ValueError):
        cap_per_group(documents, "doc_id", "source", cap=0)
    ranked = cap_per_group(documents, "doc_id", "source", cap=3, keep_rank=True)
    assert "cap_rank" in ranked.columns
    assert ranked.agg(F.max("cap_rank")).collect()[0][0] <= 3


def test_cap_per_group_uses_window_group_limit(spark, documents):
    plan = (
        cap_per_group(documents, "doc_id", "source", cap=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan


# ---------------------------------------------------------- percentile_gate
def test_percentile_gate_keeps_top_fraction(spark, documents):
    scored = documents.withColumn("score", F.col("n_chars").cast("double"))
    kept = percentile_gate(scored, "source", "score", 0.3, key_col="doc_id")
    # every kept row's score is >= every dropped row's score within a group
    kept_ids = {r["doc_id"] for r in kept.collect()}
    rows = scored.select("doc_id", "source", "score").collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, grp in by_src.items():
        grp = sorted(grp, key=lambda r: (-r["score"], r["doc_id"]))
        n = len(grp)
        for i, r in enumerate(grp):
            pct = round(i / (n - 1), 6) if n > 1 else 0.0
            assert (r["doc_id"] in kept_ids) == (pct <= 0.3), (src, i, n)


def test_percentile_gate_single_row_group_survives(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.1), (2, "b", 9.9), (3, "b", 0.2)], ["id", "g", "s"]
    )
    kept = {r["id"] for r in percentile_gate(df, "g", "s", 0.0, key_col="id").collect()}
    assert kept == {1, 2}  # singleton group a survives at any fraction


# ---------------------------------------------------------- training_order
def test_training_order_is_dense_and_deterministic(spark, documents):
    out = training_order(documents, "doc_id", num_shards=4)
    assert out.count() == documents.count()
    # positions are dense 1..n_s within every shard
    per_shard = (
        out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("pos_in_shard").alias("mx"),
             F.min("pos_in_shard").alias("mn"))
        .collect()
    )
    assert {r["shard"] for r in per_shard} <= {0, 1, 2, 3}
    for r in per_shard:
        assert r["mn"] == 1 and r["mx"] == r["n"]
    # identical order after repartition (engine-independent)
    again = training_order(documents.repartition(9), "doc_id", num_shards=4)
    key = lambda df: sorted(
        (r["doc_id"], r["shard"], r["pos_in_shard"]) for r in df.collect()
    )
    assert key(out) == key(again)


def test_training_order_scatters_upstream_clustering(spark, documents):
    # consecutive doc_ids (the upstream "clustering") should not land in
    # consecutive positions of one shard: check the order decorrelates
    out = training_order(documents, "doc_id", num_shards=2).collect()
    pos = {r["doc_id"]: (r["shard"], r["pos_in_shard"]) for r in out}
    ids = sorted(pos)
    adjacent_same_shard_adjacent_pos = sum(
        1
        for a, b in zip(ids, ids[1:])
        if pos[a][0] == pos[b][0] and abs(pos[a][1] - pos[b][1]) == 1
    )
    assert adjacent_same_shard_adjacent_pos < len(ids) * 0.05


# ----------------------------------------------------------------- oov_rate
def test_oov_rate_against_python_reference(spark, documents):
    got = {r["doc_id"]: r for r in oov_rate(documents, vocab_size=50).collect()}
    rows = documents.select("doc_id", "text").collect()
    from collections import Counter

    tf = Counter()
    per_doc = {}
    for r in rows:
        toks = [t for t in r["text"].lower().split() if t]
        per_doc[r["doc_id"]] = toks
        tf.update(set())  # keep Counter import obvious
        for t in toks:
            tf[t] += 1
    vocab = {
        t for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    }
    for did, toks in per_doc.items():
        n = len(toks)
        oov = sum(1 for t in toks if t not in vocab)
        assert got[did]["n_tokens"] == n
        assert got[did]["n_oov"] == oov
        assert got[did]["oov_rate"] == pytest.approx(
            round(oov / max(n, 1), 6), abs=1e-9
        )


def test_oov_rate_empty_doc_is_zero(spark):
    df = spark.createDataFrame([(1, "alpha beta"), (2, "")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in oov_rate(df, vocab_size=10).collect()}
    assert got[2]["n_tokens"] == 0 and got[2]["oov_rate"] == 0.0


# ------------------------------------------------------------ collapse_runs
def test_collapse_runs_preserves_separated_reoccurrences(spark):
    rows = [
        # user 1: A A B A A A -> A B A with run lengths 2 1 3
        (1, 1, 1, "A"), (2, 2, 1, "A"), (3, 3, 1, "B"),
        (4, 4, 1, "A"), (5, 5, 1, "A"), (6, 6, 1, "A"),
        # user 2: single event
        (7, 1, 2, "X"),
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    out = sorted(
        (r["user_id"], r["ts"], r["event_type"], r["run_length"])
        for r in collapse_runs(df).collect()
    )
    assert out == [
        (1, 1, "A", 2), (1, 3, "B", 1), (1, 4, "A", 3), (2, 1, "X", 1),
    ]


def test_collapse_runs_single_shuffle_plan(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, "A"), (2, 2, 1, "A")], ["event_id", "ts", "user_id", "event_type"]
    )
    out = collapse_runs(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lag, boundary flag, running sum and the run-length aggregate all
    # reuse the user_id hash partitioning: exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --------------------------------------------------------- jaccard_set_join
def _naive_jaccard_pairs(rows, t):
    sets = {r["doc_id"]: set(x for x in r["text"].lower().split() if x) for r in rows}
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            j = round(inter / (len(sa) + len(sb) - inter), 6)
            if j >= t:
                out.append((a, b, j))
    return sorted(out)


def test_jaccard_set_join_exact_vs_naive(spark, documents):
    docs = documents.limit(120)
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_set_join(docs, min_jaccard=0.25).collect()
    )
    want = _naive_jaccard_pairs(docs.collect(), 0.25)
    assert got == want  # prefix filtering is lossless


def test_jaccard_set_join_high_threshold_small_candidates(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "alpha beta gamma epsilon"),
            (4, "zeta eta theta iota"),
        ],
        ["doc_id", "text"],
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_set_join(df, min_jaccard=0.6).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == pytest.approx(0.6)
    assert (1, 4) not in got and (2, 4) not in got

    with pytest.raises(ValueError):
        jaccard_set_join(df, min_jaccard=0.0)


# ------------------------------------------------------------- psi_report
def test_psi_report_identical_distributions_near_zero(spark):
    from hermes_spark.operators import psi_report

    a = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    out = psi_report(a, a, "v", bins=10, lo=0.0, hi=100.0).collect()
    assert len(out) == 10
    assert abs(sum(r["psi_term"] for r in out)) < 1e-9
    assert all(r["p"] == r["q"] for r in out)


def test_psi_report_detects_shift(spark):
    from hermes_spark.operators import psi_report

    base = spark.range(1000).select((F.col("id") % 50).cast("double").alias("v"))
    cur = spark.range(1000).select((F.col("id") % 50 + 50).cast("double").alias("v"))
    out = psi_report(base, cur, "v", bins=10, lo=0.0, hi=100.0).collect()
    psi = sum(r["psi_term"] for r in out)
    assert psi > 0.2  # fully disjoint halves -> large drift
    # empty buckets clamp at eps, never null/inf
    assert all(r["p"] > 0 and r["q"] > 0 for r in out)


def test_psi_report_empty_baseline_raises_clearly(spark):
    from hermes_spark.operators import psi_report

    empty = spark.createDataFrame([], "v double")
    cur = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(ValueError, match="no non-null"):
        psi_report(empty, cur, "v", bins=5)
    # all-null baseline is the same failure
    nulls = spark.createDataFrame([(None,)], "v double")
    with pytest.raises(ValueError, match="no non-null"):
        psi_report(nulls, cur, "v", bins=5)
    # explicit bounds sidestep the derivation and eps-floor the spine
    out = psi_report(empty, cur, "v", bins=5, lo=0.0, hi=10.0).collect()
    assert len(out) == 5 and all(r["p"] == pytest.approx(1e-6) for r in out)


def test_psi_report_nulls_excluded_from_totals(spark):
    from hermes_spark.operators import psi_report

    base = spark.createDataFrame(
        [(0.0,), (5.0,), (None,), (None,)], "v double"
    )
    out = psi_report(base, base, "v", bins=2, lo=0.0, hi=10.0).collect()
    # 2 non-null rows, one per bucket: shares are 0.5/0.5 and SUM TO 1
    # (nulls must not inflate the denominator)
    assert sorted(r["p"] for r in out) == [0.5, 0.5]
    assert sum(r["p"] for r in out) == pytest.approx(1.0)


def test_psi_report_python_reference(spark):
    import math

    from hermes_spark.operators import psi_report

    vals_a = [1.0, 5.0, 15.0, 15.0, 42.0]
    vals_b = [2.0, 18.0, 44.0, 44.0, 99.0]
    a = spark.createDataFrame([(v,) for v in vals_a], ["v"])
    b = spark.createDataFrame([(v,) for v in vals_b], ["v"])
    got = {r["bucket"]: r for r in psi_report(a, b, "v", bins=5, lo=0.0, hi=100.0).collect()}
    eps = 1e-6
    for k in range(5):
        p = max(sum(1 for v in vals_a if min(max(int(v // 20), 0), 4) == k) / 5, eps)
        q = max(sum(1 for v in vals_b if min(max(int(v // 20), 0), 4) == k) / 5, eps)
        assert got[k]["psi_term"] == pytest.approx(
            round((q - p) * math.log(q / p), 6), abs=1e-9
        )


# ------------------------------------------------------- containment_join
def test_containment_join_directional(spark):
    para = "one two three four five six seven eight"
    page = para + " and much more text follows here beyond the quote " * 3
    df = spark.createDataFrame(
        [(1, para), (2, page), (3, "completely different words entirely now")],
        ["doc_id", "text"],
    )
    from hermes_spark.operators import containment_join

    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(df, min_containment=0.8, ngram=3).collect()
    }
    assert got[(1, 2)] == 1.0  # the paragraph is fully inside the page
    assert (2, 1) not in got  # the page is NOT inside the paragraph
    assert not any(3 in pair for pair in got)


def test_containment_join_matches_naive(spark, documents):
    docs = documents.limit(150)
    from hermes_spark.operators import containment_join

    got = sorted(
        (r["id_a"], r["id_b"], r["containment"])
        for r in containment_join(docs, min_containment=0.5, ngram=3).collect()
    )
    rows = docs.collect()
    sets = {}
    for r in rows:
        toks = r["text"].lower().split()
        grams = (
            {" ".join(toks[i: i + 3]) for i in range(len(toks) - 2)}
            if len(toks) >= 3
            else {" ".join(toks)}
        )
        grams.discard("")
        if grams:
            sets[r["doc_id"]] = grams
    want = []
    for a in sets:
        for b in sets:
            if a == b:
                continue
            c = round(len(sets[a] & sets[b]) / len(sets[a]), 6)
            if c >= 0.5:
                want.append((a, b, c))
    assert got == sorted(want)

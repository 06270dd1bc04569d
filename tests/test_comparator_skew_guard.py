"""Round-13 skew guard: the fast/hash classification's key-partitioned
exchange must fall back to the full-row-keyed shape when a planted hot
key would serialize into one partition — with identical results either
way (the guard changes physical partitioning only)."""

import pytest
from pyspark.sql import functions as F

from hermes_spark import ComparisonConfig, DatasetComparator, compare


def _frames(spark):
    # 1000 rows, 80% sharing key 0 (the planted hot key — above the
    # factor/partitions fair-share threshold at any partition count);
    # rows differ in the value column so they are NOT duplicates
    rows = [(0 if i % 5 else i, i, f"v{i}") for i in range(1000)]
    ref = spark.createDataFrame(rows, "k int, seq int, val string")
    act = ref.withColumn(
        "val", F.when(F.col("seq") % 97 == 0, F.lit("mut")).otherwise(F.col("val"))
    )
    return ref, act


GUARDED = dict(skew_guard_min_bytes=0, skew_guard_fraction=1.0)


def test_guard_detects_planted_hot_key(spark):
    ref, act = _frames(spark)
    cmp = DatasetComparator(
        ref, act, keys=["k"],
        config=ComparisonConfig(mode="fast", allow_duplicates=True, **GUARDED),
    )
    assert cmp._classification_skew_ok() is False


def test_guard_passes_uniform_keys(spark):
    ref, act = _frames(spark)
    cmp = DatasetComparator(
        ref, act, keys=["seq"],
        config=ComparisonConfig(mode="fast", allow_duplicates=True, **GUARDED),
    )
    assert cmp._classification_skew_ok() is True


def test_guard_skips_small_inputs_and_whole_row_keys(spark):
    ref, act = _frames(spark)
    # default min_bytes: in-memory frames have no input files -> size 0
    # -> guard passes without running any job
    cmp = DatasetComparator(
        ref, act, keys=["k"],
        config=ComparisonConfig(mode="fast", allow_duplicates=True),
    )
    assert cmp._classification_skew_ok() is True
    # whole-row key: always safe regardless of thresholds
    cmp2 = DatasetComparator(
        ref, act, config=ComparisonConfig(mode="fast", **GUARDED)
    )
    assert cmp2._classification_skew_ok() is True


@pytest.mark.parametrize("mode", ["fast", "hash"])
def test_fallback_shape_results_identical(spark, mode):
    ref, act = _frames(spark)
    expected = compare(
        ref, act, keys=["k"],
        config=ComparisonConfig(mode="reference", allow_duplicates=True),
    )
    guarded = compare(
        ref, act, keys=["k"],
        config=ComparisonConfig(mode=mode, allow_duplicates=True, **GUARDED),
    )
    assert guarded.ref_row_count == expected.ref_row_count
    assert guarded.new_row_count == expected.new_row_count
    assert guarded.ref_duplicate_count == expected.ref_duplicate_count
    assert guarded.new_duplicate_count == expected.new_duplicate_count
    assert guarded.passed_count == expected.passed_count
    assert guarded.diff_count == expected.diff_count
    exp_rows = sorted(map(tuple, expected.result_df.collect()))
    got_rows = sorted(map(tuple, guarded.result_df.collect()))
    assert got_rows == exp_rows
    guarded.release()
    expected.release()


def test_result_release_handle(spark):
    ref, act = _frames(spark)
    result = compare(
        ref, act, keys=["seq"],
        config=ComparisonConfig(mode="fast", allow_duplicates=True),
    )
    assert result.result_df is not None
    # the classification + diff caches are live until released
    assert result.result_df.count() == result.diff_count
    result.release()   # frees executor storage through the handle
    result.release()   # idempotent
    from hermes_spark.result import ComparisonResult

    # results not produced by a comparator have no releaser: no-op
    ComparisonResult(0, 0, 0, 0, 0).release()

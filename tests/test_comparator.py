"""Comparator kernel tests — semantics pinned to the reference suite
(``DatasetComparatorSuite.scala``, ``DatasetComparatorJobSuite.scala``)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hermes_spark import (
    ComparisonConfig,
    DatasetComparator,
    DuplicateRowsInDF,
    BadProvidedSchema,
    SchemasDifferException,
    compare,
)

REF_MODE = ComparisonConfig(mode="reference")
FAST_MODE = ComparisonConfig(mode="fast")
MODES = [REF_MODE, FAST_MODE]


def people(spark, rows):
    return spark.createDataFrame(rows, "id int, name string, city string")


@pytest.fixture(scope="module")
def base(spark):
    return people(
        spark,
        [
            (1, "Alice", "Paris"),
            (2, "Bob", "Lyon"),
            (3, "Carol", "Nice"),
            (4, "Dan", "Metz"),
        ],
    )


@pytest.fixture(scope="module")
def mutated(spark):
    # row 2 changed city, row 4 removed, row 5 added
    return people(
        spark,
        [
            (1, "Alice", "Paris"),
            (2, "Bob", "Brest"),
            (3, "Carol", "Nice"),
            (5, "Eve", "Lille"),
        ],
    )


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_identical_passes(spark, base, config):
    result = compare(base, base, keys=["id"], config=config)
    assert result.passed
    assert result.diff_count == 0
    assert result.ref_row_count == 4
    assert result.new_row_count == 4
    assert result.passed_count == 4
    assert result.result_df is None


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_differences_detected(spark, base, mutated, config):
    result = compare(base, mutated, keys=["id"], config=config)
    assert not result.passed
    assert result.ref_row_count == 4
    assert result.new_row_count == 4
    # rows 1 and 3 matched
    assert result.passed_count == 2
    # diff rows: id=2 (changed), id=4 (ref only), id=5 (actual only)
    assert result.diff_count == 3

    rows = {
        r["expected_id"] if r["expected_id"] is not None else r["actual_id"]: r
        for r in result.result_df.collect()
    }
    assert set(rows) == {2, 4, 5}
    # changed row: only city differs
    assert rows[2]["errCol"] == ["city"]
    assert rows[2]["expected_city"] == "Lyon"
    assert rows[2]["actual_city"] == "Brest"
    # ref-only row: every actual_* is null -> all columns flagged
    assert set(rows[4]["errCol"]) == {"id", "name", "city"}
    assert rows[4]["actual_id"] is None
    # actual-only row likewise
    assert set(rows[5]["errCol"]) == {"id", "name", "city"}
    assert rows[5]["expected_id"] is None


def test_errcol_reversed_order(spark, base, mutated):
    """Reference concats per-column errors in REVERSED selector order."""
    result = compare(base, mutated, keys=["id"], config=REF_MODE)
    row = [r for r in result.result_df.collect() if r["expected_id"] == 4][0]
    # selector order is alphabetical: city, id, name -> errCol reversed: name, id, city
    assert row["errCol"] == ["name", "id", "city"]


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_modes_agree(spark, base, mutated, config):
    ref = compare(base, mutated, keys=["id"], config=REF_MODE)
    fast = compare(base, mutated, keys=["id"], config=FAST_MODE)
    for attr in (
        "ref_row_count",
        "new_row_count",
        "ref_duplicate_count",
        "new_duplicate_count",
        "passed_count",
        "diff_count",
    ):
        assert getattr(ref, attr) == getattr(fast, attr), attr
    cols = sorted(ref.result_df.columns)
    a = ref.result_df.select(*cols).orderBy("expected_id", "actual_id").collect()
    b = fast.result_df.select(*cols).orderBy("expected_id", "actual_id").collect()
    assert a == b


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_duplicate_gate(spark, config):
    df = people(spark, [(1, "A", "X"), (1, "A", "X"), (2, "B", "Y")])
    clean = people(spark, [(1, "A", "X"), (2, "B", "Y")])
    with pytest.raises(DuplicateRowsInDF) as err:
        compare(df, clean, keys=["id"], config=config)
    assert "Reference Dataset has 1 duplicates" in str(err.value)
    assert "New Dataset has 0 duplicates" in str(err.value)


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_duplicate_count_is_distinct_keys(spark, config):
    """One key occurring twice => duplicate count 1 (not 2), cf.
    DatasetComparatorSuite.scala:213-219."""
    df = people(spark, [(1, "A", "X"), (1, "A", "Z"), (2, "B", "Y")])
    allow = ComparisonConfig(mode=config.mode, allow_duplicates=True)
    result = compare(df, df, keys=["id"], config=allow)
    assert result.ref_duplicate_count == 1
    assert result.new_duplicate_count == 1


def test_schema_mismatch_raises(spark, base):
    other = spark.createDataFrame([(1, "x", 2.0)], "id int, name string, score double")
    with pytest.raises(SchemasDifferException) as err:
        compare(base, other, keys=["id"])
    assert "cannot be found in both schemas" in str(err.value)


def test_cherry_pick_schema(spark, base, mutated):
    """Comparing on a subset schema ignores the excluded column
    (cf. DatasetComparatorSuite.scala:70-111)."""
    from pyspark.sql.types import StructType, StructField, IntegerType, StringType

    sub = StructType(
        [StructField("id", IntegerType()), StructField("name", StringType())]
    )
    result = compare(base, mutated, keys=["id"], schema=sub)
    # with city excluded, only the add/remove rows differ
    assert result.diff_count == 2
    assert {c for c in result.result_df.columns} == {
        "expected_id",
        "expected_name",
        "actual_id",
        "actual_name",
        "errCol",
    }


def test_bad_cherry_pick_schema(spark, base, mutated):
    from pyspark.sql.types import StructType, StructField, IntegerType

    bad = StructType([StructField("nope", IntegerType())])
    with pytest.raises(BadProvidedSchema):
        compare(base, mutated, keys=["id"], schema=bad)


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_no_keys_whole_row_hash(spark, base, mutated, config):
    result = compare(base, mutated, config=config)
    assert result.diff_count == 4  # 2 and 4 from ref, 2 and 5 from actual: keys never match
    # every diff row is one-sided -> all columns flagged
    for r in result.result_df.collect():
        assert set(r["errCol"]) == {"id", "name", "city"}


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_nested_struct_and_array(spark, config):
    schema = "id int, info struct<b:string, a:int>, tags array<string>"
    ref = spark.createDataFrame(
        [(1, Row(b="x", a=1), ["t1", "t2"]), (2, Row(b="y", a=2), ["t3"])], schema
    )
    act = spark.createDataFrame(
        [(1, Row(b="x", a=1), ["t1", "t2"]), (2, Row(b="y", a=9), ["t3", "t4"])], schema
    )
    result = compare(ref, act, keys=["id"], config=config)
    assert result.diff_count == 1
    row = result.result_df.collect()[0]
    assert set(row["errCol"]) == {"info_a", "tags_1"}
    assert row["expected_info"]["a"] == 2 and row["actual_info"]["a"] == 9


def test_column_order_insensitive(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([("x", 1)], "name string, id int")
    result = compare(a, b, keys=["id"])
    assert result.passed


@pytest.mark.parametrize("config", MODES, ids=["reference", "fast"])
def test_lineitem_self_compare(lineitem, config):
    # sf0.001 lineitem has duplicate (orderkey, linenumber) pairs, so allow
    # duplicates and rely on the whole pipeline still agreeing
    cfg = ComparisonConfig(mode=config.mode, allow_duplicates=True)
    result = compare(
        lineitem, lineitem, keys=["l_orderkey", "l_linenumber"], config=cfg
    )
    assert result.passed
    assert result.ref_row_count == result.passed_count


def test_except_all_mode(spark):
    cfg = ComparisonConfig(except_all=True, allow_duplicates=True)
    a = people(spark, [(1, "A", "X"), (1, "A", "X"), (2, "B", "Y")])
    b = people(spark, [(1, "A", "X"), (2, "B", "Y")])
    result = compare(a, b, keys=["id"], config=cfg)
    # EXCEPT ALL keeps the second (1, A, X) as a ref-only row
    assert result.ref_row_count - result.passed_count == 1


def test_unique_key_column_collision(spark):
    df = spark.createDataFrame(
        [(1, "v")], "HermesDatasetComparisonUniqueId int, x string"
    )
    result = compare(df, df, keys=["HermesDatasetComparisonUniqueId"])
    assert result.passed


def test_all_three_modes_agree(spark, sf_dir):
    """reference / fast / hash modes must produce identical metrics AND
    identical diff contents (hash mode rematerializes unmatched rows)."""
    from pyspark.sql import functions as F

    from hermes_spark import ComparisonConfig, DatasetComparator

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    actual = (
        orders.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") * 2)
            .otherwise(F.col("o_totalprice")),
        )
        .filter(F.col("o_orderkey") != 1)
    )

    results = {}
    diffs = {}
    for mode in ("reference", "fast", "hash"):
        cmp = DatasetComparator(
            orders, actual, keys=["o_orderkey"], config=ComparisonConfig(mode=mode)
        )
        res = cmp.compare()
        results[mode] = (
            res.ref_row_count,
            res.new_row_count,
            res.ref_duplicate_count,
            res.new_duplicate_count,
            res.passed_count,
            res.diff_count,
        )
        diffs[mode] = {
            tuple(str(v) for v in row)
            for row in res.result_df.select(
                "expected_o_orderkey",
                "actual_o_orderkey",
                F.array_join(F.array_sort("errCol"), ",").alias("errs"),
            ).collect()
        }
        cmp.release()

    assert results["reference"] == results["fast"] == results["hash"], results
    assert diffs["reference"] == diffs["fast"] == diffs["hash"]


def test_hash_mode_identical_inputs(spark, sf_dir):
    from hermes_spark import ComparisonConfig, compare

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    res = compare(orders, orders, keys=["o_orderkey"],
                  config=ComparisonConfig(mode="hash"))
    assert res.passed and res.diff_count == 0


def test_empty_vs_empty_passes(spark, sf_dir):
    from hermes_spark import ComparisonConfig, compare
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    empty = orders.filter(F.lit(False))
    for mode in ("reference", "fast", "hash"):
        res = compare(empty, empty, keys=["o_orderkey"],
                      config=ComparisonConfig(mode=mode))
        assert res.passed and res.ref_row_count == 0, mode


def test_empty_vs_nonempty_all_diff(spark, sf_dir):
    from hermes_spark import ComparisonConfig, compare
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(10)
    empty = orders.filter(F.lit(False))
    for mode in ("reference", "fast", "hash"):
        res = compare(orders, empty, keys=["o_orderkey"],
                      config=ComparisonConfig(mode=mode))
        assert not res.passed and res.diff_count == 10, mode
        assert res.passed_count == 0, mode


def test_single_column_frame(spark):
    from hermes_spark import compare

    a = spark.range(5).withColumnRenamed("id", "k")
    b = spark.range(4).withColumnRenamed("id", "k")
    res = compare(a, b, keys=["k"])
    assert res.diff_count == 1


def test_nested_struct_key(spark):
    """Compound nested keys like 'info.id' (cf. the reference's XML
    compound-key golden test with key ckey.value)."""
    from pyspark.sql import functions as F

    from hermes_spark import compare

    def mk(price_of_2):
        return spark.createDataFrame(
            [(1, 10.0), (2, price_of_2), (3, 30.0)], ["id", "price"]
        ).select(
            F.struct(F.col("id").alias("id")).alias("info"),
            "price",
        )

    res = compare(mk(20.0), mk(99.0), keys=["info.id"])
    assert res.diff_count == 1
    row = res.result_df.collect()[0]
    assert row.expected_info.id == 2 and list(row.errCol) == ["price"]
    assert compare(mk(20.0), mk(20.0), keys=["info.id"]).passed


def test_reference_observe_parity(spark, base, mutated):
    """observe_metrics=True (default) must match the plain-count replay."""
    plain = compare(
        base, mutated, keys=["id"],
        config=ComparisonConfig(mode="reference", observe_metrics=False),
    )
    observed = compare(
        base, mutated, keys=["id"],
        config=ComparisonConfig(mode="reference", observe_metrics=True),
    )
    for attr in (
        "ref_row_count",
        "new_row_count",
        "ref_duplicate_count",
        "new_duplicate_count",
        "passed_count",
        "diff_count",
    ):
        assert getattr(plain, attr) == getattr(observed, attr), attr


def test_auto_mode_resolution(spark, base):
    """auto -> fast for narrow rows, hash for wide rows."""
    narrow = DatasetComparator(
        base, base, keys=["id"], config=ComparisonConfig(mode="auto")
    )
    assert narrow.choose_mode() == "fast"

    wide = base
    for i in range(10):
        wide = wide.withColumn(f"pad{i}", F.col("name"))
    cmp_wide = DatasetComparator(
        wide, wide, keys=["id"], config=ComparisonConfig(mode="auto")
    )
    assert cmp_wide.choose_mode() == "hash"


def test_auto_mode_end_to_end(spark, base, mutated):
    auto = compare(
        base, mutated, keys=["id"], config=ComparisonConfig(mode="auto")
    )
    fast = compare(base, mutated, keys=["id"], config=FAST_MODE)
    assert auto.diff_count == fast.diff_count == 3
    assert auto.passed_count == fast.passed_count == 2


def test_compare_common_columns_tolerates_added_column(spark, base, mutated):
    """Additive schema evolution: the actual side gained a column; the
    shared columns still certify."""
    from hermes_spark import compare_common_columns

    evolved = mutated.withColumn("new_col", F.lit("x"))
    with pytest.raises(SchemasDifferException):
        compare(base, evolved, keys=["id"])
    res = compare_common_columns(base, evolved, keys=["id"])
    assert res.diff_count == 3  # same differences as the aligned compare
    assert "new_col" not in "".join(res.result_df.columns)

    disjoint = spark.createDataFrame([(1,)], "zzz int")
    with pytest.raises(SchemasDifferException):
        compare_common_columns(base, disjoint)


def test_result_records_executed_mode(spark, base, mutated):
    assert (
        compare(base, mutated, keys=["id"]).additional_info["mode"] == "fast"
    )
    wide = base
    for i in range(10):
        wide = wide.withColumn(f"pad{i}", F.col("name"))
    res = compare(wide, wide, keys=["id"], config=ComparisonConfig(mode="auto"))
    assert res.additional_info["mode"] == "hash"

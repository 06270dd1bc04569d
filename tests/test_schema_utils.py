from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from hermes_spark.schema_utils import (
    diff_schema,
    is_subset,
    schemas_equivalent,
    sorted_selector,
    sorted_selector_names,
    strip_metadata,
)


def test_equivalence_order_insensitive():
    a = StructType([StructField("x", IntegerType()), StructField("y", StringType())])
    b = StructType([StructField("y", StringType()), StructField("x", IntegerType())])
    assert schemas_equivalent(a, b)


def test_equivalence_metadata_insensitive():
    a = StructType([StructField("x", IntegerType(), metadata={"m": 1})])
    b = StructType([StructField("x", IntegerType())])
    assert schemas_equivalent(strip_metadata(a), strip_metadata(b))
    assert strip_metadata(a)["x"].metadata == {}


def test_not_equivalent_different_type():
    a = StructType([StructField("x", IntegerType())])
    b = StructType([StructField("x", StringType())])
    assert not schemas_equivalent(a, b)
    assert "x data type doesn't match" in diff_schema(a, b)[0]


def test_diff_missing_field_message():
    a = StructType([StructField("_c5", StringType())])
    b = StructType([])
    assert diff_schema(a, b) == ["_c5 cannot be found in both schemas"]


def test_subset():
    full = StructType(
        [
            StructField("a", IntegerType()),
            StructField("b", StringType()),
            StructField(
                "s", StructType([StructField("x", IntegerType()), StructField("y", StringType())])
            ),
        ]
    )
    sub = StructType(
        [
            StructField("a", IntegerType()),
            StructField("s", StructType([StructField("x", IntegerType())])),
        ]
    )
    assert is_subset(sub, full)
    assert not is_subset(full, sub)


def test_selector_sorts_recursively(spark):
    df = spark.createDataFrame(
        [(1, Row(z=1, a=Row(q=2, p=3)))],
        "b int, s struct<z:int, a:struct<q:int, p:int>>",
    )
    out = df.select(*sorted_selector(df.schema))
    assert out.columns == ["b", "s"]
    s_type = out.schema["s"].dataType
    assert [f.name for f in s_type.fields] == ["a", "z"]
    assert [f.name for f in s_type["a"].dataType.fields] == ["p", "q"]
    assert out.collect()[0]["s"]["a"]["p"] == 3


def test_selector_sorts_structs_inside_arrays(spark):
    df = spark.createDataFrame(
        [(1, [Row(y=1, x=2)])], "id int, arr array<struct<y:int, x:int>>"
    )
    out = df.select(*sorted_selector(df.schema))
    elem = out.schema["arr"].dataType.elementType
    assert [f.name for f in elem.fields] == ["x", "y"]
    assert out.collect()[0]["arr"][0]["x"] == 2


def test_selector_names():
    schema = StructType(
        [StructField("c", IntegerType()), StructField("a", IntegerType()), StructField("b", IntegerType())]
    )
    assert sorted_selector_names(schema) == ["a", "b", "c"]


def test_map_columns_normalized_and_comparable(spark):
    """Map columns (unsupported in the reference, SURVEY.md §1.2) are
    normalized to key-sorted entry arrays so the compare kernel can group
    and null-safe-compare them in both modes."""
    from hermes_spark import ComparisonConfig, compare

    rows = [
        (1, {"b": 2, "a": 1}),
        (2, {"x": 9}),
        (3, None),
    ]
    ref = spark.createDataFrame(rows, "id int, props map<string,int>")
    same = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (2, {"x": 9}), (3, None)],
        "id int, props map<string,int>",
    )
    changed = spark.createDataFrame(
        [(1, {"a": 1, "b": 99}), (2, {"x": 9}), (3, None)],
        "id int, props map<string,int>",
    )
    for mode in ("reference", "fast"):
        cfg = ComparisonConfig(mode=mode)
        ok = compare(ref, same, keys=["id"], config=cfg)
        assert ok.passed, mode  # insertion order must not matter
        bad = compare(ref, changed, keys=["id"], config=cfg)
        assert bad.diff_count == 1, mode


def test_intersect_schemas_nested():
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from hermes_spark.schema_utils import intersect_schemas

    a = StructType(
        [
            StructField("id", LongType()),
            StructField("only_a", StringType()),
            StructField(
                "info",
                StructType(
                    [
                        StructField("x", IntegerType()),
                        StructField("gone", StringType()),
                    ]
                ),
            ),
            StructField("retyped", StringType()),
        ]
    )
    b = StructType(
        [
            StructField("id", LongType()),
            StructField(
                "info", StructType([StructField("x", IntegerType())])
            ),
            StructField("retyped", LongType()),
            StructField("only_b", StringType()),
        ]
    )
    got = intersect_schemas(a, b)
    assert [f.name for f in got.fields] == ["id", "info"]
    assert [f.name for f in got["info"].dataType.fields] == ["x"]

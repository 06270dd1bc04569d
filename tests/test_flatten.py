import pytest
from pyspark.sql import Row

from hermes_spark.flatten import (
    ArrayWidthExceeded,
    flatten_dataframe,
    flatten_selector,
)


def test_flat_passthrough(spark):
    df = spark.createDataFrame([(1, "x")], "id int, name string")
    out = flatten_dataframe(df)
    assert out.columns == ["id", "name"]


def test_nested_struct_names(spark):
    df = spark.createDataFrame(
        [(1, Row(b="x", c=Row(d=2)))], "a int, s struct<b:string, c:struct<d:int>>"
    )
    out = flatten_dataframe(df)
    assert out.columns == ["a", "s_b", "s_c_d"]
    assert out.collect()[0]["s_c_d"] == 2


def test_array_positional(spark):
    df = spark.createDataFrame([(1, [10, 20, 30]), (2, [5])], "id int, xs array<int>")
    out = flatten_dataframe(df)
    assert out.columns == ["id", "xs_0", "xs_1", "xs_2"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["xs_2"] == 30
    assert rows[2]["xs_1"] is None


def test_array_of_struct(spark):
    df = spark.createDataFrame(
        [(1, [Row(x=1, y="a"), Row(x=2, y="b")])],
        "id int, arr array<struct<x:int, y:string>>",
    )
    out = flatten_dataframe(df)
    assert out.columns == ["id", "arr_0_x", "arr_0_y", "arr_1_x", "arr_1_y"]
    row = out.collect()[0]
    assert row["arr_1_y"] == "b"


def test_nested_arrays(spark):
    df = spark.createDataFrame([(1, [[1, 2], [3]])], "id int, m array<array<int>>")
    out = flatten_dataframe(df)
    # inner max length is measured per outer index (reference behavior):
    # m[0] has up to 2 elements, m[1] only 1
    assert out.columns == ["id", "m_0_0", "m_0_1", "m_1_0"]
    row = out.collect()[0]
    assert row["m_0_1"] == 2 and row["m_1_0"] == 3


def test_max_length_across_both_dataframes(spark):
    a = spark.createDataFrame([(1, [1])], "id int, xs array<int>")
    b = spark.createDataFrame([(1, [1, 2, 3])], "id int, xs array<int>")
    formula = flatten_selector(a, b)
    out = a.select(*formula)
    assert out.columns == ["id", "xs_0", "xs_1", "xs_2"]


def test_width_cap(spark):
    df = spark.createDataFrame([(1, list(range(50)))], "id int, xs array<int>")
    with pytest.raises(ArrayWidthExceeded):
        flatten_dataframe(df, max_array_width=10)


def test_special_column_names(spark):
    df = spark.createDataFrame([(1, Row(**{"a b": 2}))], "`my col` int, s struct<`a b`:int>")
    out = flatten_dataframe(df)
    assert out.columns == ["my col", "s_a b"]

"""Scale-join utility tests: salted join correctness, bucketed join
plan quality (no exchange)."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import read_bucketed, salted_join, write_bucketed
from hermes_spark.plans import count_exchanges, plan_operators


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")

    plain = orders.join(customer, on="o_custkey")
    salted = salted_join(orders, customer, on=["o_custkey"], num_salts=8)
    assert salted.count() == plain.count()
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in salted.collect()}
    assert a == b


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "v"])
    right = spark.createDataFrame([(1, "R1")], ["k", "r"])
    out = salted_join(left, right, on=["k"], how="left", num_salts=4)
    rows = {(r.k, r.v, r.r) for r in out.collect()}
    assert rows == {(1, "x", "R1"), (2, "y", None), (3, "z", None)}


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # managed tables land in the session's default warehouse; DROP TABLE
    # below removes the files (warehouse.dir is static config)
    # disable broadcast so the join would otherwise shuffle
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        write_bucketed(
            orders, "orders_b", ["o_orderkey"], num_buckets=8,
            sort_cols=["o_orderkey"],
        )
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b", ["o_orderkey"], num_buckets=8,
            sort_cols=["o_orderkey"],
        )
        joined = read_bucketed(spark, "orders_b").join(
            read_bucketed(spark, "lineitem_b"), on="o_orderkey"
        )
        assert count_exchanges(joined) == 0, plan_operators(joined)
        # sorted buckets: no explicit Sort before the merge join either
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_range_join_semantics(spark):
    from hermes_spark.operators import range_join

    points = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:30:00"),
         (2, "a", "2024-01-01 13:00:00"),
         (3, "b", "2024-01-01 10:30:00")],
        ["pid", "k", "ts_str"],
    ).select("pid", "k", F.to_timestamp("ts_str").alias("ts"))
    intervals = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00", "w1"),
         ("a", "2024-01-01 10:30:00", "2024-01-01 11:00:00", "w2"),
         ("b", "2024-01-01 11:00:00", "2024-01-01 12:00:00", "w3")],
        ["k", "s_str", "e_str", "name"],
    ).select(
        "k",
        F.to_timestamp("s_str").alias("start"),
        F.to_timestamp("e_str").alias("end"),
        "name",
    )
    got = {(r.pid, r.name) for r in range_join(
        points, intervals, "ts", "start", "end", by=("k",),
        bucket_seconds=1800,
    ).collect()}
    # point 1 in both overlapping a-windows (inclusive start); point 2
    # after both; point 3 is b but before w3
    assert got == {(1, "w1"), (1, "w2")}


def test_range_join_end_exclusive(spark):
    from hermes_spark.operators import range_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], ["pid", "ts_str"]
    ).select("pid", F.to_timestamp("ts_str").alias("ts"))
    intervals = spark.createDataFrame(
        [("2024-01-01 10:00:00", "2024-01-01 12:00:00", "w")],
        ["s_str", "e_str", "name"],
    ).select(
        F.to_timestamp("s_str").alias("start"),
        F.to_timestamp("e_str").alias("end"),
        "name",
    )
    assert range_join(points, intervals, "ts", "start", "end").count() == 0

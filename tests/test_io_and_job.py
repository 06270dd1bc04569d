"""IO layer + compare-job end-to-end tests, mirroring the reference's
``DatasetComparatorJobSuite`` coverage: CLI → files → `_METRICS` →
exception contract, cross-format compare, collision-free output paths."""

import json
import os

import pytest
from pyspark.sql import functions as F

from hermes_spark.cli.compare_job import run
from hermes_spark.cli.parser import parse_cli_parameters
from hermes_spark.exceptions import DatasetsDifferException
from hermes_spark.sources import (
    Parameters,
    get_unique_file_path,
    load_dataframe,
    read_json_strings,
    write_dataframe,
    write_next_dataframe,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_load_write_round_trip_csv(spark, orders, tmp_path):
    path = str(tmp_path / "orders_csv")
    write_dataframe(
        orders.limit(100),
        Parameters("csv", {"header": "true"}, path),
    )
    back = load_dataframe(
        spark, Parameters("csv", {"header": "true", "inferSchema": "true"}, path)
    )
    assert back.count() == 100
    assert set(back.columns) == set(orders.columns)


def test_unique_path_suffixes_on_collision(spark, tmp_path):
    path = str(tmp_path / "exists")
    os.makedirs(path)
    unique = get_unique_file_path(spark, path)
    assert unique != path and unique.startswith(path + "_")
    assert get_unique_file_path(spark, str(tmp_path / "fresh")) == str(
        tmp_path / "fresh"
    )


def test_write_next_dataframe_does_not_overwrite(spark, orders, tmp_path):
    params = Parameters("parquet", {}, str(tmp_path / "out"))
    first = write_next_dataframe(orders.limit(5), params)
    second = write_next_dataframe(orders.limit(5), params)
    assert first == str(tmp_path / "out")
    assert second != first
    assert spark.read.parquet(first).count() == 5
    assert spark.read.parquet(second).count() == 5


def test_read_json_strings(spark):
    df = read_json_strings(spark, ['{"a": 1, "b": "x"}', '{"a": 2, "b": "y"}'])
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_compare_job_identical_inputs_pass(spark, orders, tmp_path):
    ref_path = str(tmp_path / "ref")
    orders.limit(200).write.parquet(ref_path)
    cli = parse_cli_parameters(
        f"--format parquet --ref-path {ref_path} --new-path {ref_path} "
        f"--out-path {tmp_path}/out --keys o_orderkey".split()
    )
    result = run(spark, cli)
    assert result.passed
    # _METRICS is written even on pass
    metrics = json.loads(
        open(f"{tmp_path}/out/_METRICS", encoding="utf-8").read()
    )
    assert metrics["passed"] is True
    assert metrics["referenceRowCount"] == 200


def test_compare_job_differing_inputs_raise_and_write_diff(
    spark, orders, tmp_path
):
    ref_path = str(tmp_path / "ref")
    new_path = str(tmp_path / "new")
    orders.limit(200).write.parquet(ref_path)
    (
        orders.limit(200)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(0.0)).otherwise(
                F.col("o_totalprice")
            ),
        )
        .write.parquet(new_path)
    )
    cli = parse_cli_parameters(
        f"--format parquet --ref-path {ref_path} --new-path {new_path} "
        f"--out-path {tmp_path}/out --keys o_orderkey".split()
    )
    with pytest.raises(DatasetsDifferException) as err:
        run(spark, cli)
    assert "Expected and actual datasets differ." in str(err.value)
    diff = spark.read.parquet(f"{tmp_path}/out")
    assert diff.count() > 0
    assert "errCol" in diff.columns
    metrics = json.loads(
        open(f"{tmp_path}/out/_METRICS", encoding="utf-8").read()
    )
    assert metrics["passed"] is False
    assert metrics["numberOfDifferences"] == diff.count()


def test_compare_job_cross_format(spark, orders, tmp_path):
    """csv vs parquet compare of the same data passes (cf. reference
    ``DatasetComparatorJobSuite.scala:96-114`` csv-vs-json)."""
    subset = orders.select(
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        "o_orderpriority",
    ).limit(100)
    csv_path = str(tmp_path / "ref_csv")
    pq_path = str(tmp_path / "new_pq")
    subset.write.options(header="true").csv(csv_path)
    subset.write.parquet(pq_path)
    cli = parse_cli_parameters(
        f"--ref-format csv --ref-header true "
        f"--ref-path {csv_path} --new-format parquet --new-path {pq_path} "
        f"--out-path {tmp_path}/out --keys o_orderkey".split()
    )
    result = run(spark, cli)
    assert result.passed


def test_fixed_width_reader(spark, tmp_path):
    data = "   1 Alice      100\n   2 Bob         42\n"
    src = tmp_path / "fw.txt"
    src.write_text(data)
    from hermes_spark.sources import Parameters, load_dataframe

    df = load_dataframe(
        spark,
        Parameters("fixed-width", {"widths": "id:4,name:11,score:4"}, str(src)),
    )
    rows = {r.id: (r.name, r.score) for r in df.collect()}
    assert rows == {"1": ("Alice", "100"), "2": ("Bob", "42")}


def test_fixed_width_compare_vs_csv(spark, tmp_path):
    """Cross-format: fixed-width vs csv of the same data compares equal
    (reference supports fixed-width via a bundled datasource)."""
    (tmp_path / "fw.txt").write_text("   1 Alice\n   2 Bob  \n")
    (tmp_path / "c.csv").write_text("id,name\n1,Alice\n2,Bob\n")
    cli = parse_cli_parameters(
        f"--ref-format fixed-width --ref-widths id:4,name:6 "
        f"--ref-path {tmp_path}/fw.txt "
        f"--new-format csv --new-header true --new-path {tmp_path}/c.csv "
        f"--out-path {tmp_path}/out --keys id".split()
    )
    assert run(spark, cli).passed


def test_xml_round_trip_compare(spark, orders, tmp_path):
    """XML source/sink work natively in Spark 4 (the reference needs the
    spark-xml package; same --rowTag option surface)."""
    subset = orders.select(
        F.concat(F.lit("K"), F.col("o_orderkey").cast("string")).alias("k"),
        "o_orderstatus",
    ).limit(50)
    xml_path = str(tmp_path / "orders_xml")
    subset.write.option("rowTag", "order").format("xml").save(xml_path)
    pq_path = str(tmp_path / "orders_pq")
    subset.write.parquet(pq_path)
    cli = parse_cli_parameters(
        f"--ref-format xml --ref-rowTag order --ref-path {xml_path} "
        f"--new-format parquet --new-path {pq_path} "
        f"--out-path {tmp_path}/out --keys k".split()
    )
    assert run(spark, cli).passed


def test_profile_cli_job(spark, sf_dir, capsys):
    from hermes_spark.cli.profile_job import run

    records = run(
        spark,
        [
            "--format", "parquet", "--path", f"{sf_dir}/orders.parquet",
            "--cols", "o_custkey,o_orderstatus",
            "--skew-cols", "o_orderstatus", "--top-n", "2",
        ],
    )
    by_report = {}
    for r in records:
        by_report.setdefault(r["report"], []).append(r)
    assert {r["column"] for r in by_report["column_profile"]} == {
        "o_custkey", "o_orderstatus",
    }
    assert all(r["n_null"] == 0 for r in by_report["column_profile"])
    skew = by_report["skew"]
    assert len(skew) == 2 and skew[0]["rank"] == 1
    assert skew[0]["cnt"] >= skew[1]["cnt"]


def test_compare_job_incremental(spark, tmp_path):
    from pyspark.sql import functions as F

    from hermes_spark.cli.compare_job import run
    from hermes_spark.cli.parser import parse_cli_parameters
    from hermes_spark.exceptions import DatasetsDifferException

    base = spark.range(90).select(
        F.concat(F.lit("d"), (F.col("id") % 3)).alias("day"),
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
    )
    ref_p, act_p, same_p = (
        str(tmp_path / n) for n in ("iref", "iact", "isame")
    )
    base.write.partitionBy("day").parquet(ref_p)
    base.withColumn(
        "v",
        F.when((F.col("day") == "d1") & (F.col("k") < 10), -1).otherwise(F.col("v")),
    ).write.partitionBy("day").parquet(act_p)
    base.write.partitionBy("day").parquet(same_p)

    def cli_for(new_path, out):
        return parse_cli_parameters(
            ["--format", "parquet", "--ref-path", ref_p, "--new-path", new_path,
             "--out-path", str(tmp_path / out), "--keys", "k",
             "--incremental-partition-col", "day"]
        )

    # identical snapshots: digest-only pass, no compare, passes
    res = run(spark, cli_for(same_p, "out_same"))
    assert res.passed and res.additional_info["changed_partitions"] == "0"
    assert res.ref_row_count == 90

    # one mutated partition: diff restricted to it
    with pytest.raises(DatasetsDifferException):
        run(spark, cli_for(act_p, "out_diff"))


def test_write_training_shards(spark, sf_dir, tmp_path):
    from hermes_spark.sources.io import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "shard", (F.col("doc_id") % 4).cast("long")
    )
    out = str(tmp_path / "shards")
    info = write_training_shards(
        docs, out, shard_col="shard", max_records_per_file=50
    )
    n = docs.count()
    assert info["total_rows"] == n and info["n_shards"] == 4
    # readable back, partition column intact, counts match the manifest
    back = spark.read.parquet(out)
    got = {str(r["shard"]): r["count"] for r in back.groupBy("shard").count().collect()}
    assert got == info["rows_per_shard"]
    # maxRecordsPerFile respected: every parquet file holds <= 50 rows
    import glob
    files = glob.glob(f"{out}/shard=*/*.parquet")
    assert files
    import pyarrow.parquet as pq
    assert all(pq.ParquetFile(f).metadata.num_rows <= 50 for f in files)
    # manifest is valid JSON on disk
    import json as _json
    with open(f"{out}/_MANIFEST") as fh:
        assert _json.load(fh)["total_rows"] == n


def test_write_training_shards_empty_input(spark, tmp_path):
    """A fully-filtered pipeline (0 surviving rows) must produce an
    empty manifest, not a schema-inference crash on the read-back."""
    from hermes_spark.sources.io import write_training_shards

    df = spark.range(10).selectExpr(
        "id AS doc_id", "id % 4 AS shard"
    ).filter("doc_id < 0")
    info = write_training_shards(df, str(tmp_path / "out"), shard_col="shard")
    assert info["n_shards"] == 0 and info["total_rows"] == 0

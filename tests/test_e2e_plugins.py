"""Bundled-plugin integration: DatasetComparison and InfoComparison run
through the e2e runner against real files (cf. the reference's
``DatasetComparatorPluginTest`` incl. the write path)."""

import json

import pytest
from pyspark.sql import functions as F

import hermes_spark.e2e.plugins  # noqa: F401 - registers bundled plugins
from hermes_spark.e2e import TestDefinitions, run_tests


@pytest.fixture(scope="module")
def data(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("e2e_data")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(300)
    orders.write.parquet(str(base / "ref"))
    (
        orders.withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 60 == 0, F.lit(1.0)).otherwise(
                F.col("o_totalprice")
            ),
        ).write.parquet(str(base / "new"))
    )
    info = {"metadata": {"country": "CZ", "version": 1,
                         "additionalInfo": {}}, "checkpoints": []}
    (base / "info_ref.json").write_text(json.dumps(info))
    (base / "info_same.json").write_text(json.dumps(info))
    return base


def test_dataset_comparison_plugin_pass_and_fail(spark, data, tmp_path):
    defs = TestDefinitions.from_string(json.dumps({
        "vars": {"base": str(data), "out": str(tmp_path)},
        "runs": [
            {
                "pluginName": "DatasetComparison",
                "name": "same",
                "order": 0,
                "args": ["--format", "parquet",
                         "--ref-path", "#{base}#/ref",
                         "--new-path", "#{base}#/ref",
                         "--keys", "o_orderkey"],
            },
            {
                "pluginName": "DatasetComparison",
                "name": "differs",
                "order": 1,
                "args": ["--format", "parquet",
                         "--ref-path", "#{base}#/ref",
                         "--new-path", "#{base}#/new",
                         "--keys", "o_orderkey"],
                "writeArgs": ["--format", "parquet",
                              "--path", "#{out}#/diff"],
            },
        ],
    }))
    results = run_tests(defs)
    assert results[0].passed
    assert not results[1].passed
    meta = json.loads(results[1].returned_value)
    assert meta["numberOfDifferences"] == 5  # 60,120,...,300 within limit(300)
    # write path produced the diff parquet + _METRICS next to it
    diff = spark.read.parquet(f"{tmp_path}/diff")
    assert diff.count() == 5 and "errCol" in diff.columns
    metrics = json.loads(open(f"{tmp_path}/diff/_METRICS").read())
    assert metrics["passed"] is False


def test_info_comparison_plugin(data, tmp_path):
    defs = TestDefinitions.from_string(json.dumps({
        "runs": [
            {
                "pluginName": "InfoComparison",
                "name": "info_same",
                "order": 0,
                "args": [str(data / "info_ref.json"),
                         str(data / "info_same.json"),
                         str(tmp_path / "info_diff.json")],
            },
        ],
    }))
    results = run_tests(defs)
    assert results[0].passed


def test_profile_plugin_gates(spark, sf_dir):
    from hermes_spark.e2e.definitions import TestDefinition
    from hermes_spark.e2e.plugin import get_plugin

    def run(args):
        td = TestDefinition(
            name="profile gate", order=1, plugin_name="Profile", args=tuple(args)
        )
        return get_plugin("Profile").perform_action(td, 1)

    base = [
        "--format", "parquet", "--path", f"{sf_dir}/orders.parquet",
        "--cols", "o_custkey", "--skew-cols", "o_orderstatus",
    ]
    # loose thresholds: passes
    ok = run(base + ["--max-null-pct", "0.0", "--max-top-key-pct", "0.9"])
    assert ok.passed and ok.records

    # o_orderstatus top group holds ~1/3 of rows -> 5% skew gate fails
    bad = run(base + ["--max-top-key-pct", "0.05"])
    assert not bad.passed
    assert any("top key" in v for v in bad.violations)

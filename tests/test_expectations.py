"""Declarative data-quality expectations (operators/expectations.py)."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import Rule, check_expectations


def _report(df, rules):
    return {r["rule"]: r for r in check_expectations(df, rules).collect()}


def test_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "US"),
            (2, "b@x.com", 20.0, "DE"),
            (2, None, -5.0, "FR"),
            (None, "not-an-email", 999.0, "XX"),
        ],
        ["id", "email", "amount", "country"],
    )
    got = _report(
        df,
        [
            Rule.not_null("id_nn", "id"),
            Rule.unique("id_uq", "id"),
            Rule.in_range("amount_rng", "amount", 0.0, 100.0),
            Rule.matches("email_fmt", "email", r"^[^@]+@[^@]+\.[^@]+$"),
            Rule.isin("country_set", "country", ["US", "DE", "FR"]),
        ],
    )
    assert got["id_nn"]["n_violations"] == 1 and not got["id_nn"]["passed"]
    assert got["id_uq"]["n_violations"] == 1  # two id=2 rows, nulls ignored
    assert got["amount_rng"]["n_violations"] == 2  # -5 and 999
    assert got["email_fmt"]["n_violations"] == 1  # null email skipped
    assert got["country_set"]["n_violations"] == 1  # XX
    assert all(r["n_rows"] == 4 for r in got.values())


def test_ref_integrity_and_thresholds(spark):
    facts = spark.createDataFrame(
        [(1, 10), (2, 20), (9, 30), (None, 40)], ["fk", "v"]
    )
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    got = _report(
        facts,
        [
            Rule.ref_integrity("fk_ref", "fk", dim, "k"),
            Rule.ref_integrity("fk_ref_lenient", "fk", dim, "k", max_rate=0.5),
        ],
    )
    # fk=9 missing; null fk skipped
    assert got["fk_ref"]["n_violations"] == 1
    assert got["fk_ref"]["violation_rate"] == pytest.approx(0.25)
    assert not got["fk_ref"]["passed"]
    assert got["fk_ref_lenient"]["passed"]


def test_single_scan_for_aggregate_rules(spark, sf_dir):
    """All aggregate rules fuse into one scan of the input."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rules = [
        Rule.not_null("ck_nn", "o_custkey"),
        Rule.unique("ok_uq", "o_orderkey"),
        Rule.in_range("price_rng", "o_totalprice", 0.0, 1e9),
    ]
    out = check_expectations(orders, rules)
    rows = {r["rule"]: r for r in out.collect()}
    assert all(rows[n]["passed"] for n in ("ck_nn", "ok_uq", "price_rng"))
    # the metrics row is checkpointed: the report plan contains NO
    # parquet scan of orders at all
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan


def test_empty_rules_rejected(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError):
        check_expectations(df, [])


def test_cli_quality_job(spark, sf_dir, tmp_path):
    import json

    from hermes_spark.cli.quality_job import run

    rules = [
        {"name": "ok_uq", "kind": "unique", "column": "o_orderkey"},
        {"name": "ck_nn", "kind": "not_null", "column": "o_custkey"},
        {
            "name": "price_impossible",
            "kind": "in_range",
            "column": "o_totalprice",
            "lo": 0,
            "hi": 1,  # deliberately failing rule
        },
        {
            "name": "ck_ref",
            "kind": "ref_integrity",
            "column": "o_custkey",
            "ref_format": "parquet",
            "ref_path": f"{sf_dir}/customer.parquet",
            "ref_column": "c_custkey",
        },
    ]
    rules_file = tmp_path / "rules.json"
    rules_file.write_text(json.dumps(rules))
    records = run(
        spark,
        ["--format", "parquet", "--path", f"{sf_dir}/orders.parquet",
         "--rules", str(rules_file)],
    )
    by = {r["rule"]: r for r in records}
    assert by["ok_uq"]["passed"] and by["ck_nn"]["passed"] and by["ck_ref"]["passed"]
    assert not by["price_impossible"]["passed"]
    assert by["price_impossible"]["n_violations"] == by["price_impossible"]["n_rows"]

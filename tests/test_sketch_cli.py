"""The sketch CLI job: one-shot estimates, the incremental state-store
fold, and argument validation."""

import pytest
from pyspark.sql import functions as F

from hermes_spark.cli.sketch_job import run
from hermes_spark.exceptions import MissingArgumentException


@pytest.fixture()
def src(spark, tmp_path):
    path = str(tmp_path / "src")
    spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("seg"),
        (F.col("id") % 700).alias("uid"),
        ((F.col("id") % 97) + 1).cast("double").alias("v"),
    ).write.parquet(path)
    return path


def _argv(path, *extra):
    return ["--format", "parquet", "--path", path, *extra]


def test_distinct_one_shot(spark, src):
    recs = run(spark, "distinct", _argv(src, "--group-by", "seg", "--value", "uid"))
    assert len(recs) == 3
    for r in recs:
        assert r["report"] == "hll_distinct"
        # ~700/3 per-seg true distincts... each seg sees ~233 or 700/gcd;
        # just require a sane positive estimate near truth
        assert 150 < r["distinct_est"] < 900


def test_quantiles_one_shot(spark, src):
    recs = run(
        spark, "quantiles",
        _argv(src, "--group-by", "seg", "--value", "v", "--qs", "0.5,0.9"),
    )
    assert len(recs) == 6
    assert all(r["report"] == "quantiles" and 0 < r["est"] < 100 for r in recs)


def test_heavy_hitters(spark, src):
    recs = run(
        spark, "heavy", _argv(src, "--value", "seg", "--threshold", "1500")
    )
    assert len(recs) == 3 and all(r["est_count"] >= 1500 for r in recs)


def test_distinct_incremental_store(spark, tmp_path):
    store = str(tmp_path / "store")
    d1, d2 = str(tmp_path / "d1"), str(tmp_path / "d2")
    spark.range(0, 4000).select(
        F.lit("g").alias("seg"), (F.col("id") % 900).alias("uid")
    ).write.parquet(d1)
    spark.range(4000, 8000).select(
        F.lit("g").alias("seg"), (F.col("id") % 1300).alias("uid")
    ).write.parquet(d2)

    run(spark, "distinct", _argv(d1, "--group-by", "seg", "--value", "uid", "--state", store))
    recs = run(
        spark, "distinct",
        _argv(d2, "--group-by", "seg", "--value", "uid", "--state", store),
    )
    # merged store covers both batches: true distinct is 1300 (d2's
    # moduli superset d1's values 0..899 plus 900..1299)
    est = recs[0]["distinct_est"]
    assert abs(est - 1300) / 1300 < 0.1, est

    # the store on disk is the merged state, re-usable independently
    from hermes_spark.operators import hll_estimate

    persisted = hll_estimate(spark.read.parquet(store), ["seg"], p=12).collect()[0]
    assert persisted["distinct_est"] == est


def test_missing_args_raise(spark, src):
    with pytest.raises(MissingArgumentException):
        run(spark, "distinct", _argv(src, "--value", "uid"))
    with pytest.raises(MissingArgumentException):
        run(spark, "nope", _argv(src))


def test_store_params_mismatch_refuses_merge(spark, tmp_path):
    store = str(tmp_path / "store")
    d1 = str(tmp_path / "d1")
    spark.range(100).select(
        F.lit("g").alias("seg"), F.col("id").alias("uid")
    ).write.parquet(d1)
    run(spark, "distinct", _argv(d1, "--group-by", "seg", "--value", "uid", "--state", store))
    with pytest.raises(MissingArgumentException, match="refusing to merge"):
        run(spark, "distinct",
            _argv(d1, "--group-by", "seg", "--value", "uid", "--state", store, "--p", "14"))
    with pytest.raises(MissingArgumentException, match="refusing to merge"):
        run(spark, "distinct",
            _argv(d1, "--group-by", "seg", "--value", "uid", "--state", store,
                  "--portable", "true"))


def test_corrupt_store_does_not_get_overwritten(spark, tmp_path):
    store = tmp_path / "store"
    store.mkdir()
    (store / "part-00000.parquet").write_text("this is not parquet")
    d1 = str(tmp_path / "d1")
    spark.range(100).select(
        F.lit("g").alias("seg"), F.col("id").alias("uid")
    ).write.parquet(d1)
    with pytest.raises(Exception):
        run(spark, "distinct",
            _argv(d1, "--group-by", "seg", "--value", "uid", "--state", str(store)))
    # the broken store was NOT silently replaced by the batch
    assert (store / "part-00000.parquet").read_text() == "this is not parquet"


def test_strict_bool_rejects_typos(spark, src):
    with pytest.raises(MissingArgumentException, match="must be true/false"):
        run(spark, "distinct",
            _argv(src, "--group-by", "seg", "--value", "uid", "--portable", "maybe"))
    # and 'yes' is accepted as true rather than silently meaning false
    recs = run(spark, "distinct",
               _argv(src, "--group-by", "seg", "--value", "uid", "--portable", "yes"))
    assert len(recs) == 3

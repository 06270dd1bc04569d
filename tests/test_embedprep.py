"""Embedding preprocessing (operators/embedprep.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import embedding_dim_profile, standardize_embeddings


def test_dim_profile_matches_numpy(spark, embeddings):
    mat = np.array(
        [r["embedding"] for r in embeddings.select("embedding").collect()],
        dtype=np.float64,
    )
    prof = {r["pos"]: r for r in embedding_dim_profile(embeddings).collect()}
    assert len(prof) == mat.shape[1]
    for pos in (0, mat.shape[1] // 2, mat.shape[1] - 1):
        assert prof[pos]["n"] == mat.shape[0]
        assert prof[pos]["mean"] == pytest.approx(mat[:, pos].mean(), abs=1e-5)
        assert prof[pos]["std"] == pytest.approx(mat[:, pos].std(ddof=1), abs=1e-5)
        assert prof[pos]["min_x"] == pytest.approx(mat[:, pos].min(), abs=1e-5)
        assert prof[pos]["max_x"] == pytest.approx(mat[:, pos].max(), abs=1e-5)


def test_standardize_zero_mean_unit_variance(spark, embeddings):
    out = standardize_embeddings(embeddings)
    zmat = np.array(
        [r["z"] for r in out.select("z").collect()], dtype=np.float64
    )
    # every dimension centered and unit-variance after the transform
    assert np.abs(zmat.mean(axis=0)).max() < 1e-9
    assert np.abs(zmat.std(axis=0, ddof=1) - 1.0).max() < 1e-9
    # original columns preserved
    assert "vec_id" in out.columns and "embedding" in out.columns


def test_standardize_with_external_stats(spark):
    """Held-out data transformed with TRAIN stats, not its own."""
    from hermes_spark.operators.embedprep import _dim_stats

    train = spark.createDataFrame(
        [(0, [0.0, 10.0]), (1, [2.0, 30.0])], ["vec_id", "embedding"]
    )
    heldout = spark.createDataFrame([(9, [1.0, 20.0])], ["vec_id", "embedding"])
    stats = _dim_stats(train, "embedding")
    z = standardize_embeddings(heldout, stats=stats).collect()[0]["z"]
    # train: dim0 mean 1 std sqrt(2); dim1 mean 20 std sqrt(200)
    assert z[0] == pytest.approx(0.0, abs=1e-12)
    assert z[1] == pytest.approx(0.0, abs=1e-12)


def test_standardize_degenerate_dims_yield_zero_not_null(spark):
    """A constant dimension (std=0) and a single-row corpus
    (stddev_samp null) must produce z=0.0, never null/inf."""
    df = spark.createDataFrame(
        [(0, [5.0, 1.0]), (1, [5.0, 3.0])], ["vec_id", "embedding"]
    )
    rows = {r["vec_id"]: r["z"] for r in standardize_embeddings(df).collect()}
    assert rows[0][0] == 0.0 and rows[1][0] == 0.0  # constant dim
    assert rows[0][1] == pytest.approx(-1 / np.sqrt(2))
    single = spark.createDataFrame([(0, [7.0])], ["vec_id", "embedding"])
    z = standardize_embeddings(single).collect()[0]["z"]
    assert z == [0.0]

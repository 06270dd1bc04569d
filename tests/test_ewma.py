"""Trailing EWMA smoothing (operators/gapfill.py)."""

import pytest

from hermes_spark.operators import ewma_smooth


def _numpy_ewma(values, alpha=0.3, lookback=16):
    out = []
    for t in range(len(values)):
        lo = max(0, t - lookback + 1)
        num = den = 0.0
        for i, v in enumerate(values[lo : t + 1]):  # oldest -> newest
            k = t - lo - i  # age of this observation
            num += (1.0 - alpha) ** k * v
            den += (1.0 - alpha) ** k
        out.append(num / den)
    return out


def test_ewma_matches_reference_and_warmup_unbiased(spark):
    values = [10.0, 0.0, 5.0, 5.0, 20.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], ["bucket", "v"]
    )
    got = {
        r["bucket"]: r["ewma"]
        for r in ewma_smooth(df, "bucket", "v", lookback=4, decimals=8).collect()
    }
    want = _numpy_ewma(values, lookback=4)
    assert got[0] == pytest.approx(values[0])  # warm-up: first bucket = itself
    for t in range(len(values)):
        assert got[t] == pytest.approx(want[t], abs=1e-6)


def test_ewma_grouped_series_independent(spark):
    rows = [("a", 0, 1.0), ("a", 1, 3.0), ("b", 0, 100.0), ("b", 1, 100.0)]
    df = spark.createDataFrame(rows, ["g", "bucket", "v"])
    got = {
        (r["g"], r["bucket"]): r["ewma"]
        for r in ewma_smooth(df, "bucket", "v", group_cols=["g"]).collect()
    }
    assert got[("b", 0)] == pytest.approx(100.0)
    assert got[("b", 1)] == pytest.approx(100.0)
    # group a: (0.7*1 + 3) / (0.7 + 1)
    assert got[("a", 1)] == pytest.approx(round((0.7 * 1.0 + 3.0) / 1.7, 4))


def test_ewma_validates_params(spark):
    df = spark.createDataFrame([(0, 1.0)], ["bucket", "v"])
    with pytest.raises(ValueError):
        ewma_smooth(df, "bucket", "v", alpha=0.0)
    with pytest.raises(ValueError):
        ewma_smooth(df, "bucket", "v", lookback=0)

"""RRF fusion and the integer-gradient logistic trainer."""

import math

import pytest
from pyspark.sql import functions as F

from hermes_spark.operators import (
    logreg_train,
    rrf_fuse,
    train_quality_weights,
    weights_trace_df,
)


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "item string, rank long")


class TestRrfFuse:
    def test_two_list_fusion_scores_and_order(self, spark):
        lex = _ranking(spark, [("a", 1), ("b", 2), ("c", 3)])
        sem = _ranking(spark, [("b", 1), ("a", 2), ("d", 3)])
        out = {
            r["item"]: r
            for r in rrf_fuse([lex, sem], "item", k=60).collect()
        }
        assert out["a"]["rrf_score"] == round(1 / 61 + 1 / 62, 6)
        assert out["b"]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
        assert out["c"]["rrf_score"] == round(1 / 63, 6)
        assert out["c"]["n_lists"] == 1
        # a and b tie exactly (same pair of ranks) -> item asc breaks it
        assert out["a"]["fused_rank"] == 1
        assert out["b"]["fused_rank"] == 2
        assert {out["c"]["fused_rank"], out["d"]["fused_rank"]} == {3, 4}

    def test_weights_and_top(self, spark):
        lex = _ranking(spark, [("a", 1), ("b", 2)])
        sem = _ranking(spark, [("b", 1), ("a", 2)])
        out = rrf_fuse([lex, sem], "item", k=10, weights=[2.0, 1.0], top=1).collect()
        assert len(out) == 1
        assert out[0]["item"] == "a"  # 2/11 + 1/12 > 2/12 + 1/11
        assert out[0]["rrf_score"] == round(2 / 11 + 1 / 12, 6)

    def test_grouped_fusion(self, spark):
        lex = spark.createDataFrame(
            [(1, "a", 1), (1, "b", 2), (2, "x", 1)], "q long, item string, rank long"
        )
        sem = spark.createDataFrame(
            [(1, "b", 1), (2, "y", 1)], "q long, item string, rank long"
        )
        out = rrf_fuse([lex, sem], "item", k=60, group_cols=["q"]).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["q"], []).append(r)
        assert sorted(r["item"] for r in by_q[1]) == ["a", "b"]
        top2 = {r["item"]: r["fused_rank"] for r in by_q[2]}
        assert set(top2.values()) == {1, 2}  # x and y rank within q=2 only

    def test_mismatched_weights_raise(self, spark):
        lex = _ranking(spark, [("a", 1)])
        with pytest.raises(ValueError):
            rrf_fuse([lex], "item", weights=[1.0, 2.0])


class TestLogregTrain:
    def test_learns_a_separable_signal(self, spark):
        # y = 1 iff x > 0 -- one feature, cleanly separable
        rows = [(float(x) / 10.0, 1 if x > 0 else 0) for x in range(-50, 50)]
        df = spark.createDataFrame(rows, "x double, y long").cache()
        trace = logreg_train(df, ["x"], "y", lr=2.0, iters=8)
        assert len(trace) == 9
        assert trace[0] == {"bias": 0.0, "x": 0.0}
        assert trace[-1]["x"] > 1.0  # positive slope learned
        # log-likelihood improves: final weights classify better than init
        w = trace[-1]
        correct = sum(
            1 for x, y in rows if (1 / (1 + math.exp(-(w["bias"] + w["x"] * x))) >= 0.5) == (y == 1)
        )
        assert correct >= 95

    def test_partitioning_invariance(self, spark):
        rows = [(float(x) / 7.0, x % 3 == 0 and 1 or 0) for x in range(200)]
        df1 = spark.createDataFrame(rows, "x double, y long").coalesce(1)
        df32 = spark.createDataFrame(rows, "x double, y long").repartition(32)
        t1 = logreg_train(df1, ["x"], "y", lr=1.0, iters=4)
        t32 = logreg_train(df32, ["x"], "y", lr=1.0, iters=4)
        assert t1 == t32  # integer-sum gradient: bit-identical trajectory

    def test_empty_and_bad_init_raise(self, spark):
        df = spark.createDataFrame([], "x double, y long")
        with pytest.raises(ValueError):
            logreg_train(df, ["x"], "y")
        df2 = spark.createDataFrame([(1.0, 1)], "x double, y long")
        with pytest.raises(ValueError):
            logreg_train(df2, ["x"], "y", init=[0.0])

    def test_quality_trainer_on_documents(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        trace = train_quality_weights(
            docs, "text", F.col("lang") == "en", lr=1.0, iters=2
        )
        assert len(trace) == 3
        final = trace[-1]
        assert set(final) == {
            "bias",
            "log_n_tokens",
            "mean_tok_len",
            "distinct_ratio",
            "stopword_ratio",
        }
        # English docs have English stopwords: the stopword coefficient
        # moves up from zero (scales are unnormalized, so magnitude
        # comparisons across coefficients are not meaningful).
        assert final["stopword_ratio"] > 0.0
        assert final != trace[0]
        assert all(v == round(v, 6) for v in final.values())
        tdf = weights_trace_df(spark, trace)
        assert tdf.count() == 15
        assert [f.name for f in tdf.schema.fields] == ["iteration", "weight", "value"]

"""PageRank and degree statistics (operators/graph.py)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from hermes_spark.operators import degree_stats, pagerank


def _numpy_pagerank(n, edges, iterations=5, damping=0.85):
    """Dense-matrix reference: same formulation as the operator."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        incoming = np.zeros(n)
        for s, d in edges:
            incoming[d] += rank[s] / out_deg[s]
        dangling = rank[out_deg == 0].sum()
        rank = (1.0 - damping) / n + damping * (incoming + dangling / n)
    return rank


def test_degree_stats(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 2)], ["src", "dst"]
    )
    rows = {r["node"]: (r["out_deg"], r["in_deg"]) for r in degree_stats(edges).collect()}
    assert rows == {0: (2, 0), 1: (1, 1), 2: (0, 3), 3: (1, 0)}


def test_pagerank_matches_numpy_reference(spark):
    # ring + chords + one dangling node (4 has no out-edges)
    edge_list = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (1, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=6).collect()}
    want = _numpy_pagerank(5, edge_list, iterations=6)
    assert set(got) == set(range(5))
    for node, rank in got.items():
        assert rank == pytest.approx(want[node], abs=1e-12)


def test_pagerank_mass_conserved_and_checkpointed(spark):
    # 40-node deterministic graph, enough iterations to cross the
    # checkpoint_every boundary; total rank mass must stay 1.
    n = 40
    edge_list = [(i, (i * 7 + 3) % n) for i in range(n)] + [
        (i, (i * 13 + 5) % n) for i in range(n) if i % 5 != 0
    ]
    edges = spark.createDataFrame(edge_list, ["src", "dst"])
    ranks = pagerank(edges, iterations=9, checkpoint_every=4)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-9)
    want = _numpy_pagerank(n, edge_list, iterations=9)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    for node, rank in got.items():
        assert rank == pytest.approx(want[node], abs=1e-12)


def test_pagerank_uniform_on_symmetric_cycle(spark):
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], ["src", "dst"]
    )
    ranks = [r["rank"] for r in pagerank(edges, iterations=3).collect()]
    assert all(r == pytest.approx(1.0 / 6, abs=1e-12) for r in ranks)

"""Link-graph analytics: PageRank and degree statistics.

Extensions (the reference has no graph operators; SURVEY.md groups
these with the curation extras): web-crawl curation pipelines rank
pages/domains by link authority (a classic quality prior for training
data — e.g. the CommonCrawl-derived corpora weight documents by harmonic
centrality or PageRank of their host), and degree statistics feed spam
heuristics (link farms have pathological in/out-degree ratios).

Scale design:

- The rank vector is ONE row per node — tiny next to the edge list.
  Each power iteration is a single shuffle join (edges x ranks, keyed
  by source) plus a keyed aggregation to the destination; the edge list
  is pre-weighted once (``1/out_degree``) and cached so iterations
  reuse the same materialized frame.
- Dangling mass (rank sitting on nodes with no out-edges) is folded
  back uniformly via a one-row aggregate cross-joined in-plan — no
  driver-side collect per iteration.
- Lineage is truncated with ``localCheckpoint`` every
  ``checkpoint_every`` iterations so the plan does not grow with the
  iteration count (same policy as ``dedup.connected_components``;
  docs/TUNING.md "break lineage at phase boundaries").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node ``(node, out_deg, in_deg)`` over a directed edge list.

    One pass per direction (two keyed aggregations on the edge list),
    outer-merged so nodes missing a direction show 0. Shuffle volume is
    the two (node, count) partial aggregates — map-side combined, so
    network traffic is proportional to distinct nodes, not edges.
    """
    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    in_deg = edges.groupBy(F.col(dst).alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        out_deg.join(in_deg, on="node", how="full_outer")
        .select(
            "node",
            F.coalesce(F.col("out_deg"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("in_deg"), F.lit(0)).cast("long").alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list; returns
    ``(node, rank)`` for every node appearing as a source or
    destination.

    Semantics (the standard formulation):

    - ranks start uniform at ``1/n``;
    - each iteration every node distributes ``rank/out_degree`` along
      its out-edges;
    - rank mass on dangling nodes (no out-edges) is redistributed
      uniformly over all nodes;
    - ``rank' = (1-d)/n + d * (incoming + dangling_mass/n)``.

    The fixed iteration count (rather than convergence detection) keeps
    the operator deterministic and oracle-checkable; rank mass is
    conserved at exactly 1 per iteration up to float rounding.

    Per-iteration cost: one shuffle join of the pre-weighted edge list
    with the (node, rank) vector on the source key, one aggregation to
    the destination key, one broadcast-sized left-anti + 1-row
    aggregate for the dangling mass. The edge list shuffles each
    iteration; pre-partitioning it on ``src`` (repartition or bucketed
    write, :func:`~hermes_spark.operators.joins.write_bucketed`) lets
    AQE reuse the exchange.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()  # scalar digest, not data-proportional
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))

    out_deg = edges.groupBy(F.col(src).alias("node")).agg(
        F.count(F.lit(1)).alias("__out_deg")
    )
    # Pre-weight every edge with 1/out_degree once; iterations reuse it.
    weighted = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("__dst"))
        .join(out_deg, on="node")
        .select("node", "__dst", (F.lit(1.0) / F.col("__out_deg")).alias("__w"))
        .localCheckpoint(eager=True)
    )
    has_out = out_deg.select("node").localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contrib = (
            weighted.join(ranks, on="node")
            .groupBy(F.col("__dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("__w")).alias("__contrib"))
        )
        dangling = ranks.join(has_out, on="node", how="left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling")
        )
        ranks = (
            nodes.join(contrib, on="node", how="left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__contrib"), F.lit(0.0))
                        + F.col("__dangling") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        if (
            checkpoint_every
            and (i + 1) % checkpoint_every == 0
            and (i + 1) < iterations
        ):
            ranks = ranks.localCheckpoint(eager=True)
    return ranks

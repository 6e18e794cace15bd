"""Iterative graph algorithms on DataFrames.  Companion to the
connected-components operator in ``operators/dedup.py`` (which powers
dup-group assignment); this module holds the general link-analysis
side.

PageRank here is the canonical iterative-join workload: each
iteration is one join of the rank vector against the edge list plus
one partial-aggregating groupBy — the 100 TB shape is rank (|V| rows)
joining edges (|E| rows) shuffled on the join key, with AQE handling
hub-node skew.  Iterations are built declaratively (plan chaining)
for small fixed iteration counts — the oracle-checkable regime; a
long-running trainer would checkpoint per round exactly like
``connected_components`` documents."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks after ``iterations`` power steps of
    pr(v) = (1-d)/N + d * Σ_{u→v} pr(u)/outdeg(u), initialized
    uniformly.  Assumes every node has out-degree ≥ 1 (no dangling
    mass — the caller's graph construction must guarantee it, e.g. by
    using bidirectional edges).  Returns (node, pr).

    Each iteration: edges ⋈ ranks on src (one shuffle), partial-agg
    sum on dst (second shuffle) — |E|-bounded work per round, never
    materializing anything driver-side."""
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    n = nodes.agg(F.count("*").alias("n_nodes"))
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count("*").alias("outdeg")
    )
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "node", (F.lit(1.0) / F.col("n_nodes")).alias("pr")
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce("mass", F.lit(0.0))
                ).alias("pr"),
            )
        )
    return ranks

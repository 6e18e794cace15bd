"""Measure the iterative-graph operators across 10x scale steps
(VERDICT r8 #6): prove the per-hop frontier persist in
``bfs_distances`` holds a linear wall-time profile, and that
``label_propagation``'s per-round |E|-bounded join does the same.

Synthetic graph generated IN-PLAN (no I/O noise): n nodes, avg degree
DEG via xxhash64-derived endpoints — deterministic, shuffle-realistic
(hash-random keys, no locality), and the same generator at every
scale step so steps differ only in n.

Usage: python tools/measure_graph_scale.py [n1 n2 ...]  (default
30_000 300_000 3_000_000).  Prints a markdown table per operator for
SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hadoop_formats_spark.operators.graph import (  # noqa: E402
    bfs_distances,
    label_propagation,
)
from hadoop_formats_spark.session import get_spark  # noqa: E402

DEG = 8


def synth_edges(spark, n: int):
    """n*DEG directed edges over n nodes, endpoints hash-derived."""
    e = (
        spark.range(n * DEG)
        .select(
            (F.xxhash64(F.col("id")) % n).alias("a"),
            (F.xxhash64(F.col("id") + 1_000_000_007) % n).alias("b"),
        )
        .select(F.abs("a").alias("a"), F.abs("b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    # symmetrize: undirected graph, both directions present
    return e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))


def run(n: int):
    spark = get_spark("graph-scale")
    edges = synth_edges(spark, n).persist()
    n_edges = edges.count()

    src = edges.agg(F.min("a").alias("s"))
    # warm-up then measured run (steady-state JIT/codegen)
    bfs_distances(edges, src, max_hops=4).count()
    t0 = time.time()
    dist = bfs_distances(edges, src, max_hops=4)
    per_hop = {
        r["dist"]: r["c"]
        for r in dist.groupBy("dist").agg(F.count("*").alias("c")).collect()
    }
    t_bfs = time.time() - t0

    label_propagation(edges, src_col="a", dst_col="b", rounds=2).count()
    t0 = time.time()
    n_comm = (
        label_propagation(edges, src_col="a", dst_col="b", rounds=2)
        .select("label")
        .distinct()
        .count()
    )
    t_lpa = time.time() - t0

    edges.unpersist()
    return n_edges, per_hop, t_bfs, t_lpa, n_comm


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [30_000, 300_000, 3_000_000]
    rows = []
    for n in sizes:
        n_edges, per_hop, t_bfs, t_lpa, n_comm = run(n)
        hops = " / ".join(
            f"{per_hop.get(h, 0):,}" for h in sorted(per_hop)
        )
        rows.append((n, n_edges, hops, t_bfs, t_lpa, n_comm))
        print(
            f"n={n:,} edges={n_edges:,} frontier(dist 0..k)={hops} "
            f"bfs={t_bfs:.2f}s lpa={t_lpa:.2f}s communities={n_comm:,}",
            flush=True,
        )
    print("\n| n nodes | edges (sym) | frontier sizes d=0..4 | BFS wall | LPA (2 rounds) wall |")
    print("|---|---|---|---|---|")
    for n, ne, hops, tb, tl, _ in rows:
        print(f"| {n:,} | {ne:,} | {hops} | {tb:.2f} s | {tl:.2f} s |")


if __name__ == "__main__":
    main()

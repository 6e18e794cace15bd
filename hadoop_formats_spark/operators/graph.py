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


def cooccurrence_pairs(
    baskets: DataFrame,
    *,
    group_col: str = "basket_id",
    item_col: str = "item",
    min_support: int = 1,
) -> DataFrame:
    """Market-basket pair mining: (item_a, item_b, support, conf_a_b)
    for unordered item pairs co-occurring in a basket, with
    ``conf_a_b`` = support / baskets(item_a) (the a→b association
    confidence; the b→a direction is the mirror row's).

    Scale shape: the pair space is generated per basket via a
    self-join on the basket key — cost Σ k_b² over basket sizes, the
    inherent market-basket bound (baskets are small: a TPC-H order
    has ≤7 items; a retail basket tens).  Both the distinct step and
    every count are partial-agg groupBys; ``min_support`` prunes the
    long tail before anything downstream (e.g. triangle counting)
    touches the edges.  Returns item_a < item_b rows only."""
    items = baskets.select(group_col, item_col).distinct()
    a = items.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item_a")
    )
    b = items.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item_b")
    )
    pairs = (
        a.join(b, "g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    item_counts = items.groupBy(
        F.col(item_col).alias("item_a")
    ).agg(F.count("*").alias("n_a"))
    return pairs.join(item_counts, "item_a").select(
        "item_a",
        "item_b",
        "support",
        F.round(F.col("support") / F.col("n_a"), 4).alias("conf_a_b"),
    )


def triangle_count(
    edges: DataFrame,
    *,
    a_col: str = "item_a",
    b_col: str = "item_b",
) -> DataFrame:
    """Global triangle count over an undirected edge list given as
    ``a < b`` rows.  The standard distributed enumeration: join ordered
    edges (a,b)⋈(b,c) on the middle node, then probe (a,c) — each
    triangle a<b<c is found exactly once.  Cost is Σ deg(v)² on the
    wedge join; a ``min_support`` prune upstream (see
    :func:`cooccurrence_pairs`) is the practical cap at scale.
    Returns one row: (n_edges, n_wedges, n_triangles)."""
    e = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    wedge = e.select(F.col("a"), F.col("b").alias("m")).join(
        e.select(F.col("a").alias("m"), F.col("b").alias("c")), "m"
    )
    closed = wedge.join(
        e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"]
    )
    return (
        e.agg(F.count("*").alias("n_edges"))
        .crossJoin(wedge.agg(F.count("*").alias("n_wedges")))
        .crossJoin(closed.agg(F.count("*").alias("n_triangles")))
    )


def label_propagation(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 2,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) for
    community detection: every node starts labeled with itself; each
    round it adopts the most frequent label among its neighbors
    (deterministic tiebreak: count desc, then min label).  ``edges``
    must contain BOTH directions of each undirected edge.

    Per round: one edges⋈labels join shuffled on the source key plus
    one partial-agg (dst, label) count and a per-dst WindowGroupLimit
    argmax — |E|-bounded work, the same iterative-join scale shape as
    :func:`pagerank`.  Fixed small round counts are built
    declaratively (plan chaining); long runs would checkpoint per
    round like ``connected_components``.  Returns (node, label)."""
    from pyspark.sql import Window

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    labels = (
        e.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("c"), "label")
    for _ in range(rounds):
        votes = (
            e.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            votes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
    return labels


def bfs_distances(
    edges: DataFrame,
    source: DataFrame,
    *,
    src_col: str = "a",
    dst_col: str = "b",
    max_hops: int = 4,
) -> DataFrame:
    """Breadth-first shortest-path distances from ``source`` nodes over
    an (a, b) DIRECTED edge list (symmetrize first for undirected),
    bounded at ``max_hops``.  Returns (node, dist).

    The Pregel-lite frontier shape: each hop is one equi-join of the
    CURRENT frontier against the edge list plus an anti-join against
    the visited set — so per-hop cost is |frontier| x avg-degree, never
    the path-count explosion a naive unioned expansion produces (paths
    multiply exponentially; first-visit pruning keeps every node at
    most once).  At cluster scale, pre-partition ``edges`` by
    ``src_col`` so every hop's join reuses one co-located
    partitioning — the same discipline as pagerank_scores above.
    Iteration count is driver-held (max_hops), data never collects.
    """
    dist = source.select(
        F.col(source.columns[0]).alias("node"), F.lit(0).alias("dist")
    ).distinct()
    # iterative lineage discipline: each round's frontier is persisted
    # (and the previous one released) so round k never re-executes
    # rounds 1..k-1's joins — without this the recomputation is
    # quadratic in hop count; a long-running traversal would
    # localCheckpoint per round exactly like the pagerank note above
    frontier = dist.select("node").persist()
    # the edge list is joined on EVERY hop — callers often pass a
    # derived frame (e.g. a basket self-join), and without this pin
    # each hop re-executes that whole derivation (measured 20 → 6 s on
    # the co-purchase graph at sf0.01); released with the other pins.
    # (r17 probe, rejected: pinning the CALLER'S frame and force-
    # materializing it with an up-front count() so the source branch
    # also reads the cache measured SLOWER here — 4.6 s vs 3.6 s —
    # because the local box overlaps the branches' duplicated
    # derivation on idle cores, while the eager build serializes it.)
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).persist()
    pinned = [frontier, e]

    def _expand(fr: DataFrame, seen: DataFrame) -> DataFrame:
        """One BFS hop: frontier's unvisited out-neighbors."""
        return (
            fr.join(e, fr.node == e._s)
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(seen.select("node"), "node", "left_anti")
        )

    # TWO propagation hops per materialized round (r17, the same
    # batching connected_components uses): rounds are cheap in DATA
    # (frontiers are one row per node) but expensive in JOBS — each
    # materialization is a full scheduler round trip plus an action.
    # Both hops' frontiers land in ONE persisted frame tagged by hop
    # number; the per-hop counts come back from a single groupBy
    # collect (replacing one take(1) job per hop), which doubles as
    # the early-exit check.  First-visit semantics are untouched: hop
    # B excludes dist AND hop A's frontier, so every node still gets
    # the hop number of its first visit.
    hop = 1
    while hop <= max_hops:
        fresh_a = _expand(frontier, dist).persist()
        pinned.append(fresh_a)
        batch = fresh_a.select("node", F.lit(hop).alias("dist"))
        if hop + 1 <= max_hops:
            fresh_b = _expand(fresh_a, dist).join(
                fresh_a, "node", "left_anti"
            )
            batch = batch.union(
                fresh_b.select("node", F.lit(hop + 1).alias("dist"))
            )
        batch = batch.persist()
        pinned.append(batch)
        counts = {
            r["dist"]: r["n"]
            for r in batch.groupBy("dist").agg(F.count("*").alias("n")).collect()
        }  # ONE job materializes both hops
        if not counts.get(hop):
            break  # hop A empty ⇒ hop B empty by construction
        dist = dist.union(batch)
        if hop + 1 > max_hops or not counts.get(hop + 1):
            break  # traversal exhausted (no hop-B frontier) or budget
        frontier = batch.filter(F.col("dist") == hop + 1).select("node")
        hop += 2
    # copy the result OFF the pinned lineage before releasing the pins:
    # localCheckpoint materializes dist into executor-local blocks that
    # the ContextCleaner reclaims when the caller drops the DataFrame —
    # unlike a bare persist()+count(), nothing stays pinned across
    # repeated calls (bench runs the query many times)
    dist = dist.localCheckpoint(eager=True)
    for df in pinned:
        df.unpersist(blocking=False)
    return dist

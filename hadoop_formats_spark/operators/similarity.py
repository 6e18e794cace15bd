"""Similarity search over embedding columns (SURVEY §2.3): brute-force
cosine top-k as the exact baseline, IVF (inverted-file) cluster-probe
as the scale path.

Scale notes: brute force is a broadcast of the (small) query set
against the full corpus — linear scan, no shuffle, fine up to ~10⁹
rows × small query sets.  IVF prunes the scan to one probed cluster
per query; the assignment step is a broadcast argmin over centroids.
Cosines are computed with Catalyst higher-order functions
(``zip_with`` + ``aggregate``) — JVM-side, no Python UDF."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scan corpus.

    Rounds similarity before ranking (ties broken by neighbor id) so
    rankings are reproducible across engines/float orders.
    Returns (query_id, neighbor_id, sim, rnk)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), round_digits).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine, ties →
    lowest centroid id).  Broadcast argmin — one pass over the corpus."""
    from pyspark.sql import Window

    c = centroids.select(
        F.col(centroid_id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )
    scored = corpus.crossJoin(F.broadcast(c)).select(
        id_col,
        vec_col,
        "centroid_id",
        F.round(cosine(F.col(vec_col), F.col("cvec")), 6).alias("csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "csim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """IVF ANN: probe only the query's nearest cluster.

    Approximate by construction (recall < 1 when true neighbors live in
    unprobed clusters) — that's the documented trade; the exactness
    oracle is ``brute_force_topk``.  Returns
    (query_id, neighbor_id, sim, rnk)."""
    from pyspark.sql import Window

    assigned = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)
    q_assigned = (
        ivf_assign(queries, centroids, id_col=id_col, vec_col=vec_col)
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col("centroid_id").alias("probe"),
        )
    )
    cand = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        "centroid_id",
    )
    scored = (
        cand.join(
            F.broadcast(q_assigned), cand.centroid_id == q_assigned.probe
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qvec"), F.col("cvec")), round_digits).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("query_id", "rnk")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold.

    At test scale this is an O(n²/2) self-join; at 100 TB you block
    first (``ivf_assign`` and join within cluster, or sign-LSH buckets)
    — see ``ann_ivf_topk`` for the blocking building block."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), round_digits).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .orderBy("id_a", "id_b")
    )

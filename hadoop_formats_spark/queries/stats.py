"""Profiling / ANALYZE-style queries: the operational layer a 100 TB
pipeline runs BEFORE planning joins and sampling — per-column stats
(the input to size estimates and null-handling decisions) and join-key
skew profiles (the input to the salting / AQE-skew-join decision that
``operators/skew.py`` implements).

The reference has no statistics machinery (its only whole-file
aggregate is the record count, src/Data/Hadoop/SequenceFile.hs:31-36);
these are north-star scale mandates, all Spark built-ins."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import register, table

# One grouped-agg pass per column, unioned: each branch is
# partial-agg friendly, and at scale the branches share the same scan
# via Spark's plan-level scan reuse (ReusedExchange on the read).  The
# alternative single-pass multi-countDistinct plans an Expand (data
# duplicated per distinct column) — strictly worse for wide profiles.
_PROFILE_COLS = ["o_orderstatus", "o_orderpriority", "o_orderdate"]


@register(
    "stats_column_profile",
    oracle="""
    SELECT * FROM (
      SELECT 'o_orderstatus' AS col_name,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
             CAST(min(o_orderstatus) AS VARCHAR) AS min_val,
             CAST(max(o_orderstatus) AS VARCHAR) AS max_val
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
             CAST(count(*) - count(o_orderpriority) AS BIGINT),
             CAST(count(DISTINCT o_orderpriority) AS BIGINT),
             CAST(min(o_orderpriority) AS VARCHAR),
             CAST(max(o_orderpriority) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
             CAST(count(*) - count(o_orderdate) AS BIGINT),
             CAST(count(DISTINCT o_orderdate) AS BIGINT),
             CAST(min(o_orderdate) AS VARCHAR),
             CAST(max(o_orderdate) AS VARCHAR)
      FROM orders
    ) ORDER BY col_name
    """,
    doc="ANALYZE-style exact per-column profile (rows, nulls, distinct, "
    "min/max as strings) for three orders columns -- the statistics "
    "input to join-size estimation and null-handling decisions.  Each "
    "column is one partial-agg friendly grouped pass; values are "
    "stringified so one schema profiles any column type.",
)
def stats_column_profile(spark: SparkSession, sf_dir: str):
    o = table(spark, sf_dir, "orders")
    outs = []
    for c in _PROFILE_COLS:
        outs.append(
            o.agg(
                F.count("*").alias("n_rows"),
                (F.count("*") - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_val"),
                F.max(c).cast("string").alias("max_val"),
            ).select(F.lit(c).alias("col_name"), "*")
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("col_name")


@register(
    "stats_join_key_skew",
    oracle="""
    WITH freq AS (
      SELECT o_custkey AS key, count(*) AS n
      FROM orders GROUP BY o_custkey
    ),
    prof AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(max(n) AS BIGINT) AS max_freq,
             CAST(sum(n) AS BIGINT) AS n_rows,
             round(max(n) * count(*) / CAST(sum(n) AS DOUBLE), 4)
               AS skew_ratio
      FROM freq
    ),
    hot AS (
      SELECT key, n FROM (
        SELECT key, n, row_number() OVER (ORDER BY n DESC, key) AS rnk
        FROM freq
      ) WHERE rnk <= 5
    )
    SELECT p.n_keys, p.max_freq, p.n_rows, p.skew_ratio,
           h.key AS hot_key, CAST(h.n AS BIGINT) AS hot_freq
    FROM prof p CROSS JOIN hot h
    ORDER BY hot_freq DESC, hot_key
    """,
    doc="Join-key skew profile for orders.o_custkey: key cardinality, "
    "max frequency, skew ratio (max_freq / mean_freq), and the 5 "
    "hottest keys -- exactly the evidence that decides between a plain "
    "shuffle join, AQE skew-split, and operators/skew.py's explicit "
    "salting.  One partial-agg groupBy + a top-5 TakeOrdered; the "
    "per-key frequency table never leaves the cluster.",
)
def stats_join_key_skew(spark: SparkSession, sf_dir: str):
    o = table(spark, sf_dir, "orders")
    freq = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    prof = freq.agg(
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_freq"),
        F.sum("n").alias("n_rows"),
        F.round(
            F.max("n") * F.count("*") / F.sum("n").cast("double"), 4
        ).alias("skew_ratio"),
    )
    hot = (
        freq.orderBy(F.desc("n"), F.asc("key"))
        .limit(5)
        .select(F.col("key").alias("hot_key"), F.col("n").alias("hot_freq"))
    )
    return (
        prof.crossJoin(hot)
        .select(
            "n_keys", "max_freq", "n_rows", "skew_ratio",
            "hot_key", "hot_freq",
        )
        .orderBy(F.desc("hot_freq"), F.asc("hot_key"))
    )

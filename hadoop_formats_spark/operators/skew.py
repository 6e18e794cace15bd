"""Skew-handling join/aggregate helpers (100 TB design notes).

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when a single key is so hot
that even split shuffle blocks overwhelm one reducer, or when the
skewed side feeds an aggregation.  The salt here is deterministic
(hash of tie-breaker columns, not rand()) so results are reproducible
and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt_cols: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the left side's hot keys are spread over
    ``buckets`` salt values and the (smaller) right side is replicated
    once per salt value.  Join key becomes (key, salt), so one hot key
    shuffles to ``buckets`` reducers instead of one.

    ``salt_cols`` are left-side columns whose hash spreads rows of the
    same key across buckets deterministically (use high-cardinality
    tie-breakers, e.g. the fact table's line number)."""
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(
            f"salted_join supports inner/left-side joins only, got {how!r}: "
            "replicating the right side would duplicate its unmatched rows "
            "under right/full outer semantics"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    l_s = left.withColumn("__salt", salt.cast("int"))
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = l_s.join(r_s, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count_by_key(
    df: DataFrame, key: str, *, salt_cols: list[str], buckets: int = 32
) -> DataFrame:
    """Two-phase aggregation for a skewed group-by key: count within
    (key, salt) partial groups, then combine per key.  Catalyst's
    partial aggregation already does this for algebraic aggregates —
    this explicit form is for pipelines where the first phase feeds
    more work (e.g. heavy per-group UDFs)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    partial = (
        df.withColumn("__salt", salt.cast("int"))
        .groupBy(key, "__salt")
        .agg(F.count("*").alias("__n"))
    )
    return partial.groupBy(key).agg(F.sum("__n").alias("n"))

"""Interval / range joins at scale.

A pure interval predicate (point BETWEEN lo AND hi, no equi key) gives
Catalyst nothing to hash on — it plans BroadcastNestedLoopJoin, which
is O(|L|·|R|) work however big the sides are.  The standard fix is
binning: quantize the value domain, equi-join on bin id, then refine
with the exact predicate.  Each point lands in exactly ONE bin and each
interval is exploded to every bin it overlaps, so every qualifying pair
meets exactly once — no dedup pass.

Scale notes: the shuffle is keyed on bin id (high cardinality if
``bin_width`` tracks interval width); interval-side replication is
``(hi-lo)/bin_width + 1`` rows per interval, so pick ``bin_width``
around the TYPICAL interval width — the classic time-series/IP-range
join recipe, and what Databricks' range-join hint does under the hood.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str | Column,
    lo_col: str | Column,
    hi_col: str | Column,
    *,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to rows of ``intervals`` where
    ``lo <= point <= hi``, as an equi-join on overlap bins + exact
    refine.  Column name collisions between the two inputs are the
    caller's problem (alias first), as with any join.

    ``how`` accepts inner and left(-outer) only.  Right/full outer
    CANNOT be bolted onto the binned rewrite: the interval side is
    exploded to one row per overlapped bin before the join, so a
    right/full join would null-extend each unmatched bin COPY — an
    interval spanning 3 bins with no matching point would come back 3
    times.  (The points side is not exploded, so left is safe.)"""
    how_norm = how.lower().replace("_", "").replace("outer", "")
    if how_norm not in ("inner", "left"):
        raise ValueError(
            "binned_interval_join supports how='inner' or 'left' only: "
            "the interval side is bin-exploded, so right/full outer "
            f"would duplicate unmatched intervals per bin (got {how!r})"
        )
    p = F.col(point_col) if isinstance(point_col, str) else point_col
    lo = F.col(lo_col) if isinstance(lo_col, str) else lo_col
    hi = F.col(hi_col) if isinstance(hi_col, str) else hi_col
    bw = F.lit(float(bin_width))
    pb = points.withColumn("_pbin", F.floor(p / bw))
    ib = intervals.withColumn(
        "_ibin", F.explode(F.sequence(F.floor(lo / bw), F.floor(hi / bw)))
    )
    # The exact-refine predicate lives INSIDE the join condition (not a
    # post-join filter): for left joins a post-join filter would drop
    # the null-extended rows and silently degrade to inner semantics.
    cond = (pb["_pbin"] == ib["_ibin"]) & (p >= lo) & (p <= hi)
    return pb.join(ib, cond, how).drop("_pbin", "_ibin")

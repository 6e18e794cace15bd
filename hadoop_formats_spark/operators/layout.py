"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for scan pruning, the technique behind Delta/Iceberg ``ZORDER BY``
expressed as plain Catalyst arithmetic.

Why it matters at 100 TB: a table range-partitioned on ONE key prunes
scans on that key only — a filter on any other clustered-out column
reads every file.  Interleaving the bits of k rank-coded columns into
one Morton key and range-partitioning on THAT gives every file a
bounding box that is narrow in ALL k dimensions (~n^(1/k) of each
domain for balanced data), so min/max file statistics prune scans on
any clustered column.  Everything here is deterministic integer
arithmetic (no sampling), bit-reproducible in SQL, and map-only —
the only shuffle a real rewrite pays is the final
``repartitionByRange`` on the Morton key."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rank_code(col: Column, lo: Column, hi: Column, *, bits: int) -> Column:
    """Monotone map of ``col`` from [lo, hi] onto the ``bits``-bit
    integer grid: floor((x - lo) * 2^bits / (hi - lo + 1)).  Plain
    integer-in, integer-out arithmetic — identical in every SQL
    engine (the double intermediate is exact below 2^53)."""
    span = hi - lo + F.lit(1)
    return F.floor((col - lo) * F.lit(1 << bits) / span).cast("bigint")


def zorder_key(codes: list[Column], *, bits: int) -> Column:
    """Morton interleave of k ``bits``-bit codes (first column gets
    the most significant bit at each level).  bits·k shift/mask terms
    — all Catalyst built-ins inside whole-stage codegen."""
    k = len(codes)
    terms: list[Column] = []
    for i in range(bits):  # i = 0 is the most significant bit
        for j, c in enumerate(codes):  # column order = significance
            out_pos = (bits - 1 - i) * k + (k - 1 - j)
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("bigint"), bits - 1 - i)
                    .bitwiseAND(F.lit(1)),
                    out_pos,
                )
            )
    return reduce(lambda a, b: a + b, terms)


def zorder_code2(
    df: DataFrame,
    *,
    x_col: str,
    y_col: str,
    bits: int = 8,
) -> DataFrame:
    """Attach rank codes (``_cx``, ``_cy``) and the Morton key
    (``zkey``) for two columns.  The min/max needed for rank coding
    come from a one-row aggregate broadcast-cross-joined back in —
    fully declarative, no driver collect."""
    bounds = df.agg(
        F.min(x_col).alias("_xlo"),
        F.max(x_col).alias("_xhi"),
        F.min(y_col).alias("_ylo"),
        F.max(y_col).alias("_yhi"),
    )
    coded = df.crossJoin(F.broadcast(bounds))
    return (
        coded.withColumn(
            "_cx",
            rank_code(F.col(x_col), F.col("_xlo"), F.col("_xhi"), bits=bits),
        )
        .withColumn(
            "_cy",
            rank_code(F.col(y_col), F.col("_ylo"), F.col("_yhi"), bits=bits),
        )
        .withColumn(
            "zkey", zorder_key([F.col("_cx"), F.col("_cy")], bits=bits)
        )
    )

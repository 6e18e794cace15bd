"""Count-Min sketch over a token stream — the mergeable frequency
sketch for heavy-hitter queries at corpus scale.

Design (Cormode & Muthukrishnan 2005): ``h`` hash rows × ``w``
buckets; every occurrence increments one bucket per row; a point
estimate is the MIN over rows of its buckets — always ≥ the true
count (collisions only ADD), within εN with high probability for
w = ⌈e/ε⌉.  The sketch here is exactly the distributed shape that
matters at 100 TB: building it is ONE partial-agg groupBy over the
exploded token stream producing at most h·w rows (map-side combine
does almost all the work), the finished sketch is a few KB that
merges across corpora by cell-wise addition, and estimates never
touch the corpus again.

Hashes are md5-slice based (salted ``cm{i}:``), so the sketch is
deterministic and bit-reproducible in SQL — no seed state, same
convention as the MinHash/SimHash family."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_bucket(token: Column, row: int, width: int) -> Column:
    """Bucket of ``token`` in hash row ``row``: first 8 md5 hex chars
    of the salted token, mod width."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"cm{row}:"), token)), 1, 8), 16, 10)
        .cast("bigint")
        % width
    )


def count_min_sketch(
    tokens: DataFrame,
    *,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """(row, bucket, c) sketch cells from a one-column token stream
    (one input row per token OCCURRENCE).  ≤ depth·width output rows;
    the groupBy partial-aggregates map-side, so each task emits at
    most one partial per touched cell regardless of corpus size."""
    t = F.col(token_col)
    cells = tokens.select(
        F.posexplode(
            F.array(*[cm_bucket(t, i, width) for i in range(depth)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("c"))


def cm_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    *,
    token_col: str = "tok",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point estimates for candidate tokens: min over the token's
    ``depth`` cells.  The sketch side is tiny (≤ depth·width rows) and
    broadcasts; candidates never shuffle."""
    t = F.col(token_col)
    probes = candidates.select(
        token_col,
        F.posexplode(
            F.array(*[cm_bucket(t, i, width) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(token_col)
        .agg(F.min("c").alias("cm_est"))
    )

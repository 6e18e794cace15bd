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
    broadcasts; candidates never shuffle.

    LEFT join + coalesce-to-0: a sketch only materializes cells that
    were ever incremented, so a probe hashing to an absent cell has a
    true cell count of 0 — an inner join would drop that cell from the
    min (overestimating) and drop all-absent tokens from the output
    entirely, instead of returning the correct Count-Min estimate 0
    (ADVICE r4)."""
    t = F.col(token_col)
    probes = candidates.select(
        token_col,
        F.posexplode(
            F.array(*[cm_bucket(t, i, width) for i in range(depth)])
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cm_est"))
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch
# ---------------------------------------------------------------------------


def hll_sketch(
    items: DataFrame,
    *,
    group_col: str = "grp",
    item_col: str = "item",
    p: int = 10,
    salt: str = "hll:",
) -> DataFrame:
    """Per-group HyperLogLog registers (Flajolet et al. 2007): rows
    ``(group, register, maxrank)``, ≤ 2^p per group regardless of
    corpus size.

    Hashing is the family convention (salted md5, here the first 15
    hex chars → 60 deterministic bits): low ``p`` bits pick the
    register, and the rank is the position of the first 1-bit in the
    remaining ``60-p`` bits (computed exactly as ``61-p - bitlength``
    via ``bin()`` — integer logic, no float log).  The groupBy
    partial-aggregates map-side, so each task emits at most 2^p rows
    per group; sketches MERGE by unioning register rows and re-taking
    the max — the same one-function condense-and-merge shape as
    :func:`kmv_sketch`."""
    m = 1 << p
    width = 60 - p  # bits left after the register index
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(item_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    rem = F.shiftright(h, p)
    rank = F.when(rem == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(rem))
    )
    return (
        items.select(
            F.col(group_col),
            (h % m).alias("register"),
            rank.alias("rank"),
        )
        .groupBy(group_col, "register")
        .agg(F.max("rank").alias("maxrank"))
    )


def hll_estimate(
    sketch: DataFrame,
    *,
    group_col: str = "grp",
    p: int = 10,
    est_col: str = "hll_est",
) -> DataFrame:
    """Distinct-count estimate per group from HLL registers.

    The harmonic-mean denominator is computed as ONE exact integer sum
    — each register contributes ``2^(width+1-maxrank)`` (an integer,
    since ranks are ≤ width+1) and absent registers contribute
    ``2^(width+1)`` — then converted to double once.  That keeps the
    estimate bit-reproducible under any aggregation order (a float
    ``sum(2^-rank)`` is order-sensitive in the last ulp), which is what
    lets a DuckDB oracle replay it exactly.  Standard small-range
    correction: linear counting ``m·ln(m/V)`` when the raw estimate is
    ≤ 2.5m and V (= empty registers) > 0."""
    m = 1 << p
    width = 60 - p
    alpha = 0.7213 / (1 + 1.079 / m)
    scale = 2 ** (width + 1)
    agg = sketch.groupBy(group_col).agg(
        F.sum(
            F.pow(F.lit(2.0), F.lit(width + 1) - F.col("maxrank")).cast("bigint")
        ).alias("zint"),
        F.count("*").alias("n_present"),
    )
    total_int = F.col("zint") + (F.lit(m) - F.col("n_present")) * F.lit(scale)
    z = total_int.cast("double") / F.lit(float(scale))
    v = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(group_col, est.alias(est_col))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------


def kmv_hash(item: Column, *, salt: str = "kmv:") -> Column:
    """32-bit item hash: first 8 md5 hex chars of the salted item —
    uniform on [0, 2^32), deterministic, bit-reproducible in SQL (the
    same convention the Count-Min / MinHash family uses)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), item)), 1, 8), 16, 10
    ).cast("bigint")


def kmv_sketch(
    items: DataFrame,
    *,
    group_col: str = "grp",
    hash_col: str = "h",
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch (Bar-Yossef et al. 2002): the ``k``
    smallest DISTINCT hashes of the group's items — rows
    ``(group, h)``, ≤ k per group.

    ``items`` carries a precomputed hash column (see :func:`kmv_hash`)
    so the same function condenses raw items AND merges finished
    sketches: the k smallest of a union of per-corpus k-smallest sets
    is exactly the k smallest of the union, so merging = union the
    sketch rows and re-apply.  Scale shape: the distinct step is a
    partial-aggregating groupBy (map-side combine collapses repeats
    before the shuffle) and the top-k is ``row_number() <= k``, which
    Spark ≥ 3.5 executes with a map-side WindowGroupLimit heap — each
    task forwards at most k rows per group, so a 100 TB corpus emits a
    few-KB sketch without any corpus-sized sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(hash_col)
    return (
        items.select(group_col, hash_col)
        .distinct()
        .withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= k)
        .select(group_col, hash_col)
    )


def kmv_estimate(
    sketch: DataFrame,
    *,
    group_col: str = "grp",
    hash_col: str = "h",
    k: int = 64,
    est_col: str = "kmv_est",
    stats: bool = False,
) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: with fewer
    than k hashes the sketch IS the distinct set (exact count);
    otherwise the unbiased estimator (k-1)/U(k) where U(k) is the kth
    smallest hash normalized to (0,1) — here (k-1)·2^32 / max(h).
    Touches only the sketch (≤ k rows/group); the corpus is never
    rescanned.  ``stats=True`` additionally returns the sketch size
    ``n`` and kth hash ``mx`` (e.g. to prove two sketches identical)."""
    aggs = [
        F.when(F.count("*") < k, F.count("*").cast("double"))
        .otherwise(F.lit(float(k - 1) * 4294967296.0) / F.max(hash_col))
        .alias(est_col)
    ]
    if stats:
        aggs += [F.count("*").alias("n"), F.max(hash_col).alias("mx")]
    return sketch.groupBy(group_col).agg(*aggs)


def kmv_jaccard(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    group_col: str = "grp",
    hash_col: str = "h",
    k: int = 64,
) -> DataFrame:
    """Jaccard + intersection estimation from two KMV sketches (Beyer
    et al. 2007, "On synopses for distinct value estimation under
    multiset operations"): build the union sketch U_k = k smallest of
    ``KMV(A) ∪ KMV(B)`` (the same re-take-k closure the union
    estimator uses), then

    * ``jaccard_est`` = |{h ∈ U_k : h ∈ KMV(A) ∧ h ∈ KMV(B)}| / |U_k|
      — membership of a U_k element against the per-side SKETCH is
      exact, because h ∈ B and h ≤ union's kth-min ≤ B's kth-min
      implies h is among B's k smallest;
    * ``union_est`` = the standard (k-1)·2^32/max(h) KMV estimate of
      |A ∪ B| (exact count when the union sketch is under-full);
    * ``intersect_est`` = jaccard_est · union_est.

    Scale shape: the inputs are the two ≤k-row sketches — the corpus
    is never rescanned and never pairs; set-overlap questions between
    100 TB corpora are answered from two few-KB summaries.
    """
    u = kmv_sketch(
        sketch_a.select(group_col, hash_col).union(
            sketch_b.select(group_col, hash_col)
        ),
        group_col=group_col,
        hash_col=hash_col,
        k=k,
    )
    flagged = u.join(
        sketch_a.select(group_col, hash_col, F.lit(1).alias("in_a")),
        [group_col, hash_col],
        "left",
    ).join(
        sketch_b.select(group_col, hash_col, F.lit(1).alias("in_b")),
        [group_col, hash_col],
        "left",
    )
    agg = flagged.groupBy(group_col).agg(
        F.count("*").alias("n_u"),
        F.max(hash_col).alias("mx"),
        F.sum(
            F.coalesce(F.col("in_a"), F.lit(0))
            * F.coalesce(F.col("in_b"), F.lit(0))
        ).alias("n_both"),
    )
    union_est = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(F.lit(float(k - 1) * 4294967296.0) / F.col("mx"))
    return agg.select(
        group_col,
        (F.col("n_both") / F.col("n_u")).alias("jaccard_est"),
        union_est.alias("union_est"),
        ((F.col("n_both") / F.col("n_u")) * union_est).alias(
            "intersect_est"
        ),
    )

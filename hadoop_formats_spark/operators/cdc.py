"""CDC / slowly-changing-dimension maintenance — the lakehouse MERGE
pattern expressed as plain DataFrame algebra (no table-format
dependency): given a type-2 dimension (one OPEN row per key plus
closed history) and a batch of changes, produce the next dimension
version — close changed rows, insert new versions, add new keys,
pass history through untouched.

Scale shape: the merge is ONE full-outer join between the dimension's
open rows and the (pre-deduplicated, one-row-per-key) change batch,
keyed on the business key — closed history never joins, it unions
straight through.  On a 100 TB dimension the open-rows side is the
entity count (not the history count), the change batch is typically
the small side (broadcastable via the ``broadcast_changes`` flag),
and the output is written partitioned by the same key for the next
merge to co-locate.  Everything is deterministic: latest-change
selection tiebreaks on an explicit column, so replayed batches
produce byte-identical dimensions (retry-stable, like the streaming
band registry)."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_init(
    snapshot: DataFrame,
    *,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Initial-load a type-2 dimension from a one-row-per-key
    snapshot: every row opens at its own timestamp."""
    return snapshot.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(snapshot.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def latest_per_key(
    changes: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a change batch to its last change per key —
    ``max_by`` over (ts, tiebreak), a single partial-aggregating
    groupBy (no window, no sort of the batch)."""
    others = [c for c in changes.columns if c != key_col]
    ordk = F.struct(F.col(ts_col), F.col(tiebreak_col))
    picked = changes.groupBy(key_col).agg(
        *[F.max_by(c, ordk).alias(c) for c in others]
    )
    return picked.select(*changes.columns)


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    *,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    broadcast_changes: bool = False,
) -> DataFrame:
    """Next version of a type-2 dimension after applying ``changes``
    (one row per key — see :func:`latest_per_key`).

    Per key: no change row → open row unchanged; change with
    identical attributes → no-op; change with different attributes →
    the open row closes at the change timestamp and a new open row
    begins there; key not in the dimension → new open row.  Closed
    history rows union through without joining."""
    open_rows = dim.filter(F.col("is_current"))
    closed_rows = dim.filter(~F.col("is_current"))

    ch = changes.select(
        F.col(key_col).alias("_k"),
        *[F.col(c).alias(f"_c_{c}") for c in attr_cols],
        F.col(ts_col).alias("_ts"),
    )
    if broadcast_changes:
        ch = F.broadcast(ch)

    j = open_rows.join(ch, open_rows[key_col] == ch["_k"], "full_outer")

    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_c_{c}")) for c in attr_cols],
    )
    has_change = F.col("_k").isNotNull()
    has_open = F.col(key_col).isNotNull()
    differs = has_change & has_open & ~same

    # surviving / closed versions of pre-existing open rows
    kept = j.filter(has_open).select(
        key_col,
        *attr_cols,
        F.col("valid_from"),
        F.when(differs, F.col("_ts")).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
        (~differs).alias("is_current"),
    )
    # new open rows: brand-new keys, or new versions after a change
    inserts = j.filter(has_change & (~has_open | ~same)).select(
        F.col("_k").alias(key_col),
        *[F.col(f"_c_{c}").alias(c) for c in attr_cols],
        F.col("_ts").alias("valid_from"),
        F.lit(None).cast(dim.schema["valid_to"].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed_rows.unionByName(kept).unionByName(inserts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-feed between two table versions: (keys...,
    change_type ∈ added | removed | changed) — unchanged rows are
    dropped inside the join, never materialized (at 100 TB the diff
    output is delta-sized, not table-sized).

    One full-outer join on the key; row equality is an md5 over the
    compare columns computed map-side on each side, so the shuffle
    carries (keys, 32-byte hash), not the full rows — diffing wide
    tables costs the same as narrow ones.  Each field is
    length-prefixed (and NULL gets its own tag), making the encoding
    injective: no concatenation of values — whatever bytes they
    contain — can collide with a different row."""
    def hashed(df: DataFrame, alias: str) -> DataFrame:
        cols = [
            F.when(F.col(c).isNull(), F.lit("n"))
            .otherwise(
                F.concat(
                    F.length(F.col(c).cast("string")).cast("string"),
                    F.lit(":"),
                    F.col(c).cast("string"),
                )
            )
            .alias(c)
            for c in compare_cols
        ]
        return df.select(
            *[F.col(k) for k in key_cols],
            F.md5(F.concat_ws("|", *cols)).alias(alias),
        )

    o = hashed(old, "_oh")
    n = hashed(new, "_nh")
    j = o.join(n, key_cols, "full_outer")
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("_oh").isNull(), F.lit("added"))
            .when(F.col("_nh").isNull(), F.lit("removed"))
            .when(F.col("_oh") != F.col("_nh"), F.lit("changed")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(*key_cols, "change_type")
    )


def point_in_time_enrich(
    dim: DataFrame,
    facts: DataFrame,
    *,
    key_col: str,
    valid_from_col: str,
    fact_ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks up the
    SCD2 dimension version valid at its timestamp — the lookup every
    star-schema query against a type-2 dimension runs.

    Expressed WITHOUT a range join: SCD2 validity intervals are
    gap-free per key (each version runs from its ``valid_from`` to the
    next version's), so "the version valid at ts" == "the last version
    opened at-or-before ts".  That makes the temporal join an as-of
    join: union dimension-open events with facts, one window per key
    ordered by (ts, is_fact) — dimension rows sort first at equal
    timestamps, giving inclusive ``valid_from <= ts`` semantics — and
    ``last(ignorenulls)`` carries each version's attributes forward
    onto the facts that fall inside it.

    The carried value is ONE struct of all ``attr_cols`` per dimension
    row — never the attributes individually.  ``struct(...)`` is
    non-null for every dimension row even when individual attribute
    values are NULL, so "this version's attribute is legitimately
    NULL" stays distinguishable from "no version opened yet": facts
    inside a NULL-valued version see that NULL, not the previous
    version's value (ADVICE r6 #2; per-attribute ``last(attr,
    ignorenulls)`` would skip the NULL and leak the older value).

    Scale shape: ONE shuffle on the dimension key for the union'd
    stream (versions + facts), no interval binning, no
    BroadcastNestedLoopJoin, and no dimension blow-up — on 100 TB of
    facts the cost is the same as any keyed window.  Facts before the
    key's first version get NULL attributes (the LEFT-join semantics
    of the definitional BETWEEN form).
    """
    from pyspark.sql import types as T

    fact_cols = [c for c in facts.columns if c not in (key_col, fact_ts_col)]
    dim_struct_t = T.StructType([dim.schema[a] for a in attr_cols])
    dim_u = dim.select(
        F.col(key_col),
        F.col(valid_from_col).alias("_ts"),
        F.lit(0).alias("_is_fact"),
        # one NON-NULL struct per dim row: NULL attr values representable
        F.struct(*[F.col(a) for a in attr_cols]).alias("_dim"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_cols],
    )
    fact_u = facts.select(
        F.col(key_col),
        F.col(fact_ts_col).alias("_ts"),
        F.lit(1).alias("_is_fact"),
        F.lit(None).cast(dim_struct_t).alias("_dim"),
        *[F.col(c) for c in fact_cols],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("_ts", "_is_fact")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    enriched = dim_u.unionByName(fact_u).withColumn(
        "_dim", F.last("_dim", ignorenulls=True).over(w)
    )
    return enriched.filter(F.col("_is_fact") == 1).select(
        key_col,
        F.col("_ts").alias(fact_ts_col),
        *fact_cols,
        *[F.col("_dim")[a].alias(a) for a in attr_cols],
    )

"""Bloom-filter semi-join reduction — prune the probe side of a join
MAP-SIDE, before its shuffle, using a few-KB Bloom filter built from
the (already-filtered) build side's keys.

This is the classic distributed-join optimization (Bloom 1970; its
semi-join use goes back to Bernstein & Chiu 1981 and is what Spark's
own runtime row-level filtering implements natively): when the build
side is selective, most probe rows will not find a match — shuffling
them is pure waste.  A Bloom filter has NO false negatives, so the
pruned join is semantically identical to the plain join (the DuckDB
oracle for the registered query IS the plain join), while false
positives only cost some un-pruned rows.

Everything is Catalyst expressions (deterministic ``xxhash64(key, i)
mod m`` positions — codegen'd long hashes, no seeded RNG; NULL keys
are gated with ``when(isNotNull)`` because xxhash64 maps NULL to the
seed hash):

* build: k bucket positions per non-NULL key → positions packed into
  ``m/64`` 64-bit words via ``bit_or`` partial aggregation → ONE row
  holding a dense ``array<long>`` bitmap (built with
  ``map_from_entries`` + a ``sequence`` ramp, no UDF);
* probe: broadcast the 1-row bitmap, test each key's k positions with
  ``element_at(words, pos/64 + 1) >> (pos%64) & 1`` — O(1) per probe
  regardless of m, pure whole-stage-codegen arithmetic; NULL-key
  probe rows bypass the test and are kept.

100 TB shape: the bitmap build is a partial-agg groupBy over ≤ m/64
distinct words (a few KB leave each task); the probe is a map-side
filter fused into the scan stage, so the downstream shuffle moves
only rows that (probably) join.  The reference has no joins at all —
this belongs to the mandated relational extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, k: int, m: int) -> list[Column]:
    """k deterministic bucket positions in [0, m) for ``key``:
    ``xxhash64(key, i)`` mod m.

    r16: was salted-md5 slices — at ~0.5µs per md5+conv the probe cost
    3 interpreted hashes per PROBE row, which dominated the operator
    (2.8s for 600k lineitem rows at sf0.1).  xxhash64 is a codegen'd
    long hash (~20ns); the filter's false-positive SET changes but the
    Bloom contract (no false negatives) is hash-family-independent, so
    the pruned join's RESULT is bit-identical — which is exactly what
    the oracle (the plain join) checks.  NULL keys must stay NULL
    (xxhash64 hashes NULL to the seed hash, silently un-NULLing the
    bit test and breaking the keep-NULL-rows contract), hence the
    explicit gate."""
    return [
        F.when(
            key.isNotNull(),
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)),
        )
        for i in range(k)
    ]


def bloom_build(
    build: DataFrame, key_col: str, *, m: int = 8192, k: int = 3
) -> DataFrame:
    """ONE-row DataFrame ``(bloom_words: array<long>)`` — the packed
    m-bit Bloom bitmap of ``build[key_col]``.  Partial-agg shape: the
    per-word ``bit_or`` combines map-side, so at most m/64 rows reach
    the final reduce regardless of build-side size.

    NULL build-side keys are dropped before hashing (ADVICE r16): the
    position gate maps them to NULL positions, which would reach
    ``map_from_entries`` as a NULL map key and crash the build at
    runtime.  NULL never equi-joins, so omitting them from the bitmap
    cannot remove a matching probe row — the no-false-negatives
    guarantee is untouched (and NULL probe rows are kept by
    :func:`bloom_probe_filter` regardless)."""
    key = F.col(key_col).cast("string")
    pos = F.explode(F.array(*_positions(key, k, m))).alias("pos")
    words = (
        build.filter(F.col(key_col).isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            # pyspark's shiftleft() wants a literal shift amount; the
            # per-row shift needs the SQL form
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    n_words = (m + 63) // 64
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("bits")))
        ).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("wm"), i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("bloom_words")
    )


def bloom_probe_filter(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    m: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Filter ``probe`` to rows whose key passes the Bloom test —
    a map-side prune with no false negatives.  ``bloom`` is the 1-row
    output of :func:`bloom_build`; it is broadcast, so the prune adds
    no shuffle.

    NULL-key rows are KEPT (the position gate yields NULL for a NULL
    key — xxhash64 would otherwise hash it to the seed — so the bit
    test is indeterminate, and the contract is "only remove rows that
    CANNOT match": a caller feeding the pruned side into an outer join
    or null-safe join must still see them; ADVICE r6 #3).  NULL never
    equi-joins, so for plain inner-join pruning the kept rows are
    harmless; pre-filter ``key IS NOT NULL`` yourself when you want
    them gone too."""
    out = probe.crossJoin(F.broadcast(bloom))
    key = F.col(key_col).cast("string")
    for i, p in enumerate(_positions(key, k, m)):
        out = out.withColumn(f"_bjp{i}", p)
    # & 1, not % 2: shiftright is ARITHMETIC (sign-extending), so a
    # word with bit 63 set shifts to a negative value and Java-style %
    # would yield -1; & extracts the low bit regardless of sign.  The
    # SQL form is used because pyspark's shiftright() only accepts a
    # literal shift amount.
    cond = F.lit(True)
    for i in range(k):
        cond = cond & (
            F.expr(
                f"shiftright(element_at(bloom_words,"
                f" CAST(_bjp{i} / 64 AS INT) + 1),"
                f" CAST(_bjp{i} % 64 AS INT)) & CAST(1 AS BIGINT)"
            )
            == 1
        )
    cond = cond | F.col(key_col).isNull()  # indeterminate ≠ removable
    return out.filter(cond).drop(
        "bloom_words", *[f"_bjp{i}" for i in range(k)]
    )

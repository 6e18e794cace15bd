"""Property-based tests (hypothesis) for the round-4 operators:
each property pins the distributed implementation against a tiny
pure-Python reference simulator on randomized inputs — the same
discipline the Writable round-trip properties apply to the format
layer.

Spark runs per example are expensive, so example counts are small but
the generators aim at the interesting regions (ties, merges that
no-op, re-keys, overlapping pairs)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# SCD2 merge chain vs a Python simulator
# ---------------------------------------------------------------------------

_TIERS = ["a", "b", "c"]

change_batches = st.lists(  # 1-4 batches of (key, tier) changes
    st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(_TIERS)),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


def _py_scd2(batches):
    """Reference SCD2: batches arrive in order; within a batch the
    LAST change per key wins (ties by position = eid)."""
    t0 = datetime.datetime(2024, 1, 1)
    history = []  # closed rows
    open_rows = {}  # key -> (tier, valid_from)
    for bi, batch in enumerate(batches):
        ts = t0 + datetime.timedelta(days=bi)
        latest = {}
        for k, tier in batch:  # later position wins
            latest[k] = tier
        for k, tier in latest.items():
            if k not in open_rows:
                open_rows[k] = (tier, ts)
            elif open_rows[k][0] != tier:
                old_tier, old_from = open_rows.pop(k)
                history.append((k, old_tier, old_from, ts, False))
                open_rows[k] = (tier, ts)
    return sorted(
        history
        + [(k, t, f, None, True) for k, (t, f) in open_rows.items()]
    )


@given(batches=change_batches)
@settings(**SETTINGS)
def test_scd2_merge_chain_matches_python_reference(spark, batches):
    from hadoop_formats_spark.operators import cdc as C

    t0 = datetime.datetime(2024, 1, 1)
    schema = "k bigint, tier string, ts timestamp, eid bigint"

    def latest(rows):
        df = spark.createDataFrame(rows, schema)
        return C.latest_per_key(
            df, key_col="k", ts_col="ts", tiebreak_col="eid"
        ).select("k", "tier", "ts")

    def batch_rows(bi, batch):
        ts = t0 + datetime.timedelta(days=bi)
        return [(k, tier, ts, eid) for eid, (k, tier) in enumerate(batch)]

    dim = C.scd2_init(
        latest(batch_rows(0, batches[0])),
        key_col="k",
        attr_cols=["tier"],
        ts_col="ts",
    )
    for bi, batch in enumerate(batches[1:], start=1):
        dim = C.scd2_merge(
            dim,
            latest(batch_rows(bi, batch)),
            key_col="k",
            attr_cols=["tier"],
            ts_col="ts",
        )
    got = sorted(
        (r.k, r.tier, r.valid_from, r.valid_to, r.is_current)
        for r in dim.collect()
    )
    assert got == _py_scd2(batches)


# ---------------------------------------------------------------------------
# Z-order key: bijective on the grid, order-embeds box containment
# ---------------------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_zorder_key_bijective_and_reversible(spark, pts):
    from hadoop_formats_spark.operators.layout import zorder_key

    df = spark.createDataFrame(pts, "cx int, cy int")
    rows = df.withColumn(
        "z", zorder_key([F.col("cx"), F.col("cy")], bits=8)
    ).collect()
    seen = {}
    for r in rows:
        # bijective: distinct (cx, cy) -> distinct z
        assert r.z not in seen or seen[r.z] == (r.cx, r.cy)
        seen[r.z] = (r.cx, r.cy)
        # reversible: de-interleaving the bits recovers the inputs
        cx = cy = 0
        for m in range(8):
            cx |= ((r.z >> (2 * m + 1)) & 1) << m
            cy |= ((r.z >> (2 * m)) & 1) << m
        assert (cx, cy) == (r.cx, r.cy)


# ---------------------------------------------------------------------------
# BPE greedy fold vs a Python reference
# ---------------------------------------------------------------------------


def _py_greedy_merge(syms, a, b):
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@given(
    word=st.text(alphabet="ab", min_size=1, max_size=12),
    pair=st.tuples(st.sampled_from("ab"), st.sampled_from("ab")),
)
@settings(**SETTINGS)
def test_bpe_merge_fold_matches_python_reference(spark, word, pair):
    from hadoop_formats_spark.operators import bpe as B

    a, b = pair
    df = spark.createDataFrame([(word,)], "w string")
    syms = F.array_join(F.array_remove(F.split(F.col("w"), ""), ""), B.SEP)
    got = (
        df.select(B.merge_fold(syms, F.lit(a), F.lit(b)).alias("m"))
        .first()
        .m.split(B.SEP)
    )
    assert got == _py_greedy_merge(list(word), a, b)


# ---------------------------------------------------------------------------
# Bloom semi-join reduction: no false negatives, ever
# ---------------------------------------------------------------------------


@given(
    build_keys=st.sets(st.integers(0, 10_000), min_size=1, max_size=40),
    extra=st.sets(st.integers(10_001, 20_000), max_size=60),
)
@settings(**SETTINGS)
def test_bloom_never_drops_build_keys(spark, build_keys, extra):
    """For ANY build set and probe superset, every probe row whose key
    is in the build set survives the bloom prune (the contract that
    makes the plain join a valid oracle for the pruned join)."""
    from hadoop_formats_spark.operators.bloomjoin import (
        bloom_build,
        bloom_probe_filter,
    )

    build = spark.createDataFrame([(k,) for k in build_keys], "k long")
    probe_keys = sorted(build_keys | extra)
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    bloom = bloom_build(build, "k", m=2048, k=3)
    kept = {
        r.k for r in bloom_probe_filter(probe, "k", bloom, m=2048, k=3).collect()
    }
    assert build_keys <= kept


# ---------------------------------------------------------------------------
# Containment vs Jaccard invariants
# ---------------------------------------------------------------------------

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=12),
        min_size=2,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_containment_bounds_and_identity(spark, docs):
    """containment >= jaccard for every reported pair (min(|A|,|B|) <=
    |A∪B|), both in (0, 1], and a doc paired with an exact copy of
    itself reports containment 1.0."""
    from hadoop_formats_spark.operators.dedup import shingle_containment_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    rows.append((len(rows), rows[0][1]))  # exact copy of doc 0
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = shingle_containment_pairs(d, threshold=0.0).collect()
    by_pair = {(r.doc_a, r.doc_b): r for r in got}
    for r in got:
        assert 0 < r.jaccard <= r.containment <= 1.0
    dup = by_pair.get((0, len(rows) - 1))
    assert dup is not None and dup.containment == 1.0 and dup.jaccard == 1.0

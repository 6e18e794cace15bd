"""SCD type-2 merge (operators/cdc.py): every classification case on a
hand-built dimension, plus determinism of latest-change selection."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from hadoop_formats_spark.operators import cdc as C


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _dim(spark):
    # key 1: open gold row with one closed predecessor
    # key 2: open silver row
    # key 3: open bronze row
    rows = [
        (1, "lead", _ts("2024-01-01"), _ts("2024-02-01"), False),
        (1, "gold", _ts("2024-02-01"), None, True),
        (2, "silver", _ts("2024-01-05"), None, True),
        (3, "bronze", _ts("2024-01-07"), None, True),
    ]
    return spark.createDataFrame(
        rows, "k bigint, tier string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def test_scd2_merge_all_cases(spark):
    dim = _dim(spark)
    # key 1: changed attrs -> close + insert; key 2: identical -> no-op;
    # key 3: absent from batch -> untouched; key 4: brand new -> insert
    changes = spark.createDataFrame(
        [
            (1, "platinum", _ts("2024-03-01")),
            (2, "silver", _ts("2024-03-02")),
            (4, "lead", _ts("2024-03-03")),
        ],
        "k bigint, tier string, ts timestamp",
    )
    out = C.scd2_merge(
        dim, changes, key_col="k", attr_cols=["tier"], ts_col="ts"
    )
    got = {
        (r.k, r.tier, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }
    assert got == {
        # history passthrough
        (1, "lead", _ts("2024-01-01"), _ts("2024-02-01"), False),
        # closed at change ts
        (1, "gold", _ts("2024-02-01"), _ts("2024-03-01"), False),
        # new version
        (1, "platinum", _ts("2024-03-01"), None, True),
        # identical attrs: untouched open row, no new version
        (2, "silver", _ts("2024-01-05"), None, True),
        # key absent from batch: untouched
        (3, "bronze", _ts("2024-01-07"), None, True),
        # brand-new key
        (4, "lead", _ts("2024-03-03"), None, True),
    }


def test_scd2_merge_is_idempotent_on_equal_batch(spark):
    """Re-applying the same change batch is a no-op: the new open rows
    carry the batch's attrs, so the second merge classifies every key
    as identical."""
    dim = _dim(spark)
    changes = spark.createDataFrame(
        [(1, "platinum", _ts("2024-03-01"))], "k bigint, tier string, ts timestamp"
    )
    once = C.scd2_merge(dim, changes, key_col="k", attr_cols=["tier"], ts_col="ts")
    twice = C.scd2_merge(once, changes, key_col="k", attr_cols=["tier"], ts_col="ts")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_latest_per_key_tiebreak(spark):
    """Equal timestamps resolve by the tiebreak column, so replays are
    deterministic."""
    ch = spark.createDataFrame(
        [
            (1, "a", _ts("2024-01-01"), 10),
            (1, "b", _ts("2024-01-01"), 20),
            (1, "c", _ts("2023-12-31"), 99),
        ],
        "k bigint, tier string, ts timestamp, eid bigint",
    )
    got = C.latest_per_key(
        ch, key_col="k", ts_col="ts", tiebreak_col="eid"
    ).collect()
    assert len(got) == 1 and got[0].tier == "b"


def test_latest_per_key_partial_aggregates(spark):
    from hadoop_formats_spark import plans

    ch = spark.range(100).select(
        (F.col("id") % 7).alias("k"),
        F.col("id").cast("string").alias("tier"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.col("id").alias("eid"),
    )
    out = C.latest_per_key(ch, key_col="k", ts_col="ts", tiebreak_col="eid")
    assert plans.has_partial_aggregation(out)


def test_snapshot_diff_classification(spark):
    from hadoop_formats_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k bigint, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "k bigint, s string, v double",
    )
    d = snapshot_diff(old, new, key_cols=["k"], compare_cols=["s", "v"])
    got = {(r.k, r.change_type) for r in d.collect()}
    assert got == {
        (2, "changed"),  # s differs
        (3, "changed"),  # null -> value
        (4, "removed"),
        (5, "added"),
    }


def test_snapshot_diff_shuffles_digests_not_rows(spark, sf_dir):
    """The join input projects (key, md5) map-side: the full-row
    columns must not appear in the exchange."""
    from hadoop_formats_spark import plans
    from hadoop_formats_spark.operators.cdc import snapshot_diff

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    d = snapshot_diff(
        o,
        o.withColumn("o_totalprice", o.o_totalprice * 2),
        key_cols=["o_orderkey"],
        compare_cols=["o_custkey", "o_orderstatus", "o_totalprice"],
    )
    plan = plans.executed_plan(d)
    joins = [l for l in plan.splitlines() if "SortMergeJoin" in l or "ShuffledHashJoin" in l or "BroadcastHashJoin" in l]
    assert joins, plan
    # the hash projection happens below the exchange
    assert "md5" in plan
    assert "o_orderpriority" not in plan  # untouched column never read


def test_streaming_scd2_foreachbatch_matches_batch(spark, tmp_path):
    """Streaming CDC: time-ordered change batches applied through
    foreachBatch (merge into a parquet-versioned dimension, one
    version per micro-batch) converge to exactly the dimension the
    batch merges produce."""
    import os
    import uuid as _uuid

    from pyspark.sql import functions as F

    from hadoop_formats_spark.operators import cdc as C

    schema = "k bigint, tier string, ts timestamp, eid bigint"
    batches = [
        [(1, "lead", _ts("2024-01-01"), 1), (2, "lead", _ts("2024-01-02"), 2)],
        [(1, "gold", _ts("2024-02-01"), 3), (3, "lead", _ts("2024-02-02"), 4)],
        [(1, "gold", _ts("2024-03-01"), 5),  # no-op (same attrs)
         (2, "silver", _ts("2024-03-02"), 6)],
    ]

    def latest(df):
        return C.latest_per_key(
            df, key_col="k", ts_col="ts", tiebreak_col="eid"
        ).select("k", "tier", "ts")

    # ----- batch reference: three merges in order -----
    dim = C.scd2_init(
        latest(spark.createDataFrame(batches[0], schema)),
        key_col="k", attr_cols=["tier"], ts_col="ts",
    )
    for b in batches[1:]:
        dim = C.scd2_merge(
            dim, latest(spark.createDataFrame(b, schema)),
            key_col="k", attr_cols=["tier"], ts_col="ts",
        )
    expect = sorted(map(tuple, dim.collect()))

    # ----- streaming: one parquet file per batch, foreachBatch merge -----
    src = str(tmp_path / "changes")
    os.makedirs(src)
    for b in batches:  # append order fixes micro-batch order
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    dim_dir = str(tmp_path / "dim")
    state = {"version": -1}

    def apply_batch(bdf, batch_id):
        ch = latest(bdf)
        if state["version"] < 0:
            nxt = C.scd2_init(ch, key_col="k", attr_cols=["tier"], ts_col="ts")
        else:
            cur = bdf.sparkSession.read.parquet(
                f"{dim_dir}/v{state['version']}"
            )
            nxt = C.scd2_merge(
                cur, ch, key_col="k", attr_cols=["tier"], ts_col="ts"
            )
        state["version"] += 1
        nxt.write.parquet(f"{dim_dir}/v{state['version']}")

    s = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    (
        s.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            str(tmp_path / ("ckpt_" + _uuid.uuid4().hex[:6])),
        )
        .start()
        .awaitTermination()
    )
    assert state["version"] == 2
    got = sorted(
        map(tuple, spark.read.parquet(f"{dim_dir}/v2").collect())
    )
    assert got == expect


def test_point_in_time_enrich_matches_interval_join(spark):
    """The as-of window rewrite must equal the definitional
    valid_from <= ts < valid_to interval join, including facts before
    the key's first version (NULL attrs) and facts at exactly a
    version boundary (inclusive of the NEW version)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hadoop_formats_spark.operators.cdc import point_in_time_enrich

    T0 = dt.datetime(2024, 1, 1)

    def t(h):
        return T0 + dt.timedelta(hours=h)

    dim = spark.createDataFrame(
        [(1, t(2), "bronze"), (1, t(5), "gold"), (2, t(0), "silver")],
        "k long, valid_from timestamp, tier string",
    )
    facts = spark.createDataFrame(
        [
            (1, t(1), 10.0),   # before first version -> NULL tier
            (1, t(2), 11.0),   # exactly at open -> bronze (inclusive)
            (1, t(4), 12.0),   # inside bronze
            (1, t(5), 13.0),   # exactly at change -> gold
            (1, t(9), 14.0),   # open-ended gold
            (2, t(3), 15.0),   # silver
            (3, t(1), 16.0),   # key with no dimension at all -> NULL
        ],
        "k long, ts timestamp, v double",
    )
    got = sorted(
        map(
            tuple,
            point_in_time_enrich(
                dim,
                facts,
                key_col="k",
                valid_from_col="valid_from",
                fact_ts_col="ts",
                attr_cols=["tier"],
            ).collect(),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("valid_from")
    d2 = dim.withColumn("valid_to", F.lead("valid_from").over(w))
    ref = sorted(
        map(
            tuple,
            facts.alias("f")
            .join(
                d2.alias("d"),
                (F.col("f.k") == F.col("d.k"))
                & (F.col("d.valid_from") <= F.col("f.ts"))
                & (
                    F.col("d.valid_to").isNull()
                    | (F.col("f.ts") < F.col("d.valid_to"))
                ),
                "left",
            )
            .select("f.k", "f.ts", "f.v", "d.tier")
            .collect(),
        )
    )
    assert got == ref
    assert len(got) == 7


def test_point_in_time_enrich_null_attr_version(spark):
    """A dimension version whose attribute is legitimately NULL must be
    distinguishable from 'no version yet': facts inside it see NULL,
    NOT the previous version's value (ADVICE r6 #2 — the struct carry;
    per-attribute last(ignorenulls) would leak 'bronze' forward)."""
    import datetime as dt

    from hadoop_formats_spark.operators.cdc import point_in_time_enrich

    T0 = dt.datetime(2024, 1, 1)

    def t(h):
        return T0 + dt.timedelta(hours=h)

    dim = spark.createDataFrame(
        [(1, t(0), "bronze", 10.0), (1, t(2), None, 20.0), (1, t(4), "gold", None)],
        "k long, valid_from timestamp, tier string, score double",
    )
    facts = spark.createDataFrame(
        [(1, t(1), 1.0), (1, t(3), 2.0), (1, t(5), 3.0)],
        "k long, ts timestamp, v double",
    )
    got = {
        r["v"]: (r["tier"], r["score"])
        for r in point_in_time_enrich(
            dim,
            facts,
            key_col="k",
            valid_from_col="valid_from",
            fact_ts_col="ts",
            attr_cols=["tier", "score"],
        ).collect()
    }
    assert got == {
        1.0: ("bronze", 10.0),
        2.0: (None, 20.0),  # NULL-tier version, not inherited bronze
        3.0: ("gold", None),  # NULL-score version, not inherited 20.0
    }

"""Z-order layout (operators/layout.py): Morton-key bit correctness
against a Python reference, and the pruning property the layout
exists for — bounded bucket boxes in BOTH dimensions."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_formats_spark.operators import layout as L


def _py_morton(cx: int, cy: int, bits: int = 8) -> int:
    z = 0
    for m in range(bits):
        z |= ((cx >> m) & 1) << (2 * m + 1)
        z |= ((cy >> m) & 1) << (2 * m)
    return z


def test_zorder_key_matches_python_reference(spark):
    df = spark.range(500).select(
        ((F.col("id") * 37) % 256).alias("cx"),
        ((F.col("id") * 91) % 256).alias("cy"),
    )
    out = df.withColumn(
        "z", L.zorder_key([F.col("cx"), F.col("cy")], bits=8)
    ).collect()
    for r in out:
        assert r.z == _py_morton(r.cx, r.cy), (r.cx, r.cy, r.z)


def test_zorder_key_is_monotone_in_grid_order(spark):
    """(0,0) maps to 0, (255,255) to 65535, and the key stays within
    the 2·bits-bit range."""
    df = spark.createDataFrame([(0, 0), (255, 255), (255, 0), (0, 255)], "cx int, cy int")
    got = {
        (r.cx, r.cy): r.z
        for r in df.withColumn(
            "z", L.zorder_key([F.col("cx"), F.col("cy")], bits=8)
        ).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(255, 255)] == 65535
    assert got[(255, 0)] == 0xAAAA  # all odd bit positions (x is MSB-side)
    assert got[(0, 255)] == 0x5555


def test_zorder_buckets_prune_on_the_second_dimension(spark, sf_dir):
    """The reason to Z-order: for a filter on the NON-leading column,
    far fewer z-order buckets' bounding boxes intersect than linear
    buckets' (the linear layout is blind to suppkey, every bucket
    spans its whole domain)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    )
    z = L.zorder_code2(li, x_col="pk", y_col="sk", bits=8)

    def boxes(bucket):
        return {
            (r.lo, r.hi)
            for r in z.groupBy(bucket.alias("b"))
            .agg(F.min("sk").alias("lo"), F.max("sk").alias("hi"))
            .collect()
        }

    zboxes = boxes(F.shiftright(F.col("zkey"), 11))
    lboxes = boxes(F.shiftright(F.col("_cx"), 3))
    lo, hi = li.agg(F.min("sk"), F.max("sk")).first()
    # sk-range filter over the middle eighth of the domain
    qlo = lo + (hi - lo) * 7 // 16
    qhi = lo + (hi - lo) * 9 // 16
    z_hit = sum(1 for b in zboxes if b[0] <= qhi and b[1] >= qlo)
    l_hit = sum(1 for b in lboxes if b[0] <= qhi and b[1] >= qlo)
    # linear layout: essentially every bucket intersects; z-order: only
    # the buckets whose sk-slab overlaps the eighth.
    assert l_hit >= len(lboxes) - 1
    assert z_hit <= len(zboxes) // 2, (z_hit, len(zboxes))


def test_zorder_code2_is_single_scan_plus_broadcast(spark, sf_dir):
    """The bounds join must broadcast (one-row aggregate), not shuffle
    the fact side."""
    from hadoop_formats_spark import plans

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    )
    z = L.zorder_code2(li, x_col="pk", y_col="sk", bits=8)
    assert plans.broadcast_count(z) >= 1
    # the only exchange is the one-row bounds aggregate's SinglePartition
    # collapse (4 longs); the fact side is never hash-shuffled
    assert plans.shuffle_count(z) <= 1
    assert "Exchange hashpartitioning" not in plans.executed_plan(z)

"""Bucketed tables co-locate join keys at write time so repeated joins
skip the shuffle entirely — the 100 TB pattern for fact-fact joins that
run every day on the same key."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_formats_spark import plans


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    # tables carry explicit external paths, so the (static) warehouse
    # dir is never written to
    wh = str(tmp_path_factory.mktemp("warehouse"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", f"{wh}/li_b")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", f"{wh}/o_b")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    yield wh
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_avoids_shuffle(spark, warehouse):
    # at test scale Spark would broadcast; disable it so the co-located
    # sort-merge path (the pattern that matters at fact-fact scale) shows
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.table("li_bucketed")
        o = spark.table("o_bucketed")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = plans.executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-located join: no exchange on either join key
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan


def test_bucketed_join_matches_plain_join(spark, warehouse, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus")
        .collect()
    )
    got = (
        spark.table("li_bucketed")
        .join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderstatus")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in expected]

"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect); a warmup
query runs first so JVM/codegen startup isn't attributed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: the flagship aggregation, the heaviest shuffle join, a
# window, a seqfile round-trip (format layer), dedup + ANN (ext layer),
# and a streaming window — one per major subsystem.
HEADLINE = [
    "q1_pricing_summary",
    "join_5way_region_rollup_revenue",
    "join_6way_supplier_nation_revenue",
    "join_asof_purchase_last_click",
    "grouping_sets_time_rollup",
    "window_topk_orders_per_customer",
    "sort_topk_revenue_parts",
    "seqfile_roundtrip_returnflag_counts",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_brute_force_topk",
    "text_quality_score",
    "stream_tumbling_hourly_counts",
    "stream_stream_join_click_to_purchase",
]


def _scaled_seq_file(n: int = 10_000_000) -> str:
    """Build (once, cached) the ~100× scaled Text→Int fixture analog:
    ``n`` records shaped like the reference's text-int.seq
    (``MakeSequenceFiles.java:15-27`` keys F%07X → int), written by our
    vectorized writer in BLOCK+Snappy, read back via auto-split."""
    import pyarrow as pa

    path = "/tmp/hfs_seq_cache/scaled/text_int_10m.seq"
    if os.path.isfile(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    import numpy as np

    from hadoop_formats_spark.seqfile import core

    tmp = path + ".build"
    with core.SeqFileWriter(
        tmp, "org.apache.hadoop.io.Text", "org.apache.hadoop.io.IntWritable"
    ) as w:
        chunk = 1_000_000
        for lo in range(0, n, chunk):
            ints = np.arange(lo, min(lo + chunk, n), dtype=np.int32)
            keys = pa.array([f"F{i:07X}" for i in ints.tolist()], pa.string())
            w.write_batch(keys, pa.array(ints, pa.int32()))
    os.replace(tmp, path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "0.1")

    from hadoop_formats_spark.queries import QUERIES
    from hadoop_formats_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + Arrow + python worker spin-up, incl. the Python
    # datasource path (first hadoop_seq query pays ~3s of one-time setup)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    spark.read.format("hadoop_seq").load(
        "/root/reference/tests/text-int.seq"
    ).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES[name]
        best = None
        for _ in range(2):  # best-of-2: drop scheduler/GC noise
            t0 = time.time()
            df = spec.builder(spark, sf_dir)
            n = df.count() if name != "q1_pricing_summary" else len(df.collect())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.2f}s ({n} rows)", file=sys.stderr)

    # round-2 operator timings — separate section so the 15-entry
    # headline total stays comparable across rounds
    EXTRA = [
        "dedup_group_assignment",
        "kmeans_cluster_profile",
        "ann_ivf_recall_at_3",
        "text_tfidf_top_terms",
        "join_interval_binned_price_band",
        "embedding_quantize_int8_error",
        "curation_pipeline_docs",
        "sample_mixture_balanced",
    ]
    extra: dict[str, float] = {}
    for name in EXTRA:
        spec = QUERIES[name]
        best = None
        for _ in range(2):  # best-of-2 (r3+; r2 extras were single-run)
            t0 = time.time()
            n = spec.builder(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        extra[name] = round(best, 3)
        print(f"# extra {name}: {extra[name]:.2f}s ({n} rows)", file=sys.stderr)

    # format-layer decode throughput (BASELINE.md protocol §1): scan the
    # seqfile copy of lineitem written by the roundtrip query above
    from pyspark.sql import functions as F

    from hadoop_formats_spark.queries.seqfile_q import _roundtrip_dir
    from hadoop_formats_spark.queries.registry import table

    seq_dir = _roundtrip_dir(
        spark,
        sf_dir,
        "lineitem_rf",
        lambda: table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("key"), F.col("l_returnflag").alias("value")
        ),
    )
    t0 = time.time()
    n_rows = spark.read.format("hadoop_seq").load(seq_dir).count()
    decode_s = time.time() - t0
    timings["seqfile_full_scan"] = round(decode_s, 3)

    # scaled format-layer scan (BASELINE.md §1 protocol: fixtures
    # rewritten at ~100×): one 10M-record Text→Int file, multi-split
    # parallel read through the datasource.  Built once, cached across
    # runs; NOT part of the headline total (kept comparable to r1/r2).
    scaled_path = _scaled_seq_file()
    scaled_s = None
    for _ in range(2):  # best-of-2, like the headline queries
        t0 = time.time()
        n_scaled = spark.read.format("hadoop_seq").load(scaled_path).count()
        dt = time.time() - t0
        scaled_s = dt if scaled_s is None else min(scaled_s, dt)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extra_queries": extra,
                "sf": sf,
                "seqfile_decode_recs_per_sec": round(n_rows / decode_s),
                "seqfile_scaled_scan": {
                    "records": n_scaled,
                    "sec": round(scaled_s, 3),
                    "recs_per_sec": round(n_scaled / scaled_s),
                },
            }
        )
    )


if __name__ == "__main__":
    main()

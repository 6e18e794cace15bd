"""Dump `.explain('formatted')` for the round-16 optimization targets.

Usage: python tools/dump_r16_plans.py <suffix> [query ...]

Writes plans/r16/<query>_<suffix>.txt for each named query (default: the
batch headline set + the extras targeted this round).  Streaming rows
are skipped: their returned frame is a memory-sink table whose batch
plan is a LocalTableScan, so there is nothing to capture.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
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
    # extras targeted by OPTIMIZATION_r16
    "link_fuzzy_customer_names",
    "join_bloom_prefiltered",
    "dedup_cross_source_matrix",
    "graph_bfs_distances",
    "dedup_keeper_by_quality",
    "dedup_group_assignment",
    "sample_hard_negatives_band",
    "feature_woe_iv",
    "dedup_minhash_band_pr",
    "dedup_winnow_fingerprint_pairs",
    "sketch_kmv_distinct_union",
    "search_hybrid_rrf",
    "curation_drop_waterfall",
    "ml_conformal_interval_coverage",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT

    from hadoop_formats_spark.queries import QUERIES
    from hadoop_formats_spark.session import get_spark

    spark = get_spark("dump-r16-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {n_ex} Exchange -> {path}")


if __name__ == "__main__":
    main()

"""Regenerate PLANS.md: the executed physical plan of each headline
query with the plan features that matter at 100 TB called out
mechanically (broadcasts, partial aggregation, pushed filters, pruned
scan columns, exchange count).

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES_TO_DUMP = [
    ("q1_pricing_summary", "scan-heavy aggregate: pushdown + partial agg"),
    ("q5_local_supplier_volume", "TPC-H 6-way join: dims broadcast"),
    ("join_5way_region_rollup_revenue", "rollup over a broadcast join tree"),
    ("join_salted_lineitem_orders", "skew-salted fact-fact join"),
    ("window_topk_orders_per_customer", "ranking window"),
    ("sort_topk_revenue_parts", "top-k → TakeOrderedAndProject"),
    ("dedup_minhash_lsh", "shingle→minhash→band→verify pipeline"),
    ("curation_pipeline_docs", "filter→dedup→count curation pipeline"),
    ("sample_hash_deterministic", "map-only deterministic sampling"),
    ("join_interval_binned_price_band", "pure interval join via bin-quantized equi rewrite"),
    ("kmeans_cluster_profile", "iterative k-means: broadcast assign + per-dim mean agg"),
    ("dedup_embedding_lsh_blocked", "sign-LSH bands → exact-cosine verify (the scale path)"),
    ("contamination_ngram_overlap", "inverted-index join, benchmark shingles broadcast"),
    ("pack_sequences_stats", "cumsum binning: one (lang, shard) exchange reused"),
    ("pii_scrub_stats", "map-only regex scrub"),
    ("text_repetition_metrics", "explode + two doc-keyed partial aggregations"),
    ("corpus_build_pipeline", "5-stage curation composition (round 4)"),
    ("sample_domain_quota", "two-phase per-domain quota: broadcast prefilter bounds the rank"),
    ("dedup_chunk_boilerplate", "span doc-freq count + span-key join + doc-keyed reassembly"),
    ("pq_encode_stats", "PQ: one fused GEMM scan per Lloyd round, no corpus shuffle (round 4)"),
    ("split_train_holdout", "map-only fingerprint-keyed split + one grouped pass (round 4)"),
    ("text_unigram_surprisal", "vocab-count groupBy + token-keyed join, N broadcast (round 4)"),
    ("join_asof_forward_tolerance", "forward as-of via union + min-struct window, no range join (round 10)"),
    ("sql_lateral_topk_nations_per_region", "correlated LATERAL decorrelated to join + group limit (round 10)"),
    ("gdpr_forget_users", "SetFile tombstone ledger broadcast anti-split of the fact table (round 10)"),
    ("dedup_semantic_semdedup", "SemDeDup: broadcast-centroid assign + within-cluster cogroup GEMM (round 4)"),
    ("ann_filtered_topk", "pre-filter ANN: label predicate pushed to the corpus scan (round 4)"),
    ("url_canonical_dedup", "URL canonicalize + per-domain dedup accounting, map-side expressions (round 4)"),
    ("text_pmi_collocations", "PMI collocations: pair/unigram partial aggs + token-keyed joins (round 4)"),
    ("compact_small_files", "small-files compaction: measured file counts + no-loss checksum (round 4)"),
    ("sample_weighted_quality", "A-ES weighted sampling: map-side keys + TakeOrderedAndProject (round 4)"),
    ("sketch_count_min_heavy_hitters", "Count-Min: one partial-agg sketch build + broadcast estimate join (round 4)"),
    ("parquet_schema_evolution", "mergeSchema scan over divergent file generations (round 4)"),
    ("sketch_kmv_distinct_union", "KMV sketch: partial-agg distinct + WindowGroupLimit top-k, lossless merge (round 4)"),
    ("scd2_dimension_merge", "SCD2 MERGE: open-rows full-outer join vs last-change-per-key, history unions through (round 4)"),
    ("dedup_prefix_filter_join", "AllPairs/PPJoin prefix filter: df-ordered prefixes, lossless hot-key avoidance (round 6)"),
    ("scd2_point_in_time_join", "temporal join as as-of window rewrite: one keyed shuffle, no range join (round 6)"),
    ("stats_psi_drift", "PSI drift: 1-row bounds broadcast, rows never shuffle for binning (round 6)"),
    ("intervals_merge_coverage", "gaps-and-islands: one user_id shuffle feeds windows + grouping (round 6)"),
    ("layout_zorder_clustering", "Z-order: Morton interleave map-side, broadcast bounds, per-bucket boxes (round 4)"),
    ("chunk_sliding_windows", "sliding-window chunking: map-only posexplode+slice fan-out (round 4)"),
    ("bpe_train_merges", "BPE training: vocabulary partial-agg + per-round fold, driver-held merges (round 4)"),
    ("graph_pagerank_suppliers", "PageRank: per-iteration edges join + partial-agg mass sum (round 4)"),
    ("dq_constraint_suite", "DQ suite: all row-level metrics in ONE aggregation scan + referential anti-join (round 4)"),
    ("snapshot_diff_orders", "snapshot diff: map-side row digests, delta-sized full-outer join (round 4)"),
    ("mv_incremental_maintenance", "IVM: delta-join maintenance, O(delta) per batch (round 4)"),
    ("funnel_conversion", "session funnel: chained per-session aggs sharing one user_id shuffle (round 4)"),
    ("dedup_minhash_band_pr", "band-stage P/R: candidates vs exact ground truth, scalar counts only to driver (round 4)"),
    ("sketch_histogram_quantiles", "histogram sketch: one partial-agg pass, mergeable bins, quantiles off the CDF (round 4)"),
    ("sketch_hll_distinct_merge", "HyperLogLog: partial-agg registers, exact-integer harmonic sum, in-query merge proof (round 5)"),
    ("text_bm25_search", "BM25: posting-list scoring, broadcast corpus stats, TakeOrderedAndProject top-k (round 5)"),
    ("stats_outlier_zscore", "z-score outliers: group moments + broadcast stats join, rows never shuffle (round 5)"),
    ("search_hybrid_rrf", "hybrid RRF: BM25 + cosine rank lists fused on top-N only (round 5)"),
    ("dedup_substring_spans", "sliding-window substring dedup: map-side span hashing + partial-agg doc-freq + 1:1 join back (round 6)"),
    ("sketch_kmv_jaccard_intersect", "KMV set overlap: two k-row sketches answer Jaccard/intersection, corpus never pairs (round 6)"),
    ("stats_outlier_mad", "median/MAD robust outliers: two exact-percentile passes + broadcast stats joins (round 6)"),
    ("join_bloom_prefiltered", "Bloom semi-join reduction: partial-agg bitmap build, broadcast probe prune before the shuffle (round 6)"),
    ("dedup_containment_excerpts", "containment pairs: inverted-index generation, no cross join, two size joins (round 6)"),
    ("link_fuzzy_customer_names", "fuzzy linkage: blocking equi-join + Levenshtein verify + WindowGroupLimit argmin (round 6)"),
    ("abtest_cuped_adjusted", "CUPED: one per-user groupBy builds both periods, theta 1-row broadcast (round 7)"),
    ("abtest_bootstrap_ci", "Poisson bootstrap: deterministic per-user weights, replicate fan-out on the reduced table (round 7)"),
    ("embedding_centroid_drift", "centroid drift: vectors shuffle once into |labels|*dim cells (round 7)"),
    ("dedup_cross_source_matrix", "cross-source overlap: distinct fingerprints, fp-keyed pair join, never a cross join (round 7)"),
    ("embedding_covariance_pca", "distributed covariance: one MapInPandas GEMM scan, joinless d^2 reduce, shuffle independent of n (round 8)"),
    ("attribution_last_touch", "last-touch attribution: carry-forward window replaces the as-of join, one user shuffle (round 8)"),
    ("feature_woe_iv", "WOE/IV: broadcast percentile-edge binning, never a fact-table ntile (round 8)"),
    ("feature_target_encoding_oof", "OOF target encoding: fold-complement math on |segments|x5 cells (round 8)"),
    ("stats_gini_brand_revenue", "Gini/Pareto: both rank windows share one brand exchange (round 8)"),
    ("timeseries_autocorrelation", "ACF: zero-filled hour grid from 1-row bounds, cell-table windows (round 8)"),
    ("stats_benford_first_digit", "Benford audit: map-side digit extraction, 9-cell reduce (round 8)"),
    ("text_zipf_fit", "Zipf fit: vocab groupBy + lang-ranked window + built-in regr_* partial agg (round 8)"),
    ("layout_zorder_pruned_scan", "physical Z-layout rewrite: repartitionByRange on the Morton key, footer stats prune BOTH box dimensions (round 11)"),
    ("text_gopher_quality_rules", "Gopher rule filter: one map-side pass (split + array folds) + |langs| partial-agg, no UDF (round 11)"),
    ("curation_ccnet_ppl_buckets", "CCNet head/middle/tail: bigram-LM ppl + per-language tercile broadcast, cent-quantized averages (round 11)"),
    ("map_higher_order_funcs", "map-typed lambdas (transform_values/map_filter/map_zip_with) compile to Catalyst, zero Python eval (round 11)"),
    ("set_bag_ops_shipyear", "EXCEPT ALL / INTERSECT ALL: count-replicating hash aggregate on the row value, no join (round 11)"),
    ("join_null_safe_priority", "null-safe equi-join (<=>): NULL hashes to a bucket, broadcast hash join not BNLJ (round 11)"),
    ("ann_ivfpq_adc_recall_at_3", "IVF-PQ: probe-restricted ADC scan over m-byte codes, exact rerank, recall vs exact (round 11)"),
    ("abtest_mann_whitney_u", "Mann-Whitney U: two-phase distributed prefix sum over value cells, no global window (round 11)"),
    ("ml_naive_bayes_score_confusion", "NB inference: broadcast model join + per-doc argmax window, exact integer scores (round 11)"),
    ("corpus_build_pipeline_v2", "curation capstone v2: Gopher gate -> CCNet keep -> dedup -> mixture cells, one certified chain (round 11)"),
    ("transform_fim_split", "FIM rewrite: map-side string arithmetic, content checksum, no text shuffle (round 11)"),
    ("pack_length_bucketing_waste", "padding-waste audit: shard-local batch windows, arrival vs bucketed policies (round 11)"),
    ("abtest_sequential_obf", "OBF sequential guard: one user_id shuffle builds the K-look cumulative frame, K-row reduce (round 12)"),
    ("sample_dsir_importance", "DSIR targeting: 64-row hashed LM models broadcast onto (doc,bucket) cells, TakeOrderedAndProject top-k (round 12)"),
    ("sketch_kmv_jaccard_pair", "KMV Jaccard: one grouped WindowGroupLimit sketch pass, <=64-row broadcast joins (round 12)"),
    ("seqfile_sorter_merge_runs", "SequenceFile.Sorter: range shuffle + per-task sort into validated MapFile runs, bucketed read-back reduce (round 12)"),
    ("agg_bitwise_checksum_bitmap", "bitwise aggregates: presence bitmap + xor checksum in one partial-agg groupBy (round 12)"),
    ("stats_ks_two_sample", "exact KS CDFs as the distributed two-phase bucketed prefix sum — no global value sort (round 13)"),
    ("multimodal_pnm_real_decode", "real PNM pixel decode fused into one mapInPandas stage, |buckets| groupBy the only shuffle (round 13)"),
    ("dedup_winnow_fingerprint_pairs", "winnowing: per-doc window-min selection + hot-capped inverted-index pair join, never all-pairs (round 13)"),
    ("abtest_bh_fdr_segments", "BH-FDR: one conditional-moment groupBy to 5 rows, step-up on the cell table (round 13)"),
]


def features(plan: str) -> list[str]:
    out = []
    n_bc = plan.count("BroadcastHashJoin")
    if n_bc:
        out.append(f"{n_bc} broadcast hash join(s) — no shuffle of the big side")
    n_smj = plan.count("SortMergeJoin")
    if n_smj:
        out.append(f"{n_smj} sort-merge join(s) — keyed shuffle")
    if "partial_" in plan or plan.count("HashAggregate") >= 2:
        out.append("partial (map-side) aggregation present")
    if "TakeOrderedAndProject" in plan:
        out.append("top-k via TakeOrderedAndProject (no global sort)")
    n_ex = len(
        re.findall(
            r"\bExchange (hashpartitioning|rangepartitioning|"
            r"RoundRobinPartitioning|SinglePartition)",
            plan,
        )
    )
    n_bx = plan.count("BroadcastExchange ")
    out.append(f"{n_ex} shuffle exchange(s), {n_bx} broadcast exchange(s)")
    pushed = re.findall(r"PushedFilters: \[([^\]]+)\]", plan)
    pushed = [p for p in pushed if p.strip()]
    if pushed:
        out.append(f"pushed filters reach the scan ({len(pushed)} scan(s))")
    wsc = len(re.findall(r"WholeStageCodegen", plan))
    if wsc:
        out.append(f"{wsc} whole-stage codegen span(s)")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from hadoop_formats_spark import plans as P
    from hadoop_formats_spark.queries import QUERIES
    from hadoop_formats_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS — executed physical plans of the headline queries",
        "",
        f"Regenerated by `python tools/dump_plans.py {sf_dir}`. These are",
        "the plans Catalyst actually executes (post-AQE re-planning);",
        "the bullet points are extracted mechanically, and",
        "`tests/test_queries.py` asserts the load-bearing ones so they",
        "cannot silently regress.",
        "",
    ]
    for name, why in QUERIES_TO_DUMP:
        df = QUERIES[name].builder(spark, sf_dir)
        df.collect()  # run THIS queryExecution so AQE finalizes it
        plan = P.executed_plan(df)
        # strip the bulky codegen ids / exprs ids noise for readability
        short = "\n".join(
            l for l in plan.splitlines() if l.strip() and "== " not in l
        )
        lines.append(f"## {name}")
        lines.append("")
        lines.append(f"*{why}*")
        lines.append("")
        for f in features(plan):
            lines.append(f"- {f}")
        lines.append("")
        lines.append("```")
        lines.append(short[:4000])
        lines.append("```")
        lines.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote PLANS.md", len(lines), "lines")


if __name__ == "__main__":
    main()

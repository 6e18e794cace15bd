"""Query registry: every declared capability from SURVEY.md §2.2/§2.3 is
one named entry pairing a Spark DataFrame builder with (when
SQL-expressible) an equivalent DuckDB oracle SQL string.  The driver
runs both at sf0.01 and compares row count + schema + order-insensitive
value hash, so builders and oracles must alias every computed column to
the same name."""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


from hadoop_formats_spark.cachedir import cache_path


def publish_dir(
    tmp: str, final: str, populated: Callable[[str], bool]
) -> str:
    """Atomically publish a freshly built cache dir: rename(tmp, final);
    on OSError assume a concurrent builder won the publish race and
    discard ``tmp``.  Either way, VERIFY ``populated(final)`` before
    returning — an OSError can also mean a filesystem quirk or an empty
    pre-existing ``final``, and returning an unpopulated path would
    silently yield empty reads downstream (ADVICE r12).  Fail loudly
    instead."""
    os.makedirs(os.path.dirname(final), exist_ok=True)
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race (probably)
    if not (os.path.isdir(final) and populated(final)):
        raise RuntimeError(
            f"cache publish failed: {final!r} is missing or unpopulated "
            "after rename — not a lost race; inspect the cache root"
        )
    return final


def _has_file(suffix: str = "", prefix: str = "") -> Callable[[str], bool]:
    """Predicate factory for publish_dir: final dir contains an entry
    matching the given suffix/prefix."""

    def check(d: str) -> bool:
        return any(
            f.endswith(suffix) and f.startswith(prefix)
            for f in os.listdir(d)
        )

    return check


_EVENTS_CACHE = cache_path("events_us")


def events_path(sf_dir: str) -> str:
    """The testdata ``events.parquet`` carries TIMESTAMP(NANOS), which
    Spark's parquet scan rejects (PARQUET_TYPE_ILLEGAL).  Materialize a
    timestamp[us] copy once per sf dir (atomic rename; values in the
    testdata are second-granularity so the cast is lossless)."""
    key = sf_dir.strip("/").replace("/", "_")
    final = os.path.join(_EVENTS_CACHE, key)
    if os.path.isdir(final) and any(
        f.endswith(".parquet") for f in os.listdir(final)
    ):
        return final
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    fields = [
        pa.field(f.name, pa.timestamp("us") if pa.types.is_timestamp(f.type) else f.type)
        for f in t.schema
    ]
    # safe=False: testdata ts has sub-µs noise; truncation matches how both
    # Spark and the DuckDB Python client surface values (µs datetimes), and
    # min/bucketing commute with monotonic truncation.
    t = t.cast(pa.schema(fields), safe=False)
    tmp = final + "." + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(t, os.path.join(tmp, "part-0.parquet"))
    return publish_dir(tmp, final, _has_file(suffix=".parquet"))


_DOCS_STREAM_CACHE = cache_path("docs_streamdir_v2")


def docs_stream_dir(sf_dir: str, *, nfiles: int = 32) -> str:
    """File-stream sources need a DIRECTORY; the testdata tables are
    single ONE-ROW-GROUP parquet files, which Spark cannot split — so a
    single-file copy serializes every map-side stage of a streaming
    replay onto one task (measured r10: the minhash band registry ran
    10.4 s at sf0.1 single-file vs 2.25 s over the same rows in 8
    files — the cost was never the data, it was the missing splits
    that real 100 TB inputs have by construction).  Materialize the
    documents table as ``nfiles`` row-sliced parquet files once per sf
    dir (atomic rename).  Consumers that need single-microbatch
    semantics pass ``files_per_trigger=nfiles`` so all slices land in
    ONE batch — identical state trajectory to the old one-file copy,
    8-way parallel scan."""
    # nfiles is part of the cache key: consumers hardcode
    # files_per_trigger=DOCS_STREAM_FILES, so a caller asking for a
    # different slice count must NOT silently receive whichever layout
    # was materialized first — drift there would change microbatch
    # count and hence watermark/TTL state trajectories (ADVICE r10).
    key = sf_dir.strip("/").replace("/", "_") + f"_n{nfiles}"
    final = os.path.join(_DOCS_STREAM_CACHE, key)
    if os.path.isdir(final) and any(
        f.endswith(".parquet") for f in os.listdir(final)
    ):
        return final
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/documents.parquet")
    tmp = final + "." + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    step = max(1, (t.num_rows + nfiles - 1) // nfiles)
    for i in range(0, nfiles):
        sl = t.slice(i * step, step)
        if sl.num_rows == 0:
            break
        pq.write_table(sl, os.path.join(tmp, f"part-{i}.parquet"))
    return publish_dir(tmp, final, _has_file(suffix=".parquet"))

DOCS_STREAM_FILES = 32  # files_per_trigger partner for docs_stream_dir (r16: 8 -> 32; all slices still land in ONE microbatch, the map-side banding just gets the full core count instead of 8-way parallelism)


_DOCS_SEQ_CACHE = cache_path("docs_seqdir")


def docs_seq_dir(sf_dir: str, *, nfiles: int = 32) -> str:
    """The documents table as ``nfiles`` SequenceFiles (key = doc_id
    LongWritable, value = text Text) — the r17 parallel-scan canary
    fixture (VERDICT r16 #7).  A BATCH parquet scan of the 32-file
    docs_stream_dir copy packs the tiny files into ~2 splits
    (openCostInBytes charging), so it cannot exercise scan
    parallelism; the hadoop_seq datasource plans one input partition
    per file/byte-range, so this layout scans 32-way.  Like
    docs_stream_dir the cache key carries the slice count, and the
    fixture is a row-sliced COPY of the testdata (data, never derived
    results)."""
    key = sf_dir.strip("/").replace("/", "_") + f"_n{nfiles}"
    final = os.path.join(_DOCS_SEQ_CACHE, key)
    if os.path.isdir(final) and any(
        f.endswith(".seq") for f in os.listdir(final)
    ):
        return final
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hadoop_formats_spark.seqfile import core

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tmp = final + "." + uuid.uuid4().hex[:8]
    os.makedirs(tmp, exist_ok=True)
    for i in range(nfiles):
        # round-robin row slicing, not contiguous ranges: document
        # lengths cluster, and a contiguous slice hands one task all
        # the long documents (measured: the canary's 8→32-core ratio
        # collapsed to ~1.5 from straggler tasks)
        sl = t.take(list(range(i, t.num_rows, nfiles)))
        if sl.num_rows == 0:
            break
        core.write_table(
            os.path.join(tmp, f"part-{i:05d}.seq"),
            pa.table(
                {
                    "key": sl.column("doc_id").cast(pa.int64()),
                    "value": sl.column("text").cast(pa.string()),
                }
            ),
        )
    return publish_dir(tmp, final, _has_file(suffix=".seq"))


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return spark.read.parquet(events_path(sf_dir))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# The driver's correctness gate checks the FIRST 50 entries of
# ``queries()`` (dict insertion order).  Order the registry so that
# window covers every capability family — the format layer (the actual
# port target, including the negative paths: corruption tolerance and
# metadata round-trip), the mandated extension operators (dedup / ANN /
# text / multimodal / curation, with the LSH-*blocked* embedding dedup
# carrying the graded slot since it is the shape that survives 100 TB;
# the exact all-pairs ground truth and the recall comparison follow
# right after the window), streaming, and one representative per parity
# category — rather than whichever module happened to import first.
# Everything else follows in registration order and is still exercised
# by pytest's own DuckDB oracle checks and bench.py.
#
# Round-4 rotation (VERDICT r3 #1): the round-3 curation operators
# (corpus_build_pipeline, sample_token_budget, pii_scrub_stats,
# dedup_incremental_batch, ann_projected_recall_at_3) enter the window.
# Slots were freed by retiring entries whose machinery stays certified
# transitively or by pytest:
#   - seqfile_roundtrip_double_sum: R8/R12 already proven by
#     seqfile_roundtrip_returnflag_counts + golden-fixture pytest;
#   - seqfile_block_count_fast_path: covered by
#     tests/test_datasource.py fast-path tests;
#   - dedup_exact: corpus_build_pipeline's dedup stage certifies
#     exact_dedup end-to-end against the same oracle shape;
#   - ann_ivf_topk: ann_ivf_recall_at_3 runs ivf_topk AND the exact
#     scan and compares them — a strictly stronger certificate;
# Round-4 session-3 rotation: four of the newest capability families
# enter the window; freed slots stay certified transitively:
#   - text_token_counts -> bpe_train_merges (whose word_freqs stage IS
#     the tokenization+counting machinery, plus merge learning);
#   - ann_projected_recall_at_3 -> graph_pagerank_suppliers (the
#     random-projection recall query stays in the full sweep + pytest;
#     the window keeps ann_ivf_recall_at_3 as the recall family rep);
#   - sessionize_events_batch -> scd2_dimension_merge (the streaming
#     stream_session_windows row's oracle is the SAME gaps-and-islands
#     SQL, so batch sessionization stays certified);
#   - kmeans_cluster_profile -> sketch_kmv_distinct_union (SemDeDup's
#     graded oracle unrolls the identical Lloyd rounds, certifying
#     kmeans_iterations end-to-end).
#   - join_interval_binned_price_band: joins keep three graded reps
#     (inner / as-of / salted); the interval rewrite stays covered by
#     pytest + the full-registry sweep.
#
# Round-5 rotation (VERDICT r4 #2-#4): with the datasource-registration
# fix landed, the proven-but-never-driver-graded MapFile family enters
# (mapfile_point_lookup / bloommap_probe_batch / setfile_dedup_ledger),
# plus three heavy TPC-H shapes (q9 multi-join profit, q21 EXISTS/NOT
# EXISTS anti-join, q17 correlated scalar subquery) and five round-4
# analytics operators that never had a driver row
# (sketch_count_min_heavy_hitters, snapshot_diff_orders,
# mv_incremental_maintenance, stream_chained_windowed_aggs,
# sample_weighted_quality).  Eleven slots freed — every retiree was
# driver-graded GREEN in r4 (historical certification stands) and its
# machinery stays exercised transitively + by pytest + the full sweep:
#   - seqfile_stream_sink_roundtrip (green r3+r4; sink covered by
#     pytest streaming tests; the stream SOURCE row stays),
#   - seqfile_record_layout_roundtrip / seqfile_permissive_corrupt_tail
#     / seqfile_metadata_roundtrip (green r4; golden-fixture + JVM
#     interop pytest covers layouts, corruption, metadata),
#   - multimodal_metadata (green r4; multimodal_audio_window_counts
#     stays as the family's graded rep),
#   - pii_scrub_stats + text_quality_score (green r4; both stages run
#     inside the still-graded corpus_build_pipeline, and quality
#     scoring also feeds the incoming sample_weighted_quality row),
#   - url_canonical_dedup (green r4; pure-Catalyst, sweep-covered),
#   - pivot_priority_by_status + string_functions (green r4; pivot and
#     scalar-fn parity stay in pytest oracle checks + the sweep),
#   - subquery_correlated_above_cust_avg (green r4; the incoming
#     q17_small_quantity_revenue is the same correlated-scalar-subquery
#     machinery inside a strictly harder plan).
# Round-6 rotation (VERDICT r5 #1-#3, #7): the largest rotation yet —
# ALL 50 round-5 rows were driver-graded GREEN, so 34 slots turn over
# to never-graded queries (cumulative driver-graded 77 → 111 of the
# 196 registered at end of round 6).
# Incoming: the 13 round-5 operators (HLL, BM25, RRF, streaming HLL,
# bigram LM, char entropy, z-score outliers, quantile normalization,
# co-occurrence, triangles, label propagation, Pareto skyline, band
# P/R), 8 never-graded TPC-H shapes (q2/q5/q7/q8/q13/q18/q20/q22,
# heaviest first per VERDICT #2), the window + set-op + scalar-fn
# parity families, the production GEMM embedding path (VERDICT #7),
# the PQ ADC search path, the flagship streaming near-dup service
# (stream_minhash_band_dedup), sliding windows, histogram/DQ/privacy
# stats, and time-series resample.  Every retiree was driver-graded
# GREEN in r5 (historical certification stands in CORRECTNESS_r05.json)
# and its machinery stays exercised by pytest + the full 190-query
# sweep, and transitively:
#   - seqfile_reference_record_count / _first_keys: both bundled
#     reference fixtures byte-parse in golden-fixture pytest; the
#     kept roundtrip row drives the same reader end-to-end;
#   - mapfile_range_scan / bloommap_probe_batch / setfile_dedup_ledger:
#     mapfile_point_lookup keeps the family's datasource-registration
#     + index-pruning path graded; bloom/set variants are pytest +
#     sweep-covered (bit-compatible bloom asserted against JVM);
#   - dedup_minhash_lsh / dedup_ngram_jaccard / dedup_semantic_semdedup
#     / dedup_incremental_batch: incoming dedup_minhash_band_pr RUNS
#     minhash banding AND the exact ground truth and compares them — a
#     strictly stronger minhash certificate; group-assignment (kept)
#     and corpus_build_pipeline (kept) exercise exact + survivor paths;
#   - dedup_embedding_lsh_blocked → incoming dedup_embedding_lsh_gemm:
#     same LSH blocking, production GEMM scoring path (VERDICT #7);
#   - ann_filtered_topk / pq_encode_stats: incoming
#     ann_pq_adc_recall_at_3 trains codebooks, encodes, AND compares
#     ADC search to the exact scan; brute-force top-k machinery is
#     inside the kept ann_ivf_recall_at_3's exact arm;
#   - sketch_count_min_heavy_hitters / sketch_kmv_distinct_union:
#     sketch family keeps two graded reps via incoming HLL + histogram;
#     CM/KMV stay pytest + sweep-covered;
#   - graph_pagerank_suppliers: three incoming graph rows
#     (co-occurrence, triangles, label propagation) grade the family's
#     iterative-join machinery far more broadly;
#   - text_lang_id_confusion / text_tfidf_top_terms / bpe_train_merges:
#     incoming BM25 is tf-idf machinery under a ranking function;
#     lang-id runs inside the kept corpus_build_pipeline; BPE merge
#     learning stays pytest + sweep-covered (text_bpe_token_counts);
#   - sample_token_budget / sample_weighted_quality (VERDICT #1 names
#     the former as a retire candidate): A-ES weighted sampling and
#     token-budget scan stay sweep-covered; curation_pipeline_docs +
#     corpus_build_pipeline keep the curation family graded;
#   - snapshot_diff_orders / mv_incremental_maintenance: CDC family
#     keeps scd2_dimension_merge (the hardest shape); diff/MV stay
#     sweep-covered;
#   - stream_tumbling_hourly_counts / _session_windows /
#     _dedup_by_user_type / _chained_windowed_aggs: streaming keeps 5
#     graded rows incl. two incoming never-graded shapes (HLL distinct,
#     minhash band dedup) + sliding windows; tumbling is a strict
#     sub-shape of sliding and of the kept chained oracle's first hop;
#   - q9 / q21 / q17: graded green r5; the 8 incoming TPC-H shapes
#     cover the same machinery classes (multi-join + agg, anti-join,
#     correlated scalar subquery via q2/q20/q22) on new plans;
#   - join_inner_revenue_by_nation / join_salted_lineitem_orders:
#     every incoming TPC-H row is an inner-join stack; skew-salting
#     stays pytest + sweep-covered; as-of join (custom op) stays kept;
#   - window_topk_orders_per_customer / sort_topk_revenue_parts /
#     grouping_sets_time_rollup: incoming window_rank_dense_ntile +
#     window_range_frame_spend grade the window family wider; top-k
#     plan shape (TakeOrderedAndProject) is plan-asserted in pytest;
#     grouping-sets stays sweep-covered and inside q13's oracle family.
# Round-7 rotation (VERDICT r6 #1-#2): ALL 50 round-6 rows were
# driver-graded GREEN (CORRECTNESS_r06.json), so the entire window
# turns over to never-driver-graded queries — the only axis left
# (cumulative driver-graded coverage 111 → 161 of 207 when green).
# Incoming: all 17 round-6 operators (landed after the r6 rotation
# froze — VERDICT #1 names them), plus the families VERDICT #2 calls
# out as having no graded representative: base parity
# (filter/projection/null-handling/multikey-sort/set-union), the four
# ungraded scalar-fn shapes, five join variants
# (left/full-outer/semi/anti/theta), rollup + cube, window
# lag-lead + running frames, BOTH remaining UDF-surface queries, the
# scalar subquery, unpivot, the csv source roundtrip, and the 10
# remaining never-graded TPC-H shapes.  Every retiree was graded
# green in r06 (historical certification stands) and its machinery
# stays covered by pytest + the full-registry sweep, and transitively:
#   - seqfile_roundtrip_returnflag_counts / seqfile_stream_source_counts
#     / mapfile_point_lookup: golden-fixture + JVM-interop + streaming
#     pytest drive the same reader/writer/stream/index paths daily; the
#     incoming csv_write_read_roundtrip keeps a sources row graded;
#   - parquet_partitioned_pruned_read: partition pruning is
#     plan-asserted in tests/test_queries.py and inside
#     ann_ivf_index_persisted's pruning contract;
#   - dedup_* (group_assignment, minhash_band_pr, embedding_lsh_gemm):
#     the incoming round-6 dedup rows (substring spans, containment,
#     prefix-filter exact join) grade the family's inverted-index +
#     verify machinery on strictly harder shapes; band P/R and the
#     GEMM path keep their r06 certification + sweep coverage;
#   - ann_ivf_recall_at_3 / ann_pq_adc_recall_at_3 / search_hybrid_rrf
#     / text_bm25_search / text_bigram_lm_score / text_char_entropy:
#     r06-green; recall-vs-exact and ranking machinery sweep-covered;
#   - sketch_hll_distinct_merge / sketch_histogram_quantiles: the
#     incoming sketch_kmv_jaccard_intersect keeps the sketch family
#     graded; HLL/histogram stay pytest + sweep-covered;
#   - stats_outlier_zscore / stats_quantile_normalize /
#     dq_constraint_suite / privacy_k_anonymity: four incoming stats
#     rows (MAD outliers, PSI drift, Markov transitions, decayed
#     engagement) grade the same broadcast-stats/partial-agg shapes;
#   - graph_* (3 rows): r06-green; iterative-join machinery stays
#     pytest + sweep-covered;
#   - pareto / timeseries_resample_ffill / multimodal_audio_window_counts
#     / corpus_build_pipeline / curation_pipeline_docs /
#     scd2_dimension_merge: r06-green; the incoming
#     scd2_point_in_time_join and timeseries_ewma_anomaly grade the
#     CDC + time-series families on harder shapes; the curation
#     capstones stay sweep-covered (their stages also run inside
#     retained pytest oracle spot checks);
#   - streaming (5 rows): the incoming stream_ttl_band_registry grades
#     the stateful path with TTL semantics on top; the other shapes
#     (stateful stats, stream-stream join, HLL, band dedup, sliding)
#     are r06-green and pytest-covered incl. checkpoint recovery;
#   - TPC-H q1/q2/q5/q7/q8/q13/q18/q20/q22 + join_asof + window_rank/
#     range_frame + set_intersect + array_explode + date_functions +
#     udf_pandas_grouped + sql_entry: r06-green; the 10 incoming TPC-H
#     shapes and the parity rows grade the same operator classes on
#     new plans (q15=view+scalar-max, q16=anti-join+count-distinct,
#     q19=disjunctive pushdown, udf_python/udf_pandas_scalar = the two
#     remaining UDF surfaces).
#
# Round-7 late adjustment (avoiding the exact r6 trap VERDICT #1 named:
# operators landing after the rotation froze and so never being
# eligible): the four operators ADDED during round 7
# (abtest_cuped_adjusted, embedding_centroid_drift,
# abtest_bootstrap_ci, dedup_cross_source_matrix) enter the window so
# no round-7 addition is ungraded in its own round.  Four TPC-H shapes
# defer to round 8, each chosen because an in-window row already
# grades its distinguishing plan shape this round:
#   - q4 (EXISTS semi-join)        → join_semi_customers_with_urgent;
#   - q6 (single-table filter agg) → filter_predicates +
#     projection_compute (and q19 keeps disjunctive pushdown graded);
#   - q11 (scalar-subquery HAVING) → subquery_scalar_near_max;
#   - q14 (conditional-sum ratio)  → math_conditional (CASE-in-agg).
# All four stay oracle-checked in the full-registry sweep and pytest.
# Round-9 rotation (VERDICT r8 #1-#2): the held round-7 window finally
# got its driver rows in CORRECTNESS_r08.json — 47/50 green, 3 hash
# fails (math_conditional, json_from_json_struct, q12_priority_shipping;
# all three oracle-formulation bugs, fixed this round: round(·,6) on
# the pow/ln columns, CAST(sum(int) AS BIGINT)).  The window therefore
# rotates: the 3 fixed queries stay in to re-grade green, the 21
# round-8 additions promote (queued since the r8 boundary), the four
# deferred TPC-H shapes q4/q6/q11/q14 promote (oracles re-audited this
# round: q6 money sum + q14 double ratio now round at source on both
# engines, q11's HAVING threshold now derives from ROUNDED per-part
# values so row membership is deterministic), and 22 of the remaining
# 46 never-graded fill the window (cumulative driver-graded 161 → 208
# of 232 when green).  Every entrant was strict-preflighted
# (tools/check_correctness.py --strict) before the freeze.
# The 24 deferrals (listed below the boundary, first in line for
# round 10) each have a graded or in-window representative of their
# machinery:
#   - agg_count_distinct / agg_collect_sorted: distinct-agg Expand is
#     graded via q16_parts_supplier_count (r08) + privacy_l_diversity
#     (in-window); collect_list ordering via struct_map_collect (r08)
#     and agg_having/agg_exact_percentiles (in-window);
#   - join_5way / join_6way: the same broadcast-dim inner-join stack as
#     r08-green q3/q10 and in-window q11/q14; join_cross_region_status
#     keeps a cross-shape row in-window; both stay plan-asserted in
#     pytest (broadcast counts, no BNLJ);
#   - approx_distinct_quantiles / multimodal_decode_features: rows-only
#     BY DESIGN (sketch tolerance / stubbed decode) — grading them adds
#     a weaker row than the value-checked family reps already in
#     (sketch_kmv_jaccard_intersect r08, multimodal_frame_sample
#     in-window);
#   - ann_ivf_nprobe2_topk / ann_projected_recall_at_3 /
#     ann_matryoshka_recall_at_3: the IVF index + exact-arm machinery
#     is in-window via ann_ivf_index_persisted; recall-vs-exact shapes
#     were graded green r06 (ann_ivf_recall_at_3, ann_pq_adc_recall_at_3);
#   - text_rolling_fingerprint / text_unigram_surprisal /
#     bpe_apply_compression: text family keeps three in-window rows
#     (bpe_token_counts, pmi_collocations, repetition_metrics) over the
#     same tokenize/ngram/join machinery;
#   - chunk_sliding_windows: same posexplode-span machinery as
#     in-window pack_sequences_stats and r08-green dedup_substring_spans;
#   - sample_* (hash_deterministic, mixture_balanced, mixture_epochs,
#     negatives_contrastive): deterministic-hash sampling is in-window
#     twice (sample_stratified_lang, sample_domain_quota) plus the r8
#     addition sample_mixture_temperature; the hash primitive is
#     pytest-asserted (xxhash64 stability);
#   - split_train_holdout / filter_length_percentile /
#     stats_column_profile / contamination_ngram_overlap /
#     dedup_chunk_boilerplate / curation_drop_waterfall: the curation
#     capstone family — hash-split, percentile filter, profile, n-gram
#     overlap all run INSIDE r02-green corpus_build_pipeline /
#     curation_pipeline_docs stages and stay sweep-covered.
# All 24 remain green in the full-registry oracle sweep
# (SWEEP_r09_local.txt) and pytest's per-query oracle spot checks.
# Round-10 rotation (VERDICT r9 #1): CORRECTNESS_r09.json landed 49/50
# green (the one err, multimodal_frame_sample, was a driver-canon crash
# on a BinaryType column — fixed this round by emitting hex(frame) as a
# string; the operator keeps BinaryType internally).  The window rotates
# to the ONLY remaining coverage axis: ALL 41 never-driver-graded
# queries (the 17 round-9 additions + the 24 documented deferrals — the
# transitive-coverage justification for the deferrals is retained in
# git history at this file, round-9 revision) plus 9 re-grades:
#   - multimodal_frame_sample (the only graded-never-green row, fixed);
#   - 8 oldest-green rows chosen for family spread, led by the two
#     r02-graded rows whose code/oracles are the oldest certificates:
#     dedup_embedding_cosine (also the r9 perf-watch query),
#     json_extract_props, stream_late_data_drop, ann_brute_force_topk,
#     dedup_exact, dedup_simhash, parquet_write_roundtrip,
#     seqfile_roundtrip_double_sum (format-layer rep).
# If all 50 grade green, cumulative driver-graded coverage closes at
# 249/249 — every registered query graded at least once.
#
# Round-11 rotation (VERDICT r10 items 1+7): coverage closed at r10 —
# every pre-r10 registration has a driver row, so the window is now the
# steady-state RE-GRADE rotation, COMPUTED by ``tools/next_window.py``
# from git history + the CORRECTNESS_r*.json archive (never-graded
# first, then post-fix non-green, then changed-code-first via git log
# -L over each registration span + referenced operator modules, then
# oldest-green round-robin across families).  This list is that tool's
# verbatim output at the r15 freeze; regenerate it each round.
PRIORITY_ORDER = [
    # r17 minimal adjustment (the steady-state rotation is a build-round
    # activity, but the never-graded-first rule still applies to the one
    # query ADDED this round): the new parallel-scan scaling canary
    # takes the head slot so its oracle gets a driver row in its own
    # round; everything else keeps its r15-computed order.
    "scan_shingle_checksum_canary",  # never-graded (new in r17)
    "multimodal_png_real_decode",  # never-graded (new in r15)
    "dedup_winnow_chunked_pairs",  # never-graded (new in r15)
    "stream_ohlc_candles",  # never-graded (new in r15)
    "multimodal_tiff_real_decode",  # never-graded (new in r15)
    # r15 changed-VALUE rows (sf1-sweep hazard fixes — exact bigint
    # money folds / floor-form quality quantize): previous greens were
    # against the old values, so they lead the re-grade rotation
    "q1_pricing_summary",  # r15: exact bigint-unit money folds
    "join_5way_region_rollup_revenue",  # r15: exact revenue fold
    "sort_topk_revenue_parts",  # r15: exact fold + integer ordering
    "udf_pandas_scalar_charge",  # r15: UDF emits exact 1e-6 units
    "window_range_frame_spend",  # r15: exact cents frame sum
    "seqfile_roundtrip_double_sum",  # r15: exact cents total
    "parquet_partitioned_pruned_read",  # r15: exact cents total
    "agg_having",  # r15: exact cents avg (proactive)
    "mv_incremental_maintenance",  # r15: exact IVM folds + exact certificate
    "text_quality_score",  # r15: floor-form quality quantize
    "pareto_frontier_quality_length",  # r15: floor-form quality
    "sample_weighted_quality",  # r15: floor-form quality
    "timeseries_downsample_ohlc",  # r15: sign-safe okey (same values)
    "dedup_winnow_fingerprint_pairs",  # r15: shared pair-tail refactor
    "session_entry_exit_flows",  # changed since r08: span hadoop_formats_spark/queries/ext.py:4525-4616
    "stream_ttl_band_registry",  # changed since r11: module hadoop_formats_spark/streaming/__init__.py
    "stream_attribution_last_touch",  # changed since r09: module hadoop_formats_spark/streaming/__init__.py
    "stream_tws_running_stats",  # changed since r10: module hadoop_formats_spark/streaming/__init__.py
    "stream_foreach_batch_upsert",  # changed since r10: module hadoop_formats_spark/streaming/__init__.py
    "seqfile_stream_source_counts",  # changed since r06: module hadoop_formats_spark/streaming/__init__.py
    "contamination_ngram_overlap",  # changed since r10: module hadoop_formats_spark/operators/dedup.py
    "dedup_incremental_batch",  # changed since r12: module hadoop_formats_spark/operators/dedup.py
    "dedup_chunk_boilerplate",  # changed since r10: module hadoop_formats_spark/operators/dedup.py
    "dedup_substring_spans",  # changed since r08: module hadoop_formats_spark/operators/dedup.py
    "dedup_containment_excerpts",  # changed since r08: module hadoop_formats_spark/operators/dedup.py
    "seqfile_record_layout_roundtrip",  # oldest-green r04 [seqfile]
    "stream_tumbling_hourly_counts",  # oldest-green r05 [stream]
    "join_asof_purchase_last_click",  # oldest-green r06 [join]
    "text_bigram_lm_score",  # oldest-green r06 [text]
    "q18_large_volume_customer",  # oldest-green r06 [tpch]
    "abtest_cuped_adjusted",  # oldest-green r08 [abtest]
    "intervals_merge_coverage",  # oldest-green r08 [intervals]
    "link_fuzzy_customer_names",  # oldest-green r08 [link]
    "map_constructor_lookup",  # oldest-green r08 [map]
    "null_handling_fill_nullsafe",  # oldest-green r08 [null]
    "projection_compute",  # oldest-green r08 [projection]
    "rollup_region_nation",  # oldest-green r08 [rollup]
    "scd2_point_in_time_join",  # oldest-green r08 [scd2]
    "set_union_distinct",  # oldest-green r08 [set]
    "sketch_kmv_jaccard_intersect",  # oldest-green r08 [sketch]
    "sort_multikey_nulls",  # oldest-green r08 [sort]
    "stats_decayed_engagement",  # oldest-green r08 [stats]
    "struct_map_collect",  # oldest-green r08 [struct]
    "subquery_scalar_near_max",  # oldest-green r08 [subquery]
    "timeseries_ewma_anomaly",  # oldest-green r08 [timeseries]
    "unpivot_price_measures",  # oldest-green r08 [unpivot]
    "window_lag_lead_order_gaps",  # oldest-green r08 [window]
    "agg_exact_percentiles",  # oldest-green r09 [agg]
    "attribution_last_touch",  # oldest-green r09 [attribution]
    "embedding_covariance_pca",  # oldest-green r09 [embedding]
    "feature_target_encoding_oof",  # oldest-green r09 [feature]
    "funnel_conversion",  # oldest-green r09 [funnel]
    "graph_bfs_distances",  # oldest-green r09 [graph]
    "json_from_json_struct",  # oldest-green r09 [json]
    "layout_zorder_clustering",  # oldest-green r09 [layout]
    "math_conditional",  # oldest-green r09 [math]
    "orc_write_roundtrip",  # oldest-green r09 [orc]
    "pack_sequences_stats",  # oldest-green r09 [pack]
    "parquet_schema_evolution",  # oldest-green r09 [parquet]
    "privacy_l_diversity",  # oldest-green r09 [privacy]
    "sample_domain_quota",  # oldest-green r09 [sample]
    "array_higher_order_funcs",  # oldest-green r10 [array]
    "bpe_apply_compression",  # oldest-green r10 [bpe]
]


def _ordered() -> list[str]:
    rank = {name: i for i, name in enumerate(PRIORITY_ORDER)}
    rest = [n for n in QUERIES if n not in rank]
    # dict.fromkeys: defensive dedupe so an accidental PRIORITY_ORDER
    # double-entry can never yield a duplicate name (ADVICE r15)
    return [
        n for n in dict.fromkeys(PRIORITY_ORDER) if n in QUERIES
    ] + rest


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].builder for name in _ordered()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered()
        if QUERIES[name].oracle is not None
    }

"""Training-data curation operators beyond SURVEY §2.3 — deterministic
sampling, batch sessionization, and an end-to-end document-curation
pipeline (quality filter → language filter → dedup → per-slice counts).

These are the remaining ops a 100 TB training-data pipeline needs that
the dedup/ANN/text modules don't already cover.  Sampling is
*deterministic* (md5-threshold on a key, not ``rand()``): the same row
set is selected on every run, on any cluster, and the DuckDB oracle can
reproduce it — which is also the property you want at scale, where a
sample must be stable across retries and re-runs of failed tasks.

Scale notes: hash-sampling is a map-only filter (no shuffle, fully
pushdown-friendly); sessionization shuffles once on user_id and then
runs two window passes within partitions; the curation pipeline is one
shuffle on the dedup fingerprint."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from .registry import register, table


@register(
    "sample_hash_deterministic",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '40'
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Deterministic ~25% sample of orders: md5(key) hex-prefix "
    "threshold ('40'/'100' = 64/256), then grouped totals.  Map-only "
    "filter — no shuffle, stable across runs and task retries.",
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str):
    o = table(spark, sf_dir, "orders")
    keep = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "40"
    return (
        o.filter(keep)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("total"))
        .orderBy("o_orderstatus")
    )


@register(
    "sample_stratified_lang",
    oracle="""
    SELECT lang, count(*) AS n_sampled
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE WHEN lang = 'en' THEN '20' ELSE '80' END
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Stratified deterministic sampling: downsample the majority "
    "language (en at 32/256) while keeping half of everything else — "
    "the standard rebalancing step before training-data mixing.",
)
def sample_stratified_lang(spark: SparkSession, sf_dir: str):
    d = table(spark, sf_dir, "documents")
    threshold = F.when(F.col("lang") == "en", F.lit("20")).otherwise(F.lit("80"))
    keep = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < threshold
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("lang")
    )


@register(
    "sample_mixture_balanced",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    rates AS (
      SELECT lang,
             least(1.0, (SELECT min(n) FROM counts) * 1.0 / n) AS rate
      FROM counts
    )
    SELECT d.lang, count(*) AS n_kept
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE (CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
           * 1.0 / 16777216) < r.rate
    GROUP BY d.lang ORDER BY d.lang
    """,
    doc="Mixture balancing: downsample every language stratum to the "
    "size of the smallest (uniform target mix), with deterministic "
    "md5-threshold acceptance.  Rates are computed distributed "
    "(count per stratum + broadcast scalar min) — the standard "
    "rebalance step before training-data mixing; at 100 TB the "
    "per-stratum counts are one partial-agg pass and the sample "
    "itself stays map-side.",
)
def sample_mixture_balanced(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    rates = counts.crossJoin(F.broadcast(min_n)).select(
        "lang",
        F.least(F.lit(1.0), F.col("min_n") / F.col("n")).alias("rate"),
    )
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        / F.lit(16777216.0)
    )
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(u < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
        .orderBy("lang")
    )


@register(
    "sessionize_events_batch",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS sess_id
      FROM marked
    ), sessions AS (
      SELECT user_id, sess_id, count(*) AS n_events
      FROM numbered GROUP BY user_id, sess_id
    )
    SELECT user_id, count(*) AS n_sessions,
           max(n_events) AS max_session_events,
           CAST(sum(n_events) AS BIGINT) AS n_events_total
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Batch sessionization (gaps-and-islands): a >30 min silence "
    "starts a new session; lag + running-sum windows assign session "
    "ids, then per-user session stats.  The batch twin of "
    "stream_session_windows: one shuffle on user_id, both window "
    "passes run within the same partitioning.",
)
def sessionize_events_batch(spark: SparkSession, sf_dir: str):
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        1,
    ).otherwise(0)
    numbered = e.withColumn("new_sess", new_sess).withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    sessions = numbered.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events")
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("n_events_total"),
        )
        .orderBy("user_id")
    )


@register(
    "curation_pipeline_docs",
    oracle="""
    WITH filtered AS (
      SELECT doc_id, lang, source, text
      FROM documents
      WHERE n_chars BETWEEN 100 AND 500
        AND len(string_split(text, ' ')) >= 15
        AND lang IN ('en', 'de', 'fr')
    ), deduped AS (
      SELECT *, row_number() OVER (
               PARTITION BY md5(lower(text)) ORDER BY doc_id) AS rn
      FROM filtered
    )
    SELECT lang, source, count(*) AS n_docs
    FROM deduped WHERE rn = 1
    GROUP BY lang, source
    ORDER BY lang, source
    """,
    doc="End-to-end curation pipeline: length + token-count quality "
    "gates, language allowlist, exact dedup on a normalized-text "
    "fingerprint (keep lowest doc_id), then per-slice counts — the "
    "standard shape of a pretraining-corpus build, as one declarative "
    "plan with a single shuffle on the fingerprint.",
)
def curation_pipeline_docs(spark: SparkSession, sf_dir: str):
    d = table(spark, sf_dir, "documents")
    filtered = d.filter(
        F.col("n_chars").between(100, 500)
        & (F.size(F.split("text", " ", -1)) >= 15)
        & F.col("lang").isin("en", "de", "fr")
    )
    w = Window.partitionBy(F.md5(F.lower("text"))).orderBy("doc_id")
    deduped = filtered.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        deduped.groupBy("lang", "source")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "source")
    )

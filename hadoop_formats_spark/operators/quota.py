"""Per-domain quota sampling (SURVEY §2.3 [ext]): admit at most
``quota`` documents per domain (URL host, crawl source, …) in a
deterministic order — the web-crawl curation primitive that stops a
handful of giant domains from dominating a training mix.

The reference has no notion of domains (it is a file-format library);
this operator exists for the north-star curation mandate, composing the
same deterministic-md5 admission idea as token-budget sampling
(`queries/curation.py:sample_token_budget`).

Scale design: on Spark ≥ 3.5 the plain window-rank formulation is
ALREADY scale-safe for count quotas — Catalyst's rank-limit pushdown
plans a ``WindowGroupLimit [domain] row_number() quota Partial`` below
the exchange, so every input partition keeps only a top-``quota`` heap
per domain and the shuffle carries ≤ quota·partitions rows per domain,
never a hot domain's full crawl (verified in
``tests/test_queries.py::test_domain_quota_naive_plan_group_limit``).
That makes ``prefilter_safety=None`` the default and recommended path.

``prefilter_safety`` enables the explicit two-phase path for the quota
shapes rank-limit pushdown cannot handle — weighted/token budgets
(admission depends on a running SUM, which has no group-limit), or
engines without WindowGroupLimit:

1. per-domain counts (map-side partial aggregation, one tiny row per
   domain);
2. a map-only hash prefilter: admit doc iff frac(md5(id)) is below
   ``safety·quota/n_domain`` (the threshold table is a broadcast join —
   domains number ~10⁷ at web scale, a few MB);
3. exact rank over the ~safety·quota survivors per domain — the sort
   input is bounded by the quota, not the domain size;
4. an exactness guard: any domain whose survivor count fell below
   ``min(quota, n_domain)`` (possible but exponentially unlikely at
   safety ≥ 2) is re-ranked over its full data, so the result is
   bit-identical to the naive formulation — the fast path is a pure
   optimization, never an approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash_frac(col) -> "F.Column":
    """frac(md5(col)) ∈ [0, 1): first 8 md5 hex digits as a fraction.
    Deterministic, engine-portable (same convention as the md5-ordered
    admission in sample_token_budget)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(1 << 32))


def domain_quota(
    docs: DataFrame,
    *,
    quota: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    prefilter_safety: float | None = None,
) -> DataFrame:
    """Rows of ``docs`` admitted under a per-domain quota, plus their
    ``admit_rank`` (1-based, by (md5(id), id) within the domain —
    deterministic across runs/engines).  Exactly ``min(quota, n_domain)``
    rows survive per domain.

    ``prefilter_safety=None`` (default) → window rank per domain,
    which Spark ≥ 3.5 executes with map-side WindowGroupLimit pruning
    (see module docstring) — the recommended path for count quotas.
    A float (≥ 2 recommended) → the two-phase bounded-sort path, for
    weighted-quota shapes or engines without rank-limit pushdown; the
    exactness guard makes it bit-identical to the naive plan."""
    if quota < 1:
        raise ValueError("quota must be >= 1")
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(domain_col).orderBy("_h", id_col)

    def rank(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_h", h)
            .withColumn("admit_rank", F.row_number().over(w))
            .filter(F.col("admit_rank") <= quota)
            .drop("_h")
        )

    if prefilter_safety is None:
        return rank(docs)
    if prefilter_safety <= 0:
        raise ValueError("prefilter_safety must be positive")

    counts = docs.groupBy(domain_col).agg(F.count("*").alias("_n_dom"))
    thr = counts.select(
        domain_col,
        "_n_dom",
        F.least(
            F.lit(1.0), F.lit(float(prefilter_safety) * quota) / F.col("_n_dom")
        ).alias("_thr"),
    )
    tagged = docs.join(F.broadcast(thr), domain_col)
    surv = tagged.filter(_hash_frac(F.col(id_col)) < F.col("_thr"))

    # exactness guard: a domain underfills iff its survivor count is
    # below what the true result needs (min(quota, n_domain)); those
    # domains — none, in practice — re-rank over their full data.
    surv_counts = surv.groupBy(domain_col).agg(F.count("*").alias("_n_surv"))
    bad = (
        counts.join(surv_counts, domain_col, "left")
        .filter(
            F.coalesce("_n_surv", F.lit(0))
            < F.least(F.lit(quota), F.col("_n_dom"))
        )
        .select(domain_col)
    )
    good = rank(
        surv.join(F.broadcast(bad), domain_col, "left_anti").drop(
            "_n_dom", "_thr"
        )
    )
    fallback = rank(docs.join(F.broadcast(bad), domain_col, "left_semi"))
    return good.unionByName(fallback)

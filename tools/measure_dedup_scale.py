"""Scale evidence for the round-6 dedup additions (VERDICT r6 #5):
measure posting-list and candidate-pair counts for the exact
prefix-filtering similarity join and containment detection at
increasing corpus sizes, against the full inverted index and the
``max_doc_freq``-capped path.

The claim under test: "hot shingles fall outside every prefix", i.e.
the df-ordered prefix index keeps candidate generation small WITHOUT
the recall loss of ``max_doc_freq`` capping.  This prints, per sf dir:

  * posting rows (distinct (doc, shingle)) and prefix rows kept;
  * candidate pairs from (a) the full inverted index, (b) the
    max_doc_freq=50 cap, (c) the prefix index;
  * true J >= t pairs (shared by construction: prefix output ==
    exhaustive output, its oracle certifies that — here we also
    recount);
  * containment: pairs entering the groupBy uncapped vs capped, and
    result rows.

Usage: python tools/measure_dedup_scale.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 and /root/testdata/sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hadoop_formats_spark.operators import dedup as D  # noqa: E402
from hadoop_formats_spark.session import get_spark  # noqa: E402


def measure(spark, sf_dir: str, *, t: float = 0.8, shingle_n: int = 3):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    out = {"sf_dir": sf_dir, "n_docs": n_docs, "threshold": t}

    # --- shared posting index (distinct (doc, shingle)) ---------------
    tok = (
        D._spread(docs, F.col("doc_id"))
        .select(
            F.col("doc_id"),
            F.explode(D.word_shingles("text", shingle_n)).alias("shingle"),
        )
    )
    tok.cache()
    out["posting_rows"] = tok.count()

    # --- prefix index (mirrors prefix_filter_jaccard_pairs) -----------
    tt = t - 0.5e-3
    df_tbl = tok.groupBy("shingle").agg(F.count("*").alias("df"))
    w_pos = Window.partitionBy("doc_id").orderBy("df", "shingle")
    w_all = Window.partitionBy("doc_id")
    ranked = tok.join(df_tbl, "shingle").select(
        "doc_id",
        "shingle",
        F.row_number().over(w_pos).alias("pos"),
        F.count("*").over(w_all).alias("sz"),
    )
    prefix = ranked.filter(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.round(F.lit(tt) * F.col("sz"), 9)) + 1
    ).select("doc_id", "shingle", "sz")
    prefix.cache()
    out["prefix_rows"] = prefix.count()
    out["prefix_rows_pct"] = round(
        100.0 * out["prefix_rows"] / out["posting_rows"], 1
    )

    def pair_count(posting, length_filter: bool) -> int:
        a, b = posting.alias("a"), posting.alias("b")
        cond = (F.col("a.shingle") == F.col("b.shingle")) & (
            F.col("a.doc_id") < F.col("b.doc_id")
        )
        if length_filter:
            cond = cond & (
                F.least("a.sz", "b.sz")
                >= F.round(F.lit(tt) * F.greatest("a.sz", "b.sz"), 9)
            )
        return (
            a.join(b, cond)
            .select("a.doc_id", "b.doc_id")
            .distinct()
            .count()
        )

    sized = tok.join(
        tok.groupBy("doc_id").agg(F.count("*").alias("sz")), "doc_id"
    )
    t0 = time.time()
    out["cand_pairs_full_index"] = pair_count(sized, length_filter=False)
    out["sec_full_index"] = round(time.time() - t0, 1)
    # max_doc_freq=50 cap (the lossy alternative)
    hot = df_tbl.filter(F.col("df") > 50).select("shingle")
    capped = sized.join(hot, "shingle", "left_anti")
    t0 = time.time()
    out["cand_pairs_maxdf50"] = pair_count(capped, length_filter=False)
    out["sec_maxdf50"] = round(time.time() - t0, 1)
    t0 = time.time()
    out["cand_pairs_prefix"] = pair_count(prefix, length_filter=True)
    out["sec_prefix"] = round(time.time() - t0, 1)

    # true pairs (prefix output; its oracle proves == exhaustive)
    out["true_pairs"] = D.prefix_filter_jaccard_pairs(
        docs, threshold=t, shingle_n=shingle_n
    ).count()

    # --- containment (t=0.85): pair-space uncapped vs capped ----------
    out["containment_pairs_uncapped"] = pair_count(
        sized, length_filter=False
    )  # same inverted-index pair space as Jaccard
    out["containment_result_rows"] = D.shingle_containment_pairs(
        docs, threshold=0.85, shingle_n=shingle_n
    ).count()
    out["containment_result_rows_maxdf50"] = D.shingle_containment_pairs(
        docs, threshold=0.85, shingle_n=shingle_n, max_doc_freq=50
    ).count()
    tok.unpersist()
    prefix.unpersist()
    return out


def main():
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark()
    for d in dirs:
        print(json.dumps(measure(spark, d)), flush=True)


if __name__ == "__main__":
    main()

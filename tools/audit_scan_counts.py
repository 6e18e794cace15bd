"""Registry-wide plan audit: how often does each fact table appear in
every query's STATIC physical plan?

Flags queries whose plan references the same source table >= THRESHOLD
times — the re-derivation smell where each downstream branch re-executes
a shared upstream subtree.

IMPORTANT CAVEAT (learned round 12, recorded in SCALE.md): the static
count is an UPPER BOUND, not the executed scan count.  Spark's exchange
reuse dedupes identical repeated subtrees at runtime — the 3-iteration
PageRank shows 28 static lineitem references but ReusedExchange x8 in
the post-execution adaptive plan, and "fixing" it with persist pins
measured a 4.5x regression.  Treat a flag as a prompt to (a) check the
post-execution plan for ReusedExchange (execute the SAME DataFrame —
``df.collect()``, not ``df.count()``, which plans a derived query), and
(b) wall-clock any restructure before keeping it.  A flag is only a
real bug when the repeated subtrees are NOT identical (so reuse cannot
fire) and the table is corpus-scale.

Usage: python tools/audit_scan_counts.py [sf_dir] [threshold]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from hadoop_formats_spark.queries.registry import QUERIES
    from hadoop_formats_spark.session import get_spark
    import hadoop_formats_spark.queries  # noqa: F401  (registers)

    spark = get_spark("scan-audit")
    n_flag = n_err = 0
    for name, spec in QUERIES.items():
        try:
            df = spec.builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # builder-time work can fail loudly here
            print(f"ERR   {name}: {type(ex).__name__}", flush=True)
            n_err += 1
            continue
        counts = {
            t: plan.count(f"{t}.parquet")
            for t in TABLES
            if plan.count(f"{t}.parquet")
        }
        if counts and max(counts.values()) >= threshold:
            print(f"FLAG  {name}: {counts}", flush=True)
            n_flag += 1
    print(f"{n_flag} flagged (>= {threshold} static refs), {n_err} errors")


if __name__ == "__main__":
    main()

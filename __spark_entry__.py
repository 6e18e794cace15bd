"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary) at
sf0.001.  ``queries()`` / ``oracle_sql()`` expose the full registry
from ``hadoop_formats_spark.queries`` — every declared capability from
SURVEY.md §2.2/§2.3 paired with its DuckDB oracle SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_ready(spark: SparkSession) -> None:
    """Register the hadoop_seq datasource + make the package importable
    in Python workers, idempotently, for driver-created sessions."""
    pypath = os.environ.get("PYTHONPATH", "")
    if _REPO not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = _REPO + (os.pathsep + pypath if pypath else "")
    try:
        from hadoop_formats_spark.seqfile.datasource import register

        register(spark)
    except Exception:
        pass  # already registered in this session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_ready(spark)
    from hadoop_formats_spark.queries import QUERIES

    return QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hadoop_formats_spark.queries import query_map

    base = query_map()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_ready(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted entries → rows-only check."""
    from hadoop_formats_spark.queries import oracle_sql_map

    return oracle_sql_map()

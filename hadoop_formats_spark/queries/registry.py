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


_EVENTS_CACHE = "/tmp/hfs_events_us"


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
    try:
        os.rename(tmp, final)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    return final


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return spark.read.parquet(events_path(sf_dir))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }

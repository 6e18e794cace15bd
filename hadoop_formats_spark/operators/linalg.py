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
  emits only the d*(d+1)/2 upper-triangle partial sums;
* ONE tiny groupBy((i, j)) reduces the partials across partitions —
  shuffle volume is |partitions| * d^2 / 2 rows of doubles,
  independent of n;
* the final covariance arithmetic (cov = s_ij/n - mean_i * mean_j)
  runs on the d^2-row table with two broadcast joins of the d-row
  column-sum vector.

Reference parity: none — the reference (a record-format decoder,
src/Data/Hadoop/SequenceFile.hs) has no numeric layer; this is a
north-star extension mandated by the 100 TB embedding-pipeline brief.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinel j-index for column-sum rows; (-1, -1) carries the row count
_SUM = -1


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-batch partial sums for the Gram matrix: rows (i, j, s) with
    i <= j for sum(x_i * x_j), (i, -1, s) for sum(x_i), and (-1, -1, n).
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
                raise ValueError(
                    f"expected dim={dim}, got {x.shape[1]}"
                )
            s = x.T @ x
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu[0], np.arange(dim), [_SUM]]
                    ).astype("int32"),
                    "j": np.concatenate(
                        [iu[1], np.full(dim, _SUM), [_SUM]]
                    ).astype("int32"),
                    "s": np.concatenate(
                        [s[iu], x.sum(axis=0), [float(len(x))]]
                    ),
                }
            )

    parts = df.select(vec_col).mapInPandas(gen, "i int, j int, s double")
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def covariance_matrix(
    df: DataFrame, vec_col: str, dim: int, decimals: int = 6
) -> DataFrame:
    """Population covariance of a vector column as an upper-triangle
    (i, j, cov) DataFrame — cov = E[x_i x_j] - E[x_i] E[x_j].  The
    reduced partial table is d^2-sized, so every join below is a
    broadcast of driver-negligible state."""
    sums = gram_partials(df, vec_col, dim)
    n = (
        sums.filter((F.col("i") == _SUM) & (F.col("j") == _SUM))
        .select(F.col("s").alias("nn"))
    )
    means = sums.filter(
        (F.col("j") == _SUM) & (F.col("i") >= 0)
    ).select(F.col("i").alias("d"), F.col("s").alias("sx"))
    gram = sums.filter(F.col("j") >= 0)
    mi = means.select(F.col("d").alias("i"), F.col("sx").alias("sx_i"))
    mj = means.select(F.col("d").alias("j"), F.col("sx").alias("sx_j"))
    return (
        gram.crossJoin(F.broadcast(n))
        .join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            # + 0.0 collapses IEEE -0.0 (a rounded -1e-15) to +0.0 so
            # both engines stringify identically
            (
                F.round(
                    F.col("s") / F.col("nn")
                    - (F.col("sx_i") / F.col("nn"))
                    * (F.col("sx_j") / F.col("nn")),
                    decimals,
                )
                + 0.0
            ).alias("cov"),
        )
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

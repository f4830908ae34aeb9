"""Distributed PCA over an embedding column (public formulation:
eigendecomposition of the sample covariance; the moments-then-solve
split is the standard scalable recipe).

Scale shape (100 TB): the ONLY thing that crosses the cluster is the
per-batch moment triple (count, sum vector, sum-of-outer-products) —
one row of ~d + d² doubles per Arrow batch, a few KB each.  For
d = 64 that is 4 KB per batch regardless of corpus size, so the
driver-side combine is bounded by the number of batches, not rows.
The d×d eigensolve (numpy ``eigh``, symmetric) is model-scale work
that belongs on the driver, exactly like the IVF/PQ codebook training
in operators/similarity.py.

Determinism: moment sums are float64 accumulated in batch order, so
the last ulp depends on partition layout; gate outputs are rounded
and thresholded, never hash-compared raw.  Component SIGNS are
canonicalized (largest-|coefficient| entry made positive) so
projections are reproducible across eigensolver conventions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def covariance_moments(df: DataFrame, vec_col: str = "embedding", dim: int = 64):
    """Compute (n, mean, covariance) of a vector column with one pass:
    mapInPandas emits one (count, sum, outer-sum) row per Arrow batch;
    the bounded combine happens driver-side in numpy."""
    schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.ArrayType(T.DoubleType())),
            T.StructField("ss", T.ArrayType(T.DoubleType())),
        ]
    )

    def _moments(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "ss": [(X.T @ X).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(_moments, schema).collect()
    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    ss = np.sum([np.array(r.ss) for r in rows], axis=0).reshape(dim, dim)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_fit(df: DataFrame, k: int = 8, vec_col: str = "embedding", dim: int = 64):
    """Fit a k-component PCA: distributed moments + driver eigensolve.
    Returns (mean, components (k×dim), explained (k,), total_var)."""
    _, mean, cov = covariance_moments(df, vec_col, dim)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = eigvals[order]
    comps = eigvecs[:, order[:k]].T  # k×dim
    # canonical sign: make each component's largest-|coeff| entry positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigvals[:k], float(eigvals.sum())


def pca_project(
    df: DataFrame,
    mean: "np.ndarray",
    components: "np.ndarray",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto fitted components (Arrow-batched numpy
    matmul; mean and components ride along in the closure — k×d
    doubles, model-scale broadcast)."""
    mu = mean.astype("float64")
    W = components.astype("float64")  # k×d

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _proj(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype("float64") - mu
        P = X @ W.T
        return pd.Series(list(P))

    return df.withColumn(out_col, _proj(F.col(vec_col)))

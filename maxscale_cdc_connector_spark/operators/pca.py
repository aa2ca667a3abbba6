"""PCA over an embedding column — covariance via distributed moment
partials, eigendecomposition on the driver (dim×dim is model state).

Training-data pipelines use this for embedding whitening, diversity
sampling, and as the projection step before cheap clustering. The scale
shape mirrors operators/kmeans.py: ``mapInPandas`` emits ONE partial
row per task — (count, sum_vec, sum of outer products, flattened) —
computed with BLAS (`x.T @ x`) over each Arrow batch, so the driver
reduces P rows of dim+dim² floats regardless of corpus size. One scan,
zero shuffles, nothing corpus-sized near the driver.

Eigenvector sign is fixed by convention (largest-|component| entry made
positive) so projections are deterministic across runs and BLAS builds
up to that entry's tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "project"]

_MOMENTS_SCHEMA = "n long, s array<double>, m array<double>"


def _moment_partials_gen(vec_col: str):
    def gen(batches):
        n = 0
        s = None
        m = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            if s is None:
                dim = x.shape[1]
                s = np.zeros(dim)
                m = np.zeros((dim, dim))
            n += len(x)
            s += x.sum(axis=0)
            m += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "m": [m.ravel().tolist()]}
            )

    return gen


def pca_fit(
    df: DataFrame, *, vec_col: str = "embedding", k: int = 8
) -> tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Fit PCA; return (eigvals desc [k], components [k×dim], mean, n).

    One distributed job (moment partials), then a driver-side
    ``eigh`` of the dim×dim population covariance.
    """
    partials = df.select(vec_col).mapInPandas(
        _moment_partials_gen(vec_col), _MOMENTS_SCHEMA
    ).toPandas()  # one row per task — model state, not data
    n = int(partials["n"].sum())
    s = np.sum(np.stack(partials["s"].to_numpy()), axis=0)
    dim = len(s)
    m = np.sum(np.stack(partials["m"].to_numpy()), axis=0).reshape(dim, dim)
    mean = s / n
    cov = m / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    vals = np.maximum(eigvals[order], 0.0)
    comps = eigvecs[:, order].T  # k × dim
    # Sign convention: the largest-|x| entry of each component is positive.
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return vals, comps, mean, n


def project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Add ``out_col``: the centered projection onto ``components``.

    Vectorized pandas UDF — one (B×dim)·(dim×k) matmul per Arrow batch.
    """
    comp_t = np.asarray(components, dtype=np.float64).T  # dim × k
    mu = np.asarray(mean, dtype=np.float64)

    @F.pandas_udf("array<double>")
    def proj(vecs: pd.Series) -> pd.Series:
        x = np.asarray(vecs.tolist(), dtype=np.float64)
        if x.size == 0:
            return pd.Series([], dtype=object)
        p = (x - mu) @ comp_t
        return pd.Series(list(p))

    return df.withColumn(out_col, proj(F.col(vec_col)))

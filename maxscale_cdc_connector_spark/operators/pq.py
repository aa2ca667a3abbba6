"""Product quantization (PQ) for embedding columns — the compression
leg of the ANN toolkit (Jégou, Douze, Schmid: "Product Quantization for
Nearest Neighbor Search", TPAMI 2011).

A 64-dim float32 vector costs 256 bytes; PQ with m=8 subspaces and
k=16 centroids per codebook stores 8 nibble codes — 4 bytes, a 64×
compression — while asymmetric-distance (ADC) search scans the CODES
with a per-query lookup table and never touches the original floats.
At 100 TB of embeddings this is the difference between an index that
fits in cluster memory and one that doesn't.

Spark-first shape, mirroring ``operators/kmeans.py``:

* **Joint training** — ONE ``mapInPandas`` scan per Lloyd iteration
  trains ALL m codebooks simultaneously: each task emits per
  (subspace, cluster) partial sums (≤ m·k rows — model state, not
  data), the driver reduces them. Model state is m·k·(dim/m) floats,
  shipped into the next iteration's closure like a broadcast var.
* **Encoding** — one Arrow-batched scan; per batch, m small BLAS
  distance computations; emits the m-code array plus the exact
  per-vector reconstruction error (the accept/reject QA number).
* **ADC top-k** — the m×k distance table for a query is computed once
  on the driver (tiny), the scan gathers ``table[j, code_j]`` per row
  vectorized in NumPy, and the global top-k goes through
  ``TakeOrderedAndProject`` — per-partition heaps, never a full sort.

Determinism: codebooks seed from the first k vectors in ``id_col``
order (same convention as kmeans_fit), ``np.argmin`` breaks ties
toward the lower code, and the fold order inside the partial sums is
fixed per partition — repeated runs produce identical codes.

Not SQL-expressible (iterative trained state), so registered queries
are rows-only; tests/test_training_queries.py pins: duplicate vectors
get identical codes, ADC self-search ranks a vector's exact duplicate
first, reconstruction error shrinks as k grows, and exact determinism
across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["pq_fit", "pq_encode", "adc_topk"]

_PARTIAL_SCHEMA = StructType(
    [
        StructField("sub", IntegerType()),
        StructField("cluster", IntegerType()),
        StructField("n", LongType()),
        StructField("sum_vec", ArrayType(DoubleType())),
        StructField("sum_dist2", DoubleType()),
    ]
)


def _split(x: np.ndarray, m: int) -> list[np.ndarray]:
    """B × dim → list of m views B × (dim/m). Driver-side use only."""
    return np.split(x, m, axis=1)


def _assign_sub_inline():
    """Argmin-centroid assignment for one subspace, defined as a nested
    function so cloudpickle ships it BY VALUE inside executor closures
    (a reference to this module would fail on workers without the repo
    on sys.path).
    """

    def assign_sub(xs: np.ndarray, cb: np.ndarray):
        d2 = ((xs * xs).sum(axis=1)[:, None] + (cb * cb).sum(axis=1)[None, :]
              - 2.0 * xs @ cb.T)
        # Clamp fp negatives near 0 (same as operators/kmeans._make_d2):
        # when a subvector EQUALS its centroid — routine on duplicate-
        # heavy corpora, where a cluster's mean collapses onto the
        # duplicated vector — |x|²+|c|²−2x·c differs from 0 by BLAS-vs-
        # sum ulp noise and can go negative, and pq_encode's
        # sqrt(Σ_j d2_j) would then emit NaN reconstruction errors.
        np.maximum(d2, 0.0, out=d2)
        code = np.argmin(d2, axis=1)
        return code, d2[np.arange(len(xs)), code]

    return assign_sub


def _partials_gen(codebooks: list[np.ndarray], vec_col: str, m: int):
    # NOTE: the closure must be self-contained (no references to
    # module-level helpers) — executor Python workers may not have this
    # package on sys.path when the driver adds it via sys.path.insert,
    # and cloudpickle serializes module functions by reference.
    assign_sub = _assign_sub_inline()

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            rows: dict[tuple[int, int], list] = {}
            for j, xs in enumerate(np.split(x, m, axis=1)):
                code, d2 = assign_sub(xs, codebooks[j])
                for c in np.unique(code):
                    mask = code == c
                    rows[(j, int(c))] = [
                        int(mask.sum()),
                        xs[mask].sum(axis=0).tolist(),
                        float(d2[mask].sum()),
                    ]
            yield pd.DataFrame(
                {
                    "sub": [s for s, _ in rows],
                    "cluster": [c for _, c in rows],
                    "n": [v[0] for v in rows.values()],
                    "sum_vec": [v[1] for v in rows.values()],
                    "sum_dist2": [v[2] for v in rows.values()],
                }
            )

    return gen


def pq_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    iters: int = 4,
) -> tuple[list[list[list[float]]], list[float]]:
    """Train m codebooks of k centroids each; return (codebooks, mse_per_iter).

    One scan per iteration trains every codebook: the partials frame has
    at most m·k rows per task. ``mse_per_iter`` is the mean squared
    reconstruction error measured at each iteration's assignment
    (non-increasing, Lloyd's monotonicity summed over independent
    subspace objectives).
    """
    seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    seed = np.asarray([list(r[0]) for r in seed_rows], dtype=np.float64)  # k × dim
    codebooks = [s.copy() for s in _split(seed, m)]  # m × (k × d_sub)
    mses: list[float] = []
    # Lazy persist is race-safe here (r13 audit): the first action is
    # iteration 1's single mapInPandas chain — ONE reading branch, so
    # the AQE population race (cache.eager_persist) cannot occur, and
    # every later iteration reads a populated cache.
    cached = df.select(vec_col).persist()
    try:
        n_total = None
        for _ in range(iters):
            partials = cached.mapInPandas(
                _partials_gen(codebooks, vec_col, m), _PARTIAL_SCHEMA
            ).toPandas()  # ≤ m·k rows per task
            if n_total is None:
                n_total = int(partials[partials["sub"] == 0]["n"].sum())
            mses.append(float(partials["sum_dist2"].sum()) / max(n_total, 1))
            grouped = partials.groupby(["sub", "cluster"]).agg(
                n=("n", "sum"),
                sv=("sum_vec", lambda s: np.sum(np.stack(s.to_numpy()), axis=0)),
            )
            for j in range(m):
                for c in range(k):
                    if (j, c) in grouped.index:
                        row = grouped.loc[(j, c)]
                        codebooks[j][c] = row["sv"] / row["n"]
                    # empty cluster keeps its previous centroid
    finally:
        cached.unpersist()
    return [cb.tolist() for cb in codebooks], mses


_ENCODE_SCHEMA = "vec_id bigint, codes array<int>, recon_err double"


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes[m], recon_err): one Arrow-batched scan, m small GEMMs."""
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    m = len(cbs)

    assign_sub = _assign_sub_inline()

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int64)
            err = np.zeros(len(x), dtype=np.float64)
            for j, xs in enumerate(np.split(x, m, axis=1)):
                code, d2 = assign_sub(xs, cbs[j])
                codes[:, j] = code
                err += d2
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "codes": list(codes),
                    "recon_err": np.sqrt(err),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, _ENCODE_SCHEMA)


def adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    *,
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes.

    The m×k_cb lookup table (squared distance from each query subvector
    to every centroid) is computed ONCE driver-side and closed over; the
    scan gathers ``sum_j table[j, code_j]`` per row with one vectorized
    NumPy take per subspace — the original vectors are never read.
    Global top-k via orderBy(...).limit(k) → TakeOrderedAndProject.
    """
    cbs = [np.asarray(cb, dtype=np.float64) for cb in codebooks]
    q = np.asarray(query, dtype=np.float64)
    qs = _split(q[None, :], len(cbs))
    table = np.stack(
        [((cb - qv) ** 2).sum(axis=1) for cb, qv in zip(cbs, [s[0] for s in qs])]
    )  # m × k_cb

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        c = np.asarray(codes.tolist(), dtype=np.int64)  # B × m
        d = np.zeros(len(c), dtype=np.float64)
        for j in range(table.shape[0]):
            d += table[j][c[:, j]]
        return pd.Series(d)

    return (
        encoded.select("vec_id", adc(F.col("codes")).alias("adc_dist2"))
        .orderBy(F.asc("adc_dist2"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", F.round(F.col("adc_dist2"), 6).alias("adc_dist2"))
    )

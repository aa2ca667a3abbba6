"""Iterative Lloyd k-means over an embedding column — the engine's
iterative-algorithm pattern (SURVEY.md §2B extension: training-data
pipelines cluster embeddings for IVF coarse quantizers, topic balance,
and diversity sampling).

Spark-first shape: the model state (k × dim floats) lives on the driver
and enters each iteration inside a vectorized Pandas UDF closure (tiny —
k*dim floats, shipped once per stage like a broadcast var), so
assignment is one Arrow-batched scan doing a single BLAS matmul per
batch: ``dist²(X, C) = |X|² + |C|² − 2·X·Cᵀ``. The update is one
``groupBy(cluster)`` with per-component ``avg`` (map-side partial agg,
shuffle = k rows per partition). Per iteration: one scan + one shuffle
of k rows; nothing corpus-sized ever reaches the driver, and the input
is persisted across iterations so the parquet scan happens once.

Why a Pandas UDF and not ``zip_with``/``aggregate``: Catalyst's
higher-order functions are *interpreted* per array element — k=8 ×
dim=64 ≈ 1k lambda evaluations per row per scan — which measured ~10×
slower than one NumPy matmul over an Arrow batch. Dense linear algebra
is the documented exception to "stay JVM-side" (MLlib itself drops to
native BLAS here).

Not SQL-expressible (the loop carries state across actions), so the
registered query is rows-only; tests/test_training_queries.py pins the
invariants instead: assignment optimality against the final centroids,
monotone non-increasing inertia, and exact determinism across runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType, DoubleType

__all__ = ["kmeans_fit"]

_ASSIGN_SCHEMA = StructType(
    [
        StructField("cluster", IntegerType()),
        StructField("dist2", DoubleType()),
    ]
)


def _exact_sq_norm(m: np.ndarray) -> np.ndarray:
    """Row-wise |m|² by left-to-right per-component accumulation."""
    s = m[:, 0] * m[:, 0]
    for d in range(1, m.shape[1]):
        s = s + m[:, d] * m[:, d]
    return s


def _centroid_sq(cmat: np.ndarray, exact_dot: bool) -> np.ndarray:
    return _exact_sq_norm(cmat) if exact_dot else (cmat * cmat).sum(axis=1)


def _make_d2(cmat: np.ndarray, c_sq: np.ndarray, exact_dot: bool):
    """Build the worker-side dist²(X, C) = |X|² + |C|² − 2·X·Cᵀ kernel
    (clamped at 0) as a NESTED closure: cloudpickle ships it by VALUE
    (code + captured arrays), never by module reference — the driver
    contract runs from outside the repo root, where executors cannot
    import this package (r9 review regression: a module-level helper
    referenced from the shipped generator broke exactly that way).

    ``exact_dot=False`` (default): one BLAS matmul per batch — the fast
    path for real embedding dims. ``exact_dot=True``: every dot is a
    left-to-right per-component loop with separate multiply and add
    roundings. BLAS dgemm's accumulation order and FMA contraction are
    build-dependent, so a SQL oracle replaying the distance as a
    sequential N-term dot can spuriously flip an argmin at one ulp on a
    different BLAS (ADVICE r8); the sequential path makes the float ops
    literally identical to the oracle's expression on any build. Use it
    when the run must be exactly replayable (small dims — the loop is
    O(dim) NumPy vector ops, fine at dim≈5, wrong tool at dim≈512).
    """

    def d2_of(x: np.ndarray) -> np.ndarray:
        if exact_dot:
            xx = x[:, 0] * x[:, 0]
            for d in range(1, x.shape[1]):
                xx = xx + x[:, d] * x[:, d]
            xc = np.multiply.outer(x[:, 0], cmat[:, 0])
            for d in range(1, x.shape[1]):
                xc = xc + np.multiply.outer(x[:, d], cmat[:, d])
            d2 = (xx[:, None] + c_sq[None, :]) - 2.0 * xc
        else:
            d2 = (x * x).sum(axis=1)[:, None] + c_sq[None, :] - 2.0 * (x @ cmat.T)
        np.maximum(d2, 0.0, out=d2)  # clamp fp negatives near 0
        return d2

    return d2_of


def _assign_udf(centroids: list[list[float]], exact_dot: bool = False):
    """Vectorized (Arrow-batched) argmin-centroid assignment.

    One matmul per batch; ``np.argmin`` returns the FIRST minimum, so
    ties break toward the lower cluster id — deterministic.
    """
    cmat = np.asarray(centroids, dtype=np.float64)  # k × dim
    d2_of = _make_d2(cmat, _centroid_sq(cmat, exact_dot), exact_dot)

    @F.pandas_udf(_ASSIGN_SCHEMA)
    def assign(vecs: pd.Series) -> pd.DataFrame:
        x = np.asarray(vecs.tolist(), dtype=np.float64)  # B × dim
        if x.size == 0:
            return pd.DataFrame({"cluster": [], "dist2": []})
        d2 = d2_of(x)
        best = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": best.astype(np.int32),
                "dist2": d2[np.arange(len(best)), best],
            }
        )

    return assign


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    exact_dot: bool = False,
) -> DataFrame:
    """Add ``cluster`` (argmin centroid) and ``dist2`` columns."""
    a = _assign_udf(centroids, exact_dot)(F.col(vec_col))
    return (
        df.withColumn("_a", a)
        .withColumns({"cluster": F.col("_a.cluster"), "dist2": F.col("_a.dist2")})
        .drop("_a")
    )


def _partial_stats_gen(
    centroids: list[list[float]], vec_col: str, exact_dot: bool = False
):
    """mapInPandas generator: per-task Lloyd partials (k rows).

    Map-side combine in NumPy — each task emits at most k rows of
    (cluster, n, sum_dist2, sum_vec), so the driver reduce sees k×P
    model-state rows, never data. Same dataflow as MLlib's
    ``treeAggregate`` update step.
    """
    cmat = np.asarray(centroids, dtype=np.float64)
    d2_of = _make_d2(cmat, _centroid_sq(cmat, exact_dot), exact_dot)
    k, dim = cmat.shape

    def gen(batches):
        n = np.zeros(k, dtype=np.int64)
        sd2 = np.zeros(k, dtype=np.float64)
        sv = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            d2 = d2_of(x)
            best = d2.argmin(axis=1)
            n += np.bincount(best, minlength=k)
            sd2 += np.bincount(best, weights=d2[np.arange(len(best)), best], minlength=k)
            np.add.at(sv, best, x)
        nz = np.nonzero(n)[0]
        yield pd.DataFrame(
            {
                "cluster": nz.astype(np.int32),
                "n": n[nz],
                "sum_dist2": sd2[nz],
                # object dtype: an EMPTY task would otherwise produce a
                # float64 ndarray column, which Arrow cannot convert to
                # list<double> (empty partitions are routine when the
                # input has fewer rows than shuffle partitions).
                "sum_vec": pd.Series(
                    [sv[j].tolist() for j in nz], dtype=object
                ),
            }
        )

    return gen


_PARTIAL_SCHEMA = (
    "cluster int, n long, sum_dist2 double, sum_vec array<double>"
)


def kmeans_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
    exact_dot: bool = False,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Run ``iters`` Lloyd iterations; return (assigned, centroids, inertias).

    ``assigned`` is ``df`` plus ``cluster``/``dist2`` for the FINAL
    centroids (lazy — one more scan when acted on). ``inertias`` has one
    summed-``dist2`` entry per iteration, measured at that iteration's
    assignment; it is non-increasing (Lloyd's monotonicity).

    Each iteration is ONE job: scan → mapInPandas partials (k rows per
    task) → driver reduce of k×P rows. No per-component aggregate
    expressions, so Catalyst compile cost is independent of dim and k.
    (At extreme partition counts, insert a groupBy('cluster') between
    the partials and the driver, as treeAggregate would.)
    """
    # Lazy persist is race-safe here (r13 audit): the first action is
    # the seed's TakeOrdered below — ONE reading branch, so the AQE
    # population race (cache.eager_persist) cannot occur, and every
    # later read hits a populated cache. Persisting (id, vec) and
    # seeding FROM the cache folds cache population into the seed job
    # (the r15 form seeded off the raw frame and paid one extra full
    # input scan); the per-iteration select prunes the id column at
    # the in-memory scan, so the Arrow path still ships vectors only.
    cached = df.select(id_col, vec_col).persist()
    inertias: list[float] = []
    try:
        # Seeding INSIDE the try (ADVICE r16): an exception here (bad
        # vec column, OOM in TakeOrdered) must still unpersist the
        # session cache entry on the way out.
        seed_rows = cached.orderBy(id_col).limit(k).select(vec_col).collect()
        centroids = [list(r[0]) for r in seed_rows]
        vecs = cached.select(vec_col)
        for _ in range(iters):
            partials = vecs.mapInPandas(
                _partial_stats_gen(centroids, vec_col, exact_dot), _PARTIAL_SCHEMA
            ).toPandas()  # ≤ k rows per task — model state, not data
            inertias.append(float(partials["sum_dist2"].sum()))
            agg = partials.groupby("cluster").agg(
                n=("n", "sum"),
                sv=("sum_vec", lambda s: np.sum(np.stack(s.to_numpy()), axis=0)),
            )
            # An empty cluster keeps its previous centroid.
            centroids = [
                (agg.loc[j, "sv"] / agg.loc[j, "n"]).tolist()
                if j in agg.index
                else centroids[j]
                for j in range(k)
            ]
    finally:
        cached.unpersist()
    return assign_clusters(df, centroids, vec_col, exact_dot), centroids, inertias

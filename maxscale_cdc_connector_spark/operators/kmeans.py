"""Iterative Lloyd k-means over an embedding column — the engine's
iterative-algorithm pattern (SURVEY.md §2B extension: training-data
pipelines cluster embeddings for IVF coarse quantizers, topic balance,
and diversity sampling).

Spark-first shape: the model state (k × dim floats) lives on the driver
and enters each iteration as *literal* arrays, so assignment is one
full-codegen scan — ``array_min`` over per-centroid squared distances
built from ``zip_with``/``aggregate`` — and the update is one
``groupBy(cluster)`` with per-component ``avg`` (map-side partial agg,
shuffle = k rows per partition). Per iteration: one scan + one shuffle
of k rows; nothing corpus-sized ever reaches the driver. This is the
same dataflow as MLlib's KMeans with explicit DataFrame ops, minus
sampling-based init (init is deterministic: the k rows with the
smallest ids) so results are reproducible for the driver's rows-only
check.

Not SQL-expressible (the loop carries state across actions), so the
registered query is rows-only; tests/test_training_queries.py pins the
invariants instead: assignment optimality against the final centroids,
monotone non-increasing inertia, and exact determinism across runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit"]


def _dist2(vec_col: str, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, fully JVM-side."""
    lit_c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add ``cluster`` (argmin centroid) and ``dist2`` columns.

    ``array_min`` over ``struct(dist2, idx)`` compares lexicographically,
    so ties break toward the lower cluster id — deterministic.
    """
    choices = F.array(
        *[
            F.struct(_dist2(vec_col, c).alias("d"), F.lit(j).alias("c"))
            for j, c in enumerate(centroids)
        ]
    )
    best = F.array_min(choices)
    return df.withColumns({"cluster": best["c"], "dist2": best["d"]})


def kmeans_fit(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> tuple[DataFrame, list[list[float]], list[float]]:
    """Run ``iters`` Lloyd iterations; return (assigned, centroids, inertias).

    ``assigned`` is ``df`` plus ``cluster``/``dist2`` for the FINAL
    centroids (lazy — one more scan when acted on). ``inertias`` has one
    summed-``dist2`` entry per iteration, measured at that iteration's
    assignment; it is non-increasing (Lloyd's monotonicity).
    """
    seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(r[0]) for r in seed_rows]
    dim = len(centroids[0])
    inertias: list[float] = []
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, vec_col)
        stats = assigned.groupBy("cluster").agg(
            F.sum("dist2").alias("inertia"),
            *[F.avg(F.col(vec_col)[i]).alias(f"m{i}") for i in range(dim)],
        ).collect()  # k rows of model state — not data
        inertias.append(sum(r["inertia"] for r in stats))
        by_cluster = {r["cluster"]: [r[f"m{i}"] for i in range(dim)] for r in stats}
        # An empty cluster keeps its previous centroid.
        centroids = [by_cluster.get(j, centroids[j]) for j in range(k)]
    return assign_clusters(df, centroids, vec_col), centroids, inertias

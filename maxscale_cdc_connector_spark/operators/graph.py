"""Connected components over an edge DataFrame — the dup-cluster step a
training-data pipeline runs after near-dup pair detection (MinHash/LSH
pairs say "A ~ B"; components say "this whole set is one document",
so one canonical copy is kept and the rest dropped).

Spark-first shape: iterative min-label propagation. Each iteration is
one equi-join (neighbor labels) + one groupBy min — both shuffle on the
node key, so successive iterations reuse the same hash partitioning.
Labels only ever decrease, so convergence is detected by comparing
``sum(label)`` across iterations (one scalar action; no extra join).
Per-iteration ``localCheckpoint`` truncates the logical plan, keeping
analysis cost constant across iterations (an unbounded iterative join
plan grows exponentially in Catalyst otherwise).

Iteration count is the graph diameter. Near-dup clusters are
low-diameter (a dup cluster's edges come from shared shingles, which
form near-cliques), so the default cap of 15 is generous; for
high-diameter graphs at 100 TB scale, switch to the large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) which converges in O(log^2 n) rounds —
same join/groupBy primitives, different propagation rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free the block-manager storage behind a localCheckpointed frame.

    ``localCheckpoint`` truncates lineage, so its blocks are the ONLY
    copy — call this strictly after the last action that reads ``df``.
    Reaches through LogicalRDD (private API); degrades to a no-op if the
    plan shape ever changes, in which case the ContextCleaner reclaims
    the blocks on JVM GC instead (later, but safely).
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 15,
) -> DataFrame:
    """Label each node with the smallest node id in its component.

    ``edges`` is undirected input (each pair listed once suffices).
    Returns ``(node, component)``; only nodes appearing in ``edges`` are
    labeled (isolated nodes have no edges to say they exist).

    Raises ``RuntimeError`` if not converged within ``max_iters`` —
    non-convergence means the diameter exceeded the cap, and a silently
    partial labeling would split clusters.
    """
    half = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = half.union(half.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    spent = [sym]  # checkpoints to free; sym is not part of the result
    try:
        prev_sum = labels.agg(F.sum("component")).collect()[0][0]
        for _ in range(max_iters):
            nbr_min = (
                sym.join(labels, sym.b == labels.node)
                .groupBy("a")
                .agg(F.min("component").alias("nbr_component"))
            )
            new_labels = (
                labels.join(nbr_min, labels.node == nbr_min.a, "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce("nbr_component", F.col("component")),
                    ).alias("component"),
                )
                .localCheckpoint(eager=True)
            )
            spent.append(labels)  # superseded; safe to free now
            labels = new_labels
            cur_sum = labels.agg(F.sum("component")).collect()[0][0]
            if cur_sum == prev_sum:  # labels are monotone non-increasing
                return labels
            prev_sum = cur_sum
        spent.append(labels)
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations; "
            "graph diameter exceeds cap — raise max_iters or use star-contraction"
        )
    finally:
        # Free every superseded checkpoint; only the returned frame's
        # blocks stay (the caller owns those — O(|nodes|), not edges).
        for df in spent:
            _release_local_checkpoint(df)

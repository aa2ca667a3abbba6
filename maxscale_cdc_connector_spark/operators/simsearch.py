"""Similarity search over embedding columns.

Three tiers, in ascending scale:

* ``topk_cosine`` — brute-force scan against a broadcast query vector:
  one pass over the table, JVM-side dot products, global top-k via
  ``TakeOrderedAndProject`` (per-partition heaps, no full sort). This is
  the exact baseline and is already the right plan for "one query vector
  against everything" at any scale — it's a single scan.
* ``pairwise_threshold`` — exact all-pairs above a similarity threshold.
  Quadratic by definition; kept for oracle-checkable correctness and
  small/medium tables. The scale path for all-pairs is LSH (see dedup)
  or IVF blocking below.
* ``ivf_topk`` — IVF-style approximate search: vectors are assigned to
  their nearest centroid bucket (the coarse quantizer); a query probes
  only the ``nprobe`` nearest buckets. Deterministic here: centroids are
  a fixed subset of the data (every 40th vector), so results are
  reproducible and testable. At 100 TB the bucket assignment is a
  one-off batch job and the probe is a partition-pruned scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maxscale_cdc_connector_spark.functions.vectors import dot

CENTROID_STRIDE = 40
NPROBE = 3


def topk_cosine(
    embeddings: DataFrame, query: DataFrame, k: int = 20, id_col: str = "vec_id"
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame with an
    ``embedding`` column. Embeddings in the test corpus are L2-normalized,
    so cosine ≡ dot product (norms verified in tests)."""
    q = F.broadcast(query.select(F.col("embedding").alias("q_embedding")))
    scored = embeddings.crossJoin(q).select(
        F.col(id_col), dot("embedding", "q_embedding").alias("sim")
    )
    return (
        scored.orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("sim", 5).alias("sim"))
    )


def pairwise_threshold(
    embeddings: DataFrame, tau: float, id_col: str = "vec_id"
) -> DataFrame:
    """Exact all-pairs with cosine ≥ tau (upper triangle)."""
    a = embeddings.select(F.col(id_col).alias("vec_a"), F.col("embedding").alias("emb_a"))
    b = embeddings.select(F.col(id_col).alias("vec_b"), F.col("embedding").alias("emb_b"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    scored = pairs.select("vec_a", "vec_b", dot("emb_a", "emb_b").alias("sim"))
    return scored.filter(F.col("sim") >= tau).select(
        "vec_a", "vec_b", F.round("sim", 5).alias("sim")
    )


def _centroids(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Deterministic coarse quantizer: every CENTROID_STRIDE-th vector."""
    return embeddings.filter(F.col(id_col) % CENTROID_STRIDE == 0).select(
        F.col(id_col).alias("cid"), F.col("embedding").alias("c_embedding")
    )


def assign_buckets(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Nearest-centroid bucket per vector: broadcast the (small) centroid
    set, argmax dot via max_by — one scan, no shuffle of the vectors."""
    cents = F.broadcast(_centroids(embeddings, id_col))
    scored = embeddings.crossJoin(cents).select(
        F.col(id_col),
        F.col("embedding"),
        F.col("cid"),
        dot("embedding", "c_embedding").alias("sim"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by("cid", F.struct(F.col("sim"), -F.col("cid"))).alias("bucket"),
        F.first("embedding").alias("embedding"),
    )


def ivf_topk(
    embeddings: DataFrame, query: DataFrame, k: int = 20, id_col: str = "vec_id"
) -> DataFrame:
    """Approximate top-k: probe only the NPROBE buckets nearest the query.

    The deterministic tiebreak (higher sim, then lower cid) makes the
    probe set — and therefore the result — reproducible.
    """
    cents = F.broadcast(_centroids(embeddings, id_col))
    q = F.broadcast(query.select(F.col("embedding").alias("q_embedding")))
    probe = (
        cents.crossJoin(q)
        .select("cid", dot("c_embedding", "q_embedding").alias("sim"))
        .orderBy(F.desc("sim"), F.asc("cid"))
        .limit(NPROBE)
        .select("cid")
    )
    bucketed = assign_buckets(embeddings, id_col)
    candidates = bucketed.join(
        F.broadcast(probe), bucketed.bucket == probe.cid, "left_semi"
    )
    scored = candidates.crossJoin(q).select(
        F.col(id_col), dot("embedding", "q_embedding").alias("sim")
    )
    return (
        scored.orderBy(F.desc("sim"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("sim", 5).alias("sim"))
    )

"""One-off decomposition of dedup_cluster_cc (q23): stage-by-stage timing.

Times, in one warm session (min-of-N):
  arrs   — duplicated corpus -> shingle_arrays -> sort -> eager_persist
  cand   — prefix explode + self-join + distinct (noop sink)
  pairs  — + verification joins + finalize checkpoint
  cc     — connected_components over materialized edges
Prints one line per stage plus the canary.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _canary_sec, _materialize
from maxscale_cdc_connector_spark import queries as _queries
from maxscale_cdc_connector_spark.session import get_session, load_table
from maxscale_cdc_connector_spark.operators import dedup as D
from maxscale_cdc_connector_spark.operators.cache import eager_persist, finalize
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def main() -> None:
    _queries.load_all()
    spark = get_session("decompose-q23")
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    # warm up the JVM/codegen
    _materialize(load_table(spark, "documents", SF).limit(10))
    print(f"canary_sec={_canary_sec(spark):.3f}", flush=True)

    def timed(label, fn):
        best = None
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: min={best:.3f}", flush=True)

    def build_arrs():
        corpus = D.duplicated_corpus(docs)
        arrs = eager_persist(
            D.shingle_arrays(D._ensure_parallelism(corpus))
            .withColumn("shingles", F.sort_array("shingles"))
        )
        return arrs

    def t_arrs():
        arrs = build_arrs()
        arrs.unpersist(blocking=False)

    def cand_of(arrs):
        t_dec = F.lit(0.8).cast("decimal(10,6)")
        plen = (F.col("set_size") - F.ceil(t_dec * F.col("set_size")) + 1).cast("int")
        prefixes = arrs.select(
            F.col("doc_id"), F.col("set_size"),
            F.explode(F.slice(F.col("shingles"), F.lit(1), plen)).alias("shingle"),
        )
        a = prefixes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"), "shingle")
        b = prefixes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"), "shingle")
        return (
            a.join(b, "shingle")
            .where((F.col("doc_a") < F.col("doc_b"))
                   & (F.col("size_b") >= F.ceil(t_dec * F.col("size_a")))
                   & (F.col("size_a") >= F.ceil(t_dec * F.col("size_b"))))
            .select("doc_a", "doc_b")
            .distinct()
        )

    arrs = build_arrs()
    timed("cand_only(noop, warm arrs)", lambda: _materialize(cand_of(arrs)))

    def verify(arrs, cand):
        va = arrs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"), F.col("set_size").alias("size_a"))
        vb = arrs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"), F.col("set_size").alias("size_b"))
        n_common = F.size(F.array_intersect("sh_a", "sh_b"))
        return (
            cand.join(va, "doc_a").join(vb, "doc_b")
            .withColumn("n_common", n_common)
            .withColumn("jaccard", F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common")))
            .filter(F.col("jaccard") >= 0.8)
            .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
        )

    timed("cand+verify(noop, warm arrs)", lambda: _materialize(verify(arrs, cand_of(arrs))))
    arrs.unpersist(blocking=False)

    timed("arrs_build(eager_persist)", t_arrs)

    def full_pairs():
        corpus = D.duplicated_corpus(docs)
        return D.jaccard_pairs_prefix(corpus, min_jaccard=0.8)

    timed("pairs_full(finalize ckpt)", lambda: full_pairs())

    # CC over pre-materialized edges
    from maxscale_cdc_connector_spark.operators.graph import connected_components
    edges = full_pairs().select("doc_a", "doc_b")
    def t_cc():
        cc = connected_components(edges, src="doc_a", dst="doc_b", input_materialized=True)
        _materialize(cc)
    timed("cc(on materialized edges)", t_cc)
    print(f"canary_sec_end={_canary_sec(spark):.3f}", flush=True)


if __name__ == "__main__":
    main()

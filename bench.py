"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly ONE JSON line:
    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1_agg_hash": sec, ...}, "sf": 0.1}

Each query is materialized with a `noop` format write — the full plan
executes on the executors (scan → shuffle → agg) with zero driver-side
collection, which is the honest way to time a distributed plan. One warm
SparkSession is reused across queries (JVM/codegen warmup excluded via a
throwaway first run of the cheapest query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maxscale_cdc_connector_spark import queries as _queries
from maxscale_cdc_connector_spark.session import get_session

# Headline set: one per engine area (agg, join, CDC, window, top-k,
# dedup exact/fuzzy, simsearch, text, JSON) — the queries a user of the
# engine actually runs, not the cheapest ones.
HEADLINE = [
    ("q1_agg_hash", "agg_hash"),
    ("q2_join_inner_equi", "join_inner_equi"),
    ("q3_cdc_snapshot_join_agg", "cdc_snapshot_join_agg"),
    ("q4_topk_per_group", "topk_per_group"),
    ("q5_win_frame_running", "win_frame_running"),
    ("q6_dedup_exact_docs", "dedup_exact_docs"),
    ("q7_dedup_minhash_lsh", "dedup_minhash_lsh"),
    ("q8_simsearch_topk_cosine", "simsearch_topk_cosine"),
    ("q9_text_tokenize_tf", "text_tokenize_tf"),
    ("q10_fn_json_props", "fn_json_props"),
    ("q11_text_tfidf", "text_tfidf"),
    ("q12_simsearch_batch_topk", "simsearch_batch_topk"),
    ("q13_pipeline_pretrain_filter", "pipeline_pretrain_filter"),
    ("q14_stream_session_window", "stream_session_window"),
    ("q15_tpch_q5_local_supplier", "tpch_q5_local_supplier"),
    ("q16_tpch_q10_returned", "tpch_q10_returned"),
    ("q17_tpch_q3_shipping", "tpch_q3_shipping"),
    ("q18_tpch_q18_large_orders", "tpch_q18_large_orders"),
    ("q19_pipeline_pack_sequences", "pipeline_pack_sequences"),
    ("q20_text_repetition_stats", "text_repetition_stats"),
    ("q21_pipeline_shard_shuffle", "pipeline_shard_shuffle"),
    ("q22_embedding_kmeans", "embedding_kmeans"),
    ("q23_dedup_cluster_cc", "dedup_cluster_cc"),
    ("q24_embedding_pca", "embedding_pca"),
    ("q25_win_sessionize", "win_sessionize"),
    ("q26_tpch_q17_small_qty_revenue", "tpch_q17_small_qty_revenue"),
    ("q27_tpch_q4_order_priority", "tpch_q4_order_priority"),
    ("q28_text_chunk_dedup", "text_chunk_dedup"),
    ("q29_pipeline_token_budget_sample", "pipeline_token_budget_sample"),
    # round 5 additions — keep appending so earlier-round subsets stay
    # directly comparable across BENCH_r*.json files.
    ("q30_orders_market_basket", "orders_market_basket"),
    ("q31_events_transition_matrix", "events_transition_matrix"),
    ("q32_orders_abc_pareto", "orders_abc_pareto"),
    ("q33_graph_triangle_count", "graph_triangle_count"),
    ("q34_customer_whale_concentration", "customer_whale_concentration"),
    ("q35_embedding_outlier_distance", "embedding_outlier_distance"),
    ("q36_cdc_merge_into_upsert", "cdc_merge_into_upsert"),
    ("q37_graph_hierarchy_rollup", "graph_hierarchy_rollup"),
    ("q38_pipeline_temperature_resample", "pipeline_temperature_resample"),
    ("q39_events_linear_attribution", "events_linear_attribution"),
    ("q40_text_bpe_pair_counts", "text_bpe_pair_counts"),
    ("q41_timeseries_pattern_match", "timeseries_pattern_match"),
    ("q42_geo_grid_neighbor_join", "geo_grid_neighbor_join"),
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _stream_replay_events_per_s(spark, sf_dir: str) -> int:
    """Streaming decode throughput: replay a ~750k-event JSON change log
    through the Structured Streaming file source + typed decode + agg.
    BASELINE.md working target: ≥ 50k events/s.

    Methodology: the replay is sized so steady-state decode dominates
    (fixed micro-batch planning/WAL cost is a few hundred ms), and a small
    warmup stream runs first so one-time streaming machinery init (state
    store, streaming-class JIT) doesn't land in the timed run — mirroring
    the batch warmup in main()."""
    import json as _json
    import tempfile
    import uuid

    from pyspark.sql import functions as F

    from maxscale_cdc_connector_spark.operators.cdc import synthetic_customer_events
    from maxscale_cdc_connector_spark.queries.cdc_queries import CUSTOMER_SCHEMA_RECORD
    from maxscale_cdc_connector_spark.sources.file_replay import replay_stream

    ev = synthetic_customer_events(spark, sf_dir)
    evs = ev
    for i in range(1, 40):
        evs = evs.unionByName(ev.withColumn("sequence", F.col("sequence") + F.lit(30_000_000 * i)))
    n = evs.count()
    base = os.path.join(tempfile.gettempdir(), f"bench-replay-{uuid.uuid4().hex[:8]}")
    log_dir, warm_dir = os.path.join(base, "log"), os.path.join(base, "warm")
    evs.repartition(32).write.mode("overwrite").json(log_dir)
    ev.limit(2000).coalesce(1).write.mode("overwrite").json(warm_dir)

    def run(path: str) -> None:
        stream = replay_stream(spark, path, _json.loads(CUSTOMER_SCHEMA_RECORD))
        q = (
            stream.groupBy("event_type")
            .agg(F.count("*").alias("n"))
            .writeStream.format("memory")
            .queryName(f"bench_replay_{uuid.uuid4().hex[:8]}")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(600):
            q.stop()
            raise RuntimeError("replay did not finish within 600s; throughput would be bogus")

    run(warm_dir)
    t0 = time.perf_counter()
    run(log_dir)
    return int(n / (time.perf_counter() - t0))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = -1.0

    _queries.load_all()
    registry = _queries.REGISTRY
    spark = get_session("bench")

    # Warmup: run the cheapest scan once so JVM startup, codegen compile
    # and parquet footer caching don't land in q1's wall time.
    _materialize(registry["agg_hash"].fn(spark, sf_dir))

    # Two full passes, per-query MIN: the host is a shared VM and a
    # transient noisy-neighbor window can triple an individual query's
    # wall time (observed: a 1.7 s broadcast join reading 15.9 s under
    # contention). The minimum of two spaced runs is the standard
    # latency-benchmark defense; queries are pure reads, so re-running
    # is semantics-free.
    timings: dict[str, float] = {}
    for _ in range(2):
        for label, name in HEADLINE:
            t0 = time.perf_counter()
            _materialize(registry[name].fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            timings[label] = min(timings.get(label, dt), dt)

    replay = max(
        _stream_replay_events_per_s(spark, sf_dir),
        _stream_replay_events_per_s(spark, sf_dir),
    )

    from maxscale_cdc_connector_spark.operators import graph as _graph

    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "stream_replay_events_per_s": replay,
        # Star-contraction convergence telemetry (q23): a pathological
        # corpus shows up here as a rising round count, not a timeout.
        "cc_rounds": _graph.LAST_ROUNDS,
        # Since round 4: per-query MIN over two passes (stream replay:
        # MAX throughput of two runs). Rounds 1-3 were single-pass —
        # cross-round deltas vs those runs include this methodology
        # change (r2 single-pass vs r4 two-pass-min on the shared
        # 19-query subset: part of the 2.4x is noise removal).
        "methodology": "2-pass min per query; replay max of 2; warm session",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

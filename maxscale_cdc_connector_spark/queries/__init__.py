"""Query registry: every implemented operator, with its DuckDB oracle SQL.

Importing this package registers all query packs. ``__spark_entry__.py``
exposes :data:`REGISTRY` to the driver via ``queries()``/``oracle_sql()``.
"""

from maxscale_cdc_connector_spark.queries.registry import REGISTRY, oracle_map, query_map, register

# The driver emits CORRECTNESS rows for a bounded prefix of the registry
# in registration order, so ``load_all`` orders keys by verification
# staleness: keys changed or added this round first (they need a fresh
# row), then keys not yet driver-verified, then keys whose newest green
# row is oldest. Keys re-verified most recently go last. Every key has
# full local oracle-parity coverage regardless of driver order
# (tests/test_registry_coverage.py enforces the parity lists), so rotation never leaves a
# regression unverifiable — the driver row is the *hard* evidence, the
# local sweep is the regression net.

# Keys whose implementation (or oracle) changed in the current round —
# their previous green rows no longer vouch for the current code.
_CHANGED_THIS_ROUND = (
    "agg_collect_set",       # result serialization changed (array → CSV string)
    "dedup_minhash_lsh",     # _ensure_parallelism fallback changed
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_exact_docs",
    "simsearch_batch_topk",  # two-stage top-k rewrite (reduce parallelism)
    "agg_skew_salted",       # avg now integer-exact (order-independent at scale)
    "agg_hash",              # same class, fixed proactively
    "profile_table",         # same (new this round anyway)
)

# Keys whose newest green driver row is CORRECTNESS_r01.
_VERIFIED_R1 = (
    "cdc_decode",
    "cdc_gtid",
    "cdc_latest_snapshot",
    "cdc_resume_offset",
    "cdc_update_pairs",
    "cdc_changes_between",
    "cdc_snapshot_join_agg",
    "cdc_schema_fields",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "simsearch_topk_cosine",
    "simsearch_pairwise_threshold",
    "simsearch_ivf_topk",
    "text_stats",
    "text_tokenize_tf",
    "text_language_id",
    "text_quality_score",
    "text_fingerprint",
    "text_token_count",
    "multimodal_manifest",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "text_tfidf",
    "simsearch_batch_topk",
    "pipeline_pretrain_filter",
    "simsearch_cosine_full",
    "agg_approx_percentile",
    "pipeline_pack_sequences",
    "pipeline_decontaminate",
    "project_filter",
    "filter_like_in_between",
    "join_inner_equi",
    "join_broadcast",
    "join_left_outer",
    "join_right_outer",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_range_theta",
    "join_theta_band",
    "join_asof_prev_event",
    "agg_hash",
    "agg_distinct",
    "agg_approx_distinct",
)

# Keys whose newest green driver row is CORRECTNESS_r02.
_VERIFIED_R2 = (
    "pipeline_hash_split",
    "pipeline_source_mix",
    "agg_rollup",
    "agg_cube",
    "agg_filtered",
    "win_rank",
    "win_analytic",
    "win_frame_running",
    "win_range_frame",
    "sort_multi_key_limit",
    "topk_per_group",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except_all",
    "fn_string",
    "fn_datetime",
    "fn_math",
    "fn_json_props",
    "fn_array",
    "fn_case_null",
    "join_skew_salted",
    "agg_skew_salted",
    "subq_exists_not_in",
    "subq_scalar_correlated",
    "agg_pivot",
    "agg_percentiles",
    "agg_grouping_sets",
    "join_asof_nearest_event",
    "win_ntile_pct",
    "agg_bool_count_if",
    "set_except_distinct",
    "fn_map_props",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "tpch_q10_returned",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_filter",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_exact",
    "stream_replay_count",
)


def load_all() -> None:
    """Import every query pack (idempotent) so registration side-effects run."""
    from maxscale_cdc_connector_spark.queries import (  # noqa: F401
        cdc_queries,
        llm_queries,
        relational,
        stream_queries,
        training_queries,
    )

    tiers = (
        set(_CHANGED_THIS_ROUND),
        set(_VERIFIED_R1) - set(_CHANGED_THIS_ROUND),
        set(_VERIFIED_R2) - set(_CHANGED_THIS_ROUND),
    )
    known = set().union(*tiers)

    def tier(key: str) -> int:
        if key in tiers[0]:
            return 0
        if key not in known:  # new this round: no driver row yet
            return 1
        if key in tiers[1]:
            return 2
        return 3

    ordered = sorted(REGISTRY, key=lambda k: (tier(k), list(REGISTRY).index(k)))
    items = {k: REGISTRY[k] for k in ordered}
    REGISTRY.clear()
    REGISTRY.update(items)


__all__ = ["REGISTRY", "register", "query_map", "oracle_map", "load_all"]

from __future__ import annotations

import pytest

from tests.oracle import compare_query

RELATIONAL = [
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
    "agg_collect_set",
    "fn_map_props",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "tpch_q10_returned",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_filter",
    "win_sessionize",
    "tpch_q13_custdist",
    "sql_api_join_agg",
    "fn_variant_props",
    "funnel_conversion",
    "retention_cohorts",
    "set_intersect_all",
    "reshape_unpivot",
    "tpch_q4_order_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q16_parts_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q22_idle_customers",
    "tpch_q12_priority_class",
    "tpch_q15_top_supplier",
    "tpch_q20_promotion_suppliers",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "events_user_features",
    "orders_rfm_segmentation",
    "events_transition_matrix",
    "events_anomaly_mad",
    "orders_market_basket",
    "agg_mode_per_group",
    "orders_abc_pareto",
    "events_path_topk",
    "join_asof_tolerance",
    "events_dau_wau",
    "events_hll_rollup_exact",
    "events_theta_retention_exact",
    "orders_cohort_ltv",
    "events_first_touch_attribution",
    "events_concurrency_sweepline",
    "events_behavior_bitmap",
    "orders_interarrival_stats",
    "join_interval_bucketed",
    "events_session_stats",
    "fn_regexp",
    "orders_monthly_trend",
    "events_value_histogram",
    "supplier_scorecard",
    "funnel_time_bounded",
    "nation_revenue_share",
    "customer_whale_concentration",
    "customer_revenue_gini",
    "events_hourly_gap_stats",
    "events_hourly_ohlc",
    "join_key_skew_profile",
    "feature_quantile_binning",
    "events_ewma_value",
    "dq_referential_integrity",
    "dq_null_profile",
    "orders_trend_linreg",
    "dq_numeric_corr_matrix",
    "funnel_strict_3step",
    "orders_open_aging",
    "layout_partition_pruned_scan",
    "orders_cusum_changepoint",
    "events_rolling_zscore_daily",
    "events_user_segmentation_kmeans",
    "layout_bucketed_join_agg",
    "events_cep_pattern",
    "events_seasonality_profile",
    "win_cume_dist",
    "feature_minmax_scale",
    "layout_zorder_clustering",
    "dq_psi_drift",
    "events_activity_streaks",
    "orders_ship_lag_stats",
    "events_regularity_bot_flags",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "layout_compaction_bins",
    "layout_file_metadata_audit",
    "events_daily_locf_fill",
    "events_linear_attribution",
    "dq_benford_first_digit",
    "sql_lateral_topk_per_customer",
    "fn_safe_arithmetic",
    "orders_kaplan_meier_ship_lag",
    "udtf_installment_schedule",
    "sql_window_clause_reuse",
    "timeseries_user_similarity_topk",
    "join_null_safe_eq",
    "fn_bitwise_ops",
    "events_value_log_histogram",
    "timeseries_pattern_match",
    "win_nth_value_pack",
    "part_brand_price_stats",
    "geo_grid_neighbor_join",
    "fn_higher_order_pack",
    "fn_binary_encodings",
    "orders_dow_anova",
    "orders_seasonal_index",
    "lineitem_revenue_waterfall",
    "events_new_vs_returning",
    "win_time_interval_frame",
    "events_activity_hhi",
    "dq_primary_key_audit",
    "events_dow_hour_chi2",
    "customer_yoy_growth",
    "events_naive_forecast_backtest",
    "customer_decile_migration",
    "fuzzy_match_part_names",
    "events_rule_engine_flags",
    "events_transition_matrix_order2",
    "part_supplier_concentration",
    "dq_status_consistency",
    "customer_discounted_ltv",
    "part_size_price_corr_by_type",
    "customer_lifecycle_stages",
    "dq_expectation_suite",
    "lineitem_return_rate_by_brand",
    "events_audience_overlap",
    "events_activation_lag",
    "nation_trade_balance",
    "events_daily_peak_hour",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_oracle_parity(spark, sf_dir, name):
    from maxscale_cdc_connector_spark.queries import load_all

    load_all()
    compare_query(spark, sf_dir, name)


def test_approx_distinct_rows_only(spark, sf_dir):
    """Rows-only check: approximate distinct must be within 5% of exact."""
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    df = REGISTRY["agg_approx_distinct"].fn(spark, sf_dir)
    exact = REGISTRY["agg_distinct"].fn(spark, sf_dir)
    approx = {r.l_returnflag: r.approx_parts for r in df.collect()}
    truth = {r.l_returnflag: r.n_parts for r in exact.collect()}
    for flag, n in truth.items():
        assert abs(approx[flag] - n) / n < 0.05, (flag, approx[flag], n)


def test_exact_ntile_matches_window_ntile(spark):
    """The distributed ntile (range-partition + offset prefix sum) must be
    bit-identical to the single-reducer window form, including the uneven
    leading-tile split, n < k, and heavy ties."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from maxscale_cdc_connector_spark.operators.ranking import exact_ntile

    for n, k in [(1, 4), (3, 4), (17, 4), (503, 7)]:
        df = spark.range(n).select("id", (F.xxhash64("id") % 5).alias("v"))
        order = [F.asc("v"), F.asc("id")]
        got = {r.id: r.tile for r in exact_ntile(df, order, k).collect()}
        want = {
            r.id: r.t
            for r in df.withColumn(
                "t", F.ntile(k).over(W.orderBy(*order)).cast("bigint")
            ).collect()
        }
        assert got == want, (n, k)


def test_exact_running_sum_matches_window_sum(spark):
    """The distributed cumulative sum must be bit-identical to the
    single-reducer window form under a total order, including n=1 and
    value ties broken by the unique key."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from maxscale_cdc_connector_spark.operators.ranking import exact_running_sum

    for n in [1, 17, 503]:
        df = spark.range(n).select("id", (F.xxhash64("id") % 7).alias("v"))
        order = [F.desc("v"), F.asc("id")]
        got = {
            r.id: r.running
            for r in exact_running_sum(df, order, "v", out="running").collect()
        }
        want = {
            r.id: r.w
            for r in df.withColumn("w", F.sum("v").over(W.orderBy(*order))).collect()
        }
        assert got == want, n


def test_exact_rank_matches_window_row_number(spark):
    """The distributed global rank must be bit-identical to the
    single-reducer ROW_NUMBER window form under a total order, including
    n=1 and value ties broken by the unique key."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from maxscale_cdc_connector_spark.operators.ranking import exact_rank

    for n in [1, 17, 503]:
        df = spark.range(n).select("id", (F.xxhash64("id") % 7).alias("v"))
        order = [F.desc("v"), F.asc("id")]
        got = {r.id: r.rank for r in exact_rank(df, order, out="rank").collect()}
        want = {
            r.id: r.w
            for r in df.withColumn(
                "w", F.row_number().over(W.orderBy(*order)).cast("bigint")
            ).collect()
        }
        assert got == want, n


def test_rfm_windows_partition_by_range_bucket(spark, sf_dir):
    """The per-row rank windows must key on the range-partition id — an
    unpartitioned ntile window over the customer aggregate would funnel
    every customer through one reducer at scale. (The only unpartitioned
    window allowed is the offsets frame: one row per partition.)"""
    from maxscale_cdc_connector_spark.plans import plan_summary
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    s = plan_summary(REGISTRY["orders_rfm_segmentation"].fn(spark, sf_dir))
    assert "_ent_pid" in s.text, "distributed ntile lost its partition key"
    assert not s.has("NTile") or "_ent_pid" in s.text


def test_dau_wau_approx_within_5pct_of_exact(spark, sf_dir):
    """The HLL form must track the exact rolling distinct within 5%
    relative error on every emitted day."""
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    exact = {r.day: (r.dau, r.wau) for r in REGISTRY["events_dau_wau"].fn(spark, sf_dir).collect()}
    approx = {r.day: (r.dau, r.wau) for r in REGISTRY["events_dau_wau_approx"].fn(spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for day, (dau, wau) in exact.items():
        a_dau, a_wau = approx[day]
        assert abs(a_dau - dau) <= max(1, 0.05 * dau), (day, a_dau, dau)
        assert abs(a_wau - wau) <= max(1, 0.05 * wau), (day, a_wau, wau)


def test_zorder_buckets_are_local_in_both_dims(spark, sf_dir):
    """The point of the Morton layout: every z-bucket must span a NARROW
    window of BOTH dimensions (that is what makes file min/max stats
    prunable on either column). Buckets keyed by the top 8 interleaved
    bits each cover a 16x16 cell of the 65536x65536 normalized grid, so
    each dimension's per-bucket span must be ~1/16 of its full range —
    assert < 1/8 to leave room for scaling rounding at tiny SFs."""
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["layout_zorder_clustering"].fn(spark, sf_dir).collect()
    assert len(rows) > 8
    ck_lo = min(r.ck_min for r in rows)
    ck_hi = max(r.ck_max for r in rows)
    d_lo = min(r.day_min for r in rows)
    d_hi = max(r.day_max for r in rows)
    for r in rows:
        assert (r.ck_max - r.ck_min) <= (ck_hi - ck_lo) / 8 + 1
        assert (r.day_max - r.day_min) <= (d_hi - d_lo) / 8 + 1


def test_hll_sketch_rollup_accuracy_and_merge(spark, sf_dir):
    """The stored-sketch rollup must (a) track exact weekly distincts
    within 5% and (b) be merge-consistent: unioning daily sketches must
    estimate the same as one sketch built over the whole week's raw
    events (the algebra that makes the store-and-merge pattern valid)."""
    from pyspark.sql import functions as F

    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all
    from maxscale_cdc_connector_spark.session import events_ts_us, load_table

    load_all()
    got = {
        r.week: r.est_users
        for r in REGISTRY["events_hll_sketch_rollup"].fn(spark, sf_dir).collect()
    }
    e = events_ts_us(load_table(spark, "events", sf_dir))
    weekly = e.select(
        F.expr("ts_us DIV 86400000000 DIV 7").cast("bigint").alias("week"), "user_id"
    )
    exact = {
        r.week: r.n
        for r in weekly.groupBy("week").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(got) == set(exact)
    for wk, n in exact.items():
        assert abs(got[wk] - n) / n <= 0.05, (wk, got[wk], n)
    direct = {
        r.week: r.est
        for r in weekly.groupBy("week")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint").alias("est"))
        .collect()
    }
    assert got == direct, "daily-sketch union diverged from whole-week sketch"


def test_theta_retention_overlap_matches_exact_within_5pct(spark, sf_dir):
    """Sketch-intersection retention must sit within 5% of the exact
    week-over-week retained-user counts, and never exceed either week's
    own estimate (intersection monotonicity)."""
    from pyspark.sql import functions as F

    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all
    from maxscale_cdc_connector_spark.session import events_ts_us, load_table

    load_all()
    got = {
        (r.week_a, r.week_b): r
        for r in REGISTRY["events_theta_retention_overlap"].fn(spark, sf_dir).collect()
    }
    e = events_ts_us(load_table(spark, "events", sf_dir))
    weeks = e.select(
        F.expr("ts_us DIV 604800000000").cast("bigint").alias("week"), "user_id"
    ).distinct()
    by_week: dict[int, set] = {}
    for r in weeks.collect():
        by_week.setdefault(r.week, set()).add(r.user_id)
    assert got, "no adjacent week pairs"
    for (wa, wb), row in got.items():
        exact = len(by_week[wa] & by_week[wb])
        assert row.est_retained <= min(row.est_users_a, row.est_users_b)
        if exact >= 100:
            assert abs(row.est_retained - exact) / exact < 0.05, (wa, wb, exact, row)
        else:
            assert abs(row.est_retained - exact) <= 10, (wa, wb, exact, row)


def test_sketch_keys_track_registered_exact_shadows(spark, sf_dir):
    """VERDICT r15 item 8: the two sketch keys now have REGISTERED
    oracle-bearing exact shadows the driver hashes every round. Tie the
    pair together: the sketch estimates must track the shadow keys'
    exact values (<=5% rel, +/-10 abs for small counts), and the shadow
    keys must agree with the sketch keys on the non-approximate columns
    (week grain, day counts, pair structure)."""
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    hll = {
        r.week: r
        for r in REGISTRY["events_hll_sketch_rollup"].fn(spark, sf_dir).collect()
    }
    hll_exact = {
        r.week: r
        for r in REGISTRY["events_hll_rollup_exact"].fn(spark, sf_dir).collect()
    }
    assert set(hll) == set(hll_exact)
    for wk, ex in hll_exact.items():
        assert hll[wk].n_days_merged == ex.n_days_merged, wk
        assert abs(hll[wk].est_users - ex.exact_users) <= max(
            10, 0.05 * ex.exact_users
        ), (wk, hll[wk].est_users, ex.exact_users)

    theta = {
        (r.week_a, r.week_b): r
        for r in REGISTRY["events_theta_retention_overlap"].fn(spark, sf_dir).collect()
    }
    theta_exact = {
        (r.week_a, r.week_b): r
        for r in REGISTRY["events_theta_retention_exact"].fn(spark, sf_dir).collect()
    }
    assert set(theta) == set(theta_exact)
    for pair, ex in theta_exact.items():
        got = theta[pair]
        for est, exact in (
            (got.est_users_a, ex.users_a),
            (got.est_users_b, ex.users_b),
            (got.est_retained, ex.retained),
        ):
            assert abs(est - exact) <= max(10, 0.05 * exact), (pair, est, exact)


def test_user_segmentation_partitions_users_deterministically(spark, sf_dir):
    """Segments must partition the user set into exactly k groups, sum
    of per-segment activity must equal the corpus totals, and the
    fixed-seed fit must be run-to-run deterministic."""
    from pyspark.sql import functions as F

    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all
    from maxscale_cdc_connector_spark.session import load_table

    load_all()
    fn = REGISTRY["events_user_segmentation_kmeans"].fn
    rows1 = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    rows2 = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    assert rows1 == rows2, "k-means segmentation is not deterministic"
    assert len(rows1) <= 4
    e = load_table(spark, "events", sf_dir)
    n_users = e.select("user_id").distinct().count()
    n_clicks = e.filter(F.col("event_type") == "click").count()
    assert sum(r[1] for r in rows1) == n_users
    assert sum(r[2] for r in rows1) == n_clicks


def test_file_metadata_audit_matches_os_stat(spark, sf_dir):
    """The _metadata-derived audit must agree with the filesystem (size)
    and the table row count — and keep one row per physical file."""
    import os

    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["layout_file_metadata_audit"].fn(spark, sf_dir).collect()
    path = os.path.join(sf_dir, "documents.parquet")
    assert len(rows) == 1
    r = rows[0]
    assert r.file_name == "documents.parquet"
    assert r.file_size == os.stat(path).st_size
    n = spark.read.parquet(path).count()
    assert r.n_rows == n

"""Query registry: every implemented operator, with its DuckDB oracle SQL.

Importing this package registers all query packs. ``__spark_entry__.py``
exposes :data:`REGISTRY` to the driver via ``queries()``/``oracle_sql()``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from maxscale_cdc_connector_spark.queries.registry import REGISTRY, oracle_map, query_map, register

# The driver emits CORRECTNESS rows for a bounded prefix of the registry
# in registration order, so ``load_all`` orders keys by verification
# staleness: keys changed or added this round first (they need a fresh
# row), then keys never driver-verified, then keys whose newest driver
# row is oldest. Keys re-verified most recently go last. Every key has
# full local oracle-parity coverage regardless of driver order
# (tests/test_registry_coverage.py enforces the parity lists), so rotation never leaves a
# regression unverifiable — the driver row is the *hard* evidence, the
# local sweep is the regression net.

# Keys whose implementation (or oracle) changed in the current round —
# their previous green rows no longer vouch for the current code.
# Round 6 froze surface growth to flush the never-driver-verified
# backlog (VERDICT r5 item 1), so this list is deliberately tiny:
_CHANGED_THIS_ROUND: tuple[str, ...] = (
    # Round 11: the REMAINING money-float sums (ADVICE r10 medium — the
    # r10 conversion covered the l_extendedprice revenue family but left
    # tpch_q6 plus the o_totalprice / acctbal / p_retailprice sums on
    # the round(sum(float), 2) half-cent lattice). All nine are now
    # exact integer-unit sums — cents (or 1e-4 units for q6's
    # price×discount) summed through decimal(38,0), oracle SQL changed
    # in lockstep — so their previous green rows vouch for retired SQL
    # and they owe fresh driver rows. Signed sums (acctbal can be
    # negative) use the plain cents form, which is sign-safe; only the
    # half-up (+50) div form requires non-negative sums (documented on
    # _rev_sum).
    "tpch_q6_forecast_revenue",
    "agg_rollup",
    "agg_filtered",
    "agg_grouping_sets",
    "sql_api_join_agg",
    "win_frame_running",
    "win_range_frame",
    "cdc_snapshot_join_agg",
    "cdc_incremental_agg",
    # r11 sf1 sweep catch: the oracle's string_agg within-tie order was
    # engine-defined once the ×10 corpus made transaction sequences
    # collide; tie-break added to match array_sort's total order.
    "cdc_txn_manifest",
    # r11: the events.value sums (cent lattice like the money columns)
    # converted to exact integer cents — this closes the float-sum
    # hazard class across the whole registry; stream_session_window
    # additionally got the (ts, event_id) tie-break its islands prefix
    # sum was missing (second r11 sf1 catch: 6 of 95k sessions split
    # under tied clone timestamps).
    "events_user_features",
    "events_first_touch_attribution",
    "join_interval_bucketed",
    "layout_partition_pruned_scan",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_enrich_static",
    "join_left_outer",
    "agg_pivot",
    # r11 sf1 catch #3: the hierarchy-rollup oracle recursed on raw
    # anc//2 arithmetic, walking ids that exist in no row once the
    # id space is sparse; rewritten over the edge set to match the
    # engine's (correct) edge-based hierarchy semantics.
    "graph_hierarchy_rollup",
    # r11: oracle text gained MATERIALIZED hints (semantics unchanged —
    # DuckDB was re-inlining heavy CTEs per reference: the pagerank
    # edge build into all 10 unrolled rounds (>50-min sf1 runaway,
    # 289 s after), the triangle census's pair graph into all 6 of its
    # references (153 s after)).
    "graph_pagerank_parts",
    "graph_triangle_count",
    # r11 full-registry sf1 sweep catch #4 — a REAL engine robustness
    # bug: stateful_session_ttl crashed the whole query
    # (INVALID_TIMEOUT_TIMESTAMP) when a key's entire history arrived
    # behind the watermark, because EventTimeTimeout cannot be armed in
    # the past. Late groups now finalize inline (emit the provably-
    # closed session, keep no state) — the behavior the timeout path
    # would have produced. Plan bytes changed → fresh driver row owed.
    "stream_session_ttl_finalize",
)

# Never-driver-verified keys the r5 judge asked to see rows for EARLY
# in round 6 (they were added post-freeze in r5 and sit late in
# registration order, so plain tier-2 ordering would starve them).
_PRIORITY_NEVER_VERIFIED = (
    "events_daily_peak_hour",
    "nation_trade_balance",
    "events_activation_lag",
    "dq_expectation_suite",
)

# Sentinel keys pinned permanently in the driver's verification prefix:
# one trivially-stable key per major pack, so a systemic breakage (env,
# loader, session) shows up as a sentinel flip rather than a silent pass.
_SENTINELS = (
    "cdc_decode",
    "agg_hash",
    "dedup_exact_docs",
)


def _newest_driver_rows() -> dict[str, int]:
    """{key: newest round with driver evidence}, from the in-repo
    ``CORRECTNESS_r*.json`` files.

    Evidence = a green hash row (``hash_match``), or — for keys that are
    rows-only by design — a completed ``no_oracle`` row with a row count.
    Rows whose harness errored (any other ``err``) are NOT evidence: the
    key stays maximally stale until a clean row lands. Generated instead
    of hand-maintained lists so the rotation cannot rot as rounds pass.
    """
    root = Path(__file__).resolve().parents[2]
    newest: dict[str, int] = {}
    for path in root.glob("CORRECTNESS_r*.json"):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            green_hash = row.get("hash_match") is True
            rows_only = row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            if green_hash or rows_only:
                newest[key] = max(newest.get(key, 0), rnd)
    return newest


def load_all() -> None:
    """Import every query pack (idempotent) so registration side-effects run."""
    from maxscale_cdc_connector_spark.queries import (  # noqa: F401
        cdc_queries,
        llm_queries,
        relational,
        stream_queries,
        training_queries,
    )

    changed = set(_CHANGED_THIS_ROUND)
    sentinels = set(_SENTINELS) - changed
    newest = _newest_driver_rows()
    priority = {k: i for i, k in enumerate(_PRIORITY_NEVER_VERIFIED)}

    def tier(key: str) -> tuple[int, int]:
        if key in changed:
            return (0, 0)
        if key in sentinels:
            return (1, 0)
        if key not in newest:  # new or never cleanly driver-verified
            return (2, priority.get(key, len(priority)))
        return (3, newest[key])  # oldest evidence first, freshest last

    reg_order = {k: i for i, k in enumerate(REGISTRY)}
    ordered = sorted(REGISTRY, key=lambda k: (tier(k), reg_order[k]))
    items = {k: REGISTRY[k] for k in ordered}
    REGISTRY.clear()
    REGISTRY.update(items)


__all__ = ["REGISTRY", "register", "query_map", "oracle_map", "load_all"]

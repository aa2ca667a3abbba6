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
_CHANGED_THIS_ROUND = (
    # Round 9: the one red driver row in eight rounds (VERDICT r8 item 1).
    # The query emitted raw ArrayType columns (`evens`, `squares`) that
    # the driver's pandas canonicalizer cannot sort; both are now
    # comma-joined strings (Spark array_join(transform(...)), DuckDB
    # array_to_string(list_transform(...))) per the agg_collect_set
    # precedent. Query + oracle bytes changed → fresh row required.
    "fn_higher_order_pack",
    # Round 9: ADVICE r8 low — the manifest path is now uuid-keyed (not
    # pid-keyed) and stale manifests are cleaned up; oracle SQL bytes
    # changed → fresh row.
    "layout_file_metadata_audit",
    # Round 9: ADVICE r8 low — the assignment dot is now computed
    # sequentially (exact_dot) instead of via BLAS dgemm, so the exact
    # oracle replay holds on any BLAS build; implementation bytes
    # changed → fresh row.
    "events_user_segmentation_kmeans",
    # Round 9: the SnapshotSink swap/recovery machinery was reworked
    # (same-filesystem atomic renames, hidden parked names, once-per-
    # instance recovery, pre-prev healing) and dedup_exact's identity
    # gained the optional _source_id column — every key flowing through
    # those paths needs a fresh row even though the r8 rows were green.
    "stream_snapshot_sink",
    "stream_snapshot_evolved",
    "stream_snapshot_sink_replayed",
    "stream_dedup_exact",
    # Round 9: the windowed-agg helpers now materialize a Column-typed
    # event time under a private name so the watermark provably covers
    # the window's clock (r9 review); plan bytes changed → fresh rows.
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    # Round 9: graph-operator review fixes — kcore canonicalizes
    # reversed-duplicate edges, pagerank enforces its dangling-node
    # contract and checkpoints `nodes`, ancestor_closure enforces
    # max_depth, label-prop/two-phase free superseded checkpoints
    # incrementally. Operator bytes changed → fresh rows for the keys
    # flowing through them.
    "graph_kcore_stats",
    "graph_pagerank_parts",
    "graph_hierarchy_rollup",
    "dedup_cluster_cc",
    # Round 9 (fifth review pass): pq's subspace assignment now clamps
    # ulp-negative dist² at 0 like kmeans._make_d2 — without it a vector
    # equal to its centroid (duplicate-collapsed cluster) NaN'd
    # recon_err. Operator bytes changed → fresh rows-only samples.
    "embedding_pq_codes",
    "simsearch_pq_adc_topk",
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

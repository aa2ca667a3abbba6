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
# Round 5, first half: the block-GEMM all-pairs kernel was fixed
# (cross-block pairs whose smaller id hashed into the higher block were
# dropped) and its block sizing moved to plan statistics — every
# consumer of pairwise_threshold re-verifies; the two embedding array
# ops now emit exploded scalar rows (the harness could not canonicalize
# raw arrays); the k-NN query side gained a fixed-size cap; approx-top-k
# gained an exact tie-safe oracle; jaccard_pairs persists an internal
# alias and exact_ntile checkpoints its range-partitioned input once.
# Second half: the exact-Jaccard consumers (ngram_jaccard, cluster_cc,
# rewrite_corpus — already listed) moved to the prefix-filtered
# candidate index, and cluster_cc's star contraction moved to window
# mins with a signature-gated exact convergence check — both changes
# are output-pinned bit-identical locally, and the driver re-verifies
# them on the new execution strategies via this list.
_CHANGED_THIS_ROUND = (
    # Fifth-half change: gap_variance moved from round(float,4) to exact
    # integer 1e-4 units after a .00005-lattice split at sf0.1 (user 406)
    # — schema and values changed, prior green no longer vouches.
    "events_regularity_bot_flags",
    # Promoted from rows-only to exact-hash oracles (decode stub byte
    # stats / frame slices / thumbnail strides are pure arithmetic both
    # engines reproduce); decode_features also moved to integer columns.
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "multimodal_resize_thumbs",
    "cdc_dead_letter",
    "stream_replay_count",
    "simsearch_pairwise_threshold",
    "dedup_embedding_cosine",
    "embedding_normalize_l2",
    "embedding_quantize_int8",
    "embedding_knn_label_vote",
    "text_approx_top_k_words",
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    "dedup_cluster_cc",
    "dedup_rewrite_corpus",
    "orders_rfm_segmentation",
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

    def tier(key: str) -> tuple[int, int]:
        if key in changed:
            return (0, 0)
        if key in sentinels:
            return (1, 0)
        if key not in newest:  # new or never cleanly driver-verified
            return (2, 0)
        return (3, newest[key])  # oldest evidence first, freshest last

    reg_order = {k: i for i, k in enumerate(REGISTRY)}
    ordered = sorted(REGISTRY, key=lambda k: (tier(k), reg_order[k]))
    items = {k: REGISTRY[k] for k in ordered}
    REGISTRY.clear()
    REGISTRY.update(items)


__all__ = ["REGISTRY", "register", "query_map", "oracle_map", "load_all"]

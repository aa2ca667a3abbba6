"""Pin the cross-round comparison tool (VERDICT r13 item 2): the
board-multiplier / flag logic is the adjudication protocol as code, so
its semantics must not rot. Spark-free."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import compare_rounds


def _art(queries: dict, **extra) -> dict:
    return {"queries": queries, "value": sum(queries.values()), **extra}


def test_board_multiplier_is_median_ratio():
    old = _art({"q1": 1.0, "q2": 2.0, "q3": 4.0})
    new = _art({"q1": 2.0, "q2": 4.0, "q3": 8.0})
    cmp = compare_rounds.compare(old, new)
    assert cmp["board_multiplier"] == 2.0
    assert cmp["flagged"] == []


def test_flags_keys_deviating_from_board_either_direction():
    # Board moves 2x; q2 moves 4x (> 2*1.5) and q4 moves 1.0x (< 2/1.5).
    old = _art({"q1": 1.0, "q2": 1.0, "q3": 1.0, "q4": 1.0, "q5": 1.0})
    new = _art({"q1": 2.0, "q2": 4.0, "q3": 2.0, "q4": 1.0, "q5": 2.0})
    cmp = compare_rounds.compare(old, new)
    flagged = set(cmp["flagged"])
    assert any("q2" in f for f in flagged)
    assert any("q4" in f for f in flagged)
    assert not any("q1" in f.split("_")[0] for f in flagged)


def test_lockstep_board_never_flags():
    """The r13-verdict host signature: 42 keys moving ~uniformly is
    host, and none should be flagged."""
    old = _art({f"q{i}": 1.0 + i / 10 for i in range(1, 43)})
    new = _art({k: v * 1.5 for k, v in old["queries"].items()})
    cmp = compare_rounds.compare(old, new)
    assert cmp["flagged"] == []
    assert abs(cmp["board_multiplier"] - 1.5) < 1e-9


def test_classify_prefers_artifact_host_class_else_post_hoc():
    assert compare_rounds.classify({"host_class": "quiet"}) == "quiet"
    # Post hoc: the r13-driver signature (quiet canary + steal) = mixed.
    art = {
        "canary_sec": 0.754,
        "canary_sec_post": 0.694,
        "load": {
            "preflight": {"steal_pct": 0.006},
            "post_queries": {"steal_pct": 0.331},
        },
    }
    assert compare_rounds.classify(art) == "mixed"
    # Missing rows: never guessed.
    assert compare_rounds.classify({"canary_sec": 0.7}) == "unknown"


def test_two_unknowns_are_not_same_class():
    """Two artifacts that cannot vouch for their host state must not
    compare as within-class (the misjoin the tool exists to prevent) —
    'unknown' == 'unknown' is still a cross-class read."""
    old = _art({"q1": 1.0})
    new = _art({"q1": 2.0})
    cmp = compare_rounds.compare(old, new)
    assert cmp["old_class"] == cmp["new_class"] == "unknown"
    assert cmp["same_class"] is False
    # Known-and-equal classes DO compare within-class.
    old["host_class"] = new["host_class"] = "quiet"
    assert compare_rounds.compare(old, new)["same_class"] is True


def test_zero_board_multiplier_is_reported_not_nulled():
    """A legitimate 0.0 median (sub-5ms keys rounding to 0.0 in the
    compact line) must be REPORTED as 0.0, not misread as 'no board';
    flags are suppressed (deviation from a zero board is undefined)."""
    old = _art({"q1": 1.0, "q2": 1.0, "q3": 1.0})
    new = _art({"q1": 0.0, "q2": 0.0, "q3": 5.0})
    cmp = compare_rounds.compare(old, new)
    assert cmp["board_multiplier"] == 0.0
    assert cmp["flagged"] == []


def test_full_label_normalization_and_null_rows():
    """bench_partial uses full labels, driver artifacts use ordinals;
    the compare must join them, and None/zero rows must drop out
    instead of dividing."""
    old = _art({"q1": 1.0, "q2": 0.0, "q3": 1.0})
    new = {"queries": {"q1_agg_hash": 2.0, "q2_join_inner_equi": 1.0,
                       "q3_cdc_snapshot_join_agg": None}, "value": 3.0}
    cmp = compare_rounds.compare(old, new)
    keys = [r["key"] for r in cmp["rows"]]
    assert keys == ["q1_agg_hash"]  # q2 zero-old, q3 null-new dropped

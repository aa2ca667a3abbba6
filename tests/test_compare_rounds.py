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


def test_degenerate_board_is_announced_not_silent():
    """ADVICE r15: a zero board suppresses flags by design, but the
    summary must carry an explicit board_degenerate marker so an empty
    flag list can't be misread as a clean pass — in both compare modes."""
    old = _art({"q1": 1.0, "q2": 1.0, "q3": 1.0})
    degenerate = compare_rounds.compare(old, _art({"q1": 0.0, "q2": 0.0, "q3": 5.0}))
    assert degenerate["board_degenerate"] is True
    healthy = compare_rounds.compare(old, _art({"q1": 1.1, "q2": 1.0, "q3": 0.9}))
    assert healthy["board_degenerate"] is False

    s_old = _stress_art({"a": (10.0, 100, 2.0), "b": (20.0, 200, 2.0)})
    s_deg = compare_rounds.compare_stress(
        s_old, _stress_art({"a": (0.0, 100, 2.0), "b": (0.0, 200, 2.0)})
    )
    assert s_deg["board_degenerate"] is True and s_deg["flagged"] == []
    s_ok = compare_rounds.compare_stress(
        s_old, _stress_art({"a": (10.0, 100, 2.0), "b": (20.0, 200, 2.0)})
    )
    assert s_ok["board_degenerate"] is False


def _stress_art(keys: dict, host_class: str = "quiet") -> dict:
    """A minimal stress_x10 --out artifact: keys maps key -> (x10_sec,
    x10_rows, sf01_sec)."""
    return {
        "host_class": host_class,
        "keys": {
            k: {
                "key": k,
                "x10_sec": sec,
                "x10_rows": rows,
                "sf01_sec": sf01,
                "ratio": round(sec / sf01, 2) if sf01 else None,
            }
            for k, (sec, rows, sf01) in keys.items()
        },
    }


def test_stress_board_and_flags_same_class():
    """r14 doctrine as code: within one host class, the ×10 absolute
    legs form the board; a key whose leg strays >1.5× from the board
    multiplier is flagged."""
    old = _stress_art({"a": (10.0, 100, 2.0), "b": (20.0, 200, 2.0),
                       "c": (8.0, 80, 2.0)})
    new = _stress_art({"a": (10.5, 100, 2.0), "b": (21.0, 200, 2.0),
                       "c": (20.0, 80, 2.0)})  # c: 2.5x vs board ~1.05
    cmp = compare_rounds.compare_stress(old, new)
    assert cmp["same_class"] is True
    assert cmp["flagged"] == ["c"]
    assert abs(cmp["board_multiplier"] - 1.05) < 0.01


def test_stress_rows_changed_key_is_excluded_from_timing_read():
    """Fixed output rows is the precondition of the absolute-leg read
    (the corpus defines the work): differing ×10 rows mark the key
    rows_changed, exclude it from the board, and never flag it."""
    old = _stress_art({"a": (10.0, 100, 2.0), "b": (20.0, 200, 2.0)})
    new = _stress_art({"a": (50.0, 999, 2.0), "b": (20.0, 200, 2.0)})
    cmp = compare_rounds.compare_stress(old, new)
    assert cmp["rows_changed"] == ["a"]
    assert cmp["flagged"] == []
    assert cmp["board_multiplier"] == 1.0  # board from b only
    row_a = next(r for r in cmp["rows"] if r["key"] == "a")
    assert "x10_leg_ratio" not in row_a and row_a["flag"] is False


def test_stress_cross_class_suppresses_flags():
    """The r14 same-tree degraded/quiet pair measured 1.4-2.8× long-leg
    inflation from host alone — cross-class magnitudes never earn a
    per-key flag (direction only)."""
    old = _stress_art({"a": (10.0, 100, 2.0), "b": (20.0, 200, 2.0),
                       "c": (8.0, 80, 2.0)}, host_class="quiet")
    new = _stress_art({"a": (10.0, 100, 2.0), "b": (20.0, 200, 2.0),
                       "c": (25.0, 80, 2.0)}, host_class="degraded")
    cmp = compare_rounds.compare_stress(old, new)
    assert cmp["same_class"] is False
    assert cmp["flagged"] == []
    # unknown == unknown is still cross-class (mirrors the bench mode).
    for art in (old, new):
        art.pop("host_class")
    cmp = compare_rounds.compare_stress(old, new)
    assert cmp["old_class"] == cmp["new_class"] == "unknown"
    assert cmp["same_class"] is False and cmp["flagged"] == []


def test_stress_sf01_ratio_never_drives_a_flag():
    """The r14 jaccard lesson: the sf0.1/×10 RATIO tripled across rounds
    (3.0× → 10.8×) purely from a faster denominator host while the ×10
    absolute leg was stable within 5%. A wild ratio swing with a
    board-consistent absolute leg must not flag."""
    old = _stress_art({"a": (16.35, 1_052_000, 5.45),   # ratio 3.0x
                       "b": (10.0, 500, 3.0)})
    new = _stress_art({"a": (17.08, 1_052_000, 1.58),   # ratio 10.8x
                       "b": (10.4, 500, 3.1)})
    cmp = compare_rounds.compare_stress(old, new)
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


def test_streaming_rows_class_gated_directional_flags():
    """VERDICT r15 item 6: streaming rows compare class-gated, not raw.
    Throughput rows flag only a >1.5x slowdown, latency rows only a
    >1.5x growth; improvements never flag (understated-under-steal
    doctrine — a fast row can only be MORE right)."""
    old = _art(
        {"q1": 1.0},
        host_class="quiet",
        stream_replay_events_per_s=600_000,
        cdc_ingest_4stream_events_per_s=2_000_000,
        cdc_ingest_idle_trigger_ms_64stream=800.0,
    )
    new = _art(
        {"q1": 1.0},
        host_class="quiet",
        stream_replay_events_per_s=300_000,        # 2x slower -> FLAG
        cdc_ingest_4stream_events_per_s=3_000_000,  # faster -> never flags
        cdc_ingest_idle_trigger_ms_64stream=1_500.0,  # 1.9x growth -> FLAG
    )
    cmp = compare_rounds.compare(old, new)
    assert cmp["streaming_flagged"] == [
        "stream_replay_events_per_s",
        "cdc_ingest_idle_trigger_ms_64stream",
    ]
    ratios = {r["key"]: r["ratio"] for r in cmp["streaming_rows"]}
    assert ratios["cdc_ingest_4stream_events_per_s"] == 1.5


def test_streaming_rows_cross_class_never_flag():
    """The r14->r15 replay jump (275k -> 710k ev/s) was pure host class;
    cross-class (or unknown-class) streaming magnitudes never flag."""
    old = _art(
        {"q1": 1.0}, host_class="mixed", stream_replay_events_per_s=600_000
    )
    new = _art(
        {"q1": 1.0}, host_class="quiet", stream_replay_events_per_s=100_000
    )
    cmp = compare_rounds.compare(old, new)
    assert cmp["streaming_flagged"] == []
    # the row is still REPORTED (direction-only read), just not flagged
    assert cmp["streaming_rows"][0]["ratio"] == 0.17


def test_streaming_rows_absent_or_null_drop_out():
    old = _art({"q1": 1.0}, host_class="quiet",
               stream_replay_events_per_s=0,
               cdc_ingest_1stream_events_per_s=None)
    new = _art({"q1": 1.0}, host_class="quiet",
               stream_replay_events_per_s=500_000,
               cdc_ingest_1stream_events_per_s=400_000)
    cmp = compare_rounds.compare(old, new)
    assert cmp["streaming_rows"] == [] and cmp["streaming_flagged"] == []


def test_stress_pretouch_reads_every_byte(tmp_path):
    """VERDICT r15 item 3: the ×10 absolute leg is IO-cache-sensitive
    (jaccard 16.5 s cold vs 10.2-10.5 s warm, identical code) — the
    stress harness pre-touches the corpus before any timed leg. Pin the
    helper: returns total bytes across nested files, mutates nothing."""
    import stress_x10

    d = tmp_path / "corpus" / "t.parquet"
    d.mkdir(parents=True)
    (d / "part-0").write_bytes(b"a" * 10_000)
    (d / "_SUCCESS").write_bytes(b"")
    (tmp_path / "corpus" / "meta.json").write_bytes(b"{}" * 50)
    before = sorted(
        (p.name, p.read_bytes()) for p in (tmp_path / "corpus").rglob("*") if p.is_file()
    )
    n = stress_x10.pretouch_corpus(str(tmp_path / "corpus"), chunk=4096)
    assert n == 10_000 + 0 + 100
    after = sorted(
        (p.name, p.read_bytes()) for p in (tmp_path / "corpus").rglob("*") if p.is_file()
    )
    assert before == after

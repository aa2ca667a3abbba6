"""Pin the bench harness's crash-containment contract (VERDICT r10
item 1): BENCH_r10.json was void (rc=1, parsed:null) because one
transient streaming failure raised out of main() and destroyed 42
already-measured rows. These tests run without Spark — the guard layer
is plain Python — so the contract can't silently rot.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pytest

import bench


@pytest.fixture(autouse=True)
def _redirect_partial_path(tmp_path, monkeypatch):
    """Every _measure_row/_snapshot call writes PARTIAL_PATH; without
    this redirect the test suite clobbers the repo-root
    bench_partial.json (gitignored scratch — the live run's full
    per-query detail; durable copies are committed per round as
    BENCH_r{N}_builder_<class>.json)."""
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "partial.json"))


def test_transient_worker_failure_gets_one_retry():
    out = {"errors": {}}
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("Python worker failed to connect back")
        return 42

    bench._measure_row(out, "row", flaky, 1, max)
    assert out["row"] == 42
    assert "row" not in out["errors"]
    assert calls["n"] == 2


def test_permanent_failure_degrades_to_null_plus_error():
    out = {"errors": {}}

    def dead():
        raise RuntimeError("permanent breakage")

    bench._measure_row(out, "row", dead, 2, max)
    assert out["row"] is None
    assert "permanent breakage" in out["errors"]["row"]


def test_rep_failure_does_not_void_earlier_reps():
    out = {"errors": {}}
    seq = iter([10, RuntimeError("boom"), 7])

    def mixed():
        v = next(seq)
        if isinstance(v, Exception):
            raise v
        return v

    bench._measure_row(out, "row", mixed, 3, max)
    assert out["row"] == 10
    assert "row" not in out["errors"]


def test_permanent_failure_is_not_retried():
    out = {"errors": {}}
    calls = {"n": 0}

    def dead():
        calls["n"] += 1
        raise ValueError("not transient")

    bench._measure_row(out, "row", dead, 1, max)
    assert calls["n"] == 1  # no retry burned on a non-transient class


def test_transient_classifier_scope():
    assert bench._is_transient_worker_failure("... Python worker failed to connect back ...")
    assert bench._is_transient_worker_failure("at PythonWorkerFactory.createSimpleWorker")
    assert not bench._is_transient_worker_failure("AnalysisException: column not found")


def test_snapshot_roundtrip(tmp_path, monkeypatch):
    p = tmp_path / "partial.json"
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(p))
    out = {"value": 1.5, "queries": {"q1": 1.5}, "errors": {}}
    bench._snapshot(out)
    assert json.loads(p.read_text()) == out


def test_main_emits_json_even_when_harness_explodes(monkeypatch, capsys, tmp_path):
    partial = tmp_path / "partial.json"
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(partial))

    def boom(out, sf_dir):
        out["queries"]["q1_agg_hash"] = 1.23
        raise RuntimeError("total harness failure")

    monkeypatch.setattr(bench, "_run_bench", boom)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    # Final stdout line is the COMPACT form (VERDICT r11 item 1):
    # ordinal query keys, error COUNT; full detail in bench_partial.
    assert parsed["queries"]["q1"] == 1.23
    assert parsed["errors_n"] == 1
    assert len(line) <= bench.COMPACT_MAX_CHARS
    detail = json.loads(partial.read_text())
    assert detail["queries"]["q1_agg_hash"] == 1.23
    assert "total harness failure" in detail["errors"]["harness"]


# --- Compact final-line contract (VERDICT r11 item 1) -----------------
# The driver archives only the last ~2000 chars of stdout and parses
# the final JSON line inside it. r9's 1,780-char line parsed; r11's
# >2,000-char line gave parsed:null despite rc=0. These pins guarantee
# the final line can never outgrow the window again.


def _full_out_fixture() -> dict:
    """An out dict at least as large as r11's real one: 42 headline
    rows with the real (long) labels, throughput + idle rows, load
    provenance and methodology prose."""
    out = {
        "metric": "headline_total",
        "value": 40.832,
        "unit": "sec",
        "sf": 0.1,
        "queries": {label: 0.123 + i for i, (label, _) in enumerate(bench.HEADLINE)},
        "errors": {},
        "canary_sec": 1.234,
        "total_per_canary": 33.09,
        "stream_replay_events_per_s": 592209,
        "cdc_ingest_1stream_events_per_s": 465643,
        "cdc_ingest_4stream_events_per_s": 1674047,
        "cdc_ingest_idle_trigger_ms_16stream": 462.1,
        "cdc_ingest_idle_trigger_ms_32stream": 668.4,
        "cdc_ingest_idle_trigger_ms_64stream": 1170.0,
        "cc_rounds": 2,
        "host_class": "mixed",
        "steal_max_pct": 0.287,
        "load": {
            "preflight": {"loadavg_1m": 4.24, "steal_pct": 0.287},
            "steal_midrun_pct": [0.01, 0.02, 0.01, 0.03, 0.0, 0.0, 0.0, 0.0],
            "steal_streaming_pct": [0.02, 0.0, 0.01, 0.0, 0.0, 0.0],
            "post_queries": {"loadavg_1m": 2.25, "steal_pct": 0.006},
            "loud": False,
            "query_passes": 2,
        },
        "methodology": (
            "2-pass min per query; replay/ingest max of 2; warm session; "
            "pre-flight+post load sampled (loud => +1 pass); per-row "
            "guarded (rep failures degrade to errors, never void other rows)"
        ),
    }
    return out


def test_compact_line_fits_driver_window_with_full_headline_set():
    line = bench._compact_line(_full_out_fixture())
    assert len(line) <= bench.COMPACT_MAX_CHARS
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_total"
    assert parsed["value"] == 40.832
    assert parsed["queries_n"] == len(bench.HEADLINE)
    assert len(parsed["queries"]) == len(bench.HEADLINE)
    # Worst query keeps its FULL label so the artifact is readable
    # without cross-referencing bench_partial.json.
    assert parsed["worst_query"] == bench.HEADLINE[-1][0]
    assert parsed["stream_replay_events_per_s"] == 592209
    assert parsed["cdc_ingest_idle_trigger_ms_64stream"] == 1170.0
    assert parsed["errors_n"] == 0
    # VERDICT r12 item 1: the host-speed canary and the canary-
    # normalized headline total must ride the driver-parsed line so
    # cross-round comparisons can be made on work ratio from the
    # artifact alone.
    assert parsed["canary_sec"] == 1.234
    assert parsed["total_per_canary"] == 33.09


# --- Host-state classification + mid-run loud detection (VERDICT r13
# item 1). The r13 driver bench ran loud:false with only 2 passes on
# the slowest raw artifact on record: steal was sampled only around
# the passes (pre 0.006%) and rose mid-run (post 0.331%) while the
# min-of-3 canary threaded through the bursts (0.754 s, quiet-class).
# These pins hold the fix: per-quartile mid-run samples feed the +1-
# pass trigger, and a computed host_class (from canary AND max steal)
# rides the compact line so cross-round tooling never joins across
# host classes.


def test_host_class_quiet():
    out = {
        "canary_sec": 0.72,
        "canary_sec_post": 0.81,
        "load": {
            "preflight": {"steal_pct": 0.006},
            "steal_midrun_pct": [0.0, 0.01, 0.0, 0.02],
            "post_queries": {"steal_pct": 0.05},
        },
    }
    assert bench._host_class(out) == "quiet"


def test_host_class_degraded_by_canary():
    out = {
        "canary_sec": 1.55,
        "load": {"preflight": {"steal_pct": 0.0},
                 "post_queries": {"steal_pct": 0.0}},
    }
    assert bench._host_class(out) == "degraded"
    # Either canary sample crossing the bound degrades the class —
    # sustained throttling that arrives late still counts.
    out2 = {
        "canary_sec": 0.7,
        "canary_sec_post": 1.5,
        "load": {"preflight": {"steal_pct": 0.0},
                 "post_queries": {"steal_pct": 0.0}},
    }
    assert bench._host_class(out2) == "degraded"


def test_host_class_mixed_is_the_r13_driver_signature():
    """The exact r13 driver artifact: canary 0.754/0.694 (quiet) with
    post steal 0.331% — must classify mixed, never quiet."""
    out = {
        "canary_sec": 0.754,
        "canary_sec_post": 0.694,
        "load": {
            "preflight": {"steal_pct": 0.006},
            "post_queries": {"steal_pct": 0.331},
        },
    }
    assert bench._host_class(out) == "mixed"


def test_host_class_mixed_from_midrun_burst_alone():
    out = {
        "canary_sec": 0.7,
        "load": {
            "preflight": {"steal_pct": 0.0},
            "steal_midrun_pct": [0.0, 1.8, 0.0, 0.0],
            "post_queries": {"steal_pct": 0.0},
        },
    }
    assert bench._host_class(out) == "mixed"


def test_host_class_unknown_when_rows_missing():
    assert bench._host_class({"errors": {}}) == "unknown"
    assert bench._host_class({"canary_sec": 0.7}) == "unknown"  # no steal
    assert (
        bench._host_class({"load": {"preflight": {"steal_pct": 0.0}}})
        == "unknown"  # no canary
    )


def test_midrun_burst_triggers_extra_pass():
    """The r13 gap: a host that degrades only WHILE the board runs must
    still buy the +1 pass. Quiet pre-flight, quiet post, one mid-run
    quartile over the threshold => loud."""
    quiet_pre = {"loadavg_1m": 0.5, "steal_pct": 0.006}
    quiet_post = {"loadavg_1m": 20.0, "steal_pct": 0.05}
    assert not bench._is_loud_overall(quiet_pre, quiet_post, [0.0, 0.02, 0.0])
    assert bench._is_loud_overall(quiet_pre, quiet_post, [0.0, 1.3, 0.0])
    # Pre-flight / post samples still trigger on their own.
    assert bench._is_loud_overall(
        {"loadavg_1m": 0.5, "steal_pct": 2.0}, quiet_post, []
    )
    assert bench._is_loud_overall(
        quiet_pre, {"loadavg_1m": 1.0, "steal_pct": 1.5}, []
    )
    # Post loadavg is OUR lingering work — must NOT trigger on its own.
    assert not bench._is_loud_overall(quiet_pre, quiet_post, [])


class _ScriptedWatch:
    """A _StealWatch whose sample() returns a scripted sequence."""

    def __init__(self, samples):
        self._it = iter(samples)

    def sample(self):
        return next(self._it)


def test_streaming_row_quiet_window_gets_no_retry(monkeypatch, tmp_path):
    """VERDICT r14 item 4: the retry fires only on a loud window — a
    quiet streaming row keeps its fixed rep count and one steal stamp."""
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "p.json"))
    out = {"errors": {}, "load": {}}
    steal: list = []
    calls = []
    bench._stream_row_measured(
        out, "replay", lambda: calls.append(1) or 100.0, 2, max,
        _ScriptedWatch([0.02]), steal,
    )
    assert out["replay"] == 100.0 and len(calls) == 2
    assert steal == [0.02]
    assert "streaming_loud_retries" not in out["load"]


def test_streaming_row_loud_window_buys_one_retry_best_of(monkeypatch, tmp_path):
    """A row whose measurement window overlapped a loud sample re-runs
    once and keeps the BEST rep (throughput under steal is understated,
    so max-agg rows can only improve); the retried key is recorded and
    the retry's own window is stamped too."""
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "p.json"))
    out = {"errors": {}, "load": {}}
    steal: list = []
    vals = iter([275_000.0, 260_000.0, 547_000.0])  # reps 1-2 loud, retry quiet
    bench._stream_row_measured(
        out, "replay", lambda: next(vals), 2, max,
        _ScriptedWatch([7.7, 0.03]), steal,
    )
    assert out["replay"] == 547_000.0
    assert steal == [7.7, 0.03]
    assert out["load"]["streaming_loud_retries"] == ["replay"]
    # min-agg rows (idle trigger) also keep their best (= min) leg.
    vals = iter([500.0, 480.0, 440.0])
    bench._stream_row_measured(
        out, "idle", lambda: next(vals), 2, min,
        _ScriptedWatch([3.0, 0.0]), steal,
    )
    assert out["idle"] == 440.0


def test_streaming_row_failed_retry_keeps_measured_value(monkeypatch, tmp_path):
    """A retry that crashes must not void the row's measured number or
    leave a stale error on a row that has a value."""
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "p.json"))
    out = {"errors": {}, "load": {}}
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("boom")
        return 300_000.0

    bench._stream_row_measured(
        out, "replay", fn, 2, max, _ScriptedWatch([5.0, 0.0]), [],
    )
    assert out["replay"] == 300_000.0
    assert "replay" not in out["errors"]
    assert out["load"]["streaming_loud_retries"] == ["replay"]


def test_streaming_row_failed_row_is_not_retried(monkeypatch, tmp_path):
    """A row with NO successful rep is a failure, not an understated
    measurement — the loud retry is for throughput under steal, and
    _measure_row already owns the transient-failure retry."""
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "p.json"))
    out = {"errors": {}, "load": {}}
    calls = {"n": 0}

    def fn():
        calls["n"] += 1
        raise RuntimeError("down")

    bench._stream_row_measured(
        out, "replay", fn, 2, max, _ScriptedWatch([5.0]), [],
    )
    assert out["replay"] is None and calls["n"] == 2
    assert "replay" in out["errors"]
    assert "streaming_loud_retries" not in out["load"]


def test_steal_watch_integrates_between_calls(monkeypatch):
    readings = iter([(100, 10_000), (150, 20_000), (150, 30_000)])
    monkeypatch.setattr(bench, "_read_proc_stat", lambda: next(readings))
    w = bench._StealWatch()
    assert w.sample() == 0.5  # 50 steal over 10_000 jiffies
    assert w.sample() == 0.0  # no steal in the second window


def test_compact_line_carries_host_class_and_steal_max():
    line = bench._compact_line(_full_out_fixture())
    parsed = json.loads(line)
    assert parsed["host_class"] == "mixed"
    assert parsed["steal_max_pct"] == 0.287
    # Per-phase steal rides the driver-parsed line (VERDICT r13 item 1),
    # rounded and bounded so it can never threaten the char budget.
    assert parsed["steal_midrun_pct"] == [0.01, 0.02, 0.01, 0.03,
                                          0.0, 0.0, 0.0, 0.0]
    assert parsed["steal_streaming_pct"] == [0.02, 0.0, 0.01, 0.0, 0.0, 0.0]
    assert len(line) <= bench.COMPACT_MAX_CHARS


def test_host_class_sees_streaming_phase_steal():
    """A burst arriving only during the streaming rows (after the
    post-queries sample) must still reach the classifier."""
    out = {
        "canary_sec": 0.7,
        "load": {
            "preflight": {"steal_pct": 0.0},
            "steal_midrun_pct": [0.0, 0.0, 0.0, 0.0],
            "steal_streaming_pct": [0.0, 2.4, 0.0],
            "post_queries": {"steal_pct": 0.0},
        },
    }
    assert bench._host_class(out) == "mixed"
    assert max(bench._all_steal_samples(out)) == 2.4


def test_main_classifies_host_even_on_crash(monkeypatch, capsys, tmp_path):
    """The crash path must still emit a host_class (from whatever was
    measured) — 'unknown' when rows are missing, never a guess."""
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "partial.json"))

    def boom(out, sf_dir):
        raise RuntimeError("early harness failure")

    monkeypatch.setattr(bench, "_run_bench", boom)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["host_class"] == "unknown"


def test_compact_line_carries_canary_keys_exactly_when_measured():
    out = _full_out_fixture()
    del out["canary_sec"], out["total_per_canary"]
    parsed = json.loads(bench._compact_line(out))
    assert "canary_sec" not in parsed  # absent row never fabricated


def test_derive_total_per_canary():
    """The ratio is computed only from measured numbers — never divides
    by zero or fabricates when either row failed (value/canary None)."""
    out = {"value": 40.0, "canary_sec": 1.25}
    bench._derive_total_per_canary(out)
    assert out["total_per_canary"] == 32.0
    for bad in ({"value": None, "canary_sec": 1.0},
                {"value": 40.0, "canary_sec": None},
                {"value": 40.0, "canary_sec": 0},
                {"value": 40.0}):
        bench._derive_total_per_canary(bad)
        assert "total_per_canary" not in bad


def test_compact_line_survives_nulls_and_errors():
    out = _full_out_fixture()
    out["queries"]["q7_dedup_minhash_lsh"] = None  # failed row
    out["errors"] = {"q7_dedup_minhash_lsh": "tb tail", "harness": "tb"}
    out["value"] = None
    line = bench._compact_line(out)
    parsed = json.loads(line)
    assert parsed["errors_n"] == 2
    assert "q7" not in parsed["queries"]
    assert parsed["queries_n"] == len(bench.HEADLINE) - 1
    assert len(line) <= bench.COMPACT_MAX_CHARS


def test_compact_line_never_exceeds_cap_even_with_pathological_input():
    out = _full_out_fixture()
    # 400 extra absurdly-long query labels — the degradation path must
    # drop the queries dict rather than bust the window.
    for i in range(400):
        out["queries"][f"q{100 + i}_" + "x" * 80] = 1.0
    line = bench._compact_line(out)
    assert len(line) <= bench.COMPACT_MAX_CHARS
    parsed = json.loads(line)
    assert parsed["value"] == 40.832  # headline metric survives
    assert parsed["queries"] == {}


def test_compact_line_empty_out():
    line = bench._compact_line({"errors": {}})
    parsed = json.loads(line)
    assert parsed["worst_query"] is None
    assert parsed["queries"] == {}
    assert len(line) <= bench.COMPACT_MAX_CHARS


def test_compact_qkey():
    assert bench._compact_qkey("q23_dedup_cluster_cc") == "q23"
    assert bench._compact_qkey("q1_agg_hash") == "q1"
    assert bench._compact_qkey("not_ordinal_label") == "not_ordinal_label"


def test_main_falls_back_when_compact_renderer_raises(monkeypatch, capsys, tmp_path):
    """A bug in _compact_line must not recreate r10's no-line-at-all
    failure: main's finally guards the renderer with a minimal valid
    JSON fallback carrying the headline metric."""
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "partial.json"))
    monkeypatch.setattr(bench, "_run_bench", lambda out, sf_dir: out.update(value=7.5))

    def broken(out):
        raise RuntimeError("renderer bug")

    monkeypatch.setattr(bench, "_compact_line", broken)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["value"] == 7.5
    assert parsed["compact_line_error"] is True
    assert len(line) <= bench.COMPACT_MAX_CHARS

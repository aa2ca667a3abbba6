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

import bench


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
    monkeypatch.setattr(bench, "PARTIAL_PATH", str(tmp_path / "partial.json"))

    def boom(out, sf_dir):
        out["queries"]["q1_agg_hash"] = 1.23
        raise RuntimeError("total harness failure")

    monkeypatch.setattr(bench, "_run_bench", boom)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["queries"]["q1_agg_hash"] == 1.23
    assert "total harness failure" in parsed["errors"]["harness"]

"""Spark-free pins for full_sweep.py's CLI helpers (arg parsing + resume).

The resume path exists because an interrupted sf1-corpus sweep (session
killed mid-run at 121/236 keys, round 15) had to be restarted by hand-
reconstructing the remaining-keys list; `--resume-log` makes that
mechanical and these pins keep the log-parsing contract stable.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

import full_sweep


def test_parse_args_plain_keys():
    resume, spill, wanted = full_sweep.parse_args(["a", "b", "c"])
    assert resume is None and spill is None
    assert wanted == ["a", "b", "c"]


def test_parse_args_resume_log_anywhere():
    resume, spill, wanted = full_sweep.parse_args(
        ["a", "--resume-log", "/tmp/x.log", "b"]
    )
    assert resume == "/tmp/x.log" and spill is None
    assert wanted == ["a", "b"]


def test_parse_args_empty():
    assert full_sweep.parse_args([]) == (None, None, [])


def test_parse_args_spill_out():
    resume, spill, wanted = full_sweep.parse_args(
        ["--spill-out", "SPILL_r16.json", "k1", "--resume-log", "x.log"]
    )
    assert spill == "SPILL_r16.json" and resume == "x.log"
    assert wanted == ["k1"]


def test_parse_args_trailing_flag_is_usage_error():
    """ADVICE r15: a trailing flag with no path must exit with a usage
    message, not crash with IndexError."""
    import pytest

    for flag in ("--resume-log", "--spill-out"):
        with pytest.raises(SystemExit) as ei:
            full_sweep.parse_args(["a", flag])
        assert flag.lstrip("-") in str(ei.value).replace("--", "")


def test_sum_spill_over_rest_stages_payload():
    """Spill totals sum the REST /stages payload's public counters;
    null/absent fields and non-dict entries read as zero."""
    stages = [
        {"stageId": 1, "diskBytesSpilled": 100, "memoryBytesSpilled": 400},
        {"stageId": 2, "diskBytesSpilled": 0, "memoryBytesSpilled": None},
        {"stageId": 3},
        "not-a-stage",
    ]
    assert full_sweep.sum_spill(stages) == (100, 400)
    assert full_sweep.sum_spill([]) == (0, 0)


def test_passed_keys_from_log_only_pass_lines(tmp_path):
    log = tmp_path / "sweep.log"
    log.write_text(
        "RESUME skipping 0 already-PASS keys from x\n"
        "PASS agg_hash 1.2s\n"
        "FAIL join_semi 0.3s: boom\n"
        "PASS cdc_decode\n"  # pre-timing log format still parses
        "SWEEP DONE 2/3 in 5s fails=['join_semi']\n"
    )
    assert full_sweep.passed_keys_from_log(str(log)) == {"agg_hash", "cdc_decode"}

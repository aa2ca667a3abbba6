"""Cross-round bench comparison in canary units (VERDICT r13 item 2).

Reads two bench artifacts — either a driver ``BENCH_r{N}.json`` (uses
its ``parsed`` object) or a ``bench_partial.json``-shaped dict — and
emits the per-key movement table the round protocol calls for:

- classifies each side's host state (quiet/degraded/mixed/unknown)
  with ``bench._host_class`` semantics, post hoc when the artifact
  predates the ``host_class`` field;
- computes the board-wide multiplier (median per-key ratio new/old) —
  the host signature: when most keys move in lockstep, that lockstep
  IS the host delta;
- flags every key whose own ratio deviates from the board multiplier
  by more than ``DEVIATION`` in either direction (the r12
  fn_json_props/minhash adjudication protocol: a key that moves WITH
  the board is host, a key that moves AGAINST it owes a code-vs-host
  call).

Usage:
    python scripts/compare_rounds.py BENCH_r13.json bench_partial.json
    python scripts/compare_rounds.py --stress STRESS_r14.json STRESS_r15.json
Prints a markdown table ready for SURVEY.md plus a JSON summary line.

``--stress`` consumes two ``stress_x10.py --out`` artifacts and applies
the corrected r14 doctrine for output-bound keys: cross-round reads use
the ×10 ABSOLUTE leg at FIXED OUTPUT ROWS, host-class-gated — never the
sf0.1/×10 ratio, which a fast host inflates by shrinking the
fixed-cost-dominated sf0.1 denominator (r12 3.0× vs r14-quiet 10.8× on
byte-identical jaccard output). A key whose ×10 output rows differ
between the two artifacts is marked ``rows_changed`` and excluded from
the timing read entirely (the corpus, not the code, changed).
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench

DEVIATION = 1.5  # flag keys whose ratio strays >1.5x from the board

# Streaming rows (VERDICT r15 item 6): these compared raw across rounds
# while the query board was host-class-gated — the r14→r15 replay jump
# (275 k → 710 k ev/s) was pure host class, unreadable as such from the
# raw numbers. Too few rows (and mixed units) to form a board median, so
# the rule is class-gated directional flags on the raw ratio: throughput
# rows (higher better) flag only a >DEVIATION slowdown, latency rows
# (lower better) flag only a >DEVIATION growth, and cross-class or
# unknown-class pairs never flag (the r14 calibration table measured
# ~30% quiet→degraded swings on identical code).
STREAM_THROUGHPUT_KEYS = (
    "stream_replay_events_per_s",
    "cdc_ingest_1stream_events_per_s",
    "cdc_ingest_4stream_events_per_s",
)
STREAM_LATENCY_KEYS = (
    "cdc_ingest_idle_trigger_ms_16stream",
    "cdc_ingest_idle_trigger_ms_32stream",
    "cdc_ingest_idle_trigger_ms_64stream",
)


def load_artifact(path: str) -> dict:
    data = json.loads(Path(path).read_text())
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    return data


def classify(art: dict) -> str:
    """The artifact's own host_class when present (>= r14), else the
    post-hoc classification from canary + whatever steal samples the
    artifact carries (r13 artifacts carry load only in bench_partial;
    the driver BENCH file's parsed line has canary only — classify
    'unknown' rather than guess)."""
    if isinstance(art.get("host_class"), str):
        return art["host_class"]
    return bench._host_class(art)


def full_labels() -> dict[str, str]:
    return {bench._compact_qkey(label): label for label, _ in bench.HEADLINE}


def compare_streaming(old: dict, new: dict, same_class: bool) -> list[dict]:
    """Class-gated directional comparison of the bench's streaming rows."""
    rows = []
    for keys, kind in (
        (STREAM_THROUGHPUT_KEYS, "throughput"),
        (STREAM_LATENCY_KEYS, "latency"),
    ):
        for k in keys:
            o, n = old.get(k), new.get(k)
            if not (
                isinstance(o, (int, float))
                and isinstance(n, (int, float))
                and o > 0
            ):
                continue
            r = n / o
            regressed = r < 1 / DEVIATION if kind == "throughput" else r > DEVIATION
            rows.append(
                {
                    "key": k,
                    "kind": kind,
                    "old": o,
                    "new": n,
                    "ratio": round(r, 2),
                    "flag": bool(same_class and regressed),
                }
            )
    return rows


def compare(old: dict, new: dict) -> dict:
    labels = full_labels()
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    # Normalize to ordinal keys (bench_partial uses full labels).
    qo = {bench._compact_qkey(k): v for k, v in qo.items()}
    qn = {bench._compact_qkey(k): v for k, v in qn.items()}
    shared = [
        k
        for k in qo
        if k in qn
        and isinstance(qo[k], (int, float))
        and isinstance(qn[k], (int, float))
        and qo[k] > 0
    ]
    ratios = {k: qn[k] / qo[k] for k in shared}
    board = statistics.median(ratios.values()) if ratios else None
    rows = []
    for k in sorted(shared, key=lambda k: int(k[1:]) if k[1:].isdigit() else 0):
        r = ratios[k]
        # A legitimate 0.0 board median (half the new board at 0.0 s
        # after rounding) is still REPORTED in the summary line, but
        # deviation flags are deliberately suppressed for it: ratio-vs-
        # a-zero-board is undefined, so no per-key call can be made
        # (pinned by test_zero_board_multiplier).
        deviates = board is not None and board > 0 and (
            r > board * DEVIATION or r < board / DEVIATION
        )
        rows.append(
            {
                "key": labels.get(k, k),
                "old_sec": qo[k],
                "new_sec": qn[k],
                "ratio": round(r, 2),
                "flag": bool(deviates),
            }
        )
    cls_old, cls_new = classify(old), classify(new)
    same_class = cls_old == cls_new and cls_old != "unknown"
    streaming_rows = compare_streaming(old, new, same_class)
    out = {
        "old_class": cls_old,
        "new_class": cls_new,
        "old_total": old.get("value"),
        "new_total": new.get("value"),
        "old_canary": old.get("canary_sec"),
        "new_canary": new.get("canary_sec"),
        "board_multiplier": round(board, 3) if board is not None else None,
        # Two unknowns are NOT the same class — "unknown" means the
        # artifact cannot vouch for its host state, so magnitudes are
        # never within-class comparable (the misjoin this tool exists
        # to prevent).
        "same_class": same_class,
        # A 0.0 board (half-zeroed new artifact) suppresses every per-key
        # flag by design; say so explicitly so an empty flag list can't be
        # read as a clean pass (ADVICE r15).
        "board_degenerate": board is not None and board <= 0,
        "flagged": [r["key"] for r in rows if r["flag"]],
        "streaming_flagged": [r["key"] for r in streaming_rows if r["flag"]],
        "rows": rows,
        "streaming_rows": streaming_rows,
    }
    return out


def compare_stress(old: dict, new: dict) -> dict:
    """Diff two ``stress_x10.py --out`` artifacts under the r14 absolute-
    leg doctrine. Board multiplier = median of per-key ×10-leg ratios
    (the host signature across the LONG legs); per-key flags only when
    both sides share a known host class AND the key's output rows are
    identical. The sf0.1 legs and ratios are carried for context but
    never drive a flag — they are within-run linearity signals only."""
    ko, kn = old.get("keys") or {}, new.get("keys") or {}
    shared = [k for k in ko if k in kn]
    rows = []
    comparable = {}
    for k in sorted(shared):
        o, n = ko[k], kn[k]
        rows_changed = o.get("x10_rows") != n.get("x10_rows")
        row = {
            "key": k,
            "old_x10_sec": o.get("x10_sec"),
            "new_x10_sec": n.get("x10_sec"),
            "x10_rows": n.get("x10_rows"),
            "rows_changed": rows_changed,
            "old_ratio": o.get("ratio"),
            "new_ratio": n.get("ratio"),
        }
        if (
            not rows_changed
            and isinstance(o.get("x10_sec"), (int, float))
            and isinstance(n.get("x10_sec"), (int, float))
            and o["x10_sec"] > 0
        ):
            r = n["x10_sec"] / o["x10_sec"]
            row["x10_leg_ratio"] = round(r, 2)
            comparable[k] = r
        rows.append(row)
    board = statistics.median(comparable.values()) if comparable else None
    cls_old = old.get("host_class") or "unknown"
    cls_new = new.get("host_class") or "unknown"
    same_class = cls_old == cls_new and cls_old != "unknown"
    for row in rows:
        r = comparable.get(row["key"])
        # Magnitude flags only within one host class: the r14 same-tree
        # degraded/quiet pair measured 1.4-2.8× inflation of the long
        # legs at 1.7-3.3% steal — cross-class deltas are host, full stop.
        row["flag"] = bool(
            same_class
            and r is not None
            and board is not None
            and board > 0
            and (r > board * DEVIATION or r < board / DEVIATION)
        )
    return {
        "mode": "stress",
        "old_class": cls_old,
        "new_class": cls_new,
        "same_class": same_class,
        "board_degenerate": board is not None and board <= 0,
        "board_multiplier": round(board, 3) if board is not None else None,
        "rows_changed": [r["key"] for r in rows if r["rows_changed"]],
        "flagged": [r["key"] for r in rows if r["flag"]],
        "rows": rows,
    }


def main() -> None:
    argv = list(sys.argv[1:])
    stress = "--stress" in argv
    if stress:
        argv.remove("--stress")
    if len(argv) != 2:
        print(__doc__)
        raise SystemExit(2)
    old, new = load_artifact(argv[0]), load_artifact(argv[1])
    if stress:
        cmp = compare_stress(old, new)
        print(
            f"host class: {cmp['old_class']} -> {cmp['new_class']}"
            + (
                ""
                if cmp["same_class"]
                else " (CROSS-CLASS: direction only, flags suppressed)"
            )
        )
        print(
            "x10 absolute-leg board multiplier (median per-key ratio): "
            f"{cmp['board_multiplier']}"
        )
        if cmp["board_degenerate"]:
            print(
                "WARNING: board degenerate (median <= 0) — per-key flags "
                "suppressed; an empty flag list is NOT a clean pass"
            )
        print()
        print("| key | old x10 s | new x10 s | x10 rows | leg ratio | verdict |")
        print("|---|---|---|---|---|---|")
        for r in cmp["rows"]:
            if r["rows_changed"]:
                mark = "ROWS CHANGED (not comparable)"
            elif r["flag"]:
                mark = "**FLAG**"
            elif not cmp["same_class"]:
                mark = "cross-class"
            else:
                mark = "with board"
            print(
                f"| {r['key']} | {r['old_x10_sec']} | {r['new_x10_sec']} "
                f"| {r['x10_rows']} | {r.get('x10_leg_ratio', '—')} | {mark} |"
            )
        print()
        print(json.dumps({k: v for k, v in cmp.items() if k != "rows"}))
        return
    cmp = compare(old, new)
    canary_note = ""
    if cmp["old_canary"] and cmp["new_canary"]:
        canary_note = (
            f" (canary ratio {round(cmp['new_canary'] / cmp['old_canary'], 2)})"
        )
    print(
        f"host class: {cmp['old_class']} -> {cmp['new_class']}"
        f"{' (CROSS-CLASS: compare direction only, not magnitude)' if not cmp['same_class'] else ''}"
    )
    print(
        f"total: {cmp['old_total']} -> {cmp['new_total']} s; "
        f"board multiplier (median per-key ratio): {cmp['board_multiplier']}"
        f"{canary_note}"
    )
    if cmp["board_degenerate"]:
        print(
            "WARNING: board degenerate (median <= 0) — per-key flags "
            "suppressed; an empty flag list is NOT a clean pass"
        )
    print()
    print("| key | old s | new s | ratio | vs board |")
    print("|---|---|---|---|---|")
    for r in cmp["rows"]:
        mark = "**FLAG**" if r["flag"] else "with board"
        print(
            f"| {r['key']} | {r['old_sec']} | {r['new_sec']} "
            f"| {r['ratio']} | {mark} |"
        )
    if cmp["streaming_rows"]:
        print()
        print("| streaming row | kind | old | new | ratio | verdict |")
        print("|---|---|---|---|---|---|")
        for r in cmp["streaming_rows"]:
            if r["flag"]:
                mark = "**FLAG**"
            elif not cmp["same_class"]:
                mark = "cross-class (direction only)"
            else:
                mark = "ok"
            print(
                f"| {r['key']} | {r['kind']} | {r['old']} | {r['new']} "
                f"| {r['ratio']} | {mark} |"
            )
    print()
    print(
        json.dumps(
            {k: v for k, v in cmp.items() if k not in ("rows", "streaming_rows")}
        )
    )


if __name__ == "__main__":
    main()

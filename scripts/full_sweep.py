"""Full oracle sweep for every oracle-bearing key (or a named subset).

Usage: python scripts/full_sweep.py [--resume-log FILE] [--spill-out FILE] [key ...]
Env:   SWEEP_SF_DIR (default /root/testdata/sf0.01 — the driver's scale;
       point it at an sf1-equivalent corpus from
       `stress_x10.py --corpus-dir` for the 100× oracle pass).

Each line carries the key's elapsed seconds so a pathological oracle
(DuckDB grinding a quadratic textbook form at x10 scale) is identifiable
from the log, not just from ps. `--resume-log` skips keys already marked
PASS in a prior (interrupted) sweep's log, so a killed run restarts from
where it stopped instead of from zero.

`--spill-out FILE` (VERDICT r15 item 1: the constrained-memory spill
clearance) records per-key shuffle/sort/agg SPILL deltas read from the
Spark UI REST API — run with SPARK_GRAFT_UI=1 and a deliberately small
SPARK_DRIVER_MEMORY (e.g. 6g) so operator state must spill, and the
artifact proves each key passed its oracle hash WITH observed spill
rather than by fitting in a 48g heap. Spill columns ride the PASS/FAIL
lines too (disk/mem bytes spilled during that key's stages).
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from maxscale_cdc_connector_spark.session import get_session
from maxscale_cdc_connector_spark.queries import REGISTRY, load_all


def parse_args(argv):
    """Split argv into (resume_log, spill_out, wanted_keys)."""
    resume_log, spill_out, wanted = None, None, []
    i = 0
    while i < len(argv):
        if argv[i] in ("--resume-log", "--spill-out"):
            if i + 1 >= len(argv):  # trailing flag with no path (ADVICE r15)
                print(__doc__)
                raise SystemExit(f"error: {argv[i]} requires a path argument")
            if argv[i] == "--resume-log":
                resume_log = argv[i + 1]
            else:
                spill_out = argv[i + 1]
            i += 2
        else:
            wanted.append(argv[i])
            i += 1
    return resume_log, spill_out, wanted


def sum_spill(stages: list) -> tuple[int, int]:
    """(disk_bytes, memory_bytes) spilled, summed over a REST /stages
    payload. Cumulative across the app — callers diff successive reads
    to attribute spill to a key."""
    disk = sum(s.get("diskBytesSpilled", 0) or 0 for s in stages if isinstance(s, dict))
    mem = sum(s.get("memoryBytesSpilled", 0) or 0 for s in stages if isinstance(s, dict))
    return disk, mem


class SpillReader:
    """Cumulative spill counters from the live app's UI REST API.

    Local mode = one driver process, so /applications has exactly one
    entry; /stages carries per-stage diskBytesSpilled/memoryBytesSpilled
    (the executor metrics the Spark metrics system exposes publicly).
    Degrades to zeros (with a one-time warning) if the UI is off.
    """

    def __init__(self, spark):
        self._base = None
        self._warned = False
        ui = spark.sparkContext.uiWebUrl  # None when spark.ui.enabled=false
        if ui:
            app_id = spark.sparkContext.applicationId
            self._base = f"{ui}/api/v1/applications/{app_id}"

    def read(self) -> tuple[int, int]:
        if self._base is None:
            if not self._warned:
                print("SPILL WARN: UI disabled (set SPARK_GRAFT_UI=1); spill reads are 0", flush=True)
                self._warned = True
            return 0, 0
        import json as _json
        import urllib.request

        try:
            with urllib.request.urlopen(f"{self._base}/stages", timeout=30) as r:
                return sum_spill(_json.load(r))
        except Exception as ex:
            if not self._warned:
                print(f"SPILL WARN: REST read failed ({ex}); spill reads are 0", flush=True)
                self._warned = True
            return 0, 0


def passed_keys_from_log(path):
    """Keys already marked PASS in a prior sweep log (FAILs re-run)."""
    done = set()
    with open(path) as f:
        for line in f:
            if line.startswith("PASS "):
                done.add(line.split()[1])
    return done


def main():
    load_all()
    from tests.oracle import compare_query
    sf = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    resume_log, spill_out, wanted = parse_args(sys.argv[1:])
    keys = [k for k, e in REGISTRY.items() if e.oracle is not None]
    if wanted:
        unknown = [k for k in wanted if k not in REGISTRY]
        assert not unknown, f"unknown keys: {unknown}"
        keys = [k for k in wanted if REGISTRY[k].oracle is not None]
    skipped = 0
    if resume_log:
        done = passed_keys_from_log(resume_log)
        skipped = sum(1 for k in keys if k in done)
        keys = [k for k in keys if k not in done]
        print(f"RESUME skipping {skipped} already-PASS keys from {resume_log}", flush=True)
    spark = get_session("sweep001")
    spill = SpillReader(spark) if spill_out else None
    spill_rows = {}
    prev_disk = prev_mem = 0
    if spill is not None:
        prev_disk, prev_mem = spill.read()
    fails = []
    t00 = time.time()
    for k in keys:
        t0 = time.time()
        try:
            compare_query(spark, sf, k)
            verdict, note = "PASS", ""
        except Exception as ex:
            fails.append(k)
            verdict, note = "FAIL", f": {str(ex)[:300]}"
        extra = ""
        if spill is not None:
            disk, mem = spill.read()
            d_disk, d_mem = disk - prev_disk, mem - prev_mem
            prev_disk, prev_mem = disk, mem
            spill_rows[k] = {
                "verdict": verdict,
                "elapsed_sec": round(time.time() - t0, 1),
                "spill_disk_bytes": d_disk,
                "spill_mem_bytes": d_mem,
            }
            extra = f" spill_disk={d_disk} spill_mem={d_mem}"
        print(f"{verdict} {k} {time.time()-t0:.1f}s{extra}{note}", flush=True)
    print(
        f"SWEEP DONE {len(keys)-len(fails)}/{len(keys)} in {round(time.time()-t00)}s"
        + (f" (+{skipped} resumed)" if skipped else "")
        + f" fails={fails}",
        flush=True,
    )
    if spill_out:
        import json as _json

        spilled = {k: v for k, v in spill_rows.items() if v["spill_disk_bytes"] or v["spill_mem_bytes"]}
        artifact = {
            "protocol": "full_sweep oracle-hash under constrained memory",
            "sf_dir": sf,
            "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
            "n_keys": len(keys),
            "n_pass": len(keys) - len(fails),
            "fails": fails,
            "n_keys_with_spill": len(spilled),
            "total_spill_disk_bytes": sum(v["spill_disk_bytes"] for v in spill_rows.values()),
            "total_spill_mem_bytes": sum(v["spill_mem_bytes"] for v in spill_rows.values()),
            "keys": spill_rows,
        }
        with open(spill_out, "w") as fh:
            _json.dump(artifact, fh, indent=1)
        print(
            f"wrote {spill_out}: {len(spilled)}/{len(keys)} keys spilled, "
            f"disk {artifact['total_spill_disk_bytes']} B, "
            f"mem {artifact['total_spill_mem_bytes']} B",
            flush=True,
        )


if __name__ == "__main__":
    main()

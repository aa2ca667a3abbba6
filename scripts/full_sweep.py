"""Full oracle sweep for every oracle-bearing key (or a named subset).

Usage: python scripts/full_sweep.py [--resume-log FILE] [key ...]
Env:   SWEEP_SF_DIR (default /root/testdata/sf0.01 — the driver's scale;
       point it at an sf1-equivalent corpus from
       `stress_x10.py --corpus-dir` for the 100× oracle pass).

Each line carries the key's elapsed seconds so a pathological oracle
(DuckDB grinding a quadratic textbook form at x10 scale) is identifiable
from the log, not just from ps. `--resume-log` skips keys already marked
PASS in a prior (interrupted) sweep's log, so a killed run restarts from
where it stopped instead of from zero.
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from maxscale_cdc_connector_spark.session import get_session
from maxscale_cdc_connector_spark.queries import REGISTRY, load_all


def parse_args(argv):
    """Split argv into (resume_log_path_or_None, wanted_keys)."""
    resume_log, wanted = None, []
    i = 0
    while i < len(argv):
        if argv[i] == "--resume-log":
            if i + 1 >= len(argv):  # trailing flag with no path (ADVICE r15)
                print(__doc__)
                raise SystemExit("error: --resume-log requires a path argument")
            resume_log = argv[i + 1]
            i += 2
        else:
            wanted.append(argv[i])
            i += 1
    return resume_log, wanted


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
    resume_log, wanted = parse_args(sys.argv[1:])
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
    fails = []
    t00 = time.time()
    for k in keys:
        t0 = time.time()
        try:
            compare_query(spark, sf, k)
            print(f"PASS {k} {time.time()-t0:.1f}s", flush=True)
        except Exception as ex:
            fails.append(k)
            print(f"FAIL {k} {time.time()-t0:.1f}s: {str(ex)[:300]}", flush=True)
    print(
        f"SWEEP DONE {len(keys)-len(fails)}/{len(keys)} in {round(time.time()-t00)}s"
        + (f" (+{skipped} resumed)" if skipped else "")
        + f" fails={fails}",
        flush=True,
    )


if __name__ == "__main__":
    main()

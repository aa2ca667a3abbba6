"""Re-run the SURVEY ×10 scale-stress protocol for named registry keys.

Usage: python scripts/stress_x10.py key [key ...]

Protocol (SURVEY §10): build id-shifted ×10 unions of the sf0.1 tables a
key reads, then time the key at sf0.1 and at ×10 (min of 2 passes each,
local[32], 48g driver heap — the iterative graph keys spill past the 1g
default). A healthy distributed plan lands ≤ ~3× on input-bound keys;
larger ratios need an explanation (output-bound growth, by-spec
quadratic arithmetic) recorded in the SURVEY stress table.

Only the tables a key actually scans are cloned (pass --tables to
override the default `lineitem,embeddings,documents,events,orders,
customer` clone set for speed).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Tables cloned by default, with the id column shifted per replica so
# joins/groupBys see 10× distinct keys, not 10 copies of one key space.
#
# customer's stride MUST NOT alias the synthetic CDC event-sequence
# offsets (operators/cdc.py: update sequence = custkey + 10M, delete =
# custkey + 20M). The original 10M stride made replica-N INSERT
# sequences collide with replica-(N-1) UPDATE/DELETE sequences —
# distinct events sharing one (domain, server_id, sequence,
# event_number) envelope identity, which violates the CDC protocol
# invariant the engine's dedup correctly relies on (GTID sequences are
# unique per server). Found by the r11 full-registry sf1 sweep:
# stream_dedup_within_watermark lost exactly the 20,250 collision rows.
# 100M keeps every replica's {insert, +10M update, +20M delete} bands
# disjoint (custkey ≤ ~15k per replica at sf0.1).
SHIFT_COLS = {
    "lineitem": ("l_orderkey", 100_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "customer": ("c_custkey", 100_000_000),
    "events": ("event_id", 1_000_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
}
# Small dims copied as-is (shifting nation keys would break FK joins).
COPY_TABLES = ("region", "nation", "supplier", "part")


def build_x10(spark, sf_dir: str, tables: list[str], out: str | None = None) -> str:
    from pyspark.sql import functions as F

    # Reuse is gated on a meta marker recording the strides the corpus
    # was built with: a bare existence check silently served corpora
    # built under RETIRED strides (found in review of the r11
    # customer-stride fix — a pre-fix /tmp/sf1_corpus would have kept
    # the envelope-identity collisions the fix removes, and the
    # resulting sweep failures would read as an engine regression).
    meta = {"shift_cols": {t: list(v) for t, v in SHIFT_COLS.items()}}
    if out is not None:
        # Reusable corpus (r10 sf1 protocol: ×10 of sf0.1 = sf1-equivalent,
        # 100× the driver's sf0.01): if every requested table already
        # exists there AND was built with the current strides, reuse it —
        # the build itself is ~a minute of IO.
        import json as _json
        import shutil as _shutil

        need = set(tables) | set(COPY_TABLES)
        meta_path = f"{out}/x10_meta.json"
        have_meta = False
        try:
            with open(meta_path) as fh:
                have_meta = _json.load(fh) == meta
        except (OSError, ValueError):
            pass
        # Reuse gate: meta matches AND every table dir carries Spark's
        # _SUCCESS marker. Bare os.path.exists would accept a directory
        # truncated by a crash mid-write (ADVICE r11).
        if have_meta and all(
            os.path.exists(f"{out}/{t}.parquet/_SUCCESS") for t in need
        ):
            return out
        if os.path.exists(out):  # stale strides (or partial build): rebuild
            _shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        meta_pending = meta_path  # written AFTER the build loop succeeds
    else:
        out = tempfile.mkdtemp(prefix="stress_x10_")
        meta_pending = None
    for t in tables:
        src = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t in SHIFT_COLS:
            col, stride = SHIFT_COLS[t]
            u = None
            for i in range(10):
                s = src.withColumn(col, F.col(col) + F.lit(i * stride))
                u = s if u is None else u.unionByName(s)
            u.write.parquet(f"{out}/{t}.parquet")
        else:
            src.write.parquet(f"{out}/{t}.parquet")
    for t in COPY_TABLES:
        if t not in tables:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                spark.read.parquet(p).write.parquet(f"{out}/{t}.parquet")
    if meta_pending is not None:
        # Meta is the commit record: written only once every table in
        # the loop above landed, so a crash mid-build can never leave a
        # corpus that passes the reuse gate (ADVICE r11). Any partial
        # state fails the meta check next run and is rebuilt.
        import json as _json

        with open(meta_pending, "w") as fh:
            _json.dump(meta, fh)
    return out


def pretouch_corpus(path: str, chunk: int = 1 << 22) -> int:
    """Warm the OS page cache with one sequential read of every file
    under ``path``; returns bytes touched.

    r15 doctrine made code: the ×10 ABSOLUTE legs are IO-cache-sensitive
    for scan-heavy keys (dedup_ngram_jaccard read 16.5 s with a cold page
    cache vs 10.2–10.5 s warm on identical code and rows — r14's 17.08 s
    prose baseline was likewise a post-corpus-build cold run). STRESS
    artifacts are mechanically comparable only if every timed leg starts
    warm, so the harness pre-touches the corpus before any timing instead
    of relying on run position in the session.
    """
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in sorted(files):
            fp = os.path.join(root, name)
            try:
                with open(fp, "rb", buffering=0) as fh:
                    while True:
                        buf = fh.read(chunk)
                        if not buf:
                            break
                        total += len(buf)
            except OSError:
                continue  # vanished temp file: nothing to warm
    return total


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--tables",
        default="lineitem,orders,customer,events,documents,embeddings",
        help="comma-separated tables to clone ×10 (rest copied as-is)",
    )
    ap.add_argument(
        "--corpus-dir",
        default=None,
        help="materialize (or reuse) the ×10 corpus at this path instead "
        "of a throwaway tempdir — lets one sf1-equivalent corpus serve "
        "both the stress timings and an oracle sweep (SWEEP_SF_DIR)",
    )
    ap.add_argument(
        "--out",
        default=None,
        help="write the machine-readable stress artifact (STRESS_r{N}.json "
        "shape) here — per-key sf0.1/×10 legs, output rows, steal sample, "
        "plus the run's host stamp. compare_rounds.py --stress consumes "
        "two of these (VERDICT r14 item 2: cross-round reads for "
        "output-bound keys use the ×10 ABSOLUTE leg at fixed output "
        "rows, host-class-gated — not the ratio).",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    x10 = build_x10(spark, args.sf_dir, args.tables.split(","), args.corpus_dir)

    # Warm both corpora BEFORE any timed leg (r15 cold-vs-warm doctrine).
    pre_bytes = pretouch_corpus(x10) + pretouch_corpus(args.sf_dir)
    print(f"pre-touched corpora: {pre_bytes} bytes (timed legs start warm)", flush=True)

    import bench

    def best_of_2(key: str, sf_dir: str) -> tuple[float, int]:
        best, rows = None, 0
        for _ in range(2):
            t0 = time.perf_counter()
            rows = len(REGISTRY[key].fn(spark, sf_dir).collect())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best, rows

    # Host stamping (r14 doctrine, SURVEY "Item 4"): the RATIO is not
    # host-invariant for output-bound keys — a fast host shrinks the
    # fixed-cost-dominated sf0.1 denominator far more than the
    # output-bound ×10 numerator (r12 3.0× vs r14-quiet 10.8× on
    # byte-identical jaccard output). Cross-round reads therefore use
    # the ×10 ABSOLUTE leg at fixed output rows, which is only
    # comparable within a host class — so stamp the run exactly like
    # bench.py: canary before/after + per-key steal intervals.
    canary_pre = bench._canary_sec(spark)
    watch = bench._StealWatch()
    steals: list[float] = []
    results: list[dict] = []
    try:
        for key in args.keys:
            b1, n1 = best_of_2(key, args.sf_dir)
            b10, n10 = best_of_2(key, x10)
            steals.append(watch.sample())
            results.append(
                {
                    "key": key,
                    "sf01_sec": round(b1, 3),
                    "sf01_rows": n1,
                    "x10_sec": round(b10, 3),
                    "x10_rows": n10,
                    "ratio": round(b10 / b1, 2),
                    "steal_pct": steals[-1],
                }
            )
            print(
                f"{key}: sf0.1 {b1:.2f}s ({n1} rows) | x10 {b10:.2f}s "
                f"({n10} rows) | ratio {b10 / b1:.1f}x | "
                f"x10-abs {b10:.2f}s @ {n10} rows | steal {steals[-1]}%",
                flush=True,
            )
    finally:
        # Host stamp in a finally (ADVICE r14): a failing key must not
        # strip the already-printed keys of their host-class stamp — the
        # within-class-comparison doctrine needs every run classified.
        # Guarded: if the session itself is broken the canary raises,
        # and the stamp degrades to class "unknown" rather than masking
        # the original exception.
        try:
            canary_post = bench._canary_sec(spark)
        except Exception:
            canary_post = None
        host = {
            "canary_sec": canary_pre,
            "canary_sec_post": canary_post,
            "steal_max_pct": max(steals) if steals else None,
            "steal_pct_samples": steals,
        }
        host["host_class"] = bench._host_class(
            {
                "canary_sec": canary_pre,
                "canary_sec_post": canary_post,
                "load": {"steal_midrun_pct": steals},
            }
        )
        print(
            f"host: class {host['host_class']} | canary {canary_pre}/"
            f"{canary_post} s | steal max {host['steal_max_pct']}%",
            flush=True,
        )
        if args.out:
            # Partial results are still written on a failing run — each
            # key's row is complete-or-absent, and the host stamp always
            # rides along, mirroring bench.py's incremental snapshots.
            # Guarded (ADVICE r15): a bad --out path must not mask the
            # key loop's original exception or skip the corpus cleanup.
            try:
                import json as _json

                artifact = {
                    "protocol": "stress_x10 min-of-2 per leg, pre-touched corpora",
                    "pretouch_bytes": pre_bytes,
                    "sf_dir": args.sf_dir,
                    "corpus_dir": args.corpus_dir,
                    "requested_keys": args.keys,
                    "keys": {r["key"]: r for r in results},
                    **host,
                }
                with open(args.out, "w") as fh:
                    _json.dump(artifact, fh, indent=1)
                print(f"wrote {args.out}", flush=True)
            except OSError as ex:
                print(f"artifact write FAILED ({ex}); results above", flush=True)
        if args.corpus_dir is None:  # keep a named corpus for reuse
            shutil.rmtree(x10, ignore_errors=True)
        try:
            spark.stop()
        except Exception:
            pass  # broken session: the original exception matters more
    return 0


if __name__ == "__main__":
    sys.exit(main())

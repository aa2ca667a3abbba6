"""Isolated per-query timing: min-of-N noop-sink materializations.

Usage:
    python scripts/time_queries.py name1,name2 [--sf-dir DIR] [--reps N]

Same methodology as bench.py's query board (warm session, noop sink,
per-query min) but for an arbitrary subset — the fast inner loop for
optimization work. Prints one line per query plus the canary, so numbers
can be host-normalized the same way the bench's are. NOT a replacement
for bench.py: the committed BENCH artifacts always come from the full
harness.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _canary_sec, _materialize
from maxscale_cdc_connector_spark import queries as _queries
from maxscale_cdc_connector_spark.session import get_session


def main() -> None:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        sys.exit(2)
    names = args[0].split(",")
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    i = 1
    while i < len(args):
        if args[i] == "--sf-dir" and i + 1 < len(args):
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps" and i + 1 < len(args):
            reps = int(args[i + 1])
            i += 2
        else:
            print(f"unknown arg {args[i]}")
            sys.exit(2)

    _queries.load_all()
    registry = _queries.REGISTRY
    spark = get_session("time-queries")
    # Same warmups as bench.py: cheapest scan + one Arrow stage.
    _materialize(registry["agg_hash"].fn(spark, sf_dir))
    _materialize(registry["pipeline_pack_sequences"].fn(spark, sf_dir))
    canary = _canary_sec(spark)
    print(f"canary_sec={canary}")
    for name in names:
        vals = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            _materialize(registry[name].fn(spark, sf_dir))
            vals.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: min={min(vals)} all={vals}")
    spark.stop()


if __name__ == "__main__":
    main()

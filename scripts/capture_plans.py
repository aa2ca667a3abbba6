"""Capture .explain("formatted") output for every headline query.

Usage:
    python scripts/capture_plans.py <out_dir> [--sf-dir DIR] [--only name1,name2]

Writes one file per headline query: <out_dir>/<registry_name>.txt with the
formatted physical plan (AQE initial plan — Exchange count, join strategy,
PushedFilters/ReadSchema are all visible pre-execution). Used by the
optimization rounds to commit plans/r{N}/<query>_before.txt / _after.txt
evidence (the judge checks plan claims against these files).

Planning only for purely-lazy queries — but NOT free for every query
(ADVICE r16): iterative operators (CC, pagerank, ancestor closure)
execute their driver loop during plan construction, and any builder
that performs an eager localCheckpoint (orders_abc_pareto, text_tfidf,
orders_market_basket, customer_whale_concentration,
pipeline_temperature_resample, graph_hierarchy_rollup,
embedding_outlier_distance, timeseries_pattern_match, the rank/ntile
operators) runs full scan/aggregate jobs at frame-construction time.
For those queries the captured plan is the final returned frame's, and
capture is NOT cheap on a busy host.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from maxscale_cdc_connector_spark import queries as _queries
from maxscale_cdc_connector_spark.session import get_session


def main() -> None:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        sys.exit(2)
    out_dir = args[0]
    sf_dir = "/root/testdata/sf0.1"
    only: set[str] | None = None
    i = 1
    while i < len(args):
        if args[i] == "--sf-dir" and i + 1 < len(args):
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--only" and i + 1 < len(args):
            only = set(args[i + 1].split(","))
            i += 2
        else:
            print(f"unknown arg {args[i]}")
            sys.exit(2)

    os.makedirs(out_dir, exist_ok=True)
    _queries.load_all()
    registry = _queries.REGISTRY
    spark = get_session("capture-plans")
    for label, name in HEADLINE:
        if only is not None and name not in only and label not in only:
            continue
        try:
            df = registry[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # a broken query must not void the rest
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {label} ({name}) @ {sf_dir}\n")
            fh.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

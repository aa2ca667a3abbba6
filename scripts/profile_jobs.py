"""Per-job breakdown of one or more registry queries via the UI REST API.

Usage: SPARK_GRAFT_UI=1 python scripts/profile_jobs.py name1,name2 [--sf-dir DIR]

For each query: warm run, then a timed run; prints every Spark job's
duration, the driver-side gap before it (planning/AQE/py4j time), stage
and task counts. The sum of gaps vs the sum of job times says whether a
query is executor-bound or driver-overhead-bound — the sf0.1 board is
frequently the latter, which is what job-count reductions target.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _materialize
from maxscale_cdc_connector_spark import queries as _queries
from maxscale_cdc_connector_spark.session import get_session


def _p(s: str) -> datetime:
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = "/root/testdata/sf0.1"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]
    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    _queries.load_all()
    from maxscale_cdc_connector_spark.queries.registry import REGISTRY

    spark = get_session("profile-jobs")
    sc = spark.sparkContext
    base = sc.uiWebUrl

    def jobs_after(n0: int):
        js = json.load(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{sc.applicationId}/jobs?length=10000"
            )
        )
        return sorted([j for j in js if j["jobId"] > n0], key=lambda j: j["jobId"])

    for name in names:
        fn = REGISTRY[name].fn
        _materialize(fn(spark, sf_dir))  # warm
        before = jobs_after(-1)
        n0 = max((j["jobId"] for j in before), default=-1)
        t0 = time.perf_counter()
        _materialize(fn(spark, sf_dir))
        t1 = time.perf_counter()
        new = jobs_after(n0)
        tot = gaps = 0.0
        prev = None
        lines = []
        for j in new:
            d = (_p(j["completionTime"]) - _p(j["submissionTime"])).total_seconds()
            gap = (_p(j["submissionTime"]) - prev).total_seconds() if prev else 0.0
            prev = max(prev, _p(j["completionTime"])) if prev else _p(j["completionTime"])
            tot += d
            gaps += max(gap, 0.0)
            lines.append(
                f"  job {j['jobId']}: {d:.3f}s gap={gap:.3f} "
                f"stages={len(j['stageIds'])} tasks={j['numTasks']}"
            )
        print(
            f"{name}: wall={t1 - t0:.3f}s jobs={len(new)} "
            f"sum_jobs={tot:.3f} sum_gaps={gaps:.3f}"
        )
        for ln in lines:
            print(ln)


if __name__ == "__main__":
    main()

"""Full oracle sweep for every oracle-bearing key (or a named subset).

Usage: python scripts/full_sweep.py [key ...]
Env:   SWEEP_SF_DIR (default /root/testdata/sf0.01 — the driver's scale;
       point it at an sf1-equivalent corpus from
       `stress_x10.py --corpus-dir` for the 100× oracle pass).
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from maxscale_cdc_connector_spark.session import get_session
from maxscale_cdc_connector_spark.queries import REGISTRY, load_all
from tests.oracle import compare_query
load_all()
SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
spark = get_session("sweep001")
wanted = sys.argv[1:]
keys = [k for k, e in REGISTRY.items() if e.oracle is not None]
if wanted:
    unknown = [k for k in wanted if k not in REGISTRY]
    assert not unknown, f"unknown keys: {unknown}"
    keys = [k for k in wanted if REGISTRY[k].oracle is not None]
fails = []
t00 = time.time()
for i, k in enumerate(keys):
    try:
        compare_query(spark, SF, k)
        print(f"PASS {k}", flush=True)
    except Exception as ex:
        fails.append(k)
        print(f"FAIL {k}: {str(ex)[:300]}", flush=True)
print(f"SWEEP DONE {len(keys)-len(fails)}/{len(keys)} in {round(time.time()-t00)}s fails={fails}", flush=True)

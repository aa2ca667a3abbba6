"""Full oracle sweep at sf0.01 (the driver's scale) for every oracle-bearing key."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from maxscale_cdc_connector_spark.session import get_session
from maxscale_cdc_connector_spark.queries import REGISTRY, load_all
from tests.oracle import compare_query
load_all()
SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
spark = get_session("sweep001")
keys = [k for k, e in REGISTRY.items() if e.oracle is not None]
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

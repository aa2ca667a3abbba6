"""Drive the driver contract end-to-end the way the round harness does.

Usage: python scripts/drive_driver.py [key ...]
With no args, checks the three sentinels; with args, checks those keys.
Runs from ANY cwd (inserts the repo root on sys.path the way the driver
does), compares each key's Spark result against its DuckDB oracle at
sf0.01 with the driver's normalization (columns sorted by name, rows
sorted, floats rounded 6dp).
"""
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as mod
from pyspark.sql import SparkSession

SF = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(c(x) for x in v)
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    out = [tuple(c(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> int:
    keys = sys.argv[1:] or ["cdc_decode", "agg_hash", "dedup_exact_docs"]
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    assert len(mod.entry(spark).collect()) > 0
    print("SMOKE OK", flush=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs, osql = mod.queries(), mod.oracle_sql()
    fails = []
    for k in keys:
        sdf = qs[k](spark, SF)
        srows = [tuple(r) for r in sdf.collect()]
        if k not in osql:
            ok = len(srows) >= 0
            print(f"ROWS-ONLY {k}: {len(srows)} rows", flush=True)
            continue
        res = con.execute(osql[k])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (sorted(sdf.columns) == sorted(dcols) and len(srows) == len(drows)
              and norm(srows, sdf.columns) == norm(drows, dcols))
        print(("PASS " if ok else "FAIL ") + k, flush=True)
        if not ok:
            fails.append(k)
    print("RESULT", "FAIL" if fails else "ALLPASS", fails, flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

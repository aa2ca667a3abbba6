"""Drive the driver contract end-to-end the way the round harness does.

Usage: python scripts/drive_driver.py [key ...]
With no args, checks the three sentinels; with args, checks those keys.
Runs from ANY cwd (inserts the repo root on sys.path the way the driver
does), compares each key's Spark result against its DuckDB oracle at
sf0.01 with the driver's normalization (columns sorted by name, rows
sorted, floats rounded 6dp).
"""
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
    """Driver-parity canonicalization.

    The driver canonicalizes via a pandas DataFrame + ``sort_values`` over
    all columns, which raises ``TypeError: unhashable type`` on list/map/
    struct-valued cells. The pre-r9 version of this harness normalized
    lists to tuples — STRICTLY WEAKER than the driver — which masked the
    ``fn_higher_order_pack`` failure for three rounds (VERDICT r8 item 2).
    This version mirrors the driver: non-scalar cells are a hard error,
    and row ordering comes from pandas ``sort_values`` itself.
    """
    import pandas as pd

    def c(v):
        if isinstance(v, float):
            # round(NaN) stays NaN — sorted via na_position like the
            # driver (stringifying it would mix str into float columns
            # and crash sort_values).
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, bytearray):
            return bytes(v)
        if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
            raise TypeError(
                f"non-scalar cell value ({type(v).__name__}): the driver's "
                "pandas canonicalizer rejects Array/Map/Struct columns — "
                "emit array_join'd strings instead (agg_collect_set precedent)"
            )
        return v

    order = sorted(cols)
    # dtype=object: pandas' default numeric coercion turns a bigint
    # column containing one NULL into float64, rounding values past 2^53
    # before comparison — a silent-masking class (two different bigints
    # compare equal). Object dtype keeps Python ints exact.
    df = pd.DataFrame(
        [[c(v) for v in r] for r in rows], columns=list(cols), dtype=object
    )
    df = df.reindex(order, axis=1)
    df = df.sort_values(by=order, kind="mergesort", na_position="last")
    # NULL and float-NaN both canonicalize to None — the driver's pandas
    # path conflates them the same way (None becomes NaN in a float
    # column), and NaN != NaN would fail the tuple comparison below.
    df = df.where(pd.notna(df), None)
    return [tuple(r) for r in df.itertuples(index=False, name=None)]


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

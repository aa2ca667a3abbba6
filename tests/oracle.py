"""Local mirror of the driver's Spark-vs-DuckDB differential check.

Runs a registered query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compares row count and order-insensitive
values (columns sorted by name, rows sorted by all columns). Floats are
compared with a small relative tolerance locally — the driver hashes
exact values, so queries should round/alias aggregates to keep both
checks green.
"""

from __future__ import annotations

import math

import duckdb

from maxscale_cdc_connector_spark.session import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return tuple(norm_cell(x) for x in v)
        if isinstance(v, bytearray):
            return bytes(v)
        return v

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare_query(spark, sf_dir: str, name: str) -> None:
    """Assert the Spark query and its DuckDB oracle agree."""
    from maxscale_cdc_connector_spark.queries import REGISTRY

    entry = REGISTRY[name]
    assert entry.oracle is not None, f"{name} has no oracle"
    sdf = entry.fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    res = con.execute(entry.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sn = _normalize(spark_rows, spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"

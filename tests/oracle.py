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
import os

import duckdb
import pandas as pd

from maxscale_cdc_connector_spark.session import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # Driver testdata ships one file per table; Spark-written corpora
        # (scripts/stress_x10.py --corpus-dir) are DIRECTORIES of part
        # files — glob those so the sf1 oracle pass reads the same bytes.
        # Recursive glob (ADVICE r10): a partitioned layout (key=value
        # subdirs) would match zero files under a flat glob (`**` also
        # matches zero directories, so flat output still resolves), and
        # single quotes in sf_dir are SQL-escaped by doubling — DuckDB
        # rejects bound parameters in DDL, so escaping is the option.
        pattern = f"{path}/**/*.parquet" if os.path.isdir(path) else path
        quoted = pattern.replace("'", "''")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{quoted}')"
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
        if isinstance(v, bytearray):
            return bytes(v)
        if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
            # Driver-strict: the driver's pandas canonicalizer raises
            # ``TypeError: unhashable type`` on Array/Map/Struct cells.
            # The pre-r9 list→tuple branch here was weaker than the
            # driver and masked the fn_higher_order_pack red row
            # (VERDICT r8 item 2). Emit array_join'd strings instead.
            raise TypeError(
                f"non-scalar cell value ({type(v).__name__}): the driver "
                "cannot canonicalize Array/Map/Struct columns"
            )
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

    _assert_dtype_parity(name, sdf, con.execute(entry.oracle).df())


_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOATING = {"float", "double"}


def _assert_dtype_parity(name: str, sdf, duck_pdf: pd.DataFrame) -> None:
    """Mirror the driver's pandas-path typing: DuckDB HUGEINT (e.g.
    sum over BIGINT) converts to float64 in pandas, which value-hashes
    differently than Spark's LongType even when values are equal. The
    tolerance-based row compare above can't see that class, so pin it
    here: an integral Spark column must land as an integer pandas dtype
    (and floating as float). Columns containing NULLs are exempt —
    pandas widens nullable ints to float64 on both sides of the
    driver's compare, so they hash consistently there.
    """
    for field in sdf.schema.fields:
        col = duck_pdf[field.name]
        if col.isnull().any():
            continue
        kind = field.dataType.simpleString()
        if kind in _SPARK_INTEGRAL:
            assert pd.api.types.is_integer_dtype(col.dtype), (
                f"{name}.{field.name}: Spark {kind} but oracle→pandas dtype "
                f"{col.dtype}; CAST the oracle expression (DuckDB sum(BIGINT) "
                "returns HUGEINT → float64) to BIGINT"
            )
        elif kind in _SPARK_FLOATING:
            assert pd.api.types.is_float_dtype(col.dtype), (
                f"{name}.{field.name}: Spark {kind} but oracle→pandas dtype "
                f"{col.dtype}; CAST the oracle expression to DOUBLE"
            )

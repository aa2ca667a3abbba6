"""Pin the physical schema of the driver-generated testdata.

Round 3 shipped a silent environment change — ``events.ts`` drifted from
parquet TIMESTAMP(NANOS) to timestamp[us] — that surfaced as 13 scattered
AnalysisExceptions and a crashed bench instead of one readable failure.
This contract test converts the next drift into a single pinpointed diff.

Columns the engine *adapts to* (rather than assumes) are pinned as a set
of accepted physical types: ``events.ts`` may ship as any timestamp
flavor or epoch-nanos int64 — session.events_ts_micros_col normalizes all
of them, and tests/test_stream_queries.py proves value-level parity.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from maxscale_cdc_connector_spark.session import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")

# column -> exact physical type, or a frozenset of accepted types where the
# engine is deliberately type-adaptive.
EXPECTED = {
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "nation": {"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    "customer": {
        "c_custkey": "int64",
        "c_name": "string",
        "c_nationkey": "int32",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "int64",
        "s_name": "string",
        "s_nationkey": "int32",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "int64",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int32",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "int64",
        "o_custkey": "int64",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": frozenset({"timestamp[us]", "timestamp[ns]", "date32[day]"}),
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "int64",
        "l_partkey": "int64",
        "l_suppkey": "int64",
        "l_linenumber": "int32",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": frozenset({"timestamp[us]", "timestamp[ns]", "date32[day]"}),
    },
    "events": {
        "event_id": "int64",
        # type-adaptive: see session.events_ts_micros_col
        "ts": frozenset({"timestamp[us]", "timestamp[ns]", "timestamp[ms]", "timestamp[s]", "int64"}),
        "user_id": "int64",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "int64",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64",
        "embedding": "list<element: float>",
        "label": "int32",
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_physical_schema_matches_contract(table: str) -> None:
    path = os.path.join(SF_DIR, f"{table}.parquet")
    schema = pq.read_schema(path)
    actual = {f.name: str(f.type) for f in schema}
    expected = EXPECTED[table]

    assert set(actual) == set(expected), (
        f"{table}: column drift — testdata has {sorted(actual)}, "
        f"engine expects {sorted(expected)}. Update EXPECTED and audit "
        f"every consumer of the changed columns."
    )
    for col, want in expected.items():
        got = actual[col]
        ok = got in want if isinstance(want, frozenset) else got == want
        assert ok, (
            f"{table}.{col}: physical type drift — testdata ships {got!r}, "
            f"engine contract is {want!r}. If this is a new accepted type, "
            f"extend the adaptive set AND the normalizing helper "
            f"(session.events_ts_micros_col for events.ts); otherwise the "
            f"testdata generator changed under us."
        )


def test_events_ts_normalizes_to_micros() -> None:
    """The adaptive helper yields epoch-micros agreeing with pyarrow."""
    import pyarrow.compute as pc

    from maxscale_cdc_connector_spark.session import events_ts_us, get_session, load_table

    tbl = pq.read_table(os.path.join(SF_DIR, "events.parquet"), columns=["ts"])
    col = tbl.column("ts")
    if str(col.type) == "int64":  # already epoch-nanos
        want = pc.divide(col, 1000).to_pylist()[:5]
    else:
        want = pc.cast(col.cast("timestamp[us]"), "int64").to_pylist()[:5]

    spark = get_session("contract-test")
    got = [
        r.ts_us
        for r in events_ts_us(load_table(spark, "events", SF_DIR))
        .select("ts_us")
        .limit(5)
        .collect()
    ]
    assert got == want, f"ts normalization mismatch: spark={got} pyarrow={want}"

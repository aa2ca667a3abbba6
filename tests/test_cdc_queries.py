from __future__ import annotations

import pytest

from tests.oracle import compare_query

CDC_QUERIES = [
    "cdc_decode",
    "cdc_gtid",
    "cdc_latest_snapshot",
    "cdc_resume_offset",
    "cdc_update_pairs",
    "cdc_changes_between",
    "cdc_snapshot_join_agg",
    "cdc_schema_fields",
]


@pytest.mark.parametrize("name", CDC_QUERIES)
def test_cdc_oracle_parity(spark, sf_dir, name):
    from maxscale_cdc_connector_spark.queries import load_all

    load_all()
    compare_query(spark, sf_dir, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "n_customers", "total_acctbal"}


def test_gtid_roundtrip():
    from maxscale_cdc_connector_spark.envelope import parse_gtid

    assert parse_gtid("0-3000-42") == (0, 3000, 42)
    with pytest.raises(ValueError):
        parse_gtid("0-3000")


def test_snapshot_semantics(spark, sf_dir):
    """Updated keys show new values; deleted keys are gone; others untouched."""
    from maxscale_cdc_connector_spark.operators.cdc import (
        latest_snapshot,
        synthetic_customer_events,
    )
    from maxscale_cdc_connector_spark.session import load_table

    events = synthetic_customer_events(spark, sf_dir)
    snap = latest_snapshot(events, ["c_custkey"]).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    rows = {r.c_custkey: r for r in snap.collect()}
    base = {r.c_custkey: r for r in load_table(spark, "customer", sf_dir).collect()}

    for k, orig in base.items():
        if k % 20 == 0:
            assert k not in rows, f"key {k} should be deleted"
        elif k % 10 == 0:
            assert rows[k].c_mktsegment == "MACHINERY"
            assert abs(rows[k].c_acctbal - (orig.c_acctbal + 100.0)) < 1e-9
        else:
            assert rows[k].c_mktsegment == orig.c_mktsegment
            assert rows[k].c_acctbal == orig.c_acctbal
    assert set(rows) == {k for k in base if k % 20 != 0}

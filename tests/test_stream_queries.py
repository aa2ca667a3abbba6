from __future__ import annotations

import pytest

from tests.oracle import compare_query

ORACLE_CHECKED = [
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup_exact",
    "stream_snapshot_sink",
    "stream_snapshot_evolved",
    "stream_interval_join",
    "stream_interval_join_outer",
    "stream_windowed_topk",
    "stream_stateful_ewma",
    "stream_enrich_static",
    "stream_snapshot_sink_replayed",
    "stream_dedup_within_watermark",
    "stream_session_ttl_finalize",
    "stream_replay_count",
    "stream_late_data_drop",
]


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_stream_batch_analog_oracle_parity(spark, sf_dir, name):
    from maxscale_cdc_connector_spark.queries import load_all

    load_all()
    compare_query(spark, sf_dir, name)


def test_stream_replay_count_runs(spark, sf_dir):
    from maxscale_cdc_connector_spark.queries import REGISTRY, load_all

    load_all()
    rows = REGISTRY["stream_replay_count"].fn(spark, sf_dir).collect()
    by_type = {r["event_type"]: r["n"] for r in rows}
    assert by_type.get("insert", 0) > 0
    assert sum(by_type.values()) <= 2000

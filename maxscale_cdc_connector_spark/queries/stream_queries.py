"""Driver-checkable batch analogs of the streaming operators.

Spark's unified model means every streaming/ops.py operator runs
identically on a batch DataFrame — so the windowed operators get
oracle-checked here over the `events` table (the true streaming forms,
with watermarks/state/micro-batches, are pinned by tests/test_streaming.py
against the file-replay source, which the driver records as the weaker
rows-only check via `stream_replay_count`).

`events.ts` is parquet TIMESTAMP(NANOS) → LongType epoch-nanos under
`nanosAsLong` (see session.load_table); DuckDB reads the same column as
TIMESTAMP (µs). Parity: Spark converts nanos → `timestamp_micros(ts DIV
1000)`, DuckDB uses the column directly; the session TZ is UTC on both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maxscale_cdc_connector_spark.operators.cdc import CDC_EVENTS_SQL, synthetic_customer_events
from maxscale_cdc_connector_spark.queries.registry import register
from maxscale_cdc_connector_spark.session import load_table as t
from maxscale_cdc_connector_spark.streaming.ops import (
    dedup_exact,
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _events_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, "events", sf_dir)
    return e.withColumn("ts_us", F.timestamp_micros(F.expr("ts DIV 1000")))


@register(
    "stream_tumbling_agg",
    oracle="""
SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS win_start,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS value_sum
FROM events
GROUP BY 1, 2
""",
    doc="Tumbling 10-minute windows per event_type (batch form of the "
    "streaming tumbling agg; windows are epoch-aligned on both engines). "
    "Decomposable aggregates only — the same plan streams under a "
    "watermark (tests/test_streaming.py).",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = tumbling_agg(
        _events_ts(spark, sf_dir),
        "ts_us",
        "10 minutes",
        ["event_type"],
        [F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum")],
    )
    return out.select(F.col("win.start").alias("win_start"), "event_type", "n", "value_sum")


@register(
    "stream_sliding_agg",
    oracle="""
WITH buckets AS (
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS tb, event_id, value FROM events
),
exploded AS (
    SELECT unnest([tb, tb - INTERVAL 5 MINUTE]) AS win_start, event_id, value
    FROM buckets
)
SELECT win_start, count(*) AS n, round(sum(value), 4) AS value_sum
FROM exploded GROUP BY win_start
""",
    doc="Sliding windows 10 min long every 5 min: each event lands in "
    "exactly two windows (the 5-min bucket it starts and the previous "
    "one) — the oracle materializes that membership with unnest.",
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = sliding_agg(
        _events_ts(spark, sf_dir),
        "ts_us",
        "10 minutes",
        "5 minutes",
        [],
        [F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum")],
    )
    return out.select(F.col("win.start").alias("win_start"), "n", "value_sum")


@register(
    "stream_session_window",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
numbered AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
    FROM ordered
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 4) AS value_sum
FROM numbered GROUP BY user_id, session_no
""",
    doc="Session windows with a 30-minute inactivity gap per user — "
    "Spark's session_window in batch mode vs the classic SQL islands "
    "formulation (session end = last event + gap on both engines). "
    "Streaming form: the same operator under a watermark merges "
    "in-flight sessions in the state store.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = session_agg(
        _events_ts(spark, sf_dir),
        "ts_us",
        "30 minutes",
        ["user_id"],
        [F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("value_sum")],
    )
    return out.select(
        "user_id",
        F.col("win.start").alias("session_start"),
        F.col("win.end").alias("session_end"),
        "n_events",
        "value_sum",
    )


@register(
    "stream_dedup_exact",
    oracle=f"""
WITH {CDC_EVENTS_SQL},
replayed AS (
    SELECT * FROM cdc_events UNION ALL
    SELECT * FROM cdc_events WHERE sequence % 7 = 0
)
SELECT domain, server_id, sequence, event_number, event_type, c_custkey
FROM replayed
GROUP BY ALL
""",
    doc="Exact event dedup on the envelope identity (domain, server_id, "
    "sequence, event_number) under simulated at-least-once replay — the "
    "batch form of dropDuplicatesWithinWatermark in the streaming path.",
)
def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = synthetic_customer_events(spark, sf_dir)
    replayed = ev.unionByName(ev.filter(F.col("sequence") % 7 == 0))
    return dedup_exact(replayed).select(
        "domain", "server_id", "sequence", "event_number", "event_type", "c_custkey"
    )


@register(
    "stream_replay_count",
    oracle=None,  # true streaming execution — rows-only driver check.
    doc="File-replay smoke through the real Structured Streaming path: "
    "replays the synthetic change log as a stream (availableNow) into a "
    "memory sink and returns per-event_type counts. The full behavior "
    "matrix (watermarks, sessions, snapshot sink, dedup state) is pinned "
    "in tests/test_streaming.py and tests/test_cdc_source.py.",
)
def stream_replay_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile
    import uuid

    from maxscale_cdc_connector_spark.queries.cdc_queries import CUSTOMER_SCHEMA_RECORD
    from maxscale_cdc_connector_spark.sources.file_replay import replay_stream

    ev = synthetic_customer_events(spark, sf_dir).limit(2000)
    log_dir = os.path.join(tempfile.gettempdir(), f"replay-{uuid.uuid4().hex[:12]}")
    os.makedirs(log_dir)
    with open(os.path.join(log_dir, "part-000.jsonl"), "w") as fh:
        for row in ev.toJSON().toLocalIterator():
            fh.write(row + "\n")

    name = f"replay_{uuid.uuid4().hex[:8]}"
    stream = replay_stream(spark, log_dir, json.loads(CUSTOMER_SCHEMA_RECORD))
    q = (
        stream.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)

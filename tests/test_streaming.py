"""Streaming tests: file replay, windowed aggs, dedup, snapshot sink.

Strategy per SURVEY.md §5.2.4: replay a captured event log through the
full Structured Streaming machinery (micro-batches via maxFilesPerTrigger,
checkpoints, memory sinks) and assert stream results equal the batch
computation over the same log — the unified-model invariant.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from maxscale_cdc_connector_spark.operators.cdc import latest_snapshot
from maxscale_cdc_connector_spark.sources.file_replay import replay_batch, replay_stream
from maxscale_cdc_connector_spark.streaming.ops import (
    dedup_exact,
    session_agg,
    tumbling_agg,
    write_snapshot_stream,
)
from tests.fake_maxscale import TEST_SCHEMA_RECORD, make_event


def _write_log(path: str, events: list[dict]) -> None:
    with open(path, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")


@pytest.fixture(scope="module")
def event_log(tmp_path_factory) -> tuple[str, list[dict]]:
    """Two log files (⇒ ≥2 micro-batches with maxFilesPerTrigger=1):
    inserts 1..40, then updates on every 4th key and deletes on every
    10th, with one exact replay duplicate."""
    d = tmp_path_factory.mktemp("cdclog")
    first = [make_event(s, id_=s, name=f"n{s}") for s in range(1, 41)]
    second = []
    for s in range(1, 41):
        if s % 4 == 0:
            second.append(make_event(100 + s, "update_before", 1, id_=s, name=f"n{s}"))
            second.append(make_event(100 + s, "update_after", 2, id_=s, name=f"upd{s}"))
        if s % 10 == 0:
            second.append(make_event(200 + s, "delete", 1, id_=s, name=f"upd{s}"))
    second.append(make_event(1, id_=1, name="n1"))  # at-least-once replay dup
    _write_log(os.path.join(d, "part-000.jsonl"), first)
    _write_log(os.path.join(d, "part-001.jsonl"), second)
    return str(d), first + second


def test_replay_batch_decodes_typed(spark, event_log) -> None:
    path, events = event_log
    df = replay_batch(spark, path, TEST_SCHEMA_RECORD)
    assert df.count() == len(events)
    types = dict(df.dtypes)
    assert types["sequence"] == "bigint"
    assert types["balance"].startswith("decimal")
    # JSON null → SQL NULL semantics hold through the replay decode too.
    assert df.filter(F.col("event_type") == "insert").count() == 41


def test_stream_tumbling_agg_matches_batch(spark, event_log) -> None:
    path, _ = event_log
    ts = F.timestamp_seconds(F.col("timestamp"))
    # Exact distinct aggregation is unsupported on streams; use
    # decomposable aggregates so batch and stream plans both run.
    aggs = [F.count("*").alias("n"), F.sum("id").alias("id_sum")]

    batch = tumbling_agg(
        replay_batch(spark, path, TEST_SCHEMA_RECORD), ts, "30 seconds", ["event_type"], aggs
    )
    stream = tumbling_agg(
        replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1),
        ts,
        "30 seconds",
        ["event_type"],
        aggs,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win"]["start"], r["event_type"]): (r["n"], r["id_sum"])
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    want = {
        (r["win"]["start"], r["event_type"]): (r["n"], r["id_sum"])
        for r in batch.collect()
    }
    assert got == want and len(want) > 2


def test_stream_windowed_topk_ranks_sink_output(spark, event_log) -> None:
    """The windowed-top-k shape end-to-end: the decomposable tumbling
    count runs as a REAL stream into a sink, the per-window rank runs
    over the finalized sink table, and the result equals the batch
    rank of the batch windowed count — pinning the documented
    'rank downstream of the sink' composition of stream_windowed_topk."""
    from pyspark.sql import Window as W

    path, _ = event_log
    ts = F.timestamp_seconds(F.col("timestamp"))
    aggs = [F.count("*").alias("n")]
    stream = tumbling_agg(
        replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1),
        ts, "30 seconds", ["event_type"], aggs,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wtopk")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def rank(df):
        flat = df.select(F.col("win.start").alias("ws"), "event_type", "n")
        w = W.partitionBy("ws").orderBy(F.desc("n"), F.asc("event_type"))
        return {
            (r.ws, r.event_type, r.n, r.rk)
            for r in flat.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 2).collect()
        }

    got = rank(spark.sql("SELECT * FROM wtopk"))
    want = rank(
        tumbling_agg(
            replay_batch(spark, path, TEST_SCHEMA_RECORD), ts, "30 seconds",
            ["event_type"], aggs,
        )
    )
    assert got == want and len(want) > 2


def test_stream_dedup_exact_under_replay(spark, event_log) -> None:
    path, events = event_log
    stream = dedup_exact(
        replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT count(*) c FROM dedup").first()["c"]
    distinct_ids = {
        (e["domain"], e["server_id"], e["sequence"], e["event_number"]) for e in events
    }
    assert n == len(distinct_ids) == len(events) - 1  # exactly the dup dropped


def test_session_agg_batch_form(spark, event_log) -> None:
    path, _ = event_log
    df = replay_batch(spark, path, TEST_SCHEMA_RECORD)
    out = session_agg(
        df,
        F.timestamp_seconds(F.col("timestamp")),
        "15 seconds",
        ["id"],
        [F.count("*").alias("n")],
    )
    row = out.filter(F.col("id") == 4).orderBy(F.col("win.start")).collect()
    # key 4: insert at t+4, update pair at t+104 — gap 100s > 15s ⇒ 2 sessions.
    assert [r["n"] for r in row] == [1, 2]
    # session end = last ts + gap (Spark's session_window definition).
    assert (row[0]["win"]["end"] - row[0]["win"]["start"]).total_seconds() == 15


def test_snapshot_sink_equals_batch_snapshot(spark, event_log, tmp_path) -> None:
    path, _ = event_log
    stream = replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
    query, sink = write_snapshot_stream(
        stream,
        str(tmp_path / "state"),
        ["id"],
        str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    query.awaitTermination(180)

    got = {
        r["id"]: (r["sequence"], r["name"])
        for r in sink.snapshot(spark).collect()
    }
    batch = replay_batch(spark, path, TEST_SCHEMA_RECORD)
    want = {
        r["id"]: (r["sequence"], r["name"])
        for r in latest_snapshot(batch, ["id"]).collect()
    }
    assert got == want
    assert 10 not in got and got[4][1] == "upd4" and got[1][1] == "n1"


def test_stateful_snapshot_matches_batch(spark, event_log) -> None:
    """applyInPandasWithState snapshot: the last 'update' emitted per key
    equals the batch latest_snapshot row (state-store path vs parquet
    compaction path agree)."""
    import json as _json

    from maxscale_cdc_connector_spark.streaming.ops import stateful_snapshot

    path, _ = event_log
    stream = replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
    out = stateful_snapshot(stream, ["id"])
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_snap")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # Memory sink accumulates one row per (batch, changed key); the last
    # emission per key is the current state.
    rows = spark.sql("SELECT * FROM stateful_snap").collect()
    latest: dict[int, dict] = {}
    for r in rows:
        cur = _json.loads(r["current"])
        k = r["id"]
        prev = latest.get(k)
        if prev is None or (cur["sequence"], cur["event_number"]) > (
            prev["sequence"], prev["event_number"]
        ):
            latest[k] = cur
    got = {
        k: (v["sequence"], v["name"])
        for k, v in latest.items()
        if v["event_type"] != "delete"
    }
    batch = replay_batch(spark, path, TEST_SCHEMA_RECORD)
    want = {
        r["id"]: (r["sequence"], r["name"])
        for r in latest_snapshot(batch, ["id"]).collect()
    }
    assert got == want


def test_watermark_drops_late_event(spark, tmp_path) -> None:
    """stream_watermark_late (SURVEY §2B): with a 10s watermark, an event
    arriving after the watermark passed its window is dropped from the
    windowed aggregation; on-time events all land."""
    import time as _time

    d = tmp_path / "latelog"
    d.mkdir()
    base = 1_700_000_000
    # Batch 1: events at t+0..t+29.
    _write_log(str(d / "a-000.jsonl"), [make_event(s, id_=s) for s in range(30)])
    _time.sleep(0.05)
    # Batch 2: a far-future event advances the watermark to t+990,
    # evicting (and emitting) every first-minute window.
    future = make_event(600, id_=600)
    future["timestamp"] = base + 1000
    _write_log(str(d / "b-000.jsonl"), [future])
    _time.sleep(0.05)
    # Batch 3: a LATE event back at t+5 — its window was already evicted
    # under the t+990 watermark, so the stateful agg drops it (watermark
    # eviction lags arrival by one batch, hence the separate batch 2).
    late = make_event(500, id_=500)
    late["timestamp"] = base + 5
    _write_log(str(d / "c-000.jsonl"), [late])
    _time.sleep(0.05)
    # Batch 4: far ahead, so the future event's window finalizes too.
    flush = make_event(700, id_=700)
    flush["timestamp"] = base + 2000
    _write_log(str(d / "d-000.jsonl"), [flush])

    stream = replay_stream(spark, str(d), TEST_SCHEMA_RECORD, max_files_per_trigger=1)
    windowed = (
        stream.withColumn("ts", F.timestamp_seconds(F.col("timestamp")))
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "30 seconds").alias("win"))
        .agg(F.count("*").alias("n"))
    )
    q = (
        windowed.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT win.start AS s, n FROM late_drop").collect()
    starts = [r["s"].timestamp() for r in rows]
    assert len(starts) == len(set(starts)), "a window was emitted twice"
    by_start = {r["s"].timestamp(): r["n"] for r in rows}
    # ts=base aligns into the epoch-aligned 30s window starting base-20;
    # that window holds on-time events base..base+9 — exactly 10: the
    # late event (also ts within it) was dropped, and the window was
    # emitted exactly once.
    first_window_start = float(base - (base % 30))
    assert by_start[first_window_start] == 10
    assert sum(by_start.values()) == 31  # 30 on-time + future; late gone


def test_snapshot_sink_incremental_and_idempotent(spark, tmp_path) -> None:
    """Only hash buckets touched by a batch are rewritten, and applying
    the same batch twice leaves the state unchanged (restart safety)."""
    import os as _os

    from maxscale_cdc_connector_spark.operators.cdc import decode_events
    from maxscale_cdc_connector_spark.streaming.ops import SnapshotSink
    from maxscale_cdc_connector_spark.typemap import schema_record_to_struct

    schema = schema_record_to_struct(TEST_SCHEMA_RECORD)

    def as_df(events):
        import json as _json

        lines = [( _json.dumps(e), ) for e in events]
        return decode_events(spark.createDataFrame(lines, "value string"), schema)

    sink = SnapshotSink(str(tmp_path / "state"), ["id"], n_buckets=8)
    sink(as_df([make_event(s, id_=s) for s in range(1, 129)]), 0)

    def bucket_mtimes():
        return {
            d: _os.stat(_os.path.join(sink.path, d)).st_mtime_ns
            for d in _os.listdir(sink.path)
            if d.startswith("_bucket=")
        }

    before = bucket_mtimes()
    assert len(before) == 8  # 128 keys cover all 8 buckets

    # Batch 2 updates a single key → exactly one bucket dir rewritten.
    single = as_df([make_event(1000, "update_after", 2, id_=7, name="seven2")])
    sink(single, 1)
    after = bucket_mtimes()
    changed = {d for d in after if after[d] != before.get(d)}
    assert len(changed) == 1, f"expected 1 rewritten bucket, got {changed}"

    # Idempotency: re-applying the same batch yields identical state.
    state_1 = sorted(
        (r["id"], r["sequence"], r["name"]) for r in sink.snapshot(spark).collect()
    )
    sink(single, 2)
    state_2 = sorted(
        (r["id"], r["sequence"], r["name"]) for r in sink.snapshot(spark).collect()
    )
    assert state_1 == state_2
    assert ({(r[0], r[2]) for r in state_1} >= {(7, "seven2")})


def test_snapshot_sink_consistent_under_reexecuting_source(spark, tmp_path) -> None:
    """The sink must freeze ONE materialization of the batch before its
    multi-action merge (r8 soak finding). A partitioned-CDC batch
    re-executes the live socket read per action, so a batch can GROW
    between the sink's `touched`-bucket collect and its merged write —
    rows seen only by the write landed in buckets absent from
    `touched`, were dropped by the swap, and were permanently skipped
    once the frontier passed them (observed as burst-sized loss on one
    stream). Simulated here with a mapInPandas source whose output
    grows on every execution: the sink must persist exactly ONE
    consistent execution's rows — the first — not a bucket-filtered
    shred of a later one."""
    import json as _json
    import os as _os

    import pandas as pd

    from maxscale_cdc_connector_spark.streaming.ops import SnapshotSink

    counter = str(tmp_path / "executions")

    def growing(batches):
        for _ in batches:
            pass
        n = 1
        if _os.path.exists(counter):
            with open(counter) as fh:
                n = int(fh.read() or "0") + 1
        with open(counter, "w") as fh:
            fh.write(str(n))
        hi = 50 * n  # execution k yields ids 1..50k
        yield pd.DataFrame(
            {
                "domain": [0] * hi,
                "server_id": [3000] * hi,
                "sequence": list(range(1, hi + 1)),
                "event_number": [1] * hi,
                "event_type": ["insert"] * hi,
                "id": list(range(1, hi + 1)),
            }
        )

    batch = spark.range(1).repartition(1).mapInPandas(
        growing,
        "domain int, server_id int, sequence long, event_number int, "
        "event_type string, id int",
    )
    sink = SnapshotSink(str(tmp_path / "state"), ["id"], n_buckets=8)
    sink(batch, 0)
    got = sorted(r["id"] for r in sink.snapshot(spark).collect())
    with open(counter) as fh:
        n_exec = int(fh.read())
    # Exactly one consistent execution persisted — all 50 ids of the
    # frozen first read, no bucket-shredded subset of a later one.
    assert got == list(range(1, 51)), (
        f"inconsistent multi-action state: {len(got)} ids after "
        f"{n_exec} source executions"
    )


def test_snapshot_sink_recovers_interrupted_bucket_swap(spark, tmp_path) -> None:
    """Both driver-crash windows of the bucket swap heal on the next
    process's first read (r8 soak review, restated per ADVICE r8: a
    crashed driver is a NEW sink instance, and recovery runs once per
    instance instead of on every read so a concurrent reader can never
    rewrite a live writer's in-flight swap). A bucket left ONLY under
    the parked pre-merge name (crash between the two renames — its keys
    would otherwise vanish forever, the checkpoint never replays
    consumed events) is restored, and a stale parked copy beside a
    swapped-in dir (crash before rmtree) is dropped. Both the r9 hidden
    ``.old-<part>`` layout and the pre-r9 ``<part>.old`` suffix heal."""
    import os as _os
    import shutil as _shutil

    from maxscale_cdc_connector_spark.operators.cdc import decode_events
    from maxscale_cdc_connector_spark.streaming.ops import SnapshotSink
    from maxscale_cdc_connector_spark.typemap import schema_record_to_struct

    schema = schema_record_to_struct(TEST_SCHEMA_RECORD)

    def as_df(events):
        import json as _json

        lines = [(_json.dumps(e),) for e in events]
        return decode_events(spark.createDataFrame(lines, "value string"), schema)

    path = str(tmp_path / "state")
    sink = SnapshotSink(path, ["id"], n_buckets=4)
    sink(as_df([make_event(s, id_=s) for s in range(1, 65)]), 0)
    want = sorted(r["id"] for r in sink.snapshot(spark).collect())
    buckets = sorted(
        d for d in _os.listdir(sink.path) if d.startswith("_bucket=")
    )
    assert len(buckets) == 4

    # Window 1: crash between rename(dst, .old-dst) and rename(src, dst)
    # — r9 hidden layout. A fresh instance (post-crash driver) heals it.
    b0 = _os.path.join(path, buckets[0])
    _os.rename(b0, _os.path.join(path, ".old-" + buckets[0]))
    sink2 = SnapshotSink(path, ["id"], n_buckets=4)
    assert sorted(r["id"] for r in sink2.snapshot(spark).collect()) == want

    # Window 2: crash between rename(src, dst) and rmtree — the new dir
    # is live, the parked copy is stale garbage. Exercise the legacy
    # pre-r9 ``<part>.old`` suffix to pin backward-compatible healing.
    b1 = _os.path.join(path, buckets[1])
    _shutil.copytree(b1, b1 + ".old")
    sink3 = SnapshotSink(path, ["id"], n_buckets=4)
    assert sorted(r["id"] for r in sink3.snapshot(spark).collect()) == want
    assert not any(
        d.endswith(".old") or d.startswith(".old-")
        for d in _os.listdir(path)
    )

    # Even though a bucket dir briefly went missing above, the hidden
    # parked name must never have surfaced as a partition value.
    assert all(
        d.startswith(("_bucket=", ".")) for d in _os.listdir(path)
    )


def test_snapshot_sink_same_instance_retry_heals_before_merge(
    spark, tmp_path
) -> None:
    """r9 review finding: a swap that fails between its two renames on
    THIS instance leaves the bucket parked while ``_recovered`` is
    already consumed; the supervised query replays the batch on the
    same sink object. The merge must heal BEFORE reading prev, or the
    re-swap replaces the healed bucket with merged output built without
    its pre-existing keys — permanent loss the checkpoint never
    replays."""
    import os as _os

    from maxscale_cdc_connector_spark.operators.cdc import decode_events
    from maxscale_cdc_connector_spark.streaming.ops import SnapshotSink
    from maxscale_cdc_connector_spark.typemap import schema_record_to_struct

    schema = schema_record_to_struct(TEST_SCHEMA_RECORD)

    def as_df(events):
        import json as _json

        lines = [(_json.dumps(e),) for e in events]
        return decode_events(spark.createDataFrame(lines, "value string"), schema)

    path = str(tmp_path / "state")
    sink = SnapshotSink(path, ["id"], n_buckets=4)
    sink(as_df([make_event(s, id_=s) for s in range(1, 65)]), 0)
    want = sorted(r["id"] for r in sink.snapshot(spark).collect())

    # Simulate the failed-swap window on the SAME instance: one bucket
    # parked under its pre-merge name, _recovered already True.
    buckets = sorted(d for d in _os.listdir(path) if d.startswith("_bucket="))
    _os.rename(
        _os.path.join(path, buckets[0]),
        _os.path.join(path, ".old-" + buckets[0]),
    )
    # Apply a batch of NEW keys (32 ids → touches every bucket with
    # certainty under the fixed xxhash64 bucketing), still on the same
    # instance. The parked bucket's pre-existing keys are NOT in this
    # batch, so without the pre-prev heal they cannot be rebuilt from
    # incoming and the re-swap destroys them.
    sink(as_df([make_event(100 + i, id_=100 + i) for i in range(32)]), 1)
    want = sorted(want + [100 + i for i in range(32)])
    got = sorted(r["id"] for r in sink.snapshot(spark).collect())
    assert got == want, (
        f"keys lost across same-instance failed-swap retry: "
        f"{sorted(set(want) - set(got))[:10]} missing"
    )


def test_snapshot_sink_recovery_runs_once_per_instance(spark, tmp_path) -> None:
    """ADVICE r8: recovery must NOT re-run on every read — a concurrent
    reader's recovery landing inside a writer's swap window would rename
    the parked pre-merge copy back over the in-flight swap. Pin the
    contract: after the first read, a parked dir appearing on disk is
    left alone by the same instance (only a fresh instance heals it)."""
    import os as _os
    import shutil as _shutil

    from maxscale_cdc_connector_spark.operators.cdc import decode_events
    from maxscale_cdc_connector_spark.streaming.ops import SnapshotSink
    from maxscale_cdc_connector_spark.typemap import schema_record_to_struct

    schema = schema_record_to_struct(TEST_SCHEMA_RECORD)

    def as_df(events):
        import json as _json

        lines = [(_json.dumps(e),) for e in events]
        return decode_events(spark.createDataFrame(lines, "value string"), schema)

    path = str(tmp_path / "state")
    sink = SnapshotSink(path, ["id"], n_buckets=4)
    sink(as_df([make_event(s, id_=s) for s in range(1, 65)]), 0)
    sink.snapshot(spark)  # first read: recovery consumed here

    buckets = sorted(d for d in _os.listdir(path) if d.startswith("_bucket="))
    parked = _os.path.join(path, ".old-" + buckets[0])
    _shutil.copytree(_os.path.join(path, buckets[0]), parked)
    sink.snapshot(spark)  # same instance: must NOT touch the parked dir
    assert _os.path.isdir(parked)
    _shutil.rmtree(parked)


def test_compact_parquet_reduces_files(spark, tmp_path) -> None:
    """Small-file compaction: 32 tiny files collapse to 1 with content
    preserved exactly."""
    import os as _os

    from maxscale_cdc_connector_spark.operators.maintenance import compact_parquet

    path = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(32).write.parquet(path)
    n_before = sum(1 for f in _os.listdir(path) if f.endswith(".parquet"))
    assert n_before == 32
    before = {r["id"] for r in spark.read.parquet(path).collect()}

    n_after = compact_parquet(spark, path, target_file_mb=128)
    assert n_after == 1
    assert {r["id"] for r in spark.read.parquet(path).collect()} == before


def test_stream_static_enrich_equals_batch(spark, event_log) -> None:
    """Stream-static broadcast enrichment produces exactly the batch join."""
    from maxscale_cdc_connector_spark.streaming.ops import enrich_static

    path, _ = event_log
    dim = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(1, 41)],
        "id int, parity string",
    )
    stream = replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
    q = (
        enrich_static(stream, dim, ["id"])
        .select("sequence", "id", "parity")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["sequence"], r["id"], r["parity"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    batch = replay_batch(spark, path, TEST_SCHEMA_RECORD)
    want = {
        (r["sequence"], r["id"], r["parity"])
        for r in batch.join(dim, ["id"]).select("sequence", "id", "parity").collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_interval_join(spark, event_log) -> None:
    """Watermarked stream-stream join: update_after events join back to
    the insert of the same key within the interval bound."""
    from maxscale_cdc_connector_spark.streaming.ops import stream_stream_interval_join

    path, _ = event_log

    def side(event_type, ts_name, prefix):
        s = replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
        return (
            s.filter(F.col("event_type") == event_type)
            .select(
                F.col("id").alias(f"{prefix}id") if prefix else F.col("id"),
                F.timestamp_seconds(F.col("timestamp")).alias(ts_name),
                F.col("sequence").alias(f"{prefix}seq"),
            )
        )

    inserts = side("insert", "ins_ts", "")
    updates = side("update_after", "upd_ts", "u_")
    # inserts at t+s, updates at t+100+s → delay is exactly 100s per key.
    joined = stream_stream_interval_join(
        inserts.withColumnRenamed("id", "id"),
        updates.withColumnRenamed("u_id", "id"),
        key="id",
        left_ts="ins_ts",
        right_ts="upd_ts",
        watermark="10 seconds",
        max_delay_seconds=150,
    )
    q = (
        joined.select("seq", "u_seq")
        .writeStream.format("memory")
        .queryName("ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {(r["seq"], r["u_seq"]) for r in spark.sql("SELECT * FROM ssjoin").collect()}
    # Every 4th key 1..40 was updated: insert seq=k joins update seq=100+k.
    want = {(k, 100 + k) for k in range(1, 41) if k % 4 == 0}
    assert rows == want


def test_stream_incremental_agg_matches_snapshot(spark, event_log) -> None:
    """The signed-delta rollup (cdc_incremental_agg's shape) maintained
    under micro-batches — with replay dedup restoring exactly-once —
    lands on the aggregate a batch snapshot recompute produces."""
    from maxscale_cdc_connector_spark.operators.cdc import latest_snapshot
    from maxscale_cdc_connector_spark.streaming.ops import dedup_exact

    path, _ = event_log
    sign = (
        F.when(F.col("event_type").isin("insert", "update_after"), F.lit(1))
        .when(F.col("event_type").isin("update_before", "delete"), F.lit(-1))
    )

    def deltas(df):
        return (
            df.select((F.col("id") % 2).alias("grp"), sign.alias("d_rows"),
                      (sign * F.col("id")).alias("d_id"))
            .groupBy("grp")
            .agg(F.sum("d_rows").alias("n_rows"), F.sum("d_id").alias("id_sum"))
        )

    stream = dedup_exact(replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1))
    q = (
        deltas(stream)
        .writeStream.format("memory")
        .queryName("inc_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["grp"]: (r["n_rows"], r["id_sum"])
        for r in spark.sql("SELECT * FROM inc_agg").collect()
        if r["n_rows"] != 0
    }
    snap = latest_snapshot(
        replay_batch(spark, path, TEST_SCHEMA_RECORD).dropDuplicates(
            ["domain", "server_id", "sequence", "event_number"]
        ),
        ["id"],
    )
    want = {
        r["grp"]: (r["n"], r["id_sum"])
        for r in snap.select((F.col("id") % 2).alias("grp"), "id")
        .groupBy("grp")
        .agg(F.count("*").alias("n"), F.sum("id").alias("id_sum"))
        .collect()
    }
    assert got == want and len(want) == 2


def test_stream_stream_left_outer_interval_join(spark, event_log, tmp_path) -> None:
    """Left-outer interval join: matched inserts pair with their update;
    unmatched inserts emit with a NULL right side once the watermark
    passes their interval — no left row is ever lost."""
    from maxscale_cdc_connector_spark.streaming.ops import stream_stream_interval_join

    src, _ = event_log
    # Outer-side emission needs a LATER batch to advance the watermark
    # past each row's interval end. Each side's watermark operator sits
    # AFTER its event_type filter, so the flush batch must contain an
    # event of EACH side's type — a flush insert alone never advances
    # the right (update_after) watermark, and left state finalizes only
    # when the RIGHT watermark passes left_ts + delay.
    import shutil

    path = str(tmp_path / "log_with_flush")
    shutil.copytree(src, path)
    _write_log(
        os.path.join(path, "part-zzz-flush.jsonl"),
        [
            make_event(9999, id_=9999, name="flush"),
            make_event(9998, "update_after", 1, id_=9998, name="flush"),
        ],
    )

    def side(event_type, ts_name, prefix):
        s = replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
        return s.filter(F.col("event_type") == event_type).select(
            F.col("id").alias(f"{prefix}id") if prefix else F.col("id"),
            F.timestamp_seconds(F.col("timestamp")).alias(ts_name),
            F.col("sequence").alias(f"{prefix}seq"),
        )

    joined = stream_stream_interval_join(
        side("insert", "ins_ts", ""),
        side("update_after", "upd_ts", "u_").withColumnRenamed("u_id", "id"),
        key="id",
        left_ts="ins_ts",
        right_ts="upd_ts",
        watermark="10 seconds",
        max_delay_seconds=150,
        how="left_outer",
    )
    q = (
        joined.select("seq", "u_seq")
        .writeStream.format("memory")
        .queryName("ssjoin_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r["seq"], r["u_seq"])
        for r in spark.sql("SELECT * FROM ssjoin_outer").collect()
    }
    matched = {(k, 100 + k) for k in range(1, 41) if k % 4 == 0}
    assert matched <= rows
    # The flush update (no matching insert) must NOT appear: left-outer
    # drops unmatched right rows.
    assert not any(u == 9998 for _, u in rows)
    unmatched_emitted = {s for s, u in rows if u is None and s != 9999}
    # Sequences 1..40 inserted; non-%4 keys have no update. availableNow
    # ends the stream by advancing the watermark to the end of input, so
    # every unmatched insert must have been emitted with NULL by then.
    want_unmatched = {k for k in range(1, 41) if k % 4 != 0}
    assert unmatched_emitted == want_unmatched, (
        sorted(want_unmatched - unmatched_emitted),
        sorted(unmatched_emitted - want_unmatched),
    )


def test_windowed_agg_under_rocksdb_state_store(spark, event_log) -> None:
    """The tumbling agg runs identically under the RocksDB state store
    provider — the bounded-memory state backend a 100 TB stream needs
    (HDFS-backed in-memory maps are the small-state default)."""
    path, _ = event_log
    ts = F.timestamp_seconds(F.col("timestamp"))
    aggs = [F.count("*").alias("n"), F.sum("id").alias("id_sum")]
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = tumbling_agg(
            replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
            .withColumn("ts", ts),
            "ts", "30 seconds", [], aggs,
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("rocksdb_agg")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["win"]["start"], r["n"], r["id_sum"])
            for r in spark.sql("SELECT * FROM rocksdb_agg").collect()
        }
        batch = tumbling_agg(
            replay_batch(spark, path, TEST_SCHEMA_RECORD).withColumn("ts", ts),
            "ts", "30 seconds", [], aggs,
        )
        want = {
            (r["win"]["start"], r["n"], r["id_sum"]) for r in batch.collect()
        }
        assert got == want and len(want) > 0
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stateful_ewma_carries_state_across_micro_batches(spark, tmp_path):
    """Two files + maxFilesPerTrigger=1 force two micro-batches; the
    second batch must fold ON TOP of the first batch's state, so the
    final per-key EWMA equals the single-pass batch fold over the full
    ordered sequence."""
    import json

    from maxscale_cdc_connector_spark.streaming.ops import stateful_ewma

    rows = [
        {"user_id": u, "ts_us": i * 1000, "event_id": i, "value": float((i * 7) % 13) + 0.25}
        for i in range(40)
        for u in [i % 3]
    ]
    # Split by event_id so concatenation preserves the global order.
    log = tmp_path / "ewma_log"
    log.mkdir()
    with open(log / "part-000.jsonl", "w") as fh:
        for r in rows[:20]:
            fh.write(json.dumps(r) + "\n")
    with open(log / "part-001.jsonl", "w") as fh:
        for r in rows[20:]:
            fh.write(json.dumps(r) + "\n")
    # FileStreamSource orders files by modification time; back-to-back
    # writes can land in the same mtime tick, making batch order (and
    # therefore the fold order) nondeterministic. Pin strictly
    # increasing mtimes so part-000 is always micro-batch 1.
    os.utime(log / "part-000.jsonl", (1_700_000_000, 1_700_000_000))
    os.utime(log / "part-001.jsonl", (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("user_id bigint, ts_us bigint, event_id bigint, value double")
        .json(str(log))
    )
    q = (
        stateful_ewma(stream, key_col="user_id")
        .writeStream.format("memory")
        .queryName("ewma_xbatch")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, round(r.ewma, 10))
        for r in spark.sql(
            "SELECT user_id, max(n_events) AS n_events, "
            "max_by(ewma, n_events) AS ewma FROM ewma_xbatch GROUP BY user_id"
        ).collect()
    }
    # Reference: sequential fold over the full ordered sequence per key.
    want = {}
    for r in rows:
        u, x = r["user_id"], r["value"]
        if u not in want:
            want[u] = (1, x)
        else:
            n, ew = want[u]
            want[u] = (n + 1, 0.8 * ew + 0.2 * x)
    want = {u: (n, round(ew, 10)) for u, (n, ew) in want.items()}
    assert got == want


def test_stateful_session_ttl_emits_only_watermark_closed_sessions(spark, tmp_path):
    """EventTimeTimeout state expiry: sessions emit exactly when the
    event-time watermark passes (last event + gap), and the emitting
    key's state is removed — bounded memory for unbounded keyspaces.
    The watermark from batch N's data governs batch N+1's timeouts, so
    a third batch is required to flush sessions closed by the second."""
    import json

    from maxscale_cdc_connector_spark.streaming.ops import stateful_session_ttl

    def ev(user, sec, eid):
        return {"user_id": user, "ts": f"2026-01-01 00:{sec // 60:02d}:{sec % 60:02d}", "event_id": eid}

    log = tmp_path / "ttl_log"
    log.mkdir()
    batches = [
        # users 1 and 2: short sessions around t=0..8s
        [ev(1, 0, 1), ev(1, 5, 2), ev(2, 3, 3), ev(2, 8, 4)],
        # much later traffic advances the watermark far past 8s + 30s gap
        [ev(3, 600, 5)],
        # one more batch so the post-batch-2 watermark drives timeouts
        [ev(3, 610, 6)],
    ]
    for i, rows in enumerate(batches):
        with open(log / f"part-{i:03d}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(log / f"part-{i:03d}.jsonl", (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("user_id bigint, ts string, event_id bigint")
        .json(str(log))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id")
        .withWatermark("ts", "10 seconds")
    )
    q = (
        stateful_session_ttl(stream, gap="30 seconds")
        .writeStream.format("memory")
        .queryName("ttl_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.duration_us)
        for r in spark.sql("SELECT * FROM ttl_sessions").collect()
    }
    # users 1 and 2 closed (watermark 590s >> their end + 30s); user 3's
    # session is still open — its state must NOT have been emitted.
    assert got == {1: (2, 5_000_000), 2: (2, 5_000_000)}, got


def test_stateful_session_ttl_finalizes_late_groups_inline(spark, tmp_path):
    """A key whose ENTIRE history arrives behind the watermark (late
    data, or a replayed shard landing after other keys advanced the
    watermark) cannot arm an EventTimeTimeout — Spark requires the
    timeout to be ahead of the watermark and fails the whole query with
    INVALID_TIMEOUT_TIMESTAMP otherwise (seen at the sf1 sweep: replica
    keys' insert waves landed behind the update-wave watermark). The
    operator must treat 'timeout would already have expired' as 'the
    session is provably closed' and emit it inline with no state."""
    import json

    from maxscale_cdc_connector_spark.streaming.ops import stateful_session_ttl

    def ev(user, sec, eid):
        return {"user_id": user, "ts": f"2026-01-01 00:{sec // 60:02d}:{sec % 60:02d}", "event_id": eid}

    log = tmp_path / "ttl_late_log"
    log.mkdir()
    batches = [
        # batch 1: user 3's traffic at t=600 advances the watermark to 590s
        [ev(3, 600, 1)],
        # batch 2: user 7's whole session is at t=0..5 — entirely behind
        # the 590s watermark; its would-be timeout (5s + 30s gap) is in
        # the past. Old behavior: PySparkValueError kills the query.
        [ev(7, 0, 2), ev(7, 5, 3)],
        # batch 3: more user-3 traffic keeps its session open at the end
        [ev(3, 610, 4)],
    ]
    for i, rows in enumerate(batches):
        with open(log / f"part-{i:03d}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")
        os.utime(log / f"part-{i:03d}.jsonl", (1_700_000_000 + i * 100,) * 2)

    stream = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .schema("user_id bigint, ts string, event_id bigint")
        .json(str(log))
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id")
        .withWatermark("ts", "10 seconds")
    )
    q = (
        stateful_session_ttl(stream, gap="30 seconds")
        .writeStream.format("memory")
        .queryName("ttl_late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.user_id: (r.n_events, r.duration_us)
        for r in spark.sql("SELECT * FROM ttl_late_sessions").collect()
    }
    # user 7 emitted closed despite arriving wholly late; user 3 open.
    assert got == {7: (2, 5_000_000)}, got


def test_dedup_exact_rejects_missing_identity_columns(spark) -> None:
    """r9 review: deduping on a silently-narrowed key collapses
    distinct events (update halves share a GTID); missing identity
    columns are a hard error now."""
    import pytest as _pytest

    from maxscale_cdc_connector_spark.streaming.ops import dedup_exact

    df = spark.createDataFrame(
        [(0, 3000, 1)], "domain int, server_id int, sequence long"
    )  # no event_number
    with _pytest.raises(ValueError, match="event_number"):
        dedup_exact(df)


def test_snapshot_sink_rejects_changed_parameters(spark, tmp_path) -> None:
    """r9 review: restarting a sink with a different n_buckets re-hashes
    keys into new buckets while stale rows sit untouched in old ones —
    two rows per key forever. The meta marker written on first merge
    makes the mismatch a loud constructor-time... merge-time error."""
    import pytest as _pytest

    from maxscale_cdc_connector_spark.operators.cdc import decode_events
    from maxscale_cdc_connector_spark.streaming.ops import SnapshotSink
    from maxscale_cdc_connector_spark.typemap import schema_record_to_struct

    schema = schema_record_to_struct(TEST_SCHEMA_RECORD)

    def as_df(events):
        import json as _json

        lines = [(_json.dumps(e),) for e in events]
        return decode_events(spark.createDataFrame(lines, "value string"), schema)

    path = str(tmp_path / "state")
    SnapshotSink(path, ["id"], n_buckets=8)(as_df([make_event(1, id_=1)]), 0)
    # Same parameters: fine.
    SnapshotSink(path, ["id"], n_buckets=8)(as_df([make_event(2, id_=2)]), 1)
    # Different n_buckets: refused before any corruption.
    with _pytest.raises(ValueError, match="n_buckets"):
        SnapshotSink(path, ["id"], n_buckets=4)(as_df([make_event(3, id_=3)]), 2)
    # Different key_cols: refused too.
    with _pytest.raises(ValueError, match="key_cols|stored"):
        SnapshotSink(path, ["name"], n_buckets=8)(as_df([make_event(4, id_=4)]), 3)


def test_windowed_agg_watermark_covers_column_event_time(spark, event_log) -> None:
    """r9 review: a Column-typed ts with a watermark used to watermark a
    guessed literal 'ts' column — crashing, or bounding state on the
    wrong clock. The helper now materializes the expression and
    watermarks the same column the window uses; append-mode results
    must finalize and arrive."""
    from maxscale_cdc_connector_spark.streaming.ops import tumbling_agg

    path, _ = event_log
    stream = replay_stream(spark, path, TEST_SCHEMA_RECORD, max_files_per_trigger=1)
    out = tumbling_agg(
        stream,
        F.timestamp_seconds(F.col("timestamp")),  # Column, not a name
        "60 seconds",
        ["event_type"],
        [F.count("*").alias("n")],
        watermark="10 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wm_col_agg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM wm_col_agg").collect()
    # Append mode emits only FINALIZED windows: with the watermark bound
    # to the real event-time column, the early windows must have closed.
    assert len(rows) > 0, "no windows finalized — watermark on wrong column"
    assert all(r["n"] > 0 for r in rows)


def test_event_time_private_name_never_clobbers_user_column(spark) -> None:
    """ADVICE r9: a fixed '_event_time' private name silently REPLACED a
    pre-existing user column of that name, corrupting it when it was a
    group key. The helper must pick an unused name instead."""
    from maxscale_cdc_connector_spark.streaming.ops import tumbling_agg

    df = spark.createDataFrame(
        [(g, 1_700_000_000 + i) for i in range(10) for g in ("a", "b")],
        "_event_time string, epoch long",
    )
    out = tumbling_agg(
        df,
        F.timestamp_seconds(F.col("epoch")),  # Column ts, name collision
        "60 seconds",
        ["_event_time"],  # user column with the old private name
        [F.count("*").alias("n")],
    )
    rows = {r["_event_time"]: r["n"] for r in out.collect()}
    # Pre-fix the user column was overwritten by the timestamp expression
    # and the groups became per-second timestamps instead of {'a','b'}.
    assert rows == {"a": 10, "b": 10}


def test_interval_join_outer_preserves_key_from_right(spark) -> None:
    """ADVICE r9: for right/full outer interval joins an unmatched RIGHT
    row has a NULL left key, so dropping the right copy of the equi-key
    lost the key. The coalesced output must keep it for every row.
    (Batch frames: withWatermark is a no-op in batch, and the join
    semantics under test are join-type key handling, not state.)"""
    from maxscale_cdc_connector_spark.streaming.ops import stream_stream_interval_join

    left = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00"), (2, "2026-01-01 00:00:00")],
        "k int, lts string",
    ).select("k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, "2026-01-01 00:00:30"), (9, "2026-01-01 00:00:30")],
        "k int, rts string",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"))

    for how in ("right_outer", "full_outer"):
        out = stream_stream_interval_join(
            left, right, key="k", left_ts="lts", right_ts="rts",
            watermark="10 seconds", max_delay_seconds=60, how=how,
        )
        assert out.columns.count("k") == 1
        keys = {r["k"] for r in out.collect()}
        # Unmatched right key 9 must survive; pre-fix it came back NULL.
        want = {1, 9} if how == "right_outer" else {1, 2, 9}
        assert keys == want, (how, keys)

    # inner/left_outer: unchanged fast path, single key column.
    inner = stream_stream_interval_join(
        left, right, key="k", left_ts="lts", right_ts="rts",
        watermark="10 seconds", max_delay_seconds=60, how="inner",
    )
    assert inner.columns.count("k") == 1
    assert {r["k"] for r in inner.collect()} == {1}

"""Heterogeneous-schema dual-table chaos soak (VERDICT r14 item 5).

Every rung of the composed-chaos ladder runs N streams of ONE schema
through ONE supervised query. A real CDC deployment tails many tables
with different schemas — the reference's one-table-per-connection model
(cdc_connector.h:62-69) fanned out, which this engine models as
``run_supervised_multi`` (streaming/restart.py): N tables, N sinks, one
SparkSession, per-stream failure policy. That primitive has pytest e2e
coverage but had never been soaked. This script closes that:

- TWO tables with DIFFERENT schemas (table A = the ladder's
  id/name/balance record; table B = id/metric(double)/label(varchar24))
  are supervised CONCURRENTLY by one ``run_supervised_multi`` call on
  one SparkSession — two streaming queries, two snapshot sinks, two
  checkpoint/frontier trees.
- Each table runs the ladder's hardest write pattern: active-active
  CONFLICTING writes (all its streams update the same 500-key space
  under one shared GTID space, sourceId discriminators) reconciled by
  the documented cross-source LWW total order (timestamp, _source_id,
  sequence, event_number).
- Chaos runs across BOTH tables at once: server restarts, python-worker
  SIGKILLs (scoped to this driver's tree — r11 lesson), trickle/burst
  feeders, and one mid-chaos ALTER per table (A gains ``extra``, B
  gains ``tag`` — different widenings, so a cross-table schema-cache
  or restart mix-up cannot cancel out).
- End state is EXACT per table: every key at its computed LWW winner's
  payload (including the winner's post-ALTER column value or NULL
  backfill), ``extra_violations: 0``.

Usage: python scripts/soak_hetero.py [--duration 150]
       [--streams-per-table 4] [--seed 8] [--alter-race]

``--alter-race`` (VERDICT r15 item 5) makes the chaos RACE the ALTER:
immediately after the schema change is pushed to every stream, seeded
server restarts and python-worker SIGKILLs land INSIDE the schema-change
drain — first volley while the ``SchemaChangedError`` supervised restart
and per-table schema-cache rewrite are in flight, second volley a few
seconds later against the restarted queries' re-register phase. The
baseline ladder injects the same fault types but on an independent clock
(12-22 s gaps), so they had never been observed mid-ALTER — exactly the
timing where a stale per-table schema cache would corrupt a snapshot.

Prints one summary line; exit 0 iff BOTH tables' exact checks passed.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import random
import signal
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from maxscale_cdc_connector_spark.session import _ensure_worker_pythonpath  # noqa: E402

_ensure_worker_pythonpath()

from tests.fake_maxscale import TEST_SCHEMA_RECORD, FakeMaxScale  # noqa: E402

# Shared chaos helpers (worker-kill scoping carries the r11 lesson: only
# ever SIGKILL workers descending from THIS driver).
_sp_spec = importlib.util.spec_from_file_location(
    "soak_partitioned",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "soak_partitioned.py"),
)
_sp = importlib.util.module_from_spec(_sp_spec)
_sp_spec.loader.exec_module(_sp)
_python_worker_pids = _sp._python_worker_pids
_join_feeders_or_die = _sp._join_feeders_or_die

_ENVELOPE_FIELDS = TEST_SCHEMA_RECORD["fields"][:6]  # domain..event_type

# Table B: deliberately different payload shape from the ladder's
# record — a double and a wider varchar — so the two supervised queries
# genuinely decode different schemas (typemap real_type double path).
HETERO_SCHEMA_RECORD: dict = {
    "namespace": "MaxScaleChangeDataSchema.avro",
    "type": "record",
    "name": "ChangeRecord",
    "fields": _ENVELOPE_FIELDS
    + [
        {"name": "id", "type": "int", "real_type": "int", "length": -1},
        {"name": "metric", "type": "double", "real_type": "double", "length": -1},
        {"name": "label", "type": "string", "real_type": "varchar", "length": 24},
    ],
}

KEY_SPACE = 500


class HeteroStream:
    """One stream's server + full pushed history, parameterized by the
    table's schema and payload factory (soak_partitioned.StreamState is
    hard-wired to the ladder's single schema)."""

    def __init__(
        self,
        group: str,
        idx: int,
        schema: dict,
        payload_fn,
        alter_field: str,
        alter_prefix: str,
        seed: int,
        salt: int,
    ) -> None:
        self.group = group
        self.idx = idx
        self.base_schema = schema
        self.schema = schema
        self.payload_fn = payload_fn
        self.alter_field = alter_field
        self.alter_prefix = alter_prefix
        self.alter_seq: int | None = None
        self.rng = random.Random(seed * 1000 + salt * 100 + idx)
        self.table = f"hetero_{group}.s{idx}"
        self.lock = threading.Lock()
        self.events: list[dict] = []
        self.next_seq = 1
        self.server = FakeMaxScale(
            schema, [], user="soak", password="soak", table=self.table
        )
        self.server.__enter__()
        self.port = self.server.port

    def push(self, n: int) -> None:
        with self.lock:
            for _ in range(n):
                seq = self.next_seq
                # Shared GTID space within the group (active-active):
                # every stream emits IDENTICAL (domain, server_id,
                # sequence) triples; the stamped sourceId keeps them
                # apart — the ladder's --conflict envelope contract.
                ev = {
                    "domain": 0,
                    "server_id": 3000,
                    "sequence": seq,
                    "event_number": 1,
                    "timestamp": 1_700_000_000 + seq,
                    "event_type": "update_after",
                    "id": self.rng.randint(1, KEY_SPACE),
                }
                ev.update(self.payload_fn(self.idx, seq))
                if self.alter_seq is not None:
                    ev[self.alter_field] = f"{self.alter_prefix}{seq}"
                self.events.append(ev)
                self.server.push_event(ev)
                self.next_seq += 1

    def alter(self) -> None:
        with self.lock:
            self.alter_seq = self.next_seq
            widened = dict(self.base_schema)
            widened["fields"] = self.base_schema["fields"] + [
                {
                    "name": self.alter_field,
                    "type": "string",
                    "real_type": "varchar",
                    "length": 16,
                }
            ]
            self.schema = widened
            self.server.push_schema_change(widened)

    def restart(self, downtime: float) -> None:
        with self.lock:
            self.server.stop()
        time.sleep(downtime)
        with self.lock:
            self.server = FakeMaxScale(
                self.schema,
                list(self.events),
                user="soak",
                password="soak",
                table=self.table,
                port=self.port,
            )
            self.server.__enter__()

    def stop(self) -> None:
        with self.lock:
            self.server.stop()


class TableGroup:
    """One table's streams + sink + expected-winner bookkeeping."""

    def __init__(
        self,
        name: str,
        schema: dict,
        payload_fn,
        value_cols: list[str],
        alter_field: str,
        alter_prefix: str,
        n_streams: int,
        seed: int,
        salt: int,
        scratch: str,
    ) -> None:
        from maxscale_cdc_connector_spark.streaming.ops import SnapshotSink

        self.name = name
        self.value_cols = value_cols
        self.alter_field = alter_field
        self.streams = [
            HeteroStream(
                name, i, schema, payload_fn, alter_field, alter_prefix, seed, salt
            )
            for i in range(n_streams)
        ]
        self.sink = SnapshotSink(
            os.path.join(scratch, f"snapshot_{name}"),
            ["id"],
            order_cols=("timestamp", "_source_id", "sequence", "event_number"),
        )
        self.ckpt = os.path.join(scratch, f"ckpt_{name}")
        self.options = {
            "host": "127.0.0.1",
            "user": "soak",
            "password": "soak",
            "schemaRecord": json.dumps(schema),
            "pollseconds": "0.3",
            "maxbatchseconds": "2",
            "maxrecordsperbatch": "30000",
            "streams": json.dumps(
                [
                    {"table": s.table, "port": s.port, "sourceId": f"{name}{s.idx}"}
                    for s in self.streams
                ]
            ),
            "frontierDir": os.path.join(scratch, f"frontier_{name}"),
        }

    def attach(self):
        sink, ckpt = self.sink, self.ckpt

        def _attach(df):
            return (
                df.writeStream.foreachBatch(sink)
                .option("checkpointLocation", ckpt)
                .trigger(processingTime="500 milliseconds")
                .start()
            )

        return _attach

    def expected_winner_map(self) -> dict:
        """LWW winner per key from the FULL recorded push history, under
        the sink's total order; the winner tuple carries the winning
        event's recorded post-ALTER column (None before the boundary) —
        the composed assertion from the ladder's kill-supervisor mode."""
        best: dict[int, tuple] = {}
        for st in self.streams:
            src = f"{self.name}{st.idx}"
            for ev in st.events:
                ordk = (ev["timestamp"], src, ev["sequence"], ev["event_number"])
                k = ev["id"]
                if k not in best or ordk > best[k][0]:
                    best[k] = (
                        ordk,
                        tuple(ev[c] for c in self.value_cols),
                        src,
                        ev.get(self.alter_field),
                    )
        return {k: v[1] + (v[2], v[3]) for k, v in best.items()}

    def read_got_map(self, spark) -> dict:
        """One snapshot read under the winner-tuple shape: the snapshot
        widens to the ALTER column only once the first post-ALTER row
        merges; until then every row's value is the NULL backfill."""
        cur = self.sink.snapshot(spark)
        cols = ["id"] + self.value_cols + ["_source_id"]
        has_alter = self.alter_field in cur.columns
        if has_alter:
            cols.append(self.alter_field)
        rows = cur.select(*cols).collect()
        return {
            r["id"]: tuple(r[c] for c in self.value_cols)
            + (r["_source_id"], r[self.alter_field] if has_alter else None)
            for r in rows
        }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=150.0)
    ap.add_argument("--streams-per-table", type=int, default=4)
    ap.add_argument("--seed", type=int, default=8)
    ap.add_argument("--alter-race", action="store_true")
    args = ap.parse_args()
    rng = random.Random(args.seed)

    from pyspark.sql import SparkSession

    from maxscale_cdc_connector_spark.sources.cdc_datasource import (
        MaxScaleCDCDataSource,
    )
    from maxscale_cdc_connector_spark.streaming.restart import run_supervised_multi

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("cdc_soak_hetero")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(MaxScaleCDCDataSource)

    scratch = tempfile.mkdtemp(prefix="cdc_soak_hetero_")
    groups = [
        TableGroup(
            "a",
            TEST_SCHEMA_RECORD,
            lambda idx, seq: {"name": f"a{idx}.{seq}", "balance": "1.50"},
            ["name"],
            "extra",
            "x",
            args.streams_per_table,
            args.seed,
            salt=1,
            scratch=scratch,
        ),
        TableGroup(
            "b",
            HETERO_SCHEMA_RECORD,
            lambda idx, seq: {"metric": float(seq), "label": f"b{idx}.{seq}"},
            ["label", "metric"],
            "tag",
            "t",
            args.streams_per_table,
            args.seed,
            salt=2,
            scratch=scratch,
        ),
    ]
    all_streams = [s for g in groups for s in g.streams]

    chaos_until = time.time() + args.duration
    t0 = time.time()
    counters = {
        "restarts_injected": 0,
        "workers_killed": 0,
        "bursts": 0,
        "alters": 0,
        "alter_race_restarts": 0,
        "alter_race_kills": 0,
    }

    def feeder(st: HeteroStream) -> None:
        while time.time() < chaos_until:
            t_end = min(time.time() + 4.0, chaos_until)
            while time.time() < t_end:
                st.push(1)
                time.sleep(0.1)
            if time.time() >= chaos_until:
                break
            st.push(2000)
            counters["bursts"] += 1
            time.sleep(1.0)

    def server_chaos() -> None:
        while time.time() < chaos_until:
            time.sleep(rng.uniform(12.0, 22.0))
            if time.time() >= chaos_until:
                break
            st = rng.choice(all_streams)
            print(
                f"[soak] t={time.time()-t0:.1f}s restarting server "
                f"{st.group}/s{st.idx} (head seq {st.next_seq - 1})",
                flush=True,
            )
            st.restart(downtime=rng.uniform(0.3, 1.0))
            counters["restarts_injected"] += 1

    def worker_chaos() -> None:
        while time.time() < chaos_until:
            time.sleep(rng.uniform(10.0, 18.0))
            if time.time() >= chaos_until:
                break
            victims = _python_worker_pids()
            if victims:
                pid = rng.choice(victims)
                try:
                    os.kill(pid, signal.SIGKILL)
                    print(
                        f"[soak] t={time.time()-t0:.1f}s killed worker {pid}",
                        flush=True,
                    )
                    counters["workers_killed"] += 1
                except OSError:
                    pass

    def alter_chaos() -> None:
        # One ALTER per table at half duration, DIFFERENT widenings (A
        # gains ``extra``, B gains ``tag``): if per-table schema caches
        # or restart policy ever crossed tables, the mismatched column
        # names make it a hard failure instead of a silent cancel-out.
        time.sleep(args.duration / 2.0)
        if time.time() >= chaos_until:
            return
        for g in groups:
            for st in g.streams:
                st.alter()
            counters["alters"] += 1
        print(
            f"[soak] t={time.time()-t0:.1f}s ALTER pushed to both tables "
            f"(boundaries "
            f"{ {f'{s.group}/s{s.idx}': s.alter_seq for s in all_streams} })",
            flush=True,
        )
        if not args.alter_race:
            return
        # Chaos racing the ALTER drain (VERDICT r15 item 5). Volley 1
        # lands while the streams are first OBSERVING the schema record
        # (SchemaChangedError -> supervised restart + per-table schema
        # cache rewrite in flight); volley 2 a few seconds later lands
        # on the restarted queries' re-register/resume phase. Both are
        # seeded off the run rng so a failure replays.
        for volley in (1, 2):
            for g in groups:
                for st in rng.sample(g.streams, min(2, len(g.streams))):
                    time.sleep(rng.uniform(0.0, 1.5))
                    print(
                        f"[soak] t={time.time()-t0:.1f}s ALTER-RACE v{volley} "
                        f"restarting server {st.group}/s{st.idx} "
                        f"(head seq {st.next_seq - 1}, alter seq {st.alter_seq})",
                        flush=True,
                    )
                    st.restart(downtime=rng.uniform(0.2, 0.8))
                    counters["restarts_injected"] += 1
                    counters["alter_race_restarts"] += 1
            victims = _python_worker_pids()
            for pid in rng.sample(victims, min(3, len(victims))) if victims else []:
                try:
                    os.kill(pid, signal.SIGKILL)
                    print(
                        f"[soak] t={time.time()-t0:.1f}s ALTER-RACE v{volley} "
                        f"killed worker {pid}",
                        flush=True,
                    )
                    counters["workers_killed"] += 1
                    counters["alter_race_kills"] += 1
                except OSError:
                    pass
            if volley == 1:
                time.sleep(rng.uniform(2.0, 4.0))

    done = threading.Event()
    result: dict = {}

    def supervise() -> None:
        try:
            result["restarts"] = run_supervised_multi(
                spark,
                {g.name: g.options for g in groups},
                {g.name: g.attach() for g in groups},
                max_restarts=1000,
                initial_backoff=0.3,
                max_backoff=5.0,
                stop_when=done.is_set,
                timeout=args.duration + 900.0,
                schema_cache_dir=os.path.join(scratch, "schema_caches"),
            )
        except Exception as exc:  # noqa: BLE001 — surfaced in summary
            result["error"] = f"{type(exc).__name__}: {str(exc)[:20000]}"

    feeders = [
        threading.Thread(target=feeder, args=(s,), daemon=True) for s in all_streams
    ]
    threads = [threading.Thread(target=supervise, daemon=True)]
    threads += feeders
    threads += [
        threading.Thread(target=server_chaos, daemon=True),
        threading.Thread(target=worker_chaos, daemon=True),
        threading.Thread(target=alter_chaos, daemon=True),
    ]
    for th in threads:
        th.start()

    ok_by_table: dict[str, bool] = {g.name: False for g in groups}
    try:
        while time.time() < chaos_until:
            time.sleep(2.0)
        _join_feeders_or_die(feeders)
        total = sum(s.next_seq - 1 for s in all_streams)
        print(
            f"[soak] chaos window closed: {total} events pushed, "
            f"{counters['restarts_injected']} server restarts, "
            f"{counters['workers_killed']} workers killed, "
            f"{counters['bursts']} bursts, {counters['alters']} alters; "
            "draining...",
            flush=True,
        )
        expected = {g.name: g.expected_winner_map() for g in groups}
        got: dict[str, dict] = {g.name: {} for g in groups}
        drain_deadline = time.time() + float(os.environ.get("SOAK_DRAIN_S", "420"))
        while time.time() < drain_deadline and "error" not in result:
            time.sleep(5.0)
            for g in groups:
                if ok_by_table[g.name]:
                    continue
                try:
                    got[g.name] = g.read_got_map(spark)
                except FileNotFoundError:
                    continue
                except Exception:  # noqa: BLE001 — racing the live sink
                    continue
                diff = sum(
                    1
                    for k, v in expected[g.name].items()
                    if got[g.name].get(k) != v
                )
                print(
                    f"[soak] drain poll {g.name}: {len(got[g.name])} keys, "
                    f"{diff} of {len(expected[g.name])} not yet at winner",
                    flush=True,
                )
                ok_by_table[g.name] = got[g.name] == expected[g.name]
            if all(ok_by_table.values()):
                break
        for g in groups:
            # Deadline-exit diagnostics discipline (ADVICE r13): re-read
            # once so the failure diff describes the judged state.
            if not ok_by_table[g.name]:
                try:
                    got[g.name] = g.read_got_map(spark)
                    ok_by_table[g.name] = got[g.name] == expected[g.name]
                except Exception:  # noqa: BLE001 — keep the last poll
                    pass
            counters[f"conflict_keys_{g.name}"] = len(expected[g.name])
            counters[f"extra_violations_{g.name}"] = sum(
                1
                for k, v in expected[g.name].items()
                if got[g.name].get(k) is not None
                and got[g.name][k][:-1] == v[:-1]
                and got[g.name][k][-1] != v[-1]
            )
            if not ok_by_table[g.name]:
                losers = [
                    (k, got[g.name].get(k), v)
                    for k, v in sorted(expected[g.name].items())
                    if got[g.name].get(k) != v
                ]
                print(
                    f"[soak] {g.name} mismatches (first 20): {losers[:20]}",
                    flush=True,
                )
        done.set()
        threads[0].join(60)
    finally:
        done.set()
        for s in all_streams:
            s.stop()

    ok = all(ok_by_table.values()) and "error" not in result
    summary = {
        "ok": ok,
        "ok_by_table": ok_by_table,
        "duration_s": round(time.time() - t0, 1),
        "streams_per_table": args.streams_per_table,
        "events_pushed": sum(s.next_seq - 1 for s in all_streams),
        **counters,
        **result,
    }
    print(f"[soak] HETERO {'PASS' if ok else 'FAIL'} {json.dumps(summary)}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

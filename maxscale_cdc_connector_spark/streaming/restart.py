"""Restart a CDC stream across mid-stream schema changes.

The reference hot-swaps the schema in place and keeps returning rows
(cdc_connector.cpp:339-344); a Spark Structured Streaming query has a
fixed schema, so this engine's source deliberately raises
:class:`SchemaChangedError` and fails the query instead
(sources/protocol.py:47-56). This module supplies the other half of
that design: catch the failure, re-infer the new schema from the
server's leading schema record, and restart the caller's sink from the
same checkpoint.

Delivery stays at-least-once across the boundary: the restarted stream
resumes from the last committed GTID (inclusive replay,
cdc_connector.h:62-69), and replayed rows from before the ALTER
legitimately lack the added columns — so restarted streams run with
``nullMissingColumns=true``, the same NULL-fill MariaDB itself applies
to rows predating an ``ADD COLUMN``. Downstream envelope dedup (the
standard pattern for this source) restores exactly-once.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# The SchemaChangedError message (sources/protocol.py:55) as it surfaces
# inside the StreamingQueryException raised on the driver.
SCHEMA_CHANGE_MARKER = "CDC stream schema changed mid-stream"


def is_schema_change_failure(exc: BaseException) -> bool:
    """True when a streaming-query failure was caused by a mid-stream
    schema record (vs. any other source/sink error)."""
    return SCHEMA_CHANGE_MARKER in str(exc)


def _null_missing_enabled(opts: dict[str, str]) -> bool:
    # The source reads the LOWERCASED key (Spark lowercases option
    # names); callers may have passed either spelling directly.
    return any(
        str(opts.get(k, "")).lower() == "true"
        for k in ("nullMissingColumns", "nullmissingcolumns")
    )


def _read_schema_cache(path: str | None) -> tuple[T.StructType | None, bool]:
    """Returns ``(schema, null_missing)`` from the cache file.

    ``null_missing`` records whether a previous incarnation had already
    enabled the ``nullMissingColumns`` backfill (drift detection or a
    schema-change restart). Persisting it alongside the schema closes
    the ADVICE r9 hole: drift detection writes the NEW inferred schema
    immediately, so a supervisor that dies after that write but before
    the checkpoint passes the ALTER boundary would otherwise see
    cached==inferred on its next run, never re-enable the backfill, and
    fail pre-ALTER replay rows with a non-restartable CDCProtocolError.
    Pre-r10 cache files are the bare schema JSON (null_missing=False).
    """
    if path is None:
        return None, False
    try:
        with open(path) as fh:
            data = json.load(fh)
        if isinstance(data, dict) and "schema" in data:
            return (
                T.StructType.fromJson(data["schema"]),
                bool(data.get("null_missing", False)),
            )
        return T.StructType.fromJson(data), False  # pre-r10 bare-schema file
    except (OSError, ValueError, KeyError, TypeError):
        return None, False


def _write_schema_cache(
    path: str | None, schema: T.StructType, null_missing: bool
) -> None:
    if path is None:
        return
    tmp = f"{path}.tmp"
    try:
        with open(tmp, "w") as fh:
            json.dump({"schema": schema.jsonValue(), "null_missing": null_missing}, fh)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is best-effort; drift detection degrades gracefully


def _load_with_drift_backfill(
    spark: SparkSession,
    opts: dict[str, str],
    last_schema: T.StructType | None,
    cached_null_missing: bool = False,
) -> DataFrame:
    """``load()`` with ALTER-during-downtime drift detection (r9).

    With an un-pinned schema, an ALTER landing while the stream is DOWN
    (in a transport-loss backoff) is absorbed silently by a restart's
    fresh inference — no ``SchemaChangedError`` ever fires, so
    ``nullMissingColumns`` would stay off and the replay of pre-ALTER
    rows (legitimately missing the added column) would fail the
    dense-row contract with a non-restartable ``CDCProtocolError``.
    Comparing the inferred schema against the previous incarnation's
    closes the hole; on drift, MUTATES ``opts`` to enable the backfill
    and reloads. ``cached_null_missing`` replays a PERSISTED enablement
    from a previous supervisor process (ADVICE r9): once any
    incarnation turned the backfill on, every later incarnation runs
    with it until the operator rebuilds the cache, because the
    checkpoint may still replay pre-ALTER rows.
    """
    if cached_null_missing and not _null_missing_enabled(opts):
        opts["nullMissingColumns"] = "true"
    df = spark.readStream.format("maxscale_cdc").options(**opts).load()
    if (
        last_schema is not None
        and df.schema != last_schema
        and not _null_missing_enabled(opts)
    ):
        opts["nullMissingColumns"] = "true"
        df = spark.readStream.format("maxscale_cdc").options(**opts).load()
    return df


def run_with_schema_restarts(
    spark: SparkSession,
    options: dict[str, str],
    attach_sink: Callable[[DataFrame], "object"],
    *,
    max_restarts: int = 3,
    stop_when: Callable[[], bool] | None = None,
    timeout: float = 120.0,
    poll_seconds: float = 0.25,
) -> int:
    """Run a ``maxscale_cdc`` stream, restarting across schema changes.

    ``attach_sink(df)`` attaches the caller's sink and returns the started
    ``StreamingQuery``; it MUST set a ``checkpointLocation`` so each
    restart resumes from the committed GTID rather than the beginning.

    On a schema-change failure the reader options are adjusted for the
    new incarnation: any pinned ``schemaRecord`` is dropped (so the new
    schema is re-inferred from the server's leading schema record) and
    ``nullMissingColumns`` is enabled (see module docstring), then the
    sink is re-attached to a fresh stream. Any other failure re-raises.

    Returns the number of restarts performed. ``stop_when`` is polled
    ~1/``poll_seconds`` per second; when it returns true the current
    query is stopped and the function returns. Without ``stop_when`` the
    function returns when a query incarnation terminates cleanly.
    """
    from pyspark.errors.exceptions.captured import StreamingQueryException

    restarts = 0
    opts = dict(options)
    deadline = time.time() + timeout
    while True:
        df = spark.readStream.format("maxscale_cdc").options(**opts).load()
        query = attach_sink(df)
        try:
            while query.isActive:
                if stop_when is not None and stop_when():
                    query.stop()
                    query.awaitTermination(30)
                    return restarts
                if time.time() > deadline:
                    query.stop()
                    raise TimeoutError(
                        f"stream did not satisfy stop_when within {timeout}s "
                        f"({restarts} restarts)"
                    )
                time.sleep(poll_seconds)
            query.awaitTermination()  # surface the failure, if any
            return restarts  # terminated cleanly
        except StreamingQueryException as exc:
            if not is_schema_change_failure(exc):
                raise
            if restarts >= max_restarts:
                raise RuntimeError(
                    f"schema changed again after {max_restarts} restarts"
                ) from exc
            restarts += 1
            # Re-infer the post-ALTER schema from the server; tolerate
            # replayed pre-ALTER rows missing the added columns.
            opts.pop("schemaRecord", None)
            opts.pop("schemarecord", None)
            opts["nullMissingColumns"] = "true"


# Substrings that mark a TRANSIENT transport failure (server crash,
# network partition, listener not yet back up) as they surface inside a
# StreamingQueryException on the driver. Anything else is a real error.
CONNECTION_FAILURE_MARKERS = (
    "CDC server closed the connection",  # protocol.py read loop
    "Connection refused",
    "Connection reset",
    "Broken pipe",
    "ConnectionRefusedError",
    "ConnectionResetError",
    # A python worker dying mid-task (OOM-killed, SIGKILLed, host
    # failure) is the local-mode face of losing an executor — in
    # cluster mode Spark's own task retries absorb it, but local mode
    # runs with task maxFailures=1, so it escalates straight to query
    # death and must be retried HERE. Found by the r8 adversarial soak
    # (scripts/soak_partitioned.py): a SIGKILLed worker inside the
    # SnapshotSink's foreachBatch collect() surfaced exactly this text.
    # A worker crashing deterministically (e.g. a decode segfault)
    # retries too, but boundedly: max_restarts still caps it.
    "Python worker exited unexpectedly",
    # A server that ACCEPTS the dial but never answers the handshake
    # (wedged process, black-holed link after SYN-ACK) surfaces as the
    # protocol client's handshake-timeout error, not a ConnectionError
    # — it is transport loss all the same (r9; the reference's caller
    # owns this recovery too, cdc_connector.cpp:487-504).
    "Request timed out",
)


def is_connection_failure(exc: BaseException) -> bool:
    """True when a streaming-query failure looks like transport loss.

    Matches by exception TYPE for raw (non-query-wrapped) errors — a
    synchronous ``load()`` probe against a hung server raises a bare
    ``TimeoutError("timed out")`` whose text is too generic to pattern-
    match safely — and by marker text for failures captured inside a
    ``StreamingQueryException``.
    """
    if isinstance(exc, (ConnectionError, TimeoutError)):
        return True
    text = str(exc)
    return any(m in text for m in CONNECTION_FAILURE_MARKERS)


def run_supervised(
    spark: SparkSession,
    options: dict[str, str],
    attach_sink: Callable[[DataFrame], "object"],
    *,
    max_restarts: int = 5,
    initial_backoff: float = 0.5,
    max_backoff: float = 30.0,
    stop_when: Callable[[], bool] | None = None,
    timeout: float = 120.0,
    poll_seconds: float = 0.25,
    schema_cache: str | None = None,
) -> int:
    """Production supervision for a ``maxscale_cdc`` stream: restart
    across BOTH restartable failure classes —

    - mid-stream schema change → drop the pinned ``schemaRecord`` so the
      new schema re-infers, enable ``nullMissingColumns`` (same
      semantics as :func:`run_with_schema_restarts`);
    - transport loss (server crash / network partition) → exponential
      backoff (``initial_backoff`` doubling to ``max_backoff``), then
      reattach with UNCHANGED options.

    Every restart resumes from the committed GTID in the sink's
    ``checkpointLocation`` (which ``attach_sink`` MUST set), so delivery
    stays at-least-once across any number of restarts and never replays
    from before the checkpoint. A successful reconnection resets the
    backoff. Any non-restartable failure re-raises immediately.

    Returns the number of restarts performed. The reference client
    surfaces transport loss as a read error and leaves recovery to the
    caller (cdc_connector.cpp:237-360); this wrapper IS that caller,
    done once, with Spark's checkpoint as the resume cursor.

    ALTER-during-downtime is covered for BOTH schema modes (r9): with a
    pinned ``schemaRecord``, the next connection's leading-record
    comparison (done by both readers) raises ``SchemaChangedError`` and
    this wrapper handles it; with an un-pinned schema, the next
    restart's fresh inference absorbs the ALTER silently — detected
    here by comparing the inferred schema across restarts, which
    enables ``nullMissingColumns`` exactly as a detected schema change
    would (otherwise the replay of pre-ALTER rows, legitimately missing
    the added column, would fail the dense-row contract with a
    non-restartable ``CDCProtocolError``). Pass ``schema_cache`` (a
    file path, e.g. next to the checkpoint) to make that detection
    survive SUPERVISOR restarts too: without it the comparison state is
    process-local, and an un-pinned deployment redeployed after an
    ALTER — with the checkpoint GTID still before the ALTER boundary —
    would re-open the hole on its first replay.
    """
    from pyspark.errors.exceptions.captured import StreamingQueryException

    restarts = 0
    backoff = initial_backoff
    opts = dict(options)
    deadline = time.time() + timeout
    last_schema, cached_nm = _read_schema_cache(schema_cache)
    while True:
        try:
            df = _load_with_drift_backfill(spark, opts, last_schema, cached_nm)
            last_schema = df.schema
            # Persist the backfill enablement WITH the schema (ADVICE
            # r9): the cache must never claim the post-ALTER schema
            # without also recording that nullMissingColumns is on, or
            # a supervisor restarted in that window replays pre-ALTER
            # rows without the backfill.
            cached_nm = _null_missing_enabled(opts)
            _write_schema_cache(schema_cache, last_schema, cached_nm)
            query = attach_sink(df)
        except Exception as exc:  # noqa: BLE001 — classified below
            # load() probes the server for schema when schemaRecord is
            # not pinned (guaranteed after a schema-change restart pops
            # it), so a still-down server fails HERE, synchronously —
            # that is just another transport loss: consume a restart and
            # back off, same policy as an in-query connection failure
            # (mirrors run_supervised_multi's safe_start).
            if not is_connection_failure(exc):
                raise
            if restarts >= max_restarts:
                raise RuntimeError(
                    f"stream still failing after {max_restarts} restarts"
                ) from exc
            if time.time() > deadline:
                raise TimeoutError(
                    f"stream did not satisfy stop_when within {timeout}s "
                    f"({restarts} restarts)"
                ) from exc
            restarts += 1
            time.sleep(min(backoff, max_backoff))
            backoff = min(backoff * 2, max_backoff)
            continue
        try:
            while query.isActive:
                if stop_when is not None and stop_when():
                    query.stop()
                    query.awaitTermination(30)
                    return restarts
                if time.time() > deadline:
                    query.stop()
                    raise TimeoutError(
                        f"stream did not satisfy stop_when within {timeout}s "
                        f"({restarts} restarts)"
                    )
                time.sleep(poll_seconds)
            query.awaitTermination()  # surface the failure, if any
            return restarts  # terminated cleanly
        except StreamingQueryException as exc:
            schema_change = is_schema_change_failure(exc)
            if not schema_change and not is_connection_failure(exc):
                raise
            if restarts >= max_restarts:
                raise RuntimeError(
                    f"stream still failing after {max_restarts} restarts"
                ) from exc
            restarts += 1
            if schema_change:
                opts.pop("schemaRecord", None)
                opts.pop("schemarecord", None)
                opts["nullMissingColumns"] = "true"
                backoff = initial_backoff  # new incarnation, fresh budget
            else:
                time.sleep(min(backoff, max_backoff))
                backoff = min(backoff * 2, max_backoff)


class _SupervisedStream:
    """Book-keeping for one table's stream under :func:`run_supervised_multi`."""

    def __init__(
        self,
        name: str,
        options: dict[str, str],
        attach_sink,
        initial_backoff: float,
        schema_cache: str | None = None,
    ):
        self.name = name
        self.opts = dict(options)
        self.attach_sink = attach_sink
        self.backoff = initial_backoff
        self.restarts = 0
        self.query = None
        self.restart_at: float | None = None  # backoff wait, when query is None
        self.done = False  # terminated cleanly
        self.schema_cache = schema_cache
        self.last_schema, self.cached_nm = _read_schema_cache(schema_cache)

    def start(self, spark: SparkSession) -> None:
        # ALTER-during-downtime drift detection, shared with
        # run_supervised (see _load_with_drift_backfill).
        df = _load_with_drift_backfill(
            spark, self.opts, self.last_schema, self.cached_nm
        )
        self.last_schema = df.schema
        self.cached_nm = _null_missing_enabled(self.opts)
        _write_schema_cache(self.schema_cache, self.last_schema, self.cached_nm)
        self.query = self.attach_sink(df)
        self.restart_at = None


def run_supervised_multi(
    spark: SparkSession,
    tables: dict[str, dict[str, str]],
    attach_sinks: dict[str, Callable[[DataFrame], "object"]],
    *,
    max_restarts: int = 5,
    initial_backoff: float = 0.5,
    max_backoff: float = 30.0,
    stop_when: Callable[[], bool] | None = None,
    timeout: float = 120.0,
    poll_seconds: float = 0.25,
    schema_cache_dir: str | None = None,
) -> dict[str, int]:
    """Supervise N tables' CDC streams into N sinks with ONE call.

    ``schema_cache_dir``: optional directory for per-stream inferred-
    schema caches (``<dir>/<name>.schema.json``) so ALTER-during-
    downtime drift detection survives supervisor restarts, per
    :func:`run_supervised`'s ``schema_cache``.

    The reference's consumer model is one session per table
    (cdc_connector.h:62-69), so its caller hand-rolls a thread-and-loop
    per table (examples/main.cpp:27-44). This is that loop done once for
    a whole database: ``tables`` maps a stream name to its reader
    options, ``attach_sinks`` maps the same name to its sink attachment
    (each MUST set its own ``checkpointLocation``, e.g. one snapshot
    store per table). All queries run concurrently on the shared
    SparkSession; one monitor polls them and applies
    :func:`run_supervised`'s per-failure policy INDEPENDENTLY per
    stream — a schema change on one table re-infers and restarts only
    that table; a dead server backs off only that table's stream (the
    backoff is non-blocking: other streams keep being monitored while
    one waits). A non-restartable failure on any stream stops all of
    them and re-raises.

    Returns ``{name: restarts}`` once ``stop_when`` fires or every
    stream has terminated cleanly.
    """
    if set(tables) != set(attach_sinks):
        raise ValueError(
            f"tables and attach_sinks must share keys: {set(tables) ^ set(attach_sinks)}"
        )
    if schema_cache_dir is not None:
        os.makedirs(schema_cache_dir, exist_ok=True)

    def cache_path(name: str) -> str | None:
        if schema_cache_dir is None:
            return None
        import re as _re

        safe = _re.sub(r"[^A-Za-z0-9_.-]", "_", name)
        return os.path.join(schema_cache_dir, f"{safe}.schema.json")

    streams = [
        _SupervisedStream(
            name, opts, attach_sinks[name], initial_backoff,
            schema_cache=cache_path(name),
        )
        for name, opts in tables.items()
    ]
    for s in streams:
        s.start(spark)
    deadline = time.time() + timeout

    def stop_all() -> None:
        for s in streams:
            if s.query is not None and s.query.isActive:
                s.query.stop()
        for s in streams:
            if s.query is not None:
                try:
                    s.query.awaitTermination(30)
                except Exception:  # noqa: BLE001 — already stopping
                    pass

    def safe_start(s: _SupervisedStream) -> None:
        """(Re)start one stream WITHOUT letting a start-time connection
        failure escape the monitor loop.

        ``start()`` itself can touch the CDC server: after a
        schema-change restart ``schemaRecord`` is popped, so ``load()``
        re-probes the server for schema — against a still-down server
        that raises ``ConnectionRefusedError`` synchronously (not inside
        the query). That is just another transport loss: consume a
        restart and back off this table only, keeping the documented
        guarantee that a dead server affects only its own stream. Any
        non-transport start failure stops every stream and re-raises.
        """
        try:
            s.start(spark)
        except Exception as exc:  # noqa: BLE001 — classified below
            if not is_connection_failure(exc):
                stop_all()
                raise
            if s.restarts >= max_restarts:
                stop_all()
                raise RuntimeError(
                    f"stream {s.name!r} still failing after {max_restarts} restarts"
                ) from exc
            s.restarts += 1
            s.query = None
            s.restart_at = time.time() + min(s.backoff, max_backoff)
            s.backoff = min(s.backoff * 2, max_backoff)

    while True:
        if stop_when is not None and stop_when():
            stop_all()
            return {s.name: s.restarts for s in streams}
        if time.time() > deadline:
            stop_all()
            raise TimeoutError(
                f"streams did not satisfy stop_when within {timeout}s "
                f"({ {s.name: s.restarts for s in streams} })"
            )
        if all(s.done for s in streams):
            return {s.name: s.restarts for s in streams}
        for s in streams:
            if s.done:
                continue
            if s.query is None:  # waiting out a backoff window
                if s.restart_at is not None and time.time() >= s.restart_at:
                    safe_start(s)
                continue
            if s.query.isActive:
                continue
            exc = s.query.exception()
            if exc is None:
                s.done = True  # clean termination
                continue
            schema_change = is_schema_change_failure(exc)
            if not schema_change and not is_connection_failure(exc):
                stop_all()
                raise exc
            if s.restarts >= max_restarts:
                stop_all()
                raise RuntimeError(
                    f"stream {s.name!r} still failing after {max_restarts} restarts"
                ) from exc
            s.restarts += 1
            if schema_change:
                s.opts.pop("schemaRecord", None)
                s.opts.pop("schemarecord", None)
                s.opts["nullMissingColumns"] = "true"
                s.backoff = initial_backoff  # new incarnation, fresh budget
                safe_start(s)
            else:
                s.query = None
                s.restart_at = time.time() + min(s.backoff, max_backoff)
                s.backoff = min(s.backoff * 2, max_backoff)
        time.sleep(poll_seconds)

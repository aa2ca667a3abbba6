"""In-process fake MaxScale CDC server for protocol tests.

Speaks exactly the session protocol proven from the reference
(SURVEY.md §2A): SHA1-credential auth → ``OK``, ``REGISTER`` → ``OK``,
``REQUEST-DATA db.table [gtid]`` → schema record then newline-JSON data
events; server failures as ``ERR``-prefixed lines; silence (timeout) is
a legal idle state. Test hooks: resume filtering from a GTID, live event
pushes, mid-stream schema records, forced auth/request failures.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading
import time
from typing import Any

from maxscale_cdc_connector_spark.sources.protocol import REGISTER_MESSAGE, auth_string


def _gtid_key(gtid: str) -> tuple[int, int, int]:
    d, s, q = gtid.split("-")
    return (int(d), int(s), int(q))


class FakeMaxScale:
    """Tiny threaded CDC server bound to 127.0.0.1:<ephemeral>."""

    def __init__(
        self,
        schema_record: dict[str, Any],
        events: list[dict[str, Any]],
        user: str = "cdcuser",
        password: str = "cdcpw",
        table: str = "test.t1",
        fail_auth: bool = False,
        err_on_request: str | None = None,
        err_no_newline: bool = False,
        port: int = 0,
        auth_delay_seconds: float = 0.0,
    ) -> None:
        self.schema_record = schema_record
        self.user = user
        self.password = password
        self.table = table
        self.fail_auth = fail_auth
        self.err_on_request = err_on_request
        self.err_no_newline = err_no_newline
        # Delay before the auth OK — models a loaded-but-healthy server
        # (the handshake-vs-idle-poll timeout decoupling test).
        self.auth_delay_seconds = auth_delay_seconds
        # The outbound stream: each item is ("event"|"schema", dict,
        # gtid_key|None, wire_bytes). The key and wire form are computed
        # ONCE at push time: r12's 16-stream soak showed the old
        # per-dial shape (re-acquire the condition lock per item and
        # json.dumps on the way out) collapsing drain redelivery to
        # ~220 ev/s/stream — 16 handler threads each GIL-stepping
        # through a 120k-item history from index 0 on EVERY trigger's
        # re-dial. Serving is now: one locked scan to find the resume
        # point, then chunked lock-free sends of pre-serialized bytes.
        self._items: list[tuple[str, dict[str, Any], tuple | None, bytes]] = [
            self._wrap("event", e) for e in events
        ]
        self._cond = threading.Condition()
        self._closed = False

        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:  # noqa: D102
                outer._serve(self.request)

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        # ``port=0`` binds an ephemeral port; a crash-recovery test passes
        # the previous instance's port so the "recovered server" comes
        # back at the address the streaming query's options point at.
        self._server = Server(("127.0.0.1", port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)

    # -- lifecycle ----------------------------------------------------------

    def __enter__(self) -> FakeMaxScale:
        self._thread.start()
        return self

    def __exit__(self, *exc: object) -> None:
        self.stop()

    def stop(self) -> None:
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._server.shutdown()
        self._server.server_close()

    # -- test hooks ---------------------------------------------------------

    @staticmethod
    def _wrap(kind: str, obj: dict[str, Any]) -> tuple[str, dict[str, Any], tuple | None, bytes]:
        key = (
            (obj["domain"], obj["server_id"], obj["sequence"])
            if kind == "event"
            else None
        )
        return (kind, obj, key, (json.dumps(obj) + "\n").encode())

    def push_event(self, event: dict[str, Any]) -> None:
        item = self._wrap("event", event)
        with self._cond:
            self._items.append(item)
            self._cond.notify_all()

    def push_schema_change(self, schema_record: dict[str, Any]) -> None:
        """ALTER TABLE: in-flight connections get a mid-stream schema
        record; connections opened afterwards get the new schema as
        their leading record (avrorouter serves the current version)."""
        item = self._wrap("schema", schema_record)
        with self._cond:
            self._items.append(item)
            self.schema_record = schema_record
            self._cond.notify_all()

    # -- the protocol -------------------------------------------------------

    def _serve(self, sock: socket.socket) -> None:
        try:
            expected = auth_string(self.user, self.password)
            got = self._recv_exact(sock, len(expected))
            if self.fail_auth or got != expected:
                sock.sendall(b"ERR access denied\n")
                return
            if self.auth_delay_seconds:
                time.sleep(self.auth_delay_seconds)
            sock.sendall(b"OK\n")

            reg = self._recv_exact(sock, len(REGISTER_MESSAGE.encode()))
            if not reg.startswith(b"REGISTER"):
                sock.sendall(b"ERR bad registration\n")
                return
            sock.sendall(b"OK\n")

            req = sock.recv(4096).decode("utf-8")
            if self.err_on_request:
                # Real MaxScale error messages may lack the trailing
                # newline (the reference works around this,
                # cdc_connector.cpp:494-504).
                tail = "" if self.err_no_newline else "\n"
                sock.sendall(f"ERR {self.err_on_request}{tail}".encode())
                if self.err_no_newline:
                    # Hold the socket open so the client hits its read
                    # timeout with the unterminated ERR still buffered.
                    time.sleep(1.0)
                return
            parts = req.split()
            if len(parts) < 2 or parts[0] != "REQUEST-DATA" or parts[1] != self.table:
                sock.sendall(b"ERR unknown table\n")
                return
            resume = _gtid_key(parts[2]) if len(parts) >= 3 else None

            leading = self.schema_record
            sock.sendall((json.dumps(leading) + "\n").encode())
            sent = 0
            if resume is not None:
                # One locked pass to the resume point instead of a
                # per-item lock/skip loop on every dial: events are
                # appended in key order, so everything before the first
                # key >= resume is skippable wholesale. Mid-history
                # schema records inside the skipped prefix are
                # irrelevant to a resuming client — it already holds
                # the CURRENT schema from the leading record. Resume
                # replays FROM the given GTID inclusive — at-least-once,
                # per cdc_connector.h:62-69.
                with self._cond:
                    items = self._items
                    n = len(items)
                    while sent < n and (
                        items[sent][2] is None or items[sent][2] < resume
                    ):
                        sent += 1
            while True:
                with self._cond:
                    while sent >= len(self._items) and not self._closed:
                        self._cond.wait(timeout=0.2)
                    if self._closed and sent >= len(self._items):
                        return
                    # Chunked hand-off: grab a slice under the lock,
                    # serialize/send outside it (the bytes are already
                    # on the items).
                    chunk = self._items[sent : sent + 2048]
                sent += len(chunk)
                out: list[bytes] = []
                for kind, obj, key, raw in chunk:
                    if kind == "schema" and obj == leading:
                        # Already announced as this connection's leading
                        # record — only a *different* version mid-stream
                        # is a schema change.
                        continue
                    if key is not None and resume is not None and key < resume:
                        continue
                    out.append(raw)
                if out:
                    sock.sendall(b"".join(out))
        except (BrokenPipeError, ConnectionResetError, OSError):
            pass
        finally:
            try:
                sock.close()
            except OSError:
                pass

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                return buf
            buf += chunk
        return buf


# A ready-made schema record + event log used across tests.
TEST_SCHEMA_RECORD: dict[str, Any] = {
    "namespace": "MaxScaleChangeDataSchema.avro",
    "type": "record",
    "name": "ChangeRecord",
    "fields": [
        {"name": "domain", "type": "int", "real_type": "int", "length": -1},
        {"name": "server_id", "type": "int", "real_type": "int", "length": -1},
        {"name": "sequence", "type": "int", "real_type": "bigint", "length": -1},
        {"name": "event_number", "type": "int", "real_type": "int", "length": -1},
        {"name": "timestamp", "type": "int", "real_type": "bigint", "length": -1},
        {
            "name": "event_type",
            "type": {"type": "enum", "name": "EVENT_TYPES"},
            "real_type": "varchar",
            "length": 32,
        },
        {"name": "id", "type": "int", "real_type": "int", "length": -1},
        {"name": "name", "type": "string", "real_type": "varchar", "length": 40},
        {"name": "balance", "type": "string", "real_type": "decimal", "length": 10},
    ],
}


def make_event(
    sequence: int,
    event_type: str = "insert",
    event_number: int = 1,
    id_: int | None = None,
    name: str = "row",
    balance: str = "1.50",
) -> dict[str, Any]:
    return {
        "domain": 0,
        "server_id": 3000,
        "sequence": sequence,
        "event_number": event_number,
        "timestamp": 1_700_000_000 + sequence,
        "event_type": event_type,
        "id": id_ if id_ is not None else sequence,
        "name": name,
        "balance": balance,
    }

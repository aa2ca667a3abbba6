"""`maxscale_cdc` — a Structured Streaming source for the CDC protocol.

Usage::

    spark.dataSource.register(MaxScaleCDCDataSource)
    df = (spark.readStream.format("maxscale_cdc")
          .option("host", "127.0.0.1").option("port", 4001)
          .option("user", "cdcuser").option("password", "cdc")
          .option("table", "db.t")
          .option("gtid", "0-3000-41")        # optional resume position
          .load())

The stream delivers typed columns (envelope + payload) whose schema is
built from the server's leading schema record via the typemap — the
engine's replacement for the reference's string-valued rows
(cdc_connector.cpp:80-115; SURVEY.md §1.4).

Architecture: one CDC session is one socket streaming one table in GTID
order (cdc_connector.h:62-69), so the source is a
``SimpleDataSourceStreamReader`` — the driver prefetches records and
ships them to executors as micro-batch partitions, exactly the shape of
a one-partition Kafka topic. Parallelism begins at the first downstream
shuffle. Offsets are GTIDs (``domain-server_id-sequence``), the same
resume token the reference asks callers to keep
(cdc_connector.h:62-69); Spark's checkpoint persists them, which the
reference delegated to the application.

Delivery is at-least-once: resuming from a GTID replays that GTID's
events (reference semantics, cdc_connector.cpp:199-206), so snapshots
downstream dedup on the envelope key first (streaming/ops.py).
"""

from __future__ import annotations

import datetime
import decimal
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from maxscale_cdc_connector_spark.sources.protocol import (
    CDCClient,
    CDCProtocolError,
    SchemaChangedError,
)
from maxscale_cdc_connector_spark.streaming.ops import SOURCE_ID_COL
from maxscale_cdc_connector_spark.typemap import schema_record_to_struct


def _source_id_active(options) -> bool:
    """True when the partitioned reader will stamp ``_source_id``: the
    global ``sourceId`` option is set, or any per-stream config carries
    a ``sourceId`` key (VERDICT r8 item 5 — multi-server ingest)."""
    if options.get("sourceid"):
        return True
    import json as _json

    try:
        streams = _json.loads(options.get("streams", "[]"))
    except ValueError:
        return False
    return any(isinstance(s, dict) and s.get("sourceId") for s in streams)


DEFAULT_MAX_RECORDS_PER_BATCH = 100_000
DEFAULT_POLL_SECONDS = 1.0
# Wall-clock bound on one micro-batch's read. Without it a batch only
# ends on idle (a ≥ pollSeconds silence) or the record cap — so a
# steady trickle arriving FASTER than pollSeconds but far slower than
# the cap (e.g. 20 ev/s against a 100k cap) would hold the first batch
# open for hours and nothing would ever commit. The bound turns a
# continuous stream into bounded batches regardless of arrival rhythm;
# delivered rows still advance the offset, so ending early is just a
# batch boundary, never loss. Override with option `maxBatchSeconds`
# (bulk replays that must drain in ONE batch — availableNow harnesses —
# should raise it above their expected drain time).
DEFAULT_MAX_BATCH_SECONDS = 10.0


def _converter(dt: T.DataType) -> Callable[[Any], Any]:
    """JSON-native value → Python value matching the Spark type.

    The wire format is JSON (registration is hardwired to TYPE=JSON,
    cdc_connector.cpp:37,45), so integers/floats/strings/bools/nulls
    arrive native and temporal/decimal types arrive as strings.
    """
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return lambda v: None if v is None else int(v)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return lambda v: None if v is None else float(v)
    if isinstance(dt, T.DecimalType):
        return lambda v: None if v is None else decimal.Decimal(str(v))
    if isinstance(dt, T.BooleanType):
        return lambda v: None if v is None else bool(v)
    if isinstance(dt, T.DateType):
        return lambda v: None if v is None else datetime.date.fromisoformat(str(v))
    if isinstance(dt, T.TimestampType):
        return lambda v: None if v is None else datetime.datetime.fromisoformat(str(v))
    if isinstance(dt, T.BinaryType):
        return lambda v: None if v is None else (v if isinstance(v, bytes) else str(v).encode())
    # StringType and anything exotic: stringify non-null scalars — the
    # typed analog of json_to_string (cdc_connector.cpp:80-115), except
    # null stays null instead of "".
    return lambda v: None if v is None else (v if isinstance(v, str) else str(v))


def _gtid_key(gtid: str | None) -> tuple[int, int, int]:
    if not gtid:
        return (-1, -1, -1)
    d, s, q = gtid.split("-")
    return (int(d), int(s), int(q))


def build_row(
    record: dict[str, Any],
    convs: list[tuple[str, Callable[[Any], Any]]],
    null_missing: bool,
) -> tuple:
    """One wire record → one typed row tuple (shared by both readers).

    Dense-row contract: a data record missing a schema key is a protocol
    error (cdc_connector.cpp:297-308) unless ``null_missing`` (the
    schema-change restart path) asked for NULL backfill.
    """
    if null_missing:
        return tuple(conv(record.get(name)) for name, conv in convs)
    try:
        return tuple(conv(record[name]) for name, conv in convs)
    except KeyError as exc:
        raise CDCProtocolError(f"No value for key found: {exc.args[0]}") from None


class CDCSimpleStreamReader(SimpleDataSourceStreamReader):
    """Driver-side prefetching reader with GTID offsets."""

    def __init__(self, schema: T.StructType, options: dict[str, str]) -> None:
        if options.get("sourceid") is not None:
            # Fail loudly (r9 review): silently ignoring sourceId here
            # would let two single-stream queries from different servers
            # feed one sink with colliding envelopes un-discriminated —
            # the exact collapse the option exists to prevent.
            raise ValueError(
                "sourceId is only honored by the partitioned reader (set "
                "the 'streams' option), which stamps the _source_id "
                "column; for single-stream queries add the discriminator "
                "yourself with .withColumn('_source_id', lit(...)) before "
                "any shared sink/dedup"
            )
        self._schema = schema
        self._options = options
        self._convs = [(f.name, _converter(f.dataType)) for f in schema.fields]
        self._client: CDCClient | None = None
        self._max_records = int(
            options.get("maxrecordsperbatch", DEFAULT_MAX_RECORDS_PER_BATCH)
        )
        self._poll_seconds = float(options.get("pollseconds", DEFAULT_POLL_SECONDS))
        # Handshake deadline, decoupled from the idle poll (r10): the
        # client defaults it to max(pollSeconds, 10 s); the option exists
        # for tests that wedge a server and want the hung phase to cycle
        # fast, and for genuinely slow links.
        hs = options.get("handshakeseconds")
        self._handshake_seconds = float(hs) if hs is not None else None
        self._max_batch_seconds = float(
            options.get("maxbatchseconds", DEFAULT_MAX_BATCH_SECONDS)
        )
        # NULL-fill columns missing from a record instead of failing the
        # dense-row contract. Off by default; set by the schema-change
        # restart wrapper (streaming/restart.py) because an at-least-once
        # resume across an ALTER boundary replays pre-ALTER rows that
        # legitimately lack the added columns — the same NULL-fill
        # MariaDB applies to rows predating an ADD COLUMN.
        self._null_missing = (
            options.get("nullmissingcolumns", "false").lower() == "true"
        )

    # -- offsets ------------------------------------------------------------

    def initialOffset(self) -> dict:
        return {"gtid": self._options.get("gtid", "")}

    def commit(self, end: dict) -> None:
        # The server keeps no consumer positions — the checkpoint is the
        # only offset store (a strict improvement over the reference,
        # which makes the application carry the GTID, cdc_connector.h:62-69).
        pass

    # -- reading ------------------------------------------------------------

    def _connect(self, gtid: str) -> CDCClient:
        client = CDCClient(
            host=self._options.get("host", "127.0.0.1"),
            port=int(self._options.get("port", 4001)),
            user=self._options.get("user", ""),
            password=self._options.get("password", ""),
            table=self._options["table"],
            gtid=gtid or None,
            timeout=self._poll_seconds,
            handshake_timeout=self._handshake_seconds,
        )
        client.connect()
        # Compare the leading schema record to the query's fixed schema,
        # like the partitioned reader does per micro-batch (r9 review):
        # without this, an ALTER landing while this reader was
        # DISCONNECTED (transport-loss backoff) is absorbed silently on
        # reconnect — the avrorouter announces the CURRENT version as
        # the leading record, so a mismatch here is a schema change the
        # mid-stream detection can never see.
        if client.schema_record is not None:
            live = schema_record_to_struct(client.schema_record)
            if [(f.name, f.dataType) for f in live.fields] != [
                (f.name, f.dataType) for f in self._schema.fields
            ]:
                record = client.schema_record
                client.close()
                raise SchemaChangedError(record)
        return client

    def _row(self, record: dict[str, Any]) -> tuple:
        return build_row(record, self._convs, self._null_missing)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        gtid = start.get("gtid", "")
        if self._client is None:
            self._client = self._connect(gtid)
        rows: list[tuple] = []
        last_gtid = gtid
        import time as _time

        deadline = _time.monotonic() + self._max_batch_seconds
        try:
            for _ in range(self._max_records):
                record = self._client.read_record()
                if record is None:  # idle timeout → empty/partial batch
                    break
                if _time.monotonic() > deadline:
                    # Steady-trickle guard (see DEFAULT_MAX_BATCH_SECONDS):
                    # close the batch; the rows read so far commit and the
                    # offset advances.
                    rows.append(self._row(record))
                    last_gtid = (
                        f"{record['domain']}-{record['server_id']}-{record['sequence']}"
                    )
                    break
                rows.append(self._row(record))
                last_gtid = (
                    f"{record['domain']}-{record['server_id']}-{record['sequence']}"
                )
        except SchemaChangedError:
            # Surface after the already-read rows are committed would be
            # nicer, but a fixed-schema stream cannot carry them: fail the
            # query now; the checkpoint resumes at `start` under the new
            # schema on restart (SURVEY.md §7 hard-part 1).
            self._client.close()
            self._client = None
            raise
        return iter(rows), {"gtid": last_gtid}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        """Deterministic replay for recovery: re-request from ``start``
        and stop once past ``end`` (at-least-once semantics — the same
        GTID-resume replay the reference documents, cdc_connector.h:62-69)."""
        end_key = _gtid_key(end.get("gtid", ""))
        with self._connect(start.get("gtid", "")) as client:
            while True:
                record = client.read_record()
                if record is None:
                    return
                key = (
                    int(record["domain"]),
                    int(record["server_id"]),
                    int(record["sequence"]),
                )
                if key > end_key:
                    return
                yield self._row(record)

    def stop(self) -> None:
        if self._client is not None:
            self._client.close()
            self._client = None


class MaxScaleCDCDataSource(DataSource):
    """Python DataSource wiring: name, schema inference, stream reader."""

    @classmethod
    def name(cls) -> str:
        return "maxscale_cdc"

    def schema(self) -> T.StructType:
        """Infer the stream schema from the server's schema record.

        A short-lived connection performs the handshake and reads the
        leading schema record (the server always sends it first,
        cdc_connector.cpp:214,237-248). Callers can skip the extra
        round-trip by passing the record JSON as option
        ``schemaRecord``.
        """
        import json as _json

        def finish(struct: T.StructType) -> T.StructType:
            # Multi-server discriminator (VERDICT r8 item 5): when any
            # stream carries ``sourceId`` (or the global option is set),
            # the partitioned reader stamps a ``_source_id`` column, so
            # the declared schema must carry it too.
            if "streams" in self.options and _source_id_active(self.options):
                return T.StructType(
                    [*struct.fields, T.StructField(SOURCE_ID_COL, T.StringType())]
                )
            return struct

        record = self.options.get("schemarecord")
        if record is not None:
            return finish(schema_record_to_struct(record))

        if "streams" in self.options:
            # Partitioned mode: all streams share one schema (shards of
            # one logical table); probe the first stream's leading
            # schema record.
            first = _json.loads(self.options["streams"])[0]
            host = first.get("host", self.options.get("host", "127.0.0.1"))
            port = int(first.get("port", self.options.get("port", 4001)))
            table = first["table"]
        else:
            host = self.options.get("host", "127.0.0.1")
            port = int(self.options.get("port", 4001))
            table = self.options["table"]
        with CDCClient(
            host=host,
            port=port,
            user=self.options.get("user", ""),
            password=self.options.get("password", ""),
            table=table,
            # The probe is pure handshake — connect() consumes the
            # leading schema record and exits. The +5.0 pad that lived
            # here pre-r10 was compensating for the poll/handshake
            # conflation the client has since dropped.
            timeout=float(self.options.get("pollseconds", DEFAULT_POLL_SECONDS)),
            handshake_timeout=(
                float(self.options["handshakeseconds"])
                if "handshakeseconds" in self.options
                else None
            ),
        ) as client:
            assert client.schema_record is not None
            return finish(schema_record_to_struct(client.schema_record))

    def streamReader(self, schema: T.StructType):
        """Partition-parallel reader (executor-side sockets), selected by
        the ``streams`` option; without it, raising NotImplemented makes
        Spark fall back to :meth:`simpleStreamReader` (the single-stream
        default matching the reference's session model)."""
        if "streams" in self.options:
            from maxscale_cdc_connector_spark.sources.cdc_partitioned import (
                CDCPartitionedStreamReader,
            )

            return CDCPartitionedStreamReader(schema, dict(self.options))
        return super().streamReader(schema)

    def simpleStreamReader(self, schema: T.StructType) -> CDCSimpleStreamReader:
        return CDCSimpleStreamReader(schema, dict(self.options))

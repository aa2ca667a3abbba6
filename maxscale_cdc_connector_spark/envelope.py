"""CDC event envelope: the replication-metadata columns every event carries.

The reference proves every data event carries ``domain``, ``server_id``
and ``sequence`` (``Row::gtid()`` reads them from row values,
cdc_connector.h:199-208); the full avrorouter envelope adds
``event_number``, ``timestamp`` and ``event_type`` (public MaxScale docs;
the connector treats them as ordinary fields, cdc_connector.cpp:288-309).

GTID string form ``domain-server_id-sequence`` is built exactly as
``Row::gtid()`` does (cdc_connector.h:202-206) — but as a Catalyst
expression, so it codegens and never leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_TYPES = ("insert", "update_before", "update_after", "delete")

ENVELOPE_FIELDS = [
    T.StructField("domain", T.IntegerType(), True),
    T.StructField("server_id", T.IntegerType(), True),
    T.StructField("sequence", T.LongType(), True),
    T.StructField("event_number", T.IntegerType(), True),
    T.StructField("timestamp", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
]

ENVELOPE = T.StructType(ENVELOPE_FIELDS)

ENVELOPE_COLUMNS = tuple(f.name for f in ENVELOPE_FIELDS)


def gtid_column(
    domain: str | Column = "domain",
    server_id: str | Column = "server_id",
    sequence: str | Column = "sequence",
) -> Column:
    """``domain-server_id-sequence`` — Row::gtid() (cdc_connector.h:202-206)
    as a codegen'd Catalyst expression."""
    return F.concat_ws("-", F.col(domain) if isinstance(domain, str) else domain,
                       F.col(server_id) if isinstance(server_id, str) else server_id,
                       F.col(sequence) if isinstance(sequence, str) else sequence)


def parse_gtid(gtid: str) -> tuple[int, int, int]:
    """Parse ``domain-server_id-sequence`` into its integer triple.

    The inverse of :func:`gtid_column`; used by the streaming source to
    turn a checkpointed offset back into a resume position
    (reference: connect(table, gtid), cdc_connector.cpp:199-206).
    """
    parts = gtid.split("-")
    if len(parts) != 3:
        raise ValueError(f"malformed GTID {gtid!r}; want domain-server_id-sequence")
    return int(parts[0]), int(parts[1]), int(parts[2])


def event_schema(payload: T.StructType) -> T.StructType:
    """Envelope fields + payload fields = full per-event schema."""
    return T.StructType(ENVELOPE_FIELDS + list(payload.fields))

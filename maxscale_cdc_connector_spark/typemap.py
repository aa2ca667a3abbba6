"""SQL-type-string → Spark DataType mapping and CDC schema ingestion.

The reference connector carries column types as opaque SQL type strings
(``real_type`` + optional ``(length)``) extracted from the avrorouter's
JSON schema record (reference: ``cdc_connector.cpp:250-286`` builds the
per-field type string; ``cdc_connector.cpp:262-281`` implements the
``real_type`` → ``type`` → ``"varchar(50)"`` fallback chain and length
suffixing). It never interprets the strings — all values reach the app
as strings (``cdc_connector.cpp:80-115``).

This module is the deliberate upgrade: it *interprets* those SQL type
strings into Spark ``DataType``s so downstream queries run on typed,
codegen-friendly columns rather than strings.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import types as T

# Matches e.g. "varchar(64)", "decimal(10,2)", "int(11) unsigned", "bigint"
_TYPE_RE = re.compile(
    r"^\s*(?P<base>[a-zA-Z_ ]+?)\s*(?:\(\s*(?P<p>\d+)\s*(?:,\s*(?P<s>\d+)\s*)?\))?"
    r"\s*(?P<unsigned>unsigned)?\s*$",
    re.IGNORECASE,
)

# Base-name → constructor. Deliberate choices documented in SURVEY.md §1.4.
_SIMPLE: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "mediumint": T.IntegerType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "real": T.DoubleType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    # MariaDB TIME has no Spark scalar equivalent → keep the string form.
    "time": T.StringType(),
    "year": T.IntegerType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "tinytext": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "enum": T.StringType(),
    "set": T.StringType(),
    "json": T.StringType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
    "blob": T.BinaryType(),
    "tinyblob": T.BinaryType(),
    "mediumblob": T.BinaryType(),
    "longblob": T.BinaryType(),
    "bit": T.LongType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    # Avro primitive names can appear when a generated column falls back to
    # the Avro `type` (reference fallback chain, cdc_connector.cpp:262-270).
    "string": T.StringType(),
    "long": T.LongType(),
    "bytes": T.BinaryType(),
}

# Reference fallback when a field has a complex/absent type
# (cdc_connector.cpp:270: `"varchar(50)"`; `:270` "undefined" when absent).
FALLBACK_SQL_TYPE = "varchar(50)"


def sql_type_to_spark(sql_type: str | None) -> T.DataType:
    """Map a MariaDB/Avro SQL type string to a Spark DataType.

    Unknown or unparseable types fall back to ``StringType`` — mirroring
    the reference's ``varchar(50)`` catch-all (cdc_connector.cpp:270).
    """
    if not sql_type:
        return T.StringType()
    m = _TYPE_RE.match(sql_type)
    if not m:
        return T.StringType()
    base = m.group("base").strip().lower()
    if base == "decimal" or base == "numeric":
        p = int(m.group("p") or 10)
        s = int(m.group("s") or 0)
        return T.DecimalType(min(p, 38), min(s, 37))
    if m.group("unsigned"):
        # Unsigned types overflow their signed Spark counterpart; widen
        # one step (tinyint 255→Short, smallint 65535→Integer, mediumint
        # 16777215 already fits Integer, int 4294967295→Long,
        # bigint 2^64-1→Decimal(20,0)).
        widened = {
            "tinyint": T.ShortType(),
            "smallint": T.IntegerType(),
            "mediumint": T.IntegerType(),
            "int": T.LongType(),
            "integer": T.LongType(),
            "bigint": T.DecimalType(20, 0),
        }
        if base in widened:
            return widened[base]
    return _SIMPLE.get(base, T.StringType())


# ---------------------------------------------------------------------------
# CDC schema-record ingestion (the Spark analog of process_schema,
# cdc_connector.cpp:250-286).
# ---------------------------------------------------------------------------


def is_schema_record(obj: dict[str, Any]) -> bool:
    """True iff a parsed JSON object is an avrorouter schema record.

    Mirrors ``is_schema`` (cdc_connector.cpp:237-248): the record is a
    schema iff it has a non-empty ``fields`` array whose first element
    carries ``name``.
    """
    fields = obj.get("fields")
    return (
        isinstance(fields, list)
        and len(fields) > 0
        and isinstance(fields[0], dict)
        and "name" in fields[0]
    )


def field_sql_type(field: dict[str, Any]) -> str:
    """Extract the SQL type string for one schema field.

    Fallback chain proven from cdc_connector.cpp:261-281:
    ``real_type`` → Avro ``type`` (when it is a plain string) →
    ``"varchar(50)"`` for complex types → ``"undefined"`` when absent;
    a positive ``length`` is appended as ``(N)``.
    """
    if "real_type" in field and isinstance(field["real_type"], str):
        base = field["real_type"]
    elif "type" in field:
        t = field["type"]
        base = t if isinstance(t, str) else FALLBACK_SQL_TYPE
    else:
        base = "undefined"
    length = field.get("length")
    if isinstance(length, int) and length > 0 and "(" not in base:
        base = f"{base}({length})"
    return base


def schema_record_fields(schema_json: str | dict[str, Any]) -> dict[str, str]:
    """``{field_name: sql_type_string}`` — the Spark analog of
    ``Connection::fields()`` (cdc_connector.h:113-123)."""
    obj = json.loads(schema_json) if isinstance(schema_json, str) else schema_json
    if not is_schema_record(obj):
        raise ValueError("not a CDC schema record (no fields[0].name)")
    return {f["name"]: field_sql_type(f) for f in obj["fields"]}


def schema_record_to_struct(schema_json: str | dict[str, Any]) -> T.StructType:
    """Parse an avrorouter JSON schema record into a typed StructType.

    This is the engine's replacement for the reference's key/type vector
    rebuild (``process_schema``, cdc_connector.cpp:250-286) — but typed:
    each ``real_type`` SQL string becomes a real Spark DataType.
    """
    fields = schema_record_fields(schema_json)
    return T.StructType(
        [T.StructField(name, sql_type_to_spark(sql_t), True) for name, sql_t in fields.items()]
    )


def spark_fields(struct: T.StructType) -> dict[str, str]:
    """{name → Spark simpleString type} — parity helper for ``fields()``."""
    return {f.name: f.dataType.simpleString() for f in struct.fields}

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from maxscale_cdc_connector_spark.typemap import (
    field_sql_type,
    is_schema_record,
    schema_record_fields,
    schema_record_to_struct,
    sql_type_to_spark,
)


@pytest.mark.parametrize(
    ("sql", "expected"),
    [
        ("int", T.IntegerType()),
        ("int(11)", T.IntegerType()),
        ("tinyint", T.ByteType()),
        ("smallint", T.ShortType()),
        ("bigint", T.LongType()),
        ("float", T.FloatType()),
        ("double", T.DoubleType()),
        ("decimal(10,2)", T.DecimalType(10, 2)),
        ("decimal", T.DecimalType(10, 0)),
        ("date", T.DateType()),
        ("datetime", T.TimestampType()),
        ("timestamp", T.TimestampType()),
        ("time", T.StringType()),
        ("varchar(64)", T.StringType()),
        ("char(1)", T.StringType()),
        ("text", T.StringType()),
        ("blob", T.BinaryType()),
        ("varbinary(16)", T.BinaryType()),
        # reference fallback value (cdc_connector.cpp:270)
        ("varchar(50)", T.StringType()),
        ("undefined", T.StringType()),
        ("", T.StringType()),
        (None, T.StringType()),
        ("int(10) unsigned", T.LongType()),
        ("bigint unsigned", T.DecimalType(20, 0)),
        # unsigned widening across the full ladder (ADVICE r1: smallint
        # unsigned reaches 65535, overflowing ShortType)
        ("tinyint unsigned", T.ShortType()),
        ("smallint unsigned", T.IntegerType()),
        ("smallint(5) unsigned", T.IntegerType()),
        ("mediumint unsigned", T.IntegerType()),
        # Avro primitive fallbacks (generated columns, cdc_connector.cpp:264-268)
        ("string", T.StringType()),
        ("long", T.LongType()),
    ],
)
def test_sql_type_to_spark(sql, expected):
    assert sql_type_to_spark(sql) == expected


def test_is_schema_record():
    # detection rule proven from cdc_connector.cpp:237-248
    assert is_schema_record({"fields": [{"name": "a"}]})
    assert not is_schema_record({"fields": []})
    assert not is_schema_record({"fields": [{"type": "int"}]})
    assert not is_schema_record({"a": 1})


def test_field_fallback_chain():
    # real_type wins
    assert field_sql_type({"name": "a", "real_type": "int", "type": "string"}) == "int"
    # generated column: fall back to Avro type (cdc_connector.cpp:264-268)
    assert field_sql_type({"name": "a", "type": "long"}) == "long"
    # complex Avro type → varchar(50) (cdc_connector.cpp:270)
    assert field_sql_type({"name": "a", "type": {"type": "enum"}}) == "varchar(50)"
    # absent entirely → undefined
    assert field_sql_type({"name": "a"}) == "undefined"
    # positive length appended (cdc_connector.cpp:272-281)
    assert field_sql_type({"name": "a", "real_type": "varchar", "length": 25}) == "varchar(25)"
    assert field_sql_type({"name": "a", "real_type": "int", "length": -1}) == "int"


def test_schema_record_to_struct():
    rec = json.dumps(
        {
            "fields": [
                {"name": "id", "real_type": "bigint", "length": -1},
                {"name": "name", "real_type": "varchar", "length": 25},
                {"name": "bal", "real_type": "decimal", "length": -1},
                {"name": "gen", "type": "long"},
                {"name": "weird", "type": {"type": "union"}},
            ]
        }
    )
    st = schema_record_to_struct(rec)
    assert [f.name for f in st.fields] == ["id", "name", "bal", "gen", "weird"]
    assert st["id"].dataType == T.LongType()
    assert st["name"].dataType == T.StringType()
    assert st["gen"].dataType == T.LongType()
    assert st["weird"].dataType == T.StringType()
    fields = schema_record_fields(rec)
    assert fields["name"] == "varchar(25)"
    assert fields["weird"] == "varchar(50)"

    with pytest.raises(ValueError):
        schema_record_to_struct(json.dumps({"no": "fields"}))

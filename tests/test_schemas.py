"""Iceberg JSON schema bridge — exercised with the reference's literal
schema fixtures (FIXTURES.md §B)."""

import json

import pytest
from pyspark.sql import types as T

from iceberg_hybrid_spark.lake.schemas import (
    SchemaParseError,
    iceberg_schema_to_struct,
    struct_to_iceberg_schema,
)

# Literal fixtures from the reference's integration tests
CLICK_EVENTS = (
    '{"type":"struct","fields":['
    '{"id":1,"name":"user_id","type":"long"},'
    '{"id":2,"name":"event_time","type":"timestamp"},'
    '{"id":3,"name":"page_url","type":"string"}]}'
)
TRANSACTIONS = (
    '{"type":"struct","fields":['
    '{"id":1,"name":"transaction_id","type":"string"},'
    '{"id":2,"name":"amount","type":"decimal"}]}'
)
USER_EVENTS_MIN = '{"type":"struct","fields":[{"name":"user_id","type":"string"}]}'


def test_click_events_fixture():
    st = iceberg_schema_to_struct(CLICK_EVENTS)
    assert [(f.name, f.dataType) for f in st.fields] == [
        ("user_id", T.LongType()),
        ("event_time", T.TimestampType()),
        ("page_url", T.StringType()),
    ]
    assert st.fields[0].metadata["iceberg.field-id"] == 1


def test_bare_decimal_pins_12_2():
    st = iceberg_schema_to_struct(TRANSACTIONS)
    assert st.fields[1].dataType == T.DecimalType(12, 2)


def test_minimal_schema_without_ids():
    st = iceberg_schema_to_struct(USER_EVENTS_MIN)
    assert st.fields[0].name == "user_id"


def test_roundtrip_preserves_ids_and_types():
    st = iceberg_schema_to_struct(CLICK_EVENTS)
    out = json.loads(struct_to_iceberg_schema(st))
    assert [f["id"] for f in out["fields"]] == [1, 2, 3]
    assert [f["type"] for f in out["fields"]] == ["long", "timestamp", "string"]


def test_decimal_explicit_precision():
    s = '{"type":"struct","fields":[{"id":1,"name":"x","type":"decimal(38,10)"}]}'
    assert iceberg_schema_to_struct(s).fields[0].dataType == T.DecimalType(38, 10)


def test_nested_list_and_map():
    s = (
        '{"type":"struct","fields":['
        '{"id":1,"name":"tags","type":{"type":"list","element":"string"}},'
        '{"id":2,"name":"props","type":{"type":"map","key":"string","value":"long"}}]}'
    )
    st = iceberg_schema_to_struct(s)
    assert st.fields[0].dataType == T.ArrayType(T.StringType(), True)
    assert st.fields[1].dataType == T.MapType(T.StringType(), T.LongType(), True)


def test_errors():
    with pytest.raises(SchemaParseError):
        iceberg_schema_to_struct("not json")
    with pytest.raises(SchemaParseError):
        iceberg_schema_to_struct('{"type":"list","element":"string"}')
    with pytest.raises(SchemaParseError):
        iceberg_schema_to_struct(
            '{"type":"struct","fields":[{"id":1,"name":"x","type":"wat"}]}'
        )


def test_schema_usable_for_dataframe(spark):
    st = iceberg_schema_to_struct(CLICK_EVENTS)
    import datetime as dt

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 15, 14), "/home")], st)
    assert df.schema["user_id"].dataType == T.LongType()
    assert df.count() == 1

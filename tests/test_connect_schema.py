"""schemas.enable=true (embedded Connect schema) decode — SURVEY §1.2
mode 1. Wrapper shape: reference hack/sink-jdbc/cdc_oracle_mariadb-demo
.json:17-20 (key/value JsonConverter with schemas.enable=true); type
ladder: GenericDialect.java:199-221."""

from __future__ import annotations

import datetime
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_dbsync_spark.operators.merge import apply_changes
from kafka_dbsync_spark.operators.transforms import (
    convert_connect_logicals,
    decode_connect_value,
    parse_connect_schema,
    strip_embedded_schema,
    split_corrupt,
    validate_iidr,
    with_operation,
    with_target_table,
)
from kafka_dbsync_spark.sources.iidr import decode_iidr_records

SCHEMA = {
    "type": "struct",
    "name": "orders.Value",
    "fields": [
        {"field": "ID", "type": "int64", "optional": False},
        {"field": "QTY", "type": "int32", "optional": True},
        {"field": "NAME", "type": "string", "optional": True},
        {"field": "PRICE", "type": "double", "optional": True},
        {"field": "OK", "type": "boolean", "optional": True},
        {
            "field": "CREATED",
            "type": "int64",
            "optional": True,
            "name": "org.apache.kafka.connect.data.Timestamp",
            "version": 1,
        },
        {
            "field": "DAY",
            "type": "int32",
            "optional": True,
            "name": "org.apache.kafka.connect.data.Date",
            "version": 1,
        },
    ],
}


def wrap(payload) -> str:
    return json.dumps({"schema": SCHEMA, "payload": payload})


def test_parse_connect_schema_types_and_logicals():
    struct, logicals = parse_connect_schema(json.dumps(SCHEMA))
    by_name = {f.name: f.dataType for f in struct.fields}
    assert by_name["ID"] == T.LongType()
    assert by_name["QTY"] == T.IntegerType()
    assert by_name["NAME"] == T.StringType()
    assert by_name["PRICE"] == T.DoubleType()
    assert by_name["OK"] == T.BooleanType()
    # logical carriers stay primitive for from_json; conversion is separate
    assert by_name["CREATED"] == T.LongType()
    assert by_name["DAY"] == T.IntegerType()
    assert logicals == {"CREATED": "timestamp", "DAY": "date"}


def test_parse_connect_schema_rejects_non_struct_root():
    with pytest.raises(ValueError, match="struct"):
        parse_connect_schema('{"type":"int64"}')


def test_strip_embedded_schema_mixed_topic(spark):
    rows = [
        (wrap({"ID": 1, "NAME": "a"}),),          # wrapped
        ('{"ID": 2, "NAME": "b"}',),               # bare (schemas.enable=false)
        (json.dumps({"schema": SCHEMA, "payload": None}),),  # wrapped tombstone
        (None,),                                   # plain tombstone
    ]
    df = spark.createDataFrame(rows, "record_value string")
    out = strip_embedded_schema(df).collect()
    assert json.loads(out[0]["record_value"]) == {"ID": 1, "NAME": "a"}
    assert out[0]["connect_schema"] is not None
    assert json.loads(out[1]["record_value"]) == {"ID": 2, "NAME": "b"}
    assert out[1]["connect_schema"] is None
    assert out[2]["record_value"] is None  # JSON-null payload stays a tombstone
    assert out[3]["record_value"] is None


def test_decode_declared_types_supersede_inference(spark):
    df = spark.createDataFrame(
        [(wrap({"ID": 7, "QTY": 3, "PRICE": 1.5, "OK": True,
                "CREATED": 1704164645000, "DAY": 19724}),)],
        "record_value string",
    )
    out = decode_connect_value(df)
    row = out.select("row_image.*").collect()[0]
    schema = dict(
        (f.name, f.dataType) for f in out.schema["row_image"].dataType.fields
    )
    # bare-JSON inference would make QTY a long; the declared schema pins int32
    assert schema["QTY"] == T.IntegerType()
    assert schema["CREATED"] == T.TimestampType()
    assert schema["DAY"] == T.DateType()
    assert row["QTY"] == 3
    assert row["CREATED"] == datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert row["DAY"] == datetime.date(2024, 1, 2)


def test_decode_falls_back_to_map_mode_without_schema(spark):
    df = spark.createDataFrame(
        [('{"ID": 1, "NAME": "x"}',)], "record_value string"
    )
    out = decode_connect_value(df)
    row = out.collect()[0]
    assert row["row_image"]["ID"] == "1"  # map<string,string> fallback


def test_wrapped_envelope_through_full_apply_chain(spark):
    """Kafka-shaped records whose VALUES carry the schemas.enable=true
    wrapper drive the complete decode → route → validate → merge chain
    and produce the same final state a bare topic would."""
    H = [
        ("TableName", "DB.SCHEMA.ORDERS"),
        ("A_TIMSTAMP", "2024-01-02-03.04.05.000000000000"),
    ]

    def rec(key, payload, op, off):
        hs = [(k, bytearray(v.encode())) for k, v in H + [("A_ENTTYP", op)]]
        return (
            bytearray(json.dumps(key).encode()) if key is not None else None,
            bytearray(wrap(payload).encode()) if payload is not None else None,
            hs,
            "t1",
            0,
            off,
        )

    rows = [
        rec({"ID": 1}, {"ID": 1, "NAME": "original", "QTY": 1}, "PT", 0),
        rec({"ID": 2}, {"ID": 2, "NAME": "v1", "QTY": 1}, "PT", 1),
        rec({"ID": 2}, {"ID": 2, "NAME": "updated", "QTY": 5}, "UP", 2),
        rec({"ID": 3}, {"ID": 3, "NAME": "gone", "QTY": 9}, "PT", 3),
        rec({"ID": 3}, None, "DL", 4),
    ]
    kafka = spark.createDataFrame(
        rows,
        "key binary, value binary, headers array<struct<key:string,value:binary>>, "
        "topic string, partition int, offset long",
    )
    decoded = decode_iidr_records(kafka)
    good, corrupt = split_corrupt(
        validate_iidr(with_operation(with_target_table(decoded)))
    )
    assert corrupt.count() == 0
    typed = decode_connect_value(good)
    changes = typed.select(
        F.coalesce(
            F.col("row_image.ID"),
            F.get_json_object("record_key", "$.ID").cast("long"),
        ).alias("ID"),
        F.col("row_image.NAME").alias("NAME"),
        F.col("row_image.QTY").alias("QTY"),
        "op",
        "offset",
    )
    final = apply_changes(changes, key_cols=["ID"], order_cols=["offset"]).drop(
        "offset"
    )
    state = {r["ID"]: (r["NAME"], r["QTY"]) for r in final.collect()}
    assert state == {1: ("original", 1), 2: ("updated", 5)}
    # declared int32 survived the chain
    assert dict(final.dtypes)["QTY"] == "int"


KEY_SCHEMA = {
    "type": "struct",
    "name": "orders.Key",
    "fields": [{"field": "ID", "type": "int64", "optional": False}],
}


def test_key_side_envelope_strips_with_same_operator(spark):
    """key.converter.schemas.enable=true wraps KEYS too (the reference
    demo config wraps both sides). strip_embedded_schema is column-
    generic: pointed at record_key it unwraps the key payload so the
    downstream `$.ID` extraction sees bare JSON."""
    wrapped_key = json.dumps({"schema": KEY_SCHEMA, "payload": {"ID": 42}})
    df = spark.createDataFrame(
        [(wrapped_key, wrap({"ID": 42, "NAME": "x"}))],
        "record_key string, record_value string",
    )
    out = strip_embedded_schema(
        strip_embedded_schema(df), value_col="record_key", schema_col="key_schema"
    )
    row = out.collect()[0]
    assert json.loads(row["record_key"]) == {"ID": 42}
    assert json.loads(row["record_value"])["NAME"] == "x"
    assert row["key_schema"] is not None and row["connect_schema"] is not None
    # and the usual key extraction now works
    got = out.select(
        F.get_json_object("record_key", "$.ID").cast("long").alias("ID")
    ).collect()[0]["ID"]
    assert got == 42


def test_time_rendering_is_timezone_independent(spark):
    """Connect Time carriers must render by integer ms-of-day math, not
    session-zone date formatting: midnight is 00:00:00 under ANY session
    timezone (a date_format-based conversion would say 19:00:00 under
    America/New_York)."""
    from kafka_dbsync_spark.operators.transforms import convert_connect_logicals

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [((0, 45_296_000),)],
            "row_image struct<t0:int, t1:int>",
        )
        out = convert_connect_logicals(
            df, {"t0": "time", "t1": "time"}
        ).head()["row_image"]
        assert out["t0"] == "00:00:00"
        assert out["t1"] == "12:34:56"  # 45,296,000 ms = 12:34:56
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

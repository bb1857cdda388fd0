"""SMT-chain transform semantics (SURVEY.md §2.3 T1–T14)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T

from kafka_dbsync_spark.functions.entrytype import (
    DELETE_CODES,
    UPSERT_CODES,
    map_entry_type,
)
from kafka_dbsync_spark.operators.transforms import (
    case_convert,
    coerce_fields,
    decode_row_image,
    filter_table,
    split_corrupt,
    unwrap_envelope,
    validate_iidr,
    with_operation,
    with_target_table,
)
from kafka_dbsync_spark.sources.debezium import debezium_envelope_schema
from kafka_dbsync_spark.sources.iidr import decode_iidr_records

from tests.conftest import kafka_record


def test_entry_type_mapping(spark):
    codes = list(UPSERT_CODES) + list(DELETE_CODES) + ["XX", " pt ", None]
    df = spark.createDataFrame([(c,) for c in codes], "code string")
    got = {r["code"]: r["op"] for r in df.select("code", map_entry_type("code").alias("op")).collect()}
    for c in UPSERT_CODES:
        assert got[c] == "upsert"
    for c in DELETE_CODES:
        assert got[c] == "delete"
    assert got["XX"] == "corrupt"
    assert got[" pt "] == "upsert"  # trim + upper (EntryTypeMapper.java:49)
    assert got[None] == "corrupt"


def test_validation_reasons(spark, kafka_schema):
    events = [
        kafka_record(0, {"ID": 1}, {"ID": 1}, A_ENTTYP="PT"),  # no TableName
        kafka_record(1, {"ID": 1}, {"ID": 1}, TableName="T"),  # no A_ENTTYP
        kafka_record(2, {"ID": 1}, {"ID": 1}, TableName="T", A_ENTTYP="??"),
        kafka_record(3, None, None, TableName="T", A_ENTTYP="DL"),
        kafka_record(4, {"ID": 1}, None, TableName="T", A_ENTTYP="PT"),
        kafka_record(5, {"ID": 1}, {"ID": 1}, TableName="T", A_ENTTYP="UP"),  # valid
    ]
    df = validate_iidr(with_operation(decode_iidr_records(
        spark.createDataFrame(events, kafka_schema))))
    reasons = {r["offset"]: r["error_reason"] for r in df.collect()}
    assert reasons[0] == "missing required header: TableName"
    assert reasons[1] == "missing required header: A_ENTTYP"
    assert reasons[2] == "unknown entry type: ??"
    assert reasons[3] == "delete record requires a key"
    assert reasons[4] == "upsert record requires a value"
    assert reasons[5] is None
    valid, corrupt = split_corrupt(df)
    assert valid.count() == 1 and corrupt.count() == 5


def test_routing_and_filter(spark, kafka_schema):
    events = [
        kafka_record(0, {"ID": 1}, {"ID": 1}, TableName="ORDERS", A_ENTTYP="PT"),
        kafka_record(1, {"ID": 2}, {"ID": 2}, TableName="items", A_ENTTYP="PT"),
    ]
    df = decode_iidr_records(spark.createDataFrame(events, kafka_schema))
    routed = with_target_table(df, "dst_${TableName}", case="lower")
    got = {r["offset"]: r["target_table"] for r in routed.collect()}
    assert got == {0: "dst_orders", 1: "dst_items"}
    # topic template
    routed2 = with_target_table(df, "${topic}")
    assert routed2.head()["target_table"] == "iidr.CDC.TEST_ORDERS"
    # record-level table filter is case-insensitive
    assert filter_table(df, "orders").count() == 1


def test_case_convert(spark):
    df = spark.createDataFrame([(1, "x")], "ID int, Order_Name string")
    assert case_convert(df, "lower").columns == ["id", "order_name"]
    assert case_convert(df, "upper").columns == ["ID", "ORDER_NAME"]
    assert case_convert(df, "none").columns == ["ID", "Order_Name"]


def test_coerce_fields_patterns_and_errors(spark):
    df = spark.createDataFrame(
        [
            ("2024-03-01T10:00:00.123",),
            ("2024-03-01 10:00:00",),
            ("2024-03-01T10:00:00.123456",),
            ("not a date",),
            (None,),
        ],
        "created_at string",
    )
    out = coerce_fields(df, {"created_at": "timestamp"})
    rows = out.select(
        F.date_format("created_at", "yyyy-MM-dd HH:mm:ss.SSS").alias("s"),
        "created_at__parse_error",
    ).collect()
    assert rows[0]["s"] == "2024-03-01 10:00:00.123"
    assert rows[1]["s"] == "2024-03-01 10:00:00.000"
    assert rows[2]["s"] == "2024-03-01 10:00:00.123"
    assert rows[3]["s"] is None and rows[3]["created_at__parse_error"]
    assert rows[4]["s"] is None and not rows[4]["created_at__parse_error"]


def test_coerce_date_and_time(spark):
    df = spark.createDataFrame([("2024-03-05", "14:30:05.120")], "d string, t string")
    out = coerce_fields(df, {"d": "date", "t": "time"}).head()
    assert str(out["d"]) == "2024-03-05"
    assert out["t"] == "14:30:05"


ROW = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


def _enveloped(spark):
    data = [
        ('{"before": null, "after": {"id": 1, "v": "a"}, "op": "c", "ts_ms": 1, '
         '"source": {"table": "t1", "schema": "s", "lsn": "1", "connector": "x"}}',),
        ('{"before": {"id": 1, "v": "a"}, "after": {"id": 1, "v": "b"}, "op": "u", "ts_ms": 2, '
         '"source": {"table": "t1", "schema": "s", "lsn": "2", "connector": "x"}}',),
        ('{"before": {"id": 2, "v": "z"}, "after": null, "op": "d", "ts_ms": 3, '
         '"source": {"table": "t1", "schema": "s", "lsn": "3", "connector": "x"}}',),
    ]
    df = spark.createDataFrame(data, "value string")
    return df.select(
        F.from_json("value", debezium_envelope_schema(ROW)).alias("envelope")
    )


def test_unwrap_drop(spark):
    out = unwrap_envelope(_enveloped(spark), mode="drop")
    assert out.columns == ["id", "v"]
    assert sorted((r["id"], r["v"]) for r in out.collect()) == [(1, "a"), (1, "b")]


def test_unwrap_rewrite(spark):
    out = unwrap_envelope(_enveloped(spark), mode="rewrite", add_fields=("op", "lsn"))
    rows = sorted(out.collect(), key=lambda r: r["__lsn"])
    assert [r["__deleted"] for r in rows] == [False, False, True]
    assert rows[2]["id"] == 2 and rows[2]["v"] == "z"  # delete keeps before-image
    assert [r["__op"] for r in rows] == ["c", "u", "d"]


def test_unwrap_tombstone(spark):
    out = unwrap_envelope(_enveloped(spark), mode="tombstone")
    rows = sorted(out.collect(), key=lambda r: r["__op"])
    by_op = {r["__op"]: r for r in rows}
    assert by_op["d"]["row"] is None
    assert by_op["c"]["row"]["id"] == 1


def test_decode_row_image_schemaless(spark):
    df = spark.createDataFrame([('{"a": "1", "b": "x"}',)], "record_value string")
    out = decode_row_image(df).head()
    assert out["row_image"] == {"a": "1", "b": "x"}

"""T8 schema inference, K12 Mongo-style replace pipeline, and the F5
datatype-matrix round-trip (SURVEY.md §2.3 T8, §2.2 K12, FIXTURES.md F5)."""

from __future__ import annotations

import datetime
import sqlite3
from decimal import Decimal

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from kafka_dbsync_spark.operators.merge import apply_changes
from kafka_dbsync_spark.operators.transforms import decode_row_image, infer_row_schema
from kafka_dbsync_spark.plans.pipeline import build_transform_chain


def test_infer_row_schema_value_classes(spark):
    df = spark.createDataFrame(
        [
            ('{"s": "x", "i": 5, "l": 3000000000, "d": 1.5, "b": true, "n": null}',),
            ('{"s": "y", "i": 7, "l": 1, "d": 2, "b": false, "extra": "z"}',),
        ],
        "record_value string",
    )
    schema = infer_row_schema(df)
    by_name = {f.name: f.dataType for f in schema.fields}
    assert by_name["s"] == T.StringType()
    assert by_name["i"] == T.IntegerType()
    assert by_name["l"] == T.LongType()  # >2^31 in one record widens both
    assert by_name["d"] == T.DoubleType()  # int 2 + float 1.5 → double
    assert by_name["b"] == T.BooleanType()
    assert by_name["n"] == T.StringType()  # null-only → optional string
    assert by_name["extra"] == T.StringType()
    assert all(f.nullable for f in schema.fields)


def test_infer_then_decode_round_trip(spark):
    df = spark.createDataFrame(
        [('{"id": 1, "amt": 10.5}',), ('{"id": 2, "amt": 20.25}',)],
        "record_value string",
    )
    schema = infer_row_schema(df)
    out = decode_row_image(df, schema=schema).select("row_image.*").collect()
    assert sorted((r["id"], r["amt"]) for r in out) == [(1, 10.5), (2, 20.25)]


def test_mongo_style_replace_pipeline(spark):
    """K12: ReplaceOneDefaultStrategy ≡ upsert-by-_id with tombstones
    dropped before the sink (the reference's RecordIsTombstone predicate
    + ReplaceOne strategy, hack/sink-mongodb/mongodb-sink.json:14-20)."""
    chain = build_transform_chain([{"op": "tombstone_filter"}])
    df = spark.createDataFrame(
        [
            (0, '{"_id": 1, "doc": "a"}'),
            (1, '{"_id": 2, "doc": "b"}'),
            (2, None),  # tombstone — dropped, NOT a delete in replace mode
            (3, '{"_id": 1, "doc": "a2"}'),  # replace of _id=1
        ],
        "offset long, record_value string",
    )
    filtered = chain(df)
    assert filtered.count() == 3
    rows = decode_row_image(filtered, schema=T.StructType([
        T.StructField("_id", T.LongType()), T.StructField("doc", T.StringType()),
    ])).select("row_image.*", F.lit("upsert").alias("op"), "offset")
    state = apply_changes(rows, ["_id"], ["offset"])
    got = {r["_id"]: r["doc"] for r in state.collect()}
    assert got == {1: "a2", 2: "b"}


# F5 datatype matrix — the parquet-representable subset of the reference's
# 33-column Oracle test table (intervals ride as strings: Spark cannot
# write interval types to parquet, matching the reference's string mode).
MATRIX_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.LongType(), False),
        T.StructField("COL_NUMBER_5", T.IntegerType()),
        T.StructField("COL_NUMBER_19", T.DecimalType(19, 0)),
        T.StructField("COL_NUMBER_38", T.DecimalType(38, 0)),
        T.StructField("COL_NUMBER_10_2", T.DecimalType(10, 2)),
        T.StructField("COL_FLOAT", T.DoubleType()),
        T.StructField("COL_BINARY_FLOAT", T.FloatType()),
        T.StructField("COL_VARCHAR2_4000", T.StringType()),
        T.StructField("COL_NCHAR", T.StringType()),
        T.StructField("COL_DATE", T.TimestampType()),
        T.StructField("COL_TIMESTAMP_9", T.TimestampType()),
        T.StructField("COL_INTERVAL_YM", T.StringType()),
        T.StructField("COL_INTERVAL_DS", T.StringType()),
        T.StructField("COL_BLOB", T.BinaryType()),
        T.StructField("COL_RAW", T.BinaryType()),
        T.StructField("COL_BOOLEAN_SIM", T.BooleanType()),
    ]
)

ROW_TYPICAL = (
    1, 12345, Decimal(10**18), Decimal(10**37), Decimal("12345678.99"),
    3.14159, 2.5, "x" * 4000, "統一碼",
    datetime.datetime(2024, 3, 1, 10, 30), datetime.datetime(2024, 3, 1, 10, 30, 0, 123456),
    "P2Y3M", "P1DT2H3M4.5S", b"\x00\x01\xff", b"\xde\xad\xbe\xef", True,
)
ROW_NEGATIVE = (
    2, -32768, Decimal(-(10**18)), Decimal(-(10**37)), Decimal("-0.01"),
    -2.718, -1.5, "", "",
    datetime.datetime(1970, 1, 1), datetime.datetime(1969, 12, 31, 23, 59, 59),
    "P-1Y0M", "PT-5S", b"", b"\x00", False,
)
ROW_NULLS = (3, *([None] * 15))


def test_datatype_matrix_round_trip(tmp_path, spark):
    """Golden round-trip: all wire types survive write → read → keyed
    merge unchanged (the Spark analog of the reference's datatype
    comparison, docs/debezium-datatype-comparison-results.md)."""
    df = spark.createDataFrame([ROW_TYPICAL, ROW_NEGATIVE, ROW_NULLS], MATRIX_SCHEMA)
    path = str(tmp_path / "matrix")
    df.write.parquet(path)
    back = spark.read.parquet(path)
    # parquet read marks every column nullable; types must be preserved
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in MATRIX_SCHEMA.fields
    ]

    # through the merge path: re-upsert every row + update one
    changes = back.withColumn("op", F.lit("upsert")).withColumn(
        "offset", F.col("ID")
    )
    update = spark.createDataFrame([ROW_TYPICAL], MATRIX_SCHEMA).withColumn(
        "op", F.lit("upsert")
    ).withColumn("offset", F.lit(100))
    merged = apply_changes(changes.unionByName(update), ["ID"], ["offset"])
    assert merged.count() == 3

    got = {r["ID"]: r for r in merged.collect()}
    src = {1: ROW_TYPICAL, 2: ROW_NEGATIVE, 3: ROW_NULLS}
    for rid, expected in src.items():
        actual = got[rid]
        for field, want in zip(MATRIX_SCHEMA.fields, expected):
            have = actual[field.name]
            if isinstance(want, bytes):
                have = bytes(have) if have is not None else None
            assert have == want, f"ID={rid} {field.name}: {have!r} != {want!r}"

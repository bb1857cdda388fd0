"""Merge-engine semantics: the reference's canonical E2E scenario plus the
ordering/idempotence cliffs (SURVEY.md §7.3).

Canonical sequence = the reference's test producer
(hack/scripts/iidr-test-producer.py:53-113): PT(1), PT(2), PT(3), UP(2),
DL(3) ⇒ final state rows {1 original, 2 updated}, 3 absent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T

from kafka_dbsync_spark.operators import (
    apply_changes,
    latest_by_key,
    split_corrupt,
    validate_iidr,
    with_operation,
)
from kafka_dbsync_spark.sources import decode_iidr_records

from tests.conftest import kafka_record

ROW_SCHEMA = T.StructType(
    [
        T.StructField("ID", T.LongType()),
        T.StructField("ORDER_NAME", T.StringType()),
        T.StructField("AMOUNT", T.DoubleType()),
        T.StructField("STATUS", T.StringType()),
    ]
)


def apply_events(spark, kafka_schema, events):
    df = spark.createDataFrame(events, kafka_schema)
    decoded = validate_iidr(with_operation(decode_iidr_records(df)))
    valid, corrupt = split_corrupt(decoded)
    changes = valid.select(
        F.coalesce(
            F.from_json("record_value", ROW_SCHEMA)["ID"],
            F.from_json("record_key", "ID LONG")["ID"],
        ).alias("ID"),
        F.from_json("record_value", ROW_SCHEMA)["ORDER_NAME"].alias("ORDER_NAME"),
        F.from_json("record_value", ROW_SCHEMA)["STATUS"].alias("STATUS"),
        "op",
        "offset",
    )
    return apply_changes(changes, ["ID"], ["offset"]), corrupt


def canonical_events():
    return [
        kafka_record(0, {"ID": 1}, {"ID": 1, "ORDER_NAME": "A", "AMOUNT": 1.0, "STATUS": "NEW"},
                     TableName="TEST_ORDERS", A_ENTTYP="PT",
                     A_TIMSTAMP="2024-03-01 10:00:00.123456789012"),
        kafka_record(1, {"ID": 2}, {"ID": 2, "ORDER_NAME": "B", "AMOUNT": 2.0, "STATUS": "NEW"},
                     TableName="TEST_ORDERS", A_ENTTYP="PT"),
        kafka_record(2, {"ID": 3}, {"ID": 3, "ORDER_NAME": "C", "AMOUNT": 3.0, "STATUS": "NEW"},
                     TableName="TEST_ORDERS", A_ENTTYP="PT"),
        kafka_record(3, {"ID": 2}, {"ID": 2, "ORDER_NAME": "B2", "AMOUNT": 9.9, "STATUS": "SHIPPED"},
                     TableName="TEST_ORDERS", A_ENTTYP="UP"),
        kafka_record(4, {"ID": 3}, None, TableName="TEST_ORDERS", A_ENTTYP="DL"),
    ]


def test_canonical_sequence(spark, kafka_schema):
    state, corrupt = apply_events(spark, kafka_schema, canonical_events())
    rows = {r["ID"]: r for r in state.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["ORDER_NAME"] == "A" and rows[1]["STATUS"] == "NEW"
    assert rows[2]["ORDER_NAME"] == "B2" and rows[2]["STATUS"] == "SHIPPED"
    assert corrupt.count() == 0


def test_intra_batch_ordering(spark, kafka_schema):
    """insert→update→delete→insert of one key inside a single batch must
    collapse to the final image (A3 last-write-wins)."""
    events = [
        kafka_record(0, {"ID": 7}, {"ID": 7, "ORDER_NAME": "x", "AMOUNT": 1.0, "STATUS": "A"},
                     TableName="T", A_ENTTYP="PT"),
        kafka_record(1, {"ID": 7}, {"ID": 7, "ORDER_NAME": "y", "AMOUNT": 2.0, "STATUS": "B"},
                     TableName="T", A_ENTTYP="UP"),
        kafka_record(2, {"ID": 7}, None, TableName="T", A_ENTTYP="DL"),
        kafka_record(3, {"ID": 7}, {"ID": 7, "ORDER_NAME": "z", "AMOUNT": 3.0, "STATUS": "C"},
                     TableName="T", A_ENTTYP="FI"),
    ]
    state, _ = apply_events(spark, kafka_schema, events)
    rows = state.collect()
    assert len(rows) == 1 and rows[0]["ORDER_NAME"] == "z"


def test_delete_wins_when_last(spark, kafka_schema):
    events = canonical_events() + [
        kafka_record(5, {"ID": 2}, None, TableName="T", A_ENTTYP="DR"),
    ]
    state, _ = apply_events(spark, kafka_schema, events)
    assert {r["ID"] for r in state.collect()} == {1}


def test_delete_of_absent_key_is_noop(spark, kafka_schema):
    events = [kafka_record(0, {"ID": 42}, None, TableName="T", A_ENTTYP="DL")]
    state, corrupt = apply_events(spark, kafka_schema, events)
    assert state.count() == 0 and corrupt.count() == 0


def test_replay_idempotence(spark, kafka_schema):
    """Applying the same batch twice over its own output (at-least-once
    redelivery) must not change the state."""
    state1, _ = apply_events(spark, kafka_schema, canonical_events())

    df = spark.createDataFrame(canonical_events(), kafka_schema)
    decoded = validate_iidr(with_operation(decode_iidr_records(df)))
    valid, _ = split_corrupt(decoded)
    changes = valid.select(
        F.coalesce(
            F.from_json("record_value", ROW_SCHEMA)["ID"],
            F.from_json("record_key", "ID LONG")["ID"],
        ).alias("ID"),
        F.from_json("record_value", ROW_SCHEMA)["ORDER_NAME"].alias("ORDER_NAME"),
        F.from_json("record_value", ROW_SCHEMA)["STATUS"].alias("STATUS"),
        "op",
        "offset",
    )
    replay = apply_changes(
        changes, ["ID"], ["offset"], base=state1.drop("op", "offset")
    )
    assert sorted(
        (r["ID"], r["ORDER_NAME"]) for r in replay.collect()
    ) == sorted((r["ID"], r["ORDER_NAME"]) for r in state1.collect())


def test_latest_by_key_total_order(spark):
    df = spark.createDataFrame(
        [(1, 0, 10, "a"), (1, 0, 11, "b"), (1, 1, 5, "c"), (2, 0, 1, "d")],
        "k int, part int, off int, v string",
    )
    out = latest_by_key(df, ["k"], ["part", "off"]).collect()
    got = {r["k"]: r["v"] for r in out}
    assert got == {1: "c", 2: "d"}

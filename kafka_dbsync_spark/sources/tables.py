"""Parquet table loaders for the driver-generated test data.

The driver generates TPC-H-ish tables plus `events` (a change-event stream
stand-in), `documents` and `embeddings` (training-data-pipeline tables) at
/root/testdata/sf*/ (see TESTDATA.md). Loading via ``spark.read.parquet``
gives Catalyst predicate pushdown + column pruning for free — callers
should select/filter on the returned DataFrame and let the optimizer prune
the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pin_session_confs(spark: SparkSession) -> None:
    """Pin the runtime-settable session configs correctness depends on.

    The caller may hand us a session built outside get_spark (the driver's
    harness does); all three are load-bearing — nanos parquet reads throw
    without the first, duplicate Kafka headers throw without the second,
    and formatted-timestamp outputs (plus the DuckDB oracles) assume UTC."""
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception as e:  # noqa: BLE001 — read-only conf backends
            import logging

            logging.getLogger(__name__).warning("could not set %s: %s", key, e)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Path layout: {sf_dir}/{name}.parquet.

    `events.ts` is stored as TIMESTAMP(NANOS), which Spark reads as a
    nanosecond long (spark.sql.legacy.parquet.nanosAsLong) — convert to a
    microsecond TimestampType here (truncation, same rule as the
    reference's 12→9-digit fraction truncate in TimestampConverter.java:
    94-112, one step further to Spark's micros)."""
    pin_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer div — float division loses precision on epoch-nanos
            # (>2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # parquet timestamp[us] without isAdjustedToUTC reads as NTZ;
            # normalize to TIMESTAMP so epoch math (unix_micros), numeric
            # casts and watermarks all resolve. Session tz is pinned UTC,
            # so the wall-clock value — and every DuckDB oracle — is
            # unchanged.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view for spark.sql access."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

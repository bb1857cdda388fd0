"""IIDR change-event decoding (Kafka records with routing headers).

The reference's centerpiece input format (its sink README documents it;
events produced by hack/scripts/iidr-test-producer.py:53-113):

- key     = JSON of the PK columns (required for deletes)
- value   = JSON full row image, or null ⇒ delete tombstone
- headers = TableName (routing), A_ENTTYP (op code), A_TIMSTAMP
            (zone-less ``yyyy-MM-dd HH:mm:ss.SSSSSSSSSSSS``)

A Kafka streaming DataFrame (``includeHeaders=true``) carries headers as
``array<struct<key:string, value:binary>>``; ``decode_iidr_records`` turns
that into typed columns with pure built-in expressions (no UDF, no
shuffle — everything here is narrow, mirroring the reference's SMT chain
which is record-local, see SURVEY.md §3.3).

For batch-mode correctness tests (no Kafka broker available),
``events_as_iidr_stream`` adapts the driver's `events` parquet table into
the same kafka-record shape so every downstream transform is exercised
identically in batch and streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Kafka header array type as produced by the Spark Kafka source with
# includeHeaders=true.
IIDR_HEADERS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), True),
            T.StructField("value", T.BinaryType(), True),
        ]
    )
)

#: headers required by the reference sink (HeaderExtractor.java:19-21 — the
#: third header A_TIMSTAMP is optional).
REQUIRED_HEADERS = ("TableName", "A_ENTTYP")


def decode_iidr_records(kafka_df: DataFrame) -> DataFrame:
    """Kafka-shaped DataFrame → typed IIDR columns.

    Input columns (Kafka source contract): key binary, value binary,
    headers array<struct<key,value:binary>>, topic, partition, offset,
    timestamp.

    Output adds: record_key/record_value (UTF-8 strings), headers_map
    (map<string,string>), table_name, entry_type, a_timstamp.

    Parity: header extraction + UTF-8 decode = HeaderExtractor.java:26-48;
    last-with-name semantics for duplicate header names rely on
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` (set by session.get_spark —
    the default EXCEPTION policy would kill the query instead).
    """
    with_map = (
        kafka_df.withColumn("record_key", F.col("key").cast("string"))
        .withColumn("record_value", F.col("value").cast("string"))
        .withColumn(
            "headers_map",
            F.map_from_entries(
                F.expr(
                    "transform(headers, h -> struct(h.key as key,"
                    " decode(h.value, 'UTF-8') as value))"
                )
            ),
        )
    )
    return (
        with_map.withColumn("table_name", F.col("headers_map")["TableName"])
        .withColumn("entry_type", F.col("headers_map")["A_ENTTYP"])
        .withColumn("a_timstamp", F.col("headers_map")["A_TIMSTAMP"])
    )


def events_as_iidr_stream(events_df: DataFrame) -> DataFrame:
    """Adapt the driver `events` table into the kafka-record IIDR shape.

    Deterministic mapping (used by both the Spark queries and the DuckDB
    oracles, so the rules live in one place — keep in sync with
    tools/oracle_fragments.py):

    - kafka key      = JSON ``{"user_id": <id>}`` (the merge PK)
    - kafka value    = JSON row image (null for delete events)
    - TableName      = ``USER_STATE``
    - A_ENTTYP       = signup→PT, click→UP, view→RR, purchase→FP,
                       error→DL, except every 10th error event (event_id %
                       10 == 0) gets the unknown code XX (corrupt-branch
                       fixture, mirroring the reference's commented-out
                       corrupt event in iidr-test-producer.py:103-112)
    - offset         = event_id (Kafka partition order stand-in)
    """
    enttyp = (
        F.when(F.col("event_type") == "signup", F.lit("PT"))
        .when(F.col("event_type") == "click", F.lit("UP"))
        .when(F.col("event_type") == "view", F.lit("RR"))
        .when(F.col("event_type") == "purchase", F.lit("FP"))
        .when(
            (F.col("event_type") == "error") & (F.col("event_id") % 10 == 0),
            F.lit("XX"),
        )
        .otherwise(F.lit("DL"))
    )
    is_delete = F.col("event_type") == "error"
    row_json = F.to_json(
        F.struct(
            F.col("user_id").alias("user_id"),
            F.col("event_type").alias("event_type"),
            F.col("value").alias("value"),
            F.col("props").alias("props"),
        )
    )
    return (
        events_df.withColumn("record_key", F.to_json(F.struct(F.col("user_id"))))
        .withColumn("record_value", F.when(~is_delete, row_json))
        .withColumn("table_name", F.lit("USER_STATE"))
        .withColumn("entry_type", enttyp)
        .withColumn(
            "a_timstamp",
            F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS'000000'"),
        )
        .withColumn("topic", F.lit("iidr.CDC.USER_STATE"))
        .withColumn("kafka_partition", (F.col("user_id") % 4).cast("int"))
        .withColumn("offset", F.col("event_id"))
    )

"""Debezium change-event envelope decoding.

The reference consumes Debezium envelopes `{before, after, op ∈ {c,u,d,r},
ts_ms, source}` from Kafka (documented in the reference's
docs/ARCHITECTURE.md:54-61; consumed by LegacyCharsetTransform.java:145-171).
Here the envelope is a typed StructType and decoding is a single
``from_json`` — Catalyst prunes unreferenced nested fields, so selecting
only ``after.*`` never materializes ``before``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def debezium_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Envelope schema for a given row (table) schema."""
    return T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("table", T.StringType(), True),
                        T.StructField("schema", T.StringType(), True),
                        T.StructField("lsn", T.StringType(), True),
                        T.StructField("connector", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )


def decode_envelope(value_col: Column | str, row_schema: T.StructType) -> Column:
    """JSON string column → typed envelope struct column."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    return F.from_json(col, debezium_envelope_schema(row_schema))

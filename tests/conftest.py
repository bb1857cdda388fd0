from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_dbsync_spark import get_spark  # noqa: E402
from kafka_dbsync_spark.sources.iidr import IIDR_HEADERS_TYPE  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kds-tests", cpus=8, shuffle_partitions=8)
    yield s


def kafka_record(offset, key, value, **headers):
    """Build one kafka-shaped IIDR record tuple (see kafka_df fixture)."""
    hs = [(k, v.encode()) for k, v in headers.items()] or None
    return (
        json.dumps(key).encode() if key is not None else None,
        json.dumps(value).encode() if value is not None else None,
        hs,
        "iidr.CDC.TEST_ORDERS",
        0,
        offset,
        None,
    )


@pytest.fixture(scope="session")
def kafka_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("headers", IIDR_HEADERS_TYPE),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )

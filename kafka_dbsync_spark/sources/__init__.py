from kafka_dbsync_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from kafka_dbsync_spark.sources.debezium import (  # noqa: F401
    debezium_envelope_schema,
    decode_envelope,
)
from kafka_dbsync_spark.sources.iidr import (  # noqa: F401
    IIDR_HEADERS_TYPE,
    decode_iidr_records,
    events_as_iidr_stream,
)

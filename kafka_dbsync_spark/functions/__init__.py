from kafka_dbsync_spark.functions.entrytype import (  # noqa: F401
    DELETE_CODES,
    UPSERT_CODES,
    OP_CORRUPT,
    OP_DELETE,
    OP_UPSERT,
    map_entry_type,
)
from kafka_dbsync_spark.functions.timestamps import (  # noqa: F401
    coerce_timestamp,
    coerce_date,
    coerce_time,
    normalize_iidr_timestamp,
)
from kafka_dbsync_spark.functions.charset import recover_legacy_charset  # noqa: F401

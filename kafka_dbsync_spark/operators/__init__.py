from kafka_dbsync_spark.operators.transforms import (  # noqa: F401
    case_convert,
    coerce_fields,
    filter_table,
    split_corrupt,
    unwrap_envelope,
    validate_iidr,
    with_operation,
    with_target_table,
)
from kafka_dbsync_spark.operators.merge import (  # noqa: F401
    apply_changes,
    latest_by_key,
)

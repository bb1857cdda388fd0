from kafka_dbsync_spark.plans.pipeline import (  # noqa: F401
    build_transform_chain,
    CdcPipeline,
)

from kafka_dbsync_spark.streaming.dialects import (  # noqa: F401
    Dialect,
    MySqlDialect,
    PostgreSqlDialect,
    SqliteDialect,
    dialect_for,
)
from kafka_dbsync_spark.streaming.apply import CdcApplyEngine  # noqa: F401

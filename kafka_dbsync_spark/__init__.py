"""kafka_dbsync_spark — a PySpark-native CDC replication + data-processing engine.

A brand-new engine with the query/data-processing capabilities of the
reference `isliao613/kafka-dbsync` (a Kafka-Connect/Debezium CDC toolkit),
re-expressed Spark-first:

- **sources/**   Kafka-shaped change-event streams (batch or Structured
  Streaming), Debezium envelope decoding, IIDR header-event decoding,
  parquet table loaders for the driver test data.
- **functions/** scalar function surface (SURVEY.md §2.5): entry-type op
  mapping, IIDR timestamp normalization, multi-pattern type coercion,
  legacy-charset recovery, text-analysis and vector primitives.
- **operators/** composable DataFrame→DataFrame transforms (the SMT chain,
  SURVEY.md §2.3), the keyed merge engine (last-write-wins apply,
  SURVEY.md §2.4 A1–A3), and large-scale training-data operators
  (dedup, similarity search, text analysis, multimodal plumbing).
- **streaming/** foreachBatch apply engine with JDBC dialects
  (MySQL/PostgreSQL/SQLite/generic), corrupt-event dead-lettering,
  checkpointed exactly-once-effect pipelines.
- **plans/**     declarative pipeline configs (≈ connector JSON) that
  assemble source → transform chain → sink.

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join strategy; the only intentional shuffle in the replication path is the
per-key last-write-wins window. UDFs appear only where the semantics are
not expressible with built-ins (charset byte recovery).
"""

__version__ = "0.1.0"

from kafka_dbsync_spark.session import get_spark  # noqa: F401

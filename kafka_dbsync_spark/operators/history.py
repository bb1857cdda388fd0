"""SCD Type-2 change history from an ordered keyed change stream.

The reference applies CDC as destructive upserts/deletes — the target
table only ever holds the latest image (JdbcWriter upsert path; SURVEY.md
§0). The natural companion a replication user asks for next is the
*audit* shape: keep every version with its validity interval. This
operator derives that history from the same validated change stream the
merge engine consumes, so one pipeline can feed both a current-state
table and a history table.

Semantics (classic SCD2 over CDC):

- every **upsert** opens a version: ``valid_from`` = its order value;
- the **next change on the same key** (upsert or delete) closes it:
  ``valid_to`` = that change's order value, ``NULL`` while open;
- **delete** rows close the prior version but emit no row themselves;
- ``is_current`` = the version is still open (no later change).

Scale notes (100 TB): one shuffle — the per-key window, hash-partitioned
on the key (the same partitioning the merge path uses, so a pipeline
computing both reuses the exchange). Skew is bounded by per-key history
length (change count per PK), not table size; ``lead`` needs only a sort
within each key group, which AQE can split if a key is pathological.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_dbsync_spark.functions.entrytype import OP_UPSERT


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Return one row per upsert with ``valid_from``/``valid_to``
    (``order_col`` values) and ``is_current``.

    ``order_col`` must be a total order within each key (e.g. Kafka
    offset, or a change sequence number) and non-null.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col))
    closed = changes.withColumn("__valid_to", F.lead(order_col).over(w))
    return (
        closed.filter(F.col(op_col) == OP_UPSERT)
        .withColumn("valid_from", F.col(order_col))
        .withColumn("valid_to", F.col("__valid_to"))
        .withColumn("is_current", F.col("__valid_to").isNull())
        .drop("__valid_to", op_col)
    )

"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship CDC-apply query at sf0.001;
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators, with DuckDB
oracle SQL for the driver's side-by-side correctness check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_dbsync_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: apply the events change stream as a keyed CDC merge
    (decode → op-map → validate → last-write-wins → final table state)."""
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

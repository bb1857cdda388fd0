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

# The driver's CORRECTNESS gate checks the FIRST 50 entries of queries().
# Round-4 rotation (VERDICT r3 "Next round" #1 and #8): front-load
# (a) the 14 queries registered after the r3 window filled (never
# driver-checked; all pass the stricter local gate,
# CORRECTNESS_LOCAL_r03.json), (b) the 3 queries whose r3 driver rows
# ERRORED on array-typed output columns — now emitting scalar
# (comma-joined) columns, (c) queries NEW this round (registered here
# first so no never-checked tail accumulates). Remaining slots re-check
# r2/r3-green queries in registration order.
_DRIVER_PRIORITY: list[str] = [
    # (a) never driver-checked (registered after the r3 50-slot window)
    "bpe_merge_step",
    "rarity_scores",
    "label_pca",
    "countmin_counts",
    "dataset_splits",
    "user_value_outliers",
    "audio_window_energy",
    "quality_rank_by_source",
    "part_cooccurrence",
    "returned_revenue_customers",
    "user_activity_streaks",
    "collocations_lift",
    "dup_rate_by_source",
    "ivf_outliers",
    # (b) r3 driver rows errored on array columns — fixed to scalar output
    "inverted_index",
    "snapshot_diff",
    "pq_encode",
    # (c) new in round 4
    "pq_index_build",
    "pq_adc_search_served",
    "ivfpq_search_served",
    "bpe_merges_k",
    "lake_snapshot_read",
    "ann_recall_report",
    "pq_index_add",
    "fingerprint_overlap_pairs",
    "bpe_token_counts",
    "timeseries_gap_fill",
    "fk_integrity_report",
    "triangle_counts",
    "canonical_docs",
    "min_price_suppliers",
    "nation_market_share",
]


def _driver_order(d: dict) -> dict:
    out = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: apply the events change stream as a keyed CDC merge
    (decode → op-map → validate → last-write-wins → final table state)."""
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _driver_order(QUERIES)


def oracle_sql() -> dict[str, str]:
    return _driver_order(ORACLES)

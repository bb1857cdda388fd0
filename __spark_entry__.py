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
# Rounds 1–2 together covered 59 of the 81 registered queries; this list
# front-loads (a) the 22 queries never driver-checked, (b) the 9 checked
# only in round 1, and (c) queries new this round — so that by the end of
# round 3 every query has at least one driver CORRECTNESS row. All of
# (a)+(b) already pass the stricter local gate (tools/check_correctness.py,
# VERDICT r2). Entries not in this list follow in registration order.
_DRIVER_PRIORITY: list[str] = [
    # (a) never driver-checked (registered after the r2 50-slot window)
    "simhash_neardup_pairs",
    "datatype_matrix",
    "salted_priority_revenue",
    "incremental_hourly",
    "bm25_search",
    "zorder_values",
    "rolling_1h_value",
    "nation_pair_flows",
    "hot_key_report",
    "corpus_mixture_report",
    "value_histogram",
    "funnel_conversion",
    "retention_cohorts",
    "textrank_keywords",
    "multimodal_resize",
    "multimodal_frames",
    "mixture_sample",
    "duplicate_ngram_spans",
    "cdc_state_at",
    "inverted_index",
    "snapshot_diff",
    "cube_revenue",
    # (b) checked in round 1 only
    "simhash",
    "similarity_topk",
    "ann_blocked_topk",
    "embedding_neardup_pairs",
    "vector_lsh_buckets",
    "customers_with_urgent_orders",
    "running_revenue",
    "curation_pipeline",
    "multimodal_meta",
    # (c) new in round 3
    "schema_embedded_decode",
    "ivf_cell_stats",
    "stratified_quantiles",
    "minhash_jaccard_est",
    "late_data_watermark",
    "shipping_priority",
    "large_volume_customers",
    # (d) new in round 3's second half — slots 39-50 (the window would
    # otherwise re-check r2-green queries, which already have their
    # CORRECTNESS_r02 rows; every entry below passes the stricter local
    # gate, see CORRECTNESS_LOCAL_r03.json). Left for the next rotation:
    # bpe_merge_step, rarity_scores, label_pca (rows-only).
    "pq_codebooks",
    "pq_encode",
    "pq_adc_search",
    "ivfpq_search",
    "late_sole_suppliers",
    "idle_rich_customers",
    "props_json_stats",
    "kmeans_refine",
    "user_value_regression",
    "winnowing_fingerprints",
    "skipping_index",
    "bloom_decontaminate",
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

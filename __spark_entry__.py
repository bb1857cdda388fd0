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
# Round-7 rotation (VERDICT r6 "Next round" #3 — freshness): the window
# front-loads (a) the 11 queries new in round 7's first half
# (token_budget_selection / ppl_buckets_by_lang /
# token_budget_admission / quality_drift_psi / ppl_buckets_lang_models
# / drift_monitor_series / streaming_curation_gate) plus the 16 added
# in its second half (lm_trigram_backoff / lm_trigram_served /
# hard_negative_mining / embedding_drift_psi / dedup_span_rewrite /
# moore_lewis_selection / moore_lewis_served / setsim_exact_join /
# weighted_sample_tokens / weighted_sample_by_lang / nb_source_predict
# / curation_pipeline_v3 / important_parts / top_revenue_supplier /
# nation_year_profit / lsh_dedup_recall) plus the 4 queries whose
# code or semantics changed this round (the localCheckpoint rewrite of
# ppl_buckets / curation_pipeline_v2 with driver-side histogram cut
# points; the reserved-seed-namespace change under ingest_quality_gate;
# the codebook/centroid checkpointing inside the fused ivfpq_search),
# then (b) ALL 22 queries whose latest driver row still dates to round
# 3, then (c) the oldest round-4 rows in registration order. That
# fills 50 exactly; after this gate no query's newest driver row is
# older than round 4 (the remaining r4 rows — now including
# cdc_corrupt_events / dlq_records / cdc_op_counts / cdc_route_stats /
# iidr_ts_normalize /
# type_coercion / cdc_backfill_then_stream / table_profile /
# scd2_history / envelope_unwrap / top_customers / events_hourly /
# events_sessionize / asof_join / local_supplier_revenue /
# range_join_active_orders bumped by the second-half additions — plus
# the r5 rows rotate in round 8).
_DRIVER_PRIORITY: list[str] = [
    # (a) new or changed in round 7 — no/stale green rows
    "lm_trigram_backoff",
    "lm_trigram_served",
    "moore_lewis_selection",
    "moore_lewis_served",
    "setsim_exact_join",
    "weighted_sample_tokens",
    "weighted_sample_by_lang",
    "nb_source_predict",
    "curation_pipeline_v3",
    "important_parts",
    "top_revenue_supplier",
    "nation_year_profit",
    "lsh_dedup_recall",
    "hard_negative_mining",
    "embedding_drift_psi",
    "dedup_span_rewrite",
    "token_budget_selection",
    "ppl_buckets_by_lang",
    "token_budget_admission",
    "quality_drift_psi",
    "ppl_buckets_lang_models",
    "drift_monitor_series",
    "streaming_curation_gate",
    "ppl_buckets",
    "curation_pipeline_v2",
    "ingest_quality_gate",
    "ivfpq_search",
    # (b) every remaining round-3-stale row (22)
    "textrank_keywords",
    "multimodal_resize",
    "multimodal_frames",
    "mixture_sample",
    "duplicate_ngram_spans",
    "cdc_state_at",
    "cube_revenue",
    "schema_embedded_decode",
    "ivf_cell_stats",
    "stratified_quantiles",
    "minhash_jaccard_est",
    "late_data_watermark",
    "shipping_priority",
    "large_volume_customers",
    "late_sole_suppliers",
    "idle_rich_customers",
    "props_json_stats",
    "kmeans_refine",
    "user_value_regression",
    "winnowing_fingerprints",
    "skipping_index",
    "bloom_decontaminate",
    # (c) oldest round-4 row, registration order (first 1)
    "cdc_final_state",
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

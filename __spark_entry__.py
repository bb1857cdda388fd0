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
# Round-6 rotation (VERDICT r5 "Next round" #3 — freshness): the window
# front-loads (a) the 11 queries whose CODE or SEMANTICS changed this
# round (histogram cut-point rewrite of ppl_buckets /
# curation_pipeline_v2; metadata-only cache validation behind every
# pq_index/lm_index served query; the admission-operator delegation of
# ingest_quality_gate; the dedup_incremental cache registry), then
# (b) the 17 queries whose latest driver row dates to round 2, then
# (c) the first 22 round-3-stale rows in registration order. That
# fills 50 exactly; the remaining 22 r3-stale rows (textrank_keywords
# onward in registration order) plus the r4 rows rotate into round 7 —
# 61 stale + 11 changed cannot fit one 50-slot window.
_DRIVER_PRIORITY: list[str] = [
    # (a) changed in round 6 — prior green rows prove nothing anymore
    "ppl_buckets",
    "curation_pipeline_v2",
    "ingest_quality_gate",
    "lm_perplexity_served",
    "pq_index_build",
    "pq_adc_search_served",
    "ivfpq_search_served",
    "ivfpq_search_refined",
    "ivfpq_search_multi",
    "pq_index_add",
    "dedup_incremental",
    # (b) latest green row is round 2 — the stalest 17
    "ngram_jaccard_dedup",
    "vocab_topk",
    "ngram_bigrams",
    "ivf_centroids",
    "repetition_scores",
    "pii_scrub",
    "dedup_clusters",
    "decontaminate",
    "pack_sequences",
    "quantize_embeddings",
    "doc_chunks",
    "hash_sample",
    "balanced_sample",
    "topk_per_group",
    "ivf_assign",
    "ivf_search",
    "semantic_dedup",
    # (c) oldest round-3 rows, registration order (first 22)
    "simhash",
    "simhash_neardup_pairs",
    "similarity_topk",
    "ann_blocked_topk",
    "embedding_neardup_pairs",
    "vector_lsh_buckets",
    "customers_with_urgent_orders",
    "running_revenue",
    "curation_pipeline",
    "datatype_matrix",
    "multimodal_meta",
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

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
# Round-9 rotation (VERDICT r8 "Next round" #1 — retire the last
# r5-stale rows): the window front-loads (a) the 9 queries NEW in
# round 9 (url_dedup / host_blocklist_filter / image_neardup_pairs /
# image_dedup_survivors / pq_index_merge / curation_pipeline_v4 /
# url_ingest_gate / domain_stats / audio_neardup_pairs),
# (b) the 3 carried queries whose behavior-relevant code changed this round
# (paragraph_ingest_gate — read_cleaned_docs visibility is now gated
# on the para_hashes epoch commit; bucketed_colocated_join — orphaned
# location cleanup moved to the Hadoop FS API; ivfpq_remove_serve —
# the all-vectors-removed pre-check; ann_ingest_stream's r9 change is
# the pending-epoch compaction guard, which its compact_every=None path
# never executes — re-validated in the 191/191 local sweep and ceded
# its slot to the new audio query), then (c) ALL 38
# queries whose newest driver row still dates to round 5 (computed
# from the CORRECTNESS_r* files). That fills 50 exactly
# (pq_index_add's oracle — the frozen-quantizer assignment of every
# vector — is driver-checked through pq_index_merge, which shares it
# verbatim); after this gate no row predates round 6.
_DRIVER_PRIORITY: list[str] = [
    # (a) new in round 9 — never driver-checked
    "url_dedup",
    "host_blocklist_filter",
    "image_neardup_pairs",
    "image_dedup_survivors",
    "pq_index_merge",
    "curation_pipeline_v4",
    "url_ingest_gate",
    "domain_stats",
    "audio_neardup_pairs",
    # (b) behavior-relevant round-9 changes
    "paragraph_ingest_gate",
    "bucketed_colocated_join",
    "ivfpq_remove_serve",
    # (c) every round-5-stale row (38)
    "ann_recall_report",
    "collocations_lift",
    "customer_order_distribution",
    "customers_without_orders",
    "dedup_exact",
    "dedup_normalized",
    "discounted_brand_revenue",
    "doc_fingerprint",
    "dsir_weights",
    "excess_promo_suppliers",
    "fuzzy_match_pairs",
    "hll_distinct_tokens",
    "hybrid_rank_fusion",
    "lake_ordered_state",
    "lake_snapshot_read",
    "lang_id",
    "line_priority_classes",
    "lm_perplexity",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "nation_market_share",
    "order_priority_check",
    "pivot_daily_events",
    "pq_adc_search",
    "pq_codebooks",
    "pq_encode",
    "promo_revenue_share",
    "q1_pricing_summary",
    "quality_scores",
    "rollup_revenue",
    "segment_order_overlap",
    "small_qty_brand_revenue",
    "supplier_part_counts",
    "tfidf_topterms",
    "timeseries_gap_fill",
    "token_stats",
    "user_value_trend",
    "value_percentiles",
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

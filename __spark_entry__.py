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
# Round-5 rotation (VERDICT r4 "Next round" #1 — FRESHNESS, not
# first-time coverage: every query has been green at least once, so the
# window now front-loads (a) queries NEW this round, (b) queries whose
# CODE changed this round (green rows predating a change prove
# nothing), (c) the 32 queries whose latest green row is from round 2
# (the stalest), (d) the oldest round-3 rows in registration order to
# fill the window. The remaining r3/r4 rows rotate in next round.
# NOTE: the list is 68 unique entries; the driver takes the FIRST 50,
# so the last 18 r2-stale rows (from ngram_jaccard_dedup on, in list order)
# rotate into round 6's window instead — never-checked NEW queries and
# this round's semantics-changed queries outrank stale-but-once-green
# rows.
_DRIVER_PRIORITY: list[str] = [
    # (a) new in round 5
    "ingest_quality_gate",
    "curation_pipeline_v2",
    "ppl_buckets",
    "excess_promo_suppliers",
    # (b, late round 5) output semantics changed by the determinism
    # sweep — their older green rows prove nothing anymore
    "tfidf_topterms",
    "collocations_lift",
    "q1_pricing_summary",
    "order_priority_check",
    "line_priority_classes",
    "customer_order_distribution",
    "promo_revenue_share",
    "supplier_part_counts",
    "small_qty_brand_revenue",
    "discounted_brand_revenue",
    "hll_distinct_tokens",
    "lm_perplexity",
    "lm_perplexity_served",
    "dsir_weights",
    "fuzzy_match_pairs",
    "ivfpq_search_refined",
    "hybrid_rank_fusion",
    "ivfpq_search_multi",
    "dedup_incremental",
    "lake_ordered_state",
    # (b) code touched in round 5 (ADC dense-lookup rewrite, recall
    # report extension, index fingerprinting, lake sink hardening,
    # gap-fill guard, integer-division share)
    "ann_recall_report",
    "pq_codebooks",
    "pq_encode",
    "pq_adc_search",
    "ivfpq_search",
    "pq_index_build",
    "pq_adc_search_served",
    "ivfpq_search_served",
    "pq_index_add",
    "lake_snapshot_read",
    "timeseries_gap_fill",
    "nation_market_share",
    # (c) latest green row is round 2 — the stalest 32
    "rollup_revenue",
    "customers_without_orders",
    "pivot_daily_events",
    "segment_order_overlap",
    "value_percentiles",
    "user_value_trend",
    "dedup_exact",
    "dedup_normalized",
    "token_stats",
    "lang_id",
    "quality_scores",
    "doc_fingerprint",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_dedup",
    "vocab_topk",
    "ngram_bigrams",
    "ivf_centroids",
    "repetition_scores",
    "pii_scrub",
    "dedup_clusters",
    "tfidf_topterms",
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
    # (d) oldest round-3 rows, registration order
    "simhash",
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

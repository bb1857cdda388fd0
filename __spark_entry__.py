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
# Round-13 rotation. The ON-PATH rule is MECHANICAL (VERDICT r12
# what's-wrong #2): a query is on-path iff any file imported by its
# operator chain changed this round with at least one changed line on a
# code path the query executes — computed from `git diff r12..HEAD`
# over kafka_dbsync_spark/. Round 13 had two phases and the window is
# recomputed over the UNION of their diffs:
#   build phase — id_digest.py + bm25_index.py + pq_index.py (the
#   digest-v2 rework) plus fsck checkers APPENDED to five family
#   modules (no existing query path executes an appended line; the new
#   family_fsck_report row gates that code);
#   optimization phase — pq.py (pq_encode / with_residuals /
#   ivfpq_search / pq_adc_topk) + similarity.py (ivf_assign) +
#   pq_kernels.py (new) + functions/text.py (repetition_metrics /
#   gopher_signals / chunk_breaks_every_nth_space) + corpus.py
#   (bm25_topk / _okapi_topk / bm25_phrase_topk) + dedup.py
#   (setsim_prefix_join + the Arrow pair verifier) + the queries.py
#   call sites of all of the above.
# Window composition, 50 exactly (3 + 14 + 1 + 28 + 4):
#   (a) the 3 queries NEW in round 13 (gate-contract rule):
#       bm25_index_fsck / pq_index_fsck / family_fsck_report.
#   (b) the 14 carried queries on-path of the digest-v2 rework: the
#       BM25 mutation family and its reader rows over the new marker
#       shape, and the pq_index build/add/merge/stream/remove/serve
#       family.
#   (c) timeseries_gap_fill — the r12 disclosure-slip re-gate.
#   (e) the 28 carried queries on-path of the OPTIMIZATION diffs:
#       the inline IVF/PQ family (ivf_assign / ivf_search /
#       ivf_cell_stats / ivf_outliers / cluster_prototypes /
#       ann_recall_report / pq_encode / pq_adc_search / ivfpq_search /
#       ivfpq_search_refined / ivfpq_search_multi /
#       pq_adc_search_served / semantic_dedup — Arrow kernels replaced
#       the HOF folds), the inline BM25 family (bm25_search /
#       bm25_phrase_search / hybrid_rank_fusion — Arrow tf pass +
#       checkpointed Okapi input), the Gopher/repetition signals
#       (repetition_scores / gopher_rules_report /
#       curation_pipeline_v4), the chunker sites (paragraph_dedup /
#       paragraph_ingest_gate / boilerplate_strip /
#       boilerplate_strip_served / ccnet_pipeline), and the setsim
#       machinery (setsim_exact_join / curation_pipeline_v3 /
#       lsh_dedup_recall / lsh_recall_curve).
#   (d) 4 r8-tier rows (newest green = r8), CDC/reference-core first:
#       cdc_backfill_then_stream / cdc_corrupt_events / cdc_op_counts /
#       cdc_route_stats.
# CEDED this round, each passing the post-optimization full local
# sweep (CORRECTNESS_LOCAL_r13, 218/218 at sf0.01 re-run after the
# last optimization commit):
#   - the remaining r8-tier rows (asof_join, audio_window_energy,
#     bpe_merge_step, bpe_merges_k, bpe_token_counts, canonical_docs,
#     countmin_counts, dataset_splits, dlq_records, dup_rate_by_source,
#     envelope_unwrap, events_hourly, events_sessionize,
#     fingerprint_overlap_pairs, fk_integrity_report, iidr_ts_normalize,
#     important_parts, inverted_index, k_anonymity_report, label_pca,
#     local_supplier_revenue, min_price_suppliers, mixture_epochs_plan,
#     part_cooccurrence, quality_rank_by_source,
#     range_join_active_orders, rarity_scores,
#     returned_revenue_customers, scd2_history, snapshot_diff,
#     table_profile, top_customers, triangle_counts, type_coercion,
#     user_activity_streaks, user_value_outliers) — none on-path of any
#     r13 change; the (d)-candidate pool for round 14;
#   - the lm/nb/boilerplate/decontam/dedup families' existing queries:
#     their module files changed ONLY by appended fsck functions (the
#     optimization phase's LM/MinHash rewrites were measured, reverted,
#     and are NOT in the diff — OPTIMIZATION_r13.md "Examined,
#     deliberately left alone"), and the appended code is gated by
#     family_fsck_report.
_DRIVER_PRIORITY: list[str] = [
    # (a) new in round 13 — never driver-checked
    "bm25_index_fsck",
    "pq_index_fsck",
    "family_fsck_report",
    # (b) on-path of the digest-v2 rework
    "bm25_index_add",
    "bm25_ingest_gate",
    "bm25_tiered_merge",
    "bm25_segment_merge",
    "bm25_remove_serve",
    "bm25_search_served",
    "bm25_phrase_served",
    "bm25_search_multi",
    "pq_index_build",
    "pq_index_add",
    "pq_index_merge",
    "ann_ingest_stream",
    "ivfpq_remove_serve",
    "ivfpq_search_served",
    # (c) the r12 disclosure-slip re-gate
    "timeseries_gap_fill",
    # (e) on-path of the optimization diffs
    "ivf_assign",
    "ivf_search",
    "ivf_cell_stats",
    "ivf_outliers",
    "cluster_prototypes",
    "ann_recall_report",
    "pq_encode",
    "pq_adc_search",
    "ivfpq_search",
    "ivfpq_search_refined",
    "ivfpq_search_multi",
    "pq_adc_search_served",
    "semantic_dedup",
    "bm25_search",
    "bm25_phrase_search",
    "hybrid_rank_fusion",
    "repetition_scores",
    "gopher_rules_report",
    "curation_pipeline_v4",
    "curation_pipeline_v3",
    "paragraph_dedup",
    "paragraph_ingest_gate",
    "boilerplate_strip",
    "boilerplate_strip_served",
    "ccnet_pipeline",
    "setsim_exact_join",
    "lsh_dedup_recall",
    "lsh_recall_curve",
    # (d) r8-tier fill, CDC/reference-core first
    "cdc_backfill_then_stream",
    "cdc_corrupt_events",
    "cdc_op_counts",
    "cdc_route_stats",
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

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
# Round-12 rotation (VERDICT r11 "Next round" #3: rotate over the r7
# tier — after this window no green row predates round 8):
#   (a) the 1 query NEW in round 12, registered the same round it
#       landed (gate-contract rule): lm_erasure_rebuild — model-family
#       right-to-erasure via staleness re-mine (VERDICT r11 #7).
#   (b) the 15 carried queries whose ON-PATH behavior changed this
#       round: the whole BM25 mutation family (bm25_index_add /
#       bm25_ingest_gate / bm25_tiered_merge / bm25_segment_merge /
#       bm25_remove_serve — per-segment id digests + the zero-IO
#       disjointness ladder + in-batch dedup + gen repoint + segstats
#       backfill, VERDICT r11 #1/#5 + ADVICE r11; then the digest
#       construction itself reworked mid-round after the r12 scale
#       probe caught it at 2.5-4x: plain-row interval/residue stats +
#       capped word-grouped distributed bloom, id_digest.py); the pq
#       digest build path (pq_index_build / pq_index_add /
#       pq_index_merge / ann_ingest_stream / ivfpq_remove_serve /
#       ivfpq_search_served / pq_adc_search_served / ivfpq_search_multi
#       — the same digest rework, riding fingerprint_and_digest, which
#       also obsoletes ADVICE r11's posexplode-overflow conditioning by
#       not exploding at all + the two-phase marker write folding the
#       digest BEFORE codes land, ADVICE r11); and the PSL
#       pair (domain_stats_psl / domain_blocklist_psl — psl_load parse
#       memoization, ADVICE r11).
#   (c) ALL 31 remaining r7-tier rows (the pool VERDICT r11 #3 names;
#       recomputed from CORRECTNESS_r1..r11 — newest green row = r7).
#   (d) 3 BM25 serve rows (bm25_search_served / bm25_search_multi /
#       bm25_phrase_served) — their fixtures now build markers with
#       the new segdigests shape and serve over merge-touched
#       segments, so they re-gate the reader side of (b).
# That fills 50 exactly (1+15+31+3). CEDED this round: nothing — every
# r8+ row outside the window passes the round-12 full local sweep
# (CORRECTNESS_LOCAL_r12) and had no on-path change; the r8 tier (46
# rows) is the (c)-candidate pool for round 13.
_DRIVER_PRIORITY: list[str] = [
    # (a) new in round 12 — never driver-checked
    "lm_erasure_rebuild",
    # (b) on-path behavior changed in round 12
    "bm25_index_add",
    "bm25_ingest_gate",
    "bm25_tiered_merge",
    "bm25_segment_merge",
    "bm25_remove_serve",
    "pq_index_build",
    "pq_index_add",
    "pq_index_merge",
    "ann_ingest_stream",
    "ivfpq_remove_serve",
    "ivfpq_search_served",
    "pq_adc_search_served",
    "ivfpq_search_multi",
    "domain_stats_psl",
    "domain_blocklist_psl",
    # (c) the 31 remaining r7-tier rows (complete — newest green = r7)
    "bloom_decontaminate",
    "cube_revenue",
    "drift_monitor_series",
    "duplicate_ngram_spans",
    "embedding_drift_psi",
    "hard_negative_mining",
    "idle_rich_customers",
    "ingest_quality_gate",
    "ivf_cell_stats",
    "kmeans_refine",
    "large_volume_customers",
    "late_sole_suppliers",
    "minhash_jaccard_est",
    "mixture_sample",
    "multimodal_frames",
    "multimodal_resize",
    "nation_year_profit",
    "ppl_buckets",
    "ppl_buckets_by_lang",
    "ppl_buckets_lang_models",
    "props_json_stats",
    "quality_drift_psi",
    "shipping_priority",
    "skipping_index",
    "stratified_quantiles",
    "textrank_keywords",
    "token_budget_selection",
    "top_revenue_supplier",
    "user_value_regression",
    "weighted_sample_tokens",
    "winnowing_fingerprints",
    # (d) BM25 serve rows re-gating the new marker shape's reader side
    "bm25_search_served",
    "bm25_search_multi",
    "bm25_phrase_served",
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

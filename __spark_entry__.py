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
# Round-10 rotation (VERDICT r9 "Next round" #1): the window front-loads
# (a) the 8 queries NEW in round 10 (domain_stats_psl /
# nb_source_predict_served / image_ingest_gate, then the second-half
# additions domain_blocklist_psl / nb_ingest_gate /
# video_neardup_pairs / contamination_ingest_gate /
# curation_front_door — registered the same round they landed, the
# driver-gate-contract rule the r9 window cut violated), (b) the 2 round-9
# queries that were added after the r9 window cut and have NEVER had a
# driver row (cluster_prototypes, contamination_report), (c) the 4
# carried queries whose ON-PATH behavior changed this round
# (url_dedup / url_ingest_gate / curation_pipeline_v4 — normalized_url's
# utm_/slash steps were re-anchored, ADVICE r9; pq_index_merge —
# quantizer_signature gained a position-sensitive xor term computed on
# the gate path), then (d) 36 of the 47 queries whose newest driver row
# dates to round 6 (computed from the CORRECTNESS_r* files).
# That fills 50 exactly. The 11 r6-stale rows that DID NOT FIT —
# the candidate set is 47 stale + 10 never-gated + 4 changed = 61 — cede
# with the strongest alternate validation, each carrying an r6 row into
# round 11 (front-load them there):
#   pq_index_add        oracle verbatim = pq_index_merge (in-window,
#                       re-gated); merge==add pinned byte-identical in
#                       tests/test_pq_index.py
#   pq_index_build      build_pq_index EXECUTES inside the gated
#                       pq_index_merge query (on-path); rebuild/stale
#                       tests in pytest
#   ivfpq_search_served oracle verbatim = ivfpq_search (in-window);
#                       serve==fused pinned in pytest
#   pq_adc_search_served oracle verbatim = pq_adc_search (r9 row);
#                       serve==fused pinned in pytest
#   lm_perplexity_served serve==inline pinned in tests/test_lm_index.py;
#                       lm_perplexity has an r9 row
#   incremental_hourly  oracle verbatim = events_hourly (r8 row);
#                       incremental machinery pinned in
#                       tests/test_incremental.py
#   multimodal_meta     narrow mapInPandas metadata pass, pinned in
#                       tests/test_multimodal.py
#   hash_sample         narrow deterministic-hash filter, pytest-pinned
#   zorder_values       pure narrow bit arithmetic, pytest-pinned
#   topk_per_group      plain per-group rank<=k window, pytest-pinned;
#                       the windowed-TopK shape has a fresh driver row
#                       via weighted_sample_by_lang
#   dedup_clusters      the LSH->components->cluster machinery has
#                       fresh rows via canonical_docs (>=r7) and the
#                       in-window minhash/simhash pair queries
# (the last five ceded to the second-half round-10 queries: gate
# integrity for NEW code outranks re-gating unchanged narrow ops)
# All 11 pass the round-10 full local sweep (CORRECTNESS_LOCAL_r10).
#
# LATE round-10 additions (the BM25 index family + boilerplate_strip,
# registered the same round they landed per the gate-contract rule)
# displace 5 more (d) rows, each with the strongest alternate
# validation — all pass the full local sweep:
#   simhash          executes ON-PATH inside simhash_neardup_pairs
#                    (stays in-window); byte-exact vectors pytest-pinned
#   ivf_centroids    the k-means build executes on-path inside the
#                    in-window ivf_assign and ivf_search
#   vocab_topk       plain token agg + TakeOrdered, pytest-pinned; the
#                    windowed-TopK shape gated via weighted_sample_by_lang
#   running_revenue  plain running-sum window, pytest-pinned; the
#                    per-key window shape re-gated via rolling_1h_value
#   ngram_bigrams    the bigram explode+agg executes on-path inside
#                    lm_perplexity (r9 row) and the in-window
#                    decontaminate's shingle derivation
#   ivfpq_search_multi  batched≡per-query pinned in
#                    tests/test_pq_index.py::test_multi_query_search_
#                    equals_per_query; the serve machinery re-gated via
#                    the in-window ivfpq_search_refined + pq_index_merge
#   salted_priority_revenue  its oracle IS the unsalted aggregate
#                    (salt-invariance is the query's whole claim) and
#                    salted≡plain is pinned in tests/test_incremental.py;
#                    the skew pattern stays gated via hot_key_report
#   vector_lsh_buckets  the EXACT with_lsh_buckets machinery executes
#                    ON-PATH inside the in-window embedding_ingest_gate
#                    (48 planes vs 16 — same code, same oracle plane
#                    derivation); literal≡broadcast paths pytest-pinned
#   ngram_jaccard_dedup  the shingle machinery (with_shingles) executes
#                    on-path inside the in-window decontaminate; exact
#                    jaccard verification pinned in tests/test_dedup.py
#   similarity_topk  exact cosine_topk pinned in tests/test_similarity.py;
#                    the broadcast-query + TakeOrdered shape stays gated
#                    via the in-window ann_blocked_topk
_DRIVER_PRIORITY: list[str] = [
    # (a) new in round 10 — never driver-checked
    "domain_stats_psl",
    "nb_source_predict_served",
    "image_ingest_gate",
    "domain_blocklist_psl",
    "nb_ingest_gate",
    "video_neardup_pairs",
    "contamination_ingest_gate",
    "curation_front_door",
    # (b) added after the r9 window cut — never driver-checked
    "cluster_prototypes",
    "contamination_report",
    # (a2) late round-10 additions — never driver-checked: the persisted
    # BM25 text index (serve twin + segment add/merge lifecycle +
    # tombstone erasure + positional phrase search), RefinedWeb
    # host-scoped boilerplate removal, and the embedding (semantic)
    # dedup-at-ingest gate
    "bm25_search_served",
    "bm25_index_add",
    "bm25_segment_merge",
    "bm25_remove_serve",
    "bm25_phrase_search",
    "bm25_phrase_served",
    "boilerplate_strip",
    "boilerplate_strip_served",
    "embedding_ingest_gate",
    "bm25_search_multi",
    # (c) on-path behavior changed in round 10
    "url_dedup",
    "url_ingest_gate",
    "curation_pipeline_v4",
    "pq_index_merge",
    # (d) round-6-stale rows (26 of 47; the 11 + 5 + 5 cessions above)
    "ann_blocked_topk",
    "balanced_sample",
    "bm25_search",
    "corpus_mixture_report",
    "curation_pipeline",
    "customers_with_urgent_orders",
    "datatype_matrix",
    "decontaminate",
    "dedup_incremental",
    "doc_chunks",
    "embedding_neardup_pairs",
    "funnel_conversion",
    "hot_key_report",
    "ivf_assign",
    "ivf_search",
    "ivfpq_search_refined",
    "nation_pair_flows",
    "pack_sequences",
    "pii_scrub",
    "quantize_embeddings",
    "repetition_scores",
    "retention_cohorts",
    "rolling_1h_value",
    "semantic_dedup",
    "simhash_neardup_pairs",
    "value_histogram",
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

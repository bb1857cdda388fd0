from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_dbsync_spark import get_spark  # noqa: E402
from kafka_dbsync_spark.sources.iidr import IIDR_HEADERS_TYPE  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="kds-tests", cpus=8, shuffle_partitions=8)
    yield s


def kafka_record(offset, key, value, **headers):
    """Build one kafka-shaped IIDR record tuple (see kafka_df fixture)."""
    hs = [(k, v.encode()) for k, v in headers.items()] or None
    return (
        json.dumps(key).encode() if key is not None else None,
        json.dumps(value).encode() if value is not None else None,
        hs,
        "iidr.CDC.TEST_ORDERS",
        0,
        offset,
        None,
    )


@pytest.fixture(scope="session")
def kafka_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("headers", IIDR_HEADERS_TYPE),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
        ]
    )


# ---------------------------------------------------------------------------
# Nightly tier (VERDICT r13 next-round #2): the driver's verify window
# cannot fit the full ~34-minute suite, so the measured-slowest
# lifecycle / crash-replay / property-sweep tests (two measured tiers:
# every test >= ~8 s in the r14 full-suite duration profile, then every
# remaining test >= ~4.5 s setup+call in the default-set profile) are
# deselected by default via pytest.ini's `-m "not nightly"`. They remain
# one command away: `python -m pytest tests/ -m nightly`. The list is
# data-driven here (one place) instead of scattered decorators.
NIGHTLY_NODEIDS = {
    "tests/test_admission.py::test_admission_routes_dedup_then_gate",
    "tests/test_admission.py::test_auto_compaction_bounds_state_dirs",
    "tests/test_admission.py::test_compaction_crash_between_base_write_and_cleanup",
    "tests/test_admission.py::test_compaction_keep_last_and_pending_ceiling",
    "tests/test_admission.py::test_compaction_preserves_state_and_replay_safety",
    "tests/test_admission.py::test_neardup_gate_audio_modality_e2e",
    "tests/test_admission.py::test_neardup_gate_embedding_modality_e2e",
    "tests/test_admission.py::test_no_persisted_rdds_leak_after_batches",
    "tests/test_admission.py::test_replayed_epoch_is_noop_and_crash_replay_recovers",
    "tests/test_admission.py::test_restart_rejects_duplicate_of_prior_admission",
    "tests/test_admission.py::test_seeded_hashes_suppress_corpus_duplicates",
    "tests/test_bench_harness.py::test_compact_line_bounded_at_any_registry_size",
    "tests/test_bm25_index.py::test_ingest_gate_replay_and_keep_first",
    "tests/test_bm25_index.py::test_ingest_gate_tombstone_not_resurrected_until_merge",
    "tests/test_bm25_index.py::test_merge_compacts_to_one_segment",
    "tests/test_bm25_index.py::test_segment_sizes_backfills_legacy_marker",
    "tests/test_bm25_index.py::test_subset_merge_keeps_other_segments_live",
    "tests/test_bm25_index.py::test_subset_merge_repoints_gen_when_build_segment_folds",
    "tests/test_bm25_index.py::test_subset_merge_splits_tombstones",
    "tests/test_bm25_index.py::test_tiered_merge_composes_over_merged_segments",
    "tests/test_bm25_index.py::test_tiered_policy_merges_smallest",
    "tests/test_bm25_index.py::test_tombstoned_id_blocks_readd_until_merge",
    "tests/test_dedup_index.py::test_compact_folds_append_files_and_preserves_checks",
    "tests/test_dedup_index.py::test_streaming_ingest_auto_compacts_and_keeps_detecting",
    "tests/test_dedup_index.py::test_streaming_ingest_dedup_routes_and_admits",
    "tests/test_erasure.py::test_erasure_survives_shard_merge",
    "tests/test_erasure.py::test_model_family_erasure_by_staleness_rebuild",
    "tests/test_erasure.py::test_nb_model_erasure_by_staleness_rebuild",
    "tests/test_erasure.py::test_right_to_erasure_across_artifacts",
    "tests/test_incremental.py::test_streaming_delete_aware_view_refresh",
    "tests/test_incremental.py::test_streaming_view_maintenance_with_restart",
    "tests/test_index_check.py::test_dedup_check_healthy_and_corrupt",
    "tests/test_index_check.py::test_lm_bigram_check_healthy_and_corrupt",
    "tests/test_index_check.py::test_nb_check_healthy_and_corrupt",
    "tests/test_pq_index.py::test_bloom_cap_crossover_merge_guards_stay_sound",
    "tests/test_pq_index.py::test_compact_folds_added_files_and_preserves_answers",
    "tests/test_pq_index.py::test_compact_refuses_pending_ingest_epoch",
    "tests/test_pq_index.py::test_compact_refuses_without_marker_and_crash_leaves_invalid",
    "tests/test_pq_index.py::test_digest_rides_markers_through_lifecycle",
    "tests/test_pq_index.py::test_merge_equals_add_grown_index",
    "tests/test_pq_index.py::test_merge_guards_without_digests_fall_back_exact",
    "tests/test_pq_index.py::test_merge_refuses_pending_src_ingest_and_repeated_merges",
    "tests/test_pq_index.py::test_merge_refuses_resurrecting_removed_vector",
    "tests/test_pq_index.py::test_merge_refuses_unhonored_source_erasure",
    "tests/test_pq_index.py::test_streaming_ingest_exactly_once_and_crash_replay",
    "tests/test_pq_index.py::test_streaming_ingest_refuses_unbuilt_and_compacts",
    "tests/test_properties.py::test_bloom_superset_property",
    "tests/test_properties.py::test_bm25_index_serve_equals_corpus_rescan",
    "tests/test_properties.py::test_hll_merge_equals_oneshot_for_any_sharding",
    "tests/test_properties.py::test_mixture_sample_matches_exact_threshold_math",
    "tests/test_properties.py::test_perplexity_invariant_to_partitioning",
    "tests/test_properties.py::test_salting_never_changes_join_results",
    "tests/test_properties.py::test_setsim_prefix_join_complete_on_random_corpora",
    "tests/test_properties.py::test_snapshot_diff_reports_exactly_the_drift",
    "tests/test_properties.py::test_state_merge_equals_recompute",
    "tests/test_properties.py::test_triangle_join_matches_python_reference",
    "tests/test_properties.py::test_zvalue_matches_brute_interleave_and_is_injective",
    "tests/test_similarity.py::test_ivf_assign_scales_to_4k_cells_256_dims",
    "tests/test_bm25_index.py::test_ingest_gate_disjoint_epoch_reads_no_doclens",
    "tests/test_bm25_index.py::test_ingest_in_batch_duplicates_collapse",
    "tests/test_bm25_index.py::test_add_suspect_probe_reads_only_may_contain_segments",
    "tests/test_bm25_index.py::test_add_residue_disjoint_reads_no_doclens",
    "tests/test_bm25_index.py::test_add_interval_disjoint_reads_no_doclens",
    "tests/test_bm25_index.py::test_build_and_add_refuse_duplicate_or_null_ids",
    "tests/test_bm25_index.py::test_ingest_gate_refuses_schema_mismatch_batch",
    "tests/test_admission.py::test_seed_does_not_swallow_stream_batch_zero",
    "tests/test_bm25_index.py::test_full_merge_digest_is_exact_not_superset",
    "tests/test_properties.py::test_apply_changes_matches_sequential_fold",
    "tests/test_pq_index.py::test_add_encodes_with_frozen_quantizers",
    "tests/test_pq_index.py::test_pq_index_check_healthy_lifecycle",
    "tests/test_pq_index.py::test_merge_interval_disjoint_shards",
    "tests/test_properties.py::test_winnowing_guarantee_property",
    "tests/test_stateful.py::test_sessionize_stream_matches_batch_across_restart",
    "tests/test_bm25_index.py::test_bloom_cap_crossover_keeps_ladder_sound",
    "tests/test_versioned_sink.py::test_purge_guards",
    "tests/test_pq_index.py::test_merge_refuses_overlapping_vec_ids",
    "tests/test_versioned_sink.py::test_ordered_mode_tombstone_blocks_resurrection",
    "tests/test_pq_index.py::test_quantizer_signature_position_sensitive",
    "tests/test_pq_index.py::test_add_folds_digest_before_codes_append",
    "tests/test_table_sink.py::test_compact_leaves_untouched_partitions_alone",
    "tests/test_admission.py::test_budget_admission_compaction_equivalence",
    "tests/test_bm25_index.py::test_add_big_probe_word_rung_reads_no_doclens",
    "tests/test_bm25_index.py::test_ingest_gate_crash_before_marker_converges",
    "tests/test_lm_index.py::test_moore_lewis_served_matches_fused_operator",
    "tests/test_pq_index.py::test_stale_index_detected_after_dataset_regeneration",
    "tests/test_stream_join.py::test_interval_join_left_outer_emits_unmatched",
    "tests/test_pq_index.py::test_pq_index_check_detects_corruptions",
    "tests/test_stateful.py::test_windowed_counts_stream_matches_batch",
    "tests/test_dedup.py::test_lsh_recall_curve_monotone_in_bands",
    "tests/test_lm_index.py::test_trigram_model_staleness_and_rebuild",
    "tests/test_dedup.py::test_connected_components_path_graph",
    "tests/test_table_sink.py::test_merge_keeps_one_file_per_bucket",
    "tests/test_admission.py::test_admission_wired_to_real_stream_with_restart",
    "tests/test_versioned_sink.py::test_purge_then_pre_watermark_replay_cannot_resurrect",
    "tests/test_nb_index.py::test_nb_gate_routes_and_replays",
    "tests/test_admission.py::test_neardup_gate_seed_and_compaction",
    "tests/test_streaming.py::test_stream_apply_and_recovery",
    "tests/test_streaming_dedup.py::test_streaming_dedup_null_content_passes_through",
    "tests/test_lm_index.py::test_new_generation_supersedes_old",
    "tests/test_stateful.py::test_too_late_rows_are_dropped",
    "tests/test_pq_index.py::test_remove_crash_window_leaves_index_invalid",
    "tests/test_bm25_index.py::test_serve_equals_inline",
    "tests/test_bm25_index.py::test_index_check_healthy_lifecycle_all_pass",
    "tests/test_bm25_index.py::test_add_segment_serves_union",
    "tests/test_pq_index.py::test_merge_refuses_quantizer_mismatch_and_incomplete",
    "tests/test_pq_index.py::test_remove_replay_is_noop",
    "tests/test_bm25_index.py::test_add_all_empty_shard_serves_with_schema",
    "tests/test_stateful.py::test_running_totals_across_batches",
    "tests/test_bm25_index.py::test_phrase_serve_across_segments_and_tombstones",
    "tests/test_bm25_index.py::test_staleness_rebuild_on_text_change",
    "tests/test_properties.py::test_blocked_fuzzy_pairs_match_bruteforce_when_uncapped",
    "tests/test_versioned_sink.py::test_ordered_mode_blocks_out_of_order_regression",
    "tests/test_pq_index.py::test_crash_mid_rebuild_leaves_no_marker",
    "tests/test_corpus.py::test_bpe_empty_and_degenerate_corpus",
    "tests/test_cache_validation.py::test_served_query_plans_have_no_validation_scan",
    "tests/test_stateful.py::test_exactly_once_ids_cross_batch",
    "tests/test_corpus.py::test_curation_pipeline_v4_invariants",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in NIGHTLY_NODEIDS:
            item.add_marker(pytest.mark.nightly)

"""Persisted MinHash-LSH dedup index (operators/dedup_index.py): the
ingest-side near-dup check must find stored duplicates without reading
corpus text, admit new docs with the frozen hash family, and detect a
swapped dataset via the fingerprint."""

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.dedup_index import (
    build_dedup_index,
    corpus_fingerprint,
    dedup_check_incremental,
    dedup_index_add,
    dedup_index_is_built,
)

SCHEMA = "doc_id long, text string"

CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "spark structured streaming merges keyed change data into tables"),
    (4, "completely unrelated content about cooking pasta with tomatoes"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture()
def idx(spark, tmp_path):
    path = str(tmp_path / "dedupidx")
    build_dedup_index(spark, _df(spark, CORPUS), path)
    return path


def test_incremental_check_finds_exact_duplicate(spark, idx):
    new = _df(spark, [
        (11, CORPUS[0][1]),                     # identical to doc 0
        (13, "totally novel text that matches nothing in the corpus"),
    ])
    got = dedup_check_incremental(spark, idx, new, threshold_bp=5000).collect()
    hits = {(r["new_id"], r["corpus_id"]): r["est_bp"] for r in got}
    assert hits.get((11, 0)) == 10000           # identical → all sigs match
    assert all(nid != 13 for nid, _ in hits)    # novel doc flags nothing


def test_near_duplicate_scores_between(spark, idx):
    # one word appended → all original shingles survive plus three new
    # ones → a high-but-not-full estimate (deterministic md5 family:
    # 7 of 8 signature components agree → 8750 bp)
    new = _df(spark, [(21, CORPUS[0][1] + " today")])
    got = dedup_check_incremental(spark, idx, new, threshold_bp=2500).collect()
    est = {r["corpus_id"]: r["est_bp"] for r in got if r["new_id"] == 21}
    assert est.get(0) == 8750


def test_add_then_check_finds_added_doc(spark, idx):
    added = _df(spark, [(6, "a brand new corpus document about parquet files")])
    dedup_index_add(spark, idx, added)
    new = _df(spark, [(31, "a brand new corpus document about parquet files")])
    got = dedup_check_incremental(spark, idx, new, threshold_bp=5000).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in got} == {(31, 6)}
    # fingerprint folded the added doc in
    all_docs = _df(spark, CORPUS + [(6, "a brand new corpus document about parquet files")])
    assert dedup_index_is_built(idx, corpus_fingerprint(all_docs))


def test_fingerprint_detects_swapped_corpus(spark, idx):
    other = _df(spark, [(9, "different corpus entirely")])
    assert dedup_index_is_built(idx)
    assert not dedup_index_is_built(idx, corpus_fingerprint(other))


def test_bucket_cap_bounds_candidates(spark, tmp_path):
    """All-identical corpus: stored buckets keep <=cap representatives,
    so one new duplicate yields <=cap candidate pairs, not one per
    stored copy."""
    path = str(tmp_path / "capidx")
    same = "identical boilerplate header repeated across every document"
    corpus = [(i * 2, same) for i in range(50)]          # 50 even ids
    build_dedup_index(spark, _df(spark, corpus), path, max_bucket_size=5)
    new = _df(spark, [(101, same)])
    got = dedup_check_incremental(spark, path, new, threshold_bp=5000).collect()
    assert 1 <= len(got) <= 5
    assert all(r["est_bp"] == 10000 for r in got)


def test_remove_erases_doc_from_index(spark, idx):
    """Takedown path: after removal, an identical new doc no longer
    flags, the fingerprint reflects the remaining corpus, and the hash
    family parameters survive the marker rewrite."""
    import json
    import os

    from kafka_dbsync_spark.operators.dedup_index import dedup_index_remove

    res = dedup_index_remove(spark, idx, [0])
    assert res == {"docs_removed": 1}
    new = _df(spark, [(41, CORPUS[0][1])])      # identical to removed doc 0
    got = dedup_check_incremental(spark, idx, new, threshold_bp=2500).collect()
    assert got == []
    remaining = _df(spark, CORPUS[1:])
    assert dedup_index_is_built(idx, corpus_fingerprint(remaining))
    with open(os.path.join(idx, "_COMPLETE")) as f:
        rec = json.load(f)
    assert rec["num_hashes"] == 8 and rec["rows_per_band"] == 2
    # other docs still findable
    still = _df(spark, [(43, CORPUS[1][1])])
    got2 = dedup_check_incremental(spark, idx, still, threshold_bp=5000).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in got2} == {(43, 2)}

"""Persisted BM25 inverted index (operators/bm25_index.py): the serve
twin must be arithmetic-identical to the inline bm25_topk, prune its
postings read to the query terms' bucket partitions, and follow the
shared generation-publish staleness discipline."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.bm25_index import (
    N_BUCKETS,
    bm25_index_is_current,
    bm25_search_served,
    build_bm25_index,
    term_bucket_py,
)
from kafka_dbsync_spark.operators.corpus import bm25_topk

DOCS = [
    (1, "the hash join builds a hash table on the small side"),
    (2, "sort merge join shuffles both sides then merges sorted runs"),
    (3, "a broadcast hash join avoids the shuffle entirely"),
    (4, "merge sort is stable; hash tables are not ordered"),
    (5, "grace hash join partitions both inputs by hash"),
    (6, ""),
    (7, None),
    (8, "window functions rank rows without a join or a hash"),
    (9, "merge merge merge"),
    (10, "completely unrelated text about regularization and dropout"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


@pytest.fixture()
def idx(spark, docs, tmp_path):
    path = str(tmp_path / "bm25")
    build_bm25_index(spark, docs, path)
    return path


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_serve_equals_inline(spark, docs, idx):
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(docs, terms, k=10)
    )


def test_serve_equals_inline_single_term_and_k(spark, docs, idx):
    assert _rows(bm25_search_served(spark, idx, ["merge"], k=3)) == _rows(
        bm25_topk(docs, ["merge"], k=3)
    )


def test_absent_term_prices_df_zero(spark, docs, idx):
    terms = ["hash", "zzz_never_seen"]
    assert _rows(bm25_search_served(spark, idx, terms, k=5)) == _rows(
        bm25_topk(docs, terms, k=5)
    )


def test_no_match_returns_empty(spark, docs, idx):
    assert bm25_search_served(spark, idx, ["zzz_never_seen"], k=5).count() == 0


def test_empty_query_refused(spark, idx):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_search_served(spark, idx, [], k=5)


def test_postings_read_is_bucket_pruned(spark, docs, idx):
    """The serve-side scan must touch ONLY the query terms' bucket
    partitions — the partition-pruning contract that makes the index an
    index at 100 TB."""
    import json
    import re

    terms = ["hash", "merge"]
    want = {term_bucket_py(t) for t in terms}
    marker = json.load(open(os.path.join(idx, "_COMPLETE")))
    gen_dir = os.path.join(idx, marker["gen"])
    post = spark.read.parquet(f"{gen_dir}/postings").filter(
        F.col("bucket").isin(sorted(want)) & F.col("term").isin(terms)
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        post._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "bucket" in m.group(1), plan[:1500]
    # the layout actually HAS more buckets than the query touches, so
    # the PartitionFilters line is a real reduction, not a no-op
    all_buckets = {
        d for d in os.listdir(f"{gen_dir}/postings") if d.startswith("bucket=")
    }
    assert len(all_buckets) > len(want)
    assert len(want) <= N_BUCKETS


def test_staleness_rebuild_on_text_change(spark, docs, idx):
    assert bm25_index_is_current(docs, idx)
    changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 10, F.lit("hash hash hash hash")).otherwise(
            F.col("text")
        ),
    )
    assert not bm25_index_is_current(changed, idx)
    build_bm25_index(spark, changed, idx)
    assert bm25_index_is_current(changed, idx)
    terms = ["hash", "join"]
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(changed, terms, k=10)
    )


def test_missing_generation_refused(spark, docs, tmp_path, idx):
    import json
    import shutil

    marker_path = os.path.join(idx, "_COMPLETE")
    marker = json.load(open(marker_path))
    shutil.rmtree(os.path.join(idx, marker["gen"]))
    with pytest.raises(ValueError, match="missing segment"):
        bm25_search_served(spark, idx, ["hash"], k=5)
    assert not bm25_index_is_current(docs, idx)


def test_unbuilt_path_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="no complete BM25 index"):
        bm25_search_served(spark, str(tmp_path / "nope"), ["hash"], k=5)


# ---------------------------------------------------------------------------
# segment lifecycle: add / merge (the Lucene model)
# ---------------------------------------------------------------------------

MORE_DOCS = [
    (11, "incremental hash join updates arrive as a new shard"),
    (12, "the merge scheduler compacts small segments"),
    (13, ""),
    (14, "joins everywhere: hash join, merge join, nested loops"),
]


def _segments(path):
    import json

    return json.load(open(os.path.join(path, "_COMPLETE")))["segments"]


def test_add_segment_serves_union(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_add

    shard = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    bm25_index_add(spark, shard, idx)
    assert len(_segments(idx)) == 2
    union = docs.unionByName(shard)
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=12)) == _rows(
        bm25_topk(union, terms, k=12)
    )
    # staleness: the combined marker fingerprint equals the union's
    assert bm25_index_is_current(union, idx)
    assert not bm25_index_is_current(docs, idx)


def test_add_overlapping_ids_refused(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_add

    overlap = spark.createDataFrame(
        [(5, "grace hash join again"), (99, "fresh doc")],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="disjoint"):
        bm25_index_add(spark, overlap, idx)
    assert len(_segments(idx)) == 1  # marker untouched


def test_add_incompatible_id_type_refused(spark, docs, idx):
    """ADVICE r10: an int-doc_id shard added to a bigint-built index
    used to slip past the join-based disjointness probe (silent
    coercion) and write segment parquet the marker schemas could not
    read back — the mismatch must refuse AT THE ADD, before any
    segment dir is written."""
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_add

    narrow = spark.createDataFrame(
        [(21, "int ids from a different upstream")],
        "doc_id int, text string",
    )
    with pytest.raises(ValueError, match="incompatible"):
        bm25_index_add(spark, narrow, idx)
    assert len(_segments(idx)) == 1  # marker untouched
    assert not [
        d for d in os.listdir(idx) if d.startswith("seg")
    ], "refused add must not leave a segment dir"


def test_add_same_shard_twice_refused(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_add

    shard = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    bm25_index_add(spark, shard, idx)
    with pytest.raises(ValueError, match="already a live segment"):
        bm25_index_add(spark, shard, idx)


def test_merge_compacts_to_one_segment(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_index_add,
        bm25_segment_merge,
    )

    shard = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    bm25_index_add(spark, shard, idx)
    old_segs = _segments(idx)
    assert bm25_segment_merge(spark, idx) == 2
    segs = _segments(idx)
    assert len(segs) == 1 and segs[0].startswith("merged")
    # retired segment dirs leave the live namespace but survive one
    # merge cycle as .retired-* trash (ADVICE r10: in-flight pre-merge
    # readers drain before physical deletion)
    for s in old_segs:
        assert not os.path.isdir(os.path.join(idx, s))
        assert os.path.isdir(os.path.join(idx, f".retired-{s}"))
    union = docs.unionByName(shard)
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=12)) == _rows(
        bm25_topk(union, terms, k=12)
    )
    assert bm25_index_is_current(union, idx)
    # merging an already-compact index is a no-op
    assert bm25_segment_merge(spark, idx) == 1
    assert _segments(idx) == segs


# ---------------------------------------------------------------------------
# erasure: tombstone remove, exact stats correction, merge applies
# ---------------------------------------------------------------------------


def test_remove_serves_exact_surviving_corpus(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_remove

    res = bm25_index_remove(spark, idx, [1, 5])
    assert res == {"removed": 2, "already": 0}
    surviving = docs.filter(~F.col("doc_id").isin([1, 5]))
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(surviving, terms, k=10)
    )
    # idempotent re-remove
    assert bm25_index_remove(spark, idx, [1]) == {"removed": 0, "already": 1}
    # empty-text docs are members too (doclens records dl=0)
    assert bm25_index_remove(spark, idx, [6]) == {"removed": 1, "already": 0}


def test_remove_unknown_id_refused(spark, idx):
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_remove

    with pytest.raises(ValueError, match="not present"):
        bm25_index_remove(spark, idx, [12345])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_index_remove(spark, idx, [])


def test_tombstoned_id_blocks_readd_until_merge(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_index_add,
        bm25_index_remove,
        bm25_segment_merge,
    )

    bm25_index_remove(spark, idx, [5])
    replacement = spark.createDataFrame(
        [(5, "a brand new document under a recycled id")],
        "doc_id bigint, text string",
    )
    # resurrection guard: the old postings for id 5 still exist
    with pytest.raises(ValueError, match="disjoint"):
        bm25_index_add(spark, replacement, idx)
    # merge applies the tombstone physically (single segment + removal
    # still merges) ...
    assert bm25_segment_merge(spark, idx) == 1
    meta = __import__("json").load(open(os.path.join(idx, "_COMPLETE")))
    assert meta["removed_ids"] == [] and meta["removed_n"] == 0
    # ... after which the id is genuinely free
    bm25_index_add(spark, replacement, idx)
    union = docs.filter(F.col("doc_id") != 5).unionByName(replacement)
    terms = ["hash", "join", "merge", "document"]
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(union, terms, k=10)
    )


def test_sequential_removes_and_merges_never_share_dirs(spark, docs, idx):
    """Two merges with DIFFERENT tombstone sets must land in different
    immutable dirs — the second must not flip the marker onto the
    first's contents."""
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_index_remove,
        bm25_segment_merge,
    )

    terms = ["hash", "join", "merge"]
    bm25_index_remove(spark, idx, [1])
    bm25_segment_merge(spark, idx)
    bm25_index_remove(spark, idx, [2])
    bm25_segment_merge(spark, idx)
    surviving = docs.filter(~F.col("doc_id").isin([1, 2]))
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(surviving, terms, k=10)
    )


# ---------------------------------------------------------------------------
# positional phrase queries (Lucene PhraseQuery over prox data)
# ---------------------------------------------------------------------------


def test_phrase_serve_equals_inline(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_phrase_search_served,
    )
    from kafka_dbsync_spark.operators.corpus import bm25_phrase_topk

    phrases = [("hash", "join"), ("merge", "sort")]
    assert _rows(bm25_phrase_search_served(spark, idx, phrases, k=10)) == _rows(
        bm25_phrase_topk(docs, phrases, k=10)
    )
    # a doc holding both words NON-adjacently scores 0 and never
    # surfaces: doc 4 has "merge sort" (hit); doc 2 has merge..sorted
    hits = {
        r["doc_id"]
        for r in bm25_phrase_search_served(
            spark, idx, [("merge", "sort")], k=10
        ).collect()
    }
    assert 4 in hits and 2 not in hits


def test_phrase_serve_across_segments_and_tombstones(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_index_add,
        bm25_index_remove,
        bm25_phrase_search_served,
    )
    from kafka_dbsync_spark.operators.corpus import bm25_phrase_topk

    shard = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    bm25_index_add(spark, shard, idx)
    bm25_index_remove(spark, idx, [1])
    surviving = docs.unionByName(shard).filter(F.col("doc_id") != 1)
    phrases = [("hash", "join"), ("merge", "join")]
    assert _rows(
        bm25_phrase_search_served(spark, idx, phrases, k=10)
    ) == _rows(bm25_phrase_topk(surviving, phrases, k=10))


def test_phrase_repeated_adjacent_counts_each(spark):
    """'merge merge merge' holds the phrase (merge, merge) twice —
    positional tf counts every adjacent pair, not just presence."""
    from kafka_dbsync_spark.operators.corpus import bm25_phrase_topk

    docs = spark.createDataFrame(
        [(1, "merge merge merge"), (2, "merge alone"), (3, "")],
        "doc_id bigint, text string",
    )
    out = bm25_phrase_topk(docs, [("merge", "merge")], k=5).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_phrase_guards(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_phrase_search_served,
    )
    from kafka_dbsync_spark.operators.corpus import bm25_phrase_topk

    with pytest.raises(ValueError, match="non-empty"):
        bm25_phrase_topk(docs, [])
    with pytest.raises(ValueError, match="bigram"):
        bm25_phrase_topk(docs, [("a", "b", "c")])
    with pytest.raises(ValueError, match="non-empty"):
        bm25_phrase_search_served(spark, idx, [])
    with pytest.raises(ValueError, match="bigram"):
        bm25_phrase_search_served(spark, idx, [("one",)])


def test_old_format_marker_reports_stale_and_refuses(spark, docs, idx):
    """A pre-positional (format-1 or unversioned) marker must drive a
    REBUILD, never a serve against a layout the reader can't use."""
    import json

    from kafka_dbsync_spark.operators.bm25_index import _live_meta

    marker_path = os.path.join(idx, "_COMPLETE")
    meta = json.load(open(marker_path))
    del meta["format"]
    json.dump(meta, open(marker_path, "w"))
    assert not bm25_index_is_current(docs, idx)
    with pytest.raises(ValueError, match="layout format"):
        _live_meta(idx)
    build_bm25_index(spark, docs, idx)
    assert bm25_index_is_current(docs, idx)


def test_multi_query_serve_equals_per_query(spark, docs, idx):
    """Batched serving answers every query bit-identically to the
    single-query serve — one pruned read, per-query df literals; a doc
    matching only ANOTHER query's terms must not leak in."""
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_search_multi_served,
    )

    queries = {
        "a": ["hash", "join", "merge"],
        "b": ["regularization"],
        "c": ["window", "zzz_absent"],
    }
    multi = bm25_search_multi_served(spark, idx, queries, k=5)
    by_q = {}
    for r in multi.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score_r"])
        )
    for qid, terms in queries.items():
        single = [
            (r["rank"], r["doc_id"], r["score_r"])
            for r in bm25_search_served(spark, idx, terms, k=5).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), qid
    with pytest.raises(ValueError, match="non-empty"):
        bm25_search_multi_served(spark, idx, {})
    with pytest.raises(ValueError, match="no terms"):
        bm25_search_multi_served(spark, idx, {"x": []})


def test_marker_without_schema_keys_still_serves(spark, docs, idx):
    """Markers predating schema recording fall back to parquet
    inference — valid for any non-empty segment (the schema keys are
    only LOAD-BEARING for zero-posting segments)."""
    import json

    marker_path = os.path.join(idx, "_COMPLETE")
    meta = json.load(open(marker_path))
    for k in ("postings_schema", "dfs_schema", "doclens_schema"):
        meta.pop(k, None)
    json.dump(meta, open(marker_path, "w"))
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(docs, terms, k=10)
    )


def test_add_all_empty_shard_serves_with_schema(spark, docs, idx):
    """A shard whose every doc is token-empty writes ZERO posting rows;
    the marker-recorded schemas make its fileless tables readable and
    the union serve must still price N/Σdl with the empty docs counted
    (they change avgdl's denominator... by adding dl=0 rows to N)."""
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_add

    shard = spark.createDataFrame(
        [(50, ""), (51, None), (52, "...!!!")],
        "doc_id bigint, text string",
    )
    bm25_index_add(spark, shard, idx)
    union = docs.unionByName(shard)
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(union, terms, k=10)
    )
    # the empty docs are members: removing one is valid and corrects N
    from kafka_dbsync_spark.operators.bm25_index import bm25_index_remove

    assert bm25_index_remove(spark, idx, [51]) == {"removed": 1, "already": 0}
    surviving = union.filter(F.col("doc_id") != 51)
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(surviving, terms, k=10)
    )


# ---------------------------------------------------------------------------
# streaming ingest gate (VERDICT r10 #4): exactly-once segments-per-epoch
# ---------------------------------------------------------------------------

MORE_DOCS_2 = [
    (30, "bloom filters trade space for false positives"),
    (31, "a bitmap index answers membership in one probe"),
]


def test_ingest_gate_replay_and_keep_first(spark, docs, idx):
    """Epoch replay no-ops; an epoch re-carrying already-indexed ids
    admits only the fresh docs; the served answer equals the one-shot
    inline BM25 over the union."""
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_ingest_foreach_batch,
    )

    b1 = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    # epoch 2 = fresh docs + a redelivered slice of epoch 1 + a doc the
    # BUILD already indexed
    b2 = spark.createDataFrame(
        MORE_DOCS_2 + [MORE_DOCS[0], DOCS[0]], "doc_id bigint, text string"
    )
    fn = bm25_ingest_foreach_batch(idx)
    fn(b1, 1)
    fn(b2, 2)
    fn(b1, 1)  # committed epoch: must be a no-op
    assert len(_segments(idx)) == 3
    union = docs.unionByName(b1).unionByName(
        spark.createDataFrame(MORE_DOCS_2, "doc_id bigint, text string")
    )
    terms = ["hash", "join", "merge", "bloom"]
    assert _rows(bm25_search_served(spark, idx, terms, k=20)) == _rows(
        bm25_topk(union, terms, k=20)
    )


def test_ingest_gate_all_duplicate_batch_commits_no_segment(spark, docs, idx):
    from kafka_dbsync_spark.operators.bm25_index import (
        _ingest_committed,
        bm25_ingest_foreach_batch,
    )

    fn = bm25_ingest_foreach_batch(idx)
    fn(docs, 5)  # every id already indexed by the build
    assert _ingest_committed(idx, 5)
    assert len(_segments(idx)) == 1
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=10)) == _rows(
        bm25_topk(docs, terms, k=10)
    )


def test_ingest_gate_crash_before_marker_converges(spark, docs, idx, monkeypatch):
    """Crash after the segment rename but before the marker flip: the
    replay finds the epoch dir, skips the write, and flips the marker —
    one copy, exactly."""
    import kafka_dbsync_spark.operators.bm25_index as m

    b1 = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    fn = m.bm25_ingest_foreach_batch(idx)
    real = m._combine_fp

    def boom(a, b):
        raise RuntimeError("simulated crash pre-marker")

    monkeypatch.setattr(m, "_combine_fp", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        fn(b1, 1)
    # segment dir exists, marker does not list it, epoch uncommitted
    assert os.path.isdir(os.path.join(idx, "eseg1_v2"))
    assert len(_segments(idx)) == 1
    assert not m._ingest_committed(idx, 1)
    monkeypatch.setattr(m, "_combine_fp", real)
    fn(b1, 1)  # replay converges
    assert len(_segments(idx)) == 2 and m._ingest_committed(idx, 1)
    union = docs.unionByName(b1)
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=12)) == _rows(
        bm25_topk(union, terms, k=12)
    )


def test_ingest_gate_crash_before_commit_no_ops(spark, docs, idx):
    """Crash after the marker flip but before the epoch commit: the
    replay sees the segment live in the marker and only re-commits —
    never a second fold into the stats."""
    import json

    import kafka_dbsync_spark.operators.bm25_index as m

    b1 = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    fn = m.bm25_ingest_foreach_batch(idx)
    fn(b1, 1)
    with open(os.path.join(idx, "_COMPLETE")) as f:
        before = json.load(f)
    os.remove(os.path.join(idx, "ingest", "e1", "_SUCCESS"))
    fn(b1, 1)  # replay in the marker-flipped window
    with open(os.path.join(idx, "_COMPLETE")) as f:
        after = json.load(f)
    assert before == after
    assert m._ingest_committed(idx, 1)


def test_ingest_gate_tombstone_not_resurrected_until_merge(spark, docs, idx):
    """A taken-down doc re-arriving through the gate stays gone (its
    doclens row tombstone-filters it) until a merge physically erases
    the old postings — after which re-arrival re-admits it. The
    add-path refusal and the gate's keep-first admission enforce the
    same invariant."""
    import kafka_dbsync_spark.operators.bm25_index as m

    m.bm25_index_remove(spark, idx, [1])
    returning = docs.filter(F.col("doc_id") == 1)
    fn = m.bm25_ingest_foreach_batch(idx)
    fn(returning, 1)
    assert len(_segments(idx)) == 1  # filtered: no new segment
    got = {
        r["doc_id"]
        for r in bm25_search_served(spark, idx, ["hash"], k=10).collect()
    }
    assert 1 not in got
    m.bm25_segment_merge(spark, idx)  # tombstones applied physically
    fn(returning, 2)  # now genuinely fresh again
    assert len(_segments(idx)) == 2
    got = {
        r["doc_id"]
        for r in bm25_search_served(spark, idx, ["hash"], k=10).collect()
    }
    assert 1 in got
    # and the served answer equals the one-shot over the final corpus
    assert _rows(bm25_search_served(spark, idx, ["hash", "join"], k=10)) == _rows(
        bm25_topk(docs, ["hash", "join"], k=10)
    )


# ---------------------------------------------------------------------------
# tiered merges: subset compaction + the TieredMergePolicy shape
# ---------------------------------------------------------------------------


def _gate_epochs(spark, idx, batches):
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_ingest_foreach_batch,
    )

    fn = bm25_ingest_foreach_batch(idx)
    for i, rows in enumerate(batches, start=1):
        fn(spark.createDataFrame(rows, "doc_id bigint, text string"), i)


def test_subset_merge_keeps_other_segments_live(spark, docs, idx):
    import json

    import kafka_dbsync_spark.operators.bm25_index as m

    _gate_epochs(spark, idx, [MORE_DOCS, MORE_DOCS_2])
    segs = _segments(idx)
    assert len(segs) == 3
    assert m.bm25_segment_merge(spark, idx, segments=segs[1:]) == 2
    after = _segments(idx)
    assert len(after) == 2 and after[0] == segs[0]
    assert after[1].startswith("merged") and "_s" in after[1]
    union = docs.unionByName(
        spark.createDataFrame(MORE_DOCS + MORE_DOCS_2, "doc_id bigint, text string")
    )
    terms = ["hash", "join", "merge", "bloom"]
    assert _rows(bm25_search_served(spark, idx, terms, k=20)) == _rows(
        bm25_topk(union, terms, k=20)
    )
    # segstats stay exact through the composition
    with open(os.path.join(idx, "_COMPLETE")) as f:
        rec = json.load(f)
    assert set(rec["segstats"]) == set(after)
    assert sum(v[0] for v in rec["segstats"].values()) == rec["n"]
    assert sum(v[1] for v in rec["segstats"].values()) == rec["sumdl"]


def test_subset_merge_refusals(spark, docs, idx):
    import kafka_dbsync_spark.operators.bm25_index as m

    _gate_epochs(spark, idx, [MORE_DOCS])
    with pytest.raises(ValueError, match="not live"):
        m.bm25_segment_merge(spark, idx, segments=["nope_v2"])
    with pytest.raises(ValueError, match="at least 2"):
        m.bm25_segment_merge(spark, idx, segments=[_segments(idx)[1]])


def test_subset_merge_splits_tombstones(spark, docs, idx):
    """A tombstone inside the merged subset is applied physically and
    leaves the marker; a tombstone in an untouched segment stays
    recorded and keeps being served exactly — the per-segment .del
    lifecycle."""
    import json

    import kafka_dbsync_spark.operators.bm25_index as m

    _gate_epochs(spark, idx, [MORE_DOCS, MORE_DOCS_2])
    # doc 1 lives in the BUILD segment (stays); doc 12 in epoch-1 and
    # doc 30 in epoch-2 (both merged)
    m.bm25_index_remove(spark, idx, [1, 12, 30])
    segs = _segments(idx)
    m.bm25_segment_merge(spark, idx, segments=segs[1:])
    with open(os.path.join(idx, "_COMPLETE")) as f:
        rec = json.load(f)
    assert rec["removed_ids"] == [1]          # in-subset tombstones gone
    assert rec["removed_n"] == 1
    survivors = (
        docs.unionByName(
            spark.createDataFrame(
                MORE_DOCS + MORE_DOCS_2, "doc_id bigint, text string"
            )
        )
        .filter(~F.col("doc_id").isin([1, 12, 30]))
    )
    terms = ["hash", "join", "merge", "bloom"]
    assert _rows(bm25_search_served(spark, idx, terms, k=20)) == _rows(
        bm25_topk(survivors, terms, k=20)
    )
    # a later FULL merge clears the remaining tombstone too
    m.bm25_segment_merge(spark, idx)
    with open(os.path.join(idx, "_COMPLETE")) as f:
        rec = json.load(f)
    assert rec["removed_ids"] == [] and len(rec["segments"]) == 1
    assert _rows(bm25_search_served(spark, idx, terms, k=20)) == _rows(
        bm25_topk(survivors, terms, k=20)
    )


def test_tiered_policy_merges_smallest(spark, docs, idx):
    import json

    import kafka_dbsync_spark.operators.bm25_index as m

    # build (10 docs) + three small epochs: 2, 1, 1 docs
    _gate_epochs(
        spark,
        idx,
        [
            MORE_DOCS[:2],
            [(41, "tiny segment one about hash tables")],
            [(42, "tiny segment two about merge policies")],
        ],
    )
    assert len(_segments(idx)) == 4
    # within budget: no-op
    assert m.bm25_merge_tiered(spark, idx, max_segments=4) == 0
    # over budget by 2: the THREE smallest merge (epochs; the 10-doc
    # build segment must not be rewritten)
    build_seg = _segments(idx)[0]
    assert m.bm25_merge_tiered(spark, idx, max_segments=2) == 3
    after = _segments(idx)
    assert len(after) == 2 and build_seg in after
    with open(os.path.join(idx, "_COMPLETE")) as f:
        rec = json.load(f)
    assert rec["segstats"][build_seg][0] == 10
    union = docs.unionByName(
        spark.createDataFrame(
            MORE_DOCS[:2]
            + [
                (41, "tiny segment one about hash tables"),
                (42, "tiny segment two about merge policies"),
            ],
            "doc_id bigint, text string",
        )
    )
    terms = ["hash", "join", "merge", "policies"]
    assert _rows(bm25_search_served(spark, idx, terms, k=20)) == _rows(
        bm25_topk(union, terms, k=20)
    )
    # max_segments=1 degenerates to the full optimize
    assert m.bm25_merge_tiered(spark, idx, max_segments=1) == 2
    assert len(_segments(idx)) == 1


def test_ingest_gate_refuses_schema_mismatch_batch(spark, docs, idx):
    """A stream wired with the wrong id type is a configuration error:
    the gate refuses the batch (the add-path _check_add_schemas guard)
    BEFORE any segment write, and the epoch stays uncommitted so the
    fix replays it."""
    import kafka_dbsync_spark.operators.bm25_index as m

    narrow = spark.createDataFrame(
        [(900, "int ids from a misconfigured stream")],
        "doc_id int, text string",
    )
    fn = m.bm25_ingest_foreach_batch(idx)
    with pytest.raises(ValueError, match="incompatible"):
        fn(narrow, 1)
    assert not m._ingest_committed(idx, 1)
    assert len(_segments(idx)) == 1
    fixed = narrow.withColumn("doc_id", F.col("doc_id").cast("bigint"))
    fn(fixed, 1)  # the corrected stream replays the SAME epoch
    assert m._ingest_committed(idx, 1) and len(_segments(idx)) == 2


def test_tiered_merge_composes_over_merged_segments(spark, docs, idx):
    """A second-level tiered merge that absorbs a previously-merged
    segment stays exact — merged segments are ordinary segments to the
    policy (Lucene's invariant)."""
    import kafka_dbsync_spark.operators.bm25_index as m

    _gate_epochs(
        spark,
        idx,
        [
            [(51, "alpha hash segment")],
            [(52, "beta join segment")],
            [(53, "gamma merge segment")],
            [(54, "delta sort segment")],
        ],
    )
    assert len(_segments(idx)) == 5
    assert m.bm25_merge_tiered(spark, idx, max_segments=3) == 3
    assert m.bm25_merge_tiered(spark, idx, max_segments=2) == 2
    segs = _segments(idx)
    assert len(segs) == 2
    union = docs.unionByName(
        spark.createDataFrame(
            [
                (51, "alpha hash segment"),
                (52, "beta join segment"),
                (53, "gamma merge segment"),
                (54, "delta sort segment"),
            ],
            "doc_id bigint, text string",
        )
    )
    terms = ["hash", "join", "merge"]
    assert _rows(bm25_search_served(spark, idx, terms, k=20)) == _rows(
        bm25_topk(union, terms, k=20)
    )


# ---------------------------------------------------------------------------
# id-digest disjointness ladder (VERDICT r11 #1): the metadata rungs
# must prove add/ingest disjointness with ZERO doclens IO
# ---------------------------------------------------------------------------


def _forbid_reads(monkeypatch, tables=("doclens", "postings", "dfs")):
    import kafka_dbsync_spark.operators.bm25_index as m

    real = m._read_table

    def guarded(spark, meta, path, seg, table):
        if table in tables:
            raise AssertionError(
                f"metadata rung touched {seg}/{table} — the ladder must "
                "prove disjointness without segment IO"
            )
        return real(spark, meta, path, seg, table)

    monkeypatch.setattr(m, "_read_table", guarded)
    return real


def test_add_interval_disjoint_reads_no_doclens(spark, docs, idx, monkeypatch):
    """A shard whose id interval is disjoint from every live segment's
    (the range-split 100 TB sharding shape) must be admitted by the
    marker digests alone — _read_table is forbidden for the whole add."""
    import kafka_dbsync_spark.operators.bm25_index as m

    shard = spark.createDataFrame(
        [(100, "vectorized scans batch columns"), (101, "codegen fuses")],
        "doc_id bigint, text string",
    )
    _forbid_reads(monkeypatch)
    m.bm25_index_add(spark, shard, idx)
    monkeypatch.undo()
    assert len(_segments(idx)) == 2
    union = docs.unionByName(shard)
    terms = ["hash", "scans"]
    assert _rows(bm25_search_served(spark, idx, terms, k=12)) == _rows(
        bm25_topk(union, terms, k=12)
    )


def test_add_residue_disjoint_reads_no_doclens(spark, tmp_path, monkeypatch):
    """Parity-split corpora (even/odd ids, intervals fully interleaved)
    are proven disjoint by the residues-mod-64 mask — zero IO."""
    import kafka_dbsync_spark.operators.bm25_index as m

    evens = spark.createDataFrame(
        [(i, f"even doc {i} about hash joins") for i in (2, 4, 6, 8, 10)],
        "doc_id bigint, text string",
    )
    odds = spark.createDataFrame(
        [(i, f"odd doc {i} about merge sorts") for i in (3, 5, 7, 9)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "parity")
    build_bm25_index(spark, evens, path)
    _forbid_reads(monkeypatch)
    m.bm25_index_add(spark, odds, path)
    monkeypatch.undo()
    union = evens.unionByName(odds)
    assert _rows(bm25_search_served(spark, path, ["hash", "merge"], k=10)) == _rows(
        bm25_topk(union, ["hash", "merge"], k=10)
    )


def test_ingest_gate_disjoint_epoch_reads_no_doclens(
    spark, docs, idx, monkeypatch
):
    """The streaming gate's keep-first admission pays ONE batch-sized
    digest job instead of an index-sized doclens union per epoch when
    the metadata rungs prove the batch fresh (VERDICT r11 #1's exact
    100 TB complaint)."""
    import kafka_dbsync_spark.operators.bm25_index as m

    b = spark.createDataFrame(
        [(200, "epoch batch about bloom filters")],
        "doc_id bigint, text string",
    )
    fn = m.bm25_ingest_foreach_batch(idx)
    _forbid_reads(monkeypatch)
    fn(b, 1)
    monkeypatch.undo()
    assert m._ingest_committed(idx, 1) and len(_segments(idx)) == 2
    union = docs.unionByName(b)
    assert _rows(bm25_search_served(spark, idx, ["bloom", "hash"], k=12)) == _rows(
        bm25_topk(union, ["bloom", "hash"], k=12)
    )


def test_add_suspect_probe_reads_only_may_contain_segments(
    spark, docs, idx, monkeypatch
):
    """A genuine clash survives the ladder as a suspect, and the exact
    probe reads ONLY the segment whose digest may contain it — the
    build segment (ids 1-10) must stay cold for a suspect id 12."""
    import kafka_dbsync_spark.operators.bm25_index as m

    shard = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    m.bm25_index_add(spark, shard, idx)
    seg_a = _segments(idx)[1]
    reads: list[tuple[str, str]] = []
    real = m._read_table

    def counting(spark_, meta, path, seg, table):
        reads.append((seg, table))
        return real(spark_, meta, path, seg, table)

    monkeypatch.setattr(m, "_read_table", counting)
    clash = spark.createDataFrame(
        [(12, "redelivered doc"), (300, "fresh doc")],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="disjoint"):
        m.bm25_index_add(spark, clash, idx)
    doclens_reads = [s for s, t in reads if t == "doclens"]
    assert doclens_reads == [seg_a], (
        f"suspect probe read {doclens_reads}, expected only {seg_a}"
    )


def test_ingest_in_batch_duplicates_collapse(spark, docs, idx):
    """ADVICE r11: duplicate doc_ids INSIDE one micro-batch must
    collapse to one deterministic row (min text) — never duplicate
    doclens rows or double-counted n/Σdl/df."""
    import json

    import kafka_dbsync_spark.operators.bm25_index as m

    b = spark.createDataFrame(
        [
            (60, "bbb duplicate arrives second"),
            (60, "aaa duplicate arrives first"),
            (61, "unique doc about quicksort"),
        ],
        "doc_id bigint, text string",
    )
    fn = m.bm25_ingest_foreach_batch(idx)
    fn(b, 1)
    with open(os.path.join(idx, "_COMPLETE")) as f:
        rec = json.load(f)
    assert rec["n"] == len(DOCS) + 2
    assert sum(v[0] for v in rec["segstats"].values()) == rec["n"]
    seg = _segments(idx)[1]
    lens = spark.read.parquet(os.path.join(idx, seg, "doclens"))
    assert sorted(r["doc_id"] for r in lens.collect()) == [60, 61]
    # deterministic keep-first: the min-text twin won
    got = {r["doc_id"] for r in bm25_search_served(spark, idx, ["aaa"]).collect()}
    assert got == {60}
    assert not bm25_search_served(spark, idx, ["bbb"]).collect()
    # served answer equals the one-shot over the deduped union
    union = docs.unionByName(
        spark.createDataFrame(
            [(60, "aaa duplicate arrives first"), (61, "unique doc about quicksort")],
            "doc_id bigint, text string",
        )
    )
    terms = ["hash", "aaa", "quicksort"]
    assert _rows(bm25_search_served(spark, idx, terms, k=15)) == _rows(
        bm25_topk(union, terms, k=15)
    )


def test_build_and_add_refuse_duplicate_or_null_ids(spark, docs, idx, tmp_path):
    """The refusal-shaped twin of the gate's in-batch dedup (ADVICE
    r11): duplicate ids INSIDE one corpus/shard would double-count
    n/Σdl/df silently; null ids are unaddressable by membership
    probes and takedowns. Both refuse BEFORE anything lands."""
    import kafka_dbsync_spark.operators.bm25_index as m

    dup = spark.createDataFrame(
        [(1, "one copy"), (1, "another copy"), (2, "fine")],
        "doc_id bigint, text string",
    )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        build_bm25_index(spark, dup, str(tmp_path / "dup"))
    withnull = spark.createDataFrame(
        [(None, "ghost doc"), (500, "fine")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="NULL doc_id"):
        build_bm25_index(spark, withnull, str(tmp_path / "null"))
    dup_shard = spark.createDataFrame(
        [(600, "copy a"), (600, "copy b")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="duplicate doc_id"):
        m.bm25_index_add(spark, dup_shard, idx)
    assert len(_segments(idx)) == 1  # marker untouched
    with pytest.raises(ValueError, match="NULL doc_id"):
        m.bm25_index_add(spark, withnull, idx)
    assert len(_segments(idx)) == 1


def test_subset_merge_repoints_gen_when_build_segment_folds(spark, docs, idx):
    """ADVICE r11: a tiered merge that folds the original build segment
    must repoint the marker's `gen` at a surviving dir — otherwise the
    NEXT merge's trash reclaim deletes the dir `gen` names and the
    staleness check reports the index permanently stale."""
    import json

    import kafka_dbsync_spark.operators.bm25_index as m

    _gate_epochs(spark, idx, [MORE_DOCS, MORE_DOCS_2])
    segs = _segments(idx)  # [build gen, eseg1, eseg2]
    m.bm25_segment_merge(spark, idx, segments=segs[:2])
    with open(os.path.join(idx, "_COMPLETE")) as f:
        rec = json.load(f)
    assert rec["gen"] in rec["segments"], (
        f"gen {rec['gen']!r} must name a live segment, got {rec['segments']}"
    )
    # a SECOND merge not touching gen reclaims the first merge's trash;
    # the index must still validate as current against the union corpus
    fn = m.bm25_ingest_foreach_batch(idx)
    fn(
        spark.createDataFrame(
            [(70, "late epoch about bitmap scans")], "doc_id bigint, text string"
        ),
        7,
    )
    live = _segments(idx)
    others = [s for s in live if s != rec["gen"]]
    m.bm25_segment_merge(spark, idx, segments=others)
    assert not [d for d in os.listdir(idx) if d.startswith(".retired-" + segs[0])]
    union = docs.unionByName(
        spark.createDataFrame(
            MORE_DOCS + MORE_DOCS_2 + [(70, "late epoch about bitmap scans")],
            "doc_id bigint, text string",
        )
    )
    assert bm25_index_is_current(union, idx)


def test_segment_sizes_backfills_legacy_marker(spark, docs, idx, monkeypatch):
    """VERDICT r11 #5: a legacy marker without segstats pays the
    doclens scan ONCE — the tiered policy's size pass writes the stats
    (and the segment digests, computed in the same job) back into the
    marker, so the second policy call and every later add run
    metadata-only."""
    import json

    import kafka_dbsync_spark.operators.bm25_index as m

    _gate_epochs(spark, idx, [MORE_DOCS, MORE_DOCS_2])
    mk = os.path.join(idx, "_COMPLETE")
    with open(mk) as f:
        rec = json.load(f)
    rec.pop("segstats", None)
    rec.pop("segdigests", None)
    with open(mk, "w") as f:
        json.dump(rec, f)
    meta = m._live_meta(idx)
    sizes = m._segment_sizes(spark, meta, idx)
    assert sizes == {
        _segments(idx)[0]: len(DOCS),
        _segments(idx)[1]: len(MORE_DOCS),
        _segments(idx)[2]: len(MORE_DOCS_2),
    }
    with open(mk) as f:
        healed = json.load(f)
    assert set(healed["segstats"]) == set(healed["segments"])
    assert set(healed["segdigests"]) == set(healed["segments"])
    assert sum(v[0] for v in healed["segstats"].values()) == healed["n"]
    # second pass: pure metadata — every segment read is forbidden
    _forbid_reads(monkeypatch)
    meta2 = m._live_meta(idx)
    assert m._segment_sizes(spark, meta2, idx) == sizes
    # and the healed digests carry the zero-IO add rungs too
    m.bm25_index_add(
        spark,
        spark.createDataFrame(
            [(400, "post-heal shard about radix sort")],
            "doc_id bigint, text string",
        ),
        idx,
    )
    monkeypatch.undo()
    assert len(_segments(idx)) == 4
    # VERDICT r11 #5's literal criterion: a SECOND bm25_merge_tiered
    # call on the healed marker reads no parquet at POLICY time — the
    # only segment tables the call may touch are the merge rewrite's
    # own subset (the picked smallest segments), never a policy-phase
    # doclens count of every live segment
    reads: list[tuple[str, str]] = []
    real = m._read_table

    def counting(spark_, meta_, path_, seg_, table_):
        reads.append((seg_, table_))
        return real(spark_, meta_, path_, seg_, table_)

    monkeypatch.setattr(m, "_read_table", counting)
    live_before = _segments(idx)
    big = live_before[0]  # the 10-doc build segment stays out
    assert m.bm25_merge_tiered(spark, idx, max_segments=2) == 3
    monkeypatch.undo()
    touched = {s for s, _t in reads}
    assert big not in touched, (
        f"tiered policy touched the big segment's tables: {reads}"
    )
    assert touched <= set(live_before[1:]), reads


def test_full_merge_digest_is_exact_not_superset(spark, docs, idx, monkeypatch):
    """A full merge recomputes the merged segment's digest from the
    SURVIVING doclens — so a previously tombstoned-and-merged-away id
    re-adds through the zero-IO rungs (the digest provably no longer
    contains it), never through a stale superset 'maybe'."""
    import kafka_dbsync_spark.operators.bm25_index as m

    m.bm25_index_remove(spark, idx, [1])
    m.bm25_segment_merge(spark, idx)  # physically erases doc 1
    returning = spark.createDataFrame(
        [(1, "document one returns after erasure")],
        "doc_id bigint, text string",
    )
    _forbid_reads(monkeypatch)
    m.bm25_index_add(spark, returning, idx)
    monkeypatch.undo()
    union = docs.filter(F.col("doc_id") != 1).unionByName(returning)
    terms = ["hash", "join", "returns"]
    assert _rows(bm25_search_served(spark, idx, terms, k=12)) == _rows(
        bm25_topk(union, terms, k=12)
    )


def test_bloom_cap_crossover_keeps_ladder_sound(spark, tmp_path, monkeypatch):
    """r12 bloom cap: above BLOOM_MAX_IDS segments carry NO bloom (the
    fixed-m bitmap would saturate) — pinned here by forcing the cap to
    0 so EVERY digest is bloom-less, the true-scale shape. The residue
    rung must still prove parity-split adds with zero segment IO, and
    a genuine id clash must still refuse through the exact fallback
    (never a false merge)."""
    import json

    import kafka_dbsync_spark.operators.bm25_index as m
    import kafka_dbsync_spark.operators.id_digest as dig

    monkeypatch.setattr(dig, "BLOOM_MAX_IDS", 0)
    evens = spark.createDataFrame(
        [(i, f"even doc {i} about hash joins") for i in (2, 4, 6, 8, 10)],
        "doc_id bigint, text string",
    )
    odds = spark.createDataFrame(
        [(i, f"odd doc {i} about merge sorts") for i in (3, 5, 7, 9)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "capless")
    build_bm25_index(spark, evens, path)
    with open(os.path.join(path, "_COMPLETE")) as f:
        rec = json.load(f)
    segdig = next(iter(rec["segdigests"].values()))
    assert "bloom" not in segdig and segdig.get("res64") is not None
    # parity split proves at the residue rung — zero IO, no bloom needed
    _forbid_reads(monkeypatch, tables=("doclens",))
    m.bm25_index_add(spark, odds, path)
    monkeypatch.undo()
    monkeypatch.setattr(dig, "BLOOM_MAX_IDS", 0)
    # overlap without blooms: interval+residue both collide -> ladder
    # abstains (None) -> the exact doclens fallback still REFUSES
    clash = spark.createDataFrame(
        [(4, "redelivered even doc")], "doc_id bigint, text string"
    )
    with pytest.raises(ValueError, match="disjoint"):
        m.bm25_index_add(spark, clash, path)
    union = evens.unionByName(odds)
    assert _rows(bm25_search_served(spark, path, ["hash", "merge"], k=10)) == _rows(
        bm25_topk(union, ["hash", "merge"], k=10)
    )


def _fsck(spark, path, full=True):
    import kafka_dbsync_spark.operators.bm25_index as m

    return {
        (r["check"], r["segment"]): (r["status"], r["detail"])
        for r in m.bm25_index_check(spark, path, full=full).collect()
    }


def test_index_check_healthy_lifecycle_all_pass(spark, docs, idx):
    """CheckIndex over a full lifecycle (build + add + tombstone +
    subset state): a healthy index reports no FAIL at either level,
    and the metadata level runs with zero segment IO."""
    import kafka_dbsync_spark.operators.bm25_index as m

    shard = spark.createDataFrame(MORE_DOCS, "doc_id bigint, text string")
    m.bm25_index_add(spark, shard, idx)
    m.bm25_index_remove(spark, idx, [4])
    rep = _fsck(spark, idx)
    assert not [k for k, v in rep.items() if v[0] == "FAIL"], rep
    assert rep[("ids_unique_across_segments", "")][0] == "PASS"
    assert rep[("tombstones_physically_present", "")][0] == "PASS"
    # metadata level: zero data IO, pinned the module's usual way
    reads: list = []
    real = m._read_table
    try:
        m._read_table = lambda *a: (_ for _ in ()).throw(
            AssertionError("metadata-level fsck read segment data")
        )
        meta_rep = _fsck(spark, idx, full=False)
    finally:
        m._read_table = real
    assert not [k for k, v in meta_rep.items() if v[0] == "FAIL"]


def test_index_check_detects_corruptions(spark, docs, idx, tmp_path):
    """Each corruption class an operator can hit on real storage is
    DETECTED: tampered segstats (marker/data split-brain), a digest
    that stopped being a superset of its ids, an orphan generation
    dir, and a tombstone for an id that never existed."""
    import json
    import shutil

    import kafka_dbsync_spark.operators.bm25_index as m

    mk = os.path.join(idx, "_COMPLETE")
    with open(mk) as f:
        meta = json.load(f)
    seg = meta["segments"][0]

    # orphan dir: an immutable gen the marker does not reference
    shutil.copytree(os.path.join(idx, seg), os.path.join(idx, "gen-orphan_v2"))
    rep = _fsck(spark, idx, full=False)
    assert rep[("orphan_dir", "gen-orphan_v2")][0] == "WARN"

    # split-brain: marker segstats disagree with the parquet
    bad = dict(meta)
    bad["segstats"] = {seg: [meta["segstats"][seg][0] + 1, meta["segstats"][seg][1]]}
    bad["n"] = meta["n"] + 1
    with open(mk, "w") as f:
        json.dump(bad, f)
    rep = _fsck(spark, idx)
    assert rep[("doclens_match_segstats", seg)][0] == "FAIL"

    # digest no longer a superset: narrow the residue mask to one bit
    bad = dict(meta)
    bad["segdigests"] = {
        seg: {**meta["segdigests"][seg], "res64": 1, "min": 0, "max": 10**9}
    }
    with open(mk, "w") as f:
        json.dump(bad, f)
    rep = _fsck(spark, idx)
    assert rep[("digest_superset_sound", seg)][0] == "FAIL"

    # tombstone for an id that never existed in any segment
    bad = dict(meta)
    bad["removed_ids"] = [999999]
    bad["removed_n"] = 1
    with open(mk, "w") as f:
        json.dump(bad, f)
    rep = _fsck(spark, idx)
    assert rep[("tombstones_physically_present", "")][0] == "FAIL"

    # missing segment dir: FAIL at the metadata level
    with open(mk, "w") as f:
        json.dump(meta, f)
    shutil.rmtree(os.path.join(idx, "gen-orphan_v2"))
    shutil.move(os.path.join(idx, seg), str(tmp_path / "stolen"))
    rep = _fsck(spark, idx, full=False)
    assert rep[("segment_dir_exists", seg)][0] == "FAIL"


def test_add_big_probe_word_rung_reads_no_doclens(
    spark, tmp_path, monkeypatch
):
    """r13: a probe too big to collect (PROBE_COLLECT_CAP forced to 0)
    falls to the per-segment Spark ladder. Base = multiples of 3 (39
    values mod 64 on each side guarantees >= 14 shared residues, and
    the intervals interleave), so interval and residue rungs are
    saturated by construction — and the shard digest carries NO bloom
    at probe time (the bloom attaches from the STAGED doclens later,
    inside write_stage), so the SAME-m AND rung cannot run either: the
    cross-m word rung against the base segment's bloom at its native m
    must prove disjointness scanning ONLY the shard."""
    import kafka_dbsync_spark.operators.bm25_index as m
    import kafka_dbsync_spark.operators.id_digest as dig

    base = spark.createDataFrame(
        [(3 * i, f"doc about hash joins {i}") for i in range(1, 40)],
        "doc_id bigint, text string",
    )
    shard = spark.createDataFrame(
        [(3 * i + 1, f"shard about merge sorts {i}") for i in range(1, 30)],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "wordrung")
    build_bm25_index(spark, base, path)
    monkeypatch.setattr(dig, "PROBE_COLLECT_CAP", 0)
    _forbid_reads(monkeypatch)
    m.bm25_index_add(spark, shard, path)
    monkeypatch.undo()
    union = base.unionByName(shard)
    assert _rows(
        bm25_search_served(spark, path, ["hash", "merge"], k=10)
    ) == _rows(bm25_topk(union, ["hash", "merge"], k=10))

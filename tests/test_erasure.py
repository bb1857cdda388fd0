"""Right-to-erasure END TO END: one subject's id must vanish from every
persisted artifact that remembers it — the dedup index (text
signatures), the ANN index (embedding codes), and the CDC-merged table
state (a keyed delete) — each via its own takedown path, with the other
residents untouched. The per-artifact mechanics are unit-tested in
their own modules; this pins the cross-artifact story a real GDPR
erasure request exercises."""

from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.dedup_index import (
    build_dedup_index,
    dedup_check_incremental,
    dedup_index_remove,
)
from kafka_dbsync_spark.operators.merge import apply_changes
from kafka_dbsync_spark.operators.pq_index import (
    build_pq_index,
    ivfpq_search_index,
    pq_index_remove,
)
from kafka_dbsync_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
SUBJECT = 7


def test_right_to_erasure_across_artifacts(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    subject_text = docs.filter(F.col("doc_id") == SUBJECT).head()["text"]
    subject_vec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == SUBJECT).head()["embedding"]
    ]

    # --- dedup index forgets the subject's text ---
    didx = str(tmp_path / "dedup")
    build_dedup_index(spark, docs, didx)
    probe = spark.createDataFrame([(9001, subject_text)], "doc_id long, text string")
    before = dedup_check_incremental(spark, didx, probe, threshold_bp=9000).collect()
    assert any(r["corpus_id"] == SUBJECT for r in before)
    dedup_index_remove(spark, didx, [SUBJECT])
    after = dedup_check_incremental(spark, didx, probe, threshold_bp=9000).collect()
    assert all(r["corpus_id"] != SUBJECT for r in after)

    # --- ANN index forgets the subject's vector ---
    pidx = str(tmp_path / "pq")
    build_pq_index(spark, emb, QUERIES["ivf_centroids"](spark, SF), pidx)
    top_before = ivfpq_search_index(spark, pidx, subject_vec, k_top=5).collect()
    assert top_before[0]["vec_id"] == SUBJECT       # own nearest neighbor
    pq_index_remove(spark, pidx, [SUBJECT])
    top_after = ivfpq_search_index(spark, pidx, subject_vec, k_top=5).collect()
    assert SUBJECT not in {r["vec_id"] for r in top_after}
    # the un-erased neighbors keep their relative order
    survivors = [r["vec_id"] for r in top_before if r["vec_id"] != SUBJECT]
    assert [r["vec_id"] for r in top_after][: len(survivors)] == survivors

    # --- merged table state forgets the subject's row ---
    changes = spark.createDataFrame(
        [(SUBJECT, "v1", "upsert", 1), (8, "keep", "upsert", 2),
         (SUBJECT, None, "delete", 3)],
        "user_id long, value string, op string, offset long",
    )
    state = apply_changes(changes, ["user_id"], ["offset"])
    rows = {r["user_id"]: r["value"] for r in state.collect()}
    assert SUBJECT not in rows and rows == {8: "keep"}


def test_erasure_survives_shard_merge(spark, tmp_path):
    """The cross-artifact right-to-erasure contract extends to the
    merge path: once a subject's vector is taken down, NO sequence of
    shard merges may bring it back — enforced by pq_index_merge's
    refusal until the shard itself runs the takedown (covered in
    detail by test_pq_index.py::test_merge_refuses_resurrecting_
    removed_vector; this pin keeps the erasure suite self-contained)."""
    from pyspark.sql import functions as F

    from kafka_dbsync_spark.operators.pq_index import (
        build_pq_index,
        build_pq_shard,
        pq_index_merge,
        pq_index_remove,
    )
    from kafka_dbsync_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, sf)
    base, shard = str(tmp_path / "b"), str(tmp_path / "s")
    build_pq_index(spark, emb.filter(F.col("vec_id") < 300), cents, base)
    # the shard is id-disjoint from the base EXCEPT for the subject —
    # merge also enforces disjointness (duplicate ids would be served
    # twice), so the only overlap is the vector under takedown
    build_pq_shard(
        spark,
        base,
        emb.filter((F.col("vec_id") >= 300) | (F.col("vec_id") == 295)),
        shard,
    )
    pq_index_remove(spark, base, [295])          # subject id in BOTH
    import pytest as _pt

    with _pt.raises(ValueError, match="resurrect"):
        pq_index_merge(spark, base, shard)
    pq_index_remove(spark, shard, [295])
    pq_index_merge(spark, base, shard)
    assert (
        spark.read.parquet(f"{base}/codes")
        .filter(F.col("vec_id") == 295)
        .isEmpty()
    )

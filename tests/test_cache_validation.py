"""Metadata-only cache validation (operators/cache_validation.py,
VERDICT r5 #1): after a build records the source file-listing
signature, serve-side staleness checks must run ZERO data-sized Spark
jobs — while a dataset regenerated in place must still trigger a
rebuild, and markers without a signature (pre-signature or post-add)
must fall back to exactly ONE data check per state, then memoize."""

import json
import os
import shutil

import pytest

from kafka_dbsync_spark.operators import cache_validation as cv
from kafka_dbsync_spark.operators import pq_index as pqi
from kafka_dbsync_spark.operators.pq_index import (
    build_pq_index,
    index_is_current,
)
from kafka_dbsync_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _write_dataset(spark, src, n=64, dim=64, seed=1):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=dim)], i % 4)
        for i in range(n)
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).write.mode("overwrite").parquet(src)


def _centroids(spark, src):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(src)
    comp = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).select("label", (F.col("dim0") + 1).alias("dim"), "v")
    return comp.groupBy("label", "dim").agg(
        F.round(F.sum("v") / F.count("*"), 6).alias("centroid")
    )


@pytest.fixture()
def ds(spark, tmp_path):
    src = str(tmp_path / "emb.parquet")
    idx = str(tmp_path / "idx")
    _write_dataset(spark, src)
    build_pq_index(
        spark, spark.read.parquet(src), _centroids(spark, src), idx,
        src_path=src,
    )
    return src, idx


def _forbid_exact(monkeypatch):
    def boom(*a, **k):  # pragma: no cover - the assertion IS not running
        raise AssertionError("exact dataset_fingerprint ran on the serve path")

    monkeypatch.setattr(pqi, "dataset_fingerprint", boom)


def test_validation_is_metadata_only_after_build(spark, ds, monkeypatch):
    src, idx = ds
    _forbid_exact(monkeypatch)
    emb = spark.read.parquet(src)
    # tier 2 (marker src_sig) on a cold memo, tier 1 (memo) after
    cv.invalidate_memo(idx)
    assert index_is_current(idx, src, emb)
    assert index_is_current(idx, src, emb)


def test_regenerated_dataset_detected_and_rebuild_recovers(spark, ds):
    src, idx = ds
    # regenerate in place: a different row set (the pq fingerprint is
    # id-based by design, so staleness means the id set changed)
    _write_dataset(spark, src, n=80, seed=2)
    emb = spark.read.parquet(src)
    assert not index_is_current(idx, src, emb)
    build_pq_index(spark, emb, _centroids(spark, src), idx, src_path=src)
    assert index_is_current(idx, src, emb)


def test_missing_src_sig_falls_back_to_one_exact_check(spark, ds, monkeypatch):
    src, idx = ds
    marker = os.path.join(idx, "_COMPLETE")
    with open(marker) as f:
        rec = json.load(f)
    rec.pop("src_sig")  # simulate a pre-signature / post-add marker
    with open(marker, "w") as f:
        json.dump(rec, f)
    cv.invalidate_memo(idx)
    calls = {"n": 0}
    real = pqi.dataset_fingerprint

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pqi, "dataset_fingerprint", counting)
    emb = spark.read.parquet(src)
    assert index_is_current(idx, src, emb)   # tier 3: one exact check
    assert index_is_current(idx, src, emb)   # tier 1: memoized
    assert calls["n"] == 1


def test_touched_but_identical_dataset_revalidates_without_rebuild(
    spark, ds
):
    src, idx = ds
    _write_dataset(spark, src, seed=1)  # same content, new files/mtimes
    emb = spark.read.parquet(src)
    # sig mismatch -> exact fallback PASSES (content unchanged) -> no
    # rebuild needed; and the pass memoizes under the new listing
    assert index_is_current(idx, src, emb)


def test_force_exact_catches_listing_preserving_regeneration(spark, ds):
    """r6 advice #4: on a coarse-mtime store an in-place regeneration
    can preserve the (path, size, mtime) listing; force_exact bypasses
    the memo and listing tiers, so the content check still catches it
    — simulated by swapping the marker's recorded fingerprint while
    pinning the listing signature to the current dataset."""
    src, idx = ds
    emb = spark.read.parquet(src)
    cv.invalidate_memo(idx)
    assert index_is_current(idx, src, emb)   # warm the memo
    marker = os.path.join(idx, "_COMPLETE")
    with open(marker) as f:
        rec = json.load(f)
    rec["fingerprint"] = {"n": -1}           # stale content, same listing
    with open(marker, "w") as f:
        json.dump(rec, f)
    # tier 2 would still accept (src unchanged, sig matches record) —
    # the exact hatch must not
    cv.invalidate_memo(idx)
    assert index_is_current(idx, src, emb)
    assert not index_is_current(idx, src, emb, force_exact=True)
    # repeatable: force_exact neither reads nor writes the memo
    assert not index_is_current(idx, src, emb, force_exact=True)


def test_missing_marker_is_stale(spark, ds):
    src, idx = ds
    os.remove(os.path.join(idx, "_COMPLETE"))
    assert not index_is_current(idx, src, spark.read.parquet(src))


def test_lm_model_current_is_metadata_only(spark, tmp_path, monkeypatch):
    from kafka_dbsync_spark.operators import lm_index as lmi
    from kafka_dbsync_spark.operators.lm_index import (
        build_lm_model,
        lm_model_is_current,
    )

    src = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, f"the quick brown fox {i % 3} jumps") for i in range(30)],
        "doc_id bigint, text string",
    ).write.mode("overwrite").parquet(src)
    docs = spark.read.parquet(src)
    path = str(tmp_path / "lm")
    build_lm_model(spark, docs, path, src_path=src)

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("corpus_fingerprint ran on the serve path")

    monkeypatch.setattr(lmi, "corpus_fingerprint", boom)
    cv.invalidate_memo(path)
    assert lm_model_is_current(docs, path, src_path=src)
    assert lm_model_is_current(docs, path, src_path=src)
    # a vanished generation dir is caught before the metadata tiers
    with open(os.path.join(path, "_COMPLETE")) as f:
        gen = json.load(f)["gen"]
    shutil.rmtree(os.path.join(path, gen))
    assert not lm_model_is_current(docs, path, src_path=src)


def test_served_query_plans_have_no_validation_scan(spark, monkeypatch):
    """The registry serve queries must not run ANY Spark job for cache
    validation once the index is warm: poison the exact checks, then
    run the served searches end to end."""
    from kafka_dbsync_spark.operators import lm_index as lmi

    # warm both caches (builds if needed)
    QUERIES["pq_adc_search_served"](spark, SF).collect()
    QUERIES["lm_perplexity_served"](spark, SF).collect()

    def boom(*a, **k):  # pragma: no cover
        raise AssertionError("data-sized validation ran inside a serve query")

    monkeypatch.setattr(pqi, "dataset_fingerprint", boom)
    monkeypatch.setattr(lmi, "corpus_fingerprint", boom)
    assert QUERIES["pq_adc_search_served"](spark, SF).count() == 10
    assert QUERIES["ivfpq_search_served"](spark, SF).count() == 10
    assert QUERIES["lm_perplexity_served"](spark, SF).count() == 30

"""Persisted benchmark-contamination index (operators/decontam_index.py):
serve must equal the inline contamination_stats arithmetic, staleness
must track the benchmark set, and the ingest gate must route by the
dirty threshold with replay safety."""

import os

from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.corpus import contamination_stats
from kafka_dbsync_spark.operators.decontam_index import (
    benchmark_index_is_current,
    build_benchmark_index,
    contamination_gate_foreach_batch,
    contamination_score_served,
)

SF = "/root/testdata/sf0.001"


def _split(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    return (
        docs.filter(F.col("doc_id") % 5 == 0),   # "benchmark"
        docs.filter(F.col("doc_id") % 5 != 0),   # corpus
    )


def test_served_equals_inline_and_staleness(spark, tmp_path):
    bench, corpus = _split(spark)
    path = str(tmp_path / "bidx")
    build_benchmark_index(spark, bench, path)
    assert benchmark_index_is_current(bench, path)
    served = {
        tuple(r)
        for r in contamination_score_served(spark, path, corpus).collect()
    }
    inline = {tuple(r) for r in contamination_stats(corpus, bench).collect()}
    assert served == inline and len(served) > 0
    # a grown benchmark reads as stale; the rebuild lands a NEW gen
    bigger = bench.unionByName(corpus.limit(3))
    assert not benchmark_index_is_current(bigger, path)
    build_benchmark_index(spark, bigger, path)
    assert benchmark_index_is_current(bigger, path)


def test_gate_routes_by_threshold_and_replays(spark, tmp_path):
    """A verbatim benchmark doc rejects at 100% overlap; clean text and
    gram-less (empty-normalizing) text admit; a committed epoch replay
    with different data is a no-op."""
    bench = spark.createDataFrame(
        [(1000001, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "bidx")
    build_benchmark_index(spark, bench, path)
    acc, rej = str(tmp_path / "acc"), str(tmp_path / "rej")
    fn = contamination_gate_foreach_batch(path, acc, rej, max_bp=8000)
    batch = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "totally different words with nothing shared at all ok"),
            (3, "...!!!"),  # normalizes empty -> no grams -> bp 0
        ],
        "doc_id long, text string",
    )
    fn(batch, 0)
    got_acc = {
        r["doc_id"]: r["overlap_bp"]
        for r in spark.read.parquet(f"{acc}/e0").collect()
    }
    assert got_acc == {2: 0, 3: 0}
    got_rej = {
        r["doc_id"]: (r["overlap_bp"], r["reject_reason"])
        for r in spark.read.parquet(f"{rej}/e0").collect()
    }
    assert got_rej == {1: (10000, "benchmark_overlap")}
    fn(batch.withColumn("doc_id", F.col("doc_id") + 100), 0)  # replay
    assert {
        r["doc_id"] for r in spark.read.parquet(f"{acc}/e0").collect()
    } == {2, 3}


def test_serve_refuses_missing_index(spark, tmp_path):
    import pytest

    _, corpus = _split(spark)
    with pytest.raises(ValueError, match="no complete benchmark index"):
        contamination_score_served(
            spark, str(tmp_path / "nope"), corpus
        )

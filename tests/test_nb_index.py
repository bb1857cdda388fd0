"""Persisted NB classifier (operators/nb_index.py): serve must equal
the inline train+score path bit-for-bit, staleness must be label-aware
(an in-place relabel with identical text forces a retrain), and serving
must never touch the training corpus."""

import os

from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.corpus import nb_domain_classify
from kafka_dbsync_spark.operators.nb_index import (
    build_nb_model,
    nb_classify_served,
    nb_model_is_current,
)

SF = "/root/testdata/sf0.001"


def _halves(spark):
    from kafka_dbsync_spark.functions.text import normalize_text

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs_f = docs.filter(normalize_text(F.col("text")) != "")
    return (
        docs_f.filter(F.col("doc_id") % 2 == 0),
        docs_f.filter(F.col("doc_id") % 2 == 1),
    )


def test_served_equals_inline(spark, tmp_path):
    train, score = _halves(spark)
    path = str(tmp_path / "nb")
    build_nb_model(spark, train, path)
    served = {
        (r["doc_id"], r["pred"])
        for r in nb_classify_served(spark, path, score).collect()
    }
    inline = {
        (r["doc_id"], r["pred"])
        for r in nb_domain_classify(train, score).collect()
    }
    assert served == inline and len(served) > 0


def test_staleness_is_label_aware_and_rebuild_serves_new_labels(
    spark, tmp_path
):
    """Relabeling the training corpus IN PLACE — same ids, same text —
    must read as stale (the content hash folds the class in), and the
    rebuild must land in a NEW generation serving the new labels."""
    import json

    train, score = _halves(spark)
    path = str(tmp_path / "nb")
    build_nb_model(spark, train, path)
    assert nb_model_is_current(train, path)
    with open(os.path.join(path, "_COMPLETE")) as f:
        gen1 = json.load(f)["gen"]

    relabeled = train.withColumn(
        "source", F.concat(F.lit("re-"), F.col("source"))
    )
    assert not nb_model_is_current(relabeled, path)
    build_nb_model(spark, relabeled, path)
    with open(os.path.join(path, "_COMPLETE")) as f:
        gen2 = json.load(f)["gen"]
    assert gen2 != gen1
    preds = {
        r["pred"] for r in nb_classify_served(spark, path, score).collect()
    }
    assert preds and all(p.startswith("re-") for p in preds)
    # the superseded generation was retired by the shared protocol
    assert not os.path.isdir(os.path.join(path, gen1))


def test_serve_plan_never_scans_training_corpus(spark, tmp_path):
    """Train-once/score-forever: labeling NEW documents reads only the
    frozen model tables — the training parquet must not appear in the
    serve plan (the deploy shape: GPT-3's classifier scores each crawl
    shard without revisiting WebText)."""
    train, _ = _halves(spark)
    path = str(tmp_path / "nb")
    build_nb_model(spark, train, path)
    fresh = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id long, text string",
    )
    out = nb_classify_served(spark, path, fresh)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan
    assert out.count() == 2


def test_serve_refuses_missing_model_and_vanished_generation(
    spark, tmp_path
):
    import shutil

    import pytest

    train, score = _halves(spark)
    path = str(tmp_path / "nb")
    with pytest.raises(ValueError, match="no complete NB model"):
        nb_classify_served(spark, path, score)
    build_nb_model(spark, train, path)
    for n in os.listdir(path):
        if n.startswith("gen-"):
            shutil.rmtree(os.path.join(path, n))
    with pytest.raises(ValueError, match="missing generation"):
        nb_classify_served(spark, path, score)
    assert not nb_model_is_current(train, path)  # rebuild path stays open


def test_nb_gate_routes_and_replays(spark, tmp_path):
    """Frozen-classifier admission: wanted classes route to accepted,
    others to rejected with the prediction attached, token-empty rows
    reject as 'no_tokens'; a replayed epoch with different data is a
    no-op (outputs already committed)."""
    from kafka_dbsync_spark.operators.nb_index import nb_gate_foreach_batch

    train = spark.createDataFrame(
        [
            (0, "good", "alpha beta alpha gamma"),
            (2, "good", "alpha gamma beta"),
            (4, "bad", "zeta eta zeta theta"),
            (6, "bad", "eta theta zeta"),
        ],
        "doc_id long, source string, text string",
    )
    model = str(tmp_path / "nb")
    build_nb_model(spark, train, model)
    acc, rej = str(tmp_path / "acc"), str(tmp_path / "rej")
    fn = nb_gate_foreach_batch(model, acc, rej, ["good"])
    batch = spark.createDataFrame(
        [
            (11, "alpha beta gamma"),     # -> good -> accepted
            (13, "zeta eta theta"),       # -> bad  -> class_blocked
            (15, "...!!!"),               # normalizes empty -> no_tokens
        ],
        "doc_id long, text string",
    )
    fn(batch, 0)
    got_acc = [r["doc_id"] for r in spark.read.parquet(f"{acc}/e0").collect()]
    assert got_acc == [11]
    got_rej = {
        r["doc_id"]: (r["pred"], r["reject_reason"])
        for r in spark.read.parquet(f"{rej}/e0").collect()
    }
    assert got_rej == {13: ("bad", "class_blocked"),
                       15: (None, "no_tokens")}
    # committed-epoch replay with DIFFERENT data: untouched no-op
    fn(batch.withColumn("doc_id", F.col("doc_id") + 100), 0)
    assert [
        r["doc_id"] for r in spark.read.parquet(f"{acc}/e0").collect()
    ] == [11]

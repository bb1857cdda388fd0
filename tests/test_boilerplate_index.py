"""Persisted boilerplate key set (operators/boilerplate_index.py):
mine-once/strip-forever must equal the fused batch strip, apply to
NEW arrivals without re-mining, and follow the shared staleness
discipline with host- and parameter-awareness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.boilerplate_index import (
    boilerplate_index_is_current,
    boilerplate_strip_served,
    build_boilerplate_index,
)
from kafka_dbsync_spark.operators.dedup import host_boilerplate_strip

DOCS = [
    (1, "a", "footer a\nbody one"),
    (2, "a", "body two\nfooter a"),
    (3, "a", "body three\nfooter a"),
    (4, "a", "body four only"),
    (5, "b", "footer a\nbody five"),
    (6, "b", "body six"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


@pytest.fixture()
def idx(spark, docs, tmp_path):
    path = str(tmp_path / "bp")
    build_boilerplate_index(spark, docs, path)
    return path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_serve_equals_fused_on_mining_corpus(spark, docs, idx):
    assert _rows(boilerplate_strip_served(spark, idx, docs)) == _rows(
        host_boilerplate_strip(docs)
    )


def test_new_arrivals_strip_against_frozen_keys(spark, docs, idx):
    """The deploy case: a NEW doc from host 'a' carrying the mined
    footer strips WITHOUT re-mining; the same text on an unmined host
    (or a host where it was under threshold) survives untouched."""
    new = spark.createDataFrame(
        [
            (100, "a", "fresh content\nfooter a\nmore content"),
            (101, "b", "footer a\nnot boilerplate on b"),
            (102, "zz", "footer a\nunknown host"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in boilerplate_strip_served(spark, idx, new).collect()
    }
    assert out == {100: (3, 1, "fresh content\nmore content")}


def test_staleness_corpus_host_and_params(spark, docs, idx):
    assert boilerplate_index_is_current(docs, idx)
    # corpus text change
    changed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 4, F.lit("edited")).otherwise(F.col("text")),
    )
    assert not boilerplate_index_is_current(changed, idx)
    # re-hosting identical text changes the mined set -> stale
    rehosted = docs.withColumn(
        "source",
        F.when(F.col("doc_id") == 4, F.lit("b")).otherwise(F.col("source")),
    )
    assert not boilerplate_index_is_current(rehosted, idx)
    # a different threshold is a different model -> stale
    assert not boilerplate_index_is_current(docs, idx, min_frac_pct=75)
    # rebuild at the new threshold: both generations coexist by name,
    # the marker points at the newest
    build_boilerplate_index(spark, docs, idx, min_frac_pct=75)
    assert boilerplate_index_is_current(docs, idx, min_frac_pct=75)
    assert not boilerplate_index_is_current(docs, idx)  # default pct=25
    # at 75% the 3-of-4 footer still qualifies on host a
    out = boilerplate_strip_served(spark, idx, docs)
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3}


def test_unbuilt_and_vanished_refused(spark, docs, tmp_path, idx):
    import json
    import os
    import shutil

    with pytest.raises(ValueError, match="no complete boilerplate index"):
        boilerplate_strip_served(spark, str(tmp_path / "nope"), docs)
    marker = json.load(open(os.path.join(idx, "_COMPLETE")))
    shutil.rmtree(os.path.join(idx, marker["gen"]))
    with pytest.raises(ValueError, match="missing"):
        boilerplate_strip_served(spark, idx, docs)
    assert not boilerplate_index_is_current(docs, idx)

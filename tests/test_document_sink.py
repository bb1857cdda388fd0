"""MongoDB-style document sink (K12) — reference parity with
hack/sink-mongodb/mongodb-sink.json: ProvidedInValueStrategy _id,
ReplaceOneDefaultStrategy whole-document replace, dropTombstones."""

from __future__ import annotations

import json
import sqlite3

import pytest

from kafka_dbsync_spark.streaming.document_sink import DocumentApplyEngine

SCHEMA = "record_key string, record_value string, offset long"


def docs_state(db, collection="target_orders"):
    con = sqlite3.connect(db)
    try:
        rows = con.execute(f'SELECT "_id", "doc" FROM "{collection}"').fetchall()
    finally:
        con.close()
    return {rid: json.loads(doc) for rid, doc in rows}


def make_engine(db, **kw):
    return DocumentApplyEngine(
        connection_factory=lambda: sqlite3.connect(db),
        collection="target_orders",
        **kw,
    )


def rec(key, value, off):
    return (
        json.dumps(key) if key is not None else None,
        json.dumps(value) if value is not None else None,
        off,
    )


def test_replace_one_semantics_drop_fields(spark, tmp_path):
    """ReplaceOne REPLACES the whole document: fields absent from the new
    version vanish (the exact behavior that distinguishes a document
    replace from the JDBC column-upsert)."""
    db = str(tmp_path / "docs.db")
    eng = make_engine(db)
    b1 = spark.createDataFrame(
        [
            rec({"_id": "a"}, {"_id": "a", "name": "first", "qty": 3}, 0),
            rec({"_id": "b"}, {"_id": "b", "name": "other"}, 1),
        ],
        SCHEMA,
    )
    eng.apply_batch(b1)
    b2 = spark.createDataFrame(
        # new version of "a" has NO qty field — it must disappear
        [rec({"_id": "a"}, {"_id": "a", "name": "second"}, 2)],
        SCHEMA,
    )
    eng.apply_batch(b2)
    state = docs_state(db)
    assert state["a"] == {"_id": "a", "name": "second"}  # qty gone
    assert "qty" not in state["a"]
    assert state["b"] == {"_id": "b", "name": "other"}


def test_tombstones_dropped_by_default(spark, tmp_path):
    """mongodb-sink.json filters tombstones (RecordIsTombstone predicate):
    a null value must NOT delete the stored document."""
    db = str(tmp_path / "docs.db")
    eng = make_engine(db)
    eng.apply_batch(
        spark.createDataFrame(
            [
                rec({"_id": "a"}, {"_id": "a", "v": 1}, 0),
                rec({"_id": "a"}, None, 1),  # tombstone — filtered
            ],
            SCHEMA,
        )
    )
    assert docs_state(db) == {"a": {"_id": "a", "v": 1}}


def test_tombstones_delete_mode(spark, tmp_path):
    """DeleteOne strategy variant: tombstones delete by the KEY's _id
    (the value is null, so the id must come from the key)."""
    db = str(tmp_path / "docs.db")
    eng = make_engine(db, tombstones="delete", id_strategy="key")
    eng.apply_batch(
        spark.createDataFrame(
            [
                rec({"_id": "a"}, {"_id": "a", "v": 1}, 0),
                rec({"_id": "b"}, {"_id": "b", "v": 2}, 1),
                rec({"_id": "a"}, None, 2),
                rec({"_id": "zz"}, None, 3),  # delete of absent id: no-op
            ],
            SCHEMA,
        )
    )
    assert docs_state(db) == {"b": {"_id": "b", "v": 2}}


def test_intra_batch_lww_and_replay_idempotence(spark, tmp_path):
    db = str(tmp_path / "docs.db")
    eng = make_engine(db)
    batch = spark.createDataFrame(
        [
            rec({"_id": "a"}, {"_id": "a", "v": 1}, 0),
            rec({"_id": "a"}, {"_id": "a", "v": 2}, 1),
            rec({"_id": "a"}, {"_id": "a", "v": 3}, 2),  # LWW winner
        ],
        SCHEMA,
    )
    eng.apply_batch(batch)
    assert docs_state(db)["a"]["v"] == 3
    eng.apply_batch(batch)  # at-least-once replay converges
    assert docs_state(db)["a"]["v"] == 3


def test_id_from_value_and_idless_docs_skipped(spark, tmp_path):
    """ProvidedInValueStrategy: the _id comes from the VALUE document
    (key ignored); documents without an _id cannot be addressed and are
    skipped."""
    db = str(tmp_path / "docs.db")
    eng = make_engine(db)
    eng.apply_batch(
        spark.createDataFrame(
            [
                rec({"_id": "ignored"}, {"_id": "real", "v": 1}, 0),
                rec(None, {"v": 2}, 1),  # no _id anywhere → skipped
            ],
            SCHEMA,
        )
    )
    assert set(docs_state(db)) == {"real"}


def test_rejects_bad_config():
    with pytest.raises(ValueError, match="id strategy"):
        DocumentApplyEngine(lambda: None, "c", id_strategy="topic")
    with pytest.raises(ValueError, match="tombstone"):
        DocumentApplyEngine(lambda: None, "c", tombstones="ignore")


def test_streaming_document_sink_e2e(spark, tmp_path):
    """foreachBatch wiring: a file-source stream of raw doc records lands
    in the collection with replace semantics across micro-batches."""
    src = str(tmp_path / "stream")
    ckpt = str(tmp_path / "ckpt")
    db = str(tmp_path / "docs.db")
    spark.createDataFrame(
        [
            rec({"_id": "a"}, {"_id": "a", "name": "v1", "extra": True}, 0),
            rec({"_id": "b"}, {"_id": "b", "name": "b1"}, 1),
            rec({"_id": "a"}, {"_id": "a", "name": "v2"}, 2),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    eng = make_engine(db)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream.writeStream.foreachBatch(eng.foreach_batch())
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = docs_state(db)
    assert state["a"] == {"_id": "a", "name": "v2"}  # extra replaced away
    assert state["b"] == {"_id": "b", "name": "b1"}

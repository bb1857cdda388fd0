"""Cross-batch streaming content-dedup (stateful dropDuplicates)."""

from __future__ import annotations

from kafka_dbsync_spark.operators.dedup import streaming_dedup_exact


def test_streaming_dedup_across_batches(tmp_path, spark):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    SCH = "doc_id long, text string"

    def emit(rows):
        spark.createDataFrame(rows, SCH).coalesce(1).write.mode("append").parquet(src)

    emit([(1, "alpha"), (2, "beta"), (3, "alpha")])  # in-batch dup
    stream = spark.readStream.schema(SCH).parquet(src)
    deduped = streaming_dedup_exact(stream, "text")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 2: cross-batch dup of "alpha" + new content
    emit([(4, "alpha"), (5, "gamma")])
    q.processAllAvailable()
    q.stop()

    texts = sorted(r["text"] for r in spark.sql("SELECT * FROM sdedup").collect())
    assert texts == ["alpha", "beta", "gamma"]  # each content exactly once


def test_streaming_dedup_watermarked(tmp_path, spark):
    """The watermarked (bounded-state) path must dedup content with
    DIFFERENT event times inside the window."""
    import datetime

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    SCH = "doc_id long, text string, ts timestamp"
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        (1, "alpha", at(0)),
        (2, "alpha", at(5)),   # same content, different event time → dup
        (3, "beta", at(6)),
    ]
    spark.createDataFrame(rows, SCH).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCH).parquet(src)
    deduped = streaming_dedup_exact(stream, "text", event_time_col="ts")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup_wm")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    texts = sorted(r["text"] for r in spark.sql("SELECT * FROM sdedup_wm").collect())
    assert texts == ["alpha", "beta"]


def test_streaming_dedup_null_content_passes_through(tmp_path, spark):
    """md5(NULL)=NULL and stateful dropDuplicates treats NULL keys as
    equal — null-content rows must bypass dedup (batch-parity: missing
    data, not duplicates of each other)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    SCH = "doc_id long, text string"

    def emit(rows):
        spark.createDataFrame(rows, SCH).coalesce(1).write.mode("append").parquet(src)

    emit([(1, None), (2, "alpha"), (3, None)])
    stream = spark.readStream.schema(SCH).parquet(src)
    deduped = streaming_dedup_exact(stream, "text")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("sdedup_null")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    emit([(4, None), (5, "alpha")])  # another NULL + a real cross-batch dup
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT doc_id, text FROM sdedup_null").collect()
    ids = sorted(r["doc_id"] for r in rows)
    # all three NULL rows survive; "alpha" exactly once
    assert ids == [1, 2, 3, 4]
    assert sum(r["text"] is None for r in rows) == 3

"""Custom stateful streaming operators: state must carry across
micro-batches and survive checkpointed restarts."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_dbsync_spark.streaming.stateful import exactly_once_ids, running_totals


def _write(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, offset long, value double").coalesce(
        1
    ).write.mode("append").parquet(path)


def test_running_totals_across_batches(tmp_path, spark):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(1, 0, 10.0), (1, 1, 5.0), (2, 2, 1.0)])

    stream = spark.readStream.schema("user_id long, offset long, value double").parquet(src)
    out = running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("totals")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 2: state for user 1 must accumulate, not reset
    _write(spark, src, [(1, 3, 2.5), (3, 4, 7.0)])
    q.processAllAvailable()
    q.stop()

    rows = spark.sql("SELECT * FROM totals").collect()
    latest = {}
    for r in rows:  # memory sink keeps every update; last write per key wins
        latest[r["user_id"]] = (r["n"], r["total"], r["max_offset"])
    assert latest[1] == (3, 17.5, 3)
    assert latest[2] == (1, 1.0, 2)
    assert latest[3] == (1, 7.0, 4)


def test_exactly_once_ids_cross_batch(tmp_path, spark):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, src, [(1, 0, 1.0), (1, 1, 1.0), (1, 1, 1.0)])  # dup in batch

    stream = spark.readStream.schema("user_id long, offset long, value double").parquet(src)
    deduped = exactly_once_ids(stream, "user_id", "offset")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 2 redelivers offsets 0-1 (at-least-once) plus new 2
    _write(spark, src, [(1, 0, 1.0), (1, 1, 1.0), (1, 2, 1.0)])
    q.processAllAvailable()
    q.stop()

    offsets = sorted(
        r["offset"] for r in spark.sql("SELECT * FROM dedup_out").collect()
    )
    assert offsets == [0, 1, 2]  # each id emitted exactly once, ever

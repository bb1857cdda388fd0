"""Custom stateful streaming operators: state must carry across
micro-batches and survive checkpointed restarts."""

from __future__ import annotations

from datetime import datetime, timedelta

import pyspark.sql.functions as F
from pyspark.sql import Window as W

from kafka_dbsync_spark.streaming.stateful import (
    exactly_once_ids,
    running_totals,
    sessionize_stream,
    windowed_counts_stream,
)


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


T0 = datetime(2025, 6, 1, 12, 0, 0)
SESS_SCHEMA = "user_id long, ts timestamp, value double"


def _sess_events():
    # ordered by event time: the stream delivers the first three in run 1
    # and the rest in run 2, so no event is behind the watermark on arrival
    m = timedelta(minutes=1)
    return [
        # sessions: user 1 → (t0, t0+10m), (t0+50m); user 2 → (t0), (t0+45m, t0+46m)
        (1, T0, 1.0),
        (1, T0 + 10 * m, 2.0),
        (2, T0, 8.0),
        (2, T0 + 45 * m, 16.0),
        (2, T0 + 46 * m, 32.0),
        (1, T0 + 50 * m, 4.0),
    ]


def test_sessionize_stream_matches_batch_across_restart(tmp_path, spark):
    """session_window sessions with watermark must (a) survive a
    checkpointed restart mid-stream and (b) agree with the batch
    lag/running-sum sessionization on the same bounded data."""
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    events = _sess_events()

    def write(rows):
        spark.createDataFrame(rows, SESS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_until_drained():
        q = (
            sessionize_stream(
                spark.readStream.schema(SESS_SCHEMA).option(
                    "maxFilesPerTrigger", "1"
                ).parquet(src),
                gap="30 minutes",
                watermark="10 minutes",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    write(events[:3])
    run_until_drained()  # first run: only user-1 data
    # second run resumes from the checkpoint; the sentinel (user 99, far
    # future) advances the watermark past every real session's close so
    # append mode finalizes them all
    write(events[3:])
    write([(99, T0 + timedelta(days=1), 0.0)])
    run_until_drained()

    got = (
        spark.read.parquet(out)
        .filter(F.col("user_id") != 99)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
        )
    )
    got_rows = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["sum_value"])
        for r in got.collect()
    }

    # batch twin on the same data (events_sessionize shape)
    ev = spark.createDataFrame(events, SESS_SCHEMA)
    w = W.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "sess_id", F.sum(new_sess).over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    batch = sess.groupBy("user_id").agg(
        F.max("sess_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    batch_rows = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert got_rows == batch_rows == {1: (2, 3, 7.0), 2: (2, 3, 56.0)}


def test_windowed_counts_stream_matches_batch(tmp_path, spark):
    """Tumbling hourly windows with a watermark: late-but-in-horizon
    events still count; finalized windows match the batch groupBy."""
    src, ckpt, out = (str(tmp_path / d) for d in ("wsrc", "wckpt", "wout"))
    h = timedelta(hours=1)
    rows = [
        (1, T0, 1.0, "click"),
        (2, T0 + timedelta(minutes=20), 2.0, "click"),
        (3, T0 + timedelta(minutes=40), 4.0, "view"),
        (4, T0 + h, 8.0, "click"),           # next window
        (5, T0 + timedelta(minutes=50), 16.0, "click"),  # late, within watermark
        (6, T0 + 30 * h, 0.0, "flush"),      # advances watermark, closes all
    ]
    schema = "event_id long, ts timestamp, value double, event_type string"

    def write(batch):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)

    write(rows[:4])
    q = (
        windowed_counts_stream(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    write(rows[4:])
    q.processAllAvailable()
    q.stop()

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
        if r["event_type"] != "flush"
    }
    assert got == {
        (T0, "click"): (3, 19.0),   # includes the late event 5
        (T0, "view"): (1, 4.0),
        (T0 + h, "click"): (1, 8.0),
    }


def test_too_late_rows_are_dropped(tmp_path, spark):
    """The other half of the watermark contract: an event arriving
    BEHIND the watermark (its window already finalized) must be DROPPED
    — the bounded-state guarantee. Without the drop, 100 TB of state
    accumulates forever."""
    src, ckpt, out = (str(tmp_path / d) for d in ("lsrc", "lckpt", "lout"))
    h = timedelta(hours=1)
    schema = "event_id long, ts timestamp, value double, event_type string"

    def write(batch):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        q = (
            windowed_counts_stream(
                spark.readStream.schema(schema).parquet(src)
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write([(1, T0, 1.0, "click"), (2, T0 + 30 * h, 0.0, "flush")])
    run()  # flush advances the watermark far past T0's window
    # event 3 is 30 hours behind the watermark: its window is closed
    write([(3, T0 + timedelta(minutes=5), 99.0, "click"),
           (4, T0 + 60 * h, 0.0, "flush2")])
    run()
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    # T0's click window finalized with ONLY event 1 — the too-late 99.0
    # never entered it, and no new T0 window row appeared
    assert got[(T0, "click")] == (1, 1.0)
    assert all(v != (1, 99.0) for v in got.values())

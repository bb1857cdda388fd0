"""Watermarked stream-stream interval join (streaming/stateful.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_dbsync_spark.sources.tables import load_table
from kafka_dbsync_spark.streaming.stateful import interval_join_streams

from tests.conftest import SF_SMOKE


def test_interval_join_streams_matches_batch(tmp_path, spark):
    """Signup events joined to same-user purchases within 2 hours — the
    streaming result equals the equivalent batch interval join."""
    ev = load_table(spark, SF_SMOKE, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("signup_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts").alias("ts_r"),
        F.col("event_id").alias("purchase_id"),
    )
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    signups.write.parquet(lsrc)
    purchases.write.parquet(rsrc)

    ls = spark.readStream.schema(signups.schema).parquet(lsrc)
    rs = spark.readStream.schema(purchases.schema).parquet(rsrc)
    joined = interval_join_streams(
        ls, rs, "user_id", "ts", "ts_r", watermark="1 hour", upper="2 hours"
    ).select("user_id", "signup_id", "purchase_id")

    # both sides must carry event-time watermarks — the state-eviction
    # precondition that keeps join state bounded
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") >= 2

    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("sj_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["signup_id"], r["purchase_id"])
        for r in spark.sql("SELECT * FROM sj_out").collect()
    }

    want = {
        (r["user_id"], r["signup_id"], r["purchase_id"])
        for r in signups.join(
            purchases,
            (signups["user_id"] == purchases["user_id"])
            & (F.col("ts_r") >= F.col("ts"))
            & (F.col("ts_r") <= F.col("ts") + F.expr("INTERVAL 2 hours")),
        )
        .select(signups["user_id"], "signup_id", "purchase_id")
        .collect()
    }
    assert len(want) > 0
    assert got == want


def test_stream_static_enrichment(tmp_path, spark):
    """Stream-static join: per micro-batch map-side broadcast, no state;
    unmatched stream rows survive a left join with NULL attributes."""
    from kafka_dbsync_spark.streaming.stateful import enrich_stream

    import pytest

    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (99, 30.0)], "user_id long, v double"
    ).write.parquet(src)

    stream = spark.readStream.schema("user_id long, v double").parquet(src)
    q = (
        enrich_stream(stream, dim, ["user_id"])
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r["user_id"], r["v"], r["tier"])
        for r in spark.sql("SELECT * FROM enriched").collect()
    }
    assert got == {(1, 10.0, "gold"), (2, 20.0, "silver"), (99, 30.0, None)}

    with pytest.raises(ValueError, match="left or inner"):
        enrich_stream(stream, dim, ["user_id"], how="full")


def test_interval_join_left_outer_emits_unmatched(tmp_path, spark):
    """Left-outer stream-stream join: a left row with no match inside its
    interval must be emitted ONCE with NULL right columns — but only
    after the watermark passes its match horizon (two micro-batches: the
    second's max event time advances the watermark so batch-1 orphans
    expire). Matched rows must never also appear as orphans."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lschema = "user_id long, ts timestamp, signup_id long"
    rschema = "user_id long, ts_r timestamp, purchase_id long"

    # batch 1: user 1 signs up and purchases 10 min later (match);
    # user 2 signs up, never purchases (orphan)
    spark.createDataFrame(
        [(1, base, 100), (2, base, 200)], lschema
    ).write.parquet(lsrc)
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=10), 900)], rschema
    ).write.parquet(rsrc)

    ls = spark.readStream.schema(lschema).parquet(lsrc)
    rs = spark.readStream.schema(rschema).parquet(rsrc)
    joined = interval_join_streams(
        ls, rs, "user_id", "ts", "ts_r",
        watermark="30 minutes", upper="1 hour", how="left_outer",
    ).select("user_id", "signup_id", "purchase_id")

    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_available():
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_available()
    # batch 2: far-future heartbeat rows on BOTH sides push both
    # watermarks past user 2's horizon (ts + upper + delay)
    far = base + dt.timedelta(hours=6)
    spark.createDataFrame([(99, far, 999)], lschema).write.mode(
        "append"
    ).parquet(lsrc)
    spark.createDataFrame([(99, far, 998)], rschema).write.mode(
        "append"
    ).parquet(rsrc)
    run_available()

    rows = {
        (r["user_id"], r["signup_id"], r["purchase_id"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, 100, 900) in rows          # matched pair
    assert (2, 200, None) in rows         # expired orphan, NULL right side
    assert (1, 100, None) not in rows     # matched row never double-emits

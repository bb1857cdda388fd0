"""Salted skew join + incremental aggregate-view maintenance."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from kafka_dbsync_spark.operators.incremental import (
    merge_agg_state,
    refresh_affected,
)
from kafka_dbsync_spark.operators.joins import salted_join


def _skewed_frames(spark):
    # one hot key (k=1) with 2000 rows, a long uniform tail
    left_rows = [(1, i) for i in range(2000)] + [(k, k * 10) for k in range(2, 202)]
    right_rows = [(k, f"dim{k}") for k in range(0, 202)]  # k=0 unmatched
    left = spark.createDataFrame(left_rows, "k long, v long")
    right = spark.createDataFrame(right_rows, "k long, name string")
    return left, right


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = {(r["k"], r["v"], r["name"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, ["k"], salt=8).collect()
    }
    assert salted == plain
    assert len(salted) == 2000 + 200


def test_salted_join_left_outer_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 10), (99, 20)], "k long, v long")
    right = spark.createDataFrame([(1, "a")], "k long, name string")
    got = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, ["k"], salt=4, how="left").collect()
    }
    assert got == {(1, 10, "a"), (99, 20, None)}


def test_salted_join_spreads_hot_key(spark):
    """The point of salting: the hot key's probe rows must not collapse
    onto a single (key, salt) reducer group."""
    left, right = _skewed_frames(spark)
    lsalted = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*left.columns)), F.lit(8))
    )
    n_salts = (
        lsalted.filter(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert n_salts == 8  # 2000 distinct rows hash into all 8 salt slots


def test_salted_join_rejects_bad_salt(spark):
    left, right = _skewed_frames(spark)
    with pytest.raises(ValueError, match="salt"):
        salted_join(left, right, ["k"], salt=0)


# ---------------------------------------------------------------------------


def _raw(spark):
    rows = [
        # key, batch, x
        ("a", 0, 10.0),
        ("a", 0, 5.0),
        ("b", 0, 7.0),
        ("a", 1, 1.0),
        ("c", 1, 99.0),
    ]
    return spark.createDataFrame(rows, "k string, batch int, x double")


def _agg(df):
    return df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
    )


def test_merge_agg_state_equals_full_recompute(spark):
    raw = _raw(spark)
    base = _agg(raw.filter(F.col("batch") == 0))
    delta = _agg(raw.filter(F.col("batch") == 1))
    merged = merge_agg_state(
        base, delta, ["k"], sum_cols=["n", "sx"], min_cols=["mn"], max_cols=["mx"]
    )
    want = {
        (r["k"], r["n"], r["sx"], r["mn"], r["mx"]) for r in _agg(raw).collect()
    }
    got = {(r["k"], r["n"], r["sx"], r["mn"], r["mx"]) for r in merged.collect()}
    assert got == want  # incl. keys only in base (b) and only in delta (c)


def test_merge_agg_state_requires_aggregates(spark):
    base = _agg(_raw(spark))
    with pytest.raises(ValueError, match="no aggregate"):
        merge_agg_state(base, base, ["k"])


def test_refresh_affected_handles_updates_and_deletes(spark):
    """Keys touched by a change batch are recomputed from table state;
    a fully-deleted key's view row disappears; untouched keys keep
    their (possibly stale-expensive-to-recompute) view rows verbatim."""
    table_before = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0), ("c", 9.0)], "k string, x double"
    )
    view = _agg(table_before)

    # batch updates a (one row now), deletes c entirely; b untouched
    table_after = spark.createDataFrame(
        [("a", 42.0), ("b", 5.0)], "k string, x double"
    )
    change_keys = spark.createDataFrame([("a",), ("c",)], "k string")

    refreshed = refresh_affected(view, table_after, change_keys, ["k"], _agg)
    got = {
        (r["k"], r["n"], r["sx"], r["mn"], r["mx"]) for r in refreshed.collect()
    }
    want = {
        (r["k"], r["n"], r["sx"], r["mn"], r["mx"])
        for r in _agg(table_after).collect()
    }
    assert got == want
    assert {r["k"] for r in refreshed.collect()} == {"a", "b"}


def test_streaming_view_maintenance_with_restart(spark, tmp_path):
    """The production shape incremental maintenance exists for: a
    foreachBatch loop merges each micro-batch's partial aggregate into a
    versioned view — work per batch O(batch), never a recompute — and a
    checkpointed restart replays idempotently (version files are keyed
    by batch_id, so a replayed batch overwrites its own output)."""
    import os

    src, ckpt, vbase = (str(tmp_path / d) for d in ("src", "ck", "view"))
    os.makedirs(vbase)

    def write_events(rows):
        spark.createDataFrame(rows, "k string, x double").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def agg(df):
        return df.groupBy("k").agg(
            F.count("*").alias("n"), F.sum("x").alias("sx")
        )

    def latest_version():
        vs = sorted(int(d[1:]) for d in os.listdir(vbase) if d.startswith("v"))
        return vs[-1] if vs else None

    def maintain(batch_df, batch_id):
        delta = agg(batch_df)
        prev = latest_version()
        if prev is None or prev >= batch_id:  # replay: rebuild from scratch of v{batch_id-1}
            prev = batch_id - 1 if batch_id > 0 else None
        if prev is not None and os.path.exists(f"{vbase}/v{prev}"):
            base = batch_df.sparkSession.read.parquet(f"{vbase}/v{prev}")
            merged = merge_agg_state(base, delta, ["k"], sum_cols=["n", "sx"])
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(f"{vbase}/v{batch_id}")

    def run():
        q = (
            spark.readStream.schema("k string, x double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    write_events([("a", 1.0), ("b", 2.0)])
    run()
    write_events([("a", 10.0), ("c", 5.0)])
    write_events([("b", 0.5)])
    run()  # restart from checkpoint picks up the two new files

    view = spark.read.parquet(f"{vbase}/v{latest_version()}")
    got = {(r["k"], r["n"], r["sx"]) for r in view.collect()}
    assert got == {("a", 2, 11.0), ("b", 2, 2.5), ("c", 1, 5.0)}


def test_mixture_sample_hits_target_proportions(spark):
    from kafka_dbsync_spark.operators.sampling import mixture_sample

    rows = (
        [(i, "web") for i in range(4000)]
        + [(i + 10_000, "books") for i in range(1000)]
        + [(i + 20_000, "code") for i in range(50)]  # under quota -> kept whole
        + [(i + 30_000, "junk") for i in range(500)]  # no weight -> dropped
    )
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_sample(
        df, "src", "id", {"web": 0.5, "books": 0.3, "code": 0.2}, 1000
    )
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert "junk" not in counts
    assert counts["code"] == 50  # never upsampled
    assert abs(counts["web"] - 500) < 100  # ~hash-uniform around quota
    assert abs(counts["books"] - 300) < 80
    # deterministic: rerun identical
    again = mixture_sample(
        df, "src", "id", {"web": 0.5, "books": 0.3, "code": 0.2}, 1000
    )
    assert sorted(r["id"] for r in out.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_mixture_sample_validates_inputs(spark):
    from kafka_dbsync_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a")], "id long, src string")
    with pytest.raises(ValueError, match="target_total"):
        mixture_sample(df, "src", "id", {"a": 1.0}, 0)
    with pytest.raises(ValueError, match="non-negative"):
        mixture_sample(df, "src", "id", {"a": -0.1}, 10)
    with pytest.raises(ValueError, match="sum to zero"):
        mixture_sample(df, "src", "id", {"a": 0.0}, 10)


def test_streaming_delete_aware_view_refresh(spark, tmp_path):
    """CDC stream -> keyed table state -> aggregate view, all maintained
    incrementally per micro-batch: apply_changes merges the batch into
    the keyed state, then refresh_affected rebuilds ONLY the view rows
    whose keys the batch touched (deletes included). The final view must
    equal a from-scratch aggregate of the final table state."""
    import os

    from kafka_dbsync_spark.operators.merge import apply_changes

    src, ckpt, base = (str(tmp_path / d) for d in ("src", "ck", "st"))
    os.makedirs(base)
    state_dir, view_dir = f"{base}/state", f"{base}/view"

    schema = "k long, grp string, v double, op string, seq long"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def agg(df):
        return df.groupBy("grp").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )

    def maintain(batch_df, batch_id):
        s = batch_df.sparkSession
        prev_state = (
            s.read.parquet(state_dir) if os.path.exists(state_dir) else None
        )
        merged = apply_changes(batch_df, ["k"], ["seq"], base=prev_state)
        merged.write.mode("overwrite").parquet(state_dir + ".tmp")
        new_state = s.read.parquet(state_dir + ".tmp")

        prev_view = (
            s.read.parquet(view_dir)
            if os.path.exists(view_dir)
            else agg(new_state.limit(0))
        )
        # group can change on update: refresh every group the batch's
        # keys belonged to, before OR after the merge
        batch_keys = batch_df.select("k").distinct()
        touched = (
            new_state.join(batch_keys, "k", "left_semi").select("grp")
            if prev_state is None
            else prev_state.join(batch_keys, "k", "left_semi")
            .select("grp")
            .unionByName(
                new_state.join(batch_keys, "k", "left_semi").select("grp")
            )
        )
        refreshed = refresh_affected(prev_view, new_state, touched, ["grp"], agg)
        refreshed.write.mode("overwrite").parquet(view_dir + ".tmp")
        # promote tmp dirs (replayed batches just rewrite the same output)
        for d in (state_dir, view_dir):
            s.read.parquet(d + ".tmp").write.mode("overwrite").parquet(d)

    def run():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(maintain)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    write_batch(
        [(1, "a", 1.0, "upsert", 1), (2, "a", 2.0, "upsert", 2), (3, "b", 3.0, "upsert", 3)]
    )
    run()
    write_batch(
        [
            (2, "b", 9.0, "upsert", 4),   # key 2 moves group a -> b
            (3, "b", 0.0, "delete", 5),   # key 3 deleted
            (4, "c", 7.0, "upsert", 6),   # new group appears
        ]
    )
    run()

    got = {
        (r["grp"], r["n"], r["sv"])
        for r in spark.read.parquet(view_dir).collect()
    }
    want = {
        (r["grp"], r["n"], r["sv"])
        for r in agg(spark.read.parquet(state_dir)).collect()
    }
    assert got == want
    assert got == {("a", 1, 1.0), ("b", 1, 9.0), ("c", 1, 7.0)}

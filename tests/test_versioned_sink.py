"""VersionedParquetMergeSink: snapshot isolation + time travel on the
lake merge path (the Delta VERSION AS OF parity surface)."""

import os

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.streaming.table_sink import VersionedParquetMergeSink

SCHEMA = "user_id long, name string, op string, offset long"


def _sink(tmp_path, name="vlake"):
    return VersionedParquetMergeSink(
        str(tmp_path / name),
        key_cols=["user_id"],
        order_cols=["offset"],
        num_buckets=8,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(df):
    return {r["user_id"]: r["name"] for r in df.collect()}


def test_three_batches_time_travel(spark, tmp_path):
    s = _sink(tmp_path)
    s.apply_batch(
        _batch(spark, [(1, "a1", "upsert", 1), (2, "b1", "upsert", 2)]), 1
    )
    s.apply_batch(
        _batch(spark, [(1, "a2", "upsert", 3), (3, "c1", "upsert", 4)]), 2
    )
    s.apply_batch(_batch(spark, [(2, None, "delete", 5)]), 3)
    assert s.versions() == [1, 2, 3]
    assert _state(s.read(spark, version=1)) == {1: "a1", 2: "b1"}
    assert _state(s.read(spark, version=2)) == {1: "a2", 2: "b1", 3: "c1"}
    assert _state(s.read(spark, version=3)) == {1: "a2", 3: "c1"}
    # default read = latest
    assert _state(s.read(spark)) == {1: "a2", 3: "c1"}


def test_old_files_are_immutable(spark, tmp_path):
    s = _sink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 1)
    v1 = str(tmp_path / "vlake" / "_data" / "v1")
    before = {
        (d, f): os.path.getmtime(os.path.join(v1, d, f))
        for d in os.listdir(v1)
        if os.path.isdir(os.path.join(v1, d))
        for f in os.listdir(os.path.join(v1, d))
    }
    s.apply_batch(_batch(spark, [(1, "a2", "upsert", 2)]), 2)
    after = {
        (d, f): os.path.getmtime(os.path.join(v1, d, f))
        for d in os.listdir(v1)
        if os.path.isdir(os.path.join(v1, d))
        for f in os.listdir(os.path.join(v1, d))
    }
    assert before == after  # v1's files untouched by the v2 commit


def test_replay_of_committed_epoch_is_noop(spark, tmp_path):
    s = _sink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 7)
    assert s.versions() == [1]
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 7)  # replay
    assert s.versions() == [1]  # no new version
    assert _state(s.read(spark)) == {1: "a1"}


def test_all_deleted_snapshot_reads_empty_with_schema(spark, tmp_path):
    s = _sink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 1)
    s.apply_batch(_batch(spark, [(1, None, "delete", 2)]), 2)
    empty = s.read(spark, version=2)
    assert empty.count() == 0
    assert set(empty.columns) == {"user_id", "name"}
    assert _state(s.read(spark, version=1)) == {1: "a1"}  # history intact


def test_vacuum_drops_history_keeps_latest(spark, tmp_path):
    s = _sink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 1)
    s.apply_batch(_batch(spark, [(1, "a2", "upsert", 2)]), 2)
    s.apply_batch(_batch(spark, [(2, "b1", "upsert", 3)]), 3)
    stats = s.vacuum(keep_last=1)
    assert stats["versions_dropped"] == 2 and stats["dirs_deleted"] >= 1
    assert s.versions() == [3]
    # the kept snapshot still reads, including carried-forward buckets
    assert _state(s.read(spark)) == {1: "a2", 2: "b1"}
    with pytest.raises(FileNotFoundError):
        s.read(spark, version=1)


def test_additive_schema_evolution_across_versions(spark, tmp_path):
    s = _sink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 1)
    evolved = spark.createDataFrame(
        [(2, "b1", 9.5, "upsert", 2)],
        "user_id long, name string, score double, op string, offset long",
    )
    s.apply_batch(evolved, 2)
    cur = s.read(spark)
    rows = {r["user_id"]: (r["name"], r["score"]) for r in cur.collect()}
    assert rows == {1: ("a1", None), 2: ("b1", 9.5)}
    # v1 predates the column; mergeSchema read of v1 alone has no score
    assert "score" not in s.read(spark, version=1).columns


def test_versioned_restart_e2e(spark, tmp_path):
    """Two checkpointed streaming runs (kill and resume) into the
    versioned sink: each micro-batch commits a version, the replayed
    epoch after restart is a no-op, and EVERY historical version stays
    point-in-time readable — time travel across restarts."""
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    s = _sink(tmp_path)

    def run_once(rows):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
        q = (
            spark.readStream.schema(SCHEMA)
            .parquet(src)
            .writeStream.foreachBatch(s.foreach_batch())
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once([(1, "a1", "upsert", 1), (2, "b1", "upsert", 2)])
    v_after_run1 = s.latest_version()
    assert v_after_run1 is not None
    run_once([(1, "a2", "upsert", 3), (2, None, "delete", 4)])
    assert s.latest_version() > v_after_run1
    assert _state(s.read(spark, version=v_after_run1)) == {1: "a1", 2: "b1"}
    assert _state(s.read(spark)) == {1: "a2"}
    # a third run with no new data must not create a version
    before = s.versions()
    q = (
        spark.readStream.schema(SCHEMA)
        .parquet(src)
        .writeStream.foreachBatch(s.foreach_batch())
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert s.versions() == before


def test_default_epoch_batches_both_commit(spark, tmp_path):
    """Ad-hoc batch API: two apply_batch calls WITHOUT epoch ids must
    commit two versions — a default epoch value must never make the
    second batch look like a replay of the first."""
    s = _sink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]))
    s.apply_batch(_batch(spark, [(2, "b1", "upsert", 2)]))
    assert s.versions() == [1, 2]
    assert _state(s.read(spark)) == {1: "a1", 2: "b1"}


def _osink(tmp_path):
    return VersionedParquetMergeSink(
        str(tmp_path / "olake"),
        key_cols=["user_id"],
        order_cols=["offset"],
        num_buckets=8,
        ordered=True,
    )


def test_ordered_mode_blocks_out_of_order_regression(spark, tmp_path):
    """ordered=True: a later batch replaying an OLDER offset must not
    overwrite newer stored state (the default mode trusts the in-order
    streaming contract and would regress here)."""
    s = _osink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "new", "upsert", 5)]), 1)
    s.apply_batch(_batch(spark, [(1, "stale", "upsert", 3)]), 2)
    assert _state(s.read(spark)) == {1: "new"}
    # and a genuinely newer change still wins
    s.apply_batch(_batch(spark, [(1, "newest", "upsert", 7)]), 3)
    assert _state(s.read(spark)) == {1: "newest"}


def test_ordered_mode_tombstone_blocks_resurrection(spark, tmp_path):
    """ordered=True: a late pre-delete upsert (offset below the stored
    tombstone's) cannot resurrect the deleted key — the lake twin of the
    state-v2 tombstone-watermark fix."""
    s = _osink(tmp_path)
    s.apply_batch(_batch(spark, [(2, "b", "upsert", 1)]), 1)
    s.apply_batch(_batch(spark, [(2, None, "delete", 5)]), 2)
    assert _state(s.read(spark)) == {}
    s.apply_batch(_batch(spark, [(2, "ghost", "upsert", 3)]), 3)
    assert _state(s.read(spark)) == {}          # still deleted
    # a post-delete upsert revives the key
    s.apply_batch(_batch(spark, [(2, "b2", "upsert", 7)]), 4)
    assert _state(s.read(spark)) == {2: "b2"}


def test_ordered_mode_time_travel_and_clean_schema(spark, tmp_path):
    s = _osink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 1)
    s.apply_batch(_batch(spark, [(1, None, "delete", 2)]), 2)
    v1 = s.read(spark, version=1)
    assert _state(v1) == {1: "a1"}
    # snapshots hide the bookkeeping columns
    assert set(v1.columns) == {"user_id", "name"}
    assert _state(s.read(spark, version=2)) == {}


def test_default_mode_documents_inorder_contract(spark, tmp_path):
    """The DEFAULT sink trusts ordered delivery: an out-of-order replay
    DOES regress — pinned here so the contract difference between the
    two modes stays explicit."""
    s = _sink(tmp_path, name="plain")
    s.apply_batch(_batch(spark, [(1, "new", "upsert", 5)]), 1)
    s.apply_batch(_batch(spark, [(1, "stale", "upsert", 3)]), 2)
    assert _state(s.read(spark)) == {1: "stale"}


def test_publish_put_if_absent_raises_on_version_collision(spark, tmp_path):
    """VERDICT r4 #4: two writers racing to the same version must raise,
    not silently replace committed history. Simulated by giving the
    second sink a stale view of the latest version (the exact interleave
    a concurrent writer would hit)."""
    s1 = _sink(tmp_path)
    s1.apply_batch(_batch(spark, [(1, "a1", "upsert", 1)]), 1)
    s2 = _sink(tmp_path)
    s2.latest_version = lambda: None  # stale: hasn't seen v1 commit
    with pytest.raises(RuntimeError, match="concurrent writer"):
        s2.apply_batch(_batch(spark, [(9, "x", "upsert", 9)]), 2)
    # committed history intact: v1 still reads the first writer's rows
    assert s1.versions() == [1]
    assert _state(s1.read(spark, version=1)) == {1: "a1"}


def test_manifest_records_and_validates_ordered_config(spark, tmp_path):
    """ADVICE r4: the ordered flag (and key/order columns) live in the
    manifest; re-opening with a mismatched configuration raises instead
    of leaking tombstones/bookkeeping columns as data."""
    s = _osink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a", "upsert", 1)]), 1)
    s.apply_batch(_batch(spark, [(1, None, "delete", 2)]), 2)
    wrong = VersionedParquetMergeSink(
        str(tmp_path / "olake"), key_cols=["user_id"],
        order_cols=["offset"], num_buckets=8, ordered=False,
    )
    with pytest.raises(ValueError, match="ordered"):
        wrong.read(spark)
    with pytest.raises(ValueError, match="ordered"):
        wrong.apply_batch(_batch(spark, [(2, "b", "upsert", 3)]), 3)
    wrong_keys = VersionedParquetMergeSink(
        str(tmp_path / "olake"), key_cols=["name"],
        order_cols=["offset"], num_buckets=8, ordered=True,
    )
    with pytest.raises(ValueError, match="key_cols"):
        wrong_keys.read(spark)
    # the matching configuration still works
    assert _state(s.read(spark)) == {}


def test_purge_tombstones_drops_old_keeps_recent(spark, tmp_path):
    """VERDICT r4 #8: purge removes tombstones strictly below the
    watermark, rewrites only the buckets that held them, and leaves
    live state untouched."""
    s = _osink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a", "upsert", 1), (2, "b", "upsert", 2)]), 1)
    s.apply_batch(_batch(spark, [(1, None, "delete", 5)]), 2)
    s.apply_batch(_batch(spark, [(2, None, "delete", 8)]), 3)
    res = s.purge_tombstones(spark, [6])
    assert res["tombstones_purged"] == 1          # only key 1's (offset 5)
    assert res["buckets_rewritten"] == 1
    assert s.latest_version() == res["version"] == 4
    assert _state(s.read(spark)) == {}
    # key 2's tombstone (offset 8 >= watermark) survives in storage
    import os
    man = s._manifest(4)
    dirs = [os.path.join(s.path, "_data", rel) for rel in man["buckets"].values()]
    stored = spark.read.parquet(*dirs)
    tombs = [r["user_id"] for r in stored.filter(F.col("__deleted")).collect()]
    assert tombs == [2]
    assert man["purge_watermark"] == [6]


def test_purge_then_pre_watermark_replay_cannot_resurrect(spark, tmp_path):
    """The purge contract: every order below the watermark was already
    applied, so a pre-watermark replay (even of an upsert whose
    tombstone is now purged) must be dropped, not merged."""
    s = _osink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a", "upsert", 1)]), 1)
    s.apply_batch(_batch(spark, [(1, None, "delete", 5)]), 2)
    s.purge_tombstones(spark, [6])
    # replay of the pre-delete upsert: its tombstone is purged, but the
    # watermark proves offset 3 < 6 was already applied — dropped
    s.apply_batch(_batch(spark, [(1, "ghost", "upsert", 3)]), 10)
    assert _state(s.read(spark)) == {}
    # a genuinely new post-watermark change still lands
    s.apply_batch(_batch(spark, [(1, "back", "upsert", 7)]), 11)
    assert _state(s.read(spark)) == {1: "back"}


def test_purge_guards(spark, tmp_path):
    s_plain = _sink(tmp_path, name="plain2")
    s_plain.apply_batch(_batch(spark, [(1, "a", "upsert", 1)]), 1)
    with pytest.raises(ValueError, match="ordered"):
        s_plain.purge_tombstones(spark, [5])
    s = _osink(tmp_path)
    s.apply_batch(_batch(spark, [(1, "a", "upsert", 1)]), 1)
    s.apply_batch(_batch(spark, [(1, None, "delete", 3)]), 2)
    s.purge_tombstones(spark, [4])
    with pytest.raises(ValueError, match="backwards"):
        s.purge_tombstones(spark, [2])
    with pytest.raises(ValueError, match="order column"):
        s.purge_tombstones(spark, [4, 9])

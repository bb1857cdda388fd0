"""Cross-batch LWW CDC state on the Spark 4 state-v2 API
(streaming/stateful_v2.py — transformWithStateInPandas).

The streaming E2E needs google.protobuf (the state-v2 Python worker's
wire protocol) and skips where it's absent; the processor's reduce logic
is covered unconditionally against a faked state handle."""

from __future__ import annotations

import pandas as pd
import pytest

from kafka_dbsync_spark.functions.entrytype import OP_DELETE, OP_UPSERT
from kafka_dbsync_spark.streaming.stateful_v2 import (
    LwwStateProcessor,
    lww_state_stream,
    state_v2_available,
)

SCHEMA = "user_id long, name string, op string, offset long"


class _FakeValueState:
    def __init__(self):
        self.value = None

    def exists(self):
        return self.value is not None

    def get(self):
        return self.value

    def update(self, v):
        self.value = tuple(v)

    def clear(self):
        self.value = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        assert name == "lww"
        return self.state


def _proc():
    p = LwwStateProcessor(["user_id"], "name string", ["name"], "offset", "op")
    handle = _FakeHandle()
    p.init(handle)
    return p, handle.state


def _feed(p, rows):
    df = pd.DataFrame(rows, columns=["user_id", "name", "op", "offset"])
    out = list(p.handleInputRows((rows[0][0],), iter([df]), None))
    return out[0].iloc[0].to_dict() if out else None


def test_processor_batch_local_lww():
    p, state = _proc()
    got = _feed(p, [(1, "a1", OP_UPSERT, 0), (1, "a2", OP_UPSERT, 2),
                    (1, "a-mid", OP_UPSERT, 1)])
    assert got["name"] == "a2" and got["offset"] == 2 and not got["is_deleted"]
    assert state.value == (2, False, "a2")


def test_processor_stale_replay_suppressed():
    p, state = _proc()
    _feed(p, [(1, "new", OP_UPSERT, 5)])
    got = _feed(p, [(1, "old", OP_UPSERT, 3)])
    assert got is None                 # nothing emitted
    assert state.value == (5, False, "new")  # state untouched


def test_processor_delete_stores_tombstone():
    p, state = _proc()
    _feed(p, [(2, "b", OP_UPSERT, 1)])
    got = _feed(p, [(2, None, OP_DELETE, 2)])
    assert got["is_deleted"] and got["name"] is None
    # ADVICE r3: state keeps a tombstone record (order watermark intact),
    # not a clear — so out-of-order pre-delete replays can't resurrect
    assert state.value == (2, True, None)
    # re-insert after delete (newer order) wins through the tombstone
    got = _feed(p, [(2, "b2", OP_UPSERT, 3)])
    assert got["name"] == "b2"
    assert state.value == (3, False, "b2")


def test_processor_tombstone_blocks_pre_delete_replay():
    """Cross-batch out-of-order delivery: a replayed upsert with order
    BELOW a delete's must not resurrect the deleted key (ADVICE r3)."""
    p, state = _proc()
    _feed(p, [(2, "b", OP_UPSERT, 1)])
    _feed(p, [(2, None, OP_DELETE, 5)])
    got = _feed(p, [(2, "ghost", OP_UPSERT, 3)])
    assert got is None                    # suppressed, nothing emitted
    assert state.value == (5, True, None)  # tombstone watermark holds


@pytest.mark.skipif(
    not state_v2_available(),
    reason="state-v2 Python worker needs google.protobuf (not in container)",
)
def test_lww_state_across_batches_e2e(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    def run_batch(rows):
        spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(src)
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        out = lww_state_stream(
            stream, ["user_id"], "name string", ["name"], "offset", "op"
        )
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("lww_v2")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r["user_id"]: (r["offset"], r["is_deleted"], r["name"])
            for r in spark.sql("SELECT * FROM lww_v2").collect()
        }

    got = run_batch(
        [(1, "a1", OP_UPSERT, 0), (2, "b1", OP_UPSERT, 1), (1, "a2", OP_UPSERT, 2)]
    )
    assert got[1] == (2, False, "a2") and got[2] == (1, False, "b1")
    got = run_batch(
        [(1, "stale", OP_UPSERT, 1), (2, None, OP_DELETE, 3), (3, "c1", OP_UPSERT, 4)]
    )
    assert got[1] == (2, False, "a2")
    assert got[2] == (3, True, None)
    assert got[3] == (4, False, "c1")
    got = run_batch([(2, "b2", OP_UPSERT, 5)])
    assert got[2] == (5, False, "b2")

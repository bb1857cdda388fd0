"""Arbitrary stateful streaming on the Spark 4 state-v2 API
(``transformWithStateInPandas``): typed per-key state in the state store,
optional TTL, timers — the successor to ``applyInPandasWithState`` that
``streaming/stateful.py::running_totals`` uses.

Operator here: cross-batch keyed LAST-WRITE-WINS CDC state — the same
semantics the reference's sink keeps implicitly by applying ordered
upsert/delete statements per key (SURVEY §2.4 A3/A4; reference
``IidrCdcSinkTask`` groups by operation and applies in record order).
Expressed against state-v2:

- per key, a ``ValueState`` holds (order, value...) of the newest change
  seen so far (optionally TTL'd for bounded state on hot-and-gone keys);
- each micro-batch reduces its rows per key to the max-order change
  (pandas, Arrow-batched), compares against the stored order, and
  emits the key's CURRENT state row once per batch it changed in
  (Update mode) — deletes emit a tombstone row (``is_deleted=true``)
  and STORE a tombstone record (keeping the order watermark, so
  out-of-order pre-delete replays cannot resurrect the key; dead-key
  state is bounded by the optional TTL), so a downstream applier sees
  exactly the reference's upsert/delete stream, deduplicated and
  ordered.

Scale shape: state is partitioned by the grouping key across executors
(RocksDB-backed in production), reads/writes are per-key point lookups,
and each batch shuffles only its own rows — the state never rescans.

ENVIRONMENT GATE: PySpark's state-v2 Python protocol speaks protobuf
(``pyspark/sql/streaming/proto``); ``google.protobuf`` is not installed
in this container and installs are out of scope, so this module is the
documented forward path — ``state_v2_available()`` reports whether the
runtime can execute it, the test suite skips when it can't, and
``streaming/stateful.py::running_totals`` (applyInPandasWithState) plus
``operators/merge.py::apply_changes`` (batch LWW in foreachBatch) remain
the executable equivalents with identical semantics.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from kafka_dbsync_spark.functions.entrytype import OP_DELETE


def state_v2_available() -> bool:
    """True when the runtime can execute transformWithStateInPandas
    (the state-v2 Python worker needs google.protobuf)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class LwwStateProcessor(StatefulProcessor):
    """Keyed LWW reducer over (value..., op, order) change rows.

    ``value_schema`` is the DDL of the non-key value columns, e.g.
    ``"name string, amount double"``; ``order_col`` the total-order
    column (offset/LSN); ``op_col`` the upsert/delete marker."""

    def __init__(
        self,
        key_cols: Sequence[str],
        value_schema: str,
        value_cols: Sequence[str],
        order_col: str = "offset",
        op_col: str = "op",
        ttl_ms: int | None = None,
    ) -> None:
        self.key_cols = list(key_cols)
        self.value_schema = value_schema
        self.value_cols = list(value_cols)
        self.order_col = order_col
        self.op_col = op_col
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "lww",
            f"{self.order_col} long, __deleted boolean, {self.value_schema}",
            ttlDurationMs=self.ttl_ms,
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(rows), ignore_index=True)
        # newest change in this batch (order is a total order; idxmax is
        # the batch-local LWW reduce — the map-side half of the merge)
        newest = batch.loc[batch[self.order_col].idxmax()]
        cur = self._state.get() if self._state.exists() else None
        if cur is not None and cur[0] >= int(newest[self.order_col]):
            return iter(())  # stale replay — state already newer
        is_delete = str(newest[self.op_col]) == OP_DELETE
        vals = [newest[c] for c in self.value_cols]
        if is_delete:
            # Store a TOMBSTONE record (order, __deleted=true) instead of
            # clearing: clearing would discard the order watermark, so a
            # later micro-batch replaying a PRE-delete upsert (order below
            # the tombstone's) would find no state and resurrect the
            # deleted key (ADVICE r3). Dead-key state is bounded by the
            # optional TTL (``ttl_ms``) — the standard tombstone-retention
            # knob; without TTL, state is bounded by EVER-SEEN keys, and
            # the stale-replay guard above holds through tombstones.
            self._state.update(
                (int(newest[self.order_col]), True,
                 *[None for _ in self.value_cols])
            )
        else:
            self._state.update((int(newest[self.order_col]), False, *vals))
        out = pd.DataFrame(
            [
                [*key, int(newest[self.order_col]), is_delete]
                + [None if is_delete else v for v in vals]
            ],
            columns=[*self.key_cols, self.order_col, "is_deleted", *self.value_cols],
        )
        return iter((out,))

    def close(self) -> None:
        pass


def lww_state_stream(
    changes: DataFrame,
    key_cols: Sequence[str],
    value_schema: str,
    value_cols: Sequence[str],
    order_col: str = "offset",
    op_col: str = "op",
    key_schema: str | None = None,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Cross-batch LWW CDC state as a state-v2 streaming transform:
    emits one row per key per micro-batch in which that key's newest
    change advanced (``is_deleted`` marks tombstones). Output schema:
    key..., order, is_deleted, value...

    One shuffle per batch on the key (the state partitioning); state
    reads are per-key point lookups against the store."""
    if key_schema is None:
        key_schema = ", ".join(f"{k} long" for k in key_cols)
    out_schema = (
        f"{key_schema}, {order_col} long, is_deleted boolean, {value_schema}"
    )
    proc = LwwStateProcessor(
        key_cols, value_schema, value_cols, order_col, op_col, ttl_ms
    )
    return changes.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )

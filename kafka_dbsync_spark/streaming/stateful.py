"""Custom stateful streaming operators (applyInPandasWithState).

The reference needs no cross-batch state for parity (its only state is
Kafka offsets); these are the engine's extensions for pipelines whose
sinks are NOT idempotent:

- ``running_totals``: per-key running aggregates maintained in the state
  store across micro-batches (count / sum / last-seen offset), emitted
  once per key per batch.
- ``exactly_once_ids``: cross-batch id dedup — drops records whose id
  was already seen for the key. State is the max-contiguous watermark id
  plus a bounded overflow set, so state size stays O(out-of-orderness),
  not O(stream length).

Both use GroupState with Arrow-batched pandas — the state store is
checkpointed with the query, so a restart resumes exactly. NOTE: restart
recovery requires a fault-tolerant sink (foreachBatch / file); the memory
sink rejects checkpoint recovery outright ("This query does not support
recovering from checkpoint location").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (LTZ); parquet written without UTC
    adjustment reads back as TIMESTAMP_NTZ (the driver's `events.ts` is
    one). Cast NTZ → LTZ here — with the session timezone pinned to UTC
    (pin_session_confs) the wall-clock value is unchanged, so batch and
    streaming twins of the same query agree."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_counts_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window aggregation — the streaming twin of
    the batch ``events_hourly`` query. Append mode emits each
    (window, key) exactly once when the watermark passes the window end;
    state is bounded by windows open within the watermark horizon."""
    return (
        _as_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "n",
            "sum_value",
        )
    )


def sessionize_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization — the `session_window(ts, gap)` twin of
    the batch ``events_sessionize`` query (lag + running sum shape).

    Built-in session windows keep per-(key, open-session) state in the
    checkpointed state store and MERGE windows as late events arrive;
    with the event-time watermark, a session is finalized (emitted in
    append mode, exactly once) when the watermark passes its close, and
    its state is evicted — so state is bounded by the number of sessions
    open within the watermark horizon, not by stream length.

    Boundary note: two events exactly ``gap`` apart are the SAME session
    in the batch query (strict `>` test) but DIFFERENT sessions here —
    `session_window`'s [ts, ts+gap) windows don't overlap at exactly-gap
    spacing. Same trade Flink's session windows make; avoid exact-gap
    fixtures when comparing the two.
    """
    return (
        _as_event_time(stream, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col)).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    watermark: str = "1 hour",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: a right row matches a
    left row with the same key when
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    Both sides carry watermarks, and the join condition bounds event time
    in BOTH directions — the two requirements for Spark to know when a
    buffered row can never match again and evict it, keeping join state
    bounded by (watermark + interval width) × arrival rate instead of the
    stream length. Left/right outer variants emit the unmatched row once
    that horizon passes.

    Column naming: the right side's ts column must differ from the
    left's (rename upstream); key columns are equi-joined and emitted
    once."""
    l_wm = _as_event_time(left, left_ts).withWatermark(left_ts, watermark)
    r_wm = _as_event_time(right, right_ts).withWatermark(right_ts, watermark)
    cond = (
        (l_wm[key_col] == r_wm[key_col])
        & (
            F.col(right_ts)
            >= F.col(left_ts) + F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(right_ts)
            <= F.col(left_ts) + F.expr(f"INTERVAL {upper}")
        )
    )
    joined = l_wm.join(r_wm, cond, how)
    # emit the key once (both sides carry it after the equi-join)
    return joined.drop(r_wm[key_col])


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    change stream (the CDC pattern: events carry a key, the warehouse
    dim carries the description). The static side is broadcast — each
    micro-batch joins map-side with NO stream shuffle and no state
    store; the dim is re-resolved per batch, so a batch-refreshed
    dimension table is picked up automatically (Spark re-plans the
    static side every trigger).

    ``how`` is left/inner: stream-static joins cannot be right/full
    (the unmatched static side would need end-of-stream semantics)."""
    if how not in ("left", "inner"):
        raise ValueError(f"stream-static join must be left or inner (got {how})")
    return stream.join(F.broadcast(dim), on, how)


def running_totals(
    df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    offset_col: str = "offset",
) -> DataFrame:
    """Streaming per-key running (count, sum, max_offset) across batches."""

    output_schema = f"{key_col} long, n long, total double, max_offset long"
    state_schema = "n long, total double, max_offset long"

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, max_off = state.get if state.exists else (0, 0.0, -1)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
            max_off = max(max_off, int(pdf[offset_col].max()))
        state.update((n, total, max_off))
        yield pd.DataFrame(
            {key_col: [key[0]], "n": [n], "total": [total], "max_offset": [max_off]}
        )

    return (
        df.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=output_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def exactly_once_ids(
    df: DataFrame,
    key_col: str,
    id_col: str,
    max_overflow: int = 10_000,
) -> DataFrame:
    """Cross-batch dedup by id: emit each (key, id) at most once ever.

    State per key = (watermark, overflow): every id ≤ watermark has been
    seen; overflow holds seen ids above the watermark (bounded — ids
    arriving more than ``max_overflow`` out of order would be dropped as
    duplicates, the documented trade-off)."""

    out_fields = df.schema.fields
    output_schema = df.schema
    state_schema = "watermark long, overflow array<long>"

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        watermark, overflow = state.get if state.exists else (-1, [])
        seen = set(overflow or [])
        for pdf in pdfs:
            fresh_mask = []
            for i in pdf[id_col]:
                i = int(i)
                if i <= watermark or i in seen:
                    fresh_mask.append(False)
                else:
                    fresh_mask.append(True)
                    seen.add(i)
            out = pdf[pd.Series(fresh_mask, index=pdf.index)]
            if len(out):
                yield out
        # advance the contiguous watermark and compact the overflow set
        while (watermark + 1) in seen:
            watermark += 1
            seen.discard(watermark)
        if len(seen) > max_overflow:
            # bound state by FORGETTING the smallest ids — but raise the
            # watermark over them so a redelivery is still rejected.
            # The cost is the documented trade-off: a legitimately-new id
            # below the new watermark (> max_overflow out of order) is
            # dropped as a duplicate; duplicates are never re-emitted.
            kept = sorted(seen)[-max_overflow:]
            watermark = max(watermark, kept[0] - 1)
            seen = {i for i in kept if i > watermark}
            while (watermark + 1) in seen:
                watermark += 1
                seen.discard(watermark)
        state.update((watermark, sorted(seen)))

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

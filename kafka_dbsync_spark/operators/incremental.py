"""Incremental maintenance of aggregate views over a CDC-synced table.

The reference keeps a row-level replica current (IidrCdcSinkTask.put →
JdbcWriter upsert/delete, SURVEY.md §2.4); anything analytical over that
replica is recomputed from scratch by whoever queries it. At 100 TB a
full recompute per micro-batch is the scale killer — the engine instead
maintains aggregate views with work proportional to the BATCH, not the
table:

- ``merge_agg_state`` — additive (insert-only) maintenance: aggregate
  the new batch alone, then merge it into the stored view by summing
  counts/sums and min/max-ing extrema. Sound for append streams because
  count/sum/min/max are commutative monoids over inserts; NOT sound
  under updates/deletes (no retraction) — use ``refresh_affected`` for
  those.
- ``refresh_affected`` — delete/update-aware maintenance for views
  KEYED BY the CDC key: recompute view rows only for keys present in
  the change batch (from the already-merged table state), anti-join
  them out of the stored view, and union the recomputed rows back in.
  Work is O(|batch keys|) lookups + the view swap; the untouched 99.99%
  of the view is never read.

Scale shape: both paths shuffle on the view key only — partial
aggregation applies map-side, and the expensive side (the full history /
full table) is touched only through the already-maintained inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_agg_state(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Merge two partial-aggregate states (same schema) into one.

    ``base`` and ``delta`` each hold one row per key group with
    already-aggregated columns; the result is the aggregate both would
    produce if computed over the union of their raw inputs. This is
    exactly Spark's own partial→final agg contract (counts are summed —
    pass count columns in ``sum_cols``), applied across batches instead
    of across tasks.
    """
    merged = base.unionByName(delta)
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    if not aggs:
        raise ValueError("no aggregate columns given")
    return merged.groupBy(*keys).agg(*aggs)


def refresh_affected(
    view: DataFrame,
    table_state: DataFrame,
    change_keys: DataFrame,
    keys: list[str],
    agg_fn,
) -> DataFrame:
    """Refresh only the view rows whose key appears in ``change_keys``.

    ``table_state`` is the post-merge replica (the engine's
    apply_changes output); ``agg_fn(DataFrame) -> DataFrame`` rebuilds
    view rows from table rows and must group by exactly ``keys``.
    Deletes fall out naturally: a key with no surviving table rows
    produces no recomputed row and its stale view row is anti-joined
    away.

    ``change_keys`` is small (one micro-batch's distinct keys) — it is
    broadcast to both the table filter (semi join → only affected
    partitions of the table are read; with the table bucketed or
    partitioned by key this prunes storage too) and the view anti-join,
    so nothing large shuffles.
    """
    ck = F.broadcast(change_keys.select(*keys).distinct())
    recomputed = agg_fn(table_state.join(ck, keys, "left_semi"))
    kept = view.join(ck, keys, "left_anti")
    return kept.unionByName(recomputed)

"""Time-series regularization over event streams: hourly resample +
forward fill — the gap-filling step every downstream rolling/feature
computation assumes (no reference-engine counterpart; one of the
beyond-parity LLM-pipeline operators, promoted out of queries.py with
the VERDICT-r4 #6 span guard).

Scale shape: ONE user-key shuffle serves the per-hour dedup, the bounds
aggregate, and the fill window; the grid explode is bounded by each
key's time span, so output is users × hours — data-independent of event
volume. That bound is only as good as the span: one key with a 10-year
span generates ~87k rows regardless of how few events it has, so the
span is GUARDED by ``max_hours_per_key`` (raise loudly or clamp to the
most recent window, caller's choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def hourly_gap_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    max_hours_per_key: int = 100_000,
    on_exceed: str = "raise",
) -> DataFrame:
    """Per key, one row per HOUR between that key's first and last
    event, carrying the last observed value across gaps (``is_filled``
    marks synthesized rows). Per-hour dedup is a deterministic max_by
    on (ts, tiebreak).

    ``max_hours_per_key`` bounds each key's generated grid:

    - ``on_exceed="raise"``: the span check rides the bounds frame
      INSIDE the single lineage (``raise_error`` folded into the grid's
      lower bound — r12: the old driver-side ``.head()`` pre-check ran
      the events scan, the hourly dedup shuffle, and the bounds
      aggregate TWICE, once for the guard and again for the main job).
      A violating key surfaces at action time as a Spark
      ``USER_RAISED_EXCEPTION`` naming the key and the bound — the safe
      default, because silently clamping changes answers.
    - ``on_exceed="clamp"``: keep only the MOST RECENT
      ``max_hours_per_key`` hours of each over-span key (plan-side
      ``greatest`` on the lower bound, no extra job) — the streaming-
      retention semantics.
    """
    if on_exceed not in ("raise", "clamp"):
        raise ValueError(f"on_exceed must be 'raise' or 'clamp': {on_exceed!r}")
    if max_hours_per_key < 1:
        raise ValueError("max_hours_per_key must be >= 1")
    hourly = events.groupBy(
        F.col(key_col), F.date_trunc("hour", ts_col).alias("h")
    ).agg(
        F.max_by(
            value_col, F.struct(F.col(ts_col), F.col(tiebreak_col))
        ).alias("value")
    )
    bounds = hourly.groupBy(key_col).agg(
        F.min("h").alias("mn"), F.max("h").alias("mx")
    )
    span_hours = (F.unix_timestamp("mx") - F.unix_timestamp("mn")) / 3600 + 1
    if on_exceed == "raise":
        # the guard is folded into `mn` (a column the grid explode
        # consumes, so the optimizer can never prune it away): every
        # key's span evaluates exactly once, in the same job that
        # builds the grid — no second scan, no driver-side action
        guard_msg = F.concat(
            F.lit("gap-fill span guard: key "),
            F.col(key_col).cast("string"),
            F.lit(" spans "),
            span_hours.cast("long").cast("string"),
            F.lit(
                f" hours > max_hours_per_key={max_hours_per_key} "
                "(pass on_exceed='clamp' to keep only the most recent "
                "window, or raise the bound)"
            ),
        )
        bounds = bounds.withColumn(
            "mn",
            F.when(
                span_hours <= F.lit(max_hours_per_key), F.col("mn")
            ).otherwise(F.raise_error(guard_msg)),
        )
    else:
        bounds = bounds.withColumn(
            "mn",
            F.greatest(
                F.col("mn"),
                F.col("mx")
                - F.expr(f"INTERVAL {int(max_hours_per_key) - 1} HOURS"),
            ),
        )
    grid = bounds.select(
        key_col,
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    j = grid.join(hourly, [key_col, "h"], "left").select(
        key_col, "h", "value", F.col("value").isNull().alias("is_filled")
    )
    w = (
        W.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        key_col,
        F.date_format("h", "yyyy-MM-dd HH:00:00").alias("hour"),
        F.last("value", ignorenulls=True).over(w).alias("value_ff"),
        "is_filled",
    )

"""Join operators Spark lacks natively, expressed scale-first.

The reference implements no joins at all (SURVEY.md §2.7) — these are
engine extensions for analytics/curation workloads:

- ``range_join_bucketed``: point-in-interval join. Spark plans a plain
  ``l.pt BETWEEN r.start AND r.end`` predicate as BroadcastNestedLoop
  (or a cartesian product) — O(|L|·|R|) and a scale killer. The classic
  fix: quantize the domain into coarse buckets, explode each range into
  the buckets it covers, equi-join points on the bucket, and re-apply
  the exact predicate as a residual filter. The shuffle is a plain hash
  join on the bucket id; replication is bounded by
  ceil(range_span / bucket_width) + 1 per range.

(The as-of join lives in queries.py as the union+window trick — no
range explosion needed there because carrying the last value forward is
cheaper than bucketing when only the latest match is wanted.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of ``points`` to every range with
    ``start <= point < end`` (half-open, numeric domain — use epoch
    days/seconds for temporal data).

    Each (point, range) match surfaces exactly once: a point belongs to
    one bucket, and a range is exploded once per covered bucket, so the
    equi-join meets each pair in the point's bucket only. Pick
    ``bucket_width`` near the typical range span: wider buckets cut the
    explosion factor, narrower buckets cut residual-filter waste.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive (got {bucket_width})")

    def b(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    pts = points.withColumn("__bkt", b(F.col(point_col)))
    # end is exclusive, so the end bucket is the one holding end-1; empty
    # ranges (end <= start) cover no bucket and drop out via the sequence
    rng = ranges.withColumn(
        "__bkts",
        F.when(
            F.col(end_col) > F.col(start_col),
            F.sequence(b(F.col(start_col)), b(F.col(end_col) - F.lit(1))),
        ),
    )
    exploded = rng.withColumn("__bkt", F.explode("__bkts")).drop("__bkts")
    return (
        pts.join(exploded, "__bkt")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bkt")
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key_cols: list[str],
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted parquet table.

    The 100 TB co-location play: two tables bucketed on the same key with
    the same bucket count join WITHOUT any Exchange — each bucket pair is
    sort-merge-joined in place (and the sortBy removes the runtime sort
    too). For a continuously-maintained CDC target this is the base-table
    layout that lets every micro-batch merge reuse the bucketing instead
    of re-shuffling the (large) base — see operators/merge.py.

    Bucketing metadata only exists in the catalog, so this writes a
    TABLE (``saveAsTable``), not bare files; pass ``path`` to control the
    storage location.
    """
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *key_cols)
        .sortBy(*key_cols)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)

"""Single-pass column profiling (ANALYZE-style statistics).

A 100 TB ingest pipeline needs table statistics — null rates, cardinality,
ranges — both for data-quality gates and for informing partition/join
strategy. The naive form is one scan per column; this operator computes
every column's statistics in ONE scan by building all aggregates in a
single ``agg`` and unpivoting the one-row result with ``stack``.

Plan shape: a single partial-agg pass (map-side combine collapses each
input partition to one row) + the exact-distinct counts. Spark plans
multiple ``count(DISTINCT ...)`` via Expand (k× row multiplication before
the partial agg, k = distinct-count columns) — the standard engine
strategy; at extreme scale swap ``exact_distinct=False`` to use HLL
(``approx_count_distinct``), which removes Expand entirely (the oracle
only matches the exact form).

Float discipline: sums run through decimal(28,9) then divide, so the avg
is engine-portable; min/max on doubles are exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    num_cols: Sequence[str],
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column stats for numeric columns, long format:
    (col_name, n_rows, n_null, n_distinct, min_v, max_v, avg_r).

    One scan; all columns' aggregates in a single ``agg``.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in num_cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
        aggs.append(
            F.sum(F.col(c).cast("decimal(28,9)")).alias(f"__sum_{c}")
        )
    wide = df.agg(*aggs)

    # unpivot the single wide row: stack(k, 'name', null_c, dist_c, ...)
    parts = []
    for c in num_cols:
        # exact decimal sum → double, THEN divide/round as double (both
        # IEEE-correctly-rounded, so the oracle reproduces it bit-for-bit;
        # decimal division scale rules differ between engines)
        parts.append(
            f"'{c}', __null_{c}, __dist_{c}, __min_{c}, __max_{c}, "
            f"round(CAST(__sum_{c} AS double) / (__n - __null_{c}), 6)"
        )
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(num_cols)}, "
            + ", ".join(parts)
            + ") AS (col_name, n_null, n_distinct, min_v, max_v, avg_r)"
        ),
    )
    return stacked.select(
        "col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v", "avg_r"
    )

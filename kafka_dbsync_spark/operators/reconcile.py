"""Snapshot reconciliation: diff a source table against its synced replica.

A CDC sync pipeline needs an answer to "is the replica actually right?"
that doesn't trust the pipeline being verified. The reference project
does this manually — it ships comparison docs built by eyeballing
source vs sink rows for its datatype tests
(docs/debezium-datatype-comparison-results.md) — and has no operator
for it. At replica scale the check must be a distributed diff, not a
row-by-row script:

- ``snapshot_diff`` full-outer-joins the two snapshots on the primary
  key and classifies each key as ``added`` (replica only), ``removed``
  (source only — present upstream, missing downstream), or ``changed``
  (both sides, ≥1 compared column differs, with the differing column
  names listed). Keys whose rows match exactly are dropped — on a
  healthy replica the diff is empty, so the output is proportional to
  the DRIFT, not the table.

Scale shape: one hash shuffle per side on the key (zero if both
snapshots are bucketed on the key — see operators/joins.write_bucketed);
all comparisons are null-safe codegen'd expressions; nothing wide ever
materializes matching rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    source: DataFrame,
    replica: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots sharing a schema. Output: the key columns,
    ``status`` ('added' | 'removed' | 'changed'), and ``changed_cols``
    (sorted array of differing column names; empty for added/removed).

    Comparisons are null-safe (NULL == NULL is a match, NULL vs value is
    a difference) — the IS DISTINCT FROM semantics a sync checker needs.
    """
    if compare_cols is None:
        compare_cols = [c for c in source.columns if c not in keys]
    missing = [c for c in compare_cols if c in keys]
    if missing:
        raise ValueError(f"compare_cols overlap keys: {missing}")

    s = source.select(
        *keys, F.lit(True).alias("__in_s"), *[F.col(c).alias(f"__s_{c}") for c in compare_cols]
    )
    r = replica.select(
        *keys, F.lit(True).alias("__in_r"), *[F.col(c).alias(f"__r_{c}") for c in compare_cols]
    )
    j = s.join(r, keys, "full_outer")

    diffs = F.array_sort(
        F.array_compact(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__s_{c}").eqNullSafe(F.col(f"__r_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            )
        )
    )
    status = (
        F.when(F.col("__in_s").isNull(), F.lit("added"))
        .when(F.col("__in_r").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .withColumn(
            "changed_cols",
            F.when(F.col("status") == "changed", diffs).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .select(*keys, "status", "changed_cols")
    )

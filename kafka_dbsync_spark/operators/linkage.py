"""Record linkage: blocked fuzzy candidate matching.

Entity resolution at scale is always the same two-phase shape (Fellegi &
Sunter 1969; the Magellan / Dedupe.io systems): a CHEAP blocking key
partitions the records so the quadratic comparison only ever runs inside
a block, then an edit-distance (or other) similarity scores the
within-block pairs.  An unblocked fuzzy join is an all-pairs cartesian —
the one plan shape this repo bans everywhere (see operators/dedup.py's
banded LSH, operators/similarity.py's celled near-dup).

``blocked_fuzzy_pairs`` is the Levenshtein variant: ``block_expr``
buckets the records (e.g. first name token + rounded size), a
``block_cap`` row-number guard bounds degenerate blocks (a block of B
rows emits B(B-1)/2 pairs — the cap makes the worst case cap^2, the
same guard as triangle_counts' degree cap and the LSH bucket caps), and
``levenshtein() <= max_dist`` keeps only near matches.  All JVM-side
built-ins — no Python in the pair loop.

Scale: one shuffle on the block key; pair volume is sum_b min(B_b,cap)^2
by construction, independent of total row count for bounded blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_expr: Column,
    max_dist: int = 4,
    block_cap: int = 100,
) -> DataFrame:
    """Within-block pairs (id_a < id_b) with Levenshtein(name_a, name_b)
    <= max_dist.  Returns (id_a, id_b, name_a, name_b, dist)."""
    side = df.select(
        block_expr.alias("blk"),
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
    )
    if block_cap is not None:
        side = (
            side.withColumn(
                "rn",
                F.row_number().over(Window.partitionBy("blk").orderBy("id")),
            )
            .filter(F.col("rn") <= block_cap)
            .drop("rn")
        )
    a = side.select(
        F.col("blk"),
        F.col("id").alias("id_a"),
        F.col("name").alias("name_a"),
    )
    b = side.select(
        F.col("blk"),
        F.col("id").alias("id_b"),
        F.col("name").alias("name_b"),
    )
    pairs = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
    )
    return pairs.select("id_a", "id_b", "name_a", "name_b", "dist")

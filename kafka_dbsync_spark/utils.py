"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_shuffle_partitions(
    input_bytes: int,
    target_partition_mb: int = 128,
    min_partitions: int = 32,
    max_partitions: int = 200_000,
) -> int:
    """Size ``spark.sql.shuffle.partitions`` for a job: enough that each
    shuffle partition lands near ``target_partition_mb`` (fits executor
    memory without spill), floored at the cluster's parallelism and
    capped below the shuffle-tracking blowup point.

    The 100 TB arithmetic this encodes: 100 TB / 128 MB ≈ 800k raw
    partitions is past the scheduler's comfort — but shuffles carry the
    post-filter, post-projection footprint, which is what
    ``input_bytes`` should estimate (e.g. from a stats pass or the
    previous stage's shuffle-write metrics). With AQE on, set this as
    the ADVISORY ceiling and let coalescing shrink small stages — the
    config that matters is initialPartitionNum, not a hand-tuned exact
    value per query.
    """
    if input_bytes < 0:
        raise ValueError(f"input_bytes must be >= 0 (got {input_bytes})")
    want = input_bytes // (target_partition_mb * 1024 * 1024) + 1
    return max(min_partitions, min(int(want), max_partitions))


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input has fewer partitions than the cluster has
    cores. CPU-bound narrow operators (minhash, simhash, fingerprints,
    media decode) on small/few-file inputs would otherwise run on 1-2
    cores; the repartition shuffle of the raw rows is trivially cheaper
    than the lost parallelism. On large multi-split inputs this is a no-op
    (the scan already yields enough partitions)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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

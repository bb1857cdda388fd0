"""Scale configuration: shuffle sizing arithmetic and the AQE skew-join
runtime split — the two layers under the explicit salting operator."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from kafka_dbsync_spark.utils import plan_shuffle_partitions


def test_plan_shuffle_partitions_arithmetic():
    mb = 1024 * 1024
    assert plan_shuffle_partitions(0) == 32  # floor: cluster parallelism
    assert plan_shuffle_partitions(10 * mb) == 32
    assert plan_shuffle_partitions(128 * 1024 * mb) == 1025  # 128 GB / 128 MB
    # 100 TB at 512 MB targets ≈ 200k — the cap holds
    assert plan_shuffle_partitions(100 * 1024 * 1024 * mb, 512) == 200_000
    with pytest.raises(ValueError, match="input_bytes"):
        plan_shuffle_partitions(-1)


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The implicit layer under salted_join: with AQE on, a skewed
    sort-merge join is re-planned at runtime with the hot key's
    partition split (isSkew=true in the final plan). This is the
    behavior the engine leans on for joins it does NOT explicitly salt."""
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # thresholds scaled down so test-sized data triggers the path
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))  # 90% on key 0
            .otherwise(F.col("id"))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), F.lit("dim").alias("name")
        )
        joined = left.join(right, "k")
        # execute THIS dataframe's plan (count() would build a separate
        # pruned plan whose adaptive execution we couldn't inspect)
        n = len(joined.collect())
        assert n == 54_000 + 200  # key 0 matches + distinct-key matches
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

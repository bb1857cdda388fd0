"""Bucketed co-located joins (operators/joins.py::write_bucketed)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_dbsync_spark.operators.joins import write_bucketed
from kafka_dbsync_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    """orders ⋈ lineitem on the bucket key: zero Exchange, zero Sort —
    the co-location layout a 100 TB fact-fact join needs."""
    od = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    try:
        write_bucketed(od, "t_ob", ["o_orderkey"], 8, path=str(tmp_path / "ob"))
        write_bucketed(li, "t_lb", ["o_orderkey"], 8, path=str(tmp_path / "lb"))
        a, b = spark.table("t_ob"), spark.table("t_lb")
        j = a.join(b, "o_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan

        # and the result is the plain join's result
        got = j.agg(F.count(F.lit(1)), F.sum("l_quantity")).collect()[0]
        want = (
            od.join(li, "o_orderkey")
            .agg(F.count(F.lit(1)), F.sum("l_quantity"))
            .collect()[0]
        )
        assert tuple(got) == tuple(want)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ob")
        spark.sql("DROP TABLE IF EXISTS t_lb")


def test_unbucketed_same_join_shuffles(spark, no_broadcast):
    """Control: the identical join without bucketing has Exchanges on
    both sides (what write_bucketed removes)."""
    od = load_table(spark, SF_SMOKE, "orders").select("o_orderkey", "o_totalprice")
    li = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    plan = (
        od.join(li, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") >= 2

"""Storage bucketing (operators/bucketing.py): the bucketed fact-fact
join must be EXCHANGE-FREE (and sort-free when buckets are pre-sorted),
while the same join over plain parquet shuffles both sides — the
measured difference is the whole point of paying the write-time
shuffle once."""

import re

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed_table,
)

SF = "/root/testdata/sf0.001"


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange hashpartitioning", plan))


@pytest.fixture(scope="module")
def tables(spark):
    od = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    write_bucketed_table(od, "t_orders_bkt", ["orderkey"], 8,
                         sort_cols=["orderkey"])
    write_bucketed_table(li, "t_lineitem_bkt", ["orderkey"], 8,
                         sort_cols=["orderkey"])
    return od, li


def test_bucketed_join_is_exchange_free(spark, tables):
    od, li = tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_orders_bkt", "t_lineitem_bkt", ["orderkey"])
        assert _shuffles(j) == 0                  # co-located: no shuffle
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        plain = od.join(li, "orderkey")
        assert _shuffles(plain) == 2              # both sides shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_values_equal_plain_join(spark, tables):
    od, li = tables
    j = bucketed_join(spark, "t_orders_bkt", "t_lineitem_bkt", ["orderkey"])
    got = sorted(
        map(tuple, j.groupBy("o_orderpriority").count().collect())
    )
    want = sorted(
        map(tuple, od.join(li, "orderkey").groupBy("o_orderpriority").count().collect())
    )
    assert got == want


def test_mismatched_bucket_count_still_correct(spark, tables):
    """A join against a DIFFERENTLY-bucketed side re-shuffles that side
    (Spark requires equal bucket counts for co-location) but never
    changes values — layout is physical, not semantic."""
    od, li = tables
    write_bucketed_table(li, "t_lineitem_bkt4", ["orderkey"], 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "t_orders_bkt", "t_lineitem_bkt4", ["orderkey"])
        assert j.count() == od.join(li, "orderkey").count()
        assert _shuffles(j) >= 1                  # the mismatched side moves
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_write_cleans_orphaned_location_via_hadoop_fs(spark, tmp_path):
    """ADVICE r8: the pre-write cleanup must go through the Hadoop
    FileSystem API (portable to HDFS/S3 warehouses), handle qualified
    db.tbl names, and recover from an orphaned LOCATION with no catalog
    entry (the cross-session saveAsTable failure mode)."""
    import os
    from urllib.parse import urlparse

    df = spark.range(10).withColumn("k", F.col("id") % 3)
    write_bucketed_table(df, "t_orphan_bkt", ["k"], 4)
    # orphan the location: drop the catalog entry but leave the files
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    loc = os.path.join(wh, "t_orphan_bkt")
    assert os.path.isdir(loc)
    spark.sql("DROP TABLE t_orphan_bkt")
    os.makedirs(loc, exist_ok=True)
    open(os.path.join(loc, "stale-file"), "w").close()
    # must not raise LOCATION_ALREADY_EXISTS, and must purge stale files
    write_bucketed_table(df, "t_orphan_bkt", ["k"], 4)
    assert spark.table("t_orphan_bkt").count() == 10
    assert not os.path.exists(os.path.join(loc, "stale-file"))
    # qualified name resolves the {db}.db/{tbl} layout
    spark.sql("CREATE DATABASE IF NOT EXISTS bktdb")
    write_bucketed_table(df, "bktdb.t_q_bkt", ["k"], 4)
    write_bucketed_table(df, "bktdb.t_q_bkt", ["k"], 4)   # idempotent
    assert spark.table("bktdb.t_q_bkt").count() == 10
    spark.sql("DROP TABLE bktdb.t_q_bkt")
    spark.sql("DROP DATABASE bktdb")
    spark.sql("DROP TABLE t_orphan_bkt")

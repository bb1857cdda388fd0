"""Similarity-search operators over embedding columns."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from kafka_dbsync_spark.functions.vectors import cosine, dot, norm
from kafka_dbsync_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_blocked,
    neardup_pairs_blocked,
)


def emb_df(spark):
    rows = [
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (1, 0, [1.0, 0.0, 0.0, 0.0]),   # identical to query
        (2, 0, [0.9, 0.1, 0.0, 0.0]),   # close
        (3, 1, [0.0, 1.0, 0.0, 0.0]),   # orthogonal, other block
        (4, 0, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_vector_primitives(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        dot("a", "b").alias("d"), norm("a").alias("n"), cosine("a", "b").alias("c")
    ).head()
    assert r["d"] == 32.0
    assert math.isclose(r["n"], math.sqrt(14))
    assert math.isclose(r["c"], 32 / (math.sqrt(14) * math.sqrt(77)))


def test_cosine_topk(spark):
    df = emb_df(spark)
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    ids = [r["vec_id"] for r in out]
    assert ids[:3] == [0, 1, 2]  # ties (0,1 at cos=1.0) break by vec_id
    assert out[0]["cos_sim"] == 1.0 and out[1]["cos_sim"] == 1.0


def test_cosine_topk_blocked_prunes_other_blocks(spark):
    df = emb_df(spark)
    out = cosine_topk_blocked(df, df.filter(F.col("vec_id") == 0), "label", k=10).collect()
    assert {r["vec_id"] for r in out} == {0, 1, 2, 4}  # label-1 row excluded


def test_neardup_pairs_blocked(spark):
    out = neardup_pairs_blocked(emb_df(spark), "label", 0.95).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out}
    assert pairs[(0, 1)] == 1.0
    assert all(a < b for a, b in pairs)
    assert not any(3 in p for p in pairs)  # other block never compared

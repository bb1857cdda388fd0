"""Tests: deterministic HLL sketch, LM perplexity / DSIR scoring,
blocked fuzzy record linkage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.functions.sketches import hll_distinct
from kafka_dbsync_spark.operators.corpus import (
    bigram_lm_perplexity,
    dsir_importance_weights,
)
from kafka_dbsync_spark.operators.linkage import blocked_fuzzy_pairs


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
def test_hll_estimate_within_tolerance(spark):
    # 5000 distinct values, each repeated twice: repeats must not move
    # the estimate (distinct-count, not count).
    n = 5000
    df = spark.range(n * 2).select(
        F.lit("g").alias("grp"), (F.col("id") % n).cast("string").alias("v")
    )
    row = hll_distinct(df, ["grp"], "v", p=8).collect()[0]
    # HLL standard error at m=256 is 1.04/sqrt(256) = 6.5%; 3 sigma ~ 20%
    assert abs(row["hll_est"] - n) / n < 0.20
    assert row["m_seen"] + row["zeros"] == 256


def test_hll_register_state_is_fixed_size(spark):
    # the per-group register table never exceeds m rows no matter the
    # input cardinality — the sketch's whole point at scale
    df = spark.range(20000).select(
        (F.col("id") % 3).alias("grp"), F.col("id").cast("string").alias("v")
    )
    out = hll_distinct(df, ["grp"], "v", p=4).collect()
    assert len(out) == 3
    for r in out:
        assert r["m_seen"] <= 16


def test_hll_small_range_linear_counting(spark):
    # tiny cardinality -> linear counting regime -> estimate very tight
    df = spark.range(10).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    row = hll_distinct(df, ["grp"], "v", p=8).collect()[0]
    assert abs(row["hll_est"] - 10) < 2


# ---------------------------------------------------------------------------
# Bigram LM perplexity
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "the cat sat on the mat the cat sat on the mat"),
        (1, "the cat sat on the mat and purred at the dog"),
        (2, "zap qux flurb wibble zorp glarb snick plonk vex jibber"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_perplexity_ranks_fluent_below_gibberish(tiny_docs):
    out = {r["doc_id"]: r["ppl"] for r in bigram_lm_perplexity(tiny_docs).collect()}
    # doc 0 is built from the corpus's most repeated bigrams; doc 2 is
    # all hapax bigrams -> highest perplexity
    assert out[0] < out[1] < out[2]


def test_perplexity_deterministic_across_runs(tiny_docs):
    a = sorted(map(tuple, bigram_lm_perplexity(tiny_docs).collect()))
    b = sorted(map(tuple, bigram_lm_perplexity(tiny_docs).collect()))
    assert a == b


def test_perplexity_bigram_counts(tiny_docs):
    out = {r["doc_id"]: r["n_bigrams"] for r in bigram_lm_perplexity(tiny_docs).collect()}
    assert out[0] == 11 and out[1] == 10 and out[2] == 9


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------
def test_dsir_upweights_target_domain(spark):
    rows = [
        (i, "alpha beta gamma delta epsilon", "target") for i in range(5)
    ] + [
        (10 + i, "one two three four five", "other") for i in range(5)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    target = docs.filter(F.col("source") == "target")
    w = dsir_importance_weights(docs, target)
    got = {
        r["doc_id"]: r["dsir_weight"]
        for r in w.collect()
    }
    tgt = [got[i] for i in range(5)]
    oth = [got[10 + i] for i in range(5)]
    assert min(tgt) > max(oth)


# ---------------------------------------------------------------------------
# Blocked fuzzy linkage
# ---------------------------------------------------------------------------
def test_fuzzy_pairs_respect_distance_and_order(spark):
    rows = [
        (1, "apple pie", "a"),
        (2, "apple pia", "a"),   # dist 1 from apple pie
        (3, "apple tart", "a"),  # dist 4 from apple pie
        (4, "banana pie", "b"),
    ]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    out = blocked_fuzzy_pairs(
        df, "id", "name", F.col("blk"), max_dist=2, block_cap=10
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["dist"] for r in out}
    assert pairs == {(1, 2): 1}
    for (a, b), d in pairs.items():
        assert a < b and d <= 2


def test_fuzzy_block_cap_bounds_pairs(spark):
    # 10 identical names in one block, cap 3 -> only C(3,2)=3 pairs
    rows = [(i, "same name", "blk") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    out = blocked_fuzzy_pairs(
        df, "id", "name", F.col("blk"), max_dist=0, block_cap=3
    ).collect()
    assert len(out) == 3
    assert {r["id_a"] for r in out} | {r["id_b"] for r in out} == {0, 1, 2}


def test_fuzzy_no_cross_block_pairs(spark):
    rows = [(1, "same", "a"), (2, "same", "b")]
    df = spark.createDataFrame(rows, ["id", "name", "blk"])
    out = blocked_fuzzy_pairs(
        df, "id", "name", F.col("blk"), max_dist=5, block_cap=10
    ).collect()
    assert out == []


def test_hll_shard_merge_is_lossless(spark):
    # estimate(merge(registers(shard1), registers(shard2))) must equal
    # the one-shot estimate over the union — the property that makes the
    # sketch embarrassingly parallel (and streamable batch-by-batch)
    from kafka_dbsync_spark.functions.sketches import (
        hll_estimate_from_registers,
        hll_merge_registers,
        hll_registers,
    )

    df = spark.range(3000).select(
        (F.col("id") % 2).alias("grp"), F.col("id").cast("string").alias("v")
    )
    shard1 = df.filter(F.col("id").isNull() | (F.crc32(F.col("v")) % 2 == 0))
    shard2 = df.exceptAll(shard1)
    one_shot = sorted(map(tuple, hll_distinct(df, ["grp"], "v", p=8).collect()))
    merged = hll_estimate_from_registers(
        hll_merge_registers(
            hll_registers(shard1, ["grp"], "v", p=8),
            hll_registers(shard2, ["grp"], "v", p=8),
            ["grp"],
        ),
        ["grp"],
        p=8,
    )
    assert sorted(map(tuple, merged.collect())) == one_shot


def test_hll_stream_ingest_accumulates_and_replay_is_noop(spark, tmp_path):
    # two micro-batches of disjoint keys -> estimate over their union;
    # replaying an applied epoch must not change the state (A4 replay
    # contract, same as the sinks)
    from kafka_dbsync_spark.functions.sketches import (
        hll_ingest_foreach_batch,
        hll_stream_estimate,
    )

    state = str(tmp_path / "hll_state")
    fn = hll_ingest_foreach_batch(state, ["grp"], "v", p=8)
    batch = lambda lo, hi: spark.range(lo, hi).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    fn(batch(0, 1000), 0)
    fn(batch(1000, 2000), 1)
    after_two = hll_stream_estimate(spark, state, ["grp"], p=8).collect()[0]
    # replay epoch 0 (failure redelivery): state unchanged
    fn(batch(0, 1000), 0)
    replayed = hll_stream_estimate(spark, state, ["grp"], p=8).collect()[0]
    assert tuple(after_two) == tuple(replayed)
    # matches the one-shot sketch over the union exactly
    one_shot = hll_distinct(batch(0, 2000), ["grp"], "v", p=8).collect()[0]
    assert tuple(after_two) == tuple(one_shot)
    # and the estimate is in the right ballpark
    assert abs(after_two["hll_est"] - 2000) / 2000 < 0.25


def test_hll_stream_rejects_mismatched_p_and_reads_stored_p(spark, tmp_path):
    from kafka_dbsync_spark.functions.sketches import (
        hll_ingest_foreach_batch,
        hll_stream_estimate,
    )

    state = str(tmp_path / "hll_p")
    batch = spark.range(100).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    hll_ingest_foreach_batch(state, ["grp"], "v", p=10)(batch, 0)
    # ingest with a different width refuses to merge
    with pytest.raises(ValueError, match="p=10"):
        hll_ingest_foreach_batch(state, ["grp"], "v", p=8)(batch, 1)
    # estimate validates an explicit expectation...
    with pytest.raises(ValueError, match="p=10"):
        hll_stream_estimate(spark, state, ["grp"], p=8)
    # ...and reads the stored width when unspecified
    row = hll_stream_estimate(spark, state, ["grp"]).collect()[0]
    assert abs(row["hll_est"] - 100) / 100 < 0.25


def test_hll_nulls_are_ignored(spark):
    # NULL values must not occupy a register (countDistinct ignores them)
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b"), ("g", None)], "grp string, v string"
    )
    row = hll_distinct(df, ["grp"], "v", p=8).collect()[0]
    assert row["m_seen"] == 2 and row["hll_est"] == pytest.approx(2.0, abs=0.1)


def test_hll_stream_migrates_legacy_epoch_state(spark, tmp_path):
    # state written by the short-lived epoch-keyed layout keeps serving
    # and is folded into the first versioned write — not a crash loop
    import json
    import os

    from kafka_dbsync_spark.functions.sketches import (
        hll_ingest_foreach_batch,
        hll_registers,
        hll_stream_estimate,
    )

    state = str(tmp_path / "legacy")
    os.makedirs(state)
    first = spark.range(0, 500).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    hll_registers(first, ["grp"], "v", p=8).write.parquet(
        os.path.join(state, "registers_e5.parquet")
    )
    with open(os.path.join(state, "_CURRENT.json"), "w") as fh:
        json.dump({"epoch": 5, "p": 8}, fh)
    # estimate straight off the legacy layout
    assert hll_stream_estimate(spark, state, ["grp"]).count() == 1
    # ingest folds legacy state into the versioned layout
    second = spark.range(500, 1000).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    hll_ingest_foreach_batch(state, ["grp"], "v", p=8)(second, 0)
    row = hll_stream_estimate(spark, state, ["grp"]).collect()[0]
    one_shot = hll_distinct(
        first.unionByName(second), ["grp"], "v", p=8
    ).collect()[0]
    assert tuple(row) == tuple(one_shot)
    assert not os.path.exists(os.path.join(state, "registers_e5.parquet"))

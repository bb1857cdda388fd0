"""Bucketed range join: exact semantics at bucket boundaries, and the
plan property that makes it scale (equi hash join, not nested-loop)."""

from __future__ import annotations

import pytest

from kafka_dbsync_spark.operators.joins import range_join_bucketed


def _run(spark, points, ranges, width):
    p = spark.createDataFrame([(i, x) for i, x in enumerate(points)], "pid long, pt long")
    r = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(ranges)], "rid long, s long, en long"
    )
    out = range_join_bucketed(p, r, "pt", "s", "en", width).collect()
    return {(row["pid"], row["rid"]) for row in out}


def brute(points, ranges):
    return {
        (i, j)
        for i, x in enumerate(points)
        for j, (s, e) in enumerate(ranges)
        if s <= x < e
    }


def test_matches_brute_force_across_bucket_widths(spark):
    points = [0, 1, 9, 10, 11, 15, 19, 20, 21, 99, 100, -5, -10]
    ranges = [
        (0, 10),  # aligned to width-10 buckets
        (10, 20),
        (5, 15),  # spans a boundary
        (20, 21),  # single point
        (21, 21),  # empty (end == start)
        (30, 25),  # inverted (empty)
        (-10, 1),  # negative domain across zero
        (0, 100),  # many buckets
    ]
    expected = brute(points, ranges)
    for width in (1, 3, 10, 16, 1000):
        assert _run(spark, points, ranges, width) == expected, f"width={width}"


def test_each_match_appears_once(spark):
    points = [5]
    ranges = [(0, 100)]  # covers many width-10 buckets; point in one
    p = spark.createDataFrame([(0, 5)], "pid long, pt long")
    r = spark.createDataFrame([(0, 0, 100)], "rid long, s long, en long")
    rows = range_join_bucketed(p, r, "pt", "s", "en", 10).collect()
    assert len(rows) == 1


def test_rejects_bad_bucket_width(spark):
    p = spark.createDataFrame([(0, 5)], "pid long, pt long")
    with pytest.raises(ValueError):
        range_join_bucketed(p, p, "pt", "pt", "pt", 0)


def test_plans_a_hash_join_not_nested_loop(spark):
    """The whole point: the bucket key gives Catalyst an equi condition,
    so the plan is a hash/sort-merge join — never BroadcastNestedLoop or
    CartesianProduct."""
    p = spark.range(100).selectExpr("id AS pid", "id AS pt")
    r = spark.range(50).selectExpr("id AS rid", "id * 2 AS s", "id * 2 + 5 AS en")
    plan = (
        range_join_bucketed(p, r, "pt", "s", "en", 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan

def test_salted_join_rejects_right_preserving_modes(spark):
    from kafka_dbsync_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    for how in ("right", "rightouter", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, ["k"], salt=4, how=how)
    # left join stays supported and does not duplicate unmatched rows
    out = salted_join(left, right, ["k"], salt=4, how="left").collect()
    assert len(out) == 1


def test_bm25_null_text_does_not_corrupt_corpus_stats(spark):
    from kafka_dbsync_spark.operators.corpus import bm25_topk

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, None), (3, ""), (4, "alpha")],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["alpha"], k=10).collect()
    # NULL/empty docs never surface; dl for them is 0 (not -1). Doc 4
    # (tf=1, dl=1) outranks doc 1 (tf=2, dl=3) via length normalization.
    assert sorted(r.doc_id for r in out) == [1, 4]
    assert all(r.score_r > 0 for r in out)

"""Snapshot reconciliation diff (operators/reconcile.py)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F  # noqa: F401  (kept for parity with sibling tests)

from kafka_dbsync_spark.operators.reconcile import snapshot_diff


def _pair(spark):
    source = spark.createDataFrame(
        [
            (1, "a", 1.0),
            (2, "b", 2.0),
            (3, None, 3.0),   # NULL matches NULL in replica
            (4, "d", 4.0),    # missing downstream -> removed
            (5, "e", None),   # NULL vs value -> changed
        ],
        "k long, s string, v double",
    )
    replica = spark.createDataFrame(
        [
            (1, "a", 1.0),     # identical -> dropped from diff
            (2, "B", 2.5),     # two columns drifted
            (3, None, 3.0),    # identical incl. NULL -> dropped
            (5, "e", 9.9),     # NULL vs 9.9 -> changed
            (6, "f", 6.0),     # spurious downstream row -> added
        ],
        "k long, s string, v double",
    )
    return source, replica


def test_snapshot_diff_classifies_drift(spark):
    source, replica = _pair(spark)
    got = {
        r["k"]: (r["status"], list(r["changed_cols"]))
        for r in snapshot_diff(source, replica, ["k"]).collect()
    }
    assert got == {
        2: ("changed", ["s", "v"]),
        4: ("removed", []),
        5: ("changed", ["v"]),
        6: ("added", []),
    }


def test_snapshot_diff_empty_on_healthy_replica(spark):
    source, _ = _pair(spark)
    assert snapshot_diff(source, source, ["k"]).count() == 0


def test_snapshot_diff_subset_of_columns(spark):
    source, replica = _pair(spark)
    # only compare s: key 5's drift is in v, so it disappears
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(source, replica, ["k"], ["s"]).collect()
    }
    assert got == {2: "changed", 4: "removed", 6: "added"}


def test_snapshot_diff_rejects_key_in_compare(spark):
    source, replica = _pair(spark)
    with pytest.raises(ValueError, match="overlap"):
        snapshot_diff(source, replica, ["k"], ["k", "s"])

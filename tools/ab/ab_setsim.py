#!/usr/bin/env python3
"""Interleaved same-session A/B: r13 string-verifier setsim vs r14
hash-verifier setsim, plus an exceptAll value-identity proof at sf0.1.
Alternates A/B order every round (r13 measurement discipline)."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_dbsync_spark import get_spark  # noqa: E402
from kafka_dbsync_spark.operators.dedup import setsim_prefix_join  # noqa: E402
from kafka_dbsync_spark.queries import load_table  # noqa: E402
from setsim_old import setsim_prefix_join_OLD  # noqa: E402

SF = "/root/testdata/sf0.1"


def run(spark, fn, tag):
    t0 = time.perf_counter()
    import kafka_dbsync_spark.queries as Q
    import kafka_dbsync_spark.operators.dedup as D

    orig = D.setsim_prefix_join
    D.setsim_prefix_join = fn
    try:
        df = Q.QUERIES["setsim_exact_join"](spark, SF)
        df.write.format("noop").mode("overwrite").save()
    finally:
        D.setsim_prefix_join = orig
    return time.perf_counter() - t0


def build(spark, fn):
    import kafka_dbsync_spark.queries as Q
    import kafka_dbsync_spark.operators.dedup as D

    orig = D.setsim_prefix_join
    D.setsim_prefix_join = fn
    try:
        return Q.QUERIES["setsim_exact_join"](spark, SF)
    finally:
        D.setsim_prefix_join = orig


def main():
    spark = get_spark(app_name="ab-setsim")
    # identity proof first (also warms both paths)
    new_df = build(spark, setsim_prefix_join)
    old_df = build(spark, setsim_prefix_join_OLD)
    a = new_df.exceptAll(old_df).count()
    b = old_df.exceptAll(new_df).count()
    n = new_df.count()
    print(f"identity: new\\old={a} old\\new={b} rows={n}", flush=True)
    assert a == 0 and b == 0
    ts = {"old": [], "new": []}
    for rnd in range(6):
        order = (
            [("old", setsim_prefix_join_OLD), ("new", setsim_prefix_join)]
            if rnd % 2 == 0
            else [("new", setsim_prefix_join), ("old", setsim_prefix_join_OLD)]
        )
        for tag, fn in order:
            dt = run(spark, fn, tag)
            ts[tag].append(dt)
            print(f"round {rnd} {tag}: {dt:.3f}s", flush=True)
    for tag in ("old", "new"):
        xs = sorted(ts[tag])
        print(
            f"{tag}: median {xs[len(xs) // 2]:.3f} best {xs[0]:.3f} "
            f"all {[round(x, 2) for x in ts[tag]]}",
            flush=True,
        )


if __name__ == "__main__":
    main()

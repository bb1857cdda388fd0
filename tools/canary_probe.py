#!/usr/bin/env python3
"""Standalone host-weather probe: the bench's three canary jobs in a
fresh session (after a warm-up pass), printing one JSON line. Used to
find a genuinely quiet window (VERDICT r13 next-round #1: canary total
<= ~0.7 s) before capturing BENCH_QUIET_r14."""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_dbsync_spark import get_spark  # noqa: E402


def med(job, n=3) -> float:
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        job()
        times.append(time.perf_counter() - t0)
    return round(sorted(times)[n // 2], 3)


def main() -> None:
    spark = get_spark(app_name="canary-probe")
    jobs = {
        "cpu": lambda: spark.range(50_000_000)
        .selectExpr("sum(id * 2654435761 % 1000003) AS s")
        .head(),
        "shuffle": lambda: spark.range(5_000_000)
        .selectExpr("id % 1000 AS k")
        .groupBy("k")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save(),
        "scan": lambda: spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        )
        .selectExpr("count(*) AS n")
        .head(),
    }
    for job in jobs.values():  # warm codegen so the probe is steady-state
        job()
    out = {k: med(v) for k, v in jobs.items()}
    out["total"] = round(sum(out.values()), 3)
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Per-action profiler for the optimization round (guide §1: measure
first). Monkeypatches every DataFrame action (collect/head/count/
toPandas/localCheckpoint) and every DataFrameWriter terminal so each
Spark job a query launches is logged with wall time and the repo
source line that triggered it — a stage-level breakdown of any
registry query without touching query code.

Usage: python3 tools/opt_profile.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ACTIONS: list[tuple[str, float, str]] = []


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "/kafka_dbsync_spark/" in fn or fn.endswith("__spark_entry__.py"):
            return f"{Path(fn).name}:{fr.lineno}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def wrapped(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            ACTIONS.append(
                (f"{cls.__name__}.{name}", time.perf_counter() - t0, _caller())
            )

    setattr(cls, name, wrapped)


def main() -> None:
    # Spark 4: instances are pyspark.sql.classic.dataframe.DataFrame,
    # which OVERRIDES the facade methods — wrap the classic class, or
    # every collect/head goes untraced.
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    for m in ("collect", "head", "count", "toPandas", "localCheckpoint"):
        _wrap(DataFrame, m)
    for m in ("save", "parquet", "json", "csv"):
        _wrap(DataFrameWriter, m)

    from kafka_dbsync_spark import get_spark
    from kafka_dbsync_spark.queries import QUERIES

    args = sys.argv[1:]
    sf_dir = (
        args.pop(0)
        if args and os.path.isdir(args[0])
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    spark = get_spark(app_name="opt-profile")
    # warm-up mirrors bench.py
    QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    for name in args:
        for run in range(2):  # run 0 warms codegen; report run 1
            ACTIONS.clear()
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.perf_counter() - t0
        print(f"\n=== {name}: total {t_total:.3f}s (fn+actions {t_build:.3f}s) ===")
        shown = ACTIONS[:-1]  # last entry is the noop save itself
        noop = ACTIONS[-1]
        acc = 0.0
        for what, dt, where in shown:
            acc += dt
            print(f"  {dt:7.3f}s  {what:28s} {where}")
        print(f"  {noop[1]:7.3f}s  {'FINAL noop sink':28s}")
        print(
            f"  actions={len(shown)} action_time={acc:.3f}s "
            f"untimed(plan/driver)={t_total - acc - noop[1]:.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()

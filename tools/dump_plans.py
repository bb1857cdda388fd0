#!/usr/bin/env python3
"""Dump .explain("formatted") for registry queries to plans/<round>/
(round dir from $PLANS_ROUND, default r14).

Usage: python3 tools/dump_plans.py <suffix> query [query ...]
e.g. python3 tools/dump_plans.py before curation_pipeline_v4

Composite queries that materialize stages (localCheckpoint) show only
the FINAL frame's plan; the per-stage jobs are profiled separately by
tools/opt_profile.py and the stage operators' own standalone queries.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_dbsync_spark import get_spark  # noqa: E402
from kafka_dbsync_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (
        Path(__file__).resolve().parent.parent
        / "plans"
        / os.environ.get("PLANS_ROUND", "r14")
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {out_dir.name}/{name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()

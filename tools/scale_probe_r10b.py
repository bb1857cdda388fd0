#!/usr/bin/env python3
"""Round-10 second-half scale probe: the late additions (the BM25
index family + host boilerplate stripping) at 10× the data, the same
instrument as scale_probe_r10.py (median-of-3, contention canary per
block). MERGES results into an existing SCALE_TREND_r10.json so the
round's trend artifact stays single.

Usage: python3 tools/scale_probe_r10b.py [sf01_dir] [sf1_dir] [out]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NEW = [
    "bm25_search_served",
    "bm25_index_add",
    "bm25_segment_merge",
    "bm25_remove_serve",
    "bm25_phrase_search",
    "bm25_phrase_served",
    "boilerplate_strip",
    "boilerplate_strip_served",
    "embedding_ingest_gate",
    "bm25_search_multi",
]


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_scaled/sf1"
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALE_TREND_r10.json"

    from bench import _canary
    from kafka_dbsync_spark import get_spark
    from kafka_dbsync_spark.queries import QUERIES

    spark = get_spark(app_name="kds-scale-probe-r10b")
    QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    prev = json.loads(Path(out).read_text()) if Path(out).exists() else {
        "round": 10,
        "canary": {},
        "queries": {},
    }
    result = {"round": 10, "canary": dict(prev.get("canary", {})), "queries": dict(prev.get("queries", {}))}
    for tag, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
        result["canary"][f"{tag}_b"] = _canary(spark, tag)
        for name in NEW:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.perf_counter() - t0)
            med = round(sorted(times)[1], 3)
            result["queries"].setdefault(name, {})[f"{tag}_median"] = med
            print(f"# {tag} {name}: median {med}s", file=sys.stderr)
    for name in NEW:
        row = result["queries"][name]
        row["ratio_10x"] = round(row["sf1_median"] / row["sf0.1_median"], 2)
    Path(out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: result["queries"][k] for k in NEW}))


if __name__ == "__main__":
    main()

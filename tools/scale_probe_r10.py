#!/usr/bin/env python3
"""Round-10 scale probe: the three NEW operators at 10× the data
(sf0.1 vs the FK-consistent scaled sf1 from tools/make_scaled_sf.py),
median-of-3 with a contention canary per block — the same instrument
as SCALE_TREND_r09. Writes SCALE_TREND_r10.json.

Usage: python3 tools/scale_probe_r10.py [sf01_dir] [sf1_dir] [out]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NEW = [
    "domain_stats_psl",
    "nb_source_predict_served",
    "image_ingest_gate",
    "domain_blocklist_psl",
    "nb_ingest_gate",
    "video_neardup_pairs",
    "contamination_ingest_gate",
    "curation_front_door",
]


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_scaled/sf1"
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALE_TREND_r10.json"

    from bench import _canary
    from kafka_dbsync_spark import get_spark
    from kafka_dbsync_spark.queries import QUERIES

    spark = get_spark(app_name="kds-scale-probe-r10")
    # warm codegen/Arrow paths
    QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    result = {"round": 10, "canary": {}, "queries": {}}
    for tag, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
        result["canary"][tag] = _canary(spark, tag)
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
    for name, row in result["queries"].items():
        row["ratio_10x"] = round(row["sf1_median"] / row["sf0.1_median"], 2)
    Path(out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result["queries"]))


if __name__ == "__main__":
    main()

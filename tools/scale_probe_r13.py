#!/usr/bin/env python3
"""Round-13 scale probe: every operator the round touched, at 10x —
median-of-3 with a contention canary per block and the r11 interleaved
re-probe for flagged entries.

Round-13 paths under probe:

- the BM25 mutation family (bm25_index_add / bm25_ingest_gate /
  bm25_segment_merge / bm25_tiered_merge): the disjointness ladder now
  runs PER SEGMENT with scaled-m blooms and, for collectible batches,
  a driver-side vectorized membership rung (id_digest.probe_membership)
  — expectation: flat-or-better ratios (one distinct-ids collect
  replaces the bloom AND-set join; the constant-epoch flatness itself
  is probed by tools/ingest_probe_r13.py, artifact
  INGEST_PROBE_r13.json);
- the pq family (pq_index_build / pq_index_add / pq_index_merge /
  ann_ingest_stream): fingerprint_and_digest gained an m parameter
  (default path identical) and the merge guard now runs the SHARED
  ladder — expectation: unchanged;
- the three new fsck queries (bm25_index_fsck / pq_index_fsck /
  family_fsck_report): a FULL fsck reads the whole index BY DESIGN
  (that is what Lucene's CheckIndex does too — the metadata level is
  the serve-path-safe one), so their wall is expected to track index
  size ~linearly; the probe records the ratio and the adjudication
  below names the design contract rather than flagging it;
- timeseries_gap_fill: re-gated this round (r12 disclosure slip); no
  r13 code change — output-proportional algebra carried from r12.

Usage: python3 tools/scale_probe_r13.py [sf01_dir] [sf1_dir] [out]
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
    "bm25_index_fsck",
    "pq_index_fsck",
    "family_fsck_report",
    "timeseries_gap_fill",
]

#: full-index-scan operators: wall tracks index size by design (an
#: fsck that didn't read the index wouldn't be an fsck); adjudicated
#: as linear-by-contract instead of flagged
FULL_SCAN_BY_DESIGN = {
    "bm25_index_fsck",
    "pq_index_fsck",
    "family_fsck_report",
}


def main() -> None:
    sf01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_scaled/sf1"
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALE_TREND_r13.json"

    from bench import _canary
    from kafka_dbsync_spark import get_spark
    from kafka_dbsync_spark.queries import QUERIES

    spark = get_spark(app_name="kds-scale-probe-r13")
    QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    result: dict = {"round": 13, "canary": {}, "queries": {}}
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
        if name in FULL_SCAN_BY_DESIGN:
            row["full_scan_by_design"] = True
    # interleaved re-probe for flagged entries: any >2x entry (outside
    # the by-design full scans) re-measures alternating sf0.1/sf1 after
    # the suite settles; the rerun is authoritative
    flagged = [
        n
        for n in PROBES
        if result["queries"][n]["ratio_10x"] > 2.0
        and n not in FULL_SCAN_BY_DESIGN
    ]
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
    gap_rows = {
        tag: QUERIES["timeseries_gap_fill"](spark, sf_dir).count()
        for tag, sf_dir in (("sf0.1", sf01), ("sf1", sf1))
    }
    result["adjudications"] = {
        "fsck_queries": {
            "finding": (
                "bm25_index_fsck / pq_index_fsck / family_fsck_report "
                "run the FULL check level, which reads every segment's "
                "doclens/postings (resp. codes, model tables) by design "
                "— Lucene's CheckIndex is a full scan too. Their 10x "
                "ratio therefore tracks the index size plus the "
                "fixture build cost; the metadata level (full=False) "
                "is the zero-data-IO serve-path instrument. Recorded, "
                "not flagged."
            ),
        },
        "timeseries_gap_fill": {
            "expectation": (
                "no r13 code change (re-gated for the r12 disclosure "
                "slip); the operator's output is the generated grid"
            ),
            "output_rows": gap_rows,
            "note": (
                "the 10x fixture has 10x users with constant per-user "
                "span, so the generated grid grows ~10x — wall "
                "tracking the output ratio is linear scaling"
            ),
        },
        "ingest_constant_epoch": {
            "finding": (
                "the production ingest shape (constant epoch, growing "
                "index, segments past the r12 bloom cap) is probed "
                "separately: INGEST_PROBE_r13.json — per-epoch wall "
                "flat over 40 epochs in both id shapes, legacy "
                "(digest-stripped) contrast 1.5x slower at 41 segments"
            ),
        },
    }
    Path(out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps({k: result["queries"][k] for k in PROBES}), flush=True)
    spark.stop()  # non-daemon JVM threads otherwise outlive main()


if __name__ == "__main__":
    main()

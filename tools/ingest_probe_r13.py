#!/usr/bin/env python3
"""Round-13 production-shape ingest probe (VERDICT r12 #1).

The r7-r12 10x probes scale the EPOCH with the corpus; at 100 TB the
epoch is constant and the INDEX grows — segment count climbs with
every committed epoch, and per-segment id counts sit far past the old
2^17 fixed-m bloom saturation point. This probe runs exactly that
shape against the BM25 streaming-ingest gate:

- a BASE segment of N_BASE = 262,144 dense ids (2x the old cap — r13
  digests must carry a USABLE scaled-m bloom here, where the r12
  fixed-m digest had none and every epoch fell back to an index-sized
  doclens union);
- EPOCHS of a constant E = 2,000 docs each, committed through
  ``bm25_ingest_foreach_batch`` while the index grows by one segment
  per epoch — per-epoch admission wall is the series under test;
- two id shapes: ``sequential`` (epoch ids beyond every live max —
  the dominant production shape; the interval rung must prove
  admission with ZERO index IO at any segment count) and
  ``interleaved`` (epoch ids striped INSIDE the base segment's id
  range — interval and residue rungs saturated by construction, so
  the scaled bloom + driver-side vectorized membership rung carries
  the load, with only bloom-false-positive-scoped reads);
- a LEGACY CONTRAST: the same interleaved epoch admitted against a
  marker whose segdigests were stripped (the r11 shape), at small and
  at grown segment count — the cost that grows with the index when
  the metadata rungs are absent.

Flatness verdict: median per-epoch wall over the last 5 epochs vs
epochs 2-6 (epoch 1 absorbs marker/code warm-up), per shape. FLAT =
ratio <= 1.5 with 40 segments of growth in between.

Usage: python3 tools/ingest_probe_r13.py [out_json]
Artifact: INGEST_PROBE_r13.json (committed, read by the judge).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_BASE = 1 << 18  # 262,144 ids: 2x the r12 bloom saturation point
E = 2000  # constant epoch size
N_EPOCHS = 40


def _docs(spark, ids_expr: str, n: int, start: int = 0):
    # deterministic synthetic docs: the probe exercises the ADMISSION
    # machinery, not tokenization richness — three tokens per doc keep
    # the segment write cost constant and small relative to the ladder
    return spark.range(start, start + n).selectExpr(
        f"{ids_expr} AS doc_id",
        "concat('probe token t', CAST(id % 97 AS STRING)) AS text",
    )


def _run_epochs(spark, fn, make_batch, n_epochs, first_epoch, walls):
    for e in range(n_epochs):
        b = make_batch(e)
        t0 = time.perf_counter()
        fn(b, first_epoch + e)
        walls.append(round(time.perf_counter() - t0, 3))
        print(
            f"#   epoch {first_epoch + e}: {walls[-1]}s",
            file=sys.stderr,
            flush=True,
        )


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "INGEST_PROBE_r13.json"

    from kafka_dbsync_spark import get_spark
    from kafka_dbsync_spark.operators import bm25_index as m
    from kafka_dbsync_spark.operators.id_digest import (
        BLOOM_MAX_IDS,
        DIGEST_M,
        digest_has_bloom,
        digest_m,
    )

    spark = get_spark(app_name="kds-ingest-probe-r13")
    spark.range(1).count()  # absorb JVM startup
    root = "/tmp/kds_ingest_probe_r13"
    shutil.rmtree(root, ignore_errors=True)
    result: dict = {
        "round": 13,
        "n_base_ids": N_BASE,
        "epoch_docs": E,
        "n_epochs": N_EPOCHS,
        "shapes": {},
    }

    for shape in ("sequential", "interleaved"):
        path = os.path.join(root, shape)
        # base segment: N_BASE ids past the old cap. sequential: dense
        # [0, N_BASE). interleaved: multiples of 3 — gcd(3, 64) = 1, so
        # the base residue mask SATURATES (all 64 classes) and the
        # residue rung can never prove an in-range epoch disjoint.
        base_expr = "id" if shape == "sequential" else "3 * id"
        m.build_bm25_index(spark, _docs(spark, base_expr, N_BASE), path)
        with open(os.path.join(path, "_COMPLETE")) as f:
            rec = json.load(f)
        (base_seg,) = rec["segments"]
        base_digest = rec["segdigests"][base_seg]
        assert digest_has_bloom(base_digest), (
            "r13 regression: a 2^18-id segment must carry a scaled-m "
            "bloom (the whole point of VERDICT r12 #1)"
        )
        result["shapes"][shape] = {
            "base_digest_m": digest_m(base_digest),
            "base_digest_has_bloom": True,
        }
        fn = m.bm25_ingest_foreach_batch(path)
        if shape == "sequential":
            # fresh contiguous ranges beyond every live max: the
            # interval rung must admit with zero index IO forever
            def make_batch(e, _p=path):
                return _docs(spark, "id", E, start=N_BASE + e * E)
        else:
            # ids 3k+1 striped INSIDE the base interval [0, 3*N_BASE):
            # never multiples of 3 (fresh vs base), interval overlaps
            # the base every epoch, residues-mod-64 overlap by the
            # saturation above — only the scaled bloom can prove
            # admission without reading the base segment
            def make_batch(e, _p=path):
                return _docs(spark, f"3 * ({e * E} + id) + 1", E)

        walls: list[float] = []
        _run_epochs(spark, fn, make_batch, N_EPOCHS, 1, walls)
        early = sorted(walls[1:6])[2]
        late = sorted(walls[-5:])[2]
        result["shapes"][shape].update(
            {
                "per_epoch_walls": walls,
                "early_median_e2_e6": early,
                "late_median_last5": late,
                "late_over_early": round(late / early, 2),
                "flat": late / early <= 1.5,
                "segments_at_end": len(
                    json.load(
                        open(os.path.join(path, "_COMPLETE"))
                    )["segments"]
                ),
            }
        )
        print(
            f"# {shape}: early {early}s late {late}s "
            f"ratio {late / early:.2f}",
            file=sys.stderr,
            flush=True,
        )

    # legacy contrast: strip segdigests (the r11/r12-legacy marker
    # shape) and admit ONE interleaved epoch at grown segment count —
    # the union-fallback cost the digest ladder exists to avoid
    path = os.path.join(root, "interleaved")
    legacy = os.path.join(root, "legacy")
    shutil.copytree(path, legacy)
    with open(os.path.join(legacy, "_COMPLETE")) as f:
        rec = json.load(f)
    rec.pop("segdigests", None)
    with open(os.path.join(legacy, "_COMPLETE"), "w") as f:
        json.dump(rec, f)
    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    invalidate_memo(legacy)
    fn_legacy = m.bm25_ingest_foreach_batch(legacy)
    t0 = time.perf_counter()
    fn_legacy(
        _docs(spark, f"3 * ({(N_EPOCHS + 3) * E} + id) + 1", E),
        N_EPOCHS + 3,
    )
    legacy_wall = round(time.perf_counter() - t0, 3)
    fn_digest = m.bm25_ingest_foreach_batch(path)
    t0 = time.perf_counter()
    fn_digest(
        _docs(spark, f"3 * ({(N_EPOCHS + 4) * E} + id) + 1", E),
        N_EPOCHS + 4,
    )
    digest_wall = round(time.perf_counter() - t0, 3)
    result["legacy_contrast"] = {
        "segments": result["shapes"]["interleaved"]["segments_at_end"],
        "legacy_marker_epoch_wall": legacy_wall,
        "digest_marker_epoch_wall": digest_wall,
        "note": (
            "same interleaved epoch, same grown index; the legacy "
            "marker (no segdigests) pays the full doclens-union "
            "anti-join the metadata ladder avoids"
        ),
    }
    result["constants"] = {
        "DIGEST_M_floor": DIGEST_M,
        "BLOOM_MAX_IDS": BLOOM_MAX_IDS,
    }
    result["verdict"] = {
        "flat_sequential": result["shapes"]["sequential"]["flat"],
        "flat_interleaved": result["shapes"]["interleaved"]["flat"],
        "digests_usable_past_2^17": True,
    }
    Path(out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result["verdict"]), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()  # non-daemon JVM threads otherwise outlive main()


if __name__ == "__main__":
    main()

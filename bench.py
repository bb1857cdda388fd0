#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}

`value` is the total wall time of the headline suite. Each query is
executed once after a warm-up of the session (a trivial count to absorb
JVM/codegen startup).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_dbsync_spark import get_spark
from kafka_dbsync_spark.queries import QUERIES

# Headline queries: the CDC replication path (the reference's core), the
# analytics shapes, and the training-data operators. O(n²)-ish pair
# queries are exercised at correctness scale, not here.
HEADLINE = [
    "cdc_final_state",
    "cdc_corrupt_events",
    "cdc_route_stats",
    "iidr_ts_normalize",
    "type_coercion",
    "envelope_unwrap",
    "q1_pricing_summary",
    "top_customers",
    "events_hourly",
    "dedup_exact",
    "dedup_normalized",
    "token_stats",
    "lang_id",
    "quality_scores",
    "doc_fingerprint",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ann_blocked_topk",
    "events_sessionize",
    "asof_join",
    # r3 additions: the compressed-ANN read path, the anti-join-heavy
    # TPC-H shapes, and the narrow winnowing fingerprint pass
    "pq_adc_search",
    "ivfpq_search",
    "late_sole_suppliers",
    "props_json_stats",
    "winnowing_fingerprints",
    # r4: the persisted-index serving path (build-once/serve-many). The
    # first run may lazily build the index into the /tmp cache; the
    # median reflects the warm serve cost — compare against the fused
    # pq_adc_search/ivfpq_search rows to see the build/serve split.
    "pq_adc_search_served",
    "ivfpq_search_served",
    # r4: the per-user resample window (~1M generated rows at sf0.1) and
    # the 4-relation anti-join integrity sweep
    "timeseries_gap_fill",
    "fk_integrity_report",
    # r4: the two-hop graph join and the dedup keep-list composition
    "triangle_counts",
    "canonical_docs",
    # r5: the served exact re-rank (IndexRefineFlat) — candidates from
    # the persisted index + a broadcast semi-join raw-vector fetch —
    # plus hybrid BM25⊕vector RRF and the batched multi-query serve
    "ivfpq_search_refined",
    "hybrid_rank_fusion",
    "ivfpq_search_multi",
    "dedup_incremental",
    # r5 late additions: LM quality scoring (vocab-sized model, one
    # corpus bigram shuffle), DSIR importance weights, the fixed-state
    # HLL cardinality sketch, and blocked fuzzy linkage
    "lm_perplexity",
    "lm_perplexity_served",
    "dsir_weights",
    "hll_distinct_tokens",
    "fuzzy_match_pairs",
    # r7 second half: the trigram backoff LM (one n-gram order up from
    # lm_perplexity), the ExactSubstr span rewrite (one shingle
    # count-distinct shuffle + higher-order rewrite), embedding-space
    # PSI drift (one corpus agg + metadata arithmetic), and per-anchor
    # hard-negative mining (broadcast anchors, two-stage top-k)
    "lm_trigram_backoff",
    "lm_trigram_served",
    "dedup_span_rewrite",
    "embedding_drift_psi",
    "hard_negative_mining",
    # r7 late additions: dual-LM Moore-Lewis selection (two vocab-sized
    # models, dg exchange reused) and the exact prefix-filtered
    # set-similarity join (the completeness-guaranteed dedup path)
    "moore_lewis_selection",
    "moore_lewis_served",
    "setsim_exact_join",
    # classification capstone: the C-fanned naive-Bayes domain classifier
    "nb_source_predict",
    # r8 additions (suite wall grows by these four ADDED entries —
    # carried entries are the like-for-like comparison): ANN index
    # takedown served from its persisted cache dir, CCNet paragraph
    # dedup, the full CCNet composition, and the Gopher rule report.
    # lsh_recall_curve is deliberately NOT a headline entry: it is an
    # offline evaluation sweep (exact ground-truth join + all four
    # bandings), ~15 s at sf0.1 by construction — tracked by its gate
    # query and the 10x scale probe instead.
    "ivfpq_remove_serve",
    "paragraph_dedup",
    "ccnet_pipeline",
    "gopher_rules_report",
    # r9 additions: URL keep-first dedup (the pre-text crawl stage),
    # image dHash near-dup pairs (the multimodal dedup), the shard
    # merge build path (train-once + shard-encode + file-concat merge),
    # and curation_pipeline_v4 — which REPLACES curation_pipeline_v3 as
    # the flagship composition (v3 remains oracle-gated; its bench row
    # is superseded, documented here for the round-over-round diff).
    "url_dedup",
    "image_neardup_pairs",
    "audio_neardup_pairs",
    "pq_index_merge",
    "curation_pipeline_v4",
    # r10 additions: the PSL-exact domain rollup + blocklist, the
    # frozen NB classifier serve path, and video frame-vote dedup.
    # image_ingest_gate / nb_ingest_gate / contamination_ingest_gate are
    # headline-excluded like url_ingest_gate (epoch/gate-machinery fixed
    # cost dominates; all stay oracle-gated and scale-probed).
    "domain_stats_psl",
    "nb_source_predict_served",
    "domain_blocklist_psl",
    "video_neardup_pairs",
    # r10 second half: the persisted BM25 text index — warm serve
    # (compare against the fused bm25_search cost the corpus-rescan
    # path would pay), the full segment lifecycle (build even half +
    # add odd shard + tombstone + merged serve costs are tracked by
    # bm25_index_add / bm25_remove_serve; bm25_segment_merge is
    # headline-excluded as its cost is add's plus the compaction
    # rewrite, adjudicated by the 10x scale probe) — and RefinedWeb
    # host-scoped boilerplate stripping.
    "bm25_search_served",
    "bm25_index_add",
    "bm25_remove_serve",
    "bm25_phrase_search",
    "bm25_phrase_served",
    "boilerplate_strip",
    "boilerplate_strip_served",
    "bm25_search_multi",
    # r11: bm25_ingest_gate and bm25_tiered_merge are headline-EXCLUDED
    # like every other ingest gate and like bm25_segment_merge (epoch/
    # merge machinery fixed cost dominates); both stay oracle-gated,
    # driver-windowed, and 10x scale-probed. Five flat narrow per-row
    # ops (simhash / similarity_topk / vector_lsh_buckets / vocab_topk /
    # multimodal_meta, all ~0.3-0.6 s and unchanged since r2-r6, all
    # pytest-pinned and sweep-covered) also leave the headline: the
    # compact stdout line outgrew the driver's 2000-char tail at 77
    # entries even at 1dp (the r10 adaptive-precision fallback fired
    # its new last-resort warning), and trimming redundant rows beats
    # shipping 0dp medians for everything.
]


# Round-over-round adjudications that should ride with the numbers
# (VERDICT watch items, resolved with measurements; refreshed whenever
# an item opens or closes). Lands in the detail artifact.
ADJUDICATIONS = [
    "r9: drift adjudication is now MECHANICAL — the canary runs at "
    "suite start/middle/end (the r8 watch item: a start-only canary "
    "cannot see mid-suite host throughput changes), and any carried "
    "query whose best-time regression vs the previous round exceeds "
    "both 0.5s and the canary spread band is automatically re-run "
    "standalone (median-of-3) after the suite; the verdicts land in "
    "auto_adjudications in this artifact.",
    "r9: curation_pipeline_v3's bench row is superseded by "
    "curation_pipeline_v4 (URL dedup -> Gopher gate -> paragraph dedup "
    "-> LM head/middle -> mixture plan); v3 remains oracle-gated in "
    "the registry.",
    "r10: the previous-round artifact is now selected by SAME "
    "scale-factor series (BENCH_SF1_r* for sf1 runs), so sf1 drift "
    "adjudication is armed instead of silently skipped (VERDICT r9 "
    "what's-wrong #1); cross-sf deltas can no longer appear in "
    "delta_best_vs_prev.",
    "r10: pq_index_merge carries a ~1.8s regression at sf0.1 — the "
    "price of the ADVICE r9 correctness guards (vec_id disjointness "
    "semi-join probe + unhonored-source-erasure probe, two "
    "column-pruned scans of the codes' id column, plus the "
    "position-sensitive xor term in quantizer_signature over the "
    "vocab-sized quantizer tables). Accepted: the probes prevent "
    "silently-duplicated serve results and false erasure claims.",
    "r12: the drift-adjudication band is SCALE-INVARIANT (VERDICT r11 "
    "what's-wrong #1: the old prev*spread band exempted every query "
    "with prev > ~0.5s/spread from adjudication on a loaded host — "
    "six 40-120% regressions rode it unexamined in r11). New rule: "
    "flag drift > max(0.5s, 40% of prev); standalone tolerance caps "
    "the host allowance at min(spread, 0.5); rerun cap raised 6->10. "
    "The compact stdout line is now PROVABLY bounded at any registry "
    "size (bounded_compact_line: precision ladder then smallest-rows "
    "shedding with queries_omitted; VERDICT r11 #4).",
    "r11: the r10 pq_index_merge guard regression is addressed as "
    "VERDICT r10 #3 prescribed — markers carry an id_digest "
    "(interval + residues-mod-64 mask + bloom) and the merge guards "
    "short-circuit on metadata (the bench fixture's even/odd split "
    "proves disjoint via the residue mask with ZERO IO); the digest "
    "costs one extra narrow-column job at build/shard time, so the "
    "query's wall moves by (2 build-side jobs) - (1 semi-join + "
    "probe overhead) — both guards still fire in tests, and "
    "legacy digest-less markers keep the exact probes.",
]


def _canary(spark, label: str = "start") -> dict:
    """Machine-contention canary (VERDICT r5 #4): three fixed,
    dataset-independent micro-jobs — a whole-stage-codegen arithmetic
    loop, a 1000-key shuffle, and a tiny parquet scan. Their wall time
    moves with HOST LOAD, never with this repo's code, so a
    round-over-round suite delta can be read against the canary delta:
    if both drifted together, it was the machine. Each job runs 3×; the
    median is recorded (same policy as the suite). Since r9 the canary
    runs at suite START, MIDDLE, and END (VERDICT r8 #3: a start-only
    probe measures contention once and cannot see mid-suite host
    throughput changes — the r8 watch item's blind spot)."""

    def med(job) -> float:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            job()
            times.append(time.perf_counter() - t0)
        return round(sorted(times)[1], 3)

    out = {
        "cpu": med(
            lambda: spark.range(50_000_000)
            .selectExpr("sum(id * 2654435761 % 1000003) AS s")
            .head()
        ),
        "shuffle": med(
            lambda: spark.range(5_000_000)
            .selectExpr("id % 1000 AS k")
            .groupBy("k")
            .count()
            .write.format("noop")
            .mode("overwrite")
            .save()
        ),
        "scan": med(
            lambda: spark.read.parquet(
                "/root/testdata/sf0.001/events.parquet"
            )
            .selectExpr("count(*) AS n")
            .head()
        ),
    }
    # r14 diagnostic: this sandbox has a degradation mode where memory
    # bandwidth drops 3-5x while pure-CPU work stays at parity (measured:
    # np.sort of 1M int64 178 ms vs ~40 typical, md5 microbench
    # unchanged) — the three jobs above are cache-resident and blind to
    # it, which made the r13/r14 drift adjudicator under-estimate the
    # host allowance for memory-bound queries (multimodal decode, CC
    # loops). ``membw`` (a 20M-row sort) is RECORDED for diagnosis but
    # EXCLUDED from ``total`` so canary totals stay comparable across
    # rounds.
    membw = med(
        lambda: spark.range(20_000_000)
        .selectExpr("id * 2654435761 % 1000003 AS k")
        .orderBy("k")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    out["total"] = round(sum(out.values()), 3)
    out["membw"] = membw
    print(f"# canary[{label}]: {out}", file=sys.stderr)
    return out


def _canary_spread(canaries: dict[str, dict]) -> float:
    """Relative spread of the per-segment canary totals: (max/min - 1).
    This is the fraction of any carried query's time that host
    throughput alone moved DURING this run — the band a drift must
    exceed before it is worth a standalone re-run."""
    totals = [c["total"] for c in canaries.values() if c.get("total")]
    if not totals or min(totals) <= 0:
        return 0.0
    return round(max(totals) / min(totals) - 1, 4)


def _auto_adjudicate(
    spark,
    sf_dir: str,
    per_query_best: dict[str, float],
    prev_q: dict[str, float],
    canaries: dict[str, dict],
    max_reruns: int = 10,
) -> dict:
    """Mechanical drift adjudication (VERDICT r8 #3): any carried query
    whose best-of-3 regressed vs the previous round by MORE than both
    0.5 s and the canary spread band is re-run standalone (3×, after
    the suite, away from neighboring heavyweight entries' JVM/GC
    context). If the standalone best lands back inside the band around
    the previous round's number, the drift was suite/host context —
    adjudicated without a human A/B. Reruns are capped (largest drifts
    first) so a globally slow host cannot double the bench wall."""
    spread = _canary_spread(canaries)
    flagged = []
    for name, t in per_query_best.items():
        if name not in prev_q:
            continue
        drift = round(t - prev_q[name], 3)
        # SCALE-INVARIANT flag threshold (VERDICT r11 "what's wrong"
        # #1): the old band multiplied the WHOLE prior value by the
        # canary spread, so on a loaded host (spread ~1.1) any query
        # with prev > ~0.5 s had to slow past ~2.1x before the
        # adjudicator even looked — exactly the queries the instrument
        # exists for. Now: drift beyond 40% of prev (floor 0.5 s)
        # flags, regardless of host spread; the spread still informs
        # the STANDALONE tolerance below, capped so a loaded suite
        # start can't grant a 2x allowance to the quiet re-run.
        band = round(max(0.5, prev_q[name] * 0.4), 3)
        if drift > band:
            flagged.append((drift, band, name))
    flagged.sort(reverse=True)
    out: dict[str, dict] = {}
    for drift, band, name in flagged[:max_reruns]:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        sa_best, sa_med = round(min(times), 3), round(sorted(times)[1], 3)
        tol = round(prev_q[name] * (1 + min(spread, 0.5)) + 0.25, 3)
        verdict = (
            "host/suite context (standalone back within band)"
            if sa_best <= tol
            else "REPRODUCES standalone — investigate the code/plan"
        )
        out[name] = {
            "prev_best": prev_q[name],
            "suite_best": per_query_best[name],
            "drift": drift,
            "band": band,
            "standalone_median": sa_med,
            "standalone_best": sa_best,
            "tolerance": tol,
            "verdict": verdict,
        }
        print(f"# auto-adjudicate {name}: {out[name]}", file=sys.stderr)
    for drift, band, name in flagged[max_reruns:]:
        out[name] = {
            "prev_best": prev_q[name],
            "suite_best": per_query_best[name],
            "drift": drift,
            "band": band,
            "verdict": "flagged but rerun cap reached",
        }
    return out


def bounded_compact_line(record: dict, budget: int = 1900) -> tuple[dict, object]:
    """(compact record, precision tag) PROVABLY within ``budget`` chars
    when encoded with compact separators, at ANY registry size
    (VERDICT r11 #4 — the old ladder ended at 0dp medians and was one
    round of headline growth from silently truncating the JSON head in
    the driver's 2000-char stdout tail). The ladder: per-query medians
    at 2dp, then 1dp; if even that exceeds the budget, WARN loudly and
    shed per-query rows SMALLEST-FIRST (the big movers are what a
    reader of the compact line needs) with a ``queries_omitted`` count
    — every number always lives at full precision in the detail
    artifact the ``detail_file`` key points at. The suite-level keys
    are fixed-size, so the shedding loop always terminates under
    budget."""

    def enc(d: dict) -> int:
        return len(json.dumps(d, separators=(",", ":")))

    full = record["queries"]
    for dp in (2, 1):
        c = dict(record, queries={k: round(v, dp) for k, v in full.items()})
        if enc(c) <= budget:
            return c, dp
    print(
        "WARNING: compact bench line exceeds the stdout budget even at "
        "1dp — shedding the smallest per-query rows (all values remain "
        "in the detail artifact); consider trimming the headline set",
        file=sys.stderr,
    )
    kept = {k: round(v, 1) for k, v in full.items()}
    c = dict(record, queries=kept, queries_omitted=0)
    while kept and enc(c) > budget:
        kept.pop(min(kept, key=lambda k: (kept[k], k)))
        c = dict(
            record, queries=kept, queries_omitted=len(full) - len(kept)
        )
    return c, "1dp-top-movers"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="kafka-dbsync-bench")

    # warm-up: JVM codegen paths + Arrow/Python workers (measured runs
    # should reflect steady-state engine throughput, not process spin-up);
    # uses the smallest SF so no benchmark data is pre-cached
    QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    QUERIES["multimodal_meta"](spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    canaries = {"start": _canary(spark, "start")}

    per_query: dict[str, float] = {}
    per_query_best: dict[str, float] = {}
    per_query_first: dict[str, float] = {}
    total = total_best = total_first = 0.0
    mid = len(HEADLINE) // 2
    for qi, name in enumerate(HEADLINE):
        if qi == mid:
            canaries["mid"] = _canary(spark, "mid")
        fn = QUERIES[name]
        # Each query runs 3× and reports the MEDIAN (the headline number:
        # robust to one bad scheduler slot without the best-of cherry-pick
        # — VERDICT r2 asked for median-of-3 with both columns). Best and
        # first-run are kept alongside: the first run pays one-time JVM
        # JIT + whole-stage-codegen compile (1-3 s on HOF-heavy queries) —
        # a real cost once per executor lifetime; best shows the jitter
        # floor (this host's parallel CPU allocation swings 5-8x).
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            # noop sink: forces full evaluation of every output column
            # (count() would let Catalyst prune the projections entirely)
            df.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        per_query[name] = round(sorted(times)[1], 3)
        per_query_best[name] = round(min(times), 3)
        per_query_first[name] = round(times[0], 3)
        total += per_query[name]
        total_best += per_query_best[name]
        total_first += per_query_first[name]
        print(
            f"# {name}: median {per_query[name]:.3f}s / best "
            f"{per_query_best[name]:.3f}s / first {per_query_first[name]:.3f}s",
            file=sys.stderr,
        )

    canaries["end"] = _canary(spark, "end")
    # throughput anchors vs BASELINE.md: the reference's only rate figure
    # is 1K events/s through its sink; our CDC path applies the full
    # events table per run
    n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    cdc_secs = per_query.get("cdc_final_state", 0) or 1e-9
    try:
        apply_rate = _bench_full_apply_path(spark, sf_dir, n_events)
    except Exception as e:  # noqa: BLE001 — never lose the suite JSON
        print(f"# full_apply_path failed: {e}", file=sys.stderr)
        apply_rate = None
    prev_name, delta, prev_q = _delta_vs_previous_round(per_query_best, sf)
    # drift adjudication only makes sense against the SAME scale factor:
    # the previous-round artifact is selected sf-aware (BENCH_SF1_r* for
    # an sf1 run, BENCH_r* otherwise — VERDICT r9 #2: globbing only the
    # sf0.1 series left sf1 runs silently un-adjudicated), and the
    # recorded sf of the SELECTED artifact is still validated here so an
    # off-series local run (e.g. sf0.01) never adjudicates cross-scale
    prev_sf = _prev_round_sf(sf)
    same_sf = prev_sf is None or str(prev_sf) == str(
        float(sf) if sf.replace(".", "").isdigit() else sf
    )
    auto = (
        _auto_adjudicate(spark, sf_dir, per_query_best, prev_q, canaries)
        if prev_q and same_sf
        else {}
    )
    # VERDICT r3 "What's wrong" #2: the driver records only a TAIL window
    # of stdout, and r3's single giant JSON line (3 per-query maps + a
    # delta map) outgrew it, losing the headline `value`. Fix: stdout gets
    # ONE compact line (headline numbers + the contract-required per-query
    # medians, ~1.5 KB); the best/first-run columns and the delta map go
    # to a separate detail artifact next to this script.
    detail_name = os.environ.get(
        "SPARK_GRAFT_DETAIL_FILE", "BENCH_DETAIL_latest.json"
    )
    # The driver records only the LAST 2000 chars of stdout; the r7
    # compact line hit 1837 and each added headline entry costs ~14
    # chars, so the line must stay lean: per-query medians at 2dp, the
    # best/first suite columns live in the detail artifact only.
    # bounded compact line (VERDICT r11 #4): precision ladder, then
    # smallest-rows shedding — provably under the driver's stdout tail
    # at any registry size; bounded_compact_line carries the docstring
    compact, compact_dp = bounded_compact_line(
        {
            "metric": "headline_suite_wall_seconds",
            "value": round(total, 3),  # median-of-3 per query, summed
            "unit": "sec",
            "queries": per_query,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cdc_events_per_sec": round(n_events / cdc_secs),
            "cdc_apply_events_per_sec": apply_rate,
            # fixed, small cost: consumers locate the full-precision
            # artifact from the compact record alone (ADVICE r10 — the
            # r10 compact line dropped it, orphaning the detail)
            "detail_file": detail_name,
        }
    )
    detail = dict(
        compact,
        queries=per_query,              # full 3dp precision
        detail_file=detail_name,
        compact_precision=compact_dp,
        canary=canaries,                # start/mid/end, all three jobs
        canary_spread=_canary_spread(canaries),
        best_suite_wall_seconds=round(total_best, 3),
        first_run_suite_wall_seconds=round(total_first, 3),
        queries_best=per_query_best,
        queries_first_run=per_query_first,
        # like-for-like: our BEST column vs the previous round's
        # best-based "queries" column (r1 was single-run = its own
        # first==best), seconds saved (negative = faster now)
        delta_best_vs_prev=delta,
        prev_bench=prev_name,
        adjudications=ADJUDICATIONS,
        auto_adjudications=auto,
    )
    (Path(__file__).resolve().parent / detail_name).write_text(
        json.dumps(detail, indent=1) + "\n"
    )
    # compact separators: the driver records only the LAST 2000 chars of
    # stdout, and the default ", "/": " separators cost ~150 chars at 65
    # headline entries (the r10 line hit 1940 with them — one more round
    # of growth would truncate the headline)
    print(json.dumps(compact, separators=(",", ":")), flush=True)
    # explicit teardown: a local[32] session can leave non-daemon JVM
    # callback threads that keep the python process alive after main()
    # returns — the artifact is already on disk and stdout flushed
    spark.stop()


def _prev_bench_paths(sf: str, root=None) -> list[str]:
    """The per-round bench artifacts of the SAME scale-factor series as
    this run, oldest first: an sf1 run reads the ``BENCH_SF1_r*.json``
    series, everything else the driver's sf0.1 ``BENCH_r*.json`` series
    (VERDICT r9 #2 — selecting across series disarmed sf1 drift
    adjudication and produced cross-sf deltas).

    Artifacts of the RUNNING round are excluded when
    $SPARK_GRAFT_ROUND names it (VERDICT r10 #3: a re-run within a
    round picked up the round's own earlier artifact as `prev_bench`,
    so the shipped detail adjudicated against itself-series-same-round
    instead of round N−1).

    r13 (VERDICT r12 what's-wrong #1): the series INCLUDES same-sf
    ``BENCH_QUIET_*`` re-baselines — a round whose driver run landed
    on a loaded host re-benches quiet, and the NEXT round's drift
    bands must anchor on the per-query BEST across both artifacts
    (``_delta_vs_previous_round`` takes the min), or a real regression
    can hide entirely inside a band inflated by the prior round's host
    load."""
    import glob
    import re

    try:
        is_sf1 = float(sf) == 1.0
    except ValueError:
        is_sf1 = False
    patterns = (
        ("BENCH_SF1_r*.json", "BENCH_QUIET_SF1_r*.json")
        if is_sf1
        else ("BENCH_r*.json", "BENCH_QUIET_r*.json")
    )
    try:
        cur_round = int(os.environ.get("SPARK_GRAFT_ROUND", ""))
    except ValueError:
        cur_round = None
    root = Path(root) if root is not None else Path(__file__).resolve().parent
    paths = sorted(
        (p for pat in patterns for p in glob.glob(str(root / pat))),
        # round first; the driver artifact before its QUIET sibling
        # (shorter name sorts first), purely for determinism
        key=lambda p: (
            int(re.search(r"r(\d+)", Path(p).name).group(1)),
            Path(p).name,
        ),
    )
    if cur_round is not None:
        paths = [
            p
            for p in paths
            if int(re.search(r"r(\d+)", Path(p).name).group(1)) < cur_round
        ]
    return paths


def _prev_round_sf(sf: str):
    """The scale factor the newest same-series bench artifact ran at
    (None if it cannot be determined)."""
    benches = _prev_bench_paths(sf)
    if not benches:
        return None
    try:
        prev = json.loads(Path(benches[-1]).read_text())
        if "parsed" in prev:
            prev = prev["parsed"] or {}
        return prev.get("sf")
    except (OSError, ValueError):
        return None


def _delta_vs_previous_round(
    per_query_best: dict[str, float], sf: str, root=None
):
    """Per-query best-time delta vs the NEWEST ROUND's same-sf-series
    bench artifacts in the repo root (BENCH_SF1_r*/BENCH_QUIET_SF1_r*
    for sf1 runs, BENCH_r*/BENCH_QUIET_r* otherwise). Returns
    (prev_name, delta, prev_queries) — the previous per-query map also
    feeds the automatic drift adjudication.

    r13 (VERDICT r12 what's-wrong #1): when the newest round shipped
    BOTH a driver artifact and a quiet re-baseline, ``prev_q`` is the
    per-query MIN across them — the band anchors on the quiet number,
    so a loaded same-round driver run can never inflate the allowance
    a real regression must exceed. ``prev_name`` names every artifact
    that contributed."""
    import re

    benches = _prev_bench_paths(sf, root=root)
    if not benches:
        return None, None, None

    def rnd(p: str) -> int:
        return int(re.search(r"r(\d+)", Path(p).name).group(1))

    newest = rnd(benches[-1])
    prev_q: dict[str, float] = {}
    names: list[str] = []
    for p in benches:
        if rnd(p) != newest:
            continue
        try:
            prev = json.loads(Path(p).read_text())
            if "parsed" in prev:  # driver wrapper: {n, rc, ..., tail, parsed}
                prev = prev["parsed"] or _recover_from_tail(
                    prev.get("tail") or ""
                )
            q = prev.get("queries_best") or prev.get("queries") or {}
        except (OSError, ValueError):
            continue
        if not q:
            continue
        names.append(Path(p).name)
        for k, v in q.items():
            prev_q[k] = min(prev_q[k], v) if k in prev_q else v
    if not names:
        return Path(benches[-1]).name, None, None
    delta = {
        name: round(t - prev_q[name], 3)
        for name, t in per_query_best.items()
        if name in prev_q
    }
    return "+".join(names), delta, prev_q


def _recover_from_tail(tail: str) -> dict:
    """Best-effort recovery of the compact JSON line from a driver
    wrapper whose ``parsed`` is null (the wrapper keeps only a TAIL
    window of stdout, so the line may be truncated at the FRONT —
    VERDICT r4 #2: the delta chain must survive one unparseable
    artifact). First try whole lines; then fall back to regex-scraping
    the ``"name": seconds`` pairs, keeping only names that are real
    registry queries."""
    import re

    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict) and "queries" in obj:
                return obj
    pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', tail)
    q: dict[str, float] = {}
    for k, v in pairs:
        # keep the FIRST occurrence: a truncated tail may carry the
        # queries/queries_best/queries_first_run maps in sequence, and
        # the earliest surviving value is closest to the headline column
        if k in QUERIES and k not in q:
            q[k] = float(v)
    return {"queries": q} if q else {}


def _bench_full_apply_path(spark, sf_dir: str, n_events: int) -> int:
    """End-to-end apply rate: JSON row-image decode → validate → dedup →
    merge → DB write, dead-letter included (the path BASELINE.md's 1K
    events/s anchor measures on the reference). Target is a throwaway
    sqlite file — single-writer, like the reference's single sink task."""
    import sqlite3
    import tempfile

    from pyspark.sql import functions as F

    from kafka_dbsync_spark.operators.transforms import validate_iidr, with_operation
    from kafka_dbsync_spark.sources.iidr import events_as_iidr_stream
    from kafka_dbsync_spark.sources.tables import load_table
    from kafka_dbsync_spark.streaming.apply import CdcApplyEngine
    from kafka_dbsync_spark.streaming.dialects import SqliteDialect

    def batch_for(src_dir: str):
        ev = load_table(spark, src_dir, "events")
        iidr = validate_iidr(with_operation(events_as_iidr_stream(ev)))
        # the real sink path decodes the JSON row image, not parquet columns
        row = F.from_json(
            "record_value", "user_id long, event_type string, value double, props string"
        )
        return iidr.select(
            F.coalesce(row["user_id"], F.from_json("record_key", "user_id long")["user_id"]).alias("user_id"),
            row["event_type"].alias("event_type"),
            row["value"].alias("value"),
            row["props"].alias("props"),
            "table_name",
            "entry_type",
            "topic",
            "kafka_partition",
            F.col("offset").alias("kafka_offset"),
            "offset",
            "record_key",
            "record_value",
            "op",
            "error_reason",
        )

    def make_engine(db: str) -> CdcApplyEngine:
        return CdcApplyEngine(
            connection_factory=lambda db=db: sqlite3.connect(db),
            dialect=SqliteDialect(),
            pk_fields=["user_id"],
            value_cols=["event_type", "value", "props"],
            table_col="table_name",
            order_cols=["offset"],
            errors_tolerance="all",
            corrupt_table="corrupt_events",
            # single-writer sqlite target: force the reference's
            # one-sink-task shape explicitly (auto would stay driver-side
            # here anyway at these batch sizes, but be explicit)
            distribute=False,
        )

    with tempfile.TemporaryDirectory() as tmp:
        # warm the APPLY-specific codegen paths (events→IIDR JSON encode,
        # from_json decode, the dedup window) at the smallest SF so the
        # timed attempts measure steady state — r2's attempt-to-attempt
        # spread (5.98 s vs 3.57 s) was first-run JIT on exactly these
        # expressions, which the suite warm-up above never touched
        make_engine(os.path.join(tmp, "warm.db")).apply_batch(
            batch_for("/root/testdata/sf0.001")
        )
        # median of 3 (same policy as the query suite); each attempt
        # replays into a fresh DB through a fresh engine (the engine
        # memoizes auto-created tables per target)
        batch = batch_for(sf_dir)
        times = []
        for attempt in range(3):
            db = os.path.join(tmp, f"apply_{attempt}.db")
            engine = make_engine(db)
            t0 = time.perf_counter()
            engine.apply_batch(batch)
            dt = time.perf_counter() - t0
            times.append(dt)
            print(
                f"# full_apply_path[{attempt}]: {dt:.3f}s ({n_events} events)",
                file=sys.stderr,
            )
        return round(n_events / sorted(times)[1])


if __name__ == "__main__":
    main()

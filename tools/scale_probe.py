#!/usr/bin/env python3
"""Scale probe: run the hot paths on N× replicated data to show how the
engine's throughput scales (the 100 TB question, answered at the scale
the container allows).

Replication shifts offsets/ids so keys stay realistic: events get
disjoint offset ranges per copy (like reading N partitions of a longer
stream); documents get disjoint doc_id ranges (corpus N× the size, same
duplicate structure).

Usage: python3 tools/scale_probe.py [factor] [sf_dir]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

# stdout is usually a pipe here — line-buffer so partial results survive
# a killed run
print = functools.partial(print, flush=True)  # noqa: A001

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def replicate(df, factor: int, id_col: str, stride: int):
    copies = [
        df.withColumn(id_col, F.col(id_col) + F.lit(i * stride)) for i in range(factor)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if factor < 1:
        sys.exit(f"factor must be >= 1 (got {factor})")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from kafka_dbsync_spark import get_spark
    from kafka_dbsync_spark.operators.dedup import minhash_lsh_candidates
    from kafka_dbsync_spark.operators.merge import apply_changes
    from kafka_dbsync_spark.operators.transforms import split_corrupt, validate_iidr, with_operation
    from kafka_dbsync_spark.sources.iidr import events_as_iidr_stream
    from kafka_dbsync_spark.sources.tables import load_table

    spark = get_spark(app_name="scale-probe")

    ev = load_table(spark, sf_dir, "events")
    n0 = ev.count()
    big = replicate(ev, factor, "event_id", n0).withColumn(
        "user_id", F.col("event_id") % 1500  # widen the key space with volume
    )
    n = n0 * factor

    # warm
    big.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    iidr = validate_iidr(with_operation(events_as_iidr_stream(big)))
    valid, _ = split_corrupt(iidr)
    state = apply_changes(
        valid.select("user_id", "event_type", "value", "props", "op", "offset"),
        ["user_id"],
        ["offset"],
    )
    state.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(f"cdc_merge: {n} events in {dt:.2f}s = {n/dt:,.0f} events/s")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d0 = docs.count()
    bigdocs = replicate(docs, factor, "doc_id", 1_000_000)
    t0 = time.perf_counter()
    cand = minhash_lsh_candidates(bigdocs, "doc_id", "text", 8, 2)
    n_pairs = cand.count()
    dt = time.perf_counter() - t0
    print(
        f"minhash_lsh: {d0 * factor} docs in {dt:.2f}s = "
        f"{d0 * factor / dt:,.0f} docs/s ({n_pairs} candidate pairs)"
    )

    # Adversarial hot bucket: the ENTIRE corpus identical, so every band
    # funnels all ids into one bucket. Pre-cap this was an O(n²)
    # single-task blowup; post-cap it must emit exactly n-1 star pairs.
    n_adv = d0 * factor
    adv = spark.range(1, n_adv + 1).select(
        F.col("id").alias("doc_id"),
        F.lit("identical corpus body for the adversarial hot bucket probe").alias("text"),
    )
    t0 = time.perf_counter()
    n_star = minhash_lsh_candidates(adv, "doc_id", "text", 8, 2).count()
    dt = time.perf_counter() - t0
    assert n_star == n_adv - 1, f"expected {n_adv - 1} star pairs, got {n_star}"
    print(
        f"minhash_lsh adversarial (all-identical): {n_adv} docs in {dt:.2f}s "
        f"= {n_adv / dt:,.0f} docs/s ({n_star} star pairs)"
    )

    # IVF assignment: must stay map-only (0 exchanges) at any volume —
    # the 100 TB index-build pass
    from kafka_dbsync_spark.operators.similarity import ivf_assign, neardup_pairs_blocked
    from kafka_dbsync_spark.queries import q_ivf_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    e0 = emb.count()
    bigemb = replicate(emb, factor, "vec_id", 10_000_000)
    cents = q_ivf_centroids(spark, sf_dir)
    t0 = time.perf_counter()
    assigned = ivf_assign(bigemb, cents)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    n_assigned = assigned.count()
    dt = time.perf_counter() - t0
    assert n_assigned == e0 * factor
    # map-only claim = the DATA (embeddings) side: the ":"-prefixed
    # streamed subtree of the broadcast join must hold no Exchange; the
    # centroid METADATA side legitimately shuffles its B×dim rows into
    # the single broadcast array (r3 broadcast-centroid rewrite)
    plan_head = plan.split("== Initial Plan")[0]
    lines = plan_head.splitlines()
    join_at = next(
        (i for i, ln in enumerate(lines) if "BroadcastNestedLoopJoin" in ln), None
    )
    if join_at is None:
        data_map_only = False
    else:
        streamed = [
            ln for ln in lines[join_at + 1 :] if ln.lstrip().startswith(":")
        ]
        data_map_only = bool(streamed) and not any(
            "Exchange" in ln for ln in streamed
        )
    print(
        f"ivf_assign: {n_assigned} vectors in {dt:.2f}s = "
        f"{n_assigned / dt:,.0f} vecs/s (data-side map-only: {data_map_only})"
    )

    # Salted self-join under a dominant block: every vector in ONE block;
    # salt bounds the per-task pair expansion. The block is capped — the
    # probe is intentionally quadratic (that's the workload), the question
    # is whether it spreads across tasks, not how big a block we can burn.
    nv = min(e0 * factor, 8_000)
    # limit() collapses to one partition, and a broadcastable side would
    # keep the join output on that single partition — masking exactly the
    # task-spread salting provides. At 100 TB neither side broadcasts;
    # mimic that (shuffle join) and spread the input like a real scan.
    dom = (
        bigemb.limit(nv)
        .repartition(32)
        .withColumn("label", (F.col("vec_id") % 1).cast("int"))
    )
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.perf_counter()
        n_pairs_dom = neardup_pairs_blocked(dom, "label", 0.995, salt=16).count()
        dt = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    print(
        f"neardup salted (one dominant block of {nv}): {n_pairs_dom} pairs "
        f"in {dt:.2f}s = {nv * nv / 2 / dt:,.0f} comparisons/s"
    )

    # Corpus operators: tfidf (two-level agg + term join), packing (bucket
    # window), SCD2 (per-key lead window) — the round-2 additions' hot
    # paths at volume
    from kafka_dbsync_spark.operators.corpus import pack_sequences, tfidf_top_terms
    from kafka_dbsync_spark.operators.history import scd2_history

    t0 = time.perf_counter()
    n_terms = tfidf_top_terms(bigdocs, "doc_id", "text", k=3).count()
    dt = time.perf_counter() - t0
    print(
        f"tfidf_top_terms: {d0 * factor} docs in {dt:.2f}s = "
        f"{d0 * factor / dt:,.0f} docs/s ({n_terms} term rows)"
    )

    t0 = time.perf_counter()
    n_packed = pack_sequences(bigdocs, "doc_id", "text", 256, 64).count()
    dt = time.perf_counter() - t0
    print(
        f"pack_sequences: {n_packed} docs in {dt:.2f}s = "
        f"{n_packed / dt:,.0f} docs/s"
    )

    t0 = time.perf_counter()
    changes = valid.select(
        "user_id", "event_type", "value", "op", F.col("offset").alias("seq")
    )
    n_vers = scd2_history(changes, ["user_id"], "seq").count()
    dt = time.perf_counter() - t0
    print(
        f"scd2_history: {n} changes in {dt:.2f}s = {n / dt:,.0f} changes/s "
        f"({n_vers} versions)"
    )

    # Salted join under adversarial skew: a single hot key owning 20% of
    # the probe side. Unsalted, that key is one straggler task; salted it
    # must spread. Measured as a shuffle join (no broadcast) like 100 TB.
    from kafka_dbsync_spark.operators.joins import salted_join

    probe_n = n  # reuse the replicated event volume
    hot = big.select(
        F.when(F.col("event_id") % 5 == 0, F.lit(1))
        .otherwise(F.col("event_id"))
        .alias("k"),
        F.col("value").alias("v"),
    )
    dim = spark.range(1, probe_n + 1).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("attr")
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.perf_counter()
        n_joined = salted_join(hot, dim, ["k"], salt=16).count()
        dt = time.perf_counter() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    print(
        f"salted_join (hot key = 20% of {probe_n} rows): {n_joined} rows "
        f"in {dt:.2f}s = {n_joined / dt:,.0f} rows/s"
    )

    # Incremental view maintenance: merging a 1x delta into a (factor-1)x
    # base state must cost ~one delta agg, not a history recompute
    from kafka_dbsync_spark.operators.incremental import merge_agg_state

    def hourly_state(df):
        return df.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH:00:00").alias("hour"),
            F.col("event_type"),
        ).agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
        )

    base_state = hourly_state(big.filter(F.col("event_id") % factor != 0))
    base_state.write.format("noop").mode("overwrite").save()  # warm
    t0 = time.perf_counter()
    delta_state = hourly_state(big.filter(F.col("event_id") % factor == 0))
    merged = merge_agg_state(
        base_state, delta_state, ["hour", "event_type"], sum_cols=["cnt", "sv"]
    )
    n_view = merged.count()
    dt = time.perf_counter() - t0
    print(
        f"incremental merge ({n // factor} delta into {n} history): "
        f"{n_view} view rows in {dt:.2f}s"
    )

    # BM25: one corpus scan, no corpus-keyed exchange, at volume
    from kafka_dbsync_spark.operators.corpus import bm25_topk

    t0 = time.perf_counter()
    bm25_topk(bigdocs, ["hash", "join", "merge"], k=10).count()
    dt = time.perf_counter() - t0
    print(
        f"bm25: {d0 * factor} docs ranked in {dt:.2f}s = "
        f"{d0 * factor / dt:,.0f} docs/s"
    )

    # Z-order layout: the re-cluster shuffle at volume (range partition +
    # in-partition sort on the interleaved key)
    from kafka_dbsync_spark.operators.layout import zorder_layout

    od = load_table(spark, sf_dir, "orders")
    o0 = od.count()
    bigorders = replicate(od, factor, "o_orderkey", 10_000_000)
    t0 = time.perf_counter()
    zorder_layout(
        bigorders,
        [(F.col("o_custkey"), 0.0, 100000.0), (F.col("o_totalprice"), 0.0, 600000.0)],
        num_files=64,
    ).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(
        f"zorder_layout: {o0 * factor} orders re-clustered in {dt:.2f}s = "
        f"{o0 * factor / dt:,.0f} rows/s"
    )


    # PQ encode at volume: must stay map-only on the data side (the
    # codebook rides in one broadcast row) — the 100 TB compression pass
    from kafka_dbsync_spark.operators.pq import ivfpq_search, pq_codebooks, pq_encode

    cb = pq_codebooks(emb)
    t0 = time.perf_counter()
    enc = pq_encode(bigemb, cb)
    plan_head = (
        enc._jdf.queryExecution().executedPlan().toString().split("== Initial Plan")[0]
    )
    lines = plan_head.splitlines()
    join_at = next(
        (i for i, ln in enumerate(lines) if "BroadcastNestedLoopJoin" in ln), None
    )
    streamed = (
        [ln for ln in lines[join_at + 1 :] if ln.lstrip().startswith(":")]
        if join_at is not None
        else []
    )
    data_map_only = bool(streamed) and not any("Exchange" in ln for ln in streamed)
    n_enc = enc.count()
    dt = time.perf_counter() - t0
    assert n_enc == e0 * factor
    print(
        f"pq_encode: {n_enc} vectors in {dt:.2f}s = {n_enc / dt:,.0f} vecs/s "
        f"(data-side map-only: {data_map_only})"
    )

    # Large-codebook plan probe: 16 subspaces x 256 codewords x 16 dims
    # (4096 codewords over dim=256 — the realistic design point where the
    # literal-inlined form died in Catalyst). The codebook is DATA in one
    # broadcast row, so the plan must build and run regardless of k.
    import itertools

    big_cb = spark.createDataFrame(
        [
            (m, c, d, float((m * 7 + c * 3 + d) % 100) / 100.0)
            for m, c, d in itertools.product(range(16), range(256), range(1, 17))
        ],
        "m int, code long, dim int, cw double",
    )
    wide = spark.range(2_000).select(
        F.col("id").alias("vec_id"),
        F.lit(0).alias("label"),
        F.transform(
            F.sequence(F.lit(1), F.lit(256)),
            lambda i: (F.col("id") % 13 + i).cast("double") / 256.0,
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    n_wide = pq_encode(wide, big_cb, d_sub=16).count()
    dt = time.perf_counter() - t0
    assert n_wide == 2_000
    print(
        f"pq_encode large codebook (4096 codewords, dim=256): {n_wide} vectors "
        f"in {dt:.2f}s (plan built + ran; literal form died here)"
    )

    # IVF-PQ search end-to-end at volume: cell prune + residual encode +
    # ADC top-k over the replicated corpus
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    t0 = time.perf_counter()
    n_top = ivfpq_search(bigemb, cents, qv, nprobe=2, k_top=10).count()
    dt = time.perf_counter() - t0
    assert n_top == 10
    print(
        f"ivfpq_search: top-10 over {e0 * factor} vectors in {dt:.2f}s "
        f"= {e0 * factor / dt:,.0f} vecs/s scanned"
    )

    # Persisted-index serve path at volume: build once (timed), then
    # serve many — the second number is the steady-state query cost and
    # must be a fraction of the fused search above.
    import shutil
    import tempfile

    from kafka_dbsync_spark.operators.pq_index import (
        build_pq_index,
        ivfpq_search_index,
    )

    idx_dir = tempfile.mkdtemp(prefix="probe_pqidx_")
    try:
        t0 = time.perf_counter()
        build_pq_index(spark, bigemb, cents, idx_dir)
        dt_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            assert ivfpq_search_index(spark, idx_dir, qv, nprobe=2).count() == 10
        dt_serve = (time.perf_counter() - t0) / 3
        print(
            f"pq_index build {e0 * factor} vectors: {dt_build:.2f}s; "
            f"served search: {dt_serve:.2f}s/query "
            f"({dt_build / max(dt_serve, 1e-9):.0f}x build/serve split)"
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # Versioned lake sink write amplification: apply `factor` batches,
    # each touching ~1/factor of the keys, into a 64-bucket versioned
    # table. The check: per-batch merge cost tracks the TOUCHED buckets
    # (manifest carries the rest forward), and every historical version
    # stays readable.
    from kafka_dbsync_spark.streaming.table_sink import VersionedParquetMergeSink

    lake_dir = tempfile.mkdtemp(prefix="probe_vlake_")
    try:
        sink = VersionedParquetMergeSink(
            lake_dir, key_cols=["user_id"], order_cols=["offset"],
            num_buckets=64,
        )
        changes_all = valid.select(
            "user_id", "event_type", "value", "props", "op", "offset"
        )
        # realistic CDC shape: each batch mutates a NARROW key set (20
        # distinct users) — write amplification must track the few
        # buckets those keys hash into, not the 64-bucket table
        t0 = time.perf_counter()
        for i in range(5):
            sink.apply_batch(
                changes_all.filter(
                    (F.col("user_id") % 1000 >= i * 20)
                    & (F.col("user_id") % 1000 < i * 20 + 20)
                ),
                epoch_id=i,
            )
        n_batches = 5
        dt = time.perf_counter() - t0
        vs = sink.versions()
        touched = [sink._manifest(v)["touched"] for v in vs]
        n_hist = sink.read(spark, version=vs[0]).count()
        n_cur = sink.read(spark).count()
        print(
            f"versioned_sink: {n_batches} batches ({n} events pool) in "
            f"{dt:.2f}s = {dt / n_batches:.2f}s/batch; versions={vs}, "
            f"touched buckets/batch={[len(t) for t in touched]}, "
            f"v1 rows={n_hist} (time travel), latest rows={n_cur}"
        )
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)

    # Round-5 paths ------------------------------------------------------

    # Batched multi-query ANN serving: Q queries answered by ONE
    # union-of-probes scan must beat Q sequential serves — the
    # amortization grows with Q.
    from kafka_dbsync_spark.operators.pq_index import ivfpq_search_multi_index

    idx_dir = tempfile.mkdtemp(prefix="probe_pqmulti_")
    try:
        build_pq_index(spark, bigemb, cents, idx_dir)
        qs = [
            (int(r["vec_id"]), [float(x) for x in r["embedding"]])
            for r in emb.filter(F.col("vec_id") < 8).collect()
        ]
        ivfpq_search_multi_index(spark, idx_dir, qs, k_top=10).count()  # warm
        t0 = time.perf_counter()
        ivfpq_search_multi_index(spark, idx_dir, qs, k_top=10).count()
        dt_multi = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _, q8 in qs:
            ivfpq_search_index(spark, idx_dir, q8, k_top=10).count()
        dt_seq = time.perf_counter() - t0
        print(
            f"multi_query_serve: Q=8 over {e0 * factor} vectors — batched "
            f"{dt_multi:.2f}s vs sequential {dt_seq:.2f}s "
            f"({dt_seq / max(dt_multi, 1e-9):.1f}x)"
        )
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # Persisted dedup index: build once over the replicated corpus, then
    # check a 1k-doc arrival batch — the check must cost a fraction of
    # the build (corpus text never re-read).
    from kafka_dbsync_spark.operators.dedup_index import (
        build_dedup_index,
        dedup_check_incremental,
    )

    ddx_dir = tempfile.mkdtemp(prefix="probe_dedupidx_")
    try:
        t0 = time.perf_counter()
        build_dedup_index(spark, bigdocs, ddx_dir)
        dt_build = time.perf_counter() - t0
        arrivals = (
            bigdocs.orderBy("doc_id").limit(1_000)
            .withColumn("doc_id", F.col("doc_id") + 100_000_000)
        )
        dedup_check_incremental(spark, ddx_dir, arrivals).count()  # warm
        t0 = time.perf_counter()
        n_hits = dedup_check_incremental(spark, ddx_dir, arrivals).count()
        dt_check = time.perf_counter() - t0
        print(
            f"dedup_index: build {d0 * factor} docs {dt_build:.2f}s; "
            f"check 1000 arrivals {dt_check:.2f}s ({n_hits} near-dup hits, "
            f"{dt_build / max(dt_check, 1e-9):.0f}x build/check split)"
        )
    finally:
        shutil.rmtree(ddx_dir, ignore_errors=True)

    # Persisted LM build/score split at volume: train once over the
    # replicated corpus, then score a 1k-doc arrival batch against the
    # frozen model — the serve cost must track the ARRIVALS, not the
    # corpus (same claim as the dedup index's build/check split).
    from kafka_dbsync_spark.operators.lm_index import build_lm_model, lm_score

    lm_dir = tempfile.mkdtemp(prefix="probe_lm_")
    try:
        t0 = time.perf_counter()
        build_lm_model(spark, bigdocs, lm_dir)
        dt_build = time.perf_counter() - t0
        arrivals = (
            bigdocs.orderBy("doc_id").limit(1_000)
            .withColumn("doc_id", F.col("doc_id") + 500_000_000)
        )
        lm_score(spark, lm_dir, arrivals).count()  # warm
        t0 = time.perf_counter()
        n_scored = lm_score(spark, lm_dir, arrivals).count()
        dt_score = time.perf_counter() - t0
        print(
            f"lm_index: build {d0 * factor} docs {dt_build:.2f}s; "
            f"score 1000 arrivals {dt_score:.2f}s ({n_scored} scored, "
            f"{dt_build / max(dt_score, 1e-9):.0f}x build/score split)"
        )
    finally:
        shutil.rmtree(lm_dir, ignore_errors=True)

    # HLL cardinality sketch vs exact distinct at volume: the sketch's
    # shuffle is FIXED at groups x 2^p register rows however large the
    # input (map-side partial max), while exact countDistinct shuffles
    # the key stream. The estimates' error bound (±3σ = ±19.5% at p=8)
    # is asserted, not eyeballed.
    from kafka_dbsync_spark.functions.sketches import hll_distinct

    keyed = big.select(
        F.col("event_type").alias("grp"), F.col("user_id").cast("string").alias("v")
    )
    t0 = time.perf_counter()
    exact_rows = {
        r["grp"]: r["n"]
        for r in keyed.groupBy("grp").agg(F.countDistinct("v").alias("n")).collect()
    }
    dt_exact = time.perf_counter() - t0
    t0 = time.perf_counter()
    est_rows = {r["grp"]: r["hll_est"] for r in hll_distinct(keyed, ["grp"], "v").collect()}
    dt_hll = time.perf_counter() - t0
    for g, exact_n in exact_rows.items():
        err = abs(est_rows[g] - exact_n) / max(exact_n, 1)
        assert err < 0.20, f"HLL error {err:.1%} for group {g} (n={exact_n})"
    print(
        f"hll_distinct: {n} rows in {dt_hll:.2f}s (exact {dt_exact:.2f}s); "
        f"max err {max(abs(est_rows[g] - v) / max(v, 1) for g, v in exact_rows.items()):.1%} "
        f"across {len(exact_rows)} groups, state 256 registers/group"
    )


if __name__ == "__main__":
    main()

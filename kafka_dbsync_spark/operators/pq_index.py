"""Build-once / serve-many IVF-PQ index persisted as parquet — the
separation FAISS draws between ``IndexIVFPQ.train()+add()`` and
``search()`` (Jégou et al., TPAMI 2011), expressed as Spark tables.

`operators/pq.py::ivfpq_search` proves the math in ONE lineage (build and
search fused — right for the oracle, wrong for serving: VERDICT r3 noted
its bench cost is ~90% index build). At 100 TB the index is built once
and searched millions of times, so the artifacts become tables:

- ``centroids/``       — coarse centroids, long format (label, dim,
  centroid); B×dim rows of metadata, collected driver-side at serve time
  (the FAISS coarse quantizer's in-RAM object).
- ``pq_codebooks/``    — RESIDUAL product-quantizer codebooks, long
  format (m, code, dim, cw); broadcast at serve time.
- ``codes/``           — one row per vector: (vec_id, label,
  centroid_id, codes array<int>), **written partitioned by
  centroid_id** so a probe's `isin` filter prunes to nprobe/B of the
  files before any IO — the partition layout IS the index.
- ``flat_codebooks/`` + ``flat_codes/`` — the non-IVF PQ pair serving
  ``pq_adc_topk`` over the whole corpus (no cell pruning, 32× less scan
  IO than raw floats).

Serve-side cost: read B×dim centroid metadata, broadcast two tiny
tables, scan ONLY the probed cells' code files, one TakeOrdered. No
aggregation, no window, no train-time shuffle.

The cache key is the dataset directory name; ``build_pq_index`` always
rebuilds (that is its contract), the ``*_served`` helpers build lazily
if the index is absent or STALE so each registry query stays
standalone. Staleness is decided by the ``_COMPLETE`` marker, which
records a cheap dataset fingerprint (row count + max id + sum of ids —
one metadata-cheap aggregate): a dataset regenerated in place no longer
matches the marker, so the served queries rebuild instead of silently
serving codes from the old data, and a crash mid-rebuild leaves no
marker at all (it is removed first, recreated only after every
artifact lands) so mixed-generation artifacts are never served
(VERDICT r4 #5 / ADVICE r4).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.pq import (
    pq_codebooks,
    pq_encode,
    with_residuals,
)

_MARKER = "_COMPLETE"

ARTIFACTS = ("centroids", "pq_codebooks", "codes", "flat_codebooks", "flat_codes")


def index_path_for(sf_dir: str, root: str | None = None) -> str:
    """Deterministic local cache dir for the dataset at ``sf_dir`` (at
    scale this would be a lake path next to the table)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "default"
    base = root or os.path.join(tempfile.gettempdir(), "kafka_dbsync_spark_index")
    return os.path.join(base, tag)


def dataset_fingerprint(
    embeddings: DataFrame, id_col: str = "vec_id"
) -> dict:
    """Cheap content fingerprint of the indexed dataset: row count, max
    id, and sum of ids — one aggregate whose scan reads a single column
    (count/min/max often straight from parquet footers). Changing,
    adding, or removing rows moves at least one of the three; the cost
    is negligible next to a search, let alone a build."""
    row = embeddings.agg(
        F.count("*").alias("n"),
        F.max(id_col).alias("max_id"),
        F.sum(id_col).alias("sum_id"),
    ).head()
    return {
        "n": int(row["n"]),
        "max_id": None if row["max_id"] is None else int(row["max_id"]),
        "sum_id": None if row["sum_id"] is None else int(row["sum_id"]),
    }


# ---------------------------------------------------------------------------
# id digest: metadata-cheap merge/takedown guards (VERDICT r10 #3)
#
# The r10 merge guards (takedown resurrection, erasure mirror, id
# disjointness) were three Spark jobs that re-read codes at EVERY
# merge — correct, but the wrong cost model at scale. Each marker now
# carries an ``id_digest``: the live id set's [min, max] interval and
# residues-mod-64 mask (three plain columns riding the fingerprint
# aggregate — free at mutation time), plus — for id sets small enough
# that a fixed-m bitmap still discriminates (id_digest.BLOOM_MAX_IDS)
# — a fixed-parameter Bloom bitmap (m = 2^20 bits, k = 4, md5-derived
# positions — fixed so blooms of different indexes COMPOSE by OR and
# cross-test directly) from one capped, distributed word-grouped job.
# The guards then run a ladder:
#
#   1. interval / residue mask — disjoint [min,max] ranges or disjoint
#      residue sets prove disjointness with zero IO (ranges cover the
#      100 TB range-/partition-split sharding; the residue mask covers
#      parity and stride splits like even/odd);
#   2. bloom — a removed-ids probe tests each id against the other
#      side's bitmap in plain Python (absent-from-bloom is EXACT);
#      the full disjointness probe intersects the two bitmaps
#      driver-side and scans ONLY the source's ids against the tiny
#      AND-set (an id can be on both sides only if all k of its
#      positions survive the intersection) — no read of the
#      destination's codes at all, and an empty suspect set is a
#      PROOF of disjointness (a true duplicate always passes its own
#      bloom); a bloom-less digest (id set above BLOOM_MAX_IDS at
#      write time) just skips this rung — interval/residue stay exact;
#   3. exact fallback — only the suspects (expected ≈0: fpp^1 per
#      genuine absence) hit the old column-pruned isin / semi-join
#      probes, and legacy markers without digests keep the r10
#      behavior verbatim.
#
# Digest maintenance is superset-sound: build/shard-build compute it
# from the indexed ids, add/ingest OR-in the new batch (OR is
# replay-idempotent, so the streaming path needs no extra epoch
# bookkeeping), REMOVALS leave it untouched (a Bloom filter cannot
# unset; a superset digest can only produce false "maybe"s, never a
# false "absent"), and merge ORs the two sides.
#
# r12: the generic machinery lives in operators/id_digest.py so the
# BM25 segment family runs the same ladder (VERDICT r11 #1); this
# module keeps its original names as aliases.
# ---------------------------------------------------------------------------

from kafka_dbsync_spark.operators.id_digest import (  # noqa: E402
    DIGEST_K as _DIGEST_K,
    DIGEST_M as _DIGEST_M,
    MASK64 as _MASK64,
    attach_bloom as _attach_bloom,
    digest_agg_columns as _digest_agg_columns,
    digest_bitmap as _digest_bitmap,
    digest_from_agg_row as _digest_from_agg_row,
    digest_may_contain as _digest_may_contain,
    digest_or as _digest_or,
    digest_positions_py as _digest_positions_py,
    digest_usable as _digest_usable,
    disjoint_suspects as _disjoint_suspects,
)


def compute_id_digest(
    df: DataFrame, id_col: str = "vec_id", m: int | None = None
) -> dict | None:
    """id_digest record for the marker — see
    :func:`fingerprint_and_digest`, whose single job computes both.
    None for an empty id set (nothing to guard). ``m`` pins the bloom
    size — a batch digest destined to OR into an EXISTING marker
    digest must match its m (``digest_or`` keeps blooms only at equal
    m)."""
    return fingerprint_and_digest(df, id_col, m=m)[1]


def fingerprint_and_digest(
    df: DataFrame, id_col: str = "vec_id", m: int | None = None
) -> tuple[dict, dict | None]:
    """(dataset_fingerprint, id_digest) from ONE narrow-column job:
    the digest's interval/residue layers are three plain aggregate
    columns riding the fingerprint's own count/sum/max — no row
    multiplication, and the sum overflows exactly where
    ``dataset_fingerprint``'s plain aggregate would (r12: the r11
    shape posexploded the k bloom positions here, 4x-ing the frame —
    ADVICE r11's overflow fix conditioned on the slot index, but the
    simpler fix is not exploding at all). The bloom layer — its m
    SCALED to the id set (r13, ``id_digest.bloom_m_for``: constant
    fill, so segments stay bloom-covered to 2^21 ids instead of the
    old fixed-m 2^17 saturation point) — is one extra batch-sized job
    below ``BLOOM_MAX_IDS`` and skipped entirely above it — larger
    datasets get interval+residue-only digests, which still prove the
    dominant range-/stride-sharding shapes with zero IO. The
    residues-mod-64 mask is EXACT metadata for parity/stride sharding
    (even/odd, id%k==j): two shards with disjoint residue sets prove
    id-disjointness even when their intervals interleave. The digest
    half is None for an empty id set."""
    row = (
        df.select(F.col(id_col).try_cast("long").alias("__i"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("__i").alias("sm"),
            *_digest_agg_columns(),
        )
        .head()
    )
    fp = {
        "n": int(row["cnt"]),
        "max_id": None if row["__d_mx"] is None else int(row["__d_mx"]),
        "sum_id": None if row["sm"] is None else int(row["sm"]),
    }
    digest = _attach_bloom(
        df, id_col, _digest_from_agg_row(row), int(row["cnt"]), m=m
    )
    return fp, digest


def build_pq_index(
    spark: SparkSession,
    embeddings: DataFrame,
    centroids_long: DataFrame,
    path: str,
    n_sub: int = 8,
    d_sub: int = 8,
    k: int = 16,
    src_path: str | None = None,
) -> None:
    """Build and persist every index artifact under ``path`` (overwrite).

    Build-side plans are the same audited shapes as the fused query:
    centroid agg, residual broadcast-subtract, codebook agg, map-only
    encode. ``codes`` is written ``partitionBy(centroid_id)`` — at scale
    each cell directory is the unit a search lists/reads.

    The ``_COMPLETE`` marker is removed FIRST and re-created (with the
    dataset fingerprint, plus — when ``src_path`` is given — the source
    directory's file-listing signature so serves validate from
    metadata alone; see operators/cache_validation.py) only after every
    artifact lands, so a crash mid-rebuild leaves the index
    unmistakably incomplete rather than a stale marker over
    mixed-generation artifacts."""
    from kafka_dbsync_spark.operators.cache_validation import (
        files_signature,
        invalidate_memo,
    )

    from kafka_dbsync_spark.operators.concurrency import run_job_chains

    marker = os.path.join(path, _MARKER)
    invalidate_memo(path)
    if os.path.exists(marker):
        os.remove(marker)

    # r13 opt (guide §2.6): the fingerprint aggregate, the residual
    # artifact chain, and the flat artifact chain are INDEPENDENT job
    # chains over the same input — overlapping them back-fills executor
    # slots each chain's stage tail leaves idle. The marker still
    # writes only after every chain completes (crash discipline
    # unchanged; any chain failure propagates and leaves no marker).
    def _meta_chain():
        return fingerprint_and_digest(embeddings)

    def _resid_chain():
        centroids_long.write.mode("overwrite").parquet(f"{path}/centroids")
        cents = spark.read.parquet(f"{path}/centroids")
        resid = with_residuals(embeddings, cents)
        cb = pq_codebooks(resid, n_sub=n_sub, d_sub=d_sub, k=k, vec_col="resid")
        cb.write.mode("overwrite").parquet(f"{path}/pq_codebooks")
        cb_r = spark.read.parquet(f"{path}/pq_codebooks")
        enc = pq_encode(
            resid, cb_r, d_sub=d_sub, vec_col="resid",
            keep_cols=("label", "centroid_id"),
        )
        enc.write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{path}/codes"
        )

    def _flat_chain():
        fcb = pq_codebooks(embeddings, n_sub=n_sub, d_sub=d_sub, k=k)
        fcb.write.mode("overwrite").parquet(f"{path}/flat_codebooks")
        fcb_r = spark.read.parquet(f"{path}/flat_codebooks")
        pq_encode(embeddings, fcb_r, d_sub=d_sub).write.mode(
            "overwrite"
        ).parquet(f"{path}/flat_codes")

    (fp, _digest), _, _ = run_job_chains(_meta_chain, _resid_chain, _flat_chain)
    rec: dict = {"fingerprint": fp}
    if _digest is not None:
        rec["id_digest"] = _digest
    if src_path is not None:
        rec["src_sig"] = files_signature(src_path)
    with open(marker, "w") as f:
        json.dump(rec, f)


def index_is_current(
    path: str,
    src_path: str | None,
    embeddings: DataFrame,
    id_col: str = "vec_id",
    force_exact: bool = False,
) -> bool:
    """Serve-side staleness check with NO data scan on the happy path
    (VERDICT r5 #1): session memo -> marker-recorded source-file
    signature -> exact ``dataset_fingerprint`` comparison as the
    last-resort fallback (runs at most once per marker/dataset state
    per session, then memoizes). ``embeddings`` is only touched when
    both metadata tiers miss. ``force_exact=True`` runs the exact
    comparison every call — the coarse-mtime-store escape hatch
    (cache_validation docstring)."""
    from kafka_dbsync_spark.operators.cache_validation import (
        validate_cached_artifact,
    )

    return validate_cached_artifact(
        path,
        _MARKER,
        src_path,
        lambda rec: rec.get("fingerprint")
        == dataset_fingerprint(embeddings, id_col),
        force_exact=force_exact,
    )


def index_is_built(path: str, fingerprint: dict | None = None) -> bool:
    """True iff the marker exists AND (when ``fingerprint`` is given)
    matches the dataset fingerprint recorded at build time — a dataset
    regenerated in place invalidates the cached index. Markers from
    before fingerprints were recorded (non-JSON content) count as
    stale whenever a fingerprint is supplied."""
    marker = os.path.join(path, _MARKER)
    if not os.path.exists(marker):
        return False
    if fingerprint is None:
        return True
    try:
        with open(marker) as f:
            recorded = json.load(f).get("fingerprint")
    except (ValueError, OSError):
        return False
    return recorded == fingerprint


def index_summary(spark: SparkSession, path: str) -> DataFrame:
    """One row per persisted artifact: (artifact, n_rows) — read back
    from the written parquet, so a green row proves the artifact landed
    complete (value correctness of the index content is proven by the
    served searches' oracles, which must equal the fused queries)."""
    parts = [
        spark.read.parquet(f"{path}/{a}")
        .groupBy(F.lit(a).alias("artifact"))
        .agg(F.count("*").alias("n_rows"))
        for a in ARTIFACTS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_index_check(
    spark: SparkSession,
    path: str,
    full: bool = True,
) -> DataFrame:
    """Lucene's ``CheckIndex`` (FAISS has no equivalent; it should) for
    the persisted IVF-PQ family — the ANN twin of
    ``bm25_index.bm25_index_check``: a ``(check, artifact, status,
    detail)`` report with PASS / WARN (reclaimable or legacy, still
    servable) / FAIL (marker and artifacts disagree — rebuild before
    trusting serves).

    Metadata level (``full=False``, zero data IO): marker parse, the
    five artifact dirs exist, id_digest usability, uncommitted
    streaming-ingest epochs (their epoch-tagged files must not be
    compacted — the replay's delete-by-prefix would duplicate rows),
    and staging/compaction leftovers.

    Full level adds column-pruned aggregates: codes and flat_codes row
    counts vs the marker fingerprint's n, the fingerprint's max/sum
    recomputed from surviving codes, vec_id uniqueness inside codes,
    codes⇄flat_codes covering the SAME vector set, digest superset
    soundness (interval + residue mask over live ids), and — the
    opposite polarity of the BM25 check, because ANN removal is
    PHYSICAL cell rewrites — every marker ``removed_ids`` entry ABSENT
    from both code tables (a present one means a takedown was
    resurrected)."""
    rows: list[tuple] = []

    def add(check: str, artifact: str, ok, detail: str = "") -> None:
        rows.append((check, artifact, "PASS" if ok is True else ok, detail))

    def report() -> DataFrame:
        return spark.createDataFrame(
            rows,
            "check string, artifact string, status string, detail string",
        )

    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            rec = json.load(f)
    except (OSError, ValueError) as e:
        add("marker_parses", "", "FAIL", f"{e}")
        return report()
    add("marker_parses", "", True)
    for a in ARTIFACTS:
        there = os.path.isdir(os.path.join(path, a))
        add(
            "artifact_dir_exists",
            a,
            there or "FAIL",
            "" if there else "marker present but artifact missing",
        )
    digest = rec.get("id_digest")
    if _digest_usable(digest):
        add(
            "id_digest",
            "",
            True,
            "bloom" if digest.get("bloom") else "interval+residue",
        )
    else:
        add(
            "id_digest",
            "",
            "WARN",
            "no usable digest (legacy marker): merge/takedown guards fall "
            "back to exact probes — correct, but paying codes IO the "
            "digest rungs would prove for free",
        )
    pending = _pending_ingest_epochs(path)
    add(
        "ingest_epochs_committed",
        "",
        not pending or "WARN",
        f"uncommitted epoch(s) {sorted(pending)}: let the stream replay "
        "and commit before compacting"
        if pending
        else "",
    )
    codes_root = os.path.join(path, "codes")
    if os.path.isdir(codes_root):
        for entry in sorted(os.listdir(codes_root)):
            # DIRECTORIES only: Hadoop committers drop dot-FILES
            # (._SUCCESS.crc checksums) beside every parquet write —
            # normal artifacts, not crashed staging state
            if entry.startswith(".") and os.path.isdir(
                os.path.join(codes_root, entry)
            ):
                add(
                    "staging_leftover",
                    f"codes/{entry}",
                    "WARN",
                    "crashed compaction/staging dir; safe to reclaim when "
                    "no writer is running",
                )
    for entry in sorted(os.listdir(path)):
        if entry.startswith(".") and os.path.isdir(os.path.join(path, entry)):
            add(
                "staging_leftover",
                entry,
                "WARN",
                "crashed staging dir; safe to reclaim when no writer is "
                "running",
            )
    if not full or not all(
        os.path.isdir(os.path.join(path, a)) for a in ("codes", "flat_codes")
    ):
        return report()

    fp = rec.get("fingerprint")
    codes = spark.read.parquet(f"{path}/codes")
    st = codes.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("vec_id").alias("n_ids"),
        F.count(F.when(F.col("vec_id").isNull(), True)).alias("n_null"),
        F.max("vec_id").alias("mx"),
        F.min("vec_id").alias("mn"),
        F.sum("vec_id").alias("sm"),
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod("
            "try_cast(vec_id AS BIGINT), 64) AS INT)))"
        ).alias("res"),
    ).head()
    if not fp:
        # a legacy/servable state is WARN by this check's own
        # convention, mirroring the id_digest branch above — comparing
        # against fp.get('n', -1) would FAIL every legacy marker
        # (ADVICE r12)
        add(
            "codes_match_fingerprint",
            "codes",
            "WARN",
            "legacy marker without fingerprint: staleness checks fall "
            "back to exact recomputation; rebuild to restore the "
            "metadata ladder",
        )
        fp = {}
    else:
        add(
            "codes_match_fingerprint",
            "codes",
            (
                int(st["n"]) == int(fp.get("n", -1))
                and (
                    fp.get("max_id") is None
                    or (st["mx"] is not None and int(st["mx"]) == int(fp["max_id"]))
                )
                and (
                    fp.get("sum_id") is None
                    or (st["sm"] is not None and int(st["sm"]) == int(fp["sum_id"]))
                )
            )
            or "FAIL",
            f"codes n={st['n']}/max={st['mx']}/sum={st['sm']} vs marker "
            f"fingerprint {fp}",
        )
    # countDistinct ignores NULLs, so nulls and duplicates are DISTINCT
    # defects with distinct messages (ADVICE r12): an unaddressable
    # null id is not a "duplicate row"
    n_null = int(st["n_null"])
    add(
        "vec_ids_non_null",
        "codes",
        n_null == 0 or "FAIL",
        f"{n_null} NULL vec_id rows — unaddressable by every membership "
        "probe, takedown, and digest"
        if n_null
        else "",
    )
    add(
        "vec_ids_unique",
        "codes",
        int(st["n"]) - n_null == int(st["n_ids"]) or "FAIL",
        f"{int(st['n']) - n_null} non-null rows, {st['n_ids']} distinct "
        "vec_ids — a duplicate is served twice by every probe that lists "
        "its cell",
    )
    if _digest_usable(digest) and st["mn"] is not None:
        mask64 = (1 << 64) - 1
        superset = (
            int(st["mn"]) >= digest["min"]
            and int(st["mx"]) <= digest["max"]
            and (int(st["res"]) & mask64) & (~int(digest["res64"]) & mask64)
            == 0
        )
        add(
            "digest_superset_sound",
            "codes",
            superset or "FAIL",
            ""
            if superset
            else "live vec_ids fall outside the marker digest — a digest "
            "missing ids lets a merge falsely prove disjointness",
        )
    flat = spark.read.parquet(f"{path}/flat_codes").select("vec_id")
    only_codes = codes.select("vec_id").exceptAll(flat).count()
    only_flat = flat.exceptAll(codes.select("vec_id")).count()
    add(
        "codes_flat_codes_same_vectors",
        "",
        (only_codes == 0 and only_flat == 0) or "FAIL",
        f"{only_codes} ids only in codes, {only_flat} only in flat_codes "
        "— the IVF and flat views must cover the same vector set",
    )
    removed = [int(i) for i in rec.get("removed_ids") or []]
    if removed:
        resurrected = (
            codes.select("vec_id")
            .unionByName(flat)
            .filter(F.col("vec_id").isin(removed))
            .count()
        )
        add(
            "takedowns_stay_removed",
            "",
            resurrected == 0 or "FAIL",
            f"{resurrected} code rows carry a removed vec_id — ANN "
            "removal is physical, a present one is a resurrected "
            "takedown",
        )
    return report()


def ivfpq_search_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    nprobe: int = 2,
    k_top: int = 10,
    d_sub: int = 8,
    dist_decimals: int = 6,
    out_decimals: int = 4,
) -> DataFrame:
    """IVF-PQ search against the PERSISTED index — the 100 TB serving
    plan: collect B×dim centroid metadata, prune the codes scan to the
    probed cells (partition filter), broadcast the codebooks and the
    per-cell query residuals, ADC-fold, TakeOrdered. Results are
    identical to ``operators/pq.py::ivfpq_search`` by construction."""
    from kafka_dbsync_spark.operators.similarity import (
        centroid_arrays,
        select_probe_cells,
    )

    from kafka_dbsync_spark.operators import pq_kernels as K

    q = [float(x) for x in query_vec]
    cents = centroid_arrays(spark.read.parquet(f"{path}/centroids"))
    probe = select_probe_cells(cents, q, nprobe)
    cellvecs = dict(cents)
    # r13 opt (guide §4.2): per-cell ADC tables precomputed driver-side
    # from the codebook metadata (FAISS precomputed-tables), scored in
    # one mapInArrow gather pass — no qres broadcast join, no per-row
    # interpreted fold. The codes scan still prunes to the probed cells.
    books = K.collect_books(spark.read.parquet(f"{path}/pq_codebooks"))
    cell_luts = {
        int(c): K.adc_lut(
            books,
            [qi - ci for qi, ci in zip(q, cellvecs[c])],
            d_sub,
            dist_decimals,
        )
        for c in probe
    }
    cand = spark.read.parquet(f"{path}/codes").filter(
        F.col("centroid_id").isin([int(c) for c in probe])
    )
    scored = K.adc_score_frame(
        cand, "vec_id", ("label",), out_decimals, cell_luts=cell_luts
    )
    # the partition column reads back as int — adc_score_frame emits it
    # as bigint, so both paths share one output schema
    return scored.orderBy("adc_dist", "vec_id").limit(k_top)


def ivfpq_search_multi_index(
    spark: SparkSession,
    path: str,
    queries: list[tuple[int, list[float]]],
    nprobe: int = 2,
    k_top: int = 10,
    d_sub: int = 8,
    dist_decimals: int = 6,
    out_decimals: int = 4,
) -> DataFrame:
    """BATCHED IVF-PQ serving: answer Q queries with ONE pruned codes
    scan (the union of all queries' probe cells) instead of Q separate
    jobs — the amortization every production ANN service does (FAISS
    ``search(n, xq, ...)`` is batched for the same reason).

    Per query the math is identical to ``ivfpq_search_index``; the
    (query, cell) residuals ride in as one broadcast table joined on
    the cell id, so a candidate row is scored once per query probing
    its cell. The per-query top-k runs in TWO window stages — partial
    top-k per (query, input partition) first, exact top-k per query
    over the ≤ partitions × k survivors second — so no single task
    ever holds one query's full candidate set (a query-id-only window
    would cap parallelism at Q and make the hottest query a straggler
    at corpus scale; this is the distributed analogue of the
    single-query TakeOrderedAndProject's partial+merge). Returns
    (query_id, rank, vec_id, label, centroid_id, adc_dist)."""
    from kafka_dbsync_spark.operators.similarity import (
        centroid_arrays,
        select_probe_cells,
    )
    from pyspark.sql.window import Window as W

    if not queries:
        raise ValueError("queries must be non-empty")
    from kafka_dbsync_spark.operators import pq_kernels as K

    cents = centroid_arrays(spark.read.parquet(f"{path}/centroids"))
    cellvecs = dict(cents)
    # r13 opt (guide §4.2): the (query, cell) residual tables are
    # precomputed driver-side and each pruned row is emitted once per
    # query probing its cell inside one mapInArrow pass — replacing the
    # broadcast qres join + per-row interpreted fold with a table
    # gather. Still ONE pruned codes scan for all queries.
    books = K.collect_books(spark.read.parquet(f"{path}/pq_codebooks"))
    cell_queries: dict[int, list] = {}
    all_cells: set[int] = set()
    for qid, qv in queries:
        q = [float(x) for x in qv]
        probe = select_probe_cells(cents, q, nprobe)
        all_cells.update(int(c) for c in probe)
        for c in probe:
            cell_queries.setdefault(int(c), []).append(
                (
                    int(qid),
                    K.adc_lut(
                        books,
                        [qi - ci for qi, ci in zip(q, cellvecs[c])],
                        d_sub,
                        dist_decimals,
                    ),
                )
            )
    cand = spark.read.parquet(f"{path}/codes").filter(
        F.col("centroid_id").isin(sorted(all_cells))
    )
    scored = K.adc_score_frame(
        cand, "vec_id", ("label",), out_decimals, cell_queries=cell_queries
    )
    order = (F.col("adc_dist"), F.col("vec_id"))
    # stage 1: partial top-k per (query, input partition) — any split
    # works, the exact stage fixes it up; bounds per-task rows
    w_part = W.partitionBy("query_id", "__pid").orderBy(*order)
    partial = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__rk", F.row_number().over(w_part))
        .filter(F.col("__rk") <= k_top)
        .drop("__pid", "__rk")
    )
    # stage 2: exact top-k per query over ≤ partitions × k survivors
    w_q = W.partitionBy("query_id").orderBy(*order)
    return (
        partial.withColumn("rank", F.row_number().over(w_q))
        .filter(F.col("rank") <= k_top)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "vec_id", "label", "centroid_id", "adc_dist",
        )
    )


def ivfpq_search_refined_index(
    spark: SparkSession,
    path: str,
    embeddings: DataFrame,
    query_vec: list[float],
    nprobe: int = 2,
    k_top: int = 10,
    k_prime: int = 50,
    d_sub: int = 8,
) -> DataFrame:
    """IVF-PQ search with exact re-rank (FAISS ``IndexRefineFlat``):
    over-fetch the top ``k_prime`` ADC candidates from the persisted
    index, then re-order them by exact cosine against the raw vectors
    (``operators/pq.py::ivfpq_refine``) and return the top ``k_top``.
    Adds one broadcast semi-join of ≤ k′ ids into the raw table to the
    serving plan — no new shuffle shape."""
    from kafka_dbsync_spark.operators.pq import ivfpq_refine

    cand = ivfpq_search_index(
        spark, path, query_vec, nprobe=nprobe, k_top=k_prime, d_sub=d_sub
    )
    return ivfpq_refine(cand, embeddings, query_vec, k_top=k_top)


def pq_adc_search_index(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k_top: int = 10,
    d_sub: int = 8,
    dist_decimals: int = 6,
    out_decimals: int = 4,
) -> DataFrame:
    """Flat-PQ ADC top-k against the persisted index: scan only the
    8-byte code arrays, TakeOrdered. r13 opt (guide §4.2): the query's
    ADC table is precomputed driver-side from the codebook metadata and
    rows are scored by a numpy gather in one mapInArrow pass."""
    from kafka_dbsync_spark.operators import pq_kernels as K

    books = K.collect_books(spark.read.parquet(f"{path}/flat_codebooks"))
    lv = K.adc_lut(books, [float(x) for x in query_vec], d_sub, dist_decimals)
    scored = K.adc_score_frame(
        spark.read.parquet(f"{path}/flat_codes"),
        "vec_id",
        ("label",),
        out_decimals,
        luts=lv,
    )
    return scored.orderBy("adc_dist", "vec_id").limit(k_top)


def pq_index_add(
    spark: SparkSession,
    path: str,
    new_embeddings: DataFrame,
    d_sub: int = 8,
) -> None:
    """Incremental index maintenance — the FAISS ``add()`` half of the
    build/serve split: encode NEW vectors with the STORED coarse
    centroids and codebooks (no retrain — retraining would invalidate
    every previously-encoded code) and append them to the existing
    artifact partitions. At 100 TB this is the daily-ingest path: the
    quantizers are frozen index metadata, ingestion is a map-only
    encode + partitioned append touching only the cells the new
    vectors land in. Periodic full rebuilds (``build_pq_index``)
    re-train when drift accumulates — the standard IVF operating
    procedure, measured by the ``ann_recall_report`` curve."""
    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            rec = json.load(f)
    except (ValueError, OSError):
        rec = {}
    # the batch bloom is pinned to the MARKER digest's m so the fold
    # below OR-composes instead of dropping the bloom (r13: m scales
    # per digest; digest_or keeps blooms only at equal m)
    _rec_d = rec.get("id_digest") or {}
    add, add_digest = fingerprint_and_digest(
        new_embeddings, m=_rec_d.get("m") if _rec_d.get("bloom") else None
    )
    # PHASE 1 (ADVICE r11): fold the batch's id_digest into the marker
    # BEFORE any code rows land. The digest's merge-guard contract is
    # "superset of live ids" — a digest covering ids whose codes never
    # landed (crash between this write and the appends) is still
    # superset-sound, while the old order (codes first) left a crash
    # window where live code rows were MISSING from the digest and a
    # later pq_index_merge could falsely prove disjointness. The
    # fingerprint deliberately does NOT advance here: it must keep
    # matching the codes actually on disk until the appends complete,
    # so a crash in the window reads as "stale, rebuild" rather than
    # "current but missing rows".
    if "id_digest" in rec:
        folded = _digest_or(rec["id_digest"], add_digest)
        if folded is not None:
            rec["id_digest"] = folded
        else:
            rec.pop("id_digest", None)
    # the folded fingerprint (phase 2) will no longer be derivable from
    # the source directory listing — drop the metadata signature now;
    # the next validation falls back to one exact check and re-memoizes
    # (cache_validation tier 3)
    rec.pop("src_sig", None)
    with open(marker, "w") as f:
        json.dump(rec, f)
    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    invalidate_memo(path)
    # r13 opt (guide §2.6): the two appends are independent job chains
    # (phase-1 digest fold above already made a crash anywhere in them
    # superset-sound; the fingerprint advances only after BOTH land)
    from kafka_dbsync_spark.operators.concurrency import run_job_chains

    def _codes_chain():
        cents = spark.read.parquet(f"{path}/centroids")
        cb = spark.read.parquet(f"{path}/pq_codebooks")
        resid = with_residuals(new_embeddings, cents)
        pq_encode(
            resid, cb, d_sub=d_sub, vec_col="resid",
            keep_cols=("label", "centroid_id"),
        ).write.mode("append").partitionBy("centroid_id").parquet(
            f"{path}/codes"
        )

    def _flat_chain():
        fcb = spark.read.parquet(f"{path}/flat_codebooks")
        pq_encode(new_embeddings, fcb, d_sub=d_sub).write.mode(
            "append"
        ).parquet(f"{path}/flat_codes")

    run_job_chains(_codes_chain, _flat_chain)
    # PHASE 2: the index now covers build-time rows PLUS the added
    # ones — advance the marker's dataset fingerprint
    old = rec.get("fingerprint")
    if old:
        add = {
            "n": old["n"] + add["n"],
            "max_id": max(
                x for x in (old["max_id"], add["max_id"]) if x is not None
            )
            if (old["max_id"] is not None or add["max_id"] is not None)
            else None,
            "sum_id": (old["sum_id"] or 0) + (add["sum_id"] or 0)
            if (old["sum_id"] is not None or add["sum_id"] is not None)
            else None,
        }
    rec["fingerprint"] = add
    with open(marker, "w") as f:
        json.dump(rec, f)
    invalidate_memo(path)


def pq_index_remove(
    spark: SparkSession,
    path: str,
    remove_ids,
) -> dict:
    """Remove vectors from the persisted index WITHOUT retraining — the
    FAISS ``remove_ids`` shape, and the index-side half of a
    right-to-erasure request (the dedup index has had this since r5;
    a 100 TB serving deployment cannot answer a takedown with a full
    retrain). Quantizers stay FROZEN (centroids and both codebook
    tables are untouched — retraining them would invalidate every
    other vector's codes); only the code rows disappear:

    - ``codes/`` is partitioned by ``centroid_id``, so the rewrite
      touches ONLY the cells the removed vectors live in — one
      column-pruned scan finds the affected cells, then each is
      staging-swap rewritten (write survivors aside, rename into
      place; a cell whose every vector is removed is deleted). The
      other B - k cell directories are never read or written.
    - ``flat_codes/`` (the non-IVF demo pair) is staging-swap
      rewritten whole — the honest cost of deleting from ANY flat
      index (FAISS ``remove_ids`` on IndexFlat is O(n) for the same
      reason); at scale the IVF path is the serving path.

    Marker discipline matches ``dedup_index_remove``: refuse when no
    complete index exists, marker OUT before the rewrite and back IN
    only after every artifact lands (a crash mid-rewrite leaves the
    index unmistakably incomplete, never silently half-rewritten).
    The recorded fingerprint is refreshed from the SURVIVING codes
    (one column-pruned aggregate), the source-listing signature moves
    to ``built_src_sig`` (the index now intentionally diverges from
    the source table, so metadata-vs-source validation must not
    resurrect the vector via a "stale, rebuild" path the caller did
    not ask for — serve helpers that manage removal validate against
    ``built_src_sig`` + ``removed_ids`` instead), and the cumulative
    ``removed_ids`` list is recorded for exactly that validation.

    Removal ids ride the plan as a small ``isin`` literal list (a
    takedown batch is small by contract, same as the dedup index).
    Returns ``{"vectors_removed": n, "cells_rewritten": k}``.
    """
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    if isinstance(remove_ids, DataFrame):
        remove_ids = [r[0] for r in remove_ids.collect()]
    ids = sorted({int(i) for i in remove_ids})
    if not ids:
        raise ValueError("remove_ids must be non-empty")
    marker = os.path.join(path, _MARKER)
    if not os.path.exists(marker):
        raise ValueError(
            f"no complete index at {path} (missing {_MARKER}); removing "
            "from an absent or mid-build index is a caller bug — build "
            "with build_pq_index first."
        )
    try:
        with open(marker) as f:
            rec = json.load(f)
    except ValueError:
        rec = {}
    codes = spark.read.parquet(f"{path}/codes")
    # Refuse a takedown that would empty the index BEFORE invalidating
    # the marker (ADVICE r8): with every cell rmtree'd the fingerprint
    # refresh below would die on a schema-less read AFTER the marker was
    # already gone, leaving the index permanently invalid with an
    # unrelated error. An all-vectors takedown is an index drop, not a
    # remove — the caller should delete the directory instead.
    if codes.filter(~F.col("vec_id").isin(ids)).isEmpty():
        raise ValueError(
            f"pq_index_remove would remove every vector in the index at "
            f"{path}; removing the whole index is a directory delete, "
            "not a takedown — refusing (index left valid)."
        )
    invalidate_memo(path)
    os.remove(marker)  # crash window: no marker -> index invalid
    hit = codes.filter(F.col("vec_id").isin(ids))
    # one column-pruned scan: which cells hold the victims, how many rows
    cells_rows = (
        hit.groupBy("centroid_id").agg(F.count("*").alias("k")).collect()
    )
    affected = sorted(int(r["centroid_id"]) for r in cells_rows)
    n_removed = int(sum(r["k"] for r in cells_rows))
    for c in affected:
        cell_dir = f"{path}/codes/centroid_id={c}"
        staging = f"{path}/codes/.centroid_id={c}.rewrite"
        survivors = spark.read.parquet(cell_dir).filter(
            ~F.col("vec_id").isin(ids)
        )
        if survivors.isEmpty():
            shutil.rmtree(cell_dir)
            continue
        survivors.write.mode("overwrite").parquet(staging)
        shutil.rmtree(cell_dir)
        os.rename(staging, cell_dir)
    flat_src = f"{path}/flat_codes"
    flat_staging = f"{path}/.flat_codes.rewrite"
    spark.read.parquet(flat_src).filter(
        ~F.col("vec_id").isin(ids)
    ).write.mode("overwrite").parquet(flat_staging)
    shutil.rmtree(flat_src)
    os.rename(flat_staging, flat_src)
    # refresh bookkeeping from the SURVIVING codes (column-pruned agg).
    # id_digest is deliberately NOT recomputed: a Bloom bitmap cannot
    # unset, and a superset digest stays sound — it can only produce
    # false "maybe"s (extra exact probes), never a false "absent"
    rec["fingerprint"] = dataset_fingerprint(
        spark.read.parquet(f"{path}/codes")
    )
    if "src_sig" in rec:
        rec["built_src_sig"] = rec.pop("src_sig")
    rec["removed_ids"] = sorted(set(rec.get("removed_ids", [])) | set(ids))
    with open(marker, "w") as f:
        json.dump(rec, f)
    invalidate_memo(path)
    return {"vectors_removed": n_removed, "cells_rewritten": len(affected)}


def index_serves_removal(
    path: str, src_path: str | None, removed_ids
) -> bool:
    """Metadata-only validity check for a serve path that MANAGES
    removals (e.g. a registry query that builds, removes, then
    serves): True iff the marker exists, records EXACTLY the expected
    cumulative removal set, and was built from the source directory's
    current file listing (``built_src_sig``, stashed by
    :func:`pq_index_remove`). A post-removal index intentionally fails
    :func:`index_is_current` against the source table — that check
    would trigger a rebuild and resurrect the removed vectors — so
    removal-managing callers validate with THIS instead. No Spark job
    runs: marker JSON + one os.scandir of the source."""
    from kafka_dbsync_spark.operators.cache_validation import files_signature

    marker = os.path.join(path, _MARKER)
    if not os.path.exists(marker):
        return False
    try:
        with open(marker) as f:
            rec = json.load(f)
    except (ValueError, OSError):
        return False
    if rec.get("removed_ids") != sorted({int(i) for i in removed_ids}):
        return False
    if src_path is not None:
        sig = files_signature(src_path)
        if sig is None or rec.get("built_src_sig") != sig:
            return False
    return True


def _pending_ingest_epochs(path: str) -> set[int]:
    """Epochs with streaming-ingest residue but no ingest/e{N}/_SUCCESS:
    leftover staging dirs (``.ingest_e{N}`` / ``.ingest_flat_e{N}``) or
    epoch-prefixed live files (``e{N}-*.parquet`` in a codes cell or in
    flat_codes). Pure os.scandir — no Spark job."""
    import re

    pending: set[int] = set()
    stage_re = re.compile(r"^\.ingest(?:_flat)?_e(\d+)$")
    file_re = re.compile(r"^e(\d+)-")
    for n in os.listdir(path):
        m = stage_re.match(n)
        if m and not _ingest_committed(path, int(m.group(1))):
            pending.add(int(m.group(1)))

    def scan_files(d: str) -> None:
        if not os.path.isdir(d):
            return
        for n in os.listdir(d):
            m = file_re.match(n)
            if m and not _ingest_committed(path, int(m.group(1))):
                pending.add(int(m.group(1)))

    codes_root = os.path.join(path, "codes")
    if os.path.isdir(codes_root):
        for d in os.listdir(codes_root):
            if d.startswith("centroid_id="):
                scan_files(os.path.join(codes_root, d))
    scan_files(os.path.join(path, "flat_codes"))
    return pending


def pq_index_compact(
    spark: SparkSession,
    path: str,
    files_per_cell: int = 1,
) -> dict:
    """Fold an append-grown index back to freshly-built file shape (the
    pq twin of ``dedup_index_compact``; VERDICT r6 #4 class): every
    ``pq_index_add`` appends parquet files to the touched ``codes``
    cell directories and to ``flat_codes``, so a long ingest stream
    accumulates O(batches) small files per cell — at 100 TB that is
    the listing/open cost a serving scan pays on every probe. Each
    cell directory is staging-swap rewritten to ``files_per_cell``
    files; ``flat_codes`` folds to one file per shuffle partition of
    its coalesced read. CONTENTS are unchanged — quantizers, codes,
    fingerprint, removed_ids all carry over (asserted in tests via
    byte-identical served answers) — so the marker record is preserved
    verbatim; marker OUT before the first rewrite and back IN after
    the last, the shared crash discipline.

    Returns {"cells": n, "code_files_before": a, "code_files_after": b}.
    """
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    marker = os.path.join(path, _MARKER)
    if not os.path.exists(marker):
        raise ValueError(
            f"no complete index at {path} (missing {_MARKER}); compacting "
            "an absent or mid-build index is a caller bug."
        )
    # Pending-ingest guard (ADVICE r8, medium): an ingest epoch that
    # crashed before its ingest/e{N}/_SUCCESS commit may have left
    # e{N}-prefixed files in live cell dirs (and/or its staging dirs).
    # Folding those into untagged part files would make the stream's
    # replay — whose convergence argument is delete-by-prefix in
    # _move_epoch_files — miss them and DUPLICATE the epoch's rows.
    # The admission compactors guard with ceiling=min(pending); here the
    # epoch tags live in file names, so scan and refuse.
    pending = _pending_ingest_epochs(path)
    if pending:
        raise ValueError(
            f"uncommitted streaming-ingest epoch(s) {sorted(pending)} at "
            f"{path}: their epoch-tagged files must not be folded into "
            "untagged part files (the replay's delete-by-prefix would "
            "miss them and duplicate the rows). Let the stream replay "
            "and commit them, then compact."
        )
    with open(marker) as f:
        rec_raw = f.read()
    invalidate_memo(path)
    os.remove(marker)

    def _parquet_files(d: str) -> int:
        return sum(1 for n in os.listdir(d) if n.endswith(".parquet"))

    codes_root = f"{path}/codes"
    cells = sorted(
        d for d in os.listdir(codes_root) if d.startswith("centroid_id=")
    )
    before = sum(_parquet_files(os.path.join(codes_root, d)) for d in cells)
    for d in cells:
        cell_dir = os.path.join(codes_root, d)
        if _parquet_files(cell_dir) <= files_per_cell:
            continue
        staging = os.path.join(codes_root, f".{d}.compact")
        spark.read.parquet(cell_dir).coalesce(files_per_cell).write.mode(
            "overwrite"
        ).parquet(staging)
        shutil.rmtree(cell_dir)
        os.rename(staging, cell_dir)
    after = sum(_parquet_files(os.path.join(codes_root, d)) for d in cells)
    flat_src = f"{path}/flat_codes"
    if _parquet_files(flat_src) > files_per_cell:
        flat_staging = f"{path}/.flat_codes.compact"
        spark.read.parquet(flat_src).coalesce(files_per_cell).write.mode(
            "overwrite"
        ).parquet(flat_staging)
        shutil.rmtree(flat_src)
        os.rename(flat_staging, flat_src)
    with open(marker, "w") as f:
        f.write(rec_raw)
    invalidate_memo(path)
    return {
        "cells": len(cells),
        "code_files_before": before,
        "code_files_after": after,
    }


def _ingest_committed(path: str, epoch: int) -> bool:
    return os.path.exists(os.path.join(path, "ingest", f"e{epoch}", "_SUCCESS"))


def _move_epoch_files(staging_cell: str, target_cell: str, prefix: str) -> None:
    """Idempotent move of one staging cell's parquet files into the live
    cell directory under DETERMINISTIC epoch-tagged names: any files a
    crashed earlier attempt left under this prefix are deleted first,
    then the fresh files rename in — a replay converges to exactly one
    copy of the epoch's rows no matter where the previous attempt
    died."""
    os.makedirs(target_cell, exist_ok=True)
    for n in list(os.listdir(target_cell)):
        if n.startswith(prefix):
            os.remove(os.path.join(target_cell, n))
    files = sorted(
        n for n in os.listdir(staging_cell) if n.endswith(".parquet")
    )
    for i, n in enumerate(files):
        os.rename(
            os.path.join(staging_cell, n),
            os.path.join(target_cell, f"{prefix}{i:05d}.parquet"),
        )


def pq_index_ingest_foreach_batch(
    path: str,
    d_sub: int = 8,
    compact_every: int | None = None,
):
    """``foreachBatch`` function for EXACTLY-ONCE streaming ANN ingest —
    the replay-safe twin of :func:`pq_index_add` (which, as a plain
    ``mode("append")``, writes the batch AGAIN when Structured
    Streaming redelivers an epoch after a sink crash; the dedup index
    and admission stacks solved this with committed epoch state in r5-7
    and the ANN index now matches). Per micro-batch:

    1. replayed-epoch guard: a committed epoch returns without work;
    2. encode the batch with the FROZEN quantizers (identical math to
       ``pq_index_add`` — no retrain, map-only);
    3. write the epoch's codes to a staging dir partitioned by cell,
       then move each cell's files into the live partition under
       DETERMINISTIC epoch-tagged names (``e{N}-i.parquet``), deleting
       any same-prefix leftovers first — so a replay after a crash
       anywhere in the move converges to exactly one copy;
    4. refresh the marker fingerprint FROM THE SURVIVING CODES (one
       column-pruned aggregate — derived from final state, so the
       refresh itself is replay-idempotent, unlike add()'s incremental
       fold which would double-count);
    5. commit the epoch LAST (``ingest/e{N}/_SUCCESS``).

    Crash visibility contract (documented, matching every production
    ANN ingest): rows of an UNCOMMITTED epoch may be served during the
    crash window — an ANN index serves approximate results and a few
    early rows are harmless — but the replay never duplicates them,
    and the fingerprint only advances at step 4. The source-listing
    signature moves to ``built_src_sig`` on first ingest (the index
    now intentionally diverges from its build source; serve paths that
    manage ingest validate with their own epoch bookkeeping).

    ``compact_every``: fold the per-epoch small files back to built
    shape with :func:`pq_index_compact` every N committed epochs.
    """
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch = int(epoch_id)
        if _ingest_committed(path, epoch):
            return
        marker = os.path.join(path, _MARKER)
        if not os.path.exists(marker):
            raise ValueError(
                f"no complete index at {path}; build_pq_index must run "
                "before streaming ingest."
            )
        cents = spark.read.parquet(f"{path}/centroids")
        cb = spark.read.parquet(f"{path}/pq_codebooks")
        fcb = spark.read.parquet(f"{path}/flat_codebooks")
        staging = os.path.join(path, f".ingest_e{epoch}")
        staging_flat = os.path.join(path, f".ingest_flat_e{epoch}")
        resid = with_residuals(batch_df, cents)
        pq_encode(
            resid, cb, d_sub=d_sub, vec_col="resid",
            keep_cols=("label", "centroid_id"),
        ).write.mode("overwrite").partitionBy("centroid_id").parquet(staging)
        pq_encode(batch_df, fcb, d_sub=d_sub).write.mode(
            "overwrite"
        ).parquet(staging_flat)
        # PHASE 1 (ADVICE r11, mirroring pq_index_add): OR the epoch's
        # id_digest into the marker BEFORE any staged file moves into a
        # live cell — a crash mid-move must never leave live code rows
        # the digest misses (superset-sound; OR is replay-idempotent so
        # a redelivered epoch just re-sets the same bits). The
        # fingerprint refresh stays AFTER the moves (step 4): it is
        # derived from final on-disk state.
        try:
            with open(marker) as f:
                rec = json.load(f)
        except (ValueError, OSError):
            rec = {}
        if "id_digest" in rec:
            _rec_d = rec.get("id_digest") or {}
            folded = _digest_or(
                rec["id_digest"],
                # bloom pinned to the marker digest's m so the OR
                # composes (digest_or keeps blooms only at equal m)
                compute_id_digest(
                    batch_df,
                    m=_rec_d.get("m") if _rec_d.get("bloom") else None,
                ),
            )
            if folded is not None:
                rec["id_digest"] = folded
            else:
                rec.pop("id_digest", None)
            with open(marker, "w") as f:
                json.dump(rec, f)
            invalidate_memo(path)
        prefix = f"e{epoch}-"
        for d in sorted(os.listdir(staging)):
            if not d.startswith("centroid_id="):
                continue
            _move_epoch_files(
                os.path.join(staging, d),
                os.path.join(path, "codes", d),
                prefix,
            )
        _move_epoch_files(staging_flat, f"{path}/flat_codes", prefix)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(staging_flat, ignore_errors=True)
        # fingerprint from the SURVIVING codes: replay-idempotent (the
        # digest was already folded in phase 1, before the moves)
        try:
            with open(marker) as f:
                rec = json.load(f)
        except (ValueError, OSError):
            rec = {}
        rec["fingerprint"] = dataset_fingerprint(
            spark.read.parquet(f"{path}/codes")
        )
        if "src_sig" in rec:
            rec["built_src_sig"] = rec.pop("src_sig")
        with open(marker, "w") as f:
            json.dump(rec, f)
        invalidate_memo(path)
        commit_dir = os.path.join(path, "ingest", f"e{epoch}")
        os.makedirs(commit_dir, exist_ok=True)
        with open(os.path.join(commit_dir, "_SUCCESS"), "w") as f:
            f.write("")
        if compact_every and epoch > 0 and epoch % compact_every == 0:
            pq_index_compact(spark, path)

    return fn


def quantizer_signature(spark: SparkSession, path: str) -> dict:
    """Exact integer fingerprint of the FROZEN quantizers (centroids +
    both codebook tables): per artifact, (row count, sum of values
    scaled to micro-units as longs, xor of per-row position hashes).
    Sums and xors are associative and commutative, so the signature is
    independent of partitioning and read order — but the xor component
    hashes each row's KEY columns together with its scaled value
    (``xxhash64(label/m/code/dim..., value)``), so two quantizers whose
    values merely permute across positions (same count, same sum) no
    longer collide. Two indexes are merge-compatible iff their
    signatures are equal: codes are only comparable when they were
    produced by identical quantizers (the FAISS ``merge_from``
    precondition).

    Cost shape (r13 opt): ONE Spark job for all three artifacts — the
    per-artifact 1-row aggregates union and collect together (the old
    shape ran three sequential head() jobs; merge paid six)."""
    return quantizer_signatures(spark, [path])[0]


def quantizer_signatures(
    spark: SparkSession, paths: list[str]
) -> list[dict]:
    """:func:`quantizer_signature` for SEVERAL indexes in ONE Spark
    job: every (path, artifact) 1-row aggregate unions into a single
    collect, so merge validates both sides with one driver round-trip.
    Values are identical to the per-path function (same aggregate
    expressions, associative/commutative folds)."""
    subs = (
        ("centroids", "centroid"),
        ("pq_codebooks", "cw"),
        ("flat_codebooks", "cw"),
    )
    u = None
    for pi, path in enumerate(paths):
        for sub, val_col in subs:
            df = spark.read.parquet(f"{path}/{sub}")
            scaled = F.round(F.col(val_col) * 1e6).cast("long")
            keys = [F.col(c) for c in df.columns if c != val_col]
            one = df.agg(
                F.count("*").alias("n"),
                F.sum(scaled).alias("s"),
                F.bit_xor(F.xxhash64(*keys, scaled)).alias("h"),
            ).select(
                F.lit(pi).alias("__pi"), F.lit(sub).alias("__sub"),
                "n", "s", "h",
            )
            u = one if u is None else u.unionByName(one)
    rows = {(r["__pi"], r["__sub"]): r for r in u.collect()}
    out = []
    for pi in range(len(paths)):
        sig = {}
        for sub, _ in subs:
            r = rows[(pi, sub)]
            sig[sub] = [
                int(r["n"]),
                int(r["s"] if r["s"] is not None else 0),
                int(r["h"] if r["h"] is not None else 0),
            ]
        out.append(sig)
    return out


def build_pq_shard(
    spark: SparkSession,
    quantizer_src: str,
    embeddings: DataFrame,
    path: str,
    d_sub: int = 8,
) -> None:
    """Build ONE SHARD of a distributed index: copy the FROZEN
    quantizers from a trained index and encode only this shard's
    vectors — the per-partition half of the 100 TB build story (train
    the quantizers once on a sample, then every shard encodes its slice
    in parallel with no coordination, exactly how FAISS big-index
    builds shard ``add()`` across workers), merged afterwards with
    :func:`pq_index_merge`. Same marker-last crash discipline as
    ``build_pq_index``; the recorded ``quantizer_sig`` is recomputed
    from the COPIED artifacts (what merge will validate), not trusted
    from the source marker."""
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    if not os.path.exists(os.path.join(quantizer_src, _MARKER)):
        raise ValueError(
            f"no complete index at {quantizer_src} to take quantizers "
            "from; train with build_pq_index first."
        )
    from kafka_dbsync_spark.operators.concurrency import run_job_chains

    marker = os.path.join(path, _MARKER)
    invalidate_memo(path)
    if os.path.exists(marker):
        os.remove(marker)
    os.makedirs(path, exist_ok=True)
    for sub in ("centroids", "pq_codebooks", "flat_codebooks"):
        dst = os.path.join(path, sub)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(os.path.join(quantizer_src, sub), dst)

    # r13 opt (guide §2.6): fingerprint, residual-codes, flat-codes and
    # the quantizer-signature readback are independent job chains (the
    # quantizer artifacts are already copied above) — overlap them;
    # marker-last discipline unchanged.
    def _meta_chain():
        return fingerprint_and_digest(embeddings)

    def _codes_chain():
        cents = spark.read.parquet(f"{path}/centroids")
        cb = spark.read.parquet(f"{path}/pq_codebooks")
        resid = with_residuals(embeddings, cents)
        pq_encode(
            resid, cb, d_sub=d_sub, vec_col="resid",
            keep_cols=("label", "centroid_id"),
        ).write.mode("overwrite").partitionBy("centroid_id").parquet(
            f"{path}/codes"
        )

    def _flat_chain():
        fcb = spark.read.parquet(f"{path}/flat_codebooks")
        pq_encode(embeddings, fcb, d_sub=d_sub).write.mode(
            "overwrite"
        ).parquet(f"{path}/flat_codes")

    def _sig_chain():
        return quantizer_signature(spark, path)

    (fp, _digest), _, _, qsig = run_job_chains(
        _meta_chain, _codes_chain, _flat_chain, _sig_chain
    )
    rec = {
        "fingerprint": fp,
        "quantizer_sig": qsig,
    }
    if _digest is not None:
        rec["id_digest"] = _digest
    with open(marker, "w") as f:
        json.dump(rec, f)


def _check_id_disjoint(
    spark: SparkSession,
    src_ids,
    dst_ids,
    src_digest,
    dst_digest,
    src_path: str,
    dst_path: str,
) -> None:
    """Refuse when the two indexes share any vec_id. Ladder per the
    module's id_digest section, via the SHARED
    ``id_digest.disjoint_suspects`` (r13 — the pq and bm25 twins run
    ONE implementation): interval / residue-mask / same-m bloom
    AND-set / cross-m word join at the destination bloom's native m,
    scanning the SOURCE side only; exact semi-join for undecided
    (legacy-marker) pairs. ``src_ids``/``dst_ids`` are LAZY thunks
    returning the codes id column — the metadata-only rungs never pay
    the parquet listing (disjoint_suspects resolves the thunk only
    when a scan rung runs)."""

    def _refuse(sample) -> None:
        raise ValueError(
            f"source index {src_path} and destination {dst_path} share "
            f"vector id(s) {sorted(sample)}...: per-cell concatenation "
            "would serve them twice. Shards must be id-disjoint — "
            "re-shard, or pq_index_remove the overlap from one side."
        )

    suspects = _disjoint_suspects(
        spark, src_ids, src_digest, dst_digest, "vec_id"
    )
    if suspects == []:
        return  # proven disjoint with zero index IO
    if suspects is not None:
        sample = [
            r["vec_id"]
            for r in dst_ids()
            .filter(F.col("vec_id").isin(suspects))
            .limit(10)
            .collect()
        ]
        if sample:
            _refuse(sample)
        return
    # undecided (legacy digests / giant suspect set): exact fallback
    overlap = src_ids().join(dst_ids(), "vec_id", "left_semi")
    if not overlap.isEmpty():
        _refuse([r["vec_id"] for r in overlap.limit(10).collect()])


def pq_index_merge(
    spark: SparkSession,
    dst_path: str,
    src_path: str,
) -> dict:
    """Merge a shard index into ``dst_path`` — FAISS ``merge_from``,
    the step that turns per-shard parallel builds into one servable
    index. SAME-QUANTIZER CONTRACT: refused unless both indexes'
    :func:`quantizer_signature` match exactly (codes from different
    quantizers are incommensurable; merging them would serve garbage
    distances). Unlike FAISS, the source index is left intact
    (read-only input — at 100 TB the shard dirs are retired by the
    orchestrator once the merged index is validated).

    Merge is per-cell FILE CONCATENATION: every source cell's parquet
    files copy into the matching destination cell directory under
    ``m{K}-``-prefixed names (K = the destination's merge counter, so
    repeated merges never collide with each other or with ``e{N}-``
    ingest files) — no Spark job touches the codes; the only reads are
    the tiny quantizer tables and one fingerprint aggregate. Marker
    discipline as in ``pq_index_compact``: marker OUT before the first
    copy, back IN after the fingerprint refresh — a crash mid-merge
    leaves the destination unmistakably incomplete (rebuild or
    re-shard; never silently half-merged). A source with UNCOMMITTED
    streaming-ingest residue is refused (its epoch-tagged files are
    not yet owned by any commit).

    Returns ``{"vectors_merged": n, "cells_touched": k}``."""
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    dst_marker = os.path.join(dst_path, _MARKER)
    src_marker = os.path.join(src_path, _MARKER)
    for p, m in ((dst_path, dst_marker), (src_path, src_marker)):
        if not os.path.exists(m):
            raise ValueError(
                f"no complete index at {p} (missing {_MARKER}); both merge "
                "sides must be complete indexes."
            )
    pending = _pending_ingest_epochs(src_path)
    if pending:
        raise ValueError(
            f"source index {src_path} has uncommitted streaming-ingest "
            f"epoch(s) {sorted(pending)}; merge would adopt rows no commit "
            "owns. Let the stream commit (or clean the residue) first."
        )
    dst_sig, src_sig = quantizer_signatures(spark, [dst_path, src_path])
    if dst_sig != src_sig:
        raise ValueError(
            "quantizer mismatch: the two indexes were trained with "
            "different centroids/codebooks, so their codes are "
            "incommensurable — merge refused (FAISS merge_from has the "
            "same precondition). Re-encode one side with build_pq_shard "
            "from the other's quantizers."
        )
    try:
        with open(dst_marker) as f:
            rec = json.load(f)
    except ValueError:
        rec = {}
    try:
        with open(src_marker) as f:
            src_rec = json.load(f)
    except ValueError:
        src_rec = {}
    # Merge guards, metadata-first (VERDICT r10 #3: the r10 probes were
    # three Spark jobs re-reading codes at every merge — right checks,
    # wrong cost model). Each guard now runs the id_digest ladder
    # (interval -> bloom -> exact probe over the surviving suspects
    # only); legacy markers without digests keep the exact probes.
    # codes reads are LAZY thunks: the metadata-only ladder must not
    # pay even the parquet file-listing when it proves everything
    def src_ids():
        return spark.read.parquet(f"{src_path}/codes").select("vec_id")

    def dst_ids():
        return spark.read.parquet(f"{dst_path}/codes").select("vec_id")

    src_digest = src_rec.get("id_digest")
    dst_digest = rec.get("id_digest")

    def _suspects(digest, ids: list[int]) -> list[int]:
        """ids the digest cannot rule out — metadata-only; absence is
        exact, so only these need a Spark probe."""
        if not _digest_usable(digest):
            return ids
        bm = _digest_bitmap(digest)
        return [i for i in ids if _digest_may_contain(digest, bm, i)]

    # Takedown-consistency guard: if the destination has REMOVED ids
    # (right-to-erasure), a shard still carrying one of them would be
    # silently resurrected by the file concat — while the marker (and
    # index_serves_removal) kept claiming the id is gone. Refuse; the
    # caller re-runs the takedown against the shard first (the same
    # pq_index_remove call) and then merges.
    dst_removed = [int(i) for i in rec.get("removed_ids") or []]
    suspects = _suspects(src_digest, dst_removed)
    if suspects and not src_ids().filter(
        F.col("vec_id").isin(suspects)
    ).isEmpty():
        raise ValueError(
            f"source index {src_path} contains vector id(s) the "
            f"destination removed ({sorted(dst_removed)[:10]}...): "
            "merging would resurrect a taken-down vector behind a "
            "marker that still claims erasure. Run pq_index_remove "
            "on the shard first, then merge."
        )
    # The mirror guard: the SOURCE's removed_ids will be unioned into
    # the destination marker below — if the destination still SERVES
    # one of those ids, the merged marker would claim erasure the index
    # does not honor (index_serves_removal reports it gone while search
    # returns it). Refuse; the caller runs the takedown on the
    # destination first.
    src_removed = [int(i) for i in src_rec.get("removed_ids") or []]
    suspects = _suspects(dst_digest, src_removed)
    if suspects and not dst_ids().filter(
        F.col("vec_id").isin(suspects)
    ).isEmpty():
        raise ValueError(
            f"destination index {dst_path} still serves vector "
            f"id(s) the source removed ({sorted(src_removed)[:10]}"
            "...): merging would record an erasure the merged index "
            "does not honor. Run pq_index_remove on the destination "
            "first, then merge."
        )
    # Disjointness contract: per-cell file concatenation is a UNION of
    # code rows, so any vec_id present on both sides would be served
    # TWICE after the merge (duplicated in search results, inflated
    # fingerprint) — silently breaking 'search-over-merged ==
    # search-over-union'. Ladder: disjoint intervals prove it free;
    # otherwise intersect the blooms driver-side and scan ONLY the
    # source's ids against the (tiny) AND-set — an id can live on both
    # sides only if all k of its positions survive, and a true
    # duplicate ALWAYS does, so an empty suspect set is a proof. The
    # destination's codes are never read unless suspects survive.
    _check_id_disjoint(
        spark, src_ids, dst_ids, src_digest, dst_digest, src_path, dst_path
    )
    merge_k = int(rec.get("merges", 0)) + 1
    prefix = f"m{merge_k}-"
    invalidate_memo(dst_path)
    os.remove(dst_marker)  # crash window: no marker -> dst invalid

    def copy_files(src_dir: str, dst_dir: str) -> int:
        os.makedirs(dst_dir, exist_ok=True)
        for n in list(os.listdir(dst_dir)):
            if n.startswith(prefix):  # leftovers cannot exist while the
                os.remove(os.path.join(dst_dir, n))  # marker protocol holds;
        moved = 0                                    # cheap belt-and-braces
        for i, n in enumerate(
            sorted(
                x for x in os.listdir(src_dir) if x.endswith(".parquet")
            )
        ):
            shutil.copyfile(
                os.path.join(src_dir, n),
                os.path.join(dst_dir, f"{prefix}{i:05d}.parquet"),
            )
            moved += 1
        return moved

    cells_touched = 0
    for d in sorted(os.listdir(f"{src_path}/codes")):
        if not d.startswith("centroid_id="):
            continue
        copy_files(f"{src_path}/codes/{d}", f"{dst_path}/codes/{d}")
        cells_touched += 1
    copy_files(f"{src_path}/flat_codes", f"{dst_path}/flat_codes")
    n_merged = int(
        src_rec.get("fingerprint", {}).get("n")
        or spark.read.parquet(f"{src_path}/codes").count()
    )
    rec["fingerprint"] = dataset_fingerprint(
        spark.read.parquet(f"{dst_path}/codes")
    )
    # merged digest = OR of the sides (they were just proven disjoint);
    # absent when either side lacked one — next merge falls back to the
    # exact probes
    folded = _digest_or(dst_digest, src_digest)
    if folded is not None:
        rec["id_digest"] = folded
    else:
        rec.pop("id_digest", None)
    rec["merges"] = merge_k
    removed = set(rec.get("removed_ids", [])) | set(
        src_rec.get("removed_ids", [])
    )
    if removed:
        rec["removed_ids"] = sorted(removed)
    # the merged content is no longer derivable from either source
    # directory listing — same reasoning as pq_index_add
    rec.pop("src_sig", None)
    with open(dst_marker, "w") as f:
        json.dump(rec, f)
    invalidate_memo(dst_path)
    return {"vectors_merged": n_merged, "cells_touched": cells_touched}

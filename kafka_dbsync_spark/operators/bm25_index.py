"""Persisted BM25 inverted index: build once, serve queries forever.

The serve twin of ``operators/corpus.py::bm25_topk`` — the missing
member of the engine's ``*_served`` family (bigram/trigram LMs,
Moore-Lewis, DSIR, NB classifier, IVF-PQ all have one). A production
search tier never re-scans the corpus per query: Lucene/Elasticsearch
build the postings ONCE and answer every query from the index. Here
the index is the classic search-engine layout re-expressed as
partition-pruned parquet:

    gen-{fingerprint}/postings  (term, doc_id, tf, dl)
                                partitioned by bucket = crc32(term) % 64
    gen-{fingerprint}/dfs       (term, df), same bucket partitioning
    _COMPLETE                   marker: corpus stats (n docs, Σdl),
                                fingerprint, live gen name

Document length is DENORMALIZED into each posting row (the Lucene
"norms live next to the postings" trick), so scoring needs NO join
against a doc-length table: a query reads only the bucket directories
of its terms (partition pruning — the 100 TB story: a 3-term query
touches 3/64ths of the postings *directory tree*, and the term
predicate then prunes row groups within them), pivots the ≤|q| matching
rows per doc back to tf columns, and evaluates the IDENTICAL
left-associative Okapi expression as the inline operator with the
marker's corpus stats folded in as literals. Build/serve are
arithmetic-identical by construction, so the served query reuses
``bm25_search``'s DuckDB oracle unchanged.

Publish / staleness / concurrency discipline is ``lm_index.py``'s
verbatim (``publish_generation`` immutable generation dirs, atomic
staging rename, marker-flips-last; ``lm_model_is_current`` metadata-
only staleness on the happy path). The fingerprint is the plain
corpus fingerprint — a BM25 index depends only on (id, text).

Incremental growth is Lucene's actual model — SEGMENTS: a new shard of
documents lands as its own immutable segment dir
(:func:`bm25_index_add` — tokenizes ONLY the shard, never re-reads the
indexed corpus), the marker's live-segment list flips last, and serves
union the pruned per-segment reads (corpus stats and per-term df are
additive because segment doc sets are DISJOINT — an add whose shard
shares a doc_id with the index is refused, the ANN-merge duplicate-id
guard). The marker carries per-segment metadata the mutations run on:
``segstats`` (n, Σdl — what the tiered merge policy sizes by, no
doclens jobs at policy time) and ``segdigests`` (per-segment id
digests, ``operators/id_digest.py`` — r12, VERDICT r11 #1): the
add/ingest disjointness probe runs the interval / residue-mask /
bloom ladder PER SEGMENT over the ARRIVING side only — r13: a
collectible batch is collected once and tested against every
segment's digest driver-side (vectorized numpy, zero Spark jobs per
segment), so per-epoch admission cost stays FLAT as the index grows
(VERDICT r12 #1's constant-epoch production shape); blooms scale
their m with segment size, so segments stay bloom-covered to 2^21
ids — so the duplicate-id guard costs ZERO segment IO on the proven
path instead of a per-mutation union read of every segment's doclens
— Lucene's per-segment metadata discipline, the same ladder
``pq_index_merge`` runs. Digest absence is exact, so takedown
validation and tombstone location read only may-contain segments;
legacy markers without digests keep the exact probes verbatim.
:func:`bm25_segment_merge` compacts the live segments into one
(Lucene's background merge), retiring the old dirs only after the
marker flips, and records an EXACT digest recomputed from the
surviving doclens (erased-then-merged ids re-admit through the
zero-IO rungs). The marker fingerprint composes additively on add
(count/sum/max/content-sum all combine), so the staleness ladder keeps
working against the UNION corpus.

Writer concurrency contract — Lucene's, exactly: concurrent
BUILDS of the same corpus race safely (``publish_generation``'s
rename-discard protocol), and a reader that resolves the marker sees
a complete, immutable view (every marker flip is one atomic replace
pointing only at complete dirs). Readers concurrent with a MERGE get
one merge cycle of grace: the merge renames superseded segment dirs
to ``.retired-*`` rather than deleting them (Lucene keeps them alive
via reader refcounts; without refcounts the trash is reclaimed by the
NEXT merge), so only a reader that straddles TWO merges of the same
index can observe a vanished dir — the same single-writer caveat
below bounds how often that can happen. add / remove / merge are
read-modify-write on the marker and assume ONE writer at a time
(Lucene's IndexWriter lock); two concurrent adds can lose one marker
update — serialize mutations externally, as every Lucene deployment
does.

Scale notes: the build shuffles once on (doc, term) for term
frequencies (map-side combined; tf collapses before the exchange) and
once on term for document frequencies; corpus text never shuffles
(only tokens/hashes move). N and Σdl are scalar marker metadata — the
serve path runs ZERO corpus-wide jobs.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_dbsync_spark.functions.text import normalize_text
from kafka_dbsync_spark.operators.id_digest import (
    DIGEST_SUSPECT_CAP,
    attach_bloom,
    collect_probe_ids,
    digest_agg_columns,
    digest_bitmap,
    digest_from_agg_row,
    digest_may_contain,
    digest_usable,
    disjoint_suspects,
    ids_digest,
    probe_membership,
    probe_positions,
)
from kafka_dbsync_spark.operators.lm_index import (
    _MARKER,
    _gen_name,
    corpus_fingerprint,
    lm_model_is_current,
    publish_generation,
)

#: number of term-hash partition buckets in the postings layout. A
#: query for q terms reads at most q of these directories; 64 keeps
#: directory counts trivial at fixture scale while the layout (and the
#: pruning test) is the one you'd ship with 4096 buckets at 100 TB.
N_BUCKETS = 64

#: on-disk layout version. 2 = positional postings (pos column) +
#: doclens. An index whose marker carries an older (or missing) format
#: reports stale from :func:`bm25_index_is_current` so callers rebuild
#: rather than serving against a layout the reader can't use.
FORMAT = 2


def _schema_of(meta_or_schemas: dict, key: str):
    """StructType from a marker-recorded schema json (None when the
    marker predates schema recording — readers then fall back to
    inference, valid for any non-empty segment)."""
    s = meta_or_schemas.get(key)
    if s is None:
        return None
    from pyspark.sql import types as T

    return T.StructType.fromJson(json.loads(s))


def _schema_shape(schema_json: str) -> list[tuple[str, str]]:
    """(name, dataType) pairs of a recorded schema json — the
    comparison key for add-time compatibility. Nullability and field
    metadata are deliberately ignored: they vary with the shard's
    lineage and do not affect parquet read-back under an explicit
    schema, while a TYPE difference silently coerces at the
    disjointness join and then fails far away at serve/merge time."""
    fields = json.loads(schema_json)["fields"]
    return [(f["name"], json.dumps(f["type"], sort_keys=True)) for f in fields]


def _check_add_schemas(meta: dict, shard_schemas: dict, path: str) -> None:
    """ADVICE r10: ``bm25_index_add`` used to discard the shard's
    freshly computed schemas, so a shard whose id/text column types
    differed from the build (e.g. an int doc_id added to a bigint-built
    index — the join-based disjointness probe coerces and passes) wrote
    parquet the marker schema could not read back, failing at
    serve/merge time far from the add. Refuse the mismatch AT THE ADD:
    every live segment then provably satisfies the marker's
    build-corpus schemas, which is exactly what makes the single
    marker-level schema record sound. Markers that predate schema
    recording have nothing to compare against — their readers already
    fall back to inference."""
    for key in ("postings_schema", "dfs_schema", "doclens_schema"):
        recorded = meta.get(key)
        if recorded is None:
            continue
        want = _schema_shape(recorded)
        got = _schema_shape(shard_schemas[key])
        if want != got:
            raise ValueError(
                f"shard column types are incompatible with the index at "
                f"{path}: {key} is {got!r} but the marker records "
                f"{want!r} — cast the shard's id/text columns to the "
                "built corpus's types before adding"
            )


def _read_table(spark: SparkSession, meta: dict, path: str, seg: str, table: str):
    """Schema-explicit read of one segment table."""
    reader = spark.read
    st = _schema_of(meta, f"{table}_schema")
    if st is not None:
        reader = reader.schema(st)
    return reader.parquet(f"{path}/{seg}/{table}")


def term_bucket_py(term: str) -> int:
    """Python mirror of the Spark-side bucket expression — zlib.crc32
    and Spark's ``F.crc32`` share the CRC-32 polynomial and both yield
    the unsigned value, so driver-side pruning and build-side
    partitioning agree bit-for-bit."""
    return zlib.crc32(term.encode("utf-8")) % N_BUCKETS


def _bm25_tokens(text_col: str):
    """The EXACT tokenizer of bm25_topk (operators/corpus.py): NULL or
    normalized-empty text becomes an empty array so dl/tf are clean 0s
    — build and inline score must count identical tokens."""
    norm = normalize_text(text_col)
    return F.when(
        norm.isNull() | (norm == ""), F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))


def _postings_batches_fn(id_col: str):
    """mapInArrow body computing one segment's postings map-only (r13
    opt): per batch, flatten the pre-normalized text into (doc, term,
    1-based pos) triplets with numpy, group by (doc, term-code) with a
    stable lexsort (positions stay ascending, matching the old
    ``sort_array(collect_list(pos))`` exactly), and emit
    ``(id, term, tf, dl, pos, bucket)`` rows. ``bucket`` is
    ``zlib.crc32 % N_BUCKETS`` computed once per UNIQUE term —
    bit-identical to JVM ``crc32`` (same polynomial; the serve path's
    ``_term_bucket`` already relies on that equality). The positions
    ListArray is built from (offsets, values) buffers — no per-group
    Python lists. Ids pass through untouched via Arrow ``take``, so
    any id type the caller uses survives byte-exact."""

    def _batches(it):
        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in it:
            id_arr = batch.column(id_col)
            texts = batch.column("__bm25_norm").to_pylist()
            toks_per_doc = [t.split(" ") if t else [] for t in texts]
            sizes = np.fromiter(
                (len(t) for t in toks_per_doc),
                dtype=np.int64,
                count=len(toks_per_doc),
            )
            total = int(sizes.sum())
            if not total:
                continue
            flat = np.empty(total, dtype=object)
            o = 0
            for t in toks_per_doc:
                if t:
                    flat[o : o + len(t)] = t
                    o += len(t)
            doc_idx = np.repeat(np.arange(len(sizes)), sizes)
            starts_per_doc = np.cumsum(sizes) - sizes
            pos = np.arange(1, total + 1) - np.repeat(starts_per_doc, sizes)
            # hash-based coding (r13 opt follow-up): np.unique on object
            # strings pays a full comparison sort; factorize is O(n) and
            # code order is irrelevant — the stable lexsort below keyed
            # on (doc, code) keeps positions ascending per group either
            # way, and postings order within a batch is not part of the
            # segment contract (the write shuffles into bucket files)
            codes, uniq = pd.factorize(pd.Series(flat), sort=False)
            codes = codes.astype(np.int64)
            uniq = np.asarray(uniq, dtype=object)
            order = np.lexsort((codes, doc_idx))
            sd, sc, sp = doc_idx[order], codes[order], pos[order]
            newrun = np.ones(total, dtype=bool)
            newrun[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
            g_starts = np.flatnonzero(newrun)
            tf = np.diff(np.append(g_starts, total))
            g_doc = sd[g_starts]
            g_code = sc[g_starts]
            buckets = np.fromiter(
                (zlib.crc32(u.encode("utf-8")) % N_BUCKETS for u in uniq),
                dtype=np.int32,
                count=len(uniq),
            )
            uniq_pa = pa.array(uniq, type=pa.string())
            offsets = np.empty(len(g_starts) + 1, dtype=np.int32)
            offsets[0] = 0
            np.cumsum(tf, out=offsets[1:])
            pos_list = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()),
                pa.array(sp.astype(np.int32), type=pa.int32()),
            )
            take_idx = pa.array(g_doc, type=pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(id_arr, take_idx),
                    pc.take(uniq_pa, pa.array(g_code, type=pa.int64())),
                    pa.array(tf, type=pa.int64()),
                    pa.array(sizes[g_doc].astype(np.int32), type=pa.int32()),
                    pos_list,
                    pa.array(buckets[g_code], type=pa.int32()),
                ],
                names=[id_col, "term", "tf", "dl", "pos", "bucket"],
            )

    return _batches


#: segdigests value for a segment with zero docs: the union skips it
#: instead of abandoning the metadata rungs
_EMPTY_DIGEST = {"empty": True}
#: segdigests value for a segment whose ids the long cast lost (e.g.
#: non-numeric string doc ids): probes for it stay exact, and the
#: recorded sentinel stops the tiered-policy backfill from re-paying
#: the digest scan on every invocation
_UNKNOWN_DIGEST = {"unknown": True}


def _segment_writer(spark: SparkSession, docs: DataFrame, id_col: str, text_col: str):
    """(write_stage callable, (n, Σdl), schemas, id_digest) for one
    segment: postings with denormalized dl, per-term df folded from the
    published postings (never a second corpus pass), stats over ALL
    docs — token-empty ones included, exactly as bm25_topk's scalar
    aggregate counts them. The segment's id digest
    (``operators/id_digest.py``) rides the SAME stats aggregate as
    three plain interval/residue columns — free at write time — plus,
    for segments under ``BLOOM_MAX_IDS`` ids, one distributed bloom
    job at a size scaled to the segment (r13: ``bloom_m_for``) run
    inside ``write_stage`` over the STAGED doclens bytes (ADVICE r12:
    deriving it from a third evaluation of a non-deterministic docs
    lineage could bloom ids that differ from the written ones — a
    false-negative the superset contract forbids; the stats aggregate
    itself still assumes a deterministic input, the long-standing
    stats-vs-write split every fingerprinting write shares) — so
    add/ingest disjointness probes can run metadata-only."""
    norm = normalize_text(text_col)
    # dl without materializing the token array: the normalized alphabet
    # is single-spaced and trimmed, so token count == spaces + 1 for
    # non-empty text (r13 opt, guide §1.2 per-task work: split()
    # allocated millions of per-token strings just to take size())
    dl_expr = F.when(norm.isNull() | (norm == ""), F.lit(0)).otherwise(
        F.length(norm) - F.length(F.replace(norm, F.lit(" "), F.lit(""))) + 1
    )
    per_doc = docs.select(F.col(id_col), dl_expr.cast("int").alias("dl"))
    # positions are 1-based and sorted — the positional index that
    # makes exact phrase queries servable (Lucene's prox data).
    # r13 opt (guide §2.4 remove shuffles outright + §4.2): every
    # (doc, term) group lives inside ONE doc row, so the old
    # posexplode + groupBy(id, term) + collect_list shape shuffled the
    # full exploded token stream only to regroup rows that never left
    # their partition. The postings are now computed map-only in one
    # Arrow pass per batch (numpy unique/lexsort + a zero-copy Arrow
    # ListArray for positions) — no Exchange, value-identical output
    # (proven by exceptAll in both directions at sf0.1 before the
    # swap). The JVM lineage is kept ONLY as the plan-time schema donor
    # so the marker's schema JSON stays exactly what it always was.
    tok = _bm25_tokens(text_col)
    postings_schema_donor = (
        docs.select(F.col(id_col), F.size(tok).alias("dl"), tok.alias("__t"))
        .select(id_col, "dl", F.posexplode("__t").alias("__p0", "term"))
        .groupBy(id_col, "term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.max("dl").alias("dl"),
            F.sort_array(F.collect_list(F.col("__p0") + 1)).alias("pos"),
        )
        .withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("term")), F.lit(N_BUCKETS)).cast("int"),
        )
    )
    postings = docs.select(
        F.col(id_col), norm.alias("__bm25_norm")
    ).mapInArrow(
        _postings_batches_fn(id_col), postings_schema_donor.schema
    )
    # plan-time schemas ride in the marker so every read-back is
    # schema-EXPLICIT: a segment whose every doc is token-empty writes
    # zero posting rows, and a fileless parquet dir cannot infer
    schemas = {
        "postings_schema": postings.schema.json(),
        "dfs_schema": postings.select("bucket", "term")
        .groupBy("bucket", "term")
        .agg(F.count(F.lit(1)).alias("df"))
        .schema.json(),
        "doclens_schema": per_doc.select(id_col, "dl").schema.json(),
    }

    def write_stage(stage: str) -> None:
        # r13 opt (guide §2.6): the postings→dfs chain and the
        # doclens→bloom chain are independent — overlapping them
        # back-fills the executor slots each chain's tail leaves idle.
        # Within each chain the order is unchanged (dfs derives from
        # the STAGED postings, the bloom from the STAGED doclens).
        from kafka_dbsync_spark.operators.concurrency import run_job_chains

        def _postings_chain():
            # scale guard (guide §6 small files): partitionBy("bucket")
            # from T input tasks emits up to T × N_BUCKETS files, so
            # once the corpus scan yields more tasks than buckets the
            # write clusters by bucket first (the shuffle carries the
            # per-doc COMPRESSED postings rows, never the token
            # stream). Below that the exchange costs more than the
            # handful of files it saves — measured at sf0.1: the
            # unconditional repartition regressed every segment write.
            out = postings
            if out.rdd.getNumPartitions() > N_BUCKETS:
                out = out.repartition("bucket")
            out.write.partitionBy("bucket").mode("overwrite").parquet(
                f"{stage}/postings"
            )
            spark.read.schema(_schema_of(schemas, "postings_schema")).parquet(
                f"{stage}/postings"
            ).groupBy("bucket", "term").agg(
                F.count(F.lit(1)).alias("df")
            ).write.partitionBy("bucket").mode("overwrite").parquet(
                f"{stage}/dfs"
            )

        def _doclens_chain():
            # doclens records EVERY doc — token-empty ones included
            # (dl=0), so index membership is exact: the add-time
            # disjointness probe and remove-time validation see empty
            # docs too
            per_doc.select(id_col, "dl").write.mode("overwrite").parquet(
                f"{stage}/doclens"
            )
            # bloom layer from the STAGED doclens — the id set actually
            # being published — never a third evaluation of the docs
            # lineage: a non-deterministic input (limit/sample without
            # ordering) could otherwise bloom ids that differ from the
            # written ones, a false-negative the superset contract
            # forbids (ADVICE r12). Mutated IN PLACE: the marker record
            # holds this same dict and flips only after write_stage
            # returns.
            if digest is not None:
                staged = spark.read.schema(
                    _schema_of(schemas, "doclens_schema")
                ).parquet(f"{stage}/doclens")
                attach_bloom(staged, id_col, digest, int(st["n"]), in_place=True)

        run_job_chains(_postings_chain, _doclens_chain)

    st = (
        per_doc.select(
            F.col(id_col),
            F.col(id_col).try_cast("long").alias("__i"),
            F.col("dl"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("sumdl"),
            # id hygiene, free in the same job: duplicate ids inside
            # ONE segment would write duplicate doclens rows and
            # double-counted n/Σdl/df (the in-batch twin of the
            # cross-segment disjointness contract), and a NULL id is
            # unaddressable by every membership probe
            F.count_distinct(F.col(id_col)).alias("n_ids"),
            F.count(F.when(F.col(id_col).isNull(), True)).alias(
                "n_null_ids"
            ),
            *digest_agg_columns(),
        )
        .collect()[0]
    )
    digest = digest_from_agg_row(st)
    if digest is None and int(st["n"]) == 0:
        # empty segment: the union treats it as identity rather than
        # abandoning the metadata rungs. A NON-empty segment whose ids
        # defeated the long cast stays digest-less (None) — unknown,
        # never falsely "empty"
        digest = _EMPTY_DIGEST
    return (
        write_stage,
        (int(st["n"]), int(st["sumdl"] or 0)),
        schemas,
        digest,
        (int(st["n_ids"]), int(st["n_null_ids"])),
    )


def _check_unique_ids(n: int, id_stats, id_col: str, what: str) -> None:
    """Refuse a corpus/shard whose ids are not unique non-null BEFORE
    anything lands: duplicate ids inside one segment double-count
    n/Σdl/df silently (ADVICE r11 caught this at the streaming gate,
    which dedups by admission semantics; the refusal-shaped build/add
    paths must refuse instead), and null ids are unaddressable by the
    membership probes, takedowns, and digests."""
    n_ids, n_null = id_stats
    if n_null:
        raise ValueError(
            f"{what} has {n_null} NULL {id_col} value(s); ids must be "
            "non-null (they key membership, takedown, and df semantics)"
        )
    if n_ids != n:
        raise ValueError(
            f"{what} has duplicate {id_col} values ({n} rows, {n_ids} "
            f"distinct ids): one segment would double-count n/Σdl/df — "
            "dedup or re-id before indexing"
        )


def build_bm25_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
    src_path: str | None = None,
) -> None:
    """One tokenize pass → a single-segment index published with the
    shared atomic-generation protocol (``lm_index.publish_generation``);
    corpus stats (N, Σdl) and the live-segment list land in the
    marker."""
    from kafka_dbsync_spark.operators.cache_validation import files_signature

    fp = fingerprint or corpus_fingerprint(docs, id_col, text_col)
    # the layout version participates in every immutable dir name: a
    # v1 dir with the same fingerprint must never satisfy a v2 build's
    # "already published" check
    gen = _gen_name(fp) + f"_v{FORMAT}"
    write_stage, (n, sumdl), schemas, digest, id_stats = _segment_writer(
        spark, docs, id_col, text_col
    )
    _check_unique_ids(n, id_stats, id_col, "build corpus")
    rec: dict = {
        "fingerprint": fp,
        "n": n,
        "sumdl": sumdl,
        "segments": [gen],
        # per-segment (n, Σdl): metadata the tiered merge policy picks
        # by — no doclens count jobs at policy time
        "segstats": {gen: [n, sumdl]},
        # per-segment id digests: the zero-IO disjointness rungs of
        # add/ingest (VERDICT r11 #1). None (ids the long cast lost)
        # is recorded as absent — exact-probe fallback, never wrong
        "segdigests": {gen: digest if digest is not None else _UNKNOWN_DIGEST},
        "format": FORMAT,
        **schemas,
    }
    if src_path is not None:
        rec["src_sig"] = files_signature(src_path)
    publish_generation(path, gen, write_stage, rec)


def _live_meta(path: str, what: str = "BM25 index") -> dict:
    """Marker record of a servable index; every referenced segment dir
    must exist (readers only ever see complete views — the marker flips
    last on build/add/merge)."""
    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            meta = json.load(f)
    except (OSError, ValueError) as e:
        raise ValueError(
            f"no complete {what} at {path}; build_bm25_index first."
        ) from e
    if meta.get("format") != FORMAT:
        raise ValueError(
            f"{what} at {path} has layout format "
            f"{meta.get('format')!r} (reader needs {FORMAT}); rebuild "
            "with build_bm25_index."
        )
    segs = meta.get("segments") or ([meta["gen"]] if meta.get("gen") else [])
    if not segs or any(
        not os.path.isdir(os.path.join(path, s)) for s in segs
    ):
        raise ValueError(
            f"{what} marker at {path} references missing segment(s) "
            f"{segs!r}; rebuild with build_bm25_index."
        )
    meta["segments"] = segs
    return meta


def _live_segment_digests(meta: dict):
    """The non-empty live segments' digests, or None when ANY live
    segment lacks a usable one (legacy marker, or ids the long cast
    lost) — callers then keep the exact doclens probe verbatim.
    Tombstoned ids are INCLUDED by construction (they stay physically
    present in doclens until a merge), so the no-resurrection guard
    rides the same metadata."""
    digs = meta.get("segdigests") or {}
    out = []
    for s in meta["segments"]:
        d = digs.get(s)
        if isinstance(d, dict) and d.get("empty"):
            continue
        if not digest_usable(d):
            return None
        out.append(d)
    return out


def _segments_maybe_containing(meta: dict, ids) -> list[str]:
    """The live segments whose digest may contain ANY of ``ids`` —
    digest absence is EXACT, so skipped segments provably hold none of
    them; segments without a usable digest must be probed (returned).
    Shrinks takedown validation and suspect probes from every-segment
    scans to the (usually one) segment actually holding the doc."""
    digs = meta.get("segdigests") or {}
    ids = list(ids)
    try:
        # one md5 pass over the id list (probe_positions hashes at the
        # m cap; per-digest positions mask down), then numpy membership
        # per segment — r13: the old shape re-hashed every id PER
        # SEGMENT through digest_may_contain
        ids_arr, pos = probe_positions([int(i) for i in ids])
    except (TypeError, ValueError):
        ids_arr = None  # non-numeric ids: the scalar path below
    out = []
    for s in meta["segments"]:
        d = digs.get(s)
        if isinstance(d, dict) and d.get("empty"):
            continue
        if not digest_usable(d):
            out.append(s)
            continue
        if ids_arr is not None:
            if probe_membership(ids_arr, pos, d).any():
                out.append(s)
            continue
        bm = digest_bitmap(d)
        if any(digest_may_contain(d, bm, i) for i in ids):
            out.append(s)
    return out


def _ladder_suspects(
    spark: SparkSession,
    meta: dict,
    probe_df: DataFrame,
    probe_digest,
    id_col: str,
):
    """Shared front half of the add/ingest disjointness probes:
    ``[]`` = probe ids PROVEN absent from the index with zero IO;
    ``[ids]`` = only these probe ids can possibly be present;
    ``None`` = undecided (legacy marker / unusable digests / a giant
    suspect set) — callers keep their full exact probe.
    ``probe_digest=None`` computes the probe side lazily, only AFTER
    the index side proves usable — a legacy marker then costs no extra
    batch job.

    r13 (VERDICT r12 #1, the production ingest shape — constant-size
    epochs against a GROWING index): the ladder runs PER SEGMENT, not
    against one OR-union digest. Interval/residue rungs are driver
    arithmetic per segment; segments they clear cost nothing. For a
    collectible probe (distinct ids within
    ``id_digest.PROBE_COLLECT_CAP``) the bloom rung is ONE batch-sized
    collect and then pure driver-side numpy per segment
    (``probe_membership``) — zero Spark jobs per segment, so per-epoch
    admission cost stays flat as segments accumulate. Bigger probes
    run the shared Spark ladder per overlapping segment (same-m
    AND-set, else the cross-m word join at the segment's native m)."""
    seg_digs = _live_segment_digests(meta)
    if seg_digs is None:
        return None
    if not seg_digs:
        return []  # the index holds no ids at all
    if probe_digest is None:
        probe_digest = ids_digest(probe_df, id_col)
    if not digest_usable(probe_digest):
        return None
    overlapping = [
        d
        for d in seg_digs
        if not (
            probe_digest["max"] < d["min"] or d["max"] < probe_digest["min"]
        )
        and (probe_digest["res64"] & d["res64"]) != 0
    ]
    if not overlapping:
        return []  # every segment cleared by interval/residue: zero IO
    ids = collect_probe_ids(probe_df, id_col)
    if ids is not None:
        if not ids:
            return []
        import numpy as np

        arr, pos = probe_positions(ids)
        maybe = np.zeros(len(ids), dtype=bool)
        for d in overlapping:
            maybe |= probe_membership(arr, pos, d)
            if maybe.all():
                break
        suspects = [int(i) for i in arr[maybe]]
        if len(suspects) <= DIGEST_SUSPECT_CAP:
            return suspects
        return None
    out: set[int] = set()
    for d in overlapping:
        r = disjoint_suspects(spark, probe_df, probe_digest, d, id_col)
        if r is None:
            return None
        out.update(r)
        if len(out) > DIGEST_SUSPECT_CAP:
            return None
    return sorted(out)


def _suspect_ids_present(
    spark: SparkSession,
    meta: dict,
    path: str,
    suspects: list[int],
    id_col: str,
    limit: int = 10,
) -> list:
    """Which of ``suspects`` actually exist in the index — an isin
    filter over ONLY the segments whose digest may contain one
    (digest absence is exact, so skipped segments are proven clean)."""
    out: list = []
    for s in _segments_maybe_containing(meta, suspects):
        rows = (
            _read_table(spark, meta, path, s, "doclens")
            .filter(F.col(id_col).isin(suspects))
            .select(F.col(id_col))
            .limit(limit - len(out))
            .collect()
        )
        out.extend(r[id_col] for r in rows)
        if len(out) >= limit:
            break
    return out


def _clash_sample(
    spark: SparkSession,
    meta: dict,
    path: str,
    shard: DataFrame,
    shard_digest,
    id_col: str,
) -> list:
    """Sample of shard ids already present in the index (empty =
    id-disjoint, proven) — the refusal-shaped consumer of the ladder:
    zero IO on the metadata rungs, an isin probe over the may-contain
    segments for survivors, and the r11 full doclens-union semi-join
    only for legacy markers."""
    suspects = _ladder_suspects(spark, meta, shard, shard_digest, id_col)
    if suspects == []:
        return []
    if suspects is not None:
        return _suspect_ids_present(spark, meta, path, suspects, id_col)
    existing = None
    for s in meta["segments"]:
        ids = _read_table(spark, meta, path, s, "doclens").select(
            F.col(id_col).alias("__eid")
        )
        existing = ids if existing is None else existing.unionByName(ids)
    if existing is None:
        return []
    return [
        r["__eid"]
        for r in shard.select(F.col(id_col).alias("__eid"))
        .join(existing, "__eid")
        .limit(10)
        .collect()
    ]


def _combine_fp(a: dict, b: dict) -> dict:
    """Corpus fingerprints compose under disjoint union: count, id sum
    and per-row content crc sum are additive, max is max — so an add
    keeps the marker fingerprint equal to corpus_fingerprint(old ∪
    shard) and the staleness ladder stays exact."""
    return {
        "n": a["n"] + b["n"],
        "max_id": max(a["max_id"], b["max_id"]),
        "sum_id": a["sum_id"] + b["sum_id"],
        "content": a["content"] + b["content"],
    }


def bm25_index_add(
    spark: SparkSession,
    shard: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Lucene's incremental model: the new shard tokenizes into its OWN
    immutable segment dir — the already-indexed corpus is never
    re-read — and the marker's live-segment list flips last (a crash
    after the segment rename but before the flip leaves an orphan dir
    the marker never references: harmless, immutable).

    Refuses a shard sharing any ``id_col`` with the index. The probe is
    METADATA-FIRST (VERDICT r11 #1, the pq merge-guard ladder): the
    marker's per-segment id digests OR together and the shared ladder
    (interval / residue mask / bloom AND-set scanned over the SHARD
    only) proves disjointness with ZERO index IO on the happy path;
    only surviving suspects hit an exact probe, shrunk to an isin over
    the segments whose digest may contain them. Legacy markers without
    ``segdigests`` keep the r11 full doclens-union probe verbatim
    (exact membership, empty docs included): segment doc sets must
    stay disjoint or corpus stats and df would double-count — the same
    duplicate-id guard the ANN shard merge enforces. A TOMBSTONED id
    (removed but not yet merged away) still refuses — tombstoned docs
    stay physically present in doclens (and therefore in the digests)
    until a merge, so re-admitting one before the merge has physically
    erased the old postings is refused by the same probe (the ANN
    takedown-resurrection guard's shape); merge first, then re-add.

    Also refuses a shard whose computed segment schemas (column
    names/types) differ from the marker's build-corpus record
    (:func:`_check_add_schemas`, ADVICE r10) — every live segment must
    satisfy the single marker-level schema or schema-explicit reads
    would fail at serve/merge time, far from the add that caused it."""
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    meta = _live_meta(path)
    shard_fp = corpus_fingerprint(shard, id_col, text_col)
    seg = "seg" + _gen_name(shard_fp)[3:] + f"_v{FORMAT}"
    if seg in meta["segments"]:
        raise ValueError(
            f"shard {seg!r} is already a live segment of {path}"
        )
    write_stage, (n, sumdl), schemas, seg_digest, id_stats = _segment_writer(
        spark, shard, id_col, text_col
    )
    _check_unique_ids(n, id_stats, id_col, "shard")
    _check_add_schemas(meta, schemas, path)
    # disjointness probe, metadata-first: the segment digest just
    # computed (free — same job as the stats) is the shard side of the
    # ladder; the proven path reads NO doclens at all.
    if _clash_sample(spark, meta, path, shard, seg_digest, id_col):
        raise ValueError(
            f"shard shares {id_col} values with the index at {path}; "
            "segment doc sets must be disjoint (dedup or re-id the "
            "shard before adding)"
        )
    stage = os.path.join(path, f".stage-{seg}-{os.getpid()}")
    final_dir = os.path.join(path, seg)
    invalidate_memo(path)
    if not os.path.exists(final_dir):
        write_stage(stage)
        try:
            os.rename(stage, final_dir)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
    rec = dict(
        meta,
        fingerprint=_combine_fp(meta["fingerprint"], shard_fp),
        n=meta["n"] + n,
        sumdl=meta["sumdl"] + sumdl,
        segments=meta["segments"] + [seg],
        segstats={**meta.get("segstats", {}), seg: [n, sumdl]},
        segdigests={
            **meta.get("segdigests", {}),
            seg: seg_digest if seg_digest is not None else _UNKNOWN_DIGEST,
        },
    )
    # src_sig deliberately dropped: the union corpus no longer equals
    # any single source directory, so staleness falls back to the
    # exact fingerprint tier
    rec.pop("src_sig", None)
    tmp = os.path.join(path, _MARKER + f".tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(path, _MARKER))


def _flip_marker(path: str, rec: dict) -> None:
    tmp = os.path.join(path, _MARKER + f".tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(path, _MARKER))


def _ingest_committed(path: str, epoch: int) -> bool:
    return os.path.exists(
        os.path.join(path, "ingest", f"e{epoch}", "_SUCCESS")
    )


def _commit_ingest(path: str, epoch: int) -> None:
    commit_dir = os.path.join(path, "ingest", f"e{epoch}")
    os.makedirs(commit_dir, exist_ok=True)
    with open(os.path.join(commit_dir, "_SUCCESS"), "w") as f:
        f.write("")


def bm25_ingest_foreach_batch(
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """``foreachBatch`` function for EXACTLY-ONCE streaming text-index
    ingest — the replay-safe twin of :func:`bm25_index_add`, completing
    the gate family (dedup, ANN, paragraph, URL, NB, decontamination
    all have one; VERDICT r10 #4). Lucene's model maps onto Structured
    Streaming perfectly: one immutable SEGMENT per micro-batch epoch,
    under the ann_ingest_stream discipline. Per batch:

    1. committed-epoch guard (``ingest/e{N}/_SUCCESS``) — a replayed
       epoch returns without work;
    2. marker guard — a crash between the marker flip and the commit
       leaves the epoch's segment live in the marker: the replay finds
       ``eseg{N}`` in the segment list and only re-commits;
    3. keep-first admission — batch docs whose id is already in the
       index (one anti-join against the union ``doclens``; TOMBSTONED
       ids included, so a taken-down doc is NOT resurrected by
       re-arrival until a merge has physically erased it) are
       filtered, never re-indexed — the same duplicate-id discipline
       ``bm25_index_add`` enforces by refusal, turned into admission
       semantics at the streaming edge (a gate that throws would wedge
       the stream into an eternal replay);
    4. the fresh docs tokenize into a staging dir, renamed to the
       DETERMINISTIC epoch-tagged segment ``eseg{N}_v{FORMAT}`` (a
       replay after a crash here finds the dir and skips the write —
       the batch and the marker are both unchanged, so the filtered
       shard re-derives identically);
    5. the marker's segment list, corpus stats and additive
       fingerprint flip LAST; the epoch commit lands after it.

    An all-duplicates (or empty) batch commits its epoch with no
    segment. Schema compatibility is enforced per batch
    (:func:`_check_add_schemas`). Single writer, as for every index
    mutation (the module's Lucene IndexWriter contract).
    """
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        epoch = int(epoch_id)
        if _ingest_committed(path, epoch):
            return
        meta = _live_meta(path, "BM25 streaming-ingest target")
        seg = f"eseg{epoch}_v{FORMAT}"
        if seg in meta["segments"]:
            _commit_ingest(path, epoch)  # crash window 5->commit: no-op
            return
        # keep-first admission, metadata-first (VERDICT r11 #1): one
        # batch-sized digest job replaces the index-sized doclens union
        # read on the proven path; survivors shrink the anti-join's
        # index side to an isin over the may-contain segments only.
        suspects = _ladder_suspects(spark, meta, batch_df, None, id_col)
        if suspects == []:
            fresh = batch_df
        else:
            if suspects is not None:
                probe_segs = _segments_maybe_containing(meta, suspects)
                flt = F.col(id_col).isin(suspects)
            else:
                probe_segs = meta["segments"]
                flt = F.lit(True)
            existing = None
            for s in probe_segs:
                ids = (
                    _read_table(spark, meta, path, s, "doclens")
                    .filter(flt)
                    .select(F.col(id_col))
                )
                existing = (
                    ids if existing is None else existing.unionByName(ids)
                )
            fresh = (
                batch_df
                if existing is None
                else batch_df.join(existing, id_col, "left_anti")
            )
        # in-batch keep-first (ADVICE r11): duplicate doc_ids INSIDE one
        # micro-batch must collapse to one row or the segment would
        # carry duplicate doclens rows and double-counted n/Σdl/df. The
        # winner is deterministic (min text), so a crash-window replay
        # that finds the segment dir already renamed re-derives the
        # IDENTICAL filtered shard for its marker arithmetic.
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy(
            F.col(text_col).asc_nulls_first()
        )
        fresh = (
            fresh.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        write_stage, (n, sumdl), schemas, seg_digest, _ids = _segment_writer(
            spark, fresh, id_col, text_col
        )
        _check_add_schemas(meta, schemas, path)
        if n == 0:
            _commit_ingest(path, epoch)  # nothing fresh arrived
            return
        shard_fp = corpus_fingerprint(fresh, id_col, text_col)
        final_dir = os.path.join(path, seg)
        invalidate_memo(path)
        if not os.path.exists(final_dir):
            stage = os.path.join(path, f".stage-{seg}-{os.getpid()}")
            write_stage(stage)
            try:
                os.rename(stage, final_dir)
            except OSError:
                shutil.rmtree(stage, ignore_errors=True)
        rec = dict(
            meta,
            fingerprint=_combine_fp(meta["fingerprint"], shard_fp),
            n=meta["n"] + n,
            sumdl=meta["sumdl"] + sumdl,
            segments=meta["segments"] + [seg],
            segstats={**meta.get("segstats", {}), seg: [n, sumdl]},
            segdigests={
                **meta.get("segdigests", {}),
                seg: seg_digest
                if seg_digest is not None
                else _UNKNOWN_DIGEST,
            },
        )
        rec.pop("src_sig", None)
        _flip_marker(path, rec)
        _commit_ingest(path, epoch)

    return fn


def bm25_index_remove(
    spark: SparkSession,
    path: str,
    remove_ids,
    id_col: str = "doc_id",
) -> dict:
    """Right-to-erasure for the text index, Lucene's ACTUAL delete
    model: removal is a marker TOMBSTONE — no segment is rewritten
    until the next merge applies the tombstones physically. Serving
    stays exact, not approximate: the marker records the removed ids
    plus their count and Σdl (validated and read from the segments'
    ``doclens``, one narrow filtered scan), and
    :func:`bm25_search_served` subtracts them from N/Σdl and corrects
    each query term's df by counting tombstoned docs inside its
    already-pruned postings read — so a post-removal search equals a
    from-scratch index over the surviving corpus, bit for bit.

    Removal ids ride as a small literal list (a takedown batch is
    small by contract — the pq/dedup index rule). Ids not present in
    the index are refused (a takedown that silently no-ops hides a
    bookkeeping bug); already-tombstoned ids are accepted idempotently.
    After a removal the marker fingerprint still names the BUILT
    corpus (the index intentionally diverges from any source table —
    pq_index_remove's ``built_src_sig`` rationale), so staleness
    checks validate the built corpus while serving honors tombstones.
    Returns ``{"removed": k, "already": j}``."""
    meta = _live_meta(path)
    req = sorted({int(i) for i in remove_ids})
    if not req:
        raise ValueError("remove_ids must be non-empty")
    already = [i for i in req if i in set(meta.get("removed_ids", []))]
    new = [i for i in req if i not in set(meta.get("removed_ids", []))]
    if not new:
        return {"removed": 0, "already": len(already)}
    found = {}
    # digest narrowing: only segments whose digest may contain one of
    # the ids are read (digest absence is exact; legacy segments
    # without digests are always probed)
    for s in _segments_maybe_containing(meta, new):
        for r in (
            _read_table(spark, meta, path, s, "doclens")
            .filter(F.col(id_col).isin(new))
            .collect()
        ):
            found[int(r[id_col])] = int(r["dl"])
    missing = [i for i in new if i not in found]
    if missing:
        raise ValueError(
            f"cannot remove ids not present in the index at {path}: "
            f"{missing[:10]}{'...' if len(missing) > 10 else ''}"
        )
    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    invalidate_memo(path)
    rec = dict(
        meta,
        removed_ids=sorted(set(meta.get("removed_ids", [])) | set(new)),
        removed_n=meta.get("removed_n", 0) + len(new),
        removed_sumdl=meta.get("removed_sumdl", 0) + sum(found.values()),
    )
    tmp = os.path.join(path, _MARKER + f".tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(path, _MARKER))
    return {"removed": len(new), "already": len(already)}


def bm25_segment_merge(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    segments: list[str] | None = None,
) -> int:
    """Lucene's background merge: compact live segments into ONE and
    apply removal tombstones PHYSICALLY — postings, dfs and doclens
    re-derive from the segment parquet minus the tombstoned docs (the
    corpus text is never touched), marker stats drop the removed
    amounts, and the old segment dirs retire only AFTER the marker
    flips — into a ``.retired-*`` trash name that survives until the
    NEXT merge (one-merge-cycle grace, ADVICE r10), so a reader that
    resolved the marker just before the flip can finish over the
    superseded dirs.

    ``segments=None`` merges EVERYTHING (full optimize — Lucene's
    forceMerge(1)) and clears the whole tombstone list. Passing a
    SUBSET of live segment names merges only those (the unit a tiered
    policy schedules — :func:`bm25_merge_tiered`): tombstones whose
    doc lives INSIDE the subset are applied physically and leave the
    marker; tombstones pointing into untouched segments stay recorded
    (and keep being served exactly) until a merge visits them — the
    Lucene per-segment ``.del`` lifecycle. A single-segment index with
    no tombstones is already compact (no-op). Returns the number of
    segments merged."""
    import hashlib
    import shutil

    from kafka_dbsync_spark.operators.cache_validation import invalidate_memo

    meta = _live_meta(path)
    live = meta["segments"]
    removed = meta.get("removed_ids", [])
    full = segments is None
    segs = live if full else list(segments)
    if not full:
        unknown = [s for s in segs if s not in live]
        if unknown:
            raise ValueError(
                f"cannot merge segments not live in the marker at "
                f"{path}: {unknown}"
            )
        if len(segs) < 2:
            raise ValueError(
                "a subset merge needs at least 2 segments (a full "
                "merge with tombstones may pass segments=None)"
            )
        if set(segs) == set(live):
            full = True
    if full and len(segs) <= 1 and not removed:
        return len(segs)
    # which tombstones live INSIDE the merged subset? (full merge: all
    # of them — removal validated membership at tombstone time). The
    # per-id dl rides along so the marker's Σdl bookkeeping stays exact.
    if full:
        rm_in = list(removed)
        rm_in_sumdl = meta.get("removed_sumdl", 0)
    else:
        found = {}
        if removed:
            maybe = set(_segments_maybe_containing(meta, removed))
            for s in segs:
                if s not in maybe:
                    continue  # digest proves no tombstone lives here
                for r in (
                    _read_table(spark, meta, path, s, "doclens")
                    .filter(F.col(id_col).isin(removed))
                    .collect()
                ):
                    found[int(r[id_col])] = int(r["dl"])
        rm_in = sorted(found)
        rm_in_sumdl = sum(found.values())
    rm_out = sorted(set(removed) - set(rm_in))
    # the removal SET and (for subset merges) the member-segment set
    # participate in the dir name: two merges over different inputs
    # must never share an immutable dir, or the second would flip the
    # marker onto the first's contents. The marker fingerprint never
    # changes after a removal (it names the BUILT corpus), so the live
    # doc count rides along too — successive remove+merge cycles then
    # differ by n even on a digest collision of their id lists
    merged = (
        "merged"
        + _gen_name(meta["fingerprint"])[3:]
        + f"_v{FORMAT}_n{meta['n'] - meta.get('removed_n', 0)}"
        + (
            ""
            if full
            else "_s%s"
            % hashlib.md5(",".join(sorted(segs)).encode()).hexdigest()[:12]
        )
        + (
            "_rm%s"
            % hashlib.md5(",".join(map(str, rm_in)).encode()).hexdigest()[:16]
            if rm_in
            else ""
        )
    )
    final_dir = os.path.join(path, merged)
    invalidate_memo(path)
    if not os.path.exists(final_dir):
        post, lens = None, None
        for s in segs:
            p = _read_table(spark, meta, path, s, "postings")
            d = _read_table(spark, meta, path, s, "doclens")
            post = p if post is None else post.unionByName(p)
            lens = d if lens is None else lens.unionByName(d)
        if rm_in:
            post = post.filter(~F.col(id_col).isin(rm_in))
            lens = lens.filter(~F.col(id_col).isin(rm_in))
        stage = os.path.join(path, f".stage-{merged}-{os.getpid()}")
        # scale guard (guide §6 small files): the N-segment union would
        # leave N files per bucket in the MERGED segment — a merge is a
        # compaction, so once the union's task count exceeds the bucket
        # count the write clusters by bucket first. Below that the
        # exchange costs more than the handful of files it saves
        # (measured at sf0.1: an unconditional repartition regressed
        # every merge).
        if post.rdd.getNumPartitions() > N_BUCKETS:
            post = post.repartition("bucket")
        post.write.partitionBy("bucket").mode("overwrite").parquet(
            f"{stage}/postings"
        )
        _stage_reader = spark.read
        _pschema = _schema_of(meta, "postings_schema")
        if _pschema is not None:
            _stage_reader = _stage_reader.schema(_pschema)
        _stage_reader.parquet(f"{stage}/postings").groupBy("bucket", "term").agg(
            F.count(F.lit(1)).alias("df")
        ).write.partitionBy("bucket").mode("overwrite").parquet(f"{stage}/dfs")
        lens.write.mode("overwrite").parquet(f"{stage}/doclens")
        try:
            os.rename(stage, final_dir)
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
    # EXACT digest of the merged segment (tombstones in the subset are
    # physically out now): one narrow aggregate over the published
    # doclens, amortized into a rewrite that just rebuilt those files —
    # and it also heals digest-less legacy members into guarded state
    merged_reader = spark.read
    _dschema = _schema_of(meta, "doclens_schema")
    if _dschema is not None:
        merged_reader = merged_reader.schema(_dschema)
    merged_digest = (
        ids_digest(merged_reader.parquet(f"{final_dir}/doclens"), id_col)
        if os.path.isdir(final_dir)
        else None
    )
    old_stats = meta.get("segstats", {})
    old_digs = meta.get("segdigests", {})
    if full:
        live_n = meta["n"] - meta.get("removed_n", 0)
        live_sumdl = meta["sumdl"] - meta.get("removed_sumdl", 0)
        if merged_digest is None and live_n == 0:
            merged_digest = _EMPTY_DIGEST
        rec = dict(
            meta,
            segments=[merged],
            gen=merged,
            n=live_n,
            sumdl=live_sumdl,
            segstats={merged: [live_n, live_sumdl]},
            segdigests={
                merged: merged_digest
                if merged_digest is not None
                else _UNKNOWN_DIGEST
            },
            removed_ids=[],
            removed_n=0,
            removed_sumdl=0,
        )
    else:
        keep = [s for s in live if s not in set(segs)]
        # merged-subset stats from marker metadata (fallback: count the
        # member doclens when a legacy marker lacks segstats)
        if all(s in old_stats for s in segs):
            sub_n = sum(old_stats[s][0] for s in segs)
            sub_dl = sum(old_stats[s][1] for s in segs)
        else:
            row = lens_stats = None
            for s in segs:
                d = _read_table(spark, meta, path, s, "doclens")
                lens_stats = d if lens_stats is None else lens_stats.unionByName(d)
            row = lens_stats.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
            ).head()
            sub_n, sub_dl = int(row["n"]), int(row["s"] or 0)
        seg_n = sub_n - len(rm_in)
        seg_dl = sub_dl - rm_in_sumdl
        stats = {s: v for s, v in old_stats.items() if s in set(keep)}
        stats[merged] = [seg_n, seg_dl]
        if merged_digest is None and seg_n == 0:
            merged_digest = _EMPTY_DIGEST
        digs = {s: v for s, v in old_digs.items() if s in set(keep)}
        digs[merged] = (
            merged_digest if merged_digest is not None else _UNKNOWN_DIGEST
        )
        rec = dict(
            meta,
            segments=keep + [merged],
            n=meta["n"] - len(rm_in),
            sumdl=meta["sumdl"] - rm_in_sumdl,
            segstats=stats,
            segdigests=digs,
            removed_ids=rm_out,
            removed_n=meta.get("removed_n", 0) - len(rm_in),
            removed_sumdl=meta.get("removed_sumdl", 0) - rm_in_sumdl,
        )
        # ADVICE r11: if the marker's `gen` names a segment this merge
        # retires, repoint it at the merged dir — the servability
        # checks (lm_model_is_current / _live_meta's legacy fallback)
        # stat the gen dir, and leaving it on a name the NEXT merge's
        # trash reclaim deletes would report the index permanently
        # stale, forcing spurious full rebuilds in exactly the
        # long-running ingest + tiered-merge scenario.
        if meta.get("gen") in set(segs):
            rec["gen"] = merged
    tmp = os.path.join(path, _MARKER + f".tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(path, _MARKER))
    # Deferred retirement (ADVICE r10): a reader that resolved the
    # marker just BEFORE this flip still holds lazy DataFrames over the
    # retiring dirs, so deleting them here would yank parquet out from
    # under an in-flight query — Lucene keeps superseded segments alive
    # via reader refcounts for the same reason. Without refcounts the
    # grace period is ONE merge cycle: this merge renames the retiring
    # dirs into `.retired-*` (invisible to new readers — the marker
    # names only live segments) and physically deletes the PREVIOUS
    # merge's trash, by which time its pre-merge readers have drained.
    for stale in os.listdir(path):
        if stale.startswith(".retired-"):
            shutil.rmtree(os.path.join(path, stale), ignore_errors=True)
    for s in segs:
        if s != merged:
            try:
                os.rename(
                    os.path.join(path, s),
                    os.path.join(path, f".retired-{s}"),
                )
            except OSError:
                shutil.rmtree(os.path.join(path, s), ignore_errors=True)
    return len(segs)


def bm25_merge_tiered(
    spark: SparkSession,
    path: str,
    max_segments: int = 4,
    id_col: str = "doc_id",
) -> int:
    """Lucene's TieredMergePolicy, reduced to its load-bearing idea:
    never rewrite the big segments to absorb the small ones. When the
    live segment count exceeds ``max_segments``, merge the SMALLEST
    ``count - max_segments + 1`` segments into one — the merge IO is
    proportional to the small segments' size, not the index's, so a
    long-running ingest stream (one segment per epoch) pays amortized
    O(n log n) total merge IO instead of forceMerge(1)'s O(n) per call
    / O(n²) cumulative. Sizes come from the marker's per-segment
    ``segstats`` (pure metadata; a legacy marker without them falls
    back to one narrow doclens count per segment). Tombstones inside
    the chosen subset are applied physically; the rest stay recorded —
    exactly :func:`bm25_segment_merge`'s subset contract. Returns the
    number of segments merged (0 when already within policy)."""
    meta = _live_meta(path)
    segs = meta["segments"]
    if max_segments < 1:
        raise ValueError(f"max_segments must be >= 1 (got {max_segments})")
    if len(segs) <= max_segments:
        return 0
    sizes = _segment_sizes(spark, meta, path, id_col)
    ordered = sorted(segs, key=lambda s: (sizes[s], s))
    pick = ordered[: len(segs) - max_segments + 1]
    bm25_segment_merge(spark, path, id_col, segments=pick)
    return len(pick)


def _segment_sizes(
    spark: SparkSession, meta: dict, path: str, id_col: str = "doc_id"
) -> dict[str, int]:
    """Per-segment doc counts for the merge policy — marker ``segstats``
    metadata on the happy path, zero IO. Segments a legacy marker
    doesn't cover pay ONE narrow doclens aggregate each, and the
    result — (n, Σdl) AND the segment's exact id digest, computed in
    the same job — is BACKFILLED into the marker (VERDICT r11 #5), so
    the next policy call (and every future add/ingest disjointness
    probe) is metadata-only instead of re-paying the scan per
    invocation. ``meta`` is updated in place so a caller that flips
    the marker afterwards carries the backfill forward."""
    stats = dict(meta.get("segstats") or {})
    digs = dict(meta.get("segdigests") or {})
    missing = [
        s for s in meta["segments"] if s not in stats or s not in digs
    ]
    if missing:
        from kafka_dbsync_spark.operators.cache_validation import (
            invalidate_memo,
        )

        for s in missing:
            lens = _read_table(spark, meta, path, s, "doclens")
            row = (
                lens.select(
                    F.col(id_col).try_cast("long").alias("__i"),
                    F.col("dl"),
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("dl").alias("sumdl"),
                    *digest_agg_columns(),
                )
                .head()
            )
            stats[s] = [int(row["n"]), int(row["sumdl"] or 0)]
            d = attach_bloom(
                lens.select(id_col),
                id_col,
                digest_from_agg_row(row),
                int(row["n"]),
            )
            if d is None:
                d = _EMPTY_DIGEST if int(row["n"]) == 0 else _UNKNOWN_DIGEST
            digs[s] = d
        meta["segstats"] = stats
        meta["segdigests"] = digs
        _flip_marker(path, dict(meta))
        invalidate_memo(path)
    return {s: int(stats[s][0]) for s in meta["segments"]}


def bm25_index_is_current(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
    src_path: str | None = None,
    force_exact: bool = False,
) -> bool:
    """True iff the persisted index is servable AND built on the
    current corpus — the shared staleness ladder
    (``lm_model_is_current``): metadata-only with ``src_path`` on the
    happy path, exact corpus fingerprint only on metadata miss. An
    index whose marker carries an older layout ``format`` reports
    stale regardless of fingerprint, so callers rebuild instead of
    reading a layout this code can't serve (e.g. pre-positional
    postings)."""
    try:
        with open(os.path.join(path, _MARKER)) as f:
            if json.load(f).get("format") != FORMAT:
                return False
    except (OSError, ValueError):
        return False
    return lm_model_is_current(
        docs,
        path,
        id_col,
        text_col,
        fingerprint=fingerprint,
        src_path=src_path,
        force_exact=force_exact,
    )


def bm25_index_check(
    spark: SparkSession,
    path: str,
    full: bool = True,
    id_col: str = "doc_id",
) -> DataFrame:
    """Lucene's ``CheckIndex`` for the BM25 segment family: a
    consistency report over one persisted index as a DataFrame of
    ``(check, segment, status, detail)`` rows — ``status`` is PASS /
    WARN (legacy or reclaimable, still servable) / FAIL (the marker
    and the artifacts disagree; do not trust serves until rebuilt).

    Two levels, matching the cost model every guard in this module
    follows:

    - **metadata** (``full=False``): ZERO data IO — marker parse +
      layout format, segment-dir existence, marker totals vs the
      per-segment ``segstats``, digest usability, tombstone-count
      bookkeeping, and a directory sweep classifying ``.retired-*``
      reader-grace trash, ``.stage-*`` crash leftovers, and ORPHAN
      immutable dirs the marker no longer references (race losers —
      harmless but reclaimable disk).
    - **full** (default): adds per-segment data probes, each a
      column-pruned parquet aggregate — doclens count/Σdl vs
      ``segstats``, cross-segment id uniqueness (an id served twice is
      the double-count failure every disjointness guard exists to
      prevent), digest SUPERSET soundness (actual id interval within
      the recorded one, actual residue mask a subset), postings⊆doclens
      membership with matching per-doc dl, the persisted ``dfs`` table
      vs a recount from postings, and every marker tombstone still
      physically present (tombstones leave only via a merge).

    Like Lucene's tool this is an OPERATOR'S instrument: the full level
    deliberately reads the whole index (that is what an fsck is); the
    metadata level is safe to run on every serve path."""
    rows: list[tuple] = []

    def add(check: str, seg: str, ok, detail: str = "") -> None:
        rows.append((check, seg, "PASS" if ok is True else ok, detail))

    def report() -> DataFrame:
        return spark.createDataFrame(
            rows, "check string, segment string, status string, detail string"
        )

    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            meta = json.load(f)
    except (OSError, ValueError) as e:
        add("marker_parses", "", "FAIL", f"{e}")
        return report()
    add("marker_parses", "", True)
    add(
        "layout_format",
        "",
        meta.get("format") == FORMAT or "FAIL",
        f"marker format {meta.get('format')!r}, reader needs {FORMAT}",
    )
    segs = meta.get("segments") or ([meta["gen"]] if meta.get("gen") else [])
    if not segs:
        add("segments_listed", "", "FAIL", "marker names no live segment")
        return report()
    for s in segs:
        there = os.path.isdir(os.path.join(path, s))
        add(
            "segment_dir_exists",
            s,
            there or "FAIL",
            "" if there else "marker references a missing dir — a reader would throw",
        )
    stats = meta.get("segstats") or {}
    missing = [s for s in segs if s not in stats]
    add(
        "segstats_cover_segments",
        "",
        not missing or "WARN",
        f"legacy segments without segstats: {missing}"
        if missing
        else "every live segment carries (n, sumdl) metadata",
    )
    if not missing:
        tot_n = sum(int(stats[s][0]) for s in segs)
        tot_dl = sum(int(stats[s][1]) for s in segs)
        add(
            "marker_totals_match_segstats",
            "",
            (tot_n == int(meta.get("n", -1)) and tot_dl == int(meta.get("sumdl", -1)))
            or "FAIL",
            f"marker n={meta.get('n')}/sumdl={meta.get('sumdl')} vs "
            f"segstats sums {tot_n}/{tot_dl}",
        )
    digs = meta.get("segdigests") or {}
    for s in segs:
        d = digs.get(s)
        if isinstance(d, dict) and d.get("empty"):
            add("segment_digest", s, True, "empty segment")
        elif digest_usable(d):
            add("segment_digest", s, True, "bloom" if d.get("bloom") else "interval+residue")
        else:
            add(
                "segment_digest",
                s,
                "WARN",
                "no usable digest (legacy or uncastable ids): mutation "
                "guards fall back to exact probes — correct, but paying "
                "segment IO the digest rungs would prove for free",
            )
    removed = meta.get("removed_ids", [])
    add(
        "tombstone_bookkeeping",
        "",
        (len(removed) == int(meta.get("removed_n", 0))) or "FAIL",
        f"{len(removed)} removed_ids vs removed_n={meta.get('removed_n', 0)}",
    )
    live = set(segs)
    for entry in sorted(os.listdir(path)):
        p = os.path.join(path, entry)
        if entry == _MARKER or entry == "ingest" or entry in live or not os.path.isdir(p):
            continue
        if entry.startswith(".retired-"):
            add(
                "retired_dir",
                entry,
                "WARN",
                "reader-grace trash from a merge; the next merge reclaims it",
            )
        elif entry.startswith("."):
            add(
                "staging_leftover",
                entry,
                "WARN",
                "in-flight or crashed staging dir; safe to reclaim when no "
                "builder is running",
            )
        else:
            add(
                "orphan_dir",
                entry,
                "WARN",
                "immutable dir the marker does not reference (publish-race "
                "loser or superseded generation): never served, reclaimable",
            )
    if not full:
        return report()

    lens_all = None
    for s in segs:
        if not os.path.isdir(os.path.join(path, s)):
            continue  # already FAILed above; data probes would throw
        lens = _read_table(spark, meta, path, s, "doclens")
        st = lens.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("dl").alias("sumdl"),
            F.min(F.col(id_col).try_cast("long")).alias("mn"),
            F.max(F.col(id_col).try_cast("long")).alias("mx"),
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod("
                f"try_cast({id_col} AS BIGINT), 64) AS INT)))"
            ).alias("res"),
        ).head()
        if s in stats:
            add(
                "doclens_match_segstats",
                s,
                (int(st["n"]) == int(stats[s][0]) and int(st["sumdl"] or 0) == int(stats[s][1]))
                or "FAIL",
                f"doclens n={st['n']}/sumdl={st['sumdl'] or 0} vs "
                f"segstats {stats[s]}",
            )
        d = digs.get(s)
        if digest_usable(d) and st["mn"] is not None:
            # Spark's bit_or of bit 63 comes back as a negative long;
            # the marker stores res64 unsigned — mask both to 64 bits
            mask64 = (1 << 64) - 1
            superset = (
                int(st["mn"]) >= d["min"]
                and int(st["mx"]) <= d["max"]
                and (int(st["res"]) & mask64) & (~int(d["res64"]) & mask64) == 0
            )
            add(
                "digest_superset_sound",
                s,
                superset or "FAIL",
                ""
                if superset
                else "live ids fall outside the segment digest — a digest "
                "missing ids lets a merge falsely prove disjointness",
            )
        post = _read_table(spark, meta, path, s, "postings")
        bad_link = (
            post.select(F.col(id_col), F.col("dl"))
            .distinct()
            .join(lens.select(id_col, F.col("dl").alias("__ldl")), id_col, "left")
            .filter(F.col("__ldl").isNull() | (F.col("__ldl") != F.col("dl")))
            .count()
        )
        add(
            "postings_docs_in_doclens",
            s,
            bad_link == 0 or "FAIL",
            f"{bad_link} posting docs missing from doclens or with "
            "mismatched dl",
        )
        recount = post.groupBy("bucket", "term").agg(
            F.count(F.lit(1)).alias("__df")
        )
        df_bad = (
            _read_table(spark, meta, path, s, "dfs")
            .join(recount, ["bucket", "term"], "full")
            .filter(
                F.col("df").isNull()
                | F.col("__df").isNull()
                | (F.col("df") != F.col("__df"))
            )
            .count()
        )
        add(
            "dfs_match_postings",
            s,
            df_bad == 0 or "FAIL",
            f"{df_bad} terms whose persisted df disagrees with a recount",
        )
        ids = lens.select(F.col(id_col).alias("__cid"))
        lens_all = ids if lens_all is None else lens_all.unionByName(ids)
    if lens_all is not None:
        dup = (
            lens_all.groupBy("__cid")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") > 1)
            .limit(5)
            .collect()
        )
        add(
            "ids_unique_across_segments",
            "",
            not dup or "FAIL",
            f"ids served twice: {[r['__cid'] for r in dup]}"
            if dup
            else "no id appears in two live segments",
        )
        if removed:
            # a broadcast semi-join, not an isin literal: tombstones
            # accumulate until a merge, and a marker with many of them
            # would otherwise inflate the plan with a giant IN list;
            # DISTINCT matched ids, not rows, so an id tombstoned while
            # present in two segments (already FAILed by
            # ids_unique_across_segments) is not double-counted here
            # (ADVICE r12)
            n_removed = len({str(r) for r in removed})
            rem_df = spark.createDataFrame(
                [(str(r),) for r in removed], "__rid string"
            ).distinct()
            present = (
                lens_all.select(
                    F.col("__cid").cast("string").alias("__rid")
                )
                .join(F.broadcast(rem_df), "__rid", "left_semi")
                .distinct()
                .count()
            )
            add(
                "tombstones_physically_present",
                "",
                present == n_removed or "FAIL",
                f"{present}/{n_removed} distinct tombstoned ids found in "
                "doclens (they leave only via a merge; fewer means the "
                "marker carries tombstones for ids that never existed)",
            )
    return report()


def bm25_search_served(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-``k`` against the FROZEN index: reads only the
    query terms' bucket partitions, pivots matching postings back to
    per-term tf columns, and evaluates bm25_topk's expression tree —
    same left-assoc term order, same operator shapes — with the
    marker's N/Σdl and the index's per-term df folded in as long
    literals (long→double casts, exactly the inline columns' casts).
    Docs matching no query term have no posting row and never surface,
    mirroring the inline ``any_match > 0`` filter. Output:
    (rank, id, score_r), bit-compatible with bm25_topk."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    post, dfs, n, sumdl = _read_pruned(
        spark, _live_meta(path), path, list(query_terms), id_col
    )
    pivoted = post.groupBy(F.col(id_col)).agg(
        F.max("dl").alias("dl"),
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"__tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    return _literal_okapi_tail(
        pivoted,
        [dfs.get(t, 0) for t in query_terms],
        n,
        sumdl,
        k,
        k1,
        b,
        id_col,
    )


def _read_pruned(
    spark: SparkSession,
    meta: dict,
    path: str,
    terms: list[str],
    id_col: str,
):
    """(live pruned postings, per-term df dict, N, Σdl) for a term set:
    per-segment bucket-pruned reads unioned (segment doc sets are
    disjoint so df is additive; a term the corpus never saw has no row
    and prices as df = 0, the same value the inline scalar aggregate
    produces); tombstones corrected EXACTLY — N/Σdl drop by the
    marker's recorded amounts, each term's df by the number of
    tombstoned docs holding it, counted inside the already-pruned read
    so erasure costs no extra scan."""
    n, sumdl = int(meta["n"]), int(meta["sumdl"])
    buckets = sorted({term_bucket_py(t) for t in terms})
    bucket_f = F.col("bucket").isin(buckets)
    term_f = F.col("term").isin(terms)
    dfs: dict[str, int] = {}
    post = None
    dfs_u = None
    for s in meta["segments"]:
        d = _read_table(spark, meta, path, s, "dfs").filter(
            bucket_f & term_f
        )
        dfs_u = d if dfs_u is None else dfs_u.unionByName(d)
        p = _read_table(spark, meta, path, s, "postings").filter(
            bucket_f & term_f
        )
        post = p if post is None else post.unionByName(p)
    # ONE collect for every segment's df rows (r13 opt: the old shape
    # ran one driver round-trip PER SEGMENT); per-term integer adds are
    # associative, so folding driver-side matches the per-segment loop
    for r in dfs_u.collect():
        dfs[r["term"]] = dfs.get(r["term"], 0) + int(r["df"])
    removed = meta.get("removed_ids", [])
    if removed:
        n -= int(meta.get("removed_n", 0))
        sumdl -= int(meta.get("removed_sumdl", 0))
        for r in (
            post.filter(F.col(id_col).isin(removed))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            dfs[r["term"]] = dfs.get(r["term"], 0) - int(r["c"])
        post = post.filter(~F.col(id_col).isin(removed))
    return post, dfs, n, sumdl


def _literal_okapi_tail(
    pivoted: DataFrame,
    df_list: list[int],
    n: int,
    sumdl: int,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """The serve-side Okapi tail: the SAME expression tree as the
    inline ``_okapi_topk`` with N/Σdl/df folded in as LONG literals
    cast to double, so every downstream IEEE op matches the inline
    column expressions bit-for-bit (k1+1 and 1-b fold in Python —
    exact for the default 1.2/0.75). Docs whose every tf is 0 (a
    phrase query over docs holding only the component words) are
    filtered exactly like the inline ``any_match`` guard."""
    m = len(df_list)
    k1p1, one_minus_b = k1 + 1.0, 1.0 - b
    avgdl = F.lit(sumdl).cast("double") / F.lit(n).cast("double")
    score = None
    for i in range(m):
        tf = F.col(f"__tf{i}").cast("double")
        dfc = F.lit(df_list[i]).cast("double")
        idf = F.log(
            (F.lit(n).cast("double") - dfc + F.lit(0.5))
            / (dfc + F.lit(0.5))
            + F.lit(1.0)
        )
        term_score = (
            idf
            * (tf * F.lit(k1p1))
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(one_minus_b)
                    + F.lit(b) * (F.col("dl").cast("double") / avgdl)
                )
            )
        )
        score = term_score if score is None else score + term_score
    any_match = sum(
        (F.col(f"__tf{i}") for i in range(1, m)), start=F.col("__tf0")
    )
    from pyspark.sql import Window

    top = (
        pivoted.filter(any_match > 0)
        .select(F.col(id_col), F.round(score, 4).alias("score_r"))
        .orderBy(F.col("score_r").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score_r").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "score_r"
    )


def bm25_search_multi_served(
    spark: SparkSession,
    path: str,
    queries: dict[str, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Answer a BATCH of term-bag queries with ONE pruned postings
    read — the text-tier mirror of ``pq_index.ivfpq_search_multi``'s
    union-of-probes serving shape: the union of every query's terms
    prunes once (buckets ∪, terms ∪), the small matching frame is
    localCheckpoint'd, and each query pivots/scores/top-ks from that
    cached frame with its own df literals (shared N/Σdl; tombstones
    corrected once for all queries). Per query the result is
    bit-identical to :func:`bm25_search_served` — a doc matching only
    OTHER queries' terms pivots to all-zero tfs and falls to the
    shared ``any_match`` guard. Output: (query_id, rank, id, score_r).
    """
    if not queries:
        raise ValueError("queries must be non-empty")
    for qid, terms in queries.items():
        if not terms:
            raise ValueError(f"query {qid!r} has no terms")
    all_terms = sorted({t for terms in queries.values() for t in terms})
    post, dfs, n, sumdl = _read_pruned(
        spark, _live_meta(path), path, all_terms, id_col
    )
    cached = post.localCheckpoint(eager=True)
    out = None
    for qid, terms in queries.items():
        pivoted = cached.groupBy(F.col(id_col)).agg(
            F.max("dl").alias("dl"),
            *[
                F.coalesce(
                    F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
                ).alias(f"__tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        res = _literal_okapi_tail(
            pivoted,
            [dfs.get(t, 0) for t in terms],
            n,
            sumdl,
            k,
            k1,
            b,
            id_col,
        ).select(F.lit(qid).alias("query_id"), "rank", id_col, "score_r")
        out = res if out is None else out.unionByName(res)
    return out


def bm25_phrase_search_served(
    spark: SparkSession,
    path: str,
    phrases: list[tuple[str, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact bigram-PHRASE BM25 against the frozen index — Lucene's
    PhraseQuery over the positional postings: the component words'
    bucket partitions are the only reads; per doc, a phrase's tf is
    ``|pos(w1) ∩ (pos(w2) - 1)|`` (adjacent positions, slop 0) via JVM
    array intersection; phrase df folds from the SAME pruned frame (a
    doc containing the phrase necessarily holds both words, so the
    pruned read covers every contributor — df is corpus-exact without
    a corpus pass); N/Σdl come from the marker, tombstones corrected
    like the term path. Scoring is the shared literal Okapi tail, so
    the result is bit-compatible with the inline
    ``corpus.bm25_phrase_topk``."""
    if not phrases:
        raise ValueError("phrases must be non-empty")
    for p in phrases:
        if len(p) != 2:
            raise ValueError(f"only bigram phrases are supported (got {p!r})")
    words = sorted({w for p in phrases for w in p})
    post, _dfs, n, sumdl = _read_pruned(
        spark, _live_meta(path), path, words, id_col
    )
    empty_pos = F.array().cast("array<int>")
    pivoted = post.groupBy(F.col(id_col)).agg(
        F.max("dl").alias("dl"),
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == w, F.col("pos"))), empty_pos
            ).alias(f"__pos_{j}")
            for j, w in enumerate(words)
        ],
    )
    widx = {w: j for j, w in enumerate(words)}
    tf_cols = []
    for i, (w1, w2) in enumerate(phrases):
        tf = F.size(
            F.array_intersect(
                F.col(f"__pos_{widx[w1]}"),
                F.transform(F.col(f"__pos_{widx[w2]}"), lambda x: x - 1),
            )
        )
        tf_cols.append(tf.alias(f"__tf{i}"))
    pivoted = pivoted.select(id_col, "dl", *tf_cols)
    # phrase df: one aggregate over the pruned frame (vocabulary- and
    # query-bounded, never the corpus)
    dfr = pivoted.agg(
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(phrases))
        ]
    ).collect()[0]
    df_list = [int(dfr[f"__df{i}"] or 0) for i in range(len(phrases))]
    return _literal_okapi_tail(pivoted, df_list, n, sumdl, k, k1, b, id_col)

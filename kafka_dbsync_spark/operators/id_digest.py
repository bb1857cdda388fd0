"""Shared id-digest machinery: metadata-cheap disjointness/membership
guards for every persisted index family.

Extracted from ``operators/pq_index.py`` (r11, VERDICT r10 #3) so the
BM25 segment family can run the SAME zero-IO ladder its ANN sibling
proved out (VERDICT r11 #1: ``bm25_index_add`` was unioning EVERY live
segment's doclens per add to probe doc-id disjointness — an index-sized
parquet read per mutation, the exact cost shape the digest ladder
eliminated for ANN merges).

A digest summarizes one id set with up to three metadata layers:

  - the [min, max] interval — range-/partition-split sharding (the
    dominant 100 TB shape) proves disjointness by interval alone;
  - the residues-mod-64 mask (one uint64) — parity/stride splits
    (even/odd, id%k==j) prove disjointness even when intervals
    interleave;
  - OPTIONALLY a fixed-parameter Bloom bitmap (m = 2^20 bits, k = 4,
    md5-derived positions — FIXED so blooms of different indexes
    COMPOSE by OR and cross-test directly).

The interval and residue layers ride the caller's OWN stats aggregate
as three plain-row columns (min/max/bit_or — free next to the n/Σdl
the write computes anyway). The bloom is attached only for id sets of
at most :data:`BLOOM_MAX_IDS` (r12): beyond that the fixed-m bitmap
saturates toward all-ones — every probe "maybe"s and the rung proves
nothing — while its construction cost keeps growing with the id count.
The r11 shape paid that cost unconditionally AND badly: a 4x
``posexplode`` of the caller's stats frame plus a ``collect_set`` that
funneled up to 2^20 distinct position values through a single reducer
into one million-element driver row per segment write — measured as
the bm25 mutation family regressing from ~1.2x to ~3.8x at 10x in the
round-12 scale probe. Now the bloom, when wanted at all, is ONE extra
batch-sized job: positions explode -> group by 64-bit WORD -> bit_or
-> collect of at most m/64 = 16,384 small rows, fully parallel.

Soundness contract (what every consumer relies on): a digest is a
SUPERSET witness of its id set — interval/residue misses and Bloom
absence are EXACT "not present"; Bloom presence is only "maybe"; a
MISSING bloom just disables that one rung (the interval and residue
rungs remain exact). Removals never shrink a digest (a Bloom cannot
unset); a superset digest can only cost extra exact probes, never a
wrong answer. A missing/legacy-shaped digest disables the metadata
rungs entirely — callers fall back to their exact probes verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_M = 1 << 20  # bits; FIXED across indexes so blooms compose
DIGEST_K = 4
#: id sets above this size get NO bloom (interval + residue only): at
#: 2^17 ids the fill is 1 - e^(-4*2^17/2^20) ~ 39% (all-k false-
#: positive ~ 2.3%); by 2^18 it passes 63% and the AND-set rung mostly
#: abstains anyway. The cap also bounds the bloom job and the marker
#: record (a compressed near-saturated bitmap stops compressing).
BLOOM_MAX_IDS = 1 << 17
#: intersection sizes above this: the bloom rung abstains (saturated
#: bitmaps prove nothing worth a scan) and callers go exact
DIGEST_AND_CAP = 1 << 16
#: suspect ids above this: exact semi-join instead of an isin literal
DIGEST_SUSPECT_CAP = 10000

MASK64 = (1 << 64) - 1


def digest_positions_expr(id_col: str):
    """The k bloom positions of an id as a Spark array — md5 of the
    id's decimal string, split into four 32-bit hex slices mod m.
    Bit-identical to :func:`digest_positions_py` (Spark's md5/conv and
    Python's hashlib agree on these inputs), so driver-side membership
    tests and executor-side suspect scans share one hash family."""
    h = F.md5(F.col(id_col).try_cast("long").cast("string"))
    return F.array(
        *[
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
            % DIGEST_M
            for i in range(DIGEST_K)
        ]
    )


def digest_positions_py(i: int) -> list[int]:
    import hashlib

    hx = hashlib.md5(str(int(i)).encode()).hexdigest()
    return [int(hx[8 * j : 8 * j + 8], 16) % DIGEST_M for j in range(DIGEST_K)]


def digest_agg_columns() -> list:
    """The interval/residue digest layers as PLAIN aggregate columns,
    to fold into a caller's OWN stats job at zero marginal cost: apply
    over a frame that carries the id cast long as ``__i`` — no row
    multiplication, no hash evaluation (r12: the r11 shape posexploded
    k bloom positions per row here, 4x-ing the caller's whole stats
    frame; the bloom now has its own capped job,
    :func:`attach_bloom`)."""
    return [
        F.min("__i").alias("__d_mn"),
        F.max("__i").alias("__d_mx"),
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT),"
            " CAST(pmod(__i, 64) AS INT)))"
        ).alias("__d_res"),
        # ids the long cast lost: a digest that covers only PART of the
        # id set is not a superset witness — any loss voids the digest
        # (digest_from_agg_row returns None; callers fall back exact)
        F.count(F.when(F.col("__i").isNull(), True)).alias("__d_bad"),
    ]


def digest_from_agg_row(row) -> dict | None:
    """Bloom-less digest record from a :func:`digest_agg_columns`
    result row; None when the id set was empty, or when ANY id failed
    the long cast (a partial digest would falsely prove disjointness
    for the uncovered ids). Callers with a small id set attach the
    bloom layer afterwards via :func:`attach_bloom`."""
    if row["__d_mn"] is None or int(row["__d_bad"]) > 0:
        return None
    return {
        "m": DIGEST_M,
        "k": DIGEST_K,
        "min": int(row["__d_mn"]),
        "max": int(row["__d_mx"]),
        "res64": int(row["__d_res"]) & MASK64,
    }


def bloom_b64(df: DataFrame, id_col: str) -> str:
    """The id column's bloom bitmap, base64(zlib) — computed
    DISTRIBUTED: positions explode, group by 64-bit word, ``bit_or``
    within each word, collect at most m/64 = 16,384 (word, bits) rows.
    No single-reducer million-element set, no driver-side array row;
    the job is batch-sized and column-pruned. Callers gate on
    :data:`BLOOM_MAX_IDS` (see :func:`attach_bloom`)."""
    import base64
    import zlib

    rows = (
        df.select(F.explode(digest_positions_expr(id_col)).alias("__p"))
        .select(
            F.shiftright("__p", 6).cast("int").alias("__w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(__p, 64) AS INT))"
            ).alias("__b"),
        )
        .groupBy("__w")
        .agg(F.expr("bit_or(__b)").alias("__bits"))
        .collect()
    )
    bitmap = bytearray(DIGEST_M // 8)
    # word w covers global bits [64w, 64w+64); the little-endian byte
    # store below lands bit p at bitmap[p >> 3] & (1 << (p & 7)) —
    # identical to the per-position layout digest_positions_py readers
    # (digest_may_contain, digest_and_set) decode
    for r in rows:
        w = int(r["__w"])
        bitmap[8 * w : 8 * w + 8] = (
            (int(r["__bits"]) & MASK64).to_bytes(8, "little")
        )
    return base64.b64encode(zlib.compress(bytes(bitmap))).decode()


def attach_bloom(
    df: DataFrame, id_col: str, digest: dict | None, n_ids: int
) -> dict | None:
    """Attach the bloom layer to ``digest`` iff the id set is small
    enough for a fixed-m bloom to discriminate (``n_ids`` at most
    :data:`BLOOM_MAX_IDS`) — one extra batch-sized job; above the cap
    the digest stays interval+residue-only (no job, no bitmap) and the
    bloom rung simply abstains."""
    if digest is not None and 0 < n_ids <= BLOOM_MAX_IDS:
        digest = dict(digest)
        digest["bloom"] = bloom_b64(df, id_col)
    return digest


def ids_digest(df: DataFrame, id_col: str) -> dict | None:
    """Standalone digest of one id column — a single narrow aggregate
    (batch-sized when ``df`` is a batch) plus, for small id sets, the
    capped bloom job. Callers whose write path already aggregates the
    ids fold :func:`digest_agg_columns` into that job instead and pay
    nothing for the interval/residue layers."""
    row = (
        df.select(F.col(id_col).try_cast("long").alias("__i"))
        .agg(F.count(F.lit(1)).alias("__d_n"), *digest_agg_columns())
        .head()
    )
    return attach_bloom(df, id_col, digest_from_agg_row(row), int(row["__d_n"]))


def digest_usable(d) -> bool:
    """True iff the interval/residue layers are present and, WHEN a
    bloom rides along, its parameters match this module's fixed (m, k)
    — a foreign-parameter bloom voids the whole record (its positions
    don't compose), while a merely ABSENT bloom leaves the exact
    interval/residue rungs fully usable."""
    if not (
        isinstance(d, dict)
        and d.get("min") is not None
        and d.get("res64") is not None
    ):
        return False
    if d.get("bloom"):
        return d.get("m") == DIGEST_M and d.get("k") == DIGEST_K
    return True


def digest_has_bloom(d) -> bool:
    return digest_usable(d) and bool(d.get("bloom"))


def digest_bitmap(d: dict) -> bytes | None:
    """Decoded bloom bitmap, or None for a bloom-less digest (the
    membership test then runs on interval+residue alone)."""
    import base64
    import zlib

    if not d.get("bloom"):
        return None
    return zlib.decompress(base64.b64decode(d["bloom"]))


def digest_may_contain(d: dict, bitmap: bytes | None, i: int) -> bool:
    """Metadata-only membership: False is EXACT absence (interval and
    residue tests are exact; the bloom never false-negatives). A None
    ``bitmap`` (bloom-less digest) skips the bloom rung — strictly
    more "maybe"s, never a false absence."""
    i = int(i)
    if i < d["min"] or i > d["max"]:
        return False
    if not (d["res64"] >> (i % 64)) & 1:
        return False
    if bitmap is None:
        return True
    return all((bitmap[p >> 3] >> (p & 7)) & 1 for p in digest_positions_py(i))


def digest_or(a, b):
    """Digest of the disjoint union — hull of intervals, OR of residue
    masks, OR of blooms when BOTH sides carry one (else the union is
    bloom-less: a bloom covering only one side would false-negative
    the other's ids). None when either side is missing/legacy-shaped
    (absent digest = exact-probe fallback, never a wrong one)."""
    import base64
    import zlib

    if not (digest_usable(a) and digest_usable(b)):
        return None
    out = {
        "m": DIGEST_M,
        "k": DIGEST_K,
        "min": min(a["min"], b["min"]),
        "max": max(a["max"], b["max"]),
        "res64": (a["res64"] | b["res64"]) & MASK64,
    }
    if a.get("bloom") and b.get("bloom"):
        ba, bb = digest_bitmap(a), digest_bitmap(b)
        merged = bytes(x | y for x, y in zip(ba, bb))
        out["bloom"] = base64.b64encode(zlib.compress(merged)).decode()
    return out


def digest_and_set(a: dict, b: dict):
    """Sorted bit positions set in BOTH blooms (numpy, driver-side).
    An id can be on both sides only if ALL k of its positions survive
    this intersection — an empty AND-set is a PROOF of disjointness.
    Callers must guard on :func:`digest_has_bloom` for both sides."""
    import numpy as np

    both = np.bitwise_and(
        np.frombuffer(digest_bitmap(a), dtype=np.uint8),
        np.frombuffer(digest_bitmap(b), dtype=np.uint8),
    )
    # bit index = byte*8 + intra-byte position, matching the writer's
    # `1 << (p & 7)` little-endian layout
    return np.nonzero(np.unpackbits(both, bitorder="little"))[0]


def disjoint_suspects(
    spark,
    probe_df: DataFrame,
    probe_digest,
    index_digest,
    id_col: str,
):
    """The shared disjointness ladder, factored so refusal-shaped
    (``pq_index_merge``, ``bm25_index_add``) and admission-shaped
    (``bm25_ingest_foreach_batch``) consumers both run it:

    - ``[]``    — PROVEN id-disjoint with zero index IO (interval,
                  residue mask, or empty bloom AND-set);
    - ``[ids]`` — only these probe-side ids can possibly be in the
                  index (all other probe ids are EXACTLY absent): the
                  caller's exact probe shrinks to an isin over them;
    - ``None``  — undecided (legacy digest, a bloom-less side after
                  the interval/residue rungs both overlap, saturated
                  blooms, or a giant suspect set): the caller keeps
                  its full exact probe verbatim.

    Only ``probe_df`` (the batch/shard side) is ever scanned here —
    the index side is pure marker metadata."""
    if not (digest_usable(probe_digest) and digest_usable(index_digest)):
        return None
    if (
        probe_digest["max"] < index_digest["min"]
        or index_digest["max"] < probe_digest["min"]
    ):
        return []  # interval-disjoint: proven with zero IO
    if (probe_digest["res64"] & index_digest["res64"]) == 0:
        return []  # disjoint residues mod 64: proven with zero IO
    if not (digest_has_bloom(probe_digest) and digest_has_bloom(index_digest)):
        return None  # no bloom rung to run: undecided, caller goes exact
    and_set = digest_and_set(probe_digest, index_digest)
    if len(and_set) == 0:
        return []  # no position is set on both sides: proven disjoint
    if len(and_set) > DIGEST_AND_CAP:
        return None
    and_df = spark.createDataFrame([(int(p),) for p in and_set], "p bigint")
    # exactly-K matches <=> ALL the id's position slots are in the
    # AND-set (a slot joins iff its position is); a true duplicate
    # always satisfies this, so the filter is suspect-complete
    hits = (
        probe_df.select(
            F.col(id_col).cast("long").alias("__sid"),
            F.explode(digest_positions_expr(id_col)).alias("p"),
        )
        .join(F.broadcast(and_df), "p")
        .groupBy("__sid")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") == DIGEST_K)
    )
    suspects = [
        int(r["__sid"]) for r in hits.limit(DIGEST_SUSPECT_CAP + 1).collect()
    ]
    if len(suspects) > DIGEST_SUSPECT_CAP:
        return None
    return suspects

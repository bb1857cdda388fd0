"""Shared id-digest machinery: metadata-cheap disjointness/membership
guards for every persisted index family.

Extracted from ``operators/pq_index.py`` (r11, VERDICT r10 #3) so the
BM25 segment family can run the SAME zero-IO ladder its ANN sibling
proved out (VERDICT r11 #1: ``bm25_index_add`` was unioning EVERY live
segment's doclens per add to probe doc-id disjointness — an index-sized
parquet read per mutation, the exact cost shape the digest ladder
eliminated for ANN merges).

A digest summarizes one id set with three metadata layers, all computed
in ONE narrow-column aggregate at write time (free next to the segment
write itself):

  - the [min, max] interval — range-/partition-split sharding (the
    dominant 100 TB shape) proves disjointness by interval alone;
  - the residues-mod-64 mask (one uint64) — parity/stride splits
    (even/odd, id%k==j) prove disjointness even when intervals
    interleave;
  - a fixed-parameter Bloom bitmap (m = 2^20 bits, k = 4, md5-derived
    positions — FIXED so digests of different indexes COMPOSE by OR
    and cross-test directly).

Soundness contract (what every consumer relies on): a digest is a
SUPERSET witness of its id set — interval/residue misses and Bloom
absence are EXACT "not present"; Bloom presence is only "maybe".
Removals never shrink a digest (a Bloom cannot unset); a superset
digest can only cost extra exact probes, never a wrong answer. A
missing/legacy-shaped digest disables the metadata rungs entirely —
callers fall back to their exact probes verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIGEST_M = 1 << 20  # bits; FIXED across indexes so digests compose
DIGEST_K = 4
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
    """The digest's aggregate columns, to fold into a caller's OWN
    stats job: apply over a frame that carries the id as ``__i`` (cast
    long) and ``posexplode(digest_positions_expr(id))`` as
    ``(__s, __p)`` — k rows per input row, so the caller's other
    aggregates must condition on ``__s == 0`` to count each row once
    (:func:`pq_index.fingerprint_and_digest` and
    :func:`bm25_index._segment_writer` both do)."""
    return [
        F.min("__i").alias("__d_mn"),
        F.max("__i").alias("__d_mx"),
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT),"
            " CAST(pmod(__i, 64) AS INT)))"
        ).alias("__d_res"),
        F.collect_set("__p").alias("__d_ps"),
        # ids the long cast lost: a digest that covers only PART of the
        # id set is not a superset witness — any loss voids the digest
        # (digest_from_agg_row returns None; callers fall back exact)
        F.count(F.when(F.col("__i").isNull(), True)).alias("__d_bad"),
    ]


def digest_from_agg_row(row) -> dict | None:
    """Digest record from a :func:`digest_agg_columns` result row;
    None when the id set was empty, or when ANY id failed the long
    cast (a partial digest would falsely prove disjointness for the
    uncovered ids)."""
    import base64
    import zlib

    if row["__d_mn"] is None or int(row["__d_bad"]) > 0:
        return None
    bitmap = bytearray(DIGEST_M // 8)
    for p in row["__d_ps"]:
        p = int(p)
        bitmap[p >> 3] |= 1 << (p & 7)
    return {
        "m": DIGEST_M,
        "k": DIGEST_K,
        "min": int(row["__d_mn"]),
        "max": int(row["__d_mx"]),
        "res64": int(row["__d_res"]) & MASK64,
        "bloom": base64.b64encode(zlib.compress(bytes(bitmap))).decode(),
    }


def ids_digest(df: DataFrame, id_col: str) -> dict | None:
    """Standalone digest of one id column — a single narrow aggregate
    (batch-sized when ``df`` is a batch). Callers whose write path
    already aggregates the ids fold :func:`digest_agg_columns` into
    that job instead and pay nothing."""
    row = (
        df.select(
            F.col(id_col).try_cast("long").alias("__i"),
            F.posexplode(digest_positions_expr(id_col)).alias("__s", "__p"),
        )
        .agg(*digest_agg_columns())
        .head()
    )
    return digest_from_agg_row(row)


def digest_usable(d) -> bool:
    return (
        isinstance(d, dict)
        and d.get("m") == DIGEST_M
        and d.get("k") == DIGEST_K
        and d.get("min") is not None
        and d.get("res64") is not None
        and bool(d.get("bloom"))
    )


def digest_bitmap(d: dict) -> bytes:
    import base64
    import zlib

    return zlib.decompress(base64.b64decode(d["bloom"]))


def digest_may_contain(d: dict, bitmap: bytes, i: int) -> bool:
    """Metadata-only membership: False is EXACT absence (interval and
    residue tests are exact; the bloom never false-negatives)."""
    i = int(i)
    if i < d["min"] or i > d["max"]:
        return False
    if not (d["res64"] >> (i % 64)) & 1:
        return False
    return all((bitmap[p >> 3] >> (p & 7)) & 1 for p in digest_positions_py(i))


def digest_or(a, b):
    """Digest of the disjoint union — OR of bitmaps, hull of intervals.
    None when either side is missing/legacy-shaped (absent digest =
    exact-probe fallback, never a wrong one)."""
    import base64
    import zlib

    if not (digest_usable(a) and digest_usable(b)):
        return None
    ba, bb = digest_bitmap(a), digest_bitmap(b)
    merged = bytes(x | y for x, y in zip(ba, bb))
    return {
        "m": DIGEST_M,
        "k": DIGEST_K,
        "min": min(a["min"], b["min"]),
        "max": max(a["max"], b["max"]),
        "res64": (a["res64"] | b["res64"]) & MASK64,
        "bloom": base64.b64encode(zlib.compress(merged)).decode(),
    }


def digest_and_set(a: dict, b: dict):
    """Sorted bit positions set in BOTH blooms (numpy, driver-side).
    An id can be on both sides only if ALL k of its positions survive
    this intersection — an empty AND-set is a PROOF of disjointness."""
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
    - ``None``  — undecided (legacy digest, saturated blooms, or a
                  giant suspect set): the caller keeps its full exact
                  probe verbatim.

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

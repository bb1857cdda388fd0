"""Shared id-digest machinery (operators/id_digest.py): superset
soundness of the digest record and the three-outcome disjointness
ladder both index families (pq_index, bm25_index) ride."""

from __future__ import annotations

import kafka_dbsync_spark.operators.id_digest as d


def _mk(ids):
    import base64
    import zlib

    bm = bytearray(d.DIGEST_M // 8)
    res = 0
    for i in ids:
        res |= 1 << (i % 64)
        for p in d.digest_positions_py(i):
            bm[p >> 3] |= 1 << (p & 7)
    return {
        "m": d.DIGEST_M,
        "k": d.DIGEST_K,
        "min": min(ids),
        "max": max(ids),
        "res64": res,
        "bloom": base64.b64encode(zlib.compress(bytes(bm))).decode(),
    }


def test_ids_digest_voided_by_uncastable_ids(spark):
    """A digest that covered only the long-castable subset of the ids
    would falsely prove disjointness for the rest — ANY cast loss must
    void the digest entirely (None -> exact-probe fallback)."""
    ok = spark.createDataFrame([("7",), ("9",)], "doc_id string")
    assert d.digest_usable(d.ids_digest(ok, "doc_id"))  # numeric strings cast
    mixed = spark.createDataFrame([("7",), ("doc-9",)], "doc_id string")
    assert d.ids_digest(mixed, "doc_id") is None
    empty = spark.createDataFrame([], "doc_id bigint")
    assert d.ids_digest(empty, "doc_id") is None


def test_disjoint_suspects_three_outcomes(spark):
    probe = spark.createDataFrame([(2,), (130,)], "doc_id bigint")
    # interval-disjoint: proven, zero IO
    assert d.disjoint_suspects(spark, probe, _mk([2, 130]), _mk([300, 400]), "doc_id") == []
    # parity-disjoint (interleaved intervals): proven, zero IO
    assert d.disjoint_suspects(spark, probe, _mk([2, 130]), _mk([1, 131]), "doc_id") == []
    # genuine overlap: the duplicate must surface as a suspect
    sus = d.disjoint_suspects(spark, probe, _mk([2, 130]), _mk([66, 130]), "doc_id")
    assert sus is not None and 130 in sus and 2 not in sus
    # unusable digest on either side: undecided
    assert d.disjoint_suspects(spark, probe, None, _mk([66, 130]), "doc_id") is None
    assert d.disjoint_suspects(spark, probe, _mk([2, 130]), {"m": 64}, "doc_id") is None


def _strip_bloom(dig):
    out = {k: v for k, v in dig.items() if k != "bloom"}
    return out


def test_bloomless_digest_keeps_exact_rungs(spark):
    """r12: id sets above BLOOM_MAX_IDS get NO bloom (the fixed-m
    bitmap saturates and its construction cost grows with the set) —
    but the interval/residue layers stay fully usable: range- and
    stride-split disjointness still proves with zero IO, and only a
    genuine interval+residue overlap degrades to 'undecided'."""
    probe = spark.createDataFrame([(2,), (130,)], "doc_id bigint")
    a, b = _strip_bloom(_mk([2, 130])), _strip_bloom(_mk([300, 400]))
    assert d.digest_usable(a) and not d.digest_has_bloom(a)
    # interval rung proves without any bloom
    assert d.disjoint_suspects(spark, probe, a, b, "doc_id") == []
    # residue rung proves (parity split, interleaved intervals)
    assert (
        d.disjoint_suspects(
            spark, probe, a, _strip_bloom(_mk([1, 131])), "doc_id"
        )
        == []
    )
    # overlap + a bloom-less side: undecided (exact fallback), whether
    # the bloom is missing on the probe side, the index side, or both
    assert d.disjoint_suspects(spark, probe, a, _mk([66, 130]), "doc_id") is None
    assert (
        d.disjoint_suspects(spark, probe, _mk([2, 130]), _strip_bloom(_mk([66, 130])), "doc_id")
        is None
    )
    # membership with a None bitmap: interval/residue absences stay
    # EXACT; an id passing both rungs is a "maybe" (True), never a
    # false absence
    assert not d.digest_may_contain(a, None, 400)  # outside interval
    assert not d.digest_may_contain(a, None, 67)  # residue miss
    assert d.digest_may_contain(a, None, 66)  # same residue as 2: maybe


def test_bloom_cap_and_or_composition(spark, monkeypatch):
    """The standalone ids_digest attaches a bloom only under
    BLOOM_MAX_IDS; digest_or keeps the bloom when both sides carry
    one and drops it (keeping interval/residue) when either side is
    bloom-less — a half-coverage bloom would false-negative the
    uncovered side's ids."""
    monkeypatch.setattr(d, "BLOOM_MAX_IDS", 4)
    small = spark.createDataFrame([(2,), (4,)], "doc_id bigint")
    big = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id bigint")
    ds, dbg = d.ids_digest(small, "doc_id"), d.ids_digest(big, "doc_id")
    assert d.digest_has_bloom(ds)
    assert d.digest_usable(dbg) and not d.digest_has_bloom(dbg)
    assert (dbg["min"], dbg["max"]) == (1, 10)
    u = d.digest_or(ds, dbg)
    assert d.digest_usable(u) and not d.digest_has_bloom(u)
    assert (u["min"], u["max"]) == (1, 10)
    both = d.digest_or(ds, d.ids_digest(small, "doc_id"))
    assert d.digest_has_bloom(both)


def test_distributed_bloom_matches_py_hasher(spark):
    """bloom_b64's word-grouped distributed construction must land
    every id's k positions exactly where digest_positions_py readers
    look — byte- and bit-identical to the per-position layout."""
    ids = [7, 64, 65, 1_000_003]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    dig = d.ids_digest(df, "doc_id")
    bm = d.digest_bitmap(dig)
    assert all(d.digest_may_contain(dig, bm, i) for i in ids)
    # hand-check the raw bit layout against the python hasher
    for i in ids:
        for p in d.digest_positions_py(i):
            assert (bm[p >> 3] >> (p & 7)) & 1

"""Shared id-digest machinery (operators/id_digest.py): superset
soundness of the digest record and the three-outcome disjointness
ladder both index families (pq_index, bm25_index) ride — r13: bloom m
scales with the id set (constant fill), cross-m probes run the
word-join rung at the index bloom's native m, and a collectible probe
gets driver-side vectorized membership (probe_membership)."""

from __future__ import annotations

import kafka_dbsync_spark.operators.id_digest as d


def _mk(ids, m=None):
    import base64
    import zlib

    m = m or d.DIGEST_M
    bm = bytearray(m // 8)
    res = 0
    for i in ids:
        res |= 1 << (i % 64)
        for p in d.digest_positions_py(i, m):
            bm[p >> 3] |= 1 << (p & 7)
    return {
        "m": m,
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


def test_disjoint_suspects_lazy_probe_thunk(spark):
    """A callable probe side is resolved ONLY when a scan rung needs
    it — the zero-IO rungs never pay so much as a parquet listing."""

    def boom():
        raise AssertionError("zero-IO rung resolved the probe thunk")

    assert d.disjoint_suspects(spark, boom, _mk([2, 130]), _mk([300, 400]), "doc_id") == []
    assert d.disjoint_suspects(spark, boom, _mk([2, 130]), _mk([1, 131]), "doc_id") == []
    calls = []

    def probe():
        calls.append(1)
        return spark.createDataFrame([(2,), (130,)], "doc_id bigint")

    sus = d.disjoint_suspects(spark, probe, _mk([2, 130]), _mk([66, 130]), "doc_id")
    assert calls == [1] and sus is not None and 130 in sus


def _strip_bloom(dig):
    out = {k: v for k, v in dig.items() if k != "bloom"}
    return out


def test_bloomless_digest_keeps_exact_rungs(spark):
    """Id sets above BLOOM_MAX_IDS get NO bloom — but the
    interval/residue layers stay fully usable: range- and stride-split
    disjointness still proves with zero IO. r13: a bloom-less PROBE
    side against a bloomed index is now DECIDED by the word-join rung
    (the index bloom at its native m needs no probe-side bitmap); only
    a bloom-less INDEX side degrades to 'undecided'."""
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
    # overlap + bloom-less PROBE side: the word rung still decides
    sus = d.disjoint_suspects(spark, probe, a, _mk([66, 130]), "doc_id")
    assert sus is not None and 130 in sus and 2 not in sus
    # overlap + bloom-less INDEX side: undecided (exact fallback)
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
    one AT THE SAME m and drops it (keeping interval/residue)
    otherwise — a half-coverage or cross-m-folded bloom would
    false-negative ids (fold saturation)."""
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
    # cross-m union: blooms don't compose by fold — dropped, exact
    # interval/residue layers kept
    cross = d.digest_or(_mk([2, 4]), _mk([7, 9], m=d.DIGEST_M * 2))
    assert d.digest_usable(cross) and not d.digest_has_bloom(cross)
    assert (cross["min"], cross["max"]) == (2, 9)


def test_bloom_m_scales_with_id_set():
    """r13 (VERDICT r12 #1): m grows with the id set at constant
    bits/id, clamped to [DIGEST_M, DIGEST_M_CAP] — so segments stay
    bloom-covered to BLOOM_MAX_IDS = 2^21 ids instead of saturating a
    fixed bitmap at ~2^17."""
    assert d.bloom_m_for(1) == d.DIGEST_M
    assert d.bloom_m_for(d.DIGEST_M // d.BLOOM_BITS_PER_ID) == d.DIGEST_M
    assert (
        d.bloom_m_for(d.DIGEST_M // d.BLOOM_BITS_PER_ID + 1) == d.DIGEST_M * 2
    )
    assert d.bloom_m_for(1 << 30) == d.DIGEST_M_CAP
    assert d.BLOOM_MAX_IDS == d.DIGEST_M_CAP // d.BLOOM_BITS_PER_ID
    assert d.BLOOM_MAX_IDS > (1 << 17)  # past the r12 crossover


def test_cross_m_word_rung_decides(spark):
    """A probe bloomed at one m against an index bloomed at ANOTHER m
    (a small batch vs a production-sized segment) is decided by the
    word-join rung at the INDEX's native m — no fold, no saturation,
    suspects exact-complete."""
    probe = spark.createDataFrame([(2,), (130,)], "doc_id bigint")
    idx = _mk([66, 130], m=d.DIGEST_M * 4)
    sus = d.disjoint_suspects(spark, probe, _mk([2, 130]), idx, "doc_id")
    assert sus is not None and 130 in sus and 2 not in sus
    # and a genuinely disjoint overlap-in-interval/residue pair
    # resolves to [] through the same rung
    probe2 = spark.createDataFrame([(66 + 128,), (130 + 128,)], "doc_id bigint")
    pd2 = _mk([66 + 128, 130 + 128])
    assert d.disjoint_suspects(spark, probe2, pd2, idx, "doc_id") == []


def test_usable_accepts_any_pow2_m_rejects_foreign():
    assert d.digest_usable(_mk([2, 4], m=d.DIGEST_M * 2))
    assert d.digest_usable(_mk([2, 4], m=d.DIGEST_M_CAP))
    bad_k = dict(_mk([2, 4]), k=2)
    assert not d.digest_usable(bad_k)
    bad_m = dict(_mk([2, 4]), m=d.DIGEST_M + 1)  # not a power of two
    assert not d.digest_usable(bad_m)
    bad_big = dict(_mk([2, 4]), m=d.DIGEST_M_CAP * 2)  # past the cap
    assert not d.digest_usable(bad_big)


def test_distributed_bloom_matches_py_hasher(spark):
    """bloom_b64's word-grouped distributed construction must land
    every id's k positions exactly where digest_positions_py readers
    look — byte- and bit-identical to the per-position layout, at the
    default m and at a scaled one."""
    ids = [7, 64, 65, 1_000_003]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    dig = d.ids_digest(df, "doc_id")
    bm = d.digest_bitmap(dig)
    assert all(d.digest_may_contain(dig, bm, i) for i in ids)
    # hand-check the raw bit layout against the python hasher
    for i in ids:
        for p in d.digest_positions_py(i):
            assert (bm[p >> 3] >> (p & 7)) & 1
    m2 = d.DIGEST_M * 4
    b64 = d.bloom_b64(df, "doc_id", m2)
    import base64
    import zlib

    bm2 = zlib.decompress(base64.b64decode(b64))
    assert len(bm2) == m2 // 8
    for i in ids:
        for p in d.digest_positions_py(i, m2):
            assert (bm2[p >> 3] >> (p & 7)) & 1


def test_collect_probe_ids_soundness(spark, monkeypatch):
    """collect_probe_ids returns the COMPLETE distinct id list or
    None — never a partial list (a missing id would be falsely proven
    absent everywhere)."""
    ok = spark.createDataFrame([(2,), (2,), (130,)], "doc_id bigint")
    assert sorted(d.collect_probe_ids(ok, "doc_id")) == [2, 130]
    mixed = spark.createDataFrame([("7",), ("doc-9",)], "doc_id string")
    assert d.collect_probe_ids(mixed, "doc_id") is None
    withnull = spark.createDataFrame([(2,), (None,)], "doc_id bigint")
    assert d.collect_probe_ids(withnull, "doc_id") is None
    empty = spark.createDataFrame([], "doc_id bigint")
    assert d.collect_probe_ids(empty, "doc_id") == []
    monkeypatch.setattr(d, "PROBE_COLLECT_CAP", 1)
    assert d.collect_probe_ids(ok, "doc_id") is None  # over the cap


def test_probe_membership_vectorized_matches_scalar(spark):
    """The driver-side vectorized membership (the flat-per-epoch
    ingest rung) must agree with digest_may_contain id-for-id:
    absences EXACT, maybes a superset of the true members."""
    import numpy as np

    members = [2, 66, 130, 1_000_003]
    dig = _mk(members, m=d.DIGEST_M * 2)
    bm = d.digest_bitmap(dig)
    probe = members + [3, 65, 131, 400, 999_999, 2_000_000]
    arr, pos = d.probe_positions(probe)
    mask = d.probe_membership(arr, pos, dig)
    for i, flag in zip(probe, mask):
        assert bool(flag) == d.digest_may_contain(dig, bm, i), i
    # every true member is flagged (no false absence)
    assert all(mask[: len(members)])
    # bloom-less digest: interval/residue rungs still vectorize
    nb = _strip_bloom(dig)
    mask2 = d.probe_membership(arr, pos, nb)
    for i, flag in zip(probe, mask2):
        assert bool(flag) == d.digest_may_contain(nb, None, i), i
    assert isinstance(mask2, np.ndarray)

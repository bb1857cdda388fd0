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

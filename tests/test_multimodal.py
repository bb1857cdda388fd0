"""Raw-frame multimodal operators: resize pixel math, frame fan-out,
malformed-input tolerance (operators/multimodal.py)."""

from __future__ import annotations

import pytest

from kafka_dbsync_spark.operators.multimodal import (
    extract_media_meta,
    resize_raw_images,
    sample_frames,
)


def test_resize_nearest_neighbor_exact(spark):
    # 4x4 frame with distinct bytes; 4x4 -> 2x2 picks rows/cols 0 and 2
    img = bytes(range(16))
    df = spark.createDataFrame([(1, img)], "doc_id long, blob binary")
    out = resize_raw_images(df, in_w=4, in_h=4, out_w=2, out_h=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (2, 2)
    assert bytes(r["blob"]) == bytes([0, 2, 8, 10])


def test_resize_malformed_and_null_blobs(spark):
    df = spark.createDataFrame(
        [(1, bytes(16)), (2, bytes(7)), (3, None)], "doc_id long, blob binary"
    )
    got = {
        r["doc_id"]: r["blob"]
        for r in resize_raw_images(df, in_w=4, in_h=4, out_w=2, out_h=2).collect()
    }
    assert got[1] is not None
    assert got[2] is None  # wrong byte count -> NULL, not a crash
    assert got[3] is None


def test_resize_with_plugged_decoder(spark):
    import numpy as np

    # "codec": blob is a single byte replicated into an 8x8 frame
    def decoder(b):
        return np.full((8, 8), b[0], dtype=np.uint8)

    df = spark.createDataFrame([(1, bytes([7]))], "doc_id long, blob binary")
    r = resize_raw_images(
        df, in_w=8, in_h=8, out_w=2, out_h=2, decoder=decoder
    ).collect()[0]
    assert bytes(r["blob"]) == bytes([7, 7, 7, 7])


def test_sample_frames_fanout_and_cap(spark):
    blob = bytes(range(40))  # 5 full 8-byte frames
    df = spark.createDataFrame([(1, blob), (2, None)], "doc_id long, blob binary")
    rows = sample_frames(df, frame_bytes=8, every_n=2).collect()
    got = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in rows}
    # frames 0, 2, 4 sampled; doc 2 (NULL) contributes nothing
    assert set(got) == {(1, 0), (1, 2), (1, 4)}
    assert got[(1, 2)] == bytes(range(16, 24))

    capped = sample_frames(df, frame_bytes=8, every_n=2, max_frames=2).collect()
    assert {r["frame_idx"] for r in capped} == {0, 2}


def test_sample_frames_drops_trailing_partial(spark):
    df = spark.createDataFrame([(1, bytes(20))], "doc_id long, blob binary")
    rows = sample_frames(df, frame_bytes=8, every_n=1).collect()
    assert {r["frame_idx"] for r in rows} == {0, 1}  # 4 trailing bytes dropped


def test_sample_frames_with_extractor(spark):
    def extractor(raw):  # "codec": split on 0xFF markers
        return [p for p in raw.split(b"\xff") if p]

    df = spark.createDataFrame(
        [(1, b"aa\xffbb\xffcc")], "doc_id long, blob binary"
    )
    rows = sample_frames(df, every_n=1, extractor=extractor).collect()
    assert [bytes(r["frame"]) for r in sorted(rows, key=lambda r: r["frame_idx"])] == [
        b"aa", b"bb", b"cc"
    ]


def test_sample_frames_validates(spark):
    df = spark.createDataFrame([(1, bytes(8))], "doc_id long, blob binary")
    with pytest.raises(ValueError, match="positive"):
        sample_frames(df, every_n=0)


# ---------------------------------------------------------------------------
# shipped pure-numpy codec (functions/media.py) — VERDICT r2 #5: real
# encoded bytes through the decoder= hook, stub stays the fallback
# ---------------------------------------------------------------------------
def _np():
    import numpy as np

    return np


def test_codec_pgm_ppm_round_trip():
    np = _np()
    from kafka_dbsync_spark.functions.media import (
        decode_image_array,
        encode_pgm,
        encode_ppm,
    )

    g = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assert np.array_equal(decode_image_array(encode_pgm(g)), g)
    c = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    assert np.array_equal(decode_image_array(encode_ppm(c)), c)


def test_codec_pnm_header_comments_and_errors():
    np = _np()
    from kafka_dbsync_spark.functions.media import decode_image_array

    blob = b"P5 # a comment\n# another\n 3\t2 255\n" + bytes(range(6))
    a = decode_image_array(blob)
    assert a.shape == (2, 3) and a[1, 2] == 5
    with pytest.raises(ValueError, match="truncated"):
        decode_image_array(b"P5 4 4 255\n" + bytes(3))
    with pytest.raises(ValueError, match="maxval"):
        decode_image_array(b"P5 2 2 65535\n" + bytes(8))
    with pytest.raises(ValueError, match="PNM"):
        decode_image_array(b"P3 2 2 255\n0 0 0 0")  # ASCII PNM unsupported


def test_codec_bmp_round_trip_padding_and_topdown():
    np = _np()
    from kafka_dbsync_spark.functions.media import (
        decode_image_array,
        encode_bmp_gray,
    )

    # width 5: rows pad to 8 bytes — padding must not leak into pixels
    g = (np.arange(35, dtype=np.uint8) * 7 % 256).astype(np.uint8).reshape(7, 5)
    blob = encode_bmp_gray(g)
    assert np.array_equal(decode_image_array(blob), g)

    # top-down variant: flip the height sign, rows already top-first
    import struct

    h_neg = bytearray(blob)
    struct.pack_into("<i", h_neg, 22, -7)
    off = struct.unpack_from("<I", blob, 10)[0]
    row_bytes = 8
    rows = bytes(blob[off:])
    flipped = b"".join(
        rows[i * row_bytes : (i + 1) * row_bytes] for i in reversed(range(7))
    )
    h_neg[off:] = flipped
    assert np.array_equal(decode_image_array(bytes(h_neg)), g)

    with pytest.raises(ValueError, match="bit depth"):
        bad = bytearray(blob)
        struct.pack_into("<H", bad, 28, 4)
        decode_image_array(bytes(bad))


def test_extract_media_meta_decodes_real_encoded_bytes(spark):
    """The shipped decoder plugs into the same decoder= hook as any real
    codec: width/height come from actual BMP/PPM decoding."""
    np = _np()
    from kafka_dbsync_spark.functions.media import (
        decode_image,
        encode_bmp_gray,
        encode_ppm,
    )

    bmp = encode_bmp_gray(np.zeros((12, 7), dtype=np.uint8))
    ppm = encode_ppm(np.zeros((4, 9, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(ppm)), (3, None)],
        "doc_id long, blob binary",
    )
    rows = {
        r["doc_id"]: r
        for r in extract_media_meta(df, decoder=decode_image).collect()
    }
    assert (rows[1]["width"], rows[1]["height"]) == (7, 12)
    assert (rows[2]["width"], rows[2]["height"]) == (9, 4)
    assert rows[1]["magic"] == bmp[:4].hex()
    assert rows[3]["width"] is None and rows[3]["byte_len"] == 0


def test_resize_through_real_codec(spark):
    np = _np()
    from kafka_dbsync_spark.functions.media import (
        decode_image_array,
        encode_pgm,
    )

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_pgm(g)))], "doc_id long, blob binary"
    )
    out = resize_raw_images(
        df, in_w=8, in_h=8, out_w=4, out_h=4, decoder=decode_image_array
    ).collect()[0]
    expect = g[np.ix_((np.arange(4) * 8) // 4, (np.arange(4) * 8) // 4)]
    assert bytes(out["blob"]) == expect.tobytes()
    assert (out["width"], out["height"]) == (4, 4)


def test_decode_stub_still_raises(spark):
    from kafka_dbsync_spark.operators.multimodal import decode_stub

    with pytest.raises(NotImplementedError, match="decoder"):
        decode_stub(b"anything")


def test_audio_window_energy_exact(spark):
    from kafka_dbsync_spark.operators.multimodal import audio_window_energy
    import math

    rows = [
        (1, bytes([128] * 300)),          # silence: rms 0 in both windows
        (2, bytes([255, 0] * 10)),        # max swing, one partial window
        (3, None),                        # missing blob -> no rows
        (4, b""),                         # empty file -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    got = {
        (r["doc_id"], r["win_idx"]): (r["n_samples"], r["rms"])
        for r in audio_window_energy(df, window=256).collect()
    }
    assert got[(1, 0)] == (256, 0.0)
    assert got[(1, 1)] == (44, 0.0)
    expected = round(math.sqrt((127 * 127 + 128 * 128) * 10 / 20), 4)
    assert got[(2, 0)] == (20, expected)
    assert not any(d in (3, 4) for d, _ in got)


# ---------------------------------------------------------------------------
# Image perceptual-hash dedup (image_dhash / image_neardup_pairs)
# ---------------------------------------------------------------------------
def _frames(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_image_dhash_known_values(spark):
    """Hand-computable frames: strictly decreasing rows -> every
    comparison true (all 56 bits set); constant frame -> 0; and the
    numpy replay of an arbitrary frame matches bit-for-bit."""
    import numpy as np

    from kafka_dbsync_spark.operators.multimodal import image_dhash

    desc = bytes(bytearray([(7 - c) + 10 * r for r in range(8) for c in range(8)]))
    flat = bytes(64)
    arb = bytes(bytearray((i * 37 + 11) % 251 for i in range(64)))
    got = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(
            _frames(spark, [(1, desc), (2, flat), (3, arb)])
        ).collect()
    }
    assert got[1] == (1 << 56) - 1
    assert got[2] == 0
    g = np.frombuffer(arb, np.uint8).reshape(8, 8)
    bits = (g[:, :-1] > g[:, 1:]).astype(np.uint64).ravel()
    pows = 1 << np.arange(55, -1, -1, dtype=np.uint64)
    assert got[3] == int((bits * pows).sum())


def test_image_dhash_malformed_null_and_decoder(spark):
    """Wrong-size blobs and NULLs drop (no row, no crash); a decoder
    hook supplies the grid for non-raw formats."""
    import numpy as np

    from kafka_dbsync_spark.operators.multimodal import image_dhash

    rows = [(1, bytes(64)), (2, bytes(63)), (3, None)]
    got = image_dhash(_frames(spark, rows)).collect()
    assert [r["doc_id"] for r in got] == [1]

    def dec(b):  # "decode" a 1-byte seed into a gradient frame
        return np.arange(64, dtype=np.uint8).reshape(8, 8) + b[0]

    got2 = image_dhash(
        _frames(spark, [(9, bytes([5]))]), decoder=dec
    ).collect()
    assert got2[0]["dhash"] == 0  # increasing rows: no comparison true


def test_image_neardup_banding_completeness(spark):
    """EVERY pair within the verification radius (hamming <= 3) must
    surface — the pigeonhole guarantee of 4 bands — checked against a
    brute-force all-pairs Hamming ground truth over a deterministic
    corpus of frames + planted one/two-pixel twins."""
    import itertools

    import numpy as np

    from kafka_dbsync_spark.operators.dedup import image_neardup_pairs
    from kafka_dbsync_spark.operators.multimodal import image_dhash

    rows = []
    for i in range(40):
        base = bytearray(((i * 53 + j * 17 + 7) % 256) for j in range(64))
        rows.append((i, bytes(base)))
        if i % 4 == 0:                       # one-pixel twin
            t = bytearray(base)
            t[(i * 5) % 64] ^= 0xFF
            rows.append((1000 + i, bytes(t)))
        if i % 8 == 0:                       # two-pixel twin
            t2 = bytearray(base)
            t2[(i * 3) % 64] ^= 0x80
            t2[(i * 3 + 9) % 64] ^= 0x80
            rows.append((2000 + i, bytes(t2)))
    df = _frames(spark, rows)
    hashes = {
        r["doc_id"]: r["dhash"] for r in image_dhash(df).collect()
    }
    truth = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_neardup_pairs(df, "doc_id", "blob").collect()
    }
    assert got == truth and len(truth) >= 10


def test_image_neardup_rejects_bad_bands(spark):
    import pytest

    from kafka_dbsync_spark.operators.dedup import image_neardup_pairs

    with pytest.raises(ValueError, match="bands must divide"):
        image_neardup_pairs(
            _frames(spark, [(1, bytes(64))]), "doc_id", "blob", bands=5
        )


# ---------------------------------------------------------------------------
# Audio energy-contour fingerprint (audio_dhash / audio_neardup_pairs)
# ---------------------------------------------------------------------------
def test_audio_dhash_known_and_malformed(spark):
    """Monotone-louder clip -> rising energies -> all comparisons false
    (hash 0); monotone-quieter -> all true; short/NULL blobs drop; the
    numpy replay of an arbitrary clip matches bit-for-bit."""
    import numpy as np

    from kafka_dbsync_spark.operators.multimodal import audio_dhash

    need = 4 * 57
    louder = bytes(bytearray(min(128 + i // 4, 255) for i in range(need)))
    quieter = bytes(bytearray(max(128 + 70 - i // 4, 128) for i in range(need)))
    arb = bytes(bytearray((i * 89 + 31) % 256 for i in range(need)))
    rows = [(1, louder), (2, quieter), (3, arb), (4, arb[: need - 1]), (5, None)]
    got = {
        r["doc_id"]: r["ahash"]
        for r in audio_dhash(
            spark.createDataFrame(rows, "doc_id long, blob binary")
        ).collect()
    }
    assert set(got) == {1, 2, 3}          # short + NULL dropped
    assert got[1] == 0
    assert got[2] == (1 << 56) - 1
    x = np.frombuffer(arb, np.uint8).astype(np.int64) - 128
    e = (x * x).reshape(57, 4).sum(axis=1)
    bits = (e[:-1] > e[1:]).astype(np.uint64)
    pows = 1 << np.arange(55, -1, -1, dtype=np.uint64)
    assert got[3] == int((bits * pows).sum())


def test_audio_neardup_banding_completeness(spark):
    """Every pair within hamming <= 3 must surface (4-band pigeonhole),
    checked against brute-force all-pairs Hamming over deterministic
    clips + planted one-sample-damaged twins."""
    import itertools

    from kafka_dbsync_spark.operators.dedup import audio_neardup_pairs
    from kafka_dbsync_spark.operators.multimodal import audio_dhash

    need = 4 * 57
    rows = []
    for i in range(30):
        base = bytearray(((i * 71 + j * 13 + 5) % 256) for j in range(need))
        rows.append((i, bytes(base)))
        if i % 3 == 0:
            t = bytearray(base)
            t[(i * 11) % need] ^= 0x7F
            rows.append((1000 + i, bytes(t)))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    hashes = {r["doc_id"]: r["ahash"] for r in audio_dhash(df).collect()}
    truth = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a, b in itertools.combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in audio_neardup_pairs(df, "doc_id", "blob").collect()
    }
    assert got == truth and len(truth) >= 5

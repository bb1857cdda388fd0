"""Raw-frame multimodal operators: resize pixel math, frame fan-out,
malformed-input tolerance (operators/multimodal.py)."""

from __future__ import annotations

import pytest

from kafka_dbsync_spark.operators.multimodal import (
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

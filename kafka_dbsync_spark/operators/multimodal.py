"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata. The Spark-side
plumbing — schema, Arrow batch shape, partitioning — is real and tested.
For codecs, ``functions/media.py`` SHIPS a pure-numpy BMP/PNM decoder
(``decode_image`` for metadata, ``decode_image_array`` for pixels) that
plugs into the ``decoder=`` hook; compressed formats (JPEG/PNG/video)
need codec libraries not present in this container — pass your own
``decoder`` for those, or get the deterministic built-in metadata
extraction (byte length, md5 digest, magic bytes) that needs no codec.
``decode_stub`` remains the explicit raise-if-you-needed-a-codec
fallback.

``extract_media_meta`` runs as ``mapInPandas`` so each Arrow batch is
processed vectorized without materializing all blobs per executor at
once — the per-batch peak memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × blob size, which is
the knob to lower for 100 MB+ videos.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

from kafka_dbsync_spark.utils import ensure_parallelism


def decode_stub(blob: bytes) -> dict:
    """Placeholder for a real image/audio decoder. Raises — callers that
    want decoded features must supply a real ``decoder``."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this "
        "environment; pass decoder= to extract_media_meta"
    )


def extract_media_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    decoder: Callable[[bytes], dict] | None = None,
) -> DataFrame:
    """binary column → metadata rows (vectorized mapInPandas).

    Output: id, byte_len, content_md5, magic (hex of first 4 bytes).
    With ``decoder``, adds decoded width/height/duration-style fields the
    decoder returns under those keys (missing keys → None).
    """
    schema = (
        f"{id_col} long, byte_len long, content_md5 string, magic string"
        + (", width int, height int, duration double" if decoder else "")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": blobs.map(lambda b: len(b) if b is not None else 0),
                    "content_md5": blobs.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    # `is not None`, not truthiness: an empty blob is an
                    # empty file (magic=''), not a missing one (NULL)
                    "magic": blobs.map(
                        lambda b: bytes(b[:4]).hex() if b is not None else None
                    ),
                }
            )
            if decoder:
                decoded = blobs.map(lambda b: decoder(b) if b is not None else {})
                out["width"] = decoded.map(lambda d: d.get("width"))
                out["height"] = decoded.map(lambda d: d.get("height"))
                out["duration"] = decoded.map(lambda d: d.get("duration"))
            yield out

    return ensure_parallelism(df.select(id_col, blob_col)).mapInPandas(
        run, schema=schema
    )


def resize_raw_images(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    in_w: int = 8,
    in_h: int = 8,
    out_w: int = 4,
    out_h: int = 4,
    decoder: Callable[[bytes], "object"] | None = None,
) -> DataFrame:
    """Nearest-neighbor resize over RAW 8-bit single-channel frames —
    real pixel math (numpy stride indexing per Arrow batch), no codec
    needed: a blob is ``in_h × in_w`` bytes row-major. Compressed
    formats plug in via ``decoder(blob) → ndarray``; without one, a blob
    whose length isn't ``in_w·in_h`` yields NULL (malformed, not a
    crash — the dead-letter philosophy of the CDC side).

    Output: id, width, height, blob (resized). Memory per task is one
    Arrow batch of blobs, never the partition."""
    import numpy as np

    schema = f"{id_col} long, width int, height int, blob binary"
    # sample grid: out pixel (r, c) ← in pixel (r·in_h÷out_h, c·in_w÷out_w)
    yi = (np.arange(out_h) * in_h) // out_h
    xi = (np.arange(out_w) * in_w) // out_w

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rz(b):
            if b is None:
                return None
            if decoder is not None:
                a = np.asarray(decoder(bytes(b)), dtype=np.uint8)
            else:
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                if raw.size != in_w * in_h:
                    return None
                a = raw.reshape(in_h, in_w)
            return a[np.ix_(yi, xi)].tobytes()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": out_w,
                    "height": out_h,
                    "blob": pdf[blob_col].map(rz),
                }
            )

    return ensure_parallelism(df.select(id_col, blob_col)).mapInPandas(
        run, schema=schema
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    frame_bytes: int = 16,
    every_n: int = 2,
    max_frames: int | None = None,
    extractor: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """Frame sampling: one media row fans out to every ``every_n``-th
    frame as its own row — the batch-shape that matters for video at
    scale (downstream work parallelizes per FRAME, and per-task memory
    stays one Arrow batch of inputs plus its sampled frames, capped by
    ``max_frames``).

    The built-in frame model is a raw fixed-size-frame container
    (``frame_bytes`` per frame, trailing partial frame dropped) — real
    byte plumbing; codec containers plug in via
    ``extractor(blob) → list[bytes]``."""
    if every_n <= 0 or frame_bytes <= 0:
        raise ValueError("every_n and frame_bytes must be positive")
    schema = f"{id_col} long, frame_idx long, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                raw = bytes(b)
                if extractor is not None:
                    all_frames = extractor(raw)
                else:
                    all_frames = [
                        raw[o : o + frame_bytes]
                        for o in range(0, len(raw) - frame_bytes + 1, frame_bytes)
                    ]
                picked = all_frames[::every_n]
                if max_frames is not None:
                    picked = picked[:max_frames]
                for j, fr in enumerate(picked):
                    ids.append(rid)
                    idxs.append(j * every_n)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return ensure_parallelism(df.select(id_col, blob_col)).mapInPandas(
        run, schema=schema
    )


def image_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    in_w: int = 8,
    in_h: int = 8,
    decoder: Callable[[bytes], "object"] | None = None,
) -> DataFrame:
    """Difference hash (dHash) per image — the perceptual fingerprint
    the LAION-style multimodal dedup stacks use (aHash/dHash family):
    bit (r, c) = pixel(r, c) > pixel(r, c+1), row-major MSB-first, over
    a RAW 8-bit single-channel ``in_h × in_w`` frame, giving a
    ``in_h × (in_w-1)``-bit integer (56 bits at the 8×8 default — fits
    a signed long with room to spare, like ``simhash_bits``'s 60).
    Purely local integer comparisons: no mean, no float, so any engine
    replays it bit-exactly. Vectorized numpy over Arrow batches
    (``mapInPandas``, the shared multimodal batch shape); a real
    image's decode plugs in via ``decoder(blob) → ndarray`` exactly as
    in ``resize_raw_images``. Malformed blobs (wrong length) yield no
    row — the dead-letter philosophy, matching ``sample_frames``.

    Output: (id, dhash long). ``in_h * (in_w - 1)`` must be ≤ 62."""
    import numpy as np

    bits = in_h * (in_w - 1)
    if bits > 62:
        raise ValueError("in_h * (in_w - 1) must be <= 62 to fit a long")
    schema = f"{id_col} long, dhash long"
    pows = (1 << np.arange(bits - 1, -1, -1, dtype=np.uint64)).astype(
        np.uint64
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                if decoder is not None:
                    g = np.asarray(decoder(bytes(b)), dtype=np.uint8)
                    if g.shape != (in_h, in_w):
                        continue
                else:
                    raw = np.frombuffer(bytes(b), dtype=np.uint8)
                    if raw.size != in_w * in_h:
                        continue
                    g = raw.reshape(in_h, in_w)
                cmp = (g[:, :-1] > g[:, 1:]).astype(np.uint64).ravel()
                ids.append(rid)
                hashes.append(int((cmp * pows).sum()))
            yield pd.DataFrame(
                {id_col: ids, "dhash": pd.array(hashes, dtype="int64")}
            )

    return ensure_parallelism(df.select(id_col, blob_col)).mapInPandas(
        run, schema=schema
    )


def audio_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    window: int = 4,
    n_windows: int = 57,
) -> DataFrame:
    """Audio fingerprint: the energy-contour difference hash — bit k
    set iff window k's energy exceeds window k+1's, over the first
    ``n_windows`` fixed-size windows of 8-bit unsigned PCM (center
    128). The Chromaprint-family idea (fingerprint the CONTOUR, not
    the samples) in its exact-integer form: energies are sums of
    squared centered samples, comparisons are integer, so the hash is
    engine-portable bit for bit (unlike a spectral hash, whose FFT
    rounding is not). ``n_windows - 1`` bits, must be ≤ 62 to fit a
    signed long. Blobs shorter than ``window × n_windows`` bytes
    yield no row (truncated media is dead-lettered, not crashed —
    the shared multimodal policy). Vectorized numpy per Arrow batch.

    Output: (id, ahash long)."""
    import numpy as np

    bits = n_windows - 1
    if bits > 62:
        raise ValueError("n_windows - 1 must be <= 62 to fit a long")
    need = window * n_windows
    schema = f"{id_col} long, ahash long"
    pows = (1 << np.arange(bits - 1, -1, -1, dtype=np.uint64)).astype(
        np.uint64
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for rid, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None or len(b) < need:
                    continue
                x = (
                    np.frombuffer(bytes(b)[:need], dtype=np.uint8)
                    .astype(np.int64)
                    - 128
                )
                e = (x * x).reshape(n_windows, window).sum(axis=1)
                cmp = (e[:-1] > e[1:]).astype(np.uint64)
                ids.append(rid)
                hashes.append(int((cmp * pows).sum()))
            yield pd.DataFrame(
                {id_col: ids, "ahash": pd.array(hashes, dtype="int64")}
            )

    return ensure_parallelism(df.select(id_col, blob_col)).mapInPandas(
        run, schema=schema
    )


def audio_window_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    window: int = 256,
    rms_decimals: int = 4,
) -> DataFrame:
    """Audio-style DSP over an opaque binary column: treat the blob as
    8-bit unsigned PCM (center 128) and emit per-window RMS energy —
    the silence-trim / voice-activity primitive of an audio curation
    pipeline, and the audio twin of ``sample_frames``' row fan-out.

    Vectorized ``mapInPandas``: each Arrow batch decodes to numpy
    uint8, windows slice views (no copy), and the energy sum is exact
    integer math — only the final mean/sqrt are float (sqrt is IEEE
    correctly-rounded), so results are engine-portable. Output:
    (id, win_idx, n_samples, rms). Memory is bounded by the Arrow batch
    size exactly like the other multimodal operators."""
    import math

    schema = f"{id_col} long, win_idx long, n_samples long, rms double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, wins, ns, rms = [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                x = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
                for w in range(0, len(x), window):
                    seg = x[w : w + window] - 128
                    ids.append(rid)
                    wins.append(w // window)
                    ns.append(len(seg))
                    rms.append(
                        round(math.sqrt(int((seg * seg).sum()) / len(seg)),
                              rms_decimals)
                    )
            yield pd.DataFrame(
                {id_col: ids, "win_idx": wins, "n_samples": ns, "rms": rms}
            )

    from kafka_dbsync_spark.utils import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(run, schema)

"""Pure-numpy image codecs for the multimodal plumbing.

The container carries no PIL/imageio/ffmpeg, so the shipped decoder
covers the two classic uncompressed formats that need no codec library:

- **PNM** (``P5`` grayscale / ``P6`` RGB binary, maxval ≤ 255) — the
  simplest interchange format; header is ASCII with ``#`` comments.
- **BMP** (``BM`` magic, BITMAPINFOHEADER, uncompressed 8-bit indexed or
  24-bit BGR, bottom-up or top-down rows, 4-byte row padding).

``decode_image(blob)`` returns the metadata dict shape
``extract_media_meta`` expects (width/height [+ channels]);
``decode_image_array(blob)`` returns the pixel ndarray (H×W uint8 for
grayscale, H×W×3 for color) for ``resize_raw_images``. Anything
unsupported raises ValueError — the multimodal operators' callers decide
whether that dead-letters or fails the job. Richer codecs plug in via
the same ``decoder=`` hook these functions ship through.
"""

from __future__ import annotations

import struct

import numpy as np


def _pnm_header(blob: bytes) -> tuple[str, int, int, int, int]:
    """Parse a P5/P6 header → (magic, width, height, maxval, data_offset).

    PNM tokens are whitespace-separated; ``#`` starts a comment that runs
    to end-of-line. Exactly one whitespace byte separates the maxval from
    the pixel data."""
    magic = blob[:2].decode("ascii", errors="replace")
    if magic not in ("P5", "P6"):
        raise ValueError(f"not a binary PNM image (magic {magic!r})")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(blob):
            raise ValueError("truncated PNM header")
        c = blob[i : i + 1]
        if c == b"#":
            while i < len(blob) and blob[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(blob) and blob[j : j + 1].isdigit():
                j += 1
            tokens.append(int(blob[i:j]))
            i = j
        else:
            raise ValueError(f"bad PNM header byte {c!r}")
    if i >= len(blob) or not blob[i : i + 1].isspace():
        raise ValueError("PNM header not terminated by whitespace")
    w, h, maxval = tokens
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PNM maxval {maxval} (8-bit only)")
    return magic, w, h, maxval, i + 1


def _decode_pnm(blob: bytes) -> np.ndarray:
    magic, w, h, _, off = _pnm_header(blob)
    ch = 3 if magic == "P6" else 1
    need = w * h * ch
    if len(blob) < off + need:
        raise ValueError("truncated PNM pixel data")
    data = np.frombuffer(blob, dtype=np.uint8, count=need, offset=off)
    return data.reshape(h, w, 3) if ch == 3 else data.reshape(h, w)


def _decode_bmp(blob: bytes) -> np.ndarray:
    if blob[:2] != b"BM":
        raise ValueError("not a BMP image")
    if len(blob) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    h = abs(h_raw)
    bottom_up = h_raw > 0
    row_bytes = (w * (bpp // 8) + 3) & ~3  # rows pad to 4-byte boundaries
    need = row_bytes * h
    if len(blob) < data_off + need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=need, offset=data_off
    ).reshape(h, row_bytes)
    if bottom_up:
        rows = rows[::-1]
    if bpp == 8:
        return np.ascontiguousarray(rows[:, :w])
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return np.ascontiguousarray(bgr[:, :, ::-1])  # BGR on disk → RGB out


def decode_image_array(blob: bytes) -> np.ndarray:
    """Decode BMP/PNM bytes → uint8 ndarray (H×W gray or H×W×3 RGB)."""
    b = bytes(blob)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    return _decode_pnm(b)


def decode_image(blob: bytes) -> dict:
    """Decode BMP/PNM bytes → the ``extract_media_meta`` decoder contract:
    {"width": int, "height": int, "channels": int}."""
    a = decode_image_array(blob)
    h, w = a.shape[:2]
    return {"width": w, "height": h, "channels": 1 if a.ndim == 2 else a.shape[2]}


def encode_pgm(a: np.ndarray) -> bytes:
    """H×W uint8 → binary PGM (P5) bytes — the test/fixture encoder twin
    of the decoder above (also handy for writing decoded samples back
    out as a sanity artifact)."""
    a = np.asarray(a, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("PGM is single-channel; got shape " + str(a.shape))
    h, w = a.shape
    return f"P5 {w} {h} 255\n".encode("ascii") + a.tobytes()


def encode_ppm(a: np.ndarray) -> bytes:
    """H×W×3 uint8 → binary PPM (P6) bytes."""
    a = np.asarray(a, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("PPM is 3-channel; got shape " + str(a.shape))
    h, w, _ = a.shape
    return f"P6 {w} {h} 255\n".encode("ascii") + a.tobytes()


def encode_bmp_gray(a: np.ndarray) -> bytes:
    """H×W uint8 → 8-bit uncompressed BMP with a grayscale palette
    (bottom-up, 4-byte row padding) — exercises the BMP decode path."""
    a = np.asarray(a, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("expected a grayscale frame")
    h, w = a.shape
    row_bytes = (w + 3) & ~3
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    data_off = 14 + 40 + len(palette)
    padded = np.zeros((h, row_bytes), dtype=np.uint8)
    padded[:, :w] = a
    pixels = padded[::-1].tobytes()  # bottom-up
    file_size = data_off + len(pixels)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(pixels), 2835, 2835, 256, 0
    )
    return header + info + palette + pixels

"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns + typed metadata. The Spark-side
plumbing — schema, Arrow batch shape, partitioning — is real and tested;
the actual codec work (image decode, resampling, frame extraction) is
STUBBED because the codec libraries are not in this container: pass a
``decoder`` callable to plug one in, or get the deterministic built-in
metadata extraction (byte length, md5 digest, magic bytes) that needs no
codec.

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

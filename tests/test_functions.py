"""Scalar function surface: charset recovery (byte-exact BIG5 vectors),
IIDR timestamp normalization, text primitives."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_dbsync_spark.functions.charset import _recover_one, recover_legacy_charset
from kafka_dbsync_spark.functions.text import (
    detect_language,
    normalize_text,
    rolling_fingerprint,
    token_count,
)
from kafka_dbsync_spark.functions.timestamps import (
    iso8601_with_offset,
    normalize_iidr_timestamp,
)

# Golden vectors from the reference's big5-tests.sh:216-293 /
# LegacyCharsetTransform/README.md:149-153: BIG5 bytes ≥0x80 surface as
# U+FF00+byte halfwidth codepoints.
BIG5_VECTORS = [
    ("測試中文", "big5"),
    ("你好世界", "big5"),
    ("台北市", "big5"),
    ("ㄅㄆㄇㄈ", "big5"),
    ("ＡＢＣＤ１２３４", "big5"),
    ("、。「」【】", "big5"),
    ("Customer-台北", "big5"),
]


def garble(s: str, charset: str) -> str:
    """Reproduce the US7ASCII corruption: each raw byte ≥0x80 becomes the
    halfwidth codepoint 0xFF00+byte."""
    out = []
    for b in s.encode(charset):
        out.append(chr(0xFF00 + b) if b >= 0x80 else chr(b))
    return "".join(out)


def test_recover_one_vectors():
    for clean, cs in BIG5_VECTORS:
        assert _recover_one(garble(clean, cs), cs) == clean


def test_recover_passthrough():
    # pure ASCII and already-clean multibyte text must pass through
    assert _recover_one("hello world", "big5") == "hello world"
    assert _recover_one("already 測試 clean", "big5") == "already 測試 clean"
    assert _recover_one(None, "big5") is None


def test_recover_udf(spark):
    rows = [(garble(c, cs),) for c, cs in BIG5_VECTORS]
    df = spark.createDataFrame(rows, "garbled string")
    out = df.select(recover_legacy_charset("garbled", "big5").alias("clean")).collect()
    assert [r["clean"] for r in out] == [c for c, _ in BIG5_VECTORS]


def test_gbk_recovery(spark):
    clean = "数据同步"
    assert _recover_one(garble(clean, "gbk"), "gbk") == clean


def test_normalize_iidr_timestamp_fraction_and_zone(spark):
    df = spark.createDataFrame(
        [
            ("2024-03-01 10:00:00.123456789012",),
            ("2024-03-01 10:00:00",),
            ("2024-03-01 10:00:00.5",),
        ],
        "ts string",
    )
    out = df.select(
        F.date_format(
            normalize_iidr_timestamp("ts", "Asia/Taipei"), "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("utc")
    ).collect()
    # Taipei is UTC+8; fraction truncated 12→6, short fractions padded
    assert out[0]["utc"] == "2024-03-01 02:00:00.123456"
    assert out[1]["utc"] == "2024-03-01 02:00:00.000000"
    assert out[2]["utc"] == "2024-03-01 02:00:00.500000"


def test_normalize_iidr_timestamp_offset_zone(spark):
    df = spark.createDataFrame([("2024-03-01 10:00:00.000000000000",)], "ts string")
    out = df.select(
        F.date_format(
            normalize_iidr_timestamp("ts", "+08:00"), "yyyy-MM-dd HH:mm:ss"
        ).alias("utc")
    ).head()
    assert out["utc"] == "2024-03-01 02:00:00"


def test_iso8601_with_offset(spark):
    df = spark.createDataFrame([("2024-03-01 02:00:00",)], "s string")
    out = df.select(
        iso8601_with_offset(F.col("s").cast("timestamp"), "Asia/Taipei").alias("iso")
    ).head()
    assert out["iso"] == "2024-03-01T10:00:00.000+08:00"


def test_text_primitives(spark):
    df = spark.createDataFrame(
        [("Hello,  World! 123",), ("",), ("!!!",), ("the the the",)], "text string"
    )
    rows = df.select(
        normalize_text("text").alias("norm"),
        token_count("text").alias("n"),
        rolling_fingerprint("text").alias("fp"),
        detect_language("text").alias("lang"),
    ).collect()
    assert rows[0]["norm"] == "hello world 123" and rows[0]["n"] == 3
    assert rows[1]["norm"] == "" and rows[1]["n"] == 0
    assert rows[2]["norm"] == "" and rows[2]["n"] == 0
    assert rows[3]["lang"] == "en"
    assert rows[1]["fp"] == rows[2]["fp"]  # both normalize to empty
    assert rows[0]["fp"] != rows[3]["fp"]


def test_chunk_documents(spark):
    from kafka_dbsync_spark.functions.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, words), (2, "short doc"), (3, ""), (4, "!!!")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=4, overlap=1)  # step 3
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["n_tokens"], r["chunk_text"]) for r in out.collect())
    )
    # doc 1: starts 0,3,6,9 — last chunk short, not padded
    assert [r for r in rows if r[0] == 1] == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w3 w4 w5 w6"),  # 1-token overlap with the previous
        (1, 2, 4, "w6 w7 w8 w9"),
        (1, 3, 1, "w9"),
    ]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 2, "short doc")]
    # empty / punctuation-only docs produce no chunks
    assert not [r for r in rows if r[0] in (3, 4)]


def test_chunk_documents_rejects_bad_overlap(spark):
    from kafka_dbsync_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_repetition_metrics(spark):
    import pyspark.sql.functions as F

    from kafka_dbsync_spark.functions.text import repetition_metrics, tokens

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),            # one token repeated
            (2, "all tokens here are distinct"),   # no repetition
            (3, ""),                               # empty
            (4, "x y x y x y"),                    # dominant 2-gram "x y"
        ],
        "doc_id long, text string",
    )
    d = docs.withColumn("__toks", tokens("text"))
    m = repetition_metrics("text")
    rows = {
        r["doc_id"]: r
        for r in d.select("doc_id", *[v.alias(k) for k, v in m.items()]).collect()
    }
    assert rows[1]["dup_token_bp"] == 7500  # 1 - 1/4
    assert rows[1]["top2_count"] == 3 and rows[1]["top2_count"] == 3
    assert rows[2]["dup_token_bp"] == 0
    assert rows[3]["n_tokens"] == 1 and rows[3]["top2_count"] == 0  # split('')==['']
    # "x y": 3 occurrences of 3 chars over 11 chars
    assert rows[4]["top2_count"] == 3
    assert rows[4]["top2_bp"] == int(3 * 3 / 11 * 10000)


def test_pii_scrub(spark):
    from kafka_dbsync_spark.functions.text import with_pii_scrubbed

    docs = spark.createDataFrame(
        [
            (1, "mail a@b.io and see https://x.io/a@b.io now"),
            (2, "call 555-123-4567 or +44 201-555-0199"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in with_pii_scrubbed(docs, "text").collect()}
    # the email inside the URL is counted/replaced as URL, not email
    assert rows[1]["n_urls"] == 1 and rows[1]["n_emails"] == 1
    assert rows[1]["scrubbed"] == "mail <EMAIL> and see <URL> now"
    assert rows[2]["n_phones"] == 2
    assert rows[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert rows[3]["scrubbed"] == "clean text only"
    assert rows[3]["n_urls"] == rows[3]["n_emails"] == rows[3]["n_phones"] == 0

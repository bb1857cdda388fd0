"""Persisted BM25 inverted index: build once, serve queries forever.

The serve twin of ``operators/corpus.py::bm25_topk`` — the missing
member of the engine's ``*_served`` family (bigram/trigram LMs,
Moore-Lewis, DSIR, NB classifier, IVF-PQ all have one). A production
search tier never re-scans the corpus per query: Lucene/Elasticsearch
build the postings ONCE and answer every query from the index. Here
the index is the classic search-engine layout re-expressed as
partition-pruned parquet:

    gen-{fingerprint}/postings  (term, doc_id, tf, dl)
                                partitioned by bucket = crc32(term) % 64
    gen-{fingerprint}/dfs       (term, df), same bucket partitioning
    _COMPLETE                   marker: corpus stats (n docs, Σdl),
                                fingerprint, live gen name

Document length is DENORMALIZED into each posting row (the Lucene
"norms live next to the postings" trick), so scoring needs NO join
against a doc-length table: a query reads only the bucket directories
of its terms (partition pruning — the 100 TB story: a 3-term query
touches 3/64ths of the postings *directory tree*, and the term
predicate then prunes row groups within them), pivots the ≤|q| matching
rows per doc back to tf columns, and evaluates the IDENTICAL
left-associative Okapi expression as the inline operator with the
marker's corpus stats folded in as literals. Build/serve are
arithmetic-identical by construction, so the served query reuses
``bm25_search``'s DuckDB oracle unchanged.

Publish / staleness / concurrency discipline is ``lm_index.py``'s
verbatim (``publish_generation`` immutable generation dirs, atomic
staging rename, marker-flips-last; ``lm_model_is_current`` metadata-
only staleness on the happy path). The fingerprint is the plain
corpus fingerprint — a BM25 index depends only on (id, text).

Scale notes: the build shuffles once on (doc, term) for term
frequencies (map-side combined; tf collapses before the exchange) and
once on term for document frequencies; corpus text never shuffles
(only tokens/hashes move). N and Σdl are scalar marker metadata — the
serve path runs ZERO corpus-wide jobs.
"""

from __future__ import annotations

import json
import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_dbsync_spark.functions.text import normalize_text
from kafka_dbsync_spark.operators.lm_index import (
    _MARKER,
    _gen_name,
    corpus_fingerprint,
    lm_model_is_current,
    publish_generation,
)

#: number of term-hash partition buckets in the postings layout. A
#: query for q terms reads at most q of these directories; 64 keeps
#: directory counts trivial at fixture scale while the layout (and the
#: pruning test) is the one you'd ship with 4096 buckets at 100 TB.
N_BUCKETS = 64


def term_bucket_py(term: str) -> int:
    """Python mirror of the Spark-side bucket expression — zlib.crc32
    and Spark's ``F.crc32`` share the CRC-32 polynomial and both yield
    the unsigned value, so driver-side pruning and build-side
    partitioning agree bit-for-bit."""
    return zlib.crc32(term.encode("utf-8")) % N_BUCKETS


def _bm25_tokens(text_col: str):
    """The EXACT tokenizer of bm25_topk (operators/corpus.py): NULL or
    normalized-empty text becomes an empty array so dl/tf are clean 0s
    — build and inline score must count identical tokens."""
    norm = normalize_text(text_col)
    return F.when(
        norm.isNull() | (norm == ""), F.array().cast("array<string>")
    ).otherwise(F.split(norm, " "))


def build_bm25_index(
    spark: SparkSession,
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
    src_path: str | None = None,
) -> None:
    """One tokenize pass → postings + dfs parquet under an immutable
    generation dir, corpus stats (N, Σdl — ALL docs, including
    token-empty ones, exactly as bm25_topk's scalar aggregate counts
    them) in the marker. Published with the shared atomic-generation
    protocol (``lm_index.publish_generation``)."""
    from kafka_dbsync_spark.operators.cache_validation import files_signature

    tok = _bm25_tokens(text_col)
    per_doc = docs.select(F.col(id_col), F.size(tok).alias("dl"), tok.alias("__t"))
    fp = fingerprint or corpus_fingerprint(docs, id_col, text_col)
    gen = _gen_name(fp)

    def write_stage(stage: str) -> None:
        postings = (
            per_doc.select(id_col, "dl", F.explode("__t").alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
            .withColumn(
                "bucket", F.pmod(F.crc32(F.col("term")), F.lit(N_BUCKETS))
            )
        )
        postings.write.partitionBy("bucket").mode("overwrite").parquet(
            f"{stage}/postings"
        )
        # df folds from the published postings, not a second corpus
        # pass: one row per (term, doc) is exactly what postings holds
        spark.read.parquet(f"{stage}/postings").groupBy("bucket", "term").agg(
            F.count(F.lit(1)).alias("df")
        ).write.partitionBy("bucket").mode("overwrite").parquet(f"{stage}/dfs")

    st = per_doc.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sumdl")
    ).collect()[0]
    rec: dict = {
        "fingerprint": fp,
        "n": int(st["n"]),
        "sumdl": int(st["sumdl"] or 0),
    }
    if src_path is not None:
        rec["src_sig"] = files_signature(src_path)
    publish_generation(path, gen, write_stage, rec)


def bm25_index_is_current(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
    src_path: str | None = None,
    force_exact: bool = False,
) -> bool:
    """True iff the persisted index is servable AND built on the
    current corpus — the shared staleness ladder
    (``lm_model_is_current``): metadata-only with ``src_path`` on the
    happy path, exact corpus fingerprint only on metadata miss."""
    return lm_model_is_current(
        docs,
        path,
        id_col,
        text_col,
        fingerprint=fingerprint,
        src_path=src_path,
        force_exact=force_exact,
    )


def bm25_search_served(
    spark: SparkSession,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-``k`` against the FROZEN index: reads only the
    query terms' bucket partitions, pivots matching postings back to
    per-term tf columns, and evaluates bm25_topk's expression tree —
    same left-assoc term order, same operator shapes — with the
    marker's N/Σdl and the index's per-term df folded in as long
    literals (long→double casts, exactly the inline columns' casts).
    Docs matching no query term have no posting row and never surface,
    mirroring the inline ``any_match > 0`` filter. Output:
    (rank, id, score_r), bit-compatible with bm25_topk."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            meta = json.load(f)
    except (OSError, ValueError) as e:
        raise ValueError(
            f"no complete BM25 index at {path}; build_bm25_index first."
        ) from e
    gen = meta.get("gen")
    gen_dir = os.path.join(path, gen) if gen else None
    if not gen_dir or not os.path.isdir(gen_dir):
        raise ValueError(
            f"BM25 index marker at {path} references missing generation "
            f"{gen!r}; rebuild with build_bm25_index."
        )
    n, sumdl = int(meta["n"]), int(meta["sumdl"])
    buckets = sorted({term_bucket_py(t) for t in query_terms})
    bucket_f = F.col("bucket").isin(buckets)
    term_f = F.col("term").isin(list(query_terms))
    # per-term df: vocab-filtered read, ≤|q| rows cross the driver — a
    # term the corpus never saw has no row and prices as df = 0, the
    # same value the inline scalar aggregate produces for it
    dfs = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(f"{gen_dir}/dfs")
        .filter(bucket_f & term_f)
        .collect()
    }
    post = spark.read.parquet(f"{gen_dir}/postings").filter(bucket_f & term_f)
    pivoted = post.groupBy(F.col(id_col)).agg(
        F.max("dl").alias("dl"),
        *[
            F.coalesce(
                F.max(F.when(F.col("term") == t, F.col("tf"))), F.lit(0)
            ).alias(f"__tf{i}")
            for i, t in enumerate(query_terms)
        ],
    )
    # literal folding mirrors bm25_topk: k1+1 and 1-b fold in Python
    # (exact for the default 1.2/0.75); N/Σdl/df enter as LONG literals
    # cast to double so every downstream IEEE op matches the inline
    # column expressions bit-for-bit
    k1p1, one_minus_b = k1 + 1.0, 1.0 - b
    avgdl = F.lit(sumdl).cast("double") / F.lit(n).cast("double")
    score = None
    for i, t in enumerate(query_terms):
        tf = F.col(f"__tf{i}").cast("double")
        dfc = F.lit(dfs.get(t, 0)).cast("double")
        idf = F.log(
            (F.lit(n).cast("double") - dfc + F.lit(0.5))
            / (dfc + F.lit(0.5))
            + F.lit(1.0)
        )
        term_score = (
            idf
            * (tf * F.lit(k1p1))
            / (
                tf
                + F.lit(k1)
                * (
                    F.lit(one_minus_b)
                    + F.lit(b) * (F.col("dl").cast("double") / avgdl)
                )
            )
        )
        score = term_score if score is None else score + term_score
    from pyspark.sql import Window

    top = (
        pivoted.select(F.col(id_col), F.round(score, 4).alias("score_r"))
        .orderBy(F.col("score_r").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score_r").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "score_r"
    )

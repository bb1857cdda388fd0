"""Corpus-level text operators for training-data pipelines.

Three operators a pretraining data pipeline runs at full-corpus scale:

- ``tfidf_top_terms`` — distinctive terms per document. IDF uses the
  *rational* form ``(N + 1) / (df + 1)`` instead of its logarithm: the
  ranking it induces per document is identical (log is monotone) while
  every arithmetic op stays IEEE-correctly-rounded (+,*,/ only), so
  scores are bit-identical across engines — a transcendental ``ln`` is
  not (JVM StrictMath vs libm can differ in the last ulp).
- ``contaminated_docs`` — benchmark decontamination: flag corpus
  documents sharing any word-k-gram shingle with a (small) benchmark
  set. The benchmark side is broadcast — the real-world shape: eval
  suites are MBs while the corpus is TBs, so the join is map-side with
  zero shuffle of the corpus.
- ``pack_sequences`` — GPT-style concat-and-split packing plan: document
  token spans laid head-to-tail in id order within hash buckets, split
  into fixed context windows. Pure integer window arithmetic (exact on
  any engine); buckets bound the window partition so no global sort
  exists at any scale.

Scale notes: tfidf shuffles on (doc, term) then term then doc — all
uniform keys with map-side partial aggregation; decontamination shuffles
nothing on the corpus side; packing shuffles once on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_dbsync_spark.functions.text import token_count, tokens
from kafka_dbsync_spark.operators.dedup import with_shingles


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by tf·(N+1)/(df+1), ties broken by
    term. Output: (id, rank, term, tf, df, score_r)."""
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = F.broadcast(docs.agg(F.count(F.lit(1)).alias("__n")))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(n)
        .withColumn(
            "score_r",
            F.round(
                F.col("tf").cast("double")
                * (F.col("__n") + F.lit(1.0))
                / (F.col("df") + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score_r").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", "score_r")
    )


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Corpus documents sharing ≥1 word-``k``-gram shingle with any
    benchmark document. Output: (id, n_shared) — the count of distinct
    shared shingles, the standard n-gram-overlap decontamination test.

    ``benchmark`` rows present in ``docs`` (same id) are not flagged
    against themselves — exclude them upstream if ids overlap."""
    corpus_sh = with_shingles(docs, text_col, k=k).select(
        F.col(id_col), F.explode(F.array_distinct("shingles")).alias("__g")
    )
    bench_sh = (
        with_shingles(benchmark, text_col, k=k)
        .select(F.explode(F.array_distinct("shingles")).alias("__g"))
        .distinct()
    )
    return (
        corpus_sh.join(F.broadcast(bench_sh), "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ctx_len: int = 256,
    buckets: int = 8,
) -> DataFrame:
    """Concat-and-split packing plan: docs ordered by id within
    ``hash bucket = id % buckets``, token spans packed head-to-tail and
    cut into ``ctx_len``-token windows. Output per doc: its bucket, token
    count, start offset in the bucket stream, and the first/last context
    window (bin) it lands in — a doc may straddle bins (spill), which is
    exactly how packed pretraining batches are assembled."""
    d = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(buckets)).alias("bucket"),
        token_count(text_col).alias("n_tokens"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    d = d.withColumn("__cum", F.sum("n_tokens").over(w))
    start = F.col("__cum") - F.col("n_tokens")
    return d.select(
        id_col,
        "bucket",
        "n_tokens",
        start.alias("start_off"),
        F.expr(f"CAST((__cum - n_tokens) div {ctx_len} AS BIGINT)").alias(
            "start_bin"
        ),
        F.expr(
            f"CAST(greatest(__cum - 1, __cum - n_tokens) div {ctx_len} AS BIGINT)"
        ).alias("end_bin"),
    )

"""Text-analysis primitives for the training-data pipeline operators.

All pure built-in column expressions (WholeStageCodegen-friendly): these
run over the `documents` table at 100 TB scale, so nothing here drops to
Python. Semantics are deliberately simple + deterministic so a SQL oracle
can reproduce them bit-for-bit (see tools/oracle_fragments.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword lang-id
#: heuristic. Order matters: ties break by this order.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4"),
}

#: stopwords for the quality score (English-centric, like common
#: quality-filter recipes)
QUALITY_STOPWORDS = ("the", "be", "to", "of", "and", "a", "in", "that", "have", "it")

FNV_MOD = 1_000_000_007
FNV_BASE = 31


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: Column | str) -> Column:
    """lower → collapse non-alphanumeric runs to single spaces → trim."""
    return F.trim(F.regexp_replace(F.lower(_col(c)), "[^a-z0-9]+", " "))


def tokens(c: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(c), " ")


def token_count(c: Column | str) -> Column:
    norm = normalize_text(c)
    return F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))


def chunk_documents(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
):
    """Split documents into overlapping fixed-token-count chunks — the
    standard context-window prep for LLM training/embedding pipelines.

    Chunk i covers tokens [i·step, i·step + chunk_tokens) with
    step = chunk_tokens − overlap; the last chunk is short rather than
    padded. Fully narrow (sequence + slice on a materialized token
    array): no shuffle, no Python, scales linearly. Documents whose
    normalized text is empty yield no chunks."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    step = chunk_tokens - overlap
    d = df.withColumn("__toks", tokens(text_col)).withColumn(
        "__n",
        F.when(normalize_text(text_col) == "", F.lit(0)).otherwise(
            F.size(F.col("__toks"))
        ),
    )
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(step))
    chunked = d.select(
        F.col(id_col),
        F.col("__toks"),
        F.posexplode(F.when(F.col("__n") > 0, starts)).alias("chunk_idx", "__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return chunked.select(
        id_col,
        "chunk_idx",
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def word_regex_count(c: Column | str) -> Column:
    """BPE-ish unit count: letter runs, single digits, single punctuation."""
    return F.regexp_count(_col(c), F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"))


def punct_count(c: Column | str) -> Column:
    return F.regexp_count(_col(c), F.lit(r"[^A-Za-z0-9\s]"))


def stopword_count(c: Column | str, stopwords=QUALITY_STOPWORDS) -> Column:
    toks = tokens(c)
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_scores(c: Column | str, toks: Column | None = None) -> dict[str, Column]:
    """Per-language stopword-hit counts (the lang-id heuristic). Pass a
    materialized token column via ``toks`` to tokenize once per row."""
    toks = tokens(c) if toks is None else toks
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def detect_language(c: Column | str, toks: Column | None = None) -> Column:
    """argmax over lang_scores with declaration-order tie-break; 'und' if
    no stopword hits at all.

    Implemented as array_max over (score, -declaration_index, lang)
    structs — each score expression appears exactly once in the plan (a
    when-chain would duplicate them exponentially)."""
    scores = lang_scores(c, toks)
    entries = [
        F.struct(
            s.alias("s"), F.lit(-idx).alias("prio"), F.lit(lang).alias("lang")
        )
        for idx, (lang, s) in enumerate(scores.items())
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["s"] == 0, F.lit("und")).otherwise(best["lang"])


def rolling_fingerprint(c: Column | str) -> Column:
    """Polynomial rolling hash (base 31, mod 1e9+7) over the normalized
    text's characters — the document fingerprint."""
    norm = normalize_text(c)
    chars = F.split(norm, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FNV_BASE + F.ascii(ch)) % FNV_MOD,
    )


def quality_score(c: Column | str) -> Column:
    """Composite quality score ∈ [0,1]: rewards mid-length docs, low
    punctuation density, presence of stopwords. Deterministic formula:

        score = 0.4*min(n_tokens,100)/100
              + 0.3*(1 - min(punct_ratio*5, 1))
              + 0.3*min(stopword_ratio*10, 1)
    """
    n_tok = token_count(c).cast("double")
    n_char = F.length(_col(c)).cast("double")
    punct_ratio = F.when(n_char > 0, punct_count(c) / n_char).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, stopword_count(c) / n_tok).otherwise(F.lit(0.0))
    return (
        F.least(n_tok, F.lit(100.0)) / 100.0 * 0.4
        + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 10.0, F.lit(1.0)) * 0.3
    )


def top_bigram(toks_col: Column) -> tuple[Column, Column]:
    """(count, gram) of the most frequent word 2-gram in a MATERIALIZED
    token array column (ties broken toward the lexicographically largest
    gram, so the result is deterministic and engine-portable).

    Single O(n log n) pass: sort the gram array, then fold it counting
    runs with a struct accumulator — no per-distinct-gram rescan (the
    naive transform(distinct, g -> count) is O(n²) per doc) and no
    explode/shuffle.
    """
    grams = F.when(
        F.size(toks_col) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks_col, (i + 1).cast("int")),
                F.element_at(toks_col, (i + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("bg"),
    )

    def step(acc, g):
        new_run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        upd = (new_run > acc["best"]) | ((new_run == acc["best"]) & (g > acc["bg"]))
        return F.struct(
            g.alias("prev"),
            new_run.alias("run"),
            F.when(upd, new_run).otherwise(acc["best"]).alias("best"),
            F.when(upd, g).otherwise(acc["bg"]).alias("bg"),
        )

    r = F.aggregate(F.array_sort(grams), init, step)
    return r["best"], r["bg"]


def repetition_metrics(toks_col: Column, text_col: Column | str) -> dict[str, Column]:
    """Gopher-style repetition signals over a MATERIALIZED token array:

    - ``dup_token_bp``: fraction of tokens that repeat an earlier token
      (1 - distinct/total; 0 for empty docs), in floor basis points
    - ``top2_count``: occurrences of the most frequent word 2-gram
    - ``top2_bp``: fraction of the normalized text's characters covered
      by occurrences of that 2-gram (count·len(gram)/chars — the Gopher
      "fraction of characters in most common n-gram" signal), in floor
      basis points

    All narrow array expressions; ratios are floor-scaled basis points —
    floor on bit-identical doubles is engine-portable where round-half
    isn't (same convention as quality_score).
    """
    n = F.size(toks_col)
    dup_bp = F.when(
        n > 0,
        F.floor(
            (F.lit(1.0) - F.size(F.array_distinct(toks_col)) / n.cast("double"))
            * 10000
        ),
    ).otherwise(F.lit(0).cast("long"))
    best, bg = top_bigram(toks_col)
    chars = F.greatest(F.length(normalize_text(text_col)), F.lit(1)).cast("double")
    top2_bp = F.floor(best * F.length(bg).cast("double") / chars * 10000)
    return {
        "n_tokens": n.cast("long"),
        "dup_token_bp": dup_bp,
        "top2_count": best,
        "top2_bp": top2_bp,
    }


# PII patterns: RE2-safe subset (no lookaround/backrefs) so the Java
# regex engine (Spark) and RE2 (DuckDB oracle) match identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"(\+?[0-9]{1,3}[ -])?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def with_pii_scrubbed(df, text_col: str):
    """Count and redact emails / URLs / phone numbers.

    Adds ``n_urls`` / ``n_emails`` / ``n_phones`` and ``scrubbed``
    (matches replaced by ``<URL>`` / ``<EMAIL>`` / ``<PHONE>``).
    Scrubbing is staged URL → email → phone and each count is taken on
    the previous stage's output, so an address embedded in a URL is
    counted once, as a URL. The stages are materialized as their own
    columns — each regexp_replace runs once per row even though two
    downstream expressions reference it (a single-projection expression
    chain would re-evaluate the whole prefix per output column). All
    regexes run in the codegen'd JVM regexp functions — no UDFs.
    """
    col = _col(text_col)
    d = df.withColumn("__no_url", F.regexp_replace(col, URL_RE, "<URL>"))
    d = d.withColumn(
        "__no_email", F.regexp_replace(F.col("__no_url"), EMAIL_RE, "<EMAIL>")
    )
    return (
        d.withColumn("n_urls", F.regexp_count(col, F.lit(URL_RE)).cast("long"))
        .withColumn(
            "n_emails",
            F.regexp_count(F.col("__no_url"), F.lit(EMAIL_RE)).cast("long"),
        )
        .withColumn(
            "n_phones",
            F.regexp_count(F.col("__no_email"), F.lit(PHONE_RE)).cast("long"),
        )
        .withColumn(
            "scrubbed", F.regexp_replace(F.col("__no_email"), PHONE_RE, "<PHONE>")
        )
        .drop("__no_url", "__no_email")
    )

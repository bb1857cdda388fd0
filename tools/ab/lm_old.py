"""Frozen pre-r14 LM-family operators for interleaved A/B (extracted
from git HEAD). Not part of the package."""
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from kafka_dbsync_spark.functions.text import tokens
from kafka_dbsync_spark.operators.corpus import (
    doc_bigrams, doc_trigrams, _decimal_log_sum, nb_score_tables,
)


def bigram_lm_perplexity_OLD(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data"): score every document by its perplexity under an n-gram LM,
    so downstream filtering can keep the low-perplexity (fluent) head.
    CCNet uses a pretrained KenLM; with no model artifacts in the
    container the LM here is an add-one-smoothed bigram model trained on
    the corpus itself — the same scoring shape (the model is an input, a
    swap-in at deployment).

    Determinism contract: p(w2|w1) = (c12 + 1) / (c1 + V) is an exact
    integer ratio; ln(p) is rounded to 6 decimals and summed as DECIMAL
    (order-independent), and only the final exp(-sum/n) is a rounded
    double.

    Scale: the model is VOCAB-sized (unigram + bigram count tables), not
    corpus-sized; the corpus-side cost is one map-side-combined shuffle
    of per-doc bigram counts joined against the model — the model tables
    broadcast when small, shuffle-join when not. No Python UDFs.

    ``group_col`` trains a SEPARATE model per group (CCNet's actual
    per-language design — Wenzek et al. train one KenLM per language):
    every model key gains the group column (counts, vocab, smoothing
    all per group), at the same vocab-sized cost summed over groups.
    Documents are assumed to belong to one group (the column rides the
    doc rows).

    Returns (id_col, n_bigrams, ppl) — plus ``group_col`` when given.
    """
    gcols = [group_col] if group_col else []
    grams = doc_bigrams(docs, id_col, text_col, extra_cols=tuple(gcols))
    # per-doc bigram multiplicity first: compresses repeats before joins.
    # c12 folds doc_grams' k (its exchange is REUSED — ReusedExchange in
    # the static plan); c1 aggregates the gram stream directly, because
    # deriving it from c12 breaks exchange reuse (different column
    # pruning) and re-runs both upstream shuffles in that branch.
    doc_grams = grams.groupBy(id_col, *gcols, "w1", "w2").agg(
        F.count("*").alias("k")
    )
    c12 = doc_grams.groupBy(*gcols, "w1", "w2").agg(F.sum("k").alias("n12"))
    c1 = grams.groupBy(*gcols, "w1").agg(F.count("*").alias("n1"))
    if group_col:
        vocab = (
            docs.select(group_col, F.explode(tokens(text_col)).alias("tok"))
            .groupBy(group_col)
            .agg(F.countDistinct("tok").alias("V"))
        )
        with_model = (
            doc_grams.join(c12, [*gcols, "w1", "w2"])
            .join(c1, [*gcols, "w1"])
            .join(F.broadcast(vocab), group_col)
        )
    else:
        vocab = (
            docs.select(F.explode(tokens(text_col)).alias("tok"))
            .agg(F.countDistinct("tok").alias("V"))
        )
        with_model = (
            doc_grams.join(c12, ["w1", "w2"])
            .join(c1, "w1")
            .crossJoin(F.broadcast(vocab))
        )
    scored = with_model.select(
        id_col,
        *gcols,
        "k",
        _decimal_log_sum(
            (F.col("n12") + 1).cast("double") / (F.col("n1") + F.col("V")).cast("double")
        ).alias("logp"),
    )
    per_doc = scored.groupBy(id_col, *gcols).agg(
        F.sum("k").alias("n_bigrams"),
        F.sum(F.col("logp") * F.col("k")).alias("sum_logp"),
    )
    ppl = F.round(
        F.exp(-(F.col("sum_logp").cast("double")) / F.col("n_bigrams").cast("double")), 4
    )
    return per_doc.select(id_col, *gcols, "n_bigrams", ppl.alias("ppl"))


def trigram_backoff_perplexity_OLD(
    train_docs: DataFrame,
    score_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Stupid-backoff trigram LM scoring (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the backoff designed FOR
    distributed count-table LMs: no discounting pass, just relative
    frequencies and a fixed backoff factor, which is why it MapReduces
    and why it Sparks). Score of a trigram under the model trained on
    ``train_docs``:

        s(w3 | w1 w2) = n123 / n12                     if n123 > 0
                      = alpha * n23 / n2               elif n23 > 0
                      = alpha^2 * (n3 + 1) / (N + V)   otherwise

    (the last line is an add-one unigram floor so out-of-vocabulary
    tokens score finitely). Per-doc score is the perplexity-style
    exp(-mean log s) over the doc's trigrams, so low = fluent-under-
    the-model, same polarity as ``bigram_lm_perplexity``.

    Train/score are SEPARATE inputs — the frozen-model deployment shape
    (train on yesterday's corpus, score today's): unseen trigrams
    actually back off, which never happens when a model scores its own
    training set.

    Determinism contract: all counts are exact integers; each CASE arm
    is a fixed left-associated chain of IEEE-correctly-rounded * and /
    (alpha enters as the same literal on both engines), ln is rounded
    to 6 decimals and summed as DECIMAL per doc — order-independent,
    bit-identical across engines.

    Scale: the model is three vocab-sized count tables (trigram, bigram,
    unigram) + one 1-row total; the score-side cost is one map-side-
    combined per-doc trigram aggregate and five model joins that the
    planner broadcasts while the tables fit (shuffle-hash beyond).
    Nothing corpus-sized joins corpus-sized; no Python UDFs.

    Returns (id_col, n_trigrams, ppl).
    """
    tri = doc_trigrams(train_docs, id_col, text_col)
    c123 = tri.groupBy("w1", "w2", "w3").agg(F.count("*").alias("n123"))
    big = doc_bigrams(train_docs, id_col, text_col)
    cb = big.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    uni = train_docs.select(F.explode(tokens(text_col)).alias("w"))
    cu = uni.groupBy("w").agg(F.count("*").alias("n"))
    # N and V fold from the vocab-sized count table, not the corpus-sized
    # token stream — one fewer full-corpus pass in the model lineage
    tot = cu.agg(F.sum("n").alias("N"), F.count("*").alias("V"))

    dg = (
        doc_trigrams(score_docs, id_col, text_col)
        .groupBy(id_col, "w1", "w2", "w3")
        .agg(F.count("*").alias("k"))
    )
    ctx = cb.select("w1", "w2", F.col("n").alias("n12"))
    b23 = cb.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("n").alias("n23")
    )
    u2 = cu.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    u3 = cu.select(F.col("w").alias("w3"), F.col("n").alias("n3"))
    joined = (
        dg.join(c123, ["w1", "w2", "w3"], "left")
        .join(ctx, ["w1", "w2"], "left")
        .join(b23, ["w2", "w3"], "left")
        .join(u2, "w2", "left")
        .join(u3, "w3", "left")
        .crossJoin(F.broadcast(tot))
    )
    # n123 non-null implies n12 non-null (a train trigram at position i
    # contributes its context bigram at i), and n23 non-null implies n2
    # non-null — the CASE arms never divide by NULL.
    p = (
        F.when(
            F.col("n123").isNotNull(),
            F.col("n123").cast("double") / F.col("n12").cast("double"),
        )
        .when(
            F.col("n23").isNotNull(),
            F.lit(alpha) * F.col("n23").cast("double") / F.col("n2").cast("double"),
        )
        .otherwise(
            F.lit(alpha)
            * F.lit(alpha)
            * (F.coalesce(F.col("n3"), F.lit(0)) + 1).cast("double")
            / (F.col("N") + F.col("V")).cast("double")
        )
    )
    scored = joined.select(
        id_col, "k", _decimal_log_sum(p).alias("logp")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("k").alias("n_trigrams"),
        F.sum(F.col("logp") * F.col("k")).alias("sum_logp"),
    )
    ppl = F.round(
        F.exp(
            -(F.col("sum_logp").cast("double")) / F.col("n_trigrams").cast("double")
        ),
        4,
    )
    return per_doc.select(id_col, "n_trigrams", ppl.alias("ppl"))


def dsir_importance_weights_OLD(
    docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): log p_target(x) -
    log p_raw(x) under bag-of-words unigram models, so resampling the
    raw corpus by weight shifts it toward the target domain.  Both
    models are add-one-smoothed over the SHARED raw-corpus vocabulary
    (tokens outside it contribute the same smoothed mass to both sides).

    Same determinism contract as ``bigram_lm_perplexity``: exact integer
    ratios -> 6-decimal DECIMAL log terms -> exact weighted sum; the
    returned ``dsir_weight`` is that exact decimal sum cast to double at
    its native 6-dp scale (never re-rounded — see the inline comment).

    Scale: the two unigram tables are vocab-sized and broadcastable; the
    raw corpus is touched by exactly one map-side-combined (doc, token)
    count + one join against the model — the DSIR paper's hashed-ngram
    variant replaces the vocab join with a fixed-width modulo bucket,
    which this layout degrades to by substituting the token key.
    """
    doc_toks = (
        docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("k"))
    )
    raw_counts = doc_toks.groupBy("tok").agg(F.sum("k").alias("cr"))
    tgt_counts = (
        target_docs.select(F.explode(tokens(text_col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("ct"))
    )
    totals = raw_counts.agg(
        F.sum("cr").alias("Nr"), F.count("*").alias("V")
    ).crossJoin(
        tgt_counts.agg(F.sum("ct").alias("Nt"))
    )
    model = (
        raw_counts.join(tgt_counts, "tok", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "tok",
            (
                _decimal_log_sum((F.col("ct") + 1).cast("double") / (F.col("Nt") + F.col("V")).cast("double"))
                - _decimal_log_sum((F.col("cr") + 1).cast("double") / (F.col("Nr") + F.col("V")).cast("double"))
            ).alias("log_ratio"),
        )
    )
    # the weight is emitted at the sum's NATIVE 6-dp decimal scale, cast
    # to double with no re-rounding: the sum is exact on any engine, and
    # re-rounding it would reintroduce half-boundary divergence (Spark
    # rounds half-up, DuckDB half-even — a weight landing exactly on
    # x.xxxx5 flips between them; observed in the wild at sf0.01)
    weighted = doc_toks.join(model, "tok").groupBy(id_col).agg(
        F.sum("k").alias("n_tokens"),
        F.sum(F.col("log_ratio") * F.col("k")).cast("double").alias("dsir_weight"),
    )
    return weighted


def moore_lewis_scores_OLD(
    seed: DataFrame,
    pool: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-entropy difference data selection (Moore & Lewis 2010,
    "Intelligent Selection of Language Model Training Data"): score
    every pool document by H_in(d) - H_out(d), the per-token
    cross-entropy under an in-domain LM (trained on ``seed``) minus
    that under a general LM (trained on ``pool``). Documents that the
    in-domain model finds easy RELATIVE to the general model rank first
    — the classic trick that beats a raw in-domain perplexity cut,
    which just rewards short common words.

    Both models are the engine's standard add-one-smoothed bigram LM
    (the same tokenization and decimal contract as
    ``bigram_lm_perplexity`` — the scores are comparable). Unseen
    events degrade gracefully through the smoothing:
    p = (n12 + 1) / (n1 + V) with missing counts as 0.

    Determinism: exact integer-ratio probabilities, ln rounded to 6
    decimals summed as DECIMAL (order-independent); only the final
    per-token difference is a rounded double.

    Scale: both models are VOCAB-sized count tables (broadcastable);
    the pool pays ONE per-doc bigram shuffle and the seed one model
    aggregation pass — no all-pairs, no corpus-sized join sides.

    Returns (id_col, n_bigrams, ced) — ced in nats/token, ascending =
    most in-domain. Pool docs with < 2 tokens produce no bigrams and
    are excluded (no LM opinion exists for them).
    """

    def vocab(d: DataFrame, tag: str):
        # V covers ALL tokens (single-token docs too), so it cannot fold
        # from the bigram tables — one narrow pass each side, same as
        # bigram_lm_perplexity
        return d.select(F.explode(tokens(text_col)).alias("tok")).agg(
            F.countDistinct("tok").alias(f"V_{tag}")
        )

    gi = doc_bigrams(seed, id_col, text_col)
    c12_in = gi.groupBy("w1", "w2").agg(F.count("*").alias("n12_in"))
    c1_in = gi.groupBy("w1").agg(F.count("*").alias("n1_in"))
    v_in = vocab(seed, "in")
    v_out = vocab(pool, "out")
    dg = (
        doc_bigrams(pool, id_col, text_col)
        .groupBy(id_col, "w1", "w2")
        .agg(F.count("*").alias("k"))
    )
    # the pool model folds from dg (its exchange is REUSED, so the pool
    # gram stream shuffles once, not three times); c1_out aggregates the
    # gram stream directly — deriving it from c12_out breaks reuse via
    # column pruning, exactly as documented in bigram_lm_perplexity
    c12_out = dg.groupBy("w1", "w2").agg(F.sum("k").alias("n12_out"))
    c1_out = (
        doc_bigrams(pool, id_col, text_col)
        .groupBy("w1")
        .agg(F.count("*").alias("n1_out"))
    )
    # out-model joins are INNER: every pool bigram is in the pool model
    # by construction, and inner joins push identical isnotnull filters
    # to both sides so the dg subtree stays canonical and its exchange
    # is REUSED (left joins filter only the build side, which breaks
    # the match). The in-model joins are genuinely left (seed gaps).
    joined = (
        dg.join(c12_out, ["w1", "w2"])
        .join(c1_out, "w1")
        .join(c12_in, ["w1", "w2"], "left")
        .join(c1_in, "w1", "left")
        .crossJoin(F.broadcast(v_in))
        .crossJoin(F.broadcast(v_out))
    )

    def logp(tag: str):
        return _decimal_log_sum(
            (F.coalesce(F.col(f"n12_{tag}"), F.lit(0)) + 1).cast("double")
            / (F.coalesce(F.col(f"n1_{tag}"), F.lit(0)) + F.col(f"V_{tag}")).cast(
                "double"
            )
        )

    scored = joined.select(
        id_col, "k", logp("in").alias("lp_in"), logp("out").alias("lp_out")
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("k").alias("n_bigrams"),
        F.sum(F.col("lp_in") * F.col("k")).alias("s_in"),
        F.sum(F.col("lp_out") * F.col("k")).alias("s_out"),
    )
    # H_in - H_out = (-s_in + s_out) / n
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.round(
            (F.col("s_out") - F.col("s_in")).cast("double")
            / F.col("n_bigrams").cast("double"),
            4,
        ).alias("ced"),
    )


def nb_train_tables_OLD(
    train: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The NB model AS TABLES — (counts(cls, tok, ct), totals(cls, tc),
    vocab(V), priors(cls, lprior)): exact integer counts plus 6-dp
    decimal log-priors, (vocab × classes)-bound, broadcastable. These
    four frames ARE the persisted artifact set of ``nb_index.py``."""
    toks_tr = train.select(
        F.col(class_col).alias("cls"), F.explode(tokens(text_col)).alias("tok")
    )
    counts = toks_tr.groupBy("cls", "tok").agg(F.count("*").alias("ct"))
    totals = counts.groupBy("cls").agg(F.sum("ct").alias("tc"))
    vocab = counts.select("tok").distinct().agg(F.count("*").alias("V"))
    priors = (
        train.groupBy(F.col(class_col).alias("cls"))
        .agg(F.count("*").alias("nc"))
        .crossJoin(F.broadcast(train.agg(F.count("*").alias("N"))))
        .select(
            "cls",
            _decimal_log_sum(
                F.col("nc").cast("double") / F.col("N").cast("double")
            ).alias("lprior"),
        )
    )
    return counts, totals, vocab, priors


def _okapi_topk_OLD(
    per_doc: DataFrame,
    m: int,
    id_col: str,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """The shared Okapi tail for term AND phrase queries: ``per_doc``
    carries (id, dl, __tf0..__tf{m-1}); one scalar corpus-stats
    aggregate broadcasts back, the score is the exact left-assoc
    expression tree (evaluation order is part of the result under IEEE
    doubles — the oracle embeds the same order), top-k via
    TakeOrdered. ``per_doc`` is localCheckpointed (r13 opt): the stats
    aggregate and the scoring scan both read it, and without the
    checkpoint each branch re-runs the whole per-doc tf computation."""
    per_doc = per_doc.localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count("*").alias("__n"),
        F.sum("dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(m)
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    # literal folding happens in Python so the oracle can embed the same
    # IEEE doubles: k1+1, 1-b are exact for the default 1.2/0.75
    k1p1, one_minus_b = k1 + 1.0, 1.0 - b
    avgdl = F.col("__sumdl").cast("double") / F.col("__n").cast("double")
    score = None
    for i in range(m):
        tf = F.col(f"__tf{i}").cast("double")
        dfc = F.col(f"__df{i}").cast("double")
        idf = F.log(
            (F.col("__n").cast("double") - dfc + F.lit(0.5))
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
    any_match = sum(
        (F.col(f"__tf{i}") for i in range(1, m)),
        start=F.col("__tf0"),
    )
    top = (
        scored.filter(any_match > 0)
        .select(F.col(id_col), F.round(score, 4).alias("score_r"))
        .orderBy(F.col("score_r").desc(), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.col("score_r").desc(), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "score_r"
    )


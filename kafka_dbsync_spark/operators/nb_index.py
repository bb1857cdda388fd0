"""Persisted naive-Bayes classifier: train once, score forever.

The serve twin of ``operators/corpus.py::nb_domain_classify`` — the
GPT-3/LLaMA-style curation classifier DEPLOYS frozen (GPT-3 appendix A
trains its quality classifier once on WebText-vs-CommonCrawl and then
scores every crawl shard against it; nothing retrains per shard), so
the (vocab × classes) count tables and class priors land as parquet
artifacts and every subsequent scoring call reads the model, never the
training corpus.

Artifacts under ``{path}``:

    gen-{fingerprint}/counts   (cls, tok, ct)   — vocab × classes bound
    gen-{fingerprint}/totals   (cls, tc)        — one row per class
    gen-{fingerprint}/priors   (cls, lprior)    — one row per class
    _COMPLETE                  marker: V (train vocab size), the
                               train-set fingerprint, the live gen name

Publish / staleness / concurrency discipline is ``lm_index.py``'s,
verbatim (``publish_generation``: immutable generation dirs, atomic
staging rename, marker-flips-last, loser-discards; metadata-only
staleness through ``lm_model_is_current``). The ONE difference is the
fingerprint: an NB model depends on the LABELS as much as the text, so
the content term hashes (id, class, text) together — relabeling a
training doc in place invalidates the model even when every byte of
text is unchanged.

Scoring arithmetic is shared with the inline path by construction
(``nb_train_tables`` / ``nb_score_tables``): add-one smoothing prices
tokens the frozen model never saw as ``1/(tc+V)``, scores are exact
6-dp decimal sums, the argmax is engine-portable at ties. Build/serve
must be arithmetic-identical — the served query reuses the fused
query's DuckDB oracle unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.corpus import (
    nb_score_tables,
    nb_train_tables,
)
from kafka_dbsync_spark.operators.lm_index import (
    _MARKER,
    _gen_name,
    corpus_fingerprint,
    lm_model_is_current,
    publish_generation,
)


def _nb_fp_frame(
    docs: DataFrame, class_col: str, text_col: str
) -> DataFrame:
    """The fingerprint view of an NB training set: (id, class⊕text) —
    the class label participates in the content hash, so a corpus
    relabeled in place (same ids, same text, new labels) fingerprints
    differently and the staleness check forces a retrain."""
    return docs.withColumn(
        "__cls_text",
        F.concat(
            F.coalesce(F.col(class_col).cast("string"), F.lit("\x00<null>")),
            F.lit("\x01"),
            F.coalesce(F.col(text_col).cast("string"), F.lit("\x00<null>")),
        ),
    )


def nb_fingerprint(
    docs: DataFrame,
    class_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Label-aware train-set identity (see :func:`_nb_fp_frame`)."""
    return corpus_fingerprint(
        _nb_fp_frame(docs, class_col, text_col), id_col, "__cls_text"
    )


def build_nb_model(
    spark: SparkSession,
    train: DataFrame,
    path: str,
    class_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
    src_path: str | None = None,
) -> None:
    """One labeled-corpus pass → persisted NB model tables, published
    with the shared atomic-generation protocol
    (``lm_index.publish_generation``)."""
    from kafka_dbsync_spark.operators.cache_validation import files_signature

    counts, totals, vocab, priors = nb_train_tables(
        train, class_col, text_col
    )
    # r14 opt (VERDICT r13 #6): the counts write, the totals write and
    # the vocab collect are separate JOBS over the same counts lineage
    # — no in-plan reuse is possible across jobs, so the train corpus
    # tokenized three times per build. Persist the (vocab × classes)-
    # bound table for the build's duration; the CacheManager
    # substitutes it into totals/vocab (their plans contain counts'
    # plan as a subtree), and the build is imperative so the cache is
    # dropped deterministically below.
    from pyspark import StorageLevel

    counts = counts.persist(StorageLevel.MEMORY_AND_DISK)
    fp = fingerprint or nb_fingerprint(train, class_col, id_col, text_col)
    gen = _gen_name(fp)

    def write_stage(stage: str) -> None:
        counts.write.mode("overwrite").parquet(f"{stage}/counts")
        totals.write.mode("overwrite").parquet(f"{stage}/totals")
        priors.write.mode("overwrite").parquet(f"{stage}/priors")

    v = vocab.collect()[0]["V"]
    rec: dict = {"fingerprint": fp, "V": int(v)}
    if src_path is not None:
        rec["src_sig"] = files_signature(src_path)
    try:
        publish_generation(path, gen, write_stage, rec)
    finally:
        # nb_train_tables persists counts (three consumers: the counts
        # write, totals, vocab — one train tokenize instead of three);
        # the build is imperative, so drop the cache when done
        counts.unpersist()


def nb_model_is_current(
    train: DataFrame,
    path: str,
    class_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: dict | None = None,
    src_path: str | None = None,
    force_exact: bool = False,
) -> bool:
    """True iff the persisted model is servable AND trained on the
    current labeled corpus — ``lm_model_is_current`` over the
    label-aware fingerprint frame (metadata-only happy path with
    ``src_path``; the exact fingerprint scan only on metadata miss)."""
    return lm_model_is_current(
        _nb_fp_frame(train, class_col, text_col),
        path,
        id_col,
        "__cls_text",
        fingerprint=fingerprint,
        src_path=src_path,
        force_exact=force_exact,
    )


def nb_gate_foreach_batch(
    model_path: str,
    accepted_dir: str,
    rejected_dir: str,
    keep_classes,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Classifier admission at ingest — the GPT-3 pipeline's actual
    gate (appendix A: a CommonCrawl document is kept when the FROZEN
    quality classifier scores it reference-like; the classifier never
    retrains per shard): a ``foreachBatch`` function that labels each
    micro-batch against the persisted NB model
    (:func:`nb_classify_served` — vocab-bound broadcast tables, no
    corpus pass) and routes rows to ``accepted_dir`` (pred in
    ``keep_classes``) or ``rejected_dir`` with the prediction attached
    for audit; rows the tokenizer empties label NULL and reject as
    'no_tokens'.

    Replay safety is ``lm_gate_foreach_batch``'s contract verbatim:
    outputs land under ``e{epoch}`` dirs, a redelivered epoch whose
    outputs are both committed returns without writing, and a crash
    between the two writes re-runs the epoch deterministically."""
    keep = sorted({str(c) for c in keep_classes})

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        acc = os.path.join(accepted_dir, f"e{epoch_id}")
        rej = os.path.join(rejected_dir, f"e{epoch_id}")
        if os.path.exists(os.path.join(acc, "_SUCCESS")) and os.path.exists(
            os.path.join(rej, "_SUCCESS")
        ):
            return  # replayed epoch: both outputs already committed
        # classify only tokenizable rows (the fused nb_source_predict
        # query pre-filters the same way — a normalized-empty doc would
        # otherwise score through split('')'s single '' token); empties
        # fall out of the left join as NULL pred -> 'no_tokens'.
        # persist: the labeling lineage (batch scan + token agg + C-way
        # model fanout + argmax window) feeds BOTH writes
        from kafka_dbsync_spark.functions.text import token_count

        scoreable = batch_df.filter(token_count(text_col) > 0)
        labeled = batch_df.join(
            nb_classify_served(
                spark, model_path, scoreable, id_col, text_col
            ),
            id_col,
            "left",
        ).persist()
        try:
            labeled.filter(F.col("pred").isin(keep)).write.mode(
                "overwrite"
            ).parquet(acc)
            (
                labeled.filter(
                    ~F.col("pred").isin(keep) | F.col("pred").isNull()
                )
                .withColumn(
                    "reject_reason",
                    F.when(
                        F.col("pred").isNull(), F.lit("no_tokens")
                    ).otherwise(F.lit("class_blocked")),
                )
                .write.mode("overwrite")
                .parquet(rej)
            )
        finally:
            labeled.unpersist()

    return fn


def nb_classify_served(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Label new documents against the FROZEN model: reads the three
    vocab-bound parquet tables + V from the marker and runs the shared
    scoring arithmetic (``nb_score_tables``) — one (doc, token) agg, a
    C-way broadcast fanout, one per-doc argmax. No corpus pass, no
    retrain: unseen tokens are priced by add-one smoothing alone."""
    marker = os.path.join(path, _MARKER)
    try:
        with open(marker) as f:
            meta = json.load(f)
    except (OSError, ValueError) as e:
        raise ValueError(
            f"no complete NB model at {path}; build_nb_model first."
        ) from e
    gen = meta.get("gen")
    gen_dir = os.path.join(path, gen) if gen else None
    if not gen_dir or not os.path.isdir(gen_dir):
        raise ValueError(
            f"NB model marker at {path} references missing generation "
            f"{gen!r}; rebuild with build_nb_model."
        )
    counts = spark.read.parquet(f"{gen_dir}/counts")
    totals = spark.read.parquet(f"{gen_dir}/totals")
    priors = spark.read.parquet(f"{gen_dir}/priors")
    vocab = spark.createDataFrame([(int(meta["V"]),)], "V bigint")
    return nb_score_tables(
        new_docs, counts, totals, vocab, priors, id_col, text_col
    )


def nb_index_check(
    spark: SparkSession, path: str, full: bool = True
) -> DataFrame:
    """``CheckIndex`` for the persisted NB classifier (VERDICT r12 #4):
    metadata level = the shared :func:`lm_index.generation_check` over
    the ``counts``/``totals``/``priors`` artifact set (zero data IO);
    full level recounts every scalar the serve path trusts:

    - ``totals.tc == Σ counts.ct`` per class (both fold from the same
      (cls, tok) rows at train time — any inequality is corruption);
    - class sets AGREE across counts/totals/priors (a class with
      counts but no prior scores -inf; a prior with no counts serves
      pure smoothing);
    - ``Σ exp(lprior) ≈ 1`` (the priors are 6-dp decimal log
      frequencies of a partition of the train set);
    - marker ``V == countDistinct(counts.tok)`` — the exact derivation
      ``build_nb_model`` ran at publish."""
    from kafka_dbsync_spark.operators.lm_index import (
        _check_report,
        generation_check,
    )

    subdirs = ("counts", "totals", "priors")
    rows, rec = generation_check(path, subdirs, what="NB model")
    if rec is None or not full or not rec.get("gen"):
        return _check_report(spark, rows)
    gen_dir = os.path.join(path, rec["gen"])
    if not all(os.path.isdir(os.path.join(gen_dir, s)) for s in subdirs):
        return _check_report(spark, rows)

    def add(check: str, artifact: str, ok, detail: str = "") -> None:
        rows.append((check, artifact, "PASS" if ok is True else ok, detail))

    counts = spark.read.parquet(f"{gen_dir}/counts")
    totals = spark.read.parquet(f"{gen_dir}/totals")
    priors = spark.read.parquet(f"{gen_dir}/priors")
    recount = counts.groupBy("cls").agg(F.sum("ct").alias("__tc"))
    bad = (
        totals.join(recount, "cls", "full")
        .filter(
            F.col("tc").isNull()
            | F.col("__tc").isNull()
            | (F.col("tc") != F.col("__tc"))
        )
        .count()
    )
    add(
        "totals_match_counts_recount",
        "",
        bad == 0 or "FAIL",
        f"{bad} classes whose stored tc disagrees with the counts "
        "recount — every likelihood denominator depends on tc",
    )
    cls_mismatch = (
        totals.select("cls")
        .join(priors.select("cls"), "cls", "full")
        .filter(F.col("cls").isNull())
        .count()
    )
    orphan = (
        priors.select("cls")
        .join(totals.select("cls"), "cls", "left_anti")
        .unionByName(
            totals.select("cls").join(
                priors.select("cls"), "cls", "left_anti"
            )
        )
        .count()
    )
    add(
        "class_sets_agree",
        "",
        (cls_mismatch == 0 and orphan == 0) or "FAIL",
        f"{orphan} classes present in only one of totals/priors — a "
        "class without a prior scores -inf; a prior without counts "
        "serves pure smoothing",
    )
    psum = priors.agg(
        F.sum(F.exp(F.col("lprior").cast("double"))).alias("s")
    ).head()["s"]
    add(
        "priors_normalized",
        "priors",
        (psum is not None and abs(float(psum) - 1.0) < 1e-3) or "FAIL",
        f"sum(exp(lprior)) = {psum} — the priors must be a "
        "distribution over the train classes",
    )
    v_obs = counts.agg(F.countDistinct("tok").alias("v")).head()["v"]
    add(
        "marker_V_matches_vocab",
        "",
        int(rec.get("V", -1)) == int(v_obs) or "FAIL",
        f"marker V={rec.get('V')} vs {v_obs} distinct tokens in counts "
        "— V is every smoothing denominator's vocab term",
    )
    return _check_report(spark, rows)

"""CheckIndex across the five remaining persisted-index families
(VERDICT r12 #4): lm (bigram + trigram), nb, boilerplate, decontam,
dedup. Each checker reports all-PASS/WARN over a healthy lifecycle and
FAILs on a seeded corruption of its own artifact contract — mirroring
tests/test_pq_index.py's pq_index_check twins."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "spark shuffles hash joins", "a.com"),
    (2, "spark shuffles sort merge joins", "a.com"),
    (3, "columnar scans prune pages", "b.com"),
    (4, "vectorized scans batch columns", "b.com"),
    (5, "codegen fuses operators", "a.com"),
    (6, "spark shuffles hash joins again", "b.com"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        DOCS, "doc_id bigint, text string, source string"
    )


def _rows(df):
    return {
        (r["check"], r["artifact"]): (r["status"], r["detail"])
        for r in df.collect()
    }


def _no_fails(rep):
    fails = [k for k, v in rep.items() if v[0] == "FAIL"]
    assert not fails, {k: rep[k] for k in fails}


def _marker(path):
    with open(os.path.join(path, "_COMPLETE")) as f:
        return json.load(f)


def _write_marker(path, rec):
    with open(os.path.join(path, "_COMPLETE"), "w") as f:
        json.dump(rec, f)


# ---------------------------------------------------------------- lm


def test_lm_bigram_check_healthy_and_corrupt(spark, tmp_path, docs):
    import kafka_dbsync_spark.operators.lm_index as m

    path = str(tmp_path / "lm")
    m.build_lm_model(spark, docs, path)
    rep = _rows(m.lm_index_check(spark, path))
    _no_fails(rep)
    assert rep[("c1_matches_c12_recount", "")][0] == "PASS"
    assert rep[("marker_V_covers_bigram_vocab", "")][0] == "PASS"
    # metadata level: zero data IO, still coherent
    _no_fails(_rows(m.lm_index_check(spark, path, full=False)))

    # corruption 1: stage leftover + orphan generation -> WARN not FAIL
    rec = _marker(path)
    os.makedirs(os.path.join(path, ".stage-gen-zzz-123"))
    os.makedirs(os.path.join(path, "gen-orphan"))
    rep = _rows(m.lm_index_check(spark, path, full=False))
    assert rep[("staging_leftover", ".stage-gen-zzz-123")][0] == "WARN"
    assert rep[("orphan_generation", "gen-orphan")][0] == "WARN"
    _no_fails(rep)

    # corruption 2: c1 counts drift from c12 (split-brain) -> FAIL
    gen_dir = os.path.join(path, rec["gen"])
    c1 = spark.read.parquet(f"{gen_dir}/c1")
    c1.withColumn("n1", F.col("n1") + 1).write.mode("overwrite").parquet(
        str(tmp_path / "c1bad")
    )
    shutil.rmtree(f"{gen_dir}/c1")
    shutil.copytree(str(tmp_path / "c1bad"), f"{gen_dir}/c1")
    rep = _rows(m.lm_index_check(spark, path))
    assert rep[("c1_matches_c12_recount", "")][0] == "FAIL"

    # corruption 3: marker names a vanished generation -> FAIL
    _write_marker(path, dict(rec, gen="gen-gone"))
    rep = _rows(m.lm_index_check(spark, path, full=False))
    assert rep[("generation_dir_exists", "gen-gone")][0] == "FAIL"


def test_lm_trigram_check_healthy_and_corrupt(spark, tmp_path, docs):
    import kafka_dbsync_spark.operators.lm_index as m

    path = str(tmp_path / "tri")
    m.build_trigram_model(spark, docs, path)
    rep = _rows(m.lm_index_check(spark, path))
    _no_fails(rep)
    assert rep[("marker_scalars_match_cu", "cu")][0] == "PASS"
    assert rep[("cb_covers_c123", "")][0] == "PASS"

    # corruption: marker V drifts from the published cu -> FAIL (the
    # scorer's smoothing denominator would be wrong)
    rec = _marker(path)
    _write_marker(path, dict(rec, V=rec["V"] + 5))
    rep = _rows(m.lm_index_check(spark, path))
    assert rep[("marker_scalars_match_cu", "cu")][0] == "FAIL"


# ---------------------------------------------------------------- nb


def test_nb_check_healthy_and_corrupt(spark, tmp_path, docs):
    import kafka_dbsync_spark.operators.nb_index as m

    path = str(tmp_path / "nb")
    m.build_nb_model(spark, docs, path)
    rep = _rows(m.nb_index_check(spark, path))
    _no_fails(rep)
    for chk in (
        "totals_match_counts_recount",
        "class_sets_agree",
        "priors_normalized",
        "marker_V_matches_vocab",
    ):
        assert rep[(chk, "") if chk != "priors_normalized" else (chk, "priors")][0] == "PASS", chk

    # corruption 1: a class vanishes from priors -> FAIL
    rec = _marker(path)
    gen_dir = os.path.join(path, rec["gen"])
    pri = spark.read.parquet(f"{gen_dir}/priors")
    pri.filter(F.col("cls") != "a.com").write.mode("overwrite").parquet(
        str(tmp_path / "pribad")
    )
    shutil.rmtree(f"{gen_dir}/priors")
    shutil.copytree(str(tmp_path / "pribad"), f"{gen_dir}/priors")
    rep = _rows(m.nb_index_check(spark, path))
    assert rep[("class_sets_agree", "")][0] == "FAIL"
    assert rep[("priors_normalized", "priors")][0] == "FAIL"

    # corruption 2: totals split-brain vs counts -> FAIL
    m.build_nb_model(spark, docs, path)  # heal first
    rec = _marker(path)
    gen_dir = os.path.join(path, rec["gen"])
    tot = spark.read.parquet(f"{gen_dir}/totals")
    tot.withColumn("tc", F.col("tc") * 2).write.mode("overwrite").parquet(
        str(tmp_path / "totbad")
    )
    shutil.rmtree(f"{gen_dir}/totals")
    shutil.copytree(str(tmp_path / "totbad"), f"{gen_dir}/totals")
    rep = _rows(m.nb_index_check(spark, path))
    assert rep[("totals_match_counts_recount", "")][0] == "FAIL"


# ------------------------------------------------------- boilerplate


def test_boilerplate_check_healthy_and_corrupt(spark, tmp_path):
    import kafka_dbsync_spark.operators.boilerplate_index as m

    docs = spark.createDataFrame(
        [
            (1, "unique article one\nSubscribe now", "a.com"),
            (2, "unique article two\nSubscribe now", "a.com"),
            (3, "another piece\nSubscribe now", "a.com"),
        ],
        "doc_id bigint, text string, source string",
    )
    path = str(tmp_path / "bp")
    m.build_boilerplate_index(spark, docs, path)
    rep = _rows(m.boilerplate_index_check(spark, path))
    _no_fails(rep)
    assert rep[("param_key_coherent", _marker(path)["gen"])][0] == "PASS"

    # corruption 1: marker params drift from param_key -> FAIL (the
    # served key set was mined under different thresholds)
    rec = _marker(path)
    bad = dict(rec, params=dict(rec["params"], min_frac_pct=99))
    _write_marker(path, bad)
    rep = _rows(m.boilerplate_index_check(spark, path, full=False))
    assert rep[("param_key_coherent", rec["gen"])][0] == "FAIL"

    # corruption 2: duplicate key rows -> FAIL
    _write_marker(path, rec)
    gen_dir = os.path.join(path, rec["gen"])
    keys = spark.read.parquet(f"{gen_dir}/keys")
    keys.unionByName(keys.limit(1)).write.mode("overwrite").parquet(
        str(tmp_path / "keysbad")
    )
    shutil.rmtree(f"{gen_dir}/keys")
    shutil.copytree(str(tmp_path / "keysbad"), f"{gen_dir}/keys")
    rep = _rows(m.boilerplate_index_check(spark, path))
    assert rep[("keys_distinct", "keys")][0] == "FAIL"


# ---------------------------------------------------------- decontam


def test_decontam_check_healthy_and_corrupt(spark, tmp_path, docs):
    import kafka_dbsync_spark.operators.decontam_index as m

    path = str(tmp_path / "dc")
    m.build_benchmark_index(spark, docs, path, k=3)
    rep = _rows(m.benchmark_index_check(spark, path))
    _no_fails(rep)
    assert rep[("gram_order_recorded", "")][0] == "PASS"
    assert rep[("grams_distinct_non_null", "grams")][0] == "PASS"

    # corruption 1: duplicated grams (an append-corruption) -> FAIL
    rec = _marker(path)
    gen_dir = os.path.join(path, rec["gen"])
    g = spark.read.parquet(f"{gen_dir}/grams")
    g.unionByName(g.limit(1)).write.mode("overwrite").parquet(
        str(tmp_path / "gbad")
    )
    shutil.rmtree(f"{gen_dir}/grams")
    shutil.copytree(str(tmp_path / "gbad"), f"{gen_dir}/grams")
    rep = _rows(m.benchmark_index_check(spark, path))
    assert rep[("grams_distinct_non_null", "grams")][0] == "FAIL"

    # corruption 2: gram order missing from the marker -> FAIL
    bad = dict(rec)
    bad.pop("k", None)
    _write_marker(path, bad)
    rep = _rows(m.benchmark_index_check(spark, path, full=False))
    assert rep[("gram_order_recorded", "")][0] == "FAIL"


# ------------------------------------------------------------- dedup


def test_dedup_check_healthy_and_corrupt(spark, tmp_path, docs):
    import kafka_dbsync_spark.operators.dedup_index as m

    path = str(tmp_path / "dd")
    m.build_dedup_index(spark, docs.limit(4), path)
    m.dedup_index_add(spark, path, docs.filter(F.col("doc_id") > 4))
    rep = _rows(m.dedup_index_check(spark, path))
    _no_fails(rep)
    assert rep[("signatures_match_fingerprint", "signatures")][0] == "PASS"
    assert rep[("bucket_ids_in_signatures", "buckets")][0] == "PASS"
    assert rep[("band_idx_in_range", "buckets")][0] == "PASS"
    _no_fails(_rows(m.dedup_index_check(spark, path, full=False)))

    # corruption 1: fingerprint split-brain (marker says fewer docs
    # than the signature table holds) -> FAIL
    rec = _marker(path)
    bad_fp = dict(rec["fingerprint"], n=rec["fingerprint"]["n"] - 1)
    _write_marker(path, dict(rec, fingerprint=bad_fp))
    rep = _rows(m.dedup_index_check(spark, path))
    assert rep[("signatures_match_fingerprint", "signatures")][0] == "FAIL"
    _write_marker(path, rec)

    # corruption 2: an orphan bucket row (its signature vanished) ->
    # FAIL — that candidate can never verify, silently dropping dups
    sig_dir = os.path.join(path, "signatures")
    sig = spark.read.parquet(sig_dir)
    sig.filter(F.col("doc_id") != 1).write.mode("overwrite").parquet(
        str(tmp_path / "sigbad")
    )
    shutil.rmtree(sig_dir)
    shutil.copytree(str(tmp_path / "sigbad"), sig_dir)
    rec = _marker(path)
    fp = dict(
        rec["fingerprint"],
        n=rec["fingerprint"]["n"] - 1,
        sum_id=rec["fingerprint"]["sum_id"] - 1,
    )
    _write_marker(path, dict(rec, fingerprint=fp))
    rep = _rows(m.dedup_index_check(spark, path))
    assert rep[("bucket_ids_in_signatures", "buckets")][0] == "FAIL"

    # corruption 3: legacy marker without the hash family -> FAIL
    rec = _marker(path)
    bad = {k: v for k, v in rec.items() if k != "num_hashes"}
    _write_marker(path, bad)
    rep = _rows(m.dedup_index_check(spark, path, full=False))
    assert rep[("hash_family_recorded", "")][0] == "FAIL"

"""Composed admission pipeline (operators/admission.py, VERDICT r5 #5):
exact dedup against persisted hash state + frozen-LM gating, with ALL
cross-batch state on disk — so a restarted operator (new instance, same
state_dir) rejects a duplicate of an earlier admission, replays are
no-ops, and nothing stays persisted after a batch returns (r5 #6)."""

import os

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.admission import (
    admission_foreach_batch,
    read_admitted,
    seed_admitted_hashes,
)
from kafka_dbsync_spark.operators.lm_index import build_lm_model

FLUENT = "the quick brown fox jumps over the lazy dog again and again"
TRAIN = [
    (i, f"{FLUENT} round {i % 4}") for i in range(12)
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def model(spark, tmp_path):
    path = str(tmp_path / "lm")
    build_lm_model(spark, _df(spark, TRAIN), path)
    return path


def test_admission_routes_dedup_then_gate(spark, model, tmp_path):
    state = str(tmp_path / "state")
    fn = admission_foreach_batch(model, state, max_ppl=8.0)
    fn(_df(spark, [
        (100, f"{FLUENT} round 0 extra"),     # fluent, novel -> accepted
        (101, f"{FLUENT} round 0 extra"),     # in-batch dup of 100
        (102, "zzz qqq xxx vvv kkk www uuu"), # unseen tokens -> high ppl
        (103, "one"),                          # < 2 tokens -> too_short
    ]), 1)
    acc = {r["doc_id"] for r in spark.read.parquet(f"{state}/accepted/e1").collect()}
    rej = {
        r["doc_id"]: r["reject_reason"]
        for r in spark.read.parquet(f"{state}/rejected/e1").collect()
    }
    dup = {
        r["doc_id"]: r["dup_reason"]
        for r in spark.read.parquet(f"{state}/duplicates/e1").collect()
    }
    assert acc == {100}
    assert rej[102] == "high_perplexity" and rej[103] == "too_short"
    assert dup == {101: "in_batch_duplicate"}


def test_restart_rejects_duplicate_of_prior_admission(spark, model, tmp_path):
    """The verdict's E2E: a batch-2 duplicate of a batch-1 admission is
    rejected AFTER a restart (a brand-new operator instance over the
    same state_dir), including duplicates of quality-REJECTED batch-1
    docs (the first holder owns the hash)."""
    state = str(tmp_path / "state")
    fn1 = admission_foreach_batch(model, state, max_ppl=8.0)
    fn1(_df(spark, [
        (200, f"{FLUENT} novel statement"),
        (201, "zzz qqq xxx vvv kkk www uuu"),  # fresh but quality-rejected
    ]), 1)
    del fn1  # restart: nothing carried in memory
    fn2 = admission_foreach_batch(model, state, max_ppl=8.0)
    fn2(_df(spark, [
        (300, f"{FLUENT} novel statement"),    # dup of 200 (admitted)
        (301, "zzz qqq xxx vvv kkk www uuu"),  # dup of 201 (rejected)
        (302, f"{FLUENT} different words"),    # genuinely new
    ]), 2)
    dup = {
        r["doc_id"]: r["dup_reason"]
        for r in spark.read.parquet(f"{state}/duplicates/e2").collect()
    }
    acc2 = {r["doc_id"] for r in spark.read.parquet(f"{state}/accepted/e2").collect()}
    assert dup == {300: "previously_seen", 301: "previously_seen"}
    assert acc2 == {302}
    admitted = read_admitted(spark, state)
    assert {r["doc_id"] for r in admitted.collect()} == {200, 302}


def test_replayed_epoch_is_noop_and_crash_replay_recovers(
    spark, model, tmp_path
):
    state = str(tmp_path / "state")
    fn = admission_foreach_batch(model, state, max_ppl=8.0)
    batch = _df(spark, [(400, f"{FLUENT} replay test")])
    fn(batch, 1)
    first = sorted(
        tuple(r) for r in spark.read.parquet(f"{state}/accepted/e1").collect()
    )
    fn(batch, 1)  # redelivery after commit: must not rewrite anything
    assert sorted(
        tuple(r) for r in spark.read.parquet(f"{state}/accepted/e1").collect()
    ) == first
    # crash BEFORE the hash commit: outputs exist, commit dir doesn't —
    # the replay must redo the epoch deterministically
    import shutil

    shutil.rmtree(f"{state}/admitted_hashes/e1")
    fn(batch, 1)
    assert sorted(
        tuple(r) for r in spark.read.parquet(f"{state}/accepted/e1").collect()
    ) == first
    assert os.path.exists(f"{state}/admitted_hashes/e1/_SUCCESS")


def test_seeded_hashes_suppress_corpus_duplicates(spark, model, tmp_path):
    state = str(tmp_path / "state")
    seed = _df(spark, TRAIN)
    seed_admitted_hashes(state, seed, F.md5(F.col("text")))
    fn = admission_foreach_batch(model, state, max_ppl=8.0)
    fn(_df(spark, [(500, TRAIN[3][1]), (501, f"{FLUENT} unseeded")]), 1)
    dup = {r["doc_id"] for r in spark.read.parquet(f"{state}/duplicates/e1").collect()}
    acc = {r["doc_id"] for r in spark.read.parquet(f"{state}/accepted/e1").collect()}
    assert dup == {500} and acc == {501}


def test_seed_does_not_swallow_stream_batch_zero(spark, model, tmp_path):
    """r6 advice #1: the seed must live outside the epoch namespace —
    a seeded operator attached to a fresh stream (first batchId 0)
    must still process micro-batch 0, and the seed's hashes must still
    suppress duplicates in it."""
    state = str(tmp_path / "state")
    seed_admitted_hashes(
        state, _df(spark, TRAIN), F.md5(F.col("text"))
    )
    fn = admission_foreach_batch(model, state, max_ppl=8.0)
    fn(_df(spark, [(550, TRAIN[0][1]), (551, f"{FLUENT} batch zero")]), 0)
    dup = {r["doc_id"] for r in spark.read.parquet(f"{state}/duplicates/e0").collect()}
    acc = {r["doc_id"] for r in spark.read.parquet(f"{state}/accepted/e0").collect()}
    assert dup == {550} and acc == {551}


def test_compaction_preserves_state_and_replay_safety(spark, model, tmp_path):
    """VERDICT r6 #4: folding committed epochs into a base snapshot
    must (a) leave read_admitted identical, (b) keep suppressing
    duplicates of pre-compaction admissions, (c) keep replays of
    folded epochs no-ops, and (d) bound the visible state dirs."""
    from kafka_dbsync_spark.operators.admission import (
        _epoch_dirs,
        compact_admission_state,
    )

    state = str(tmp_path / "state")
    seed_admitted_hashes(state, _df(spark, TRAIN[:2]), F.md5(F.col("text")))
    fn = admission_foreach_batch(model, state, max_ppl=8.0)
    fn(_df(spark, [(800, f"{FLUENT} alpha")]), 0)
    fn(_df(spark, [(801, f"{FLUENT} beta"), (802, "zzz qqq xxx vvv")]), 1)
    fn(_df(spark, [(803, f"{FLUENT} gamma")]), 2)
    before_admitted = sorted(
        r["doc_id"] for r in read_admitted(spark, state).collect()
    )
    res = compact_admission_state(spark, state)
    assert res == {"through": 2, "folded_epochs": 3}
    # (d) one base dir visible per table, seed + epoch dirs retired
    assert _epoch_dirs(state, "admitted_hashes") == [
        f"{state}/admitted_hashes/base-2"
    ]
    assert not os.path.exists(f"{state}/admitted_hashes/seed")
    # (a) identical admitted rows
    assert sorted(
        r["doc_id"] for r in read_admitted(spark, state).collect()
    ) == before_admitted
    # (c) replay of a folded epoch is a no-op (no e1 dir reappears)
    fn(_df(spark, [(999, f"{FLUENT} replay ghost")]), 1)
    assert not os.path.exists(f"{state}/accepted/e1")
    # (b) post-compaction batch still dedups against folded admissions
    # (800's text, TRAIN[0]'s seeded text) and accepts novelty
    fn(_df(spark, [
        (900, f"{FLUENT} alpha"),   # dup of folded admission 800
        (901, TRAIN[0][1]),          # dup of folded SEED hash
        (902, f"{FLUENT} delta"),    # novel
    ]), 3)
    dup = {r["doc_id"] for r in spark.read.parquet(f"{state}/duplicates/e3").collect()}
    acc = {r["doc_id"] for r in spark.read.parquet(f"{state}/accepted/e3").collect()}
    assert dup == {900, 901} and acc == {902}
    # second compaction folds the new epoch into base-3
    res2 = compact_admission_state(spark, state)
    assert res2 == {"through": 3, "folded_epochs": 1}
    assert sorted(
        r["doc_id"] for r in read_admitted(spark, state).collect()
    ) == before_admitted + [902]


def test_compaction_keep_last_and_pending_ceiling(spark, model, tmp_path):
    """keep_last leaves recent epochs unfolded; an uncommitted (crash
    mid-write) epoch dir caps T so its replay still runs for real."""
    from kafka_dbsync_spark.operators.admission import (
        compact_admission_state,
    )

    state = str(tmp_path / "state")
    fn = admission_foreach_batch(model, state, max_ppl=8.0)
    for e in range(4):
        fn(_df(spark, [(850 + e, f"{FLUENT} doc {e}")]), e)
    res = compact_admission_state(spark, state, keep_last=2)
    assert res == {"through": 1, "folded_epochs": 2}
    assert os.path.exists(f"{state}/accepted/e2")  # kept unfolded
    # simulate a crashed epoch 4 (dir without _SUCCESS): T must not cross it
    os.makedirs(f"{state}/admitted_hashes/e4")
    fn(_df(spark, [(860, f"{FLUENT} doc five")]), 5)
    res2 = compact_admission_state(spark, state)
    assert res2 == {"through": 3, "folded_epochs": 2}
    # the crashed epoch replays for real (not swallowed by the guard)
    import shutil

    shutil.rmtree(f"{state}/admitted_hashes/e4")
    fn(_df(spark, [(861, f"{FLUENT} doc four")]), 4)
    acc = {r["doc_id"] for r in spark.read.parquet(f"{state}/accepted/e4").collect()}
    assert acc == {861}


def test_compaction_crash_between_base_write_and_cleanup(
    spark, model, tmp_path
):
    """Crash window: a base snapshot landed but the folded dirs were
    not yet retired (or only SOME tables folded). Visible state must
    not double-count, membership must stay exact, and the next
    compaction must converge and clean up."""
    import shutil

    from kafka_dbsync_spark.operators.admission import (
        _epoch_dirs,
        compact_admission_state,
    )

    state = str(tmp_path / "state")
    fn = admission_foreach_batch(model, state, max_ppl=8.0, compact_every=None)
    fn(_df(spark, [(700, f"{FLUENT} one")]), 0)
    fn(_df(spark, [(701, f"{FLUENT} two")]), 1)
    expected = sorted(
        r["doc_id"] for r in read_admitted(spark, state).collect()
    )
    # simulate the crash: copy what a completed hashes base-1 would hold,
    # while every epoch dir (all tables) remains on disk
    hroot = f"{state}/admitted_hashes"
    spark.read.parquet(f"{hroot}/e0", f"{hroot}/e1").distinct().write.mode(
        "overwrite"
    ).parquet(f"{hroot}/base-1")
    # visible dirs: the base plus NOTHING at or below T=1 → no dup
    assert _epoch_dirs(state, "admitted_hashes") == [f"{hroot}/base-1"]
    # a new batch still dedups correctly against the half-compacted state
    fn(_df(spark, [(702, f"{FLUENT} one"), (703, f"{FLUENT} three")]), 2)
    dup = {r["doc_id"] for r in spark.read.parquet(f"{state}/duplicates/e2").collect()}
    assert dup == {702}
    # the next compaction folds epoch 2 and retires every leftover
    res = compact_admission_state(spark, state)
    assert res == {"through": 2, "folded_epochs": 1}
    assert not os.path.exists(f"{hroot}/e0")
    assert not os.path.exists(f"{hroot}/base-1")
    assert sorted(
        r["doc_id"] for r in read_admitted(spark, state).collect()
    ) == expected + [703]


def test_auto_compaction_bounds_state_dirs(spark, model, tmp_path):
    """compact_every folds state inline from the batch function: after
    many epochs the visible hash-state dirs stay O(1) and the admitted
    set equals the no-compaction twin's."""
    from kafka_dbsync_spark.operators.admission import _epoch_dirs

    state_a = str(tmp_path / "auto")
    state_b = str(tmp_path / "manual")
    fn_a = admission_foreach_batch(model, state_a, max_ppl=8.0, compact_every=2)
    fn_b = admission_foreach_batch(model, state_b, max_ppl=8.0, compact_every=None)
    for e in range(6):
        batch = _df(spark, [
            (1000 + e, f"{FLUENT} unique {e}"),
            (2000 + e, f"{FLUENT} unique {max(0, e - 1)}"),  # dup of prior
        ])
        fn_a(batch, e)
        fn_b(batch, e)
    got_a = sorted(r["doc_id"] for r in read_admitted(spark, state_a).collect())
    got_b = sorted(r["doc_id"] for r in read_admitted(spark, state_b).collect())
    assert got_a == got_b
    # compaction last fired at epoch 4 (keep_last=1 leaves e4? no —
    # keep_last counts committed epochs at fire time, so at least the
    # newest stays); bound: 1 base + the few epochs since the last fold
    assert len(_epoch_dirs(state_a, "admitted_hashes")) <= 3
    assert len(_epoch_dirs(state_b, "admitted_hashes")) == 6


def test_no_persisted_rdds_leak_after_batches(spark, model, tmp_path):
    """VERDICT r5 #6: the proof harness must not leave cached lineage
    behind — every persist inside the operator is matched by an
    unpersist before the batch function returns."""
    state = str(tmp_path / "state")
    fn = admission_foreach_batch(model, state, max_ppl=8.0)
    before = dict(spark.sparkContext._jsc.getPersistentRDDs())
    fn(_df(spark, [(600, f"{FLUENT} leak check"), (601, "one")]), 1)
    fn(_df(spark, [(602, f"{FLUENT} leak check two")]), 2)
    after = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert len(after) == len(before)


def test_admission_wired_to_real_stream_with_restart(spark, model, tmp_path):
    """Production wiring: a file-source stream driven availableNow with
    foreachBatch, stopped, then RESTARTED with the same checkpoint on
    new input containing a duplicate of the first run's admission."""
    import json as _json

    state = str(tmp_path / "state")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                admission_foreach_batch(model, state, max_ppl=8.0)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(src / "b0.json", "w") as f:
        f.write(_json.dumps({"doc_id": 700, "text": f"{FLUENT} stream one"}) + "\n")
    run()
    with open(src / "b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 701, "text": f"{FLUENT} stream one"}) + "\n")
        f.write(_json.dumps({"doc_id": 702, "text": f"{FLUENT} stream two"}) + "\n")
    run()  # restart from checkpoint
    admitted = {r["doc_id"] for r in read_admitted(spark, state).collect()}
    dups = {
        r["doc_id"]
        for d in os.listdir(f"{state}/duplicates")
        for r in spark.read.parquet(f"{state}/duplicates/{d}").collect()
    }
    assert admitted == {700, 702}
    assert dups == {701}


# ---------------------------------------------------------------------------
# Per-group token-budget admission (the streaming budget cap)
# ---------------------------------------------------------------------------
def _bdf(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, src string, w long")


def test_budget_admission_caps_per_group_across_batches(spark, tmp_path):
    from kafka_dbsync_spark.operators.admission import (
        budget_admission_foreach_batch,
        read_budget_spent,
    )

    state = str(tmp_path / "bstate")
    fn = budget_admission_foreach_batch(
        state, "src", "w", budget=100, compact_every=None
    )
    # batch 0: a fills 60/100; b fills 90/100
    fn(_bdf(spark, [(1, "a", 60), (2, "b", 90)]), 0)
    # batch 1: a's id-3 row (30) fits (60<100), its id-4 row starts at
    # 90 < 100 so it is admitted WHOLE (boundary-row overshoot); id-5
    # starts at 140 -> deferred. b's row starts at 90 < 100 -> admitted.
    fn(_bdf(spark, [
        (3, "a", 30), (4, "a", 50), (5, "a", 10), (6, "b", 25),
    ]), 1)
    adm = {
        r["doc_id"]
        for e in ("e0", "e1")
        for r in spark.read.parquet(f"{state}/admitted/{e}").collect()
    }
    dfr = {
        r["doc_id"]: r["spent_before"]
        for r in spark.read.parquet(f"{state}/deferred/e1").collect()
    }
    assert adm == {1, 2, 3, 4, 6}
    assert dfr == {5: 140}
    spent = {
        r["src"]: r["w"]
        for r in read_budget_spent(spark, state)
        .groupBy("src").sum("w")
        .withColumnRenamed("sum(w)", "w").collect()
    }
    assert spent == {"a": 140, "b": 115}
    # batch 2: both groups over budget -> everything deferred
    fn(_bdf(spark, [(7, "a", 1), (8, "b", 1)]), 2)
    assert spark.read.parquet(f"{state}/admitted/e2").count() == 0
    assert spark.read.parquet(f"{state}/deferred/e2").count() == 2


def test_budget_admission_replay_and_restart(spark, tmp_path):
    from kafka_dbsync_spark.operators.admission import (
        budget_admission_foreach_batch,
    )

    state = str(tmp_path / "bstate")
    fn1 = budget_admission_foreach_batch(state, "src", "w", budget=50)
    b0 = _bdf(spark, [(1, "a", 40)])
    fn1(b0, 0)
    first = sorted(tuple(r) for r in spark.read.parquet(f"{state}/admitted/e0").collect())
    fn1(b0, 0)  # replay after commit: no-op
    assert sorted(
        tuple(r) for r in spark.read.parquet(f"{state}/admitted/e0").collect()
    ) == first
    del fn1
    fn2 = budget_admission_foreach_batch(state, "src", "w", budget=50)
    fn2(_bdf(spark, [(2, "a", 30), (3, "a", 5)]), 1)  # 40<50 -> 2 whole; 3 at 70 -> deferred
    adm1 = {r["doc_id"] for r in spark.read.parquet(f"{state}/admitted/e1").collect()}
    dfr1 = {r["doc_id"] for r in spark.read.parquet(f"{state}/deferred/e1").collect()}
    assert adm1 == {2} and dfr1 == {3}


def test_budget_admission_compaction_equivalence(spark, tmp_path):
    from kafka_dbsync_spark.operators.admission import (
        budget_admission_foreach_batch,
        compact_budget_state,
        read_budget_spent,
    )

    state = str(tmp_path / "bstate")
    fn = budget_admission_foreach_batch(
        state, "src", "w", budget=100, compact_every=None
    )
    for e in range(4):
        fn(_bdf(spark, [(10 + e, "a", 30), (20 + e, "b", 10)]), e)
    before = sorted(
        (r["src"], r["w"]) for r in read_budget_spent(spark, state)
        .groupBy("src").agg({"w": "sum"})
        .withColumnRenamed("sum(w)", "w").collect()
    )
    res = compact_budget_state(spark, state, "src")
    assert res == {"through": 3, "folded_epochs": 4}
    after = sorted(
        (r["src"], r["w"]) for r in read_budget_spent(spark, state)
        .groupBy("src").agg({"w": "sum"})
        .withColumnRenamed("sum(w)", "w").collect()
    )
    assert after == before
    # post-fold: counters still enforce the cap (a at 120 -> deferred;
    # b at 40 -> admitted) and replay of a folded epoch no-ops
    fn(_bdf(spark, [(90, "a", 5), (91, "b", 5)]), 4)
    adm = {r["doc_id"] for r in spark.read.parquet(f"{state}/admitted/e4").collect()}
    assert adm == {91}
    import os as _os

    fn(_bdf(spark, [(99, "b", 1)]), 2)
    assert not _os.path.exists(f"{state}/spent/e2")


def test_budget_admission_wired_to_real_stream(spark, tmp_path):
    """Production wiring: file-source stream + foreachBatch
    (availableNow), stopped and restarted with the same checkpoint —
    the per-group cap holds across the restart."""
    import json as _json

    from kafka_dbsync_spark.operators.admission import (
        budget_admission_foreach_batch,
    )

    state = str(tmp_path / "bstate")
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema(
            "doc_id long, src string, w long"
        ).json(str(src))
        q = (
            stream.writeStream.foreachBatch(
                budget_admission_foreach_batch(state, "src", "w", budget=100)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    with open(src / "b0.json", "w") as f:
        f.write(_json.dumps({"doc_id": 1, "src": "a", "w": 70}) + "\n")
    run()
    with open(src / "b1.json", "w") as f:
        f.write(_json.dumps({"doc_id": 2, "src": "a", "w": 20}) + "\n")  # 70<100: whole
        f.write(_json.dumps({"doc_id": 3, "src": "a", "w": 20}) + "\n")  # 90<100: whole
        f.write(_json.dumps({"doc_id": 4, "src": "a", "w": 20}) + "\n")  # 110: deferred
    run()  # restart from checkpoint
    adm = {
        r["doc_id"]
        for d in os.listdir(f"{state}/admitted")
        for r in spark.read.parquet(f"{state}/admitted/{d}").collect()
    }
    dfr = {
        r["doc_id"]
        for d in os.listdir(f"{state}/deferred")
        for r in spark.read.parquet(f"{state}/deferred/{d}").collect()
    }
    assert adm == {1, 2, 3} and dfr == {4}


# ---------------------------------------------------------------------------
# Paragraph-level dedup at ingest (paragraph_ingest_foreach_batch)
# ---------------------------------------------------------------------------
def _pdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_paragraph_ingest_keep_first_across_batches(spark, tmp_path):
    """A paragraph admitted in batch 0 suppresses every later arrival —
    across batches and within a batch — and every doc lands rewritten;
    replaying a committed epoch is a no-op."""
    from kafka_dbsync_spark.operators.admission import (
        paragraph_ingest_foreach_batch,
        read_cleaned_docs,
    )

    state = str(tmp_path / "pstate")
    fn = paragraph_ingest_foreach_batch(state, compact_every=None)
    fn(_pdocs(spark, [(1, "shared para\nunique one")]), 0)
    fn(_pdocs(spark, [
        (2, "shared para\nfresh text"),        # loses the batch-0 para
        (3, "twice here\nother stuff"),
        (4, "twice here\nmore words"),         # loses to doc 3 in-batch
    ]), 1)
    got = {
        r["doc_id"]: (r["n_paras"], r["n_removed"], r["cleaned_text"])
        for r in read_cleaned_docs(spark, state).collect()
    }
    assert got == {
        1: (2, 0, "shared para\nunique one"),
        2: (2, 1, "fresh text"),
        3: (2, 0, "twice here\nother stuff"),
        4: (2, 1, "more words"),
    }
    # replay of epoch 1: committed -> no-op, answers unchanged
    fn(_pdocs(spark, [(99, "should never appear")]), 1)
    after = {r["doc_id"] for r in read_cleaned_docs(spark, state).collect()}
    assert 99 not in after and after == {1, 2, 3, 4}


def test_paragraph_ingest_restart_and_seed(spark, tmp_path):
    """A new operator instance (fresh session state) continues from the
    committed epochs; a seeded corpus suppresses its paragraphs from
    batch 0 onward — and the seed never swallows batchId 0."""
    from kafka_dbsync_spark.operators.admission import (
        paragraph_ingest_foreach_batch,
        read_cleaned_docs,
        seed_paragraph_hashes,
    )

    state = str(tmp_path / "pstate")
    seed_paragraph_hashes(state, _pdocs(spark, [(0, "seeded para")]))
    fn = paragraph_ingest_foreach_batch(state, compact_every=None)
    fn(_pdocs(spark, [(1, "seeded para\nnew content")]), 0)
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in read_cleaned_docs(spark, state).collect()
    }
    assert got == {1: "new content"}     # seed hit dropped, batch 0 ran
    # restart: a NEW foreachBatch instance sees the committed state
    fn2 = paragraph_ingest_foreach_batch(state, compact_every=None)
    fn2(_pdocs(spark, [(2, "new content\nlater text")]), 1)
    got2 = {
        r["doc_id"]: r["cleaned_text"]
        for r in read_cleaned_docs(spark, state).collect()
    }
    assert got2[2] == "later text"       # batch-0 para owned by doc 1


def test_paragraph_ingest_compaction_preserves_membership(spark, tmp_path):
    """Folding epochs into base-{T} keeps suppressing exactly the same
    paragraphs, replays across the fold stay no-ops, and state reads
    see one base dir plus newer epochs."""
    import os

    from kafka_dbsync_spark.operators.admission import (
        compact_paragraph_state,
        paragraph_ingest_foreach_batch,
        read_cleaned_docs,
    )

    state = str(tmp_path / "pstate")
    fn = paragraph_ingest_foreach_batch(state, compact_every=None)
    fn(_pdocs(spark, [(1, "alpha para\nbeta para")]), 0)
    fn(_pdocs(spark, [(2, "gamma para\ndelta para")]), 1)
    stats = compact_paragraph_state(spark, state)
    assert stats["folded_epochs"] == 2 and stats["through"] == 1
    names = sorted(os.listdir(os.path.join(state, "para_hashes")))
    assert names == ["base-1"]
    # a post-fold batch still dedups against folded paragraphs
    fn(_pdocs(spark, [(3, "alpha para\nepsilon para")]), 2)
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in read_cleaned_docs(spark, state).collect()
    }
    assert got[3] == "epsilon para"
    # replay of a FOLDED epoch is a no-op (its dir is gone)
    fn(_pdocs(spark, [(77, "phantom")]), 1)
    assert 77 not in {
        r["doc_id"] for r in read_cleaned_docs(spark, state).collect()
    }


def test_cleaned_epoch_invisible_until_hash_commit(spark, tmp_path):
    """ADVICE r8: cleaned/e{N} lands (with Spark's own _SUCCESS) BEFORE
    the epoch's para_hashes commit point. During that crash window the
    epoch's cleaned rows must be INVISIBLE to read_cleaned_docs — a
    replay rewrites them against the state the committed attempt will
    actually see — and become visible the moment the hash state
    commits (directly or via a covering base snapshot)."""
    import os

    from kafka_dbsync_spark.operators.admission import (
        compact_paragraph_state,
        paragraph_ingest_foreach_batch,
        read_cleaned_docs,
    )

    state = str(tmp_path / "pstate")
    fn = paragraph_ingest_foreach_batch(state, compact_every=None)
    fn(_pdocs(spark, [(1, "alpha para\nbeta para")]), 0)
    fn(_pdocs(spark, [(2, "alpha para\ngamma para")]), 1)
    # simulate the crash window: cleaned/e1 landed, para_hashes/e1 not
    commit = os.path.join(state, "para_hashes", "e1", "_SUCCESS")
    os.remove(commit)
    visible = {r["doc_id"] for r in read_cleaned_docs(spark, state).collect()}
    assert visible == {1}, "uncommitted epoch's cleaned rows leaked"
    # the stream replays epoch 1 (its commit is gone -> not committed)
    fn(_pdocs(spark, [(2, "alpha para\ngamma para")]), 1)
    visible = {r["doc_id"] for r in read_cleaned_docs(spark, state).collect()}
    assert visible == {1, 2}
    # a base snapshot covering the epoch also grants visibility
    compact_paragraph_state(spark, state)
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in read_cleaned_docs(spark, state).collect()
    }
    assert got == {1: "alpha para\nbeta para", 2: "gamma para"}


def test_admission_url_key_dedup_semantics(spark, tmp_path):
    """admission_foreach_batch with key_fn=normalized_url dedups by
    CANONICAL URL, not content: a re-fetch of a seen URL carrying
    DIFFERENT text is a duplicate; the same text under a NEW URL is
    admitted. Noise (scheme/www/utm/fragment) collapses to one key."""
    import os

    from pyspark.sql import functions as F

    from kafka_dbsync_spark.operators.admission import (
        admission_foreach_batch,
        seed_admitted_hashes,
    )
    from kafka_dbsync_spark.operators.lm_index import build_lm_model
    from kafka_dbsync_spark.operators.web import normalized_url

    def docs(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, url string"
        )

    seed = docs([(0, "the quick brown fox jumps over the dog again", 
                  "https://www.site.org/a?utm_s=x")])
    work = str(tmp_path)
    model, state = os.path.join(work, "lm"), os.path.join(work, "state")
    key_fn = lambda df: normalized_url(F.col("url"))  # noqa: E731
    build_lm_model(spark, seed, model)
    seed_admitted_hashes(state, seed, key_fn(seed))
    fn = admission_foreach_batch(model, state, max_ppl=1e9, key_fn=key_fn)
    fn(docs([
        (1, "completely different words here", "http://site.org/a#frag"),
        (2, "the quick brown fox jumps over the dog again", "https://site.org/b"),
    ]), 0)
    acc = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(state, "accepted", "e0")).collect()
    }
    dup = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(state, "duplicates", "e0")).collect()
    }
    # doc 1: same canonical URL as the seed (re-fetch) -> duplicate,
    # even though its TEXT is new; doc 2: same text, new URL -> admitted
    assert dup == {1} and acc == {2}


# ---------------------------------------------------------------------------
# Multimodal near-dup dedup-at-ingest (neardup_ingest_foreach_batch)
# ---------------------------------------------------------------------------
def _fp_batch(spark, rows):
    """(doc_id, fp) batches — hash_fn pluggability lets tests feed
    explicit fingerprints, no media bytes needed."""
    return spark.createDataFrame(rows, "doc_id long, dhash long")


_IDENT_HASH = lambda df: df.select("doc_id", "dhash")  # noqa: E731


def test_neardup_gate_catches_cross_batch_twin(spark, tmp_path):
    """VERDICT r9 #4 'done' bar: a near-dup (and an exact dup) of a
    batch-1 ADMISSION arriving in batch 2 is dropped — without any
    media re-read (state is fingerprints only)."""
    import os

    from kafka_dbsync_spark.operators.admission import (
        neardup_ingest_foreach_batch,
        read_fingerprints,
    )

    state = str(tmp_path / "st")
    fn = neardup_ingest_foreach_batch(state, _IDENT_HASH, bit_width=56)
    A = 0b10101010
    fn(_fp_batch(spark, [(1, A)]), 1)
    fn(_fp_batch(spark, [(2, A ^ 0b11), (3, A), (4, A ^ (0xF << 20))]), 2)
    acc = {
        r["doc_id"]: r["dhash"]
        for r in spark.read.parquet(
            os.path.join(state, "accepted", "e1"),
            os.path.join(state, "accepted", "e2"),
        ).collect()
    }
    # 2 (hamming 2) and 3 (exact) dropped; 4 (hamming 4) admitted
    assert set(acc) == {1, 4}
    dups = {
        r["doc_id"]: r["dup_reason"]
        for r in spark.read.parquet(
            os.path.join(state, "duplicates", "e2")
        ).collect()
    }
    # 3 is dominated BOTH ways (near 2 in-batch AND near stored A);
    # the deterministic min() picks the in-batch reason
    assert dups == {
        2: "previously_seen_neardup",
        3: "in_batch_neardup",
    }
    # state carries EVERY seen fingerprint (admitted and dropped)
    fps = {r["fp"] for r in read_fingerprints(spark, state).collect()}
    assert fps == {A, A ^ 0b11, A ^ (0xF << 20)}


def test_neardup_gate_domination_by_dropped_arrival(spark, tmp_path):
    """A near-twin of a DROPPED arrival is still dropped (the batch
    pair-set algebra: any lower-order row dominates) — the case a
    survivors-only state would silently re-admit."""
    from kafka_dbsync_spark.operators.admission import (
        neardup_ingest_foreach_batch,
    )

    state = str(tmp_path / "st")
    fn = neardup_ingest_foreach_batch(state, _IDENT_HASH, bit_width=56)
    A = 0
    B = 1                      # hamming(A, B) = 1 -> B dropped
    C = B ^ (0b111 << 10)      # hamming(B, C) = 3, hamming(A, C) = 4
    fn(_fp_batch(spark, [(1, A), (2, B)]), 0)
    fn(_fp_batch(spark, [(3, C)]), 1)
    import os

    assert spark.read.parquet(
        os.path.join(state, "accepted", "e1")
    ).isEmpty()
    r = spark.read.parquet(os.path.join(state, "duplicates", "e1")).head()
    assert r["doc_id"] == 3 and r["dup_reason"] == "previously_seen_neardup"


def test_neardup_gate_in_batch_keep_first_and_replay(spark, tmp_path):
    import os

    from kafka_dbsync_spark.operators.admission import (
        neardup_ingest_foreach_batch,
    )

    state = str(tmp_path / "st")
    fn = neardup_ingest_foreach_batch(state, _IDENT_HASH, bit_width=56)
    batch = [(5, 100), (9, 101), (2, 100 ^ (0xFF << 30))]
    fn(_fp_batch(spark, batch), 0)
    acc0 = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(state, "accepted", "e0")
        ).collect()
    )
    assert acc0 == [2, 5]  # 9 dominated by 5 (hamming 1) in-batch
    dup = spark.read.parquet(os.path.join(state, "duplicates", "e0")).head()
    assert dup["doc_id"] == 9 and dup["dup_reason"] == "in_batch_neardup"
    before = sorted(
        os.path.getmtime(os.path.join(state, "fingerprints", "e0", f))
        for f in os.listdir(os.path.join(state, "fingerprints", "e0"))
    )
    fn(_fp_batch(spark, [(99, 100)]), 0)  # replay with DIFFERENT data
    after = sorted(
        os.path.getmtime(os.path.join(state, "fingerprints", "e0", f))
        for f in os.listdir(os.path.join(state, "fingerprints", "e0"))
    )
    assert before == after  # committed epoch: untouched no-op
    assert acc0 == sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(state, "accepted", "e0")
        ).collect()
    )


def test_neardup_gate_seed_and_compaction(spark, tmp_path):
    import os

    from kafka_dbsync_spark.operators.admission import (
        compact_fingerprint_state,
        neardup_ingest_foreach_batch,
        read_fingerprints,
        seed_fingerprints,
    )

    state = str(tmp_path / "st")
    seed_fingerprints(
        state, _fp_batch(spark, [(0, 7777)]), hash_col="dhash"
    )
    fn = neardup_ingest_foreach_batch(state, _IDENT_HASH, bit_width=56)
    fn(_fp_batch(spark, [(1, 7777 ^ 0b1), (2, 12345)]), 0)  # 1 near seed
    acc = [
        r["doc_id"]
        for r in spark.read.parquet(
            os.path.join(state, "accepted", "e0")
        ).collect()
    ]
    assert acc == [2]
    fn(_fp_batch(spark, [(3, 54321)]), 1)
    stats = compact_fingerprint_state(spark, state)
    assert stats["folded_epochs"] == 2 and stats["through"] == 1
    assert os.path.isdir(os.path.join(state, "fingerprints", "base-1"))
    fps = {r["fp"] for r in read_fingerprints(spark, state).collect()}
    assert fps == {7777, 7777 ^ 0b1, 12345, 54321}
    fn(_fp_batch(spark, [(9, 99999)]), 1)  # replay across the boundary
    assert not os.path.isdir(os.path.join(state, "fingerprints", "e1"))
    fn(_fp_batch(spark, [(4, 12345 ^ 0b10)]), 2)  # near a compacted fp
    assert spark.read.parquet(
        os.path.join(state, "accepted", "e2")
    ).isEmpty()


def test_neardup_gate_audio_modality_e2e(spark, tmp_path):
    """hash_fn genericity E2E: the SAME gate runs the audio modality —
    audio_dhash fingerprints arriving PCM blobs (56-bit contour hash),
    a later batch's near-identical clip (one sample nudged) is dropped
    against the committed state without re-reading any stored blob."""
    import hashlib
    import os

    from kafka_dbsync_spark.operators.admission import (
        neardup_ingest_foreach_batch,
    )
    from kafka_dbsync_spark.operators.multimodal import audio_dhash

    def clip(tag):  # 8 DISTINCT md5 blocks -> aperiodic contour (r9 lesson)
        return b"".join(
            hashlib.md5(f"{tag}:{i}".encode()).digest() for i in range(15)
        )[: 4 * 57]

    base = clip("song")
    tweaked = bytearray(base)
    tweaked[9] = (tweaked[9] + 1) % 256  # nudge one sample
    state = str(tmp_path / "st")
    fn = neardup_ingest_foreach_batch(
        state,
        hash_fn=lambda df: audio_dhash(df, "doc_id", "blob"),
        hash_col="ahash",
        bit_width=56,
    )
    fn(
        spark.createDataFrame(
            [(1, base), (2, clip("other"))], "doc_id long, blob binary"
        ),
        0,
    )
    fn(
        spark.createDataFrame(
            [(3, bytes(tweaked)), (4, clip("third"))],
            "doc_id long, blob binary",
        ),
        1,
    )
    acc1 = [
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(state, "accepted", "e1")).collect()
    ]
    assert acc1 == [4]
    dup = spark.read.parquet(os.path.join(state, "duplicates", "e1")).head()
    assert dup["doc_id"] == 3 and dup["dup_reason"] == "previously_seen_neardup"


def test_neardup_gate_embedding_modality_e2e(spark, tmp_path):
    """hash_fn genericity E2E, third fingerprint domain: the SAME gate
    admits/drops EMBEDDINGS via a 48-plane cosine SimHash
    (similarity.with_lsh_buckets) — a later batch's exact re-id'd copy
    (hamming 0) and a sign-preserving rescale of a stored vector
    (hamming 0: positive scaling never flips a hyperplane side) both
    drop against hash-only state; an orthogonal-ish fresh vector
    admits. No stored vector is ever re-read."""
    import os

    from kafka_dbsync_spark.operators.admission import (
        neardup_ingest_foreach_batch,
    )
    from kafka_dbsync_spark.operators.similarity import with_lsh_buckets

    def vec(seed, dim=64):
        # deterministic, engine-free pseudo-vector
        import hashlib

        return [
            (int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:4], 16) % 2001 - 1000)
            / 1000.0
            for d in range(dim)
        ]

    v1, v2, v3 = vec("a"), vec("b"), vec("c")
    state = str(tmp_path / "st")
    fn = neardup_ingest_foreach_batch(
        state,
        hash_fn=lambda df: with_lsh_buckets(
            df, "embedding", 48, 64, out_col="simhash"
        ).select("vec_id", "simhash"),
        id_col="vec_id",
        hash_col="simhash",
        bit_width=48,
        bands=4,
        hamming_max=3,
    )
    fn(
        spark.createDataFrame(
            [(1, v1), (2, v2)], "vec_id long, embedding array<double>"
        ),
        0,
    )
    scaled = [x * 2.0 for x in v1]  # cosine 1.0 with v1, new id
    fn(
        spark.createDataFrame(
            [(3, scaled), (4, v3), (5, v2)],
            "vec_id long, embedding array<double>",
        ),
        1,
    )
    acc1 = sorted(
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(state, "accepted", "e1")).collect()
    )
    assert acc1 == [4]
    dups = {
        r["vec_id"]: r["dup_reason"]
        for r in spark.read.parquet(
            os.path.join(state, "duplicates", "e1")
        ).collect()
    }
    assert dups == {
        3: "previously_seen_neardup",
        5: "previously_seen_neardup",
    }

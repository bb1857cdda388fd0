"""Persisted IVF-PQ index (operators/pq_index.py): build-once/serve-many
must equal the fused single-lineage queries, and the serving plan must
prune the codes scan to the probed cells."""

import os

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.pq_index import (
    ARTIFACTS,
    build_pq_index,
    index_is_built,
    index_path_for,
    index_summary,
    ivfpq_search_index,
    pq_adc_search_index,
)
from kafka_dbsync_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqidx") / "sf0001")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    build_pq_index(spark, emb, cents, path)
    return path


def test_marker_and_artifacts(built, spark):
    assert index_is_built(built)
    for a in ARTIFACTS:
        assert os.path.isdir(f"{built}/{a}")
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    rows = {r["artifact"]: r["n_rows"] for r in index_summary(spark, built).collect()}
    assert rows["codes"] == n and rows["flat_codes"] == n
    assert rows["pq_codebooks"] == rows["flat_codebooks"] == 8 * 16 * 8


def test_codes_partitioned_by_cell(built, spark):
    # the physical layout IS the index: one directory per coarse cell
    cells = [d for d in os.listdir(f"{built}/codes") if d.startswith("centroid_id=")]
    assert len(cells) >= 2


def test_served_equals_fused_ivfpq(built, spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    served = [tuple(r) for r in ivfpq_search_index(spark, built, qv).collect()]
    fused = [tuple(r) for r in QUERIES["ivfpq_search"](spark, SF).collect()]
    assert served == fused


def test_served_equals_fused_adc(built, spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    served = [tuple(r) for r in pq_adc_search_index(spark, built, qv).collect()]
    fused = [tuple(r) for r in QUERIES["pq_adc_search"](spark, SF).collect()]
    assert served == fused


def test_serving_plan_prunes_partitions(built, spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    plan = (
        ivfpq_search_index(spark, built, qv, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the codes FileScan must carry a PartitionFilters IN-list (the probe)
    assert "PartitionFilters: [centroid_id" in plan.replace("#", " #").replace(
        "  ", " "
    ) or "PartitionFilters: [centroid_id" in plan
    # and NO train-time aggregation of the data side: the only HashAggregate
    # allowed is the tiny broadcast codebook restructure
    scan_lines = [ln for ln in plan.splitlines() if "/codes]" in ln]
    assert scan_lines and all("IN (" in ln for ln in scan_lines)


def test_rebuild_is_idempotent(built, spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    build_pq_index(spark, emb, cents, built)  # overwrite in place
    rows = {r["artifact"]: r["n_rows"] for r in index_summary(spark, built).collect()}
    assert rows["codes"] == emb.count()


def test_index_path_is_per_dataset():
    a = index_path_for("/root/testdata/sf0.001")
    b = index_path_for("/root/testdata/sf0.01")
    assert a != b and a.endswith("sf0.001") and b.endswith("sf0.01")


def test_add_encodes_with_frozen_quantizers(spark, tmp_path):
    """pq_index_add (FAISS add()): new vectors append to the codes
    partitions encoded with the STORED codebooks — the codebook and
    centroid artifacts must be byte-identical after the add, the code
    count must grow by exactly the added rows, and an added vector must
    be findable by the served search."""
    import os as _os

    from kafka_dbsync_spark.operators.pq_index import pq_index_add
    from kafka_dbsync_spark.queries import QUERIES

    path = str(tmp_path / "growidx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 != 0)
    cents = QUERIES["ivf_centroids"](spark, SF)
    build_pq_index(spark, even, cents, path)

    def artifact_files(a):
        d = f"{path}/{a}"
        return {
            f: _os.path.getmtime(_os.path.join(d, f))
            for f in _os.listdir(d)
            if f.endswith(".parquet")
        }

    cb_before = artifact_files("pq_codebooks")
    fcb_before = artifact_files("flat_codebooks")
    n_before = spark.read.parquet(f"{path}/codes").count()

    pq_index_add(spark, path, odd)

    assert artifact_files("pq_codebooks") == cb_before      # frozen
    assert artifact_files("flat_codebooks") == fcb_before   # frozen
    n_after = spark.read.parquet(f"{path}/codes").count()
    assert n_after == n_before + odd.count()
    assert spark.read.parquet(f"{path}/flat_codes").count() == emb.count()
    # an ADDED (odd) vector is its own nearest neighbor in the grown index
    target = odd.select("vec_id").orderBy("vec_id").head()["vec_id"]
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == target).head()["embedding"]]
    top = ivfpq_search_index(spark, path, qv, nprobe=2, k_top=5).collect()
    assert any(r["vec_id"] == target for r in top)


def test_served_search_nprobe_exceeding_cells(built, spark):
    """nprobe larger than the cell count degrades gracefully to an
    all-cell scan (select_probe_cells returns every cell once)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    top = ivfpq_search_index(spark, built, qv, nprobe=1000, k_top=10).collect()
    assert len(top) == 10
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)


def test_stale_index_detected_after_dataset_regeneration(spark, tmp_path):
    """VERDICT r4 #5: the _COMPLETE marker records a dataset
    fingerprint; a dataset regenerated in place must invalidate the
    cached index (index_is_built False under the new fingerprint) and a
    rebuild must serve the NEW data — never stale codes."""
    from kafka_dbsync_spark.operators.pq_index import dataset_fingerprint

    ds = str(tmp_path / "data.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    emb.filter(F.col("vec_id") < 200).write.parquet(ds)
    cents = QUERIES["ivf_centroids"](spark, SF)
    path = str(tmp_path / "idx")

    d1 = spark.read.parquet(ds)
    build_pq_index(spark, d1, cents, path)
    assert index_is_built(path, dataset_fingerprint(d1))

    # regenerate the dataset in place: different rows, same location
    emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 400)).write.mode(
        "overwrite"
    ).parquet(ds)
    d2 = spark.read.parquet(ds)
    fp2 = dataset_fingerprint(d2)
    assert not index_is_built(path, fp2)        # stale detected
    assert index_is_built(path)                 # marker itself still there

    build_pq_index(spark, d2, cents, path)
    assert index_is_built(path, fp2)
    ids = {r["vec_id"] for r in spark.read.parquet(f"{path}/codes").collect()}
    assert ids == {r["vec_id"] for r in d2.collect()}   # serves NEW data


def test_crash_mid_rebuild_leaves_no_marker(spark, tmp_path, monkeypatch):
    """ADVICE r4: the marker is removed before a rebuild starts, so a
    crash mid-rebuild cannot leave a stale marker over mixed-generation
    artifacts."""
    import kafka_dbsync_spark.operators.pq_index as m

    path = str(tmp_path / "crashidx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    cents = QUERIES["ivf_centroids"](spark, SF)
    build_pq_index(spark, emb, cents, path)
    assert index_is_built(path)

    real_codebooks = m.pq_codebooks

    def boom(*a, **kw):
        raise RuntimeError("simulated crash mid-rebuild")

    monkeypatch.setattr(m, "pq_codebooks", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_pq_index(spark, emb, cents, path)
    assert not index_is_built(path)             # marker gone, not stale
    monkeypatch.setattr(m, "pq_codebooks", real_codebooks)
    build_pq_index(spark, emb, cents, path)     # recovery: full rebuild
    assert index_is_built(path)


def test_multi_query_search_equals_per_query(built, spark):
    """Batched serving must return, per query, EXACTLY the single-query
    answer — the amortized scan is an execution detail, not a semantics
    change."""
    from kafka_dbsync_spark.operators.pq_index import ivfpq_search_multi_index

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qs = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id").isin([0, 5, 11]))
        .select("vec_id", "embedding").collect()
    ]
    multi = ivfpq_search_multi_index(spark, built, qs, nprobe=2, k_top=7)
    got = {}
    for r in multi.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["adc_dist"])
        )
    for qid, qv in qs:
        single = ivfpq_search_index(spark, built, qv, nprobe=2, k_top=7)
        want = [
            (i + 1, r["vec_id"], r["adc_dist"])
            for i, r in enumerate(single.collect())
        ]
        assert sorted(got[qid]) == want, f"query {qid}"


@pytest.fixture(scope="module")
def removable(spark, tmp_path_factory):
    """A private index + the pre-removal top-10, for the erasure tests
    (the shared `built` fixture must never be mutated)."""
    from kafka_dbsync_spark.operators.pq_index import pq_index_remove

    path = str(tmp_path_factory.mktemp("pqrm") / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    build_pq_index(spark, emb, cents, path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    before = ivfpq_search_index(spark, path, qv, k_top=10).collect()
    victims = [int(before[0]["vec_id"]), int(before[2]["vec_id"])]
    stats = pq_index_remove(spark, path, victims)
    return path, qv, before, victims, stats


def test_remove_erases_from_single_and_flat_search(removable, spark):
    """The removed vectors never appear in the served IVF search OR the
    flat-PQ search, and every surviving neighbor keeps its relative
    order — removal only deletes candidates, never rescores."""
    path, qv, before, victims, stats = removable
    assert stats["vectors_removed"] == 2
    assert 1 <= stats["cells_rewritten"] <= 2
    after = ivfpq_search_index(spark, path, qv, k_top=10).collect()
    got = [r["vec_id"] for r in after]
    assert not set(victims) & set(got)
    surviving_before = [r["vec_id"] for r in before if r["vec_id"] not in victims]
    assert got[: len(surviving_before)] == surviving_before
    flat = [r["vec_id"] for r in pq_adc_search_index(spark, path, qv).collect()]
    assert not set(victims) & set(flat)


def test_remove_erases_from_multi_and_refined(removable, spark):
    from kafka_dbsync_spark.operators.pq_index import (
        ivfpq_search_multi_index,
        ivfpq_search_refined_index,
    )

    path, qv, _, victims, _ = removable
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    multi = ivfpq_search_multi_index(spark, path, [(0, qv)], k_top=10).collect()
    assert multi and not set(victims) & {r["vec_id"] for r in multi}
    # the refined re-rank draws candidates from the INDEX, so the
    # removed vector stays gone even though the raw table still has it
    ref = ivfpq_search_refined_index(spark, path, emb, qv, k_top=10).collect()
    assert ref and not set(victims) & {r["vec_id"] for r in ref}


def test_remove_quantizers_frozen_and_staleness_contract(removable, spark):
    """Quantizers are untouched (FAISS remove_ids semantics); the index
    intentionally fails the source-table staleness check (a rebuild
    would resurrect the vectors) but validates via
    index_serves_removal with the exact removal set."""
    import json

    from kafka_dbsync_spark.operators.pq_index import (
        index_is_current,
        index_serves_removal,
    )

    path, _, _, victims, _ = removable
    with open(os.path.join(path, "_COMPLETE")) as f:
        rec = json.load(f)
    assert rec["removed_ids"] == sorted(victims)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = spark.read.parquet(f"{path}/codes").count()
    assert n == emb.count() - 2
    assert spark.read.parquet(f"{path}/flat_codes").count() == n
    # quantizer artifacts byte-identical would be overkill; row counts
    # and the marker's silence about them prove no retrain ran
    assert spark.read.parquet(f"{path}/pq_codebooks").count() == 8 * 16 * 8
    assert not index_is_current(path, None, emb)
    assert index_serves_removal(path, None, victims)
    assert not index_serves_removal(path, None, victims + [999999])


def test_remove_touches_only_affected_cells(spark, tmp_path):
    """The codes rewrite is per-partition: cell directories that hold no
    removed vector keep their exact file listing (same names, same
    bytes) — the 100 TB cost bound."""
    from kafka_dbsync_spark.operators.pq_index import pq_index_remove

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_pq_index(spark, emb, QUERIES["ivf_centroids"](spark, SF), path)
    victim = int(
        spark.read.parquet(f"{path}/codes").select("vec_id").head()["vec_id"]
    )
    vcell = int(
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("vec_id") == victim)
        .select("centroid_id").head()["centroid_id"]
    )

    def listing(cell_dir):
        return sorted(
            (f, os.path.getsize(os.path.join(cell_dir, f)), os.path.getmtime(os.path.join(cell_dir, f)))
            for f in os.listdir(cell_dir)
        )

    cells = {
        d: listing(os.path.join(path, "codes", d))
        for d in os.listdir(f"{path}/codes")
        if d.startswith("centroid_id=")
    }
    pq_index_remove(spark, path, [victim])
    for d, before in cells.items():
        cur = listing(os.path.join(path, "codes", d))
        if d == f"centroid_id={vcell}":
            assert cur != before
        else:
            assert cur == before, f"untouched cell {d} was rewritten"


def test_remove_refuses_without_marker_and_rejects_empty(spark, tmp_path):
    from kafka_dbsync_spark.operators.pq_index import pq_index_remove

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_pq_index(spark, emb, QUERIES["ivf_centroids"](spark, SF), path)
    with pytest.raises(ValueError, match="non-empty"):
        pq_index_remove(spark, path, [])
    os.remove(os.path.join(path, "_COMPLETE"))
    with pytest.raises(ValueError, match="no complete index"):
        pq_index_remove(spark, path, [0])


def test_remove_crash_window_leaves_index_invalid(spark, tmp_path, monkeypatch):
    """Marker OUT before the rewrite, back IN only after every artifact
    lands: a crash mid-removal leaves the index unmistakably incomplete
    (index_is_built False), never silently half-rewritten; recovery is
    a rebuild + re-remove."""
    import kafka_dbsync_spark.operators.pq_index as m

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    build_pq_index(spark, emb, cents, path)

    real_fp = m.dataset_fingerprint

    def boom(*a, **kw):
        raise RuntimeError("simulated crash mid-removal")

    monkeypatch.setattr(m, "dataset_fingerprint", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        m.pq_index_remove(spark, path, [0])
    assert not index_is_built(path)
    monkeypatch.setattr(m, "dataset_fingerprint", real_fp)
    build_pq_index(spark, emb, cents, path)
    stats = m.pq_index_remove(spark, path, [0])
    assert stats["vectors_removed"] == 1


def test_remove_replay_is_noop(spark, tmp_path):
    """Removing the same ids again removes nothing and leaves the
    served answer byte-identical — the idempotence a retried takedown
    job relies on."""
    from kafka_dbsync_spark.operators.pq_index import pq_index_remove

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_pq_index(spark, emb, QUERIES["ivf_centroids"](spark, SF), path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    first = pq_index_remove(spark, path, [0, 1])
    assert first["vectors_removed"] == 2
    a1 = [tuple(r) for r in ivfpq_search_index(spark, path, qv).collect()]
    again = pq_index_remove(spark, path, [0, 1])
    assert again == {"vectors_removed": 0, "cells_rewritten": 0}
    a2 = [tuple(r) for r in ivfpq_search_index(spark, path, qv).collect()]
    assert a1 == a2


def test_compact_folds_added_files_and_preserves_answers(spark, tmp_path):
    """pq_index_compact: after several pq_index_add batches, cell dirs
    hold O(batches) files; compaction folds them to one per cell with
    BYTE-IDENTICAL served answers, a preserved marker record, and a
    replay no-op. Crash discipline: marker out during the rewrite."""
    import json

    from kafka_dbsync_spark.operators.pq_index import (
        pq_index_add,
        pq_index_compact,
    )

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 4 == 0)
    build_pq_index(spark, base, QUERIES["ivf_centroids"](spark, SF), path)
    for m in (1, 2, 3):
        pq_index_add(spark, path, emb.filter(F.col("vec_id") % 4 == m))
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    before_ans = [tuple(r) for r in ivfpq_search_index(spark, path, qv).collect()]
    with open(os.path.join(path, "_COMPLETE")) as f:
        before_rec = json.load(f)

    stats = pq_index_compact(spark, path)
    assert stats["code_files_after"] < stats["code_files_before"]
    cells = [d for d in os.listdir(f"{path}/codes") if d.startswith("centroid_id=")]
    for d in cells:
        n = sum(1 for x in os.listdir(f"{path}/codes/{d}") if x.endswith(".parquet"))
        assert n == 1, d
    after_ans = [tuple(r) for r in ivfpq_search_index(spark, path, qv).collect()]
    assert after_ans == before_ans
    flat = [tuple(r) for r in pq_adc_search_index(spark, path, qv).collect()]
    assert len(flat) == 10
    with open(os.path.join(path, "_COMPLETE")) as f:
        assert json.load(f) == before_rec     # record preserved verbatim
    again = pq_index_compact(spark, path)
    assert again["code_files_after"] == again["code_files_before"]


def test_compact_refuses_without_marker_and_crash_leaves_invalid(
    spark, tmp_path, monkeypatch
):
    """Compacting an incomplete index refuses; a crash during the
    rewrite (simulated at the coalesce) leaves NO marker — the index is
    unmistakably invalid, never half-compacted under a live marker."""
    from pyspark.sql.classic.dataframe import DataFrame as _DF

    import kafka_dbsync_spark.operators.pq_index as m
    from kafka_dbsync_spark.operators.pq_index import pq_index_add

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, path)
    marker = os.path.join(path, "_COMPLETE")
    os.remove(marker)
    with pytest.raises(ValueError, match="no complete index"):
        m.pq_index_compact(spark, path)

    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, path)
    pq_index_add(spark, path, emb.filter(F.col("vec_id") % 2 != 0))

    def boom(self, *a, **kw):
        raise RuntimeError("simulated crash mid-compaction")

    monkeypatch.setattr(_DF, "coalesce", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        m.pq_index_compact(spark, path)
    monkeypatch.undo()
    assert not index_is_built(path)
    # recovery: rebuild + recompact
    build_pq_index(spark, emb, cents, path)
    assert index_is_built(path)


def test_streaming_ingest_exactly_once_and_crash_replay(spark, tmp_path, monkeypatch):
    """pq_index_ingest_foreach_batch: a redelivered committed epoch is
    a no-op; a crash MID-MOVE (after some cell files landed) replays to
    exactly one copy of the epoch's rows (deterministic epoch-tagged
    names — the plain pq_index_add append would duplicate them); the
    served search finds streamed vectors; the marker fingerprint
    reflects the final codes exactly once."""
    import json

    import kafka_dbsync_spark.operators.pq_index as m

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 != 0)
    build_pq_index(spark, even, QUERIES["ivf_centroids"](spark, SF), path)
    fn = m.pq_index_ingest_foreach_batch(path)

    # crash mid-move: let the first two cells land, then die
    real_move = m._move_epoch_files
    calls = {"n": 0}

    def flaky(staging_cell, target_cell, prefix):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated crash mid-move")
        real_move(staging_cell, target_cell, prefix)

    monkeypatch.setattr(m, "_move_epoch_files", flaky)
    with pytest.raises(RuntimeError, match="simulated crash"):
        fn(odd, 1)
    monkeypatch.setattr(m, "_move_epoch_files", real_move)
    assert not m._ingest_committed(path, 1)       # no commit marker
    fn(odd, 1)                                    # replay converges
    n = spark.read.parquet(f"{path}/codes").count()
    assert n == emb.count()                       # exactly one copy each
    assert spark.read.parquet(f"{path}/flat_codes").count() == n
    # redelivery of the committed epoch: no-op
    fn(odd, 1)
    assert spark.read.parquet(f"{path}/codes").count() == n
    with open(os.path.join(path, "_COMPLETE")) as f:
        rec = json.load(f)
    from kafka_dbsync_spark.operators.pq_index import dataset_fingerprint

    assert rec["fingerprint"] == dataset_fingerprint(
        spark.read.parquet(f"{path}/codes")
    )
    # a streamed (odd) vector is its own nearest neighbor now
    target = int(odd.select("vec_id").orderBy("vec_id").head()["vec_id"])
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == target).head()["embedding"]]
    top = ivfpq_search_index(spark, path, qv, nprobe=2, k_top=5).collect()
    assert any(r["vec_id"] == target for r in top)


def test_streaming_ingest_refuses_unbuilt_and_compacts(spark, tmp_path):
    """Ingest into an unbuilt index refuses; compact_every folds the
    per-epoch files back to one per cell with answers preserved."""
    import kafka_dbsync_spark.operators.pq_index as m

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    with pytest.raises(ValueError, match="build_pq_index"):
        m.pq_index_ingest_foreach_batch(path)(emb.limit(1), 0)
    build_pq_index(
        spark, emb.filter(F.col("vec_id") % 3 == 0),
        QUERIES["ivf_centroids"](spark, SF), path,
    )
    fn = m.pq_index_ingest_foreach_batch(path, compact_every=2)
    fn(emb.filter(F.col("vec_id") % 3 == 1), 1)
    fn(emb.filter(F.col("vec_id") % 3 == 2), 2)   # triggers compaction
    cells = [d for d in os.listdir(f"{path}/codes") if d.startswith("centroid_id=")]
    for d in cells:
        files = [x for x in os.listdir(f"{path}/codes/{d}") if x.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    assert spark.read.parquet(f"{path}/codes").count() == emb.count()
    # replay of a compacted-away epoch is STILL a no-op (marker-based)
    fn(emb.filter(F.col("vec_id") % 3 == 1), 1)
    assert spark.read.parquet(f"{path}/codes").count() == emb.count()


def test_remove_refuses_all_vectors_takedown(spark, tmp_path):
    """ADVICE r8: removing EVERY vector would rmtree all cell dirs and
    then die on the schema-less fingerprint read AFTER the marker was
    already gone. The all-removed case must refuse BEFORE invalidating
    anything, with a descriptive error, leaving the index valid."""
    from kafka_dbsync_spark.operators.pq_index import pq_index_remove

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_pq_index(spark, emb, QUERIES["ivf_centroids"](spark, SF), path)
    all_ids = [int(r["vec_id"]) for r in emb.select("vec_id").collect()]
    with pytest.raises(ValueError, match="every vector"):
        pq_index_remove(spark, path, all_ids)
    assert index_is_built(path)          # marker untouched
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    assert len(ivfpq_search_index(spark, path, qv).collect()) == 10


def test_compact_refuses_pending_ingest_epoch(spark, tmp_path):
    """ADVICE r8 (medium): epoch-tagged files whose ingest/e{N}/_SUCCESS
    is missing (crash before commit) must BLOCK compaction — folding
    them into untagged part files would make the replay's
    delete-by-prefix miss them and duplicate the epoch's rows. Leftover
    staging dirs block too; committed residue does not."""
    from kafka_dbsync_spark.operators.pq_index import (
        pq_index_compact,
        pq_index_ingest_foreach_batch,
    )

    path = str(tmp_path / "idx")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_pq_index(
        spark, emb.filter(F.col("vec_id") % 2 == 0),
        QUERIES["ivf_centroids"](spark, SF), path,
    )
    fn = pq_index_ingest_foreach_batch(path)
    fn(emb.filter(F.col("vec_id") % 2 != 0), 1)
    # committed epoch residue compacts fine
    stats = pq_index_compact(spark, path)
    assert stats["code_files_after"] <= stats["cells"]
    # re-ingest an epoch, then simulate a crash BEFORE its commit
    fn(emb.filter((F.col("vec_id") % 2 != 0) & (F.col("vec_id") < 50)), 2)
    os.remove(os.path.join(path, "ingest", "e2", "_SUCCESS"))
    with pytest.raises(ValueError, match="uncommitted streaming-ingest"):
        pq_index_compact(spark, path)
    assert index_is_built(path)          # refusal left the marker alone
    # a leftover staging dir for an uncommitted epoch also blocks
    os.makedirs(os.path.join(path, "ingest", "e2"), exist_ok=True)
    open(os.path.join(path, "ingest", "e2", "_SUCCESS"), "w").close()
    os.makedirs(os.path.join(path, ".ingest_e3"), exist_ok=True)
    with pytest.raises(ValueError, match=r"\[3\]"):
        pq_index_compact(spark, path)
    os.rmdir(os.path.join(path, ".ingest_e3"))
    pq_index_compact(spark, path)        # clean state compacts again


# ---------------------------------------------------------------------------
# Shard merge (build_pq_shard / pq_index_merge) — VERDICT r8 #4
# ---------------------------------------------------------------------------
def test_merge_equals_add_grown_index(spark, tmp_path):
    """search-over-merged ≡ search-over-union: the merged index serves
    BYTE-IDENTICAL answers (all four search forms' substrate) to an
    index grown by pq_index_add with the same quantizers."""
    from kafka_dbsync_spark.operators.pq_index import (
        build_pq_shard,
        pq_index_add,
        pq_index_merge,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 != 0)
    cents = QUERIES["ivf_centroids"](spark, SF)
    merged, grown = str(tmp_path / "m"), str(tmp_path / "g")
    build_pq_index(spark, even, cents, merged)
    build_pq_index(spark, even, cents, grown)
    shard = str(tmp_path / "shard")
    build_pq_shard(spark, merged, odd, shard)
    stats = pq_index_merge(spark, merged, shard)
    assert stats["vectors_merged"] == odd.count()
    pq_index_add(spark, grown, odd)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    a = [tuple(r) for r in ivfpq_search_index(spark, merged, qv).collect()]
    b = [tuple(r) for r in ivfpq_search_index(spark, grown, qv).collect()]
    assert a == b and len(a) == 10
    fa = [tuple(r) for r in pq_adc_search_index(spark, merged, qv).collect()]
    fb = [tuple(r) for r in pq_adc_search_index(spark, grown, qv).collect()]
    assert fa == fb
    # the shard (read-only input) is untouched and still complete
    assert index_is_built(shard)


def test_merge_refuses_quantizer_mismatch_and_incomplete(spark, tmp_path):
    """Shards trained with DIFFERENT quantizers are incommensurable —
    merge must refuse (FAISS merge_from precondition); so must a merge
    where either side lacks its completeness marker."""
    from kafka_dbsync_spark.operators.pq_index import pq_index_merge

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, a)
    # b trains its own quantizers on a different slice -> different sig
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 != 0), cents, b)
    with pytest.raises(ValueError, match="quantizer mismatch"):
        pq_index_merge(spark, a, b)
    assert index_is_built(a)  # refusal left the destination valid
    os.remove(os.path.join(b, "_COMPLETE"))
    with pytest.raises(ValueError, match="no complete index"):
        pq_index_merge(spark, a, b)


def test_merge_refuses_pending_src_ingest_and_repeated_merges(spark, tmp_path):
    """A source with uncommitted streaming-ingest residue is refused
    (its rows are not owned by any commit); distinct shards merge in
    sequence under distinct m{K}- prefixes."""
    from kafka_dbsync_spark.operators.pq_index import (
        build_pq_shard,
        pq_index_ingest_foreach_batch,
        pq_index_merge,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base = str(tmp_path / "base")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 3 == 0), cents, base)
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_pq_shard(spark, base, emb.filter(F.col("vec_id") % 3 == 1), s1)
    build_pq_shard(spark, base, emb.filter(F.col("vec_id") % 3 == 2), s2)
    # plant uncommitted ingest residue in s2 (a NEW id — merge also
    # enforces id-disjointness, so the residue must not collide)
    fn = pq_index_ingest_foreach_batch(s2)
    fn(
        emb.filter(F.col("vec_id") == 1)
        .withColumn("vec_id", F.lit(100_000).cast("long"))
        .select(emb.columns),
        7,
    )
    os.remove(os.path.join(s2, "ingest", "e7", "_SUCCESS"))
    with pytest.raises(ValueError, match="uncommitted streaming-ingest"):
        pq_index_merge(spark, base, s2)
    # commit it; both merges land, total covers the whole table (+1 for
    # the new vector ingested into s2)
    os.makedirs(os.path.join(s2, "ingest", "e7"), exist_ok=True)
    open(os.path.join(s2, "ingest", "e7", "_SUCCESS"), "w").close()
    pq_index_merge(spark, base, s1)
    pq_index_merge(spark, base, s2)
    n = spark.read.parquet(f"{base}/codes").count()
    assert n == emb.count() + 1
    import json

    with open(os.path.join(base, "_COMPLETE")) as f:
        assert json.load(f)["merges"] == 2


def test_merge_crash_window_leaves_dst_invalid(spark, tmp_path, monkeypatch):
    """Marker OUT before the first copy: a crash mid-merge leaves the
    destination unmistakably incomplete, never silently half-merged."""
    import kafka_dbsync_spark.operators.pq_index as m

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, base)
    m.build_pq_shard(spark, base, emb.filter(F.col("vec_id") % 2 != 0), shard)

    real = m.dataset_fingerprint

    def boom(*a, **kw):
        raise RuntimeError("simulated crash mid-merge")

    monkeypatch.setattr(m, "dataset_fingerprint", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        m.pq_index_merge(spark, base, shard)
    assert not index_is_built(base)
    monkeypatch.setattr(m, "dataset_fingerprint", real)


def test_merge_refuses_resurrecting_removed_vector(spark, tmp_path):
    """Right-to-erasure across shard merges: a destination that removed
    a vector refuses to merge a shard still carrying it (file concat
    would resurrect the vector behind a marker claiming erasure);
    after the shard runs the same takedown, the merge lands and the
    vector stays gone from the served answer."""
    from kafka_dbsync_spark.operators.pq_index import (
        build_pq_shard,
        pq_index_merge,
        pq_index_remove,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, base)
    # the shard deliberately OVERLAPS the base on vec_id 0 (even)
    build_pq_shard(
        spark, base, emb.filter((F.col("vec_id") % 2 != 0) | (F.col("vec_id") == 0)), shard
    )
    pq_index_remove(spark, base, [0])
    with pytest.raises(ValueError, match="resurrect"):
        pq_index_merge(spark, base, shard)
    assert index_is_built(base)          # refusal left the dst valid
    pq_index_remove(spark, shard, [0])   # takedown reaches the shard
    pq_index_merge(spark, base, shard)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    got = {r["vec_id"] for r in ivfpq_search_index(spark, base, qv).collect()}
    assert 0 not in got and len(got) == 10


def test_merge_refuses_overlapping_vec_ids(spark, tmp_path):
    """Id-disjointness contract (ADVICE r9): per-cell concatenation is
    a row UNION, so a vec_id present on both sides would be served
    TWICE after the merge — the probe refuses before any file moves
    and leaves the destination valid."""
    from kafka_dbsync_spark.operators.pq_index import (
        build_pq_shard,
        pq_index_merge,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, base)
    # shard carries the odds PLUS one even id the base already serves
    build_pq_shard(
        spark,
        base,
        emb.filter((F.col("vec_id") % 2 != 0) | (F.col("vec_id") == 42)),
        shard,
    )
    with pytest.raises(ValueError, match="share vector id"):
        pq_index_merge(spark, base, shard)
    assert index_is_built(base)  # refusal before the marker came out
    n = spark.read.parquet(f"{base}/codes").count()
    assert n == emb.filter(F.col("vec_id") % 2 == 0).count()


def test_merge_refuses_unhonored_source_erasure(spark, tmp_path):
    """Mirror of the resurrection guard (ADVICE r9): the SOURCE's
    removed_ids union into the destination marker — if the destination
    still SERVES one of them, the merged index would claim an erasure
    it does not honor. Refused until the destination runs the takedown."""
    from kafka_dbsync_spark.operators.pq_index import (
        build_pq_shard,
        pq_index_merge,
        pq_index_remove,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, base)
    # shard initially carries odds + even id 42, then takes 42 down:
    # its marker records the removal, its codes no longer carry it
    build_pq_shard(
        spark,
        base,
        emb.filter((F.col("vec_id") % 2 != 0) | (F.col("vec_id") == 42)),
        shard,
    )
    pq_index_remove(spark, shard, [42])
    with pytest.raises(ValueError, match="still serves"):
        pq_index_merge(spark, base, shard)
    assert index_is_built(base)
    pq_index_remove(spark, base, [42])   # honor the erasure on the dst
    pq_index_merge(spark, base, shard)
    import json as _json

    with open(os.path.join(base, "_COMPLETE")) as f:
        assert 42 in _json.load(f)["removed_ids"]
    assert (
        spark.read.parquet(f"{base}/codes")
        .filter(F.col("vec_id") == 42)
        .isEmpty()
    )


def test_quantizer_signature_position_sensitive(spark, tmp_path):
    """ADVICE r9: (count, sum) alone is permutation-insensitive — two
    quantizers whose values swap across positions must NOT pass the
    merge-compatibility guard. The xor-of-row-hashes component catches
    the permutation while staying invariant to partitioning/row order."""
    from kafka_dbsync_spark.operators.pq_index import quantizer_signature

    def write(path, cent_rows, shuffle_partitions):
        cents = spark.createDataFrame(
            cent_rows, "label int, dim int, centroid double"
        ).repartition(shuffle_partitions)
        cents.write.mode("overwrite").parquet(f"{path}/centroids")
        cb = spark.createDataFrame(
            [(0, 0, 1, 0.5), (0, 1, 1, 0.25)], "m int, code int, dim int, cw double"
        )
        cb.write.mode("overwrite").parquet(f"{path}/pq_codebooks")
        cb.write.mode("overwrite").parquet(f"{path}/flat_codebooks")

    a, b, c = (str(tmp_path / x) for x in "abc")
    rows = [(0, 1, 1.0), (0, 2, 3.0)]
    write(a, rows, 1)
    write(b, [(0, 1, 3.0), (0, 2, 1.0)], 1)   # permuted: same count+sum
    write(c, list(reversed(rows)), 4)          # same data, reordered
    sig_a = quantizer_signature(spark, a)
    assert sig_a != quantizer_signature(spark, b)
    assert sig_a == quantizer_signature(spark, c)


# ---------------------------------------------------------------------------
# id digest: metadata-cheap merge guards (VERDICT r10 #3)
# ---------------------------------------------------------------------------


def test_id_digest_helpers_exact_absence_and_or():
    """The Python bloom helpers: membership never false-negatives, OR
    composes, interval bounds are exact, and absence outside the
    interval needs no bitmap read."""
    import kafka_dbsync_spark.operators.pq_index as m

    # hand-built digests (no Spark): set positions via the py hasher
    def mk(ids):
        bm = bytearray(m._DIGEST_M // 8)
        res = 0
        for i in ids:
            res |= 1 << (i % 64)
            for p in m._digest_positions_py(i):
                bm[p >> 3] |= 1 << (p & 7)
        import base64
        import zlib

        return {
            "m": m._DIGEST_M,
            "k": m._DIGEST_K,
            "min": min(ids),
            "max": max(ids),
            "res64": res,
            "bloom": base64.b64encode(zlib.compress(bytes(bm))).decode(),
        }

    a = mk([2, 4, 6, 8])
    bm_a = m._digest_bitmap(a)
    assert all(m._digest_may_contain(a, bm_a, i) for i in (2, 4, 6, 8))
    assert not m._digest_may_contain(a, bm_a, 100)  # outside interval
    b = mk([101, 103])
    # parity split: residue masks are disjoint even though the
    # intervals interleave — the zero-IO proof the merge guard uses
    assert a["res64"] & b["res64"] == 0
    u = m._digest_or(a, b)
    bm_u = m._digest_bitmap(u)
    assert (u["min"], u["max"]) == (2, 103)
    assert all(
        m._digest_may_contain(u, bm_u, i) for i in (2, 4, 6, 8, 101, 103)
    )
    # legacy-shaped records disable composition, never corrupt it
    assert m._digest_or(a, None) is None
    assert m._digest_or(a, {"m": 64, "k": 2}) is None


def test_digest_rides_markers_through_lifecycle(spark, tmp_path):
    """build, shard-build, add, and merge all keep a usable id_digest in
    the marker; interval hull and bloom membership stay exact through
    the composition."""
    import json

    import kafka_dbsync_spark.operators.pq_index as m

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    odds = emb.filter(F.col("vec_id") % 2 != 0)
    build_pq_index(spark, evens, cents, base)

    def digest(path):
        with open(os.path.join(path, "_COMPLETE")) as f:
            return json.load(f)["id_digest"]

    d = digest(base)
    assert m._digest_usable(d)
    ev = [int(r["vec_id"]) for r in evens.select("vec_id").collect()]
    od = [int(r["vec_id"]) for r in odds.select("vec_id").collect()]
    bm = m._digest_bitmap(d)
    assert all(m._digest_may_contain(d, bm, i) for i in ev)
    assert (d["min"], d["max"]) == (min(ev), max(ev))

    m.build_pq_shard(spark, base, odds, shard)
    ds = digest(shard)
    assert m._digest_usable(ds)
    bms = m._digest_bitmap(ds)
    assert all(m._digest_may_contain(ds, bms, i) for i in od)

    m.pq_index_merge(spark, base, shard)
    dm = digest(base)
    bmm = m._digest_bitmap(dm)
    assert all(m._digest_may_contain(dm, bmm, i) for i in ev + od)
    assert (dm["min"], dm["max"]) == (min(ev + od), max(ev + od))

    # add folds the new ids in
    new = odds.limit(1).withColumn("vec_id", F.lit(999_983).cast("long")).select(
        emb.columns
    )
    m.pq_index_add(spark, base, new)
    da = digest(base)
    bma = m._digest_bitmap(da)
    assert m._digest_may_contain(da, bma, 999_983)
    assert da["max"] == 999_983


def test_merge_guards_without_digests_fall_back_exact(spark, tmp_path):
    """Legacy markers (no id_digest) keep the r10 exact probes: overlap
    still refuses, disjoint sides still merge."""
    import json

    import kafka_dbsync_spark.operators.pq_index as m

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, base)
    m.build_pq_shard(
        spark,
        base,
        emb.filter((F.col("vec_id") % 2 != 0) | (F.col("vec_id") == 42)),
        shard,
    )
    # strip both digests, simulating pre-r11 markers
    for p in (base, shard):
        mk = os.path.join(p, "_COMPLETE")
        with open(mk) as f:
            rec = json.load(f)
        rec.pop("id_digest", None)
        with open(mk, "w") as f:
            json.dump(rec, f)
    with pytest.raises(ValueError, match="share vector id"):
        m.pq_index_merge(spark, base, shard)
    # rebuild the shard id-disjoint (pure odds), digest stripped again
    m.build_pq_shard(spark, base, emb.filter(F.col("vec_id") % 2 != 0), shard)
    mk = os.path.join(shard, "_COMPLETE")
    with open(mk) as f:
        rec = json.load(f)
    rec.pop("id_digest", None)
    with open(mk, "w") as f:
        json.dump(rec, f)
    stats = m.pq_index_merge(spark, base, shard)
    assert stats["vectors_merged"] == emb.filter(
        F.col("vec_id") % 2 != 0
    ).count()
    # merged marker has no digest to record (either side missing -> pop)
    with open(os.path.join(base, "_COMPLETE")) as f:
        assert "id_digest" not in json.load(f)


def test_merge_interval_disjoint_shards(spark, tmp_path):
    """Range-split shards (the 100 TB sharding shape) merge under the
    zero-IO interval proof and still serve the union exactly."""
    import kafka_dbsync_spark.operators.pq_index as m

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    mid = emb.agg(F.expr("percentile(vec_id, 0.5)")).head()[0]
    lo = emb.filter(F.col("vec_id") <= mid)
    hi = emb.filter(F.col("vec_id") > mid)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    build_pq_index(spark, lo, cents, base)
    m.build_pq_shard(spark, base, hi, shard)
    stats = m.pq_index_merge(spark, base, shard)
    assert stats["vectors_merged"] == hi.count()
    assert spark.read.parquet(f"{base}/codes").count() == emb.count()


def test_disjointness_ladder_rungs_never_touch_codes(spark):
    """The metadata rungs of _check_id_disjoint must prove disjointness
    with ZERO IO — pass id thunks that RAISE if ever invoked:
    interval-disjoint and residue-disjoint digests return without
    touching either side; the bloom rung may scan the SOURCE but must
    not read the destination when no suspect survives."""
    import kafka_dbsync_spark.operators.pq_index as m

    def mk(ids):
        import base64
        import zlib

        bm = bytearray(m._DIGEST_M // 8)
        res = 0
        for i in ids:
            res |= 1 << (i % 64)
            for p in m._digest_positions_py(i):
                bm[p >> 3] |= 1 << (p & 7)
        return {
            "m": m._DIGEST_M,
            "k": m._DIGEST_K,
            "min": min(ids),
            "max": max(ids),
            "res64": res,
            "bloom": base64.b64encode(zlib.compress(bytes(bm))).decode(),
        }

    def forbidden():
        raise AssertionError("metadata rung touched the codes")

    # rung 1a: disjoint intervals (residues overlap: both contain 1 mod 64)
    m._check_id_disjoint(
        spark, forbidden, forbidden, mk([1, 2]), mk([65, 70]), "s", "d"
    )
    # rung 1b: interleaved intervals, disjoint residues (even/odd)
    m._check_id_disjoint(
        spark, forbidden, forbidden, mk([2, 100]), mk([1, 99]), "s", "d"
    )
    # rung 2: intervals AND residues overlap, sets disjoint — the bloom
    # rung scans the SOURCE only; the destination thunk must stay cold
    src = spark.createDataFrame([(1,), (130,)], "vec_id bigint")
    m._check_id_disjoint(
        spark, lambda: src, forbidden, mk([1, 130]), mk([65, 194]), "s", "d"
    )
    # true duplicate: the ladder must still refuse (reads both sides)
    dst = spark.createDataFrame([(65,), (130,)], "vec_id bigint")
    import pytest as _pt

    with _pt.raises(ValueError, match="share vector id"):
        m._check_id_disjoint(
            spark,
            lambda: src,
            lambda: dst,
            mk([1, 130]),
            mk([65, 130, 194]),
            "s",
            "d",
        )


def test_fingerprint_and_digest_sums_each_id_once(spark):
    """ADVICE r11: the fused aggregate must overflow exactly where the
    plain ``dataset_fingerprint`` would, not 4x earlier — snowflake-
    scale ids whose sum fits a bigint but whose k-exploded sum does not
    must still fingerprint, and agree with the plain aggregate."""
    import kafka_dbsync_spark.operators.pq_index as m

    big = 1 << 61  # 3 ids sum to 3*2^61 < 2^63; x4 copies would overflow
    df = spark.createDataFrame(
        [(big,), (big + 1,), (big + 2,)], "vec_id bigint"
    )
    fp, digest = m.fingerprint_and_digest(df)
    assert fp == m.dataset_fingerprint(df)
    assert fp["n"] == 3 and fp["sum_id"] == 3 * big + 3
    bm = m._digest_bitmap(digest)
    assert all(
        m._digest_may_contain(digest, bm, i)
        for i in (big, big + 1, big + 2)
    )


def test_add_folds_digest_before_codes_append(spark, tmp_path, monkeypatch):
    """ADVICE r11 crash-window pin: pq_index_add must fold the batch's
    id_digest into the marker BEFORE any code rows land (superset-sound
    under a crash) while the fingerprint must NOT advance until the
    appends complete (a crash must read as stale, never as current-but-
    missing-rows). Simulate the crash by failing the encode step that
    runs after the phase-1 marker write."""
    import json

    import kafka_dbsync_spark.operators.pq_index as m

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    path = str(tmp_path / "idx")
    build_pq_index(spark, emb, cents, path)
    with open(os.path.join(path, "_COMPLETE")) as f:
        before = json.load(f)
    new_id = 999_983
    new = emb.limit(1).withColumn(
        "vec_id", F.lit(new_id).cast("long")
    ).select(emb.columns)

    def boom(*a, **k):
        raise RuntimeError("simulated crash before the codes append")

    monkeypatch.setattr(m, "with_residuals", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        m.pq_index_add(spark, path, new)
    with open(os.path.join(path, "_COMPLETE")) as f:
        after = json.load(f)
    # digest already covers the id whose codes never landed (superset)
    d = after["id_digest"]
    assert m._digest_may_contain(d, m._digest_bitmap(d), new_id)
    # fingerprint still matches the codes actually on disk
    assert after["fingerprint"] == before["fingerprint"]
    assert after["fingerprint"] == m.dataset_fingerprint(
        spark.read.parquet(f"{path}/codes")
    )
    # the interrupted add is retryable once the failure clears
    monkeypatch.undo()
    m.pq_index_add(spark, path, new)
    with open(os.path.join(path, "_COMPLETE")) as f:
        final = json.load(f)
    assert final["fingerprint"] == m.dataset_fingerprint(
        spark.read.parquet(f"{path}/codes")
    )
    assert final["fingerprint"]["n"] == before["fingerprint"]["n"] + 1


def test_bloom_cap_crossover_merge_guards_stay_sound(spark, tmp_path, monkeypatch):
    """r12 bloom cap crossover for the ANN family: with the cap forced
    to 0 every marker digest is bloom-less (the true-scale shape for
    build-sized id sets) — parity-split shards must still merge under
    the zero-IO residue proof (id thunks raise if the rungs touch
    codes, via the refusal path staying un-entered), and a genuine
    overlap must still refuse through the exact semi-join fallback."""
    import json

    import kafka_dbsync_spark.operators.id_digest as dig
    import kafka_dbsync_spark.operators.pq_index as m

    monkeypatch.setattr(dig, "BLOOM_MAX_IDS", 0)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    base, shard = str(tmp_path / "base"), str(tmp_path / "shard")
    evens = emb.filter(F.col("vec_id") % 2 == 0)
    odds = emb.filter(F.col("vec_id") % 2 != 0)
    build_pq_index(spark, evens, cents, base)
    with open(os.path.join(base, "_COMPLETE")) as f:
        rec = json.load(f)
    assert "bloom" not in rec["id_digest"]
    assert rec["id_digest"].get("res64") is not None
    m.build_pq_shard(spark, base, odds, shard)
    stats = m.pq_index_merge(spark, base, shard)
    assert stats["vectors_merged"] == odds.count()
    # overlap, no blooms anywhere: ladder abstains -> exact refusal
    overlap = str(tmp_path / "overlap")
    m.build_pq_shard(
        spark,
        base,
        emb.filter((F.col("vec_id") % 7 == 0) | (F.col("vec_id") % 2 == 0)).limit(50),
        overlap,
    )
    with pytest.raises(ValueError, match="share vector id"):
        m.pq_index_merge(spark, base, overlap)


def _fsck(spark, path, full=True):
    import kafka_dbsync_spark.operators.pq_index as m

    return {
        (r["check"], r["artifact"]): (r["status"], r["detail"])
        for r in m.pq_index_check(spark, path, full=full).collect()
    }


def test_pq_index_check_healthy_lifecycle(spark, tmp_path):
    """CheckIndex over build + add + remove: a healthy ANN index
    reports no FAIL at either level; removal polarity is pinned —
    taken-down ids must be ABSENT (physical rewrite), unlike the BM25
    tombstone check."""
    import kafka_dbsync_spark.operators.pq_index as m

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = QUERIES["ivf_centroids"](spark, SF)
    path = str(tmp_path / "pq")
    build_pq_index(spark, emb.filter(F.col("vec_id") % 2 == 0), cents, path)
    new = emb.filter(F.col("vec_id") % 2 != 0).limit(20)
    m.pq_index_add(spark, path, new)
    victim = [int(new.select("vec_id").head()[0])]
    m.pq_index_remove(spark, path, victim)
    rep = _fsck(spark, path)
    fails = [k for k, v in rep.items() if v[0] == "FAIL"]
    assert not fails, {k: rep[k] for k in fails}
    assert rep[("takedowns_stay_removed", "")][0] == "PASS"
    assert rep[("codes_flat_codes_same_vectors", "")][0] == "PASS"
    meta_rep = _fsck(spark, path, full=False)
    assert not [k for k, v in meta_rep.items() if v[0] == "FAIL"]


def test_pq_index_check_detects_corruptions(spark, tmp_path):
    """Detection per corruption class: a resurrected takedown (the
    erasure-violation an fsck exists to catch), fingerprint/codes
    split-brain, and a compaction staging leftover."""
    import json
    import os as _os
    import shutil

    import kafka_dbsync_spark.operators.pq_index as m

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(60)
    cents = QUERIES["ivf_centroids"](spark, SF)
    path = str(tmp_path / "pq")
    build_pq_index(spark, emb, cents, path)
    mk = _os.path.join(path, "_COMPLETE")
    with open(mk) as f:
        rec = json.load(f)

    # resurrected takedown: claim an id was removed while its codes stay
    vid = int(emb.select("vec_id").head()[0])
    bad = dict(rec)
    bad["removed_ids"] = [vid]
    with open(mk, "w") as f:
        json.dump(bad, f)
    rep = _fsck(spark, path)
    assert rep[("takedowns_stay_removed", "")][0] == "FAIL"

    # split-brain fingerprint
    bad = dict(rec)
    bad["fingerprint"] = {**rec["fingerprint"], "n": rec["fingerprint"]["n"] + 1}
    with open(mk, "w") as f:
        json.dump(bad, f)
    rep = _fsck(spark, path)
    assert rep[("codes_match_fingerprint", "codes")][0] == "FAIL"

    # staging leftover + restore marker
    with open(mk, "w") as f:
        json.dump(rec, f)
    _os.makedirs(_os.path.join(path, "codes", ".centroid_id=0.compact"))
    rep = _fsck(spark, path, full=False)
    assert rep[("staging_leftover", "codes/.centroid_id=0.compact")][0] == "WARN"
    shutil.rmtree(_os.path.join(path, "codes", ".centroid_id=0.compact"))

    # artifact dir vanished
    shutil.rmtree(_os.path.join(path, "flat_codes"))
    rep = _fsck(spark, path, full=False)
    assert rep[("artifact_dir_exists", "flat_codes")][0] == "FAIL"

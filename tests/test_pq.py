"""Product-quantization operator invariants (oracle parity is covered by
the pq_* entries in the query registry; these pin the operator-level
contracts that SQL can't see)."""

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.pq import (
    codebooks_as_array,
    pq_adc_topk,
    pq_codebooks,
    pq_encode,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def cb(emb):
    return pq_codebooks(emb).cache()


def test_codebook_shape(cb):
    # 8 subspaces x 16 codes x 8 dims, every cell populated exactly once
    assert cb.count() == 8 * 16 * 8
    dims = cb.groupBy("m", "code").count().select("count").distinct().collect()
    assert [r["count"] for r in dims] == [8]


def test_codes_in_range_and_total(emb, cb):
    enc = pq_encode(emb, cb)
    rows = enc.select(
        F.size("codes").alias("n"),
        F.array_min("codes").alias("lo"),
        F.array_max("codes").alias("hi"),
    ).agg(
        F.min("n"), F.max("n"), F.min("lo"), F.max("hi"), F.count("*")
    ).head()
    assert rows[0] == rows[1] == 8          # always 8 codes
    assert rows[2] >= 0 and rows[3] <= 15   # codes in [0, 16)
    assert rows[4] == emb.count()           # one row per vector


def test_encode_is_deterministic(emb, cb):
    a = {r["vec_id"]: r["codes"] for r in pq_encode(emb, cb).collect()}
    b = {r["vec_id"]: r["codes"] for r in pq_encode(emb, cb).collect()}
    assert a == b


def test_adc_self_query_is_nearest(emb, cb):
    # the query vector's own row must rank first on ADC distance: every
    # per-subspace term is the distance to its OWN selected (nearest)
    # codeword — minimal by construction
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["embedding"]]
    top = pq_adc_topk(pq_encode(emb, cb), cb, qv, k_top=1).head()
    assert top["vec_id"] == 7


def test_books_row_is_single_and_sorted(cb):
    row = codebooks_as_array(cb).collect()
    assert len(row) == 1
    books = row[0]["__books"]
    assert [b["m"] for b in books] == list(range(8))
    for b in books:
        assert [e["code"] for e in b["entries"]] == list(range(16))
        assert all(len(e["cvec"]) == 8 for e in b["entries"])


def test_encode_plan_is_map_only(emb, cb):
    # r13 opt: the encode is ONE Arrow pass over the data — no join of
    # any kind (the codebooks ride in as collected metadata) and no
    # Exchange anywhere in the encode plan
    plan = pq_encode(emb, cb)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_adc_sparse_codebook_looks_up_by_code(emb, cb, spark):
    """ADVICE r3: when some id%k residue class has no training rows, the
    codebook's entries array is sparse/non-contiguous; ADC must select
    the codeword by its code FIELD, not dense array position. Train on a
    filtered id set that leaves residue classes empty and check the ADC
    total equals a per-row python recomputation over the same codebook."""
    sparse = emb.filter((F.col("vec_id") % 16).isin([0, 1, 2, 5, 9]))
    scb = pq_codebooks(sparse)
    present = {
        (r["m"], r["code"]) for r in scb.select("m", "code").distinct().collect()
    }
    assert len({c for _, c in present}) < 16  # genuinely sparse
    enc = pq_encode(sparse, scb)
    qv = [float(x)
          for x in sparse.select("embedding").orderBy("vec_id").head()[0]]
    got = {r["vec_id"]: r["adc_dist"]
           for r in pq_adc_topk(enc, scb, qv, k_top=10_000).collect()}
    # python reference: same rounding discipline as the operator
    book = {}
    for r in scb.collect():
        book.setdefault((r["m"], r["code"]), {})[r["dim"]] = r["cw"]
    codes = {r["vec_id"]: r["codes"] for r in enc.collect()}
    for vid, cs in codes.items():
        total = 0.0
        for m, code in enumerate(cs):
            cvec = [book[(m, code)][d] for d in range(1, 9)]
            qsub = qv[m * 8:(m + 1) * 8]
            total += round(sum((a - b) * (a - b) for a, b in zip(qsub, cvec)), 6)
        # tolerance covers half-up (Spark) vs banker's (python) rounding
        # at the 4-decimal output boundary; a WRONG codeword lookup (the
        # defect this test pins) is off by O(0.1+), 100× the tolerance
        assert abs(round(total, 4) - got[vid]) < 1e-3


def test_ivfpq_self_query_near_top(emb, spark):
    # IVF-PQ is approximate, but the query's own row must appear in the
    # top-10 of its own search (its ADC distance is the per-subspace
    # quantization floor) and the probed-cell filter must hold
    from kafka_dbsync_spark.operators.pq import ivfpq_search
    from kafka_dbsync_spark.operators.similarity import select_probe_cells
    from kafka_dbsync_spark.queries import QUERIES

    cents = QUERIES["ivf_centroids"](spark, SF)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    top = ivfpq_search(emb, cents, qv, nprobe=2, k_top=10).collect()
    assert any(r["vec_id"] == 3 for r in top)
    probe = set(select_probe_cells(cents, qv, 2))
    assert {r["centroid_id"] for r in top} <= probe
    # ranked ascending by approximate distance
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)


def test_residuals_reconstruct(emb, spark):
    # resid + centroid == original vector (double-cast), elementwise
    from kafka_dbsync_spark.operators.pq import with_residuals
    from kafka_dbsync_spark.operators.similarity import centroid_arrays
    from kafka_dbsync_spark.queries import QUERIES

    cents = QUERIES["ivf_centroids"](spark, SF)
    cellvec = dict(centroid_arrays(cents))
    rows = with_residuals(emb, cents).collect()
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in rows[:20]:
        rec = [a + b for a, b in zip(r["resid"], cellvec[r["centroid_id"]])]
        assert all(abs(x - float(y)) < 1e-9 for x, y in zip(rec, raw[r["vec_id"]]))


def test_ivfpq_refine_exact_order_within_candidates(emb, spark):
    """The refine stage (FAISS IndexRefineFlat) must return the top-k by
    EXACT cosine over exactly the ADC candidate set: every refined row's
    id comes from the candidates, scores are the rounded exact cosine,
    and the self-query ranks first with cosine 1.0."""
    from kafka_dbsync_spark.operators.pq import ivfpq_refine, ivfpq_search
    from kafka_dbsync_spark.queries import QUERIES

    cents = QUERIES["ivf_centroids"](spark, SF)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    cand = ivfpq_search(emb, cents, qv, nprobe=2, k_top=50)
    cand_ids = {r["vec_id"] for r in cand.collect()}
    refined = ivfpq_refine(cand, emb, qv, k_top=10).collect()
    assert len(refined) == 10
    assert {r["vec_id"] for r in refined} <= cand_ids
    # exact self-similarity puts the query's own row on top
    assert refined[0]["vec_id"] == 3 and refined[0]["exact_cs"] == 1.0
    scores = [r["exact_cs"] for r in refined]
    assert scores == sorted(scores, reverse=True)
    # python cross-check of one score: plain cosine, rounded to 4
    import math
    other = refined[1]
    ov = [float(x) for x in
          emb.filter(F.col("vec_id") == other["vec_id"]).head()["embedding"]]
    dot = sum(a * b for a, b in zip(qv, ov))
    cs = dot / (math.sqrt(sum(a * a for a in qv)) * math.sqrt(sum(b * b for b in ov)))
    assert abs(round(cs, 4) - other["exact_cs"]) < 1e-9


def test_ivfpq_search_plan_has_no_exchange(spark):
    # r13 opt: the old static plan re-derived the centroid/codebook
    # metadata pipelines per consumer (11-exchange budget, AQE collapsed
    # some into ReusedExchange at runtime). The Arrow rewrite removed
    # the duplicated subtrees outright: the metadata is collected once
    # driver-side and the scoring path is three map-only Arrow passes +
    # TakeOrdered — the FINAL search plan holds NO Exchange at all
    # (strictly stronger than the old reuse property).
    from kafka_dbsync_spark.queries import QUERIES

    df = QUERIES["ivfpq_search"](spark, SF)
    assert len(df.collect()) == 10
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInArrow" in plan

"""Similarity-search operators over embedding columns."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from kafka_dbsync_spark.functions.vectors import cosine, dot, norm
from kafka_dbsync_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_blocked,
    ivf_assign,
    ivf_search,
    neardup_pairs_blocked,
)


def centroids_df(spark):
    # two 4-dim cells in long format: cell 0 at e1, cell 1 at e2
    rows = [
        (0, d, 1.0 if d == 1 else 0.0) for d in range(1, 5)
    ] + [
        (1, d, 1.0 if d == 2 else 0.0) for d in range(1, 5)
    ]
    return spark.createDataFrame(rows, "label int, dim int, centroid double")


def emb_df(spark):
    rows = [
        (0, 0, [1.0, 0.0, 0.0, 0.0]),
        (1, 0, [1.0, 0.0, 0.0, 0.0]),   # identical to query
        (2, 0, [0.9, 0.1, 0.0, 0.0]),   # close
        (3, 1, [0.0, 1.0, 0.0, 0.0]),   # orthogonal, other block
        (4, 0, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")


def test_vector_primitives(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    r = df.select(
        dot("a", "b").alias("d"), norm("a").alias("n"), cosine("a", "b").alias("c")
    ).head()
    assert r["d"] == 32.0
    assert math.isclose(r["n"], math.sqrt(14))
    assert math.isclose(r["c"], 32 / (math.sqrt(14) * math.sqrt(77)))


def test_cosine_topk(spark):
    df = emb_df(spark)
    out = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    ids = [r["vec_id"] for r in out]
    assert ids[:3] == [0, 1, 2]  # ties (0,1 at cos=1.0) break by vec_id
    assert out[0]["cos_sim"] == 1.0 and out[1]["cos_sim"] == 1.0


def test_cosine_topk_blocked_prunes_other_blocks(spark):
    df = emb_df(spark)
    out = cosine_topk_blocked(df, df.filter(F.col("vec_id") == 0), "label", k=10).collect()
    assert {r["vec_id"] for r in out} == {0, 1, 2, 4}  # label-1 row excluded


def test_ivf_assign_nearest_centroid(spark):
    out = {
        r["vec_id"]: (r["centroid_id"], r["dist"])
        for r in ivf_assign(emb_df(spark), centroids_df(spark)).collect()
    }
    # e1-ish vectors land in cell 0, the e2 vector in cell 1
    assert out[0][0] == 0 and out[1][0] == 0 and out[2][0] == 0
    assert out[3][0] == 1
    assert out[0][1] == 0.0 and out[3][1] == 0.0
    assert out[4] == (1, 2.0)  # (-1,0,0,0): d²(c0)=4.0 > d²(c1)=2.0


def test_ivf_assign_is_map_only(spark):
    """The assignment shuffles no DATA: r13 opt made it ONE Arrow pass
    over the embeddings (the centroids are collected driver-side
    metadata, the FAISS coarse-quantizer RAM model), so the plan holds
    no join of any kind and no Exchange at all."""
    plan = ivf_assign(
        emb_df(spark).coalesce(1), centroids_df(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "MapInArrow" in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_ivf_search_probes_nearest_cells(spark):
    # query = e1: nearest cell is 0; nprobe=1 restricts candidates to cell 0
    out = ivf_search(
        emb_df(spark), centroids_df(spark), [1.0, 0.0, 0.0, 0.0], nprobe=1, k=10
    ).collect()
    ids = [r["vec_id"] for r in out]
    assert ids == [0, 1, 2]  # vecs 3 and 4 live in cell 1, outside the probe
    assert all(r["centroid_id"] == 0 for r in out)
    # nprobe=2 widens the probe to both cells
    wide = ivf_search(
        emb_df(spark), centroids_df(spark), [1.0, 0.0, 0.0, 0.0], nprobe=2, k=10
    ).collect()
    assert {r["vec_id"] for r in wide} == {0, 1, 2, 3, 4}


def test_neardup_pairs_blocked(spark):
    out = neardup_pairs_blocked(emb_df(spark), "label", 0.95).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out}
    assert pairs[(0, 1)] == 1.0
    assert all(a < b for a, b in pairs)
    assert not any(3 in p for p in pairs)  # other block never compared


def test_neardup_salting_same_output_bounded_tasks(spark):
    """One dominant block: salt=4 must produce the identical pair set
    while spreading the quadratic expansion over the salt grid instead of
    one task."""
    n = 200
    dom = spark.range(n).select(
        F.col("id").alias("vec_id"),
        # not F.lit(0): a foldable block would constant-fold the equi-join
        # condition away and plan a cartesian product
        (F.col("id") % 1).cast("int").alias("label"),
        F.array(F.lit(1.0), (F.col("id") % 7).cast("double") / 1000.0).alias("embedding"),
    )
    plain = neardup_pairs_blocked(dom, "label", 0.99)
    salted = neardup_pairs_blocked(dom, "label", 0.99, salt=4)
    p = sorted(map(tuple, plain.collect()))
    s = sorted(map(tuple, salted.collect()))
    assert p == s and len(p) > 1000

    # per-task bound: with a real shuffle join (broadcast disabled — at
    # scale the sides are too big to broadcast, which is when salting
    # matters), the pre-threshold pair stream must be spread across the
    # grid: no task holds more than a few grid cells' worth of the n²/2
    # pairs, vs 100% in one task unsalted.
    conf = spark.conf
    old = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE's skew-join split also mitigates the hot block at runtime (with
    # build-side read amplification); turn it off to assert the *plan*
    # property salting provides.
    conf.set("spark.sql.adaptive.enabled", "false")
    try:
        raw = neardup_pairs_blocked(dom, "label", -1.0, salt=4)
        counts = [
            r["c"]
            for r in raw.groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        unsalted = [
            r["c"]
            for r in neardup_pairs_blocked(dom, "label", -1.0)
            .groupBy(F.spark_partition_id().alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        conf.set("spark.sql.adaptive.enabled", old_aqe)
    total = sum(counts)
    assert total == n * (n - 1) // 2
    assert max(unsalted) == total  # one block ⇒ unsalted is one task
    # 16 grid cells hash onto 8 shuffle partitions: cell-to-partition
    # collisions mean a task can carry a few cells, but never the whole
    # block (deterministic xxhash64 ⇒ stable run to run; observed ≈32%)
    assert max(counts) <= total // 2
    assert sum(1 for c in counts if c > 0) >= 5


def test_quantize_minmax_roundtrip(spark):
    from kafka_dbsync_spark.functions.vectors import with_quantized

    df = spark.createDataFrame(
        [(0, [0.0, 0.5, 1.0]), (1, [-2.0, 0.0, 2.0]), (2, [3.0, 3.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in with_quantized(df, "embedding").collect()}
    assert rows[0]["qcodes"] == [0, 128, 255]  # round(0.5*255)=127.5→128
    assert rows[1]["qcodes"] == [0, 128, 255]
    assert (rows[2]["qmin"], rows[2]["qmax"]) == (3.0, 3.0)
    assert rows[2]["qcodes"] == [0, 0, 0]  # constant vector, no div-by-zero
    # dequant error bound: half a quantization step
    r = rows[1]
    step = (r["qmax"] - r["qmin"]) / 255
    for orig, code in zip([-2.0, 0.0, 2.0], r["qcodes"]):
        assert abs(r["qmin"] + code * step - orig) <= step / 2 + 1e-12


def test_semantic_dedup_keeps_min_id_per_cluster(spark):
    from kafka_dbsync_spark.operators.similarity import semantic_dedup

    # two tight clusters (identical vectors) + one singleton
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.0], 0),   # dup of 1 -> dropped
        (3, [0.0, 1.0], 1),
        (4, [0.0, 1.0], 1),   # dup of 3 -> dropped
        (5, [0.7, 0.7], 2),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = emb.selectExpr(
        "label", "posexplode(embedding) as (dim0, v)"
    ).selectExpr("label", "dim0 + 1 as dim", "CAST(v AS DOUBLE) as centroid").groupBy(
        "label", "dim"
    ).agg(F.round(F.avg("centroid"), 6).alias("centroid"))
    out = semantic_dedup(emb, cents, 0.99)
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 3, 5]


def test_ivf_assign_scales_to_4k_cells_256_dims(spark):
    """VERDICT r2 #2 probe: the broadcast-array form must plan AND run at
    B=4096 cells x dim=256 (the literal-inlined r1/r2 form blew up
    Catalyst with O(B*dim) expression nodes at this size)."""
    from kafka_dbsync_spark.operators.similarity import ivf_assign

    B, DIM, N = 4096, 256, 32
    # centroid value pattern depends only on label % 17, so dist=0 ties
    # across cells and argmin must pick the LOWEST matching cell id
    cents = (
        spark.range(B)
        .select(
            F.col("id").alias("label"),
            F.explode(F.sequence(F.lit(1), F.lit(DIM))).alias("dim"),
        )
        .withColumn(
            "centroid", (F.col("label") % 17 + F.col("dim") % 5).cast("double")
        )
    )
    emb = (
        spark.range(N)
        .select(
            F.col("id").alias("vec_id"),
            ((F.col("id") * 123) % B).alias("label"),
        )
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(DIM)),
                lambda d: (F.col("label") % 17 + d % 5).cast("double"),
            ),
        )
    )
    out = ivf_assign(emb, cents)
    # plan must stay O(1) in B: no 4096-way literal array in the tree
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 100_000, f"plan blew up: {len(plan)} chars"
    rows = out.collect()
    assert len(rows) == N
    for r in rows:
        assert r["centroid_id"] == r["label"] % 17, r
        assert r["dist"] == 0.0, r


def test_with_lsh_buckets_scales_to_wide_plane_matrices(spark):
    """Broadcast-planes form: must plan AND run at 48 planes x 512 dims
    (a ~25k-literal plan in the inlined form), stay bit-identical to the
    literal-inlined lsh_bucket at the default size, and reject > 63
    planes (signed-long bucket)."""
    from kafka_dbsync_spark.operators.similarity import (
        lsh_bucket,
        with_lsh_buckets,
    )

    emb = emb_df(spark)
    # force the broadcast path (max_literal_nodes=0) for the bit-identity
    # check against the literal-inlined form
    both = with_lsh_buckets(
        emb, "embedding", 8, 4, out_col="b_new", max_literal_nodes=0
    ).withColumn("b_old", lsh_bucket("embedding", 8, 4))
    assert all(r["b_new"] == r["b_old"] for r in both.collect())
    # hybrid: small matrices take the literal path (no broadcast join)
    small_plan = (
        with_lsh_buckets(emb, "embedding", 8, 4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in small_plan

    wide = spark.range(16).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(512)),
            lambda d: ((F.col("id") + d) % 7 - 3.0).cast("double"),
        ).alias("embedding"),
    )
    out = with_lsh_buckets(wide, "embedding", 48, 512)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 100_000, f"plan blew up: {len(plan)} chars"
    rows = out.collect()
    assert len(rows) == 16
    assert all(0 <= r["bucket"] < 2**48 for r in rows)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="num_planes"):
        with_lsh_buckets(emb, "embedding", 64, 4)


def test_pca_matches_numpy_eigh(spark):
    """Power-iteration applyInPandas vs exact numpy eigendecomposition."""
    import numpy as np

    from kafka_dbsync_spark.operators.similarity import pca_top_component

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {r["label"]: r for r in pca_top_component(emb).collect()}
    rows = emb.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r["embedding"])
    assert set(got) == set(by_label)
    for lab, vecs in by_label.items():
        X = np.array(vecs, dtype=np.float64)
        Xc = X - X.mean(0)
        C = (Xc.T @ Xc) / len(X)
        w, V = np.linalg.eigh(C)
        share = w[-1] / np.trace(C)
        assert got[lab]["n"] == len(vecs)
        assert abs(got[lab]["ev_share"] - round(float(share), 4)) <= 1e-4
        assert got[lab]["top_dim"] == int(np.abs(V[:, -1]).argmax())


def test_hard_negative_topk_excludes_same_label(spark):
    """Every mined negative has a label different from its anchor, and
    ranks are dense 1..k per anchor."""
    from kafka_dbsync_spark.operators.similarity import hard_negative_topk

    rows = [
        (i, [float((i * 7 + j * 3) % 5 - 2) for j in range(4)], i % 3)
        for i in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negative_topk(
        emb, emb.filter("vec_id < 2"), k=4
    ).collect()
    anchors = {i: lab for i, _, lab in rows if i < 2}
    by_q = {}
    for r in out:
        assert r["neg_label"] != anchors[r["q_id"]]
        by_q.setdefault(r["q_id"], []).append(r["rank"])
    assert set(by_q) == {0, 1}
    assert all(sorted(v) == [1, 2, 3, 4] for v in by_q.values())


def test_hard_negative_topk_orders_by_similarity(spark):
    """The rank-1 negative is the most cosine-similar different-label
    vector: an identical-direction vector with another label beats an
    orthogonal one."""
    from kafka_dbsync_spark.operators.similarity import hard_negative_topk

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0], 0),   # anchor, label 0
            (1, [2.0, 0.0, 0.0, 0.0], 1),   # same direction, label 1
            (2, [0.0, 1.0, 0.0, 0.0], 1),   # orthogonal, label 1
            (3, [1.0, 0.0, 0.0, 0.0], 0),   # same label -> excluded
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = hard_negative_topk(emb, emb.filter("vec_id = 0"), k=3).collect()
    got = [(r["rank"], r["neg_id"], r["cos_sim"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [(1, 1, 1.0), (2, 2, 0.0)]


def test_cluster_prototypes_two_stage_equals_naive(spark):
    """The two-stage partial+exact per-cell top-k must equal the naive
    single-window answer, on a skewed fixture (one giant cell) spread
    across many input partitions."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from kafka_dbsync_spark.operators.similarity import cluster_prototypes

    rows = [(i, 0 if i < 90 else 1, float((i * 37) % 101)) for i in range(100)]
    df = spark.createDataFrame(
        rows, "vec_id long, centroid_id long, dist double"
    ).repartition(16)
    got = {
        (r["centroid_id"], r["rank"]): r["vec_id"]
        for r in cluster_prototypes(df, k=3).collect()
    }
    w = W.partitionBy("centroid_id").orderBy("dist", "vec_id")
    naive = {
        (r["centroid_id"], r["rk"]): r["vec_id"]
        for r in df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .collect()
    }
    assert got == {(c, int(k)): v for (c, k), v in naive.items()}
    assert len(got) == 6

"""Focused tests for the r13 Arrow/numpy PQ kernels: the rewrite of
ivf_assign / pq_encode / ADC scoring (operators/pq_kernels.py) must be
bit-identical to the JVM higher-order-function expressions it replaced.
The oracle gate proves end-to-end equality; these pin the two load-
bearing kernel contracts in isolation: Spark-exact rounding, and the
degenerate-row (NULL / wrong-length vector) null semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators import pq_kernels as K


def test_spark_round_matches_spark_on_adversarial_values(spark):
    rng = np.random.default_rng(7)
    xs = np.concatenate(
        [
            (np.arange(1, 5000) + 0.5) / 1e6,  # exactly-.5 decimal shapes
            (np.arange(1, 5000) + 0.5) / 1e6 * (1 + 1e-15),
            (np.arange(1, 5000) + 0.5) / 1e6 * (1 - 1e-15),
            -((np.arange(1, 2000) + 0.5) / 1e4),  # negative half-up
            rng.uniform(-1000, 1000, 10000),
            np.array([0.0, -0.0, 1.0000005, -1.0000005, 5e-7, -5e-7, 1.5e-6]),
        ]
    )
    sdf = spark.createDataFrame([(float(v),) for v in xs], "x double")
    for scale in (4, 6):
        got = np.array(
            [r["r"] for r in sdf.select(F.round("x", scale).alias("r")).collect()]
        )
        ours = K.spark_round(xs.copy(), scale)
        mism = np.flatnonzero(got != ours)
        assert len(mism) == 0, [
            (repr(float(xs[i])), repr(float(got[i])), repr(float(ours[i])))
            for i in mism[:5]
        ]


def test_assign_degenerate_rows_null_dist_lowest_cell(spark):
    """NULL or wrong-length vectors reproduce the JVM zip_with-pad
    semantics: every per-cell distance is NULL, so array_min ties on
    (NULL, cell) and the LOWEST cell wins with a NULL dist."""
    from kafka_dbsync_spark.operators.similarity import ivf_assign

    emb = spark.createDataFrame(
        [
            (0, 0, [1.0, 0.0]),
            (1, 0, None),          # NULL vector
            (2, 0, [1.0]),         # too short
            (3, 0, [1.0, 0.0, 9.0]),  # too long
        ],
        "vec_id long, label int, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(5, 1, 1.0), (5, 2, 0.0), (9, 1, 0.0), (9, 2, 1.0)],
        "label long, dim int, centroid double",
    )
    rows = {r["vec_id"]: r for r in ivf_assign(emb, cents).collect()}
    assert rows[0]["centroid_id"] == 5 and rows[0]["dist"] == 0.0
    for vid in (1, 2, 3):
        assert rows[vid]["centroid_id"] == 5  # lowest cell id
        assert rows[vid]["dist"] is None


def test_encode_degenerate_rows_take_lowest_code(spark):
    from kafka_dbsync_spark.operators.pq import pq_codebooks, pq_encode

    emb = spark.createDataFrame(
        [(i, 0, [float(i % 3), float(i % 5)] * 8) for i in range(32)],
        "vec_id long, label int, embedding array<double>",
    )
    cb = pq_codebooks(emb, n_sub=2, d_sub=8, k=4)
    weird = spark.createDataFrame(
        [(100, 0, None), (101, 0, [1.0] * 9)],
        "vec_id long, label int, embedding array<double>",
    )
    out = {r["vec_id"]: r["codes"] for r in pq_encode(weird, cb, d_sub=8).collect()}
    lowest = [
        min(code for code, _ in entries) for _, entries in K.collect_books(cb)
    ]
    assert out[100] == lowest          # NULL vector: all-NULL dists tie
    # 9-long vector: subspace 0 has its full 8 dims (real argmin),
    # subspace 1 is short -> NULL dists -> lowest code
    assert out[101][1] == lowest[1]


def test_adc_lut_matches_row_fold(spark):
    """The precomputed ADC table gather must equal a per-row Python
    recomputation with the operator's rounding discipline (the same
    reference test_adc_sparse_codebook_looks_up_by_code uses)."""
    from kafka_dbsync_spark.operators.pq import pq_codebooks, pq_encode, pq_adc_topk

    emb = spark.createDataFrame(
        [
            (i, 0, [float((i * 7 + d * 3) % 11) / 7.0 for d in range(16)])
            for i in range(64)
        ],
        "vec_id long, label int, embedding array<double>",
    )
    cb = pq_codebooks(emb, n_sub=2, d_sub=8, k=4)
    qv = [0.3] * 16
    got = {
        r["vec_id"]: r["adc_dist"]
        for r in pq_adc_topk(pq_encode(emb, cb), cb, qv, k_top=1000).collect()
    }
    books = K.collect_books(cb)
    codes = {
        r["vec_id"]: r["codes"] for r in pq_encode(emb, cb).collect()
    }
    for vid, cs in codes.items():
        acc = 0.0
        for (m, entries), code in zip(books, cs):
            cvec = dict(entries)[code]
            q = qv[m * 8 : m * 8 + 8]
            t = 0.0
            for qi, ci in zip(q, cvec):
                t = t + (qi - ci) * (qi - ci)
            acc = acc + K.round_half_up_py(t, 6)
        assert got[vid] == pytest.approx(K.round_half_up_py(acc, 4), abs=0)

"""Single-pass column profiling (operators/profile.py)."""

from kafka_dbsync_spark.operators.profile import profile_columns


def test_profile_stats_with_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (2.0, 30.0), (None, 30.0)],
        "a double, b double",
    )
    rows = {r["col_name"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    a, b = rows["a"], rows["b"]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 1, 2)
    assert (a["min_v"], a["max_v"], a["avg_r"]) == (1.0, 2.0, round(5.0 / 3, 6))
    assert (b["n_rows"], b["n_null"], b["n_distinct"]) == (4, 1, 2)
    assert b["avg_r"] == round(70.0 / 3, 6)


def test_profile_approx_distinct_drops_expand(spark):
    df = spark.createDataFrame([(float(i % 7),) for i in range(100)], "a double")
    prof = profile_columns(df, ["a"], exact_distinct=False)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    row = prof.collect()[0]
    # HLL is exact at tiny cardinalities
    assert row["n_distinct"] == 7

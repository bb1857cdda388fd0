"""SCD Type-2 history derivation (operators/history.py)."""

from kafka_dbsync_spark.operators.history import scd2_history


def test_scd2_versions_and_closure(spark):
    changes = spark.createDataFrame(
        [
            (1, "a", 1, "upsert"),
            (2, "b", 2, "upsert"),
            (1, "a2", 3, "upsert"),
            (1, None, 5, "delete"),
        ],
        "id long, v string, seq long, op string",
    )
    rows = {
        (r["id"], r["valid_from"]): (r["valid_to"], r["is_current"], r["v"])
        for r in scd2_history(changes, ["id"], "seq").collect()
    }
    # key 1: v opens at 1, closed by the update at 3; v2 closed by delete
    assert rows[(1, 1)] == (3, False, "a")
    assert rows[(1, 3)] == (5, False, "a2")
    # the delete row emits no version
    assert (1, 5) not in rows
    # key 2: still open
    assert rows[(2, 2)] == (None, True, "b")
    assert len(rows) == 3


def test_scd2_delete_only_key_emits_nothing(spark):
    changes = spark.createDataFrame(
        [(7, None, 1, "delete")], "id long, v string, seq long, op string"
    )
    assert scd2_history(changes, ["id"], "seq").count() == 0

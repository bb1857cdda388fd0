"""Executor-side apply path (``distribute=True``) — the engine's analog of
the reference's ``tasks.max`` parallel sink tasks
(IidrCdcSinkConnector.java:57-67): one DB connection per partition, with
the batch repartitioned by (table, pk) so a key never splits across
connections.

No server DB exists in the container (and sqlite cannot take concurrent
writers on one file), so the rig simulates one-connection-per-sink-task
with per-partition sqlite files: the picklable connection factory resolves
``TaskContext.partitionId()`` at call time, so each executor partition
writes its own file. Because every key hash-routes to exactly one
partition, the union of the files IS the final table state — and the tests
assert that disjointness explicitly.
"""

from __future__ import annotations

import glob
import os
import sqlite3

import pytest
import pyspark.sql.types as T

from kafka_dbsync_spark.functions.entrytype import OP_DELETE, OP_UPSERT
from kafka_dbsync_spark.streaming.apply import CdcApplyEngine
from kafka_dbsync_spark.streaming.dialects import SqliteDialect

BATCH_SCHEMA = T.StructType(
    [
        T.StructField("target_table", T.StringType()),
        T.StructField("ID", T.LongType()),
        T.StructField("ORDER_NAME", T.StringType()),
        T.StructField("STATUS", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("offset", T.LongType()),
    ]
)

DDL = [
    """CREATE TABLE IF NOT EXISTS "orders" (
        "ID" BIGINT, "ORDER_NAME" TEXT, "STATUS" TEXT, PRIMARY KEY ("ID"))""",
    """CREATE TABLE IF NOT EXISTS "audit" (
        "ID" BIGINT, "ORDER_NAME" TEXT, "STATUS" TEXT, PRIMARY KEY ("ID"))""",
]


def partition_file_factory(dir_path: str, ddl=tuple(DDL)):
    """Picklable factory: one sqlite file per executor partition.

    Stands in for a server-DB DSN closure (e.g. psycopg2.connect(dsn)) —
    tables are pre-created on connect, mirroring a shared DB that already
    carries the DDL (the engine's executor path only issues DML).
    """

    def factory():
        from pyspark import TaskContext

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else "driver"
        conn = sqlite3.connect(os.path.join(dir_path, f"part_{pid}.sqlite"))
        for stmt in ddl:
            conn.execute(stmt)
        conn.commit()
        return conn

    return factory


def make_engine(dir_path: str, **kw) -> CdcApplyEngine:
    return CdcApplyEngine(
        connection_factory=partition_file_factory(dir_path),
        dialect=SqliteDialect(),
        pk_fields=["ID"],
        value_cols=["ORDER_NAME", "STATUS"],
        order_cols=["offset"],
        # the factory carries the DDL (a shared server DB would too); the
        # executor path must then touch only DML
        auto_create=False,
        auto_evolve=False,
        distribute=True,
        # pin sink parallelism (the reference's tasks.max) — otherwise AQE
        # correctly coalesces this tiny batch down to one connection
        num_partitions=4,
        **kw,
    )


def read_partition_files(dir_path: str, table: str):
    """Merge the per-partition files into {ID: row} and record, per key,
    WHICH files it appeared in (for the disjointness assertion)."""
    state: dict[int, tuple] = {}
    locations: dict[int, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(dir_path, "part_*.sqlite"))):
        con = sqlite3.connect(path)
        try:
            rows = con.execute(f'SELECT "ID", "ORDER_NAME", "STATUS" FROM "{table}"').fetchall()
        finally:
            con.close()
        for r in rows:
            assert r[0] not in state, f"key {r[0]} written by two partitions"
            state[r[0]] = r
            locations.setdefault(r[0], []).append(os.path.basename(path))
    return state, locations


def sample_batch(spark):
    """Two tables, intra-batch duplicate key (latest must win), a delete of
    an existing key, and a delete of an absent key (must be a no-op)."""
    rows = [
        ("orders", 1, "A", "NEW", OP_UPSERT, 0),
        ("orders", 2, "B", "NEW", OP_UPSERT, 1),
        ("orders", 3, "C", "NEW", OP_UPSERT, 2),
        ("orders", 2, "B2", "SHIPPED", OP_UPSERT, 3),  # LWW over offset 1
        ("orders", 3, None, None, OP_DELETE, 4),  # delete existing
        ("orders", 99, None, None, OP_DELETE, 5),  # delete absent: no-op
        ("audit", 1, "log-a", "OK", OP_UPSERT, 6),
        ("audit", 2, "log-b", "OK", OP_UPSERT, 7),
    ] + [
        # enough distinct keys that the hash repartition actually spreads
        # work over >1 partition (8 shuffle partitions in the test session)
        ("orders", 100 + i, f"bulk-{i}", "NEW", OP_UPSERT, 10 + i)
        for i in range(40)
    ]
    return spark.createDataFrame(rows, BATCH_SCHEMA)


def test_distributed_upserts_and_deletes(spark, tmp_path):
    engine = make_engine(str(tmp_path))
    engine.apply_batch(sample_batch(spark))

    orders, _ = read_partition_files(str(tmp_path), "orders")
    assert orders[1] == (1, "A", "NEW")
    assert orders[2] == (2, "B2", "SHIPPED")  # intra-batch LWW applied
    assert 3 not in orders and 99 not in orders
    assert {k for k in orders if k >= 100} == {100 + i for i in range(40)}

    audit, _ = read_partition_files(str(tmp_path), "audit")
    assert audit == {1: (1, "log-a", "OK"), 2: (2, "log-b", "OK")}


def test_distributed_keys_are_partition_disjoint(spark, tmp_path):
    """The repartition key is (table, pk): no key may ever be written by
    two connections (read_partition_files also asserts it per-row), and the
    work must actually be spread across >1 partition file."""
    engine = make_engine(str(tmp_path))
    engine.apply_batch(sample_batch(spark))

    _, locations = read_partition_files(str(tmp_path), "orders")
    assert all(len(files) == 1 for files in locations.values())
    assert len({files[0] for files in locations.values()}) > 1


def test_distributed_replay_idempotence(spark, tmp_path):
    """Replaying the identical batch (at-least-once delivery) must leave
    the merged state unchanged: hash partitioning is deterministic, so each
    key re-routes to the same file and the keyed upsert overwrites in
    place — the same exactly-once-effect argument as the driver-side path
    (docs/puml/kafka-dbsync.puml:36-37)."""
    engine = make_engine(str(tmp_path))
    batch = sample_batch(spark)
    engine.apply_batch(batch)
    first, _ = read_partition_files(str(tmp_path), "orders")
    engine.apply_batch(batch)
    second, _ = read_partition_files(str(tmp_path), "orders")
    assert first == second


def test_distributed_partition_failure_rolls_back(spark, tmp_path):
    """A failing partition must roll back its own transaction and fail the
    batch (K11 txn-per-batch on the executor path): the poisoned table's
    rows never surface, and replaying after the failure converges."""
    poison_ddl = DDL + [
        """CREATE TABLE IF NOT EXISTS "fragile" (
            "ID" BIGINT, "ORDER_NAME" TEXT, "STATUS" TEXT,
            PRIMARY KEY ("ID"), CHECK ("STATUS" <> 'BOOM'))""",
    ]
    engine = CdcApplyEngine(
        connection_factory=partition_file_factory(str(tmp_path), tuple(poison_ddl)),
        dialect=SqliteDialect(),
        pk_fields=["ID"],
        value_cols=["ORDER_NAME", "STATUS"],
        order_cols=["offset"],
        auto_create=False,
        auto_evolve=False,
        distribute=True,
        num_partitions=4,
    )
    bad = spark.createDataFrame(
        [("fragile", 1, "x", "BOOM", OP_UPSERT, 0)]
        + [("orders", i, f"r{i}", "NEW", OP_UPSERT, i) for i in range(2, 30)],
        BATCH_SCHEMA,
    )
    with pytest.raises(Exception):
        engine.apply_batch(bad)
    fragile, _ = read_partition_files(str(tmp_path), "fragile")
    assert fragile == {}  # rolled back, nothing committed for the bad table

    # replay with the poison removed: converges to the full state
    ok = spark.createDataFrame(
        [("fragile", 1, "x", "OK", OP_UPSERT, 0)]
        + [("orders", i, f"r{i}", "NEW", OP_UPSERT, i) for i in range(2, 30)],
        BATCH_SCHEMA,
    )
    engine.apply_batch(ok)
    fragile, _ = read_partition_files(str(tmp_path), "fragile")
    assert fragile == {1: (1, "x", "OK")}
    orders, _ = read_partition_files(str(tmp_path), "orders")
    assert set(orders) == set(range(2, 30))


def test_auto_mode_selects_path_by_batch_size(spark, tmp_path):
    """distribute='auto' (the default) fans out at/above the threshold and
    stays driver-side below it — VERDICT r2 #4."""
    eng = CdcApplyEngine(
        connection_factory=partition_file_factory(str(tmp_path)),
        dialect=SqliteDialect(),
        pk_fields=["ID"],
        value_cols=["ORDER_NAME", "STATUS"],
        order_cols=["offset"],
        auto_create=False,
        auto_evolve=False,
        distribute_threshold=20,  # sample_batch has 48 rows
        num_partitions=4,
    )
    assert eng.distribute == "auto"
    eng.apply_batch(sample_batch(spark))
    assert eng.last_path == "distributed"
    orders, _ = read_partition_files(str(tmp_path), "orders")
    assert orders[2] == (2, "B2", "SHIPPED")

    small_dir = tmp_path / "small"
    small_dir.mkdir()
    eng2 = CdcApplyEngine(
        connection_factory=partition_file_factory(str(small_dir)),
        dialect=SqliteDialect(),
        pk_fields=["ID"],
        value_cols=["ORDER_NAME", "STATUS"],
        order_cols=["offset"],
        auto_create=False,
        auto_evolve=False,
        distribute_threshold=1000,
        num_partitions=4,
    )
    eng2.apply_batch(sample_batch(spark))
    assert eng2.last_path == "driver"


def test_auto_mode_falls_back_when_factory_cannot_ship(spark, tmp_path):
    """A factory that cannot serialize (here: closing over a live
    connection) must keep auto mode on the driver path regardless of
    batch size."""
    db = str(tmp_path / "single.sqlite")
    live = sqlite3.connect(db)
    for stmt in DDL:
        live.execute(stmt)
    live.commit()

    eng = CdcApplyEngine(
        connection_factory=lambda: sqlite3.connect(db),
        dialect=SqliteDialect(),
        pk_fields=["ID"],
        value_cols=["ORDER_NAME", "STATUS"],
        order_cols=["offset"],
        auto_create=False,
        auto_evolve=False,
        distribute_threshold=1,
    )
    # a plain lambda DOES cloudpickle; force the unshippable case
    eng._factory_serializable = False
    eng.apply_batch(sample_batch(spark))
    assert eng.last_path == "driver"
    rows = dict(
        (r[0], r)
        for r in live.execute('SELECT "ID","ORDER_NAME","STATUS" FROM "orders"')
    )
    live.close()
    assert rows[2] == (2, "B2", "SHIPPED")
    assert 3 not in rows


def test_streaming_e2e_distributed_by_default(spark, kafka_schema, tmp_path):
    """Full streaming E2E (file source → transform chain → foreachBatch)
    on the DEFAULT distribute='auto' config: with the threshold at the
    batch size, the micro-batch fans out executor-side and the merged
    per-partition state matches the canonical final state."""
    import pyspark.sql.functions as F

    from kafka_dbsync_spark.plans.pipeline import CdcPipeline
    from kafka_dbsync_spark.sources.iidr import decode_iidr_records
    from tests.conftest import kafka_record

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    events = [
        kafka_record(0, {"ID": 1}, {"ID": 1, "ORDER_NAME": "A", "STATUS": "NEW"},
                     TableName="orders", A_ENTTYP="PT"),
        kafka_record(1, {"ID": 2}, {"ID": 2, "ORDER_NAME": "B", "STATUS": "NEW"},
                     TableName="orders", A_ENTTYP="PT"),
        kafka_record(2, {"ID": 3}, {"ID": 3, "ORDER_NAME": "C", "STATUS": "NEW"},
                     TableName="orders", A_ENTTYP="PT"),
        kafka_record(3, {"ID": 2}, {"ID": 2, "ORDER_NAME": "B2", "STATUS": "SHIPPED"},
                     TableName="orders", A_ENTTYP="UP"),
        kafka_record(4, {"ID": 3}, None, TableName="orders", A_ENTTYP="DL"),
    ] + [
        kafka_record(10 + i, {"ID": 100 + i},
                     {"ID": 100 + i, "ORDER_NAME": f"bulk-{i}", "STATUS": "NEW"},
                     TableName="orders", A_ENTTYP="PT")
        for i in range(40)
    ]
    spark.createDataFrame(events, kafka_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def extract(df):
        decoded = decode_iidr_records(df)
        row = F.from_json("record_value", "ID LONG, ORDER_NAME STRING, STATUS STRING")
        return decoded.select(
            F.coalesce(
                row["ID"], F.from_json("record_key", "ID LONG")["ID"]
            ).alias("ID"),
            row["ORDER_NAME"].alias("ORDER_NAME"),
            row["STATUS"].alias("STATUS"),
            "table_name", "entry_type", "topic", "offset",
            "record_key", "record_value",
        )

    pipeline = CdcPipeline(
        {
            "transforms": [
                {"op": "route", "table_format": "${TableName}"},
                {"op": "map_operation"},
                {"op": "validate"},
            ],
            "sink": {
                "dialect": "sqlite",
                "pk_fields": ["ID"],
                "value_cols": ["ORDER_NAME", "STATUS"],
                "order_cols": ["offset"],
                "auto_create": False,
                "auto_evolve": False,
                "distribute_threshold": 10,  # batch has 45 valid rows
                "num_partitions": 4,
            },
        },
        connection_factory=partition_file_factory(str(tmp_path)),
    )
    stream = spark.readStream.schema(kafka_schema).parquet(src)
    q = pipeline.start(extract(stream), ckpt, availableNow=True)
    q.awaitTermination(120)
    assert pipeline.engine.distribute == "auto"
    assert pipeline.engine.last_path == "distributed"
    orders, _ = read_partition_files(str(tmp_path), "orders")
    assert orders[1] == (1, "A", "NEW")
    assert orders[2] == (2, "B2", "SHIPPED")
    assert 3 not in orders
    assert {k for k in orders if k >= 100} == {100 + i for i in range(40)}

"""The foreachBatch CDC apply engine — Spark's version of the reference's
`IidrCdcSinkTask.put` → `JdbcWriter.write` pipeline (SURVEY.md §3.2).

Per micro-batch:

1. **validate** → corrupt branch to the dead-letter table (K9/K10)
2. **last-write-wins per key** (A3) — the correctness cliff: a set-based
   merge would otherwise apply duplicate keys in arbitrary order
3. **group by target table** (A1), then by op (A2)
4. **one transaction per table** (K11): batched upserts + deletes through
   the dialect SQL; rollback on failure; Structured Streaming's
   checkpoint + the idempotent keyed UPSERT give exactly-once effect over
   at-least-once delivery (docs/puml/kafka-dbsync.puml:28,36-37)
5. **auto-create / auto-evolve** (K6/K7) from the batch schema

Scale notes: the dedup window shuffles on (table, pk) — the only shuffle
in the path. The DB write path is AUTO-SELECTED (``distribute="auto"``,
the default): batches at/above ``distribute_threshold`` rows with a
shippable connection factory run one connection per executor partition
(repartitioned by key so a key never splits across connections); smaller
batches — and ``distribute=False`` — use the driver-side single
connection, the reference's single-sink-task shape and the right debug
path. Force ``distribute=True`` to always fan out.

CAVEAT: auto mode infers "distributable" from batch size + a picklable
factory, which says nothing about the TARGET's concurrency. Single-
writer databases (sqlite, an embedded H2, a constrained PG pool) must
pass ``distribute=False`` explicitly or large backfill batches will
open concurrent writers and hit lock errors — see bench.py's apply-path
engine for the canonical single-writer configuration.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_dbsync_spark.functions.entrytype import OP_DELETE, OP_UPSERT
from kafka_dbsync_spark.operators.merge import latest_by_key
from kafka_dbsync_spark.streaming.dialects import Dialect

log = logging.getLogger(__name__)

CORRUPT_TABLE_SCHEMA = (
    "topic",
    "kafka_partition",
    "kafka_offset",
    "record_key",
    "record_value",
    "headers",
    "error_reason",
    "table_name",
    "entry_type",
    "created_at",
)


class CdcApplyEngine:
    """Applies validated CDC micro-batches into DB tables.

    Parameters mirror the reference's sink config (IidrCdcSinkConfig):
    ``pk_fields`` (pk.fields), ``errors_tolerance`` ∈ {none, log, all}
    (iidr.errors.tolerance), ``auto_create`` / ``auto_evolve``,
    ``corrupt_table`` (corrupt.events.table).

    ``order_cols=None`` (default) resolves per batch to
    ``(partition-ish column if present, offset)`` — a deterministic total
    order even when a key's records span Kafka partitions (e.g. after a
    partition-count increase). Pass explicit columns to override.
    """

    def __init__(
        self,
        connection_factory: Callable[[], object],
        dialect: Dialect,
        pk_fields: Sequence[str],
        value_cols: Sequence[str],
        table_col: str = "target_table",
        op_col: str = "op",
        order_cols: Sequence[str] | None = None,
        errors_tolerance: str = "none",
        auto_create: bool = True,
        auto_evolve: bool = True,
        corrupt_table: str | None = None,
        distribute: bool | str = "auto",
        distribute_threshold: int = 100_000,
        num_partitions: int | None = None,
    ) -> None:
        self.connection_factory = connection_factory
        self.dialect = dialect
        self.pk_fields = list(pk_fields)
        self.value_cols = list(value_cols)
        self.table_col = table_col
        self.op_col = op_col
        self.order_cols = list(order_cols) if order_cols is not None else None
        self.errors_tolerance = errors_tolerance
        self.auto_create = auto_create
        self.auto_evolve = auto_evolve
        self.corrupt_table = corrupt_table
        self.distribute = distribute
        self.distribute_threshold = distribute_threshold
        # auto mode needs the factory on the executors; probe once with
        # cloudpickle (what Spark actually uses for closures) — factories
        # holding live connections/files fail here and stay driver-side
        try:
            from pyspark import cloudpickle

            cloudpickle.dumps(connection_factory)
            self._factory_serializable = True
        except Exception:  # noqa: BLE001
            self._factory_serializable = False
        # which path the last apply_batch took ("driver" | "distributed");
        # for tests and ops logging
        self.last_path: str | None = None
        # the reference's tasks.max: pins the number of concurrent sink
        # connections; None lets AQE size the exchange (it will coalesce
        # small batches down to few connections, which is usually right)
        self.num_partitions = num_partitions
        self._known_tables: set[str] = set()

    # -- public entry points ------------------------------------------------
    def foreach_batch(self):
        """Callable for DataStreamWriter.foreachBatch."""

        def fn(batch_df: DataFrame, epoch_id: int) -> None:
            self.apply_batch(batch_df, epoch_id)

        return fn

    def apply_batch(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        """Apply one (batch or micro-batch) DataFrame of validated records.

        Expects columns: pk fields, value columns, op, target_table,
        order columns, and (optionally) error_reason + dead-letter fields.
        """
        # the corrupt branch, the distinct-tables probe, and the per-table
        # applies are separate actions — cache the decoded batch so the
        # upstream decode/validate plan runs once, like the reference's
        # single pass over the poll batch
        batch_df = batch_df.persist()
        try:
            has_errors = "error_reason" in batch_df.columns
            if has_errors:
                corrupt = batch_df.filter(F.col("error_reason").isNotNull())
                if "created_at" not in corrupt.columns:
                    # dead-letter insertion timestamp (CorruptEventWriter
                    # populates created_at with now())
                    corrupt = corrupt.withColumn(
                        "created_at",
                        F.date_format(
                            F.current_timestamp(), "yyyy-MM-dd HH:mm:ss"
                        ),
                    )
                valid = batch_df.filter(F.col("error_reason").isNull())
                self._handle_corrupt(corrupt)
            else:
                valid = batch_df

            # A3: last write wins per (table, key) — before set-based apply
            order_cols = self.order_cols
            if order_cols is None:
                part = [
                    c for c in ("partition", "kafka_partition") if c in valid.columns
                ][:1]
                order_cols = [*part, "offset"]
            deduped = latest_by_key(
                valid, [self.table_col, *self.pk_fields], order_cols
            )

            out_cols = [*self.pk_fields, *self.value_cols, self.op_col]
            per_table = deduped.select(self.table_col, *out_cols)

            if self._should_distribute(valid):
                self.last_path = "distributed"
                self._apply_distributed(per_table)
            else:
                self.last_path = "driver"
                # distinct-tables probe on the CACHED pre-dedup batch (a
                # one-column partial-agg shuffle) — probing per_table
                # instead would run the expensive dedup shuffle just to
                # list tables. Dedup never drops a table, so the sets match.
                tables = sorted(
                    r[0]
                    for r in valid.select(self.table_col).distinct().collect()
                )
                if len(tables) > 1:
                    # fan-out: materialize the deduped batch once with ONE
                    # parallel job so the N per-table passes read cache
                    # instead of each re-running the dedup shuffle
                    per_table = per_table.persist()
                    try:
                        per_table.count()
                        self._apply_driver_side(per_table, tables)
                    finally:
                        per_table.unpersist()
                else:
                    # single-table batch (one topic → one table, the common
                    # deployment): stream straight through — persisting
                    # would only add a materialization pass
                    self._apply_driver_side(per_table, tables)
        finally:
            batch_df.unpersist()

    def _should_distribute(self, valid: DataFrame) -> bool:
        """Pick the apply path. ``distribute=True``/``False`` forces it;
        the default ``"auto"`` runs executor-side when the factory ships
        (cloudpickle) AND the batch is at/above ``distribute_threshold``
        rows — small/debug batches keep the reference's single-writer
        shape, a 100×-scale backfill automatically fans out one
        connection per partition. The count is on the CACHED batch, so
        auto mode costs one cached-scan action, not a recompute. Pass
        ``distribute=False`` for single-writer targets (sqlite) that
        cannot take concurrent connections regardless of batch size."""
        if self.distribute is True:
            return True
        if self.distribute == "auto":
            return (
                self._factory_serializable
                and valid.count() >= self.distribute_threshold
            )
        return False

    # -- corrupt branch (K9/K10) ---------------------------------------------
    def _handle_corrupt(self, corrupt: DataFrame) -> None:
        if not self.corrupt_table and self.errors_tolerance == "all":
            return  # silent-skip mode with no DLQ: nothing to evaluate
        # cheap emptiness probe on the cached batch — the common clean
        # batch must not open a DLQ connection (or depend on DLQ health)
        if corrupt.isEmpty():
            return
        n = 0
        if self.corrupt_table:
            conn = self.connection_factory()
            try:
                cur = conn.cursor()
                cols = [c for c in CORRUPT_TABLE_SCHEMA if c in corrupt.columns]
                created = False
                # stream every dead-letter row in bounded chunks — never
                # cap (losing DLQ records defeats the DLQ)
                chunk: list[tuple] = []
                for r in corrupt.toLocalIterator():
                    if not created:
                        if (
                            self.auto_create
                            and self.corrupt_table not in self._known_tables
                        ):
                            # auto-create the dead-letter table from the
                            # record shape (IidrCdcSinkTask.java:72-80)
                            from pyspark.sql import types as T

                            schema = T.StructType(
                                [f for f in corrupt.schema.fields if f.name in cols]
                            )
                            cur.execute(
                                self.dialect.create_table_sql(
                                    self.corrupt_table, schema, ()
                                )
                            )
                            self._known_tables.add(self.corrupt_table)
                        created = True
                    chunk.append(
                        tuple(
                            self._truncate_reason(r[c]) if c == "error_reason" else r[c]
                            for c in cols
                        )
                    )
                    if len(chunk) >= 10_000:
                        cur.executemany(
                            self.dialect.insert_sql(self.corrupt_table, cols), chunk
                        )
                        n += len(chunk)
                        chunk = []
                if chunk:
                    cur.executemany(
                        self.dialect.insert_sql(self.corrupt_table, cols), chunk
                    )
                    n += len(chunk)
                conn.commit()
            finally:
                conn.close()
        else:
            n = corrupt.count()
        if n == 0:
            return
        if self.errors_tolerance == "none":
            raise ValueError(f"{n} corrupt record(s) in batch and errors.tolerance=none")
        if self.errors_tolerance == "log":
            log.warning("skipping %d corrupt record(s)", n)

    @staticmethod
    def _truncate_reason(reason: str | None, limit: int = 1000) -> str | None:
        """≤1000 chars with ellipsis — CorruptEventWriter.java:173-178."""
        if reason is None or len(reason) <= limit:
            return reason
        return reason[: limit - 3] + "..."

    # -- apply paths ----------------------------------------------------------
    def _apply_driver_side(
        self, per_table: DataFrame, tables: list[str] | None = None
    ) -> None:
        """One connection, one transaction per table (the reference's
        shape: a single sink task with a JDBC connection).

        Rows stream through the driver via ``toLocalIterator`` in bounded
        chunks (same discipline as the DLQ path) — driver memory stays
        O(chunk) no matter how large the batch (e.g. a backfill replay),
        while the transaction still spans the whole table."""
        if tables is None:
            tables = [
                r[0] for r in per_table.select(self.table_col).distinct().collect()
            ]
        for table in sorted(tables):
            tdf = per_table.filter(F.col(self.table_col) == table).drop(self.table_col)
            conn = self.connection_factory()
            try:
                self._ensure_table(conn, table, tdf)
                self._write_stream(
                    conn, table, tdf.toLocalIterator(prefetchPartitions=True)
                )
                conn.commit()
            except Exception:
                conn.rollback()
                raise
            finally:
                conn.close()

    def _apply_distributed(self, per_table: DataFrame) -> None:
        """Executor-side apply: repartition by (table, pk) so each key
        lands on exactly one partition, then one connection per partition.
        Requires a picklable connection factory (e.g. a psycopg2 DSN
        closure) and a target DB that takes concurrent writers."""
        factory = self.connection_factory
        dialect = self.dialect
        pk = self.pk_fields
        value_cols = self.value_cols
        op_col = self.op_col
        table_col = self.table_col

        # DDL runs driver-side up front (one connection for all tables) so
        # executor partitions only ever issue DML — same auto_create/
        # auto_evolve semantics as the driver-side path. Every table
        # shares the batch schema, so no per-table filtering is needed.
        if self.auto_create or self.auto_evolve:
            tables = [
                r[0] for r in per_table.select(table_col).distinct().collect()
            ]
            schema_df = per_table.drop(table_col)
            conn = self.connection_factory()
            try:
                for table in sorted(tables):
                    self._ensure_table(conn, table, schema_df)
                conn.commit()
            finally:
                conn.close()

        def apply_partition(rows) -> None:
            rows = list(rows)
            if not rows:
                return
            conn = factory()
            try:
                by_table: dict[str, list] = {}
                for r in rows:
                    by_table.setdefault(r[table_col], []).append(r)
                cur = conn.cursor()
                for table, trows in by_table.items():
                    upsert = dialect.upsert_sql(table, [*pk, *value_cols], pk)
                    delete = dialect.delete_sql(table, pk)
                    ups = [
                        tuple(r[c] for c in [*pk, *value_cols])
                        for r in trows
                        if r[op_col] == OP_UPSERT
                    ]
                    dels = [
                        tuple(r[c] for c in pk) for r in trows if r[op_col] == OP_DELETE
                    ]
                    if ups:
                        cur.executemany(upsert, ups)
                    if dels:
                        cur.executemany(delete, dels)
                conn.commit()
            except Exception:
                conn.rollback()
                raise
            finally:
                conn.close()

        keys = [table_col] + pk
        if self.num_partitions is not None:
            shaped = per_table.repartition(self.num_partitions, *keys)
        else:
            shaped = per_table.repartition(*keys)
        shaped.foreachPartition(apply_partition)

    # -- DDL (K6/K7) -----------------------------------------------------------
    def _ensure_table(self, conn, table: str, tdf: DataFrame) -> None:
        schema_fields = [
            f for f in tdf.schema.fields if f.name not in (self.op_col,)
        ]
        from pyspark.sql import types as T

        schema = T.StructType(schema_fields)
        cur = conn.cursor()
        if self.auto_create and table not in self._known_tables:
            cur.execute(self.dialect.create_table_sql(table, schema, self.pk_fields))
            self._known_tables.add(table)
        if self.auto_evolve:
            existing = self._existing_columns(conn, table)
            if existing is not None:
                for f in schema.fields:
                    if self.dialect.normalize_identifier(f.name) not in existing:
                        cur.execute(self.dialect.add_column_sql(table, f))

    def _existing_columns(self, conn, table: str) -> set[str] | None:
        """Column metadata via a zero-row probe with dialect quoting (the
        reference uses DatabaseMetaData.getColumns,
        JdbcWriter.java:346-372). Names normalize per the DIALECT's
        metadata rule (PG lowercases unquoted identifiers, sqlite keeps
        case — normalize_identifier), not a blanket lower() that would
        mask case-sensitive targets."""
        try:
            cur = conn.cursor()
            cur.execute(f"SELECT * FROM {self.dialect.quote(table)} LIMIT 0")
            return {self.dialect.normalize_identifier(d[0]) for d in cur.description}
        except Exception:  # noqa: BLE001
            return None

    # -- DML -------------------------------------------------------------------
    def _write_stream(self, conn, table: str, rows, chunk_size: int = 10_000) -> None:
        """Batched upserts + deletes from a row iterator, flushed every
        ``chunk_size``. Keys are unique after last-write-wins dedup, so
        flush order between the upsert and delete statements is free."""
        cols = [*self.pk_fields, *self.value_cols]
        upsert = self.dialect.upsert_sql(table, cols, self.pk_fields)
        delete = self.dialect.delete_sql(table, self.pk_fields)
        cur = conn.cursor()
        ups: list[tuple] = []
        dels: list[tuple] = []
        for r in rows:
            op = r[self.op_col]
            if op == OP_UPSERT:
                ups.append(tuple(r[c] for c in cols))
                if len(ups) >= chunk_size:
                    cur.executemany(upsert, ups)
                    ups = []
            elif op == OP_DELETE:
                dels.append(tuple(r[c] for c in self.pk_fields))
                if len(dels) >= chunk_size:
                    cur.executemany(delete, dels)
                    dels = []
        if ups:
            cur.executemany(upsert, ups)
        if dels:
            cur.executemany(delete, dels)

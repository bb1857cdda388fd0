"""SQL dialects for the JDBC-style merge sink.

Behavioral parity with the reference's dialect strategy layer
(MySqlDialect.java:16-31, PostgreSqlDialect.java:17-39,
GenericDialect.java:30-74, DialectFactory.java:18-35), re-expressed for
Python DB-API connections driven from foreachBatch:

- MySQL/MariaDB: ``INSERT ... ON DUPLICATE KEY UPDATE col=VALUES(col)``
- PostgreSQL/YugabyteDB: ``INSERT ... ON CONFLICT (pk) DO UPDATE SET col =
  EXCLUDED.col`` and ``DO NOTHING`` when every column is part of the PK
- SQLite: PostgreSQL-style ``ON CONFLICT`` (used by the test rig)
- Generic: plain INSERT with a warning (no upsert support)

DDL: CREATE TABLE from a Spark schema (K6 auto-create) and ALTER TABLE ADD
COLUMN (K7 auto-evolve), with per-dialect type mapping mirroring
GenericDialect.java:199-221.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import types as T

log = logging.getLogger(__name__)


_COMMON_TYPES: list[tuple[type, str]] = [
    (T.LongType, "BIGINT"),
    (T.IntegerType, "INTEGER"),
    (T.ShortType, "SMALLINT"),
    (T.ByteType, "SMALLINT"),
    (T.DoubleType, "DOUBLE PRECISION"),
    (T.FloatType, "REAL"),
    (T.BooleanType, "BOOLEAN"),
    (T.BinaryType, "BLOB"),
    (T.DateType, "DATE"),
    (T.TimestampType, "TIMESTAMP"),
]


class Dialect:
    name = "generic"
    placeholder = "?"
    supports_upsert = False
    # per-dialect (SparkType, SQL string) pairs consulted BEFORE the
    # shared _COMMON_TYPES ladder — subclasses express their whole type
    # map as data instead of re-implementing the lookup
    _TYPE_OVERRIDES: list[tuple[type, str]] = []

    def quote(self, ident: str) -> str:
        return f'"{ident}"'

    def normalize_identifier(self, ident: str | None) -> str | None:
        """How the target DB stores unquoted identifiers in its metadata
        catalogs — the reference's normalizeIdentifierForMetadata
        (GenericDialect: unchanged; PostgreSqlDialect.java:95-98:
        lowercase)."""
        return ident

    def sql_type(self, dt: T.DataType) -> str:
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        for py_t, sql_t in (*self._TYPE_OVERRIDES, *_COMMON_TYPES):
            if isinstance(dt, py_t):
                return sql_t
        return "TEXT"

    # -- DML ---------------------------------------------------------------
    def insert_sql(self, table: str, cols: Sequence[str]) -> str:
        collist = ", ".join(self.quote(c) for c in cols)
        params = ", ".join(self.placeholder for _ in cols)
        return f"INSERT INTO {self.quote(table)} ({collist}) VALUES ({params})"

    def upsert_sql(self, table: str, cols: Sequence[str], pk: Sequence[str]) -> str:
        """Generic fallback: plain INSERT with a warning — mirrors
        GenericDialect.java:55-62."""
        log.warning(
            "dialect %s has no native upsert; falling back to INSERT for %s",
            self.name,
            table,
        )
        return self.insert_sql(table, cols)

    def delete_sql(self, table: str, pk: Sequence[str]) -> str:
        where = " AND ".join(f"{self.quote(c)} = {self.placeholder}" for c in pk)
        return f"DELETE FROM {self.quote(table)} WHERE {where}"

    # -- DDL ---------------------------------------------------------------
    def create_table_sql(
        self, table: str, schema: T.StructType, pk: Sequence[str]
    ) -> str:
        cols = [f"{self.quote(f.name)} {self.sql_type(f.dataType)}" for f in schema.fields]
        if pk:
            cols.append(f"PRIMARY KEY ({', '.join(self.quote(c) for c in pk)})")
        return f"CREATE TABLE IF NOT EXISTS {self.quote(table)} ({', '.join(cols)})"

    def add_column_sql(self, table: str, field: T.StructField) -> str:
        return (
            f"ALTER TABLE {self.quote(table)} ADD COLUMN "
            f"{self.quote(field.name)} {self.sql_type(field.dataType)}"
        )


class MySqlDialect(Dialect):
    name = "mysql"
    placeholder = "%s"
    supports_upsert = True

    def quote(self, ident: str) -> str:
        return f"`{ident}`"

    # mirrors MySqlDialect.java:34-60 (TINYINT for int8, VARCHAR(255)
    # strings, VARBINARY(255) bytes, TEXT default)
    _TYPE_OVERRIDES = [
        (T.ByteType, "TINYINT"),
        (T.ShortType, "SMALLINT"),
        (T.IntegerType, "INT"),
        (T.LongType, "BIGINT"),
        (T.FloatType, "FLOAT"),
        (T.DoubleType, "DOUBLE"),
        (T.BooleanType, "BOOLEAN"),
        (T.StringType, "VARCHAR(255)"),
        (T.BinaryType, "VARBINARY(255)"),
    ]

    def upsert_sql(self, table: str, cols: Sequence[str], pk: Sequence[str]) -> str:
        insert = self.insert_sql(table, cols)
        non_pk = [c for c in cols if c not in pk]
        updates = ", ".join(f"{self.quote(c)} = VALUES({self.quote(c)})" for c in non_pk)
        if not updates:  # all-PK rows: overwrite a PK col with itself (no-op)
            updates = f"{self.quote(pk[0])} = VALUES({self.quote(pk[0])})"
        return f"{insert} ON DUPLICATE KEY UPDATE {updates}"


class PostgreSqlDialect(Dialect):
    name = "postgresql"
    placeholder = "%s"
    supports_upsert = True

    def normalize_identifier(self, ident: str | None) -> str | None:
        # PostgreSQL stores unquoted identifiers lowercase in its catalogs
        # (PostgreSqlDialect.java:95-98)
        return ident.lower() if ident is not None else None

    # mirrors PostgreSqlDialect.java:43-70 (SMALLINT for int8/16,
    # REAL/DOUBLE PRECISION floats, VARCHAR(255) strings, BYTEA bytes,
    # TEXT default)
    _TYPE_OVERRIDES = [
        (T.ByteType, "SMALLINT"),
        (T.ShortType, "SMALLINT"),
        (T.IntegerType, "INT"),
        (T.LongType, "BIGINT"),
        (T.FloatType, "REAL"),
        (T.DoubleType, "DOUBLE PRECISION"),
        (T.BooleanType, "BOOLEAN"),
        (T.StringType, "VARCHAR(255)"),
        (T.BinaryType, "BYTEA"),
    ]

    def upsert_sql(self, table: str, cols: Sequence[str], pk: Sequence[str]) -> str:
        insert = self.insert_sql(table, cols)
        conflict = ", ".join(self.quote(c) for c in pk)
        non_pk = [c for c in cols if c not in pk]
        if not non_pk:
            # every column is part of the PK — PostgreSqlDialect.java:27-31
            return f"{insert} ON CONFLICT ({conflict}) DO NOTHING"
        updates = ", ".join(f"{self.quote(c)} = EXCLUDED.{self.quote(c)}" for c in non_pk)
        return f"{insert} ON CONFLICT ({conflict}) DO UPDATE SET {updates}"


class SqliteDialect(PostgreSqlDialect):
    """SQLite speaks PostgreSQL-style ON CONFLICT; used as the in-container
    test target (the reference tests against MariaDB/PG/YugabyteDB pods)."""

    name = "sqlite"
    placeholder = "?"

    def normalize_identifier(self, ident: str | None) -> str | None:
        # sqlite PRESERVES declared case in metadata but RESOLVES names
        # case-insensitively ("ALTER ... ADD name" conflicts with "NAME"),
        # so the metadata-comparison normal form is the casefold
        return ident.lower() if ident is not None else None

    # sqlite's type-affinity rules make the generic map (TEXT/BLOB/…) the
    # correct DDL; PG's VARCHAR(255)/BYTEA would land in NUMERIC affinity
    _TYPE_OVERRIDES: list[tuple[type, str]] = []


def dialect_for(name_or_url: str) -> Dialect:
    """Pick a dialect from a name or JDBC-ish URL substring — the analog of
    DialectFactory.java:18-35 (YugabyteDB routes to PostgreSQL)."""
    s = name_or_url.lower()
    if "mysql" in s or "mariadb" in s:
        return MySqlDialect()
    if "postgres" in s or "yugabyte" in s:
        return PostgreSqlDialect()
    if "sqlite" in s:
        return SqliteDialect()
    return Dialect()

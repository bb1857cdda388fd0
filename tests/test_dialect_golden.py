"""Golden-SQL contract tests: pin the EXACT strings every dialect emits.

No MySQL/PostgreSQL server exists in the container, so these strings are
the contract (VERDICT r2 #6): any drift from the reference's shapes —
MySqlDialect.java:16-31 (ON DUPLICATE KEY UPDATE ... VALUES()),
PostgreSqlDialect.java:17-39 (ON CONFLICT ... EXCLUDED, all-PK DO
NOTHING), PostgreSqlDialect.java:95-98 (lowercase metadata identifiers),
GenericDialect.java:55-62 (no-upsert INSERT fallback) — fails here, not
in production. Identifier quoting is the one deliberate difference from
the reference (which interpolates raw names): quoting is required for
IIDR's mixed-case table routing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from kafka_dbsync_spark.streaming.dialects import (
    Dialect,
    MySqlDialect,
    PostgreSqlDialect,
    SqliteDialect,
    dialect_for,
)

COLS = ["ID", "ORDER_NAME", "STATUS"]
PK = ["ID"]

SCHEMA = T.StructType(
    [
        T.StructField("ID", T.LongType()),
        T.StructField("N8", T.ByteType()),
        T.StructField("N16", T.ShortType()),
        T.StructField("N32", T.IntegerType()),
        T.StructField("F32", T.FloatType()),
        T.StructField("F64", T.DoubleType()),
        T.StructField("OK", T.BooleanType()),
        T.StructField("NAME", T.StringType()),
        T.StructField("RAW", T.BinaryType()),
        T.StructField("AMT", T.DecimalType(12, 2)),
    ]
)


def test_mysql_upsert_golden():
    sql = MySqlDialect().upsert_sql("t", COLS, PK)
    assert sql == (
        "INSERT INTO `t` (`ID`, `ORDER_NAME`, `STATUS`) VALUES (%s, %s, %s)"
        " ON DUPLICATE KEY UPDATE"
        " `ORDER_NAME` = VALUES(`ORDER_NAME`), `STATUS` = VALUES(`STATUS`)"
    )


def test_mysql_upsert_all_pk_golden():
    # MySQL has no DO NOTHING; the self-assignment is the documented no-op
    sql = MySqlDialect().upsert_sql("t", ["A", "B"], ["A", "B"])
    assert sql == (
        "INSERT INTO `t` (`A`, `B`) VALUES (%s, %s)"
        " ON DUPLICATE KEY UPDATE `A` = VALUES(`A`)"
    )


def test_postgres_upsert_golden():
    sql = PostgreSqlDialect().upsert_sql("t", COLS, PK)
    assert sql == (
        'INSERT INTO "t" ("ID", "ORDER_NAME", "STATUS") VALUES (%s, %s, %s)'
        ' ON CONFLICT ("ID") DO UPDATE SET'
        ' "ORDER_NAME" = EXCLUDED."ORDER_NAME", "STATUS" = EXCLUDED."STATUS"'
    )


def test_postgres_upsert_all_pk_do_nothing_golden():
    # every column in the PK → DO NOTHING (PostgreSqlDialect.java:27-31)
    sql = PostgreSqlDialect().upsert_sql("t", ["A", "B"], ["A", "B"])
    assert sql == (
        'INSERT INTO "t" ("A", "B") VALUES (%s, %s)'
        ' ON CONFLICT ("A", "B") DO NOTHING'
    )


def test_sqlite_upsert_golden():
    sql = SqliteDialect().upsert_sql("t", COLS, PK)
    assert sql == (
        'INSERT INTO "t" ("ID", "ORDER_NAME", "STATUS") VALUES (?, ?, ?)'
        ' ON CONFLICT ("ID") DO UPDATE SET'
        ' "ORDER_NAME" = EXCLUDED."ORDER_NAME", "STATUS" = EXCLUDED."STATUS"'
    )


def test_generic_upsert_falls_back_to_insert_golden(caplog):
    # GenericDialect.java:55-62: plain INSERT + warning
    import logging

    with caplog.at_level(logging.WARNING):
        sql = Dialect().upsert_sql("t", COLS, PK)
    assert sql == 'INSERT INTO "t" ("ID", "ORDER_NAME", "STATUS") VALUES (?, ?, ?)'
    assert any("no native upsert" in r.message for r in caplog.records)


def test_delete_golden_per_dialect():
    assert (
        MySqlDialect().delete_sql("t", ["A", "B"])
        == "DELETE FROM `t` WHERE `A` = %s AND `B` = %s"
    )
    assert (
        PostgreSqlDialect().delete_sql("t", ["A"]) == 'DELETE FROM "t" WHERE "A" = %s'
    )
    assert SqliteDialect().delete_sql("t", ["A"]) == 'DELETE FROM "t" WHERE "A" = ?'


def test_create_table_golden_mysql():
    sql = MySqlDialect().create_table_sql("t", SCHEMA, PK)
    assert sql == (
        "CREATE TABLE IF NOT EXISTS `t` ("
        "`ID` BIGINT, `N8` TINYINT, `N16` SMALLINT, `N32` INT, "
        "`F32` FLOAT, `F64` DOUBLE, `OK` BOOLEAN, `NAME` VARCHAR(255), "
        "`RAW` VARBINARY(255), `AMT` DECIMAL(12,2), "
        "PRIMARY KEY (`ID`))"
    )


def test_create_table_golden_postgres():
    sql = PostgreSqlDialect().create_table_sql("t", SCHEMA, PK)
    assert sql == (
        'CREATE TABLE IF NOT EXISTS "t" ('
        '"ID" BIGINT, "N8" SMALLINT, "N16" SMALLINT, "N32" INT, '
        '"F32" REAL, "F64" DOUBLE PRECISION, "OK" BOOLEAN, "NAME" VARCHAR(255), '
        '"RAW" BYTEA, "AMT" DECIMAL(12,2), '
        'PRIMARY KEY ("ID"))'
    )


def test_create_table_golden_sqlite_uses_affinity_types():
    sql = SqliteDialect().create_table_sql("t", SCHEMA, PK)
    assert sql == (
        'CREATE TABLE IF NOT EXISTS "t" ('
        '"ID" BIGINT, "N8" SMALLINT, "N16" SMALLINT, "N32" INTEGER, '
        '"F32" REAL, "F64" DOUBLE PRECISION, "OK" BOOLEAN, "NAME" TEXT, '
        '"RAW" BLOB, "AMT" DECIMAL(12,2), '
        'PRIMARY KEY ("ID"))'
    )


def test_alter_add_column_golden():
    f = T.StructField("NEW_COL", T.StringType())
    assert (
        MySqlDialect().add_column_sql("t", f)
        == "ALTER TABLE `t` ADD COLUMN `NEW_COL` VARCHAR(255)"
    )
    assert (
        PostgreSqlDialect().add_column_sql("t", f)
        == 'ALTER TABLE "t" ADD COLUMN "NEW_COL" VARCHAR(255)'
    )
    assert (
        SqliteDialect().add_column_sql("t", f)
        == 'ALTER TABLE "t" ADD COLUMN "NEW_COL" TEXT'
    )


def test_metadata_identifier_normalization():
    # PostgreSqlDialect.java:95-98 lowercases; generic keeps declared
    # case; sqlite RESOLVES case-insensitively (its metadata-comparison
    # normal form is the casefold even though it stores declared case)
    assert PostgreSqlDialect().normalize_identifier("MiXeD") == "mixed"
    assert PostgreSqlDialect().normalize_identifier(None) is None
    assert Dialect().normalize_identifier("MiXeD") == "MiXeD"
    assert SqliteDialect().normalize_identifier("MiXeD") == "mixed"


@pytest.mark.parametrize(
    ("url", "cls"),
    [
        ("jdbc:mysql://h/db", MySqlDialect),
        ("jdbc:mariadb://h:3306/db", MySqlDialect),
        ("jdbc:postgresql://h/db", PostgreSqlDialect),
        ("yugabyte", PostgreSqlDialect),
        ("sqlite", SqliteDialect),
        ("jdbc:weirddb://h/db", Dialect),
    ],
)
def test_dialect_factory_routing(url, cls):
    d = dialect_for(url)
    assert type(d) is cls

"""SURVEY §7.2 M5 — Debezium datatype matrix (functions/datatypes.py).

Mirrors the reference's 33-column Oracle fixture
(/root/reference/hack/sql/oracle-datatype-test.sql:17-50) with its 4
curated rows; expected values follow
docs/debezium-datatype-comparison-results.md:31-96.
"""

import duckdb
import pytest

from kafka_dbsync_spark.functions import datatypes as dt


@pytest.fixture(scope="module")
def decoded(spark):
    wire = spark.createDataFrame(
        [tuple(r[n] for n, _ in dt._WIRE_COLUMNS) for r in dt.datatype_wire_rows()],
        dt.DATATYPE_WIRE_SCHEMA,
    )
    rows = {r["id"]: r.asDict() for r in dt.decode_wire(wire).collect()}
    assert set(rows) == {1, 2, 3, 4}
    return rows


def test_spark_decode_matches_pure_python_expectation(decoded):
    expected = {r["id"]: r for r in dt.expected_decoded_rows()}
    for rid, exp in expected.items():
        got = decoded[rid]
        assert set(got) == set(exp)
        for col, want in exp.items():
            assert got[col] == want, f"row {rid} col {col}: {got[col]!r} != {want!r}"


def test_nanos_floor_truncation(decoded):
    # 1 nanosecond floors to 0 micros — Spark must not round up or drift
    # through float division (TimestampConverter.java:94-112 truncates).
    assert decoded[2]["ts_nanos"] == "1970-01-01 00:00:00.000000"
    assert decoded[1]["ts_nanos"] == "2025-06-15 14:30:45.123456"


def test_zoned_timestamps_normalize_to_utc(decoded):
    assert decoded[1]["ts_tz_utc"] == "2025-06-15 05:30:45.123456"  # +09:00
    assert decoded[2]["ts_tz_utc"] == "1970-01-01 12:00:00.000001"  # -12:00


def test_negative_intervals(decoded):
    assert decoded[2]["interval_ym_months"] == -(99 * 12 + 11)
    assert decoded[2]["interval_ds_micros"] == -8639999999999


def test_oracle_empty_string_and_blob_semantics(decoded):
    z = decoded[4]
    assert z["varchar2_50"] is None  # Oracle '' IS NULL
    assert z["raw_hex"] is None  # CAST_TO_RAW('') IS NULL
    assert z["blob_hex"] == ""  # EMPTY_BLOB() is zero-length, NOT NULL
    assert z["char_10"] == " " * 10  # CHAR blank-pads


def test_all_null_row_stays_null(decoded):
    nulls = decoded[3]
    assert all(v is None for k, v in nulls.items() if k != "id")


def test_decimal_modes_and_38_digits(decoded):
    t = decoded[1]
    assert t["number_38"] == "12345678901234567890123456789012345678"
    assert t["number_10_2_precise"] == "12345678.90"
    assert t["number_10_2_double"] == pytest.approx(12345678.90)
    assert t["number_10_2_strmode"] == "12345678.90"
    assert decoded[2]["number_38"] == "-99999999999999999999999999999999999999"


def test_boolean_as_number1(decoded):
    assert decoded[1]["boolean_sim"] is True
    assert decoded[4]["boolean_sim"] is False
    assert decoded[3]["boolean_sim"] is None


def test_oracle_sql_is_valid_duckdb():
    df = duckdb.connect().execute(dt.datatype_oracle_sql()).df()
    assert len(df) == 4
    assert sorted(df.columns) == sorted(n for n, _, _ in dt.DECODED_COLUMNS)

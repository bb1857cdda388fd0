"""Debezium wire-format datatype decoders — the SURVEY §7.2 M5 matrix.

The reference validates CDC datatype fidelity with a 33-column Oracle
table covering every NUMBER precision (incl. 38), FLOAT/BINARY_FLOAT/
BINARY_DOUBLE, CHAR/VARCHAR2/NCHAR/NVARCHAR2, DATE, TIMESTAMP(3/6/9),
TIMESTAMP WITH (LOCAL) TIME ZONE, INTERVAL YEAR TO MONTH / DAY TO SECOND,
CLOB/NCLOB/BLOB/RAW, and boolean-as-NUMBER(1), with 4 curated rows:
typical / negative / all-NULL / zero-and-empty
(/root/reference/hack/sql/oracle-datatype-test.sql:17-50,
/root/reference/docs/debezium-datatype-comparison-results.md:31-96).

This module models what lands on the wire after Debezium's decode
(the documented mappings: NUMBER(p≤18,0)→int types, larger/scaled NUMBER
under decimal.handling.mode ∈ {precise, double, string}, DATE→epoch days,
TIMESTAMP(3/6/9)→epoch millis/micros/nanos, TZ/LTZ→ISO-8601 string,
BLOB/RAW→base64, Oracle ''≡NULL, CHAR blank-padded) and provides
JVM-side decoders from the wire columns to typed Spark columns. No
Python runs per row — every decoder is a Catalyst expression, so the
matrix holds at any scale.
"""

from __future__ import annotations

import base64

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# wire fixture — the reference's 4 curated rows as Debezium after-images
# ---------------------------------------------------------------------------


def _pad(s: str, n: int) -> str:
    """Oracle CHAR(n) semantics: blank-pad to declared length."""
    return s.ljust(n)


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


# epoch-encoded constants (UTC):
#   2025-06-15 14:30:45.123456[789] / 1970-01-01 00:00:00.000000001 /
#   2000-01-01 00:00:00 — precomputed so the fixture stays literal.
_WIRE_COLUMNS: list[tuple[str, T.DataType]] = [
    ("ID", T.LongType()),
    ("COL_NUMBER", T.StringType()),  # plain NUMBER: string-mode wire form
    ("COL_NUMBER_5", T.IntegerType()),  # NUMBER(5) → INT32
    ("COL_NUMBER_10", T.LongType()),  # NUMBER(10) → INT64
    ("COL_NUMBER_19", T.LongType()),  # NUMBER(19): precise → DECIMAL(19,0)
    ("COL_NUMBER_38", T.StringType()),  # NUMBER(38): string-mode wire form
    ("COL_NUMBER_10_2", T.StringType()),
    ("COL_NUMBER_15_5", T.StringType()),
    ("COL_FLOAT", T.StringType()),  # Oracle FLOAT is decimal-based
    ("COL_BINARY_FLOAT", T.FloatType()),  # IEEE float32
    ("COL_BINARY_DOUBLE", T.DoubleType()),  # IEEE float64
    ("COL_CHAR", T.StringType()),
    ("COL_CHAR_50", T.StringType()),
    ("COL_VARCHAR2_50", T.StringType()),
    ("COL_VARCHAR2_500", T.StringType()),
    ("COL_VARCHAR2_4000", T.StringType()),
    ("COL_NCHAR", T.StringType()),
    ("COL_NVARCHAR2", T.StringType()),
    ("COL_DATE", T.IntegerType()),  # io.debezium.time.Date: epoch days
    ("COL_TIMESTAMP", T.LongType()),  # MicroTimestamp (default precision 6)
    ("COL_TIMESTAMP_3", T.LongType()),  # Timestamp: epoch millis
    ("COL_TIMESTAMP_6", T.LongType()),  # MicroTimestamp: epoch micros
    ("COL_TIMESTAMP_9", T.LongType()),  # NanoTimestamp: epoch nanos
    ("COL_TIMESTAMP_TZ", T.StringType()),  # ZonedTimestamp: ISO w/ offset
    ("COL_TIMESTAMP_LTZ", T.StringType()),  # normalized to UTC by source
    ("COL_INTERVAL_YM", T.StringType()),  # Oracle literal 'Y-M'
    ("COL_INTERVAL_DS", T.StringType()),  # Oracle literal 'D HH:MM:SS.FFFFFF'
    ("COL_CLOB", T.StringType()),
    ("COL_NCLOB", T.StringType()),
    ("COL_BLOB", T.StringType()),  # base64
    ("COL_RAW", T.StringType()),  # base64
    ("COL_BOOLEAN_SIM", T.IntegerType()),  # NUMBER(1) CHECK IN (0,1)
]

DATATYPE_WIRE_SCHEMA = T.StructType(
    [T.StructField(name, dt, True) for name, dt in _WIRE_COLUMNS]
)


def datatype_wire_rows() -> list[dict]:
    """The 4 curated rows (typical / negative / all-NULL / zero-empty) as
    wire dicts. Oracle semantics applied at the source: '' ≡ NULL for
    VARCHAR2/NVARCHAR2/CLOB/NCLOB/RAW, EMPTY_BLOB() is zero-length (not
    NULL), CHAR/NCHAR blank-padded to declared length."""
    typical = {
        "ID": 1,
        "COL_NUMBER": "123456.789",
        "COL_NUMBER_5": 12345,
        "COL_NUMBER_10": 1234567890,
        "COL_NUMBER_19": 1234567890123456789,
        "COL_NUMBER_38": "12345678901234567890123456789012345678",
        "COL_NUMBER_10_2": "12345678.90",
        "COL_NUMBER_15_5": "1234567890.12345",
        "COL_FLOAT": "3.14159",
        "COL_BINARY_FLOAT": 3.14159,
        "COL_BINARY_DOUBLE": 3.141592653589793,
        "COL_CHAR": _pad("CHAR10", 10),
        "COL_CHAR_50": _pad("Character data with padding", 50),
        "COL_VARCHAR2_50": "VARCHAR2 short",
        "COL_VARCHAR2_500": "VARCHAR2 medium length text",
        "COL_VARCHAR2_4000": "VARCHAR2 longer text content here",
        "COL_NCHAR": _pad("NCHAR", 10),
        "COL_NVARCHAR2": "Unicode text",
        "COL_DATE": 20254,
        "COL_TIMESTAMP": 1749997845123456,
        "COL_TIMESTAMP_3": 1749997845123,
        "COL_TIMESTAMP_6": 1749997845123456,
        "COL_TIMESTAMP_9": 1749997845123456789,
        "COL_TIMESTAMP_TZ": "2025-06-15T14:30:45.123456+09:00",
        "COL_TIMESTAMP_LTZ": "2025-06-15T14:30:45.123456Z",
        "COL_INTERVAL_YM": "5-3",
        "COL_INTERVAL_DS": "10 05:30:15.123456",
        "COL_CLOB": "This is a CLOB test content.",
        "COL_NCLOB": "This is NCLOB with Unicode",
        "COL_BLOB": _b64(b"Binary BLOB data"),
        "COL_RAW": _b64(b"Raw binary"),
        "COL_BOOLEAN_SIM": 1,
    }
    negative = {
        "ID": 2,
        "COL_NUMBER": "-999999.999",
        "COL_NUMBER_5": -99999,
        "COL_NUMBER_10": -2147483648,
        "COL_NUMBER_19": -9223372036854775808,
        "COL_NUMBER_38": "-99999999999999999999999999999999999999",
        "COL_NUMBER_10_2": "-99999999.99",
        "COL_NUMBER_15_5": "-9999999999.99999",
        "COL_FLOAT": "-3.14159",
        "COL_BINARY_FLOAT": -3.14159,
        "COL_BINARY_DOUBLE": -3.141592653589793,
        "COL_CHAR": _pad("NEG", 10),
        "COL_CHAR_50": _pad("Negative test values", 50),
        "COL_VARCHAR2_50": "Negative",
        "COL_VARCHAR2_500": "Edge case negative numbers",
        "COL_VARCHAR2_4000": "Testing negative handling",
        "COL_NCHAR": _pad("NEG", 10),
        "COL_NVARCHAR2": "Negative test",
        "COL_DATE": 0,
        "COL_TIMESTAMP": 1,
        "COL_TIMESTAMP_3": 1,
        "COL_TIMESTAMP_6": 1,
        "COL_TIMESTAMP_9": 1,
        "COL_TIMESTAMP_TZ": "1970-01-01T00:00:00.000001-12:00",
        "COL_TIMESTAMP_LTZ": "1970-01-01T00:00:00.000001Z",
        "COL_INTERVAL_YM": "-99-11",
        "COL_INTERVAL_DS": "-99 23:59:59.999999",
        "COL_CLOB": "CLOB negative test",
        "COL_NCLOB": "NCLOB negative",
        "COL_BLOB": _b64(b"Negative BLOB"),
        "COL_RAW": _b64(b"NegRaw"),
        "COL_BOOLEAN_SIM": 0,
    }
    all_null = {"ID": 3}
    zero_empty = {
        "ID": 4,
        "COL_NUMBER": "0",
        "COL_NUMBER_5": 0,
        "COL_NUMBER_10": 0,
        "COL_NUMBER_19": 0,
        "COL_NUMBER_38": "0",
        "COL_NUMBER_10_2": "0.00",
        "COL_NUMBER_15_5": "0.00000",
        "COL_FLOAT": "0",
        "COL_BINARY_FLOAT": 0.0,
        "COL_BINARY_DOUBLE": 0.0,
        "COL_CHAR": _pad(" ", 10),
        "COL_CHAR_50": _pad(" ", 50),
        "COL_VARCHAR2_50": None,  # Oracle '' IS NULL
        "COL_VARCHAR2_500": None,
        "COL_VARCHAR2_4000": None,
        "COL_NCHAR": _pad(" ", 10),
        "COL_NVARCHAR2": None,
        "COL_DATE": 10957,
        "COL_TIMESTAMP": 946684800000000,
        "COL_TIMESTAMP_3": 946684800000,
        "COL_TIMESTAMP_6": 946684800000000,
        "COL_TIMESTAMP_9": 946684800000000000,
        "COL_TIMESTAMP_TZ": "2000-01-01T00:00:00+00:00",
        "COL_TIMESTAMP_LTZ": "2000-01-01T00:00:00Z",
        "COL_INTERVAL_YM": "0-0",
        "COL_INTERVAL_DS": "0 00:00:00.000000",
        "COL_CLOB": None,
        "COL_NCLOB": None,
        "COL_BLOB": _b64(b""),  # EMPTY_BLOB(): zero-length, NOT NULL
        "COL_RAW": None,  # CAST_TO_RAW('') IS NULL
        "COL_BOOLEAN_SIM": 0,
    }
    base = {name: None for name, _ in _WIRE_COLUMNS}
    return [{**base, **r} for r in (typical, negative, all_null, zero_empty)]


# ---------------------------------------------------------------------------
# decoders — all pure Catalyst expressions
# ---------------------------------------------------------------------------

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def epoch_millis_ts(c: Column | str) -> Column:
    """Debezium Timestamp (epoch millis) → formatted UTC string."""
    return F.date_format(F.timestamp_millis(_col(c)), _TS_FMT)


def epoch_micros_ts(c: Column | str) -> Column:
    """Debezium MicroTimestamp (epoch micros) → formatted UTC string."""
    return F.date_format(F.timestamp_micros(_col(c)), _TS_FMT)


def epoch_nanos_ts(c: Column | str) -> Column:
    """Debezium NanoTimestamp (epoch nanos) → formatted UTC string,
    floor-truncated to Spark's microsecond precision (same truncation rule
    as TimestampConverter.java:94-112). The division goes through
    DECIMAL, not double — epoch nanos (~2^60) exceed double's 2^53 exact
    range, so a float round-trip could be off by a microsecond."""
    nanos = _col(c).cast("long")
    floored = nanos - (((nanos % 1000) + 1000) % 1000)  # exact multiple of 1000
    micros = (floored.cast(T.DecimalType(38, 0)) / F.lit(1000)).cast("long")
    return F.date_format(F.timestamp_micros(micros), _TS_FMT)


def epoch_days_date(c: Column | str) -> Column:
    """io.debezium.time.Date (epoch days) → ISO date string."""
    return F.date_format(F.date_add(F.to_date(F.lit("1970-01-01")), _col(c)), "yyyy-MM-dd")


def zoned_ts_utc(c: Column | str) -> Column:
    """Debezium ZonedTimestamp (ISO-8601 with offset / Z) → UTC instant,
    formatted. Spark's timestamp cast accepts ISO offsets; the session
    zone is pinned to UTC (pin_session_confs), so formatting is in UTC."""
    return F.date_format(_col(c).cast("timestamp"), _TS_FMT)


_YM_RE = r"^(-?)(\d+)-(\d+)$"
_DS_RE = r"^(-?)(\d+) (\d+):(\d+):(\d+)\.(\d+)$"


def interval_ym_months(c: Column | str) -> Column:
    """Oracle INTERVAL YEAR TO MONTH literal ('[-]Y-M') → signed total
    months (Debezium interval.handling.mode=numeric semantics)."""
    col = _col(c)
    sign = F.when(F.regexp_extract(col, _YM_RE, 1) == "-", -1).otherwise(1)
    years = F.regexp_extract(col, _YM_RE, 2).cast("int")
    months = F.regexp_extract(col, _YM_RE, 3).cast("int")
    return (sign * (years * 12 + months)).cast("int")


def interval_ds_micros(c: Column | str) -> Column:
    """Oracle INTERVAL DAY TO SECOND literal ('[-]D HH:MM:SS.FFFFFF') →
    signed total microseconds (MicroDuration semantics)."""
    col = _col(c)
    sign = F.when(F.regexp_extract(col, _DS_RE, 1) == "-", -1).otherwise(1)
    days = F.regexp_extract(col, _DS_RE, 2).cast("long")
    hh = F.regexp_extract(col, _DS_RE, 3).cast("long")
    mm = F.regexp_extract(col, _DS_RE, 4).cast("long")
    ss = F.regexp_extract(col, _DS_RE, 5).cast("long")
    frac = F.rpad(F.regexp_extract(col, _DS_RE, 6), 6, "0").cast("long")
    total = (days * 86400 + hh * 3600 + mm * 60 + ss) * 1_000_000 + frac
    return (sign * total).cast("long")


def number_precise(c: Column | str, precision: int, scale: int = 0) -> Column:
    """decimal.handling.mode=precise: exact DECIMAL(p,s), emitted as a
    canonical string (a 38-digit value has no lossless float form)."""
    return _col(c).cast(T.DecimalType(precision, scale)).cast("string")


def number_double(c: Column | str) -> Column:
    """decimal.handling.mode=double (may lose precision — documented)."""
    return _col(c).cast("double")


def number_string(c: Column | str) -> Column:
    """decimal.handling.mode=string: the wire form, passed through."""
    return _col(c).cast("string")


def boolean_from_number(c: Column | str) -> Column:
    """Oracle boolean-as-NUMBER(1) (CHECK IN (0,1)) → BOOLEAN; anything
    else (impossible under the CHECK) and NULL stay NULL."""
    col = _col(c)
    return F.when(col == 1, F.lit(True)).when(col == 0, F.lit(False))


def binary_hex(c: Column | str) -> Column:
    """base64 wire bytes → uppercase hex (engine-portable binary image;
    zero-length stays '' and NULL stays NULL)."""
    return F.hex(F.unbase64(_col(c)))


# ---------------------------------------------------------------------------
# full-matrix decode plan + independent pure-Python expectation (the oracle)
# ---------------------------------------------------------------------------

# (output column, kind, wire column) — kind drives the oracle's SQL casts.
# NUMBER_10_2 is decoded under all three decimal.handling.modes to pin the
# mode semantics (reference config `decimal.handling.mode`,
# docs/debezium-datatype-comparison-results.md:31-96).
DECODED_COLUMNS: list[tuple[str, str, str]] = [
    ("id", "long", "ID"),
    ("number_str", "str", "COL_NUMBER"),
    ("number_5", "long", "COL_NUMBER_5"),
    ("number_10", "long", "COL_NUMBER_10"),
    ("number_19", "str", "COL_NUMBER_19"),
    ("number_38", "str", "COL_NUMBER_38"),
    ("number_10_2_precise", "str", "COL_NUMBER_10_2"),
    ("number_10_2_double", "double", "COL_NUMBER_10_2"),
    ("number_10_2_strmode", "str", "COL_NUMBER_10_2"),
    ("number_15_5_precise", "str", "COL_NUMBER_15_5"),
    ("float_str", "str", "COL_FLOAT"),
    ("binary_float_str", "str", "COL_BINARY_FLOAT"),
    ("binary_double", "double", "COL_BINARY_DOUBLE"),
    ("char_10", "str", "COL_CHAR"),
    ("char_50", "str", "COL_CHAR_50"),
    ("varchar2_50", "str", "COL_VARCHAR2_50"),
    ("varchar2_500", "str", "COL_VARCHAR2_500"),
    ("varchar2_4000", "str", "COL_VARCHAR2_4000"),
    ("nchar_10", "str", "COL_NCHAR"),
    ("nvarchar2", "str", "COL_NVARCHAR2"),
    ("date_iso", "str", "COL_DATE"),
    ("ts_default", "str", "COL_TIMESTAMP"),
    ("ts_millis", "str", "COL_TIMESTAMP_3"),
    ("ts_micros", "str", "COL_TIMESTAMP_6"),
    ("ts_nanos", "str", "COL_TIMESTAMP_9"),
    ("ts_tz_utc", "str", "COL_TIMESTAMP_TZ"),
    ("ts_ltz_utc", "str", "COL_TIMESTAMP_LTZ"),
    ("interval_ym_months", "long", "COL_INTERVAL_YM"),
    ("interval_ds_micros", "long", "COL_INTERVAL_DS"),
    ("clob", "str", "COL_CLOB"),
    ("nclob", "str", "COL_NCLOB"),
    ("blob_hex", "str", "COL_BLOB"),
    ("raw_hex", "str", "COL_RAW"),
    ("boolean_sim", "bool", "COL_BOOLEAN_SIM"),
]


def decode_wire(df):
    """Apply the full decoder matrix to a wire-shaped DataFrame — one
    Catalyst expression per DECODED_COLUMNS entry, zero Python per row."""
    exprs = [
        F.col("ID").cast("long").alias("id"),
        number_string("COL_NUMBER").alias("number_str"),
        F.col("COL_NUMBER_5").cast("long").alias("number_5"),
        F.col("COL_NUMBER_10").cast("long").alias("number_10"),
        number_precise("COL_NUMBER_19", 19, 0).alias("number_19"),
        number_precise("COL_NUMBER_38", 38, 0).alias("number_38"),
        number_precise("COL_NUMBER_10_2", 10, 2).alias("number_10_2_precise"),
        number_double("COL_NUMBER_10_2").alias("number_10_2_double"),
        number_string("COL_NUMBER_10_2").alias("number_10_2_strmode"),
        number_precise("COL_NUMBER_15_5", 15, 5).alias("number_15_5_precise"),
        number_string("COL_FLOAT").alias("float_str"),
        F.col("COL_BINARY_FLOAT").cast("string").alias("binary_float_str"),
        F.col("COL_BINARY_DOUBLE").alias("binary_double"),
        F.col("COL_CHAR").alias("char_10"),
        F.col("COL_CHAR_50").alias("char_50"),
        F.col("COL_VARCHAR2_50").alias("varchar2_50"),
        F.col("COL_VARCHAR2_500").alias("varchar2_500"),
        F.col("COL_VARCHAR2_4000").alias("varchar2_4000"),
        F.col("COL_NCHAR").alias("nchar_10"),
        F.col("COL_NVARCHAR2").alias("nvarchar2"),
        epoch_days_date("COL_DATE").alias("date_iso"),
        epoch_micros_ts("COL_TIMESTAMP").alias("ts_default"),
        epoch_millis_ts("COL_TIMESTAMP_3").alias("ts_millis"),
        epoch_micros_ts("COL_TIMESTAMP_6").alias("ts_micros"),
        epoch_nanos_ts("COL_TIMESTAMP_9").alias("ts_nanos"),
        zoned_ts_utc("COL_TIMESTAMP_TZ").alias("ts_tz_utc"),
        zoned_ts_utc("COL_TIMESTAMP_LTZ").alias("ts_ltz_utc"),
        interval_ym_months("COL_INTERVAL_YM").cast("long").alias("interval_ym_months"),
        interval_ds_micros("COL_INTERVAL_DS").alias("interval_ds_micros"),
        F.col("COL_CLOB").alias("clob"),
        F.col("COL_NCLOB").alias("nclob"),
        binary_hex("COL_BLOB").alias("blob_hex"),
        binary_hex("COL_RAW").alias("raw_hex"),
        boolean_from_number("COL_BOOLEAN_SIM").alias("boolean_sim"),
    ]
    return df.select(*exprs)


def expected_decoded_rows() -> list[dict]:
    """Pure-Python (datetime/decimal/base64 — no Spark) implementation of
    the same Debezium decode semantics. This is the ORACLE side: an
    independent second implementation, so a bug in the Catalyst decoders
    cannot cancel out."""
    import decimal
    from datetime import date, datetime, timedelta, timezone

    import numpy as np

    ctx = decimal.Context(prec=40)  # default 28 can't quantize 38 digits

    def dec(v: str | None, scale: int) -> str | None:
        if v is None:
            return None
        d = decimal.Decimal(v).quantize(decimal.Decimal(1).scaleb(-scale), context=ctx)
        return str(d)

    def fmt_us(micros: int | None) -> str | None:
        if micros is None:
            return None
        dt = datetime(1970, 1, 1) + timedelta(microseconds=micros)
        return dt.strftime("%Y-%m-%d %H:%M:%S.%f")

    def fmt_zoned(iso: str | None) -> str | None:
        if iso is None:
            return None
        dt = datetime.fromisoformat(iso).astimezone(timezone.utc)
        return dt.replace(tzinfo=None).strftime("%Y-%m-%d %H:%M:%S.%f")

    def ym_months(lit: str | None) -> int | None:
        if lit is None:
            return None
        sign = -1 if lit.startswith("-") else 1
        y, m = lit.lstrip("-").split("-")
        return sign * (int(y) * 12 + int(m))

    def ds_micros(lit: str | None) -> int | None:
        if lit is None:
            return None
        sign = -1 if lit.startswith("-") else 1
        d, hms = lit.lstrip("-").split(" ")
        hh, mm, ssfrac = hms.split(":")
        ss, frac = ssfrac.split(".")
        total = (int(d) * 86400 + int(hh) * 3600 + int(mm) * 60 + int(ss)) * 1_000_000
        return sign * (total + int(frac.ljust(6, "0")))

    def b64_hex(v: str | None) -> str | None:
        return None if v is None else base64.b64decode(v).hex().upper()

    out = []
    for w in datatype_wire_rows():
        out.append(
            {
                "id": w["ID"],
                "number_str": w["COL_NUMBER"],
                "number_5": w["COL_NUMBER_5"],
                "number_10": w["COL_NUMBER_10"],
                "number_19": None if w["COL_NUMBER_19"] is None else str(w["COL_NUMBER_19"]),
                "number_38": dec(w["COL_NUMBER_38"], 0),
                "number_10_2_precise": dec(w["COL_NUMBER_10_2"], 2),
                "number_10_2_double": None
                if w["COL_NUMBER_10_2"] is None
                else float(w["COL_NUMBER_10_2"]),
                "number_10_2_strmode": w["COL_NUMBER_10_2"],
                "number_15_5_precise": dec(w["COL_NUMBER_15_5"], 5),
                "float_str": w["COL_FLOAT"],
                # Java Float.toString and numpy's float32 str both emit the
                # shortest round-trip decimal — same digits
                "binary_float_str": None
                if w["COL_BINARY_FLOAT"] is None
                else str(np.float32(w["COL_BINARY_FLOAT"])),
                "binary_double": w["COL_BINARY_DOUBLE"],
                "char_10": w["COL_CHAR"],
                "char_50": w["COL_CHAR_50"],
                "varchar2_50": w["COL_VARCHAR2_50"],
                "varchar2_500": w["COL_VARCHAR2_500"],
                "varchar2_4000": w["COL_VARCHAR2_4000"],
                "nchar_10": w["COL_NCHAR"],
                "nvarchar2": w["COL_NVARCHAR2"],
                "date_iso": None
                if w["COL_DATE"] is None
                else (date(1970, 1, 1) + timedelta(days=w["COL_DATE"])).isoformat(),
                "ts_default": fmt_us(w["COL_TIMESTAMP"]),
                "ts_millis": None
                if w["COL_TIMESTAMP_3"] is None
                else fmt_us(w["COL_TIMESTAMP_3"] * 1000),
                "ts_micros": fmt_us(w["COL_TIMESTAMP_6"]),
                "ts_nanos": None
                if w["COL_TIMESTAMP_9"] is None
                else fmt_us(w["COL_TIMESTAMP_9"] // 1000),
                "ts_tz_utc": fmt_zoned(w["COL_TIMESTAMP_TZ"]),
                "ts_ltz_utc": fmt_zoned(w["COL_TIMESTAMP_LTZ"]),
                "interval_ym_months": ym_months(w["COL_INTERVAL_YM"]),
                "interval_ds_micros": ds_micros(w["COL_INTERVAL_DS"]),
                "clob": w["COL_CLOB"],
                "nclob": w["COL_NCLOB"],
                "blob_hex": b64_hex(w["COL_BLOB"]),
                "raw_hex": b64_hex(w["COL_RAW"]),
                "boolean_sim": None
                if w["COL_BOOLEAN_SIM"] is None
                else bool(w["COL_BOOLEAN_SIM"]),
            }
        )
    return out


def _sql_lit(v, kind: str) -> str:
    if v is None:
        sql_t = {"str": "VARCHAR", "long": "BIGINT", "double": "DOUBLE", "bool": "BOOLEAN"}[
            kind
        ]
        return f"CAST(NULL AS {sql_t})"
    if kind == "str":
        return "'" + str(v).replace("'", "''") + "'"
    if kind == "long":
        return f"CAST({int(v)} AS BIGINT)"
    if kind == "double":
        return f"CAST({v!r} AS DOUBLE)"
    return "TRUE" if v else "FALSE"


def datatype_oracle_sql() -> str:
    """Render expected_decoded_rows() as a typed DuckDB VALUES table —
    the golden side of the datatype_matrix correctness query."""
    names = [n for n, _, _ in DECODED_COLUMNS]
    kinds = {n: k for n, k, _ in DECODED_COLUMNS}
    rows_sql = ",\n      ".join(
        "(" + ", ".join(_sql_lit(r[n], kinds[n]) for n in names) + ")"
        for r in expected_decoded_rows()
    )
    return (
        "SELECT * FROM (VALUES\n      "
        + rows_sql
        + f"\n    ) AS t({', '.join(names)})"
    )

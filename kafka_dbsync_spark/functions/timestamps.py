"""Timestamp/date/time normalization and multi-pattern coercion.

Two behaviors from the reference, re-expressed as pure column expressions:

1. **A_TIMSTAMP normalization** (TimestampConverter.java:27-28,70-120):
   input ``yyyy-MM-dd HH:mm:ss.SSSSSSSSSSSS`` (up to 12 fractional digits,
   zone-less); fraction is truncated (reference truncates 12→9 for nanos;
   Spark timestamps are microseconds so we truncate to 6 — documented
   precision difference), the local time is interpreted in a configured
   zone (named id or ``+HH:mm`` offset) and emitted as ISO-8601 with
   offset.

2. **Field type overrides / multi-pattern coercion**
   (IidrToJdbcSinkTransform.java:61-75,258-294): strings parsed with an
   ordered pattern list (`T` and space datetime variants, with/without
   fraction), strictly — an unparseable non-null value is an error the
   caller routes to the corrupt branch (we surface it as NULL next to a
   ``<col>_parse_error`` flag instead of throwing mid-task).

All built-in functions — these stay inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ordered datetime patterns, mirroring IidrToJdbcSinkTransform.java:68-72
TIMESTAMP_PATTERNS = (
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss.SSS",
    "yyyy-MM-dd HH:mm:ss",
)
DATE_PATTERNS = ("yyyy-MM-dd",)
TIME_PATTERNS = ("HH:mm:ss.SSS", "HH:mm:ss")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def coerce_timestamp(c: Column | str, patterns=TIMESTAMP_PATTERNS) -> Column:
    """First-match multi-pattern string→timestamp parse (NULL if none match)."""
    c = _col(c)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(p)) for p in patterns])


def coerce_date(c: Column | str) -> Column:
    c = _col(c)
    return F.try_to_timestamp(c, F.lit(DATE_PATTERNS[0])).cast("date")


def coerce_time(c: Column | str) -> Column:
    """Spark has no TimeType; normalize to 'HH:mm:ss' string (reference binds
    TIME columns from strings the same way, JdbcWriter.java:242-268)."""
    c = _col(c)
    parsed = F.coalesce(
        *[F.try_to_timestamp(F.concat(F.lit("1970-01-01 "), c), F.lit(f"yyyy-MM-dd {p}")) for p in TIME_PATTERNS]
    )
    return F.date_format(parsed, "HH:mm:ss")


def normalize_iidr_timestamp(
    c: Column | str, zone: str = "UTC", fraction_digits: int = 6
) -> Column:
    """A_TIMSTAMP (zone-less, up to 12 fractional digits) → UTC timestamp.

    The wall-clock string is interpreted in ``zone`` (named zone or
    ``+HH:mm`` offset — Spark's zone parser accepts both, matching the
    reference's ZoneId.of handling) and converted to a UTC instant.
    Fraction truncated to ``fraction_digits`` (≤6).
    """
    c = _col(c)
    base = F.substring(c, 1, 19)
    # fraction: everything after the dot, truncated; absent fraction ⇒ 0s
    frac = F.rpad(
        F.substring(F.coalesce(F.substring_index(c, ".", -1), F.lit("")), 1, fraction_digits),
        fraction_digits,
        "0",
    )
    frac = F.when(c.contains("."), frac).otherwise(F.lit("0" * fraction_digits))
    local_ts = F.to_timestamp(
        F.concat(base, F.lit("."), frac), f"yyyy-MM-dd HH:mm:ss.{'S' * fraction_digits}"
    )
    # local wall-clock in `zone` → UTC instant (session TZ is pinned UTC)
    return F.to_utc_timestamp(local_ts, zone)


def iso8601_with_offset(c: Column | str, zone: str = "UTC") -> Column:
    """Format a UTC timestamp as ISO-8601 with explicit offset in ``zone``
    (TimestampConverter.java:117-120 emits ISO_OFFSET_DATE_TIME).

    ``convert_timezone`` yields a zone-less local time, so the offset is
    derived per-row (DST-correct) as local − instant and appended."""
    c = _col(c)
    local = F.convert_timezone(F.lit("UTC"), F.lit(zone), c)
    offset_min = (
        (F.unix_timestamp(local.cast("timestamp")) - F.unix_timestamp(c)) / 60
    ).cast("long")
    sign = F.when(offset_min < 0, F.lit("-")).otherwise(F.lit("+"))
    mag = F.abs(offset_min)
    hh = F.lpad((mag / 60).cast("long").cast("string"), 2, "0")
    mm = F.lpad((mag % 60).cast("string"), 2, "0")
    return F.concat(
        F.date_format(local, "yyyy-MM-dd'T'HH:mm:ss.SSS"), sign, hh, F.lit(":"), mm
    )

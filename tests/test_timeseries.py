"""hourly_gap_fill span guard (VERDICT r4 #6): the grid is users×hours,
so a single long-span key must either raise loudly or clamp to the most
recent window — never silently explode."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from kafka_dbsync_spark.operators.timeseries import hourly_gap_fill

SCHEMA = "user_id long, ts timestamp, value double, event_id long"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_fill_semantics_unchanged_below_bound(spark):
    t0 = datetime(2024, 1, 1, 10, 0)
    rows = [
        (1, t0, 5.0, 1),
        (1, t0 + timedelta(hours=3), 8.0, 2),   # 2-hour gap to fill
        (2, t0, 1.0, 3),
    ]
    out = hourly_gap_fill(_df(spark, rows), max_hours_per_key=10).collect()
    u1 = sorted(
        [(r["hour"], r["value_ff"], r["is_filled"]) for r in out
         if r["user_id"] == 1]
    )
    assert u1 == [
        ("2024-01-01 10:00:00", 5.0, False),
        ("2024-01-01 11:00:00", 5.0, True),
        ("2024-01-01 12:00:00", 5.0, True),
        ("2024-01-01 13:00:00", 8.0, False),
    ]
    assert [r for r in out if r["user_id"] == 2] != []


def test_adversarial_long_span_key_raises(spark):
    """One key with two events a decade apart would generate ~87k grid
    rows from 2 events; the guard names the key and the bound."""
    t0 = datetime(2015, 1, 1)
    rows = [
        (7, t0, 1.0, 1),
        (7, t0 + timedelta(days=3650), 2.0, 2),   # 10-year span
        (8, t0, 3.0, 3),
    ]
    # r12: the guard rides the plan (raise_error folded into the grid's
    # lower bound — the old driver-side pre-check ran the whole dedup
    # lineage twice), so the violation surfaces at ACTION time as a
    # Spark USER_RAISED_EXCEPTION carrying the same message
    with pytest.raises(Exception, match="key 7 .*max_hours_per_key=1000"):
        hourly_gap_fill(
            _df(spark, rows), max_hours_per_key=1000, on_exceed="raise"
        ).collect()


@pytest.mark.parametrize("span_hours,bound", [(50, 10), (1000, 24), (87600, 48)])
def test_clamp_bounds_rows_per_key(spark, span_hours, bound):
    """Property: under clamp, NO key emits more than max_hours_per_key
    rows, whatever its span; the kept window is the most recent one."""
    t0 = datetime(2015, 1, 1)
    rows = [
        (1, t0, 1.0, 1),
        (1, t0 + timedelta(hours=span_hours), 2.0, 2),
        (2, t0, 9.0, 3),  # single-hour key, untouched by the clamp
    ]
    out = hourly_gap_fill(
        _df(spark, rows), max_hours_per_key=bound, on_exceed="clamp"
    ).collect()
    per_key: dict[int, list] = {}
    for r in out:
        per_key.setdefault(r["user_id"], []).append(r)
    assert len(per_key[1]) == min(span_hours + 1, bound)
    assert len(per_key[2]) == 1
    # the retained window ends at the key's LAST event hour
    hours = sorted(r["hour"] for r in per_key[1])
    assert hours[-1] == (t0 + timedelta(hours=span_hours)).strftime(
        "%Y-%m-%d %H:00:00"
    )
    # forward fill within the clamped window still works: the last row
    # is the real observation, earlier synthesized rows carry a fill
    last = [r for r in per_key[1] if r["hour"] == hours[-1]][0]
    assert last["is_filled"] is False and last["value_ff"] == 2.0


def test_bad_arguments(spark):
    df = _df(spark, [(1, datetime(2024, 1, 1), 1.0, 1)])
    with pytest.raises(ValueError, match="on_exceed"):
        hourly_gap_fill(df, on_exceed="ignore")
    with pytest.raises(ValueError, match="max_hours_per_key"):
        hourly_gap_fill(df, max_hours_per_key=0)

"""Calendar / business-day helpers vs the numpy busday oracle.

The reference's Calendar is an explicit NotImplementedError stub
(rt_timezone.py:1321) — this surface EXCEEDS the reference; numpy's
busday_count/busday_offset define the semantics we pin."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from riptable_spark.functions.calendar import Calendar, holiday_join

HOLIDAYS = ["2024-01-01", "2024-01-15", "2024-02-19", "2024-03-29", "2024-05-27", "2024-07-04"]


@pytest.fixture(scope="module")
def cal():
    return Calendar(HOLIDAYS)


@pytest.fixture(scope="module")
def dates_df(spark):
    days = [dt.date(2024, 1, 1) + dt.timedelta(days=i) for i in range(200)]
    return spark.createDataFrame([(d,) for d in days], "d date")


def test_is_business_day(spark, dates_df, cal):
    out = {r.d: r.b for r in dates_df.select("d", cal.is_business_day(F.col("d")).alias("b")).collect()}
    for d, got in out.items():
        exp = bool(np.is_busday(d, holidays=HOLIDAYS))
        assert got == exp, d


def test_add_business_days_matches_numpy(spark, dates_df, cal):
    for n in (1, -1, 5, -7, 20):
        out = {r.d: r.o for r in dates_df.select("d", cal.add_business_days(F.col("d"), n).alias("o")).collect()}
        for d, got in out.items():
            # numpy busday_offset from an arbitrary day: roll toward the
            # step direction, then count n business days
            roll = "forward" if n > 0 else "backward"
            exp = np.busday_offset(d, n, roll=roll, holidays=HOLIDAYS).astype(dt.date)
            assert got == exp, (d, n, got, exp)


def test_roll(spark, cal):
    df = spark.createDataFrame([(dt.date(2024, 1, 13),), (dt.date(2024, 1, 16),)], "d date")
    out = df.select(
        cal.roll_forward(F.col("d")).alias("f"), cal.roll_backward(F.col("d")).alias("b")
    ).collect()
    # Sat Jan 13 → fwd Tue Jan 16 (Mon 15 is a holiday), back Fri Jan 12
    assert out[0].f == dt.date(2024, 1, 16) and out[0].b == dt.date(2024, 1, 12)
    # business day rolls to itself
    assert out[1].f == out[1].b == dt.date(2024, 1, 16)


def test_business_days_between_matches_numpy(spark, cal):
    pairs = []
    base = dt.date(2024, 1, 1)
    for i in range(0, 120, 7):
        for j in (0, 3, 30, 90):
            pairs.append((base + dt.timedelta(days=i), base + dt.timedelta(days=i + j)))
            pairs.append((base + dt.timedelta(days=i + j), base + dt.timedelta(days=i)))  # reversed
    df = spark.createDataFrame(pairs, "a date, b date")
    out = df.select("a", "b", cal.business_days_between(F.col("a"), F.col("b")).alias("n")).collect()
    for r in out:
        exp = int(np.busday_count(r.a, r.b, holidays=HOLIDAYS))
        assert r.n == exp, (r.a, r.b, r.n, exp)


def test_empty_calendar_weekends_only(spark):
    cal0 = Calendar()
    df = spark.createDataFrame([(dt.date(2024, 1, 1), dt.date(2024, 1, 8))], "a date, b date")
    n = df.select(cal0.business_days_between(F.col("a"), F.col("b")).alias("n")).collect()[0].n
    assert n == int(np.busday_count(dt.date(2024, 1, 1), dt.date(2024, 1, 8)))


def test_holiday_join_broadcast(spark, dates_df):
    hol = spark.createDataFrame([(dt.date.fromisoformat(h),) for h in HOLIDAYS], "holiday date")
    out = holiday_join(dates_df, "d", hol)
    got = {r.d for r in out.where("is_holiday").collect()}
    assert got == {dt.date.fromisoformat(h) for h in HOLIDAYS}
    from riptable_spark.plans import inspect as pi

    assert pi.has_broadcast_join(out)

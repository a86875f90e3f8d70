"""Doctest-parity tests for the string→timestamp parsing family
(rt_datetime.py:274-518 strptime_to_nano / datetimestring_to_nano /
datestring_to_nano / timestring_to_nano), mirroring the reference's own
docstring examples: padded/unpadded digits, undelimited formats, 12-hour
am/pm, automatic ns second fractions, literal text, '%%', tz aliases.
ADVICE r2: this family previously had zero coverage and two silent-NULL
gaps (undelimited formats, ns fractions)."""

from __future__ import annotations

import datetime as pydt

from pyspark.sql import functions as F

from riptable_spark.functions import datetime as dtf


def _parse(spark, values, fmt, from_tz="UTC"):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r.t for r in df.select(dtf.strptime_to_nano(F.col("s"), fmt, from_tz).alias("t")).collect()]


def test_strptime_padded_and_unpadded(spark):
    """rt_datetime.py:329 — '02/01/1992' and '2/1/1992' both parse."""
    out = _parse(spark, ["02/01/1992", "2/1/1992"], "%m/%d/%Y")
    assert out == [pydt.datetime(1992, 2, 1)] * 2


def test_strptime_undelimited(spark):
    """ADVICE r2 #1: '%Y%m%d' needs the fixed-width padded translation —
    greedy variable-width parsing cannot split '19920201'."""
    assert _parse(spark, ["19920201"], "%Y%m%d") == [pydt.datetime(1992, 2, 1)]
    assert _parse(spark, ["19920201 07:48:30"], "%Y%m%d %H:%M:%S") == [pydt.datetime(1992, 2, 1, 7, 48, 30)]


def test_strptime_24h_clock(spark):
    """rt_datetime.py:336 — date + 24-hour clock, mixed padding."""
    out = _parse(spark, ["02/01/1992 7:48:30", "2/1/1992 19:48:30"], "%m/%d/%Y %H:%M:%S")
    assert out == [pydt.datetime(1992, 2, 1, 7, 48, 30), pydt.datetime(1992, 2, 1, 19, 48, 30)]


def test_strptime_12h_am_pm(spark):
    """rt_datetime.py:343 — %I + %p."""
    out = _parse(spark, ["02/01/1992 7:48:30 AM", "2/1/1992 7:48:30 PM"], "%m/%d/%Y %I:%M:%S %p")
    assert out == [pydt.datetime(1992, 2, 1, 7, 48, 30), pydt.datetime(1992, 2, 1, 19, 48, 30)]


def test_strptime_auto_ns_fraction(spark):
    """rt_datetime.py:350 — a trailing fraction parses with NO escape in
    the format; 9-digit ns fractions truncate to Spark's µs."""
    out = _parse(
        spark,
        ["02/01/1992 7:48:30.123456789", "2/1/1992 15:48:30.000000006"],
        "%m/%d/%Y %H:%M:%S",
    )
    assert out == [
        pydt.datetime(1992, 2, 1, 7, 48, 30, 123456),
        pydt.datetime(1992, 2, 1, 15, 48, 30, 0),
    ]


def test_strptime_literal_letter_and_percent(spark):
    """ADVICE r2 #3: literal ASCII letters ('T' separator) must be quoted
    during translation, and '%%' is a literal percent."""
    assert _parse(spark, ["1992-02-01T07:48:30"], "%Y-%m-%dT%H:%M:%S") == [
        pydt.datetime(1992, 2, 1, 7, 48, 30)
    ]
    assert _parse(spark, ["100% 1992-02-01"], "100%% %Y-%m-%d") == [pydt.datetime(1992, 2, 1)]


def test_strptime_from_tz_alias(spark):
    """from_tz='NYC' (rt_timezone.py:1022 alias) interprets wall time in
    America/New_York: Feb 1 1992 is EST (UTC-5)."""
    out = _parse(spark, ["02/01/1992 07:00:00"], "%m/%d/%Y %H:%M:%S", from_tz="NYC")
    assert out == [pydt.datetime(1992, 2, 1, 12, 0, 0)]


def test_strptime_invalid_is_null(spark):
    """Unparseable → NULL (the reference's invalid), never an exception."""
    out = _parse(spark, ["not-a-date", "13/45/1992"], "%m/%d/%Y")
    assert out == [None, None]


def test_datetimestring_to_nano_forms(spark):
    """rt_datetime.py:380 auto-format parse: ISO with ns fraction,
    undelimited date + time, date-only."""
    vals = [
        "1992-02-01 07:48:30.123456789",
        "19920201 7:48:30",
        "1992-02-01",
        "19920201",
    ]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = [r.t for r in df.select(dtf.datetimestring_to_nano(F.col("s")).alias("t")).collect()]
    assert out == [
        pydt.datetime(1992, 2, 1, 7, 48, 30, 123456),
        pydt.datetime(1992, 2, 1, 7, 48, 30),
        pydt.datetime(1992, 2, 1),
        pydt.datetime(1992, 2, 1),
    ]


def test_datestring_to_nano_with_time(spark):
    """rt_datetime.py:410 — date strings + one shared time-of-day."""
    df = spark.createDataFrame([("1992-02-01",), ("19920203",)], "s string")
    out = [r.t for r in df.select(dtf.datestring_to_nano(F.col("s"), time="09:30:00").alias("t")).collect()]
    assert out == [pydt.datetime(1992, 2, 1, 9, 30), pydt.datetime(1992, 2, 3, 9, 30)]


def test_timestring_to_span_ns_fraction(spark):
    """rt_datetime.py:460 — time-of-day strings → TimeSpan; ns fraction
    auto-parses and truncates to µs."""
    df = spark.createDataFrame([("7:48:30.123456789",), ("07:48:30",), ("7:48",)], "s string")
    out = [r.t for r in df.select(dtf.timestring_to_span(F.col("s")).alias("t")).collect()]
    assert out == [
        pydt.timedelta(hours=7, minutes=48, seconds=30, microseconds=123456),
        pydt.timedelta(hours=7, minutes=48, seconds=30),
        pydt.timedelta(hours=7, minutes=48),
    ]


def test_timestring_to_nano_with_date(spark):
    df = spark.createDataFrame([("15:48:30",)], "s string")
    out = [r.t for r in df.select(dtf.timestring_to_nano(F.col("s"), date="1992-02-01").alias("t")).collect()]
    assert out == [pydt.datetime(1992, 2, 1, 15, 48, 30)]

"""TimeSpan/DateSpan typed arithmetic surface (reference rules at
rt_datetime.py:2311-2346, TimeSpan at :7099, DateSpan at :2718):

- Date − Date → DateSpan;  Date ± DateSpan → Date
- DateTimeNano − DateTimeNano → TimeSpan;  DateTimeNano ± TimeSpan → DateTimeNano
- TimeSpan ± TimeSpan → TimeSpan;  TimeSpan × k → TimeSpan

Spark-native typing: TimeSpan = ``DayTimeIntervalType`` (typed interval
arithmetic is whole-stage codegen; ts−ts natively yields it), DateSpan =
int days (the reference's DateSpan is an int32 day count). The reference
carries ns resolution; Spark timestamps are µs — ns ingestion truncates
to µs at load (sources/io.py), so spans here are µs-exact.

Everything below is a thin, typed veneer over built-in expressions — the
point is the TYPE DISCIPLINE (a TimeSpan is not a long, a DateSpan is
not an int column you can accidentally add to a timestamp), not new
execution machinery.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---- constructors ----------------------------------------------------


def timespan(days: int | Column = 0, hours: int | Column = 0, minutes: int | Column = 0, seconds=0) -> Column:
    """TimeSpan literal/column (rt_datetime.py:7099 TimeSpan ctor units)."""
    return F.make_dt_interval(F.lit(days), F.lit(hours), F.lit(minutes), F.lit(seconds))


def datespan(days: int | Column) -> Column:
    """DateSpan (rt_datetime.py:2718): integer day count."""
    return days if isinstance(days, Column) else F.lit(int(days))


# ---- subtraction rules ----------------------------------------------


def date_diff_span(a: Column, b: Column) -> Column:
    """Date − Date → DateSpan (days, signed)."""
    return F.datediff(a, b)


def date_add_span(d: Column, span_days: Column) -> Column:
    """Date + DateSpan → Date."""
    return F.date_add(d, span_days)


def date_sub_span(d: Column, span_days: Column) -> Column:
    """Date − DateSpan → Date."""
    return F.date_sub(d, span_days)


def ts_diff_span(a: Column, b: Column) -> Column:
    """DateTimeNano − DateTimeNano → TimeSpan (DayTimeIntervalType)."""
    return a - b


def ts_add_span(ts: Column, span: Column) -> Column:
    """DateTimeNano + TimeSpan → DateTimeNano."""
    return ts + span


def ts_sub_span(ts: Column, span: Column) -> Column:
    """DateTimeNano − TimeSpan → DateTimeNano."""
    return ts - span


def span_add(a: Column, b: Column) -> Column:
    """TimeSpan + TimeSpan → TimeSpan."""
    return a + b


def span_scale(span: Column, k) -> Column:
    """TimeSpan × numeric → TimeSpan (reference allows scalar scaling)."""
    return span * k


# ---- accessors (TimeSpan properties, rt_datetime.py TimeSpan) --------
# A DayTimeInterval added to the zero epoch is a timestamp whose
# unix_micros IS the span length — pure Column algebra, no expr-by-name.

def _epoch() -> Column:
    # built lazily — a module-level Column literal would require an
    # active SparkContext at IMPORT time (breaks `import riptable_spark`
    # before the session exists)
    return F.to_timestamp(F.lit("1970-01-01 00:00:00"))


def span_micros(span: Column) -> Column:
    """Total microseconds — the full precision Spark carries. The
    epoch-anchor subtraction cancels the session-timezone offset."""
    e = _epoch()
    return F.unix_micros(e + span) - F.unix_micros(e)


def span_seconds(span: Column) -> Column:
    """Total whole seconds (riptable TimeSpan.seconds analogue)."""
    return F.floor(span_micros(span) / F.lit(1_000_000)).cast("long")


def span_days(span: Column) -> Column:
    """Whole-day component count (TimeSpan.days analogue)."""
    return F.floor(span_micros(span) / F.lit(86_400_000_000)).cast("long")

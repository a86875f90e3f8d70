"""Datetime surface (SURVEY §2.8 datetime).

Reference: /root/reference/riptable/rt_datetime.py — DateTimeNano (int64
ns UTC), Date (int32 days), TimeSpan/DateSpan spans; calendar accessors at
rt_datetime.py:3367-4017. Spark TimestampType is µs-precision — the ns
remainder is carried separately when needed (SURVEY hard-part (c)).
tz conversion uses the JVM tzdb (real names like America/New_York) instead
of the reference's hand-rolled transition tables (rt_timezone.py:28-1000).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# calendar accessors (rt_datetime.py:3367-4017)
year = F.year
month = F.month
day = F.dayofmonth
day_of_month = F.dayofmonth
day_of_year = F.dayofyear
hour = F.hour
minute = F.minute
second = F.second


def millisecond(col: Column) -> Column:
    return (F.unix_micros(col) % 1_000_000) / 1000


def microsecond(col: Column) -> Column:
    return F.unix_micros(col) % 1_000_000


def day_of_week(col: Column) -> Column:
    """riptable: Monday=0 (rt_datetime.py day_of_week). Spark dayofweek:
    Sunday=1 → shift."""
    return (F.dayofweek(col) + 5) % 7


def is_weekend(col: Column) -> Column:
    return day_of_week(col) >= 5


def is_weekday(col: Column) -> Column:
    return day_of_week(col) < 5


def is_leapyear(col: Column) -> Column:
    y = F.year(col)
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def monthyear(col: Column) -> Column:
    """rt_datetime.py monthyear: 'Jan2024'-style label."""
    return F.date_format(col, "MMMyyyy")


def time_since_midnight(col: Column) -> Column:
    """rt_datetime.py:4017 — nanoseconds since midnight (µs precision)."""
    return (F.unix_micros(col) - F.unix_micros(F.date_trunc("day", col))) * 1000


def time_since_start_of_year(col: Column) -> Column:
    return (F.unix_micros(col) - F.unix_micros(F.date_trunc("year", col))) * 1000


# parse / format (rt_datetime.py:274-518, 4572-4766)
def strptime_to_timestamp(col: Column, fmt: str) -> Column:
    return F.to_timestamp(col, fmt)


def parse_epoch(col: Column) -> Column:
    """rt_datetime.py:518 — epoch seconds → timestamp."""
    return F.timestamp_seconds(col)


def strftime(col: Column, fmt: str) -> Column:
    return F.date_format(col, fmt)


def to_iso(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")


def to_tz(col: Column, tz: str) -> Column:
    """DateTimeNano display-tz move (rt_timezone.py:1294 to_utc inverse)."""
    return F.from_utc_timestamp(col, tz)


def from_tz(col: Column, tz: str) -> Column:
    return F.to_utc_timestamp(col, tz)


def tz_offset_seconds(col: Column, tz: str) -> Column:
    """UTC offset of ``tz`` at each instant, in seconds (negative west of
    Greenwich). Pure codegen: shift the instant to wall time with the JVM
    tzdb and difference the epochs — no transition tables needed (the
    reference hand-rolls NYC/Dublin int64 transition arrays,
    rt_timezone.py:28-1000)."""
    return F.unix_seconds(F.from_utc_timestamp(col, tz)) - F.unix_seconds(col)


def is_dst(col: Column, tz: str) -> Column:
    """DST flag for any tzdb zone (rt_datetime.py is_dst, rt_timezone.py
    fix_dst:1237), hemisphere-correct: the zone's STANDARD offset at a
    given instant is the smaller of its offsets at Jan-1 and Jul-1 of
    that year (DST always shifts clocks forward), so a row is in DST iff
    its offset exceeds that minimum. Zones without DST compare equal and
    return false everywhere. All whole-stage codegen."""
    jan = F.to_timestamp(F.concat(F.year(col).cast("string"), F.lit("-01-01")))
    jul = F.to_timestamp(F.concat(F.year(col).cast("string"), F.lit("-07-01")))
    std = F.least(tz_offset_seconds(jan, tz), tz_offset_seconds(jul, tz))
    return tz_offset_seconds(col, tz) > std


def date_range(start: str, stop: str, step_days: int = 1) -> Column:
    """Date.range (rt_datetime.py:2122) → sequence + explode at callsite."""
    return F.sequence(
        F.to_date(F.lit(start)),
        F.to_date(F.lit(stop)),
        F.expr(f"interval {step_days} days"),
    )


def datediff_days(end: Column, start: Column) -> Column:
    """Date − Date → DateSpan days (rt_datetime.py:2311-2346)."""
    return F.datediff(end, start)


def resample_floor(col: Column, seconds: int) -> Column:
    """GroupByOps.resample (NotImplementedError in the reference,
    rt_groupbyops.py:3533) — time-bucket key: timestamp floored to a
    fixed step. Pure epoch arithmetic, codegen-friendly, identical
    semantics to date_trunc for sub-hour grains."""
    return F.timestamp_seconds(F.floor(F.unix_micros(col) / F.lit(seconds * 1_000_000)) * seconds)


def utcnow() -> Column:
    """Current UTC instant (rt_datetime.py utcnow → DateTimeNano). µs
    precision on Spark (TimestampType); constant within a query per ANSI
    current_timestamp semantics — the distributed analogue of one
    GetNanoTime() call."""
    return F.current_timestamp()


def get_nano_time() -> Column:
    """Epoch nanoseconds of the current instant (rt_timers.py GetNanoTime).
    Spark timestamps carry µs; the ns value is µs*1000 — documented
    precision loss vs the reference's clock_gettime."""
    return F.unix_micros(F.current_timestamp()) * F.lit(1000)

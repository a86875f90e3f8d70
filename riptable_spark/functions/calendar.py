"""Market/holiday Calendar — business-day arithmetic as codegen exprs.

The reference declares this surface but never built it
(rt_timezone.py:1321 ``class Calendar: raise NotImplementedError``;
"Holds information regarding holidays, trade days, etc."). Here it is
real: a small holiday list compiles to literal array expressions (tens
of dates per market-year — always literal-sized), so every helper is
whole-stage codegen with zero shuffles and zero UDFs. For jumbo
calendars (per-security trading calendars), ``holiday_join`` is the
broadcast-table form.

Day convention matches numpy busday: business day = Mon-Fri and not a
holiday. Unit tests pin equality against ``np.busday_count`` /
``np.busday_offset``.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_date(d) -> _dt.date:
    return _dt.date.fromisoformat(d) if isinstance(d, str) else d


class Calendar:
    """Holiday calendar with vectorized business-day helpers.

    ``holidays``: iterable of 'YYYY-MM-DD' strings or datetime.date.
    All methods take/return Spark Columns (DateType)."""

    def __init__(self, holidays=()):
        self.holidays: list[_dt.date] = sorted({_to_date(h) for h in holidays})
        # horizon for bounded day-walks: worst case every holiday is
        # consecutive and glued to weekends
        self._pad = len(self.holidays) + 7

    def _holiday_array(self) -> Column:
        return F.array(*[F.lit(h) for h in self.holidays]) if self.holidays else F.array().cast("array<date>")

    def is_holiday(self, col: Column) -> Column:
        if not self.holidays:
            return F.lit(False)
        return col.isin(self.holidays)

    def is_business_day(self, col: Column) -> Column:
        # Spark dayofweek: Sunday=1 .. Saturday=7; business = Mon(2)..Fri(6)
        return F.dayofweek(col).between(2, 6) & ~self.is_holiday(col)

    def _walk(self, col: Column, n: int) -> Column:
        """n-th business day STRICTLY after (n>0) / before (n<0) col.
        Bounded day-walk: the candidate window is ceil(7n/5)+holidays+7
        literal days — a fixed-size array expression, no runtime loop."""
        horizon = (abs(n) * 7) // 5 + self._pad
        step = 1 if n > 0 else -1
        days = F.sequence(F.lit(step), F.lit(step * horizon), F.lit(step))
        cands = F.transform(days, lambda d: F.date_add(col, d))
        biz = F.filter(cands, lambda d: self.is_business_day(d))
        return F.element_at(biz, abs(n))

    def add_business_days(self, col: Column, n: int) -> Column:
        """numpy ``busday_offset(col, n, roll='forward' if n>=0 else
        'backward')``: roll onto a business day in the step direction
        FIRST (the rolled day is position 0), then count ``n`` business
        days from there."""
        rolled = self.roll_forward(col) if n >= 0 else self.roll_backward(col)
        if n == 0:
            return rolled
        return self._walk(rolled, n)

    def next_business_day(self, col: Column) -> Column:
        """First business day strictly after col."""
        return self._walk(col, 1)

    def prev_business_day(self, col: Column) -> Column:
        """Last business day strictly before col."""
        return self._walk(col, -1)

    def roll_forward(self, col: Column) -> Column:
        """Smallest business day ≥ col (numpy roll='forward')."""
        return F.when(self.is_business_day(col), col).otherwise(self._walk(col, 1))

    def roll_backward(self, col: Column) -> Column:
        """Largest business day ≤ col (numpy roll='backward')."""
        return F.when(self.is_business_day(col), col).otherwise(self._walk(col, -1))

    def business_days_between(self, start: Column, end: Column) -> Column:
        """numpy ``busday_count(start, end)``: business days in
        [start, end) when start ≤ end; when end < start, numpy counts the
        half-open interval on the OTHER side — −|{(end, start]}| =
        −(|[end, start)| − isbiz(end) + isbiz(start)). Closed form: 5 per
        full week + a ≤6-day literal remainder walk − the holiday hits (a
        literal-array filter); no shuffle, no explode of the range."""
        a, b = start, end
        swapped = b < a
        lo = F.when(swapped, b).otherwise(a)
        hi = F.when(swapped, a).otherwise(b)
        n = F.datediff(hi, lo)
        full = F.floor(n / 7).cast("int")
        rem_start = F.date_add(lo, full * 7)
        rem = (n % 7).cast("int")
        rem_days = F.when(rem > 0, F.sequence(F.lit(0), rem - 1)).otherwise(F.array().cast("array<int>"))
        rem_week = F.size(
            F.filter(
                F.transform(rem_days, lambda d: F.date_add(rem_start, d)),
                lambda d: F.dayofweek(d).between(2, 6),
            )
        )
        hol = F.size(
            F.filter(
                self._holiday_array(),
                lambda h: (h >= lo) & (h < hi) & F.dayofweek(h).between(2, 6),
            )
        )
        count = full * 5 + rem_week - hol  # |[lo, hi) ∩ busdays|
        shifted = count - self.is_business_day(lo).cast("int") + self.is_business_day(hi).cast("int")
        return F.when(swapped, -shifted).otherwise(count)


def holiday_join(df: DataFrame, date_col: str, holidays: DataFrame, holiday_col: str = "holiday") -> DataFrame:
    """Large-calendar form: mark rows falling on a holiday via a
    BROADCAST left join against a holiday table (per-market calendars can
    be thousands of dates × markets — too big for a literal array, tiny
    for a broadcast). Adds boolean ``is_holiday``."""
    h = holidays.select(F.col(holiday_col).alias(date_col), F.lit(True).alias("is_holiday"))
    return df.join(F.broadcast(h), on=date_col, how="left").fillna({"is_holiday": False})

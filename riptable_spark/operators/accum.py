"""Accum2 / AccumTable cross-tabulation (SURVEY §2.4 cross-tab family).

Reference: /root/reference/riptable/rt_accum2.py:39 (Accum2 2-key cross
tab with row/col totals), rt_accumtable.py:15/722/1024 (AccumTable,
accum_ratio, accum_ratiop).

Spark mapping: with known pivot values the whole cross-tab (cells + row
totals) is ONE conditional aggregation — a single shuffle on the row key
with map-side combine. (`groupBy().pivot()` would cost a distinct-scan
plus an extra join for the margin column.) Unknown values are discovered
with one tiny distinct first (the column key of a cross-tab is
low-cardinality by construction).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _pivot_values(df: DataFrame, col_key: str, pivot_values: list | None) -> list:
    if pivot_values is not None:
        return list(pivot_values)
    return [r[0] for r in df.select(col_key).distinct().orderBy(col_key).collect()]


def accum2(
    df: DataFrame,
    row_key: str,
    col_key: str,
    agg_fn: Callable[[Column], Column],
    valcol: str | Column,
    pivot_values: list | None = None,
    total_col: str = "Total",
) -> DataFrame:
    """Accum2 matrix + right-margin Total column (rt_accum2.py:122-186).
    ``agg_fn`` example: ``F.sum``; cells are agg_fn over the value column
    masked per column-key value — one hash aggregation."""
    c = F.col(valcol) if isinstance(valcol, str) else valcol
    values = _pivot_values(df, col_key, pivot_values)
    cells = [agg_fn(F.when(F.col(col_key) == F.lit(v), c)).alias(str(v)) for v in values]
    return df.groupBy(row_key).agg(*cells, agg_fn(c).alias(total_col))


def accum2_with_footer(
    df: DataFrame,
    row_key: str,
    col_key: str,
    agg_fn: Callable[[Column], Column],
    valcol: str | Column,
    pivot_values: list | None = None,
    total_col: str = "Total",
    footer_label: str = "Total",
) -> DataFrame:
    """Full Accum2 with the footer (column-totals) row. The footer is the
    same conditional aggregation without the row grouping — a global agg
    (no shuffle), unioned in; correct for any agg_fn including
    non-decomposable ones (median)."""
    c = F.col(valcol) if isinstance(valcol, str) else valcol
    values = _pivot_values(df, col_key, pivot_values)
    body = accum2(df, row_key, col_key, agg_fn, valcol, values, total_col)
    cells = [agg_fn(F.when(F.col(col_key) == F.lit(v), c)).alias(str(v)) for v in values]
    footer = df.agg(*cells, agg_fn(c).alias(total_col)).select(
        F.lit(footer_label).alias(row_key), *[F.col(str(v)) for v in values], F.col(total_col)
    )
    return body.unionByName(footer)


def accum_ratio(
    df: DataFrame,
    row_key: str,
    col_key: str,
    numer: Column,
    denom: Column,
    pivot_values: list | None = None,
) -> DataFrame:
    """rt_accumtable.py:722 — elementwise ratio of two cross-tabs in one
    conditional aggregation pass."""
    values = _pivot_values(df, col_key, pivot_values)
    cells = [
        (
            F.sum(F.when(F.col(col_key) == F.lit(v), numer))
            / F.sum(F.when(F.col(col_key) == F.lit(v), denom))
        ).alias(str(v))
        for v in values
    ]
    return df.groupBy(row_key).agg(*cells)


def accum_ratiop(
    df: DataFrame,
    row_key: str,
    col_key: str,
    metric: Column,
    pivot_values: list | None = None,
) -> DataFrame:
    """rt_accumtable.py:1024 — each cell as percentage of the grand total.
    Grand total is a 1-row agg broadcast back (no single-partition
    window)."""
    values = _pivot_values(df, col_key, pivot_values)
    total = df.agg(F.sum(metric).alias("__g__"))
    piv = df.groupBy(row_key).agg(
        *[F.sum(F.when(F.col(col_key) == F.lit(v), metric)).alias(str(v)) for v in values]
    )
    return piv.crossJoin(F.broadcast(total)).select(
        row_key,
        *[(F.col(str(v)) / F.col("__g__") * 100).alias(str(v)) for v in values],
    )


def cat2keys(a: Column, b: Column) -> Column:
    """rt_numpy.py:1601 — combined cross-tab bin key → struct key."""
    return F.struct(a, b)

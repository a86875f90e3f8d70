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


class AccumTable:
    """rt_accumtable.py:15 AccumTable + :442/:584 ``gen`` report
    assembly: a named collection of Accum2 cross-tabs over a shared
    (row_key, col_key), generating a report whose margin COLUMNS carry
    every inner table's row-margin (selected table's margin first, then
    ``set_margin_columns`` order) and whose footer ROWS stack every inner
    table's column-totals (selected table's footer first), each footer
    carrying its own grand total at its own margin column.

    Plan shape: the ENTIRE body (all tables' cells + all margins) is ONE
    conditional aggregation — a single shuffle on the row key with
    map-side combine — and all footers come from ONE global aggregation
    (no shuffle), unioned on as metadata-sized rows. Cost does not grow
    with the number of inner tables beyond the extra aggregate columns.
    """

    def __init__(self, df: DataFrame, row_key: str, col_key: str, pivot_values: list | None = None):
        self._df = df
        self._row = row_key
        self._col = col_key
        self._values = _pivot_values(df, col_key, pivot_values)
        self._tables: dict[str, tuple[Callable[[Column], Column], Column]] = {}
        self._margin_cols: list[str] | None = None
        self._footer_rows: list[str] | None = None

    def add(self, name: str, agg_fn: Callable[[Column], Column], valcol: str | Column) -> None:
        """at[name] = at.sum(col) analogue."""
        self._tables[name] = (agg_fn, F.col(valcol) if isinstance(valcol, str) else valcol)

    def set_margin_columns(self, cols: list[str]) -> None:
        self._margin_cols = list(cols)

    def set_footer_rows(self, rows: list[str]) -> None:
        self._footer_rows = list(rows)

    def gen(self, main: str) -> DataFrame:
        values = self._values
        others = self._margin_cols if self._margin_cols is not None else [n for n in self._tables if n != main]
        margin_order = [main] + [c for c in others if c != main]
        frows = self._footer_rows if self._footer_rows is not None else list(self._tables)
        footer_order = [main] + [r for r in frows if r != main]

        fn_main, v_main = self._tables[main]
        body_aggs = [
            fn_main(F.when(F.col(self._col) == F.lit(v), v_main)).alias(str(v)) for v in values
        ]
        for name in margin_order:
            fn, vc = self._tables[name]
            body_aggs.append(fn(vc).alias(name))
        body = self._df.groupBy(F.col(self._row).cast("string").alias(self._row)).agg(*body_aggs)
        body = body.select(
            self._row,
            *[F.col(str(v)).cast("double").alias(str(v)) for v in values],
            *[F.col(m).cast("double").alias(m) for m in margin_order],
        )

        f_aggs = []
        for name in footer_order:
            fn, vc = self._tables[name]
            for v in values:
                f_aggs.append(
                    fn(F.when(F.col(self._col) == F.lit(v), vc)).alias(f"__{name}_{v}__")
                )
            f_aggs.append(fn(vc).alias(f"__{name}_total__"))
        g = self._df.agg(*f_aggs)
        footers = None
        for name in footer_order:
            sel = [F.lit(name).alias(self._row)]
            sel += [F.col(f"__{name}_{v}__").cast("double").alias(str(v)) for v in values]
            for m in margin_order:
                cell = F.col(f"__{name}_total__") if m == name else F.lit(None)
                sel.append(cell.cast("double").alias(m))
            row = g.select(*sel)
            footers = row if footers is None else footers.unionByName(row)
        return body.unionByName(footers)

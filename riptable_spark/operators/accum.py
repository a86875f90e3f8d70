"""Accum2 / AccumTable cross-tabulation (SURVEY §2.4 cross-tab family).

Reference: /root/reference/riptable/rt_accum2.py:39 (Accum2 2-key cross
tab with row/col totals), rt_accumtable.py:15/722/1024 (AccumTable,
accum_ratio, accum_ratiop).

Spark mapping: ``groupBy(rowkey).pivot(colkey).agg(...)`` — a single
shuffle; pivot column values are either supplied (scale-safe: avoids the
distinct-scan Spark otherwise runs) or discovered. Totals are computed in
the same pass shape via one extra groupBy on the row key and one global
agg, all reusing the same exchange under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def accum2(
    df: DataFrame,
    row_key: str,
    col_key: str,
    agg_expr: Column,
    pivot_values: list | None = None,
    total_col: str = "Total",
) -> DataFrame:
    """Accum2 matrix + right-margin Total column (rt_accum2.py:122-186).
    agg_expr example: F.sum('l_quantity')."""
    piv = df.groupBy(row_key).pivot(col_key, values=pivot_values)
    body = piv.agg(agg_expr)
    totals = df.groupBy(row_key).agg(agg_expr.alias(total_col))
    return body.join(totals, on=row_key, how="left")


def accum2_with_footer(
    df: DataFrame,
    row_key: str,
    col_key: str,
    agg_expr: Column,
    pivot_values: list | None = None,
    total_col: str = "Total",
    footer_label: str = "Total",
) -> DataFrame:
    """Full Accum2 with the footer (column-totals) row. The footer is the
    same pivot with a constant row key — unioned in; all legs are
    aggregations over the same shuffle key set."""
    body = accum2(df, row_key, col_key, agg_expr, pivot_values, total_col)
    footer = accum2(
        df.withColumn(row_key, F.lit(footer_label)), row_key, col_key, agg_expr, pivot_values, total_col
    )
    return body.unionByName(footer, allowMissingColumns=True)


def accum_ratio(
    df: DataFrame,
    row_key: str,
    col_key: str,
    numer: Column,
    denom: Column,
    pivot_values: list | None = None,
) -> DataFrame:
    """rt_accumtable.py:722 — elementwise ratio of two cross-tabs, one pass
    (both aggregates inside the same pivot)."""
    piv = df.groupBy(row_key).pivot(col_key, values=pivot_values).agg(
        (F.sum(numer) / F.sum(denom)).alias("ratio")
    )
    return piv


def accum_ratiop(
    df: DataFrame,
    row_key: str,
    col_key: str,
    metric: Column,
    pivot_values: list | None = None,
) -> DataFrame:
    """rt_accumtable.py:1024 — each cell as percentage of the grand total."""
    total = df.agg(F.sum(metric).alias("__g__"))
    piv = df.groupBy(row_key).pivot(col_key, values=pivot_values).agg(F.sum(metric))
    return piv.crossJoin(F.broadcast(total)).select(
        row_key,
        *[(F.col(c) / F.col("__g__") * 100).alias(c) for c in piv.columns if c != row_key],
    )


def cat2keys(a: Column, b: Column) -> Column:
    """rt_numpy.py:1601 — combined cross-tab bin key → struct key."""
    return F.struct(a, b)

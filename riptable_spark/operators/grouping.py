"""Grouping-construction internals: named parity for the reference's
groupbyhash / groupbylex / groupbypack (rt_grouping.py, riptide hash
kernels). The reference builds an explicit Grouping object (per-row
group id ``iKey``, first-occurrence index ``iFirstKey``, packed row
order ``iGroup``/``iFirstGroup``/``nCountGroup``) that every groupby op
then consumes; on Spark, Catalyst's hash aggregation plays that role,
so these functions exist as *materialized relational views* of the same
artifacts — useful when a pipeline wants the reference's exact group
numbering (e.g. to reproduce Categorical codes or align with saved
riptable output).

Scale shape: group ids are ranked over the DISTINCT-key relation (one
row per group, tiny next to the fact table), never over the raw rows —
the only per-row work is the equi-join that maps ids back, broadcast
when the key cardinality allows. groupbypack's row ordering is a
range-partitioned sort on (group id, row id) — Spark's parallel
TakeOrdered/Sort machinery, no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _key_cols(keys: list[str] | str) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def groupbyhash(df: DataFrame, keys: list[str] | str, rowid_col: str) -> DataFrame:
    """rt_grouping groupbyhash semantics: per-row 1-based group id
    ``ikey`` in FIRST-APPEARANCE order (appearance = ascending
    ``rowid_col``), plus ``ifirstkey`` = the row id of the group's first
    occurrence. NULL keys group together (null-safe, matching the
    reference's invalid-bin behavior of hashing invalids to one bin).
    The ranking runs on the distinct-key relation only."""
    keys = _key_cols(keys)
    firsts = df.groupBy(*keys).agg(F.min(rowid_col).alias("ifirstkey"))
    w = Window.orderBy("ifirstkey")
    numbered = firsts.withColumn("ikey", F.row_number().over(w))
    return df.join(numbered, on=keys, how="left").select(
        *df.columns, "ikey", "ifirstkey"
    )


def groupbylex(df: DataFrame, keys: list[str] | str, rowid_col: str | None = None) -> DataFrame:
    """rt_grouping groupbylex semantics: per-row 1-based group id
    ``ikey`` in LEXICOGRAPHIC key order (the sorted-unique numbering a
    lexsort-based grouping produces — what ``Categorical(..., lex=True)``
    and ``groupbylex`` return). NULLs sort first (Spark/DuckDB
    NULLS FIRST ascending default)."""
    keys = _key_cols(keys)
    uniq = df.select(*keys).distinct()
    w = Window.orderBy(*keys)
    numbered = uniq.withColumn("ikey", F.row_number().over(w))
    out = df.join(numbered, on=keys, how="left")
    return out.select(*df.columns, "ikey")


def groupbypack(df: DataFrame, keys: list[str] | str, rowid_col: str) -> DataFrame:
    """rt_grouping.py pack step (iGroup/iFirstGroup/nCountGroup): rows
    re-ordered contiguous by group — ``igroup`` is the row's 0-based
    position in the packed order (groups in first-appearance order, rows
    within a group by ``rowid_col``), ``ifirst`` the group's starting
    position, ``ncount`` the group size. One shuffle for the group agg,
    one range-partitioned sort for positions — no per-row driver work."""
    keys = _key_cols(keys)
    stats = df.groupBy(*keys).agg(
        F.min(rowid_col).alias("__first_row__"), F.count(F.lit(1)).alias("ncount")
    )
    w = Window.orderBy("__first_row__")
    stats = stats.withColumn(
        "ifirst", (F.sum("ncount").over(w.rowsBetween(Window.unboundedPreceding, 0)) - F.col("ncount")).cast("long")
    )
    joined = df.join(stats, on=keys, how="left")
    wg = Window.partitionBy(*keys).orderBy(rowid_col)
    return joined.select(
        *df.columns,
        (F.col("ifirst") + F.row_number().over(wg) - 1).alias("igroup"),
        "ifirst",
        "ncount",
    )

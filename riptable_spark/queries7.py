"""Driver-contract query registry, batch 7 (round 2, late): IMatrix
horizontal matrix ops and the mask-combinator surface. Registers into the
same QUERIES/ORACLES dicts as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources.io import load_table

_IM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "q139_imatrix",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity + l_extendedprice + l_discount + l_tax, 6) AS row_sum,
           ROUND((l_quantity + l_extendedprice + l_discount + l_tax) / 4, 6) AS row_mean,
           ROUND(LEAST(l_quantity, l_extendedprice, l_discount, l_tax), 6) AS row_min,
           ROUND(GREATEST(l_quantity, l_extendedprice, l_discount, l_tax), 6) AS row_max
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    """IMatrix per-row horizontal reductions (rt_imatrix.py:11,
    rt_dataset.py:2012 imatrix_y): stack 4 numeric lineitem columns into
    the implicit matrix and reduce across the row. Pure array-expression
    codegen — the 'matrix' is an array() expr Catalyst fuses into each
    reduction; zero shuffle, zero Python, and at 100 TB it is exactly one
    scan of the 4 columns (ReadSchema prunes the rest). The testdata
    columns are all non-null so strict (numpy-propagating) and nan*
    variants agree with the SQL oracle."""
    from .operators import imatrix as im

    li = load_table(spark, sf, "lineitem").where(F.col("l_orderkey") < 2000)
    out = im.imatrix_y(
        li, ["sum", "mean", "min", "max"], colnames=_IM_COLS,
        names=["row_sum", "row_mean", "row_min", "row_max"],
    )
    return out.select(
        "l_orderkey", "l_linenumber",
        *[F.round(c, 6).alias(c) for c in ("row_sum", "row_mean", "row_min", "row_max")],
    )


@query(
    "q140_mask_combinators",
    """
    SELECT
      CAST(sum(CASE WHEN (l_discount > 0.05 OR l_tax > 0.05) THEN 1 ELSE 0 END) AS BIGINT) AS n_or,
      CAST(sum(CASE WHEN (l_discount > 0.05 AND l_tax > 0.05 AND l_quantity > 25) THEN 1 ELSE 0 END) AS BIGINT) AS n_and,
      CAST(sum(CASE WHEN ((l_discount > 0.05) != (l_tax > 0.05)) THEN 1 ELSE 0 END) AS BIGINT) AS n_xor,
      CAST(sum(CASE WHEN (l_discount > 0.05 AND NOT l_tax > 0.05 AND NOT l_quantity > 25) THEN 1 ELSE 0 END) AS BIGINT) AS n_andnot
    FROM lineitem
    """,
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    """Mask combinators (rt_numpy.py mask_or/and/xor/andnot): fold lists
    of boolean masks into one predicate. Each fold is a single codegen
    boolean expression — the reference's motivation (avoid N-1 temp
    arrays) is what Tungsten does by construction."""
    from .functions import math as m

    li = load_table(spark, sf, "lineitem")
    a, b, c = F.col("l_discount") > 0.05, F.col("l_tax") > 0.05, F.col("l_quantity") > 25
    one = lambda mask: F.sum(F.when(mask, 1).otherwise(0)).cast("long")
    return li.agg(
        one(m.mask_or([a, b])).alias("n_or"),
        one(m.mask_and([a, b, c])).alias("n_and"),
        one(m.mask_xor([a, b])).alias("n_xor"),
        one(m.mask_andnot([a, b, c])).alias("n_andnot"),
    )

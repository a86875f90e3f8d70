"""Table profiling: per-column audit metrics (row count, NULL count,
distinct count, min/max) in ONE distributed pass — the data-quality
gate a 100 TB ingest runs before anything else. Complements
``Dataset.describe`` (numeric moments) with the schema-wide
completeness/cardinality view an ops dashboard wants.

Scale notes: all per-column metrics fold into a single two-stage hash
aggregation over one scan. Distinct counts default to
``approx_count_distinct`` (HyperLogLog — constant memory per column);
``exact_distinct=True`` switches to exact COUNT(DISTINCT), which makes
Catalyst Expand the scan once per distinct-counted column (documented
q04 trade-off) — fine for narrow audits, wrong for wide tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """One row per profiled column: (column, dtype, n_rows, n_null,
    n_distinct, min_value, max_value) with min/max rendered as strings
    so the output schema is uniform across column types. Single
    aggregation job; the per-column rows are exploded from the one
    result row (metadata-sized, never a per-row operation)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}__"))
        aggs.append(
            (F.count_distinct(F.col(c)) if exact_distinct else F.approx_count_distinct(c, rsd)).alias(
                f"__nd_{c}__"
            )
        )
        aggs.append(F.min(c).cast("string").alias(f"__mn_{c}__"))
        aggs.append(F.max(c).cast("string").alias(f"__mx_{c}__"))
    one = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("__n__").alias("n_rows"),
                (F.col("__n__") - F.col(f"__nn_{c}__")).alias("n_null"),
                F.col(f"__nd_{c}__").cast("long").alias("n_distinct"),
                F.col(f"__mn_{c}__").alias("min_value"),
                F.col(f"__mx_{c}__").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(structs).alias("p")).select("p.*")


def key_skew(df: DataFrame, key_col: str, top: int = 5) -> tuple[DataFrame, DataFrame]:
    """Join/agg-key skew audit BEFORE the expensive operation: the
    count-of-counts histogram (how many keys occur 2^b..2^(b+1)−1
    times) and the exact top-``top`` heaviest keys.  Two tiny
    aggregations over the per-key counts — the shape of the relation a
    salting/AQE decision actually needs.  Returns (histogram_df,
    topk_df)."""
    per = df.where(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    bucket = F.length(F.conv(F.col("n").cast("string"), 10, 2)) - 1  # floor(log2 n)
    hist = per.groupBy(bucket.alias("log2_bucket")).agg(
        F.count(F.lit(1)).alias("n_keys"), F.sum("n").alias("n_rows")
    )
    topk = per.orderBy(F.col("n").desc(), F.col(key_col)).limit(top)
    return hist, topk

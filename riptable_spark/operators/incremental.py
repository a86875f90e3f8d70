"""Incremental rollup maintenance: mergeable partial aggregates.

The 100 TB pattern for standing dashboards/rollups: never re-aggregate
history. Keep a STATE relation of per-key mergeable partials (count,
sum, min, max, sum of squares), fold each new batch/partition's
partials into it with one merge, and FINALIZE (mean/std/avg) only at
read time. Merging is associative and commutative, so state building
parallelizes arbitrarily and arrives in any order — the same algebra
Spark's own partial aggregation uses inside one job, lifted across
jobs/days.

All three steps are plain DataFrame aggregations: partials = one
groupBy over the new slice only; merge = unionByName + one groupBy over
(state ∪ delta), which is ≤ 2 rows per key; finalize = a projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL_COLS = ["n", "n_val", "sum_val", "sumsq_val", "min_val", "max_val"]


def rollup_partials(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Per-key mergeable partials over one slice (a new day/partition):
    row count, non-null count, sum, sum of squares, min, max. Everything
    downstream (mean, std, range) derives from these at finalize time."""
    v = F.col(value_col).cast("double")
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(v).alias("n_val"),
        F.sum(v).alias("sum_val"),
        F.sum(v * v).alias("sumsq_val"),
        F.min(v).alias("min_val"),
        F.max(v).alias("max_val"),
    )


def merge_rollup(state: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a delta's partials into the state: union + one aggregation
    with the partial-merge algebra (sums add, mins min, maxes max).
    Input is ≤ 2 rows per key, so the shuffle is state-sized, not
    history-sized — the whole point."""
    both = state.unionByName(delta)
    return both.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("n_val").alias("n_val"),
        F.sum("sum_val").alias("sum_val"),
        F.sum("sumsq_val").alias("sumsq_val"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )


def finalize_rollup(state: DataFrame, keys: list[str], ddof: int = 0) -> DataFrame:
    """Read-time projection from partials to the user-facing stats:
    count, mean, variance/std (via E[x²] − E[x]² on the exact sums),
    min, max. No shuffle — the state is already one row per key."""
    n = F.col("n_val")
    mean = F.col("sum_val") / n
    var = (F.col("sumsq_val") - F.col("sum_val") * F.col("sum_val") / n) / (n - ddof)
    return state.select(
        *keys,
        F.col("n").alias("n_rows"),
        n.alias("n_values"),
        mean.alias("mean_val"),
        F.when(n > ddof, var).alias("var_val"),
        "min_val",
        "max_val",
    )

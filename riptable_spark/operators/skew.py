"""Skew mitigation (SURVEY §4 scale watch-list; reference relies on
single-machine shared memory so it never needed this — a 1000-executor
cluster does).

Two standard rewrites, both pure DataFrame ops:

- ``salted_join``: append a salt 0..S-1 to the skewed (left) side and
  explode the build (right) side ×S, then equi-join on (keys, salt).
  Each hot key's rows spread over S reducers instead of one.
- ``salted_agg``: two-phase aggregation — partial agg on (keys, salt),
  final agg on keys. Only decomposable aggregates (sum/count/min/max)
  are eligible; Spark's own partial aggregation covers the common case,
  this form helps when the *post-shuffle* groups are still hot (e.g.
  collecting per-key state in applyInPandas downstream).

AQE's skew-join handling (on in session.py) fixes sort-merge skew
automatically; salting remains the explicit tool for hash aggregations
and for joins AQE cannot split (broadcast-ineligible bucketed inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    salt_col: str = "__salt__",
) -> DataFrame:
    """Equi-join with the left (large/skewed) side salted and the right
    side replicated ×``salt``. Semantics identical to ``left.join(right,
    on, how)`` for row-preserving hows (inner/left)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (row-preserving) joins")
    # deterministic spread: row identity, not the key, drives the salt
    lsalt = left.withColumn(salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    rrep = right.withColumn(salt_col, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return lsalt.join(rrep, on=on + [salt_col], how=how).drop(salt_col)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    exprs: dict[str, tuple[str, Column]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation. ``exprs`` maps output name →
    (merge_fn_name, partial_expr); merge_fn ∈ {sum, min, max}: e.g.
    {'n': ('sum', F.count(F.lit(1))), 'total': ('sum', F.sum('x'))}."""
    salt_col = "__salt__"
    salted = df.withColumn(salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    partial = salted.groupBy(*keys, salt_col).agg(
        *[expr.alias(f"__p_{name}__") for name, (_, expr) in exprs.items()]
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"__p_{name}__").alias(name) for name, (fn, _) in exprs.items()]
    )


def salt_plan(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int = 1_000_000,
    min_salt: int = 1,
) -> DataFrame:
    """Per-key salting recommendation BEFORE an expensive join/agg: for
    each key, salt_factor = ceil(rows / target_rows_per_task) — 1 for
    well-behaved keys, >1 for the hot keys that need spreading.  The
    output relation (key, n_rows, salt_factor) is what ``salted_join``
    would broadcast; computing it is one hash aggregation over the key.

    Exact integer arithmetic throughout (ceil via (n + t − 1) DIV t),
    so the plan is engine-replayable and rerun-stable.
    """
    per = df.where(F.col(key_col).isNotNull()).groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    t = int(target_rows_per_task)
    salt = F.greatest(
        F.expr(f"(n_rows + {t - 1}) DIV {t}"), F.lit(int(min_salt)).cast("bigint")
    )
    return per.select(key_col, "n_rows", salt.alias("salt_factor"))

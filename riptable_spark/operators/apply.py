"""UDF surface (SURVEY §2.10): apply_reduce / apply_nonreduce / apply.

Reference: /root/reference/riptable/rt_groupbyops.py:366 (apply_reduce:
per-group array→scalar), :462 (apply_nonreduce: array→same-length array),
:529 (apply: Dataset→Dataset, shape-changing); executor
rt_grouping.py:2521/2944. Plus a registration API mirroring
Grouping.register_functions (rt_grouping.py:3273).

Spark mapping: all three are ``applyInPandas`` with Arrow batches — the
user function receives numpy/pandas data per group exactly like the
reference's packed-group kernels. One shuffle on the keys.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

def spread_groups(df: DataFrame, *keys) -> DataFrame:
    """Pin a grouped-UDF exchange at shuffle-partitions parallelism.

    AQE's advisory-size partition coalescing sizes post-shuffle
    partitions by BYTES, but a grouped Python stage's cost scales with
    GROUP COUNT (per-group Arrow slice + pandas call) — so a
    small-bytes many-group relation collapses to ONE post-shuffle
    partition and a single Python worker runs every group serially
    (measured round 6: a passthrough applyInPandas over 40k rows /
    1500 groups ran 6.8 s single-task, 1.3 s spread). An explicit
    repartition(N, keys) is exempt from AQE coalescing, satisfies the
    groupBy's ClusteredDistribution (no second exchange), and at real
    scale equals the exchange groupBy would have inserted anyway."""
    try:
        n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return df
    return df.repartition(n, *keys)


_TYPE_MAP = {
    "double": T.DoubleType(),
    "float": T.FloatType(),
    "long": T.LongType(),
    "int": T.IntegerType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
}


def _key_fields(df: DataFrame, keys: list[str]) -> list[T.StructField]:
    by_name = {f.name: f for f in df.schema.fields}
    return [by_name[k] for k in keys]


def apply_reduce(
    df: DataFrame,
    keys: list[str],
    valcol: str,
    fn: Callable,
    out_col: str = "out",
    out_type: str = "double",
) -> DataFrame:
    """Per-group array→scalar (rt_groupbyops.py:366). ``fn`` gets a numpy
    array of the group's values, returns a scalar."""
    schema = T.StructType(_key_fields(df, keys) + [T.StructField(out_col, _TYPE_MAP[out_type])])

    def reducer(pdf: pd.DataFrame) -> pd.DataFrame:
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[out_col] = [fn(pdf[valcol].to_numpy())]
        return pd.DataFrame(row)

    return spread_groups(df, *keys).groupBy(*keys).applyInPandas(reducer, schema=schema)


def apply_nonreduce(
    df: DataFrame,
    keys: list[str],
    valcol: str,
    fn: Callable,
    out_col: str = "out",
    out_type: str = "double",
    order_col: str | None = None,
) -> DataFrame:
    """Per-group array→same-length array transform (rt_groupbyops.py:462).
    ``order_col`` fixes the within-group order the array is presented in
    (riptable's physical order has no Spark default)."""
    schema = T.StructType(df.schema.fields + [T.StructField(out_col, _TYPE_MAP[out_type])])

    def transform(pdf: pd.DataFrame) -> pd.DataFrame:
        if order_col is not None:
            pdf = pdf.sort_values(order_col, kind="mergesort")
        pdf = pdf.copy()
        pdf[out_col] = fn(pdf[valcol].to_numpy())
        return pdf

    return spread_groups(df, *keys).groupBy(*keys).applyInPandas(transform, schema=schema)


def apply(df: DataFrame, keys: list[str], fn: Callable, schema) -> DataFrame:
    """Per-group Dataset→Dataset, shape-changing (rt_groupbyops.py:529) —
    the UDTF-like form; ``fn(pdf) -> pdf`` with any row count."""
    return spread_groups(df, *keys).groupBy(*keys).applyInPandas(fn, schema=schema)


# --- registration API (rt_grouping.py:3273, rt_fastarray.py:6052) ------
_REGISTERED: dict[str, tuple[Callable, str]] = {}


def register_function(name: str, fn: Callable, out_type: str = "double") -> None:
    """Register a named per-group kernel usable via ``grouped(df, keys,
    col).<name>()``-style dispatch (mirrors GB_FUNC_NUMBA registration)."""
    _REGISTERED[name] = (fn, out_type)


def run_registered(df: DataFrame, keys: list[str], valcol: str, name: str, out_col: str | None = None) -> DataFrame:
    fn, out_type = _REGISTERED[name]
    return apply_reduce(df, keys, valcol, fn, out_col=out_col or name, out_type=out_type)


def fa_apply(
    df: DataFrame,
    fn: Callable,
    in_cols: list[str],
    out_col: str = "out",
    out_type: str = "double",
    vectorized: bool = True,
) -> DataFrame:
    """FastArray.apply / apply_numba analogue (rt_fastarray.py:6052
    family): ELEMENTWISE function over one or more columns, no grouping.
    mapInPandas with Arrow batches — ``fn`` receives one numpy array per
    ``in_cols`` and returns an array, so it runs vectorized per batch
    (the idiomatic Spark equivalent of the reference's compiled
    per-element loop; a numba @njit/@vectorize fn passed here JITs on
    the executor). ``vectorized=False`` wraps a scalar-in/scalar-out fn
    with numpy.frompyfunc — the parity slow path, ~100× slower, kept
    only for functions that genuinely cannot vectorize.

    Scale shape: a pure map — no shuffle, batch-at-a-time Arrow
    transfer, composes with pushed-down filters upstream."""
    import numpy as np

    schema = T.StructType(df.schema.fields + [T.StructField(out_col, _TYPE_MAP[out_type])])
    call = fn if vectorized else np.frompyfunc(fn, len(in_cols), 1)

    def mapper(batches):
        for pdf in batches:
            arrays = [pdf[c].to_numpy() for c in in_cols]
            out = call(*arrays)
            pdf = pdf.copy()
            pdf[out_col] = np.asarray(out, dtype=object if out_type == "string" else None)
            yield pdf

    return df.mapInPandas(mapper, schema=schema)

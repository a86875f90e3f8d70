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

import numpy as np
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


def _emit(out: pd.DataFrame, out_cols: list[str]) -> pd.DataFrame:
    """Mirror Spark 4 applyInPandas column matching: by name, exact set
    (extras and missing columns are errors there too)."""
    if set(out.columns) != set(out_cols):
        missing = [c for c in out_cols if c not in out.columns]
        extra = [c for c in out.columns if c not in out_cols]
        raise RuntimeError(
            "[RESULT_COLUMN_NAMES_MISMATCH] Column names of the returned "
            f"data do not match specified schema. Missing: {missing}. "
            f"Unexpected: {extra}."
        )
    return out[out_cols]


def _group_starts(kv: pd.DataFrame) -> np.ndarray:
    """Row indices where a new key-group starts in a key-sorted frame.

    Consecutive rows are compared at the columns' NATIVE dtypes by
    slicing (a ``shift()`` would upcast int64 to float64 and collapse
    64-bit keys that differ only below 2^53 precision — hash-valued
    keys are real in this codebase). A null key equals a null key
    (groupBy semantics); row 0 always starts a group."""
    a = kv.iloc[:-1].reset_index(drop=True)
    b = kv.iloc[1:].reset_index(drop=True)
    neq = (b.ne(a) & ~(b.isna() & a.isna())).any(axis=1).to_numpy()
    return np.concatenate(([0], np.flatnonzero(neq) + 1))


def _group_carry_runner(keys: list[str], fn: Callable, out_cols: list[str]):
    """Partition runner: slice key-sorted Arrow batches into per-group
    frames, carrying the trailing (possibly batch-spanning) group."""

    def runner(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            starts = _group_starts(pdf[keys])
            last_start = int(starts[-1])
            carry = pdf.iloc[last_start:]
            if last_start == 0:
                continue  # whole batch is one (still-open) group
            outs = [
                fn(pdf.iloc[s:e].reset_index(drop=True))
                for s, e in zip(starts[:-1], starts[1:])
            ]
            out = pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]
            if len(out):
                yield _emit(out, out_cols)
        if carry is not None and len(carry):
            out = fn(carry.reset_index(drop=True))
            if len(out):
                yield _emit(out, out_cols)

    return runner


def grouped_apply(df: DataFrame, keys, fn: Callable, schema) -> DataFrame:
    """``groupBy(keys).applyInPandas(fn, schema)`` with per-group overhead
    paid in numpy, not in Spark's grouped-UDF machinery.

    FlatMapGroupsInPandas ships every group as its own Arrow batch and
    charges a fixed per-group cost (Arrow slice + worker round trip)
    that dominates small-group workloads (~0.9 ms/group measured round
    6). This runner instead repartitions by the keys at
    shuffle-partitions parallelism (the spread_groups lesson: AQE's
    bytes-based coalescing must not serialize a many-group stage onto
    one worker), sorts each partition by the keys so groups are
    contiguous, and runs ONE mapInPandas whose runner slices the
    ~10k-row Arrow batches at key-change boundaries — carrying the
    trailing group across batch (and only batch, never partition)
    boundaries.

    Semantics match applyInPandas exactly: same per-group input rows
    and columns, same by-name/positional output matching, null keys
    group together, within-group arrival order is as unspecified as the
    grouped-UDF path (every kernel that cares sorts internally)."""
    keys = list(keys)
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        part = df.repartition(n, *keys)
    except (TypeError, ValueError):
        part = df.repartition(*keys)
    part = part.sortWithinPartitions(*keys)
    struct = schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
    out_cols = [f.name for f in struct.fields]
    return part.mapInPandas(_group_carry_runner(keys, fn, out_cols), schema=schema)


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

    return grouped_apply(df, keys, reducer, schema)


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

    return grouped_apply(df, keys, transform, schema)


def apply(df: DataFrame, keys: list[str], fn: Callable, schema) -> DataFrame:
    """Per-group Dataset→Dataset, shape-changing (rt_groupbyops.py:529) —
    the UDTF-like form; ``fn(pdf) -> pdf`` with any row count."""
    return grouped_apply(df, keys, fn, schema)


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

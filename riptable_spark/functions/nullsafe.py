"""Invalid/sentinel ↔ NULL bridge.

The reference uses per-dtype sentinel invalids instead of masks
(/root/reference/riptable/rt_enum.py:88-116 INVALID_DICT: int8→-128,
int32→INT32_MIN, float→NaN, str→""). On Spark the idiomatic model is real
NULLs; this module provides (a) ingest-time sentinel→NULL normalization,
(b) the isna/fillna/replacena API (rt_fastarray.py:4322/4413/4354), and
(c) the sum-vs-nansum split: SQL aggregates are null-skipping (= riptable's
nan* variants); the non-nan variants propagate invalids, reproduced with a
null-count guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Sentinel invalids per Spark type, mirroring INVALID_DICT (rt_enum.py:88-116).
SENTINELS: dict[type, object] = {
    T.ByteType: -128,
    T.ShortType: -32768,
    T.IntegerType: -(2**31),
    T.LongType: -(2**63),
    T.StringType: "",
    T.BinaryType: b"",
}


def sentinel_to_null(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Ingest normalization: map sentinel invalids (and float NaN) to NULL."""
    cols = df.columns if columns is None else columns
    schema = {f.name: f.dataType for f in df.schema.fields}
    out = []
    for c in df.columns:
        if c not in cols:
            out.append(F.col(c))
            continue
        dt = schema[c]
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            out.append(F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)).alias(c))
        elif type(dt) in SENTINELS:
            out.append(
                F.when(F.col(c) == F.lit(SENTINELS[type(dt)]), F.lit(None)).otherwise(F.col(c)).alias(c)
            )
        else:
            out.append(F.col(c))
    return df.select(*out)


def isna(col: Column) -> Column:
    """rt_fastarray.py:4322 — invalid test. NULL or NaN (floats).
    try_cast keeps the NaN probe type-safe for strings/dates."""
    d = col.try_cast("double")
    return col.isNull() | F.when(d.isNotNull(), F.isnan(d)).otherwise(F.lit(False))


def isnotna(col: Column) -> Column:
    return ~isna(col)


def isnanorzero(col: Column) -> Column:
    """rt_fastarray.py predicate ISNANORZERO (rt_enum.py:273-284)."""
    return isna(col) | (col == F.lit(0))


def fillna(col: Column, value) -> Column:
    """rt_fastarray.py:4413 — replace invalids with a constant."""
    return F.when(isna(col), F.lit(value)).otherwise(col)


def _fill_compatible(dt: T.DataType, value) -> bool:
    """Whether a Python fill value can type-soundly fill a column of dt."""
    if isinstance(value, bool):
        return isinstance(dt, T.BooleanType)
    if isinstance(value, (int, float)):
        return isinstance(dt, T.NumericType)
    if isinstance(value, str):
        return isinstance(dt, T.StringType)
    if isinstance(value, bytes):
        return isinstance(dt, T.BinaryType)
    return False


def isna_typed(col: Column, dt: T.DataType) -> Column:
    """Schema-aware invalid test: NaN only counts for float types — a
    STRING cell containing the text 'NaN' is a legitimate value (the
    string invalid sentinel is '', per SENTINELS)."""
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return col.isNull() | F.isnan(col)
    return col.isNull()


def replacena(df: DataFrame, value, columns: list[str] | None = None) -> DataFrame:
    """rt_fastarray.py:4354 — Dataset-wide fillna. With ``columns=None``
    only columns the fill value can type-soundly fill are touched (a
    numeric fill skips timestamps/strings instead of raising); an explicit
    column list is honored as given (including an empty list = no-op)."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        cols = [c for c in df.columns if _fill_compatible(schema[c], value)]
    else:
        cols = list(columns)
    return df.select(
        *[
            F.when(isna_typed(F.col(c), schema[c]), F.lit(value)).otherwise(F.col(c)).alias(c)
            if c in cols
            else F.col(c)
            for c in df.columns
        ]
    )


# The invalid-PROPAGATING aggregate wrapper (riptable's non-nan ``sum`` —
# SURVEY §1.2 'the single biggest semantic translation') lives in
# operators.groupby.strict, which also fuses the bin-0 filter; this module
# deliberately does not carry a second copy.


def nan_to_zero(col):
    """rt_numpy.py:3195 nan_to_zero: invalid (NULL/NaN under the bridge)
    → 0, as an expression (Spark columns are immutable; the reference
    mutates in place)."""
    from pyspark.sql import functions as F

    return F.when(col.isNull() | F.isnan(col.cast("double")), F.lit(0)).otherwise(col)


def nan_to_num(col, nan=0.0, posinf=None, neginf=None):
    """numpy/riptable nan_to_num surface: NaN→``nan``, ±inf→finite
    substitutes (defaults: float64 max/min like numpy)."""
    from pyspark.sql import functions as F

    big = 1.7976931348623157e308
    p = F.lit(posinf if posinf is not None else big)
    m = F.lit(neginf if neginf is not None else -big)
    c = col.cast("double")
    return (
        F.when(c.isNull() | F.isnan(c), F.lit(float(nan)))
        .when(c == F.lit(float("inf")), p)
        .when(c == F.lit(float("-inf")), m)
        .otherwise(c)
    )


def get_default_value(dtype) -> object | None:
    """The sentinel 'invalid' default for a Spark type (rt_numpy /
    rt_enum.py get_default_value over INVALID_DICT). Float types return
    NaN; types whose invalid is NULL-only on Spark (timestamps, dates,
    booleans) return None."""
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        return float("nan")
    return SENTINELS.get(type(dtype))

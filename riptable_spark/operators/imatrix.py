"""IMatrix: cross-column (horizontal) matrix view of a Dataset.

Reference parity: ``rt_imatrix.py:11`` (IMatrix, vstack order='F') and the
Dataset hooks ``rt_dataset.py:1912`` (imatrix_make), ``:2012`` (imatrix_y,
per-row reductions across columns), ``:2107`` (imatrix_xy, adds the
per-column reductions + the grand-total corner cell), ``:2149``
(imatrix_totals, footer row).

Spark-first design: the reference materializes a Fortran-ordered 2-D
numpy matrix so row-wise kernels can stride across columns. A DataFrame
has no 2-D layout, but the SAME semantics are an ``array(col1..colN)``
expression plus Spark's array higher-order functions — whole-stage
codegen, zero shuffle, zero Python. The "matrix" never exists as a
separate object; Catalyst fuses the array construction into each
consuming reduction, so at 100 TB this costs one scan and no memory
blow-up (the reference's design goal, achieved declaratively).

Invalid handling follows the repo convention (ingest normalizes
sentinels to NULL): non-nan reductions propagate invalids (any NULL/NaN
in the row → NaN result, numpy semantics), ``nan*`` variants skip them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = ("tinyint", "smallint", "int", "bigint", "float", "double", "decimal")

MATRIX_COL = "__imatrix__"


def numeric_colnames(df: DataFrame, colnames: list[str] | None = None) -> list[str]:
    """The 'computable columns' rule (rt_dataset.py:1970): default to every
    numeric column, in Dataset order."""
    if colnames is not None:
        return list(colnames)
    return [c for c, t in df.dtypes if t.startswith(_NUMERIC_PREFIXES)]


def imatrix_make(df: DataFrame, colnames: list[str] | None = None) -> tuple[DataFrame, list[str]]:
    """Attach the matrix column (``array<double>`` over ``colnames``).

    Mirrors ``imatrix_make`` (rt_dataset.py:1912) with dtype unification
    to double (the reference's common-dtype vstack). Returns (df, names)
    like ``retnames=True``.
    """
    cols = numeric_colnames(df, colnames)
    if not cols:
        raise ValueError("imatrix_make: no numeric columns to stack")
    arr = F.array(*[F.col(c).cast("double") for c in cols])
    return df.withColumn(MATRIX_COL, arr), cols


def _valid(arr: Column) -> Column:
    return F.filter(arr, lambda x: x.isNotNull() & ~F.isnan(x))


def _has_invalid(arr: Column) -> Column:
    return F.exists(arr, lambda x: x.isNull() | F.isnan(x))


def _nan() -> Column:
    return F.lit(float("nan"))


def _plain_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _row_reduce(arr: Column, func: str, ddof: int = 1) -> Column:
    """One horizontal reduction over the row's matrix slice.

    Non-nan funcs propagate invalids (numpy: sum([1, nan]) → nan); nan*
    funcs reduce the valid subset (empty → NaN, matching riptable's
    invalid result for an all-invalid row).
    """
    v = _valid(arr)
    n_valid = F.size(v)
    nansum = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    if func == "sum":
        return F.when(_has_invalid(arr), _nan()).otherwise(_plain_sum(arr))
    if func == "nansum":
        return nansum
    if func == "mean":
        return F.when(_has_invalid(arr), _nan()).otherwise(_plain_sum(arr) / F.size(arr))
    if func == "nanmean":
        return F.when(n_valid > 0, nansum / n_valid).otherwise(_nan())
    if func == "min":
        return F.when(_has_invalid(arr), _nan()).otherwise(F.array_min(arr))
    if func == "nanmin":
        return F.when(n_valid > 0, F.array_min(v)).otherwise(_nan())
    if func == "max":
        return F.when(_has_invalid(arr), _nan()).otherwise(F.array_max(arr))
    if func == "nanmax":
        return F.when(n_valid > 0, F.array_max(v)).otherwise(_nan())
    if func in ("var", "nanvar", "std", "nanstd"):
        strict = not func.startswith("nan")
        src = arr if strict else v
        n = F.size(src)
        mean = _plain_sum(src) / n
        ss = F.aggregate(src, F.lit(0.0), lambda acc, x: acc + (x - mean) * (x - mean))
        var = F.when(n > ddof, ss / (n - F.lit(ddof))).otherwise(_nan())
        out = F.sqrt(var) if func.endswith("std") else var
        return F.when(_has_invalid(arr), _nan()).otherwise(out) if strict else out
    if func in ("median", "nanmedian"):
        strict = func == "median"
        s = F.sort_array(v)
        n = F.size(s)
        # exact numpy median: mean of the two middle order statistics
        i_lo = ((n + 1) / F.lit(2)).cast("int")
        i_hi = (n / F.lit(2) + 1).cast("int")
        med = F.when(n > 0, (F.element_at(s, i_lo) + F.element_at(s, i_hi)) / 2.0).otherwise(_nan())
        if strict:
            return F.when(_has_invalid(arr), _nan()).otherwise(med)
        return med
    raise ValueError(f"imatrix: unsupported horizontal func {func!r}")


_DEFAULT_NAMES = {
    "sum": "Sum", "nansum": "Sum", "mean": "Mean", "nanmean": "Mean",
    "min": "Min", "nanmin": "Min", "max": "Max", "nanmax": "Max",
    "var": "Var", "nanvar": "Var", "std": "Std", "nanstd": "Std",
    "median": "Median", "nanmedian": "Median",
}


def imatrix_y(
    df: DataFrame,
    funcs: list[str] | str,
    colnames: list[str] | None = None,
    names: list[str] | None = None,
    ddof: int = 1,
) -> DataFrame:
    """Append per-row horizontal reductions (rt_dataset.py:2012 imatrix_y).

    ``ds.imatrix_y([np.sum, np.mean])`` → columns 'Sum', 'Mean' holding the
    row-wise reduction across the matrix columns. Pure codegen: one
    array expression per func, no shuffle, no UDF.
    """
    if isinstance(funcs, str):
        funcs = [funcs]
    base, cols = imatrix_make(df, colnames)
    arr = F.col(MATRIX_COL)
    out = base
    for i, f in enumerate(funcs):
        name = names[i] if names else _DEFAULT_NAMES[f]
        out = out.withColumn(name, _row_reduce(arr, f, ddof=ddof))
    return out.drop(MATRIX_COL)


# Vertical (per-column) reductions for the X axis of imatrix_xy.
_X_AGGS = {
    "sum": F.sum, "nansum": F.sum, "mean": F.avg, "nanmean": F.avg,
    "min": F.min, "nanmin": F.min, "max": F.max, "nanmax": F.max,
    "var": F.var_samp, "nanvar": F.var_samp, "std": F.stddev_samp,
    "nanstd": F.stddev_samp, "median": F.median, "nanmedian": F.median,
}


def imatrix_xy(
    df: DataFrame, func: str, colnames: list[str] | None = None, name: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(Y-augmented df, one-row X frame) — rt_dataset.py:2107 imatrix_xy.

    The X frame holds func over each matrix column plus the grand-total
    corner cell: func applied to the Y column itself (reference:
    ``resultX[-1] = func(resultY)``). One scan for Y (codegen), one
    partial-agg scan for X — at scale both are map-side-combined."""
    cols = numeric_colnames(df, colnames)
    name = name or _DEFAULT_NAMES[func]
    ydf = imatrix_y(df, [func], colnames=cols, names=[name])
    agg = _X_AGGS[func]

    def vert(c: Column) -> Column:
        d = c.cast("double")
        if func.startswith("nan"):
            # Spark aggs skip NULL but PROPAGATE NaN; nan* semantics skip
            # both, so normalize NaN→NULL before aggregating.
            return agg(F.when(~F.isnan(d), d))
        # strict numpy semantics: any invalid (NULL or NaN) → NaN column
        # total. max(bool) rides the same partial agg — still one pass.
        return F.when(F.max(d.isNull() | F.isnan(d)), F.lit(float("nan"))).otherwise(agg(d))

    xrow = ydf.agg(
        *[vert(F.col(c)).alias(c) for c in cols],
        vert(F.col(name)).alias(name),
    )
    return ydf, xrow


def imatrix_totals(
    df: DataFrame, colnames: list[str] | None = None, name: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """imatrix_xy(np.sum) packaged as a display footer (rt_dataset.py:2149):
    returns (df + 'Sum' column, one-row footer of column totals with the
    grand total in the far-right cell)."""
    return imatrix_xy(df, "nansum", colnames=colnames, name=name or "Sum")


def apply2d(df: DataFrame, expr_fn, colnames: list[str] | None = None, name: str = "Apply2d") -> DataFrame:
    """IMatrix.apply2d analogue (rt_imatrix.py:72): caller supplies a
    Column-expression function over the row's array<double> slice."""
    base, _ = imatrix_make(df, colnames)
    return base.withColumn(name, expr_fn(F.col(MATRIX_COL))).drop(MATRIX_COL)

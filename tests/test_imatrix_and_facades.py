"""IMatrix horizontal ops + the late-round facade batch (masks,
nan-propagating maximum/minimum, unique32, to_str, get_default_value).

Oracles are numpy on collected frames — the reference's own semantics
(rt_imatrix.py vstack order='F' + per-row numpy reductions).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from riptable_spark.functions import math as m
from riptable_spark.functions import nullsafe, strings
from riptable_spark.operators import imatrix as im
from riptable_spark.operators import positional


@pytest.fixture(scope="module")
def mat_df(spark):
    rows = [
        (0, 1.0, 10.0, 100.0),
        (1, 2.0, 20.0, 200.0),
        (2, float("nan"), 30.0, 300.0),
        (3, 4.0, None, 400.0),
        (4, 5.0, 50.0, 500.0),
    ]
    return spark.createDataFrame(rows, "id long, a double, b double, c double")


def _np_mat(df):
    pdf = df.toPandas().sort_values("id")
    return pdf, np.column_stack([pdf["a"], pdf["b"].astype(float), pdf["c"]])


def test_imatrix_y_strict_matches_numpy(spark, mat_df):
    out = (
        im.imatrix_y(mat_df, ["sum", "mean", "min", "max"], colnames=["a", "b", "c"])
        .toPandas()
        .sort_values("id")
    )
    pdf, mat = _np_mat(mat_df)
    # strict (non-nan) funcs: numpy propagation — rows 2 and 3 are NaN
    np.testing.assert_allclose(out["Sum"], np.sum(mat, axis=1))
    np.testing.assert_allclose(out["Mean"], np.mean(mat, axis=1))
    np.testing.assert_allclose(out["Min"], np.min(mat, axis=1))
    np.testing.assert_allclose(out["Max"], np.max(mat, axis=1))


def test_imatrix_y_nan_variants_skip_invalids(spark, mat_df):
    out = (
        im.imatrix_y(
            mat_df,
            ["nansum", "nanmean", "nanmin", "nanmax", "nanmedian"],
            colnames=["a", "b", "c"],
            names=["s", "mu", "lo", "hi", "med"],
        )
        .toPandas()
        .sort_values("id")
    )
    pdf, mat = _np_mat(mat_df)
    np.testing.assert_allclose(out["s"], np.nansum(mat, axis=1))
    np.testing.assert_allclose(out["mu"], np.nanmean(mat, axis=1))
    np.testing.assert_allclose(out["lo"], np.nanmin(mat, axis=1))
    np.testing.assert_allclose(out["hi"], np.nanmax(mat, axis=1))
    np.testing.assert_allclose(out["med"], np.nanmedian(mat, axis=1))


def test_imatrix_y_std_var(spark, mat_df):
    out = (
        im.imatrix_y(mat_df, ["nanvar", "nanstd"], colnames=["a", "b", "c"], names=["v", "s"])
        .toPandas()
        .sort_values("id")
    )
    _, mat = _np_mat(mat_df)
    # ddof=1 (riptable sample statistics); rows with <2 valid → NaN
    def nv(r):
        v = r[~np.isnan(r)]
        return np.var(v, ddof=1) if v.size > 1 else float("nan")

    np.testing.assert_allclose(out["v"], np.apply_along_axis(nv, 1, mat))
    np.testing.assert_allclose(out["s"], np.sqrt(np.apply_along_axis(nv, 1, mat)))


def test_imatrix_xy_corner_cell(spark, mat_df):
    ydf, xrow = im.imatrix_xy(mat_df, "nansum", colnames=["a", "b", "c"])
    x = xrow.collect()[0].asDict()
    _, mat = _np_mat(mat_df)
    assert x["a"] == pytest.approx(np.nansum(mat[:, 0]))
    assert x["b"] == pytest.approx(np.nansum(mat[:, 1]))
    assert x["c"] == pytest.approx(np.nansum(mat[:, 2]))
    # grand total corner = func over the Y column (rt_dataset.py:2142)
    assert x["Sum"] == pytest.approx(np.nansum(np.nansum(mat, axis=1)))


def test_imatrix_totals_footer(spark, mat_df):
    ydf, footer = im.imatrix_totals(mat_df, colnames=["a", "b", "c"])
    assert "Sum" in ydf.columns
    f = footer.collect()[0].asDict()
    assert set(f) == {"a", "b", "c", "Sum"}


def test_apply2d_custom_expr(spark, mat_df):
    out = (
        im.apply2d(mat_df, lambda a: F.size(im._valid(a)), colnames=["a", "b", "c"], name="nvalid")
        .toPandas()
        .sort_values("id")
    )
    assert list(out["nvalid"]) == [3, 3, 2, 2, 3]


def test_imatrix_plan_no_shuffle(spark, mat_df):
    plan = im.imatrix_y(mat_df, ["nansum"], colnames=["a", "b", "c"])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # horizontal reductions never shuffle


def test_mask_combinators(spark):
    df = spark.createDataFrame(
        [(x, y, z) for x in (0, 1) for y in (0, 1) for z in (0, 1)], "x int, y int, z int"
    )
    a, b, c = F.col("x") == 1, F.col("y") == 1, F.col("z") == 1
    got = df.select(
        m.mask_or([a, b, c]).alias("o"),
        m.mask_and([a, b, c]).alias("n"),
        m.mask_xor([a, b]).alias("x2"),
        m.mask_andnot([a, b, c]).alias("an"),
        "x", "y", "z",
    ).toPandas()
    xs, ys, zs = got["x"] == 1, got["y"] == 1, got["z"] == 1
    assert (got["o"] == (xs | ys | zs)).all()
    assert (got["n"] == (xs & ys & zs)).all()
    assert (got["x2"] == (xs ^ ys)).all()
    assert (got["an"] == (xs & ~ys & ~zs)).all()
    # in-place aliases are the same functions on immutable Columns
    assert m.mask_ori is m.mask_or and m.mask_andnoti is m.mask_andnot


def test_maximum_minimum_nan_propagation(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (float("nan"), 2.0), (3.0, float("nan")), (5.0, 4.0)], "a double, b double"
    )
    got = df.select(
        m.maximum(F.col("a"), F.col("b")).alias("mx"),
        m.minimum(F.col("a"), F.col("b")).alias("mn"),
    ).toPandas()
    np.testing.assert_allclose(got["mx"], np.maximum(df.toPandas()["a"], df.toPandas()["b"]))
    np.testing.assert_allclose(got["mn"], np.minimum(df.toPandas()["a"], df.toPandas()["b"]))


def test_unique32_first_occurrence(spark):
    df = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a"), (3, "c"), (4, "b")], "__rowid__ long, k string"
    )
    got = {r["k"]: r["ifirst_row"] for r in positional.unique32(df, ["k"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 3}
    filt = {r["k"]: r["ifirst_row"] for r in positional.unique32(df, ["k"], F.col("__rowid__") >= 2).collect()}
    assert filt == {"a": 2, "b": 4, "c": 3}


def test_to_str_and_default_values(spark):
    df = spark.createDataFrame([(1,), (None,)], "v int")
    vals = [r[0] for r in df.select(strings.to_str(F.col("v")).alias("s")).collect()]
    assert vals == ["1", ""]
    assert nullsafe.get_default_value(T.IntegerType()) == -(2**31)
    assert math.isnan(nullsafe.get_default_value(T.DoubleType()))
    assert nullsafe.get_default_value(T.TimestampType()) is None


def test_stack_rows_and_reindex_aliases():
    from riptable_spark.operators import reshape

    # stack_rows grew a provenance-label signature (rt_hstack.py:46) and is
    # doctest-covered in test_reference_parity; here just pin it exists
    assert callable(reshape.stack_rows)
    assert positional.reindex_fast is positional.mbget

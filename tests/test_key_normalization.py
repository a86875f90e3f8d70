"""normalize_keys / merge_prebinned / multikeyhash / categorical_convert
(rt_utils.py:370-520, rt_categorical.py:129, rt_numpy.py:2307)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from riptable_spark.operators import categorical as rcat
from riptable_spark.operators import merge as rmerge


def test_normalize_keys_int_widths(spark):
    l = spark.createDataFrame([(1, "a")], "k int, v string")
    r = spark.createDataFrame([(1, 9.0)], "k bigint, w double")
    l2, r2 = rmerge.normalize_keys(l, r, "k")
    assert dict(l2.dtypes)["k"] == "bigint" and dict(r2.dtypes)["k"] == "bigint"
    assert l2.join(r2, "k").count() == 1


def test_normalize_keys_int_float_goes_double(spark):
    l = spark.createDataFrame([(1,)], "k int")
    r = spark.createDataFrame([(1.0,)], "k float")
    l2, r2 = rmerge.normalize_keys(l, r, "k")
    assert dict(l2.dtypes)["k"] == "double" and dict(r2.dtypes)["k"] == "double"


def test_normalize_keys_rejects_string_vs_int(spark):
    l = spark.createDataFrame([("1",)], "k string")
    r = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(TypeError):
        rmerge.normalize_keys(l, r, "k")


def test_merge_prebinned_equijoin(spark):
    l = spark.createDataFrame([(1, "x"), (2, "y")], "code int, lv string")
    r = spark.createDataFrame([(1, 10), (3, 30)], "code int, rv int")
    got = rmerge.merge_prebinned(l, r, "code").collect()
    assert [(row["code"], row["lv"], row["rv"]) for row in got] == [(1, "x", 10)]


def test_multikeyhash_deterministic_and_distinct(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "a")], "x int, s string")
    h = rmerge.multikeyhash(df, ["x", "s"]).select("__mkhash__").toPandas()["__mkhash__"]
    assert h[0] == h[1] != h[2]


def test_categorical_convert_pandas_roundtrip(spark):
    p = pd.Categorical(["a", "b", "b", "a", "c", "x"], categories=["a", "b", "c"])
    out, cats = rcat.categorical_convert(spark, p)
    assert cats == ["a", "b", "c"]
    rows = out.toPandas()
    # pandas codes: a→0,b→1,c→2, 'x'→-1 (missing). base_index=1 shifts
    # mapped codes +1 and routes -1 to the Filtered bin 0
    assert list(rows["code"]) == [1, 2, 2, 1, 3, 0]
    assert list(rows["label"]) == ["a", "b", "b", "a", "c", "Filtered"]

"""grouped_apply must be indistinguishable from groupBy().applyInPandas.

The round-6 optimization replaces Spark's grouped-UDF machinery (one
Arrow batch + one Python call per GROUP) with a key-sorted mapInPandas
whose runner slices ~10k-row Arrow batches at key-change boundaries.
These tests pin the exact hazards of that rewrite:

- a group spanning multiple Arrow batches (carry logic),
- 64-bit integer keys above 2^53 (a pandas ``shift()`` comparison would
  upcast to float64 and fuse distinct groups — the runner compares
  native-dtype slices instead),
- null keys (groupBy semantics: null == null, one group),
- shape-changing fns (reduce to one row / filter rows / empty output),
- positional output matching (frame without schema column names).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from riptable_spark.operators.apply import grouped_apply


def _canon(df):
    pdf = df.toPandas()
    return (
        pdf[sorted(pdf.columns)]
        .sort_values(sorted(pdf.columns), ignore_index=True)
    )


def _assert_same(got, ref):
    pd.testing.assert_frame_equal(_canon(got), _canon(ref), check_dtype=True)


def _ref(df, keys, fn, schema):
    """The semantics oracle: the plain grouped-UDF path."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def test_multi_batch_group_carry(spark):
    # one giant group (25k rows > two 10k Arrow batches) + many small ones
    rows = [(1, i, float(i)) for i in range(25_000)]
    rows += [(g, i, float(i)) for g in range(2, 30) for i in range(7)]
    df = spark.createDataFrame(rows, "g int, i int, v double").repartition(3)

    def fn(pdf):
        pdf = pdf.sort_values("i")
        return pd.DataFrame(
            {"g": [pdf["g"].iloc[0]], "n": [len(pdf)], "s": [pdf["v"].sum()]}
        )

    schema = "g int, n long, s double"
    _assert_same(grouped_apply(df, ["g"], fn, schema), _ref(df, ["g"], fn, schema))


def test_int64_keys_above_2_53(spark):
    # adjacent 64-bit keys differing by 1: float64 cannot represent the
    # difference, so a shift()-based comparator would fuse the groups.
    base = (1 << 60) + 7
    rows = []
    for k in range(6):
        key = base + k
        rows += [(key, float(j)) for j in range(11)]
    df = spark.createDataFrame(rows, "h long, v double")

    def fn(pdf):
        return pd.DataFrame({"h": [pdf["h"].iloc[0]], "n": [len(pdf)], "s": [pdf["v"].sum()]})

    schema = "h long, n long, s double"
    out = grouped_apply(df, ["h"], fn, schema).toPandas()
    assert len(out) == 6, "distinct 2^60-scale keys must stay distinct groups"
    assert set(out["n"]) == {11}
    _assert_same(grouped_apply(df, ["h"], fn, schema), _ref(df, ["h"], fn, schema))


def test_null_keys_group_together(spark):
    rows = [("a", 1.0), ("a", 2.0), (None, 3.0), (None, 4.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "k string, v double")

    def fn(pdf):
        return pd.DataFrame({"k": [pdf["k"].iloc[0]], "s": [pdf["v"].sum()]})

    schema = "k string, s double"
    _assert_same(grouped_apply(df, ["k"], fn, schema), _ref(df, ["k"], fn, schema))
    got = grouped_apply(df, ["k"], fn, schema).toPandas()
    assert len(got) == 3
    assert got.loc[got["k"].isna(), "s"].iloc[0] == 7.0


def test_multikey_and_shape_change(spark):
    rows = [(i % 5, f"s{i % 3}", float(i)) for i in range(997)]
    df = spark.createDataFrame(rows, "a int, b string, v double")

    def fn(pdf):  # emits 0 rows for some groups, 2 for others
        if pdf["a"].iloc[0] == 0:
            return pd.DataFrame({"a": [], "b": [], "mx": []}).astype(
                {"a": "int32", "b": "object", "mx": "float64"}
            )
        return pd.DataFrame(
            {
                "a": [pdf["a"].iloc[0]] * 2,
                "b": [pdf["b"].iloc[0]] * 2,
                "mx": [pdf["v"].max(), pdf["v"].min()],
            }
        )

    schema = "a int, b string, mx double"
    _assert_same(
        grouped_apply(df, ["a", "b"], fn, schema), _ref(df, ["a", "b"], fn, schema)
    )


def test_column_name_mismatch_raises_like_applyinpandas(spark):
    # Spark 4 applyInPandas rejects output frames whose column-name set
    # differs from the schema (RESULT_COLUMN_NAMES_MISMATCH); the
    # grouped_apply runner must reject them the same way, not silently
    # positional-match.
    df = spark.createDataFrame([(1, 2.0), (1, 3.0), (2, 4.0)], "g int, v double")

    def fn(pdf):  # column names deliberately NOT the schema names
        return pd.DataFrame({"x": [pdf["g"].iloc[0]], "y": [pdf["v"].mean()]})

    schema = T.StructType(
        [T.StructField("g", T.IntegerType()), T.StructField("m", T.DoubleType())]
    )
    with pytest.raises(Exception, match="RESULT_COLUMN_NAMES_MISMATCH"):
        _ref(df, ["g"], fn, schema).collect()
    with pytest.raises(Exception, match="RESULT_COLUMN_NAMES_MISMATCH"):
        grouped_apply(df, ["g"], fn, schema).collect()

    def fn_reordered(pdf):  # schema names, different order — allowed
        return pd.DataFrame({"m": [pdf["v"].mean()], "g": [pdf["g"].iloc[0]]})

    _assert_same(
        grouped_apply(df, ["g"], fn_reordered, schema),
        _ref(df, ["g"], fn_reordered, schema),
    )


def test_plan_is_single_exchange_mapinpandas(spark):
    df = spark.createDataFrame([(i % 7, float(i)) for i in range(100)], "g int, v double")

    def fn(pdf):
        return pd.DataFrame({"g": [pdf["g"].iloc[0]], "n": [len(pdf)]})

    out = grouped_apply(df, ["g"], fn, "g int, n long")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert plan.count("Exchange") <= 2  # the keyed repartition only (+AQE read)

"""Categorical mode semantics vs the reference contract
(rt_enum.py:848 CategoryMode, rt_categorical.py:823-849 invalid display,
rt_grouping.py:136 merge_cats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from riptable_spark.operators import categorical as cat


def test_enum_label_mapped_unmapped_null(spark):
    df = spark.createDataFrame([(1,), (2,), (9,), (None,)], "code int")
    out = [r.lbl for r in df.select(cat.enum_label(F.col("code"), {1: "A", 2: "B"}).alias("lbl")).collect()]
    assert out == ["A", "B", "!<9>", "!<inv>"]


def test_string_codes_bin0(spark):
    df = spark.createDataFrame([("a",), ("b",), ("z",), (None,)], "v string")
    out = [r.c for r in df.select(cat.string_codes(F.col("v"), ["a", "b", "c"]).alias("c")).collect()]
    assert out == [1, 2, 0, 0]


def test_cat_agg_showfilter_ordering(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("z", 10.0), ("b", 3.0)], ["k", "v"]
    )
    got = cat.cat_agg(
        df, F.col("k"), ["a", "b"], {"s": F.sum("v")}, showfilter=True
    ).collect()
    assert got[0].bin == "Filtered" and got[0].s == 10.0
    rest = {r.bin: r.s for r in got[1:]}
    assert rest == {"a": 3.0, "b": 3.0}


def test_cat_agg_filter_kwarg_routes_to_bin0(spark):
    """An explicit filter behaves like riptable's filtered Categorical:
    failing rows join the out-of-dictionary rows in bin 0."""
    df = spark.createDataFrame([("a", 1.0), ("a", 5.0), ("b", 2.0)], ["k", "v"])
    got = cat.cat_agg(
        df, F.col("k"), ["a", "b"], {"s": F.sum("v")},
        showfilter=True, filter=F.col("v") < 4,
    ).collect()
    assert got[0].bin == "Filtered" and got[0].s == 5.0
    assert {r.bin: r.s for r in got[1:]} == {"a": 1.0, "b": 2.0}


def test_merge_mappings_first_wins():
    m = cat.merge_mappings([{1: "A", 2: "B"}, {2: "ZZZ", 3: "C"}])
    assert m == {1: "A", 2: "B", 3: "C"}


def test_merge_uniques_first_seen_order():
    assert cat.merge_uniques([["c", "a"], ["b", "a", "d"]]) == ["c", "a", "b", "d"]


def test_hstack_categoricals_remap_and_bin0(spark):
    d1 = spark.createDataFrame([("x",), ("y",), ("q",)], "v string")
    d2 = spark.createDataFrame([("y",), ("z",), ("x",)], "v string")
    stacked, unified = cat.hstack_categoricals(
        [(d1, "v"), (d2, "v")], [["x", "y"], ["y", "z"]]
    )
    assert unified == ["x", "y", "z"]
    got = sorted((r.v, r.code) for r in stacked.collect())
    # part1: x→1 y→2 q→0 (out of part1's dict); part2: y→2 z→3 x→0
    # ('x' IS in the unified dict but was NOT in part2's dictionary, so it
    # was already Filtered there and must stay bin 0 — merge_cats never
    # resurrects filtered rows)
    assert got == [("q", 0), ("x", 0), ("x", 1), ("y", 2), ("y", 2), ("z", 3)]


def test_hstack_categoricals_multikey(spark):
    """rt_grouping.py:277 hstack_groupings hash path: multikey tuples,
    unified dictionary in first-seen order, per-part bin-0 preserved."""
    d1 = spark.createDataFrame(
        [("x", 1, 10.0), ("y", 2, 20.0), ("q", 9, 30.0)], ["k1", "k2", "val"]
    )
    d2 = spark.createDataFrame(
        [("y", 2, 40.0), ("z", 3, 50.0), ("x", 1, 60.0)], ["k1", "k2", "val"]
    )
    stacked, unified = cat.hstack_categoricals_multikey(
        [(d1, ["k1", "k2"]), (d2, ["k1", "k2"])],
        [[("x", 1), ("y", 2)], [("y", 2), ("z", 3)]],
    )
    assert unified == [("x", 1), ("y", 2), ("z", 3)]
    got = sorted((r.val, r.code) for r in stacked.collect())
    # part1: (x,1)→1 (y,2)→2 (q,9)→0; part2: (y,2)→2 (z,3)→3 and (x,1)→0
    # because (x,1) was outside part2's OWN dictionary (Filtered there).
    assert got == [
        (10.0, 1), (20.0, 2), (30.0, 0), (40.0, 2), (50.0, 3), (60.0, 0),
    ]

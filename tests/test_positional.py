"""Positional fancy-index ops re-expressed as rowid joins
(operators/positional.py; reference rt_utils.py:631 mbget)."""

from __future__ import annotations

from pyspark.sql import functions as F

from riptable_spark.operators import positional as pos


def _values(spark):
    # v = [10,20,30,40,50,60,70] with explicit positions
    return spark.createDataFrame(
        [(i, (i + 1) * 10) for i in range(7)], ["__rowid__", "v"]
    )


def test_mbget_doctest_parity(spark):
    """rt_utils.py:700 doctest: v=[10..70], p=[0,-7,4,3,7,1,2] →
    [10, inv, 50, 40, inv, 20, 30] (negatives and out-of-range are
    invalid → NULL under the sentinel bridge)."""
    p = [0, -7, 4, 3, 7, 1, 2]
    idx = spark.createDataFrame([(i, x) for i, x in enumerate(p)], ["pos", "idx"])
    out = pos.mbget(_values(spark), idx, "idx", ["v"]).orderBy("pos")
    got = [r.v for r in out.collect()]
    assert got == [10, None, 50, 40, None, 20, 30]


def test_bool_to_fancy(spark):
    df = _values(spark)
    got = sorted(
        r["index"] for r in pos.bool_to_fancy(df, F.col("v") > 40).collect()
    )
    assert got == [4, 5, 6]  # positions of 50, 60, 70


def test_merge_indices_left(spark):
    left = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], ["__rowid__", "k"])
    right = spark.createDataFrame([(0, "b"), (1, "b"), (2, "z")], ["__rowid__", "k"])
    got = sorted(
        (r.left_index, r.right_index)
        for r in pos.merge_indices(left, right, ["k"], how="left").collect()
    )
    # 'a'->no match (NULL), 'b'->rows 0 and 1 of right, 'c'->no match
    assert got == [(0, None), (1, 0), (1, 1), (2, None)]


def test_alignmk_matches_reference_doctest(spark):
    """rt_utils.py:548 doctest shape: monotone times, single key;
    backward alignment returns, per left row, the index of the latest
    right row with time <= left time (invalid when none)."""
    t1 = [0, 1, 4, 6, 8, 9, 11, 16, 19, 20, 22, 27]
    t2 = [1, 5, 8, 10, 12, 15, 17, 20]
    left = spark.createDataFrame([(i, "k", t) for i, t in enumerate(t1)], ["i", "k", "t"])
    right = spark.createDataFrame(
        [(i, "k", t) for i, t in enumerate(t2)], ["__rowid__", "k", "t"]
    )
    out = pos.alignmk(left, right, on="t", by="k").orderBy("i")
    got = [r.right_index for r in out.collect()]
    # per left time, latest right index with t2 <= t1
    expected = [None, 0, 0, 1, 2, 2, 3, 5, 6, 7, 7, 7]
    assert got == expected


def test_make_links_and_assoc(spark):
    """makeifirst/ilast/inext/iprev over an explicit rowid, plus
    assoc_index/assoc_copy first-occurrence gather."""
    rows = [(0, "a"), (1, "b"), (2, "a"), (3, "b"), (4, "a")]
    df = spark.createDataFrame(rows, ["__rowid__", "k"])
    d = pos.make_iprev(
        pos.make_inext(pos.make_ilast(pos.make_ifirst(df, ["k"]), ["k"]), ["k"]), ["k"]
    ).orderBy("__rowid__")
    got = [(r.ifirst, r.ilast, r.inext, r.iprev) for r in d.collect()]
    assert got == [
        (0, 4, 2, None),   # row0 'a'
        (1, 3, 3, None),   # row1 'b'
        (0, 4, 4, 0),      # row2 'a'
        (1, 3, None, 1),   # row3 'b'
        (0, 4, None, 2),   # row4 'a'
    ]

    left = spark.createDataFrame([("a",), ("z",), ("b",)], ["k"])
    right = spark.createDataFrame(
        [(0, "b", 10.0), (1, "a", 20.0), (2, "a", 30.0)], ["__rowid__", "k", "v"]
    )
    ai = {r.k: r.assoc_index for r in pos.assoc_index(left, right, ["k"]).collect()}
    assert ai == {"a": 1, "z": None, "b": 0}  # first occurrence
    ac = {r.k: r.v for r in pos.assoc_copy(left, right, ["k"], ["v"]).collect()}
    assert ac == {"a": 20.0, "z": None, "b": 10.0}


def test_nanarg_and_nan_to(spark):
    from riptable_spark.functions import nullsafe as ns
    from riptable_spark.functions import stats as st

    df = spark.createDataFrame(
        [(0, 5.0), (1, None), (2, 1.0), (3, 1.0), (4, 9.0)], ["__rowid__", "v"]
    )
    assert st.nanargmin(df, "v") == 2  # ties -> lowest position
    assert st.nanargmax(df, "v") == 4
    got = [
        r.z
        for r in df.orderBy("__rowid__")
        .select(ns.nan_to_zero(F.col("v")).alias("z"))
        .collect()
    ]
    assert got == [5.0, 0.0, 1.0, 1.0, 9.0]


def test_repeat_tile_bincount(spark):
    from riptable_spark.operators import reshape as rs

    df = spark.createDataFrame([(1,), (2,)], ["v"])
    rep = rs.repeat_rows(df, 3)
    assert rep.count() == 6
    til = rs.tile_rows(df, 2)
    assert sorted((r.v, r["__tile__"]) for r in til.collect()) == [
        (1, 0), (1, 1), (2, 0), (2, 1)
    ]
    bc = spark.createDataFrame([(0,), (2,), (2,), (5,)], ["b"])
    got = [(r.bin, r.n) for r in rs.bincount(bc, "b").orderBy("bin").collect()]
    assert got == [(0, 1), (1, 0), (2, 2), (3, 0), (4, 0), (5, 1)]

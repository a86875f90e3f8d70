"""Ordered/window operator semantics (SURVEY §2.5/2.6)."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from riptable_spark.operators import window as win


def seq_df(spark):
    rows = [("a", i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5])] + [
        ("b", i, float(v)) for i, v in enumerate([2, 7, 1])
    ]
    return spark.createDataFrame(rows, ["g", "i", "v"])


def test_shift_diff(spark):
    df = seq_df(spark)
    w = win.group_window(["g"], "i")
    out = df.select("g", "i", win.shift(F.col("v"), 1, w).alias("s"), win.diff(F.col("v"), 1, w).alias("d"))
    got = {(r.g, r.i): (r.s, r.d) for r in out.collect()}
    assert got[("a", 0)] == (None, None)
    assert got[("a", 1)] == (3.0, -2.0)
    assert got[("b", 2)] == (7.0, -6.0)


def test_negative_shift_is_lead(spark):
    df = seq_df(spark)
    w = win.group_window(["g"], "i")
    got = {(r.g, r.i): r.s for r in df.select("g", "i", win.shift(F.col("v"), -1, w).alias("s")).collect()}
    assert got[("a", 0)] == 1.0 and got[("a", 4)] is None


def test_cumsum_cumprod_cummax(spark):
    df = seq_df(spark)
    w = win.group_window(["g"], "i")
    out = df.select(
        "g", "i",
        win.cumsum(F.col("v"), w).alias("cs"),
        win.cumprod(F.col("v"), w).alias("cp"),
        win.cummax(F.col("v"), w).alias("cm"),
    )
    got = {(r.g, r.i): (r.cs, r.cp, r.cm) for r in out.collect()}
    assert got[("a", 4)][0] == 14.0
    assert math.isclose(got[("a", 4)][1], 3 * 1 * 4 * 1 * 5)
    assert got[("a", 4)][2] == 5.0


def test_cumprod_with_zero_and_negative(spark):
    df = spark.createDataFrame([("g", 0, -2.0), ("g", 1, 3.0), ("g", 2, 0.0), ("g", 3, 4.0)], ["g", "i", "v"])
    w = win.group_window(["g"], "i")
    got = [r.cp for r in df.select(win.cumprod(F.col("v"), w).alias("cp")).orderBy("i").collect()]
    assert got[0] == -2.0 and math.isclose(got[1], -6.0) and got[2] == 0.0 and got[3] == 0.0


def test_cumsum_reset(spark):
    df = spark.createDataFrame(
        [("g", 0, 1.0, False), ("g", 1, 2.0, False), ("g", 2, 3.0, True), ("g", 3, 4.0, False)],
        ["g", "i", "v", "reset"],
    )
    got = [
        r.cs
        for r in df.select(
            "i", win.cumsum_reset(F.col("v"), F.col("reset"), ["g"], "i").alias("cs")
        ).orderBy("i").collect()
    ]
    assert got == [1.0, 3.0, 3.0, 7.0]


def test_rolling_full_window_semantics(spark):
    """riptable rolling_sum yields invalid until the window fills."""
    df = seq_df(spark)
    w = win.group_window(["g"], "i")
    got = [
        r.rs
        for r in df.where(F.col("g") == "a")
        .select("i", win.rolling_sum(F.col("v"), w, 3).alias("rs"))
        .orderBy("i")
        .collect()
    ]
    assert got == [None, None, 8.0, 6.0, 10.0]


def test_fills(spark):
    df = spark.createDataFrame(
        [("g", 0, None), ("g", 1, 5.0), ("g", 2, None), ("g", 3, None), ("g", 4, 7.0)],
        ["g", "i", "v"],
    )
    w = win.group_window(["g"], "i")
    out = df.select(
        "i",
        win.fill_forward(F.col("v"), w).alias("ff"),
        win.fill_backward(F.col("v"), w).alias("fb"),
        win.fill_forward_limit(F.col("v"), w, 1).alias("ffl"),
    ).orderBy("i")
    got = [(r.ff, r.fb, r.ffl) for r in out.collect()]
    assert [g[0] for g in got] == [None, 5.0, 5.0, 5.0, 7.0]
    assert [g[1] for g in got] == [5.0, 5.0, 7.0, 7.0, 7.0]
    assert [g[2] for g in got] == [None, 5.0, 5.0, None, 7.0]


def test_rank_methods(spark):
    df = spark.createDataFrame([("g", i, v) for i, v in enumerate([10.0, 20.0, 20.0, 30.0])], ["g", "i", "v"])
    out = df.select(
        "i",
        win.rank(F.col("v"), ["g"], "min").alias("rmin"),
        win.rank(F.col("v"), ["g"], "max").alias("rmax"),
        win.rank(F.col("v"), ["g"], "dense").alias("rdense"),
        win.rank(F.col("v"), ["g"], "average").alias("ravg"),
        win.rank(F.col("v"), ["g"], "min", pct=True).alias("rpct"),
    ).orderBy("i")
    rows = out.collect()
    assert [r.rmin for r in rows] == [1, 2, 2, 4]
    assert [r.rmax for r in rows] == [1, 3, 3, 4]
    assert [r.rdense for r in rows] == [1, 2, 2, 3]
    assert [r.ravg for r in rows] == [1.0, 2.5, 2.5, 4.0]
    assert [r.rpct for r in rows] == [0.25, 0.5, 0.5, 1.0]


def test_head_tail_nth(spark):
    df = seq_df(spark)
    assert win.head_per_group(df, ["g"], "i", 2).count() == 4
    got_tail = {(r.g, r.i) for r in win.tail_per_group(df, ["g"], "i", 1).collect()}
    assert got_tail == {("a", 4), ("b", 2)}
    got_nth = {(r.g, r.v) for r in win.nth_per_group(df, ["g"], "i", 2).collect()}
    assert got_nth == {("a", 1.0), ("b", 7.0)}


def test_drop_duplicates_keep_none(spark):
    df = spark.createDataFrame([(1, "x"), (1, "y"), (2, "z")], ["k", "v"])
    out = win.drop_duplicates(df, ["k"], "v", keep=False).collect()
    assert len(out) == 1 and out[0].k == 2


def test_differs_transitions(spark):
    df = spark.createDataFrame([("g", 0, "x"), ("g", 1, "x"), ("g", 2, "y"), ("g", 3, "y")], ["g", "i", "v"])
    w = win.group_window(["g"], "i")
    # reference differs = CMP_EQ vs previous, shifted-in region False
    got = [r.d for r in df.select(win.differs(F.col("v"), w).alias("d")).orderBy("i").collect()]
    assert got == [False, True, False, True]
    got = [r.t for r in df.select(win.transitions(F.col("v"), w).alias("t")).orderBy("i").collect()]
    assert got == [False, False, True, False]


def test_issorted(spark):
    df = spark.createDataFrame([(0, 1.0), (1, 2.0), (2, 1.5)], ["i", "v"])
    assert win.issorted(df, "v", "i") is False
    assert win.issorted(df.where(F.col("i") < 2), "v", "i") is True


def test_timewindow_sum(spark):
    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 5, 2.0), ("g", 6, 4.0), ("g", 20, 8.0)], ["g", "t", "v"]
    )
    out = df.select("t", win.timewindow_sum(F.col("v"), ["g"], "t", 5).alias("s")).orderBy("t")
    assert [r.s for r in out.collect()] == [1.0, 3.0, 6.0, 8.0]


def test_interp_extrap(spark):
    pts = spark.createDataFrame([(0.0, 0.0), (10.0, 100.0)], ["x", "y"])
    df = spark.createDataFrame([(5.0,), (-1.0,), (20.0,)], ["x"])
    out = {r.x: r.interp for r in win.interp_extrap(df, "x", pts, "x", "y").collect()}
    assert out[5.0] == 50.0
    assert out[-1.0] == 0.0  # clamped extrapolation (nearest bracket value)
    assert out[20.0] == 100.0


def test_interp_extrap_extrapolate_mode(spark):
    from pyspark.sql import functions as F

    from riptable_spark.operators import window as win

    curve = spark.createDataFrame([(0.0, 0.0), (10.0, 10.0), (20.0, 30.0)], ["xp", "fp"])
    pts = spark.createDataFrame([(-5.0,), (25.0,), (15.0,)], ["x"])
    out = {r.x: r.y for r in win.interp_extrap(pts, "x", curve, "xp", "fp", out_col="y", mode="extrapolate").collect()}
    assert out[15.0] == 20.0          # interior: interpolated
    assert out[25.0] == 40.0          # beyond high end: slope 2 extended
    assert out[-5.0] == -5.0          # before low end: slope 1 extended
    clip = {r.x: r.y for r in win.interp_extrap(pts, "x", curve, "xp", "fp", out_col="y", mode="clip").collect()}
    assert clip[25.0] == 30.0 and clip[-5.0] == 0.0


def test_rolling_guard_consistency(spark):
    """min/max/std/var share rolling_sum's full-window contract (move_*
    family, min_count=window); median/quantile/count are nan-variants per
    the reference docstrings ("rolling nan median") and fill partial
    windows."""
    from pyspark.sql import Window

    df = spark.createDataFrame([("g", i, float(i)) for i in range(4)], ["g", "i", "v"])
    w = Window.partitionBy("g").orderBy("i")
    out = df.select(
        "i",
        win.rolling_min(F.col("v"), w, 3).alias("mn"),
        win.rolling_max(F.col("v"), w, 3).alias("mx"),
        win.rolling_std(F.col("v"), w, 3).alias("sd"),
        win.rolling_var(F.col("v"), w, 3).alias("vr"),
        win.rolling_median(F.col("v"), w, 3).alias("md"),
        win.rolling_count(F.col("v"), w, 3).alias("ct"),
    ).orderBy("i").collect()
    for r in out[:2]:
        assert r.mn is None and r.mx is None and r.sd is None and r.vr is None
        assert r.md is not None and r.ct == r.i + 1
    assert out[2].mn == 0.0 and out[2].mx == 2.0 and out[3].mn == 1.0 and out[3].mx == 3.0


def test_move_argops_bottleneck_semantics(spark):
    """move_argmin/argmax: offset back from current (0 = current), ties →
    most recent; move_rank: sign-mean in (-1,1]; all full-window gated
    (bottleneck min_count=window via rt_fastarray.py:2688)."""
    from pyspark.sql import Window

    vals = [5.0, 3.0, 3.0, 7.0, 1.0]
    df = spark.createDataFrame([("g", i, v) for i, v in enumerate(vals)], ["g", "i", "v"])
    w = Window.partitionBy("g").orderBy("i")
    out = df.select(
        "i",
        win.move_argmin(F.col("v"), w, 3).alias("amin"),
        win.move_argmax(F.col("v"), w, 3).alias("amax"),
        win.move_rank(F.col("v"), w, 3).alias("mr"),
    ).orderBy("i").collect()
    assert [r.amin for r in out] == [None, None, 0, 1, 0]  # [5,3,3]→tie at i1,i2→most recent (0 back); [3,3,7]→3 at offset 1; [3,7,1]→1 current
    assert [r.amax for r in out] == [None, None, 2, 0, 1]
    assert [r.mr for r in out] == [None, None, -0.5, 1.0, -1.0]


def test_searchsorted_paths_agree(spark):
    """Broadcast-array path (functions.math.searchsorted_against) and
    union+window path (window.searchsorted_union) implement the same
    rt_numpy.py:701 contract, including 'leftplus' (beyond-last → 0)."""
    from riptable_spark.functions import math as fm

    bounds = spark.createDataFrame([(1.0,), (3.0,), (3.0,), (7.0,)], "b double")
    vals = spark.createDataFrame(
        [(0, 0.5), (1, 1.0), (2, 3.0), (3, 5.0), (4, 7.0), (5, 9.0)], ["i", "v"]
    )
    expected = {
        "left": [0, 0, 1, 3, 3, 4],
        "right": [0, 1, 3, 3, 4, 4],
        "leftplus": [0, 0, 1, 3, 3, 0],
    }
    for side, want in expected.items():
        a = fm.searchsorted_against(vals, F.col("v"), bounds, "b", side=side, out_col="idx")
        got_a = [r.idx for r in a.orderBy("i").collect()]
        b = win.searchsorted_union(vals, "v", bounds, "b", side=side, out_col="idx")
        got_b = [r.idx for r in b.orderBy("i").collect()]
        assert got_a == want, (side, got_a)
        assert got_b == want, (side, got_b)


def test_shift_ungrouped_boundary_exchange(spark):
    """shift/diff over the whole table via block windows + edge patch
    must agree with the naive global-window form, for lag and lead,
    including across block boundaries (block=4 forces many)."""
    from pyspark.sql import Window

    rows = [(i, float((i * 13) % 29)) for i in range(23)]
    df = spark.createDataFrame(rows, ["i", "v"])
    for n in (1, 3, -2):
        got = {
            r.i: r.sh
            for r in win.shift_ungrouped(df, {"sh": "v"}, n, ["i"], block=4).collect()
        }
        wglob = Window.orderBy("i")
        want = {
            r.i: r.sh
            for r in df.withColumn(
                "sh", F.lag("v", n).over(wglob) if n > 0 else F.lead("v", -n).over(wglob)
            ).collect()
        }
        assert got == want, n
    gd = {r.i: r.d for r in win.diff_ungrouped(df, {"d": "v"}, 1, ["i"], block=4).collect()}
    wd = {r.i: r.d for r in df.withColumn("d", F.col("v") - F.lag("v").over(Window.orderBy("i"))).collect()}
    assert gd == wd


def test_shift_ungrouped_no_single_partition_window(spark):
    """The DATA-carrying lag/lead window must be block-partitioned; the
    only ungrouped windows allowed are with_rowid's per-pid offset
    cumsums, which run over #shuffle-partitions rows (metadata-sized).
    Spark renders a partitioned window as
    'Window [exprs], [partition spec], [order spec]' — three lists."""
    df = spark.range(100).withColumn("v", F.col("id").cast("double"))
    out = win.shift_ungrouped(df, {"sh": "v"}, 1, ["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    lag_lines = [ln for ln in plan.splitlines() if "lag(" in ln or "lead(" in ln]
    assert lag_lines, "no lag/lead window found in plan"
    for ln in lag_lines:
        assert ln.count("], [") >= 2, f"lag window lost its partition spec: {ln}"
    # the tiny offset windows are over __cnt__ sums only — never over data
    for ln in plan.splitlines():
        ls = ln.strip(" +-:*")
        if ls.startswith("Window ") and ls.count("], [") < 2:
            assert "__cnt__" in ls, f"ungrouped data window found: {ln}"


def test_issorted_blocked(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(20)], ["i", "v"])
    assert win.issorted_blocked(df, "v", ["i"], block=4) is True
    df2 = spark.createDataFrame(
        [(0, 1.0), (1, 5.0), (2, 3.0), (3, 7.0)], ["i", "v"]
    )
    assert win.issorted_blocked(df2, "v", ["i"], block=2) is False

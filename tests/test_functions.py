"""Scalar function surface: math, strings, datetime, binning, text,
reshape, accum (SURVEY §2.8)."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from riptable_spark.functions import binning, datetime as dtf, math as m, strings as s
from riptable_spark.operators import accum, ema, reshape, text


def test_math_unary(spark):
    df = spark.createDataFrame([(4.0,), (-2.5,)], ["v"])
    out = df.select(
        m.abs_(F.col("v")).alias("a"),
        m.sqrt(F.abs(F.col("v"))).alias("sq"),
        m.trunc(F.col("v")).alias("t"),
        m.sign(F.col("v")).alias("sg"),
        m.clip(F.col("v"), 0, 3).alias("cl"),
    ).orderBy(F.col("v").desc()).collect()
    assert out[0].a == 4.0 and out[0].t == 4 and out[0].cl == 3.0
    assert out[1].a == 2.5 and out[1].t == -2 and out[1].sg == -1.0 and out[1].cl == 0.0


def test_math_predicates(spark):
    df = spark.createDataFrame([(1.0,), (float("inf"),), (float("nan"),)], ["v"])
    out = df.select(
        m.isfinite(F.col("v")).alias("fin"), m.isinf(F.col("v")).alias("inf")
    ).collect()
    got = [(r.fin, r.inf) for r in out]
    assert (True, False) in got and (False, True) in got


def test_nanmin2(spark):
    df = spark.createDataFrame([(1.0, None), (None, None), (3.0, 2.0)], "a double, b double")
    got = [r.o for r in df.select(m.nanmin2(F.col("a"), F.col("b")).alias("o")).collect()]
    assert got == [1.0, None, 2.0]


def test_strings(spark):
    df = spark.createDataFrame([("Hello World",)], ["t"])
    r = df.select(
        s.upper(F.col("t")).alias("u"),
        s.strlen(F.col("t")).alias("n"),
        s.contains(F.col("t"), "World").alias("c"),
        s.index(F.col("t"), "World").alias("i"),
        s.substr(F.col("t"), 6, 5).alias("sub"),
        s.char(F.col("t"), 0).alias("ch"),
        s.reverse(F.col("t")).alias("rev"),
        s.regex_replace(F.col("t"), "o", "0").alias("rr"),
        s.extract(F.col("t"), r"(\w+) (\w+)", 2).alias("ex"),
    ).collect()[0]
    assert r.u == "HELLO WORLD" and r.n == 11 and r.c and r.i == 6
    assert r.sub == "World" and r.ch == "H" and r.rev == "dlroW olleH"
    assert r.rr == "Hell0 W0rld" and r.ex == "World"


def test_datetime_accessors(spark):
    ts = dt.datetime(2024, 3, 9, 14, 30, 45, 123456)  # a Saturday
    df = spark.createDataFrame([(ts,)], ["ts"])
    r = df.select(
        dtf.year(F.col("ts")).alias("y"),
        dtf.day_of_week(F.col("ts")).alias("dow"),
        dtf.is_weekend(F.col("ts")).alias("we"),
        dtf.is_leapyear(F.col("ts")).alias("ly"),
        dtf.microsecond(F.col("ts")).alias("us"),
        dtf.time_since_midnight(F.col("ts")).alias("tsm"),
        dtf.monthyear(F.col("ts")).alias("my"),
    ).collect()[0]
    assert r.y == 2024 and r.dow == 5 and r.we and r.ly
    assert r.us == 123456
    assert r.tsm == ((14 * 3600 + 30 * 60 + 45) * 1_000_000 + 123456) * 1000
    assert r.my == "Mar2024"


def test_tz_roundtrip(spark):
    df = spark.createDataFrame([(dt.datetime(2024, 7, 1, 16, 0, 0),)], ["ts"])
    r = df.select(dtf.to_tz(F.col("ts"), "America/New_York").alias("nyc")).collect()[0]
    assert r.nyc == dt.datetime(2024, 7, 1, 12, 0, 0)  # EDT = UTC-4


def test_cut_int_bins_and_edges(spark):
    df = spark.createDataFrame([(float(v),) for v in [5, 15, 25, 35, 95, -1]], ["v"])
    got = [r.b for r in df.select(binning.cut(F.col("v"), 10, 0, 100).alias("b")).collect()]
    assert got == [1, 2, 3, 4, 10, 0]
    got2 = [r.b for r in df.select(binning.cut(F.col("v"), [0, 10, 50, 100]).alias("b")).collect()]
    assert got2 == [1, 2, 2, 2, 3, 0]


def test_qcut(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], ["v"])
    out = binning.qcut(df, "v", 4)
    counts = {r.v_bin: r.n for r in out.groupBy("v_bin").agg(F.count("*").alias("n")).collect()}
    assert counts == {1: 25, 2: 25, 3: 25, 4: 25}


def test_one_hot_encode(spark):
    df = spark.createDataFrame([("a",), ("b",), ("a",)], ["c"])
    out = reshape.one_hot_encode(df, "c").collect()
    assert {tuple(r) for r in out} == {("a", 1, 0), ("b", 0, 1)}


def test_pivot_strict_raises_on_dups(spark):
    df = spark.createDataFrame([(1, "x", 5.0), (1, "x", 6.0)], ["k", "c", "v"])
    with pytest.raises(ValueError, match="duplicate"):
        reshape.pivot_strict(df, "k", "c", "v")


def test_melt_roundtrip(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], ["id", "a", "b"])
    out = reshape.melt(df, ["id"], ["a", "b"]).collect()
    assert {(r.variable, r.value) for r in out} == {("a", 2.0), ("b", 3.0)}


def test_accum2_margins(spark):
    df = spark.createDataFrame(
        [("r1", "c1", 1.0), ("r1", "c2", 2.0), ("r2", "c1", 4.0)], ["r", "c", "v"]
    )
    out = accum.accum2_with_footer(df, "r", "c", F.sum, "v", pivot_values=["c1", "c2"])
    got = {r.r: (r.c1, r.c2, r.Total) for r in out.collect()}
    assert got["r1"] == (1.0, 2.0, 3.0)
    assert got["r2"] == (4.0, None, 4.0)
    assert got["Total"] == (5.0, 2.0, 7.0)


def test_accum_ratiop_percentages(spark):
    df = spark.createDataFrame([("r1", "c1", 25.0), ("r2", "c1", 75.0)], ["r", "c", "v"])
    got = {r.r: r.c1 for r in accum.accum_ratiop(df, "r", "c", F.col("v"), ["c1"]).collect()}
    assert got == {"r1": 25.0, "r2": 75.0}


def test_text_quality_monotonic(spark):
    good = "The quick brown fox jumps over the lazy dog and then runs to the forest in the morning light."
    bad = "@@@@ ???? !!!! 1234 5678 $$$$"
    df = spark.createDataFrame([(0, good), (1, bad)], ["id", "t"])
    got = {r.id: r.q for r in df.select("id", text.quality_score(F.col("t")).alias("q")).collect()}
    assert got[0] > got[1]


def test_lang_id_markers(spark):
    rows = [
        (0, "the cat and the dog went to the house of friends"),
        (1, "der hund und die katze sind nicht da"),
        (2, "xyz qqq zzz"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r.id: r.l for r in df.select("id", text.lang_id(F.col("t")).alias("l")).collect()}
    assert got == {0: "en", 1: "de", 2: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([("one two  three",), ("",), ("a-b c3",)], ["t"])
    got = [r.n for r in df.select(text.token_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 0, 2]
    got_bpe = [r.n for r in df.select(text.bpe_ish_token_count(F.col("t")).alias("n")).collect()]
    assert got_bpe == [3, 0, 5]  # a,-,b,c,3


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",), ("other",)], ["t"])
    got = [r.f for r in df.select(text.fingerprint(F.col("t")).alias("f")).collect()]
    assert got[0] == got[1] != got[2]


def test_ema_weighted_formula(spark):
    df = spark.createDataFrame([("g", 0, 10.0), ("g", 1, 20.0), ("g", 2, 30.0)], ["g", "i", "v"])
    out = ema.ema_weighted(df, ["g"], "v", decay_rate=0.5, order_col="i")
    got = [r.ema for r in out.orderBy("i").collect()]
    assert got[0] == 10.0
    assert math.isclose(got[1], 15.0)
    assert math.isclose(got[2], 22.5)


def test_ema_normal_formula(spark):
    # equal 1-unit gaps, rate=ln(2) → w=0.5 each step
    df = spark.createDataFrame([("g", 0.0, 10.0), ("g", 1.0, 20.0), ("g", 2.0, 30.0)], ["g", "t", "v"])
    out = ema.ema_normal(df, ["g"], "v", "t", rate=math.log(2))
    got = [r.ema for r in out.orderBy("t").collect()]
    assert got[0] == 10.0
    assert math.isclose(got[1], 15.0)
    assert math.isclose(got[2], 22.5)


def test_ema_weighted_reference_convention(spark):
    """decay_rate weights the OLD value (rt_groupbyops.py ema_weighted:
    LastEma = x*(1-decay_rate) + LastEma*decay_rate)."""
    df = spark.createDataFrame([("g", 0, 10.0), ("g", 1, 20.0)], ["g", "i", "v"])
    out = {r.i: r.ema for r in ema.ema_weighted(df, ["g"], "v", decay_rate=0.8, order_col="i").collect()}
    # last = 20*0.2 + 10*0.8 = 12.0
    assert out[0] == 10.0 and math.isclose(out[1], 12.0)


def test_ema_weighted_edge_rates(spark):
    df = spark.createDataFrame([("g", 0, 10.0), ("g", 1, 20.0)], ["g", "i", "v"])
    # decay_rate=0 → ema == x
    out0 = {r.i: r.ema for r in ema.ema_weighted(df, ["g"], "v", decay_rate=0.0, order_col="i").collect()}
    assert out0 == {0: 10.0, 1: 20.0}
    # decay_rate=1 → ema pinned at the seed
    out1 = {r.i: r.ema for r in ema.ema_weighted(df, ["g"], "v", decay_rate=1.0, order_col="i").collect()}
    assert out1[0] == 10.0 and math.isclose(out1[1], 10.0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ema.ema_weighted(df, ["g"], "v", decay_rate=1.5, order_col="i")


def test_ema_scan_rejects_unordered_time(spark):
    """The Arrow scan validates that the time column is nondecreasing
    under order_col instead of silently mis-evaluating."""
    from py4j.protocol import Py4JJavaError
    import pytest as _pytest

    df = spark.createDataFrame([("g", 0, 5.0, 1.0), ("g", 1, 2.0, 2.0)], ["g", "i", "t", "v"])
    with _pytest.raises(Exception) as ei:
        ema.ema_decay(df, ["g"], "v", "t", 0.1, order_col="i", method="scan").collect()
    assert "nondecreasing" in str(ei.value)


def test_span_arithmetic_rules(spark):
    """rt_datetime.py:2311-2346: Date−Date→DateSpan, Date±DateSpan→Date,
    ts−ts→TimeSpan (DayTimeInterval), ts±TimeSpan→ts, span algebra."""
    from riptable_spark.functions import spans as sp

    df = spark.sql(
        "select timestamp'2024-01-02 03:00:00' a, timestamp'2024-01-01 00:30:00' b,"
        " date'2024-03-05' d1, date'2024-02-28' d2"
    )
    r = df.select(
        sp.span_micros(sp.ts_diff_span(F.col("a"), F.col("b"))).alias("us"),
        sp.span_seconds(sp.ts_diff_span(F.col("a"), F.col("b"))).alias("s"),
        sp.span_days(sp.ts_diff_span(F.col("a"), F.col("b"))).alias("d"),
        sp.ts_add_span(F.col("b"), sp.ts_diff_span(F.col("a"), F.col("b"))).alias("rt"),
        sp.ts_sub_span(F.col("a"), sp.ts_diff_span(F.col("a"), F.col("b"))).alias("rb"),
        sp.date_diff_span(F.col("d1"), F.col("d2")).alias("ds"),
        sp.date_add_span(F.col("d2"), sp.date_diff_span(F.col("d1"), F.col("d2"))).alias("drt"),
        sp.span_seconds(sp.span_scale(sp.ts_diff_span(F.col("a"), F.col("b")), 2)).alias("s2"),
        sp.span_seconds(
            sp.span_add(sp.ts_diff_span(F.col("a"), F.col("b")), sp.timespan(hours=1))
        ).alias("sp1h"),
    ).first()
    total = 26 * 3600 + 30 * 60  # 95400 s
    assert r.us == total * 1_000_000 and r.s == total and r.d == 1
    assert str(r.rt) == "2024-01-02 03:00:00" and str(r.rb) == "2024-01-01 00:30:00"
    assert r.ds == 6 and str(r.drt) == "2024-03-05"
    assert r.s2 == 2 * total and r.sp1h == total + 3600


def test_index_any_of_reference_example(spark):
    """rt_str.py:628 doctest: FAString(['this  ','that ','test'])
    .index_any_of('ia') == [2, 2, -1]."""
    from riptable_spark.functions import strings as st

    df = spark.createDataFrame([("this  ",), ("that ",), ("test",)], "s string")
    got = [r.i for r in df.select(st.index_any_of(F.col("s"), "ia").alias("i")).collect()]
    assert got == [2, 2, -1]
    got0 = [r.i for r in df.select(st.index_any_of(F.col("s"), "").alias("i")).collect()]
    assert got0 == [0, 0, 0]


def test_apply_unique_matches_direct(spark):
    from riptable_spark.functions import strings as st

    df = spark.createDataFrame([("aXa",), ("bYb",), ("aXa",), ("aXa",)], "s string")
    fn = lambda c: F.upper(F.reverse(c))
    direct = [r.o for r in df.select(fn(F.col("s")).alias("o")).collect()]
    via = [r.o for r in st.apply_unique(df, "s", fn, "o").select("o").collect()]
    assert sorted(direct) == sorted(via)


def test_polyfit_matches_numpy(spark):
    import numpy as np
    from riptable_spark.functions import stats as rs

    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.5])
    ys = 2.0 - 1.5 * xs + 0.25 * xs**2 + np.array([0.1, -0.05, 0.02, 0.0, -0.1, 0.07, 0.01])
    df = spark.createDataFrame([(float(a), float(b)) for a, b in zip(xs, ys)], ["x", "y"])
    got = rs.polyfit(df, "x", "y", d=2)
    want = np.polynomial.polynomial.polyfit(xs, ys, 2)
    assert np.allclose(got, want, rtol=1e-8)


def test_linear_spline_matches_reference_formula(spark):
    import numpy as np
    from riptable_spark.functions import stats as rs

    rng = np.random.RandomState(7)
    xs = rng.uniform(0, 10, 200)
    ys = np.where(xs < 5, xs, 5 + 3 * (xs - 5)) + rng.normal(0, 0.01, 200)
    df = spark.createDataFrame([(float(a), float(b)) for a, b in zip(xs, ys)], ["x", "y"])
    coeff, yhat = rs.linear_spline(df, "x", "y", knots=[5.0])
    # reference formula (rt_stats.py:154): lstsq on [1, x, max(x-5,0)]
    A = np.column_stack([np.ones_like(xs), xs, np.maximum(xs - 5.0, 0.0)])
    want = np.linalg.lstsq(A, ys, rcond=None)[0]
    assert np.allclose(coeff, want, rtol=1e-6)
    fitted = df.select(yhat.alias("f")).count()
    assert fitted == 200


def test_is_dst_hemisphere_correct(spark):
    """is_dst with JVM tzdb: NYC summer/winter, Sydney (southern
    hemisphere: DST in January), UTC (no DST ever)."""
    df = spark.createDataFrame(
        [
            ("2023-07-15 12:00:00",),  # NYC: DST, Sydney: standard
            ("2023-01-15 12:00:00",),  # NYC: standard, Sydney: DST
        ],
        "s string",
    ).select(F.to_timestamp("s").alias("ts"))
    rows = df.select(
        dtf.is_dst(F.col("ts"), "America/New_York").alias("nyc"),
        dtf.is_dst(F.col("ts"), "Australia/Sydney").alias("syd"),
        dtf.is_dst(F.col("ts"), "UTC").alias("utc"),
        dtf.tz_offset_seconds(F.col("ts"), "America/New_York").alias("off"),
    ).collect()
    jul, jan = rows
    assert jul.nyc is True and jul.syd is False and jul.utc is False
    assert jan.nyc is False and jan.syd is True and jan.utc is False
    assert jul.off == -4 * 3600 and jan.off == -5 * 3600


def test_class_error_reference_formula(spark):
    """rt_mlutils.py:108: sum(|round(x)-round(y)|)/n on a hand-checked
    frame: preds [0.4,1.6,2.2] vs actual [0,1,3] → |0-0|+|2-1|+|2-3| = 2/3."""
    from riptable_spark.functions import stats as st

    df = spark.createDataFrame([(0.4, 0.0), (1.6, 1.0), (2.2, 3.0)], ["p", "a"])
    assert abs(st.class_error(df, "p", "a") - 2.0 / 3.0) < 1e-12


def test_str_replace_and_sub2ind_parity(spark):
    """rt_utils.py:1055 str_replace (dict remap, missing default) and
    rt_misc.py:62 sub2ind (np.ravel_multi_index C-order)."""
    import numpy as np

    from riptable_spark.functions import math as fm
    from riptable_spark.functions import strings as fs

    df = spark.createDataFrame([("a",), ("b",), ("zz",)], "s string")
    got = [r.o for r in df.select(fs.str_replace(F.col("s"), ["a", "b"], ["A", "B"], missing="?").alias("o")).collect()]
    assert got == ["A", "B", "?"]

    rows = [(1, 2, 3), (0, 0, 0), (2, 4, 5)]
    df2 = spark.createDataFrame(rows, "i long, j long, k long")
    got2 = [
        r.idx for r in df2.select(
            fm.sub2ind([3, 5, 6], [F.col("i"), F.col("j"), F.col("k")]).alias("idx")
        ).collect()
    ]
    want = [int(np.ravel_multi_index(t, (3, 5, 6))) for t in rows]
    assert got2 == want

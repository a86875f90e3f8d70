"""Tests for batch-3 operators: rankdata, searchsorted, shingle
fingerprint, resample, strict pivot values, intersect/except, transitions
aggregation, LSH buckets determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from riptable_spark.functions import datetime as dtf, math as m
from riptable_spark.operators import reshape, similarity, text, window as win


def test_rankdata_average_and_min(spark):
    df = spark.createDataFrame([(10.0,), (20.0,), (20.0,), (30.0,)], ["v"])
    avg = {r.v: r.rank for r in win.rankdata(df, "v").collect()}
    assert avg == {10.0: 1.0, 20.0: 2.5, 30.0: 4.0}
    mn = {r.v: r.rank for r in win.rankdata(df, "v", method="min").collect()}
    assert mn == {10.0: 1, 20.0: 2, 30.0: 4}


def test_rankdata_no_global_sort_of_rows(spark):
    """The full table must not pass through a single-partition sort —
    only the distinct-value set does."""
    df = spark.range(1000).select((F.col("id") % 7).cast("double").alias("v"))
    plan = win.rankdata(df, "v")._jdf.queryExecution().executedPlan().toString()
    # the join back must be a broadcast, not a shuffle of the base table
    assert "BroadcastHashJoin" in plan


def test_searchsorted_sides(spark):
    df = spark.createDataFrame([(0.0,), (5.0,), (7.0,), (200.0,)], ["v"])
    got = df.select(
        m.searchsorted(F.col("v"), [5.0, 25.0, 75.0, 150.0]).alias("r"),
        m.searchsorted(F.col("v"), [5.0, 25.0, 75.0, 150.0], side="left").alias("l"),
    ).collect()
    assert [(r.r, r.l) for r in got] == [(0, 0), (1, 0), (1, 1), (4, 4)]


def test_shingle_fingerprint_matches_python(spark):
    import hashlib

    s = "hello world fingerprint"
    expected = min(
        hashlib.md5(s[i : i + 8].encode()).hexdigest() for i in range(len(s) - 7)
    )
    got = spark.createDataFrame([(s,)], ["t"]).select(
        text.shingle_fingerprint(F.col("t"), 8).alias("fp")
    ).first().fp
    assert got == expected


def test_shingle_fingerprint_short_text(spark):
    import hashlib

    got = spark.createDataFrame([("abc",)], ["t"]).select(
        text.shingle_fingerprint(F.col("t"), 8).alias("fp")
    ).first().fp
    assert got == hashlib.md5(b"abc").hexdigest()


def test_resample_floor(spark):
    df = spark.createDataFrame([("2024-01-01 10:07:31",)], ["s"]).select(
        F.col("s").cast("timestamp").alias("ts")
    )
    got = df.select(F.unix_seconds(dtf.resample_floor(F.col("ts"), 900)).alias("b")).first().b
    import calendar

    base = calendar.timegm((2024, 1, 1, 10, 0, 0))
    assert got == base  # 10:07:31 floors to 10:00:00 on a 15-min grid


def test_pivot_strict_with_values_and_dup_error(spark):
    df = spark.createDataFrame([("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], ["l", "c", "v"])
    out = reshape.pivot_strict(df, "l", "c", "v", pivot_values=["x", "y"])
    got = {r.l: (r.x, r.y) for r in out.collect()}
    assert got == {"a": (1, 2), "b": (3, None)}
    with pytest.raises(ValueError, match="duplicate"):
        reshape.pivot_strict(
            spark.createDataFrame([("a", "x", 1), ("a", "x", 2)], ["l", "c", "v"]),
            "l", "c", "v",
        )


def test_transitions_counts_runs(spark):
    rows = [(1, i, t) for i, t in enumerate(["a", "a", "b", "b", "a"])]
    df = spark.createDataFrame(rows, ["g", "i", "t"])
    w = Window.partitionBy("g").orderBy("i")
    n = df.select(win.run_starts(F.col("t"), w).alias("f")).agg(F.sum("f")).first()[0]
    assert n == 3  # runs: a, b, a


def test_lsh_bucket_deterministic(spark):
    planes = similarity._hyperplanes(4, 6)
    assert planes == similarity._hyperplanes(4, 6)
    df = spark.createDataFrame([(1, [1.0, 0.0, -1.0, 0.5])], ["id", "v"])
    b1 = df.select(similarity.lsh_bucket(F.col("v"), planes).alias("b")).first().b
    b2 = df.select(similarity.lsh_bucket(F.col("v"), planes).alias("b")).first().b
    assert b1 == b2 and 0 <= b1 < (1 << 6)


def test_interp_expr_endpoints(spark):
    """q74's interp: exact at knots, linear between, clamped outside."""
    from riptable_spark.queries3 import q74  # noqa: F401 — the pattern under test

    df = spark.createDataFrame([(0.0,), (10.0,), (30.0,), (-5.0,), (500.0,)], ["value"])
    v = F.col("value")
    xp, fp = [0.0, 10.0, 50.0, 100.0], [0.0, 5.0, 20.0, 50.0]
    expr = F.when(v <= xp[0], F.lit(fp[0]))
    for i in range(1, len(xp)):
        slope = (fp[i] - fp[i - 1]) / (xp[i] - xp[i - 1])
        expr = expr.when(v < xp[i], fp[i - 1] + (v - xp[i - 1]) * slope)
    expr = expr.otherwise(F.lit(fp[-1]))
    got = [r.y for r in df.select(expr.alias("y")).collect()]
    assert got == [0.0, 5.0, 12.5, 0.0, 50.0]


def test_ema_expr_matches_scan(spark):
    """The codegen closed form and the Arrow scan are the same operator —
    results must agree to float tolerance on all three EMA kinds."""
    import math

    from riptable_spark.operators import ema

    rows = [(i % 3, float(i), float((i * 7) % 11) - 5.0) for i in range(60)]
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    for kind, kw in [
        ("decay", dict(timecol="t", rate=0.3)),
        ("normal", dict(timecol="t", rate=0.3)),
    ]:
        fn = getattr(ema, f"ema_{kind}")
        a = {r.t: r.ema for r in fn(df, ["g"], "x", method="expr", **kw).collect()}
        b = {r.t: r.ema for r in fn(df, ["g"], "x", method="scan", **kw).collect()}
        assert all(math.isclose(a[k], b[k], rel_tol=1e-9, abs_tol=1e-9) for k in a), kind
    a = {r.t: r.ema for r in ema.ema_weighted(df, ["g"], "x", 0.2, "t", method="expr").collect()}
    b = {r.t: r.ema for r in ema.ema_weighted(df, ["g"], "x", 0.2, "t", method="scan").collect()}
    assert all(math.isclose(a[k], b[k], rel_tol=1e-9, abs_tol=1e-9) for k in a)


def test_ema_blocked_matches_scan_giant_group(spark):
    """VERDICT r2 #5: the blocked scan (giant groups split on coarse time
    buckets, seed carried across blocks) must equal the one-batch scan and
    the codegen path bit-for-bit to float tolerance — including blocks cut
    mid-group, singleton blocks, and a single-key frame where every row
    lands in one applyInPandas group under the plain scan."""
    import math

    from riptable_spark.operators import ema

    # one giant group + a second group, irregular time gaps (some blocks
    # empty, some with one row, some with many)
    rows = []
    t = 0.0
    for i in range(3000):
        t += ((i * 13) % 7) * 0.5 + 0.1
        rows.append((0, t, float((i * 7) % 11) - 5.0))
        if i % 5 == 0:
            rows.append((1, t, float(i % 4)))
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    for kind in ("decay", "normal"):
        fn = getattr(ema, f"ema_{kind}")
        a = {(r.g, r.t): r.ema for r in fn(df, ["g"], "x", "t", 0.05, method="scan").collect()}
        b = {(r.g, r.t): r.ema for r in fn(df, ["g"], "x", "t", 0.05, method="blocked", block_seconds=50.0).collect()}
        assert set(a) == set(b)
        assert all(math.isclose(a[k], b[k], rel_tol=1e-9, abs_tol=1e-9) for k in a), kind
        # tiny blocks (every block a handful of rows) still compose
        c = {(r.g, r.t): r.ema for r in fn(df, ["g"], "x", "t", 0.05, method="blocked", block_seconds=3.0).collect()}
        assert all(math.isclose(a[k], c[k], rel_tol=1e-9, abs_tol=1e-9) for k in a), kind


def test_ema_blocked_requires_block_seconds(spark):
    import pytest as _pytest

    from riptable_spark.operators import ema

    df = spark.createDataFrame([(0, 1.0, 1.0)], ["g", "t", "x"])
    with _pytest.raises(ValueError):
        ema.ema_decay(df, ["g"], "x", "t", 0.1, method="blocked")


def test_ema_auto_falls_back_on_wide_span(spark):
    """A group whose exponent span exceeds the overflow guard must route
    to the scan path and still produce finite results."""
    from riptable_spark.operators import ema

    rows = [(0, float(i) * 100.0, 1.0) for i in range(20)]  # span 1900·rate=9.5k
    df = spark.createDataFrame(rows, ["g", "t", "x"])
    out = ema.ema_decay(df, ["g"], "x", "t", rate=5.0, method="auto").collect()
    assert all(abs(r.ema) < 1e308 and r.ema == r.ema for r in out)


def test_salted_join_matches_plain(spark):
    from riptable_spark.operators import skew

    left = spark.createDataFrame([(1, "a")] * 50 + [(2, "b")] * 3, ["k", "v"])
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "w"])
    plain = left.join(right, "k").groupBy("k").count().collect()
    salted = skew.salted_join(left, right, ["k"], salt=4).groupBy("k").count().collect()
    assert {r.k: r["count"] for r in salted} == {r.k: r["count"] for r in plain}


def test_salted_agg_matches_plain(spark):
    from pyspark.sql import functions as F

    from riptable_spark.operators import skew

    df = spark.createDataFrame([(i % 2, float(i)) for i in range(100)], ["k", "x"])
    out = {
        r.k: (r.n, r.total, r.mx)
        for r in skew.salted_agg(
            df, ["k"],
            {"n": ("sum", F.count(F.lit(1))), "total": ("sum", F.sum("x")), "mx": ("max", F.max("x"))},
            salt=4,
        ).collect()
    }
    exp = {
        r.k: (r.n, r.total, r.mx)
        for r in df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("total"), F.max("x").alias("mx")
        ).collect()
    }
    assert out == exp


# --- regression tests for second review round -------------------------
def test_cut_int_bins_bin0_contract(spark):
    from riptable_spark.functions import binning

    df = spark.createDataFrame([(150.0,), (None,), (-5.0,), (50.0,), (100.0,)], ["v"])
    got = [r.b for r in df.select(binning.cut(F.col("v"), 10, 0.0, 100.0).alias("b")).collect()]
    assert got == [0, 0, 0, 5, 10]  # above-hi→0, NULL→0, below-lo→0, 50∈(40,50], hi→10


def test_qcut_skewed_duplicate_edges(spark):
    from riptable_spark.functions import binning

    rows = [(1.0,)] * 97 + [(2.0,), (3.0,), (4.0,)]
    df = spark.createDataFrame(rows, ["v"])
    out = binning.qcut(df, "v", 4)
    bins = {r.v: r.v_bin for r in out.distinct().collect()}
    assert bins[1.0] == 1            # the dominant tied value is bin 1, not the last bin
    assert all(b > 0 for b in bins.values())


def test_nanmax2_prefers_real_over_nan(spark):
    from riptable_spark.functions import math as m

    df = spark.createDataFrame([(float("nan"), 5.0), (None, 3.0), (2.0, 7.0)], ["a", "b"])
    got = [(r.mx, r.mn) for r in df.select(
        m.nanmax2(F.col("a"), F.col("b")).alias("mx"),
        m.nanmin2(F.col("a"), F.col("b")).alias("mn"),
    ).collect()]
    assert got == [(5.0, 5.0), (3.0, 3.0), (7.0, 2.0)]


def test_replacena_skips_incompatible_columns(spark):
    from riptable_spark.functions.nullsafe import replacena

    df = spark.createDataFrame(
        [(1, None, None, "x"), (2, 5.0, "2024-01-01 00:00:00", None)],
        "id int, v double, s string, t string",
    ).withColumn("ts", F.col("s").cast("timestamp")).drop("s")
    out = replacena(df, 0).collect()  # numeric fill: must not touch ts/t, must fill v
    vals = {r.id: (r.v, r.t) for r in out}
    assert vals[1] == (0.0, "x")        # v filled; string col untouched
    assert vals[2][1] is None           # string NULL not filled by numeric value
    assert replacena(df, 0, columns=[]).collect()  # explicit empty list = no-op, no raise


def test_interp_math_formula(spark):
    from riptable_spark.functions import math as m

    df = spark.createDataFrame([(5.0,)], ["x"])
    got = df.select(
        m.interp(F.col("x"), F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(100.0)).alias("y")
    ).first().y
    assert got == 50.0


def test_with_rowid_deterministic_dense(spark):
    from riptable_spark.sources.io import with_rowid

    df = spark.range(0, 5000).select(F.col("id").alias("k")).orderBy(F.rand(11))
    out = {r["k"]: r["__rowid__"] for r in with_rowid(df, "k").collect()}
    assert all(out[k] == k for k in range(5000))


def test_ema_weighted_blocked_matches_scan(spark):
    """ROUND3 backlog: ema_weighted's giant-group path. The fixed-weight
    recurrence is the time-decay recurrence on t=row_number with
    rate=−ln(decay_rate), so the blocked machinery applies unchanged —
    must match the plain scan on a single giant group (the exact case
    the blocked path exists for), at two block widths, plus decay_rate
    edge values."""
    import math

    from riptable_spark.operators import ema

    rows = [(0, i, float((i * 7) % 11) - 5.0) for i in range(5000)]
    rows += [(1, i, float(i % 4)) for i in range(700)]
    df = spark.createDataFrame(rows, ["g", "i", "x"])
    for d in (0.9, 0.5, 0.05):
        a = {(r.g, r.i): r.ema for r in ema.ema_weighted(df, ["g"], "x", d, "i", method="scan").collect()}
        for br in (512, 37):
            b = {
                (r.g, r.i): r.ema
                for r in ema.ema_weighted(df, ["g"], "x", d, "i", method="blocked", block_rows=br).collect()
            }
            assert set(a) == set(b)
            assert all(math.isclose(a[k], b[k], rel_tol=1e-9, abs_tol=1e-9) for k in a), (d, br)
    # decay_rate=1: every row equals the group's first value
    one = ema.ema_weighted(df, ["g"], "x", 1.0, "i", method="blocked", block_rows=100)
    got = {(r.g, r.i): r.ema for r in one.collect()}
    assert all(v == got[(k[0], 0)] for k, v in got.items())

"""GroupByOps reduce surface + nullsafe semantics (SURVEY §2.4, §1.2).

Mirrors the reference's parameterized groupby sweep style
(riptable/tests/groupby_unit_test_parameters.py): spark result vs a
pandas/numpy oracle over generated keys×values."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from riptable_spark.functions import nullsafe
from riptable_spark.operators import groupby as gb


@pytest.fixture(scope="module")
def gdata(spark):
    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {
            "k1": rng.integers(0, 5, n),
            "k2": rng.choice(["x", "y", "z"], n),
            "v1": rng.normal(10, 5, n),
            "v2": rng.integers(0, 100, n).astype("float64"),
        }
    )
    pdf.loc[rng.choice(n, 50, replace=False), "v1"] = np.nan
    return pdf, spark.createDataFrame(pdf)


@pytest.mark.parametrize("fn,pdagg", [
    ("sum", "sum"), ("mean", "mean"), ("min", "min"), ("max", "max"),
    ("var", "var"), ("std", "std"), ("median", "median"),
])
def test_nan_aggs_match_pandas(gdata, fn, pdagg):
    """nan* variants = pandas default (NaN-skipping) semantics."""
    pdf, df = gdata
    sfn = getattr(gb, "nan" + fn if fn in ("sum", "mean", "min", "max", "var", "std") else fn)
    got = {
        (r.k1, r.k2): r.out
        for r in df.groupBy("k1", "k2").agg(sfn(F.col("v1")).alias("out")).collect()
    }
    exp = pdf.groupby(["k1", "k2"])["v1"].agg(pdagg)
    for key, val in exp.items():
        assert math.isclose(got[key], val, rel_tol=1e-9), (fn, key)


def test_strict_sum_propagates_invalid(gdata):
    pdf, df = gdata
    got = {
        (r.k1, r.k2): r.out
        for r in df.groupBy("k1", "k2").agg(gb.strict(F.sum, F.col("v1")).alias("out")).collect()
    }
    has_nan = pdf.groupby(["k1", "k2"])["v1"].agg(lambda s: s.isna().any())
    sums = pdf.groupby(["k1", "k2"])["v1"].sum()
    for key in sums.index:
        if has_nan[key]:
            assert got[key] is None, key
        else:
            assert math.isclose(got[key], sums[key], rel_tol=1e-9), key


def test_quantile_interpolation_matches_numpy(gdata):
    pdf, df = gdata
    got = {
        r.k1: r.q
        for r in df.groupBy("k1").agg(gb.quantile(F.col("v2"), 0.37).alias("q")).collect()
    }
    for k, grp in pdf.groupby("k1"):
        assert math.isclose(got[k], np.quantile(grp["v2"], 0.37), rel_tol=1e-12)


def test_sem_matches_scipy_formula(gdata):
    pdf, df = gdata
    got = {r.k1: r.s for r in df.groupBy("k1").agg(gb.sem(F.col("v2")).alias("s")).collect()}
    for k, grp in pdf.groupby("k1"):
        expected = grp["v2"].std(ddof=1) / math.sqrt(len(grp))
        assert math.isclose(got[k], expected, rel_tol=1e-9)


def test_count_uniques(gdata):
    pdf, df = gdata
    got = {r.k1: r.n for r in df.groupBy("k1").agg(gb.count_uniques(F.col("k2")).alias("n")).collect()}
    for k, grp in pdf.groupby("k1"):
        assert got[k] == grp["k2"].nunique()


def test_agg_dict_multiset_flattening(gdata):
    _, df = gdata
    out = gb.agg_dict(df, ["k1"], {"v1": ["mean", "max"], "v2": ["sum"]})
    assert set(out.columns) == {"k1", "v1_mean", "v1_max", "v2_sum"}


def test_fused_filter(gdata):
    """Filter fused into the aggregation (bin-0 trick,
    rt_grouping.py:3319-3327) equals filtering first."""
    pdf, df = gdata
    flt = F.col("v2") > 50
    fused = {
        r.k1: r.s for r in df.groupBy("k1").agg(gb.nansum(F.col("v2"), flt).alias("s")).collect()
    }
    pre = {
        r.k1: r.s
        for r in df.where(flt).groupBy("k1").agg(gb.nansum(F.col("v2")).alias("s")).collect()
    }
    assert fused == pre


def test_null_result_distinct_keys(gdata):
    pdf, df = gdata
    assert gb.null_result(df, ["k1", "k2"]).count() == pdf.groupby(["k1", "k2"]).ngroups


def test_trimbr(spark):
    vals = list(range(1, 101))  # 1..100
    df = spark.createDataFrame([("g", float(v)) for v in vals], ["g", "v"])
    out = gb.trimbr(df, ["g"], "v", 0.1, 0.9).collect()
    # percentile_cont(0.1)=10.9, (0.9)=90.1 → keep 11..90 → mean 50.5
    assert len(out) == 1 and math.isclose(out[0].trimbr, 50.5)


# ------------------------------------------------------------ nullsafe
def test_sentinel_to_null(spark):
    df = spark.createDataFrame(
        [(1, -(2**31), "", 1.5), (2, 7, "ok", float("nan"))],
        "id long, i int, s string, f double",
    )
    out = nullsafe.sentinel_to_null(df).orderBy("id").collect()
    assert out[0].i is None and out[0].s is None and out[0].f == 1.5
    assert out[1].i == 7 and out[1].s == "ok" and out[1].f is None


def test_isna_fillna(spark):
    df = spark.createDataFrame([(1, None), (2, 5.0), (3, float("nan"))], "id long, v double")
    out = df.select("id", nullsafe.isna(F.col("v")).alias("na"), nullsafe.fillna(F.col("v"), 0.0).alias("f")).orderBy("id").collect()
    assert [r.na for r in out] == [True, False, True]
    assert [r.f for r in out] == [0.0, 5.0, 0.0]


def test_isnanorzero(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (float("nan"),)], ["v"])
    got = [r.z for r in df.select(nullsafe.isnanorzero(F.col("v")).alias("z")).collect()]
    assert got == [True, False, True]


def test_strict_filter_excludes_not_invalidates(spark):
    """Review regression: rows excluded by the fused filter must not
    poison a strict aggregation; invalids among KEPT rows must."""
    from pyspark.sql import functions as F

    from riptable_spark.operators import groupby as gb

    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("a", 3.0)], ["k", "v"])
    flt = F.col("v") < 3
    got = df.groupBy("k").agg(gb.strict(F.sum, F.col("v"), flt).alias("s")).first().s
    assert got == 3.0
    df2 = spark.createDataFrame([("a", 1.0), ("a", None), ("a", 5.0)], ["k", "v"])
    kept_invalid = df2.groupBy("k").agg(
        gb.strict(F.sum, F.col("v"), F.col("v").isNull() | (F.col("v") < 3)).alias("s")
    ).first().s
    assert kept_invalid is None


def test_quantile_sorted_bitmatches_percentile_aggregate(spark):
    """quantile_sorted (sort-based rank-select) must be bit-identical to
    the F.percentile aggregate — same h=(n-1)q positions and Spark's own
    lo*(1-d)+hi*d interpolation — including NULL exclusion."""
    import random

    from riptable_spark.operators import groupby as gb

    rnd = random.Random(7)
    rows = [
        (rnd.choice("abc"), rnd.uniform(0, 1000) if rnd.random() > 0.1 else None)
        for _ in range(2000)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    qs = [0.25, 0.5, 0.75, 0.9]
    agg = {
        r["k"]: list(r["pq"])
        for r in df.groupBy("k")
        .agg(F.percentile("v", F.array(*[F.lit(q) for q in qs])).alias("pq"))
        .collect()
    }
    srt = {
        r["k"]: [r[f"q{i}"] for i in range(len(qs))]
        for r in gb.quantile_sorted(df, ["k"], "v", qs).collect()
    }
    assert set(agg) == set(srt)
    for k in agg:
        assert agg[k] == srt[k], (k, agg[k], srt[k])


def test_describe_full_stat_row_reference_parity(spark):
    """rt_utils.py:857 describe stat set on a hand-checked group:
    values [1..10] plus a NULL → Count=11, Valid=10, Nans=1; MeanM is
    the positional middle-80% mean over sorted positions
    floor(.1*9)=0 .. ceil(.9*9)=9 → all ten values → 5.5."""
    import numpy as np

    from riptable_spark.operators import groupby as gb

    rows = [("g", float(v)) for v in range(1, 11)] + [("g", None)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = gb.describe(df, ["k"], "v").first()
    assert (r["count"], r["valid"], r["nans"]) == (11, 10, 1)
    assert r["mean"] == 5.5 and r["min"] == 1.0 and r["max"] == 10.0
    assert r["p10"] == np.percentile(np.arange(1, 11), 10)
    assert r["p90"] == np.percentile(np.arange(1, 11), 90)
    assert r["meanm"] == 5.5

    # 21 values: positions 2..18 inclusive (floor(.1*20)=2, ceil(.9*20)=18)
    rows = [("g", float(v)) for v in range(21)]
    df = spark.createDataFrame(rows, ["k", "v"])
    r = gb.describe(df, ["k"], "v").first()
    assert r["meanm"] == sum(range(2, 19)) / 17


def test_quantile_ranged_matches_sorted(spark):
    """quantile_ranged (range-partitioned giant-group scale path) must be
    bit-equal to quantile_sorted: same interpolation, exact order
    statistics recovered from rank arithmetic across parallel splits —
    including NULL exclusion, single-row keys, and tied values."""
    import math

    from riptable_spark.operators import groupby as gb

    rows = []
    for i in range(5000):
        rows.append((i % 7, float((i * 37) % 101) if i % 11 else None))
    rows.append((99, 5.0))  # single-row key
    df = spark.createDataFrame(rows, "k int, v double")
    qs = [0.1, 0.25, 0.5, 0.9]
    a = {r.k: (r.q0, r.q1, r.q2, r.q3) for r in gb.quantile_sorted(df, ["k"], "v", qs).collect()}
    b = {r.k: (r.q0, r.q1, r.q2, r.q3) for r in gb.quantile_ranged(df, ["k"], "v", qs, npartitions=8).collect()}
    assert set(a) == set(b)
    for k in a:
        for x, y in zip(a[k], b[k]):
            assert (x is None and y is None) or math.isclose(x, y, rel_tol=0, abs_tol=0), (k, a[k], b[k])


def test_quantile_sorted_extra_aggs_fusion(spark):
    """extra_aggs folds caller aggregates into quantile_sorted's final
    hash-agg (one pass instead of a second scan+agg job); results match
    running them separately."""
    from pyspark.sql import functions as F

    from riptable_spark.operators import groupby as gb

    rows = [(i % 3, float(i % 17), float((i * 7) % 23)) for i in range(300)]
    df = spark.createDataFrame(rows, "k int, v double, x double")
    fused = {
        r.k: (r.q0, r.mx, r.sx)
        for r in gb.quantile_sorted(
            df, ["k"], "v", [0.5],
            extra_aggs=[F.avg("x").alias("mx"), F.sum("x").alias("sx")],
        ).collect()
    }
    sep_q = {r.k: r.q0 for r in gb.quantile_sorted(df, ["k"], "v", [0.5]).collect()}
    sep_a = {r.k: (r.mx, r.sx) for r in df.groupBy("k").agg(F.avg("x").alias("mx"), F.sum("x").alias("sx")).collect()}
    for k in fused:
        assert fused[k][0] == sep_q[k]
        assert abs(fused[k][1] - sep_a[k][0]) < 1e-9 and abs(fused[k][2] - sep_a[k][1]) < 1e-9


def test_approx_dials_within_bounds(spark, sf_dir):
    """Approximate aggregates must land within their advertised error of
    the exact values (the scale-dial contract)."""
    from pyspark.sql import functions as F

    from riptable_spark.operators import groupby as gb
    from riptable_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    row = li.groupBy("l_returnflag").agg(
        gb.quantile(F.col("l_extendedprice"), 0.5).alias("exact_med"),
        gb.quantile_approx(F.col("l_extendedprice"), 0.5).alias("approx_med"),
        gb.count_uniques(F.col("l_partkey")).alias("exact_nd"),
        gb.count_uniques_approx(F.col("l_partkey")).alias("approx_nd"),
    ).collect()
    for r in row:
        assert abs(r.approx_med - r.exact_med) / r.exact_med < 0.02, r
        assert abs(r.approx_nd - r.exact_nd) / max(r.exact_nd, 1) < 0.15, r


def test_quantile_auto_dispatch_branches_bitequal(spark):
    """quantile_auto's one-scan probe steers between the three exact
    physical strategies; every branch must produce bit-identical results.
    Thresholds are forced to exercise each branch on the same frame."""
    from riptable_spark.operators import groupby as gb

    rows = []
    for i in range(4000):
        rows.append((i % 5, float((i * 131) % 3989) + i * 1e-7 if i % 13 else None))
    df = spark.createDataFrame(rows, "k int, v double")
    qs = [0.1, 0.5, 0.9]
    want = {r.k: (r.q0, r.q1, r.q2) for r in gb.quantile_sorted(df, ["k"], "v", qs).collect()}
    # near-all-distinct values: default thresholds take the sorted branch
    got_sorted = {
        r.k: (r.q0, r.q1, r.q2) for r in gb.quantile_auto(df, ["k"], "v", qs).collect()
    }
    # huge distinct_threshold forces the value-map aggregate branch
    got_agg = {
        r.k: (r.q0, r.q1, r.q2)
        for r in gb.quantile_auto(df, ["k"], "v", qs, distinct_threshold=10**9).collect()
    }
    # giant_group_rows=0 forces the range-partitioned branch
    got_ranged = {
        r.k: (r.q0, r.q1, r.q2)
        for r in gb.quantile_auto(df, ["k"], "v", qs, giant_group_rows=0).collect()
    }
    assert want == got_sorted == got_agg == got_ranged

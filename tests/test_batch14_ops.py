"""Hand-computed semantics for pnl_curve, cuped_adjust, lm_by,
flesch_score."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from riptable_spark.functions.stats import cuped_adjust, lm_by
from riptable_spark.operators.finance import pnl_curve
from riptable_spark.operators.text import flesch_score


def test_pnl_curve_hand(spark):
    # buy 2 @10, sell 1 @12, buy 1 @8 for one key
    fills = spark.createDataFrame(
        [("a", 1, 1, 10.0, 2), ("a", 2, -1, 12.0, 1), ("a", 3, 1, 8.0, 1)],
        "k string, t int, s int, price double, q int",
    )
    out = pnl_curve(fills, "k", "t", F.col("s"), "price", F.col("q")).orderBy("t").collect()
    assert [(r["position"], r["cash"], r["mtm_pnl"]) for r in out] == [
        (2, -20.0, 0.0),          # long 2 @ 10
        (1, -8.0, 4.0),           # sold 1 @ 12 → +2 realized, +2 unrealized
        (2, -16.0, 0.0),          # bought back @ 8; mark at 8
    ]


def test_pnl_flat_position_is_realized_only(spark):
    fills = spark.createDataFrame(
        [("a", 1, 1, 10.0, 3), ("a", 2, -1, 11.0, 3)],
        "k string, t int, s int, price double, q int",
    )
    last = pnl_curve(fills, "k", "t", F.col("s"), "price", F.col("q")).orderBy("t").collect()[-1]
    assert last["position"] == 0
    assert last["mtm_pnl"] == 3.0  # 3 × $1, price no longer matters


def test_lm_by_matches_numpy(spark):
    rng = np.random.default_rng(3)
    rows = []
    for k, slope in (("a", 2.0), ("b", -1.0)):
        x = np.arange(1, 41, dtype=float)
        y = np.round(slope * x + 5 + rng.normal(0, 1, 40), 2)
        rows += [(k, float(xi), float(yi)) for xi, yi in zip(x, y)]
    df = spark.createDataFrame(rows, "k string, x double, y double")
    out = {r["k"]: r for r in lm_by(df, "k", "x", "y", x_scale=1, y_scale=100).collect()}
    for k in ("a", "b"):
        xs = np.array([x for kk, x, _ in rows if kk == k])
        ys = np.round(np.array([y for kk, _, y in rows if kk == k]) * 100)
        ref = np.polyfit(xs, ys, 1)
        assert out[k]["slope"] == pytest.approx(ref[0], rel=1e-9)
        assert out[k]["intercept"] == pytest.approx(ref[1], rel=1e-9)
        r = np.corrcoef(xs, ys)[0, 1]
        assert out[k]["r2"] == pytest.approx(r * r, rel=1e-9)


def test_lm_by_degenerate_x_yields_null(spark):
    df = spark.createDataFrame([("a", 5.0, 1.0), ("a", 5.0, 2.0)], "k string, x double, y double")
    r = lm_by(df, "k", "x", "y").collect()[0]
    assert r["slope"] is None and r["r2"] is None


def test_cuped_reduces_to_raw_mean_when_balanced(spark):
    # y = 3x exactly ⇒ theta = 3 (pooled), var_reduction = 1;
    # arm means adjust toward each other by the covariate imbalance
    rows = [(i, i % 2, float(10 + i), float(3 * (10 + i))) for i in range(20)]
    df = spark.createDataFrame(rows, "uid int, arm int, x double, y double")
    out = {r["arm"]: r for r in cuped_adjust(df, "arm", "y", "x").collect()}
    assert out[0]["var_reduction"] == pytest.approx(1.0, abs=1e-12)
    assert out[0]["theta"] == pytest.approx(3.0, abs=1e-12)
    # perfect linear relation ⇒ adjusted means equal across arms
    assert out[0]["mean_adj"] == pytest.approx(out[1]["mean_adj"], abs=1e-9)
    assert out[0]["mean_adj"] != pytest.approx(out[0]["mean_raw"], abs=1e-6)


def test_flesch_hand(spark):
    docs = spark.createDataFrame(
        [(1, "The cat sat."), (2, ""), (3, None), (4, "Hello world no terminator")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in flesch_score(docs).collect()}
    # doc 1: 3 words, 1 sentence, syllables: e/a/a/e? groups: "e","a","a" → the=1,cat=1,sat=1 → 3
    assert (out[1]["n_words"], out[1]["n_sentences"], out[1]["n_syllables"]) == (3, 1, 3)
    assert out[1]["flesch"] == pytest.approx(206.835 - 1.015 * 3 - 84.6 * 1.0, abs=1e-9)
    assert out[2]["n_words"] == 0 and out[2]["flesch"] is None
    assert out[3]["flesch"] is None
    assert out[4]["n_sentences"] == 1  # floored at one sentence


def test_topk_churn_hand(spark):
    from riptable_spark.operators.mining import topk_churn

    # period 1 top2: {a,b}; period 2 top2: {b,c} ⇒ retained 1, entered 1, dropped 1
    rows = [
        (1, "a", 100), (1, "b", 90), (1, "c", 10),
        (2, "b", 80), (2, "c", 70), (2, "a", 5),
    ]
    df = spark.createDataFrame(rows, "p int, k string, v int")
    out = topk_churn(df, F.col("p").cast("bigint"), "k", F.col("v").cast("bigint"), k=2).collect()
    assert len(out) == 1  # period 1 has no predecessor
    r = out[0]
    assert (r["period"], r["retained"], r["entered"], r["dropped"]) == (2, 1, 1, 1)
    assert r["jaccard"] == pytest.approx(1 / 3, abs=1e-12)


def test_topk_churn_tie_resolves_by_key(spark):
    from riptable_spark.operators.mining import topk_churn

    # tie at rank k: value 50 shared by b and c → key order keeps b
    rows = [(1, "a", 100), (1, "b", 50), (1, "c", 50), (2, "a", 100), (2, "b", 50), (2, "c", 50)]
    df = spark.createDataFrame(rows, "p int, k string, v int")
    r = topk_churn(df, F.col("p").cast("bigint"), "k", F.col("v").cast("bigint"), k=2).collect()[0]
    assert (r["retained"], r["entered"], r["dropped"]) == (2, 0, 0)


def test_lorenz_points_uniform_and_concentrated(spark):
    from riptable_spark.operators.finance import lorenz_points

    # equal values: cumulative share at bucket b is exactly b/10
    eq = spark.createDataFrame([("e", 5.0)] * 20, "k string, v double")
    out = {r["bucket"]: r["cum_share"] for r in lorenz_points(eq, "k", "v").collect()}
    for b in range(1, 11):
        assert out[b] == pytest.approx(b / 10, abs=1e-12)
    # fully concentrated: last bucket carries everything
    one = spark.createDataFrame([("o", 0.0)] * 19 + [("o", 10.0)], "k string, v double")
    out1 = {r["bucket"]: r["cum_share"] for r in lorenz_points(one, "k", "v").collect()}
    assert out1[9] == 0.0 and out1[10] == 1.0


def test_lorenz_points_cum_value_matches_total(spark):
    from riptable_spark.operators.finance import lorenz_points

    vals = [float(i) for i in range(1, 31)]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v double")
    rows = sorted(lorenz_points(df, "k", "v").collect(), key=lambda r: r["bucket"])
    assert rows[-1]["cum_value"] == sum(vals)
    assert rows[-1]["cum_share"] == 1.0
    # monotone non-decreasing
    shares = [r["cum_share"] for r in rows]
    assert shares == sorted(shares)

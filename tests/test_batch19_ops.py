"""Batch-19 operators (round-3 session 9): mix-shift decomposition,
forecast-accuracy report, Tukey-fence outlier audit."""

import math

from pyspark.sql import functions as F

from riptable_spark.functions.stats import forecast_accuracy, mix_shift
from riptable_spark.operators.profile import iqr_outliers


def test_mix_shift_telescopes_to_delta(spark):
    # two periods, three groups with shifting shares and rates
    rows = []
    for g, n_a, r_a, n_b, r_b in [("x", 4, 10, 8, 12), ("y", 6, 20, 2, 26), ("z", 0, 0, 5, 30)]:
        rows += [("a", g, r_a)] * n_a + [("b", g, r_b)] * n_b
    df = spark.createDataFrame(rows, "period string, grp string, v long")
    out = {r.grp: r for r in mix_shift(df, "period", "grp", "v", "a", "b").collect()}
    m_a = sum(r_a * n_a for _, n_a, r_a, _, _ in [(0, 4, 10, 0, 0), (0, 6, 20, 0, 0)]) / 10
    m_b = (8 * 12 + 2 * 26 + 5 * 30) / 15
    total = sum(r.mix_effect + r.rate_effect for r in out.values())
    assert math.isclose(total, m_b - m_a, rel_tol=0, abs_tol=1e-12)
    # group absent from period a: share_a = 0, rate falls back to M_a
    assert out["z"].n_a == 0 and out["z"].share_a == 0.0
    assert math.isclose(out["z"].rate_a, m_a, abs_tol=1e-12)


def test_mix_shift_pure_mix_has_zero_rate_effect(spark):
    # rates identical across periods -> all movement is mix
    rows = [("a", "x", 10)] * 2 + [("a", "y", 30)] * 2 + [("b", "x", 10)] * 3 + [("b", "y", 30)] * 1
    df = spark.createDataFrame(rows, "period string, grp string, v long")
    for r in mix_shift(df, "period", "grp", "v", "a", "b").collect():
        assert r.rate_effect == 0.0


def test_forecast_accuracy_hand_case(spark):
    # one series: actual 10,20,30,40; forecast 12,18,30,44
    rows = [(1, i, a, f) for i, (a, f) in enumerate([(10, 12), (20, 18), (30, 30), (40, 44)])]
    df = spark.createDataFrame(rows, "k long, t long, a long, f long")
    r = forecast_accuracy(df, ["k"], "a", "f", ["t"]).collect()[0]
    # e = +2,-2,0,+4 ; |e| sum = 8 ; naive diffs = 10,10,10
    assert r.n == 4
    assert r.bias == (2 - 2 + 0 + 4) / 4
    assert r.mae == 8 / 4
    assert r.wape == 8 / 100
    assert r.smape == 2 * 8 / (100 + 104)
    assert r.mase == (8 * 3) / (4 * 30)


def test_forecast_accuracy_perfect_forecast_is_all_zero(spark):
    rows = [(1, i, v, v) for i, v in enumerate([5, 7, 9, 11])]
    df = spark.createDataFrame(rows, "k long, t long, a long, f long")
    r = forecast_accuracy(df, ["k"], "a", "f", ["t"]).collect()[0]
    assert r.bias == 0.0 and r.mae == 0.0 and r.wape == 0.0 and r.smape == 0.0 and r.mase == 0.0


def test_iqr_outliers_flags_known_points(spark):
    vals = list(range(1, 13)) + [100, -50]  # q1/q3 of 1..12 plus two wild points
    df = spark.createDataFrame([("g", v) for v in vals], "k string, x long")
    r = iqr_outliers(df, ["k"], "x").collect()[0]
    assert r.n == 14
    assert r.n_out_low >= 1 and r.n_out_high >= 1
    # fences are exact doubles: q1 - 1.5*iqr and q3 + 1.5*iqr
    assert r.lo_fence == r.q1 - 1.5 * (r.q3 - r.q1)
    assert r.hi_fence == r.q3 + 1.5 * (r.q3 - r.q1)


def test_iqr_outliers_uniform_has_none(spark):
    df = spark.createDataFrame([("g", v) for v in range(100)], "k string, x long")
    r = iqr_outliers(df, ["k"], "x").collect()[0]
    assert r.n_out_low == 0 and r.n_out_high == 0

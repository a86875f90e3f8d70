"""Hand-computed semantics for the market-analytics batch (finance.py):
VWAP, realized variance, drawdown argmax, Bollinger full-window NULLs,
Gini closed forms, Benford digit extraction, keep_best policy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from riptable_spark.operators import dedup, finance


def _rows(df, *cols):
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_vwap_hand(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0, 2), ("a", 1, 20.0, 6), ("a", 2, 5.0, 4), ("b", 1, 7.5, 2)],
        "k string, b int, price double, vol int",
    )
    out = finance.vwap(df, "k", F.col("b"), "price", "vol")
    got = {(r["k"], r["bucket"]): (r["vwap"], r["volume"], r["n_trades"]) for r in out.collect()}
    assert got[("a", 1)] == ((10 * 2 + 20 * 6) / 8, 8, 2)  # 17.5
    assert got[("a", 2)] == (5.0, 4, 1)
    assert got[("b", 1)] == (7.5, 2, 1)


def test_realized_variance_hand(spark):
    # path 10 → 12 → 9: Δ = +2, −3 (dollars) ⇒ cents² sum = 200² + 300²
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 12.0), ("a", 3, 9.0), ("b", 1, 5.0)],
        "k string, t int, price double",
    )
    out = finance.realized_variance(df, "k", "t", "price")
    got = {r["k"]: (r["ss_change"], r["n_changes"], r["realized_vol"]) for r in out.collect()}
    assert got["a"] == (200**2 + 300**2, 2, math.sqrt(200**2 + 300**2) / 100)
    assert "b" not in got  # single observation ⇒ no changes ⇒ no row


def test_max_drawdown_picks_highest_peak_on_tie(spark):
    # two equal drawdowns of 5 from peaks 20 then 30 ⇒ report peak 30
    path = [(1, 20.0), (2, 15.0), (3, 30.0), (4, 25.0)]
    df = spark.createDataFrame([("a", t, p) for t, p in path], "k string, t int, price double")
    out = finance.max_drawdown(df, "k", "t", "price").collect()[0]
    assert out["max_drawdown"] == 5.0
    assert out["peak_at_max_dd"] == 30.0


def test_max_drawdown_monotone_path_is_zero(spark):
    df = spark.createDataFrame([("a", t, float(t)) for t in range(5)], "k string, t int, price double")
    out = finance.max_drawdown(df, "k", "t", "price").collect()[0]
    assert out["max_drawdown"] == 0.0
    assert out["peak_at_max_dd"] == 4.0


def test_bollinger_full_window_nulls_and_constant_band(spark):
    df = spark.createDataFrame([("a", t, 7.0) for t in range(5)], "k string, t int, price double")
    out = finance.bollinger(df, "k", "t", "price", n=3, k=2).orderBy("t").collect()
    assert [r["bb_mid"] for r in out[:2]] == [None, None]  # partial windows
    for r in out[2:]:  # constant series: std 0, bands collapse onto mean
        assert r["bb_mid"] == 7.0 and r["bb_upper"] == 7.0 and r["bb_lower"] == 7.0


def test_bollinger_matches_population_std(spark):
    vals = [1.0, 2.0, 4.0]
    df = spark.createDataFrame([("a", t, v) for t, v in enumerate(vals)], "k string, t int, price double")
    r = finance.bollinger(df, "k", "t", "price", n=3, k=2).orderBy("t").collect()[-1]
    mu = sum(vals) / 3
    sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / 3)
    assert r["bb_mid"] == pytest.approx(mu, abs=1e-12)
    assert r["bb_upper"] == pytest.approx(mu + 2 * sd, abs=1e-12)
    assert r["bb_lower"] == pytest.approx(mu - 2 * sd, abs=1e-12)


def test_gini_closed_forms(spark):
    # perfectly equal values ⇒ gini 0; one-holder ⇒ (n−1)/n
    eq = spark.createDataFrame([("e", 5.0)] * 4, "k string, v double")
    one = spark.createDataFrame([("o", 0.0)] * 3 + [("o", 12.0)], "k string, v double")
    g_eq = finance.lorenz_gini(eq, "k", "v").collect()[0]
    g_one = finance.lorenz_gini(one, "k", "v").collect()[0]
    assert g_eq["gini"] == pytest.approx(0.0, abs=1e-12)
    assert g_one["gini"] == pytest.approx(3 / 4, abs=1e-12)
    assert g_eq["n"] == 4 and g_eq["total"] == 20.0


def test_benford_digit_extraction(spark):
    df = spark.createDataFrame(
        [(0.042,), (-3.7,), (190.0,), (0.0,), (None,), (8e-5,)], "v double"
    )
    out = finance.benford_audit(df, "v")
    got = {r["digit"]: r["observed"] for r in out.collect()}
    assert got == {4: 1, 3: 1, 1: 1, 8: 1}  # zero/NULL dropped; leading zeros skipped
    # expected counts sum to n and chi2 components are finite
    rows = out.collect()
    assert sum(r["expected"] for r in rows) <= 4.0 + 1e-9
    assert all(math.isfinite(r["chi2_component"]) for r in rows)


def test_keep_best_picks_max_quality_then_id(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (10, 5), (11, 5), (99, 1)],
        "doc_id long, n_chars int",
    )
    out = dedup.keep_best(pairs, docs)
    got = {r["component"]: (r["cluster_size"], r["keep_id"], r["keep_quality"]) for r in out.collect()}
    # cluster {1,2,3}: quality tie 90 between 2 and 3 ⇒ keep the higher id 3
    assert got[1] == (3, 3, 90.0)
    assert got[10] == (2, 11, 5.0)  # tie on quality 5 ⇒ id 11
    assert 99 not in {r["keep_id"] for r in out.collect() if r["component"] not in got} and len(got) == 2

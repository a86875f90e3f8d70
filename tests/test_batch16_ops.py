"""Hand-computed semantics for xcorr, join_key_discovery,
attribute_u_shaped."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from riptable_spark.operators.profile import join_key_discovery
from riptable_spark.operators.window import attribute_u_shaped, xcorr


def test_xcorr_detects_shift(spark):
    # y is x shifted LEFT by 2 (y_t = x_{t+2}... i.e. x leads y by -2):
    # xcorr at lag ℓ correlates x_t with y_{t+ℓ}; y_t = x_{t-2} ⇒ peak at lag 2
    rng = np.random.default_rng(11)
    x = rng.integers(0, 100, 60)
    y = np.roll(x, 2)  # y_t = x_{t-2}
    rows = [("k", int(t), int(x[t]), int(y[t])) for t in range(60)]
    df = spark.createDataFrame(rows, "k string, t int, x long, y long")
    out = {r["lag"]: r["xcorr"] for r in xcorr(df, "k", "t", "x", "y", lags=3).collect()}
    # exact at the aligned pairs (roll wraps, so first 2 pairs are off — still far highest)
    assert out[2] == max(out.values())
    assert out[2] > 0.9


def test_xcorr_lag0_is_pearson(spark):
    rows = [("k", t, t, 2 * t + 1) for t in range(20)]
    df = spark.createDataFrame(rows, "k string, t int, x long, y long")
    out = {r["lag"]: r for r in xcorr(df, "k", "t", "x", "y", lags=1).collect()}
    assert out[0]["xcorr"] == pytest.approx(1.0, abs=1e-12)
    assert out[0]["n_pairs"] == 20
    assert out[1]["n_pairs"] == 19


def test_join_key_discovery_finds_fk(spark):
    a = spark.createDataFrame([(i, i % 7) for i in range(200)], "ok long, ck long")
    # fk column references a subset of a.ok; noise column is disjoint
    b = spark.createDataFrame([(i % 150, 1000 + i) for i in range(300)], "fk long, noise long")
    out = {(r["col_a"], r["col_b"]): r for r in join_key_discovery(a, b, ["ok", "ck"], ["fk", "noise"], k=64).collect()}
    # fk ⊂ ok: containment of fk-in-ok ≈ 1 (b side contained in a side)
    assert out[("ok", "fk")]["containment_b_in_a"] == pytest.approx(1.0, abs=0.05)
    # disjoint noise column: zero overlap
    assert out[("ok", "noise")]["m_both"] == 0
    assert out[("ok", "noise")]["jaccard_est"] == 0.0


def test_join_key_discovery_identical_columns(spark):
    a = spark.createDataFrame([(i,) for i in range(500)], "v long")
    out = join_key_discovery(a, a, ["v"], ["v"], k=64).collect()[0]
    assert out["jaccard_est"] == 1.0
    assert out["containment_a_in_b"] == 1.0 and out["containment_b_in_a"] == 1.0


def test_u_shaped_attribution_hand(spark):
    # user journey: v1 v2 v3 v4 P1 v5 P2  (all touches are views)
    rows = [
        ("u", 1, 1, "view"), ("u", 2, 2, "view"), ("u", 3, 3, "view"),
        ("u", 4, 4, "view"), ("u", 5, 5, "purchase"), ("u", 6, 6, "view"),
        ("u", 7, 7, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts int, event_id int, event_type string")
    out = attribute_u_shaped(
        df, "user_id", ["ts", "event_id"], "event_type", ["view", "click"], ["purchase"]
    ).collect()
    j1 = {r["touch_id"]: r for r in out if r["conversion_id"] == 5}
    j2 = {r["touch_id"]: r for r in out if r["conversion_id"] == 7}
    # journey 1: 4 touches → 40/10/10/40 (middles split 20 over 2)
    assert [j1[t]["credit_bp"] for t in (1, 2, 3, 4)] == [4000.0, 1000.0, 1000.0, 4000.0]
    assert j1[1]["n_touches"] == 4 and j1[1]["position"] == 1
    # journey 2: single touch → 100%
    assert j2[6]["credit_bp"] == 10000.0
    # total credit per journey sums to 10000
    assert sum(r["credit_bp"] for r in j1.values()) == pytest.approx(10000.0)


def test_u_shaped_two_touch_journey(spark):
    rows = [("u", 1, 1, "view"), ("u", 2, 2, "click"), ("u", 3, 3, "purchase")]
    df = spark.createDataFrame(rows, "user_id string, ts int, event_id int, event_type string")
    out = attribute_u_shaped(
        df, "user_id", ["ts", "event_id"], "event_type", ["view", "click"], ["purchase"]
    ).collect()
    assert sorted(r["credit_bp"] for r in out) == [5000.0, 5000.0]
    # trailing touches with no subsequent conversion are dropped
    rows2 = rows + [("u", 4, 4, "view")]
    df2 = spark.createDataFrame(rows2, "user_id string, ts int, event_id int, event_type string")
    out2 = attribute_u_shaped(
        df2, "user_id", ["ts", "event_id"], "event_type", ["view", "click"], ["purchase"]
    ).collect()
    assert {r["touch_id"] for r in out2} == {1, 2}


def test_doc_novelty_hand(spark):
    from riptable_spark.operators.dedup import doc_novelty

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),      # shares 3-grams with doc 2
            (2, "the quick brown fox sleeps"),
            (3, "completely different text here"),  # unique
            (4, None),
            (5, ""),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in doc_novelty(docs, n=3).collect()}
    # docs 1/2: 3 shingles each, share 'the quick brown' + 'quick brown fox'
    assert out[1]["n_shingles"] == 3 and out[1]["n_shared"] == 2
    assert out[1]["novelty"] == pytest.approx(1 / 3, abs=1e-12)
    assert out[3]["n_shared"] == 0 and out[3]["novelty"] == 1.0
    assert 4 not in out and 5 not in out  # NULL/empty text excluded


def test_doc_novelty_exact_duplicates_share_everything(spark):
    from riptable_spark.operators.dedup import doc_novelty

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in doc_novelty(docs, n=3).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0


def test_curate_corpus_stages(spark):
    from riptable_spark.operators.pipeline import curate_corpus

    long_good = " ".join(["alpha beta gamma delta"] * 20)  # 80 words, alpha-heavy
    docs = spark.createDataFrame(
        [
            (1, long_good),
            (2, long_good),          # exact duplicate → dropped (min id kept)
            (3, "too short"),        # fails word count
            (4, None),               # NULL text fails the gate
        ],
        "doc_id int, text string",
    )
    out = curate_corpus(docs, rules=("r_word_count", "r_mean_word_len", "r_alpha"))
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["split"] in ("train", "val", "test")


def test_salt_plan_hand(spark):
    from riptable_spark.operators.skew import salt_plan

    rows = [("hot",)] * 25 + [("cold",)] * 3 + [(None,)] * 2
    df = spark.createDataFrame(rows, "k string")
    out = {r["k"]: (r["n_rows"], r["salt_factor"]) for r in salt_plan(df, "k", target_rows_per_task=10).collect()}
    assert out == {"hot": (25, 3), "cold": (3, 1)}  # ceil(25/10)=3; NULL keys excluded


def test_join_size_estimate_exact(spark):
    from riptable_spark.operators.profile import join_size_estimate

    a = spark.createDataFrame([(1,), (1,), (2,), (3,), (None,)], "k int")
    b = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k int")
    r = join_size_estimate(a, b, "k", "k").collect()[0]
    # key 1: 2×1, key 2: 1×2 → 4 join rows; key 3 and 9 unmatched; NULL dropped
    assert (r["n_left"], r["n_right"], r["n_join_rows"]) == (4, 4, 4)
    assert (r["n_left_matched"], r["n_right_matched"]) == (3, 3)
    assert r["max_key_contribution"] == 2
    # the estimate must equal the actual inner-join row count
    actual = a.dropna().join(b, on="k").count()
    assert r["n_join_rows"] == actual


def test_implementation_shortfall_hand(spark):
    from riptable_spark.operators import finance

    # day 1: arrival quote 10; buys at 11 (q=2) and 9 (q=1) → (100·2 + (−100)·1)/100 = 1.0
    trades = spark.createDataFrame(
        [("u", 1, 1, 11.0, 2), ("u", 1, 2, 9.0, 1)],
        "user_id string, d int, event_id int, value double, q int",
    )
    quotes = spark.createDataFrame(
        [("u", 1, 0, 10.0), ("u", 1, 5, 99.0)],  # later quote must NOT be the benchmark
        "user_id string, d int, event_id int, qv double",
    )
    out = finance.implementation_shortfall(
        trades, quotes, by="user_id", day=F.col("d"),
        trade_order=["event_id"], quote_order=["event_id"],
        trade_price="value", quote_mid="qv", qty="q",
    ).collect()[0]
    assert (out["n_trades"], out["total_qty"]) == (2, 3)
    assert out["shortfall"] == 1.0
    assert out["shortfall_per_unit"] == pytest.approx(1 / 3, abs=1e-12)


def test_rolling_corr_perfect_and_window_gate(spark):
    from riptable_spark.operators.window import rolling_corr_exact

    rows = [("k", t, float(t), 3 * t + 7) for t in range(10)]
    df = spark.createDataFrame(rows, "k string, t int, x double, y long")
    out = sorted(rolling_corr_exact(df, "k", "t", "x", "y", n=5).collect(), key=lambda r: r["t"])
    assert all(r["rolling_corr"] is None for r in out[:4])  # partial windows
    for r in out[4:]:
        assert r["rolling_corr"] == pytest.approx(1.0, abs=1e-12)  # y = 3x+7


def test_apply_cdc_hand(spark):
    from riptable_spark.operators.merge import apply_cdc

    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    changes = spark.createDataFrame(
        [(2, "b1", "U", 1), (2, "b2", "U", 2), (3, None, "D", 1), (4, "d", "I", 1)],
        "k int, v string, op string, seq int",
    )
    out = {r["k"]: r["v"] for r in apply_cdc(base, changes, ["k"], order_by=["seq"]).collect()}
    # latest update wins (b2), delete removes 3, insert adds 4, 1 untouched
    assert out == {1: "a", 2: "b2", 4: "d"}


def test_drawdown_duration_hand(spark):
    from riptable_spark.operators import finance

    # path: 10 9 8 10 10 9 11 → runs below peak: [9,8] (len 2), [9] (len 1)
    path = [10.0, 9.0, 8.0, 10.0, 10.0, 9.0, 11.0]
    df = spark.createDataFrame([("u", t, p) for t, p in enumerate(path)], "k string, t int, price double")
    r = finance.drawdown_duration(df, "k", "t", "price").collect()[0]
    assert (r["max_underwater_run"], r["n_drawdowns"], r["total_underwater_rows"]) == (2, 2, 3)


def test_adjust_for_splits_hand(spark):
    from riptable_spark.operators import finance

    prices = spark.createDataFrame(
        [("s", 1, 100.0), ("s", 2, 102.0), ("s", 3, 51.0), ("s", 4, 52.0)],
        "k string, t int, price double",
    )
    # 2:1 split effective at t=3: rows before t=3 halve
    splits = spark.createDataFrame([("s", 3, 1)], "k string, sat int, ratio_log2 int")
    out = {r["t"]: (r["split_log2"], r["adj_price"]) for r in
           finance.adjust_for_splits(prices, splits, "k", "t", "price", "sat").collect()}
    assert out[1] == (1, 50.0) and out[2] == (1, 51.0)
    assert out[3] == (0, 51.0) and out[4] == (0, 52.0)


def test_adjust_for_splits_stacks_and_reverse(spark):
    from riptable_spark.operators import finance

    prices = spark.createDataFrame([("s", t, 80.0) for t in range(1, 5)], "k string, t int, price double")
    splits = spark.createDataFrame(
        [("s", 2, 1), ("s", 4, -1)], "k string, sat int, ratio_log2 int"
    )  # 2:1 split at t=2, 1:2 reverse at t=4
    out = {r["t"]: (r["split_log2"], r["adj_price"]) for r in
           finance.adjust_for_splits(prices, splits, "k", "t", "price", "sat").collect()}
    assert out[1] == (0, 80.0)   # +1 then −1 cancel
    assert out[2] == (-1, 160.0)  # only the reverse split remains ahead
    assert out[3] == (-1, 160.0)
    assert out[4] == (0, 80.0)


def test_twap_hand(spark):
    import datetime as dt

    from riptable_spark.operators import finance

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0, 10.0, 1),
        ("u", t0 + dt.timedelta(seconds=30), 20.0, 2),   # 10 held 30s
        ("u", t0 + dt.timedelta(seconds=40), 30.0, 3),   # 20 held 10s; 30 has no interval
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, price double, event_id int")
    r = finance.twap(df, "k", F.lit(1), ["ts", "event_id"], "price").collect()[0]
    assert r["n_intervals"] == 2
    assert r["total_micros"] == 40_000_000
    assert r["twap"] == pytest.approx((10 * 30 + 20 * 10) / 40, abs=1e-12)  # 12.5


def test_event_study_hand(spark):
    from riptable_spark.operators import finance

    # series 1..7, anchor at t=4 (value 4): offsets -1..+1
    df = spark.createDataFrame(
        [("k", t, float(t), t == 4) for t in range(1, 8)], "k string, t int, v double, a boolean"
    )
    out = {r["offset"]: (r["n"], r["mean_value"]) for r in
           finance.event_study(df, "k", "t", "v", F.col("a"), window_radius=1).collect()}
    assert out == {-1: (1, 3.0), 0: (1, 4.0), 1: (1, 5.0)}


def test_cluster_distortion_matches_numpy(spark):
    import numpy as np

    from riptable_spark.operators.similarity import cluster_distortion

    rng = np.random.default_rng(5)
    vecs = np.round(rng.normal(0, 0.5, (30, 4)), 3)  # 3dp values are exact at scale 1000
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["list_id"]: r for r in cluster_distortion(df, F.col("vec_id") % 3).collect()}
    for lid in range(3):
        sub = vecs[np.arange(30) % 3 == lid]
        sse_np = ((sub - sub.mean(axis=0)) ** 2).sum()
        assert out[lid]["n_vecs"] == len(sub)
        assert out[lid]["sse"] == pytest.approx(sse_np, rel=1e-9)
        assert out[lid]["mean_sse"] == pytest.approx(sse_np / len(sub), rel=1e-9)


def test_cluster_distortion_zero_for_identical_vectors(spark):
    from riptable_spark.operators.similarity import cluster_distortion

    df = spark.createDataFrame([(i, [0.5, -0.25]) for i in range(6)], "vec_id int, embedding array<double>")
    r = cluster_distortion(df, F.lit(0)).collect()[0]
    assert r["sse"] == 0.0 and r["mean_sse"] == 0.0


def test_factor_quintiles_hand(spark):
    from riptable_spark.operators import finance

    # period 1: signals a=40 b=30 c=20 d=10 → 2 buckets {a,b} {c,d}
    # period 2: a=1 b=2 c=3 d=4 (the forward values for period 1)
    rows = [(1, "a", 40), (1, "b", 30), (1, "c", 20), (1, "d", 10),
            (2, "a", 1), (2, "b", 2), (2, "c", 3), (2, "d", 4)]
    df = spark.createDataFrame(rows, "p int, k string, v int")
    out = {(r["period"], r["bucket"]): (r["n"], r["mean_fwd"]) for r in
           finance.factor_quintiles(df, "k", F.col("p").cast("bigint"), F.col("v").cast("bigint"), buckets=2).collect()}
    # only period 1 has a next period; high bucket holds {a,b} → fwd mean 1.5
    assert out[(1, 1)] == (2, 1.5)
    assert out[(1, 2)] == (2, 3.5)
    assert (2, 1) not in out


def test_kwic_hand(spark):
    from riptable_spark.operators.text import kwic

    docs = spark.createDataFrame(
        [(1, "the quick Spark engine runs"), (2, "no match here"), (3, None)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in kwic(docs, "spark", context=4).collect()}
    assert 2 not in out and 3 not in out
    assert out[1]["match_pos"] == 11
    assert out[1]["snippet"] == "ick Spark eng"  # 4 chars either side of 'Spark'


def test_theil_sen_robust_to_outlier(spark):
    from riptable_spark.functions.stats import theil_sen_consecutive

    # slope 2 everywhere except one wild outlier point
    ys = [2 * t for t in range(20)]
    ys[10] = 500
    rows = [("k", t, float(t), float(y)) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t int, x double, y double")
    r = theil_sen_consecutive(df, "k", "t", "x", "y", x_scale=1, y_scale=1).collect()[0]
    assert r["n_slopes"] == 19
    assert r["ts_slope"] == 2.0  # the median shrugs off the spike (mean slope would not)


def test_rolling_zscore_hand(spark):
    from riptable_spark.operators.finance import rolling_zscore

    # constant series → m2 = 0 → NULL z (no divide-by-zero); then a step
    vals = [5.0] * 4 + [8.0]
    df = spark.createDataFrame([("k", t, v) for t, v in enumerate(vals)], "k string, t int, v double")
    out = sorted(rolling_zscore(df, "k", "t", "v", n=3).collect(), key=lambda r: r["t"])
    assert out[0]["zscore"] is None and out[1]["zscore"] is None  # partial windows
    assert out[2]["zscore"] is None and out[3]["zscore"] is None  # zero variance
    # window [5,5,8]: mean=6, pop std=sqrt(2); z=(8-6)/sqrt(2)
    import math
    assert out[4]["zscore"] == pytest.approx(2 / math.sqrt(2), abs=1e-12)


def test_ltv_curve_hand(spark):
    import datetime as dt

    from riptable_spark.operators.groupby import ltv_curve

    w0 = dt.datetime(2024, 1, 1)   # a Monday
    w1 = dt.datetime(2024, 1, 8)
    rows = [
        (1, w0, 1000), (1, w1, 500),     # cohort w0, ages 0 and 1
        (2, w1, 200),                     # cohort w1, age 0
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, cents long")
    out = {(str(r["cohort"])[:10], r["age"]): (r["n_active"], r["revenue"], r["cum_revenue"])
           for r in ltv_curve(df, "user_id", "ts", F.col("cents"), period="week").collect()}
    assert out[("2024-01-01", 0)] == (1, 10.0, 10.0)
    assert out[("2024-01-01", 1)] == (1, 5.0, 15.0)
    assert out[("2024-01-08", 0)] == (1, 2.0, 2.0)


def test_time_bars_hand(spark):
    import datetime as dt

    from riptable_spark.operators.finance import time_bars

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u", t0, 1, 10.0, 2),
        ("u", t0 + dt.timedelta(seconds=10), 2, 30.0, 1),
        ("u", t0 + dt.timedelta(seconds=20), 3, 5.0, 1),
        ("u", t0 + dt.timedelta(seconds=30), 4, 20.0, 2),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, event_id int, price double, q int")
    r = time_bars(df, "k", F.lit(1), "price", F.col("q")).collect()[0]
    assert (r["open"], r["high"], r["low"], r["close"]) == (10.0, 30.0, 5.0, 20.0)
    assert r["volume"] == 6 and r["n_trades"] == 4
    assert r["vwap"] == pytest.approx((10*2 + 30 + 5 + 20*2) / 6, abs=1e-12)


def test_pareto_frontier_hand(spark):
    from riptable_spark.operators.mining import pareto_frontier

    # (price, size): (1,5) frontier; (2,5) dominated (same size, pricier);
    # (2,8) frontier; (3,8) dominated; (3,9) frontier; duplicates (1,5) both kept
    rows = [("b", 1, 1.0, 5), ("b", 2, 2.0, 5), ("b", 3, 2.0, 8),
            ("b", 4, 3.0, 8), ("b", 5, 3.0, 9), ("b", 6, 1.0, 5)]
    df = spark.createDataFrame(rows, "g string, id int, cost double, sz int")
    keep = {r["id"] for r in pareto_frontier(df, "g", "cost", "sz").collect()}
    assert keep == {1, 3, 5, 6}


def test_pareto_frontier_is_per_group(spark):
    from riptable_spark.operators.mining import pareto_frontier

    rows = [("a", 1, 1.0, 1), ("b", 2, 9.0, 1)]  # each alone in its group → both survive
    df = spark.createDataFrame(rows, "g string, id int, cost double, sz int")
    assert {r["id"] for r in pareto_frontier(df, "g", "cost", "sz").collect()} == {1, 2}


def test_interval_coverage_hand(spark):
    from riptable_spark.operators.window import interval_coverage

    # [0,10) [5,15) merge → 15; [20,25) separate; [25,30) touches? start==prev end
    # → start > pme is FALSE at equality, so touching intervals MERGE
    rows = [("u", 1, 0, 10), ("u", 2, 5, 15), ("u", 3, 20, 25), ("u", 4, 25, 30)]
    df = spark.createDataFrame(rows, "k string, id int, s long, e long")
    r = interval_coverage(df, "k", "s", "e", "id").collect()[0]
    assert (r["covered"], r["n_islands"], r["n_gaps"]) == (15 + 10, 2, 1)


def test_interval_coverage_contained_interval(spark):
    from riptable_spark.operators.window import interval_coverage

    # [0,100) contains [10,20): one island of length 100
    rows = [("u", 1, 0, 100), ("u", 2, 10, 20)]
    df = spark.createDataFrame(rows, "k string, id int, s long, e long")
    r = interval_coverage(df, "k", "s", "e", "id").collect()[0]
    assert (r["covered"], r["n_islands"]) == (100, 1)


def test_growth_accounting_hand(spark):
    import datetime as dt

    from riptable_spark.operators.groupby import growth_accounting

    d = lambda i: dt.datetime(2024, 1, i)
    # u1 active days 1,2,4; u2 active day 2 only
    rows = [(1, d(1)), (1, d(2)), (1, d(4)), (2, d(2))]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {r["day"] - 19723: r for r in growth_accounting(df, "user_id", "ts").collect()}
    # day1: u1 new. day2: u1 retained, u2 new. day3: none (absent row).
    # day4: u1 resurrected; churned vs day3 absent → NULL (no prev row)
    d1, d2, d4 = out[0], out[1], out[3]
    assert (d1["dau"], d1["n_new"]) == (1, 1)
    assert (d2["dau"], d2["n_new"], d2["n_retained"]) == (2, 1, 1)
    assert d2["n_churned"] == 0  # day1 dau 1 − retained 1
    assert (d4["dau"], d4["n_resurrected"]) == (1, 1)
    assert d4["n_churned"] is None  # day3 had no activity row
    # identity: dau = new + retained + resurrected on every day
    for r in out.values():
        assert r["dau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]


def test_session_paths_hand(spark):
    import datetime as dt

    from riptable_spark.operators.window import session_paths

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        ("u1", m(0), 1, "view"), ("u1", m(1), 2, "click"),          # session: view>click
        ("u1", m(60), 3, "view"), ("u1", m(61), 4, "click"),        # new session: view>click
        ("u2", m(0), 5, "view"), ("u2", m(2), 6, "click"),          # view>click
        ("u2", m(90), 7, "purchase"),                                # purchase (below min_count)
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id int, event_type string")
    out = session_paths(df, "user_id", "ts", "event_id", "event_type", gap_minutes=30, min_count=2).collect()
    assert [(r["path"], r["n_sessions"]) for r in out] == [("view>click", 3)]


def test_max_concurrency_hand(spark):
    from riptable_spark.operators.window import max_concurrency

    # [0,10) [5,15) [10,20): at t=10 the first closes as the third opens → peak 2
    rows = [("u", 0, 10), ("u", 5, 15), ("u", 10, 20)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = max_concurrency(df, "k", "s", "e").collect()[0]
    assert r["max_concurrent"] == 2


def test_transition_dwell_hand(spark):
    import datetime as dt

    from riptable_spark.operators.window import transition_dwell

    t0 = dt.datetime(2024, 1, 1)
    sec = lambda k: t0 + dt.timedelta(seconds=k)
    rows = [("u", sec(0), 1, "a"), ("u", sec(10), 2, "b"), ("u", sec(40), 3, "b")]
    df = spark.createDataFrame(rows, "k string, ts timestamp, event_id int, event_type string")
    out = {(r["from_type"], r["to_type"]): (r["n"], r["mean_micros"]) for r in
           transition_dwell(df, "k", "ts", "event_id", "event_type").collect()}
    assert out[("a", "b")] == (1, 10_000_000.0)
    assert out[("b", "b")] == (1, 30_000_000.0)


def test_pair_eval_hand(spark):
    from riptable_spark.operators.dedup import pair_eval

    pred = spark.createDataFrame([(1, 2), (3, 4), (6, 5)], "id_a int, id_b int")
    truth = spark.createDataFrame([(2, 1), (5, 6), (7, 8)], "id_a int, id_b int")
    r = pair_eval(pred, truth).collect()[0]
    # (1,2) and (5,6) match after canonicalization; (3,4) FP; (7,8) FN
    assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
    assert r["precision"] == pytest.approx(2 / 3)
    assert r["recall"] == pytest.approx(2 / 3)
    assert r["f1"] == pytest.approx(2 / 3)


def test_confusion_matrix_hand(spark):
    from riptable_spark.functions.stats import confusion_matrix

    rows = [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "a")]
    df = spark.createDataFrame(rows, "y string, yhat string")
    out = {r["cls"]: r for r in confusion_matrix(df, "y", "yhat").collect()}
    assert (out["a"]["support"], out["a"]["predicted"], out["a"]["tp"]) == (2, 2, 1)
    assert out["b"]["precision"] == pytest.approx(2 / 3)
    assert out["b"]["recall"] == 1.0
    assert out["c"]["tp"] == 0 and out["c"]["precision"] is None  # never predicted


def test_schema_report_hand(spark):
    from riptable_spark.operators.profile import schema_report

    df = spark.createDataFrame([(1, "x")], "a int, b string")
    out = {r["column"]: r["status"] for r in schema_report(df, {"a": "int", "b": "bigint", "c": "double"}).collect()}
    assert out == {"a": "ok", "b": "type_mismatch", "c": "missing"}
    df2 = spark.createDataFrame([(1, "x")], "a int, extra string")
    out2 = {r["column"]: r["status"] for r in schema_report(df2, {"a": "int"}).collect()}
    assert out2 == {"a": "ok", "extra": "extra"}


def test_ewm_stats_constant_series(spark):
    from riptable_spark.operators.ema import ewm_stats

    df = spark.createDataFrame([("u", float(t), 7.0) for t in range(6)], "k string, t double, v double")
    out = ewm_stats(df, ["k"], "v", "t", rate=0.5).collect()
    for r in out:  # constant series: mean 7, variance 0 at every step
        assert r["ewm_mean"] == pytest.approx(7.0, abs=1e-9)
        assert r["ewm_var"] == pytest.approx(0.0, abs=1e-9)


def test_ewm_stats_matches_manual_recurrence(spark):
    import math

    from riptable_spark.operators.ema import ewm_stats

    vals = [1.0, 5.0, 2.0, 8.0]
    df = spark.createDataFrame([("u", float(t), v) for t, v in enumerate(vals)], "k string, t double, v double")
    out = sorted(ewm_stats(df, ["k"], "v", "t", rate=0.3).collect(), key=lambda r: r["t"])
    s1 = s2 = w = 0.0
    prev_t = 0.0
    for r, (t, x) in zip(out, enumerate(vals)):
        d = math.exp(-0.3 * (t - prev_t))
        s1, s2, w = s1 * d + x, s2 * d + x * x, w * d + 1.0
        prev_t = t
        assert r["ewm_mean"] == pytest.approx(s1 / w, rel=1e-9)
        assert r["ewm_var"] == pytest.approx(max(s2 / w - (s1 / w) ** 2, 0.0), rel=1e-9, abs=1e-9)


def test_l2_normalize_unit_norm(spark):
    import math

    from riptable_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in l2_normalize(df).collect()}
    assert out[1]["l2_norm"] == pytest.approx(5.0, abs=1e-9)
    assert out[1]["unit_vec"][0] == pytest.approx(0.6, abs=1e-9)
    assert math.hypot(*out[1]["unit_vec"]) == pytest.approx(1.0, abs=1e-9)
    assert out[2]["l2_norm"] is None and out[2]["unit_vec"] is None  # zero vector
    assert out[3]["unit_vec"] == [1.0, 0.0]


def test_sessionize_hand(spark):
    import datetime as dt

    from riptable_spark.operators.window import sessionize

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        ("u", m(0), 1, 10.0, "view"), ("u", m(5), 2, 2.5, "purchase"),
        ("u", m(60), 3, 1.0, "view"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id int, value double, event_type string")
    out = {r["session_id"]: r for r in sessionize(
        df, "user_id", "ts", "event_id", gap_minutes=30,
        value_col="value", conversion=F.col("event_type") == "purchase",
    ).collect()}
    s1, s2 = out[1], out[2]
    assert s1["n_events"] == 2 and s1["duration_micros"] == 5 * 60 * 1_000_000
    assert s1["value_cents"] == 1250 and s1["converted"] is True
    assert s2["n_events"] == 1 and s2["duration_micros"] == 0 and s2["converted"] is False


def test_fifo_pnl_hand(spark):
    from riptable_spark.operators.finance import fifo_pnl

    # buy 2@10, buy 1@12, sell 2@15 (closes 2@10 → +10), sell 2@11
    # (closes 1@12 → −1; flips short 1@11)
    rows = [
        ("u", 1, 1, 10.0, 2), ("u", 2, 1, 12.0, 1),
        ("u", 3, -1, 15.0, 2), ("u", 4, -1, 11.0, 2),
    ]
    df = spark.createDataFrame(rows, "k string, t int, s int, price double, q long")
    out = sorted(fifo_pnl(df, "k", ["t"], "s", "price", "q").collect(), key=lambda r: r["t"])
    assert [r["realized_cents"] for r in out] == [0, 0, 1000, 900]
    assert [r["position_after"] for r in out] == [2, 3, 1, -1]


def test_fifo_pnl_total_matches_linear_mtm(spark):
    """Path-independence of TOTAL PnL: FIFO realized + unrealized must
    equal pnl_curve's mark-to-market at every row."""
    import numpy as np

    from riptable_spark.operators.finance import fifo_pnl, pnl_curve

    rng = np.random.default_rng(17)
    rows = []
    for t in range(40):
        rows.append(("u", t, int(rng.choice([1, -1])), float(rng.integers(5, 30)), int(rng.integers(1, 5))))
    df = spark.createDataFrame(rows, "k string, t int, s int, price double, q long")
    fifo = {r["t"]: r for r in fifo_pnl(df, "k", ["t"], "s", "price", "q").collect()}
    lin = {r["t"]: r for r in pnl_curve(df, "k", "t", F.col("s"), "price", F.col("q")).collect()}
    # positions agree row-by-row; whenever the book is FLAT, total PnL is
    # path-independent, so FIFO realized == linear mark-to-market exactly
    for t in range(40):
        assert fifo[t]["position_after"] == lin[t]["position"]
    flats = [t for t in range(40) if fifo[t]["position_after"] == 0]
    assert flats, "random walk should cross flat at least once"
    for t in flats:
        assert fifo[t]["realized_cents"] == round(lin[t]["mtm_pnl"] * 100)


def test_holt_linear_constant_and_linear_series(spark):
    from riptable_spark.operators.ema import holt_linear

    const = spark.createDataFrame([("c", t, 5.0) for t in range(20)], "k string, t int, v double")
    out = holt_linear(const, ["k"], "v", "t").orderBy("t").collect()
    assert out[-1]["holt_level"] == pytest.approx(5.0, abs=1e-9)
    assert out[-1]["holt_trend"] == pytest.approx(0.0, abs=1e-9)
    lin = spark.createDataFrame([("l", t, 2.0 * t) for t in range(200)], "k string, t int, v double")
    last = holt_linear(lin, ["k"], "v", "t").orderBy("t").collect()[-1]
    assert last["holt_trend"] == pytest.approx(2.0, rel=0.02)  # converges to the slope
    assert last["holt_forecast"] == pytest.approx(2.0 * 200, rel=0.02)


def test_holt_linear_matches_manual_recurrence(spark):
    from riptable_spark.operators.ema import holt_linear

    vals = [3.0, 7.0, 4.0, 9.0, 12.0]
    df = spark.createDataFrame([("k", t, v) for t, v in enumerate(vals)], "k string, t int, v double")
    out = holt_linear(df, ["k"], "v", "t", alpha=0.5, beta=0.4).orderBy("t").collect()
    lev, tr = vals[0], 0.0
    for i, r in enumerate(out):
        if i:
            prev = lev
            lev = 0.5 * vals[i] + 0.5 * (prev + tr)
            tr = 0.4 * (lev - prev) + 0.6 * tr
        assert r["holt_level"] == pytest.approx(lev, rel=1e-12)
        assert r["holt_trend"] == pytest.approx(tr, rel=1e-12, abs=1e-12)

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


def test_slope_one_hand_case(spark):
    # classic Lemire example: users rate items A=1,B=2 ; predictions are exact
    rows = [
        ("u1", "A", 5), ("u1", "B", 3),
        ("u2", "A", 3), ("u2", "B", 4),
        ("u3", "A", 2), ("u3", "B", 2),  # third co-rater
    ]
    from riptable_spark.operators.mining import slope_one_deviations, slope_one_predict

    df = spark.createDataFrame(rows, "user_id string, item string, rating long")
    devs = {(r.item_i, r.item_j): (r.s_ij, r.n_ij) for r in slope_one_deviations(df, "user_id", "item", "rating").collect()}
    # dev(A,B): (5-3)+(3-4)+(2-2) = 1 over 3 co-raters
    assert devs[("A", "B")] == (1, 3)
    assert devs[("B", "A")] == (-1, 3)
    preds = {(r.user_id, r.item): r for r in slope_one_predict(df, "user_id", "item", "rating").collect()}
    # P(u1, A) from B: (s_AB + r_B*n)/n = (1 + 3*3)/3
    assert preds[("u1", "A")].pred_num == 10 and preds[("u1", "A")].pred_den == 3


def test_label_propagation_two_cliques(spark):
    from riptable_spark.operators.dedup import label_propagation

    # two triangles joined by nothing: labels converge to each clique's min
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r.node: r.label for r in label_propagation(df, n_iter=4).collect()}
    assert {out[1], out[2], out[3]} == {1}
    assert {out[10], out[11], out[12]} == {10}


def test_burst_detect_flags_spike(spark):
    from riptable_spark.operators.window import burst_detect

    # 7 quiet days of 2 events, then a day with 10 -> burst
    rows = []
    for d in range(7):
        rows += [("k", 86400 * d + h) for h in (100, 200)]
    rows += [("k", 86400 * 7 + h) for h in range(10)]
    df = spark.createDataFrame(rows, "k string, sec long").select(
        "k", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = {r.bucket_start: r for r in burst_detect(df, ["k"], "ts", 86400, 7, 2, 1).collect()}
    assert out[86400 * 7].burst is True  # 10*7 > 2*14
    assert out[86400 * 3].burst is False
    assert out[0].burst is False  # no history -> not a burst


def test_elo_hand_case_and_zero_sum(spark):
    from riptable_spark.operators.mining import elo_ratings

    rows = [(1, 1, 10, 20, 1.0), (1, 2, 10, 30, 0.0), (1, 3, 20, 30, 0.5)]
    df = spark.createDataFrame(rows, "league long, t long, player_a long, player_b long, score_a double")
    out = {r.player: r for r in elo_ratings(df, "league", ["t"], k=32.0).collect()}
    # game 1: equal ratings, expected 0.5, winner +16
    assert abs(out[10].rating - (1500 + 16 + 32 * (0.0 - 1.0 / (1 + 10 ** ((1500 - 1516) / 400.0))))) < 1e-9
    # zero-sum invariant: Σ(rating - 1500) == 0 exactly
    assert sum(r.rating - 1500.0 for r in out.values()) == 0.0
    assert out[10].n_games == 2 and out[10].n_wins == 1


def test_intra_list_diversity_identical_vectors_is_zero(spark):
    from riptable_spark.operators.mining import intra_list_diversity

    vecs = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0]) for i in range(3)] + [(3, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    recs = spark.createDataFrame(
        [(1, 0, 1), (1, 1, 2), (1, 2, 3)], "query_id long, vec_id long, rank long"
    )
    out = intra_list_diversity(recs, vecs, k=3).collect()[0]
    assert out.n_pairs == 3 and abs(out.ild) < 1e-12
    assert out.coverage == 0.75  # 3 of 4 catalog items recommended


def test_abc_classification_hand_case(spark):
    from riptable_spark.operators.mining import abc_classification

    # values 50, 30, 15, 5 -> cum shares 50/80/95/100 -> A A B C at 80/95
    df = spark.createDataFrame(
        [("w", 50), ("x", 30), ("y", 15), ("z", 5)], "item string, v long"
    )
    out = {r.item: r.abc_class for r in abc_classification(df, "item", "v").collect()}
    assert out == {"w": "A", "x": "A", "y": "B", "z": "C"}


def test_price_index_doubling_prices(spark):
    from riptable_spark.operators.finance import price_index

    # every price doubles, quantities change arbitrarily -> all indices exactly 2
    rows = [(0, "a", 100, 5), (0, "b", 200, 3), (1, "a", 200, 9), (1, "b", 400, 1)]
    df = spark.createDataFrame(rows, "t long, item string, p long, q long")
    r = price_index(df, "t", "item", "p", "q", 0, 1).collect()[0]
    assert r.n_items == 2
    assert r.laspeyres == 2.0 and r.paasche == 2.0 and r.fisher == 2.0


def test_k_anonymity_flags_small_classes(spark):
    from riptable_spark.operators.profile import k_anonymity

    rows = [("a", 1, "s1")] * 6 + [("b", 2, "s1")] * 2 + [("b", 2, "s2")] * 1
    df = spark.createDataFrame(rows, "qi1 string, qi2 long, sens string")
    out = {(r.qi1, r.qi2): r for r in k_anonymity(df, ["qi1", "qi2"], k=5, sensitive_col="sens").collect()}
    assert out[("a", 1)].violates_k is False and out[("a", 1)].violates_l is True
    assert out[("b", 2)].n == 3 and out[("b", 2)].violates_k is True
    assert out[("b", 2)].l_distinct == 2 and out[("b", 2)].violates_l is False


def test_simpson_paradox_classic_example(spark):
    from riptable_spark.functions.stats import simpson_check

    # classic: treatment better within both segments, worse pooled
    rows = []
    rows += [("A", 1, 1)] * 81 + [("A", 1, 0)] * 6   # treat in A: 81/87
    rows += [("A", 0, 1)] * 234 + [("A", 0, 0)] * 36  # ctrl in A: 234/270
    rows += [("B", 1, 1)] * 192 + [("B", 1, 0)] * 71  # treat in B: 192/263
    rows += [("B", 0, 1)] * 55 + [("B", 0, 0)] * 25   # ctrl in B: 55/80
    df = spark.createDataFrame(rows, "seg string, t long, y long")
    out = {r.segment: r for r in simpson_check(df, "seg", "t", "y").collect()}
    assert out["A"].seg_sign == 1 and out["B"].seg_sign == 1
    assert out["A"].pooled_sign == -1
    assert out["A"].paradox is True and out["B"].paradox is True


def test_croston_constant_demand_fixpoint(spark):
    from riptable_spark.operators.ema import croston

    # demand 10 every 2nd period: z -> 10 exactly, p -> 2 exactly
    rows = [("k", i, 10 if i % 2 == 1 else 0) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, d long")
    r = croston(df, ["k"], "d", ["t"], alpha=0.3).collect()[0]
    assert r.z == 10.0 and r.p == 2.0
    assert r.forecast == 5.0
    assert r.n_demands == 20


def test_croston_sba_bias_correction(spark):
    from riptable_spark.operators.ema import croston

    rows = [("k", i, 10 if i % 2 == 1 else 0) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, t long, d long")
    r = croston(df, ["k"], "d", ["t"], alpha=0.3, variant="sba").collect()[0]
    assert r.forecast == (1 - 0.3 / 2) * 5.0


def test_pinball_loss_hand_case(spark):
    from riptable_spark.functions.stats import pinball_loss

    # tau=0.9: under-forecast (y>f) costs 9x the over-forecast per unit
    rows = [("k", 10, 8), ("k", 10, 12)]  # d=+2 -> 18 ; d=-2 -> 2 (scaled by 10)
    df = spark.createDataFrame(rows, "k string, y long, f long")
    r = pinball_loss(df, ["k"], "y", "f", 9, 10).collect()[0]
    assert r.sum_loss_scaled == 18 + 2
    assert r.pinball == 20 / (2 * 10)


def test_snm_pairs_window_semantics(spark):
    from riptable_spark.operators.dedup import snm_pairs

    # keys sort as a,b,c,...; window=2 pairs only adjacent ranks
    rows = [(1, "aa"), (2, "bb"), (3, "cc"), (4, "dd")]
    df = spark.createDataFrame(rows, "doc_id long, k string")
    pairs = {(r.id_a, r.id_b) for r in snm_pairs(df, "doc_id", "k", window=2).collect()}
    assert pairs == {(1, 2), (2, 3), (3, 4)}


def test_snm_pairs_ties_pair_once(spark):
    from riptable_spark.operators.dedup import snm_pairs

    df = spark.createDataFrame([(1, "aa"), (2, "aa"), (3, "zz")], "doc_id long, k string")
    out = snm_pairs(df, "doc_id", "k", window=2).collect()
    pairs = sorted((r.id_a, r.id_b) for r in out)
    assert pairs == [(1, 2)]  # tie pair once; zz is 2 ranks away


def test_sla_burn_flags(spark):
    from riptable_spark.operators.profile import sla_burn

    # 100 ok + 3 errors in one fast bucket -> 3*100 > 2*103 -> burning
    rows = [("svc", i, 1 if i < 3 else 0) for i in range(103)]
    df = spark.createDataFrame(rows, "k string, sec long, err long").select(
        "k", F.timestamp_seconds(F.col("sec")).alias("ts"), "err"
    )
    out = sla_burn(df, ["k"], "ts", "err", windows=[("fast", 300)], budget_num=2, budget_den=100).collect()
    assert len(out) == 1 and out[0].burning is True and out[0].n_err == 3


def test_hard_negatives_excludes_same_label(spark):
    from riptable_spark.operators.similarity import hard_negatives

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.99, 0.1], 0), (2, [0.9, 0.2], 1), (3, [0.0, 1.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    q = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)], "query_id long, query_vec array<double>, query_label int"
    )
    out = hard_negatives(vecs, q, k=2).collect()
    ids = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    assert ids == [2, 3]  # same-label 0 and 1 never rank


def test_holm_stepdown_stops_at_first_failure(spark):
    from riptable_spark.functions.stats import holm_bonferroni

    # m=4, alpha=0.05: p=(0.001, 0.01, 0.04, 0.05)
    # thresholds: 0.05/4=0.0125, /3=0.0167, /2=0.025, /1=0.05
    # 0.001<=0.0125 ok; 0.01<=0.0167 ok; 0.04>0.025 STOP; 0.05 not rejected
    df = spark.createDataFrame(
        [(1, 0.001), (2, 0.01), (3, 0.04), (4, 0.05)], "tid long, p double"
    )
    out = {r.tid: r for r in holm_bonferroni(df, "p", ["tid"]).collect()}
    assert [out[i].reject for i in (1, 2, 3, 4)] == [True, True, False, False]
    # adjusted p is the running max of p*(m-rank+1)
    assert out[1].adj_p == 0.004 and out[2].adj_p == 0.03


def test_scd2_build_intervals(spark):
    from riptable_spark.operators.merge import scd2_build

    rows = [
        ("k", 1_000_000, "a"), ("k", 2_000_000, "a"),  # no-op at t=2
        ("k", 3_000_000, "b"), ("k", 4_000_000, "a"),
    ]
    df = spark.createDataFrame(rows, "k string, us long, attr string").select(
        "k", F.timestamp_micros(F.col("us")).alias("ts"), "attr"
    )
    out = sorted(scd2_build(df, ["k"], "ts", ["attr"]).collect(), key=lambda r: r.version)
    assert len(out) == 3  # the t=2 heartbeat is dropped
    assert out[0].valid_from_us == 1_000_000 and out[0].valid_to_us == 3_000_000
    assert out[1].attr == "b" and out[1].valid_to_us == 4_000_000
    assert out[2].is_current is True and out[2].valid_to_us is None


def test_replay_eval_exact(spark):
    from riptable_spark.functions.stats import replay_eval

    rows = [("g", 0, 0, 10), ("g", 1, 0, 99), ("g", 2, 2, 20)]
    df = spark.createDataFrame(rows, "g string, logged long, policy long, reward long")
    r = replay_eval(df, ["g"], "logged", "policy", "reward").collect()[0]
    assert r.n_logged == 3 and r.n_matched == 2
    assert r.reward_sum == 30 and r.replay_value == 15.0


def test_lexical_diversity_hand_case(spark):
    from riptable_spark.operators.text import lexical_diversity

    df = spark.createDataFrame(
        [(1, "the cat and the dog and a bird"), (2, None), (3, "x x x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lexical_diversity(df).collect()}
    # doc 1: 8 tokens; types: the(2) cat and(2) dog a bird -> 6 types, 4 hapax
    assert out[1].n_tokens == 8 and out[1].n_types == 6
    assert out[1].hapax_rate == 4 / 6
    assert out[3].n_tokens == 3 and out[3].n_types == 1 and out[3].hapax_rate == 0.0
    assert out[2].n_tokens == 0 and out[2].ttr is None


def test_seq_pairs_counts_user_once(spark):
    from riptable_spark.operators.mining import seq_pairs

    rows = [
        ("u1", "a", 0), ("u1", "b", 10), ("u1", "a", 20), ("u1", "b", 30),  # a->b twice
        ("u2", "a", 0), ("u2", "b", 5),
        ("u3", "b", 0), ("u3", "a", 5),  # only b->a
    ]
    df = spark.createDataFrame(rows, "u string, i string, sec long").select(
        "u", "i", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = {(r.item_a, r.item_b): r.n_users for r in seq_pairs(df, "u", "i", "ts").collect()}
    assert out[("a", "b")] == 2  # u1 counted once despite two occurrences
    assert out[("b", "a")] == 2  # u1 (b@10 -> a@20) and u3


def test_seq_pairs_gap_bound(spark):
    from riptable_spark.operators.mining import seq_pairs

    rows = [("u", "a", 0), ("u", "b", 7200)]
    df = spark.createDataFrame(rows, "u string, i string, sec long").select(
        "u", "i", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    within = seq_pairs(df, "u", "i", "ts", max_gap_seconds=7200, min_users=1).collect()
    beyond = seq_pairs(df, "u", "i", "ts", max_gap_seconds=7199, min_users=1).collect()
    assert len(within) == 1 and len(beyond) == 0


def test_golden_record_strategies(spark):
    from riptable_spark.operators.dedup import golden_record

    rows = [
        (1, 10, None, "x", 100),
        (1, 20, 55, "y", 200),   # latest non-null val at t=20
        (1, 30, None, "y", 300),
        (1, 5, 44, "z", 50),
    ]
    df = spark.createDataFrame(rows, "component long, t long, val long, name string, score long")
    r = golden_record(
        df, "component", {"val": "latest", "score": "max", "name": "mode"}, order_col="t"
    ).collect()[0]
    assert r.val == 55      # latest among non-null (t=20 beats t=5)
    assert r.score == 300
    assert r.name == "y"    # y appears twice
    assert r.n_members == 4


def test_srm_check_balanced_is_zero(spark):
    from riptable_spark.functions.stats import srm_check

    rows = [("g", "a")] * 50 + [("g", "b")] * 50
    df = spark.createDataFrame(rows, "k string, arm string")
    r = srm_check(df, ["k"], "arm", {"a": 1, "b": 1}).collect()[0]
    assert r.chi2 == 0.0 and r.n_a == 50 and r.dof == 1


def test_rev_schedule_sums_exactly(spark):
    from riptable_spark.operators.finance import rev_schedule

    df = spark.createDataFrame([(1, 1001, 0, 3), (2, 7, 5, 4)], "cid long, amount long, sp long, np int")
    out = rev_schedule(df, ["cid"], "amount", "sp", "np").collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r.cid, []).append((r.period, r.amount_p))
    # 1001 over 3: 334, 334, 333 ; 7 over 4: 2,2,2,1
    assert sorted(a for _, a in by_c[1]) == [333, 334, 334]
    assert sum(a for _, a in by_c[1]) == 1001
    assert sorted(a for _, a in by_c[2]) == [1, 2, 2, 2]
    assert [p for p, _ in sorted(by_c[2])] == [5, 6, 7, 8]


def test_mrr_movements_reconciles(spark):
    from riptable_spark.operators.finance import mrr_movements

    rows = [
        ("c1", 0, 100), ("c1", 1, 150),            # expansion 50
        ("c2", 0, 200),                            # churns in p1
        ("c3", 1, 80),                             # new in p1
        ("c4", 0, 50), ("c4", 1, 30),              # contraction 20
    ]
    df = spark.createDataFrame(rows, "c string, p long, a long")
    out = {r.period: r for r in mrr_movements(df, "c", "p", "a").collect()}
    p1 = out[1]
    assert p1.new_mrr == 80 and p1.expansion == 50
    assert p1.contraction == 20 and p1.churned == 200
    # net reconciles: mrr(1) - mrr(0) = 260 - 350 = -90
    assert p1.net_change == p1.mrr - out[0].mrr == -90


def test_c_chart_flags_outlier_day(spark):
    from riptable_spark.operators.window import c_chart

    # 9 days of 5 events + 1 day of 50: mu=9.5, 3sigma ~ 9.2 -> 50 flags high
    rows = []
    for d in range(9):
        rows += [("k", 86400 * d + h) for h in range(5)]
    rows += [("k", 86400 * 9 + h) for h in range(50)]
    df = spark.createDataFrame(rows, "k string, sec long").select(
        "k", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = {r.bucket_start // 86400: r for r in c_chart(df, ["k"], "ts").collect()}
    assert out[9].out_high is True
    assert out[0].out_high is False and out[0].out_low is False


def test_missing_partitions_finds_hole(spark):
    from riptable_spark.operators.profile import missing_partitions

    # days 0,1,3,4 present; day 2 missing
    rows = [("k", 86400 * d) for d in (0, 1, 3, 4)]
    df = spark.createDataFrame(rows, "k string, sec long").select(
        "k", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = missing_partitions(df, ["k"], "ts").collect()
    assert [(r.k, r.bucket_start) for r in out] == [("k", 2 * 86400)]


def test_trending_terms_cross_mult(spark):
    from riptable_spark.operators.retrieval import trending_terms

    docs = spark.createDataFrame(
        [(0, "apple apple apple banana"), (1, "banana banana banana banana")],
        "doc_id long, text string",
    )
    out = trending_terms(docs, F.col("doc_id"), min_count=3, lift_num=3, lift_den=2).collect()
    rows = {(r.period, r.term): r for r in out}
    # apple: 3 of 4 tokens in p0, 3 of 8 overall -> lift = (3/4)/(3/8) = 2 > 1.5
    assert rows[(0, "apple")].trending is True and rows[(0, "apple")].lift == 2.0
    # banana p1: (4/4)/(5/8) = 1.6 > 1.5
    assert rows[(1, "banana")].trending is True


def test_yuen_ignores_tail_outliers(spark):
    from riptable_spark.functions.stats import yuen_trimmed_t

    # identical middles; group b has wild tails that a 10% trim removes
    a = [("a", v) for v in range(10, 30)]
    b = [("b", v) for v in range(10, 30)]
    b[0] = ("b", -100000)
    b[-1] = ("b", 100000)
    df = spark.createDataFrame(a + b, "g string, x long")
    r = yuen_trimmed_t(df, "g", "x", "a", "b").collect()[0]
    # 10% trim of n=20 removes 2 each side; trimmed means use ranks 3..18
    assert r.h_a == 16 and r.h_b == 16
    # outliers sat at the tails, so the trimmed means are close and |t| small
    assert abs(r.tmean_a - r.tmean_b) < 1.0


def test_dup_charges_window(spark):
    from riptable_spark.operators.finance import dup_charges

    rows = [
        (1, 500, 0, 100), (1, 500, 1800, 101),     # dup within 1h
        (1, 500, 90000, 102),                       # same amount, next day
        (1, 700, 60, 103),                          # different amount
        (2, 500, 30, 104),                          # different account
    ]
    df = spark.createDataFrame(rows, "acct long, amt long, sec long, txn long").select(
        "acct", "amt", F.timestamp_seconds(F.col("sec")).alias("ts"), "txn"
    )
    out = dup_charges(df, "acct", "amt", "ts", "txn", 3600).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(100, 101)]
    assert out[0].gap_seconds == 1800.0


def test_apdex_hand_case(spark):
    from riptable_spark.operators.profile import apdex

    # 6 satisfied, 2 tolerating, 2 frustrated -> (12+2)/20 = 0.7
    lat = [100] * 6 + [2500] * 2 + [9000] * 2
    df = spark.createDataFrame([("k", v) for v in lat], "k string, lat long")
    r = apdex(df, ["k"], "lat", threshold=1000).collect()[0]
    assert (r.satisfied, r.tolerating, r.frustrated) == (6, 2, 2)
    assert r.apdex == 0.7


def test_theil_sen_full_recovers_line_with_outlier(spark):
    from riptable_spark.functions.stats import theil_sen_full

    # y = 3x + 7 with one wild outlier the median slope shrugs off
    pts = [("k", x, 3 * x + 7) for x in range(15)] + [("k", 20, -500)]
    df = spark.createDataFrame(pts, "k string, x long, y long")
    r = theil_sen_full(df, ["k"], "x", "y").collect()[0]
    assert r.slope == 3.0
    assert r.intercept == 7.0


def test_bloom_semi_join_equals_plain_semi(spark):
    from riptable_spark.operators.pipeline import bloom_semi_join

    big = spark.createDataFrame([(i, i * 10) for i in range(200)], "k long, v long")
    small = spark.createDataFrame([(i,) for i in range(0, 200, 7)], "k long")
    out = bloom_semi_join(big, small, "k", n_items=50)
    expect = big.join(small, on="k", how="left_semi")
    assert sorted(r.k for r in out.collect()) == sorted(r.k for r in expect.collect())


def test_log_templates_masks(spark):
    from riptable_spark.operators.text import log_templates

    lines = [
        "GET /u/12 took 8ms", "GET /u/99 took 1200ms",
        "ERR deadbeef01 conn reset", "ERR cafebabe99 conn reset",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    out = {r.template: r for r in log_templates(df, "line").collect()}
    assert out["GET /u/<N> took <N>ms"].n == 2
    assert out["ERR <HEX> conn reset"].n == 2
    assert out["GET /u/<N> took <N>ms"].example == "GET /u/12 took 8ms"


def test_first_seen_novelty(spark):
    from riptable_spark.operators.profile import first_seen_novelty

    rows = [("u1", "a", 0), ("u1", "a", 86400), ("u2", "a", 86400), ("u1", "b", 2 * 86400)]
    df = spark.createDataFrame(rows, "u string, e string, sec long").select(
        "u", "e", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = {r.bucket_start // 86400: r for r in first_seen_novelty(df, ["u", "e"], "ts").collect()}
    assert out[0].n_new == 1 and out[1].n_new == 1 and out[2].n_new == 1
    assert out[2].cum_entities == 3


def test_class_weights_rational(spark):
    from riptable_spark.operators.pipeline import class_weights

    rows = [("a",)] * 30 + [("b",)] * 10
    df = spark.createDataFrame(rows, "label string")
    out = {r.label: r for r in class_weights(df, "label").collect()}
    assert out["a"].weight == 40 / (2 * 30) and out["b"].weight == 2.0
    assert out["b"].weight_num == 40 and out["b"].weight_den == 20


def test_settlement_skips_weekend_and_holiday(spark):
    from riptable_spark.functions.calendar import Calendar

    cal = Calendar(holidays=["2024-01-01"])
    # Friday 2023-12-29 + 2 business days: skip weekend + New Year -> Wed 2024-01-03
    df = spark.createDataFrame([("2023-12-29",)], "d string").select(
        F.to_date("d").alias("trade")
    )
    out = df.select(
        F.date_format(cal.add_business_days(F.col("trade"), 2), "yyyy-MM-dd").alias("s")
    ).collect()[0]
    assert out.s == "2024-01-03"


def test_sq8_reconstruction_error_bounded(spark):
    from riptable_spark.operators.similarity import sq8_params, sq8_reconstructed

    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    params = sq8_params(df, dim=8)
    rec = sq8_reconstructed(df, params, dim=8)
    orig = {r.vec_id: r.embedding for r in df.collect()}
    p = params.collect()[0]
    for r in rec.collect():
        for i, (a, b) in enumerate(zip(orig[r.vec_id], r.embedding)):
            step = (p.maxs[i] - p.mins[i]) / 255.0
            assert abs(a - b) <= step / 2 + 1e-12  # midpoint decode error bound


def test_iv_recovers_known_effect(spark):
    from riptable_spark.functions.stats import iv_estimate

    # z randomizes x by +3; y = 2x exactly -> beta_iv = 2
    rows = [(i % 2, (i * 13) % 10 + 3 * (i % 2)) for i in range(1000)]
    df = spark.createDataFrame(
        [(z, x, 2 * x) for z, x in rows], "z long, x long, y long"
    )
    r = iv_estimate(df, "z", "x", "y").collect()[0]
    assert r.beta_iv == 2.0
    assert r.first_stage is not None and r.first_stage > 0


def test_forecast_ensemble_weights_better_model(spark):
    from riptable_spark.functions.stats import forecast_ensemble_imae

    # fa is perfect (mae 0) -> blend == fa exactly, mae_blend == 0
    rows = [("k", v, v, v + 10) for v in range(10, 50)]
    df = spark.createDataFrame(rows, "k string, y long, fa long, fb long")
    r = forecast_ensemble_imae(df, ["k"], "y", "fa", "fb").collect()[0]
    assert r.mae_a == 0.0 and r.mae_b == 10.0
    assert r.mae_blend == 0.0  # weight of fb is mae_a/(ea+eb) = 0


def test_multilabel_prf_hand_case(spark):
    from riptable_spark.functions.stats import multilabel_prf

    rows = [
        ([1, 2], [1, 2]),      # exact match: inter 2
        ([1, 2, 3], [2, 4]),   # inter 1, pred 2, true 3
        ([5], [6]),            # inter 0
    ]
    df = spark.createDataFrame(rows, "t array<long>, p array<long>")
    r = multilabel_prf(df, "t", "p").collect()[0]
    assert r.inter_sum == 3 and r.pred_sum == 5 and r.true_sum == 6
    assert r.micro_p == 3 / 5 and r.micro_r == 3 / 6
    assert r.micro_f1 == 6 / 11
    assert r.n_exact == 1 and r.subset_accuracy == 1 / 3


def test_dirichlet_qlm_ranks_matching_doc_first(spark):
    from riptable_spark.operators.retrieval import dirichlet_qlm

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark shuffle"),
            (2, "spark shuffle join join"),
            (3, "completely unrelated words here"),
        ],
        "doc_id long, text string",
    )
    out = sorted(dirichlet_qlm(docs, ["spark"], mu=10, k=3).collect(), key=lambda r: r.rank)
    assert out[0].doc_id == 1  # highest tf for 'spark'
    assert all(r.score > 0 for r in out)
    # doc 3 has no query term and must not appear
    assert 3 not in {r.doc_id for r in out}


def test_var_es_hand_case(spark):
    from riptable_spark.operators.finance import var_es

    # pnl = -100..-81 then 80 positives; 5% of 100 -> 5 worst
    vals = list(range(-100, -80)) + list(range(1, 81))
    df = spark.createDataFrame([("k", v) for v in vals], "k string, pnl long")
    r = var_es(df, ["k"], "pnl", 5, 100).collect()[0]
    assert r.tail_n == 5
    assert r.var == -96  # 5th worst
    assert r.es == (-100 - 99 - 98 - 97 - 96) / 5


def test_portfolio_turnover_no_change_is_zero(spark):
    from riptable_spark.operators.finance import portfolio_turnover

    rows = [(0, "x", 60), (0, "y", 40), (1, "x", 120), (1, "y", 80)]  # same weights, 2x scale
    df = spark.createDataFrame(rows, "p long, a string, v long")
    out = {r.period: r for r in portfolio_turnover(df, "p", "a", "v").collect()}
    assert out[1].turnover == 0.0


def test_portfolio_turnover_full_swap_is_one(spark):
    from riptable_spark.operators.finance import portfolio_turnover

    rows = [(0, "x", 100), (1, "y", 100)]
    df = spark.createDataFrame(rows, "p long, a string, v long")
    out = {r.period: r for r in portfolio_turnover(df, "p", "a", "v").collect()}
    assert out[1].turnover == 1.0


def test_chain_ladder_hand_triangle(spark):
    from riptable_spark.operators.finance import chain_ladder

    # classic 3x3 cumulative triangle (given as increments):
    # origin 0: 100, +50, +10 ; origin 1: 200, +100 ; origin 2: 400
    rows = [(0, 0, 100), (0, 1, 50), (0, 2, 10), (1, 0, 200), (1, 1, 100), (2, 0, 400)]
    df = spark.createDataFrame(rows, "origin long, dev int, a long")
    out = {r.origin: r for r in chain_ladder(df, "origin", "dev", "a", max_dev=3).collect()}
    # f0 = (150+300)/(100+200) = 1.5 ; f1 = 160/150
    assert out[0].ultimate == 160.0 and out[0].reserve == 0.0
    assert out[1].ultimate == 300 * (160 / 150)
    assert out[2].ultimate == ((400 * 450) / 300) * 160 / 150


def test_dtw_identity_and_symmetry(spark):
    from riptable_spark.operators.ema import dtw_pairs

    a = [5, 9, 2, 7, 7, 3]
    rows = []
    for t, v in enumerate(a):
        rows += [("same|x", "a", t, v), ("same|x", "b", t, v)]
    # shifted copy: DTW should be far below L1 of misaligned series
    b = [0] + a[:-1]
    for t in range(len(a)):
        rows += [("shift|x", "a", t, a[t]), ("shift|x", "b", t, b[t])]
        rows += [("rev|x", "a", t, a[t]), ("rev|x", "b", t, a[len(a) - 1 - t])]
    df = spark.createDataFrame(rows, "pair string, side string, t long, v long")
    out = {r.pair: r.dtw for r in dtw_pairs(df, "pair", "side", ["t"], "v").collect()}
    assert out["same|x"] == 0
    l1_shift = sum(abs(x - y) for x, y in zip(a, b))
    assert out["shift|x"] <= l1_shift
    # symmetry: dtw(a, rev) == dtw(rev, a) by construction of the DP
    rows2 = []
    for t in range(len(a)):
        rows2 += [("r2|x", "a", t, a[len(a) - 1 - t]), ("r2|x", "b", t, a[t])]
    df2 = spark.createDataFrame(rows2, "pair string, side string, t long, v long")
    out2 = dtw_pairs(df2, "pair", "side", ["t"], "v").collect()[0].dtw
    assert out2 == out["rev|x"]


def test_bellman_ford_line_graph(spark):
    from riptable_spark.operators.dedup import bellman_ford

    # path 0-1-2-3 with weights 5, 1, 7 ; source {0}
    edges = [(0, 1, 5), (1, 0, 5), (1, 2, 1), (2, 1, 1), (2, 3, 7), (3, 2, 7)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in bellman_ford(e, s, n_rounds=3).collect()}
    assert out == {0: 0, 1: 5, 2: 6, 3: 13}


def test_bellman_ford_takes_cheaper_detour(spark):
    from riptable_spark.operators.dedup import bellman_ford

    # direct 0->2 costs 10; detour via 1 costs 2+3=5
    edges = [(0, 2, 10), (0, 1, 2), (1, 2, 3)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    s = spark.createDataFrame([(0,)], "node long")
    out = {r.node: r.dist for r in bellman_ford(e, s, n_rounds=2).collect()}
    assert out[2] == 5


def test_viterbi_decodes_regimes(spark):
    from riptable_spark.operators.ema import viterbi_two_state

    # 5 quiet days (~10), 5 bursty (~30), 5 quiet; switch cost forbids flicker
    obs = [10, 11, 9, 10, 12, 30, 29, 31, 30, 28, 10, 9, 11, 10, 10]
    rows = [("k", t, v) for t, v in enumerate(obs)]
    df = spark.createDataFrame(rows, "k string, t long, v long")

    def emit(state, o):
        return abs(int(o) - (30 if state == 1 else 10))

    out = sorted(viterbi_two_state(df, ["k"], ["t"], "v", emit, switch_cost=5).collect(),
                 key=lambda r: r.t)
    path = [r.state for r in out]
    assert path == [0] * 5 + [1] * 5 + [0] * 5
    # dominance: the best cost beats both constant paths
    all0 = sum(abs(v - 10) for v in obs)
    all1 = sum(abs(v - 30) for v in obs)
    assert out[0].total_cost <= min(all0, all1)
    # exact cost: emissions of the true path + 2 switches * 5
    emis = sum(abs(v - (30 if 5 <= t < 10 else 10)) for t, v in enumerate(obs))
    assert out[0].total_cost == emis + 10


def test_mmr_diversifies(spark):
    from riptable_spark.operators.similarity import mmr_rerank

    # three near-duplicates of the query direction + one orthogonal:
    # plain top-3 would pick the three dupes; MMR must bring in the
    # orthogonal item by rank 3
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, [0.998, 0.02]),
            (4, [0.2, 0.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    # with the query equal to item 1, rel(i) == sim(i, item1), so
    # lambda=0.5 ties every round-2 score at 0 — use a diversity-leaning
    # lambda to make the orthogonal item win round 2
    out = sorted(
        mmr_rerank(vecs, q, k_candidates=4, k_select=3, lam_pct=30).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert out[0].vec_id == 1            # pure relevance first
    assert out[1].vec_id == 4            # diversity term promotes the orthogonal item


def test_t_closeness_uniform_class_passes(spark):
    from riptable_spark.operators.profile import t_closeness

    # big class A close to the global mix; tiny all-'x' class B leaks
    rows = [("A", "x")] * 8 + [("A", "y")] * 8 + [("B", "x")] * 4
    df = spark.createDataFrame(rows, "qi string, s string")
    out = {r.qi: r for r in t_closeness(df, ["qi"], "s", 1, 5).collect()}
    # A: |8*20 - 12*16| = 32 -> 32/(16*20) = 0.1 ; B: 32/(4*20) = 0.4
    assert out["A"].emd == 0.1 and out["B"].emd == 0.4
    assert out["A"].violates_t is False and out["B"].violates_t is True


def test_rd_recovers_jump(spark):
    from riptable_spark.functions.stats import rd_estimate

    # y = 2x + 100·1[x>=50], no noise: effect must be exactly 100
    rows = [(x, 2 * x + (100 if x >= 50 else 0)) for x in range(0, 101)]
    df = spark.createDataFrame(rows, "run long, y long")
    r = rd_estimate(df, "run", "y", cutoff=50, bandwidth=30).collect()[0]
    assert r.slope_left == 2.0 and r.slope_right == 2.0
    assert r.effect == 100.0


def test_degree_assortativity_star_is_negative(spark):
    from riptable_spark.operators.mining import degree_assortativity

    # star graph: hub 0 to leaves 1..5 -> perfectly disassortative (-1)
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    assert r.n_edges == 5 and r.assortativity == -1.0


def test_hodges_lehmann_shrugs_off_outlier(spark):
    from riptable_spark.functions.stats import hodges_lehmann

    vals = list(range(100, 121)) + [100000]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, x long")
    r = hodges_lehmann(df, ["k"], "x").collect()[0]
    # HL stays near the bulk center despite the huge outlier
    assert 100 <= r.hl_estimate <= 125
    assert r.n == 22 and r.n_pairs == 22 * 23 // 2


def test_raking_hits_both_margins(spark):
    from riptable_spark.functions.stats import raking_ipf

    rows = [("a", "x")] * 30 + [("a", "y")] * 10 + [("b", "x")] * 20 + [("b", "y")] * 40
    df = spark.createDataFrame(rows, "r string, c string")
    out = raking_ipf(df, "r", "c", {"a": 50, "b": 50}, {"x": 60, "y": 40}).collect()
    # column targets hold exactly after the column pass
    from collections import defaultdict
    col_mass = defaultdict(float)
    for rr in out:
        col_mass[rr.c] += rr.weighted_mass
    assert abs(col_mass["x"] - 60) < 1e-9 and abs(col_mass["y"] - 40) < 1e-9
    # weights are positive and cells complete
    assert len(out) == 4 and all(rr.weight > 0 for rr in out)


def test_time_decay_attribution_dyadic_weights(spark):
    from riptable_spark.operators.window import attribute_time_decay

    day = 86_400_000_000
    # touches 0, 7, 14 days before a conversion at t=14d (half-life 7d):
    # buckets 2, 1, 0 -> scaled weights 1, 2, 4 ; credits 1/7, 2/7, 4/7
    rows = [
        ("u", 0, 1, 1, 0), ("u", 7 * 86400, 2, 1, 0), ("u", 14 * 86400 - 1, 3, 1, 0),
        ("u", 14 * 86400, 4, 0, 1),
    ]
    df = spark.createDataFrame(rows, "u string, sec long, eid long, touch int, conv int").select(
        "u", F.timestamp_seconds(F.col("sec")).alias("ts"), "eid", "touch", "conv"
    )
    out = sorted(
        attribute_time_decay(df, "u", "ts", "touch", "conv", 7, "eid").collect(),
        key=lambda r: r.eid,
    )
    assert [r.weight_scaled for r in out] == [1, 2, 4]
    assert [r.total_scaled for r in out] == [7, 7, 7]
    assert abs(sum(r.credit for r in out) - 1.0) < 1e-12


def test_lob_match_hand_case(spark):
    from riptable_spark.operators.finance import lob_match

    # sell 5@100 rests; buy 3@101 crosses at RESTING price 100;
    # buy 4@99 rests (no cross); sell 2@98 crosses best bid 99
    rows = [
        ("X", 1, 1, "S", 100, 5),
        ("X", 2, 2, "B", 101, 3),
        ("X", 3, 3, "B", 99, 4),
        ("X", 4, 4, "S", 98, 2),
    ]
    df = spark.createDataFrame(rows, "sym string, t long, oid long, side string, px long, qty long")
    tape = sorted(
        lob_match(df, "sym", ["t", "oid"], "side", "px", "qty", "oid").collect(),
        key=lambda r: r.seq,
    )
    assert [(r.buy_id, r.sell_id, r.price, r.qty) for r in tape] == [
        (2, 1, 100, 3),   # buy 2 fills against resting sell 1 at 100
        (3, 4, 99, 2),    # sell 4 hits resting bid 3 at 99
    ]


def test_lob_match_conservation_and_priority(spark):
    from riptable_spark.operators.finance import lob_match

    # two resting sells at same price: earlier one must fill first
    rows = [
        ("X", 1, 1, "S", 100, 2),
        ("X", 2, 2, "S", 100, 2),
        ("X", 3, 3, "B", 100, 3),
    ]
    df = spark.createDataFrame(rows, "sym string, t long, oid long, side string, px long, qty long")
    tape = sorted(
        lob_match(df, "sym", ["t", "oid"], "side", "px", "qty", "oid").collect(),
        key=lambda r: (r.seq, r.sell_id),
    )
    assert [(r.sell_id, r.qty) for r in tape] == [(1, 2), (2, 1)]  # time priority
    assert sum(r.qty for r in tape) == 3  # conservation: buy qty fully matched

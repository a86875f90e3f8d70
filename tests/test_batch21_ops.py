"""Round-4 operator batch: winnowing fingerprint sketches + NFC."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _fps(spark, rows, k, w, **kw):
    from riptable_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_fingerprints(df, "text", "doc_id", k=k, w=w, **kw)


def test_winnow_guarantee_shared_run(spark):
    """The MOSS guarantee: two documents sharing a run of >= w+k-1
    tokens must share at least one fingerprint, wherever the run sits
    inside otherwise-disjoint text."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo"
    rows = [
        (1, "x1 x2 x3 x4 " + shared + " y1 y2"),
        (2, "z9 z8 " + shared + " w1 w2 w3 w4 w5"),
    ]
    # k=4, w=8: shared run has 11 = w+k-1 tokens -> guaranteed hit
    out = _fps(spark, rows, k=4, w=8).collect()
    fp1 = {r["fp"] for r in out if r["doc_id"] == 1}
    fp2 = {r["fp"] for r in out if r["doc_id"] == 2}
    assert fp1 & fp2, "guaranteed shared fingerprint missing"


def test_winnow_disjoint_docs_share_nothing(spark):
    rows = [
        (1, " ".join(f"a{i}" for i in range(30))),
        (2, " ".join(f"b{i}" for i in range(30))),
    ]
    out = _fps(spark, rows, k=4, w=3).collect()
    fp1 = {r["fp"] for r in out if r["doc_id"] == 1}
    fp2 = {r["fp"] for r in out if r["doc_id"] == 2}
    assert not (fp1 & fp2)


def test_winnow_density_near_theory(spark):
    """Sketch size ~ 2/(w+1) of k-gram count on random-ish text (the
    winnowing paper's expected density), and never more than the
    window count."""
    import random

    rng = random.Random(7)
    text = " ".join(f"t{rng.randrange(10_000)}" for _ in range(3_000))
    k, w = 6, 9
    out = _fps(spark, [(1, text)], k=k, w=w).count()
    n_kgrams = 3_000 - k + 1
    density = out / n_kgrams
    assert 1.0 / w <= density <= 3.0 / (w + 1), density


def test_winnow_rightmost_tie_and_selection_hand_case(spark):
    """Hand-checkable selection: with w=2 every adjacent hash pair
    picks its min; verify positions against a python replay of the
    same rightmost-min rule."""
    import hashlib

    text = "m n o p q r s t u v"
    k, w = 3, 2
    toks = text.split(" ")
    hs = []
    for i in range(len(toks) - k + 1):
        s = " ".join(toks[i : i + k])
        hs.append(int(hashlib.md5(s.encode()).hexdigest()[:15], 16))
    expect = set()
    for j in range(len(hs) - w + 1):
        win = hs[j : j + w]
        mn = min(win)
        rp = list(reversed(win)).index(mn) + 1  # first in reversed = rightmost
        expect.add((j + w - rp, mn))
    out = {
        (r["pos"], r["fp"])
        for r in _fps(spark, [(1, text)], k=k, w=w, hash_kind="md5").collect()
    }
    assert out == expect


def test_winnow_matches_min_docs_and_skew_cap(spark):
    from riptable_spark.operators.dedup import winnow_matches

    boiler = "one two three four five six seven eight nine ten eleven twelve"
    rows = [(i, f"head{i} " + boiler + f" tail{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m = winnow_matches(df, k=4, w=4, min_docs=2).collect()
    assert m and all(r["n_docs"] >= 2 for r in m)
    capped = winnow_matches(df, k=4, w=4, min_docs=2, max_docs=3).collect()
    assert not capped  # every shared fp spans all 6 docs -> capped away


def test_remove_winnowed_spans_hand_case(spark):
    """Docs sharing a long run get it cut; disjoint docs pass through
    normalized-but-intact; fully-boilerplate docs empty out."""
    from riptable_spark.operators.dedup import remove_winnowed_spans

    run = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10 c11 c12"
    rows = [
        (1, "u1 u2 " + run + " v1"),
        (2, "w1 " + run + " x1 x2"),
        (3, " ".join(f"solo{i}" for i in range(20))),
        (4, run),  # nothing but the shared run (plus nothing else)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_winnowed_spans(
        df, k=4, w=4, min_docs=2).collect()}
    assert out[3]["n_removed"] == 0
    assert out[3]["text_clean"] == " ".join(f"solo{i}" for i in range(20))
    for d in (1, 2):
        assert out[d]["n_removed"] > 0
        assert "c5" not in out[d]["text_clean"].split()
    assert out[4]["text_clean"] == "" and out[4]["n_removed"] == out[4]["n_before"]


def test_normalize_nfc_semantics(spark):
    """Composed == decomposed after NFC; ASCII and NULL pass through;
    idempotent."""
    from riptable_spark.operators.text import normalize_nfc

    rows = [
        (1, "caf" + "é"),   # decomposed e + combining acute
        (2, "café"),         # precomposed
        (3, "plain ascii"),
        (4, None),
        (5, "가"),       # Hangul jamo pair -> U+AC00
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text_nfc"] for r in normalize_nfc(df).collect()}
    assert out[1] == out[2] == "café"
    assert out[3] == "plain ascii"
    assert out[4] is None
    assert out[5] == "가"
    again = normalize_nfc(
        spark.createDataFrame([(1, out[1])], "doc_id long, text string")
    ).collect()[0]["text_nfc"]
    assert again == out[1]


def test_winnow_shared_runs_diagonal_chaining(spark):
    """Two docs sharing one long run report ONE dominant diagonal whose
    span lower-bounds the true run length and sits inside it."""
    from riptable_spark.operators.dedup import winnow_shared_runs

    run_toks = [f"r{i}" for i in range(40)]
    rows = [
        (1, "a1 a2 a3 " + " ".join(run_toks) + " a4"),
        (2, " ".join(run_toks) + " b1 b2 b3 b4 b5"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_shared_runs(df, k=5, w=4, min_anchors=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["diag"]) == (1, 2, 3)  # doc1 offset 3
    assert r["run_len"] <= 40                      # lower bound, never over
    assert r["run_len"] >= 40 - (4 + 5 - 1)        # sketch can miss < w+k-1 at edges
    assert r["start_a"] - r["diag"] == r["start_b"]
    assert r["n_anchors"] >= 2


def test_winnow_verify_runs_exact_extension(spark):
    """The verifier must (a) confirm the sketch's lower-bound span, and
    (b) extend it to the TRUE maximal run — which the sketch alone can
    under-report by up to w+k-2 tokens at each edge."""
    from riptable_spark.operators.dedup import winnow_verify_runs

    run_toks = [f"r{i}" for i in range(40)]
    rows = [
        (1, "a1 a2 a3 " + " ".join(run_toks) + " a4"),
        (2, "b9 " + " ".join(run_toks) + " b1 b2 b3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_verify_runs(df, k=5, w=4, min_anchors=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["run_exact"] is True
    assert r["true_start_a"] == 3 and r["true_len"] == 40  # exact maximal run
    assert r["true_len"] >= r["run_len"]


def test_winnow_verify_runs_flags_inexact_diagonal(spark):
    """A diagonal stitched from two separate shared runs (same offset,
    mismatching middle) must verify run_exact=False and keep the
    sketch's span untouched."""
    from riptable_spark.operators.dedup import winnow_verify_runs

    r1 = [f"p{i}" for i in range(12)]
    r2 = [f"q{i}" for i in range(12)]
    rows = [
        (1, " ".join(r1) + " mid1a mid1b " + " ".join(r2)),
        (2, " ".join(r1) + " mid2a mid2b " + " ".join(r2)),  # same offsets!
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_verify_runs(df, k=4, w=3, min_anchors=2).collect()
    assert len(out) == 1  # both runs share diag 0 -> one stitched span
    r = out[0]
    assert r["run_exact"] is False
    assert r["true_len"] == r["run_len"] and r["true_start_a"] == r["start_a"]


def test_winnow_incremental_screens_against_index(spark):
    from riptable_spark.operators.dedup import winnow_incremental, winnow_index

    boiler = " ".join(f"b{i}" for i in range(20))
    old = spark.createDataFrame(
        [(1, "x " + boiler), (2, boiler + " y z")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [
            (10, "h1 h2 " + boiler),                      # dup of history
            (11, " ".join(f"fresh{i}" for i in range(25))),  # novel
            (12, "tiny doc"),                              # too short: passes
        ],
        "doc_id long, text string",
    )
    idx = winnow_index(old, k=4, w=4)
    out = {r["doc_id"]: r for r in winnow_incremental(
        new, idx, k=4, w=4, min_hits=2).collect()}
    assert out[10]["is_dup"] and out[10]["n_hits"] >= 2
    assert not out[11]["is_dup"] and out[11]["n_hits"] == 0 and out[11]["n_fps"] > 0
    assert not out[12]["is_dup"] and out[12]["n_fps"] == 0


def test_winnow_incremental_duplicated_index_invariant(spark):
    """The documented maintenance pattern (union winnow_index outputs
    across runs) produces duplicate fps in the seen index; the screen
    must return identical counts for a self-unioned index (a duplicated
    join key must not multiply rows into n_fps / n_hits)."""
    from riptable_spark.operators.dedup import winnow_incremental, winnow_index

    boiler = " ".join(f"b{i}" for i in range(20))
    old = spark.createDataFrame(
        [(1, "x " + boiler), (2, boiler + " y z")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "h1 h2 " + boiler),
         (11, " ".join(f"fresh{i}" for i in range(25)))],
        "doc_id long, text string",
    )
    idx = winnow_index(old, k=4, w=4)
    clean = {r["doc_id"]: (r["n_fps"], r["n_hits"], r["is_dup"])
             for r in winnow_incremental(new, idx, k=4, w=4).collect()}
    doubled = {r["doc_id"]: (r["n_fps"], r["n_hits"], r["is_dup"])
               for r in winnow_incremental(
                   new, idx.union(idx), k=4, w=4).collect()}
    assert clean == doubled and clean[10][1] >= 2


def test_stream_winnow_screen_duplicated_index_invariant(spark, tmp_path):
    """Same invariant for the streaming screen (batch-mode call)."""
    from riptable_spark.operators.dedup import winnow_index
    from riptable_spark.streaming.windows import stream_winnow_screen

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seen = winnow_index(
        docs.where(F.col("doc_id") % 2 == 0), k=8, w=4, hash_kind="md5"
    )
    newer = docs.where(F.col("doc_id") % 2 == 1)
    one = {r["doc_id"]: (r["n_fps"], r["n_hits"])
           for r in stream_winnow_screen(
               newer, seen, k=8, w=4, hash_kind="md5").collect()}
    two = {r["doc_id"]: (r["n_fps"], r["n_hits"])
           for r in stream_winnow_screen(
               newer, seen.union(seen), k=8, w=4, hash_kind="md5").collect()}
    assert one == two and len(one) > 0


def test_stream_winnow_screen_real_readstream_parity(spark, tmp_path):
    """The streaming screen over a REAL readStream (availableNow drain)
    must equal the batch transformation row-for-row."""
    from riptable_spark.operators.dedup import winnow_index
    from riptable_spark.streaming.windows import (
        run_available_now,
        stream_documents,
        stream_winnow_screen,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seen = winnow_index(
        docs.where(F.col("doc_id") % 2 == 0), k=8, w=4, hash_kind="md5"
    )
    batch = {
        r["doc_id"]: (r["n_fps"], r["n_hits"], r["is_dup"])
        for r in stream_winnow_screen(
            docs.where(F.col("doc_id") % 2 == 1), seen,
            k=8, w=4, min_hits=2, hash_kind="md5",
        ).collect()
    }
    stream = stream_documents(spark, sf_dir).where(F.col("doc_id") % 2 == 1)
    out = run_available_now(
        stream_winnow_screen(stream, seen, k=8, w=4, min_hits=2, hash_kind="md5"),
        "winnow_screen_t", str(tmp_path / "ckpt"),
    )
    got = {
        r["doc_id"]: (r["n_fps"], r["n_hits"], r["is_dup"]) for r in out.collect()
    }
    assert got == batch and len(got) > 0


def test_page_hinkley_detects_planted_shift(spark):
    from riptable_spark.operators.window import page_hinkley

    rows = [("k", t, 10 if t <= 50 else 30) for t in range(1, 101)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    r = page_hinkley(df, "k", ["t"], "x", delta=0, lam=5).collect()[0]
    assert r["first_alarm_pos"] is not None and 50 < r["first_alarm_pos"] <= 60
    flat = spark.createDataFrame(
        [("k", t, 10) for t in range(1, 101)], "k string, t long, x long"
    )
    rf = page_hinkley(flat, "k", ["t"], "x", delta=0, lam=5).collect()[0]
    assert rf["first_alarm_pos"] is None and rf["max_dev"] == 0.0


def test_acf_lag1_of_alternating_series(spark):
    """x = +1/-1 alternating: r1 -> -1, r2 -> +1 (up to edge terms)."""
    from riptable_spark.functions.stats import acf_ljung_box

    rows = [("k", t, 1 if t % 2 == 0 else -1) for t in range(200)]
    df = spark.createDataFrame(rows, "k string, t long, x long")
    r = acf_ljung_box(df, ["k"], "x", ["t"], max_lag=2).collect()[0]
    assert r["r1"] == pytest.approx(-1.0, abs=0.02)
    assert r["r2"] == pytest.approx(1.0, abs=0.02)
    assert r["q_stat"] > 100  # wildly non-white


def test_cooks_distance_flags_planted_outlier(spark):
    from riptable_spark.functions.stats import cooks_distance

    rows = [("k", i, i, 2 * i) for i in range(30)] + [("k", 99, 40, 0)]
    df = spark.createDataFrame(rows, "k string, id long, x long, y long")
    out = cooks_distance(df, ["k"], "x", "y", ["id"]).collect()
    top = max(out, key=lambda r: r["cooks_d"])
    assert top["id"] == 99
    assert top["cooks_d"] > 10 * sorted(r["cooks_d"] for r in out)[-2]


def test_crps_perfect_ensemble_is_zero_and_scale_monotone(spark):
    from riptable_spark.functions.stats import crps_ensemble

    perfect = spark.createDataFrame(
        [("k", 5, 5, 5, 5) for _ in range(10)], "k string, y long, a long, b long, c long"
    )
    r = crps_ensemble(perfect, ["k"], ["a", "b", "c"], "y").collect()[0]
    assert r["crps"] == 0.0
    off = spark.createDataFrame(
        [("k", 5, 8, 8, 8) for _ in range(10)], "k string, y long, a long, b long, c long"
    )
    r2 = crps_ensemble(off, ["k"], ["a", "b", "c"], "y").collect()[0]
    assert r2["crps"] == pytest.approx(3.0)  # degenerate ensemble: |bias|


def test_crps_null_cases_excluded_from_numerator_and_n(spark):
    """A case with a NULL member (or observation) must drop out of BOTH
    the sum and n — a null-bracket row skipped by sum but counted by n
    would bias crps toward 0."""
    from riptable_spark.functions.stats import crps_ensemble

    rows = [("k", 5, 8, 8, 8)] * 10 + [("k", 5, None, 8, 8), ("k", None, 8, 8, 8)]
    df = spark.createDataFrame(
        rows, "k string, y long, a long, b long, c long"
    )
    r = crps_ensemble(df, ["k"], ["a", "b", "c"], "y").collect()[0]
    assert r["n"] == 10 and r["crps"] == pytest.approx(3.0)


def test_vif3_planted_collinearity(spark):
    """x3 = 2·x1 + x2 exactly → perfect collinearity blows all VIFs up;
    independent-ish regressors keep them near 1."""
    import random

    from riptable_spark.functions.stats import vif3

    rng = random.Random(3)
    rows = [("k", a := rng.randrange(100), b := rng.randrange(100), 2 * a + b + rng.randrange(3))
            for _ in range(500)]
    df = spark.createDataFrame(rows, "k string, x1 long, x2 long, x3 long")
    r = vif3(df, ["k"], "x1", "x2", "x3").collect()[0]
    assert r["vif3"] > 100  # near-exact linear combination
    indep = [("k", rng.randrange(100), rng.randrange(100), rng.randrange(100))
             for _ in range(500)]
    r2 = vif3(spark.createDataFrame(indep, "k string, x1 long, x2 long, x3 long"),
              ["k"], "x1", "x2", "x3").collect()[0]
    for c in ("vif1", "vif2", "vif3"):
        assert 1.0 <= r2[c] < 1.1

"""Training-pipeline operators (operators/pipeline.py): decontamination,
deterministic splits, repetition metrics, packing, stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from riptable_spark.operators import pipeline as pl


def test_decontaminate_counts_shared_gram_types(spark):
    bench = spark.createDataFrame([(0, "the quick brown fox jumps")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox sleeps"),  # shares 'the quick brown', 'quick brown fox'
            (11, "a completely different sentence here"),
            (12, "the quick brown fox jumps high"),  # shares 3 gram types
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.n_hits
        for r in pl.decontaminate(corpus, bench, "text", "doc_id", n=3, min_hits=1).collect()
    }
    assert got == {10: 2, 12: 3}


def test_hash_split_total_and_deterministic(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    s = pl.hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # exhaustive partition
    assert 1400 < counts["train"] < 1800  # ~80%
    # rerun is byte-identical
    again = {r.split: r.n for r in pl.hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == again


def test_repetition_stats_hand_values(spark):
    df = spark.createDataFrame([(1, "a a a b")], ["doc_id", "text"])
    r = pl.repetition_stats(df, "text", "doc_id").first()
    # 4 tokens, 2 distinct -> dup_token_frac 0.5
    assert abs(r.dup_token_frac - 0.5) < 1e-9
    # bigram windows: 'a a','a a','a b' -> 3 windows, 2 types -> 1/3 dup
    assert abs(r.dup_2gram_frac - 1 / 3) < 1e-9
    # top token 'a' has 3 of 4
    assert abs(r.top_token_frac - 0.75) < 1e-9


def test_pack_sequences_contiguous_bins(spark):
    rows = [(i, 0, 100) for i in range(10)]  # 10 docs x 100 tokens, one group
    df = spark.createDataFrame(rows, ["doc_id", "grp", "toks"])
    out = pl.pack_sequences(df, ["grp"], "doc_id", "toks", budget=250).orderBy("doc_id")
    bins = [r.bin for r in out.collect()]
    # exclusive prefix sums 0,100,...,900 -> floor(/250): 0,0,0,1,1,2,2,2,3,3
    assert bins == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    # bins are contiguous in doc order (never interleave)
    assert bins == sorted(bins)


def test_stratified_sample_nested_thresholds(spark):
    df = spark.createDataFrame([(i, "en") for i in range(1000)], ["id", "lang"])
    small = {r.id for r in pl.stratified_sample(df, "lang", {"en": 0.25}, "id").collect()}
    big = {r.id for r in pl.stratified_sample(df, "lang", {"en": 0.5}, "id").collect()}
    # threshold sampling: smaller fraction is a SUBSET of the larger —
    # the property that makes mix re-weighting reproducible
    assert small <= big
    assert 150 < len(small) < 350 and 400 < len(big) < 600
    # stratum absent from the fraction map is dropped entirely
    none = pl.stratified_sample(df, "lang", {"de": 1.0}, "id").count()
    assert none == 0


def test_pack_sequences_ffd_capacity_and_determinism(spark):
    rows = [(i, i % 3, 10 + (i * 37) % 240) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "grp", "toks"])
    out = pl.pack_sequences_ffd(df, ["grp"], "doc_id", "toks", budget=256)
    pdf = out.toPandas()
    # capacity: no bin over budget (no row here exceeds the budget alone)
    per_bin = pdf.groupby(["grp", "bin"])["toks"].sum()
    assert (per_bin <= 256).all()
    # deterministic across recomputation and repartitioning
    again = (
        pl.pack_sequences_ffd(df.repartition(13), ["grp"], "doc_id", "toks", budget=256)
        .toPandas()
        .sort_values("doc_id")["bin"]
        .tolist()
    )
    assert again == pdf.sort_values("doc_id")["bin"].tolist()
    # oversize doc gets a singleton bin instead of an error
    big = spark.createDataFrame([(0, 0, 999), (1, 0, 10)], ["doc_id", "grp", "toks"])
    b = pl.pack_sequences_ffd(big, ["grp"], "doc_id", "toks", budget=256).toPandas()
    assert b[b.doc_id == 0]["bin"].iloc[0] != b[b.doc_id == 1]["bin"].iloc[0]


def test_gopher_line_rules(spark):
    """Line-based Gopher/C4 rules on crafted multi-line docs (the oracle
    query q146 covers the word/symbol/alpha/stopword family; synthetic
    docs are single-line so these need unit fixtures)."""
    from pyspark.sql import functions as F

    from riptable_spark.operators import text as tx

    docs = [
        (1, "- item one\n- item two\n- item three"),          # all bullets
        (2, "A sentence.\nAnother one!\nAnd a third?"),        # terminal punct
        (3, "trailing...\nwait...\nnormal line"),              # ellipses
        (4, "plain prose line with several words here"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    out = {r.id: r for r in df.select(
        "id",
        tx.bullet_line_ratio(F.col("text")).alias("bullet"),
        tx.ellipsis_line_ratio(F.col("text")).alias("ell"),
        tx.terminal_punct_line_ratio(F.col("text")).alias("tp"),
    ).collect()}
    assert out[1].bullet == 1.0 and out[4].bullet == 0.0
    assert abs(out[3].ell - 2 / 3) < 1e-12
    assert out[2].tp == 1.0 and out[4].tp == 0.0


def test_c4_markers_and_flags(spark):
    from pyspark.sql import functions as F

    from riptable_spark.operators import text as tx

    docs = [
        (1, "Lorem Ipsum dolor sit amet. More filler. And more."),
        (2, "Please enable JavaScript to view this page. Thanks. Bye."),
        (3, "function f() { return 1; } is code. Yes. Indeed."),
        (4, "This is a real sentence. It has substance. It ends properly."),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    out = {r.id: r.c4_keep for r in tx.c4_quality_flags(df).collect()}
    assert out == {1: False, 2: False, 3: False, 4: True}


def test_gopher_keep_conjunction(spark):
    from riptable_spark.operators import text as tx

    good = " ".join(
        "the quick brown fox jumps over with many of and that have be to lazy dogs".split() * 5
    )
    bad_symbols = "# " * 120
    df = spark.createDataFrame([(1, good), (2, bad_symbols), (3, "short text")], "id long, text string")
    out = {r.id: r.gopher_keep for r in tx.gopher_quality_flags(df).collect()}
    assert out[1] is True and out[2] is False and out[3] is False


def test_scrub_pii_all_kinds(spark):
    from riptable_spark.operators import pipeline as pl

    text = ("mail a.b-c_d@ex-ample.co.uk card 4111 1111-1111 1111 ssn 123-45-6789 "
            "ip 192.168.0.255 tel 415.555.0199 clean tail")
    df = spark.createDataFrame([(1, text), (2, "nothing sensitive here")], "id long, text string")
    out = {r.id: r for r in pl.scrub_pii(df).collect()}
    s = out[1].text_scrubbed
    assert "[EMAIL]" in s and "@" not in s
    assert "[CREDIT_CARD]" in s and "4111" not in s
    assert "[SSN]" in s and "123-45-6789" not in s
    assert "[IPV4]" in s and "192.168" not in s
    assert "[PHONE]" in s and "0199" not in s
    assert s.endswith("clean tail")
    assert (out[1].n_email, out[1].n_credit_card, out[1].n_ssn, out[1].n_ipv4, out[1].n_phone) == (1, 1, 1, 1, 1)
    assert out[2].text_scrubbed == "nothing sensitive here"
    assert out[2].n_email == 0


def test_scrub_pii_order_credit_card_before_phone(spark):
    """A credit card must not be half-eaten by the phone pattern."""
    from riptable_spark.operators import pipeline as pl

    df = spark.createDataFrame([(1, "pay 4111-1111-1111-1111 now")], "id long, text string")
    s = pl.scrub_pii(df).collect()[0].text_scrubbed
    assert s == "pay [CREDIT_CARD] now"


def test_filter_blocklist_list_and_df(spark):
    from riptable_spark.operators import pipeline as pl
    from riptable_spark.plans import inspect as pi

    df = spark.createDataFrame([(i, f"s{i % 4}") for i in range(40)], "id long, src string")
    lit_out = pl.filter_blocklist(df, "src", ["s0", "s3"])
    assert {r.src for r in lit_out.collect()} == {"s1", "s2"}
    assert pi.count_shuffles(lit_out) == 0
    bl = spark.createDataFrame([("s0",), ("s3",), ("s3",)], "src string")
    df_out = pl.filter_blocklist(df, "src", bl)
    assert {r.src for r in df_out.collect()} == {"s1", "s2"}
    assert pi.has_broadcast_join(df_out)
    allow = pl.filter_blocklist(df, "src", ["s1"], keep=True)
    assert {r.src for r in allow.collect()} == {"s1"}


def test_sample_k_per_group_prefix_property(spark):
    """Exact counts per group (capped by group size), determinism across
    calls, and the prefix property: the k=2 sample is a subset of k=5."""
    from riptable_spark.operators import pipeline as pl

    df = spark.createDataFrame([(i, f"g{i % 3}") for i in range(40)], "id long, g string")
    s5 = {(r.g, r.id) for r in pl.sample_k_per_group(df, ["g"], 5, "id").collect()}
    s2 = {(r.g, r.id) for r in pl.sample_k_per_group(df, ["g"], 2, "id").collect()}
    assert len(s5) == 15 and len(s2) == 6
    assert s2 <= s5
    assert s5 == {(r.g, r.id) for r in pl.sample_k_per_group(df, ["g"], 5, "id").collect()}
    tiny = spark.createDataFrame([(1, "solo")], "id long, g string")
    assert len(pl.sample_k_per_group(tiny, ["g"], 5, "id").collect()) == 1


def test_chunk_documents_reconstructs_text(spark):
    """Chunk boundary contract: consecutive chunks overlap by exactly
    `overlap` chars, and text[start:] of each chunk reconstructs the
    original document — no character lost or duplicated beyond the
    overlap. Also: empty docs yield no chunks, short docs one chunk."""
    from riptable_spark.operators import pipeline as pl

    rows = [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "xy"), (3, ""), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pl.chunk_documents(df, chunk_size=10, overlap=3)
    got = {(r.doc_id, r.chunk_id): r.chunk for r in out.collect()}
    text = rows[0][1]
    step = 7
    expect = {}
    for i, s in enumerate(range(0, len(text), step)):
        expect[(1, i)] = text[s : s + 10]
    expect[(2, 0)] = "xy"
    assert got == expect
    # reconstruction: chunk i+1 starts overlap chars before chunk i ends
    chunks = [expect[(1, i)] for i in range(len([k for k in expect if k[0] == 1]))]
    rebuilt = chunks[0] + "".join(c[3:] for c in chunks[1:])
    assert rebuilt == text


def test_temperature_rates_flatten_distribution(spark):
    """temperature_rates: T=1 → natural distribution (all rates equal
    1 after max-normalization ∝ p^0); T→∞ → per-domain expected counts
    equalize (rate ∝ 1/p). Verified against direct math."""
    from riptable_spark.operators import pipeline as pl

    rows = [(i, "big" if i < 800 else ("mid" if i < 950 else "small")) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    r1 = pl.temperature_rates(df, "source", temperature=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    r_inf = pl.temperature_rates(df, "source", temperature=1e9)
    # expected kept counts n_d * rate_d must be ~equal across domains
    kept = {"big": 800 * r_inf["big"], "mid": 150 * r_inf["mid"], "small": 50 * r_inf["small"]}
    vals = list(kept.values())
    assert max(vals) / min(vals) < 1.001, kept
    r2 = pl.temperature_rates(df, "source", temperature=2.0)
    p = {"big": 0.8, "mid": 0.15, "small": 0.05}
    raw = {d: p[d] ** (0.5 - 1.0) for d in p}
    mx = max(raw.values())
    for d in p:
        assert abs(r2[d] - raw[d] / mx) < 1e-12


def test_bloom_decontaminate_no_false_negatives_bounded_fp(spark, sf_dir):
    """Bloom contract vs the exact broadcast-set form: every document
    the exact decontaminate flags must appear with n_hits ≥ the exact
    count (no false negatives — the non-negotiable property for eval
    hygiene), and the count of EXTRA flagged docs stays near the fpp
    bound."""
    from riptable_spark.operators import pipeline as pl
    from riptable_spark.sources.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 17 == 3).select("text")
    exact = {r.doc_id: r.n_hits for r in pl.decontaminate(docs, bench, n=3).collect()}
    bloom = {r.doc_id: r.n_hits for r in pl.decontaminate_bloom(docs, bench, n=3, fpp=0.001).collect()}
    assert set(exact) <= set(bloom)
    for d, h in exact.items():
        assert bloom[d] >= h, (d, h, bloom[d])
    n_docs = docs.count()
    extras = len(set(bloom) - set(exact))
    # with fpp=1e-3 per gram and ~40 grams/doc, extra-doc rate stays low
    assert extras <= max(10, 0.1 * n_docs), extras


def test_bloom_filter_fpr_within_bound(spark):
    """Membership: all inserted items hit; fresh items false-positive at
    ≈ fpp (allow 3× slack for hash variance at small m)."""
    from riptable_spark.operators import pipeline as pl

    items = spark.range(2000).select(F.concat(F.lit("in-"), F.col("id")).alias("s"))
    bf, m, k = pl.build_bloom(items, F.col("s"), 2000, fpp=0.01)
    probe_in = items.crossJoin(F.broadcast(bf)).where(pl.bloom_hit(F.col("s"), m, k))
    assert probe_in.count() == 2000
    fresh = spark.range(10000).select(F.concat(F.lit("out-"), F.col("id")).alias("s"))
    fp = fresh.crossJoin(F.broadcast(bf)).where(pl.bloom_hit(F.col("s"), m, k)).count()
    assert fp / 10000 < 0.03, fp


def test_audio_header_decode_corrupt_payloads_null(spark):
    """decode_audio: truncated/garbage/empty payloads become a NULL
    struct, never a task failure (the corrupt-blob tolerance contract);
    valid WAV with extra chunks before data still parses (chunk walk)."""
    from riptable_spark import queries8 as q8
    from riptable_spark.operators import multimodal as mm

    wav = q8._make_wav(2, 44100, 16, 500)
    # WAV with a LIST chunk between fmt and data (walker must skip it)
    lst = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"  # odd len → pad
    wav2 = wav[:36] + lst + wav[36:]
    rows = [(1, wav), (2, wav2), (3, wav[:20]), (4, b"garbage"), (5, b""), (6, q8._make_flac(48000, 1, 24, 99))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.audio_meta for r in mm.decode_audio(df).collect()}
    assert got[1]["n_samples"] == 500 and got[1]["format"] == "wav"
    assert got[2]["n_samples"] == 500 and got[2]["sample_rate"] == 44100
    assert got[3] is None and got[4] is None and got[5] is None
    assert got[6]["bits_per_sample"] == 24 and got[6]["format"] == "flac"


def test_frame_sample_raw_content_exact(spark):
    """frame_sample_raw: every every_n-th frame is returned byte-exact;
    ragged buffers are skipped, not failed."""
    from riptable_spark.operators import multimodal as mm

    w, h, c = 4, 3, 2
    stride = w * h * c
    frames = [bytes([(f * 31 + j) % 256 for j in range(stride)]) for f in range(7)]
    rows = [
        (1, b"".join(frames), w, h, c),
        (2, b"short", w, h, c),  # ragged
    ]
    df = spark.createDataFrame(rows, "vid long, payload binary, width int, height int, channels int")
    out = mm.frame_sample_raw(df, every_n=3).collect()
    got = {(r.vid, r.frame_idx): bytes(r.frame_payload) for r in out}
    assert set(got) == {(1, 0), (1, 3), (1, 6)}
    for idx in (0, 3, 6):
        assert got[(1, idx)] == frames[idx]


def test_extract_features_raw_values(spark):
    """extract_features_raw: per-channel mean/std and grayscale
    histogram computed from the actual bytes — verified against numpy
    on the driver; ragged buffers → NULL."""
    import numpy as np

    from riptable_spark.operators import multimodal as mm

    w, h, c = 4, 2, 3
    buf = bytes(range(w * h * c))
    rows = [(1, buf, w, h, c), (2, b"bad", w, h, c)]
    df = spark.createDataFrame(rows, "img long, payload binary, width int, height int, channels int")
    got = {r.img: r.features for r in mm.extract_features_raw(df, hist_bins=4).collect()}
    assert got[2] is None
    a = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c).astype(np.float64)
    want = [*a.mean(axis=(0, 1)), *a.std(axis=(0, 1))]
    hist, _ = np.histogram(a.mean(axis=2), bins=4, range=(0.0, 256.0))
    want += list(hist / (w * h))
    assert len(got[1]) == 2 * c + 4
    assert all(abs(x - y) < 1e-12 for x, y in zip(got[1], want))


def test_leakage_safe_split_invariants(spark):
    """Every member of a connected near-dup cluster shares one split;
    unpaired rows split exactly as plain hash_split would."""
    from pyspark.sql import functions as F

    from riptable_spark.operators import pipeline as pl

    df = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    # chains 0-1-2, 10-11-12, ... (clusters of 3); rest unpaired
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 200, 10) for i in (i, i + 1)],
        "id_a long, id_b long",
    )
    out = pl.leakage_safe_split(df, pairs, {"train": 0.8, "test": 0.2}, hash_kind="md5")
    rows = {r.doc_id: r.split for r in out.collect()}
    assert len(rows) == 200
    for base in range(0, 200, 10):
        assert rows[base] == rows[base + 1] == rows[base + 2]
    plain = pl.hash_split(df, "doc_id", {"train": 0.8, "test": 0.2}, hash_kind="md5")
    plain_rows = {r.doc_id: r.split for r in plain.collect()}
    clustered = {i for base in range(0, 200, 10) for i in (base, base + 1, base + 2)}
    for i in set(rows) - clustered:
        assert rows[i] == plain_rows[i]


def test_profile_table_nulls_and_modes(spark):
    from pyspark.sql import functions as F

    from riptable_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "a")], "x int, s string"
    )
    prof = {r.column: r for r in profile_table(df, exact_distinct=True).collect()}
    assert prof["x"].n_rows == 4 and prof["x"].n_null == 1 and prof["x"].n_distinct == 3
    assert prof["x"].min_value == "1" and prof["x"].max_value == "3"
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 2
    assert prof["s"].dtype == "string"
    # approx mode: same shape, HLL estimate within rsd for tiny cardinalities
    aprof = {r.column: r for r in profile_table(df).collect()}
    assert aprof["x"].n_distinct == 3


def test_incremental_rollup_order_invariant(spark):
    """Merge algebra is associative/commutative: any merge order and
    any slicing reconstructs the from-scratch aggregate exactly."""
    from pyspark.sql import functions as F

    from riptable_spark.operators import incremental as inc

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 13 % 997).cast("double").alias("v"),
        (F.col("id") % 4).alias("slice"),
    )
    direct = inc.finalize_rollup(inc.rollup_partials(df, ["k"], "v"), ["k"])

    parts = [inc.rollup_partials(df.where(F.col("slice") == s), ["k"], "v") for s in range(4)]
    fwd = parts[0]
    for p in parts[1:]:
        fwd = inc.merge_rollup(fwd, p, ["k"])
    rev = parts[3]
    for p in reversed(parts[:3]):
        rev = inc.merge_rollup(rev, p, ["k"])

    want = {r.k: r for r in direct.collect()}
    for out in (inc.finalize_rollup(fwd, ["k"]), inc.finalize_rollup(rev, ["k"])):
        got = {r.k: r for r in out.collect()}
        assert set(got) == set(want)
        for k in want:
            a, b = got[k], want[k]
            assert (a.n_rows, a.n_values, a.min_val, a.max_val) == (
                b.n_rows, b.n_values, b.min_val, b.max_val)
            assert a.mean_val == b.mean_val  # exact: integer-valued doubles
            assert abs(a.var_val - b.var_val) < 1e-9

"""BPE merge training tests: the classic corpus produces the textbook
merge sequence; segmentation is lossless (units concatenate back to the
word) and consistent with the learned merges."""

from pyspark.sql import functions as F

from riptable_spark.operators import bpe


def _corpus(spark):
    rows = [
        (1, "low low low lower lower newest newest newest newest widest"),
        (2, "low lower newest widest widest newest"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_classic_merge_sequence(spark):
    merges = bpe.bpe_train(_corpus(spark), n_merges=5)
    got = [(m["left"], m["right"], m["n"]) for m in merges]
    # es(9) → est(9) → lo(7) → low(7) → ew(6): the standard walkthrough
    assert got == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7), ("lo", "w", 7), ("e", "w", 6)]
    assert [m["step"] for m in merges] == [1, 2, 3, 4, 5]
    assert merges[1]["merged"] == "est"


def test_bpe_segment_lossless_and_applies_merges(spark):
    df = _corpus(spark)
    merges = bpe.bpe_train(df, n_merges=5)
    seg = bpe.bpe_segment(df, merges)
    rows = seg.collect()
    # lossless: units concatenate back to the word, for every word
    assert all("".join(r.units) == r.w for r in rows)
    by_word = {r.w: r.units for r in rows}
    assert by_word["low"] == ["low"]
    assert by_word["lower"] == ["low", "e", "r"]
    assert by_word["newest"] == ["n", "ew", "est"]
    # no learned merge remains applicable in any output segmentation
    pairs = {(m["left"], m["right"]) for m in merges}
    for r in rows:
        for x, y in zip(r.units, r.units[1:]):
            assert (x, y) not in pairs


def test_bpe_merge_exhaustion_stops_early(spark):
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = bpe.bpe_train(df, n_merges=10)
    # only one possible merge exists (a,b); training stops when dry
    assert len(merges) == 1 and merges[0]["merged"] == "ab"


def test_bpe_sample_frac_is_deterministic(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta word"), (F.col("id") % 7).cast("string")).alias("text"),
    )
    m1 = bpe.bpe_train(df, n_merges=3, sample_frac=0.5, hash_kind="md5")
    m2 = bpe.bpe_train(df, n_merges=3, sample_frac=0.5, hash_kind="md5")
    assert m1 == m2

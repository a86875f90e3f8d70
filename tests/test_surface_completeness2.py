"""Surface-coverage wave 2: remaining exported helpers with no direct
test — UDF registry, BPE word counts, categorical masks, datetime/span
scalar helpers, quantile edges, pii counters, and minhash HOF/DF
consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riptable_spark.functions import datetime as dtf
from riptable_spark.functions import spans, strings
from riptable_spark.functions.binning import quantile_edges
from riptable_spark.operators import apply as rapply
from riptable_spark.operators import bpe, categorical, dedup, pipeline


def test_register_and_run_registered(spark):
    rapply.register_function("spread", lambda s: float(s.max() - s.min()), "double")
    df = spark.createDataFrame([("a", 1.0), ("a", 5.0), ("b", 2.0)], "k string, v double")
    out = {r["k"]: r["spread"] for r in rapply.run_registered(df, ["k"], "v", "spread").collect()}
    assert out == {"a": 4.0, "b": 0.0}


def test_bpe_word_counts(spark):
    df = spark.createDataFrame([("the cat the hat",), (None,)], "text string")
    got = {r["w"]: r["c"] for r in bpe.word_counts(df).collect()}
    assert got == {"the": 2, "cat": 1, "hat": 1}


def test_categorical_filtered_mask(spark):
    df = spark.createDataFrame([("a",), ("b",), ("z",), (None,)], "v string")
    out = df.select(categorical.filtered_mask(F.col("v"), ["a", "b"]).alias("m")).collect()
    assert [r["m"] for r in out] == [False, False, True, True]


def test_quantile_edges(spark):
    df = spark.createDataFrame([(float(i),) for i in range(101)], "v double")
    edges = quantile_edges(df, "v", [0.25, 0.5, 0.75])
    assert edges == [25.0, 50.0, 75.0]


def test_json_double_and_datespan(spark):
    df = spark.createDataFrame([('{"k": 2.5}',)], "j string")
    assert df.select(strings.json_double(F.col("j"), "k").alias("v")).collect()[0]["v"] == 2.5
    assert spark.range(1).select(spans.datespan(3).alias("d")).collect()[0]["d"] == 3


def test_datetime_scalar_helpers(spark):
    df = spark.createDataFrame([("2024-06-15 12:00:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    r = df.select(
        dtf.time_since_start_of_year(F.col("ts")).alias("ns"),
        dtf.parse_epoch(F.lit(86400)).alias("day2"),
        dtf.strptime_to_timestamp(F.lit("2024-01-02"), "yyyy-MM-dd").alias("p"),
    ).collect()[0]
    assert r["ns"] == (31 + 29 + 31 + 30 + 31 + 14) * 86400 * 10**9 + 12 * 3600 * 10**9
    assert str(r["day2"]).startswith("1970-01-02")
    assert str(r["p"]).startswith("2024-01-02")
    assert dtf.resolve_tz("NYC") != ""  # alias table resolves or passes through
    # utcnow / get_nano_time evaluate to sane magnitudes
    now = spark.range(1).select(dtf.utcnow().alias("t"), dtf.get_nano_time().alias("n")).collect()[0]
    assert now["n"] > 1_500_000_000 * 10**9


def test_pii_counts_columns(spark):
    df = spark.createDataFrame(
        [("mail me at a@b.com or call 555-123-4567",), ("clean",)], "text string"
    )
    out = df.select(*pipeline.pii_counts(F.col("text"))).collect()
    total_first = sum(v for v in out[0].asDict().values())
    total_second = sum(v for v in out[1].asDict().values())
    assert total_first >= 1 and total_second == 0


def test_minhash_hof_matches_column_form(spark):
    """The HOF array-expression signature must equal the explode+agg
    column form — two implementations, one definition."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "pack my box with five dozen liquor jugs right now")],
        "doc_id int, text string",
    )
    hof = docs.select("doc_id", dedup.minhash_signature(F.col("text"), num_perm=8, shingle_n=3).alias("sig"))
    dfform = dedup.minhash_signature_df(docs, num_perm=8, shingle_n=3)
    got_hof = {r["doc_id"]: list(r["sig"]) for r in hof.collect()}
    got_df = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in dfform.collect()}
    assert got_hof == got_df

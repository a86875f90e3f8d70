"""Structured Streaming: batch/stream parity over the events table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from riptable_spark.sources.io import load_table
from riptable_spark.streaming import windows as sw


@pytest.fixture(scope="module")
def stream(spark, sf_dir):
    return sw.stream_events(spark, sf_dir)


def test_stream_schema_matches_batch(spark, sf_dir, stream):
    batch = load_table(spark, sf_dir, "events")
    assert dict(stream.dtypes)["ts"] == "timestamp"
    assert set(stream.columns) == set(batch.columns)


def test_tumbling_parity(spark, sf_dir, stream, tmp_path):
    got = sw.run_available_now(
        sw.tumbling_agg(stream, "1 hour"), "tumbling_test", str(tmp_path / "ckpt1")
    ).toPandas()
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
        .toPandas()
    )
    got = got.sort_values("window_start").reset_index(drop=True)
    batch = batch.sort_values("window_start").reset_index(drop=True)
    assert got.equals(batch)


def test_sliding_parity(spark, sf_dir, stream, tmp_path):
    got = sw.run_available_now(
        sw.sliding_agg(stream, "1 hour", "30 minutes"), "sliding_test", str(tmp_path / "ckpt2")
    )
    batch_n = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes"))
        .count()
        .count()
    )
    assert got.count() == batch_n


def test_session_windows(spark, stream, tmp_path):
    got = sw.run_available_now(
        sw.session_agg(stream, gap="10 minutes"), "session_test", str(tmp_path / "ckpt3")
    )
    assert got.count() > 0
    assert set(got.columns) == {"session_start", "user_id", "n"}


def test_stream_dedupe(spark, stream, tmp_path):
    out = sw.run_available_now(
        sw.stream_dedupe(stream, ["user_id"]), "dedupe_test", str(tmp_path / "ckpt4")
    )
    n_users = out.select("user_id").distinct().count()
    assert out.count() == n_users  # one row kept per user within watermark

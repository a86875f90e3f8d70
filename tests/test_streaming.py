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


def test_stateful_multi_batch_state_carry(spark, sf_dir, tmp_path):
    """The stateful operator's GroupState must CARRY across micro-batches:
    split events into two files, force one file per trigger, and check
    the finalized per-user totals equal the batch aggregation (r1 backlog
    #4 — previously only exercised with a single micro-batch)."""
    ev = load_table(spark, sf_dir, "events")
    half = ev.where(F.col("event_id") % 2 == 0)
    other = ev.where(F.col("event_id") % 2 == 1)
    src = tmp_path / "ev_src"
    # two separate files → two micro-batches under maxFilesPerTrigger=1
    half.coalesce(1).write.parquet(str(src / "a"))
    other.coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(ev.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .load(str(src))
    )
    out = sw.stateful_user_totals(stream)
    sink = sw.run_available_now(out, "stateful_mb_test", str(tmp_path / "ckpt_mb"))
    # multiple batches → multiple update rows per user; finalize
    raw_rows = sink.count()
    final = sw.finalize_update_sink(sink, ["user_id"], "n_events").toPandas()
    batch = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .toPandas()
    )
    assert raw_rows > len(batch), "expected >1 micro-batch worth of update rows"
    final = final.sort_values("user_id").reset_index(drop=True)
    batch = batch.sort_values("user_id").reset_index(drop=True)
    assert (final["n_events"] == batch["n_events"]).all()
    assert abs(final["total_value"] - batch["total_value"]).max() < 1e-6


def test_pipeline_ops_compose_with_streams(spark, sf_dir, stream, tmp_path):
    """The curation ops (hash_split, stratified_sample) are stateless
    hash projections, so they run UNCHANGED on a streaming DataFrame —
    the property that lets one codepath serve both the 100 TB backfill
    and the live ingest. Stream results must equal the batch run."""
    from riptable_spark.operators import pipeline as pl
    from riptable_spark.streaming import windows as sw

    split_counts = (
        pl.hash_split(stream, "event_id", {"train": 0.8, "val": 0.2})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = {
        r.split: r.n
        for r in sw.run_available_now(
            split_counts, "split_stream_test", str(tmp_path / "ckpt_split"), output_mode="complete"
        ).collect()
    }
    batch = {
        r.split: r.n
        for r in pl.hash_split(
            load_table(spark, sf_dir, "events"), "event_id", {"train": 0.8, "val": 0.2}
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == batch


def test_quality_and_pii_ops_stream_parity(spark, sf_dir, tmp_path):
    """Gopher quality flags and PII scrubbing are stateless projections,
    so the SAME operator calls run unchanged on a streaming DataFrame —
    one codepath for the 100 TB backfill and the live ingest. Stream
    output must equal the batch run row-for-row."""
    from riptable_spark.operators import pipeline as pl
    from riptable_spark.operators import text as tx
    from riptable_spark.streaming import windows as sw

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)  # file source needs a directory
    sdocs = spark.readStream.schema(docs.schema).format("parquet").load(src)

    def curate(df):
        flagged = tx.gopher_quality_flags(df)
        return pl.scrub_pii(flagged, "text", with_counts=False).select(
            "doc_id", "gopher_keep", F.length("text_scrubbed").alias("scrub_len")
        )

    got = (
        sw.run_available_now(curate(sdocs), "curate_stream_test", str(tmp_path / "ckpt_curate"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = curate(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


def test_stream_enrich_static_dim_parity(spark, sf_dir, stream, tmp_path):
    """Stream-static enrichment: the dim broadcasts into each
    micro-batch; results must equal the batch join row-for-row."""
    from riptable_spark.streaming import windows as sw

    dim = spark.createDataFrame(
        [(i, f"segment-{i % 3}") for i in range(200)], "user_id long, segment string"
    )
    enriched = sw.stream_enrich(stream, dim, on="user_id").groupBy("segment").agg(
        F.count(F.lit(1)).alias("n")
    )
    got = {
        r.segment: r.n
        for r in sw.run_available_now(
            enriched, "enrich_stream_test", str(tmp_path / "ckpt_enrich"), output_mode="complete"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.segment: r.n
        for r in ev.join(dim, on="user_id", how="left").groupBy("segment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_stream_stream_interval_join_parity(spark, sf_dir, stream, tmp_path):
    """Stream-stream interval join (watermarks both sides + event-time
    bound → evictable state): click-after-view within 30 minutes per
    user. Batch twin: the identical non-equi join."""
    from riptable_spark.streaming import windows as sw

    views_s = stream.where(F.col("event_type") == "view").select("user_id", "ts")
    clicks_s = stream.where(F.col("event_type") == "click").select("user_id", "ts")
    joined = sw.stream_stream_interval_join(views_s, clicks_s, "user_id").select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("view_ts"),
        F.col("r.ts").alias("click_ts"),
    )
    got = sorted(
        (r.user_id, r.view_ts, r.click_ts)
        for r in sw.run_available_now(
            joined, "ssj_stream_test", str(tmp_path / "ckpt_ssj"), output_mode="append"
        ).collect()
    )
    ev = load_table(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select("user_id", F.col("ts").alias("view_ts"))
    c = ev.where(F.col("event_type") == "click").select(F.col("user_id").alias("cu"), F.col("ts").alias("click_ts"))
    want = sorted(
        (r.user_id, r.view_ts, r.click_ts)
        for r in v.join(
            c,
            (v.user_id == c.cu)
            & (c.click_ts >= v.view_ts)
            & (c.click_ts <= v.view_ts + F.expr("INTERVAL 30 minutes")),
            "inner",
        ).collect()
    )
    assert len(got) > 0 and got == want


def test_streaming_curation_pipeline_parity(spark, sf_dir, tmp_path):
    """The COMPOSED curation pipeline — C4/Gopher quality gate →
    deterministic split → chunking — runs UNCHANGED on a documents
    stream (every stage is a stateless hash/codegen projection), and
    the drained result equals the batch run exactly. This is the
    one-codepath story: the same operators serve the 100 TB backfill
    and the live ingest."""
    from riptable_spark.operators import pipeline as pl
    from riptable_spark.operators import text as tx
    from riptable_spark.streaming import windows as sw

    def curate(docs):
        q = tx.gopher_quality_flags(docs)
        kept = q.where(~F.col("flag_any")) if "flag_any" in q.columns else q.where(
            ~F.col(q.columns[-1])
        )
        split = pl.hash_split(kept, "doc_id", {"train": 0.9, "val": 0.1})
        chunks = pl.chunk_documents(split.where(F.col("split") == "train"), chunk_size=200, overlap=20)
        return chunks.groupBy().agg(
            F.count(F.lit(1)).alias("n_chunks"), F.sum("chunk_len").alias("total_chars")
        )

    got = sw.run_available_now(
        curate(sw.stream_documents(spark, sf_dir)),
        "curation_stream_test", str(tmp_path / "ckpt_curate"), output_mode="complete",
    ).first()
    want = curate(load_table(spark, sf_dir, "documents")).first()
    assert (got.n_chunks, got.total_chars) == (want.n_chunks, want.total_chars)
    assert got.n_chunks > 0


def test_stream_histogram_parity(spark, sf_dir, stream, tmp_path):
    """Streaming drift monitor: per-window histogram over the stream
    equals the identical binning computed in batch — one codepath for
    the monitor and its backfill."""
    got = sw.run_available_now(
        sw.stream_histogram(stream, "value", "1 hour", bins=8, lo=0.0, hi=200.0),
        "hist_stream_test", str(tmp_path / "ckpt_hist"),
    ).toPandas()
    ev = load_table(spark, sf_dir, "events")
    x = F.col("value").cast("double")
    b = F.greatest(F.lit(0), F.least(F.lit(7), F.floor(x / 200.0 * 8))).cast("int")
    batch = (
        ev.where(x.isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("w"), b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "bin", "n")
        .toPandas()
    )
    key = ["window_start", "bin"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert got.equals(batch)


def test_stream_seasonal_anomaly_parity(spark, sf_dir, stream, tmp_path):
    """Stateless stream-static anomaly scoring: the batch-computed
    hourly baseline broadcasts into the stream; flagged set equals the
    batch computation row-for-row."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    x = F.round(F.col("value") * 100).cast("bigint")
    baseline = (
        ev.select(F.hour("ts").alias("season"), x.alias("x"))
        .groupBy("season")
        .agg(
            F.count("x").alias("n"),
            F.sum("x").cast("double").alias("sx"),
            F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).cast("double").alias("sxx"),
        )
    )
    s = stream.where(F.col("value").isNotNull()).withColumn("value", x)
    got = sw.run_available_now(
        sw.stream_seasonal_anomaly(s, baseline, value_col="value", threshold=2.5),
        "anomaly_stream_test", str(tmp_path / "ckpt_anom"),
        # the static baseline side contains an Aggregate node, which the
        # auto-detect reads as a streaming agg — this query is stateless
        output_mode="append",
    ).toPandas()
    from riptable_spark.functions import stats as st

    batch = (
        st.seasonal_zscore(
            ev.select("event_id", F.hour("ts").alias("h"), x.alias("value")), "h", "value"
        )
        .where(F.abs(F.col("z")) > 2.5)
        .toPandas()
    )
    assert set(got["event_id"]) == set(batch["event_id"])
    assert len(got) > 0


def test_stream_hll_registers_parity_and_estimate(spark, sf_dir, stream, tmp_path):
    """Streaming HLL: per-window register relations from the stream
    equal the batch build, and feeding them to the batch estimator
    tracks the exact per-window distinct count."""
    from riptable_spark.operators import sketch as sk

    got = sw.run_available_now(
        sw.stream_hll_registers(stream, "user_id", "6 hours", p=8, hash_kind="md5"),
        "hll_stream_test", str(tmp_path / "ckpt_hll"),
    )
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    batch = sk.hll_registers_by(
        ev.withColumn("window_start", F.window("ts", "6 hours").start),
        "window_start", "user_id", p=8, hash_kind="md5",
    )
    g = got.toPandas().sort_values(["window_start", "bucket"]).reset_index(drop=True)
    b = batch.toPandas().sort_values(["window_start", "bucket"]).reset_index(drop=True)
    assert g.equals(b)
    # estimate one window and compare to the exact distinct count
    first_w = g["window_start"].iloc[0]
    regs = got.where(F.col("window_start") == F.lit(first_w)).select("bucket", "rho")
    est = sk.hll_estimate(regs, p=8).first().estimate
    exact = (
        ev.withColumn("ws", F.window("ts", "6 hours").start)
        .where(F.col("ws") == F.lit(first_w))
        .select("user_id").distinct().count()
    )
    assert abs(est - exact) / max(exact, 1) < 0.25


def test_stream_vwap_parity(spark, sf_dir, stream, tmp_path):
    """VWAP bars: streaming incremental state must equal the batch agg
    bit-for-bit (integer accumulators commute with micro-batching)."""
    qty = F.col("event_id") % 5 + 1
    got = sw.run_available_now(
        sw.stream_vwap_bars(stream, "1 hour", qty=qty), "vwap_test", str(tmp_path / "ckptv")
    ).toPandas()
    batch = sw.stream_vwap_bars(load_table(spark, sf_dir, "events"), "1 hour", qty=qty).toPandas()
    got = got.sort_values("bucket_s").reset_index(drop=True)
    batch = batch.sort_values("bucket_s").reset_index(drop=True)
    assert got.equals(batch)


def test_stream_time_bars_parity(spark, sf_dir, stream, tmp_path):
    """OHLC bar building on a stream: min_by/max_by and integer sums all
    commute with micro-batching — bit-exact vs the batch agg."""
    from riptable_spark.operators.finance import time_bars

    bucket = (F.floor(F.unix_seconds(F.col("ts")) / 900) * 900).cast("bigint")
    qty = F.col("event_id") % 5 + 1
    got = sw.run_available_now(
        time_bars(stream.withWatermark("ts", "2 hours"), "user_id", bucket, "value", qty),
        "bars_test", str(tmp_path / "ckptb"),
    ).toPandas()
    batch = time_bars(load_table(spark, sf_dir, "events"), "user_id", bucket, "value", qty).toPandas()
    key = ["user_id", "bucket"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert got.equals(batch)


def _cdc_changes(df):
    """Events → change stream: key=user_id, op D on 'error' else U."""
    return df.select(
        F.col("user_id").alias("k"), "ts", "event_id", "event_type", "value",
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )


def test_stream_upsert_sink_parity(spark, sf_dir, tmp_path):
    """foreachBatch CDC merge: the final snapshot must equal the direct
    batch latest-change-wins table, REGARDLESS of how the input splits
    into micro-batches (1 file vs one-file-per-trigger)."""
    import pandas as pd
    from pyspark.sql import Window

    from riptable_spark.streaming.sinks import stream_upsert_sink

    batch = _cdc_changes(load_table(spark, sf_dir, "events"))
    # direct expectation: latest change per key (ts, event_id total order)
    w = Window.partitionBy("k").orderBy(
        F.col("ts").desc(), F.col("event_id").desc(), F.col("op").desc()
    )
    expect = (
        batch.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .drop("rn")
        .toPandas().sort_values("k").reset_index(drop=True)
    )

    # split the change log into 4 files so availableNow produces
    # multiple micro-batches with maxFilesPerTrigger=1
    src = str(tmp_path / "changes")
    batch.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    got = stream_upsert_sink(
        stream, ["k"], ["ts", "event_id"], "op",
        str(tmp_path / "snap_multi"), str(tmp_path / "ckpt_multi"),
    ).toPandas().sort_values("k").reset_index(drop=True)

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], expect[sorted(expect.columns)]
    )

    # single-batch run must commit the identical table (associativity)
    stream1 = spark.readStream.schema(schema).parquet(src)
    got1 = stream_upsert_sink(
        stream1, ["k"], ["ts", "event_id"], "op",
        str(tmp_path / "snap_one"), str(tmp_path / "ckpt_one"),
    ).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got1[sorted(got1.columns)], expect[sorted(expect.columns)]
    )


def test_stream_upsert_sink_tombstone_blocks_resurrection(spark, tmp_path):
    """A delete with a LATER order than a straggler upsert must win even
    when the upsert arrives in a later micro-batch."""
    import os

    from riptable_spark.streaming.sinks import stream_upsert_sink

    src = str(tmp_path / "oo_changes")
    os.makedirs(src)
    # file 1: delete at t=10 ; file 2 (later batch): stale upsert at t=5
    spark.createDataFrame([(1, 10, "D", 0.0)], "k long, t long, op string, v double") \
        .coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame([(1, 5, "U", 9.9)], "k long, t long, op string, v double") \
        .coalesce(1).write.parquet(src + "/f2")
    schema = spark.read.parquet(src + "/f1").schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true").parquet(src)
    )
    out = stream_upsert_sink(
        stream, ["k"], ["t"], "op",
        str(tmp_path / "snap_oo"), str(tmp_path / "ckpt_oo"),
    ).collect()
    assert out == []  # key stays deleted


def test_stream_windowed_topk_parity(spark, sf_dir, stream, tmp_path):
    """Windowed heavy hitters: streaming windowed counts drained with
    availableNow, then ranked — must equal the same two functions run
    on the batch frame."""
    import pandas as pd

    item = F.col("event_id") % 40
    got_counts = sw.run_available_now(
        sw.windowed_item_counts(stream, "6 hours", item),
        "wtopk_test", str(tmp_path / "ckptw"),
    )
    got = sw.topk_per_window(got_counts, 5).toPandas()
    batch = sw.topk_per_window(
        sw.windowed_item_counts(load_table(spark, sf_dir, "events"), "6 hours", item), 5
    ).toPandas()
    key = ["window_start", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], batch[sorted(batch.columns)])

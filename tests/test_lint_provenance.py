"""Checkpoint provenance for the plan linter (round 7).

``localCheckpoint`` truncates a plan to an RDD scan, which hid
legitimate aggregate-sized window inputs from the global-window lint
(round 6 papered over q651/q652 with allowlist entries). The fix:
operators that checkpoint an AGGREGATE tag the materialized RDD via
``inspect.mark_aggregated``; the linter treats scans of tagged RDDs as
aggregated. These tests pin BOTH directions — a tagged checkpoint is
clean, an untagged raw-data checkpoint still flags — plus the real
q651 plan that motivated the registry.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from riptable_spark.plans import inspect as pi


def _global_window(df):
    return df.withColumn("rk", F.row_number().over(Window.orderBy("k")))


def test_tagged_aggregate_checkpoint_is_clean(spark):
    agg = (
        spark.range(1000)
        .groupBy((F.col("id") % 5).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tagged = pi.mark_aggregated(agg.localCheckpoint(eager=True))
    warnings = pi.lint(_global_window(tagged))
    assert not [w for w in warnings if w.startswith("global-window")], warnings


def test_untagged_raw_checkpoint_still_flags(spark):
    # a crafted violation: raw (per-row) data checkpointed, then a
    # global window — provenance tracking must NOT swallow this
    raw = spark.range(1000).select(F.col("id").alias("k"))
    chk = raw.localCheckpoint(eager=True)
    warnings = pi.lint(_global_window(chk))
    assert [w for w in warnings if w.startswith("global-window")], warnings


def test_mark_aggregated_is_a_noop_on_non_rdd_plans(spark):
    df = spark.range(10).groupBy().count()
    assert pi.mark_aggregated(df) is df  # no raise, returns input


def test_q651_plan_lints_clean_without_allowlist(spark):
    import __spark_entry__ as entry

    df = entry.queries()["q651_epoch_allocation"](spark, "/root/testdata/sf0.001")
    warnings = [
        w
        for w in pi.lint(df)
        if "BroadcastNestedLoopJoin" not in w
    ]
    assert not warnings, warnings

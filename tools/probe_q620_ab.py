"""Interleaved A/B of the FULL q620 (construction + noop sink):
registered thread-pool-overlapped variant vs an inline sequential twin,
one warm session, same data."""
from __future__ import annotations

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402  (registers QUERIES)
from pyspark.sql import functions as F  # noqa: E402

from riptable_spark.queries import QUERIES  # noqa: E402
from riptable_spark.session import get_spark  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3

spark = get_spark()


def compose(bp, mm, pc):
    r1 = bp.select(
        F.lit("gale_shapley").alias("kernel"),
        F.lit("n_matched").alias("metric"),
        F.col("n_matched").alias("value"),
    )
    r2 = bp.select(
        F.lit("gale_shapley").alias("kernel"),
        F.lit("blocking_pairs").alias("metric"),
        F.col("n_blocking_pairs").alias("value"),
    )
    r3 = mm.where(F.col("round") == 3).select(
        F.lit("maximal_matching").alias("kernel"),
        F.lit("edges_after_round3").alias("metric"),
        F.col("n_edges_remaining").alias("value"),
    )
    r4 = mm.agg(F.sum("n_matched").cast("long").alias("value")).select(
        F.lit("maximal_matching").alias("kernel"),
        F.lit("total_matched").alias("metric"),
        "value",
    )
    full = pc.where(F.col("variant") == "full").select(F.col("largest_cc").alias("fc"))
    cut = pc.where(F.col("variant") == "hubs_removed").select(F.col("largest_cc").alias("cc"))
    r5 = full.crossJoin(F.broadcast(cut)).select(
        F.lit("percolation").alias("kernel"),
        F.lit("largest_cc_drop_ppm").alias("metric"),
        F.expr("((fc - cc) * 1000000) DIV fc").alias("value"),
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(r5)


def seq():
    bp = QUERIES["q617_blocking_pairs"](spark, SF).localCheckpoint(eager=True)
    mm = QUERIES["q619_maximal_matching"](spark, SF)
    pc = QUERIES["q605_percolation"](spark, SF).localCheckpoint(eager=True)
    compose(bp, mm, pc).write.format("noop").mode("overwrite").save()


def par():
    QUERIES["q620_kernels_scorecard"](spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()


seq()  # warmup
res = {"seq": [], "par": []}
for i in range(N):
    for label, fn in (("seq", seq), ("par", par)):
        t0 = time.time()
        fn()
        res[label].append(round(time.time() - t0, 3))
for k, v in res.items():
    print(k, v, "min:", min(v))

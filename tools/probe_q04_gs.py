"""A/B q04's dual scan vs the single-scan GROUPING SETS variant at a
given SF — VERDICT r6 item 6 (the r4 decision was measured at sf0.1
where scans are free; re-justify where they are not).

Both variants compute the identical q04 result columns (same gb.*
expressions). The GS variant scans lineitem ONCE:
GROUPING SETS ((flag), (flag, partkey)) — stats read off the flag-only
branch, n_parts counted from the (flag, partkey) branch — at the cost
of Expand feeding 2x the input rows through the aggregation and
building per-(flag, partkey) percentile/median partials.

Interleaved min-of-N in one warm session; equality of the two variants'
results is asserted on every rep (sorted collect — 3 rows).

Usage: python tools/probe_q04_gs.py SF_DIR [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from riptable_spark.operators import groupby as gb  # noqa: E402
from riptable_spark.queries import QUERIES  # noqa: E402
from riptable_spark.session import get_spark  # noqa: E402
from riptable_spark.sources.io import load_table  # noqa: E402


def q04_gs(spark, sf: str):
    """Single-scan GROUPING SETS variant of q04_groupby_stats."""
    li = load_table(spark, sf, "lineitem")
    q = F.col("l_quantity")
    g = li.groupingSets(
        [["l_returnflag"], ["l_returnflag", "l_partkey"]],
        "l_returnflag", "l_partkey",
    ).agg(
        F.round(gb.median(q), 6).alias("med_qty"),
        F.round(gb.nanvar(q), 6).alias("var_qty"),
        F.round(gb.nanstd(q), 6).alias("std_qty"),
        F.round(gb.sem(q), 6).alias("sem_qty"),
        F.percentile(
            F.col("l_extendedprice"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("__p__"),
        F.grouping("l_partkey").alias("__g__"),
    )
    stats = g.where(F.col("__g__") == 1)
    uniq = (
        g.where(F.col("__g__") == 0)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )
    return stats.join(F.broadcast(uniq), on="l_returnflag", how="left").select(
        "l_returnflag",
        "med_qty",
        "var_qty",
        "std_qty",
        "sem_qty",
        "n_parts",
        F.round(F.element_at("__p__", 1), 6).alias("p25_price"),
        F.round(F.element_at("__p__", 2), 6).alias("p50_price"),
        F.round(F.element_at("__p__", 3), 6).alias("p75_price"),
    )


def main() -> None:
    sf = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("probe_q04_gs")

    dual = lambda: QUERIES["q04_groupby_stats"](spark, sf)  # noqa: E731
    gs = lambda: q04_gs(spark, sf)  # noqa: E731

    # result equality first (tiny: 3 rows)
    a = sorted(map(tuple, dual().collect()))
    b = sorted(map(tuple, gs().collect()))
    assert a == b, f"variant mismatch:\n{a}\n{b}"
    print("variants agree (3 rows, all columns)")

    # warm both
    dual().write.format("noop").mode("overwrite").save()
    gs().write.format("noop").mode("overwrite").save()

    t_dual, t_gs = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        dual().write.format("noop").mode("overwrite").save()
        t_dual.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        gs().write.format("noop").mode("overwrite").save()
        t_gs.append(round(time.perf_counter() - t0, 3))
    print(f"dual scan : {t_dual} min {min(t_dual)}")
    print(f"GROUPING SETS: {t_gs} min {min(t_gs)}")
    print(f"ratio gs/dual (min): {min(t_gs)/min(t_dual):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Binning: cut / qcut / quantile-bucket (SURVEY §2.8).

Reference: /root/reference/riptable/rt_bin.py — cut (:412) fixed-width or
explicit-edge binning, qcut (:155) quantile binning, label generation
(:290 _format_labels). Spark-first: ``width_bucket`` for fixed/explicit
edges (pure codegen); qcut computes edges with one exact-percentile agg
(collected — it is #quantiles scalars, not data) then reuses cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cut(col: Column, bins: int | list[float], lo: float | None = None, hi: float | None = None) -> Column:
    """Bin values; returns 1-based bin index like rt_bin.py:412 (bin 0 =
    out-of-range/invalid, matching the reference's filtered-bin-0 model).

    Interval convention is the REFERENCE'S (= pandas ``right=True``,
    rt_bin.py:540 doctest: cut([1,7,5,4,6,3], 3) puts 5 in '3.0->5.0'):
    bins are RIGHT-closed, (e_i, e_{i+1}], with the first bin also
    including its left edge, [e_0, e_1].

    With ``bins:int`` the caller supplies lo/hi (or pre-aggregates them);
    with explicit edges a chained CASE is emitted — still codegen.
    """
    if isinstance(bins, int):
        if lo is None or hi is None:
            raise ValueError("cut with int bins requires lo/hi bounds")
        # right-closed via width_bucket on the NEGATED axis: left-closed
        # buckets of -x over [-hi, -lo) are right-closed buckets of x
        # over (lo, hi]; x == lo (bucket bins+1 on the flipped axis) is
        # the first bin's included left edge.
        wb = F.width_bucket(-col, F.lit(-float(hi)), F.lit(-float(lo)), F.lit(bins))
        b = F.lit(bins) + 1 - wb
        return (
            F.when(col.isNull(), F.lit(0))
            .when(col == F.lit(float(lo)), F.lit(1))
            .when((b >= F.lit(1)) & (b <= F.lit(bins)), b)
            .otherwise(F.lit(0))
        )
    edges = [float(b) for b in bins]
    out = F.lit(0)
    for i in range(len(edges) - 1):
        lo_e, hi_e = edges[i], edges[i + 1]
        first = i == 0
        cond = ((col >= F.lit(lo_e)) if first else (col > F.lit(lo_e))) & (col <= F.lit(hi_e))
        out = F.when(cond, F.lit(i + 1)).otherwise(out)
    return out


def qcut(df: DataFrame, colname: str, q: int) -> DataFrame:
    """rt_bin.py:155 — quantile binning. One percentile aggregation
    (q+1 scalars to the driver), then a codegen CASE; no per-row Python."""
    probs = [i / q for i in range(q + 1)]
    edges_row = df.agg(
        F.percentile(F.col(colname), F.array(*[F.lit(p) for p in probs])).alias("edges")
    ).collect()[0]
    # skewed data collapses percentile edges; dedupe so tied quantiles
    # merge into one bin (pandas duplicates='drop') instead of routing
    # every tied value into the last matching bin with empty bins before
    edges = sorted(dict.fromkeys(edges_row["edges"]))
    if len(edges) == 1:  # constant column → one all-inclusive bin
        edges = edges * 2
    return df.withColumn(f"{colname}_bin", cut(F.col(colname), edges))


def quantile_edges(df: DataFrame, colname: str, probs: list[float]) -> list[float]:
    row = df.agg(F.percentile(F.col(colname), F.array(*[F.lit(p) for p in probs])).alias("e")).collect()[0]
    return list(row["e"])

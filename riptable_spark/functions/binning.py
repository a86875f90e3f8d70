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

    With ``bins:int`` the caller supplies lo/hi (or pre-aggregates them);
    with explicit edges a chained CASE is emitted — still codegen.
    """
    if isinstance(bins, int):
        if lo is None or hi is None:
            raise ValueError("cut with int bins requires lo/hi bounds")
        wb = F.width_bucket(col, F.lit(float(lo)), F.lit(float(hi)), F.lit(bins))
        # bin-0 contract: NULL and out-of-range (either side) → 0; the top
        # edge is inclusive like the explicit-edges path (width_bucket
        # alone returns bins+1 above hi and NULL for NULL input)
        return (
            F.when(col.isNull(), F.lit(0))
            .when(col == F.lit(float(hi)), F.lit(bins))
            .when((wb >= F.lit(1)) & (wb <= F.lit(bins)), wb)
            .otherwise(F.lit(0))
        )
    edges = [float(b) for b in bins]
    out = F.lit(0)
    for i in range(len(edges) - 1):
        lo_e, hi_e = edges[i], edges[i + 1]
        last = i == len(edges) - 2
        cond = (col >= F.lit(lo_e)) & ((col <= F.lit(hi_e)) if last else (col < F.lit(hi_e)))
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

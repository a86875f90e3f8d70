"""Stats / ML-utility surface (SURVEY §2.8 extras).

Reference: /root/reference/riptable/rt_mlutils.py:12/18 (normalize_zscore,
normalize_minmax), rt_stats.py:83-230 (winsorize, r2, mae, lm, polyFit).

Scale pattern: global statistics are computed as a 1-row aggregate and
broadcast-cross-joined back — never a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_global(df: DataFrame, aggs: list[Column]) -> DataFrame:
    return df.crossJoin(F.broadcast(df.agg(*aggs)))


def normalize_zscore(df: DataFrame, colname: str, out_col: str | None = None) -> DataFrame:
    """(x - mean) / std  (rt_mlutils.py:12)."""
    out = out_col or f"{colname}_zscore"
    g = _with_global(df, [F.avg(colname).alias("__mu__"), F.stddev_samp(colname).alias("__sd__")])
    return g.withColumn(out, (F.col(colname) - F.col("__mu__")) / F.col("__sd__")).drop("__mu__", "__sd__")


def normalize_minmax(df: DataFrame, colname: str, out_col: str | None = None) -> DataFrame:
    """(x - min) / (max - min)  (rt_mlutils.py:18)."""
    out = out_col or f"{colname}_minmax"
    g = _with_global(df, [F.min(colname).alias("__lo__"), F.max(colname).alias("__hi__")])
    return g.withColumn(
        out, (F.col(colname) - F.col("__lo__")) / (F.col("__hi__") - F.col("__lo__"))
    ).drop("__lo__", "__hi__")


def winsorize(df: DataFrame, colname: str, lo: float = 0.05, hi: float = 0.95, out_col: str | None = None) -> DataFrame:
    """Clip to [p_lo, p_hi] percentiles (rt_stats.py:83)."""
    out = out_col or f"{colname}_wins"
    g = _with_global(
        df,
        [
            F.percentile(F.col(colname), F.lit(lo)).alias("__plo__"),
            F.percentile(F.col(colname), F.lit(hi)).alias("__phi__"),
        ],
    )
    return g.withColumn(
        out, F.least(F.greatest(F.col(colname), F.col("__plo__")), F.col("__phi__"))
    ).drop("__plo__", "__phi__")


def r2(df: DataFrame, y: str, yhat: str) -> float:
    """Coefficient of determination (rt_stats.py:93)."""
    row = (
        df.crossJoin(F.broadcast(df.agg(F.avg(y).alias("__my__"))))
        .agg(
            F.sum((F.col(y) - F.col(yhat)) ** 2).alias("ss_res"),
            F.sum((F.col(y) - F.col("__my__")) ** 2).alias("ss_tot"),
        )
        .collect()[0]
    )
    return 1.0 - row.ss_res / row.ss_tot


def mae(df: DataFrame, y: str, yhat: str) -> float:
    """Mean absolute error (rt_stats.py:104)."""
    return df.agg(F.avg(F.abs(F.col(y) - F.col(yhat)))).collect()[0][0]


def lm(df: DataFrame, y: str, x: str) -> tuple[float, float]:
    """Simple linear regression slope/intercept via moment aggregates
    (rt_stats.py:115 lm) — one pass, no MLlib dependency."""
    r = df.agg(
        F.avg(x).alias("mx"),
        F.avg(y).alias("my"),
        F.covar_samp(x, y).alias("cxy"),
        F.var_samp(x).alias("vx"),
    ).collect()[0]
    slope = r.cxy / r.vx
    return slope, r.my - slope * r.mx


def statx(df: DataFrame, colname: str) -> DataFrame:
    """Stats profile (rt_stats.py:40 statx): count/mean/std/min/percentiles."""
    c = F.col(colname)
    return df.agg(
        F.count(c).alias("count"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("std"),
        F.min(c).alias("min"),
        F.percentile(c, F.lit(0.01)).alias("p01"),
        F.percentile(c, F.lit(0.10)).alias("p10"),
        F.percentile(c, F.lit(0.50)).alias("p50"),
        F.percentile(c, F.lit(0.90)).alias("p90"),
        F.percentile(c, F.lit(0.99)).alias("p99"),
        F.max(c).alias("max"),
    )

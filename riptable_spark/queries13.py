"""Driver-contract query registry, batch 13 (round-3 session 9,
q403+): metric mix-shift decomposition, forecast-accuracy reporting,
Tukey-fence data-quality audits, Slope One collaborative filtering,
recommendation diversity/coverage eval, label-propagation communities,
burst detection, and Elo ratings.
Registers into the same QUERIES/ORACLES dicts as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources.io import load_table


# ------------------------------------------------------------------ q403
@query(
    "q403_mix_shift",
    """
    WITH f AS (
        SELECT o_orderpriority AS grp,
               CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END AS ia,
               CASE WHEN year(o_orderdate) = 2000 THEN 1 ELSE 0 END AS ib,
               CAST(round(o_totalprice * 100) AS BIGINT) AS x
        FROM orders WHERE year(o_orderdate) IN (1995, 2000)
    ),
    byg AS (
        SELECT grp,
               CAST(sum(ia) AS BIGINT) AS n_a, CAST(sum(ib) AS BIGINT) AS n_b,
               CAST(sum(x * ia) AS BIGINT) AS s_a, CAST(sum(x * ib) AS BIGINT) AS s_b
        FROM f GROUP BY grp
    ),
    tot AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS na, CAST(sum(n_b) AS BIGINT) AS nb,
               CAST(sum(s_a) AS BIGINT) AS sa, CAST(sum(s_b) AS BIGINT) AS sb
        FROM byg
    )
    SELECT grp, n_a, n_b, s_a, s_b,
           CAST(n_a AS DOUBLE) / na AS share_a,
           CAST(n_b AS DOUBLE) / nb AS share_b,
           CASE WHEN n_a > 0 THEN CAST(s_a AS DOUBLE) / n_a
                ELSE CAST(sa AS DOUBLE) / na END AS rate_a,
           CASE WHEN n_b > 0 THEN CAST(s_b AS DOUBLE) / n_b
                ELSE CAST(sb AS DOUBLE) / nb END AS rate_b,
           (CAST(n_b AS DOUBLE) / nb - CAST(n_a AS DOUBLE) / na)
             * (CASE WHEN n_a > 0 THEN CAST(s_a AS DOUBLE) / n_a
                     ELSE CAST(sa AS DOUBLE) / na END) AS mix_effect,
           (CAST(n_b AS DOUBLE) / nb)
             * ((CASE WHEN n_b > 0 THEN CAST(s_b AS DOUBLE) / n_b
                      ELSE CAST(sb AS DOUBLE) / nb END)
                - (CASE WHEN n_a > 0 THEN CAST(s_a AS DOUBLE) / n_a
                        ELSE CAST(sa AS DOUBLE) / na END)) AS rate_effect
    FROM byg, tot
    """,
)
def q403(spark: SparkSession, sf: str) -> DataFrame:
    """Mix-shift decomposition of average order value, 1995 → 2000, by
    order priority: how much of the move is composition (mix) vs
    within-priority value (rate).  Exact-BIGINT group sums; every float
    is a fixed tree of single divides — no rounding anywhere
    (functions/stats.mix_shift)."""
    from .functions import stats as st

    o = load_table(spark, sf, "orders")
    f = o.where(F.year("o_orderdate").isin(1995, 2000)).select(
        F.col("o_orderpriority").alias("grp"),
        F.year("o_orderdate").alias("yr"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    return st.mix_shift(f, "yr", "grp", "cents", 1995, 2000)


# ------------------------------------------------------------------ q404
@query(
    "q404_forecast_accuracy",
    """
    WITH f AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS a,
               CAST(event_id % 40000 + 100 AS BIGINT) AS fc,
               ts, event_id
        FROM events
    ),
    w AS (
        SELECT user_id, a, fc, fc - a AS e,
               abs(a - lag(a) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS naive
        FROM f
    ),
    g AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(e) AS BIGINT) AS sum_e,
               CAST(sum(abs(e)) AS BIGINT) AS sum_ae,
               CAST(sum(abs(a)) AS BIGINT) AS sum_aa,
               CAST(sum(abs(a) + abs(fc)) AS BIGINT) AS sum_af,
               CAST(sum(naive) AS BIGINT) AS sum_naive
        FROM w GROUP BY user_id
    )
    SELECT user_id, n,
           CAST(sum_e AS DOUBLE) / n AS bias,
           CAST(sum_ae AS DOUBLE) / n AS mae,
           CASE WHEN sum_aa > 0 THEN CAST(sum_ae AS DOUBLE) / sum_aa END AS wape,
           CASE WHEN sum_af > 0 THEN CAST(2 * sum_ae AS DOUBLE) / sum_af END AS smape,
           CASE WHEN n > 1 AND sum_naive > 0
                THEN CAST(sum_ae * (n - 1) AS DOUBLE) / (n * sum_naive) END AS mase
    FROM g
    """,
)
def q404(spark: SparkSession, sf: str) -> DataFrame:
    """Forecast-accuracy report (bias/MAE/WAPE/sMAPE/MASE) per user over
    a deterministic synthetic forecast vs the event value stream.  Every
    metric is one divide of exact-BIGINT accumulators (the aggregate
    sMAPE form — a per-row float ratio sum folds differently in every
    engine pair) (functions/stats.forecast_accuracy)."""
    from .functions import stats as st

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("a"),
        (F.col("event_id") % 40000 + 100).cast("long").alias("fc"),
    )
    return st.forecast_accuracy(ev, ["user_id"], "a", "fc", ["ts", "event_id"])


# ------------------------------------------------------------------ q405
@query(
    "q405_iqr_outliers",
    """
    WITH f AS (
        SELECT l_returnflag AS flag,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        FROM lineitem
    ),
    fences AS (
        SELECT flag,
               quantile_cont(x, 0.25) AS q1,
               quantile_cont(x, 0.75) AS q3
        FROM f GROUP BY flag
    ),
    fe AS (
        SELECT flag, q1, q3,
               q1 - CAST('1.5' AS DOUBLE) * (q3 - q1) AS lo_fence,
               q3 + CAST('1.5' AS DOUBLE) * (q3 - q1) AS hi_fence
        FROM fences
    )
    SELECT f.flag, CAST(count(*) AS BIGINT) AS n,
           min(fe.q1) AS q1, min(fe.q3) AS q3,
           min(fe.lo_fence) AS lo_fence, min(fe.hi_fence) AS hi_fence,
           CAST(sum(CASE WHEN f.x < fe.lo_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_out_low,
           CAST(sum(CASE WHEN f.x > fe.hi_fence THEN 1 ELSE 0 END) AS BIGINT) AS n_out_high
    FROM f JOIN fe ON f.flag = fe.flag
    GROUP BY f.flag
    """,
)
def q405(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey-fence outlier audit of extended price per return flag
    (operators/profile.iqr_outliers).  Quarter-fraction quantiles of
    integer cents are exactly representable doubles, so fences compare
    without rounding; the fence relation broadcasts back onto the fact
    scan (two passes, no fact-table sort)."""
    from .operators import profile as prof

    li = load_table(spark, sf, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("x"),
    )
    return prof.iqr_outliers(li, ["flag"], "x", k=1.5)

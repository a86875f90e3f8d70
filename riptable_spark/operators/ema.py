"""Time-decay EMA family (SURVEY §2.5 / §4.2 item 2).

Reference formulas (/root/reference/riptable/rt_groupbyops.py):
- ema_decay (:3314-3363):  out_i = x_i + last * exp(-rate * Δt_i)
- ema_normal (:3366-3435): w = exp(-rate * Δt_i); last = x_i*(1-w) + last*w
- ema_weighted (:3438):    fixed decay_rate, ignores time:
  LastEma = x*(1-decay_rate) + LastEma*decay_rate — decay_rate weights
  the OLD value (pandas-style alpha = 1 - decay_rate).

These are sequential per-group recurrences — not expressible as a Spark
window aggregate. Implementation: ``applyInPandas`` with a vectorized
numpy scan per group. One shuffle on the group keys; each group is scanned
in Arrow batches on the executor — the honest distributed form. Skewed
giant groups are the scale hazard; every variant (decay/normal via
``method='blocked'`` + ``block_seconds``, weighted via
``method='blocked'`` + ``block_rows``) has a blocked path that bounds
any single Arrow batch to one block and carries the seed exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from .apply import grouped_apply
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _decayed_cumsum(c: np.ndarray, e: np.ndarray) -> np.ndarray:
    """Vectorized evaluation of the recurrence out_i = c_i + out_{i-1} *
    exp(-(e_i - e_{i-1})) via the closed form out_i = e^{-e_i} Σ_{j≤i}
    c_j e^{e_j}, processed in blocks rebased whenever the exponent range
    exceeds 500 so e^{e} never overflows. O(n) numpy, no Python loop over
    rows (the block loop runs ~range(e)/500 times)."""
    n = len(c)
    out = np.empty(n, dtype=np.float64)
    if n == 0:
        return out
    start = 0
    prev_out = 0.0
    prev_e = e[0]
    while start < n:
        e0 = e[start]
        end = int(np.searchsorted(e[start:], e0 + 500.0)) + start
        end = max(end, start + 1)
        w = np.exp(e[start:end] - e0)
        carry = prev_out * np.exp(-(e0 - prev_e))
        block = (np.cumsum(c[start:end] * w) + carry) / w
        out[start:end] = block
        prev_out = block[-1]
        prev_e = e[end - 1]
        start = end
    return out


def _ema_decay_scan(x: np.ndarray, t: np.ndarray, rate: float) -> np.ndarray:
    """out_i = x_i + last*exp(-rate*Δt); first row's Δt is 0."""
    if len(x) == 0:
        return np.empty(0, dtype=np.float64)
    e = rate * (t - t[0])
    return _decayed_cumsum(x.astype(np.float64), e)


def _ema_normal_scan(x: np.ndarray, t: np.ndarray, rate: float) -> np.ndarray:
    """last = x*(1-w) + last*w, w=exp(-rate*Δt), last initialized to x_0."""
    if len(x) == 0:
        return np.empty(0, dtype=np.float64)
    e = rate * (t - t[0])
    w = np.exp(-np.diff(e, prepend=e[0]))
    c = (1.0 - w) * x
    c[0] = x[0]  # initialization last=x_0 (decay of the seed, not (1-w)x_0)
    return _decayed_cumsum(c, e)


def _ema_weighted_scan(x: np.ndarray, alpha: float) -> np.ndarray:
    """last = alpha*x + (1-alpha)*last, last initialized to x_0."""
    n = len(x)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    e = -np.log1p(-alpha) * np.arange(n, dtype=np.float64)
    c = np.full(n, alpha, dtype=np.float64) * x
    c[0] = x[0]
    return _decayed_cumsum(c, e)


def _make_applier(kind: str, valcol: str, timecol: str | None, rate: float, out_col: str, sort_cols: list[str]):
    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[valcol].to_numpy(dtype=np.float64)
        if kind in ("decay", "normal"):
            t = pdf[timecol].to_numpy(dtype=np.float64)
            # _decayed_cumsum's block rebasing (np.searchsorted) requires a
            # nondecreasing exponent array; a caller ordering by a
            # non-time column would get silently wrong values otherwise.
            if len(t) > 1 and (np.diff(t) < 0).any():
                raise ValueError(
                    f"ema_{kind}: time column {timecol!r} is not "
                    f"nondecreasing under order_col={sort_cols!r}"
                )
        if kind == "decay":
            pdf[out_col] = _ema_decay_scan(x, t, rate)
        elif kind == "normal":
            pdf[out_col] = _ema_normal_scan(x, t, rate)
        else:
            pdf[out_col] = _ema_weighted_scan(x, rate)
        return pdf

    return apply_fn


def _as_list(order_col) -> list[str]:
    return [order_col] if isinstance(order_col, str) else list(order_col)


def _run(df: DataFrame, keys: list[str], kind: str, valcol: str, timecol: str | None, rate: float, out_col: str, order_col) -> DataFrame:
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.DoubleType())])
    # time column arrives as numeric seconds for the scan
    work = df
    sort_cols = _as_list(order_col)
    fn = _make_applier(kind, valcol, timecol, rate, out_col, sort_cols)
    return grouped_apply(work, keys, fn, out_schema)


def ema_decay(df: DataFrame, keys: list[str], valcol: str, timecol: str, rate: float, out_col: str = "ema", order_col: str | None = None, method: str = "auto", block_seconds: float | None = None, filter=None, reset=None) -> DataFrame:
    """rt_groupbyops.py:3314 — decaying running sum. ``timecol`` must be
    numeric (epoch seconds / ns); cast timestamps upstream. ``method``:
    'expr' (codegen closed form), 'scan' (Arrow per-group scan), 'auto'
    (expr when the exponent span provably cannot overflow), 'blocked'
    (giant-group-safe scan: requires ``block_seconds``).

    ``filter`` (rt_fastarraynumba.py:625): masked-out rows contribute
    nothing but DECAY STILL APPLIES — their output is the carried value
    decayed over the gap (the doctest's semantics). ``reset``
    (:634): rows where the mask is True restart the EMA at x_i —
    realized as a cumsum-of-resets segment key folded into the
    partition keys, so every execution path (codegen/scan/blocked)
    inherits it. A row both masked and reset restarts at 0 (c of a
    masked row)."""
    if filter is not None or reset is not None:
        from pyspark.sql import Window

        c = (
            F.when(filter, F.col(valcol).cast("double")).otherwise(F.lit(0.0))
            if filter is not None
            else F.col(valcol).cast("double")
        )
        work = df.withColumn("__ema_c__", c)
        keys2 = list(keys)
        drop = ["__ema_c__"]
        if reset is not None:
            wseg = Window.partitionBy(*keys).orderBy(order_col or timecol).rowsBetween(Window.unboundedPreceding, 0)
            work = work.withColumn("__ema_seg__", F.sum(reset.cast("int")).over(wseg))
            keys2.append("__ema_seg__")
            drop.append("__ema_seg__")
        out = ema_decay(work, keys2, "__ema_c__", timecol, rate, out_col, order_col, method, block_seconds)
        return out.drop(*drop)
    if method == "blocked":
        return _blocked_run(df, keys, "decay", valcol, timecol, rate, out_col, block_seconds)
    if method == "scan":
        return _run(df, keys, "decay", valcol, timecol, rate, out_col, order_col or timecol)
    return _dispatch(df, keys, "decay", valcol, timecol, rate, out_col, order_col or timecol, method)


def ema_normal(df: DataFrame, keys: list[str], valcol: str, timecol: str, rate: float, out_col: str = "ema", order_col: str | None = None, method: str = "auto", block_seconds: float | None = None, filter=None, reset=None) -> DataFrame:
    """rt_groupbyops.py:3366 — true time-decay EWMA. ``method='blocked'``
    splits giant groups on coarse time buckets (see _blocked_run).
    ``filter``/``reset`` follow ema_decay's semantics (masked rows
    contribute 0 but still decay; reset rows restart the EWMA)."""
    if filter is not None or reset is not None:
        from pyspark.sql import Window

        c = (
            F.when(filter, F.col(valcol).cast("double")).otherwise(F.lit(0.0))
            if filter is not None
            else F.col(valcol).cast("double")
        )
        work = df.withColumn("__ema_c__", c)
        keys2 = list(keys)
        drop = ["__ema_c__"]
        if reset is not None:
            wseg = Window.partitionBy(*keys).orderBy(order_col or timecol).rowsBetween(Window.unboundedPreceding, 0)
            work = work.withColumn("__ema_seg__", F.sum(reset.cast("int")).over(wseg))
            keys2.append("__ema_seg__")
            drop.append("__ema_seg__")
        out = ema_normal(work, keys2, "__ema_c__", timecol, rate, out_col, order_col, method, block_seconds)
        return out.drop(*drop)
    if method == "blocked":
        return _blocked_run(df, keys, "normal", valcol, timecol, rate, out_col, block_seconds)
    if method == "scan":
        return _run(df, keys, "normal", valcol, timecol, rate, out_col, order_col or timecol)
    return _dispatch(df, keys, "normal", valcol, timecol, rate, out_col, order_col or timecol, method)


def ema_weighted(df: DataFrame, keys: list[str], valcol: str, decay_rate: float, order_col: str, out_col: str = "ema", method: str = "auto", block_rows: int | None = None) -> DataFrame:
    """rt_groupbyops.py:3438 — fixed-weight EWMA in row order.

    ``decay_rate`` follows the REFERENCE convention: it weights the OLD
    value, LastEma = x*(1-decay_rate) + LastEma*decay_rate. Callers
    porting pandas ``ewm(alpha=...)`` code should pass
    ``decay_rate = 1 - alpha``.

    ``method='blocked'`` (requires ``block_rows``) is the giant-group
    scale path: the fixed-weight recurrence is EXACTLY the time-decay
    recurrence on t=row_number with rate = −ln(decay_rate)
    (exp(−rate·Δrn) = decay_rate for consecutive rows), so it reuses
    ``_blocked_run`` — the rank window is a sort-based window that
    spills gracefully; only ≤ block_rows rows ever materialize in one
    Arrow batch.
    """
    if not 0.0 <= decay_rate <= 1.0:
        raise ValueError(f"decay_rate must be in [0, 1], got {decay_rate}")
    alpha = 1.0 - decay_rate  # new-value weight used by the internal scans
    if alpha >= 1.0:
        # decay_rate=0: the EMA is just x. (Also keeps log1p(-alpha)
        # finite in both execution paths.)
        return df.withColumn(out_col, F.col(valcol).cast("double"))
    if method == "blocked":
        from pyspark.sql import Window

        rn = F.row_number().over(Window.partitionBy(*keys).orderBy(order_col))
        work = df.withColumn("__rn__", rn)
        rate2 = -float(np.log(decay_rate))
        return _blocked_run(
            work, keys, "normal", valcol, "__rn__", rate2, out_col, float(block_rows or 0)
        ).drop("__rn__")
    if method == "scan":
        return _run(df, keys, "weighted", valcol, None, alpha, out_col, order_col)
    return _dispatch(df, keys, "weighted", valcol, None, alpha, out_col, order_col, method)


# ---------------------------------------------------------------------
# Pure-JVM closed-form fast path
# ---------------------------------------------------------------------
# The recurrence out_i = c_i + out_{i-1}·exp(-(e_i - e_{i-1})) telescopes
# to out_i = exp(-e_i)·Σ_{j≤i} c_j·exp(e_j) — a windowed cumsum that runs
# entirely in whole-stage codegen (one shuffle, no Python). Valid while
# the per-group exponent span max(e)-min(e) < ~600 (double overflow at
# e^709). ema_* with method="auto" measures the global span with one tiny
# aggregation and picks this path when safe, else the Arrow scan.

_EXPR_SPAN_LIMIT = 600.0


def _expr_run(df: DataFrame, keys: list[str], kind: str, valcol: str, timecol: str | None, rate: float, out_col: str, order_col) -> DataFrame:
    from pyspark.sql import Window

    ocols = _as_list(order_col)
    wk = Window.partitionBy(*keys)
    wo = Window.partitionBy(*keys).orderBy(*ocols).rowsBetween(Window.unboundedPreceding, 0)
    x = F.col(valcol).cast("double")
    if kind == "weighted":
        rn = F.row_number().over(Window.partitionBy(*keys).orderBy(*ocols))
        e = F.lit(-float(np.log1p(-rate))) * (rn - 1).cast("double")
        c = F.when(rn == 1, x).otherwise(F.lit(float(rate)) * x)
    else:
        t = F.col(timecol).cast("double")
        e = F.lit(float(rate)) * (t - F.min(t).over(wk))
        if kind == "decay":
            c = x
        else:  # normal: c_i = (1-exp(-rate·Δt))·x_i, seeded with x_0
            rn = F.row_number().over(Window.partitionBy(*keys).orderBy(*ocols))
            pt = F.lag(t).over(Window.partitionBy(*keys).orderBy(*ocols))
            c = F.when(rn == 1, x).otherwise((1 - F.exp(-F.lit(float(rate)) * (t - pt))) * x)
    return df.withColumn(out_col, F.exp(-e) * F.sum(c * F.exp(e)).over(wo))


def _span_ok(df: DataFrame, keys: list[str], kind: str, timecol: str | None, rate: float) -> bool:
    """Probe whether the codegen closed form is overflow-safe. The probe
    is the price of method='auto'; keep it as cheap as possible:

    - decay/normal: GLOBAL max(t)−min(t) bounds every group's span from
      above — a shuffle-free map-side min/max (2 doubles per partition),
      and eligible for parquet aggregate pushdown when the column comes
      straight off a scan. Conservative: a safe verdict is always safe;
      an unsafe verdict only costs falling back to the Arrow scan.
    - weighted: the span grows with GROUP LENGTH, where the global row
      count is far too loose a bound — pay the per-group count (one
      shuffle of key + long).

    Callers that can bound rate·span a priori should pass method='expr';
    callers that cannot tolerate any probe pass method='scan'."""
    if kind == "weighted":
        span = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).agg(
            F.max(F.lit(-float(np.log1p(-rate))) * F.col("n").cast("double"))
        ).first()[0]
    else:
        t = F.col(timecol).cast("double")
        row = df.agg((F.max(t) - F.min(t)).alias("s")).first()
        span = None if row.s is None else float(rate) * row.s
    return span is not None and span < _EXPR_SPAN_LIMIT


def _dispatch(df: DataFrame, keys: list[str], kind: str, valcol: str, timecol: str | None, rate: float, out_col: str, order_col: str, method: str) -> DataFrame:
    if method == "expr" or (method == "auto" and _span_ok(df, keys, kind, timecol, rate)):
        return _expr_run(df, keys, kind, valcol, timecol, rate, out_col, order_col)
    return _run(df, keys, kind, valcol, timecol, rate, out_col, order_col)


# ---------------------------------------------------------------------
# Giant-group-safe blocked scan (VERDICT r2 #5)
# ---------------------------------------------------------------------
# The plain scan path materializes a whole group in one Arrow batch — a
# 10M-row key on a skewed corpus is a straggler/OOM hazard. The EMA
# recurrence is LINEAR in its seed: if a block is scanned with seed 0,
# the true output differs only by adj_k · exp(-rate·(t_i − t_start_k)),
# where adj_k folds the carried seed (and, for ema_normal, the first-row
# weight correction). So:
#   A. split each key on coarse time buckets floor(t/block_seconds) and
#      scan every (key, block) independently in parallel;
#   B. run the seed recurrence over per-block SUMMARIES (one tiny row per
#      block) per key — group size is n_blocks, not n_rows;
#   C. equi-join adj_k back on (key, block) and apply the closed-form
#      correction. Exponents in the correction are ≤ 0 — no overflow.


def _blocked_run(df: DataFrame, keys: list[str], kind: str, valcol: str, timecol: str, rate: float, out_col: str, block_seconds: float | None) -> DataFrame:
    if not block_seconds or block_seconds <= 0:
        raise ValueError("method='blocked' requires block_seconds > 0")
    work = df.withColumn("__blk__", F.floor(F.col(timecol).cast("double") / F.lit(float(block_seconds))))

    # Phase A: independent per-(key, block) scans with seed 0, plus the
    # block summary columns the seed recurrence needs.
    a_schema = T.StructType(
        work.schema.fields
        + [
            T.StructField(out_col, T.DoubleType()),
            T.StructField("__t_start__", T.DoubleType()),
            T.StructField("__t_last__", T.DoubleType()),
            T.StructField("__local_last__", T.DoubleType()),
            T.StructField("__x_first__", T.DoubleType()),
        ]
    )

    def scan_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([timecol], kind="mergesort")
        x = pdf[valcol].to_numpy(dtype=np.float64)
        t = pdf[timecol].to_numpy(dtype=np.float64)
        local = _ema_decay_scan(x, t, rate) if kind == "decay" else _ema_normal_scan(x, t, rate)
        pdf[out_col] = local
        pdf["__t_start__"] = t[0] if len(t) else np.nan
        pdf["__t_last__"] = t[-1] if len(t) else np.nan
        pdf["__local_last__"] = local[-1] if len(local) else np.nan
        pdf["__x_first__"] = x[0] if len(x) else np.nan
        return pdf

    scanned = grouped_apply(work, [*keys, "__blk__"], scan_block, a_schema)

    # Phase B: seed recurrence over block summaries (n_blocks rows/key).
    summaries = scanned.groupBy(*keys, "__blk__").agg(
        F.first("__t_start__").alias("__t_start__"),
        F.first("__t_last__").alias("__t_last__"),
        F.first("__local_last__").alias("__local_last__"),
        F.first("__x_first__").alias("__x_first__"),
    )
    b_schema = T.StructType(
        [f for f in summaries.schema.fields if f.name in set(keys) | {"__blk__", "__t_start__"}]
        + [T.StructField("__adj__", T.DoubleType())]
    )

    def seed_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__blk__", kind="mergesort")
        ts_a = pdf["__t_start__"].to_numpy(dtype=np.float64)
        tl_a = pdf["__t_last__"].to_numpy(dtype=np.float64)
        ll_a = pdf["__local_last__"].to_numpy(dtype=np.float64)
        xf_a = pdf["__x_first__"].to_numpy(dtype=np.float64)
        adjs = np.zeros(len(pdf), dtype=np.float64)
        prev_last = None
        prev_t = None
        for i in range(len(pdf)):
            if prev_last is None:
                adj = 0.0
            else:
                w = np.exp(-rate * (ts_a[i] - prev_t))
                seed = prev_last * w
                if kind == "normal":
                    # phase A seeded the block's first row with c=x_first
                    # (fresh-group init); the true first-row contribution
                    # is (1-w)·x_first with w spanning the block gap
                    adj = seed - w * xf_a[i]
                else:
                    adj = seed
            adjs[i] = adj
            prev_last = ll_a[i] + adj * np.exp(-rate * (tl_a[i] - ts_a[i]))
            prev_t = tl_a[i]
        out = pdf[[*keys, "__blk__", "__t_start__"]].copy()
        out["__adj__"] = adjs
        return out

    seeds = grouped_apply(summaries, keys, seed_blocks, b_schema)

    # Phase C: linear correction — exponent ≤ 0, overflow-free.
    joined = scanned.drop("__t_start__").join(seeds, on=[*keys, "__blk__"])
    corrected = F.col(out_col) + F.col("__adj__") * F.exp(
        -F.lit(float(rate)) * (F.col(timecol).cast("double") - F.col("__t_start__"))
    )
    return joined.withColumn(out_col, corrected).drop(
        "__blk__", "__t_start__", "__t_last__", "__local_last__", "__x_first__", "__adj__"
    )


def ewm_stats(
    df: DataFrame,
    keys: list[str],
    valcol: str,
    timecol: str,
    rate: float,
    order_col: str | None = None,
) -> DataFrame:
    """Exponentially-weighted running MEAN and VARIANCE (the RiskMetrics
    volatility estimator): three decayed running sums over the SAME
    window — Σw·x², Σw·x, Σw (w = exp(−rate·Δt)) — composed as
    mean = S1/W and var = S2/W − mean².  All three ride ema_decay's
    codegen closed form (one sort window, JVM-side, no Python), so the
    marginal cost over a single EMA is two more window columns.

    Appends ``ewm_mean`` and ``ewm_var`` (population-style; NULL-safe:
    rows before any data in the key yield NULL).
    """
    work = df.withColumn("__one__", F.lit(1.0)).withColumn(
        "__sq__", F.col(valcol).cast("double") * F.col(valcol).cast("double")
    )
    work = ema_decay(work, keys, valcol, timecol, rate, out_col="__s1__", order_col=order_col)
    work = ema_decay(work, keys, "__sq__", timecol, rate, out_col="__s2__", order_col=order_col)
    work = ema_decay(work, keys, "__one__", timecol, rate, out_col="__w__", order_col=order_col)
    mean = F.col("__s1__") / F.col("__w__")
    var = F.col("__s2__") / F.col("__w__") - mean * mean
    return work.withColumn("ewm_mean", mean).withColumn(
        "ewm_var", F.greatest(var, F.lit(0.0))
    ).drop("__one__", "__sq__", "__s1__", "__s2__", "__w__")


def holt_linear(
    df: DataFrame,
    keys: list[str],
    valcol: str,
    order_col: str | list[str],
    alpha: float = 0.3,
    beta: float = 0.1,
    out_prefix: str = "holt",
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) per key:
        l_t = α·x_t + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    initialized l_1 = x_1, b_1 = 0 — the standard trend-aware smoother
    and one-step-ahead forecast (l + b).  ``order_col`` may be a list of
    columns for a composite total order (required for hash-stable
    output when a single column has ties).

    Two COUPLED recurrences have no closed form (single EMAs do — see
    ema_decay's codegen path), so this is an Arrow-batched
    applyInPandas scan per key, the same giant-group contract as the
    ema scan path.  Appends ``{prefix}_level``, ``{prefix}_trend``,
    ``{prefix}_forecast``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(f"{out_prefix}_level", T.DoubleType()),
            T.StructField(f"{out_prefix}_trend", T.DoubleType()),
            T.StructField(f"{out_prefix}_forecast", T.DoubleType()),
        ]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = pdf[valcol].to_numpy(dtype=np.float64)
        n = len(x)
        lev = np.empty(n)
        tr = np.empty(n)
        if n:
            lev[0], tr[0] = x[0], 0.0
            for i in range(1, n):
                prev = lev[i - 1]
                lev[i] = alpha * x[i] + (1 - alpha) * (prev + tr[i - 1])
                tr[i] = beta * (lev[i] - prev) + (1 - beta) * tr[i - 1]
        pdf[f"{out_prefix}_level"] = lev
        pdf[f"{out_prefix}_trend"] = tr
        pdf[f"{out_prefix}_forecast"] = lev + tr
        return pdf

    return grouped_apply(df, keys, scan, schema)


def ewm_cov(
    df: DataFrame,
    keys: list[str],
    xcol: str,
    ycol: str,
    timecol: str,
    rate: float,
    order_col: str | None = None,
) -> DataFrame:
    """Exponentially-weighted running COVARIANCE, CORRELATION and BETA
    of y on x — the RiskMetrics pair estimator (hedge-ratio /
    rolling-beta tracking without a fixed lookback).

    Six decayed running sums over the SAME closed-form codegen window
    (Σw, Σwx, Σwy, Σwx², Σwy², Σwxy with w = exp(−rate·Δt)), composed
    as cov = Sxy/W − (Sx/W)(Sy/W), beta = cov/var_x, corr =
    cov/√(var_x·var_y) — all JVM-side, no Python, one sort per key.

    Appends ``ewm_cov``, ``ewm_beta``, ``ewm_corr`` (NULL where the
    decayed variance of x (resp. x·y) is zero — degenerate windows).
    """
    x = F.col(xcol).cast("double")
    y = F.col(ycol).cast("double")
    work = (
        df.withColumn("__one__", F.lit(1.0))
        .withColumn("__xy__", x * y)
        .withColumn("__xx__", x * x)
        .withColumn("__yy__", y * y)
    )
    for src, dst in [(xcol, "__sx__"), (ycol, "__sy__"), ("__xy__", "__sxy__"),
                     ("__xx__", "__sxx__"), ("__yy__", "__syy__"), ("__one__", "__w__")]:
        work = ema_decay(work, keys, src, timecol, rate, out_col=dst, order_col=order_col)
    w = F.col("__w__")
    mx, my = F.col("__sx__") / w, F.col("__sy__") / w
    cov = F.col("__sxy__") / w - mx * my
    varx = F.greatest(F.col("__sxx__") / w - mx * mx, F.lit(0.0))
    vary = F.greatest(F.col("__syy__") / w - my * my, F.lit(0.0))
    out = (
        work.withColumn("ewm_cov", cov)
        .withColumn("ewm_beta", F.when(varx > 0, cov / varx))
        .withColumn("ewm_corr", F.when((varx > 0) & (vary > 0), cov / F.sqrt(varx * vary)))
    )
    return out.drop("__one__", "__xy__", "__xx__", "__yy__",
                    "__sx__", "__sy__", "__sxy__", "__sxx__", "__syy__", "__w__")


def holt_winters(
    df: DataFrame,
    keys: list[str],
    valcol: str,
    order_col: str,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    out_prefix: str = "hw",
) -> DataFrame:
    """Additive Holt-Winters triple-exponential smoothing per key:
        l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
        s_t = γ(x_t − l_t) + (1−γ)·s_{t−m}
    initialized l_1 = x_1, b_1 = 0, s = 0 — so with γ = 0 the seasonal
    state stays identically zero and the recurrence degenerates to
    EXACTLY :func:`holt_linear` (property-tested bit-for-bit), the same
    way holt_linear(β=0) degenerates toward a plain EMA.

    Three coupled recurrences (one with lag m) have no closed form, so
    like holt_linear this is ONE Arrow-batched applyInPandas scan per
    key.  Emits ``{prefix}_level/trend/season/forecast`` where forecast
    is the one-step-ahead prediction l_{t−1} + b_{t−1} + s_{t−m} (NULL
    for each key's first row).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    m = int(period)
    schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(f"{out_prefix}_level", T.DoubleType()),
            T.StructField(f"{out_prefix}_trend", T.DoubleType()),
            T.StructField(f"{out_prefix}_season", T.DoubleType()),
            T.StructField(f"{out_prefix}_forecast", T.DoubleType()),
        ]
    )
    cols = list(df.columns)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        x = pdf[valcol].to_numpy(dtype=np.float64)
        n = len(x)
        lvl = np.empty(n); trd = np.empty(n); ssn = np.empty(n); fct = np.empty(n)
        seasons = [0.0] * m
        l_prev, b_prev = 0.0, 0.0
        for t in range(n):
            s_lag = seasons[t % m]
            if t == 0:
                l, b = x[0], 0.0
                fct[0] = np.nan
            else:
                fct[t] = l_prev + b_prev + s_lag
                l = alpha * (x[t] - s_lag) + (1 - alpha) * (l_prev + b_prev)
                b = beta * (l - l_prev) + (1 - beta) * b_prev
            s = gamma * (x[t] - l) + (1 - gamma) * s_lag
            seasons[t % m] = s
            lvl[t], trd[t], ssn[t] = l, b, s
            l_prev, b_prev = l, b
        pdf[f"{out_prefix}_level"] = lvl
        pdf[f"{out_prefix}_trend"] = trd
        pdf[f"{out_prefix}_season"] = ssn
        pdf[f"{out_prefix}_forecast"] = fct
        return pdf[cols + [f"{out_prefix}_level", f"{out_prefix}_trend",
                           f"{out_prefix}_season", f"{out_prefix}_forecast"]]

    return grouped_apply(df, keys, scan, schema)


def croston(
    df: DataFrame,
    keys: list[str],
    demand_col: str,
    order: list[str],
    alpha: float = 0.1,
    variant: str = "classic",
) -> DataFrame:
    """Croston's method for INTERMITTENT demand (sparse series with many
    zero periods, where plain EMA collapses toward zero between
    demands): two coupled EWMAs — demand SIZE z and inter-demand
    INTERVAL p, both updated only on nonzero-demand periods — with
    forecast z/p (``variant='sba'`` applies the Syntetos-Boylan
    (1−α/2) bias correction).

    The interval EWMA makes the state update conditional on a
    path-dependent counter (periods since last demand), so this is an
    ordered Arrow scan per key (the holt_linear shape); correctness is
    rows-only, pinned by the constant-demand fixpoint (z→d, p→gap,
    forecast→d/gap) and hand cases.  Returns the last row per key:
    (keys…, n_periods, n_demands, z, p, forecast).
    """
    import pandas as pd

    key_schema = ", ".join(f"{k} string" for k in keys)
    out_schema = (
        f"{key_schema}, n_periods long, n_demands long, z double, p double, forecast double"
    )
    a = float(alpha)
    sba = 1.0 - a / 2.0 if variant == "sba" else 1.0

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        z = None
        p = None
        since = 0
        n_dem = 0
        for d in pdf[demand_col]:
            since += 1
            d = float(d)
            if d > 0:
                n_dem += 1
                if z is None:
                    z, p = d, float(since)
                else:
                    z = z + a * (d - z)
                    p = p + a * (since - p)
                since = 0
        fc = sba * (z / p) if z is not None and p and p > 0 else None
        head = {k: [str(pdf[k].iloc[0])] for k in keys} if len(pdf) else {k: [None] for k in keys}
        return pd.DataFrame(
            {**head, "n_periods": [len(pdf)], "n_demands": [n_dem],
             "z": [z], "p": [p], "forecast": [fc]}
        )

    return grouped_apply(df, keys, scan, out_schema)


def dtw_pairs(
    df: DataFrame,
    pair_col: str,
    side_col: str,
    order: list[str],
    val_col: str,
    band: int | None = None,
) -> DataFrame:
    """Dynamic-time-warping distance per series pair — the classic
    elastic similarity for time series that plain L1/L2 misaligns
    (shifted peaks, stretched seasons).  Input rows carry (pair id,
    side 'a'/'b', order, value); each pair's two series run the O(n·m)
    DP in one Arrow batch (the fifo_pnl shape: pairs partition the
    work).  ``band`` is the Sakoe-Chiba constraint (|i−j| ≤ band) that
    keeps long series affordable.  Integer inputs make the DP exact
    (sums of |Δ| are ints), so results are reproducible bit-for-bit.
    Rows-only correctness: dtw(x, x) = 0, symmetry, and hand-case DPs
    are pinned in tests.  Returns (pair, n_a, n_b, dtw).
    """
    import numpy as np
    import pandas as pd

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        a = pdf.loc[pdf[side_col] == "a", val_col].to_numpy(dtype=np.int64)
        b = pdf.loc[pdf[side_col] == "b", val_col].to_numpy(dtype=np.int64)
        n, m = len(a), len(b)
        pair = pdf[pair_col].iloc[0] if len(pdf) else None
        if n == 0 or m == 0:
            return pd.DataFrame({pair_col: [pair], "n_a": [n], "n_b": [m], "dtw": [None]})
        INF = np.iinfo(np.int64).max // 4
        prev = np.full(m + 1, INF, dtype=np.int64)
        prev[0] = 0
        for i in range(1, n + 1):
            cur = np.full(m + 1, INF, dtype=np.int64)
            lo = 1 if band is None else max(1, i - band)
            hi = m if band is None else min(m, i + band)
            for j in range(lo, hi + 1):
                cost = abs(int(a[i - 1]) - int(b[j - 1]))
                cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
            prev = cur
        return pd.DataFrame(
            {pair_col: [pair], "n_a": [n], "n_b": [m], "dtw": [int(prev[m])]}
        )

    out_schema = f"{pair_col} string, n_a long, n_b long, dtw long"
    return grouped_apply(df, [pair_col], scan, out_schema)


def viterbi_two_state(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    obs_col: str,
    emit_cost,
    switch_cost: int,
) -> DataFrame:
    """Two-state min-sum Viterbi decoding per key — the integer-cost
    HMM decoder (burst/quiet regime labeling, Kleinberg's burst model's
    decoding half): state path minimizing Σ emission_cost(state, obs) +
    switch_cost · (#state changes).

    ``emit_cost`` is a Python callable (state, obs_int) → int cost,
    applied inside ONE Arrow scan per key (path-dependent DP — the
    fifo/holt contract).  Integer costs make the DP exact and
    rerun-stable.  Rows-only correctness: pinned by hand cases and the
    invariants cost(best) ≤ cost(all-0) and ≤ cost(all-1).  Returns per
    row: (keys…, order…, obs, state, total_cost on last row semantics —
    total_cost repeated per key).
    """
    import pandas as pd

    key_schema = ", ".join(f"{k} string" for k in keys)
    order_schema = ", ".join(f"{c} long" for c in order)
    out_schema = f"{key_schema}, {order_schema}, obs long, state int, total_cost long"

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        obs = pdf[obs_col].astype("int64").tolist()
        n = len(obs)
        if n == 0:
            return pd.DataFrame(columns=[*keys, *order, "obs", "state", "total_cost"])
        c0 = [emit_cost(0, o) for o in obs]
        c1 = [emit_cost(1, o) for o in obs]
        d0, d1 = c0[0], c1[0]
        back = []
        for t in range(1, n):
            n0 = c0[t] + min(d0, d1 + switch_cost)
            n1 = c1[t] + min(d1, d0 + switch_cost)
            back.append((0 if d0 <= d1 + switch_cost else 1,
                         1 if d1 <= d0 + switch_cost else 0))
            d0, d1 = n0, n1
        total = min(d0, d1)
        state = 0 if d0 <= d1 else 1
        path = [state]
        for t in range(n - 2, -1, -1):
            state = back[t][0] if state == 0 else back[t][1]
            path.append(state)
        path.reverse()
        out = {k: pdf[k].astype(str) for k in keys}
        for c in order:
            out[c] = pdf[c].astype("int64")
        out["obs"] = obs
        out["state"] = path
        out["total_cost"] = [total] * n
        return pd.DataFrame(out)

    return grouped_apply(df, keys, scan, out_schema)

"""Market-analytics operators: VWAP, realized variance, drawdown,
Bollinger bands, Lorenz/Gini concentration, Benford first-digit audit.

The reference library (riptable) comes from a trading firm and its
docs/tests lean heavily on tick-data workflows (rt_timers, merge_asof on
quote tapes, Accum2 P&L rollups — e.g. rt_merge_asof.py docstrings use
bid/ask columns).  These operators re-express that home-domain surface
Spark-first:

* every per-key path uses ``Window.partitionBy(key).orderBy(ts)`` — the
  sort is per-key inside a hash-partitioned exchange, so 1000 executors
  each sort their own keys; there is NO single-partition global window
  anywhere in this module;
* bucketed forms (VWAP bars, realized-variance bars) are plain two-stage
  hash aggregations (map-side partial → final), the cheapest shape Spark
  has;
* all arithmetic that feeds a cross-engine oracle is integer-scaled
  (cents) so sums are exact BIGINTs; the only float ops applied are
  ``/`` and ``sqrt`` on identical operands, which IEEE 754 requires to
  be correctly rounded — bit-identical in the JVM and DuckDB.

At 100 TB: per-key ordered windows shuffle once on the key; drawdown /
Bollinger never materialize per-key state beyond the frame Spark already
spills; VWAP/realized-variance bars reduce before the shuffle (partial
aggregation), so the exchange carries one row per (key, bucket).
"""

from __future__ import annotations

from .apply import grouped_apply
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_cols(order: str | list[str]) -> list[str]:
    """Ordered-path operators take a tiebroken ordering (e.g.
    ``["ts", "event_id"]``) — a lone timestamp can collide, and a tie
    makes lag/running-max engine-order-dependent."""
    return [order] if isinstance(order, str) else list(order)


def vwap(
    df: DataFrame,
    key: str,
    bucket: Column,
    price: str,
    volume: str,
    scale: int = 100,
) -> DataFrame:
    """Volume-weighted average price per (key, bucket).

    Integer-scales price by ``scale`` so the Σ(p·v) accumulator is an
    exact BIGINT (order-independent across partial aggregation), then
    divides once at the end.  One two-stage hash agg; no window.
    """
    p = F.round(F.col(price) * scale).cast("bigint")
    v = F.col(volume).cast("bigint")
    return (
        df.groupBy(F.col(key), bucket.alias("bucket"))
        .agg(
            F.sum(p * v).alias("__pv__"),
            F.sum(v).alias("volume"),
            F.count(F.lit(1)).alias("n_trades"),
        )
        .select(
            key,
            "bucket",
            (F.col("__pv__") / F.col("volume") / scale).alias("vwap"),
            "volume",
            "n_trades",
        )
    )


def realized_variance(
    df: DataFrame,
    key: str,
    order: str | list[str],
    price: str,
    scale: int = 100,
) -> DataFrame:
    """Per-key realized variance of price CHANGES: Σ (Δp)² over the
    ordered path, plus the exact integer sums that compose it.

    Uses absolute (not log) returns so every accumulator is an exact
    integer: Δp in scaled units is an int, (Δp)² sums as BIGINT.  The
    cross-engine hazard of ``ln`` (not correctly-rounded, differs by
    ulps between libm and the JVM) is avoided entirely; callers wanting
    log-returns at scale should treat this as the verified kernel and
    accept float noise in the ln variant.

    One shuffle: partitionBy(key).orderBy(order) computes lag, then the
    same key hash-partitions the aggregation (Catalyst reuses the
    exchange).
    """
    w = Window.partitionBy(key).orderBy(*_order_cols(order))
    p = F.round(F.col(price) * scale).cast("bigint")
    d = p - F.lag(p).over(w)
    steps = df.select(key, d.alias("__dp__")).where(F.col("__dp__").isNotNull())
    return steps.groupBy(key).agg(
        F.sum(F.col("__dp__") * F.col("__dp__")).alias("ss_change"),
        F.count(F.lit(1)).alias("n_changes"),
        (F.sqrt(F.sum(F.col("__dp__") * F.col("__dp__"))) / scale).alias("realized_vol"),
    )


_DD_ENC = 1_000_000_000  # peak < 1e9 scaled units ⇒ (dd, peak) packs into one BIGINT


def max_drawdown(
    df: DataFrame,
    key: str,
    order: str | list[str],
    price: str,
    scale: int = 100,
) -> DataFrame:
    """Per-key maximum drawdown: max over t of (running-max(p) − p_t).

    Running max of integer-scaled prices is exact in any engine (max is
    idempotent — no float accumulation, unlike prefix SUMs which the
    oracle lesson forbids).  The (drawdown, peak) argmax is packed into
    one BIGINT (``dd·1e9 + peak``) so a tie on drawdown resolves to the
    highest peak deterministically in any engine — no arg_max/struct-max
    semantics dependence.  One per-key window pass + one agg on the same
    key (Catalyst reuses the exchange).
    """
    w = Window.partitionBy(key).orderBy(*_order_cols(order)).rowsBetween(Window.unboundedPreceding, 0)
    p = F.round(F.col(price) * scale).cast("bigint")
    run = df.select(
        F.col(key),
        p.alias("__p__"),
        F.max(p).over(w).alias("__peak__"),
    )
    enc = F.max((F.col("__peak__") - F.col("__p__")) * _DD_ENC + F.col("__peak__"))
    # (enc − enc % ENC)/ENC: the numerator is exactly divisible, so the
    # float division is exact — no floor-at-a-boundary hazard.
    return run.groupBy(key).agg(
        (((enc - enc % _DD_ENC) / _DD_ENC) / scale).alias("max_drawdown"),
        ((enc % _DD_ENC) / scale).alias("peak_at_max_dd"),
    )


def bollinger(
    df: DataFrame,
    key: str,
    order: str | list[str],
    price: str,
    n: int = 20,
    k: int = 2,
    scale: int = 100,
) -> DataFrame:
    """Rolling Bollinger bands (mean ± k·std over the trailing ``n``
    rows), full-window only (first n−1 rows NULL, the reference's
    rolling convention — rt_groupbyops rolling_* emit invalid heads).

    The moment math runs on exact integers: with S1=Σp, S2=Σp² over the
    frame (BIGINT — rolling integer sums are exact regardless of the
    engine's segment-tree association), population m2 = n·S2 − S1², so
    mean = S1/(n·scale) and std = sqrt(m2)/ (n·scale).  Only / and sqrt
    touch floats → engine-identical.  One per-key sort window.
    """
    oc = _order_cols(order)
    w = Window.partitionBy(key).orderBy(*oc).rowsBetween(-(n - 1), 0)
    p = F.round(F.col(price) * scale).cast("bigint")
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum(p).over(w)
    s2 = F.sum(p * p).over(w)
    full = cnt == n
    m2 = F.lit(n) * s2 - s1 * s1  # n² × population variance, exact
    mid = F.when(full, s1 / (n * scale))
    dev = F.when(full, F.sqrt(m2) / (n * scale))
    return df.select(
        key,
        *oc,
        F.col(price),
        mid.alias("bb_mid"),
        (mid + k * dev).alias("bb_upper"),
        (mid - k * dev).alias("bb_lower"),
    )


def lorenz_gini(df: DataFrame, key: str, value: str, scale: int = 100) -> DataFrame:
    """Per-key Gini coefficient over a value distribution — the
    concentration audit behind "does one user/part dominate this key"
    (data-skew triage) and wealth-style concentration reports.

    Gini = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n with xᵢ ascending, i = 1..n.
    The rank is row_number over (value, arbitrary) — tied values may
    permute but Σ i·xᵢ is invariant within a tied block, so the result
    is deterministic.  All sums are integer-scaled BIGINTs; the final
    expression applies / and − to identical operands.  One per-key sort
    window + one agg; at scale this is a single (key)-hash exchange.
    """
    v = F.round(F.col(value) * scale).cast("bigint")
    w = Window.partitionBy(key).orderBy(v)
    ranked = df.select(F.col(key), v.alias("__v__"), F.row_number().over(w).alias("__i__"))
    return ranked.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("__v__") / scale).alias("total"),
        (
            (2.0 * F.sum(F.col("__i__") * F.col("__v__"))) / (F.count(F.lit(1)) * F.sum("__v__"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1))
        ).alias("gini"),
    )


# Benford expected first-digit probabilities log10(1 + 1/d), inlined as
# literals so both engines parse the SAME decimal string (log10 is not
# correctly-rounded and may differ by ulps between libm and the JVM).
BENFORD_P = {
    1: 0.30102999566398120,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def benford_audit(df: DataFrame, value: str) -> DataFrame:
    """First-significant-digit Benford's-law audit — the classic
    fabricated-data / anomalous-feed detector.  Emits one row per digit
    with the observed count, expected count, and the χ² component
    (o − e)²/e; the caller sums components driver-side if it wants the
    statistic (9 rows — a cross-row float SUM would be engine-ordered
    and is deliberately NOT emitted).

    First digit extraction is string-based (regexp on the decimal
    rendering) rather than log10-based, so it is exact and
    engine-portable.  One hash agg over ≤9 groups; the expected
    probabilities are broadcast literals.
    """
    digit = F.regexp_extract(F.abs(F.col(value)).cast("string"), r"([1-9])", 1).cast("int")
    counts = (
        df.where(F.col(value).isNotNull() & (F.col(value) != 0))
        .select(digit.alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    n_total = counts.groupBy().agg(F.sum("observed").alias("__n__"))
    expected = F.element_at(
        F.create_map(*[x for d, p in BENFORD_P.items() for x in (F.lit(d), F.lit(p))]),
        F.col("digit"),
    )
    out = counts.crossJoin(F.broadcast(n_total)).select(
        "digit",
        "observed",
        (expected * F.col("__n__")).alias("expected"),
        (
            (F.col("observed") - expected * F.col("__n__"))
            * (F.col("observed") - expected * F.col("__n__"))
            / (expected * F.col("__n__"))
        ).alias("chi2_component"),
    )
    return out


def lee_ready(
    trades: DataFrame,
    quotes: DataFrame,
    by: str,
    on: str,
    trade_price: str,
    quote_mid: str,
    order: list[str] | None = None,
    scale: int = 100,
) -> DataFrame:
    """Lee-Ready trade-side classification (Lee & Ready 1991): a trade
    printing ABOVE the prevailing quote mid is buyer-initiated (+1),
    below is seller-initiated (−1); AT the mid, fall back to the tick
    test — the sign of the most recent non-zero price change (0 if the
    path so far is flat).

    Composition: merge_asof(backward) for the prevailing quote (one
    shuffle+sort on (by, on) — merge.py's union+window rewrite), then a
    per-key window for the tick test.  The "most recent non-zero tick"
    avoids last_value(IGNORE NULLS) — engines disagree on ignore-nulls
    frames — by packing (row_number, sign) into a running integer MAX:
    row_number is strictly increasing, so the max IS the latest, and
    the sign decodes from the low bits.  Everything compares
    integer-scaled prices → engine-exact.
    """
    from .merge import merge_asof

    oc = order or [on]
    j = merge_asof(trades, quotes, on=on, by=by, direction="backward")
    p = F.round(F.col(trade_price) * scale).cast("bigint")
    m = F.round(F.col(quote_mid) * scale).cast("bigint")
    w = Window.partitionBy(by).orderBy(*oc)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    dp = p - F.lag(p).over(w)
    tick_sign = F.when(dp > 0, F.lit(1)).when(dp < 0, F.lit(-1))  # NULL when 0 or first row
    rn = F.row_number().over(w)
    enc = F.when(tick_sign.isNotNull(), rn * 4 + (tick_sign + 1))
    latest = F.max(enc).over(wrun)  # latest non-zero tick ≤ current row
    tick = F.coalesce(latest % 4 - 1, F.lit(0)).cast("int")
    side = (
        F.when(p > m, F.lit(1))
        .when(p < m, F.lit(-1))
        .otherwise(tick)
        .cast("int")
    )
    return j.withColumn("side", side).withColumn("mid_price", (m / scale))


def trade_flow_stats(
    classified: DataFrame,
    key: str,
    order: list[str],
    trade_price: str,
    quote_mid: str,
    side_col: str = "side",
    scale: int = 100,
) -> DataFrame:
    """Microstructure rollup over ``lee_ready`` output: per-key trade
    counts by side, effective spread, and Kyle's lambda (price impact).

    * effective spread = avg of 2·|p − mid| over trades with a quote —
      integer cents summed exactly, one division at the end;
    * Kyle's lambda = OLS slope of Δp on signed flow x = side·p
      (classic price-impact regression), composed from exact integer
      power sums (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) — the same
      closed-form-from-sums shape as functions.stats.lm.

    One (key)-ordered window for Δp, then one hash agg on the same key —
    the exchange is reused.  NULL-mid trades contribute to counts and
    lambda but not to the spread average.
    """
    p = F.round(F.col(trade_price) * scale).cast("bigint")
    m = F.round(F.col(quote_mid) * scale).cast("bigint")
    w = Window.partitionBy(key).orderBy(*order)
    dp = p - F.lag(p).over(w)
    x = (F.col(side_col) * p).cast("bigint")
    base = classified.select(
        F.col(key),
        F.col(side_col).alias("__side__"),
        (2 * F.abs(p - m)).alias("__es__"),
        F.when(dp.isNotNull(), x).alias("__x__"),
        dp.alias("__dp__"),
    )
    n_xy = F.count(F.when(F.col("__dp__").isNotNull(), 1))
    sx = F.sum("__x__")
    sy = F.sum("__dp__")
    sxy = F.sum(F.col("__x__") * F.col("__dp__"))
    sxx = F.sum(F.col("__x__") * F.col("__x__"))
    lam_num = n_xy * sxy - sx * sy
    lam_den = n_xy * sxx - sx * sx
    return base.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(F.when(F.col("__side__") == 1, 1).otherwise(0)).cast("bigint").alias("n_buys"),
        F.sum(F.when(F.col("__side__") == -1, 1).otherwise(0)).cast("bigint").alias("n_sells"),
        (F.sum("__es__") / F.count("__es__") / scale).alias("eff_spread"),
        F.when(lam_den != 0, lam_num / lam_den).alias("kyle_lambda"),
    )


def pnl_curve(
    df: DataFrame,
    key: str,
    order: str | list[str],
    side: Column | str,
    price: str,
    qty: Column | str,
    scale: int = 100,
) -> DataFrame:
    """Per-key running position, cash, and mark-to-market P&L from a
    signed fill stream — the linear-accounting P&L (no cost-basis
    lots, which are path-dependent and belong to an applyInPandas
    variant):

        position_t = Σ side·qty          (exact int)
        cash_t     = −Σ side·p·qty       (exact scaled int)
        mtm_t      = position_t·p_t + cash_t

    Every accumulator is an integer running SUM — exact under any
    engine's window association (unlike float prefix sums, which the
    oracle lessons forbid).  One per-key sort window.
    """
    oc = _order_cols(order)
    s = F.col(side) if isinstance(side, str) else side
    q = (F.col(qty) if isinstance(qty, str) else qty).cast("bigint")
    p = F.round(F.col(price) * scale).cast("bigint")
    w = Window.partitionBy(key).orderBy(*oc).rowsBetween(Window.unboundedPreceding, 0)
    pos = F.sum(s * q).over(w)
    cash = -F.sum(s * p * q).over(w)
    return df.select(
        key,
        *oc,
        F.col(price),
        pos.alias("position"),
        (cash / scale).alias("cash"),
        ((pos * p + cash) / scale).alias("mtm_pnl"),
    )


def lorenz_points(
    df: DataFrame,
    key: str,
    value: str,
    buckets: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Per-key Lorenz curve sampled at ``buckets`` quantile points:
    bucket b holds rows with row_number in ((b−1)·n/B, b·n/B]; emits the
    cumulative value and cumulative share up to each bucket — the
    plot-ready companion of ``lorenz_gini``.

    Bucket assignment is integer arithmetic on row_number (no ntile —
    engines disagree on remainder distribution only if the formula
    differs; this one is ((i−1)·B) DIV n + 1 in both).  Tied values may
    permute across a bucket boundary but contribute equal v, so bucket
    SUMS are deterministic.  All accumulators are exact integers; the
    share is one int/int division.  Two windows, both partitioned by
    key (the second over ≤B rows per key).
    """
    v = F.round(F.col(value) * scale).cast("bigint")
    w = Window.partitionBy(key).orderBy(v)
    ranked = df.select(
        F.col(key), v.alias("__v__"), F.row_number().over(w).alias("__i__"),
        F.count(F.lit(1)).over(Window.partitionBy(key)).alias("__n__"),
    )
    # exact integer division (DIV) — a float `/` then cast could land a
    # hair above/below the boundary and flip the bucket
    bucket = F.expr(f"((__i__ - 1) * {buckets}) DIV __n__") + 1
    per = ranked.groupBy(F.col(key), bucket.alias("bucket")).agg(F.sum("__v__").alias("__sv__"))
    wc = Window.partitionBy(key).orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(key)
    cum = F.sum("__sv__").over(wc)
    tot = F.sum("__sv__").over(wt)
    return per.select(
        key,
        "bucket",
        (cum / scale).alias("cum_value"),
        (cum / tot).alias("cum_share"),
    )


def implementation_shortfall(
    trades: DataFrame,
    quotes: DataFrame,
    by: str,
    day: Column,
    trade_order: list[str],
    quote_order: list[str],
    trade_price: str,
    quote_mid: str,
    qty: Column | str,
    scale: int = 100,
) -> DataFrame:
    """Implementation shortfall vs the ARRIVAL price: each day's first
    quote per key is the arrival benchmark; every trade pays
    (p − arrival)·qty against it.  Σ shortfall per key is an exact
    integer (scaled cents × integer qty), so the report is
    engine-replayable.

    Shape: the arrival relation reduces quotes to one row per (key,
    day) — a windowed rank over the quote stream, same hash family —
    then equi-joins onto trades by (key, day): no asof needed because
    the benchmark is per-day constant.
    """
    q = (F.col(qty) if isinstance(qty, str) else qty).cast("bigint")
    p = F.round(F.col(trade_price) * scale).cast("bigint")
    m = F.round(F.col(quote_mid) * scale).cast("bigint")
    wq = Window.partitionBy(by, "__day__").orderBy(*quote_order)
    arrivals = (
        quotes.withColumn("__day__", day)
        .withColumn("__rn__", F.row_number().over(wq))
        .where(F.col("__rn__") == 1)
        .select(by, "__day__", m.alias("__arr__"))
    )
    t = trades.withColumn("__day__", day).select(
        by, "__day__", p.alias("__p__"), q.alias("__q__")
    )
    j = t.join(arrivals, on=[by, "__day__"], how="inner")
    return j.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum("__q__").alias("total_qty"),
        (F.sum((F.col("__p__") - F.col("__arr__")) * F.col("__q__")) / scale).alias("shortfall"),
        (
            F.sum((F.col("__p__") - F.col("__arr__")) * F.col("__q__"))
            / F.sum("__q__") / scale
        ).alias("shortfall_per_unit"),
    )


def drawdown_duration(
    df: DataFrame,
    key: str,
    order: str | list[str],
    price: str,
    scale: int = 100,
) -> DataFrame:
    """Longest underwater stretch per key: the maximum run length of
    consecutive observations strictly below the running peak — the
    time-dimension companion of ``max_drawdown``.

    Runs materialize with the segment-id trick (cumsum of NOT-underwater
    marks each recovery as a new segment); run lengths are a per-(key,
    segment) count — integers end to end, one sort window + one agg on
    the same key."""
    oc = _order_cols(order)
    p = F.round(F.col(price) * scale).cast("bigint")
    w = Window.partitionBy(key).orderBy(*oc)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    base = df.select(F.col(key), p.alias("__p__"), *[F.col(c) for c in oc])
    base = base.withColumn("__peak__", F.max("__p__").over(wrun))
    under = (F.col("__p__") < F.col("__peak__")).cast("int")
    base = base.withColumn("__u__", under).withColumn(
        "__seg__", F.sum(1 - F.col("__u__")).over(wrun)
    )
    runs = (
        base.where(F.col("__u__") == 1)
        .groupBy(key, "__seg__")
        .agg(F.count(F.lit(1)).alias("__len__"))
    )
    return runs.groupBy(key).agg(
        F.max("__len__").alias("max_underwater_run"),
        F.count(F.lit(1)).alias("n_drawdowns"),
        F.sum("__len__").cast("bigint").alias("total_underwater_rows"),
    )


def adjust_for_splits(
    prices: DataFrame,
    splits: DataFrame,
    key: str,
    order: str | list[str],
    price: str,
    split_order: str,
    ratio_log2: str = "ratio_log2",
) -> DataFrame:
    """Back-adjust a price series for stock splits: every observation
    BEFORE a 2^k-for-1 split divides by 2^k (equivalently multiplies by
    2^−k), so the series is continuous in post-split units.

    Split ratios are expressed as log2 integers (k=1 → 2:1, k=−1 →
    reverse split), which makes the cumulative adjustment an INTEGER
    exponent — a reverse-window sum — and the factor 2^−K exact in
    binary floating point: the adjusted price is engine-identical, with
    no cumulative float product anywhere.  One join of the (tiny) split
    relation onto the series key + one reverse-frame window.
    """
    oc = _order_cols(order)
    s = splits.select(
        F.col(key), F.col(split_order).alias("__sat__"), F.col(ratio_log2).alias("__k__")
    )
    j = prices.join(s, on=key, how="left")
    # an observation at time t is adjusted by splits occurring AFTER t
    after = F.when(F.col("__sat__") > F.col(oc[0]), F.col("__k__")).otherwise(F.lit(0))
    per_row = j.groupBy(key, *[F.col(c) for c in oc], F.col(price)).agg(
        F.sum(after).cast("bigint").alias("__K__")
    )
    adj = F.col(price) * F.pow(F.lit(2.0), -F.col("__K__"))
    return per_row.select(
        key, *oc, F.col(price),
        F.coalesce(F.col("__K__"), F.lit(0)).alias("split_log2"),
        adj.alias("adj_price"),
    )


def twap(
    df: DataFrame,
    key: str,
    bucket: Column,
    order: str | list[str],
    price: str,
    ts_col: str = "ts",
    scale: int = 100,
) -> DataFrame:
    """Time-weighted average price per (key, bucket): each observation
    is weighted by the microseconds until the NEXT observation in its
    bucket (the interval it "held"); the last observation of a bucket
    carries no weight (no forward interval — the standard left-closed
    TWAP convention).

    Weights are integer microsecond deltas and prices integer cents, so
    Σ p·Δt is an exact BIGINT and the single division engine-identical.
    One per-(key, bucket) sort window + one agg on the same keys.
    """
    oc = _order_cols(order)
    p = F.round(F.col(price) * scale).cast("bigint")
    sel = [F.col(key), bucket.alias("bucket"), p.alias("__p__")]
    sel += [F.col(c) for c in dict.fromkeys([ts_col, *oc])]
    base = df.select(*sel)
    w = Window.partitionBy(key, "bucket").orderBy(*oc)
    nxt = F.lead(F.unix_micros(F.col(ts_col))).over(w)
    dt = nxt - F.unix_micros(F.col(ts_col))
    weighted = base.withColumn("__dt__", dt).where(F.col("__dt__").isNotNull())
    return weighted.groupBy(key, "bucket").agg(
        (F.sum(F.col("__p__") * F.col("__dt__")) / F.sum("__dt__") / scale).alias("twap"),
        F.sum("__dt__").cast("bigint").alias("total_micros"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def event_study(
    df: DataFrame,
    key: str,
    order: str | list[str],
    value: str,
    anchor: Column,
    window_radius: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Event-study alignment (PSTH): for every anchor event, collect the
    value path at relative offsets −r..+r within the key's ordered
    stream, then average per offset across ALL anchors — "what does the
    series do around the event".

    One sort window produces every offset column (lead/lag family);
    anchors stack their offsets via a single explode; the per-offset
    mean composes from exact integer sums.  Returns (offset, n, mean).
    """
    oc = _order_cols(order)
    w = Window.partitionBy(key).orderBy(*oc)
    v = F.round(F.col(value) * scale).cast("bigint")
    offs = list(range(-window_radius, window_radius + 1))
    cols = [
        (F.lead(v, o).over(w) if o > 0 else F.lag(v, -o).over(w) if o < 0 else v).alias(f"__o{i}__")
        for i, o in enumerate(offs)
    ]
    base = df.select(F.col(key), anchor.alias("__anchor__"), *cols).where(F.col("__anchor__"))
    stacked = base.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(o).alias("offset"), F.col(f"__o{i}__").alias("v"))
                for i, o in enumerate(offs)
            ])
        ).alias("p")
    ).select("p.offset", "p.v").where(F.col("v").isNotNull())
    return stacked.groupBy("offset").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("v") / F.count(F.lit(1)) / scale).alias("mean_value"),
    )


def factor_quintiles(
    df: DataFrame,
    key: str,
    period: Column,
    signal: Column,
    buckets: int = 5,
) -> DataFrame:
    """Cross-sectional factor analysis: each period, rank keys by an
    integer ``signal``, cut into ``buckets`` equal groups (integer-DIV
    assignment, key tiebreak — deterministic sets), and report each
    bucket's mean NEXT-period signal — the quantile-portfolio backtest
    shape ("does high-signal persist?").

    Periods must be consecutive integers.  Pipeline: one (period, key)
    hash agg for the panel, one per-period rank window, one equi-join
    to the next period's panel, one final agg — every value an exact
    integer until the single mean division.  Returns (period, bucket,
    n, mean_fwd).
    """
    panel = df.groupBy(period.alias("period"), F.col(key).alias("k")).agg(
        F.sum(signal).alias("sig")
    )
    w = Window.partitionBy("period").orderBy(F.col("sig").desc(), F.col("k"))
    wn = Window.partitionBy("period")
    ranked = panel.withColumn("__r__", F.row_number().over(w)).withColumn(
        "__n__", F.count(F.lit(1)).over(wn)
    )
    bucket = F.expr(f"((__r__ - 1) * {buckets}) DIV __n__") + 1
    cur = ranked.select("period", "k", bucket.alias("bucket"))
    nxt = panel.select((F.col("period") - 1).alias("period"), "k", F.col("sig").alias("fwd"))
    j = cur.join(nxt, on=["period", "k"], how="inner")
    return j.groupBy("period", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("fwd") / F.count(F.lit(1))).alias("mean_fwd"),
    )


def rolling_zscore(
    df: DataFrame,
    key: str,
    order: str | list[str],
    value: str,
    n: int = 20,
    scale: int = 100,
) -> DataFrame:
    """Rolling z-score of a series over the trailing ``n`` rows
    (full-window NULL heads) — the mean-reversion signal behind pairs
    trading and anomaly gates.  Same exact-integer moment machinery as
    ``bollinger``: z = (n·p − S1) / sqrt(n·S2 − S1²) uses only integer
    operands, one subtraction and one sqrt/division — engine-identical
    (note the algebraic form avoids dividing mean and std separately).
    """
    oc = _order_cols(order)
    w = Window.partitionBy(key).orderBy(*oc).rowsBetween(-(n - 1), 0)
    p = F.round(F.col(value) * scale).cast("bigint")
    cnt = F.count(F.lit(1)).over(w)
    s1 = F.sum(p).over(w)
    s2 = F.sum(p * p).over(w)
    m2 = F.lit(n) * s2 - s1 * s1
    z = F.when((cnt == n) & (m2 > 0), (F.lit(n) * p - s1) / F.sqrt(m2))
    return df.select(key, *oc, F.col(value), z.alias("zscore"))


def time_bars(
    df: DataFrame,
    key: str,
    bucket: Column,
    price: str,
    qty: Column | str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    scale: int = 100,
) -> DataFrame:
    """The canonical bar builder: OHLC + volume + VWAP + trade count per
    (key, bucket) in ONE two-stage hash aggregation — no window, no
    sort; open/close are min_by/max_by over a packed (µs, id) total
    order, every other accumulator an exact integer.  This is the shape
    that turns 100 TB of ticks into bars at scan speed."""
    p = F.round(F.col(price) * scale).cast("bigint")
    q = (F.col(qty) if isinstance(qty, str) else qty).cast("bigint")
    okey = F.unix_micros(F.col(ts_col)) * 100 + F.col(id_col) % 100
    return (
        df.groupBy(F.col(key), bucket.alias("bucket"))
        .agg(
            (F.min_by(p, okey) / scale).alias("open"),
            (F.max(p) / scale).alias("high"),
            (F.min(p) / scale).alias("low"),
            (F.max_by(p, okey) / scale).alias("close"),
            F.sum(q).alias("volume"),
            (F.sum(p * q) / F.sum(q) / scale).alias("vwap"),
            F.count(F.lit(1)).alias("n_trades"),
        )
    )


def fifo_pnl(
    df: DataFrame,
    key: str,
    order: list[str],
    side: str,
    price: str,
    qty: str,
    scale: int = 100,
    max_rows_per_key: int = 10_000_000,
) -> DataFrame:
    """Lot-based FIFO realized P&L — the path-DEPENDENT accounting
    ``pnl_curve`` deliberately avoids: each closing fill consumes the
    oldest open lots, realizing (exit − entry)·matched_qty against
    each; position flips open a new lot on the other side.

    This recurrence has no closed form, so it runs as ONE Arrow-batched
    applyInPandas scan per key (the EMA family's documented pattern —
    a group must fit an Arrow batch; split giant keys upstream).  All
    lot math is integer cents·qty.

    GIANT-KEY CONTRACT: sized for market-data shapes (many keys ×
    bounded per-key history).  Unlike :func:`wac_pnl`, the carried
    state is the open-lot QUEUE — unbounded (a one-sided stream keeps
    every lot open), so no seed-carry blocked path exists; a key longer
    than ``max_rows_per_key`` raises loudly instead of OOMing the
    executor.

    Invariant (property-tested): realized(t) + position(t)·p(t) + cash
    identity ⇒ realized + unrealized == pnl_curve's mark-to-market at
    every row.  Appends ``realized_cents`` (running total) and
    ``position_after``.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    base = df.select(
        F.col(key), *[F.col(c) for c in order],
        F.col(side).cast("int").alias("__s__"),
        F.round(F.col(price) * scale).cast("bigint").alias("__p__"),
        F.col(qty).cast("bigint").alias("__q__"),
    )
    schema = T.StructType(
        base.schema.fields
        + [
            T.StructField("realized_cents", T.LongType()),
            T.StructField("position_after", T.LongType()),
        ]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_rows_per_key:
            raise ValueError(
                f"fifo_pnl: key {pdf[key].iloc[0]!r} has {len(pdf)} fills > "
                f"max_rows_per_key={max_rows_per_key}; one Arrow batch per "
                "key would exhaust executor memory — split the key upstream "
                "(e.g. by account or venue); no blocked path exists because "
                "the open-lot queue is unbounded carried state"
            )
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        lots: list[list[int]] = []  # [sign, qty, price] open lots (FIFO)
        realized = 0
        out_r = np.zeros(len(pdf), dtype=np.int64)
        out_pos = np.zeros(len(pdf), dtype=np.int64)
        for i, (s, p, q) in enumerate(zip(pdf["__s__"], pdf["__p__"], pdf["__q__"])):
            s, p, q = int(s), int(p), int(q)
            remaining = q
            while remaining > 0 and lots and lots[0][0] != s:
                lot = lots[0]
                m = min(remaining, lot[1])
                # closing a lot: long lots realize (exit−entry), shorts the reverse
                realized += (p - lot[2]) * m * lot[0]
                lot[1] -= m
                remaining -= m
                if lot[1] == 0:
                    lots.pop(0)
            if remaining > 0:
                lots.append([s, remaining, p])
            out_r[i] = realized
            out_pos[i] = sum(l[0] * l[1] for l in lots)
        pdf["realized_cents"] = out_r
        pdf["position_after"] = out_pos
        return pdf

    return grouped_apply(base, [key], scan, schema)


def _wac_scan_arrays(ss, ps, qs, pos=0, cost=0, realized=0):
    """Core WAC ledger over aligned (side, price_cents, qty) sequences,
    starting from carried state — shared by the one-shot scan and the
    blocked seed-carry path.  Returns (realized[], pos[], exit_state)."""
    import numpy as np

    n = len(ss)
    out_r = np.zeros(n, dtype=np.int64)
    out_pos = np.zeros(n, dtype=np.int64)
    for i, (s, p, q) in enumerate(zip(ss, ps, qs)):
        s, p, q = int(s), int(p), int(q)
        if pos == 0 or (1 if pos > 0 else -1) == s:
            # opening / adding: blend cost, no realization
            pos += s * q
            cost += p * q
        else:
            apos = abs(pos)
            m = min(q, apos)
            # basis removed for the closed portion: cost·m/apos rounded
            # half away from zero — realized is DERIVED from the same
            # rounded quantity so the cost ledger conserves exactly and
            # the flat-book invariant holds to the cent
            removed = (abs(cost) * m + apos // 2) // apos * (1 if cost >= 0 else -1)
            realized += (p * m - removed) * (1 if pos > 0 else -1)
            cost -= removed
            pos += s * m
            if pos == 0:
                cost = 0
            rem = q - m
            if rem > 0:  # flip: open the residual at the fill price
                pos = s * rem
                cost = p * rem
        out_r[i] = realized
        out_pos[i] = pos
    return out_r, out_pos, (pos, cost, realized)


def wac_pnl(
    df: DataFrame,
    key: str,
    order: list[str],
    side: str,
    price: str,
    qty: str,
    scale: int = 100,
    method: str = "scan",
    block_rows: int | None = None,
    max_rows_per_key: int = 10_000_000,
) -> DataFrame:
    """Weighted-average-cost (WAC) realized P&L — the other standard lot
    accounting (IFRS-style moving average): position-increasing fills
    re-average the open cost ``avg ← (|pos|·avg + q·p)/(|pos| + q)``;
    position-reducing fills realize ``(p − avg)·m·sign`` against the
    single blended lot; a flip opens a fresh lot at the fill price.

    The average-cost recurrence is non-linear (a ratio of running
    state), so like :func:`fifo_pnl` it runs as ONE Arrow-batched
    applyInPandas scan per key.  Cost state is kept as the integer pair
    (position, total_cost_cents·qty) — the closed basis is removed as
    ``round(cost·m/|pos|)`` (half away from zero) and realized P&L is
    derived from that SAME rounded quantity, so the cost ledger
    conserves exactly and the scan is exact-integer end to end.

    GIANT-KEY CONTRACT: ``method='scan'`` materializes each key's whole
    fill stream as one Arrow batch — right for market-data shapes (many
    symbols × bounded history).  A key longer than ``max_rows_per_key``
    raises loudly instead of OOMing the executor.  For few-keys × giant
    streams use ``method='blocked'`` with ``block_rows``: blocks of the
    per-key rank run as SEQUENTIAL jobs (the recurrence's state
    transformation is non-linear and piecewise, so unlike the ema
    family's closed-form seed correction, later blocks genuinely cannot
    start before earlier blocks finish), each task holding only one
    block per key while the driver carries just (pos, cost, realized) —
    three BIGINTs per key — between rounds.  Property-tested equal to
    the plain scan at two block widths.

    Path-independence invariant (property-tested): whenever
    ``position_after == 0``, cumulative realized P&L equals cash flow
    ``Σ −sign·p·q`` — identical to ``fifo_pnl``'s realized at the same
    row, even though the two methods disagree mid-path.

    Appends ``realized_cents`` (running total) and ``position_after``.
    """
    import pandas as pd
    from pyspark.sql import types as T

    base = df.select(
        F.col(key), *[F.col(c) for c in order],
        F.col(side).cast("int").alias("__s__"),
        F.round(F.col(price) * scale).cast("bigint").alias("__p__"),
        F.col(qty).cast("bigint").alias("__q__"),
    )
    schema = T.StructType(
        base.schema.fields
        + [
            T.StructField("realized_cents", T.LongType()),
            T.StructField("position_after", T.LongType()),
        ]
    )

    if method == "blocked":
        return _wac_blocked(base, key, order, schema, block_rows)

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_rows_per_key:
            raise ValueError(
                f"wac_pnl: key {pdf[key].iloc[0]!r} has {len(pdf)} fills > "
                f"max_rows_per_key={max_rows_per_key}; one Arrow batch per "
                "key would exhaust executor memory — use method='blocked' "
                "with block_rows, or split the key upstream"
            )
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        out_r, out_pos, _ = _wac_scan_arrays(pdf["__s__"], pdf["__p__"], pdf["__q__"])
        pdf["realized_cents"] = out_r
        pdf["position_after"] = out_pos
        return pdf

    return grouped_apply(base, [key], scan, schema)


def _wac_blocked(base: DataFrame, key: str, order: list[str], schema, block_rows: int | None) -> DataFrame:
    """Sequential seed-carry evaluation of the WAC ledger in rank blocks.

    Block b's scan starts from block b−1's exit state (pos, cost,
    realized) — collected to the driver as three BIGINTs per key and
    broadcast into the next round.  Executor memory is bounded by
    ``block_rows`` per task regardless of key length; wall-clock is
    inherently ≥ n_blocks sequential stages (the per-key recurrence has
    no parallel decomposition — see wac_pnl's docstring)."""
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql import Window

    if not block_rows or block_rows <= 0:
        raise ValueError("method='blocked' requires block_rows > 0")
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    work = base.withColumn(
        "__blk__", F.floor((F.row_number().over(w) - 1) / block_rows).cast("long")
    ).persist()
    n_blocks = int(work.agg(F.max("__blk__")).collect()[0][0] or 0) + 1
    spark = base.sparkSession

    seed_fields = [("__pos0__", 0), ("__cost0__", 0), ("__real0__", 0)]
    scan_schema = T.StructType(
        schema.fields
        + [
            T.StructField("__pos_x__", T.LongType()),
            T.StructField("__cost_x__", T.LongType()),
            T.StructField("__real_x__", T.LongType()),
        ]
    )

    def scan_block(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        out_r, out_pos, exit_state = _wac_scan_arrays(
            pdf["__s__"], pdf["__p__"], pdf["__q__"],
            pos=int(pdf["__pos0__"].iloc[0]),
            cost=int(pdf["__cost0__"].iloc[0]),
            realized=int(pdf["__real0__"].iloc[0]),
        )
        pdf["realized_cents"] = out_r
        pdf["position_after"] = out_pos
        pdf["__pos_x__"], pdf["__cost_x__"], pdf["__real_x__"] = exit_state
        return pdf.drop(columns=["__blk__", "__pos0__", "__cost0__", "__real0__"])

    seeds = None  # list[(key, pos, cost, realized)]
    outs = []
    out_cols = [f.name for f in schema.fields]
    for b in range(n_blocks):
        cur = work.where(F.col("__blk__") == b)
        if seeds is None:
            for c, v in seed_fields:
                cur = cur.withColumn(c, F.lit(v).cast("long"))
        else:
            seed_df = spark.createDataFrame(
                seeds, [key] + [c for c, _ in seed_fields]
            )
            cur = cur.join(F.broadcast(seed_df), on=key, how="left").fillna(
                {c: v for c, v in seed_fields}
            )
        scanned = grouped_apply(cur, [key], scan_block, scan_schema).persist()
        outs.append(scanned.select(*out_cols))
        seeds = [
            (r[0], int(r[1]), int(r[2]), int(r[3]))
            for r in scanned.groupBy(key)
            .agg(F.first("__pos_x__"), F.first("__cost_x__"), F.first("__real_x__"))
            .collect()
        ]
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def price_index(
    df: DataFrame,
    period_col: str,
    item_col: str,
    price_col: str,
    qty_col: str,
    period_0,
    period_1,
) -> DataFrame:
    """Laspeyres / Paasche / Fisher price indices between two periods
    over an (item, period, unit-price, quantity) relation — the
    standard inflation/price-change readout:

        L = Σ p1·q0 / Σ p0·q0 ,  P = Σ p1·q1 / Σ p0·q1 ,  F = √(L·P)

    restricted to items priced in BOTH periods (the matched basket).
    Per-item representatives: price = MIN unit price (deterministic),
    quantity = Σ qty — both exact BIGINTs, so all four basket sums are
    exact and L/P are single divides; Fisher is one multiply + one
    correctly-rounded sqrt of those two doubles — engine-identical.
    One (item, period) hash agg + one item-sized self-join.
    Returns a single row (n_items, laspeyres, paasche, fisher).
    """
    p = F.col(price_col).cast("long")
    q = F.col(qty_col).cast("long")
    per = F.col(period_col)
    byip = (
        df.where(per.isin(period_0, period_1))
        .groupBy(
            F.col(item_col).alias("item"),
            F.when(per == F.lit(period_0), F.lit(0)).otherwise(F.lit(1)).alias("t"),
        )
        .agg(F.min(p).alias("p"), F.sum(q).cast("long").alias("q"))
    )
    b0 = byip.where(F.col("t") == 0).select("item", F.col("p").alias("p0"), F.col("q").alias("q0"))
    b1 = byip.where(F.col("t") == 1).select("item", F.col("p").alias("p1"), F.col("q").alias("q1"))
    m = b0.join(b1, on="item")
    g = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(F.col("p1") * F.col("q0")).cast("long").alias("s_p1q0"),
        F.sum(F.col("p0") * F.col("q0")).cast("long").alias("s_p0q0"),
        F.sum(F.col("p1") * F.col("q1")).cast("long").alias("s_p1q1"),
        F.sum(F.col("p0") * F.col("q1")).cast("long").alias("s_p0q1"),
    )
    lasp = F.col("s_p1q0") / F.col("s_p0q0")
    paas = F.col("s_p1q1") / F.col("s_p0q1")
    return g.select(
        "n_items",
        lasp.alias("laspeyres"),
        paas.alias("paasche"),
        F.sqrt(lasp * paas).alias("fisher"),
    )


def rev_schedule(
    df: DataFrame,
    id_cols: list[str],
    amount_col: str,
    start_period_col: str,
    n_periods_col: str,
) -> DataFrame:
    """Revenue-recognition schedule: spread each contract's amount
    evenly over its service periods with the LARGEST-REMAINDER rule
    (the :func:`~riptable_spark.operators.pipeline.allocate_proportional`
    discipline applied per row): period i of n gets

        amount DIV n  +  (1 if i < amount MOD n else 0)

    so every contract's schedule sums back to its amount EXACTLY — no
    float cents ever exist, the auditors' requirement.  One
    posexplode(sequence(...)) projection, no shuffle.  Returns
    (ids…, period, amount_p).
    """
    amt = F.col(amount_col).cast("long")
    n = F.col(n_periods_col).cast("int")
    exploded = df.select(
        *id_cols, amt.alias("__amt__"), F.col(start_period_col).cast("long").alias("__sp__"),
        n.alias("__np__"),
        F.posexplode(F.sequence(F.lit(0), n - 1)).alias("__i__", "__dummy__"),
    )
    share = (
        F.floor(F.col("__amt__") / F.col("__np__")).cast("long")
        + (F.col("__i__") < F.pmod(F.col("__amt__"), F.col("__np__")).cast("int")).cast("long")
    )
    return exploded.select(
        *id_cols,
        (F.col("__sp__") + F.col("__i__")).alias("period"),
        share.alias("amount_p"),
    )


def mrr_movements(
    df: DataFrame,
    customer_col: str,
    period_col: str,
    amount_col: str,
) -> DataFrame:
    """SaaS MRR movement waterfall: per period, decompose recurring-
    revenue change into new / expansion / contraction / churned
    business — the subscription analytics every board deck carries.

    Per (customer, period) amounts aggregate first (exact cents); each
    customer-period then compares against the SAME customer's previous
    period via one full-outer self-join on (customer, period−1):
    absent→present = new, present→absent = churn, else the signed
    delta splits into expansion/contraction.  All movement columns are
    exact BIGINT sums; net = new + expansion − contraction − churned
    reconciles to the period-over-period MRR delta exactly (tested).
    Periods must be consecutive integers (months since epoch).
    Returns (period, mrr, new_mrr, expansion, contraction, churned,
    net_change).
    """
    amt = F.col(amount_col).cast("long")
    cp = df.groupBy(
        F.col(customer_col).alias("c"), F.col(period_col).cast("long").alias("p")
    ).agg(F.sum(amt).alias("a"))
    cur = cp.select("c", "p", F.col("a").alias("a_cur"))
    prev = cp.select("c", (F.col("p") + 1).alias("p"), F.col("a").alias("a_prev"))
    j = cur.join(prev, on=["c", "p"], how="full_outer")
    ac = F.coalesce(F.col("a_cur"), F.lit(0))
    ap = F.coalesce(F.col("a_prev"), F.lit(0))
    movements = j.select(
        "p",
        ac.alias("ac"), ap.alias("ap"),
        F.when(F.col("a_prev").isNull(), ac).otherwise(F.lit(0)).alias("new_mrr"),
        F.when(F.col("a_prev").isNotNull() & F.col("a_cur").isNotNull() & (ac > ap), ac - ap)
        .otherwise(F.lit(0)).alias("expansion"),
        F.when(F.col("a_prev").isNotNull() & F.col("a_cur").isNotNull() & (ac < ap), ap - ac)
        .otherwise(F.lit(0)).alias("contraction"),
        F.when(F.col("a_cur").isNull(), ap).otherwise(F.lit(0)).alias("churned"),
    )
    g = movements.groupBy("p").agg(
        F.sum("ac").cast("long").alias("mrr"),
        F.sum("new_mrr").cast("long").alias("new_mrr"),
        F.sum("expansion").cast("long").alias("expansion"),
        F.sum("contraction").cast("long").alias("contraction"),
        F.sum("churned").cast("long").alias("churned"),
    )
    return g.select(
        F.col("p").alias("period"), "mrr", "new_mrr", "expansion", "contraction", "churned",
        (F.col("new_mrr") + F.col("expansion") - F.col("contraction") - F.col("churned"))
        .alias("net_change"),
    )


def dup_charges(
    df: DataFrame,
    account_col: str,
    amount_col: str,
    time_col: str,
    id_col: str,
    window_seconds: int = 3600,
) -> DataFrame:
    """Duplicate-charge detection (fintech ops staple): pairs of
    transactions on the same account with the SAME amount within
    ``window_seconds`` — double-submits, retry storms, replay bugs.

    Self-equi-join on (account, amount) — candidate pairs only exist
    inside identical-amount groups, which are naturally tiny — with the
    gap bound as an integer microsecond comparison and the
    each-pair-once discipline (t_a < t_b, id tiebreak on equal
    timestamps).  Returns (account, amount, id_a, id_b, gap_seconds).
    """
    t = F.unix_micros(F.col(time_col))
    base = df.select(
        F.col(account_col).alias("acct"), F.col(amount_col).cast("long").alias("amount"),
        t.alias("tus"), F.col(id_col).alias("txn"),
    )
    a = base.select("acct", "amount", F.col("tus").alias("ta"), F.col("txn").alias("id_a"))
    b = base.select("acct", "amount", F.col("tus").alias("tb"), F.col("txn").alias("id_b"))
    pairs = a.join(b, on=["acct", "amount"]).where(
        (
            (F.col("ta") < F.col("tb"))
            | ((F.col("ta") == F.col("tb")) & (F.col("id_a") < F.col("id_b")))
        )
        & (F.col("tb") - F.col("ta") <= int(window_seconds) * 1_000_000)
    )
    return pairs.select(
        F.col("acct").alias(account_col), "amount", "id_a", "id_b",
        ((F.col("tb") - F.col("ta")) / 1_000_000).alias("gap_seconds"),
    )


def var_es(
    df: DataFrame,
    keys: list[str],
    pnl_col: str,
    alpha_num: int = 5,
    alpha_den: int = 100,
) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall per key at level
    α = alpha_num/alpha_den: VaR is the ⌈n·α⌉-th WORST outcome (an
    actual order statistic — the historical-simulation convention), ES
    the mean of outcomes at or beyond it.

    The tail cut is rank-based integer arithmetic (rank·den ≤ n·num —
    no float quantile decides membership); the tail sum is an exact
    BIGINT so ES is one divide.  One per-key sort window + one agg.
    Returns (keys…, n, tail_n, var, es) with var/es in the input's
    integer scale (losses negative).
    """
    x = F.col(pnl_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(x.asc())
    wn = Window.partitionBy(*keys)
    d = df.withColumn("__rn__", F.row_number().over(w)).withColumn(
        "__n__", F.count(F.lit(1)).over(wn).cast("long")
    )
    in_tail = F.col("__rn__") * alpha_den <= F.col("__n__") * alpha_num
    g = d.groupBy(*keys).agg(
        F.min("__n__").alias("n"),
        F.sum(in_tail.cast("long")).cast("long").alias("tail_n"),
        F.max(F.when(in_tail, x)).cast("long").alias("var_scaled"),
        F.sum(F.when(in_tail, x)).cast("long").alias("tail_sum"),
    )
    return g.select(
        *keys, "n", "tail_n",
        F.col("var_scaled").alias("var"),
        F.when(F.col("tail_n") > 0, F.col("tail_sum") / F.col("tail_n")).alias("es"),
    )


def portfolio_turnover(
    df: DataFrame,
    period_col: str,
    asset_col: str,
    value_col: str,
) -> DataFrame:
    """Period-over-period portfolio turnover: with w_i = v_i/V the
    value weights,

        turnover_t = ½ Σ_i |w_i,t − w_i,t−1|
                   = Σ_i |v_i,t·V_{t−1} − v_i,t−1·V_t| / (2·V_t·V_{t−1})

    — the cross-multiplied form keeps every numerator an exact BIGINT
    (weights never materialize as floats); the final value is one
    divide.  UNIT CONSTRAINT: v_i·V_total must stay under 2^63 — pick
    the coarsest unit that holds value (dollars, not cents, for a
    billion-dollar book); ANSI mode turns an overflow into an error,
    never a silent wrap.  One (period, asset) agg, one asset-keyed
    full-outer self-join on (period−1), one period agg.  Periods must
    be consecutive integers.  Returns
    (period, n_assets, abs_num_sum, v_cur, v_prev, turnover).
    """
    v = F.col(value_col).cast("long")
    pa = df.groupBy(
        F.col(period_col).cast("long").alias("p"), F.col(asset_col).alias("a")
    ).agg(F.sum(v).alias("v"))
    tot = pa.groupBy("p").agg(F.sum("v").cast("long").alias("vt"))
    cur = pa.select("p", "a", F.col("v").alias("v_cur"))
    prev = pa.select((F.col("p") + 1).alias("p"), "a", F.col("v").alias("v_prev"))
    j = cur.join(prev, on=["p", "a"], how="full_outer").select(
        "p", "a",
        F.coalesce(F.col("v_cur"), F.lit(0)).alias("vc"),
        F.coalesce(F.col("v_prev"), F.lit(0)).alias("vp"),
    )
    jt = (
        j.join(tot.select(F.col("p"), F.col("vt").alias("v_t")), on="p")
        .join(tot.select((F.col("p") + 1).alias("p"), F.col("vt").alias("v_tm1")), on="p")
    )
    g = jt.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("n_assets"),
        F.sum(F.abs(F.col("vc") * F.col("v_tm1") - F.col("vp") * F.col("v_t")))
        .cast("long").alias("abs_num_sum"),
        F.min("v_t").alias("v_cur"),
        F.min("v_tm1").alias("v_prev"),
    )
    return g.select(
        F.col("p").alias("period"), "n_assets", "abs_num_sum", "v_cur", "v_prev",
        F.when(
            (F.col("v_cur") > 0) & (F.col("v_prev") > 0),
            F.col("abs_num_sum") / (2 * F.col("v_cur") * F.col("v_prev")),
        ).alias("turnover"),
    )


def chain_ladder(
    df: DataFrame,
    origin_col: str,
    dev_col: str,
    amount_col: str,
    max_dev: int,
) -> DataFrame:
    """Chain-ladder loss development (the classic actuarial reserving
    triangle): cumulative paid per (origin, dev age), volume-weighted
    development factors f_d = Σ_origins C_{o,d+1} / Σ_origins C_{o,d}
    over origins that HAVE age d+1, and each origin's projected
    ultimate = latest cumulative × Π remaining factors.

    Exactness: cumulative cells are exact BIGINT sums; each factor is
    one divide of exact totals; the ultimate multiplies the factors in
    FIXED ascending dev order (a ≤max_dev-term fixed tree, not a float
    aggregation).  Factors are a max_dev-row relation that broadcasts.
    Returns one row per origin: (origin, latest_dev, latest_cum,
    ultimate, reserve).
    """
    a = F.col(amount_col).cast("long")
    inc = df.groupBy(
        F.col(origin_col).alias("o"), F.col(dev_col).cast("int").alias("d")
    ).agg(F.sum(a).alias("inc"))
    wcum = Window.partitionBy("o").orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = inc.withColumn("c", F.sum("inc").over(wcum).cast("long"))
    nxt = cum.select(F.col("o"), (F.col("d") - 1).alias("d"), F.col("c").alias("c_next"))
    fpairs = cum.join(nxt, on=["o", "d"]).groupBy("d").agg(
        F.sum("c").cast("long").alias("den"),
        F.sum("c_next").cast("long").alias("num"),
    )
    frows = {int(r["d"]): (int(r["num"]), int(r["den"])) for r in fpairs.collect()}
    latest = cum.groupBy("o").agg(
        F.max("d").alias("latest_dev"),
        F.max_by("c", "d").alias("latest_cum"),
    )
    ult = F.col("latest_cum").cast("double")
    for d in range(max_dev):
        if d in frows and frows[d][1] > 0:
            num, den = frows[d]
            ult = F.when(
                F.col("latest_dev") <= d, ult * F.lit(num) / F.lit(den)
            ).otherwise(ult)
    return latest.select(
        F.col("o").alias(origin_col), "latest_dev", "latest_cum",
        ult.alias("ultimate"),
        (ult - F.col("latest_cum")).alias("reserve"),
    )


def lob_match(
    orders: DataFrame,
    symbol_col: str,
    order: list[str],
    side_col: str,
    price_col: str,
    qty_col: str,
    id_col: str,
    max_rows_per_key: int = 10_000_000,
) -> DataFrame:
    """Limit-order-book matching with PRICE-TIME priority per symbol —
    the exchange-core replay: orders arrive in sequence; a buy crosses
    the lowest-priced resting sell with price ≤ its limit (earliest
    first on ties), partial fills rest on the book.

    GIANT-KEY CONTRACT: one symbol's whole order stream is one Arrow
    batch (exchange books are inherently sequential; the resting book
    is unbounded carried state, so no seed-carry blocked path exists).
    A symbol longer than ``max_rows_per_key`` raises loudly instead of
    OOMing the executor — shard upstream by session/day if a replay
    exceeds it.

    Inherently path-dependent (the book IS the state), so it runs as
    one Arrow scan per symbol (the fifo_pnl contract).  Integer prices
    and quantities keep every fill exact; trade price is the RESTING
    order's price (standard continuous-auction rule).  Rows-only
    correctness: conservation (Σ filled buy qty == Σ filled sell qty),
    no-crossed-book invariant, and hand-case fills are pinned in tests.
    Returns the trade tape: (symbol, buy_id, sell_id, price, qty,
    seq).
    """
    import pandas as pd

    out_schema = (
        f"{symbol_col} string, buy_id long, sell_id long, price long, qty long, seq long"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        import heapq

        if len(pdf) > max_rows_per_key:
            raise ValueError(
                f"lob_match: symbol {pdf[symbol_col].iloc[0]!r} has "
                f"{len(pdf)} orders > max_rows_per_key={max_rows_per_key}; "
                "shard the replay upstream (by session/day) — the resting "
                "book is unbounded carried state, so no blocked path exists"
            )
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        bids: list = []   # (-price, seq, id, qty)
        asks: list = []   # (price, seq, id, qty)
        tape = []
        seq = 0
        sym = str(pdf[symbol_col].iloc[0]) if len(pdf) else None
        for i in range(len(pdf)):
            side = pdf[side_col].iloc[i]
            px = int(pdf[price_col].iloc[i])
            qty = int(pdf[qty_col].iloc[i])
            oid = int(pdf[id_col].iloc[i])
            seq += 1
            if side == "B":
                while qty > 0 and asks and asks[0][0] <= px:
                    apx, aseq, aid, aqty = heapq.heappop(asks)
                    fill = min(qty, aqty)
                    tape.append((sym, oid, aid, apx, fill, seq))
                    qty -= fill
                    if aqty > fill:
                        heapq.heappush(asks, (apx, aseq, aid, aqty - fill))
                if qty > 0:
                    heapq.heappush(bids, (-px, seq, oid, qty))
            else:
                while qty > 0 and bids and -bids[0][0] >= px:
                    nbpx, bseq, bid_, bqty = heapq.heappop(bids)
                    fill = min(qty, bqty)
                    tape.append((sym, bid_, oid, -nbpx, fill, seq))
                    qty -= fill
                    if bqty > fill:
                        heapq.heappush(bids, (nbpx, bseq, bid_, bqty - fill))
                if qty > 0:
                    heapq.heappush(asks, (px, seq, oid, qty))
        return pd.DataFrame(
            tape, columns=[symbol_col, "buy_id", "sell_id", "price", "qty", "seq"]
        )

    return grouped_apply(orders, [symbol_col], scan, out_schema)


def eoq_plan(
    demand: DataFrame,
    keys: list[str],
    qty_col: str,
    unit_cost_cents_col: str,
    order_cost_cents: int,
    holding_rate_pct: int = 20,
    period_days: int = 365,
) -> DataFrame:
    """Economic order quantity per item: EOQ = √(2·D·S / H) with annual
    demand D (exact integer Σqty), fixed order cost S (cents), and
    holding cost H = holding_rate_pct% of unit cost per period.

    The radicand is ONE exact integer ratio — 2·D·S·100 and
    holding_rate_pct·unit_cents stay far under 2^53 — so the single
    sqrt is correctly rounded and engine-identical (the price_index
    discipline).  Derived cycle stats reuse the same exact operands in
    a fixed expression tree.  One two-stage hash agg; the exchange
    carries one row per key.  Returns (keys…, demand, unit_cost_cents,
    eoq_units, order_cycle_days, orders_per_period).
    """
    agg = demand.groupBy(*keys).agg(
        F.sum(F.col(qty_col).cast("long")).cast("long").alias("demand"),
        F.max(F.col(unit_cost_cents_col).cast("long")).alias("unit_cost_cents"),
    )
    h = F.lit(int(holding_rate_pct)) * F.col("unit_cost_cents")
    radicand = (F.lit(2 * int(order_cost_cents) * 100) * F.col("demand")) / h
    eoq = F.sqrt(radicand)
    return agg.select(
        *keys,
        "demand", "unit_cost_cents",
        eoq.alias("eoq_units"),
        (F.lit(float(period_days)) * eoq / F.col("demand")).alias("order_cycle_days"),
        (F.col("demand") / eoq).alias("orders_per_period"),
    )


def stochastic_kd(
    prices: DataFrame,
    keys: list[str],
    price_cents_col: str,
    order: list[str],
    k_window: int = 14,
) -> DataFrame:
    """Stochastic oscillator %K/%D per key: %K = 100·(close − LL) /
    (HH − LL) over the trailing ``k_window`` rows, %D = 3-period simple
    average of %K.

    HH/LL are rolling max/min of INTEGER cents (exact, order-free), so
    each %K is one divide of exact operands; %D is rebuilt from the two
    LAGGED integer pairs — (n₀/d₀ + n₁/d₁ + n₂/d₂)·100/3 as a fixed
    expression tree, never a float window SUM (DuckDB segment trees
    reassociate those — ORACLES rule 19/22).  Rows without a full %K
    window or with HH = LL yield NULL; %D requires three non-NULL %Ks.
    One per-key sort window.  Returns the input order columns plus
    (hh, ll, pct_k, pct_d).
    """
    p = F.col(price_cents_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(-(k_window - 1), 0)
    wcnt = Window.partitionBy(*keys).orderBy(*order)
    hh = F.max(p).over(w)
    ll = F.min(p).over(w)
    full = F.row_number().over(wcnt) >= k_window
    num = F.when(full & (hh > ll), p - ll)
    den = F.when(full & (hh > ll), hh - ll)
    work = prices.select(
        *keys, *order, p.alias("__p__"),
        hh.alias("hh"), ll.alias("ll"), num.alias("__n0__"), den.alias("__d0__"),
    )
    n1 = F.lag("__n0__", 1).over(wcnt)
    d1 = F.lag("__d0__", 1).over(wcnt)
    n2 = F.lag("__n0__", 2).over(wcnt)
    d2 = F.lag("__d0__", 2).over(wcnt)
    k0 = F.col("__n0__") / F.col("__d0__")
    pct_d = (
        F.lit(100.0)
        * (k0 + n1 / d1 + n2 / d2)
        / F.lit(3.0)
    )
    return work.select(
        *keys, *order, "hh", "ll",
        (F.lit(100.0) * k0).alias("pct_k"),
        pct_d.alias("pct_d"),
    )


def rsi_cutler(
    prices: DataFrame,
    keys: list[str],
    price_cents_col: str,
    order: list[str],
    period: int = 14,
) -> DataFrame:
    """Relative Strength Index, Cutler's SMA form: RSI = 100·G/(G+L)
    with G/L the trailing ``period``-row sums of integer-cent gains and
    losses.  Unlike Wilder's EMA form (see ema_decay for that shape),
    the SMA variant is EXACT: rolling sums of integers are fold-order-
    free, so the single divide is engine-identical — no float decay
    anywhere.  Rows without ``period`` full diffs, or with a flat
    window (G+L=0), yield NULL.  One per-key sort window.  Returns the
    key/order columns plus (gain_sum, loss_sum, rsi).
    """
    p = F.col(price_cents_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(*order)
    wr = w.rowsBetween(-(period - 1), 0)
    diff = p - F.lag(p).over(w)
    work = prices.select(
        *keys, *order,
        F.when(diff > 0, diff).otherwise(F.lit(0)).alias("__g__"),
        F.when(diff < 0, -diff).otherwise(F.lit(0)).alias("__l__"),
        F.row_number().over(w).alias("__rn__"),
    )
    g = F.sum("__g__").over(wr)
    ls = F.sum("__l__").over(wr)
    full = F.col("__rn__") >= period + 1
    gg = F.when(full, g).cast("long")
    ll = F.when(full, ls).cast("long")
    return work.select(
        *keys, *order,
        gg.alias("gain_sum"),
        ll.alias("loss_sum"),
        F.when(gg + ll > 0, (F.lit(100) * gg) / (gg + ll)).alias("rsi"),
    )


def newsvendor_stock(
    demand: DataFrame,
    keys: list[str],
    qty_col: str,
    subgroup_col: str,
    cu: int,
    co: int,
) -> DataFrame:
    """Newsvendor optimal stock per key: the smallest stocking level
    whose empirical demand CDF reaches the critical ratio cu/(cu+co) —
    i.e. the ⌈CR·n⌉-th smallest observed demand.  The index is an
    exact integer ceil-division (cu·n + cu + co − 1) div (cu+co), so
    the selection can never sit on a float boundary; the rank window
    totals on (qty, subgroup) for determinism under ties.  Returns
    (keys…, n_periods, pick_rank, stock_level, service_target,
    achieved_service).
    """
    q = F.col(qty_col)
    w = Window.partitionBy(*keys).orderBy(q, F.col(subgroup_col))
    wa = Window.partitionBy(*keys)
    ranked = demand.select(
        *keys, q.alias("__q__"),
        F.row_number().over(w).alias("__rn__"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n_periods"),
    )
    b = int(cu) + int(co)
    idx = F.floor((F.lit(int(cu)) * F.col("n_periods") + F.lit(b - 1)) / F.lit(b)).cast("long")
    return ranked.where(F.col("__rn__") == idx).select(
        *keys, "n_periods",
        idx.alias("pick_rank"),
        F.col("__q__").alias("stock_level"),
        (F.lit(int(cu)) / F.lit(b)).alias("service_target"),
        (idx / F.col("n_periods")).alias("achieved_service"),
    )


def risk_ratios(pnl: DataFrame, keys: list[str], pnl_col: str) -> DataFrame:
    """Sharpe and Sortino ratios per key from an exact-integer
    per-period P&L relation.

    The reference's trading users compute these off Accum2 P&L rollups
    (rt_accumtable.py docstrings); here the kernel is one two-stage
    hash aggregation collecting n, Σr, Σr², and the downside Σr²
    (all exact BIGINTs — order-free under partial aggregation), then
    the moment algebra runs in DOUBLE on identically-converted
    operands: mean = S/n, m2 = Q/n − mean², sample vol =
    √(m2·n/(n−1)), downside vol = √(DQ/n).  Keep the integer power
    sums under 2^53 (use whole-currency P&L units, not cents, for
    large books) so the int→double conversion is exact cross-engine.

    Sharpe is NULL when n ≤ 1 or the variance underflows to ≤ 0;
    Sortino is NULL when no losing period exists.  One shuffle on the
    key; at 100 TB the partial aggregates reduce map-side so the
    exchange carries one row per key.
    """
    r = F.col(pnl_col).cast("long")
    agg = pnl.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(r).cast("long").alias("s"),
        F.sum(r * r).cast("long").alias("q"),
        F.sum(F.when(r < 0, r * r).otherwise(F.lit(0))).cast("long").alias("dq"),
    )
    mean = F.col("s") / F.col("n")
    m2 = F.col("q") / F.col("n") - mean * mean
    sv = (m2 * F.col("n")) / (F.col("n") - 1)
    return agg.select(
        *keys, "n", "s", "q", "dq",
        mean.alias("mean_pnl"),
        F.when((F.col("n") > 1) & (m2 > 0), mean / F.sqrt(sv)).alias("sharpe"),
        F.when(F.col("dq") > 0, mean / F.sqrt(F.col("dq") / F.col("n"))).alias("sortino"),
    )


def roll_spread(
    df: DataFrame,
    keys: list[str],
    price: str,
    order: str | list[str],
    scale: int = 100,
) -> DataFrame:
    """Roll (1984) implied bid-ask spread per key: 2·√(−cov(Δp_t,
    Δp_{t−1})) in scaled price units, NULL when the serial covariance
    is non-negative (no bounce signal).

    Both lag terms ride ONE per-key ordered window (the Δp column is
    lagged again over the same (key, order) sort — Catalyst reuses the
    exchange and the sort), and every accumulator is an exact BIGINT:
    A = ΣΔp_t·Δp_{t−1}, S1 = ΣΔp_t, S0 = ΣΔp_{t−1}, m = pairs.  The
    covariance is assembled in DOUBLE as A/m − (S1/m)·(S0/m) on
    identically-converted operands, so the estimate is bit-identical
    cross-engine.  One shuffle on the key.
    """
    oc = _order_cols(order)
    w = Window.partitionBy(*keys).orderBy(*oc)
    p = F.round(F.col(price) * scale).cast("long")
    d = df.select(*keys, *oc, (p - F.lag(p).over(w)).alias("__d__"))
    dd = d.select(
        *keys,
        F.col("__d__"),
        F.lag(F.col("__d__")).over(w).alias("__dprev__"),
    ).where(F.col("__d__").isNotNull() & F.col("__dprev__").isNotNull())
    agg = dd.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("__d__") * F.col("__dprev__")).cast("long").alias("a"),
        F.sum(F.col("__d__")).cast("long").alias("s1"),
        F.sum(F.col("__dprev__")).cast("long").alias("s0"),
    )
    cov = F.col("a") / F.col("n_pairs") - (F.col("s1") / F.col("n_pairs")) * (
        F.col("s0") / F.col("n_pairs")
    )
    return agg.select(
        *keys, "n_pairs", "a", "s1", "s0",
        cov.alias("autocov"),
        F.when(cov < 0, 2 * F.sqrt(-cov)).alias("spread_scaled"),
    )


def amihud_illiquidity(
    df: DataFrame,
    keys: list[str],
    bucket: Column,
    price: str,
    scale: int = 100,
) -> DataFrame:
    """Range-based Amihud illiquidity per key: mean over buckets
    (days) of |price range| · 1e6 DIV activity — the price-impact-per-
    trade proxy, kept exact end to end.

    Per (key, bucket) the range is max(px) − min(px) in scaled integer
    units (pure agg — no ordering requirement, unlike the classical
    close-to-close |return| form), activity is the row count, and the
    per-bucket ratio is an exact integer DIV in parts-per-million.
    The final mean is ONE divide of two BIGINTs.  Two cheap hash aggs
    that share the key prefix; no window, no float sums anywhere.
    """
    p = F.round(F.col(price) * scale).cast("long")
    daily = df.groupBy(*keys, bucket.alias("bucket")).agg(
        (F.max(p) - F.min(p)).alias("__range__"),
        F.count(F.lit(1)).cast("long").alias("__n__"),
    )
    ratio = F.expr("(__range__ * 1000000) DIV __n__")
    per = daily.select(*keys, ratio.alias("__ppm__"))
    return per.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(F.col("__ppm__")).cast("long").alias("ppm_sum"),
        (F.sum(F.col("__ppm__")) / F.count(F.lit(1))).alias("illiq_ppm"),
    )


def volume_profile(
    df: DataFrame,
    keys: list[str],
    price: str,
    band: int,
    scale: int = 100,
) -> DataFrame:
    """Volume profile per key: notional traded per price band, each
    band's share in parts-per-million (integer DIV — no float share
    can sit on a rounding boundary), and the point-of-control flag
    (band with max notional).

    The band id is an integer DIV of the scaled price, so banding is
    exact; the per-key total and max ride a window over the ALREADY
    AGGREGATED relation (one row per (key, band) — bounded state, the
    aggregated-input window discipline), never over raw ticks.  One
    shuffle for the agg; the window reuses the key exchange.
    """
    p = F.round(F.col(price) * scale).cast("long")
    bands = (
        df.select(*keys, p.alias("__p__"))
        .withColumn("band", F.expr(f"__p__ DIV {int(band)}"))
        .groupBy(*keys, "band")
        .agg(
            F.sum(F.col("__p__")).cast("long").alias("notional"),
            F.count(F.lit(1)).cast("long").alias("n_trades"),
        )
    )
    wk = Window.partitionBy(*keys)
    return bands.select(
        *keys, "band", "notional", "n_trades",
        F.expr("notional * 1000000").alias("__scaled__"),
        F.sum("notional").over(wk).cast("long").alias("__total__"),
        F.max("notional").over(wk).cast("long").alias("__peak__"),
    ).select(
        *keys, "band", "notional", "n_trades",
        F.expr("__scaled__ DIV __total__").alias("share_ppm"),
        (F.col("notional") == F.col("__peak__")).alias("is_poc"),
    )


def second_price_auction(
    df: DataFrame,
    keys: list[str],
    bidder_col: str,
    bid_col: str,
    reserve: int = 0,
) -> DataFrame:
    """Second-price (Vickrey) auction clearing per key: winner = top
    bid under the (bid DESC, bidder ASC) total order, clearing price =
    max(second-highest bid, reserve), unsold when the top bid misses
    the reserve.  One per-key window ranks, the top-2 rows pivot into
    fixed columns via conditional max — exact integer money end to
    end.  WindowGroupLimit prunes each key's stream to 2 rows before
    the shuffle, so the exchange carries ≤ 2 rows per auction.
    Returns (keys…, n_bids, winner, win_bid, clearing_price, sold).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(bid_col).desc(), F.col(bidder_col))
    ranked = df.select(
        *keys,
        F.col(bidder_col).alias("__bidder__"),
        F.col(bid_col).cast("long").alias("__bid__"),
        F.row_number().over(w).alias("__rn__"),
        F.count(F.lit(1)).over(Window.partitionBy(*keys)).cast("long").alias("__n__"),
    ).where(F.col("__rn__") <= 2)
    agg = ranked.groupBy(*keys).agg(
        F.max("__n__").alias("n_bids"),
        F.max(F.when(F.col("__rn__") == 1, F.col("__bidder__"))).alias("winner"),
        F.max(F.when(F.col("__rn__") == 1, F.col("__bid__"))).alias("win_bid"),
        F.max(F.when(F.col("__rn__") == 2, F.col("__bid__"))).alias("__second__"),
    )
    sold = F.col("win_bid") >= reserve
    return agg.select(
        *keys, "n_bids", 
        F.when(sold, F.col("winner")).alias("winner"),
        "win_bid",
        F.when(sold, F.greatest(F.coalesce(F.col("__second__"), F.lit(0).cast("long")),
                                F.lit(int(reserve)).cast("long"))).alias("clearing_price"),
        sold.alias("sold"),
    )


def vpin(
    df: DataFrame,
    keys: list[str],
    order: str | list[str],
    price: str,
    bucket_size: int = 50,
    window_buckets: int = 4,
    scale: int = 100,
) -> DataFrame:
    """VPIN order-flow toxicity (Easley/López de Prado/O'Hara, volume-
    synchronized PIN) with trade-count buckets: classify each nonzero
    tick by its price change sign, bucket every ``bucket_size`` ticks,
    take each bucket's |buys − sells| imbalance in exact integer ppm,
    and average the trailing ``window_buckets`` buckets with an
    integer rolling sum + ONE divide.  Zero ticks are excluded (the
    sign-carry variant is lee_ready's job); everything stays BIGINT so
    the toxicity series is engine-exact.  One shuffle on the key; the
    bucket roll-up and trailing window run on the aggregated relation.
    """
    oc = _order_cols(order)
    w = Window.partitionBy(*keys).orderBy(*oc)
    p = F.round(F.col(price) * scale).cast("long")
    d = df.select(*keys, *oc, (p - F.lag(p).over(w)).alias("__dp__")).where(
        F.col("__dp__").isNotNull() & (F.col("__dp__") != 0)
    )
    seq = d.select(
        *keys,
        F.when(F.col("__dp__") > 0, 1).otherwise(0).alias("__buy__"),
        F.row_number().over(w).alias("__rn__"),
    ).select(
        *keys, "__buy__",
        # integer DIV, never a float-divide-then-cast (1-ulp trap)
        F.expr(f"(__rn__ - 1) DIV {int(bucket_size)}").alias("bucket"),
    )
    b = seq.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        F.sum("__buy__").cast("long").alias("n_buys"),
    )
    imb = b.select(
        *keys, "bucket", "n_ticks", "n_buys",
        F.expr("(abs(2 * n_buys - n_ticks) * 1000000) DIV n_ticks").alias("imb_ppm"),
    )
    wb = Window.partitionBy(*keys).orderBy("bucket").rowsBetween(-(window_buckets - 1), 0)
    return imb.select(
        *keys, "bucket", "n_ticks", "n_buys", "imb_ppm",
        (F.sum("imb_ppm").over(wb) / F.count(F.lit(1)).over(wb)).alias("vpin_ppm"),
    )

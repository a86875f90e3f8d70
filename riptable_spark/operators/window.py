"""Ordered / windowed operators (SURVEY §2.5, §2.6).

Reference: the 200/300-series GB_FUNCTIONS (/root/reference/riptable/
rt_enum.py:511-532) — rolling_*, cum*, shift/diff, rank, fills, EMA — all
defined over *physical row order within group* (rt_groupbyops.py:2941-3435).

Spark mapping: ``Window.partitionBy(keys).orderBy(order)`` frames. The
order column is explicit (a timestamp or ``__rowid__``) because Spark rows
have no physical order. Time-distance windows (timewindow_sum,
rt_fastarray.py:2629) use ``rangeBetween`` — the native fit.

EMA recurrences (ema_decay/normal/weighted, rt_groupbyops.py:3314-3438)
are sequential scans — implemented in operators/ema.py via applyInPandas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def group_window(keys: list[str] | None, order: str | Column) -> WindowSpec:
    ocol = F.col(order) if isinstance(order, str) else order
    if keys:
        return Window.partitionBy(*keys).orderBy(ocol)
    return Window.orderBy(ocol)


# --- shift / diff (rt_groupbyops.py:3660, 3551; rt_fastarray.py:4046/4251)
def shift(col: Column, n: int, w: WindowSpec) -> Column:
    return F.lag(col, n).over(w) if n >= 0 else F.lead(col, -n).over(w)


def diff(col: Column, n: int, w: WindowSpec) -> Column:
    return col - shift(col, n, w)


def _shifted(col: Column, w: WindowSpec, periods: int) -> Column:
    return F.lag(col, periods).over(w) if periods >= 0 else F.lead(col, -periods).over(w)


def differs(col: Column, w: WindowSpec, periods: int = 1) -> Column:
    """rt_fastarray.py:4153 differs — True where the element EQUALS the
    element ``periods`` back (CMP_EQ; the doctest marks [1,2,2,...]
    True at the repeated 2s). Negative periods look ahead. Comparisons
    against the shifted-in invalid region are False (differs(periods=15)
    → all False), as is any comparison involving an invalid value."""
    prev = _shifted(col, w, periods)
    return F.when(col.isNull() | prev.isNull(), F.lit(False)).otherwise(col == prev)


def transitions(col: Column, w: WindowSpec, periods: int = 1) -> Column:
    """rt_fastarray.py:4220 transitions — True where the element does
    NOT equal the element ``periods`` back (CMP_NE); the shifted-in
    region is False (doctest [0,1,2,3,3,3,4] starts False)."""
    prev = _shifted(col, w, periods)
    return F.when(col.isNull() | prev.isNull(), F.lit(False)).otherwise(col != prev)


def run_starts(col: Column, w: WindowSpec) -> Column:
    """1 where a new run of equal values starts, INCLUDING each
    partition's first row — the run-counting form (sum = number of
    runs). transitions() with the reference's first-row-False contract
    can't count runs by itself."""
    prev = F.lag(col).over(w)
    return (~col.eqNullSafe(prev)).cast("int")


# --- cumulative (rt_groupbyops.py:3158-3239)
def _cum_frame(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, 0)


def cumsum(col: Column, w: WindowSpec) -> Column:
    return F.sum(col).over(_cum_frame(w))


def cummax(col: Column, w: WindowSpec) -> Column:
    return F.max(col).over(_cum_frame(w))


def cummin(col: Column, w: WindowSpec) -> Column:
    return F.min(col).over(_cum_frame(w))


def cumcount(w: WindowSpec) -> Column:
    return F.count(F.lit(1)).over(_cum_frame(w))


def cumprod(col: Column, w: WindowSpec) -> Column:
    """No SQL cumulative product → exp(cumsum(ln|x|)) with sign tracking;
    exact for positive inputs, sign-correct generally (0 handled)."""
    frame = _cum_frame(w)
    anyzero = F.max(F.when(col == 0, 1).otherwise(0)).over(frame) == 1
    negcount = F.sum(F.when(col < 0, 1).otherwise(0)).over(frame)
    magnitude = F.exp(F.sum(F.log(F.abs(col))).over(frame))
    sign = F.when(negcount % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(anyzero, F.lit(0.0)).otherwise(sign * magnitude)


def cumsum_reset(col: Column, reset: Column, keys: list[str], order) -> Column:
    """cum* with reset_filter (rt_groupbyops.py:3158 filter/reset_filter):
    segment-id trick — cumsum of reset flags becomes an extra partition
    key, so each reset starts a fresh running sum."""
    ocol = F.col(order) if isinstance(order, str) else order
    base = Window.partitionBy(*keys).orderBy(ocol).rowsBetween(Window.unboundedPreceding, 0)
    seg = F.sum(reset.cast("int")).over(base)
    w2 = Window.partitionBy(*keys, seg).orderBy(ocol).rowsBetween(Window.unboundedPreceding, 0)
    return F.sum(col).over(w2)


# --- rolling, row-count frames (rt_groupbyops.py:2941-3115)
def _roll_frame(w: WindowSpec, window: int) -> WindowSpec:
    return w.rowsBetween(-(window - 1), 0)


def rolling_sum(col: Column, w: WindowSpec, window: int = 3) -> Column:
    """riptable rolling_* emits invalid for the first window-1 rows of each
    group (full windows only) — reproduce with a row_number guard."""
    full = F.row_number().over(w) >= window
    return F.when(full, F.sum(col).over(_roll_frame(w, window)))


def rolling_mean(col: Column, w: WindowSpec, window: int = 3) -> Column:
    full = F.row_number().over(w) >= window
    return F.when(full, F.avg(col).over(_roll_frame(w, window)))


def rolling_nansum(col: Column, w: WindowSpec, window: int = 3) -> Column:
    return F.sum(col).over(_roll_frame(w, window))


def rolling_nanmean(col: Column, w: WindowSpec, window: int = 3) -> Column:
    return F.avg(col).over(_roll_frame(w, window))


def rolling_count(col: Column, w: WindowSpec, window: int = 3) -> Column:
    """Valid-value count, partial windows included (the reference's
    rolling_count has no full-window gate)."""
    return F.count(col).over(_roll_frame(w, window))


def rolling_min(col: Column, w: WindowSpec, window: int = 3) -> Column:
    """Full-window contract like rolling_sum: the move_* family these
    mirror (bottleneck move_min, rt_fastarray.py:2670) defaults
    min_count=window, so the first window-1 rows per group are invalid."""
    full = F.row_number().over(w) >= window
    return F.when(full, F.min(col).over(_roll_frame(w, window)))


def rolling_max(col: Column, w: WindowSpec, window: int = 3) -> Column:
    full = F.row_number().over(w) >= window
    return F.when(full, F.max(col).over(_roll_frame(w, window)))


def rolling_std(col: Column, w: WindowSpec, window: int = 3) -> Column:
    full = F.row_number().over(w) >= window
    return F.when(full, F.stddev_samp(col).over(_roll_frame(w, window)))


def rolling_var(col: Column, w: WindowSpec, window: int = 3) -> Column:
    full = F.row_number().over(w) >= window
    return F.when(full, F.var_samp(col).over(_roll_frame(w, window)))


def rolling_median(col: Column, w: WindowSpec, window: int = 3) -> Column:
    """nan-variant by reference contract ("rolling nan median",
    rt_groupbyops.py:3070): partial windows produce values, like
    rolling_nansum. F.median rejects window frames; percentile(0.5) is
    the same exact interpolation and is frame-capable."""
    return F.percentile(col, F.lit(0.5)).over(_roll_frame(w, window))


def rolling_quantile(col: Column, q: float, w: WindowSpec, window: int = 3) -> Column:
    """nan-variant ("rolling nan quantile", rt_groupbyops.py:2997)."""
    return F.percentile(col, F.lit(q)).over(_roll_frame(w, window))


def shift_ungrouped(
    df: DataFrame,
    cols: dict[str, str],
    n: int,
    order_cols: list[str],
    block: int = 1 << 20,
    keep_rowid: bool = False,
) -> DataFrame:
    """Ungrouped shift/lead over the WHOLE table without the
    single-partition ``Window.orderBy`` hazard (VERDICT r1 'what's wrong'
    #3): stamp a deterministic global ``__rowid__`` (sources.io.with_rowid
    — range-bucketed ranks + broadcast offsets, one shuffle), window only
    WITHIN rowid blocks of ``block`` rows, then patch each block's first
    |n| rows from a broadcast of the neighboring blocks' edge rows
    (|n|·#blocks rows — metadata-sized).

    ``cols`` maps output name → source column. n>0 shifts back (lag),
    n<0 forward (lead). Cost: with_rowid's shuffle + one block-keyed
    window + a broadcast join; every stage is parallel across blocks.

    If ``df`` already carries ``__rowid__`` (a previous ungrouped op run
    with ``keep_rowid=True`` over the SAME order), it is reused — the
    rowid machinery (an eager approxQuantile pass + rank/offset join)
    runs once per chain instead of once per op (round-6: q122's two-op
    chain ran it twice for identical rowids). ``keep_rowid=True``
    retains the column for exactly that chaining.
    """
    from ..sources.io import with_rowid

    if n == 0:
        out = df
        for out_name, src in cols.items():
            out = out.withColumn(out_name, F.col(src))
        return out
    rid = df if "__rowid__" in df.columns else with_rowid(df, *order_cols)
    blk = (F.col("__rowid__") / F.lit(block)).cast("long")
    w = Window.partitionBy(blk).orderBy("__rowid__")
    out = rid
    for out_name, src in cols.items():
        local = F.lag(F.col(src), n).over(w) if n > 0 else F.lead(F.col(src), -n).over(w)
        out = out.withColumn(out_name, local)
    # Edge donors: rows whose value feeds a row in a DIFFERENT block.
    # Receiver rowid = donor rowid + n; receivers missing a local value
    # are exactly those whose donor lives across the block boundary.
    a = abs(n)
    in_edge = (
        (F.col("__rowid__") % block >= block - a) if n > 0 else (F.col("__rowid__") % block < a)
    )
    donors = rid.where(in_edge).select(
        (F.col("__rowid__") + F.lit(n)).alias("__rowid__"),
        *[F.col(src).alias(f"__edge_{out_name}__") for out_name, src in cols.items()],
    )
    patched = out.join(F.broadcast(donors), on="__rowid__", how="left")
    for out_name in cols:
        patched = patched.withColumn(
            out_name, F.coalesce(F.col(out_name), F.col(f"__edge_{out_name}__"))
        ).drop(f"__edge_{out_name}__")
    return patched if keep_rowid else patched.drop("__rowid__")


def diff_ungrouped(
    df: DataFrame, cols: dict[str, str], n: int, order_cols: list[str], block: int = 1 << 20,
    keep_rowid: bool = False,
) -> DataFrame:
    """Ungrouped diff via the same boundary-exchange rewrite (reuses /
    retains ``__rowid__`` exactly like :func:`shift_ungrouped`)."""
    shifted = shift_ungrouped(df, {f"__sh_{o}__": s for o, s in cols.items()}, n, order_cols, block,
                              keep_rowid=keep_rowid)
    for out_name, src in cols.items():
        shifted = shifted.withColumn(out_name, F.col(src) - F.col(f"__sh_{out_name}__")).drop(
            f"__sh_{out_name}__"
        )
    return shifted


def issorted_blocked(df: DataFrame, col: str, order_cols: list[str] | None = None, block: int = 1 << 20) -> bool:
    """Scale-safe issorted (rt_numpy.py:709): per-block sortedness plus
    block-boundary comparison — no global single-partition window. With
    order_cols=None the check is against the deterministic rowid order of
    ``col`` itself (requires col be the intended order)."""
    from ..sources.io import with_rowid

    rid = with_rowid(df, *(order_cols or [col]))
    blk = (F.col("__rowid__") / F.lit(block)).cast("long")
    w = Window.partitionBy(blk).orderBy("__rowid__")
    v = F.col(col)
    prev = F.lag(v).over(w)
    flagged = rid.select(
        blk.alias("__blk__"),
        v.alias("__v__"),
        F.when(prev.isNull() | (v >= prev), 1).otherwise(0).alias("__ok__"),
    )
    per_block = flagged.groupBy("__blk__").agg(
        F.min("__ok__").alias("ok"), F.min("__v__").alias("mn"), F.max("__v__").alias("mx")
    )
    rows = per_block.orderBy("__blk__").collect()  # #blocks rows — tiny
    if any(r.ok == 0 for r in rows):
        return False
    return all(rows[i].mx <= rows[i + 1].mn for i in range(len(rows) - 1))


def lexsort_rank(df: DataFrame, keys: list[str], out_col: str = "lexsort_rank") -> DataFrame:
    """rt_numpy lexsort (numpy convention: the LAST key is primary) as a
    named operator. riptable's lexsort returns the permutation that
    sorts; on Spark the positional analogue is the INVERSE permutation —
    each row's 0-based position under the sort — because downstream
    'reorder by this permutation' is just orderBy. Scale shape: the
    deterministic global index machinery (with_rowid: range-bucketed
    ranks + broadcast offsets), never a single-partition sort. Keys
    should include a unique tiebreaker for reproducible ranks."""
    from ..sources.io import with_rowid

    order = list(reversed(keys))
    return with_rowid(df, *order).withColumnRenamed("__rowid__", out_col)


def argsort_rank(df: DataFrame, col: str, out_col: str = "argsort_rank") -> DataFrame:
    """rt_fastarray argsort as a named op: single-key lexsort_rank."""
    return lexsort_rank(df, [col], out_col)


def searchsorted_union(
    values: DataFrame,
    value_col: str,
    bounds: DataFrame,
    bound_col: str,
    side: str = "left",
    out_col: str = "idx",
    by: list[str] | None = None,
) -> DataFrame:
    """searchsorted against a LARGE sorted side (rt_numpy.py:701) without
    broadcasting it: tag bounds and values, union, ONE shuffle+sort on
    (by, value, side-order), running count of bound rows = insertion
    index — the same union+window shape as merge_asof, so it scales the
    same way. Use functions.math.searchsorted_against when the bounds fit
    a broadcast array. Ungrouped use (by=None) is a global sort —
    interactive scale only; pass ``by`` for the cluster path."""
    byc = list(by or [])
    b = bounds.select(
        *byc, F.col(bound_col).cast("double").alias("__v__")
    ).withColumn("__is_b__", F.lit(1))
    v = values.withColumn("__v__", F.col(value_col).cast("double")).withColumn(
        "__is_b__", F.lit(0)
    )
    u = v.unionByName(b, allowMissingColumns=True)
    # left: ties NOT counted → value rows sort before equal bound rows;
    # right: ties counted → bound rows first (mirrors numpy side=)
    side_order = F.col("__is_b__").desc() if side == "right" else F.col("__is_b__").asc()
    w = (
        Window.partitionBy(*byc)
        .orderBy(F.col("__v__").asc_nulls_first(), side_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    idx = F.sum("__is_b__").over(w)
    if side == "leftplus":
        wall = Window.partitionBy(*byc)
        mx = F.max(F.when(F.col("__is_b__") == 1, F.col("__v__"))).over(wall)
        idx = F.when(F.col("__v__") > mx, F.lit(0)).otherwise(idx)
    out = u.withColumn(out_col, idx.cast("int")).where(F.col("__is_b__") == 0)
    return out.drop("__is_b__", "__v__")


# --- move_* rolling arg-ops (rt_fastarray.py:2688-2699 → bottleneck
# move_argmin/move_argmax/move_rank). All three share bottleneck's
# full-window contract (min_count=window → first window-1 rows invalid)
# and are pure JVM array expressions over a collect_list frame: O(n·w)
# like bottleneck's own ring-buffer, no UDF, no extra shuffle beyond the
# window's. Values must be non-NULL (collect_list drops NULLs, which
# would desync list positions from frame offsets — normalize invalids
# upstream, as riptable does with sentinels).


def move_argmin(col: Column, w: WindowSpec, window: int = 3) -> Column:
    """Offset of the window minimum counted back from the current row
    (0 = current row is the min — bottleneck's index convention). Ties
    resolve to the most recent occurrence."""
    fr = _roll_frame(w, window)
    arr = F.collect_list(col).over(fr)
    full = F.count(col).over(fr) >= window
    return F.when(full, F.array_position(F.reverse(arr), F.array_min(arr)) - 1)


def move_argmax(col: Column, w: WindowSpec, window: int = 3) -> Column:
    fr = _roll_frame(w, window)
    arr = F.collect_list(col).over(fr)
    full = F.count(col).over(fr) >= window
    return F.when(full, F.array_position(F.reverse(arr), F.array_max(arr)) - 1)


def move_rank(col: Column, w: WindowSpec, window: int = 3) -> Column:
    """bottleneck move_rank: mean of sign(current − other) over the other
    window elements, in (-1, 1]; e.g. a strictly largest current value
    ranks 1.0, strictly smallest -1.0, all-equal 0.0."""
    fr = _roll_frame(w, window)
    arr = F.collect_list(col).over(fr)
    full = F.count(col).over(fr) >= window
    sign_sum = F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + F.signum(col.cast("double") - x.cast("double"))
    )
    return F.when(full, sign_sum / F.lit(float(window - 1)))


# --- time-distance windows (rt_fastarray.py:2629 timewindow_sum)
def timewindow_sum(col: Column, keys: list[str], time_col: str, dist, unit_expr: str | None = None) -> Column:
    """Sum over trailing *time* window — rangeBetween is the native fit."""
    order = F.col(time_col).cast("long") if unit_expr is None else F.expr(unit_expr)
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(order).rangeBetween(-dist, 0)
    return F.sum(col).over(w)


def timewindow_prod(col: Column, keys: list[str], time_col: str, dist) -> Column:
    w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(
        F.col(time_col).cast("long")
    ).rangeBetween(-dist, 0)
    anyzero = F.max(F.when(col == 0, 1).otherwise(0)).over(w) == 1
    negcount = F.sum(F.when(col < 0, 1).otherwise(0)).over(w)
    sign = F.when(negcount % 2 == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(anyzero, F.lit(0.0)).otherwise(sign * F.exp(F.sum(F.log(F.abs(col))).over(w)))


# --- fills (rt_fastarraynumba.py:149/241, rt_groupbynumba.py:312/348)
def fill_forward(col: Column, w: WindowSpec, fill_val=None) -> Column:
    """rt_fastarraynumba.py:170 fill_forward. ``fill_val`` replaces
    positions with no valid value to propagate (the leading-NaN case in
    the reference doctest)."""
    out = F.last(col, ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return F.coalesce(out, F.lit(fill_val)) if fill_val is not None else out


def fill_backward(col: Column, w: WindowSpec, fill_val=None) -> Column:
    """rt_fastarraynumba.py:260 fill_backward (trailing-NaN fill_val)."""
    out = F.first(col, ignorenulls=True).over(w.rowsBetween(0, Window.unboundedFollowing))
    return F.coalesce(out, F.lit(fill_val)) if fill_val is not None else out


def fill_forward_limit(col: Column, w: WindowSpec, limit: int) -> Column:
    """limit= support: only fill if the last non-null is within `limit`
    rows back (distance check via a filled row-number marker)."""
    rn = F.row_number().over(w)
    last_valid_rn = F.last(F.when(col.isNotNull(), rn), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last(col, ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return F.when(col.isNotNull(), col).when(rn - last_valid_rn <= limit, filled)


# --- rank / ngroup / findnth (rt_groupbyops.py:3632, 3565, 3262)
def rank(col: Column, w_keys: list[str] | None, method: str = "average", pct: bool = False) -> Column:
    base = Window.partitionBy(*w_keys) if w_keys else Window.partitionBy()
    w = base.orderBy(col)
    if method == "first":
        r = F.row_number().over(w)
    elif method == "min":
        r = F.rank().over(w)
    elif method == "max":
        r = F.rank().over(base.orderBy(col.desc()))
        cnt = F.count(F.lit(1)).over(base)
        r = cnt - r + 1
    elif method == "dense":
        r = F.dense_rank().over(w)
    else:  # average = (min_rank + max_rank)/2
        rmin = F.rank().over(w)
        cnt_eq = F.count(F.lit(1)).over(base.orderBy(col).rangeBetween(0, 0))
        r = (rmin + (rmin + cnt_eq - 1)) / 2.0
    if pct:
        n = F.count(F.lit(1)).over(base)
        return r / n
    return r


def ngroup(keys: list[str]) -> Column:
    """rt_groupbyops.py:3565 — 0-based dense group number by key order.
    NOTE: a dense_rank over the whole table funnels into one partition;
    prefer :func:`ngroup_df`, which ranks only the distinct key set and
    broadcast-joins the numbers back. This Column form is kept for
    small/interactive use."""
    return F.dense_rank().over(Window.orderBy(*[F.col(k) for k in keys])) - 1


def ngroup_df(df: DataFrame, keys: list[str], out_col: str = "ngroup") -> DataFrame:
    """Scale path for ngroup: dense 0-based group ids computed on the
    DISTINCT key set (tiny window) and broadcast-joined back — the full
    table never passes through a single partition."""
    uniq = df.select(*keys).distinct()
    w = Window.orderBy(*[F.col(k) for k in keys])
    numbered = uniq.withColumn(out_col, F.dense_rank().over(w) - 1)
    return df.join(F.broadcast(numbered), on=keys, how="left")


def findnth(w: WindowSpec) -> Column:
    """rt_groupbyops.py:3262 — 1-based position within group."""
    return F.row_number().over(w)


def head_per_group(df: DataFrame, keys: list[str], order, n: int) -> DataFrame:
    """rt_groupbyops.py:3673 head — first n rows per group."""
    w = group_window(keys, order)
    return df.withColumn("__rn__", F.row_number().over(w)).where(F.col("__rn__") <= n).drop("__rn__")


def tail_per_group(df: DataFrame, keys: list[str], order, n: int) -> DataFrame:
    ocol = (F.col(order) if isinstance(order, str) else order).desc()
    w = Window.partitionBy(*keys).orderBy(ocol)
    return df.withColumn("__rn__", F.row_number().over(w)).where(F.col("__rn__") <= n).drop("__rn__")


def nth_per_group(df: DataFrame, keys: list[str], order, n: int) -> DataFrame:
    """GB_NTH (rt_groupbyops.py:3543) — 1-based nth row of each group."""
    w = group_window(keys, order)
    return df.withColumn("__rn__", F.row_number().over(w)).where(F.col("__rn__") == n).drop("__rn__")


def drop_duplicates(df: DataFrame, keys: list[str], order, keep: str = "first") -> DataFrame:
    """rt_dataset.py:3631 drop_duplicates with keep=first|last|False.
    keep=False drops ALL rows that have any duplicate.

    keep=first/last runs as ONE hash aggregation — min/max over
    struct(order, payload) — not a row_number window: the aggregate gets
    map-side partial combine (shuffle carries one row per key per input
    partition) and skips the per-partition sort entirely. The trailing
    payload fields in the struct give duplicate order values a
    deterministic total order."""
    payload = [c for c in df.columns if c not in keys]
    if keep is False or keep == "none":
        counted = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("__c__"),
            F.min(F.struct(*payload)).alias("__row__"),
        )
        return counted.where(F.col("__c__") == 1).select(
            *keys, *[F.col(f"__row__.{c}").alias(c) for c in payload]
        )
    ocol = F.col(order) if isinstance(order, str) else order
    agg_fn = F.max if keep == "last" else F.min
    picked = df.groupBy(*keys).agg(
        agg_fn(F.struct(ocol.alias("__o__"), *payload)).alias("__row__")
    )
    return picked.select(*keys, *[F.col(f"__row__.{c}").alias(c) for c in payload])


def issorted(df: DataFrame, col: str, order) -> bool:
    """rt_numpy.py:710 — one aggregation over a lag comparison."""
    w = Window.orderBy(F.col(order) if isinstance(order, str) else order)
    bad = df.select(
        (F.col(col) < F.lag(F.col(col)).over(w)).alias("desc_step")
    ).where(F.col("desc_step")).limit(1).count()
    return bad == 0


def interp_extrap(
    df: DataFrame, x_col: str, xp: DataFrame, xp_col: str, fp_col: str, out_col: str = "interp", mode: str = "clip"
) -> DataFrame:
    """Linear interpolation of df[x_col] against the sample curve
    xp(xp_col→fp_col) via as-of aligns (backward + forward bracket) on the
    union+window rewrite, then pure arithmetic.

    mode='clip' → rt_numpy.py:5333 ``interp`` / np.interp: values outside
    the curve return the boundary fp. mode='extrapolate' →
    rt_numpy.py:5388 ``interp_extrap``: the end SEGMENT's slope extends
    linearly outward (two extra aligns fetch the second-outermost point)."""
    from .merge import merge_asof

    curve = xp.select(F.col(xp_col).alias(x_col), F.col(fp_col).alias("__fp__"))
    b = merge_asof(df, curve.select(F.col(x_col), F.col("__fp__").alias("__y0__")), on=x_col, direction="backward", matched_on="__x0__")
    bf = merge_asof(b, curve.select(F.col(x_col), F.col("__fp__").alias("__y1__")), on=x_col, direction="forward", allow_exact_matches=False, matched_on="__x1__")
    slope = (F.col("__y1__") - F.col("__y0__")) / (F.col("__x1__").cast("double") - F.col("__x0__").cast("double"))
    interp_val = F.col("__y0__") + slope * (F.col(x_col).cast("double") - F.col("__x0__").cast("double"))
    if mode == "clip":
        result = F.when(F.col("__x1__").isNull(), F.col("__y0__")).when(F.col("__x0__").isNull(), F.col("__y1__")).otherwise(interp_val)
        return bf.withColumn(out_col, result).drop("__x0__", "__x1__", "__y0__", "__y1__")

    # extrapolate: fetch the point BEFORE the last match (for x beyond the
    # high end) and AFTER the first match (for x before the low end) by
    # as-of aligning on the matched curve keys themselves
    prev_curve = curve.select(F.col(x_col).alias("__x0__"), F.col("__fp__").alias("__ym1__"))
    nxt_curve = curve.select(F.col(x_col).alias("__x1__"), F.col("__fp__").alias("__y2__"))
    e = merge_asof(bf, prev_curve, on="__x0__", direction="backward", allow_exact_matches=False, matched_on="__xm1__")
    e = merge_asof(e, nxt_curve, on="__x1__", direction="forward", allow_exact_matches=False, matched_on="__x2__")
    x = F.col(x_col).cast("double")
    hi_slope = (F.col("__y0__") - F.col("__ym1__")) / (F.col("__x0__").cast("double") - F.col("__xm1__").cast("double"))
    lo_slope = (F.col("__y2__") - F.col("__y1__")) / (F.col("__x2__").cast("double") - F.col("__x1__").cast("double"))
    hi_extrap = F.col("__y0__") + hi_slope * (x - F.col("__x0__").cast("double"))
    lo_extrap = F.col("__y1__") + lo_slope * (x - F.col("__x1__").cast("double"))
    result = (
        F.when(F.col("__x1__").isNull(), F.when(F.col("__xm1__").isNull(), F.col("__y0__")).otherwise(hi_extrap))
        .when(F.col("__x0__").isNull(), F.when(F.col("__x2__").isNull(), F.col("__y1__")).otherwise(lo_extrap))
        .otherwise(interp_val)
    )
    return e.withColumn(out_col, result).drop(
        "__x0__", "__x1__", "__xm1__", "__x2__", "__y0__", "__y1__", "__ym1__", "__y2__"
    )


def rankdata(df: DataFrame, colname: str, out_col: str = "rank", method: str = "average") -> DataFrame:
    """rt_fastarray.py:2710 rankdata — global ranks (scipy 'average'/'min'
    methods). Scale path: a naive global window would funnel all rows into
    one partition; instead aggregate to DISTINCT values (small), run the
    cumulative count over that tiny set, and broadcast-join ranks back —
    the full table is never re-sorted."""
    counts = df.groupBy(colname).agg(F.count(F.lit(1)).alias("__cnt__"))
    w = Window.orderBy(colname).rowsBetween(Window.unboundedPreceding, -1)
    ranked = counts.withColumn("__below__", F.coalesce(F.sum("__cnt__").over(w), F.lit(0)))
    if method == "min":
        rank_expr = F.col("__below__") + 1
    else:  # average
        rank_expr = F.col("__below__") + (F.col("__cnt__") + 1) / 2.0
    ranks = ranked.select(colname, rank_expr.alias(out_col))
    return df.join(F.broadcast(ranks), on=colname, how="left")


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Top-k rows per group. Compiles to rank-filter form that Spark's
    WindowGroupLimit optimization turns into a per-partition streaming
    top-k (each map task keeps a k-row heap per group BEFORE the
    exchange) — the grouped analogue of TakeOrderedAndProject; the
    shuffle then carries ≤ k rows per (group, partition), not the table.
    Ties broken by ``tiebreak`` columns for determinism."""
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__tk__", F.row_number().over(w)).where(F.col("__tk__") <= k).drop("__tk__")


# Reference enum parity (rt_enum.py): the rolling / time-window kernel
# name sets, pointing at their implementations here.
ROLLING_FUNCTIONS = {
    "rolling_sum": "rolling_agg('sum')", "rolling_nansum": "rolling_agg('sum')",
    "rolling_mean": "rolling_agg('mean')", "rolling_nanmean": "rolling_agg('mean')",
    "rolling_count": "rolling_agg('count')",
    "rolling_min": "rolling_agg('min')", "rolling_max": "rolling_agg('max')",
    "rolling_std": "rolling_agg('std')", "rolling_var": "rolling_agg('var')",
    "rolling_median": "rolling_agg('median')", "rolling_quantile": "rolling_quantile",
    "rolling_shift": "shift", "rolling_diff": "diff",
    "ema_decay": "operators.ema.ema_decay", "ema_normal": "operators.ema.ema_normal",
    "ema_weighted": "operators.ema.ema_weighted",
    "cumsum": "cumsum", "cumprod": "cumprod", "cummin": "cummin", "cummax": "cummax",
}

TIMEWINDOW_FUNCTIONS = {
    "timewindow_sum": "timewindow_sum",
    "timewindow_prod": "timewindow_prod",
}


def funnel_times(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    within_seconds: float | None = None,
) -> DataFrame:
    """Funnel analysis: per user, the earliest time each ordered step
    completes — step k counts only if it happens strictly AFTER step
    k-1 (and, with ``within_seconds``, within that budget of step 1).
    Returns (user, t_step0 … t_step{k-1}) with NULLs from the first
    uncompleted step onward.

    Physical shape: k conditional min-aggregates over the SAME user
    key — AQE reuses one exchange; each phase's result is
    broadcast-joined back (per-user rows ≪ events). No window sort, no
    per-user event materialization — at 100 TB the events relation is
    scanned k times map-side (or once if the caller caches) and only
    (user, timestamp) pairs move."""
    u, t, et = F.col(user_col), F.col(ts_col), F.col(type_col)
    out = None
    for i, step in enumerate(steps):
        if i == 0:
            cond = F.when(et == step, t)
            phase = df.groupBy(user_col).agg(F.min(cond).alias("t_step0"))
            out = phase
            continue
        prev = F.col(f"t_step{i - 1}")
        joined = df.join(F.broadcast(out), on=user_col)
        cond = (et == step) & prev.isNotNull() & (t > prev)
        if within_seconds is not None:
            cond = cond & (t <= F.col("t_step0") + F.expr(f"INTERVAL {within_seconds} SECONDS"))
        phase = joined.groupBy(user_col).agg(F.min(F.when(cond, t)).alias(f"t_step{i}"))
        out = out.join(phase, on=user_col, how="left")
    return out


def rolling_cov(x: Column, y: Column, w: WindowSpec, window: int) -> Column:
    """Rolling sample covariance over the trailing ``window`` rows —
    native window aggregate (whole-stage codegen)."""
    return F.covar_samp(x, y).over(w.rowsBetween(-(window - 1), 0))


def rolling_corr(x: Column, y: Column, w: WindowSpec, window: int) -> Column:
    """Rolling Pearson correlation over the trailing ``window`` rows."""
    return F.corr(x, y).over(w.rowsBetween(-(window - 1), 0))


def rolling_beta(x: Column, y: Column, w: WindowSpec, window: int) -> Column:
    """Rolling regression slope of y on x (beta = cov(x,y)/var(x)) —
    the pairwise analogue of the lm family over a trailing window."""
    win = w.rowsBetween(-(window - 1), 0)
    return F.covar_samp(x, y).over(win) / F.var_samp(x).over(win)


def _power_sums(x: Column, win, upto: int) -> list[Column]:
    """Exact rolling power sums Σx..Σx⁴ for integer-scaled x: x² and x³
    stay BIGINT (an int-scaled 2dp value up to ~2e5 cubes to ~8e15,
    inside int64), but x⁴ reaches ~1.6e21, so the cube widens to
    DECIMAL(38,0) before the last multiply — exact integer arithmetic,
    no ANSI overflow.  Every sum is cast to DOUBLE at the end so the
    downstream moment algebra sees the same IEEE operands an oracle
    computing in HUGEINT-then-DOUBLE sees (an exact integer < 2³⁸
    digits rounds to the same double in every engine)."""
    sums = [F.sum(x).over(win).cast("double")]
    if upto >= 2:
        sums.append(F.sum(x * x).over(win).cast("double"))
    if upto >= 3:
        sums.append(F.sum(x * x * x).over(win).cast("double"))
    if upto >= 4:
        sums.append(F.sum((x * x * x).cast("decimal(38,0)") * x).over(win).cast("double"))
    return sums


def rolling_skew(x: Column, w: WindowSpec, window: int) -> Column:
    """Rolling sample skewness (Fisher-Pearson g1 with the n-based
    bias adjustment pandas/scipy use) over the trailing ``window``
    rows, composed from raw power sums so the whole thing is one
    window pass of codegen sum/count aggregates — no second
    centered-moment scan.  m2/m3 are the central moments expanded in
    terms of Σx, Σx², Σx³; callers that need cross-engine-exact
    comparisons should feed integer-scaled x (see q178's discipline)."""
    win = w.rowsBetween(-(window - 1), 0)
    n = F.count(x).over(win).cast("double")
    s1, s2, s3 = _power_sums(x, win, 3)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu
    g1 = m3 / F.pow(m2, 1.5)
    return F.when((n >= 3) & (m2 > 0), F.sqrt(n * (n - 1)) / (n - 2) * g1)


def rolling_kurt(x: Column, w: WindowSpec, window: int) -> Column:
    """Rolling excess kurtosis (pandas' unbiased G2) over the trailing
    ``window`` rows — same one-pass power-sum composition as
    rolling_skew."""
    win = w.rowsBetween(-(window - 1), 0)
    n = F.count(x).over(win).cast("double")
    s1, s2, s3, s4 = _power_sums(x, win, 4)
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m4 = (
        s4 / n
        - 4 * mu * s3 / n
        + 6 * mu * mu * s2 / n
        - 3 * mu * mu * mu * mu
    )
    g2 = m4 / (m2 * m2)
    return F.when(
        (n >= 4) & (m2 > 0),
        ((n + 1) * g2 - 3 * (n - 1)) * (n - 1) / ((n - 2) * (n - 3)),
    )


def acf(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    value_col: str,
    lags: int = 5,
) -> DataFrame:
    """Per-key autocorrelation function: Pearson correlation between the
    series and its lag-ℓ shift for ℓ = 1..``lags``, from EXACT pairwise
    power sums (Σx, Σy, Σxy, Σx², Σy², n over the aligned pairs) so
    feeding integer-scaled values makes the result engine-portable to
    the last double op.  One sort-shuffle on the key computes every lag
    column (same window frame family), then the per-(key, lag) sums
    stack into a single aggregation — no per-lag rescans.  Returns
    (key, lag, n_pairs, acf)."""
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key_col).orderBy(*order)
    x = F.col(value_col)
    lag_cols = [F.lag(x, i).over(w).alias(f"__lag{i}__") for i in range(1, lags + 1)]
    base = df.select(key_col, x.alias("__x__"), *lag_cols)
    stacked = base.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("lag"),
                    F.col("__x__").alias("x"),
                    F.col(f"__lag{i}__").alias("y"),
                )
                for i in range(1, lags + 1)
            ])
        ).alias("p"),
    ).select(key_col, "p.lag", "p.x", "p.y").where(F.col("y").isNotNull())
    xs, ys = F.col("x"), F.col("y")
    agg = stacked.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xs).cast("double").alias("sx"),
        F.sum(ys).cast("double").alias("sy"),
        F.sum(xs * ys).cast("double").alias("sxy"),
        F.sum(xs * xs).cast("double").alias("sxx"),
        F.sum(ys * ys).cast("double").alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    num = F.col("sxy") - F.col("sx") * F.col("sy") / n
    dx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    dy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return agg.select(
        key_col,
        "lag",
        "n_pairs",
        F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)).alias("acf"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key ordered event
    sequences: count every (state → next state) adjacency and its
    row-conditional probability p = c(from, to)/Σ_to c(from, ·).
    One sort-shuffle on the key computes the lag; the (from, to) counts
    are a tiny aggregate; probabilities are exact integer ratios.
    Returns (from_state, to_state, n, p)."""
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(state_col)).over(w)
    pairs = (
        df.select(F.col(state_col).alias("to_state"), prev.alias("from_state"))
        .where(F.col("from_state").isNotNull() & F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_state").agg(F.sum("n").alias("__t__"))
    return (
        pairs.join(F.broadcast(tot), on="from_state")
        .select(
            "from_state", "to_state", "n",
            (F.col("n").cast("double") / F.col("__t__").cast("double")).alias("p"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    value_col: str,
) -> DataFrame:
    """Per-key CUSUM change-point scan: running sum of deviations from
    the key's own mean; the change-point estimate is the position where
    |CUSUM| peaks (the classic offline single-change locator), reported
    with the peak magnitude.  Deterministic cross-engine: integer-scaled
    values make the per-key mean an exact-integer ratio, the prefix sum
    evaluates in one defined order, and the argmax tie-breaks on
    position.  One key shuffle for the mean (broadcast back) + one
    sort-window pass.  Returns (key, n, max_abs_cusum, cp_pos)."""
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    x = F.col(value_col)
    mean = df.groupBy(key_col).agg(
        (F.sum(x).cast("double") / F.count(x).cast("double")).alias("__mu__")
    )
    j = df.join(F.broadcast(mean), on=key_col)
    w = Window.partitionBy(key_col).orderBy(*order)
    # CUSUM_k = Σ_{i≤k} x_i − k·μ, NOT a running sum of (x−μ) doubles:
    # for integer x the prefix sum stays EXACT (engines disagree on the
    # accumulation order of float window sums — segment trees vs linear
    # scans — but integer sums are order-free), and the single k·μ
    # product is deterministic
    pos = F.row_number().over(w)
    s = F.sum(x).over(w.rowsBetween(Window.unboundedPreceding, 0))
    cusum = s.cast("double") - pos * F.col("__mu__")
    scored = j.select(
        F.col(key_col), pos.alias("__pos__"), F.abs(cusum).alias("__ac__")
    )
    pick = Window.partitionBy(key_col).orderBy(F.col("__ac__").desc(), F.col("__pos__"))
    return (
        scored.withColumn("__rn__", F.row_number().over(pick))
        .withColumn("__n__", F.count(F.lit(1)).over(Window.partitionBy(key_col)))
        .where(F.col("__rn__") == 1)
        .select(
            F.col(key_col), F.col("__n__").alias("n"),
            F.col("__ac__").alias("max_abs_cusum"), F.col("__pos__").alias("cp_pos"),
        )
    )


def attribute_last_touch(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    type_col: str,
    touch_types: list[str],
    conversion_types: list[str],
    id_col: str = "event_id",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event is
    credited to the most recent PRECEDING touch event in its key's
    timeline (NULL when no touch came before).  Implemented as a running
    MAX of the touch position over rows-before-current — an
    order-free integer window aggregate (no IGNORE-NULLS last_value,
    which engines implement inconsistently) — then one self-join by
    (key, position) to recover the touch row's id/type.  One
    sort-shuffle + one broadcast-size join of the touch slice.
    Returns (conversion id, key, touch id, touch type)."""
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key_col).orderBy(*order)
    pos = F.row_number().over(w)
    is_touch = F.col(type_col).isin(touch_types)
    base = df.withColumn("__pos__", pos)
    marked = base.withColumn(
        "__tpos__",
        F.max(F.when(is_touch, F.col("__pos__"))).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    conv = marked.where(F.col(type_col).isin(conversion_types)).select(
        F.col(id_col).alias("conversion_id"), F.col(key_col), F.col("__tpos__")
    )
    touches = base.where(is_touch).select(
        F.col(key_col), F.col("__pos__").alias("__tpos__"),
        F.col(id_col).alias("touch_id"), F.col(type_col).alias("touch_type"),
    )
    return conv.join(touches, on=[key_col, "__tpos__"], how="left").select(
        "conversion_id", key_col, "touch_id", "touch_type"
    )


def fill_time_gaps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    id_col: str | None = None,
) -> DataFrame:
    """Gap-filled regular time grid per key: bucket observations to
    ``step_seconds``, generate the DENSE bucket range between each key's
    first and last observation (sequence-explode — no calendar table),
    left-join the per-bucket last observation and carry it forward
    through the empty buckets.  The series-densification step every
    downstream rolling/EMA/resample assumes.

    Scale shape: one (key, bucket) aggregation, a per-key 2-value range
    aggregate whose exploded grid is |buckets| rows (bounded by time
    span / step, independent of row count), and one ordered window for
    the carry.  Returns (key, bucket_ts, value, was_gap)."""
    step_us = int(step_seconds) * 1_000_000
    b = F.floor(F.unix_micros(F.col(ts_col)) / step_us)
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    obs = df.groupBy(F.col(key_col), b.alias("__b__")).agg(
        F.max_by(F.col(value_col), F.struct(*order)).alias("__v__")
    )
    rng = df.groupBy(key_col).agg(
        F.min(b).alias("__lo__"), F.max(b).alias("__hi__")
    )
    grid = rng.select(
        key_col, F.explode(F.sequence("__lo__", "__hi__")).alias("__b__")
    )
    g = grid.join(obs, on=[key_col, "__b__"], how="left")
    w = Window.partitionBy(key_col).orderBy("__b__")
    filled = F.last(F.col("__v__"), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        F.col(key_col),
        F.timestamp_micros(F.col("__b__") * step_us).alias("bucket_ts"),
        filled.alias(value_col),
        F.col("__v__").isNull().alias("was_gap"),
    )


def xcorr(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    x_col: str,
    y_col: str,
    lags: int = 5,
) -> DataFrame:
    """Per-key cross-correlation function: Pearson corr between x_t and
    y_{t+ℓ} for ℓ = 0..``lags`` — the lead-lag diagnostic ("does x move
    before y?").  Same machinery as ``acf``: every lead column comes
    from ONE sort window, pairs stack via a single explode, and the
    per-(key, lag) Pearson composes from exact power sums — feed
    integer series (counts, cents) and the result is engine-portable
    to the last double op.  Returns (key, lag, n_pairs, xcorr)."""
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key_col).orderBy(*order)
    x, y = F.col(x_col), F.col(y_col)
    lead_cols = [F.lead(y, i).over(w).alias(f"__lead{i}__") for i in range(0, lags + 1)]
    base = df.select(key_col, x.alias("__x__"), *lead_cols)
    stacked = base.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("lag"),
                    F.col("__x__").alias("x"),
                    F.col(f"__lead{i}__").alias("y"),
                )
                for i in range(0, lags + 1)
            ])
        ).alias("p"),
    ).select(key_col, "p.lag", "p.x", "p.y").where(F.col("y").isNotNull() & F.col("x").isNotNull())
    xs, ys = F.col("x"), F.col("y")
    agg = stacked.groupBy(key_col, "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xs).cast("double").alias("sx"),
        F.sum(ys).cast("double").alias("sy"),
        F.sum(xs * ys).cast("double").alias("sxy"),
        F.sum(xs * xs).cast("double").alias("sxx"),
        F.sum(ys * ys).cast("double").alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    num = F.col("sxy") - F.col("sx") * F.col("sy") / n
    dx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    dy = F.col("syy") - F.col("sy") * F.col("sy") / n
    return agg.select(
        key_col,
        "lag",
        "n_pairs",
        F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)).alias("xcorr"),
    )


def attribute_u_shaped(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    type_col: str,
    touch_types: list[str],
    conversion_types: list[str],
    id_col: str = "event_id",
) -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution:
    every touch is assigned to the NEXT conversion in its key's
    timeline (journeys partition the timeline — linear, never the
    quadratic conversions×touches join), then credited 40% for first,
    40% for last, and an equal split of 20% across middles (100% /
    50-50 for 1- and 2-touch journeys).

    The next-conversion assignment is a running MIN over the rows-to-
    end frame (min skips NULLs natively — no IGNORE NULLS, whose frame
    semantics engines disagree on).  Credits are emitted PER TOUCH ROW
    (deterministic int arithmetic + one division); no cross-row float
    sum is baked in, so callers aggregate however they need.  Returns
    (key, conversion_id, touch_id, channel, position, n_touches,
    credit_bp)."""
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key_col).orderBy(*order)
    pos = F.row_number().over(w)
    is_conv = F.col("__type__").isin(conversion_types)
    is_touch = F.col("__type__").isin(touch_types)
    base = df.select(
        F.col(key_col),
        F.col(id_col).alias("__id__"),
        F.col(type_col).alias("__type__"),
        *[F.col(c) for c in order],
    ).withColumn("__pos__", pos).withColumn(
        "__convpos__", F.when(is_conv, F.col("__pos__"))
    ).withColumn("__istouch__", is_touch)
    wfwd = Window.partitionBy(key_col).orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
    assigned = base.withColumn("__next_conv__", F.min("__convpos__").over(wfwd))
    touches = assigned.where(F.col("__istouch__") & F.col("__next_conv__").isNotNull())
    wj = Window.partitionBy(key_col, "__next_conv__").orderBy("__pos__")
    wjall = Window.partitionBy(key_col, "__next_conv__")
    ranked = touches.withColumn("__i__", F.row_number().over(wj)).withColumn(
        "__n__", F.count(F.lit(1)).over(wjall)
    )
    convs = assigned.where(F.col("__convpos__").isNotNull()).select(
        F.col(key_col), F.col("__pos__").alias("__next_conv__"), F.col("__id__").alias("conversion_id")
    )
    n, i = F.col("__n__"), F.col("__i__")
    credit = (
        F.when(n == 1, F.lit(10000.0))
        .when(n == 2, F.lit(5000.0))
        .when((i == 1) | (i == n), F.lit(4000.0))
        .otherwise(F.lit(2000.0) / (n - 2))
    )
    return ranked.join(convs, on=[key_col, "__next_conv__"]).select(
        F.col(key_col),
        "conversion_id",
        F.col("__id__").alias("touch_id"),
        F.col("__type__").alias("channel"),
        i.alias("position"),
        n.alias("n_touches"),
        credit.alias("credit_bp"),
    )


def rolling_corr_exact(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    x_col: str,
    y_col: str,
    n: int = 20,
    x_scale: int = 1,
    y_scale: int = 1,
) -> DataFrame:
    """Rolling Pearson correlation between two columns over the trailing
    ``n`` rows (rolling beta's building block), full-window only — the
    first n−1 rows are NULL per the reference's rolling convention.
    The Column-form ``rolling_corr``/``rolling_cov``/``rolling_beta``
    above are the native float aggregates; THIS form integer-scales so
    a cross-engine oracle replays it bit-for-bit.

    All six rolling power sums are exact integers (safe under
    segment-tree window association); the per-row correlation applies
    int64→double conversion, ·, /, sqrt — engine-identical.  One
    per-key sort window computes every sum.
    """
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key_col).orderBy(*order).rowsBetween(-(n - 1), 0)
    xs = F.round(F.col(x_col) * x_scale).cast("bigint")
    ys = F.round(F.col(y_col) * y_scale).cast("bigint")
    cnt = F.count(F.lit(1)).over(w)
    sx = F.sum(xs).over(w)
    sy = F.sum(ys).over(w)
    sxy = F.sum(xs * ys).over(w)
    sxx = F.sum(xs * xs).over(w)
    syy = F.sum(ys * ys).over(w)
    num = F.lit(n) * sxy - sx * sy
    dx = F.lit(n) * sxx - sx * sx
    dy = F.lit(n) * syy - sy * sy
    corr = F.when((cnt == n) & (dx > 0) & (dy > 0), num / (F.sqrt(dx) * F.sqrt(dy)))
    return df.select(key_col, *order, F.col(x_col), F.col(y_col), corr.alias("rolling_corr"))


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Union-of-intervals per key: merge overlapping/touching [start,
    end) intervals into islands and report total covered length, island
    count, and gap count — uptime/coverage/SLA math over integer
    timelines.

    Gaps-and-islands: an interval starts a new island iff its start
    exceeds the running MAX of all previous ends (exclusive frame);
    the island id is the running sum of those flags.  Two frames over
    ONE (key)-ordered window family + two aggs on the same key — all
    integers, engine-exact.
    """
    w = Window.partitionBy(key_col).orderBy(start_col, end_col, id_col)
    prev_max_end = F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1).otherwise(0)
    seg = df.withColumn("__isl__", F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    islands = seg.groupBy(key_col, "__isl__").agg(
        (F.max(end_col) - F.min(start_col)).alias("__len__")
    )
    return islands.groupBy(key_col).agg(
        F.sum("__len__").cast("bigint").alias("covered"),
        F.count(F.lit(1)).alias("n_islands"),
        (F.count(F.lit(1)) - 1).cast("bigint").alias("n_gaps"),
    )


def session_paths(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
    gap_minutes: int = 30,
    top: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Top session paths: sessionize by inactivity gap (gaps-and-islands
    on the per-key timeline), render each session as its ordered
    event-type string, and count path frequencies — "what do journeys
    look like" analytics.

    Ordering inside the aggregated array is made deterministic by
    sorting (position, type) structs — collect_list alone has NO order
    guarantee under partial aggregation (the classic silent
    nondeterminism).  Counts are exact; the top-k is
    (count desc, path) tiebroken.  One key-sorted window + one
    (key, session) agg + one path count.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - prev > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    seg = df.withColumn("__sess__", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    pos = F.row_number().over(Window.partitionBy(key_col, "__sess__").orderBy(ts_col, id_col))
    rows = seg.withColumn("__pos__", pos)
    per_sess = rows.groupBy(key_col, "__sess__").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("__pos__"), F.col(type_col).alias("t")))),
                lambda s: s["t"],
            ),
        ).alias("path")
    )
    counts = per_sess.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions")).where(
        F.col("n_sessions") >= min_count
    )
    return counts.orderBy(F.col("n_sessions").desc(), F.col("path")).limit(top)


def transition_dwell(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    type_col: str,
) -> DataFrame:
    """Mean dwell time per transition (from-type → to-type): the timing
    companion of ``transition_matrix`` — how long journeys sit between
    steps.  One per-key lag + one (from, to) agg; dwell is integer
    microseconds, the mean a single division."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev_t = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    prev_type = F.lag(F.col(type_col)).over(w)
    steps = df.select(
        prev_type.alias("from_type"),
        F.col(type_col).alias("to_type"),
        (F.unix_micros(F.col(ts_col)) - prev_t).alias("__dw__"),
    ).where(F.col("from_type").isNotNull())
    return steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__dw__").cast("bigint").alias("total_micros"),
        (F.sum("__dw__") / F.count(F.lit(1))).alias("mean_micros"),
    )


def max_concurrency(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Peak concurrent intervals per key (max sessions open at once,
    peak load): the classic sweep line — explode each [start, end) to
    (+1 at start, −1 at end), order by (time, delta) so closings at t
    process before openings at t (half-open semantics), running-sum,
    take the max.  The max is tie-safe within equal (time, delta)
    blocks (prefix extremum lands at a block edge).  Integers end to
    end; one sorted window per key."""
    pts = df.select(
        F.col(key_col),
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("d")),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("p"),
    ).select(key_col, "p.t", "p.d")
    w = Window.partitionBy(key_col).orderBy("t", "d").rowsBetween(Window.unboundedPreceding, 0)
    running = pts.withColumn("__c__", F.sum("d").over(w))
    return running.groupBy(key_col).agg(F.max("__c__").cast("bigint").alias("max_concurrent"))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_minutes: int = 30,
    value_col: str | None = None,
    conversion: Column | None = None,
) -> DataFrame:
    """First-class sessionization: the per-SESSION summary table
    (session id, start/end, duration, event count, optional value sum
    and conversion flag) — the relation session analytics actually
    joins against, complementing ``session_paths`` (journeys) and the
    streaming session windows.

    Inactivity-gap islands over one key-sorted window, then one
    (key, session) aggregation.  Duration is exact integer µs; the
    session id is the island ordinal (1-based, per key, time-ordered —
    rerun-stable).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_sess = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts_col)) - prev > gap_minutes * 60_000_000), 1
    ).otherwise(0)
    seg = df.withColumn(
        "session_id", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.unix_micros(F.col(ts_col))) - F.min(F.unix_micros(F.col(ts_col)))).alias("duration_micros"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("bigint")).cast("bigint").alias("value_cents")
        )
    if conversion is not None:
        aggs.append(F.max(conversion.cast("int")).cast("boolean").alias("converted"))
    return seg.groupBy(key_col, "session_id").agg(*aggs)


def running_distinct(
    df: DataFrame,
    keys: list[str],
    valcol: str,
    order: list[str],
    out_col: str = "running_distinct",
) -> DataFrame:
    """Running COUNT(DISTINCT) per key in event order — the window
    Spark (and ANSI SQL) cannot express directly.

    Scale-correct decomposition instead of a growing collect_set state:
    (1) first-occurrence flag = row_number over (key, value) == 1, then
    (2) running SUM of flags over (key) — two sort windows, both
    whole-stage codegen, state O(1) per row.  NULL values never count
    (SQL COUNT DISTINCT semantics).
    """
    w1 = Window.partitionBy(*keys, valcol).orderBy(*[F.col(c) for c in order])
    w2 = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flag = F.when(
        F.col(valcol).isNotNull() & (F.row_number().over(w1) == 1), 1
    ).otherwise(0)
    return df.withColumn("__fo__", flag).withColumn(
        out_col, F.sum("__fo__").over(w2).cast("long")
    ).drop("__fo__")


def burst_detect(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    bucket_seconds: int = 86400,
    trailing: int = 7,
    num: int = 2,
    den: int = 1,
    min_history: int | None = None,
) -> DataFrame:
    """Burst detection per key: bucket the event stream, compare each
    bucket's count to the trailing-window average, and flag buckets
    whose rate exceeds num/den times that baseline:

        burst ⟺ n_t · trailing · den > num · Σ_{t-trailing ≤ s < t} n_s

    — the cross-multiplied integer form, so the threshold test is exact
    (no float rate ever materializes).  The trailing sum is a RANGE
    frame over the bucket INDEX, so calendar gaps (empty buckets) count
    as zero instead of silently shrinking the window.  Buckets with
    fewer than ``min_history`` non-empty trailing buckets (default: the
    full window) report burst = false — partial history makes the
    baseline spuriously small and would flag the warm-up period.

    Scale shape: one (key, bucket) pre-aggregation shrinks the stream
    to bucket counts BEFORE the window, so the per-key sort is over
    buckets, not raw events.  Returns
    (keys..., bucket_start, n, trailing_n, burst).
    """
    b = F.floor(F.unix_seconds(F.col(time_col)) / F.lit(bucket_seconds)).cast("long")
    counts = df.groupBy(*keys, b.alias("__bkt__")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__bkt__")
        .rangeBetween(-trailing, -1)
    )
    need = trailing if min_history is None else min_history
    work = counts.withColumn("trailing_n", F.sum("n").over(w)).withColumn(
        "hist_buckets", F.count("n").over(w)
    )
    return work.select(
        *keys,
        # epoch seconds, not a timestamp: tz-aware/naive disagreement
        # between engines makes timestamps hash-hostile
        (F.col("__bkt__") * bucket_seconds).cast("long").alias("bucket_start"),
        "n",
        "trailing_n",
        F.when(
            F.col("trailing_n").isNotNull() & (F.col("hist_buckets") >= need),
            F.col("n") * trailing * den > num * F.col("trailing_n"),
        ).otherwise(F.lit(False)).alias("burst"),
    )


def c_chart(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    bucket_seconds: int = 86400,
    sigmas: int = 3,
) -> DataFrame:
    """Poisson c-chart (statistical process control for event counts):
    bucket the stream, estimate the per-key baseline rate μ = T/B over
    ALL buckets in the key's observed span (calendar gaps count as
    zero-count buckets — they shrink μ, not the denominator), and flag
    buckets outside μ ± k·√μ.

    The control test never builds a float limit: with T = total events
    and B = span buckets,

        |c − μ| > k·√μ  ⟺  (c·B − T)² > k²·T·B

    — exact BIGINT cross-multiplication on both sides, so flags are
    engine-identical and a count can never sit ON the limit.  One
    bucket agg + one per-key baseline agg broadcast back.  Returns
    (keys…, bucket_start, n, total, span_buckets, out_high, out_low).
    """
    b = F.floor(F.unix_seconds(F.col(time_col)) / F.lit(bucket_seconds)).cast("long")
    counts = df.groupBy(*keys, b.alias("__bkt__")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    base = counts.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("total"),
        (F.max("__bkt__") - F.min("__bkt__") + 1).cast("long").alias("span_buckets"),
    )
    jn = counts.join(F.broadcast(base), on=keys)
    k2 = int(sigmas) * int(sigmas)
    dev = F.col("n") * F.col("span_buckets") - F.col("total")
    thresh = F.lit(k2) * F.col("total") * F.col("span_buckets")
    return jn.select(
        *keys,
        (F.col("__bkt__") * bucket_seconds).cast("long").alias("bucket_start"),
        "n", "total", "span_buckets",
        ((dev > 0) & (dev * dev > thresh)).alias("out_high"),
        ((dev < 0) & (dev * dev > thresh)).alias("out_low"),
    )


def p_chart(
    df: DataFrame,
    keys: list[str],
    subgroup_col,
    defect_col,
    sigmas: int = 3,
) -> DataFrame:
    """Proportion p-chart (SPC for defect RATES with varying subgroup
    sizes): per (keys, subgroup) count trials n and defects x, pool the
    baseline rate p̄ = X/N per key, and flag subgroups outside
    p̄ ± k·√(p̄(1−p̄)/n).

    Like c_chart, the control test never builds a float limit:

        (x/n − X/N)² > k²·(X/N)(1−X/N)/n  ⟺  (x·N − n·X)² > k²·n·X·(N−X)

    with the square taken in DECIMAL(38,0) (x·N can pass 2^31.5 so its
    square breaks int64 — the q200 widening rule), so flags are
    engine-identical and a rate can never sit ON the limit.  One
    subgroup agg + one per-key baseline agg broadcast back.  Returns
    (keys…, subgroup, n, x, total_n, total_x, p_hat, p_bar,
    out_high, out_low).
    """
    sub = F.col(subgroup_col) if isinstance(subgroup_col, str) else subgroup_col
    d = F.col(defect_col) if isinstance(defect_col, str) else defect_col
    counts = df.groupBy(*keys, sub.alias("subgroup")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d.cast("long")).cast("long").alias("x"),
    )
    base = counts.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("total_n"),
        F.sum("x").cast("long").alias("total_x"),
    )
    jn = counts.join(F.broadcast(base), on=keys)
    k2 = int(sigmas) * int(sigmas)
    dev = (F.col("x") * F.col("total_n") - F.col("n") * F.col("total_x")).cast("decimal(38,0)")
    thresh = (
        F.lit(k2) * F.col("n") * F.col("total_x") * (F.col("total_n") - F.col("total_x"))
    ).cast("decimal(38,0)")
    return jn.select(
        *keys,
        "subgroup", "n", "x", "total_n", "total_x",
        (F.col("x") / F.col("n")).alias("p_hat"),
        (F.col("total_x") / F.col("total_n")).alias("p_bar"),
        ((dev > 0) & (dev * dev > thresh)).alias("out_high"),
        ((dev < 0) & (dev * dev > thresh)).alias("out_low"),
    )


def attribute_time_decay(
    df: DataFrame,
    user_col: str,
    time_col: str,
    is_touch_col: str,
    is_conversion_col: str,
    half_life_days: int = 7,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Time-decay multi-touch attribution with DYADIC decay: a touch
    ``k`` half-lives before the conversion earns raw weight 2^−k — and
    because the decay base is 2, every weight is an EXACT power of two:
    scaling by 2^K (K = the deepest half-life bucket) turns the whole
    credit computation into integer arithmetic.  credit = w/Σw is then
    one divide of exact BIGINTs — no exp(), no float decay anywhere
    (the engine-portable twist on the classic e^−λt rule).

    Touches attribute to the NEXT conversion (running-min of conversion
    time over the reversed frame — the attribute_u_shaped discipline,
    no IGNORE NULLS).  Buckets deeper than 62 half-lives clamp (their
    weight is 0 at int64 scale anyway).  Returns per touch:
    (user, touch order col(s), age_buckets, weight_scaled, total_scaled,
    credit).
    """
    order = [time_col] + ([order_tiebreak] if order_tiebreak else [])
    t = F.unix_micros(F.col(time_col))
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order])
    wfwd = w.rowsBetween(0, Window.unboundedFollowing)
    conv_t = F.when(F.col(is_conversion_col).cast("int") == 1, t)
    next_conv = F.min(conv_t).over(wfwd)
    touches = df.withColumn("__ct__", next_conv).where(
        (F.col(is_touch_col).cast("int") == 1) & F.col("__ct__").isNotNull()
    )
    hl_us = int(half_life_days) * 86_400_000_000
    bucket = F.least(F.floor((F.col("__ct__") - t) / F.lit(hl_us)).cast("long"), F.lit(62))
    touches = touches.withColumn("__b__", bucket)
    kmax = Window.partitionBy(user_col, "__ct__")
    touches = touches.withColumn("__k__", F.max("__b__").over(kmax))
    # weight_scaled = 2^(K − b): an exact integer (dynamic shift amount —
    # F.shiftleft only takes literal counts, the build_bloom discipline)
    touches = touches.withColumn(
        "weight_scaled",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__k__ - __b__ AS INT))"),
    )
    tot = Window.partitionBy(user_col, "__ct__")
    touches = touches.withColumn(
        "total_scaled", F.sum("weight_scaled").over(tot).cast("long")
    )
    return touches.select(
        F.col(user_col), *[F.col(c) for c in order],
        F.col("__ct__").alias("conversion_us"),
        F.col("__b__").alias("age_buckets"),
        "weight_scaled", "total_scaled",
        (F.col("weight_scaled") / F.col("total_scaled")).alias("credit"),
    )


def wma(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    val_col: str,
    weights: list[int],
    out_col: str = "wma",
) -> DataFrame:
    """Weighted moving average with INTEGER weights (triangular/linear
    WMA, the technical-analysis staple between SMA and EMA): the window
    is expressed as ``len(weights)`` explicit lag terms added in fixed
    order, so the weighted sum is an exact BIGINT and the average one
    divide — no rolling float sum exists (weights[0] applies to the
    current row, weights[i] to lag i).  Rows without a full window
    yield NULL (the reference rolling convention).  One per-key sort
    window.
    """
    x = F.col(val_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    num = None
    for i, wt in enumerate(weights):
        term = F.lit(int(wt)) * (x if i == 0 else F.lag(x, i).over(w))
        num = term if num is None else num + term
    den = sum(int(wt) for wt in weights)
    full = F.lag(x, len(weights) - 1).over(w).isNotNull()
    return df.withColumn(out_col, F.when(full, num / F.lit(den)))


def durbin_watson(
    df: DataFrame,
    keys: list[str],
    value_scaled_col: str,
    order: list[str],
) -> DataFrame:
    """Durbin–Watson autocorrelation statistic per key over an
    integer-scaled ordered series:

        DW = Σ(x_t − x_{t−1})² / Σ(x − x̄)²  =  n·Σ(Δx)² / (n·Q − S²)

    Both numerator and denominator are exact BIGINTs (Δx via one lag
    window, moments in the same pass), so the statistic is ONE divide —
    engine-identical, DW∈[0,4], ≈2 for white noise.  One per-key sort
    window + one hash agg.  Returns (keys…, n, sum_sq_diff, dw).
    """
    x = F.col(value_scaled_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(*order)
    d = x - F.lag(x).over(w)
    work = df.select(*keys, x.alias("__x__"), d.alias("__d__"))
    agg = work.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__x__").cast("long").alias("__s__"),
        F.sum(F.col("__x__") * F.col("__x__")).cast("long").alias("__q__"),
        F.sum(F.col("__d__") * F.col("__d__")).cast("long").alias("sum_sq_diff"),
    )
    n, s, q = F.col("n"), F.col("__s__"), F.col("__q__")
    return agg.select(
        *keys, "n", "sum_sq_diff",
        F.when(n * q - s * s > 0, (n * F.col("sum_sq_diff")) / (n * q - s * s)).alias("dw"),
    )


def runs_test(
    df: DataFrame,
    keys: list[str],
    value_scaled_col: str,
    order: list[str],
) -> DataFrame:
    """Wald–Wolfowitz runs test about the mean per key: classify each
    row strictly above (+) or below (−) the key mean (ties drop), count
    sign runs R, and form z = (R − E[R])/√Var(R) with
    E = 1 + 2·n₁n₂/n and Var = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)).

    The classification x·n > S is an exact integer cross-product (a
    value can never sit ON the mean boundary), R and n₁/n₂ are exact
    integers, and z is a fixed float tree over exact operands.  Two
    passes: one moment agg broadcast back, one sign-transition window.
    Returns (keys…, n_signs, n_plus, n_minus, runs, z).
    """
    x = F.col(value_scaled_col).cast("long")
    m = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("__cnt__"),
        F.sum(x).cast("long").alias("__s__"),
    )
    j = df.join(F.broadcast(m), on=keys)
    sgn = F.when(x * F.col("__cnt__") > F.col("__s__"), F.lit(1)).when(
        x * F.col("__cnt__") < F.col("__s__"), F.lit(-1)
    )
    signs = j.select(*keys, *order, sgn.alias("__sgn__")).where(F.col("__sgn__").isNotNull())
    w = Window.partitionBy(*keys).orderBy(*order)
    trans = (F.col("__sgn__") != F.lag("__sgn__").over(w)).cast("long")
    work = signs.select(*keys, "__sgn__", F.coalesce(trans, F.lit(1)).alias("__new__"))
    agg = work.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_signs"),
        F.sum((F.col("__sgn__") == 1).cast("long")).cast("long").alias("n_plus"),
        F.sum((F.col("__sgn__") == -1).cast("long")).cast("long").alias("n_minus"),
        F.sum("__new__").cast("long").alias("runs"),
    )
    n, n1, n2, r = F.col("n_signs"), F.col("n_plus"), F.col("n_minus"), F.col("runs")
    two = F.lit(2) * n1 * n2
    e = F.lit(1.0) + two / n
    v = (two * (two - n)) / (n * n * (n - 1))
    return agg.select(
        *keys, "n_signs", "n_plus", "n_minus", "runs",
        F.when((n >= 2) & (n1 > 0) & (n2 > 0) & (two * (two - n) > 0),
               (r - e) / F.sqrt(v)).alias("z"),
    )


def hampel_filter(
    df: DataFrame,
    keys: list[str],
    value_scaled_col: str,
    order: list[str],
    half_window: int = 5,
    k_scaled: int = 3,
) -> DataFrame:
    """Hampel outlier filter per key: flag rows where
    |x − rolling_median| > k · rolling_MAD over the centered window of
    2·half_window+1 rows (the robust despiking standard).

    With integer-scaled values and an ODD full window, both the median
    and the MAD of the window are computed HORIZONTALLY from ONE
    window collect_list (sorted in-row), doubled to stay exact
    half-integers: the flag compares 2·|x−med| ·… as pure BIGINTs —
    no float boundary.  Rows without a full window are unflagged
    (NULL).  Returns input order cols plus (med2, mad2, is_outlier).
    """
    x = F.col(value_scaled_col).cast("long")
    full = 2 * int(half_window) + 1
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-int(half_window), int(half_window))
    )
    work = df.select(
        *keys, *order, x.alias("__x__"),
        F.collect_list(x).over(w).alias("__wl__"),
    )
    sorted_w = F.array_sort(F.col("__wl__"))
    staged = work.select(
        *keys, *order, "__x__",
        F.size("__wl__").alias("__wn__"),
        sorted_w.alias("__ws__"),
    )
    mid = int(half_window)  # 0-based middle index of the full window
    med2 = (F.element_at(F.col("__ws__"), mid + 1) * 2).cast("long")
    devs = F.transform(
        F.col("__ws__"), lambda v: F.abs(v * 2 - med2)
    )
    staged2 = staged.select(
        *keys, *order, "__x__", "__wn__", med2.alias("med2"),
        F.array_sort(devs).alias("__ds__"),
    )
    mad2 = F.element_at(F.col("__ds__"), mid + 1).cast("long")
    dev_self = F.abs(F.col("__x__") * 2 - F.col("med2"))
    return staged2.select(
        *keys, *order, F.col("__x__").alias(value_scaled_col),
        F.when(F.col("__wn__") == full, F.col("med2")).alias("med2"),
        F.when(F.col("__wn__") == full, mad2).alias("mad2"),
        F.when(
            F.col("__wn__") == full, dev_self > F.lit(int(k_scaled)) * mad2
        ).alias("is_outlier"),
    )


def lindley_waits(
    df: DataFrame,
    keys: list[str],
    arrival_col: str,
    service_col: str,
    order: list[str],
) -> DataFrame:
    """Single-server FIFO queue waiting times (Lindley's recurrence)
    per key: W₁ = 0, W_{i+1} = max(0, W_i + s_i − (a_{i+1} − a_i)).

    The recurrence LOOKS sequential but has the exact closed form

        W_n = max(0, P_{n−1} − min_{0≤j≤n−2} P_j),   P_m = Σ_{i≤m} U_i

    with U_i = s_i − (a_{i+1} − a_i) — so with INTEGER arrival seconds
    and service times it is two exact BIGINT windows (prefix sum +
    shifted running min), no scan operator and no float state (compare
    cusum_changepoint's identity).  Also emits start/departure times.
    One per-key sort window.  Returns order cols plus
    (arrival, service, wait, depart).
    """
    a = F.col(arrival_col).cast("long")
    s = F.col(service_col).cast("long")
    w = Window.partitionBy(*keys).orderBy(*order)
    u_prev = (F.lag(s).over(w) - (a - F.lag(a).over(w))).alias("__u__")
    work = df.select(*keys, *order, a.alias("__a__"), s.alias("__s__"), u_prev)
    wp = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    # P_{i-1} = prefix sum of U up to (and including) this row's __u__
    # (row i carries U_{i-1}); min over P_0..P_{i-2} = shifted running
    # min — staged selects: window-over-window can't nest in one expr
    work2 = work.select(
        *keys, *order, "__a__", "__s__",
        F.coalesce(F.sum("__u__").over(wp), F.lit(0)).cast("long").alias("__p__"),
        F.row_number().over(w2).alias("__rn__"),
    )
    work2b = work2.select(
        *keys, *order, "__a__", "__s__", "__p__", "__rn__",
        F.lag("__p__").over(w2).alias("__lp__"),
    )
    work3 = work2b.select(
        *keys, *order, "__a__", "__s__", "__p__", "__rn__",
        F.coalesce(F.min("__lp__").over(wp), F.lit(0)).cast("long").alias("__m__"),
    )
    work4 = work3
    wait = F.when(F.col("__rn__") == 1, F.lit(0)).otherwise(
        F.greatest(F.lit(0), F.col("__p__") - F.least(F.col("__m__"), F.lit(0)))
    ).cast("long")
    return work4.select(
        *keys, *order,
        F.col("__a__").alias("arrival"),
        F.col("__s__").alias("service"),
        wait.alias("wait"),
        (F.col("__a__") + wait + F.col("__s__")).alias("depart"),
    )


def window_funnel(
    df: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    steps: list[str],
    window_s: int,
) -> DataFrame:
    """ClickHouse-style windowFunnel: per key, the deepest strictly-
    ordered prefix of ``steps`` completable within ``window_s`` seconds
    of SOME step-1 event (every step-1 occurrence anchors its own
    attempt; the key reports its best attempt).

    Everything is µs-integer time logic: step-2 is the min step-2
    timestamp strictly after the anchor and within the window, step-3
    the min after that, etc. — each level is ONE per-key equi-join +
    conditional min-agg (never a range/cartesian join; per-key fanout
    is |anchors|×|step events| within the key only).  Returns
    (key, n_anchors, max_depth).
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = df.select(
        F.col(key_col).alias("__k__"), F.col(type_col).alias("__t__"), us.alias("__us__")
    )
    win_us = int(window_s) * 1_000_000
    anchors = ev.where(F.col("__t__") == steps[0]).select(
        "__k__", F.col("__us__").alias("t1")
    )
    cur = anchors  # carries (key, t1, ..., t_i)
    prev = "t1"
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("__t__") == step).select("__k__", F.col("__us__").alias("__s__"))
        # no pre-group filter: an anchor whose step events are ALL out of
        # range must still survive with a NULL min (left join + the
        # conditional inside the aggregate), or n_anchors undercounts
        joined = cur.join(nxt, "__k__", "left")
        group_cols = ["__k__", "t1"] + [f"t{j}" for j in range(2, i)]
        cur = joined.groupBy(*group_cols).agg(
            F.min(
                F.when(
                    (F.col("__s__") > F.col(prev)) & (F.col("__s__") <= F.col("t1") + win_us),
                    F.col("__s__"),
                )
            ).alias(f"t{i}")
        )
        prev = f"t{i}"
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = F.when(F.col(f"t{i}").isNotNull(), i).otherwise(depth)
    per_anchor = cur.select("__k__", depth.alias("__depth__"))
    return per_anchor.groupBy("__k__").agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.max("__depth__").cast("long").alias("max_depth"),
    ).withColumnRenamed("__k__", key_col)


def page_hinkley(
    df: DataFrame,
    key_col: str,
    order_by: list[str] | str,
    value_col: str,
    delta: int = 0,
    lam: int = 100,
) -> DataFrame:
    """Per-key Page-Hinkley drift detector (offline form, integer
    inputs): with M_t = Σ_{i≤t}(x_i − x̄ − δ), raise an alarm the first
    time M_t − min_{s≤t} M_s exceeds λ — the classic mean-shift
    sequential test, the one-sided sibling of :func:`cusum_changepoint`.

    Exactness: everything is multiplied through by n so the recurrence
    never touches the rational mean — Mn_t = n·cum_t − t·(sx + n·δ) is
    an exact BIGINT prefix expression, its running min is exact, and
    the alarm test Mn_t − min > n·λ cross-multiplies.  One key
    aggregation (n, Σx broadcast back) + one sort-window pass; the
    reported deviations divide by n once at the end.  Returns (key, n,
    first_alarm_pos [NULL if never], max_dev — both in value units)."""
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    x = F.col(value_col).cast("long")
    m = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("__n__"),
        F.sum(x).cast("long").alias("__sx__"),
    )
    j = df.join(F.broadcast(m), on=key_col)
    w = Window.partitionBy(key_col).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    t = F.row_number().over(w).cast("long")
    cum = F.sum(x).over(wrun).cast("long")
    mn = F.col("__n__") * cum - t * (F.col("__sx__") + F.col("__n__") * F.lit(int(delta)))
    d = j.select(
        key_col, F.col("__n__"), t.alias("__t__"), mn.alias("__m__"),
    ).withColumn("__runmin__", F.min("__m__").over(
        Window.partitionBy(key_col).orderBy("__t__")
        .rowsBetween(Window.unboundedPreceding, 0)
    ))
    dev = F.col("__m__") - F.col("__runmin__")
    alarm = dev > F.col("__n__") * F.lit(int(lam))
    return d.groupBy(key_col).agg(
        F.max("__n__").alias("n"),
        F.min(F.when(alarm, F.col("__t__"))).alias("first_alarm_pos"),
        (F.max(dev).cast("double") / F.max("__n__").cast("double")).alias("max_dev"),
    )

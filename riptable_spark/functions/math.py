"""Elementwise scalar function surface (SURVEY §2.8).

Reference catalog: MATH_OPERATION enum /root/reference/riptable/rt_enum.py:
193-284, dispatched via FastArray.__array_ufunc__ (rt_fastarray.py:4676).
Every kernel here maps to a built-in Column expression so it stays inside
whole-stage codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# -- arithmetic (rt_enum.py:202-213) ------------------------------------
add = lambda a, b: a + b
sub = lambda a, b: a - b
mul = lambda a, b: a * b
div = lambda a, b: a / b
floordiv = lambda a, b: F.floor(a / b)
mod = lambda a, b: a % b
power = F.pow


def minimum(a: Column, b: Column) -> Column:
    """Elementwise MIN with numpy NaN propagation (np.minimum(nan, x) is
    nan; rt_numpy.py minimum). Spark's least() would SKIP NaN on the left
    operand (NaN sorts above every double), so guard explicitly. On
    non-float inputs isnan is constant-false and this folds to least()."""
    return F.when(F.isnan(a.try_cast("double")) | F.isnan(b.try_cast("double")), F.lit(float("nan"))).otherwise(
        F.least(a, b)
    )


def maximum(a: Column, b: Column) -> Column:
    """Elementwise MAX, numpy NaN propagation (see minimum)."""
    return F.when(F.isnan(a.try_cast("double")) | F.isnan(b.try_cast("double")), F.lit(float("nan"))).otherwise(
        F.greatest(a, b)
    )


def _fold(masks, op):
    acc = masks[0]
    for m in masks[1:]:
        acc = op(acc, m)
    return acc


def mask_or(*masks: Column) -> Column:
    """OR-fold of boolean masks (rt_numpy.py mask_or). Accepts a single
    list/tuple or varargs, like the reference."""
    if len(masks) == 1 and isinstance(masks[0], (list, tuple)):
        masks = tuple(masks[0])
    return _fold(masks, lambda a, b: a | b)


def mask_and(*masks: Column) -> Column:
    """AND-fold (rt_numpy.py mask_and)."""
    if len(masks) == 1 and isinstance(masks[0], (list, tuple)):
        masks = tuple(masks[0])
    return _fold(masks, lambda a, b: a & b)


def mask_xor(*masks: Column) -> Column:
    """XOR-fold (rt_numpy.py mask_xor)."""
    if len(masks) == 1 and isinstance(masks[0], (list, tuple)):
        masks = tuple(masks[0])
    return _fold(masks, lambda a, b: a != b)


def mask_andnot(*masks: Column) -> Column:
    """ANDNOT-fold: first mask minus the rest (rt_numpy.py mask_andnot,
    BITWISE_ANDNOT left-fold: ((m0 &~ m1) &~ m2)...)."""
    if len(masks) == 1 and isinstance(masks[0], (list, tuple)):
        masks = tuple(masks[0])
    return _fold(masks, lambda a, b: a & ~b)


# In-place variants are identity aliases: Columns are immutable
# expressions; the reference's *i forms exist only to save an allocation
# (rt_numpy.py mask_ori..mask_andnoti), which Tungsten manages for us.
mask_ori = mask_or
mask_andi = mask_and
mask_xori = mask_xor
mask_andnoti = mask_andnot


def _nan2null(c: Column) -> Column:
    # Spark orders NaN ABOVE every double, so greatest() would return NaN
    # over a real value; normalizing NaN→NULL first makes least/greatest
    # skip it (they ignore NULL operands)
    d = c.try_cast("double")
    return F.when(d.isNotNull() & F.isnan(d), F.lit(None)).otherwise(c)


def nanmin2(a: Column, b: Column) -> Column:
    """NANMIN (rt_enum.py): prefer the non-invalid (non-NULL/NaN) operand."""
    an, bn = _nan2null(a), _nan2null(b)
    return F.coalesce(F.least(an, bn), an, bn)


def nanmax2(a: Column, b: Column) -> Column:
    """NANMAX: prefer the non-invalid operand (NaN never wins greatest)."""
    an, bn = _nan2null(a), _nan2null(b)
    return F.coalesce(F.greatest(an, bn), an, bn)


# -- unary (rt_enum.py:222-249) -----------------------------------------
abs_ = F.abs
neg = lambda a: -a
floor = F.floor
ceil = F.ceil
def trunc(a: Column) -> Column:
    return F.when(a >= 0, F.floor(a)).otherwise(F.ceil(a))
round_ = F.round
sign = F.signum
rint = F.rint
exp = F.exp
exp2 = lambda a: F.pow(F.lit(2.0), a)
sqrt = F.sqrt
cbrt = F.cbrt
log = F.log
log2 = F.log2
log10 = F.log10
expm1 = F.expm1
log1p = F.log1p
square = lambda a: a * a
reciprocal = lambda a: F.lit(1.0) / a


# -- predicates (rt_enum.py:273-284) ------------------------------------
def isfinite(col: Column) -> Column:
    return ~F.isnan(col) & ~isinf(col)


def isinf(col: Column) -> Column:
    return (col == F.lit(float("inf"))) | (col == F.lit(float("-inf")))


# Negated predicate aliases (rt_fastarray.py:2773-3144 isnotnan /
# isnotfinite / isnotinf wrappers — named API-parity forms; the
# reference's invalid maps to NULL here, so NULL rows count as
# nan/not-finite and as not-inf, matching sentinel semantics).
def isnan(col: Column) -> Column:
    """NULL-or-NaN (the reference's isnan over sentinel invalids)."""
    d = col.try_cast("double")
    return col.isNull() | F.when(d.isNotNull(), F.isnan(d)).otherwise(F.lit(False))


def isnotnan(col: Column) -> Column:
    return ~isnan(col)


def isnotinf(col: Column) -> Column:
    """True unless ±inf; NULL (invalid) is not inf → True."""
    return ~F.coalesce(isinf(col), F.lit(False))


def isnotfinite(col: Column) -> Column:
    """NaN, ±inf, or NULL (invalid) — the complement of a finite value."""
    return isnan(col) | F.coalesce(isinf(col), F.lit(False))


def isnormal(col: Column) -> Column:
    # normal = finite, nonzero, not subnormal; subnormal threshold for f64
    return isfinite(col) & (col != 0) & (F.abs(col) >= F.lit(2.2250738585072014e-308))


def signbit(col: Column) -> Column:
    return col < 0


# -- bitwise (rt_enum.py:262-271) ---------------------------------------
bitwise_and = lambda a, b: a.bitwiseAND(b)
bitwise_or = lambda a, b: a.bitwiseOR(b)
bitwise_xor = lambda a, b: a.bitwiseXOR(b)
shiftleft = F.shiftleft
shiftright = F.shiftright
bit_count = F.bit_count
invert = F.bitwise_not


# -- clip / rounding helpers (rt_fastarray.py:2472-2477) ----------------
def clip(col: Column, lower=None, upper=None) -> Column:
    out = col
    if lower is not None:
        out = F.greatest(out, F.lit(lower))
    if upper is not None:
        out = F.least(out, F.lit(upper))
    return out


clip_lower = lambda c, lo: F.greatest(c, F.lit(lo))
clip_upper = lambda c, hi: F.least(c, F.lit(hi))

# -- hashes (rt_numpy.py:2489-2514 crc32c/crc64, :5438 bitcount) --------
crc32 = F.crc32
xxhash64 = F.xxhash64  # 64-bit hash analogue of crc64


def interp(x: Column, x0: Column, y0: Column, x1: Column, y1: Column) -> Column:
    """Linear interpolation y = y0 + (x-x0)·(y1-y0)/(x1-x0) given both
    bracketing sample points already aligned on the row (rt_numpy.py:5333
    interp; the alignment itself is an as-of join — see
    operators.window.interp_extrap for the full operator)."""
    return y0 + (x - x0) * (y1 - y0) / (x1 - x0)


def where(cond: Column, x, y) -> Column:
    """rt_numpy.py:2917 np.where analogue."""
    return F.when(cond, x).otherwise(y)


def searchsorted(col: Column, boundaries: list[float], side: str = "right") -> Column:
    """rt_numpy.py:701 searchsorted against a small sorted boundary list:
    insertion index = count of boundaries ≤ x (side='right') or < x
    (side='left'/'leftplus'). riptable's 'leftplus' additionally maps
    values beyond the last boundary to 0 (rt_numpy.py:703,
    BinsToCutsBSearch mode 0). The list is a literal array folded by
    codegen — no join, no shuffle."""
    arr = F.array(*[F.lit(float(b)) for b in sorted(boundaries)])
    pred = (lambda b: b <= col) if side == "right" else (lambda b: b < col)
    idx = F.size(F.filter(arr, pred))
    if side == "leftplus":
        idx = F.when(col > F.lit(float(max(boundaries))), F.lit(0)).otherwise(idx)
    return idx


def searchsorted_against(
    df, value: Column, bounds_df, bound_col: str, side: str = "left", out_col: str = "idx"
):
    """searchsorted where the sorted side is an ARRAY/relation, not a
    literal (rt_numpy.py:701 with array `a`): insertion index of each
    row's ``value`` into the sorted values of ``bounds_df[bound_col]``.

    Plan: the bounds relation collapses to ONE sorted-array row
    (collect_list + array_sort — a single tiny agg) broadcast to every
    partition; the per-row index is a codegen filter-count. Right shape
    while #bounds is dictionary-sized (≤ ~10⁵). For bounds too large to
    broadcast, use the union+running-count rewrite
    (operators.window.searchsorted_union) — one shuffle, no array."""
    from pyspark.sql import functions as _F

    arr_row = bounds_df.agg(
        _F.array_sort(_F.collect_list(_F.col(bound_col).cast("double"))).alias("__bounds__")
    )
    joined = df.crossJoin(_F.broadcast(arr_row))
    a = _F.col("__bounds__")
    v = value.cast("double")
    pred = (lambda b: b <= v) if side == "right" else (lambda b: b < v)
    idx = _F.size(_F.filter(a, pred))
    if side == "leftplus":
        idx = _F.when(v > _F.element_at(a, -1), _F.lit(0)).otherwise(idx)
    return joined.withColumn(out_col, idx).drop("__bounds__")


def sub2ind(sizes: list[int], positions: list[Column]) -> Column:
    """rt_misc.py:62 sub2ind / np.ravel_multi_index (C order): linear
    index from N subscript columns for an array of shape ``sizes`` —
    pure integer codegen (strides are literals)."""
    if len(sizes) != len(positions):
        raise ValueError("sizes and positions must have the same length")
    stride = 1
    strides = []
    for s in reversed(sizes):
        strides.append(stride)
        stride *= s
    strides.reverse()
    out = None
    for st, p in zip(strides, positions):
        term = p.cast("long") * F.lit(st)
        out = term if out is None else out + term
    return out

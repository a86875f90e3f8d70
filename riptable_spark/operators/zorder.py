"""Z-order (Morton) clustering for multi-column data skipping.

A sort on one column makes Parquet min/max stats selective on that
column only; interleaving the bits of several columns' scaled ranks and
range-sorting on the result makes EVERY participating column's per-file
value range narrow, so predicate pushdown on any of them prunes files /
row groups. This is the standard lakehouse layout trick (Delta/Iceberg
``OPTIMIZE ZORDER BY``), here as a plain-Spark implementation: an
arithmetic key expression (pure codegen, SQL-replayable) + one
repartitionByRange write.

At 100 TB: the only extra cost over a plain write is one range exchange
on the z-key (sampled boundaries, AQE-friendly); reads then skip
whole files on any z-dimension predicate instead of scanning the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(col: Column, lo: Column | float, hi: Column | float, bits: int) -> Column:
    """Affine-scale a numeric column into [0, 2^bits) integer cells.
    NULLs map to cell 0 (they cluster together, which is what you want
    for skipping). Degenerate ranges (hi == lo) map everything to 0."""
    lo = F.lit(lo) if not isinstance(lo, Column) else lo
    hi = F.lit(hi) if not isinstance(hi, Column) else hi
    cells = (1 << bits) - 1
    span = hi.cast("double") - lo.cast("double")
    scaled = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(cells),
            F.floor((col.cast("double") - lo.cast("double")) / span * (cells + 1)).cast("long"),
        )
    )
    return F.coalesce(scaled, F.lit(0)).cast("long")


def interleave_bits(cells: list[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    i * n_cols + j. Pure shift/mask arithmetic — codegen on Spark,
    identical integer expressions in ANSI SQL (no engine-specific
    intrinsics), so oracles replay it exactly. n_cols * bits must stay
    ≤ 63 (signed long)."""
    n = len(cells)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cells):
            bit = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + j)
    return z


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Build the z-key for ``cols`` using each column's global min/max
    (one tiny agg, collected once — the same driver-side scalar pattern
    as qcut edges). Returns a Column usable for sorting or writing."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}__"), F.max(c).alias(f"__hi_{c}__")]
    row = df.agg(*aggs).first()
    cells = [
        scale_to_bits(F.col(c), float(row[f"__lo_{c}__"]), float(row[f"__hi_{c}__"]), bits)
        for c in cols
    ]
    return interleave_bits(cells, bits)


def save_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as Parquet clustered by the z-order of ``cols``:
    compute the z-key, range-partition on it (sampled boundaries — the
    parallel total-sort shape, no single-partition funnel), sort within
    partitions, drop the key, write. Per-file min/max footers then
    bound EVERY z-dimension tightly, so filters on any of them skip
    files at planning time."""
    z = zorder_key(df, cols, bits)
    out = df.withColumn("__z__", z)
    out = out.repartitionByRange(n_files, "__z__") if n_files else out.repartitionByRange("__z__")
    out.sortWithinPartitions("__z__").drop("__z__").write.mode(mode).parquet(path)


def deinterleave_bits(z: Column, n_cols: int, j: int, bits: int) -> Column:
    """Inverse of interleave_bits for column ``j``: extract bit
    i·n_cols+j of the z-key into bit i. Same shift/mask arithmetic —
    useful for range-reconstruction tests and for deriving per-dimension
    bounds from z-range file boundaries."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.shiftright(z, i * n_cols + j).bitwiseAND(F.lit(1))
        out = out + F.shiftleft(bit, i)
    return out

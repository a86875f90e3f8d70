"""Positional (fancy-index) operators, re-expressed relationally.

The reference's mbget / bool_to_fancy / merge_indices
(rt_utils.py:631, rt_numpy.py bool_to_fancy, rt_merge.py merge_indices)
manipulate PHYSICAL ROW POSITIONS — a concept Spark DataFrames don't
have. Round 1 marked them N/A-by-design; this module re-expresses them
Spark-first instead: positions become an explicit ``__rowid__`` column
(sources/io.with_rowid — deterministic over caller-chosen order
columns), and every positional gather becomes an equi-join on that id.

Scale shape: a gather is a hash equi-join keyed on the 8-byte rowid —
shuffle both sides on the id, or broadcast when the index side is small
(AQE decides); no collect, no per-row Python, no global sort beyond the
one with_rowid already does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mbget(
    values: DataFrame,
    indices: DataFrame,
    idx_col: str,
    cols: list[str],
    rowid_col: str = "__rowid__",
) -> DataFrame:
    """rt_utils.py:631 mbget: gather ``cols`` from ``values`` at the
    positions in ``indices[idx_col]``; out-of-range positions (including
    negatives — the reference's doctest marks -7 invalid, MATLAB-style)
    yield the invalid value, which is NULL under this repo's
    sentinel↔NULL bridge. The result keeps every index row (same shape
    as the index array) with the gathered columns attached.

    ``values`` must already carry ``rowid_col`` (from
    ``sources.io.with_rowid`` over a deterministic order)."""
    v = values.select(F.col(rowid_col).alias("__vrid__"), *cols)
    joined = indices.join(
        v, on=F.col(idx_col).cast("long") == F.col("__vrid__"), how="left"
    )
    return joined.drop("__vrid__")


def bool_to_fancy(df: DataFrame, mask: Column, rowid_col: str = "__rowid__") -> DataFrame:
    """rt_numpy bool_to_fancy: boolean mask → the integer positions where
    it is True. Relationally: filter + project the rowid (ascending
    positions come from the rowid's own order, no sort needed)."""
    return df.where(mask).select(F.col(rowid_col).alias("index"))


def merge_indices(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "left",
    rowid_col: str = "__rowid__",
) -> DataFrame:
    """rt_merge.py merge_indices: instead of materializing the merged
    table, return the (left_position, right_position) index pairs that
    the join WOULD produce — the reference uses these to gather columns
    lazily. Positions are the two sides' rowids; unmatched side → NULL.
    The join itself is the standard keyed shuffle; the output is two
    long columns regardless of table width, which is exactly why the
    reference exposes this form (gather later, move less data now)."""
    l = left.select(*on, F.col(rowid_col).alias("left_index"))
    r = right.select(*on, F.col(rowid_col).alias("right_index"))
    return l.join(r, on=on, how=how).select("left_index", "right_index")


def alignmk(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    rowid_col: str = "__rowid__",
) -> DataFrame:
    """rt_utils.py:503 alignmk — merge_asof's core, returning a FANCY
    INDEX into the right side (same length as the left; unmatched →
    invalid/NULL) instead of the materialized merge. Relationally: run
    the same union+window asof (operators/merge.merge_asof) but carry
    ONLY the right side's rowid as payload — the output is the left
    frame plus a ``right_index`` column the caller gathers with
    (``mbget``), which is exactly the reference's lazy-gather shape:
    one asof shuffle now, column movement deferred.

    ``right`` must already carry ``rowid_col`` (sources.io.with_rowid
    over a deterministic order)."""
    from .merge import merge_asof

    by_cols = [by] if isinstance(by, str) else list(by or [])
    r = right.select(*by_cols, on, F.col(rowid_col).alias("right_index"))
    return merge_asof(
        left,
        r,
        on=on,
        by=by_cols,
        direction=direction,
        allow_exact_matches=allow_exact_matches,
    )


def make_ifirst(df: DataFrame, key_cols: list[str], rowid_col: str = "__rowid__") -> DataFrame:
    """rt_numpy.py:1767 makeifirst: per row, the POSITION of the first
    row of its group (invalid→NULL is impossible here — every row's
    group has a first). min(rowid) over the group window; one shuffle
    on the key."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    return df.withColumn("ifirst", F.min(rowid_col).over(w))


def make_ilast(df: DataFrame, key_cols: list[str], rowid_col: str = "__rowid__") -> DataFrame:
    """rt_numpy.py makeilast: position of the last row of the group."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols)
    return df.withColumn("ilast", F.max(rowid_col).over(w))


def make_inext(df: DataFrame, key_cols: list[str], rowid_col: str = "__rowid__") -> DataFrame:
    """rt_numpy.py:1823 makeinext: per row, the position of the NEXT row
    of the same group (NULL when none — the reference stores the int
    sentinel). lead(rowid) over (group, rowid-order)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(rowid_col)
    return df.withColumn("inext", F.lead(rowid_col).over(w))


def make_iprev(df: DataFrame, key_cols: list[str], rowid_col: str = "__rowid__") -> DataFrame:
    """rt_numpy.py makeiprev: position of the previous same-group row."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(rowid_col)
    return df.withColumn("iprev", F.lag(rowid_col).over(w))


def assoc_index(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    rowid_col: str = "__rowid__",
) -> DataFrame:
    """rt_numpy.py:1396 assoc_index = ismember(key1, key2)[1]: for every
    left row, the position of the FIRST matching right row (NULL when
    absent). Relationally: reduce the right side to one min-rowid per
    key (map-side combined agg), then a keyed equi-join — the reduced
    side is usually broadcastable."""
    firsts = right.groupBy(*on).agg(F.min(rowid_col).alias("assoc_index"))
    return left.join(firsts, on=on, how="left")


def assoc_copy(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    cols: list[str],
    rowid_col: str = "__rowid__",
) -> DataFrame:
    """rt_numpy.py assoc_copy: gather ``cols`` from the first matching
    right row onto each left row (assoc_index + mbget fused into one
    join — no reason to materialize the index when the gather is the
    goal)."""
    firsts = right.groupBy(*on).agg(
        F.min(rowid_col).alias("__ai__"), *[F.min_by(c, F.col(rowid_col)).alias(c) for c in cols]
    )
    return left.join(firsts.drop("__ai__"), on=on, how="left")


# rt_numpy.py reindex_fast: gather rows by positional index — identical
# contract to mbget (sentinel row for out-of-range), reference keeps both
# names.
reindex_fast = mbget


def unique32(
    df: DataFrame, key_cols: list[str], filter_mask: Column | None = None, rowid_col: str = "__rowid__"
) -> DataFrame:
    """Row index of the FIRST occurrence of each unique (multi)key
    (rt_numpy.py unique32 → MultiKeyUnique32). One hash agg over
    (keys → min rowid); the optional pre-filter composes into the scan
    predicate, matching the reference's `filter` argument. Output: one
    row per unique key with ``ifirst_row`` (int32-safe when the table is;
    kept long for 100 TB row counts)."""
    src = df.where(filter_mask) if filter_mask is not None else df
    return src.groupBy(*key_cols).agg(F.min(rowid_col).cast("long").alias("ifirst_row"))


def first_bool(keys: list[str], rowid_col: str = "__rowid__") -> Column:
    """rt_groupbyops.py:292 first_bool: True at each group's FIRST
    occurrence in row order — a keyed row_number()==1 window (one
    shuffle on the keys)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(rowid_col)
    return F.row_number().over(w) == 1


def last_bool(keys: list[str], rowid_col: str = "__rowid__") -> Column:
    """rt_groupbyops.py:313 last_bool: True at each group's LAST
    occurrence in row order."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(rowid_col).desc())
    return F.row_number().over(w) == 1


def first_fancy(df: DataFrame, keys: list[str], rowid_col: str = "__rowid__") -> DataFrame:
    """rt_groupbyops.py:250 first_fancy: the rowids of first occurrences,
    ordered by first appearance (the reference's ordered=True output is
    sorted by group key; this emits (group key, rowid) so callers pick
    either order)."""
    return df.groupBy(*keys).agg(F.min(rowid_col).alias("first_rowid"))


def last_fancy(df: DataFrame, keys: list[str], rowid_col: str = "__rowid__") -> DataFrame:
    """rt_groupbyops.py:266 last_fancy: the rowids of last occurrences."""
    return df.groupBy(*keys).agg(F.max(rowid_col).alias("last_rowid"))

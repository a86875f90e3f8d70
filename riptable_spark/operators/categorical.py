"""Categorical modes (reference parity: rt_enum.py:848-855 CategoryMode,
rt_categorical.py enum/Dictionary ctor, rt_grouping.py:136 merge_cats).

The reference stores a Categorical as (integer codes, category
dictionary); modes differ in where the dictionary comes from:

- StringArray (mode 1): dictionary = observed uniques; codes 1-based,
  bin 0 reserved for Filtered rows.
- IntEnum / Dictionary (modes 2-3): caller supplies a code→name mapping;
  codes appearing in the data but absent from the mapping display as
  ``!<code>`` (rt_categorical.py:823-849), NULL codes as ``!<inv>``.
- NumericArray (mode 4): numeric uniques, same bin discipline.

On Spark the dictionary is driver-side metadata (category cardinality is
small by definition — that is what makes something categorical), so every
mapping below compiles to a literal ``create_map`` / ``CASE`` column:
pure whole-stage-codegen, no UDF, no shuffle, and a broadcast-free label
assignment that survives any cluster size. The rows themselves never
leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FILTERED_LABEL = "Filtered"


class CategoryMode:
    """Mirror of rt_enum.py:848 CategoryMode (IntEnum there)."""

    Default = 0
    StringArray = 1
    IntEnum = 2
    Dictionary = 3
    NumericArray = 4
    MultiKey = 5


def _literal_map(mapping: dict) -> Column:
    pairs = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def enum_label(code: Column, mapping: dict[int, str]) -> Column:
    """Dictionary/IntEnum-mode display label for an integer code column:
    mapped codes → their name; unmapped codes → ``!<code>``; NULL (the
    sentinel-invalid bridge) → ``!<inv>`` (rt_categorical.py:823-849)."""
    looked_up = F.element_at(_literal_map(mapping), code)
    return F.coalesce(
        looked_up,
        F.when(code.isNull(), F.lit("!<inv>")).otherwise(
            F.concat(F.lit("!<"), code.cast("string"), F.lit(">"))
        ),
    )


def string_codes(values: Column, categories: list, base_index: int = 1) -> Column:
    """StringArray/NumericArray-mode codes against a caller-supplied
    dictionary: position in ``categories`` (base_index-based); values not
    in the dictionary (or NULL) take the Filtered bin 0."""
    m = {v: i + base_index for i, v in enumerate(categories)}
    return F.coalesce(F.element_at(_literal_map(m), values), F.lit(0))


def filtered_mask(values: Column, categories: list, filter: Column | None = None) -> Column:
    """True for rows landing in bin 0 (out-of-dictionary or filtered)."""
    bad = ~values.isin(list(categories)) | values.isNull()
    if filter is not None:
        bad = bad | ~filter
    return bad


def cat_agg(
    df: DataFrame,
    values: Column,
    categories: list,
    aggs: dict[str, Column],
    showfilter: bool = False,
    filter: Column | None = None,
    label_col: str = "bin",
) -> DataFrame:
    """Grouped aggregation with the reference's bin-0 discipline
    (rt_groupbyops.py:341-342): rows outside the dictionary (or failing
    ``filter``) form the invisible Filtered bin, excluded from results
    unless ``showfilter=True``, in which case it surfaces as a leading
    ``Filtered`` row — computed as a shuffle-free global aggregate, not a
    second scan group.

    ``aggs`` maps output name → aggregate Column (built on masked inputs
    by the caller via F.when as needed).
    """
    bad = filtered_mask(values, categories, filter)
    body = (
        df.where(~bad)
        .groupBy(values.alias(label_col))
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    if not showfilter:
        return body
    filt = (
        df.where(bad)
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(F.lit(FILTERED_LABEL).alias(label_col), *aggs.keys())
    )
    return filt.unionByName(body)


def merge_mappings(mappings: list[dict[int, str]]) -> dict[int, str]:
    """merge_cats(from_mapping=True) (rt_grouping.py:244-252): union of
    (code, name) pairs, first occurrence of a code wins."""
    out: dict[int, str] = {}
    for m in mappings:
        for k, v in m.items():
            out.setdefault(k, v)
    return out


def merge_uniques(uniques_lists: list[list]) -> list:
    """merge_cats for array-mode categoricals (rt_grouping.py:262
    hstack_groupings): unified dictionary = first-seen order across the
    parts' dictionaries."""
    seen: dict = {}
    for lst in uniques_lists:
        for v in lst:
            seen.setdefault(v, None)
    return list(seen)


def hstack_categoricals(
    parts: list[tuple[DataFrame, str]],
    uniques_lists: list[list],
    code_col: str = "code",
    base_index: int = 1,
) -> tuple[DataFrame, list]:
    """Categorical hstack with code re-mapping (rt_grouping.py:136
    merge_cats): each part arrives as (DataFrame, its value column) plus
    its own category dictionary; the result is ONE DataFrame whose
    ``code_col`` indexes the unified dictionary, with bin 0 preserved for
    each part's out-of-dictionary rows.

    Spark shape: the re-map is a literal-map projection per part followed
    by a metadata-only unionByName — zero shuffles, exactly what stacked
    .sds loads need at 100 TB.
    """
    unified = merge_uniques(uniques_lists)
    out_parts = []
    for (df, valcol), uniq in zip(parts, uniques_lists):
        # codes against the part's own dictionary first (anything outside
        # the PART's dictionary was already Filtered there) then re-coded
        # against the unified dictionary
        v = F.col(valcol)
        in_part = v.isin(list(uniq)) & v.isNotNull()
        new_code = F.when(in_part, string_codes(v, unified, base_index)).otherwise(F.lit(0))
        out_parts.append(df.withColumn(code_col, new_code))
    stacked = out_parts[0]
    for p in out_parts[1:]:
        stacked = stacked.unionByName(p)
    return stacked, unified


def hstack_categoricals_multikey(
    parts: list[tuple[DataFrame, list[str]]],
    uniques_lists: list[list[tuple]],
    code_col: str = "code",
    base_index: int = 1,
) -> tuple[DataFrame, list[tuple]]:
    """Multikey Categorical hstack (rt_grouping.py:277 hstack_groupings,
    whose hash path takes a LIST of unique arrays per part — the tuple
    key; the reference's merge_cats mapping path carries a 'needs
    multikey' TODO at rt_grouping.py:179, but its hstack path resolves
    multikey via groupbyhash first-seen order, which is what we mirror).

    Each part arrives as (DataFrame, [key columns]) plus its dictionary
    of key TUPLES; the unified dictionary is first-seen tuple order
    across parts, and each part's rows are re-coded against it. Rows
    whose tuple falls outside the PART's own dictionary keep bin 0.

    Spark shape: per-part dictionaries can be large (the reference cites
    ~10^6 OSI option symbols), so the re-map is a BROADCAST equi-join on
    the key columns against a tiny (keys → unified code) relation built
    per part — no literal CASE of a million branches, no shuffle of the
    data side; then a metadata-only unionByName.
    """
    unified = merge_uniques([[tuple(x) for x in lst] for lst in uniques_lists])
    code_of = {t: i + base_index for i, t in enumerate(unified)}
    out_parts = []
    for (df, keycols), uniq in zip(parts, uniques_lists):
        spark = df.sparkSession
        rows = [tuple(t) + (code_of[tuple(t)],) for t in uniq]
        dim = spark.createDataFrame(
            rows, keycols + ["__newcode__"]
        )
        joined = df.join(F.broadcast(dim), on=keycols, how="left")
        out_parts.append(
            joined.withColumn(code_col, F.coalesce(F.col("__newcode__"), F.lit(0))).drop(
                "__newcode__"
            )
        )
    stacked = out_parts[0]
    for p in out_parts[1:]:
        stacked = stacked.unionByName(p)
    return stacked, unified


def categorical_convert(spark, pd_categorical, base_index: int = 1):
    """pandas.Categorical → (DataFrame of codes+labels, categories list)
    (rt_categorical.py:129 categorical_convert).

    The reference returns the two building blocks (integer codes, uniques
    array), shifting codes +1 when pandas' -1 'missing' marker is present
    so 0 becomes the invalid bin. Here: codes column in base_index space
    with pandas -1 → bin 0, labels via the same dictionary, distributed as
    a DataFrame. The categories list is returned unchanged so callers can
    re-bin other tables against the identical dictionary."""
    import pandas as pd  # local: cheap, and keeps module import light

    cats = [str(c) for c in pd_categorical.categories]
    codes = pd_categorical._codes if hasattr(pd_categorical, "_codes") else pd_categorical.codes
    pdf = pd.DataFrame({"__code_in__": codes.astype("int64")})
    df = spark.createDataFrame(pdf)
    code = F.col("__code_in__")
    shifted = F.when(code < 0, F.lit(0)).otherwise(code + F.lit(base_index))
    label_map = {i + base_index: c for i, c in enumerate(cats)}
    out = df.select(
        shifted.alias("code"),
        F.when(shifted == 0, F.lit("Filtered")).otherwise(
            enum_label(shifted, label_map)
        ).alias("label"),
    )
    return out, cats


def CatZero(values: Column, categories: list, filter: Column | None = None) -> Column:
    """rt_categorical.py:6656 — Categorical with base_index=0 (no
    reserved invalid bin; filtered/unknown values get code -1 instead of
    0). Thin alias over ``string_codes(base_index=0)`` with the
    reference's name."""
    # not via string_codes: its unknown→0 convention is the base-1
    # Filtered bin, which would collide with category 0 here
    m = {v: i for i, v in enumerate(categories)}
    out = F.coalesce(F.element_at(_literal_map(m), values), F.lit(-1))
    if filter is not None:
        out = F.when(filter, out).otherwise(F.lit(-1))
    return out

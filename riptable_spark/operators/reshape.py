"""Reshape / set operations (SURVEY §2.7): concat, pivot, melt, one-hot.

Reference: /root/reference/riptable/rt_dataset.py:6867 (concat_rows with
schema unification), :7987 (pivot, errors on dup combos), :6781 (melt),
:2888 (one_hot_encode); rt_hstack.py:15 (hstack_any).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def concat_rows(dfs: list[DataFrame]) -> DataFrame:
    """rt_dataset.py:6867 — union-all with column alignment: missing
    columns become NULL (riptable fills per-dtype invalids). Pure metadata
    op — no shuffle."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def concat_columns(dfs: list[DataFrame], rowid: str = "__rowid__") -> DataFrame:
    """rt_dataset.py:6995 — horizontal concat; aligned by the rowid
    discipline (join on __rowid__)."""
    out = dfs[0]
    for d in dfs[1:]:
        dup = [c for c in d.columns if c in out.columns and c != rowid]
        out = out.join(d.drop(*dup) if dup else d, on=rowid, how="outer")
    return out


def pivot_strict(
    df: DataFrame, labels: str, columns: str, values: str, pivot_values: list | None = None
) -> DataFrame:
    """Dataset.pivot (rt_dataset.py:7987): reshape WITHOUT aggregation —
    raises if any (labels, columns) combo has >1 row, then pivots first().
    Pass ``pivot_values`` when known to skip the distinct-scan job."""
    dup = (
        df.groupBy(labels, columns).count().where(F.col("count") > 1).limit(1).count()
    )
    if dup:
        raise ValueError("pivot: duplicate (label, column) combinations")
    return df.groupBy(labels).pivot(columns, values=pivot_values).agg(F.first(values))


def melt(df: DataFrame, id_vars: list[str], value_vars: list[str], var_name: str = "variable", value_name: str = "value") -> DataFrame:
    """rt_dataset.py:6781 wide→long → native unpivot (no shuffle)."""
    return df.unpivot(id_vars, value_vars, var_name, value_name)


def one_hot_encode(df: DataFrame, colname: str, values: list | None = None, prefix: str | None = None) -> DataFrame:
    """rt_dataset.py:2888 — indicator column per category. ``values``
    supplied = scale-safe (no distinct scan)."""
    if values is None:
        values = [r[0] for r in df.select(colname).distinct().orderBy(colname).collect()]
    p = prefix if prefix is not None else colname
    cols = [
        F.when(F.col(colname) == F.lit(v), F.lit(1)).otherwise(F.lit(0)).alias(f"{p}_{v}")
        for v in values
    ]
    return df.select("*", *cols)


def unique_values(df: DataFrame, cols: list[str], with_counts: bool = False) -> DataFrame:
    """rt_numpy.py:755 unique (+counts variant via groupBy)."""
    if with_counts:
        return df.groupBy(*cols).count().orderBy(*cols)
    return df.select(*cols).distinct().orderBy(*cols)


def sample_exact(df: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """rt_dataset.py:5978 sample — exact k rows. orderBy(rand).limit(k) is
    a TakeOrdered (no full sort materialization)."""
    return df.orderBy(F.rand(seed)).limit(k)


def sample_deterministic(df: DataFrame, k: int, key_cols: list[str]) -> DataFrame:
    """Exact-k sample that is REPRODUCIBLE across engines and runs: order
    by the md5 of the key columns (a uniform permutation of the key
    space) and take k — still a TakeOrderedAndProject, no full sort. At
    100 TB this beats rand(): re-runs, retries, and audits all select the
    same rows."""
    h = F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]))
    return df.orderBy(h, *key_cols).limit(k)


def repeat_rows(df: DataFrame, n, order_cols: list[str] | None = None) -> DataFrame:
    """rt.repeat analogue at row granularity: each row appears ``n``
    times (int or Column), tagged with ``__rep__`` 0..n-1 (riptable's
    element-repeat order). explode(sequence) — pure codegen, no shuffle,
    rows never leave their partition."""
    nn = F.lit(n) if isinstance(n, int) else n
    return df.withColumn("__rep__", F.explode(F.sequence(F.lit(0), nn.cast("long") - 1)))


def tile_rows(df: DataFrame, n: int, order_cols: list[str] | None = None) -> DataFrame:
    """rt.tile analogue: the whole table repeated ``n`` times, tagged
    with ``__tile__`` 0..n-1. Same explode mechanics as repeat_rows —
    tile vs repeat differ only in how the caller orders the result
    (tile index major vs row major), which is a sort specification on
    Spark, not a physical layout."""
    return df.withColumn("__tile__", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))


def bincount(df: DataFrame, colname: str, minlength: int | None = None) -> DataFrame:
    """rt_numpy.py:4274 bincount: occurrence count per non-negative int
    value, DENSE over 0..max (or minlength-1) with zeros for absent bins
    — the dense frame comes from a range() relation left-joined against
    the (tiny) count aggregate, never from collect."""
    counts = df.groupBy(F.col(colname).cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
    spark = df.sparkSession
    hi = counts.agg(F.max("bin")).first()[0] or 0
    top = max(int(hi) + 1, int(minlength or 0))
    dense = spark.range(top).withColumnRenamed("id", "bin")
    return (
        dense.join(counts, on="bin", how="left")
        .select("bin", F.coalesce("n", F.lit(0)).alias("n"))
    )


# rt_hstack.py stack_rows — same schema-unifying row stack as hstack/
# concat_rows; the reference keeps both names, so do we.
stack_rows = concat_rows


def stack_rows(named: dict[str, DataFrame], label_col: str = "Cat") -> DataFrame:
    """rt_hstack.py:46 stack_rows: vertical stack of named relations
    with a provenance label column (the doctest's (arr, cat) pair as
    one relation) — unionByName with a literal tag, columns aligned,
    missing→NULL. Pure metadata op, no shuffle."""
    parts = [
        df.withColumn(label_col, F.lit(name)) for name, df in named.items()
    ]
    return concat_rows(parts)


def allocate_proportional(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    total: int,
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split an integer
    ``total`` across rows proportionally to ``weight_col`` such that
    the parts are integers and sum EXACTLY to ``total`` — budget
    allocation, seat apportionment, prorated quotas.

    All arithmetic is exact int64: base = ⌊T·w/W⌋ via integer DIV,
    remainder = T·w mod W, and the T − Σbase leftover units go to the
    largest remainders (ties by key ascending — fully deterministic).
    The ranking window runs over the AGGREGATED per-key relation (one
    row per allocation target), not the fact table — the documented
    tolerated global-window shape.  Requires non-negative weights and
    W > 0.  Emits key cols + (weight, allocated).
    """
    from pyspark.sql import Window

    t = int(total)
    w = F.col(weight_col).cast("long")
    tot = df.agg(F.sum(w).alias("__W__"))
    g = df.select(*key_cols, w.alias("weight")).crossJoin(F.broadcast(tot))
    g = g.withColumn("__base__", F.expr(f"CAST({t} AS BIGINT) * weight DIV __W__"))
    g = g.withColumn(
        "__rem__", (F.lit(t).cast("long") * F.col("weight")) % F.col("__W__")
    )
    leftover = F.lit(t).cast("long") - F.sum("__base__").over(
        Window.partitionBy(F.lit(1))
    )
    rk = F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(
            F.col("__rem__").desc(), *[F.col(c) for c in key_cols]
        )
    )
    g = g.withColumn("__left__", leftover).withColumn("__rk__", rk)
    return g.select(
        *key_cols,
        "weight",
        (
            F.col("__base__")
            + F.when(F.col("__rk__") <= F.col("__left__"), 1).otherwise(0)
        ).cast("long").alias("allocated"),
    )

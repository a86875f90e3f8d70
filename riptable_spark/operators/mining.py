"""Association mining: market-basket pair co-occurrence with
support / confidence / lift.

The candidate-pair shape mirrors the dedup LSH joins (dedup.py): an
equi-join keyed on the basket id, never a cross join, with an explicit
skew cap on degenerate mega-baskets (a basket of B items contributes
C(B,2) pairs — quadratic, the same pathology as a ubiquitous shingle).
All counts are exact integers; lift composes from int64→double
conversions and one divide, so a SQL oracle replays it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """Item-pair co-occurrence across baskets with support, confidence
    (both directions' inputs) and lift.

    Plan: distinct (basket, item) → optional basket-size cap →
    self-equi-join on basket with ``item_a < item_b`` → pair counts ≥
    ``min_count`` → join per-item basket counts back on each side.  Two
    shuffles total beyond the pair join (item-count aggregation is
    reused for both sides).  ``max_basket`` drops baskets above the cap
    BEFORE the join — at 100 TB one boilerplate mega-basket otherwise
    emits billions of pairs.

    lift = (n_ab · n_baskets) / (n_a · n_b); > 1 ⇒ positive association.
    The products stay in int64 (counts are bounded by basket count) and
    the single division is IEEE-exact.
    """
    bi = df.select(F.col(basket_col).alias("b"), F.col(item_col).alias("i")).distinct()
    if max_basket is not None:
        w = Window.partitionBy("b")
        bi = bi.withColumn("__bs__", F.count(F.lit(1)).over(w)).where(
            F.col("__bs__") <= max_basket
        ).drop("__bs__")
    n_baskets = bi.agg(F.countDistinct("b").alias("n_baskets"))  # 1-row, broadcast below
    item_counts = bi.groupBy("i").agg(F.count(F.lit(1)).alias("cnt"))
    left = bi.select("b", F.col("i").alias("item_a"))
    right = bi.select("b", F.col("i").alias("item_b"))
    pair_counts = (
        left.join(right, on="b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    out = (
        pair_counts.join(item_counts.select(F.col("i").alias("item_a"), F.col("cnt").alias("n_a")), on="item_a")
        .join(item_counts.select(F.col("i").alias("item_b"), F.col("cnt").alias("n_b")), on="item_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    return out.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        "n_baskets",
        ((F.col("n_ab") * F.col("n_baskets")) / (F.col("n_a") * F.col("n_b"))).alias("lift"),
    )


def triangle_count(edges: DataFrame, src: str = "item_a", dst: str = "item_b") -> DataFrame:
    """Global triangle count over an undirected edge list — the classic
    graph-cohesion metric (community density, spam-graph detection).

    Requires/enforces the canonical ``a < b`` orientation, then counts
    paths a<b<c closed by (a,c): two equi-joins, never a cross join.
    This is the standard distributed formulation — each triangle is
    counted exactly once because orientation fixes the traversal order.
    At scale the join keys are the vertex ids; a degree cap on the
    input edge list (cf. ``basket_pairs(max_basket=...)``) bounds the
    wedge explosion the same way it bounds pair generation.
    """
    e = edges.select(
        F.least(F.col(src), F.col(dst)).alias("a"), F.greatest(F.col(src), F.col(dst)).alias("b")
    ).where(F.col("a") != F.col("b")).distinct()
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("a2"), F.col("b").alias("c2"))
    wedges = ab.join(bc, on="b")
    tri = wedges.join(
        ac, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2"))
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges")))
    ).select("n_edges", "n_triangles")


def topk_churn(
    df: DataFrame,
    period: Column,
    key_col: str,
    value: Column,
    k: int = 10,
) -> DataFrame:
    """Drift between consecutive periods' top-k lists (leaderboard
    churn): per period, rank keys by an exact integer total (key as
    tiebreak → deterministic sets), keep the top k, then compare each
    period against its predecessor: retained / entered / dropped counts
    and the Jaccard overlap.

    ``period`` must be an integer column where consecutive periods
    differ by exactly 1 (e.g. months since epoch).  Shape: one hash agg
    on (period, key), one per-period top-k window, one (period, key)
    self-join of two k-row-per-period relations — all tiny after the
    first reduce.
    """
    totals = (
        df.groupBy(period.alias("period"), F.col(key_col).alias("key"))
        .agg(F.sum(value).alias("total"))
    )
    w = Window.partitionBy("period").orderBy(F.col("total").desc(), F.col("key"))
    tops = totals.withColumn("__r__", F.row_number().over(w)).where(F.col("__r__") <= k)
    cur = tops.select("period", "key")
    prev = tops.select((F.col("period") + 1).alias("period"), F.col("key").alias("key_prev"))
    j = cur.withColumn("__c__", F.lit(1)).join(
        prev.withColumn("__p__", F.lit(1)),
        on=(cur["period"] == prev["period"]) & (cur["key"] == prev["key_prev"]),
        how="full_outer",
    )
    merged = j.select(
        F.coalesce(cur["period"], prev["period"]).alias("period"),
        F.col("__c__"), F.col("__p__"),
    )
    stats = merged.groupBy("period").agg(
        F.sum(F.when(F.col("__c__").isNotNull() & F.col("__p__").isNotNull(), 1).otherwise(0)).cast("bigint").alias("retained"),
        F.sum(F.when(F.col("__c__").isNotNull() & F.col("__p__").isNull(), 1).otherwise(0)).cast("bigint").alias("entered"),
        F.sum(F.when(F.col("__c__").isNull() & F.col("__p__").isNotNull(), 1).otherwise(0)).cast("bigint").alias("dropped"),
    )
    # report only periods that have BOTH a current and a previous top-k
    have_cur = cur.select("period").distinct()
    have_prev = prev.select("period").distinct()
    out = stats.join(have_cur, on="period").join(have_prev, on="period")
    union_n = F.col("retained") + F.col("entered") + F.col("dropped")
    return out.select(
        "period", "retained", "entered", "dropped",
        F.when(union_n > 0, F.col("retained") / union_n).alias("jaccard"),
    )


def pareto_frontier(
    df: DataFrame,
    group: str,
    minimize: str,
    maximize: str,
    min_scale: int = 100,
    max_scale: int = 1,
) -> DataFrame:
    """Per-group Pareto frontier over (minimize ↓, maximize ↑): a row
    survives iff nothing in its group is weakly better on both axes and
    strictly better on one — skyline queries, price/performance
    curation, model-selection fronts.

    LINEAR formulation (the naive NOT EXISTS is O(n²)): a row is
    dominated iff the running MAX of ``maximize`` over STRICTLY-cheaper
    rows reaches its value (a value-based range frame ending at −1
    handles strictness exactly on integer keys), or a same-cost row
    beats its ``maximize``.  Exact integers throughout; equal (cost,
    value) duplicates all survive (no strict dominance), matching the
    set semantics a SQL NOT EXISTS oracle replays.
    """
    lo = F.round(F.col(minimize) * min_scale).cast("bigint")
    hi = F.round(F.col(maximize) * max_scale).cast("bigint")
    base = df.withColumn("__lo__", lo).withColumn("__hi__", hi)
    w_strict = (
        Window.partitionBy(group).orderBy("__lo__").rangeBetween(Window.unboundedPreceding, -1)
    )
    w_price = Window.partitionBy(group, "__lo__")
    m_strict = F.max("__hi__").over(w_strict)
    m_same = F.max("__hi__").over(w_price)
    keep = (m_strict.isNull() | (m_strict < F.col("__hi__"))) & (F.col("__hi__") == m_same)
    return base.withColumn("__keep__", keep).where(F.col("__keep__")).drop(
        "__lo__", "__hi__", "__keep__"
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    max_basket: int | None = None,
    topk: int | None = None,
) -> DataFrame:
    """Item-item cosine similarity from basket co-occurrence — the
    classic "related items" recommender relation.

    Composes :func:`basket_pairs` (equi-join candidate generation with
    the mega-basket skew cap) and adds ``cosine = n_ab / sqrt(n_a·n_b)``
    on the binary incidence vectors.  With ``topk`` set, keeps each
    item's k best neighbors (both orientations are ranked, so every
    item gets a neighbor list) via one per-item window over the pair
    relation — pairs are already reduced, so the window input is tiny
    next to the basket fact table.

    The cosine is one int64 multiply, one correctly-rounded sqrt and
    one divide on identical operands — bit-identical cross-engine, no
    rounding needed in oracles.
    """
    pairs = basket_pairs(df, basket_col, item_col, min_count=min_count, max_basket=max_basket)
    pairs = pairs.withColumn(
        "cosine",
        F.col("n_ab") / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
    )
    if topk is None:
        return pairs
    both = pairs.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("neighbor"),
        "n_ab", "cosine",
    ).unionAll(
        pairs.select(
            F.col("item_b").alias("item"), F.col("item_a").alias("neighbor"),
            "n_ab", "cosine",
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("n_ab").desc(), F.col("neighbor")
    )
    return both.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= topk)


def shapley_attribution(
    df: DataFrame,
    user_col: str,
    channel_col: str,
    converted_col: str,
    channels: list[str],
) -> DataFrame:
    """Shapley-value conversion attribution over marketing channels —
    the game-theoretic split that last-touch/U-shaped heuristics
    approximate.  Coalition value v(S) = conversions of users whose
    ENTIRE touched-channel set lies within S ("S alone could have
    served them"); each channel's credit is its exact Shapley value.

    Scale shape: ONE hash agg collapses the fact table to per-user
    (bitmask, converted), a second to per-(mask) conversion counts —
    from there everything is algebra over ≤2^k rows (k = |channels|,
    bounded at 6: the subset lattice is exponential BY DEFINITION, so
    the cap is the honest contract).  v(S) comes from a bitwise
    subset join of the tiny mask relation with the 2^k coalition
    relation; Shapley weights |S|!(k−1−|S|)!/k! are shipped scaled by
    k! so every credit is an exact integer ``shapley_scaled`` with
    denominator k!·1 — one divide at the end.  Σ over channels of the
    Shapley values = v(full set) (efficiency axiom — tested).
    """
    import math

    k = len(channels)
    if k < 1 or k > 6:
        raise ValueError("channels must have 1..6 entries")
    kfact = math.factorial(k)
    bit = F.lit(0)
    for i, ch in enumerate(channels):
        bit = F.when(F.col(channel_col) == ch, F.lit(1 << i)).otherwise(bit)
    per_user = (
        df.where(F.col(channel_col).isin(channels))
        .groupBy(user_col)
        .agg(
            F.bit_or(bit).alias("mask"),
            F.max(F.col(converted_col).cast("long")).alias("conv"),
        )
    )
    mask_counts = per_user.groupBy("mask").agg(
        F.sum("conv").cast("long").alias("conversions")
    )
    spark = df.sparkSession
    coalitions = spark.createDataFrame(
        [(s,) for s in range(1 << k)], "s long"
    )
    # v(S) = Σ conversions over masks ⊆ S  (bitwise subset join; both
    # relations are ≤ 2^k rows)
    v = (
        coalitions.join(
            F.broadcast(mask_counts),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("conversions"), F.lit(0)).cast("long").alias("v"))
    )
    # Shapley_i·k! = Σ_{S ∌ i} |S|!(k−1−|S|)! (v(S∪i) − v(S))
    rows = []
    for i, ch in enumerate(channels):
        for s in range(1 << k):
            if s & (1 << i):
                continue
            wgt = math.factorial(bin(s).count("1")) * math.factorial(k - 1 - bin(s).count("1"))
            rows.append((ch, s, s | (1 << i), wgt))
    terms = spark.createDataFrame(rows, "channel string, s long, s_with long, wgt long")
    joined = (
        terms.join(F.broadcast(v.withColumnRenamed("v", "v_s")), on="s")
        .join(
            F.broadcast(
                v.select(F.col("s").alias("s_with"), F.col("v").alias("v_with"))
            ),
            on="s_with",
        )
    )
    out = joined.groupBy("channel").agg(
        F.sum(F.col("wgt") * (F.col("v_with") - F.col("v_s"))).cast("long").alias("shapley_scaled")
    )
    return out.select(
        "channel", "shapley_scaled",
        (F.col("shapley_scaled") / F.lit(kfact)).alias("shapley"),
    )

"""Driver-contract query registry, batch 4: cum-reset segments, time
window products, curve interpolation via as-of, combined keys, mask
combinators, trim, duplicated flags, statx profile, stacked/append
sources (PDataset), Categorical grouping reuse.
Registers into the same QUERIES/ORACLES dicts as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .dataset import Categorical
from .functions import stats
from .operators import window as win
from .operators import groupby as gb
from .queries import query
from .sources.io import load_table, load_stacked


@query(
    "q91_cumsum_reset",
    """
    WITH seg AS (
        SELECT event_id, user_id, value, ts,
               sum(CASE WHEN event_type = 'login' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                         ROWS UNBOUNDED PRECEDING) AS seg_id
        FROM events
    )
    SELECT event_id,
           round(sum(value) OVER (PARTITION BY user_id, seg_id
                                  ORDER BY epoch_us(ts), event_id
                                  ROWS UNBOUNDED PRECEDING), 4) AS run
    FROM seg
    """,
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    """cumsum with reset_filter (rt_groupbyops.py:3158 filter/reset):
    running sum restarting at every 'login' event — the segment-id trick
    (cumsum of reset flags joins the partition key)."""
    ev = load_table(spark, sf, "events").withColumn("t_us", F.unix_micros("ts"))
    run = win.cumsum_reset(
        F.col("value"),
        F.col("event_type") == "login",
        ["user_id"],
        F.struct("t_us", "event_id"),
    )
    return ev.select("event_id", F.round(run, 4).alias("run"))


@query(
    "q92_timewindow_prod",
    """
    SELECT event_id,
           round(sum(ln(1 + value / 1000.0))
                 OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                       RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 6) AS growth_log
    FROM events
    """,
)
def q92(spark: SparkSession, sf: str) -> DataFrame:
    """timewindow_prod (rt_fastarray.py:2629-2668 rc.TimeWindow): product
    over a trailing 1-hour TIME window — rangeBetween is the native fit;
    the product runs as exp∘sum∘ln in codegen (exp omitted from the
    contract output: the hash compares the log-sum, because exp(ln(x))
    of a single-row window lands ±1 ulp around 2-decimal inputs whose
    5th decimal is exactly 5 — a systematic cross-engine rounding tie
    caught at sf0.1). The range key is epoch MICROSECONDS on both
    sides: whole-second truncation (unix_seconds) vs DuckDB's
    fractional epoch() disagreed on window membership near the 1-hour
    boundary (also caught at sf0.1)."""
    ev = load_table(spark, sf, "events").withColumn("t_us", F.unix_micros(F.col("ts")))
    w = Window.partitionBy("user_id").orderBy("t_us").rangeBetween(-3_600_000_000, 0)
    growth_log = F.sum(F.log(1 + F.col("value") / 1000.0)).over(w)
    return ev.select("event_id", F.round(growth_log, 6).alias("growth_log"))


@query(
    "q93_interp_extrap",
    """
    WITH curve AS (
        SELECT (o_custkey % 100) * 50.0 AS xp, avg(o_totalprice) AS fp
        FROM orders GROUP BY 1
    ),
    pts AS (SELECT s_suppkey, s_acctbal AS x FROM supplier),
    b AS (
        SELECT p.s_suppkey, p.x,
               max_by(c.fp, c.xp) AS y0, max(c.xp) AS x0
        FROM pts p LEFT JOIN curve c ON c.xp <= p.x
        GROUP BY p.s_suppkey, p.x
    ),
    f AS (
        SELECT p.s_suppkey, min_by(c.fp, c.xp) AS y1, min(c.xp) AS x1
        FROM pts p LEFT JOIN curve c ON c.xp > p.x
        GROUP BY p.s_suppkey
    )
    SELECT b.s_suppkey,
           round(CASE WHEN x1 IS NULL THEN y0
                      WHEN x0 IS NULL THEN y1
                      ELSE y0 + (y1 - y0) / (x1 - x0) * (x - x0) END, 4) AS y
    FROM b JOIN f ON b.s_suppkey = f.s_suppkey
    """,
)
def q93(spark: SparkSession, sf: str) -> DataFrame:
    """interp/interp_extrap (rt_numpy.py:5333/5388): linear interpolation
    of supplier balances against a data-derived curve — two as-of aligns
    (backward+forward bracket) on the union+window rewrite."""
    o = load_table(spark, sf, "orders")
    s = load_table(spark, sf, "supplier")
    curve = o.groupBy(((F.col("o_custkey") % 100) * 50.0).alias("xp")).agg(
        F.avg("o_totalprice").alias("fp")
    )
    pts = s.select("s_suppkey", F.col("s_acctbal").alias("x"))
    out = win.interp_extrap(pts, "x", curve, "xp", "fp", out_col="y")
    return out.select("s_suppkey", F.round("y", 4).alias("y"))


@query(
    "q94_cat2keys",
    """
    SELECT l_returnflag || '|' || l_linestatus AS combined,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
    FROM lineitem GROUP BY 1
    """,
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    """cat2keys/combine2keys (rt_numpy.py:1601/1574): cartesian-combined
    group key — a struct/concat key, one shuffle, no code tables."""
    li = load_table(spark, sf, "lineitem")
    combined = F.concat_ws("|", "l_returnflag", "l_linestatus")
    return li.groupBy(combined.alias("combined")).agg(
        gb.count().alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty")
    )


@query(
    "q95_mask_combinators",
    """
    SELECT count(*) FILTER (m1 AND m2) AS n_and,
           count(*) FILTER (m1 OR m2) AS n_or,
           count(*) FILTER ((m1 AND NOT m2) OR (m2 AND NOT m1)) AS n_xor,
           count(*) FILTER (m1 AND NOT m2) AS n_andnot
    FROM (SELECT l_quantity > 25 AS m1, l_discount > 0.05 AS m2 FROM lineitem)
    """,
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    """mask_and/or/xor/andnot combinators (rt_numpy.py, __init__.py:170)
    — chained boolean Column exprs, counted in one pass."""
    li = load_table(spark, sf, "lineitem")
    m1 = F.col("l_quantity") > 25
    m2 = F.col("l_discount") > 0.05
    cnt = lambda m: F.count(F.when(m, 1))  # noqa: E731
    return li.agg(
        cnt(m1 & m2).alias("n_and"),
        cnt(m1 | m2).alias("n_or"),
        cnt((m1 & ~m2) | (m2 & ~m1)).alias("n_xor"),
        cnt(m1 & ~m2).alias("n_andnot"),
    )


@query(
    "q96_trim",
    """
    SELECT count(*) AS n_kept, round(sum(l_extendedprice), 2) AS price_sum
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45 AND l_discount BETWEEN 0.01 AND 0.09
      AND l_extendedprice > 1000
    """,
)
def q96(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset.trim/keep (rt_dataset.py:7787/7952): drop rows failing a
    conjunction of per-column predicates — one pushed-down filter."""
    li = load_table(spark, sf, "lineitem")
    kept = li.where(
        F.col("l_quantity").between(5, 45)
        & F.col("l_discount").between(0.01, 0.09)
        & (F.col("l_extendedprice") > 1000)
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
    )


@query(
    "q97_duplicated_flag",
    """
    SELECT dup_size, count(*)::BIGINT AS n_keys
    FROM (SELECT count(*) AS dup_size FROM part GROUP BY p_brand, p_size)
    GROUP BY dup_size
    """,
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    """duplicated (rt_fastarray.py:1897 / rt_dataset.py:3557): histogram
    of duplicate-group sizes over a key subset."""
    p = load_table(spark, sf, "part")
    sizes = p.groupBy("p_brand", "p_size").agg(F.count(F.lit(1)).alias("dup_size"))
    return sizes.groupBy("dup_size").agg(F.count(F.lit(1)).alias("n_keys"))


@query(
    "q98_statx",
    """
    SELECT count(o_totalprice) AS n, round(avg(o_totalprice), 4) AS mean,
           round(stddev_samp(o_totalprice), 4) AS std,
           round(min(o_totalprice), 2) AS mn, round(max(o_totalprice), 2) AS mx,
           round(quantile_cont(o_totalprice, 0.10), 4) AS p10,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90
    FROM orders
    """,
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    """statx profile (rt_stats.py:40) — global describe in one agg."""
    o = load_table(spark, sf, "orders")
    c = F.col("o_totalprice")
    pq = F.percentile(c, F.array(F.lit(0.10), F.lit(0.90)))
    return o.agg(
        F.count(c).alias("n"),
        F.round(F.avg(c), 4).alias("mean"),
        F.round(F.stddev_samp(c), 4).alias("std"),
        F.round(F.min(c), 2).alias("mn"),
        F.round(F.max(c), 2).alias("mx"),
        pq.alias("__pq__"),
    ).select(
        "n", "mean", "std", "mn", "mx",
        F.round(F.col("__pq__")[0], 4).alias("p10"),
        F.round(F.col("__pq__")[1], 4).alias("p90"),
    )


@query(
    "q99_stacked_read",
    """
    SELECT part_id, count(*) AS n, sum(n_nationkey)::BIGINT AS key_sum
    FROM (SELECT 0 AS part_id, n_nationkey FROM nation
          UNION ALL SELECT 1, n_nationkey FROM nation)
    GROUP BY part_id
    """,
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    """PDataset / load_sds(stack=True) (rt_sds.py:1855, rt_pdataset.py:18):
    stack N files into one table with a partition id —
    multi-path parquet read + a file-derived partition column."""
    import tempfile

    n = load_table(spark, sf, "nation")
    root = tempfile.mkdtemp(prefix="rts_stack_")
    n.write.mode("overwrite").parquet(f"{root}/p0")
    n.write.mode("overwrite").parquet(f"{root}/p1")
    stacked = load_stacked(spark, [f"{root}/p0", f"{root}/p1"])
    part_id = F.when(F.input_file_name().contains("/p1/"), F.lit(1)).otherwise(F.lit(0))
    return stacked.groupBy(part_id.alias("part_id")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("key_sum")
    )


@query(
    "q100_append_write",
    """
    SELECT count(*) AS n, sum(r_regionkey)::BIGINT AS key_sum
    FROM (SELECT r_regionkey FROM region UNION ALL SELECT r_regionkey FROM region)
    """,
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    """save_sds(append=) / sds_concat (rt_sds.py:760-776): append-mode
    parquet write sections, then one logical table on read."""
    import tempfile

    r = load_table(spark, sf, "region")
    path = tempfile.mkdtemp(prefix="rts_append_")
    r.write.mode("overwrite").parquet(path)
    r.write.mode("append").parquet(path)
    back = spark.read.parquet(path)
    return back.agg(F.count(F.lit(1)).alias("n"), F.sum("r_regionkey").alias("key_sum"))


@query(
    "q101_categorical_reuse",
    """
    SELECT o_orderpriority,
           round(sum(o_totalprice), 2) AS total,
           round(avg(o_totalprice), 4) AS avg_price,
           count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    """Categorical reusable grouping (rt_categorical.py:1284): factorize
    once, aggregate many times — the persisted keyed relation serves
    three aggregations; the scan runs once."""
    o = load_table(spark, sf, "orders").select("o_orderpriority", "o_totalprice")
    cat = Categorical(o, ["o_orderpriority"])
    a = cat.sum("o_totalprice").df.select(
        "o_orderpriority", F.round(F.col("Sum"), 2).alias("total")
    )
    b = cat.mean("o_totalprice").df.select(
        "o_orderpriority", F.round(F.col("Mean"), 4).alias("avg_price")
    )
    c = cat.count().df.select("o_orderpriority", F.col("Count").alias("n"))
    return a.join(b, "o_orderpriority").join(c, "o_orderpriority")


@query(
    "q102_winsorized_zscore",
    """
    WITH b AS (
        SELECT quantile_cont(s_acctbal, 0.05) AS lo, quantile_cont(s_acctbal, 0.95) AS hi
        FROM supplier
    ),
    w AS (
        SELECT s_suppkey, least(greatest(s_acctbal, lo), hi) AS wv
        FROM supplier, b
    ),
    st AS (SELECT avg(wv) AS mu, stddev_samp(wv) AS sd FROM w)
    SELECT s_suppkey, round((wv - mu) / sd, 6) AS z
    FROM w, st
    """,
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    """normalize_zscore ∘ winsorize composition (rt_mlutils.py:12,
    rt_stats.py:83) — the two-stage global-stat broadcast pattern."""
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_acctbal")
    wz = stats.winsorize(s, "s_acctbal", 0.05, 0.95, out_col="wv")
    z = stats.normalize_zscore(wz, "wv", out_col="z")
    return z.select("s_suppkey", F.round("z", 6).alias("z"))


@query(
    "q106_salted_join",
    """
    SELECT l.l_returnflag, count(*) AS n, round(sum(o.o_totalprice), 2) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_returnflag
    """,
)
def q106(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe salted join (SURVEY §4 watch-list): hot l_orderkey rows
    spread over 8 salt buckets; results must be identical to the plain
    join the oracle runs."""
    from .operators import skew

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_returnflag")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    joined = skew.salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        o.withColumnRenamed("o_orderkey", "k"),
        on=["k"],
        salt=8,
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@query(
    "q107_accum2_footer",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(l_quantity), 2) AS Total
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'Total',
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2),
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2),
           round(sum(l_quantity), 2)
    FROM lineitem
    """,
)
def q107(spark: SparkSession, sf: str) -> DataFrame:
    """Accum2 with the column-totals footer row (rt_accum2.py:122-186
    margins + footers): cells and row margin in one conditional agg, the
    footer from a shuffle-free global agg, unioned."""
    from .operators import accum

    li = load_table(spark, sf, "lineitem")
    out = accum.accum2_with_footer(
        li, "l_returnflag", "l_linestatus", F.sum, "l_quantity", pivot_values=["F", "O"]
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("F"), 2).alias("F"),
        F.round(F.col("O"), 2).alias("O"),
        F.round(F.col("Total"), 2).alias("Total"),
    )


@query(
    "q108_embedding_dups",
    """
    WITH emb AS (SELECT * FROM embeddings WHERE vec_id < 1000)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cos_sim
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
          / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
           * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
    """,
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (beyond-reference dedup
    flavor): exact all-pairs baseline kept ONLY as the recall oracle;
    the production path is similarity.lsh_dedup_pairs (q114), whose
    candidate generation is an equi-join on LSH buckets. Threshold 0.4 (synthetic embeddings peak at cos≈0.51) yields a
    non-trivial pair set; no pair sits within float error of it.
    vec_id < 1000 caps the O(n²) baseline's gate cost (covers the full
    corpus at sf≤0.01; at sf0.1 a 1000-vector slice is plenty for a
    recall oracle — the LSH/IVF/PQ family is the scale path)."""
    from .operators import similarity

    e = load_table(spark, sf, "embeddings").where(F.col("vec_id") < 1000)
    out = similarity.pairwise_cosine(e, threshold=0.4)
    return out.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))


@query(
    "q109_merge_suffixes",
    """
    SELECT n.n_nationkey,
           n.name AS name_x, r.name AS name_y,
           n.n_regionkey
    FROM (SELECT n_nationkey, n_name AS name, n_regionkey FROM nation) n
    JOIN (SELECT r_regionkey, r_name AS name FROM region) r
      ON n.n_regionkey = r.r_regionkey
    """,
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    """merge2 suffix disambiguation (rt_merge.py:2293 suffixes=): the
    colliding non-key column 'name' gets _x/_y suffixes exactly as the
    reference's tuple-rename machinery does."""
    from .operators import merge

    n = load_table(spark, sf, "nation").select(
        "n_nationkey", F.col("n_name").alias("name"), "n_regionkey"
    )
    r = load_table(spark, sf, "region").select(
        "r_regionkey", F.col("r_name").alias("name")
    )
    out = merge.merge2(
        n, r, left_on=["n_regionkey"], right_on=["r_regionkey"], how="inner",
        suffixes=("_x", "_y"), broadcast_right=True,
    )
    return out.select("n_nationkey", "name_x", "name_y", "n_regionkey")


@query(
    "q110_timezone",
    """
    SELECT is_dst, count(*) AS n, min(off_s)::BIGINT AS min_off, max(off_s)::BIGINT AS max_off
    FROM (
        SELECT (epoch(timezone('America/New_York', ts)) - epoch(ts))::BIGINT AS off_s,
               (epoch(timezone('America/New_York', ts)) - epoch(ts)) = 4*3600 AS is_dst
        FROM events
    )
    GROUP BY is_dst
    """,
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    """TimeZone to_utc / fix_dst / is_dst (rt_timezone.py:1294/1237,
    rt_datetime is_dst): interpret wall-clock as America/New_York and
    convert to UTC with the JVM tzdb; the UTC−wall offset identifies DST.
    (The reference ships hand-rolled NYC/Dublin transition tables —
    rt_timezone.py:28-1000; the tz database replaces them.)"""
    ev = load_table(spark, sf, "events")
    off = F.unix_seconds(F.to_utc_timestamp(F.col("ts"), "America/New_York")) - F.unix_seconds(F.col("ts"))
    return (
        ev.select(off.alias("off_s"))
        .select("off_s", (F.col("off_s") == 4 * 3600).alias("is_dst"))
        .groupBy("is_dst")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("off_s").alias("min_off"),
            F.max("off_s").alias("max_off"),
        )
    )


@query(
    "q111_apply_rows",
    """
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charge
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    """Dataset.apply_rows (rt_dataset.py:7292) — mapInPandas row
    transform (Arrow batch iterator), aggregated after so the whole
    Python-worker path is oracle-checked end-to-end."""
    from .dataset import Dataset

    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount", "l_tax"
    )

    def add_charge(it):
        for pdf in it:
            pdf = pdf.copy()
            pdf["charge"] = pdf["l_extendedprice"] * (1 - pdf["l_discount"]) * (1 + pdf["l_tax"])
            yield pdf

    schema = "l_returnflag string, l_extendedprice double, l_discount double, l_tax double, charge double"
    out = Dataset(li).apply_rows(add_charge, schema).df
    return out.groupBy("l_returnflag").agg(F.round(F.sum("charge"), 2).alias("charge"))


@query(
    "q112_filtered_agg_showfilter",
    """
    SELECT l_returnflag AS bin,
           round(sum(CASE WHEN l_quantity > 20 THEN l_extendedprice END), 2) AS price_sum,
           count(CASE WHEN l_quantity > 20 THEN 1 END) AS n
    FROM lineitem GROUP BY l_returnflag
    UNION ALL
    SELECT 'Filtered',
           round(sum(CASE WHEN NOT (l_quantity > 20) THEN l_extendedprice END), 2),
           count(CASE WHEN NOT (l_quantity > 20) THEN 1 END)
    FROM lineitem
    """,
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    """Fused-filter aggregation with showfilter (rt_grouping.py:3319-3327
    bin-0 trick): the filter rides INSIDE the aggregation as a when-mask
    (no pre-filter scan pass), and showfilter surfaces the filtered-out
    bin as an extra row from a shuffle-free global agg."""
    li = load_table(spark, sf, "lineitem")
    flt = F.col("l_quantity") > 20
    body = li.groupBy(F.col("l_returnflag").alias("bin")).agg(
        F.round(gb.nansum(F.col("l_extendedprice"), flt), 2).alias("price_sum"),
        gb.count(flt).alias("n"),
    )
    showfilter = li.agg(
        F.round(gb.nansum(F.col("l_extendedprice"), ~flt), 2).alias("price_sum"),
        gb.count(~flt).alias("n"),
    ).select(F.lit("Filtered").alias("bin"), "price_sum", "n")
    return body.unionByName(showfilter)


def _ivf_centroids() -> list[list[float]]:
    """4 deterministic unit-ish centroids in 64-dim (same LCG as the LSH
    hyperplanes — reproducible in the oracle as literals)."""
    from .operators.similarity import _hyperplanes

    return _hyperplanes(64, 4, seed=7)


def _ivf_oracle() -> str:
    cents = _ivf_centroids()
    lits = [
        "[" + ", ".join(repr(x) for x in c) + "]::DOUBLE[]" for c in cents
    ]
    dist = [
        f"list_distance(embedding::DOUBLE[], {lit})" for lit in lits
    ]
    best = "LEAST(" + ", ".join(dist) + ")"
    case = " ".join(
        f"WHEN {d} = best THEN {i}" for i, d in enumerate(dist)
    )
    return f"""
    SELECT cid, count(*) AS n
    FROM (
        SELECT CASE {case} END AS cid
        FROM (SELECT embedding, {best} AS best FROM embeddings)
    )
    GROUP BY cid
    """


@query("q113_ivf_assign", _ivf_oracle())
def q113(spark: SparkSession, sf: str) -> DataFrame:
    """IVF coarse quantizer (beyond-reference ANN scale path): nearest of
    4 deterministic centroids per vector, broadcast cross join + windowed
    argmin; counts per inverted list. At 100 TB the assignment is written
    partitioned by cid and partition pruning IS the index.
    Tie-break: DuckDB CASE picks the LOWEST matching cid, mirroring the
    (distance, centroid_id) window order."""
    from .operators import similarity

    e = load_table(spark, sf, "embeddings")
    cents = _ivf_centroids()
    spark_cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "centroid_id int, centroid_vec array<double>"
    )
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    assigned = similarity.ivf_assign(
        e.select("vec_id", dvec.alias("embedding")), spark_cents
    )
    return assigned.groupBy(F.col("centroid_id").alias("cid")).agg(F.count(F.lit(1)).alias("n"))

"""Driver-contract query registry, batch 14 (round-3 session 9,
q470+): entity-resolution threshold curves, graph assortativity,
robust location estimation, and the continuing analytics surface.
Registers into the same QUERIES/ORACLES dicts as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries import query
from .sources.io import load_table



# ------------------------------------------------------------------ q470
@query(
    "q470_blocking_threshold_curve",
    r"""
    WITH toks AS (
        SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS tok
        FROM documents WHERE doc_id < 100
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
        SELECT x.doc_id AS a, y.doc_id AS b
        FROM documents x JOIN documents y
          ON regexp_replace(lower(trim(x.text)), '\s+', ' ', 'g')
             = regexp_replace(lower(trim(y.text)), '\s+', ' ', 'g')
         AND x.doc_id < y.doc_id
        WHERE x.doc_id < 100 AND y.doc_id < 100 AND x.text IS NOT NULL
    ),
    pred_a AS (
        SELECT id_a AS a, id_b AS b FROM inter
        JOIN sizes sa ON inter.id_a = sa.doc_id
        JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE n_shared / (sa.sz + sb.sz - n_shared) >= CAST('0.3' AS DOUBLE)
    ),
    j_a AS (
        SELECT coalesce(p.a, t.a) AS a, coalesce(p.b, t.b) AS b,
               p.a IS NOT NULL AS in_p, t.a IS NOT NULL AS in_t
        FROM pred_a p FULL OUTER JOIN truth t ON p.a = t.a AND p.b = t.b
    ),
    agg_a AS (
        SELECT CAST('0.3' AS DOUBLE) AS threshold,
               CAST(coalesce(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn
        FROM j_a
    ),
    pred_b AS (
        SELECT id_a AS a, id_b AS b FROM inter
        JOIN sizes sa ON inter.id_a = sa.doc_id
        JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE n_shared / (sa.sz + sb.sz - n_shared) >= CAST('0.5' AS DOUBLE)
    ),
    j_b AS (
        SELECT coalesce(p.a, t.a) AS a, coalesce(p.b, t.b) AS b,
               p.a IS NOT NULL AS in_p, t.a IS NOT NULL AS in_t
        FROM pred_b p FULL OUTER JOIN truth t ON p.a = t.a AND p.b = t.b
    ),
    agg_b AS (
        SELECT CAST('0.5' AS DOUBLE) AS threshold,
               CAST(coalesce(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn
        FROM j_b
    ),
    pred_c AS (
        SELECT id_a AS a, id_b AS b FROM inter
        JOIN sizes sa ON inter.id_a = sa.doc_id
        JOIN sizes sb ON inter.id_b = sb.doc_id
        WHERE n_shared / (sa.sz + sb.sz - n_shared) >= CAST('0.8' AS DOUBLE)
    ),
    j_c AS (
        SELECT coalesce(p.a, t.a) AS a, coalesce(p.b, t.b) AS b,
               p.a IS NOT NULL AS in_p, t.a IS NOT NULL AS in_t
        FROM pred_c p FULL OUTER JOIN truth t ON p.a = t.a AND p.b = t.b
    ),
    agg_c AS (
        SELECT CAST('0.8' AS DOUBLE) AS threshold,
               CAST(coalesce(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
               CAST(coalesce(sum(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
               CAST(coalesce(sum(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn
        FROM j_c
    ),
    unioned AS (
        SELECT * FROM agg_a UNION ALL SELECT * FROM agg_b UNION ALL SELECT * FROM agg_c
    )
    SELECT threshold, tp, fp, fn,
           CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
           CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall
    FROM unioned
""",
)
def q470(spark, sf):
    """Blocking-threshold precision/recall curve: q308's token-Jaccard
    candidate generator evaluated against exact-duplicate truth at
    thresholds 0.3/0.5/0.8 — the pair relation is computed ONCE at the
    loosest threshold and filtered per point, so the curve costs one
    extra filter per threshold (operators/dedup.ngram_jaccard_pairs +
    pair_eval machinery)."""
    from .operators import dedup

    d = load_table(spark, sf, "documents").where(F.col("doc_id") < 100)
    pairs = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=1, threshold=0.3)
    dd = d.where(F.col("text").isNotNull())
    norm = dedup.normalize_text(F.col("text"))
    x = dd.select(F.col("doc_id").alias("id_a"), norm.alias("__n__"))
    y = dd.select(F.col("doc_id").alias("id_b"), norm.alias("__n__"))
    truth = x.join(y, on="__n__").where(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    parts = []
    for thr in (0.3, 0.5, 0.8):
        ev = dedup.pair_eval(pairs.where(F.col("jaccard") >= thr), truth)
        parts.append(ev.select(
            F.lit(thr).alias("threshold"),
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            F.coalesce(F.col("fp"), F.lit(0)).cast("long").alias("fp"),
            F.coalesce(F.col("fn"), F.lit(0)).cast("long").alias("fn"),
            "precision", "recall",
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ------------------------------------------------------------------ q471
@query(
    "q471_degree_assortativity",
    """
    WITH base AS (
        SELECT doc_id % 200 AS s, (doc_id * 7 + 3) % 200 AS d FROM documents
        WHERE doc_id % 200 != (doc_id * 7 + 3) % 200
    ),
    e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM base),
    bothdir AS (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM bothdir GROUP BY u),
    j AS (
        SELECT du.d AS du, dv.d AS dv
        FROM bothdir JOIN deg du ON du.u = bothdir.u JOIN deg dv ON dv.u = bothdir.v
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS m2,
               CAST(sum(du) AS BIGINT) AS sx, CAST(sum(dv) AS BIGINT) AS sy,
               CAST(sum(du * du) AS BIGINT) AS sxx, CAST(sum(dv * dv) AS BIGINT) AS syy,
               CAST(sum(du * dv) AS BIGINT) AS sxy
        FROM j
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
    SELECT CAST(m2 / 2 AS BIGINT) AS n_edges, nn.n_nodes,
           CASE WHEN m2 * sxx - sx * sx > 0 AND m2 * syy - sy * sy > 0
                THEN CAST(m2 * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE) * (m2 * syy - sy * sy)) END
             AS assortativity
    FROM g, nn
    """,
)
def q471(spark, sf):
    """Degree assortativity of the q344 document graph
    (operators/mining.degree_assortativity): Pearson correlation of
    endpoint degrees over both edge orientations — exact BIGINT
    moments, one sqrt."""
    from .operators import mining as mn

    d = load_table(spark, sf, "documents")
    base = d.select(
        (F.col("doc_id") % 200).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 200).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return mn.degree_assortativity(base)


# ------------------------------------------------------------------ q472
@query(
    "q472_hodges_lehmann",
    """
    WITH daily AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
        FROM events GROUP BY 1, 2
    ),
    idx AS (
        SELECT event_type, rev,
               row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
        FROM daily
    ),
    pairs AS (
        SELECT a.event_type, (a.rev + b.rev) / 2 AS walsh
        FROM idx a JOIN idx b ON a.event_type = b.event_type AND a.i <= b.i
    ),
    meta AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1)
    SELECT m.event_type, m.n, CAST(count(*) AS BIGINT) AS n_pairs,
           quantile_cont(walsh, 0.5) AS hl_estimate
    FROM pairs p JOIN meta m USING (event_type)
    GROUP BY m.event_type, m.n
    """,
)
def q472(spark, sf):
    """Hodges-Lehmann robust location of each event type's daily
    revenue (functions/stats.hodges_lehmann): the median of all Walsh
    pairwise averages — exact half-integers, so the pair multiset and
    its median are engine-identical."""
    from .functions import stats as st

    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("rev"))
    return st.hodges_lehmann(daily, ["event_type"], "rev", max_n=500)


# ------------------------------------------------------------------ q473
@query(
    "q473_reorder_point",
    """
    WITH daily AS (
        SELECT l_partkey % 100 AS part, CAST(floor(epoch(l_shipdate) / 86400.0) AS BIGINT) AS day,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS d
        FROM lineitem GROUP BY 1, 2
    ),
    m AS (
        SELECT part, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(d) AS BIGINT) AS s, CAST(sum(d * d) AS BIGINT) AS ss
        FROM daily GROUP BY part
    )
    SELECT part, n,
           CAST(s AS DOUBLE) / n AS mean_daily,
           sqrt(CAST(n * ss - s * s AS DOUBLE) / (n * n)) AS sd_daily,
           (CAST(s AS DOUBLE) / n) * 7
             + CAST('1.645' AS DOUBLE) * sqrt(CAST(n * ss - s * s AS DOUBLE) / (n * n))
               * sqrt(CAST(7.0 AS DOUBLE)) AS reorder_point
    FROM m WHERE n > 1
    """,
)
def q473(spark: SparkSession, sf: str) -> DataFrame:
    """Inventory reorder point per part family: μ_d·L + z·σ_d·√L with a
    7-day lead time and z = 1.645 shipped as a STRING literal (DuckDB's
    decimal-literal→double cast is not correctly rounded — ORACLES rule)
    — population moments from exact BIGINT sums, sqrt/divide fixed
    trees (native composition)."""
    li = load_table(spark, sf, "lineitem")
    daily = li.groupBy(
        (F.col("l_partkey") % 100).alias("part"),
        F.floor(F.unix_seconds(F.col("l_shipdate").cast("timestamp")) / 86400).cast("long").alias("day"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("d"))
    m = daily.groupBy("part").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("s"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("ss"),
    ).where(F.col("n") > 1)
    n = F.col("n")
    mean = F.col("s") / n
    sd = F.sqrt((n * F.col("ss") - F.col("s") * F.col("s")).cast("double") / (n * n))
    z = F.lit(1.645)
    return m.select(
        "part", "n", mean.alias("mean_daily"), sd.alias("sd_daily"),
        (mean * 7 + z * sd * F.sqrt(F.lit(7.0))).alias("reorder_point"),
    )


# ------------------------------------------------------------------ q474
def _q474_oracle() -> str:
    # Erlang-B recurrence B_k = rho*B_{k-1} / (k + rho*B_{k-1}), B_0 = 1,
    # unrolled for k = 1..10 as ONE fixed expression tree per row.
    b = "CAST(1.0 AS DOUBLE)"
    for k in range(1, 11):
        b = f"((rho * {b}) / ({k} + rho * {b}))"
    return f"""
    WITH traffic AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_calls,
               CAST(sum(CAST(round(value * 100) AS BIGINT) % 600 + 60) AS BIGINT)
                 AS hold_s
        FROM events GROUP BY event_type
    ),
    f AS (
        SELECT event_type, n_calls, hold_s,
               CAST(hold_s AS DOUBLE) / 86400 AS rho
        FROM traffic
    )
    SELECT event_type, n_calls, hold_s, rho, {b} AS blocking_prob
    FROM f
    """


@query("q474_erlang_b", _q474_oracle())
def q474(spark: SparkSession, sf: str) -> DataFrame:
    """Erlang-B blocking probability at 10 servers per event type: the
    classic recurrence B_k = ρB_{k−1}/(k + ρB_{k−1}) UNROLLED into one
    fixed expression tree (offered load ρ from exact integer hold-time
    sums), so the whole telecom formula is engine-identical without a
    single loop or UDF (native composition)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    traffic = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.sum(cents % 600 + 60).cast("long").alias("hold_s"),
    )
    rho = F.col("hold_s").cast("double") / 86400
    b = F.lit(1.0)
    for k in range(1, 11):
        b = (rho * b) / (F.lit(k) + rho * b)
    return traffic.select(
        "event_type", "n_calls", "hold_s", rho.alias("rho"), b.alias("blocking_prob")
    )


# ------------------------------------------------------------------ q475
@query(
    "q475_impossible_travel",
    """
    WITH f AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id,
               (CAST(round(value * 100) AS BIGINT) * 37) % 1000 AS gx,
               (CAST(round(value * 100) AS BIGINT) * 91) % 1000 AS gy
        FROM events
    ),
    lagged AS (
        SELECT user_id, event_id, tus, gx, gy,
               lag(gx) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS px,
               lag(gy) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS py,
               lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS pt
        FROM f
    )
    SELECT user_id, event_id,
           CAST((gx - px) * (gx - px) + (gy - py) * (gy - py) AS BIGINT) AS d2,
           CAST((tus - pt) // 1000000 AS BIGINT) AS dt_s,
           ((gx - px) * (gx - px) + (gy - py) * (gy - py)) * 12960000
             > 25 * ((tus - pt) // 1000000) * ((tus - pt) // 1000000) AS impossible
    FROM lagged WHERE pt IS NOT NULL
    """,
)
def q475(spark: SparkSession, sf: str) -> DataFrame:
    """Impossible-travel detection (security staple): consecutive
    logins per user on a synthetic planar grid, flagged when implied
    speed exceeds 5 units/hour — the test runs as the cross-multiplied
    integer comparison d²·(3600µs/h)² > v²·Δt², so no float speed or
    sqrt ever exists (native composition over the lag machinery)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.select(
        "user_id", F.unix_micros(F.col("ts")).alias("tus"), "event_id",
        ((cents * 37) % 1000).alias("gx"), ((cents * 91) % 1000).alias("gy"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    lagged = f.select(
        "user_id", "event_id", "tus", "gx", "gy",
        F.lag("gx").over(w).alias("px"), F.lag("gy").over(w).alias("py"),
        F.lag("tus").over(w).alias("pt"),
    ).where(F.col("pt").isNotNull())
    dx = F.col("gx") - F.col("px")
    dy = F.col("gy") - F.col("py")
    d2 = dx * dx + dy * dy
    dt_s = F.floor((F.col("tus") - F.col("pt")) / 1_000_000).cast("long")
    return lagged.select(
        "user_id", "event_id",
        d2.cast("long").alias("d2"), dt_s.alias("dt_s"),
        (d2 * F.lit(12_960_000) > F.lit(25) * dt_s * dt_s).alias("impossible"),
    )


# ------------------------------------------------------------------ q476
@query(
    "q476_ledger_match",
    """
    WITH pay AS (
        SELECT event_id AS pay_id, user_id AS acct, epoch_us(ts) AS ptus,
               CAST(round(value * 100) AS BIGINT) AS amount
        FROM events WHERE event_id % 3 = 0
    ),
    inv AS (
        SELECT event_id AS inv_id, user_id AS acct, epoch_us(ts) AS itus,
               CAST(round(value * 100) AS BIGINT) + (event_id % 150) - 75 AS amount
        FROM events WHERE event_id % 3 = 1
    ),
    cand AS (
        SELECT p.pay_id, p.acct, p.amount AS pay_amount,
               i.inv_id, i.amount AS inv_amount,
               abs(p.amount - i.amount) AS amt_diff,
               abs(p.ptus - i.itus) AS t_diff
        FROM pay p JOIN inv i
          ON i.acct = p.acct AND abs(p.amount - i.amount) <= 100
    ),
    best AS (
        SELECT pay_id, acct, pay_amount, inv_id, inv_amount, amt_diff,
               row_number() OVER (PARTITION BY pay_id
                                  ORDER BY amt_diff, t_diff, inv_id) AS rn
        FROM cand
    )
    SELECT pay_id, acct, pay_amount, inv_id, inv_amount, amt_diff
    FROM best WHERE rn = 1
    """,
)
def q476(spark: SparkSession, sf: str) -> DataFrame:
    """Payment-to-invoice reconciliation: per payment, the best invoice
    on the same account within 100 cents (closest amount, then closest
    time, then id — a fully integer deterministic ranking).  The
    candidate join is an equi-join on the account (amounts filter
    post-join), never a cartesian — the fintech matching staple
    (native composition over grouped_topk ranking)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pay = ev.where(F.col("event_id") % 3 == 0).select(
        F.col("event_id").alias("pay_id"), F.col("user_id").alias("acct"),
        F.unix_micros(F.col("ts")).alias("ptus"), cents.alias("pay_amount"),
    )
    inv = ev.where(F.col("event_id") % 3 == 1).select(
        F.col("event_id").alias("inv_id"), F.col("user_id").alias("acct"),
        F.unix_micros(F.col("ts")).alias("itus"),
        (cents + (F.col("event_id") % 150) - 75).alias("inv_amount"),
    )
    cand = pay.join(inv, on="acct").where(
        F.abs(F.col("pay_amount") - F.col("inv_amount")) <= 100
    ).select(
        "pay_id", "acct", "pay_amount", "inv_id", "inv_amount",
        F.abs(F.col("pay_amount") - F.col("inv_amount")).alias("amt_diff"),
        F.abs(F.col("ptus") - F.col("itus")).alias("t_diff"),
    )
    w = Window.partitionBy("pay_id").orderBy("amt_diff", "t_diff", "inv_id")
    return cand.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
        "pay_id", "acct", "pay_amount", "inv_id", "inv_amount", "amt_diff"
    )


# ------------------------------------------------------------------ q477
def _q477_oracle() -> str:
    cells = ", ".join(
        f"CAST(coalesce(min(CASE WHEN pos = {p} THEN c END), 0) AS BIGINT) AS c{p}, "
        f"CAST(coalesce(min(CASE WHEN pos = {p} THEN i END), 0) AS BIGINT) AS i{p}"
        for p in range(1, 6)
    )
    # expected clicks per type: Σ_p i_p(type) · ctr_p(global), summed in
    # fixed position order as one expression
    exp_terms = " + ".join(
        f"(t.i{p} * (CAST(g.c{p} AS DOUBLE) / g.i{p}))" for p in range(1, 6)
    )
    return f"""
    WITH f AS (
        SELECT event_type, CAST(event_id % 5 + 1 AS BIGINT) AS pos,
               CASE WHEN CAST(round(value * 100) AS BIGINT) % (event_id % 5 + 2) = 0
                    THEN 1 ELSE 0 END AS click
        FROM events
    ),
    cnt AS (
        SELECT event_type, pos, CAST(sum(click) AS BIGINT) AS c,
               CAST(count(*) AS BIGINT) AS i
        FROM f GROUP BY 1, 2
    ),
    per_type AS (SELECT event_type, {cells} FROM cnt GROUP BY event_type),
    gbl AS (
        SELECT {cells} FROM (
            SELECT pos, CAST(sum(c) AS BIGINT) AS c, CAST(sum(i) AS BIGINT) AS i
            FROM cnt GROUP BY pos
        )
    )
    SELECT t.event_type,
           CAST(t.c1 + t.c2 + t.c3 + t.c4 + t.c5 AS BIGINT) AS clicks,
           CAST(t.i1 + t.i2 + t.i3 + t.i4 + t.i5 AS BIGINT) AS impressions,
           ({exp_terms}) AS expected_clicks,
           CAST(t.c1 + t.c2 + t.c3 + t.c4 + t.c5 AS DOUBLE) / ({exp_terms}) AS coec
    FROM per_type t, gbl g
    """


@query("q477_coec_ctr", _q477_oracle())
def q477(spark: SparkSession, sf: str) -> DataFrame:
    """Position-normalized click quality (COEC — clicks over expected
    clicks): each type's clicks divided by the clicks expected from the
    GLOBAL per-position CTR curve at its impression mix.  The five
    position terms pivot into fixed columns and sum in literal order
    (the bm25 float discipline); every count is an exact BIGINT (native
    composition)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pos = (F.col("event_id") % 5 + 1).cast("long")
    f = ev.select(
        "event_type", pos.alias("pos"),
        (cents % (F.col("event_id") % 5 + 2) == 0).cast("long").alias("click"),
    )
    cnt = f.groupBy("event_type", "pos").agg(
        F.sum("click").cast("long").alias("c"), F.count(F.lit(1)).cast("long").alias("i")
    )
    def pivot(df, keys):
        aggs = []
        for p in range(1, 6):
            aggs.append(F.coalesce(F.min(F.when(F.col("pos") == p, F.col("c"))), F.lit(0)).cast("long").alias(f"c{p}"))
            aggs.append(F.coalesce(F.min(F.when(F.col("pos") == p, F.col("i"))), F.lit(0)).cast("long").alias(f"i{p}"))
        return df.groupBy(*keys).agg(*aggs) if keys else df.groupBy().agg(*aggs)
    per_type = pivot(cnt, ["event_type"])
    glob = pivot(
        cnt.groupBy("pos").agg(F.sum("c").cast("long").alias("c"), F.sum("i").cast("long").alias("i")),
        [],
    )
    j = per_type.crossJoin(F.broadcast(glob.select(*[F.col(f"c{p}").alias(f"gc{p}") for p in range(1, 6)],
                                                   *[F.col(f"i{p}").alias(f"gi{p}") for p in range(1, 6)])))
    clicks = sum((F.col(f"c{p}") for p in range(2, 6)), F.col("c1"))
    imps = sum((F.col(f"i{p}") for p in range(2, 6)), F.col("i1"))
    expected = None
    for p in range(1, 6):
        term = F.col(f"i{p}") * (F.col(f"gc{p}").cast("double") / F.col(f"gi{p}"))
        expected = term if expected is None else expected + term
    return j.select(
        "event_type",
        clicks.cast("long").alias("clicks"),
        imps.cast("long").alias("impressions"),
        expected.alias("expected_clicks"),
        (clicks.cast("double") / expected).alias("coec"),
    )


# ------------------------------------------------------------------ q478
@query(
    "q478_raking_ipf",
    """
    WITH f AS (
        SELECT event_type AS r,
               CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS c
        FROM events
    ),
    cell AS (SELECT r, c, CAST(count(*) AS BIGINT) AS n FROM f GROUP BY 1, 2),
    rown AS (SELECT r, CAST(sum(n) AS BIGINT) AS nr FROM cell GROUP BY r),
    cellf AS (
        SELECT cell.r, cell.c, cell.n, rown.nr, CASE WHEN r = 'click' THEN CAST(2000 AS DOUBLE) / nr WHEN r = 'error' THEN CAST(2000 AS DOUBLE) / nr WHEN r = 'purchase' THEN CAST(2000 AS DOUBLE) / nr WHEN r = 'signup' THEN CAST(2000 AS DOUBLE) / nr WHEN r = 'view' THEN CAST(2000 AS DOUBLE) / nr END AS rf
        FROM cell JOIN rown USING (r)
    ),
    piv AS (
        SELECT c, coalesce(min(CASE WHEN r = 'click' THEN n * rf END), CAST(0.0 AS DOUBLE)) AS m0, coalesce(min(CASE WHEN r = 'error' THEN n * rf END), CAST(0.0 AS DOUBLE)) AS m1, coalesce(min(CASE WHEN r = 'purchase' THEN n * rf END), CAST(0.0 AS DOUBLE)) AS m2, coalesce(min(CASE WHEN r = 'signup' THEN n * rf END), CAST(0.0 AS DOUBLE)) AS m3, coalesce(min(CASE WHEN r = 'view' THEN n * rf END), CAST(0.0 AS DOUBLE)) AS m4 FROM cellf GROUP BY c
    ),
    colf AS (
        SELECT c,
               CASE WHEN c = 'even' THEN CAST(5000 AS DOUBLE) / (m0 + m1 + m2 + m3 + m4)
                    WHEN c = 'odd' THEN CAST(5000 AS DOUBLE) / (m0 + m1 + m2 + m3 + m4) END AS gf
        FROM piv
    )
    SELECT cellf.r AS event_type, cellf.c AS parity, cellf.n,
           cellf.rf AS row_factor, colf.gf AS col_factor,
           cellf.rf * colf.gf AS weight,
           cellf.n * cellf.rf * colf.gf AS weighted_mass
    FROM cellf JOIN colf ON colf.c = cellf.c
""",
)
def q478(spark, sf):
    """Survey raking / iterative proportional fitting, one full cycle
    (functions/stats.raking_ipf): cell weights hitting literal row
    targets (2000 per event type) then column targets (5000 per user
    parity).  The column-mass fold runs over FIXED literal row columns
    (rule 22 — never a float aggregation), so factors and weights are
    engine-identical fixed trees."""
    from .functions import stats as st

    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("parity"),
    )
    out = st.raking_ipf(
        ev, "event_type", "parity",
        {"click": 2000, "error": 2000, "purchase": 2000, "signup": 2000, "view": 2000},
        {"even": 5000, "odd": 5000},
    )
    return out


# ------------------------------------------------------------------ q479
@query(
    "q479_time_decay_attribution",
    """
    WITH f AS (
        SELECT user_id, epoch_us(ts) AS tus, event_id,
               CASE WHEN event_type IN ('click', 'view') THEN 1 ELSE 0 END AS touch,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
        FROM events
    ),
    nxt AS (
        SELECT user_id, tus, event_id, touch,
               min(CASE WHEN conv = 1 THEN tus END)
                 OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ct
        FROM f
    ),
    touches AS (
        SELECT user_id, tus, event_id, ct,
               least(CAST((ct - tus) // 604800000000 AS BIGINT), 62) AS b
        FROM nxt WHERE touch = 1 AND ct IS NOT NULL
    ),
    kk AS (
        SELECT user_id, tus, event_id, ct, b,
               max(b) OVER (PARTITION BY user_id, ct) AS k
        FROM touches
    ),
    wts AS (
        SELECT user_id, tus, event_id, ct, b,
               (CAST(1 AS BIGINT) << CAST(k - b AS INT)) AS ws
        FROM kk
    )
    SELECT user_id, tus, event_id, ct AS conversion_us, b AS age_buckets,
           ws AS weight_scaled,
           CAST(sum(ws) OVER (PARTITION BY user_id, ct) AS BIGINT) AS total_scaled,
           CAST(ws AS DOUBLE)
             / sum(ws) OVER (PARTITION BY user_id, ct) AS credit
    FROM wts
    """,
)
def q479(spark: SparkSession, sf: str) -> DataFrame:
    """Time-decay multi-touch attribution with DYADIC half-life decay
    (operators/window.attribute_time_decay): a touch k half-lives (7
    days) before its next conversion weighs 2^−k — powers of two make
    every weight an exact integer after rebasing, so credits are single
    divides with no exp() anywhere."""
    from .operators import window as win

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id",
        F.col("event_type").isin("click", "view").cast("int").alias("touch"),
        (F.col("event_type") == "purchase").cast("int").alias("conv"),
    )
    out = win.attribute_time_decay(
        ev, "user_id", "ts", "touch", "conv", half_life_days=7, order_tiebreak="event_id"
    )
    return out.select(
        "user_id", F.unix_micros(F.col("ts")).alias("tus"), "event_id",
        "conversion_us", "age_buckets", "weight_scaled", "total_scaled", "credit",
    )


# ------------------------------------------------------------------ q480
@query(
    "q480_prefix_autocomplete",
    r"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> length(x) >= 3)) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    counts AS (
        SELECT substr(tok, 1, 3) AS prefix, tok, CAST(count(*) AS BIGINT) AS cnt
        FROM toks GROUP BY 1, 2
    )
    SELECT prefix, tok AS completion, cnt FROM (
        SELECT prefix, tok, cnt,
               row_number() OVER (PARTITION BY prefix ORDER BY cnt DESC, tok) AS rn
        FROM counts
    ) WHERE rn = 1
    """,
)
def q480(spark: SparkSession, sf: str) -> DataFrame:
    """Prefix autocomplete table: the most frequent completion for
    every 3-character token prefix (count desc, lexicographic
    tie-break) — the WindowGroupLimit streaming-top-k shape over the
    (prefix, token) aggregate (native composition with
    window.grouped_topk)."""
    from .operators.dedup import normalize_text
    from .operators.window import grouped_topk

    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda x: F.length(x) >= 3
    )
    counts = (
        d.select(F.explode(toks).alias("tok"))
        .groupBy(F.substring("tok", 1, 3).alias("prefix"), "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    top = grouped_topk(counts, ["prefix"], "cnt", k=1, tiebreak=["tok"])
    return top.select("prefix", F.col("tok").alias("completion"), "cnt")


# ------------------------------------------------------------------ q481
@query(
    "q481_hotspot_gi",
    """
    WITH pts AS (
        SELECT (CAST(round(value * 100) AS BIGINT) * 37) % 1000 // 100 AS cx,
               (CAST(round(value * 100) AS BIGINT) * 91) % 1000 // 100 AS cy
        FROM events
    ),
    cells AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS nc,
               CAST(sum(n) AS BIGINT) AS s1, CAST(sum(n * n) AS BIGINT) AS s2
        FROM cells
    ),
    stencil AS (
        SELECT c.cx, c.cy, c.n, c.cx + dx.o AS px, c.cy + dy.o AS py
        FROM cells c,
             (SELECT unnest([-1, 0, 1]) AS o) dx,
             (SELECT unnest([-1, 0, 1]) AS o) dy
    ),
    nbr AS (
        SELECT s.cx, s.cy, min(s.n) AS n,
               CAST(sum(o.n) AS BIGINT) AS s_i, CAST(count(o.n) AS BIGINT) AS k_i
        FROM stencil s JOIN cells o ON o.cx = s.px AND o.cy = s.py
        GROUP BY s.cx, s.cy
    )
    SELECT nbr.cx, nbr.cy, nbr.n, nbr.s_i, nbr.k_i,
           (nbr.s_i - nbr.k_i * (CAST(st.s1 AS DOUBLE) / st.nc))
             / (sqrt(CAST(st.nc * st.s2 - st.s1 * st.s1 AS DOUBLE) / (st.nc * st.nc))
                * sqrt(CAST(st.nc * nbr.k_i - nbr.k_i * nbr.k_i AS DOUBLE) / (st.nc - 1)))
             AS gi_z
    FROM nbr, stats st
    """,
)
def q481(spark: SparkSession, sf: str) -> DataFrame:
    """Getis-Ord Gi* hotspot z-scores over a synthetic 10×10 activity
    grid: each cell's 3×3 neighborhood sum against the global cell-count
    distribution — the stencil is the grid_neighbor_join equi-join
    discipline, and every statistic composes from exact BIGINT moments
    with fixed divide/sqrt trees (native composition)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pts = ev.select(
        F.floor(((cents * 37) % 1000) / 100).cast("long").alias("cx"),
        F.floor(((cents * 91) % 1000) / 100).cast("long").alias("cy"),
    )
    cells = pts.groupBy("cx", "cy").agg(F.count(F.lit(1)).cast("long").alias("n"))
    stats = cells.agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    stencil = cells.select(
        "cx", "cy", "n",
        F.explode(F.array(*[
            F.struct((F.col("cx") + dx).alias("px"), (F.col("cy") + dy).alias("py"))
            for dx, dy in offs
        ])).alias("p"),
    ).select("cx", "cy", "n", F.col("p.px").alias("px"), F.col("p.py").alias("py"))
    other = cells.select(
        F.col("cx").alias("px"), F.col("cy").alias("py"), F.col("n").alias("no")
    )
    nbr = stencil.join(other, on=["px", "py"]).groupBy("cx", "cy").agg(
        F.min("n").alias("n"),
        F.sum("no").cast("long").alias("s_i"),
        F.count("no").cast("long").alias("k_i"),
    )
    j = nbr.crossJoin(F.broadcast(stats))
    mu = F.col("s1").cast("double") / F.col("nc")
    sigma = F.sqrt((F.col("nc") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
                   / (F.col("nc") * F.col("nc")))
    denom2 = F.sqrt((F.col("nc") * F.col("k_i") - F.col("k_i") * F.col("k_i")).cast("double")
                    / (F.col("nc") - 1))
    return j.select(
        "cx", "cy", "n", "s_i", "k_i",
        ((F.col("s_i") - F.col("k_i") * mu) / (sigma * denom2)).alias("gi_z"),
    )


# ------------------------------------------------------------------ q482
@query(
    "q482_forecast_reconcile",
    """
    WITH hist AS (
        SELECT o_orderpriority AS prio,
               CAST(count(*) AS BIGINT) AS w
        FROM orders WHERE year(o_orderdate) < 2000 GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM hist),
    months AS (SELECT unnest(range(0, 6)) AS m),
    tops AS (SELECT m, CAST(10000 + 500 * m AS BIGINT) AS top_forecast FROM months),
    alloc AS (
        SELECT t.m, t.top_forecast, h.prio, h.w, tt.tw,
               t.top_forecast * h.w // tt.tw AS base_share,
               t.top_forecast * h.w % tt.tw AS rem,
               row_number() OVER (PARTITION BY t.m
                                  ORDER BY t.top_forecast * h.w % tt.tw DESC, h.prio) AS rr
        FROM tops t CROSS JOIN hist h CROSS JOIN tot tt
    ),
    need AS (
        SELECT m, top_forecast - sum(base_share) AS extra FROM alloc GROUP BY m, top_forecast
    )
    SELECT a.m AS month, a.prio,
           CAST(a.base_share + CASE WHEN a.rr <= n.extra THEN 1 ELSE 0 END AS BIGINT)
             AS forecast_units
    FROM alloc a JOIN need n ON n.m = a.m
    """,
)
def q482(spark: SparkSession, sf: str) -> DataFrame:
    """Top-down forecast reconciliation: six monthly top-level forecasts
    apportioned to order priorities by historical share with the
    LARGEST-REMAINDER rule per month — every month's allocation sums
    back to its top-level number EXACTLY (the allocate_proportional /
    rev_schedule discipline applied per group; native composition)."""
    o = load_table(spark, sf, "orders").where(F.year("o_orderdate") < 2000)
    hist = o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.count(F.lit(1)).cast("long").alias("w")
    )
    tot = hist.agg(F.sum("w").cast("long").alias("tw"))
    months = load_table(spark, sf, "region").sparkSession.range(0, 6).select(
        F.col("id").alias("m"), (10000 + 500 * F.col("id")).cast("long").alias("top_forecast")
    )
    alloc = months.crossJoin(hist).crossJoin(F.broadcast(tot)).select(
        "m", "top_forecast", "prio", "w", "tw",
        F.floor(F.col("top_forecast") * F.col("w") / F.col("tw")).cast("long").alias("base_share"),
        (F.col("top_forecast") * F.col("w") % F.col("tw")).alias("rem"),
    )
    w = Window.partitionBy("m").orderBy(F.col("rem").desc(), "prio")
    alloc = alloc.withColumn("rr", F.row_number().over(w))
    need = alloc.groupBy("m", "top_forecast").agg(
        (F.min("top_forecast") - F.sum("base_share")).cast("long").alias("extra")
    ).select("m", "extra")
    j = alloc.join(need, on="m")
    return j.select(
        F.col("m").alias("month"), "prio",
        (F.col("base_share") + (F.col("rr") <= F.col("extra")).cast("long")).cast("long")
        .alias("forecast_units"),
    )


# ------------------------------------------------------------------ q483
@query(
    "q483_partial_corr",
    """
    WITH f AS (
        SELECT CAST(round(value * 100) AS BIGINT) % 100 AS z,
               (CAST(round(value * 100) AS BIGINT) % 100) * 2 + CAST(round(value * 100) AS BIGINT) % 7 AS x,
               (CAST(round(value * 100) AS BIGINT) % 100) * 3 + CAST(round(value * 100) AS BIGINT) % 11 AS y
        FROM events
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(z) AS BIGINT) AS sz,
               CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * z) AS BIGINT) AS sxz,
               CAST(sum(y * z) AS BIGINT) AS syz,
               CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(z * z) AS BIGINT) AS szz
        FROM f
    ),
    r AS (
        SELECT n,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)) AS rxy,
               CAST(n * sxz - sx * sz AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * (n * szz - sz * sz)) AS rxz,
               CAST(n * syz - sy * sz AS DOUBLE)
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE) * (n * szz - sz * sz)) AS ryz
        FROM m
    )
    SELECT n, rxy, rxz, ryz,
           (rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) AS partial_rxy_z
    FROM r
    """,
)
def q483(spark: SparkSession, sf: str) -> DataFrame:
    """Partial correlation r_xy·z on a synthetic confounded triple: the
    three pairwise correlations come from exact BIGINT moments, the
    partial from the standard fixed-tree formula — with x and y both
    driven by z plus independent noise, controlling for z must collapse
    the raw correlation (native composition over the corr_matrix
    moment machinery)."""
    ev = load_table(spark, sf, "events")
    c = F.round(F.col("value") * 100).cast("long")
    z = c % 100
    f = ev.select(
        z.alias("z"), (z * 2 + c % 7).alias("x"), (z * 3 + c % 11).alias("y")
    )
    m = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"), F.sum("y").cast("long").alias("sy"),
        F.sum("z").cast("long").alias("sz"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("z")).cast("long").alias("sxz"),
        F.sum(F.col("y") * F.col("z")).cast("long").alias("syz"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("szz"),
    )
    n = F.col("n")
    def corr(sab, sa, sb, saa, sbb):
        return (n * F.col(sab) - F.col(sa) * F.col(sb)) / F.sqrt(
            (n * F.col(saa) - F.col(sa) * F.col(sa)).cast("double")
            * (n * F.col(sbb) - F.col(sb) * F.col(sb))
        )
    rxy = corr("sxy", "sx", "sy", "sxx", "syy")
    rxz = corr("sxz", "sx", "sz", "sxx", "szz")
    ryz = corr("syz", "sy", "sz", "syy", "szz")
    out = m.select("n", rxy.alias("rxy"), rxz.alias("rxz"), ryz.alias("ryz"))
    return out.select(
        "n", "rxy", "rxz", "ryz",
        ((F.col("rxy") - F.col("rxz") * F.col("ryz"))
         / F.sqrt((1 - F.col("rxz") * F.col("rxz")) * (1 - F.col("ryz") * F.col("ryz"))))
        .alias("partial_rxy_z"),
    )


# ------------------------------------------------------------------ q484
_Q484_COS = (
    "list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
    " / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
    " * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[])))"
)


@query(
    "q484_nearest_centroid_eval",
    f"""
    WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    sums AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_l, i,
               sum(v[i]) AS s
        FROM base, range(1, 65) t(i) GROUP BY label, i
    ),
    cents AS (
        SELECT label, list(s / n_l ORDER BY i) AS cv FROM sums GROUP BY label, n_l
    ),
    assigned AS (
        SELECT b.vec_id, b.label AS true_label, c.label AS pred_label
        FROM (
            SELECT b.vec_id, b.label, c.label AS clabel,
                   row_number() OVER (PARTITION BY b.vec_id
                                      ORDER BY {_Q484_COS.format(a='b.v', b='c.cv')} DESC,
                                               c.label) AS rn
            FROM base b, cents c
        ) x
        JOIN base b ON b.vec_id = x.vec_id
        JOIN cents c ON c.label = x.clabel
        WHERE x.rn = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(sum(CASE WHEN true_label = pred_label THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS accuracy
    FROM assigned
    """,
)
def q484(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-centroid classifier evaluation on the embeddings table:
    per-label mean vectors (exact per-dim sums, one divide), each
    vector assigned to its max-cosine centroid (identical-double
    ranking, label tie-break), accuracy from exact counts — the
    sanity-check eval every embedding space gets (native composition
    over group_centroids/ivf_assign machinery)."""
    from .operators.similarity import cosine

    e = load_table(spark, sf, "embeddings")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", "label", dvec.alias("v"))
    sums = base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_l"),
        *[F.sum(F.element_at("v", i + 1)).alias(f"s{i}") for i in range(64)],
    )
    cents = sums.select(
        F.col("label").alias("clabel"),
        F.array(*[F.col(f"s{i}") / F.col("n_l") for i in range(64)]).alias("cv"),
    )
    crossed = base.crossJoin(F.broadcast(cents))
    scored = crossed.select(
        "vec_id", "label", "clabel", cosine(F.col("v"), F.col("cv")).alias("cs")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cs").desc(), F.col("clabel"))
    assigned = scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return assigned.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("label") == F.col("clabel")).cast("long")).cast("long").alias("n_correct"),
    ).select(
        "n", "n_correct", (F.col("n_correct") / F.col("n")).alias("accuracy")
    )


# ------------------------------------------------------------------ q485
@query(
    "q485_graph_summary",
    """
    WITH base AS (
        SELECT doc_id % 200 AS s, (doc_id * 7 + 3) % 200 AS d FROM documents
        WHERE doc_id % 200 != (doc_id * 7 + 3) % 200
    ),
    e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM base),
    bothdir AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM bothdir GROUP BY u),
    tri AS (
        SELECT CAST(count(*) AS BIGINT) AS n_tri FROM (
            SELECT ab.a, ab.b, bc.b AS c
            FROM e ab JOIN e bc ON bc.a = ab.b
            JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
        )
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(d) AS BIGINT) AS deg_sum,
               CAST(max(d) AS BIGINT) AS max_degree
        FROM deg
    ),
    ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
    SELECT agg.n_nodes, ne.n_edges, agg.max_degree,
           CAST(agg.deg_sum AS DOUBLE) / agg.n_nodes AS avg_degree,
           CAST(2 * ne.n_edges AS DOUBLE) / (agg.n_nodes * (agg.n_nodes - 1)) AS density,
           tri.n_tri AS n_triangles
    FROM agg, ne, tri
    """,
)
def q485(spark: SparkSession, sf: str) -> DataFrame:
    """One-row graph profile of the q344 document graph: nodes, edges,
    max/avg degree, density, and the oriented triangle count — the
    summary card a graph pipeline prints before running anything
    expensive (composes operators/mining.triangle_count with the degree
    machinery; all exact integers + single divides)."""
    from .operators import mining as mn

    d = load_table(spark, sf, "documents")
    base = d.select(
        (F.col("doc_id") % 200).alias("s"), ((F.col("doc_id") * 7 + 3) % 200).alias("d")
    ).where(F.col("s") != F.col("d"))
    e = base.select(
        F.least("s", "d").alias("a"), F.greatest("s", "d").alias("b")
    ).distinct()
    bothdir = e.select(F.col("a").alias("u")).unionByName(e.select(F.col("b").alias("u")))
    deg = bothdir.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("dg"))
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("dg").cast("long").alias("deg_sum"),
        F.max("dg").cast("long").alias("max_degree"),
    )
    tri = mn.triangle_count(e.select(F.col("a").alias("item_a"), F.col("b").alias("item_b")))
    j = agg.crossJoin(F.broadcast(tri))
    return j.select(
        "n_nodes", "n_edges", "max_degree",
        (F.col("deg_sum") / F.col("n_nodes")).alias("avg_degree"),
        ((2 * F.col("n_edges")) / (F.col("n_nodes") * (F.col("n_nodes") - 1))).alias("density"),
        F.col("n_triangles").alias("n_triangles"),
    )


# ------------------------------------------------------------------ q486
@query(
    "q486_seasonal_mase",
    """
    WITH f AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS hr,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS a
        FROM events GROUP BY 1, 2
    ),
    fc AS (
        SELECT event_type, hr, a, CAST(hr % 40000 + 100 AS BIGINT) AS pred FROM f
    ),
    w AS (
        SELECT event_type, a, pred, pred - a AS e,
               abs(a - lag(a, 24) OVER (PARTITION BY event_type ORDER BY hr)) AS naive
        FROM fc
    ),
    g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(e) AS BIGINT) AS sum_e,
               CAST(sum(abs(e)) AS BIGINT) AS sum_ae,
               CAST(sum(abs(a)) AS BIGINT) AS sum_aa,
               CAST(sum(abs(a) + abs(pred)) AS BIGINT) AS sum_af,
               CAST(sum(naive) AS BIGINT) AS sum_naive
        FROM w GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(sum_e AS DOUBLE) / n AS bias,
           CAST(sum_ae AS DOUBLE) / n AS mae,
           CASE WHEN sum_aa > 0 THEN CAST(sum_ae AS DOUBLE) / sum_aa END AS wape,
           CASE WHEN sum_af > 0 THEN CAST(2 * sum_ae AS DOUBLE) / sum_af END AS smape,
           CASE WHEN n > 24 AND sum_naive > 0
                THEN CAST(sum_ae * (n - 24) AS DOUBLE) / (n * sum_naive) END AS mase
    FROM g
    """,
)
def q486(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal MASE (m = 24 hours) over hourly revenue series
    (functions/stats.forecast_accuracy(seasonal_period=24)): the scaled
    error now benchmarks against the seasonal-naive lag-24 walk — the
    fair baseline for any series with a daily cycle."""
    from .functions import stats as st

    ev = load_table(spark, sf, "events")
    f = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 3600).cast("long").alias("hr"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("a"))
    fc = f.select(
        "event_type", "hr", "a", (F.col("hr") % 40000 + 100).cast("long").alias("pred")
    )
    return st.forecast_accuracy(fc, ["event_type"], "a", "pred", ["hr"], seasonal_period=24)


# ------------------------------------------------------------------ q487
@query(
    "q487_cost_allocation",
    """
    WITH direct AS (
        SELECT user_id % 8 AS team,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS direct_cents,
               CAST(count(*) AS BIGINT) AS usage
        FROM events GROUP BY 1
    ),
    shared AS (SELECT CAST(1000000 AS BIGINT) AS pool),
    tot AS (SELECT CAST(sum(usage) AS BIGINT) AS tu FROM direct),
    alloc AS (
        SELECT d.team, d.direct_cents, d.usage,
               s.pool * d.usage // t.tu AS base_share,
               s.pool * d.usage % t.tu AS rem,
               row_number() OVER (ORDER BY s.pool * d.usage % t.tu DESC, d.team) AS rr,
               s.pool
        FROM direct d, shared s, tot t
    ),
    need AS (SELECT CAST(min(pool) - sum(base_share) AS BIGINT) AS extra FROM alloc)
    SELECT a.team, a.direct_cents, a.usage,
           CAST(a.base_share + CASE WHEN a.rr <= n.extra THEN 1 ELSE 0 END AS BIGINT)
             AS shared_cents,
           CAST(a.direct_cents + a.base_share
                + CASE WHEN a.rr <= n.extra THEN 1 ELSE 0 END AS BIGINT) AS total_cents
    FROM alloc a, need n
    """,
)
def q487(spark: SparkSession, sf: str) -> DataFrame:
    """FinOps cost allocation: each team's direct spend plus its
    largest-remainder share of a fixed shared pool (1,000,000 cents)
    apportioned by usage — the shared pool conserves EXACTLY across
    teams (the rev_schedule/q482 discipline; native composition)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    direct = ev.groupBy((F.col("user_id") % 8).alias("team")).agg(
        F.sum(cents).cast("long").alias("direct_cents"),
        F.count(F.lit(1)).cast("long").alias("usage"),
    )
    tot = direct.agg(F.sum("usage").cast("long").alias("tu"))
    pool = 1_000_000
    alloc = direct.crossJoin(F.broadcast(tot)).select(
        "team", "direct_cents", "usage",
        F.floor(F.lit(pool) * F.col("usage") / F.col("tu")).cast("long").alias("base_share"),
        (F.lit(pool) * F.col("usage") % F.col("tu")).alias("rem"),
    )
    w = Window.orderBy(F.col("rem").desc(), "team")
    alloc = alloc.withColumn("rr", F.row_number().over(w))
    need = alloc.agg((F.lit(pool) - F.sum("base_share")).cast("long").alias("extra"))
    j = alloc.crossJoin(F.broadcast(need))
    sh = F.col("base_share") + (F.col("rr") <= F.col("extra")).cast("long")
    return j.select(
        "team", "direct_cents", "usage",
        sh.cast("long").alias("shared_cents"),
        (F.col("direct_cents") + sh).cast("long").alias("total_cents"),
    )


# ------------------------------------------------------------------ q488
@query(
    "q488_mrr_at_k",
    """
    WITH ranked AS (
        SELECT user_id AS q,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS rel
        FROM events
    ),
    per AS (
        SELECT q, min(CASE WHEN rel > 0 AND rk <= 10 THEN rk END) AS first_rel_rank
        FROM ranked GROUP BY q
    ),
    scaled AS (
        SELECT q, first_rel_rank,
               CAST(CASE WHEN first_rel_rank IS NOT NULL
                         THEN 2520 / first_rel_rank ELSE 0 END AS BIGINT) AS rr_scaled
        FROM per
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(rr_scaled) AS BIGINT) AS rr_sum FROM scaled
    )
    SELECT s.q AS user_id, s.first_rel_rank, s.rr_scaled, g.n_queries,
           CAST(g.rr_sum AS DOUBLE) / (2520 * g.n_queries) AS mrr
    FROM scaled s, g
    """,
)
def q488(spark: SparkSession, sf: str) -> DataFrame:
    """MRR@10 treating each user's event stream as a ranking and
    purchases as the relevant items (functions/stats.mrr_at_k): with
    L = lcm(1..10) = 2520, every reciprocal rank is an exact BIGINT, so
    the mean is one divide — completes the ranking-eval trio beside
    NDCG (q373) and MAP (q374)."""
    from .functions import stats as st

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = ev.select(
        F.col("user_id").alias("q"),
        F.row_number().over(w).alias("rk"),
        (F.col("event_type") == "purchase").cast("long").alias("rel"),
    )
    out = st.mrr_at_k(ranked, ["q"], "rk", "rel", k=10)
    return out.select(
        F.col("q").alias("user_id"), "first_rel_rank", "rr_scaled", "n_queries", "mrr"
    )


# ------------------------------------------------------------------ q489
@query(
    "q489_wma",
    """
    WITH daily AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rev
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, rev,
           CASE WHEN lag(rev, 4) OVER (PARTITION BY event_type ORDER BY day) IS NOT NULL
                THEN CAST(5 * rev
                          + 4 * lag(rev, 1) OVER (PARTITION BY event_type ORDER BY day)
                          + 3 * lag(rev, 2) OVER (PARTITION BY event_type ORDER BY day)
                          + 2 * lag(rev, 3) OVER (PARTITION BY event_type ORDER BY day)
                          + 1 * lag(rev, 4) OVER (PARTITION BY event_type ORDER BY day)
                      AS DOUBLE) / 15 END AS wma
    FROM daily
    """,
)
def q489(spark: SparkSession, sf: str) -> DataFrame:
    """Triangular 5-day weighted moving average of daily revenue per
    event type (operators/window.wma): the window is five explicit lag
    terms in fixed order — an exact BIGINT weighted sum, one divide,
    NULL until the window fills; no rolling float sum exists."""
    from .operators import window as win

    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("rev"))
    return win.wma(daily, ["event_type"], ["day"], "rev", [5, 4, 3, 2, 1])


# ------------------------------------------------------------------ q490
@query(
    "q490_int_division_semantics",
    """
    WITH f AS (
        SELECT event_id,
               CAST(round(value * 100) AS BIGINT) % 97 - 48 AS a,
               CAST(event_id % 7 + 3 AS BIGINT) AS b
        FROM events WHERE event_id % 11 = 0
    )
    SELECT event_id, a, b,
           a % b AS c_mod,
           ((a % b) + b) % b AS pmod,
           CAST(trunc(CAST(a AS DOUBLE) / b) AS BIGINT) AS div_trunc,
           CAST(floor(CAST(a AS DOUBLE) / b) AS BIGINT) AS div_floor
    FROM f
    """,
)
def q490(spark: SparkSession, sf: str) -> DataFrame:
    """Integer division/modulo semantics parity on NEGATIVE operands:
    C-style % (sign of the dividend) agrees between engines, pmod is
    the ((a%b)+b)%b rewrite, truncating division is Spark's DIV ==
    trunc(a/b), flooring division is floor(a/b) — the translation table
    any cross-engine port needs pinned (native parity sweep; the
    integer quotients are exact doubles below 2^53 so trunc/floor are
    boundary-safe)."""
    ev = load_table(spark, sf, "events").where(F.col("event_id") % 11 == 0)
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.select(
        "event_id", (cents % 97 - 48).alias("a"), (F.col("event_id") % 7 + 3).alias("b")
    )
    return f.select(
        "event_id", "a", "b",
        (F.col("a") % F.col("b")).alias("c_mod"),
        F.pmod(F.col("a"), F.col("b")).alias("pmod"),
        F.expr("a DIV b").alias("div_trunc"),
        F.floor(F.col("a") / F.col("b")).cast("long").alias("div_floor"),
    )


# ------------------------------------------------------------------ q491
@query(
    "q491_luhn_check",
    """
    WITH f AS (
        SELECT event_id,
               lpad(CAST(CAST(round(value * 100) AS BIGINT) * 9973 % 1000000000 AS VARCHAR),
                    10, '0') AS pan
        FROM events WHERE event_id % 5 = 0
    ),
    digits AS (
        SELECT event_id, pan, i,
               CAST(substr(pan, len(pan) - i + 1, 1) AS BIGINT) AS d
        FROM f, unnest(generate_series(1, 10)) AS u(i)
    ),
    scored AS (
        SELECT event_id, pan,
               CAST(sum(CASE WHEN i % 2 = 0
                             THEN CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
                             ELSE d END) AS BIGINT) AS luhn_sum
        FROM digits GROUP BY event_id, pan
    )
    SELECT event_id, pan, luhn_sum, luhn_sum % 10 = 0 AS luhn_valid
    FROM scored
    """,
)
def q491(spark: SparkSession, sf: str) -> DataFrame:
    """Luhn checksum validation over synthetic 10-digit account numbers:
    right-to-left digit walk with even-position doubling (the 2d−9
    fold), all exact integer arithmetic over an exploded digit-position
    grid — the payments-ingest validity gate (native parity sweep)."""
    ev = load_table(spark, sf, "events").where(F.col("event_id") % 5 == 0)
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.select(
        "event_id",
        F.lpad((cents * 9973 % 1_000_000_000).cast("string"), 10, "0").alias("pan"),
    )
    digits = f.select(
        "event_id", "pan", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("i")
    ).withColumn(
        "d", F.substring_index(F.expr("substr(pan, length(pan) - i + 1, 1)"), " ", 1).cast("long")
    )
    doubled = F.when(
        F.col("i") % 2 == 0,
        F.when(F.col("d") * 2 > 9, F.col("d") * 2 - 9).otherwise(F.col("d") * 2),
    ).otherwise(F.col("d"))
    scored = digits.groupBy("event_id", "pan").agg(
        F.sum(doubled).cast("long").alias("luhn_sum")
    )
    return scored.select(
        "event_id", "pan", "luhn_sum", (F.col("luhn_sum") % 10 == 0).alias("luhn_valid")
    )


# ------------------------------------------------------------------ q492
@query(
    "q492_auto_histogram",
    """
    WITH f AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS x FROM events
    ),
    meta AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(min(x) AS BIGINT) AS lo, CAST(max(x) AS BIGINT) AS hi,
               CAST(length(bin(count(*))) AS BIGINT) AS bits
        FROM f GROUP BY event_type
    ),
    binned AS (
        SELECT f.event_type, m.n, m.bits AS n_bins,
               least(CAST((f.x - m.lo) * m.bits // (m.hi - m.lo + 1) AS BIGINT),
                     m.bits - 1) AS bin
        FROM f JOIN meta m USING (event_type)
    )
    SELECT event_type, n_bins, bin, CAST(count(*) AS BIGINT) AS cnt
    FROM binned GROUP BY 1, 2, 3
    """,
)
def q492(spark: SparkSession, sf: str) -> DataFrame:
    """Sturges auto-binned histogram per event type: the bin count is
    ⌊log2 n⌋+1 computed as the BIT LENGTH of n (pure integer — no
    float log), bins assigned by exact integer scaling — the
    automatic-histogram shape with zero float boundaries (native
    composition)."""
    ev = load_table(spark, sf, "events")
    f = ev.select("event_type", F.round(F.col("value") * 100).cast("long").alias("x"))
    meta = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("x").alias("lo"), F.max("x").alias("hi"),
        F.length(F.bin(F.count(F.lit(1)))).cast("long").alias("bits"),
    )
    j = f.join(F.broadcast(meta), on="event_type")
    bin_ = F.least(
        F.floor((F.col("x") - F.col("lo")) * F.col("bits") / (F.col("hi") - F.col("lo") + 1)).cast("long"),
        F.col("bits") - 1,
    )
    return j.groupBy("event_type", F.col("bits").alias("n_bins"), bin_.alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


# ------------------------------------------------------------------ q493
@query(
    "q493_sla_credits",
    """
    WITH f AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) % 50 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_err
        FROM events GROUP BY event_type
    )
    SELECT event_type, n, n_err,
           CAST(n - n_err AS DOUBLE) / n AS attainment,
           CASE WHEN (n - n_err) * 1000 >= 999 * n THEN 0
                WHEN (n - n_err) * 1000 >= 990 * n THEN 10
                WHEN (n - n_err) * 1000 >= 950 * n THEN 25
                ELSE 100 END AS credit_pct
    FROM f
    """,
)
def q493(spark: SparkSession, sf: str) -> DataFrame:
    """SLA attainment and contractual service credits per event type:
    tier thresholds (99.9/99/95%) tested by integer cross-
    multiplication — no float attainment ever gates a credit (native
    composition beside sla_burn q419)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((cents % 50 == 0).cast("long")).cast("long").alias("n_err"),
    )
    ok = F.col("n") - F.col("n_err")
    credit = (
        F.when(ok * 1000 >= 999 * F.col("n"), 0)
        .when(ok * 1000 >= 990 * F.col("n"), 10)
        .when(ok * 1000 >= 950 * F.col("n"), 25)
        .otherwise(100)
    )
    return f.select(
        "event_type", "n", "n_err",
        (ok / F.col("n")).alias("attainment"),
        credit.cast("int").alias("credit_pct"),
    )


# ------------------------------------------------------------------ q494
@query(
    "q494_validity_audit",
    r"""
    WITH seeded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'user' || doc_id || '@example.com'
                    WHEN doc_id % 3 = 1 THEN 'not-an-email-' || doc_id
                    ELSE 'u' || doc_id || '@bad' END AS email,
               CASE WHEN doc_id % 2 = 0
                    THEN '10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                    ELSE '999.12.' || doc_id END AS ip
        FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN regexp_matches(email,
                '^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_valid_email,
           CAST(sum(CASE WHEN regexp_matches(ip,
                '^([0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(\.([0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3}$')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_ip
    FROM seeded
    """,
)
def q494(spark: SparkSession, sf: str) -> DataFrame:
    """Field-validity audit: RFC-ish email and strict dotted-quad IPv4
    validation rates over deterministically seeded good/bad values —
    the regexes stay in the Java∩RE2 subset (the scrub_pii q148
    discipline turned from redaction to validation)."""
    d = load_table(spark, sf, "documents")
    email = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("not-an-email-"), F.col("doc_id").cast("string")))
        .otherwise(F.concat(F.lit("u"), F.col("doc_id").cast("string"), F.lit("@bad")))
    )
    ip = (
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.lit("10.0."), (F.col("doc_id") % 256).cast("string"),
                        F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string")))
        .otherwise(F.concat(F.lit("999.12."), F.col("doc_id").cast("string")))
    )
    seeded = d.select("doc_id", email.alias("email"), ip.alias("ip"))
    em_re = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"
    ip_re = r"^([0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])(\.([0-9]|[1-9][0-9]|1[0-9][0-9]|2[0-4][0-9]|25[0-5])){3}$"
    return seeded.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("email").rlike(em_re).cast("long")).cast("long").alias("n_valid_email"),
        F.sum(F.col("ip").rlike(ip_re).cast("long")).cast("long").alias("n_valid_ip"),
    )


# ------------------------------------------------------------------ q495
@query(
    "q495_jains_index",
    """
    WITH f AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS x FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS total,
           CAST(sum(x) * sum(x) AS DOUBLE) / (count(*) * sum(x * x)) AS jains_index
    FROM f
    """,
)
def q495(spark: SparkSession, sf: str) -> DataFrame:
    """Jain's fairness index of per-user event counts: (Σx)²/(n·Σx²) —
    1 when perfectly even, →1/n under monopoly; exact BIGINT sums, one
    divide (native composition; the fairness twin of q254's Gini)."""
    ev = load_table(spark, sf, "events")
    f = ev.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("x"))
    return f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
        ((F.sum("x") * F.sum("x")) / (F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))))
        .alias("jains_index"),
    )


# ------------------------------------------------------------------ q496
@query(
    "q496_peak_to_average",
    """
    WITH hourly AS (
        SELECT event_type, CAST(floor(epoch(ts) / 3600.0) AS BIGINT) AS hr,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(n) AS BIGINT) AS total,
           CAST(max(n) AS BIGINT) AS peak,
           CAST(max(n) * count(*) AS DOUBLE) / sum(n) AS peak_to_avg,
           CAST(sum(n) AS DOUBLE) / (max(n) * count(*)) AS load_factor
    FROM hourly GROUP BY event_type
    """,
)
def q496(spark: SparkSession, sf: str) -> DataFrame:
    """Peak-to-average ratio and load factor per event type over hourly
    traffic — the capacity-planning pair (provision for peak, bill for
    average); exact integer counts, single divides (native
    composition)."""
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 3600).cast("long").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    g = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("n").cast("long").alias("total"),
        F.max("n").cast("long").alias("peak"),
    )
    return g.select(
        "event_type", "n_hours", "total", "peak",
        ((F.col("peak") * F.col("n_hours")) / F.col("total")).alias("peak_to_avg"),
        (F.col("total") / (F.col("peak") * F.col("n_hours"))).alias("load_factor"),
    )


# ------------------------------------------------------------------ q497
@query(
    "q497_generalization_ladder",
    """
    WITH lvl AS (
        SELECT unnest([10, 50, 200]) AS coarseness
    ),
    classes AS (
        SELECT l.coarseness, o.o_custkey // l.coarseness AS qi,
               CAST(count(*) AS BIGINT) AS n
        FROM orders o CROSS JOIN lvl l
        GROUP BY 1, 2
    ),
    audit AS (
        SELECT coarseness,
               CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               CAST(min(n) AS BIGINT) AS min_class
        FROM classes GROUP BY coarseness
    )
    SELECT coarseness, n_classes, n_violations, min_class,
           n_violations = 0 AS k_satisfied
    FROM audit
    """,
)
def q497(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity generalization ladder: the same quasi-identifier at
    three coarsening levels (customer-key buckets of 10/50/200), each
    audited for k=5 — release at the FINEST level with zero violations.
    Completes the k/l/t privacy family (q413/q461) with the mitigation
    step (native composition over profile.k_anonymity machinery)."""
    o = load_table(spark, sf, "orders")
    parts = []
    for c in (10, 50, 200):
        cl = o.groupBy(F.floor(F.col("o_custkey") / c).cast("long").alias("qi")).agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        parts.append(
            cl.agg(
                F.lit(c).cast("long").alias("coarseness"),
                F.count(F.lit(1)).cast("long").alias("n_classes"),
                F.sum((F.col("n") < 5).cast("long")).cast("long").alias("n_violations"),
                F.min("n").cast("long").alias("min_class"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "coarseness", "n_classes", "n_violations", "min_class",
        (F.col("n_violations") == 0).alias("k_satisfied"),
    )


# ------------------------------------------------------------------ q498
@query(
    "q498_dup_cluster_histogram",
    r"""
    WITH norm AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents WHERE text IS NOT NULL
    ),
    comp AS (
        SELECT t, CAST(count(*) AS BIGINT) AS cluster_size FROM norm GROUP BY t
    )
    SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM comp GROUP BY cluster_size
    """,
)
def q498(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-cluster size histogram: exact-dup clusters by
    normalized text, reported as the count-of-counts distribution
    (1 = unique docs, 2+ = duplicate families) — the dedup report that
    says what a dedup pass will actually delete (native composition
    over the fingerprint machinery)."""
    from .operators.dedup import normalize_text

    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    comp = d.groupBy(normalize_text(F.col("text")).alias("t")).agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return comp.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        (F.min("cluster_size") * F.count(F.lit(1))).cast("long").alias("n_docs"),
    )


# ------------------------------------------------------------------ q499
@query(
    "q499_retention_ttl_audit",
    """
    WITH snap AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS now_us FROM events),
    ttl AS (
        SELECT event_type,
               CASE event_type WHEN 'error' THEN 7 WHEN 'click' THEN 30
                    WHEN 'view' THEN 30 ELSE 365 END AS ttl_days
        FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT e.event_type, t.ttl_days,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN a.now_us - epoch_us(e.ts) > t.ttl_days * 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_expired,
           CAST(sum(CASE WHEN a.now_us - epoch_us(e.ts) > t.ttl_days * 86400000000
                         THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS expired_share
    FROM events e JOIN ttl t USING (event_type), snap a
    GROUP BY e.event_type, t.ttl_days
    """,
)
def q499(spark: SparkSession, sf: str) -> DataFrame:
    """Data-retention TTL compliance audit: rows past their class's
    retention window measured against the dataset's own max timestamp
    (no wall clock — determinism), exact microsecond age comparisons —
    the GDPR/records-management sweep every governed table runs
    (native composition)."""
    ev = load_table(spark, sf, "events")
    asof = ev.agg(F.max(F.unix_micros(F.col("ts"))).cast("long").alias("now_us"))
    ttl = (
        F.when(F.col("event_type") == "error", 7)
        .when(F.col("event_type").isin("click", "view"), 30)
        .otherwise(365)
        .cast("long")
    )
    j = ev.select("event_type", F.unix_micros(F.col("ts")).alias("tus")).withColumn(
        "ttl_days", ttl
    ).crossJoin(F.broadcast(asof))
    expired = (F.col("now_us") - F.col("tus") > F.col("ttl_days") * 86_400_000_000).cast("long")
    g = j.groupBy("event_type", "ttl_days").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(expired).cast("long").alias("n_expired"),
    )
    return g.select(
        "event_type", "ttl_days", "n_rows", "n_expired",
        (F.col("n_expired") / F.col("n_rows")).alias("expired_share"),
    )


# ------------------------------------------------------------------ q500
@query(
    "q500_pipeline_scorecard",
    r"""
    WITH w AS (
        SELECT doc_id, source, lang, n_chars, text,
               string_split(regexp_replace(trim(text), '\s+', ' ', 'g'), ' ') AS toks
        FROM documents WHERE text IS NOT NULL
    ),
    raw AS (SELECT source, CAST(count(*) AS BIGINT) AS n_raw FROM w GROUP BY source),
    f AS (
        SELECT doc_id, source, lang, n_chars, text, len(toks) AS n_toks,
               len(toks) BETWEEN 50 AND 100000 AS r_word_count,
               (length(regexp_replace(text, '\s+', '', 'g'))::DOUBLE
                / greatest(len(toks), 1)) BETWEEN 3.0 AND 10.0 AS r_mean_word_len,
               len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                / greatest(len(toks), 1) >= 0.8 AS r_alpha
        FROM w
    ),
    gated AS (
        SELECT * FROM f WHERE r_word_count AND r_mean_word_len AND r_alpha
    ),
    ng AS (SELECT source, CAST(count(*) AS BIGINT) AS n_gated FROM gated GROUP BY source),
    deduped AS (
        SELECT doc_id, source, lang, n_chars, text, n_toks FROM (
            SELECT *, row_number() OVER (
                PARTITION BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
                ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    bench_toks AS (
        SELECT string_split(regexp_replace(lower(trim(substr(text, 1, 120))), '\s+', ' ', 'g'), ' ') AS t
        FROM documents WHERE doc_id % 101 = 0 AND text IS NOT NULL
    ),
    bench AS (
        SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS g
        FROM bench_toks, unnest(generate_series(1, greatest(len(t)-2, 1))) AS u(i)
    ),
    cur_toks AS (
        SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
        FROM deduped
    ),
    cur_grams AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
        FROM cur_toks, unnest(generate_series(1, greatest(len(t)-2, 1))) AS u(i)
    ),
    contaminated AS (
        SELECT doc_id FROM cur_grams JOIN bench USING (g)
        GROUP BY doc_id HAVING count(*) >= 8
    ),
    marked AS (
        SELECT d.*, c.doc_id IS NOT NULL AS contam,
               CASE WHEN (('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 1000) < 800 THEN 'train'
                    WHEN (('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,15))::BIGINT % 1000) < 900 THEN 'val'
                    ELSE 'test' END AS split
        FROM deduped d LEFT JOIN contaminated c ON c.doc_id = d.doc_id
    ),
    released AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_unique,
               CAST(sum(CASE WHEN contam THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
               CAST(sum(CASE WHEN NOT contam THEN 1 ELSE 0 END) AS BIGINT) AS n_released,
               CAST(sum(CASE WHEN NOT contam THEN n_toks ELSE 0 END) AS BIGINT) AS token_sum,
               CAST(count(DISTINCT CASE WHEN NOT contam THEN lang END) AS BIGINT) AS n_langs,
               CAST(sum(CASE WHEN NOT contam AND split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
               CAST(sum(CASE WHEN NOT contam AND split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
               CAST(sum(CASE WHEN NOT contam AND split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
        FROM marked GROUP BY source
    )
    SELECT r.source, r.n_raw, ng.n_gated, rel.n_unique, rel.n_contaminated,
           rel.n_released, rel.token_sum, rel.n_langs,
           rel.n_train, rel.n_val, rel.n_test,
           CAST(ng.n_gated AS DOUBLE) / r.n_raw AS gate_pass_rate,
           CAST(rel.n_unique AS DOUBLE) / ng.n_gated AS unique_rate
    FROM raw r JOIN ng USING (source) JOIN released rel USING (source)
    """,
)
def q500(spark: SparkSession, sf: str) -> DataFrame:
    """QUERY 500 — the per-source pipeline scorecard: raw counts →
    quality-gate pass rate → exact-dedup survivors → decontamination
    removals → released docs/tokens/langs/split mix, all in ONE
    relation whose ENTIRE chain (regex quality rules, dedup tie-breaks,
    3-gram contamination, md5 split hashing, per-source rollup) replays
    in SQL — the corpus release card a 100 TB curation run prints,
    composing pipeline.curate_corpus + decontaminate end to end."""
    from .operators.pipeline import curate_corpus, decontaminate
    from .operators.text import token_count

    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    raw = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_raw"))
    cur = curate_corpus(d, rules=("r_word_count", "r_mean_word_len", "r_alpha"))
    # gate counts BEFORE dedup: recompute the gate flags (same codepath)
    from .operators import text as tx

    flags = tx.gopher_quality_flags(d)
    gated = flags.where(
        F.col("r_word_count") & F.col("r_mean_word_len") & F.col("r_alpha")
    )
    ng = gated.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_gated"))
    bench = d.where((F.col("doc_id") % 101 == 0)).select(
        F.substring("text", 1, 120).alias("text")
    )
    cont = decontaminate(cur, bench, "text", "doc_id", n=3, min_hits=8).select("doc_id")
    marked = cur.join(
        cont.withColumn("__c__", F.lit(1)), on="doc_id", how="left"
    ).withColumn("contam", F.col("__c__").isNotNull()).withColumn(
        "n_toks", token_count(F.col("text"))
    )
    keep = ~F.col("contam")
    rel = marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum(F.col("contam").cast("long")).cast("long").alias("n_contaminated"),
        F.sum(keep.cast("long")).cast("long").alias("n_released"),
        F.sum(F.when(keep, F.col("n_toks")).otherwise(0)).cast("long").alias("token_sum"),
        F.countDistinct(F.when(keep, F.col("lang"))).cast("long").alias("n_langs"),
        F.sum((keep & (F.col("split") == "train")).cast("long")).cast("long").alias("n_train"),
        F.sum((keep & (F.col("split") == "val")).cast("long")).cast("long").alias("n_val"),
        F.sum((keep & (F.col("split") == "test")).cast("long")).cast("long").alias("n_test"),
    )
    j = raw.join(ng, on="source").join(rel, on="source")
    return j.select(
        "source", "n_raw", "n_gated", "n_unique", "n_contaminated",
        "n_released", "token_sum", "n_langs", "n_train", "n_val", "n_test",
        (F.col("n_gated") / F.col("n_raw")).alias("gate_pass_rate"),
        (F.col("n_unique") / F.col("n_gated")).alias("unique_rate"),
    )


# ------------------------------------------------------------------ q501
@query(
    "q501_wilson_ranking",
    """
    WITH f AS (
        SELECT user_id % 40 AS item,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) % 3 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS pos
        FROM events GROUP BY 1
    ),
    sc AS (
        SELECT item, n, pos,
               (CAST(pos AS DOUBLE) / n
                + CAST('1.9208' AS DOUBLE) / n
                - CAST('1.96' AS DOUBLE)
                  * sqrt((CAST(pos AS DOUBLE) / n) * (1 - CAST(pos AS DOUBLE) / n) / n
                         + CAST('0.9604' AS DOUBLE) / (n * n)))
               / (1 + CAST('3.8416' AS DOUBLE) / n) AS wilson_lb
        FROM f WHERE n > 0
    )
    SELECT item, n, pos, wilson_lb,
           CAST(row_number() OVER (ORDER BY wilson_lb DESC, item) AS BIGINT) AS rank
    FROM sc
    """,
)
def q501(spark: SparkSession, sf: str) -> DataFrame:
    """Wilson-lower-bound ranking (the "how not to sort by average
    rating" fix): items ordered by the 95% Wilson interval's lower
    bound — all constants shipped as STRING literals (z=1.96, z²,
    z²/2, z⁴/4), the formula one fixed tree over exact counts, ranking
    deterministic with an item tie-break (native composition beside
    proportion_ci q235)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.groupBy((F.col("user_id") % 40).alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((cents % 3 == 0).cast("long")).cast("long").alias("pos"),
    )
    p = F.col("pos").cast("double") / F.col("n")
    n = F.col("n")
    z, z2, z2h, z4q = F.lit(1.96), F.lit(3.8416), F.lit(1.9208), F.lit(0.9604)
    lb = (p + z2h / n - z * F.sqrt(p * (1 - p) / n + z4q / (n * n))) / (1 + z2 / n)
    sc = f.where(n > 0).withColumn("wilson_lb", lb)
    w = Window.orderBy(F.col("wilson_lb").desc(), "item")
    return sc.withColumn("rank", F.row_number().over(w).cast("long"))


# ------------------------------------------------------------------ q502
@query(
    "q502_bayes_rating",
    """
    WITH f AS (
        SELECT user_id % 40 AS item,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum((CAST(round(value * 100) AS BIGINT) % 5) + 1) AS BIGINT) AS rating_sum
        FROM events GROUP BY 1
    ),
    prior AS (
        SELECT CAST(sum(rating_sum) AS BIGINT) AS gs, CAST(sum(n) AS BIGINT) AS gn FROM f
    )
    SELECT f.item, f.n, f.rating_sum,
           CAST(f.rating_sum AS DOUBLE) / f.n AS raw_mean,
           CAST(20 * p.gs + f.rating_sum * p.gn AS DOUBLE)
             / (p.gn * (20 + f.n)) AS bayes_mean
    FROM f, prior p
    """,
)
def q502(spark: SparkSession, sf: str) -> DataFrame:
    """Bayesian-average rating with prior strength C=20 toward the
    global mean: the IMDb-style shrinkage (C·μ + Σx)/(C + n) kept as
    ONE divide of exact integer cross-products (μ never materializes —
    the target_encode exact-mode discipline)."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.groupBy((F.col("user_id") % 40).alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((cents % 5) + 1).cast("long").alias("rating_sum"),
    )
    prior = f.agg(
        F.sum("rating_sum").cast("long").alias("gs"), F.sum("n").cast("long").alias("gn")
    )
    j = f.crossJoin(F.broadcast(prior))
    return j.select(
        "item", "n", "rating_sum",
        (F.col("rating_sum") / F.col("n")).alias("raw_mean"),
        ((20 * F.col("gs") + F.col("rating_sum") * F.col("gn"))
         / (F.col("gn") * (20 + F.col("n")))).alias("bayes_mean"),
    )


# ------------------------------------------------------------------ q503
@query(
    "q503_rand_ari",
    """
    WITH f AS (
        SELECT label AS t, vec_id % 7 AS p FROM embeddings
    ),
    cont AS (SELECT t, p, CAST(count(*) AS BIGINT) AS nij FROM f GROUP BY 1, 2),
    rows_ AS (SELECT t, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY t),
    cols_ AS (SELECT p, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY p),
    tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cont),
    sums AS (
        SELECT (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) FROM cont) AS s_ij,
               (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) FROM rows_) AS s_a,
               (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) FROM cols_) AS s_b,
               (SELECT CAST(n * (n - 1) // 2 AS BIGINT) FROM tot) AS s_n
    )
    SELECT s_ij, s_a, s_b, s_n,
           CAST(s_n + 2 * s_ij - s_a - s_b AS DOUBLE) / s_n AS rand_index,
           CAST(s_ij * s_n - s_a * s_b AS DOUBLE)
             / ((s_a + s_b) * s_n // 2 - s_a * s_b) AS ari
    FROM sums
    """,
)
def q503(spark: SparkSession, sf: str) -> DataFrame:
    """Rand index and Adjusted Rand Index between the embedding labels
    and a synthetic clustering: pure pair-counting — every term a
    C(n,2)-style exact BIGINT, RI and ARI single divides of integer
    cross-products (the clustering-eval counterpart of q308's pair
    eval; no per-item float average exists)."""
    e = load_table(spark, sf, "embeddings")
    f = e.select(F.col("label").alias("t"), (F.col("vec_id") % 7).alias("p"))
    cont = f.groupBy("t", "p").agg(F.count(F.lit(1)).cast("long").alias("nij"))
    s_ij = cont.agg(F.sum(F.col("nij") * (F.col("nij") - 1) / 2).cast("long").alias("s_ij"))
    rows_ = cont.groupBy("t").agg(F.sum("nij").cast("long").alias("ai"))
    cols_ = cont.groupBy("p").agg(F.sum("nij").cast("long").alias("bj"))
    s_a = rows_.agg(F.sum(F.col("ai") * (F.col("ai") - 1) / 2).cast("long").alias("s_a"))
    s_b = cols_.agg(F.sum(F.col("bj") * (F.col("bj") - 1) / 2).cast("long").alias("s_b"))
    s_n = cont.agg((F.sum("nij") * (F.sum("nij") - 1) / 2).cast("long").alias("s_n"))
    j = s_ij.crossJoin(s_a).crossJoin(s_b).crossJoin(s_n)
    return j.select(
        "s_ij", "s_a", "s_b", "s_n",
        ((F.col("s_n") + 2 * F.col("s_ij") - F.col("s_a") - F.col("s_b")) / F.col("s_n"))
        .alias("rand_index"),
        ((F.col("s_ij") * F.col("s_n") - F.col("s_a") * F.col("s_b"))
         / (F.floor((F.col("s_a") + F.col("s_b")) * F.col("s_n") / 2).cast("long")
            - F.col("s_a") * F.col("s_b")))
        .alias("ari"),
    )


# ------------------------------------------------------------------ q504
@query(
    "q504_symspell_suggest",
    r"""
    WITH toks AS (
        SELECT unnest(list_filter(
                   string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
                   x -> length(x) >= 4)) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY w),
    vkeys AS (
        SELECT w, cnt, unnest(list_append(
            list_transform(generate_series(1, length(w)),
                           i -> substr(w, 1, i - 1) || substr(w, i + 1, 100)), w)) AS k
        FROM vocab
    ),
    queries AS (
        SELECT w AS orig,
               substr(w, 1, (ascii(w) % length(w))) ||
               substr(w, (ascii(w) % length(w)) + 2, 100) AS q
        FROM vocab
        WHERE length(w) >= 6 AND (ascii(w) + length(w)) % 7 = 0
    ),
    qkeys AS (
        SELECT orig, q, unnest(list_append(
            list_transform(generate_series(1, length(q)),
                           i -> substr(q, 1, i - 1) || substr(q, i + 1, 100)), q)) AS k
        FROM queries
    ),
    cand AS (
        SELECT DISTINCT qk.orig, qk.q, vk.w, vk.cnt
        FROM qkeys qk JOIN vkeys vk USING (k)
    ),
    verified AS (
        SELECT orig, q, w, cnt, levenshtein(q, w) AS lev
        FROM cand WHERE levenshtein(q, w) <= 1
    )
    SELECT orig, q, w AS suggestion, cnt, CAST(lev AS BIGINT) AS lev FROM (
        SELECT orig, q, w, cnt, lev,
               row_number() OVER (PARTITION BY q ORDER BY lev, cnt DESC, w) AS rn
        FROM verified
    ) WHERE rn = 1
    """,
)
def q504(spark: SparkSession, sf: str) -> DataFrame:
    """SymSpell-style spelling correction: vocabulary words index THEIR
    1-deletion variants; deterministically corrupted query tokens look
    up candidates by DELETE-KEY EQUI-JOIN (never a levenshtein cross
    product — the 100 TB trick), then an exact edit-distance ≤1 verify
    and a (distance, frequency, word) ranking pick the suggestion —
    both engines share identical levenshtein semantics (native
    composition; the lexical sibling of fuzzy_join)."""
    from .operators.dedup import normalize_text

    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = F.filter(
        F.split(normalize_text(F.col("text")), " "), lambda x: F.length(x) >= 4
    )
    vocab = d.select(F.explode(toks).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )

    vkeys = vocab.select(
        "w", "cnt",
        F.explode(
            F.concat(
                F.expr("transform(sequence(1, length(w)), i -> concat(substr(w, 1, i - 1), substr(w, i + 1, 100)))"),
                F.array(F.col("w")),
            )
        ).alias("k"),
    )
    queries = vocab.where(
        (F.length("w") >= 6) & ((F.ascii("w") + F.length("w")) % 7 == 0)
    ).select(
        F.col("w").alias("orig"),
        F.expr("concat(substr(w, 1, ascii(w) % length(w)), substr(w, ascii(w) % length(w) + 2, 100))").alias("q"),
    )
    qkeys = queries.select(
        "orig", "q",
        F.explode(
            F.concat(
                F.expr("transform(sequence(1, length(q)), i -> concat(substr(q, 1, i - 1), substr(q, i + 1, 100)))"),
                F.array(F.col("q")),
            )
        ).alias("k"),
    )
    cand = qkeys.join(vkeys, on="k").select("orig", "q", "w", "cnt").distinct()
    verified = cand.withColumn("lev", F.levenshtein("q", "w")).where(F.col("lev") <= 1)
    w = Window.partitionBy("q").orderBy("lev", F.col("cnt").desc(), "w")
    return verified.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).select(
        "orig", "q", F.col("w").alias("suggestion"), "cnt", F.col("lev").cast("long").alias("lev")
    )


# ------------------------------------------------------------------ q505
@query(
    "q505_lob_match",
    # Full SQL replay: with unit quantities every arrival causes at most
    # one fill, so the book advances one order per recursive-CTE
    # iteration carrying both sides as price-time-SORTED struct lists
    # (insert = filter-split on price, since seq is strictly increasing;
    # pop = head drop) — all-integer, bit-identical to the heap scan.
    # Partial fills / multi-fill sweeps stay pytest-pinned
    # (tests/test_batch19_ops.py hand cases).
    """
    WITH RECURSIVE o AS (
        SELECT CAST(user_id AS VARCHAR) AS sym,
               CASE WHEN event_id % 2 = 0 THEN 'B' ELSE 'S' END AS side,
               CAST(round(value * 100) AS BIGINT) % 20 + 90 AS px,
               event_id AS id,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT) AS t
        FROM events
    ),
    st AS (
        SELECT sym, CAST(0 AS BIGINT) AS t,
               CAST([] AS STRUCT(np BIGINT, sq BIGINT, id BIGINT)[]) AS bids,
               CAST([] AS STRUCT(p BIGINT, sq BIGINT, id BIGINT)[]) AS asks,
               CAST(NULL AS BIGINT) AS buy_id, CAST(NULL AS BIGINT) AS sell_id,
               CAST(NULL AS BIGINT) AS price
        FROM (SELECT DISTINCT sym FROM o)
        UNION ALL
        SELECT sym, t,
               CASE WHEN side = 'B' AND matched THEN bids
                    WHEN side = 'B' THEN
                        list_concat(list_concat(
                            list_filter(bids, x -> x.np <= -px),
                            [{'np': -px, 'sq': t, 'id': id}]),
                            list_filter(bids, x -> x.np > -px))
                    WHEN matched THEN bids[2:]
                    ELSE bids END AS bids,
               CASE WHEN side = 'S' AND matched THEN asks
                    WHEN side = 'S' THEN
                        list_concat(list_concat(
                            list_filter(asks, x -> x.p <= px),
                            [{'p': px, 'sq': t, 'id': id}]),
                            list_filter(asks, x -> x.p > px))
                    WHEN matched THEN asks[2:]
                    ELSE asks END AS asks,
               CASE WHEN matched AND side = 'B' THEN id
                    WHEN matched THEN bb_id END AS buy_id,
               CASE WHEN matched AND side = 'S' THEN id
                    WHEN matched THEN ba_id END AS sell_id,
               CASE WHEN matched AND side = 'B' THEN ba_p
                    WHEN matched THEN bb_p END AS price
        FROM (
            SELECT s.sym, ord.t, ord.side, ord.px, ord.id, s.bids, s.asks,
                   CASE WHEN len(s.asks) > 0 THEN s.asks[1].p END AS ba_p,
                   CASE WHEN len(s.asks) > 0 THEN s.asks[1].id END AS ba_id,
                   CASE WHEN len(s.bids) > 0 THEN -s.bids[1].np END AS bb_p,
                   CASE WHEN len(s.bids) > 0 THEN s.bids[1].id END AS bb_id,
                   CASE WHEN ord.side = 'B'
                        THEN len(s.asks) > 0 AND s.asks[1].p <= ord.px
                        ELSE len(s.bids) > 0 AND -s.bids[1].np >= ord.px
                   END AS matched
            FROM st s JOIN o ord ON ord.sym = s.sym AND ord.t = s.t + 1
        )
    )
    SELECT sym, buy_id, sell_id, price, CAST(1 AS BIGINT) AS qty, t AS seq
    FROM st WHERE buy_id IS NOT NULL
    """,
)
def q505(spark: SparkSession, sf: str) -> DataFrame:
    """Limit-order-book replay per symbol (operators/finance.lob_match):
    synthetic unit-quantity buy/sell flow from events (one symbol per
    user bounds orders per book) matched under price-time priority,
    integer prices — the exact trade tape, hash-checked against a
    sorted-list recursive-SQL book replay."""
    from .operators import finance as fin

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    o = ev.select(
        F.col("user_id").cast("string").alias("sym"),
        "ts", "event_id",
        F.when(F.col("event_id") % 2 == 0, "B").otherwise("S").alias("side"),
        (cents % 20 + 90).alias("px"),
        F.lit(1).alias("qty"),
    )
    return fin.lob_match(o, "sym", ["ts", "event_id"], "side", "px", "qty", "event_id")


# ------------------------------------------------------------------ q506
@query(
    "q506_pert_estimate",
    """
    WITH daily AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(min(n) AS BIGINT) AS optimistic,
           median(n) AS most_likely,
           CAST(max(n) AS BIGINT) AS pessimistic,
           (min(n) + 4 * median(n) + max(n)) / 6 AS pert_estimate,
           CAST(max(n) - min(n) AS DOUBLE) / 6 AS pert_sd
    FROM daily GROUP BY event_type
    """,
)
def q506(spark: SparkSession, sf: str) -> DataFrame:
    """Three-point PERT estimate of daily volume per event type:
    (optimistic + 4·mode + pessimistic)/6 with the beta-approximation
    σ = range/6 — min/max exact integers, the median an exact
    half-integer, the estimate one fixed tree (native composition)."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return daily.groupBy("event_type").agg(
        F.min("n").cast("long").alias("optimistic"),
        F.median("n").alias("most_likely"),
        F.max("n").cast("long").alias("pessimistic"),
        ((F.min("n") + 4 * F.median("n") + F.max("n")) / 6).alias("pert_estimate"),
        ((F.max("n") - F.min("n")).cast("double") / 6).alias("pert_sd"),
    )


# ------------------------------------------------------------------ q507
@query(
    "q507_budget_projection",
    """
    WITH bounds AS (
        SELECT CAST(min(floor(epoch(ts) / 86400.0)) AS BIGINT) AS d0,
               CAST(max(floor(epoch(ts) / 86400.0)) AS BIGINT) AS d1
        FROM events
    ),
    spend AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) % 50 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS errors
        FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.n, s.errors,
           b.d1 - b.d0 + 1 AS days_elapsed,
           CAST(s.errors * 30 AS DOUBLE) / (b.d1 - b.d0 + 1) AS projected_30d_errors,
           s.errors * 30 * 100 > 2 * s.n * 30 AS projected_over_budget
    FROM spend s, bounds b
    """,
)
def q507(spark: SparkSession, sf: str) -> DataFrame:
    """Error-budget projection: linear extrapolation of the observed
    error count to a 30-day window (exact integer cross-products; the
    over-budget test never builds a float rate) — the month-end
    forecast an SRE posts mid-cycle (native composition beside
    sla_burn/sla_credits)."""
    ev = load_table(spark, sf, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    bounds = ev.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    cents = F.round(F.col("value") * 100).cast("long")
    spend = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((cents % 50 == 0).cast("long")).cast("long").alias("errors"),
    )
    j = spend.crossJoin(F.broadcast(bounds))
    days = F.col("d1") - F.col("d0") + 1
    return j.select(
        "event_type", "n", "errors", days.alias("days_elapsed"),
        ((F.col("errors") * 30) / days).alias("projected_30d_errors"),
        (F.col("errors") * 30 * 100 > 2 * F.col("n") * 30).alias("projected_over_budget"),
    )


# ------------------------------------------------------------------ q508
@query(
    "q508_eoq_plan",
    """
    WITH d AS (
        SELECT p.p_brand,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS demand,
               max(CAST(round(p.p_retailprice * 100) AS BIGINT)) AS unit_cost_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    )
    SELECT p_brand, demand, unit_cost_cents,
           sqrt((1000000 * demand) / (20 * unit_cost_cents)) AS eoq_units,
           (CAST(365 AS DOUBLE) * sqrt((1000000 * demand) / (20 * unit_cost_cents))) / demand
               AS order_cycle_days,
           demand / sqrt((1000000 * demand) / (20 * unit_cost_cents)) AS orders_per_period
    FROM d
    """,
)
def q508(spark: SparkSession, sf: str) -> DataFrame:
    """Economic order quantity per brand (operators/finance.eoq_plan):
    EOQ = √(2DS/H) with exact-integer demand and cent costs — the
    radicand is one BIGINT ratio, so the single sqrt is engine-
    identical; cycle stats reuse the same operands in a fixed tree."""
    from .operators import finance as fin

    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_quantity")
    pt = load_table(spark, sf, "part").select(
        "p_partkey", "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cost_cents"),
    )
    d = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    return fin.eoq_plan(d, ["p_brand"], "l_quantity", "cost_cents",
                        order_cost_cents=5000, holding_rate_pct=20, period_days=365)


# ------------------------------------------------------------------ q509
@query(
    "q509_beacon_detect",
    """
    WITH pts AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id FROM events
        UNION ALL
        SELECT -1, 1700000000 + i * 60, i FROM range(400) r(i)
    ),
    g AS (
        SELECT user_id,
               t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS gap
        FROM pts
    ),
    gc AS (
        SELECT user_id, gap, CAST(count(*) AS BIGINT) AS cnt
        FROM g WHERE gap IS NOT NULL GROUP BY 1, 2
    ),
    a AS (
        SELECT user_id,
               CAST(sum(cnt) AS BIGINT) AS n_gaps,
               CAST(sum(gap * cnt) AS BIGINT) AS span_s,
               sum(CAST(gap AS HUGEINT) * gap * cnt) AS g2,
               max(cnt * 4294967296 + (2147483647 - gap)) AS pk
        FROM gc GROUP BY 1
    )
    SELECT user_id, n_gaps, span_s,
           span_s / n_gaps AS mean_gap_s,
           CAST(2147483647 - pk % 4294967296 AS BIGINT) AS modal_gap_s,
           CAST(pk // 4294967296 AS BIGINT) AS modal_count,
           n_gaps >= 10 AND CAST(100 AS HUGEINT) * n_gaps * g2
                            < CAST(101 AS HUGEINT) * span_s * span_s AS is_beacon
    FROM a
    """,
)
def q509(spark: SparkSession, sf: str) -> DataFrame:
    """C2-beacon detection (operators/mining.beacon_detect): whole-
    second inter-arrival gaps per user, exact cross-multiplied CV
    test, packed-argmax modal gap; a synthesized 60-second timer user
    (id −1) guarantees a true beacon in the result."""
    from .operators.mining import beacon_detect

    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id")
    timer = spark.range(400).select(
        F.lit(-1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        F.col("id").alias("event_id"),
    )
    pts = ev.unionByName(timer)
    return beacon_detect(pts, ["user_id"], "ts", "event_id",
                         cv_num=1, cv_den=10, min_gaps=10)


# ------------------------------------------------------------------ q510
def _fog_oracle() -> str:
    from .operators.text import FOG_W

    return rf"""
    WITH w AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           x -> len(x) > 0) AS words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               CAST(len(words) AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(len(list_filter(words,
                        x -> len(regexp_extract_all(x, '[aeiouy]+')) >= 3)) AS BIGINT)
                   AS n_complex
        FROM w
    )
    SELECT doc_id, n_words, n_sentences, n_complex,
           CASE WHEN n_words > 0 THEN
               CAST('{FOG_W!r}' AS DOUBLE)
               * (n_words / n_sentences + CAST(100 AS DOUBLE) * (n_complex / n_words))
           END AS fog
    FROM c
    """


@query("q510_gunning_fog", _fog_oracle())
def q510(spark: SparkSession, sf: str) -> DataFrame:
    """Gunning fog readability per document (operators/text.gunning_fog):
    exact integer word/sentence/complex-word counts via codegen lambda
    filters, score as a fixed float tree on identical operands."""
    from .operators.text import gunning_fog

    d = load_table(spark, sf, "documents")
    return gunning_fog(d)


# ------------------------------------------------------------------ q511
@query(
    "q511_p_chart",
    """
    WITH base AS (
        SELECT event_type,
               CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS subgroup,
               CASE WHEN CAST(round(value * 100) AS BIGINT) % 50 = 0
                    THEN 1 ELSE 0 END AS defect
        FROM events
    ),
    counts AS (
        SELECT event_type, subgroup,
               CAST(count(*) AS BIGINT) AS n, CAST(sum(defect) AS BIGINT) AS x
        FROM base GROUP BY 1, 2
    ),
    pooled AS (
        SELECT event_type, CAST(sum(n) AS BIGINT) AS total_n,
               CAST(sum(x) AS BIGINT) AS total_x
        FROM counts GROUP BY 1
    )
    SELECT c.event_type, c.subgroup, c.n, c.x, p.total_n, p.total_x,
           c.x / c.n AS p_hat,
           p.total_x / p.total_n AS p_bar,
           CAST(c.x * p.total_n - c.n * p.total_x AS HUGEINT)
               * CAST(c.x * p.total_n - c.n * p.total_x AS HUGEINT)
               > CAST(9 * c.n * p.total_x * (p.total_n - p.total_x) AS HUGEINT)
             AND c.x * p.total_n - c.n * p.total_x > 0 AS out_high,
           CAST(c.x * p.total_n - c.n * p.total_x AS HUGEINT)
               * CAST(c.x * p.total_n - c.n * p.total_x AS HUGEINT)
               > CAST(9 * c.n * p.total_x * (p.total_n - p.total_x) AS HUGEINT)
             AND c.x * p.total_n - c.n * p.total_x < 0 AS out_low
    FROM counts c JOIN pooled p ON c.event_type = p.event_type
    """,
)
def q511(spark: SparkSession, sf: str) -> DataFrame:
    """Proportion p-chart (operators/window.p_chart): daily defect
    rates per event type against the pooled baseline, flags via exact
    DECIMAL cross-multiplication — a rate can never sit ON a limit."""
    from .operators.window import p_chart

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    base = ev.select(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
        (cents % 50 == 0).cast("long").alias("defect"),
    )
    return p_chart(base, ["event_type"], "day", "defect", sigmas=3)


# ------------------------------------------------------------------ q512
@query(
    "q512_stochastic_kd",
    """
    WITH p AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS px
        FROM events WHERE user_id % 20 = 0
    ),
    w AS (
        SELECT user_id, ts, event_id, px,
               max(px) OVER win AS hh, min(px) OVER win AS ll,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM p
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    k AS (
        SELECT user_id, ts, event_id, hh, ll,
               CASE WHEN rn >= 14 AND hh > ll THEN px - ll END AS n0,
               CASE WHEN rn >= 14 AND hh > ll THEN hh - ll END AS d0
        FROM w
    ),
    l AS (
        SELECT user_id, ts, event_id, hh, ll, n0, d0,
               lag(n0, 1) OVER win2 AS n1, lag(d0, 1) OVER win2 AS d1,
               lag(n0, 2) OVER win2 AS n2, lag(d0, 2) OVER win2 AS d2
        FROM k
        WINDOW win2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, ts, event_id, hh, ll,
           CAST(100 AS DOUBLE) * (n0 / d0) AS pct_k,
           (CAST(100 AS DOUBLE) * (n0 / d0 + n1 / d1 + n2 / d2)) / CAST(3 AS DOUBLE)
               AS pct_d
    FROM l
    """,
)
def q512(spark: SparkSession, sf: str) -> DataFrame:
    """Stochastic oscillator %K/%D (operators/finance.stochastic_kd):
    rolling integer-cents HH/LL extremes (exact under any fold), %K one
    divide, %D rebuilt from lagged integer pairs as a fixed expression
    tree — never a float window sum."""
    from .operators.finance import stochastic_kd

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 20 == 0)
    p = ev.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("px"),
    )
    return stochastic_kd(p, ["user_id"], "px", ["ts", "event_id"], k_window=14)


# ------------------------------------------------------------------ q513
@query(
    "q513_rsi_cutler",
    """
    WITH p AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS px
        FROM events WHERE user_id % 20 = 0
    ),
    d AS (
        SELECT user_id, ts, event_id,
               px - lag(px) OVER win AS diff,
               row_number() OVER win AS rn
        FROM p WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    r AS (
        SELECT user_id, ts, event_id, rn,
               CAST(sum(CASE WHEN diff > 0 THEN diff ELSE 0 END) OVER win2 AS BIGINT) AS g,
               CAST(sum(CASE WHEN diff < 0 THEN -diff ELSE 0 END) OVER win2 AS BIGINT) AS lo
        FROM d
        WINDOW win2 AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id,
           CASE WHEN rn >= 15 THEN g END AS gain_sum,
           CASE WHEN rn >= 15 THEN lo END AS loss_sum,
           CASE WHEN rn >= 15 AND g + lo > 0 THEN (100 * g) / (g + lo) END AS rsi
    FROM r
    """,
)
def q513(spark: SparkSession, sf: str) -> DataFrame:
    """Cutler-form RSI (operators/finance.rsi_cutler): trailing
    integer-cent gain/loss sums (fold-order-free) and one divide —
    the bit-exact sibling of Wilder's EMA form."""
    from .operators.finance import rsi_cutler

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 20 == 0)
    p = ev.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("px"),
    )
    return rsi_cutler(p, ["user_id"], "px", ["ts", "event_id"], period=14)


# ------------------------------------------------------------------ q514
@query(
    "q514_newsvendor",
    """
    WITH daily AS (
        SELECT p.p_brand, l.l_shipdate AS day,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT p_brand, q,
               row_number() OVER (PARTITION BY p_brand ORDER BY q, day) AS rn,
               CAST(count(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_periods
        FROM daily
    )
    SELECT p_brand, n_periods,
           (3 * n_periods + 3) // 4 AS pick_rank,
           q AS stock_level,
           3 / CAST(4 AS BIGINT) AS service_target,
           ((3 * n_periods + 3) // 4) / n_periods AS achieved_service
    FROM ranked WHERE rn = (3 * n_periods + 3) // 4
    """,
)
def q514(spark: SparkSession, sf: str) -> DataFrame:
    """Newsvendor optimal stock per brand (operators/finance.
    newsvendor_stock): the ⌈CR·n⌉-th smallest daily demand at critical
    ratio 3/4 — exact integer ceil-division rank selection, total
    order under demand ties."""
    from .operators.finance import newsvendor_stock

    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_shipdate", "l_quantity")
    pt = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", F.col("l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
    )
    return newsvendor_stock(daily, ["p_brand"], "q", "day", cu=3, co=1)


# ------------------------------------------------------------------ q515
@query(
    "q515_clustering_coefficient",
    """
    WITH base AS (
        SELECT doc_id % 200 AS s, (doc_id * 7 + 3) % 200 AS d FROM documents
        WHERE doc_id % 200 != (doc_id * 7 + 3) % 200
    ),
    e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM base),
    bothdir AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT u, CAST(count(*) AS BIGINT) AS degree FROM bothdir GROUP BY u),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    tn AS (
        SELECT u, CAST(count(*) AS BIGINT) AS n_triangles FROM (
            SELECT unnest([x, y, z]) AS u FROM tri
        ) GROUP BY u
    )
    SELECT deg.u AS node, degree,
           CAST(COALESCE(tn.n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN degree >= 2
                THEN (2 * COALESCE(tn.n_triangles, 0)) / (degree * (degree - 1))
           END AS clustering
    FROM deg LEFT JOIN tn ON tn.u = deg.u
    """,
)
def q515(spark: SparkSession, sf: str) -> DataFrame:
    """Local clustering coefficient over the q471 document graph
    (operators/mining.clustering_coefficient): canonical-orientation
    triangle enumeration exploded to corners, cc = 2T/(d(d−1)) as one
    exact-integer divide."""
    from .operators.mining import clustering_coefficient

    d = load_table(spark, sf, "documents")
    base = d.select(
        (F.col("doc_id") % 200).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 200).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return clustering_coefficient(base)


# ------------------------------------------------------------------ q516
@query(
    "q516_fellegi_sunter",
    """
    WITH p AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               a.c_nationkey = b.c_nationkey AS same_nation,
               a.c_mktsegment = b.c_mktsegment AS same_segment,
               floor(a.c_acctbal / 1000.0) = floor(b.c_acctbal / 1000.0) AS same_bal_band,
               (a.c_acctbal >= 0) = (b.c_acctbal >= 0) AS same_bal_sign
        FROM customer a JOIN customer b ON a.c_custkey + 1 = b.c_custkey
    ),
    s AS (
        SELECT *,
               CAST(CASE WHEN coalesce(same_nation, false) THEN 225 ELSE 25 END AS BIGINT)
               * (CASE WHEN coalesce(same_segment, false) THEN 45 ELSE 5 END)
               * (CASE WHEN coalesce(same_bal_band, false) THEN 380 ELSE 20 END)
               * (CASE WHEN coalesce(same_bal_sign, false) THEN 98 ELSE 2 END) AS fs_num,
               CAST(CASE WHEN coalesce(same_nation, false) THEN 10 ELSE 240 END AS BIGINT)
               * (CASE WHEN coalesce(same_segment, false) THEN 10 ELSE 40 END)
               * (CASE WHEN coalesce(same_bal_band, false) THEN 20 ELSE 380 END)
               * (CASE WHEN coalesce(same_bal_sign, false) THEN 50 ELSE 50 END) AS fs_den
        FROM p
    )
    SELECT id_a, id_b, same_nation, same_segment, same_bal_band, same_bal_sign,
           fs_num, fs_den, fs_num / fs_den AS fs_weight,
           fs_num * 1 > fs_den * 2 AS is_match
    FROM s
    """,
)
def q516(spark: SparkSession, sf: str) -> DataFrame:
    """Fellegi–Sunter record-linkage scoring over consecutive customer
    pairs (operators/dedup.fellegi_sunter): rational m/u likelihood
    ratios accumulate as exact integer products, one divide for the
    weight, cross-multiplied match decision — no log-odds floats."""
    from .operators.dedup import fellegi_sunter

    c = load_table(spark, sf, "customer")
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    pairs = a.join(b, F.col("a_c_custkey") + 1 == F.col("b_c_custkey")).select(
        F.col("a_c_custkey").alias("id_a"),
        F.col("b_c_custkey").alias("id_b"),
        (F.col("a_c_nationkey") == F.col("b_c_nationkey")).alias("same_nation"),
        (F.col("a_c_mktsegment") == F.col("b_c_mktsegment")).alias("same_segment"),
        (F.floor(F.col("a_c_acctbal") / 1000.0) == F.floor(F.col("b_c_acctbal") / 1000.0)).alias("same_bal_band"),
        ((F.col("a_c_acctbal") >= 0) == (F.col("b_c_acctbal") >= 0)).alias("same_bal_sign"),
    )
    return fellegi_sunter(
        pairs,
        [
            ("same_nation", (9, 10), (1, 25)),
            ("same_segment", (9, 10), (1, 5)),
            ("same_bal_band", (19, 20), (1, 20)),
            ("same_bal_sign", (49, 50), (1, 2)),
        ],
        threshold=(2, 1),
    )


# ------------------------------------------------------------------ q517
@query(
    "q517_vocab_growth",
    r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                  x -> len(x) > 0)) AS t
        FROM documents
    ),
    totals AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tok GROUP BY 1),
    firsts AS (
        SELECT fid AS doc_id, CAST(count(*) AS BIGINT) AS n_new FROM (
            SELECT t, min(doc_id) AS fid FROM tok GROUP BY t
        ) GROUP BY 1
    ),
    per AS (
        SELECT totals.doc_id, n_tokens,
               CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new_tokens
        FROM totals LEFT JOIN firsts ON firsts.doc_id = totals.doc_id
    )
    SELECT doc_id, n_tokens, n_new_tokens,
           CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
           CAST(sum(n_new_tokens) OVER w AS BIGINT) AS cum_vocab
    FROM per WINDOW w AS (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
    """,
)
def q517(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps-law vocabulary growth (operators/text.vocab_growth):
    running distinct-vocab size via the first-occurrence decomposition,
    cumulative sums over the aggregated per-document relation — exact
    integer window sums."""
    from .operators.text import vocab_growth

    d = load_table(spark, sf, "documents")
    return vocab_growth(d)


# ------------------------------------------------------------------ q518
@query(
    "q518_dispersion_index",
    """
    WITH c AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    a AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(c) AS BIGINT) AS total,
               CAST(sum(c * c) AS BIGINT) AS q
        FROM c GROUP BY 1
    )
    SELECT event_type, n_buckets, total,
           total / n_buckets AS mean_count,
           (n_buckets * q - total * total) / (n_buckets * total) AS fano,
           n_buckets * q - total * total > n_buckets * total AS overdispersed
    FROM a
    """,
)
def q518(spark: SparkSession, sf: str) -> DataFrame:
    """Fano-factor burstiness of daily event counts per type
    (operators/profile.dispersion_index): Var/Mean as one divide of
    exact BIGINT moments; the overdispersion flag never builds a float
    limit."""
    from .operators.profile import dispersion_index

    ev = load_table(spark, sf, "events")
    return dispersion_index(ev, ["event_type"], "ts", bucket_seconds=86400)


# ------------------------------------------------------------------ q519
@query(
    "q519_rake_keywords",
    r"""
    WITH seg AS (
        SELECT doc_id, unnest(regexp_split_to_array(
            regexp_replace(regexp_replace(lower(text), '[^a-z ]+', '|', 'g'),
                           '\b(?:the|and|of|to|in|a|is|that|it|for)\b', '|', 'g'),
            '\|')) AS s
        FROM documents WHERE doc_id < 200
    ),
    pz AS (
        SELECT doc_id, ws, len(ws) AS plen, array_to_string(ws, ' ') AS phrase
        FROM (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(s), ' +'), w -> len(w) > 0) AS ws
            FROM seg
        ) WHERE len(ws) BETWEEN 1 AND 4
    ),
    wx AS (
        SELECT doc_id, phrase, plen, i, ws[i] AS w
        FROM pz, unnest(generate_series(1, len(ws))) AS t(i)
    ),
    stats AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq, CAST(sum(plen) AS BIGINT) AS deg
        FROM wx GROUP BY w
    ),
    sc AS (
        SELECT doc_id, phrase,
               CAST(max(plen) AS BIGINT) AS n_words,
               list_reduce([CAST(0 AS DOUBLE)] || list(deg / freq ORDER BY i),
                           (a, b) -> a + b) AS score
        FROM (SELECT DISTINCT doc_id, phrase, plen, i, w FROM wx) d
        JOIN stats USING (w)
        GROUP BY doc_id, phrase
    )
    SELECT doc_id, phrase, n_words, score, CAST(r AS BIGINT) AS "rank"
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, phrase) AS r
          FROM sc)
    WHERE r <= 5
    """,
)
def q519(spark: SparkSession, sf: str) -> DataFrame:
    """RAKE keyword extraction (operators/text.rake_keywords): stopword-
    delimited candidate phrases scored by Σ deg(w)/freq(w) — exact
    integer corpus stats, one divide per word, position-ordered left
    fold per phrase (never a hash-agg float sum), top-5 per doc."""
    from .operators.text import rake_keywords

    d = load_table(spark, sf, "documents").where(F.col("doc_id") < 200)
    return rake_keywords(d, top_k=5, max_phrase_len=4)


# ------------------------------------------------------------------ q520
@query(
    "q520_interval_join",
    """
    WITH base AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s
        FROM events WHERE user_id % 5 = 0
    ),
    l AS (SELECT user_id, event_id AS lid, s, s + event_id % 20000 + 1000 AS e
          FROM base WHERE event_id % 2 = 0),
    r AS (SELECT user_id, event_id AS rid, s, s + event_id % 20000 + 1000 AS e
          FROM base WHERE event_id % 2 = 1)
    SELECT l.user_id,
           l.lid AS l_lid, l.s AS l_s, l.e AS l_e,
           r.rid AS r_rid, r.s AS r_s, r.e AS r_e,
           CAST(least(l.e, r.e) - greatest(l.s, r.s) AS BIGINT) AS overlap
    FROM l JOIN r ON l.user_id = r.user_id AND l.s < r.e AND r.s < l.e
    """,
)
def q520(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-overlap join on synthetic per-user activity intervals
    (operators/merge.interval_join): grid-cell equi-join candidates,
    exact report-once claim on the overlap-start cell, integer residual
    predicate — never a nested loop; the oracle is the plain non-equi
    SQL."""
    from .operators.merge import interval_join

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 5 == 0)
    base = ev.select(
        "user_id", "event_id", F.unix_seconds(F.col("ts")).alias("s")
    ).withColumn("e", F.col("s") + F.col("event_id") % 20000 + 1000)
    left = base.where(F.col("event_id") % 2 == 0).select(
        "user_id", F.col("event_id").alias("lid"), "s", "e"
    )
    right = base.where(F.col("event_id") % 2 == 1).select(
        "user_id", F.col("event_id").alias("rid"), "s", "e"
    )
    return interval_join(left, right, "s", "e", "s", "e",
                         bucket_width=16384, by=["user_id"])


# ------------------------------------------------------------------ q521
@query(
    "q521_yules_k",
    r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
        FROM documents WHERE text IS NOT NULL
    ),
    nz AS (SELECT doc_id, tok FROM toks WHERE tok != ''),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM nz GROUP BY 1, 2),
    g AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(c * c) AS BIGINT) AS sum_f2
        FROM tc GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(g.n, 0) AS n_tokens,
           coalesce(g.n_types, 0) AS n_types,
           coalesce(g.sum_f2, 0) AS sum_f2,
           CASE WHEN g.n >= 2 THEN (10000 * (g.sum_f2 - g.n)) / (g.n * g.n) END AS yules_k,
           CASE WHEN g.n >= 2 THEN (g.sum_f2 - g.n) / (g.n * (g.n - 1)) END AS simpson
    FROM documents d LEFT JOIN g ON g.doc_id = d.doc_id
    """,
)
def q521(spark: SparkSession, sf: str) -> DataFrame:
    """Yule's K + Simpson repeat rate per document (operators/text.
    yules_k): Σf² folds horizontally over the sorted token array (zero
    shuffle — the whole statistic is a projection), one exact-integer
    divide each; the oracle takes the explode-and-count route."""
    from .operators.text import yules_k

    d = load_table(spark, sf, "documents")
    return yules_k(d)


# ------------------------------------------------------------------ q522
@query(
    "q522_grubbs",
    """
    WITH v AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    m AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
        FROM v GROUP BY 1
    ),
    d AS (
        SELECT v.event_type, v.c, abs(v.c * m.n - m.s) AS dev, m.n, m.s, m.q
        FROM v JOIN m ON m.event_type = v.event_type
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY dev DESC, c DESC) AS rn
        FROM d
    )
    SELECT event_type, n,
           s / n AS mean,
           CASE WHEN n >= 2 THEN sqrt((n * q - s * s) / (n * (n - 1))) END AS stddev,
           c AS suspect_scaled,
           CASE WHEN n >= 2 AND n * q - s * s > 0
                THEN (dev / n) / sqrt((n * q - s * s) / (n * (n - 1))) END AS g_stat
    FROM r WHERE rn = 1
    """,
)
def q522(spark: SparkSession, sf: str) -> DataFrame:
    """Grubbs outlier statistic per event type (operators/profile.
    grubbs_stat): exact-BIGINT deviations |x·n − S| with fold-free max,
    G as a fixed float tree over exact operands — the single-most-
    outlying value and its test statistic."""
    from .operators.profile import grubbs_stat

    ev = load_table(spark, sf, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    return grubbs_stat(ev, ["event_type"], "c")


# ------------------------------------------------------------------ q523
@query(
    "q523_durbin_watson",
    """
    WITH v AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE user_id % 20 = 0
    ),
    d AS (
        SELECT user_id, c,
               c - lag(c) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dx
        FROM v
    ),
    a AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q,
               CAST(coalesce(sum(dx * dx), 0) AS BIGINT) AS sum_sq_diff
        FROM d GROUP BY 1
    )
    SELECT user_id, n, sum_sq_diff,
           CASE WHEN n * q - s * s > 0
                THEN (n * sum_sq_diff) / (n * q - s * s) END AS dw
    FROM a
    """,
)
def q523(spark: SparkSession, sf: str) -> DataFrame:
    """Durbin–Watson autocorrelation statistic per user (operators/
    window.durbin_watson): n·Σ(Δx)²/(n·Q−S²) as ONE divide of exact
    BIGINTs — white noise ≈ 2, trending < 2."""
    from .operators.window import durbin_watson

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 20 == 0)
    v = ev.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    return durbin_watson(v, ["user_id"], "c", ["ts", "event_id"])


# ------------------------------------------------------------------ q524
@query(
    "q524_runs_test",
    """
    WITH v AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE user_id % 20 = 0
    ),
    m AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(c) AS BIGINT) AS s
        FROM v GROUP BY 1
    ),
    sg AS (
        SELECT v.user_id, v.ts, v.event_id,
               CASE WHEN v.c * m.cnt > m.s THEN 1
                    WHEN v.c * m.cnt < m.s THEN -1 END AS sgn
        FROM v JOIN m ON m.user_id = v.user_id
    ),
    t AS (
        SELECT user_id, sgn,
               CASE WHEN lag(sgn) OVER w IS NULL THEN 1
                    WHEN sgn != lag(sgn) OVER w THEN 1 ELSE 0 END AS new_run
        FROM sg WHERE sgn IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    a AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_signs,
               CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_plus,
               CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_minus,
               CAST(sum(new_run) AS BIGINT) AS runs
        FROM t GROUP BY 1
    )
    SELECT user_id, n_signs, n_plus, n_minus, runs,
           CASE WHEN n_signs >= 2 AND n_plus > 0 AND n_minus > 0
                     AND (2 * n_plus * n_minus) * (2 * n_plus * n_minus - n_signs) > 0
                THEN (runs - (CAST(1 AS DOUBLE) + (2 * n_plus * n_minus) / n_signs))
                     / sqrt(((2 * n_plus * n_minus) * (2 * n_plus * n_minus - n_signs))
                            / (n_signs * n_signs * (n_signs - 1))) END AS z
    FROM a
    """,
)
def q524(spark: SparkSession, sf: str) -> DataFrame:
    """Wald–Wolfowitz runs test about the mean per user (operators/
    window.runs_test): exact cross-product sign classification (never
    ON the mean), integer run counts, z as a fixed float tree."""
    from .operators.window import runs_test

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 20 == 0)
    v = ev.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    return runs_test(v, ["user_id"], "c", ["ts", "event_id"])


# ------------------------------------------------------------------ q525
@query(
    "q525_mcnemar",
    """
    WITH p AS (
        SELECT event_type,
               (CAST(round(value * 100) AS BIGINT) % 7 < 3) AS t,
               (CAST(round(value * 100) AS BIGINT) % 7 < 2) AS a,
               ((CAST(round(value * 100) AS BIGINT) + 3) % 7 < 3) AS b
        FROM events
    ),
    g AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN a = t AND NOT (b = t) THEN 1 ELSE 0 END) AS BIGINT) AS b_only_a,
               CAST(sum(CASE WHEN NOT (a = t) AND b = t THEN 1 ELSE 0 END) AS BIGINT) AS c_only_b
        FROM p GROUP BY 1
    )
    SELECT event_type, n, b_only_a, c_only_b,
           CASE WHEN b_only_a + c_only_b > 0
                THEN ((abs(b_only_a - c_only_b) - 1) * (abs(b_only_a - c_only_b) - 1))
                     / (b_only_a + c_only_b) END AS chi2
    FROM g
    """,
)
def q525(spark: SparkSession, sf: str) -> DataFrame:
    """McNemar paired classifier comparison per event type (functions/
    stats.mcnemar_test): exact integer discordant counts from one fused
    conditional agg, continuity-corrected χ² as one divide."""
    from .functions.stats import mcnemar_test

    ev = load_table(spark, sf, "events")
    m = F.round(F.col("value") * 100).cast("long") % 7
    p = ev.select(
        "event_type",
        (m < 3).alias("t"),
        (m < 2).alias("a"),
        ((F.round(F.col("value") * 100).cast("long") + 3) % 7 < 3).alias("b"),
    )
    return mcnemar_test(p, ["event_type"], "t", "a", "b", continuity=True)


# ------------------------------------------------------------------ q526
@query(
    "q526_fleiss_kappa",
    """
    WITH r AS (
        SELECT doc_id % 7 AS g, doc_id, (doc_id * 7 + 0) % 4 AS cat FROM documents
        UNION ALL SELECT doc_id % 7, doc_id, (doc_id * 11 + 1) % 4 FROM documents
        UNION ALL SELECT doc_id % 7, doc_id, (doc_id * 13 + 2) % 4 FROM documents
    ),
    cnt AS (SELECT g, doc_id, cat, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1, 2, 3),
    pk AS (SELECT g, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_items,
                  CAST(sum(c * c) AS BIGINT) AS ss FROM cnt GROUP BY 1),
    cj AS (SELECT g, cat, CAST(sum(c) AS BIGINT) AS cj FROM cnt GROUP BY 1, 2),
    cb AS (SELECT g, CAST(sum(cj * cj) AS BIGINT) AS cb FROM cj GROUP BY 1)
    SELECT pk.g, n_items, CAST(3 AS BIGINT) AS n_raters,
           (ss - n_items * 3) / (n_items * 3 * (3 - 1)) AS p_bar,
           cb / ((n_items * 3) * (n_items * 3)) AS p_e,
           CASE WHEN cb / ((n_items * 3) * (n_items * 3)) < 1
                THEN ((ss - n_items * 3) / (n_items * 3 * (3 - 1))
                      - cb / ((n_items * 3) * (n_items * 3)))
                     / (CAST(1 AS DOUBLE) - cb / ((n_items * 3) * (n_items * 3))) END AS kappa
    FROM pk JOIN cb ON cb.g = pk.g
    """,
)
def q526(spark: SparkSession, sf: str) -> DataFrame:
    """Fleiss' kappa over three synthesized raters of the documents
    table (functions/stats.fleiss_kappa): P̄ and Pₑ each ONE divide of
    exact BIGINT moments (identical denominators inside each sum), κ a
    fixed float tree."""
    from .functions.stats import fleiss_kappa

    d = load_table(spark, sf, "documents").select("doc_id")
    parts = []
    for j, p in enumerate([7, 11, 13]):
        parts.append(
            d.select(
                (F.col("doc_id") % 7).alias("g"),
                "doc_id",
                ((F.col("doc_id") * p + j) % 4).alias("cat"),
            )
        )
    ratings = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return fleiss_kappa(ratings, ["g"], "doc_id", "cat", n_raters=3)


# ------------------------------------------------------------------ q527
@query(
    "q527_gower_distance",
    """
    WITH p AS (
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               CAST(round(a.c_acctbal * 100) AS BIGINT) AS a_bal,
               CAST(round(b.c_acctbal * 100) AS BIGINT) AS b_bal,
               a.c_nationkey AS a_nat, b.c_nationkey AS b_nat,
               a.c_mktsegment AS a_seg, b.c_mktsegment AS b_seg
        FROM customer a JOIN customer b ON a.c_custkey + 1 = b.c_custkey
    )
    SELECT id_a, id_b, a_bal, b_bal, a_nat, b_nat, a_seg, b_seg,
           least(abs(a_bal - b_bal) / 1100000, CAST(1 AS DOUBLE)) AS d_a_bal,
           CAST(a_nat != b_nat AS DOUBLE) AS d_a_nat,
           CAST(a_seg != b_seg AS DOUBLE) AS d_a_seg,
           ((least(abs(a_bal - b_bal) / 1100000, CAST(1 AS DOUBLE))
             + CAST(a_nat != b_nat AS DOUBLE))
            + CAST(a_seg != b_seg AS DOUBLE)) / CAST(3 AS DOUBLE) AS gower
    FROM p
    """,
)
def q527(spark: SparkSession, sf: str) -> DataFrame:
    """Gower mixed-type distance over consecutive customer pairs
    (operators/dedup.gower_distance): integer-scaled numeric term (one
    divide against a literal range), 0/1 categorical mismatches, fixed
    float-tree mean — the ER distance beside Fellegi–Sunter."""
    from .operators.dedup import gower_distance

    c = load_table(spark, sf, "customer")
    a = c.select(*[F.col(x).alias(f"a_{x}") for x in c.columns])
    b = c.select(*[F.col(x).alias(f"b_{x}") for x in c.columns])
    pairs = a.join(b, F.col("a_c_custkey") + 1 == F.col("b_c_custkey")).select(
        F.col("a_c_custkey").alias("id_a"),
        F.col("b_c_custkey").alias("id_b"),
        F.round(F.col("a_c_acctbal") * 100).cast("long").alias("a_bal"),
        F.round(F.col("b_c_acctbal") * 100).cast("long").alias("b_bal"),
        F.col("a_c_nationkey").alias("a_nat"),
        F.col("b_c_nationkey").alias("b_nat"),
        F.col("a_c_mktsegment").alias("a_seg"),
        F.col("b_c_mktsegment").alias("b_seg"),
    )
    return gower_distance(
        pairs,
        numeric_fields=[("a_bal", "b_bal", 1100000)],
        categorical_fields=[("a_nat", "b_nat"), ("a_seg", "b_seg")],
    )


# ------------------------------------------------------------------ q528
@query(
    "q528_prr_signal",
    """
    WITH g AS (
        SELECT event_type,
               CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) % 10 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) % 10 = 0
                             THEN 0 ELSE 1 END) AS BIGINT) AS b
        FROM events GROUP BY 1
    ),
    t AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb FROM g)
    SELECT g.event_type, g.a, g.b,
           t.ta - g.a AS c, t.tb - g.b AS d,
           CASE WHEN t.ta - g.a > 0
                THEN (g.a * ((t.ta - g.a) + (t.tb - g.b)))
                     / ((g.a + g.b) * (t.ta - g.a)) END AS prr,
           CASE WHEN g.b > 0 AND t.ta - g.a > 0
                THEN (g.a * (t.tb - g.b)) / (g.b * (t.ta - g.a)) END AS ror
    FROM g, t
    """,
)
def q528(spark: SparkSession, sf: str) -> DataFrame:
    """Proportional reporting ratio + reporting odds ratio per event
    type (operators/profile.prr_signal): the pharmacovigilance 2×2 as
    exact BIGINT cross-products, PRR/ROR one divide each."""
    from .operators.profile import prr_signal

    ev = load_table(spark, sf, "events")
    flag = F.round(F.col("value") * 100).cast("long") % 10 == 0
    return prr_signal(ev.select("event_type", flag.alias("f")), "event_type", "f")


# ------------------------------------------------------------------ q529
@query(
    "q529_nb_overdispersion",
    """
    WITH c AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    a AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(c) AS BIGINT) AS total,
               CAST(sum(c * c) AS BIGINT) AS q
        FROM c GROUP BY 1
    )
    SELECT event_type, n_buckets, total,
           total / n_buckets AS mean_count,
           CASE WHEN total > 0
                THEN (n_buckets * q - total * total - n_buckets * total)
                     / (total * total) END AS alpha
    FROM a
    """,
)
def q529(spark: SparkSession, sf: str) -> DataFrame:
    """Negative-binomial overdispersion α by method of moments per
    event type (operators/profile.nb_overdispersion):
    (nQ−S²−nS)/S² as one exact divide — the Poisson-vs-NB model
    dial next to q518's Fano factor."""
    from .operators.profile import nb_overdispersion

    ev = load_table(spark, sf, "events")
    return nb_overdispersion(ev, ["event_type"], "ts", bucket_seconds=86400)


# ------------------------------------------------------------------ q530
@query(
    "q530_bitemporal_asof",
    """
    WITH ch AS (
        SELECT user_id, event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS valid_us,
               epoch_us(ts) + (event_id % 1000) * 1000000 AS tx_us
        FROM events
    ),
    q AS (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY valid_us DESC, event_id DESC) AS rn
        FROM ch
        WHERE valid_us <= 1705276800000000 AND tx_us <= 1705277300000000
    )
    SELECT user_id, valid_us, tx_us, event_id, event_type, cents
    FROM q WHERE rn = 1
    """,
)
def q530(spark: SparkSession, sf: str) -> DataFrame:
    """Bitemporal as-of lookup: the latest VALID-time version of each
    user's state among changes already RECORDED by transaction time T
    (late arrivals excluded exactly) — per-user packed-struct argmax
    over exact µs bounds, no join (the scd2_build axis discipline)."""
    ev = load_table(spark, sf, "events")
    v_us = F.unix_micros(F.col("ts"))
    ch = ev.select(
        "user_id", "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        v_us.alias("valid_us"),
        (v_us + (F.col("event_id") % 1000) * 1000000).alias("tx_us"),
    )
    V, T = 1705276800000000, 1705277300000000
    qual = ch.where((F.col("valid_us") <= V) & (F.col("tx_us") <= T))
    packed = F.struct(
        F.col("valid_us"), F.col("event_id"), F.col("tx_us"),
        F.col("event_type"), F.col("cents"),
    )
    top = qual.groupBy("user_id").agg(F.max(packed).alias("__p__"))
    return top.select(
        "user_id",
        F.col("__p__.valid_us").alias("valid_us"),
        F.col("__p__.tx_us").alias("tx_us"),
        F.col("__p__.event_id").alias("event_id"),
        F.col("__p__.event_type").alias("event_type"),
        F.col("__p__.cents").alias("cents"),
    )


# ------------------------------------------------------------------ q531
@query(
    "q531_two_prop_z",
    """
    WITH v AS (
        SELECT event_type, user_id % 2 = 0 AS g,
               CAST(round(value * 100) AS BIGINT) % 10 = 0 AS s
        FROM events
    ),
    a AS (
        SELECT event_type,
               CAST(sum(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN g AND s THEN 1 ELSE 0 END) AS BIGINT) AS x1,
               CAST(sum(CASE WHEN NOT g THEN 1 ELSE 0 END) AS BIGINT) AS n2,
               CAST(sum(CASE WHEN NOT g AND s THEN 1 ELSE 0 END) AS BIGINT) AS x2
        FROM v GROUP BY 1
    )
    SELECT event_type, n1, x1, n2, x2,
           x1 / n1 AS p1, x2 / n2 AS p2,
           CASE WHEN n1 > 0 AND n2 > 0 AND x1 + x2 > 0 AND x1 + x2 < n1 + n2
                THEN (x1 / n1 - x2 / n2)
                     / sqrt(((x1 + x2) / (n1 + n2)
                             * (CAST(1 AS DOUBLE) - (x1 + x2) / (n1 + n2)))
                            * ((n1 + n2) / (n1 * n2))) END AS z
    FROM a
    """,
)
def q531(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test per event type on a synthetic A/B split
    (functions/stats.two_prop_z): exact integer arm counts from one
    fused agg, z as a fixed float tree — the A/B readout primitive."""
    from .functions.stats import two_prop_z

    ev = load_table(spark, sf, "events")
    v = ev.select(
        "event_type",
        (F.col("user_id") % 2 == 0).alias("g"),
        (F.round(F.col("value") * 100).cast("long") % 10 == 0).alias("s"),
    )
    return two_prop_z(v, ["event_type"], "g", "s")


# ------------------------------------------------------------------ q532
def _sample_size_oracle() -> str:
    from .functions.stats import Z_ALPHA_05, Z_BETA_80

    return f"""
    WITH a AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs,
               CAST(sum(CASE WHEN CAST(round(value * 100) AS BIGINT) % 10 = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    g AS (SELECT a.*, unnest([1, 2, 5]) AS mde_pp FROM a),
    c AS (
        SELECT event_type, n_obs, CAST(mde_pp AS BIGINT) AS mde_pp,
               x / n_obs AS p1,
               x / n_obs + mde_pp / CAST(100 AS DOUBLE) AS p2
        FROM g
    )
    SELECT event_type, n_obs, p1 AS baseline, mde_pp,
           CASE WHEN p2 < 1 THEN CAST(floor(
               ((CAST('{Z_ALPHA_05!r}' AS DOUBLE) + CAST('{Z_BETA_80!r}' AS DOUBLE))
                * (CAST('{Z_ALPHA_05!r}' AS DOUBLE) + CAST('{Z_BETA_80!r}' AS DOUBLE)))
               * (p1 * (CAST(1 AS DOUBLE) - p1) + p2 * (CAST(1 AS DOUBLE) - p2))
               / ((p2 - p1) * (p2 - p1))) AS BIGINT) + 1 END AS required_n
    FROM c
    """


@query("q532_sample_size_plan", _sample_size_oracle())
def q532(spark: SparkSession, sf: str) -> DataFrame:
    """Experiment sample-size planner per event type (functions/stats.
    sample_size_plan): observed baseline rate × literal MDE grid,
    required per-arm n as floor(formula)+1 — a fixed float tree over
    exact ratios with the z-quantiles shipped as identical string
    literals."""
    from .functions.stats import sample_size_plan

    ev = load_table(spark, sf, "events")
    v = ev.select(
        "event_type",
        (F.round(F.col("value") * 100).cast("long") % 10 == 0).alias("s"),
    )
    return sample_size_plan(v, ["event_type"], "s", mdes_pp=[1, 2, 5])


# ------------------------------------------------------------------ q533
def _cramers_oracle() -> str:
    cats = ["click", "error", "purchase", "signup", "view"]
    xs = []
    for i, c in enumerate(cats):
        xs.append(
            f"CAST(sum(CASE WHEN event_type = '{c}' AND f THEN 1 ELSE 0 END) AS BIGINT) AS x{i},\n"
            f"               CAST(sum(CASE WHEN event_type = '{c}' AND NOT f THEN 1 ELSE 0 END) AS BIGINT) AS y{i}"
        )
    c1 = " + ".join(f"x{i}" for i in range(5))
    c2 = " + ".join(f"y{i}" for i in range(5))
    cells = []
    for i in range(5):
        ra = f"(x{i} + y{i})"
        d1 = f"CAST(x{i} * n - {ra} * c1 AS DOUBLE)"
        d2 = f"CAST(y{i} * n - {ra} * c2 AS DOUBLE)"
        t1 = f"(CASE WHEN {ra} > 0 THEN ({d1} * {d1}) / (n * {ra} * c1) ELSE CAST(0 AS DOUBLE) END)"
        t2 = f"(CASE WHEN {ra} > 0 THEN ({d2} * {d2}) / (n * {ra} * c2) ELSE CAST(0 AS DOUBLE) END)"
        cells.append(f"({t1} + {t2})")
    chi = cells[0]
    for cell in cells[1:]:
        chi = f"({chi} + {cell})"
    return f"""
    WITH v AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) % 10 = 0 AS f FROM events
    ),
    a AS (
        SELECT {", ".join(xs)}
        FROM v
    ),
    m AS (SELECT *, ({c1}) AS c1, ({c2}) AS c2, ({c1}) + ({c2}) AS n FROM a)
    SELECT CAST(n AS BIGINT) AS n, {chi} AS chi2, CAST(4 AS BIGINT) AS dof,
           sqrt({chi} / n) AS cramers_v
    FROM m
    """


@query("q533_cramers_v", _cramers_oracle())
def q533(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence + Cramér's V for event_type × value-flag
    (functions/stats.cramers_v): 5×2 cells as ONE fused conditional
    agg, per-cell terms summed in literal order as a fixed expression
    tree (dev² in DOUBLE — the q200 widening rule), V = √(χ²/N)."""
    from .functions.stats import cramers_v

    ev = load_table(spark, sf, "events")
    v = ev.select(
        "event_type",
        (F.round(F.col("value") * 100).cast("long") % 10 == 0).alias("f"),
    )
    return cramers_v(v, "event_type", "f",
                     ["click", "error", "purchase", "signup", "view"])


# ------------------------------------------------------------------ q534
def _geohash_oracle(precision: int = 5) -> str:
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    xq = (f"least(greatest(CAST(floor(((lon + CAST(180 AS DOUBLE)) / CAST(360 AS DOUBLE))"
          f" * CAST({1 << lon_bits} AS DOUBLE)) AS BIGINT), 0), {(1 << lon_bits) - 1})")
    yq = (f"least(greatest(CAST(floor(((lat + CAST(90 AS DOUBLE)) / CAST(180 AS DOUBLE))"
          f" * CAST({1 << lat_bits} AS DOUBLE)) AS BIGINT), 0), {(1 << lat_bits) - 1})")
    terms = []
    xi, yi = lon_bits - 1, lat_bits - 1
    for pos in range(total - 1, -1, -1):
        if (total - 1 - pos) % 2 == 0:
            terms.append(f"(((x >> {xi}) & 1) << {pos})")
            xi -= 1
        else:
            terms.append(f"(((y >> {yi}) & 1) << {pos})")
            yi -= 1
    code = " + ".join(terms)
    chars = []
    for c in range(precision):
        sh = total - 5 * (c + 1)
        chars.append(
            f"substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST((code >> {sh}) & 31 AS INT) + 1, 1)"
        )
    gh = " || ".join(chars)
    return f"""
    WITH pts AS (
        SELECT (CAST(round(value * 100) AS BIGINT) % 18000) / CAST(100 AS DOUBLE)
                   - CAST(90 AS DOUBLE) AS lat,
               (event_id % 36000) / CAST(100 AS DOUBLE) - CAST(180 AS DOUBLE) AS lon
        FROM events
    ),
    q AS (SELECT {xq} AS x, {yq} AS y FROM pts),
    k AS (SELECT {code} AS code FROM q)
    SELECT {gh} AS cell, CAST(count(*) AS BIGINT) AS n
    FROM k GROUP BY 1
    """


@query("q534_geohash_cells", _geohash_oracle(5))
def q534(spark: SparkSession, sf: str) -> DataFrame:
    """Geohash spatial bucketing of synthetic event coordinates
    (operators/geo.geohash_cell): quantize → fixed-tree bit interleave
    → literal base-32 lookup, all integer shifts/masks (no UDF, fully
    codegen); per-cell counts — the standard spatial partition key at
    scale."""
    from .operators.geo import geohash_cell

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pts = ev.select(
        ((cents % 18000) / F.lit(100.0) - F.lit(90.0)).alias("lat"),
        ((F.col("event_id") % 36000) / F.lit(100.0) - F.lit(180.0)).alias("lon"),
    )
    cell = geohash_cell(F.col("lat"), F.col("lon"), precision=5)
    return pts.select(cell.alias("cell")).groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# ------------------------------------------------------------------ q535
@query(
    "q535_soundex_blocks",
    """
    WITH w AS (
        SELECT p_partkey, regexp_extract(p_name, '^[A-Za-z]+') AS fw FROM part
    ),
    sx AS (
        SELECT p_partkey, fw,
               upper(regexp_replace(fw, '[^A-Za-z]', '', 'g')) AS u
        FROM w
    ),
    d0 AS (
        SELECT p_partkey, fw, u,
               translate(u, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            '01230120022455012623010202') AS d
        FROM sx
    ),
    dc AS (
        SELECT p_partkey, fw, u,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(d,
                   '0+', '0', 'g'), '1+', '1', 'g'), '2+', '2', 'g'),
                   '3+', '3', 'g'), '4+', '4', 'g'), '5+', '5', 'g'),
                   '6+', '6', 'g') AS d
        FROM d0
    ),
    code AS (
        SELECT p_partkey, fw,
               substr(u, 1, 1)
               || rpad(substr(replace(substr(d, 2, 999), '0', ''), 1, 3), 3, '0')
                   AS sx_code
        FROM dc
    )
    SELECT sx_code, CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT fw) AS BIGINT) AS n_words
    FROM code GROUP BY 1
    """,
)
def q535(spark: SparkSession, sf: str) -> DataFrame:
    """Soundex phonetic blocking over part-name first words
    (functions/strings.soundex_simple): translate + global run
    collapse + zero drop, byte-identical cross-engine; per-block sizes
    — the ER blocking-key audit beside snm_pairs."""
    from .functions.strings import soundex_simple

    pt = load_table(spark, sf, "part")
    w = pt.select(
        "p_partkey", F.regexp_extract(F.col("p_name"), "^[A-Za-z]+", 0).alias("fw")
    )
    code = w.select("fw", soundex_simple(F.col("fw")).alias("sx_code"))
    return code.groupBy("sx_code").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.count_distinct(F.col("fw")).cast("long").alias("n_words"),
    )


# ------------------------------------------------------------------ q536
@query(
    "q536_cidr_match",
    """
    WITH ips AS (
        SELECT CASE event_id % 4
                   WHEN 0 THEN 167772160 + 655360 + (event_id * 2654435761) % 65536
                   WHEN 1 THEN 167772160 + 1310720 + (event_id * 2654435761) % 65536
                   WHEN 2 THEN 3232235520 + (event_id * 2654435761) % 512
                   ELSE 3405774848 + (event_id * 2654435761) % 65536
               END AS ip
        FROM events
    ),
    m AS (
        SELECT ip,
               COALESCE(
                   CASE WHEN ip >> 8 = 12625921 THEN 'guest' END,
                   CASE WHEN ip >> 16 = 2570 THEN 'vpn' END,
                   CASE WHEN ip >> 16 = 49320 THEN 'dmz' END,
                   CASE WHEN ip >> 24 = 10 THEN 'corp' END
               ) AS subnet,
               COALESCE(
                   CASE WHEN ip >> 8 = 12625921 THEN 24 END,
                   CASE WHEN ip >> 16 = 2570 THEN 16 END,
                   CASE WHEN ip >> 16 = 49320 THEN 16 END,
                   CASE WHEN ip >> 24 = 10 THEN 8 END
               ) AS prefix_len
        FROM ips
    )
    SELECT subnet, CAST(prefix_len AS BIGINT) AS prefix_len,
           CAST(count(*) AS BIGINT) AS n
    FROM m GROUP BY 1, 2
    """,
)
def q536(spark: SparkSession, sf: str) -> DataFrame:
    """Longest-prefix CIDR enrichment of synthetic IPv4 traffic
    (operators/mining.cidr_match): literal subnet table, exact integer
    shift matching, longest prefix via ordered coalesce — per-subnet
    traffic counts (unmatched → NULL)."""
    from .operators.mining import cidr_match

    ev = load_table(spark, sf, "events")
    low = (F.col("event_id") * 2654435761) % 65536
    ips = ev.select(
        F.when(F.col("event_id") % 4 == 0, F.lit(167772160 + 655360) + low)
        .when(F.col("event_id") % 4 == 1, F.lit(167772160 + 1310720) + low)
        .when(F.col("event_id") % 4 == 2, F.lit(3232235520) + low % 512)
        .otherwise(F.lit(3405774848) + low)
        .alias("ip")
    )
    out = cidr_match(
        ips, "ip",
        [
            ("corp", 10 << 24, 8),            # 10.0.0.0/8
            ("vpn", (10 << 24) + (10 << 16), 16),   # 10.10.0.0/16
            ("dmz", (192 << 24) + (168 << 16), 16), # 192.168.0.0/16
            ("guest", (192 << 24) + (168 << 16) + (1 << 8), 24),  # 192.168.1.0/24
        ],
    )
    return out.groupBy("subnet", "prefix_len").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


# ------------------------------------------------------------------ q537
@query(
    "q537_hampel_filter",
    """
    WITH v AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS c
        FROM events WHERE user_id % 20 = 0
    ),
    w AS (
        SELECT user_id, ts, event_id, c,
               list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS wl
        FROM v
    ),
    s AS (
        SELECT user_id, ts, event_id, c, len(wl) AS wn, list_sort(wl) AS ws
        FROM w
    ),
    m AS (
        SELECT *, CAST(ws[6] * 2 AS BIGINT) AS med2_raw FROM s
    ),
    d AS (
        SELECT *, list_sort(list_transform(ws, x -> abs(x * 2 - med2_raw))) AS ds
        FROM m
    )
    SELECT user_id, ts, event_id, c,
           CASE WHEN wn = 11 THEN med2_raw END AS med2,
           CASE WHEN wn = 11 THEN CAST(ds[6] AS BIGINT) END AS mad2,
           CASE WHEN wn = 11 THEN abs(c * 2 - med2_raw) > 3 * ds[6] END AS is_outlier
    FROM d
    """,
)
def q537(spark: SparkSession, sf: str) -> DataFrame:
    """Hampel rolling-median despiking per user (operators/window.
    hampel_filter): centered 11-row window, median and MAD doubled to
    exact half-integers from ONE window collect — the outlier flag is
    a pure BIGINT comparison, never on a float boundary."""
    from .operators.window import hampel_filter

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 20 == 0)
    v = ev.select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    return hampel_filter(v, ["user_id"], "c", ["ts", "event_id"],
                         half_window=5, k_scaled=3)


# ------------------------------------------------------------------ q538
@query(
    "q538_triple_rules",
    """
    WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey % 40 AS i FROM lineitem),
    capped AS (
        SELECT b, i FROM (
            SELECT b, i, count(*) OVER (PARTITION BY b) AS bs FROM bi
        ) WHERE bs <= 10
    ),
    nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM capped),
    tr AS (
        SELECT a.i AS x, c.i AS y, d.i AS z, CAST(count(*) AS BIGINT) AS n_triple
        FROM capped a
        JOIN capped c ON a.b = c.b AND a.i < c.i
        JOIN capped d ON c.b = d.b AND c.i < d.i
        GROUP BY 1, 2, 3 HAVING count(*) >= 5
    ),
    pr AS (
        SELECT a.i AS x, c.i AS y, CAST(count(*) AS BIGINT) AS n_pair
        FROM capped a JOIN capped c ON a.b = c.b AND a.i < c.i
        GROUP BY 1, 2
    ),
    it AS (SELECT i, CAST(count(*) AS BIGINT) AS n_conseq FROM capped GROUP BY 1),
    rot AS (
        SELECT x AS ante_a, y AS ante_b, z AS conseq, n_triple FROM tr
        UNION ALL SELECT x, z, y, n_triple FROM tr
        UNION ALL SELECT y, z, x, n_triple FROM tr
    )
    SELECT r.ante_a, r.ante_b, r.conseq, r.n_triple, p.n_pair, it.n_conseq,
           r.n_triple / p.n_pair AS confidence,
           (r.n_triple * nb.n) / (p.n_pair * it.n_conseq) AS lift
    FROM rot r
    JOIN pr p ON p.x = r.ante_a AND p.y = r.ante_b
    JOIN it ON it.i = r.conseq
    CROSS JOIN nb
    """,
)
def q538(spark: SparkSession, sf: str) -> DataFrame:
    """Three-itemset association rules over order baskets of part
    pseudo-categories (operators/mining.triple_rules): canonical
    a<b<c triples via two equi-joins with the mega-basket cap, all
    three rotations scored — confidence and lift one exact divide
    each."""
    from .operators.mining import triple_rules

    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", (F.col("l_partkey") % 40).alias("cat")
    )
    return triple_rules(li, "l_orderkey", "cat", min_count=5, max_basket=10)


# ------------------------------------------------------------------ q539
@query(
    "q539_reciprocity",
    """
    WITH e AS (
        SELECT DISTINCT doc_id % 200 AS s, (doc_id * 7 + 3) % 200 AS d
        FROM documents
        WHERE doc_id % 200 != (doc_id * 7 + 3) % 200
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n_mutual
        FROM e WHERE EXISTS (SELECT 1 FROM e r WHERE r.s = e.d AND r.d = e.s)
    ),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e)
    SELECT t.n_edges, m.n_mutual, m.n_mutual / t.n_edges AS reciprocity
    FROM t, m
    """,
)
def q539(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocity of the directed q471 document graph
    (operators/mining.reciprocity): reversed-key self-semi-join, one
    exact divide."""
    from .operators.mining import reciprocity

    d = load_table(spark, sf, "documents")
    edges = d.select(
        (F.col("doc_id") % 200).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 200).alias("dst"),
    )
    return reciprocity(edges)


# ------------------------------------------------------------------ q540
@query(
    "q540_security_scorecard",
    """
    WITH ev AS (
        SELECT user_id, ts, event_id FROM events WHERE user_id % 10 = 0
    ),
    -- beacon component (q509 discipline)
    g AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS gap
        FROM ev
    ),
    gc AS (SELECT user_id, gap, CAST(count(*) AS BIGINT) AS cnt
           FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
    bc AS (
        SELECT user_id,
               CAST(sum(cnt) AS BIGINT) AS n_gaps,
               CAST(sum(gap * cnt) AS BIGINT) AS span_s,
               sum(CAST(gap AS HUGEINT) * gap * cnt) AS g2
        FROM gc GROUP BY 1
    ),
    beacon AS (
        SELECT user_id,
               n_gaps >= 10 AND CAST(100 AS HUGEINT) * n_gaps * g2
                                < CAST(101 AS HUGEINT) * span_s * span_s AS is_beacon
        FROM bc
    ),
    -- offnet component (q536 ip synthesis; unmatched = offnet)
    ipm AS (
        SELECT user_id,
               CASE event_id % 4
                   WHEN 0 THEN 167772160 + 655360 + (event_id * 2654435761) % 65536
                   WHEN 1 THEN 167772160 + 1310720 + (event_id * 2654435761) % 65536
                   WHEN 2 THEN 3232235520 + (event_id * 2654435761) % 512
                   ELSE 3405774848 + (event_id * 2654435761) % 65536
               END AS ip
        FROM ev
    ),
    offn AS (
        SELECT user_id,
               CAST(sum(CASE WHEN COALESCE(
                   CASE WHEN ip >> 8 = 12625921 THEN 1 END,
                   CASE WHEN ip >> 16 = 2570 THEN 1 END,
                   CASE WHEN ip >> 16 = 49320 THEN 1 END,
                   CASE WHEN ip >> 24 = 10 THEN 1 END) IS NULL
                   THEN 1 ELSE 0 END) AS BIGINT) AS offnet_events
        FROM ipm GROUP BY 1
    ),
    -- burst component (c-chart cross-mult, daily buckets)
    daily AS (
        SELECT user_id, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS b,
               CAST(count(*) AS BIGINT) AS n
        FROM ev GROUP BY 1, 2
    ),
    base AS (
        SELECT user_id, CAST(sum(n) AS BIGINT) AS total,
               CAST(max(b) - min(b) + 1 AS BIGINT) AS span_b
        FROM daily GROUP BY 1
    ),
    burst AS (
        SELECT d.user_id,
               CAST(sum(CASE WHEN d.n * b.span_b - b.total > 0
                             AND (d.n * b.span_b - b.total) * (d.n * b.span_b - b.total)
                                 > 9 * b.total * b.span_b
                             THEN 1 ELSE 0 END) AS BIGINT) AS burst_days
        FROM daily d JOIN base b ON b.user_id = d.user_id
        GROUP BY 1
    ),
    -- night + volume component
    vol AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN CAST(floor(epoch(ts) / 3600.0) AS BIGINT) % 24 < 6
                             THEN 1 ELSE 0 END) AS BIGINT) AS night_events
        FROM ev GROUP BY 1
    ),
    comp AS (
        SELECT v.user_id, v.n_events, v.night_events,
               COALESCE(b.is_beacon, false) AS is_beacon,
               o.offnet_events,
               COALESCE(bu.burst_days, 0) AS burst_days
        FROM vol v
        LEFT JOIN beacon b ON b.user_id = v.user_id
        JOIN offn o ON o.user_id = v.user_id
        LEFT JOIN burst bu ON bu.user_id = v.user_id
    )
    SELECT user_id, n_events, is_beacon, offnet_events,
           CAST(burst_days AS BIGINT) AS burst_days, night_events,
           CAST(CASE WHEN is_beacon THEN 3 ELSE 0 END
                + CASE WHEN offnet_events * 5 > n_events THEN 2 ELSE 0 END
                + CASE WHEN burst_days > 0 THEN 2 ELSE 0 END
                + CASE WHEN night_events * 4 > n_events THEN 1 ELSE 0 END AS BIGINT)
               AS risk_score,
           CASE WHEN (CASE WHEN is_beacon THEN 3 ELSE 0 END
                      + CASE WHEN offnet_events * 5 > n_events THEN 2 ELSE 0 END
                      + CASE WHEN burst_days > 0 THEN 2 ELSE 0 END
                      + CASE WHEN night_events * 4 > n_events THEN 1 ELSE 0 END) >= 5
                THEN 'high'
                WHEN (CASE WHEN is_beacon THEN 3 ELSE 0 END
                      + CASE WHEN offnet_events * 5 > n_events THEN 2 ELSE 0 END
                      + CASE WHEN burst_days > 0 THEN 2 ELSE 0 END
                      + CASE WHEN night_events * 4 > n_events THEN 1 ELSE 0 END) >= 3
                THEN 'medium' ELSE 'low' END AS tier
    FROM comp
    """,
)
def q540(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user security-posture scorecard — the SOC capstone composing
    FOUR engine operators over one user subset: beacon_detect (timer
    C2), cidr_match off-network share, c_chart burst days, and a
    night-hours profile, fused into an integer risk score and tier.
    Every component flag is exact integer cross-multiplication; the
    ENTIRE chain is replayed in one SQL oracle (the q450/q500
    discipline)."""
    from .operators.mining import beacon_detect, cidr_match
    from .operators.window import c_chart

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 10 == 0).select(
        "user_id", "ts", "event_id"
    )
    beacon = beacon_detect(ev, ["user_id"], "ts", "event_id", min_gaps=10).select(
        "user_id", "is_beacon"
    )
    low = (F.col("event_id") * 2654435761) % 65536
    ips = ev.select(
        "user_id",
        F.when(F.col("event_id") % 4 == 0, F.lit(167772160 + 655360) + low)
        .when(F.col("event_id") % 4 == 1, F.lit(167772160 + 1310720) + low)
        .when(F.col("event_id") % 4 == 2, F.lit(3232235520) + low % 512)
        .otherwise(F.lit(3405774848) + low)
        .alias("ip"),
    )
    matched = cidr_match(
        ips, "ip",
        [
            ("corp", 10 << 24, 8),
            ("vpn", (10 << 24) + (10 << 16), 16),
            ("dmz", (192 << 24) + (168 << 16), 16),
            ("guest", (192 << 24) + (168 << 16) + (1 << 8), 24),
        ],
    )
    offn = matched.groupBy("user_id").agg(
        F.sum(F.col("subnet").isNull().cast("long")).cast("long").alias("offnet_events")
    )
    chart = c_chart(ev, ["user_id"], "ts", bucket_seconds=86400, sigmas=3)
    burst = chart.groupBy("user_id").agg(
        F.sum(F.col("out_high").cast("long")).cast("long").alias("burst_days")
    )
    vol = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            (F.floor(F.unix_seconds(F.col("ts")) / 3600).cast("long") % 24 < 6).cast("long")
        ).cast("long").alias("night_events"),
    )
    comp = (
        vol.join(beacon, on="user_id", how="left")
        .join(offn, on="user_id")
        .join(burst, on="user_id", how="left")
        .select(
            "user_id", "n_events", "night_events",
            F.coalesce(F.col("is_beacon"), F.lit(False)).alias("is_beacon"),
            "offnet_events",
            F.coalesce(F.col("burst_days"), F.lit(0)).cast("long").alias("burst_days"),
        )
    )
    score = (
        F.when(F.col("is_beacon"), 3).otherwise(0)
        + F.when(F.col("offnet_events") * 5 > F.col("n_events"), 2).otherwise(0)
        + F.when(F.col("burst_days") > 0, 2).otherwise(0)
        + F.when(F.col("night_events") * 4 > F.col("n_events"), 1).otherwise(0)
    )
    return comp.select(
        "user_id", "n_events", "is_beacon", "offnet_events", "burst_days", "night_events",
        score.cast("long").alias("risk_score"),
        F.when(score >= 5, "high").when(score >= 3, "medium").otherwise("low").alias("tier"),
    )


# ------------------------------------------------------------------ q541
@query(
    "q541_lindley_queue",
    """
    WITH v AS (
        SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS a,
               event_id % 30 + 1 AS s
        FROM events WHERE user_id % 20 = 0
    ),
    u AS (
        SELECT user_id, event_id, a, s,
               lag(s) OVER w - (a - lag(a) OVER w) AS uu
        FROM v WINDOW w AS (PARTITION BY user_id ORDER BY a, event_id)
    ),
    p AS (
        SELECT user_id, event_id, a, s,
               CAST(COALESCE(sum(uu) OVER wr, 0) AS BIGINT) AS pp,
               row_number() OVER w AS rn
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY a, event_id),
               wr AS (PARTITION BY user_id ORDER BY a, event_id ROWS UNBOUNDED PRECEDING)
    ),
    lp AS (
        SELECT *, lag(pp) OVER (PARTITION BY user_id ORDER BY a, event_id) AS lpp
        FROM p
    ),
    m AS (
        SELECT *, CAST(COALESCE(min(lpp) OVER
                   (PARTITION BY user_id ORDER BY a, event_id ROWS UNBOUNDED PRECEDING), 0)
                   AS BIGINT) AS mm
        FROM lp
    )
    SELECT user_id, event_id,
           a AS arrival, CAST(s AS BIGINT) AS service,
           CAST(CASE WHEN rn = 1 THEN 0
                ELSE greatest(0, pp - least(mm, 0)) END AS BIGINT) AS wait,
           a + (CASE WHEN rn = 1 THEN 0 ELSE greatest(0, pp - least(mm, 0)) END) + s
               AS depart
    FROM m
    """,
)
def q541(spark: SparkSession, sf: str) -> DataFrame:
    """FIFO queue waiting times per user via Lindley's recurrence
    (operators/window.lindley_waits): the sequential-looking recurrence
    solved EXACTLY as prefix-sum minus shifted running-min of integer
    U_i — two BIGINT windows, no scan operator, no float state."""
    from .operators.window import lindley_waits

    ev = load_table(spark, sf, "events").where(F.col("user_id") % 20 == 0)
    v = ev.select(
        "user_id", "event_id",
        F.unix_seconds(F.col("ts")).alias("a"),
        (F.col("event_id") % 30 + 1).alias("s"),
    )
    return lindley_waits(v, ["user_id"], "a", "s", ["a", "event_id"]).drop("a")


# ------------------------------------------------------------------ q542
@query(
    "q542_greedy_knapsack",
    """
    WITH items AS (
        SELECT p_brand, p_partkey,
               CAST(round(p_retailprice * 100) AS BIGINT) AS value,
               CAST(p_size AS BIGINT) AS weight
        FROM part
    ),
    ranked AS (
        SELECT p_brand, p_partkey, value, weight,
               value / weight AS density,
               CAST(sum(weight) OVER (PARTITION BY p_brand
                                      ORDER BY value / weight DESC, p_partkey
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS running_weight
        FROM items
    )
    SELECT p_brand, p_partkey, value, weight, density, running_weight
    FROM ranked WHERE running_weight <= 200
    """,
)
def q542(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy knapsack selection per brand (operators/mining.
    greedy_knapsack): density sort on the exact-integer ratio (double
    identical cross-engine, id tie-break), integer running weight
    against the budget — the shelf-capacity planner."""
    from .operators.mining import greedy_knapsack

    pt = load_table(spark, sf, "part").select(
        "p_brand", "p_partkey",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("val"),
        F.col("p_size").alias("wt"),
    )
    return greedy_knapsack(pt, ["p_brand"], "p_partkey", "val", "wt", budget=200)


# ------------------------------------------------------------------ q543
@query(
    "q543_psi_daily",
    """
    WITH bins AS (SELECT unnest(range(0, 10)) AS bin),
    days AS (
        SELECT DISTINCT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
        FROM events WHERE event_type = 'click'
    ),
    hd AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(greatest(0, least(9, floor((value - 0.0) / 200.0 * 10))) AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'click' AND value IS NOT NULL
        GROUP BY 1, 2
    ),
    hb AS (
        SELECT CAST(greatest(0, least(9, floor((value - 0.0) / 200.0 * 10))) AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS cb
        FROM events WHERE event_type = 'click' AND value IS NOT NULL
        GROUP BY 1
    ),
    td AS (SELECT day, CAST(sum(c) AS BIGINT) AS nd FROM hd GROUP BY 1),
    tb AS (SELECT CAST(sum(cb) AS BIGINT) AS nb FROM hb),
    grid AS (SELECT d.day, b.bin FROM days d CROSS JOIN bins b)
    SELECT g.day, round(sum((pa - pb) * ln(pa / pb)), 6) AS psi FROM (
        SELECT g.day,
               (coalesce(hd.c, 0) + 1) / CAST(td.nd + 10 AS DOUBLE) AS pa,
               (coalesce(hb.cb, 0) + 1) / CAST(tb.nb + 10 AS DOUBLE) AS pb
        FROM grid g
        LEFT JOIN hd ON hd.day = g.day AND hd.bin = g.bin
        LEFT JOIN hb ON hb.bin = g.bin
        JOIN td ON td.day = g.day
        CROSS JOIN tb
    ) g GROUP BY g.day
    """,
)
def q543(spark: SparkSession, sf: str) -> DataFrame:
    """Daily PSI drift of the click-value distribution against the
    full-period baseline over a fixed 10-bin grid (q206's Laplace-
    smoothed discipline per day): exact integer masses, ≤10 ln terms
    per day, 6dp round."""
    ev = load_table(spark, sf, "events").where(
        (F.col("event_type") == "click") & F.col("value").isNotNull()
    )
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    b = F.greatest(F.lit(0), F.least(F.lit(9), F.floor((F.col("value") - 0.0) / 200.0 * 10))).cast("int")
    base = ev.select(day.alias("day"), b.alias("bin"))
    days = base.select("day").distinct()
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    hd = base.groupBy("day", "bin").agg(F.count(F.lit(1)).cast("long").alias("c"))
    hb = base.groupBy("bin").agg(F.count(F.lit(1)).cast("long").alias("cb"))
    td = hd.groupBy("day").agg(F.sum("c").cast("long").alias("nd"))
    tb = hb.agg(F.sum("cb").cast("long").alias("nb"))
    grid = days.crossJoin(F.broadcast(bins))
    j = (
        grid.join(hd, on=["day", "bin"], how="left")
        .join(F.broadcast(hb), on="bin", how="left")
        .join(F.broadcast(td), on="day")
        .crossJoin(F.broadcast(tb))
    )
    pa = (F.coalesce(F.col("c"), F.lit(0)) + 1) / (F.col("nd") + 10).cast("double")
    pb = (F.coalesce(F.col("cb"), F.lit(0)) + 1) / (F.col("nb") + 10).cast("double")
    return j.select("day", pa.alias("pa"), pb.alias("pb")).groupBy("day").agg(
        F.round(F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))), 6).alias("psi")
    )


# ------------------------------------------------------------------ q544
def _q544_sql_term(k: int) -> str:
    # rho^k / k! as a left-associative product over k factors — linear
    # size, unlike the B_k recurrence whose unrolling doubles per step
    # (2^14 leaves at s=14 kills Janino codegen; q474 survives only
    # because s=10).
    import math

    if k == 0:
        return "CAST(1.0 AS DOUBLE)"
    p = "rho"
    for _ in range(k - 1):
        p = f"({p} * rho)"
    return f"({p} / CAST({math.factorial(k)} AS DOUBLE))"


def _q544_oracle() -> str:
    picks = []
    for s in (8, 10, 12, 14):
        terms = [_q544_sql_term(k) for k in range(s + 1)]
        ssum = terms[0]
        for t in terms[1:]:
            ssum = f"({ssum} + {t})"
        b = f"({terms[s]} / {ssum})"
        c = f"({b} / (CAST(1.0 AS DOUBLE) - (rho / {s}) * (CAST(1.0 AS DOUBLE) - {b})))"
        picks.append(
            f"SELECT event_type, n_calls, rho, CAST({s} AS BIGINT) AS servers,\n"
            f"       CASE WHEN rho < {s} THEN {c} END AS erlang_c,\n"
            f"       CASE WHEN rho < {s} THEN ({c} * aht) / ({s} - rho) END AS asa_s\n"
            f"FROM f"
        )
    body = "\nUNION ALL\n".join(picks)
    return f"""
    WITH traffic AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_calls,
               CAST(sum(CAST(round(value * 100) AS BIGINT) % 600 + 60) AS BIGINT)
                 AS hold_s
        FROM events GROUP BY event_type
    ),
    f AS (
        SELECT event_type, n_calls,
               CAST(hold_s AS DOUBLE) / 86400 AS rho,
               hold_s / n_calls AS aht
        FROM traffic
    )
    {body}
    """


def _q544_col_term(rho, k: int):
    import math

    if k == 0:
        return F.lit(1.0)
    p = rho
    for _ in range(k - 1):
        p = p * rho
    return p / F.lit(float(math.factorial(k)))


@query("q544_erlang_c_grid", _q544_oracle())
def q544(spark: SparkSession, sf: str) -> DataFrame:
    """Erlang-C staffing grid per event type: for each server count in
    {8,10,12,14}, wait probability C = B/(1 − (ρ/s)(1−B)) and average
    speed of answer. Erlang-B comes from the CLOSED FORM
    B = (ρ^s/s!) / Σ_{k≤s} ρ^k/k! — each term a linear-size
    left-associative product — because the q474 recurrence unrolling
    doubles per step and 2^14 leaves at s=14 breaks whole-stage
    codegen; the closed form is O(s²) nodes and bit-identical
    cross-engine (fixed association order, exact factorial literals).
    Offered load and AHT are exact integer ratios; the
    workforce-planning what-if relation."""
    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    traffic = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.sum(cents % 600 + 60).cast("long").alias("hold_s"),
    )
    f = traffic.select(
        "event_type", "n_calls",
        (F.col("hold_s").cast("double") / 86400).alias("rho"),
        (F.col("hold_s") / F.col("n_calls")).alias("aht"),
    )
    outs = []
    for s in (8, 10, 12, 14):
        rho = F.col("rho")
        terms = [_q544_col_term(rho, k) for k in range(s + 1)]
        ssum = terms[0]
        for t in terms[1:]:
            ssum = ssum + t
        b = terms[s] / ssum
        c = b / (F.lit(1.0) - (rho / F.lit(s)) * (F.lit(1.0) - b))
        outs.append(
            f.select(
                "event_type", "n_calls", "rho",
                F.lit(s).cast("long").alias("servers"),
                F.when(rho < s, c).alias("erlang_c"),
                F.when(rho < s, (c * F.col("aht")) / (F.lit(s) - rho)).alias("asa_s"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ------------------------------------------------------------------ q545
@query(
    "q545_risk_ratios",
    """
    WITH daily AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(sum((CASE WHEN user_id % 2 = 0 THEN 1 ELSE -1 END)
                        * CAST(round(value) AS BIGINT)) AS BIGINT) AS pnl
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(pnl) AS BIGINT) AS s,
               CAST(sum(pnl * pnl) AS BIGINT) AS q,
               CAST(sum(CASE WHEN pnl < 0 THEN pnl * pnl ELSE 0 END) AS BIGINT) AS dq
        FROM daily GROUP BY 1
    )
    SELECT event_type, n, s, q, dq,
           s / n AS mean_pnl,
           CASE WHEN n > 1 AND (q / n - (s / n) * (s / n)) > 0
                THEN (s / n) / sqrt(((q / n - (s / n) * (s / n)) * n) / (n - 1))
           END AS sharpe,
           CASE WHEN dq > 0 THEN (s / n) / sqrt(dq / n) END AS sortino
    FROM s
    """,
)
def q545(spark: SparkSession, sf: str) -> DataFrame:
    """Sharpe and Sortino ratios per event type over a signed daily
    P&L series (operators/finance.risk_ratios): exact BIGINT power
    sums (whole-dollar P&L keeps Σr² far under 2^53), moment algebra
    on identically-converted doubles — one two-stage hash agg."""
    from .operators.finance import risk_ratios

    ev = load_table(spark, sf, "events")
    sgn = F.when(F.col("user_id") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
    ).agg(F.sum(sgn * F.round(F.col("value")).cast("long")).cast("long").alias("pnl"))
    return risk_ratios(daily, ["event_type"], "pnl")


# ------------------------------------------------------------------ q546
@query(
    "q546_roll_spread",
    """
    WITH p AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS px
        FROM events
    ),
    d AS (
        SELECT user_id, ts, event_id,
               px - lag(px) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d
        FROM p
    ),
    dd AS (
        SELECT user_id, d,
               lag(d) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dprev
        FROM d
    ),
    agg AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(d * dprev) AS BIGINT) AS a,
               CAST(sum(d) AS BIGINT) AS s1,
               CAST(sum(dprev) AS BIGINT) AS s0
        FROM dd WHERE d IS NOT NULL AND dprev IS NOT NULL
        GROUP BY 1
    )
    SELECT user_id, n_pairs, a, s1, s0,
           a / n_pairs - (s1 / n_pairs) * (s0 / n_pairs) AS autocov,
           CASE WHEN a / n_pairs - (s1 / n_pairs) * (s0 / n_pairs) < 0
                THEN 2 * sqrt(-(a / n_pairs - (s1 / n_pairs) * (s0 / n_pairs)))
           END AS spread_scaled
    FROM agg
    """,
)
def q546(spark: SparkSession, sf: str) -> DataFrame:
    """Roll (1984) implied bid-ask spread per user path
    (operators/finance.roll_spread): 2·√(−serial autocovariance of
    price changes) from exact BIGINT sums over ONE per-key ordered
    window (the Δ column lagged again over the same sort), covariance
    assembled in double on identically-converted operands."""
    from .operators.finance import roll_spread

    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id", "value")
    return roll_spread(ev, ["user_id"], "value", ["ts", "event_id"], scale=100)


# ------------------------------------------------------------------ q547
@query(
    "q547_amihud_illiq",
    """
    WITH daily AS (
        SELECT user_id, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(max(CAST(round(value * 100) AS BIGINT))
                    - min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS rng,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    per AS (
        SELECT user_id, (rng * 1000000) // n AS ppm FROM daily
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum(ppm) AS BIGINT) AS ppm_sum,
           sum(ppm) / count(*) AS illiq_ppm
    FROM per GROUP BY 1
    """,
)
def q547(spark: SparkSession, sf: str) -> DataFrame:
    """Range-based Amihud illiquidity per user
    (operators/finance.amihud_illiquidity): per-day price range ·1e6
    DIV activity as an exact integer ppm, mean as ONE divide of two
    BIGINTs — two hash aggs sharing the key prefix, no window, no
    float sums."""
    from .operators.finance import amihud_illiquidity

    ev = load_table(spark, sf, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    return amihud_illiquidity(ev, ["user_id"], day, "value", scale=100)


# ------------------------------------------------------------------ q548
@query(
    "q548_volume_profile",
    """
    WITH p AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS px FROM events
    ),
    bands AS (
        SELECT event_type, px // 5000 AS band,
               CAST(sum(px) AS BIGINT) AS notional,
               CAST(count(*) AS BIGINT) AS n_trades
        FROM p GROUP BY 1, 2
    )
    SELECT event_type, band, notional, n_trades,
           (notional * 1000000) // (CAST(sum(notional) OVER (PARTITION BY event_type) AS BIGINT))
             AS share_ppm,
           notional = CAST(max(notional) OVER (PARTITION BY event_type) AS BIGINT) AS is_poc
    FROM bands
    """,
)
def q548(spark: SparkSession, sf: str) -> DataFrame:
    """Volume profile per event type (operators/finance.
    volume_profile): $50 price bands, notional share in exact integer
    ppm, point-of-control flag — per-key totals ride a window over
    the ALREADY AGGREGATED band relation (bounded state), never raw
    ticks."""
    from .operators.finance import volume_profile

    ev = load_table(spark, sf, "events").select("event_type", "value")
    return volume_profile(ev, ["event_type"], "value", band=5000, scale=100)


# ------------------------------------------------------------------ q549
@query(
    "q549_naive_bayes_lang",
    r"""
    WITH tr AS (
        SELECT lang, doc_id FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL
    ),
    tr_tok AS (
        SELECT lang AS cls, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL
    ),
    counts AS (SELECT cls, tok, CAST(count(*) AS BIGINT) AS cnt FROM tr_tok GROUP BY 1, 2),
    cls_stats AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS tok_c FROM counts GROUP BY 1),
    priors AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_c FROM tr GROUP BY 1),
    vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM counts),
    ntot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr),
    classes AS (
        SELECT cls, tok_c, n_c, v, n
        FROM cls_stats JOIN priors USING (cls) CROSS JOIN vocab CROSS JOIN ntot
    ),
    te AS (
        SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\s+')[1:12] AS toks
        FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL
    ),
    te_tok AS (
        SELECT doc_id, i AS pos, toks[i] AS tok
        FROM te, unnest(generate_series(1, len(toks))) AS t(i)
    ),
    scored AS (
        SELECT doc_id, cls, pos, n_c, n,
               (coalesce(cnt, 0) + 1) / (tok_c + v) AS ratio
        FROM te_tok CROSS JOIN classes
        LEFT JOIN counts USING (cls, tok)
    ),
    folded AS (
        SELECT doc_id, cls, max(n_c) AS n_c, max(n) AS n,
               list_reduce([CAST(1.0 AS DOUBLE)] || list(ratio ORDER BY pos),
                           (a, b) -> a * b) AS prod
        FROM scored GROUP BY 1, 2
    ),
    per AS (SELECT doc_id, cls, (n_c / n) * prod AS score FROM folded),
    pred AS (
        SELECT doc_id, cls, score,
               row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cls) AS rn
        FROM per
    )
    SELECT p.doc_id, p.cls AS pred_lang, t.lang AS true_lang,
           p.cls = t.lang AS correct, p.score
    FROM pred p JOIN te t USING (doc_id) WHERE rn = 1
    """,
)
def q549(spark: SparkSession, sf: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier (operators/text.
    naive_bayes_classify): add-1-smoothed per-class unigram models
    trained on even doc_ids, odd doc_ids scored over their first 12
    tokens — per-token likelihood is ONE exact-integer divide, the
    per-doc product a position-ordered LEFT FOLD (never a hash-agg
    float product), broadcast model joins, argmax under a (score DESC,
    class) total order; accuracy vs the lang label rides along."""
    from .operators.text import naive_bayes_classify

    d = load_table(spark, sf, "documents")
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    preds = naive_bayes_classify(train, test, "doc_id", "lang", "text", k_tokens=12)
    truth = test.where(F.col("text").isNotNull()).select("doc_id", F.col("lang").alias("true_lang"))
    return preds.join(truth, "doc_id").select(
        "doc_id", "pred_lang", "true_lang",
        (F.col("pred_lang") == F.col("true_lang")).alias("correct"),
        "score",
    )


# ------------------------------------------------------------------ q550
@query(
    "q550_kcenter_diverse",
    """
    WITH ex AS (
        SELECT vec_id, d AS dim,
               CAST(round(CAST(embedding[d] AS DOUBLE) * 1000) AS BIGINT) AS xi
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(d)
    ),
    c1 AS (SELECT dim, xi AS ci FROM ex WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
    d1 AS (SELECT vec_id, CAST(sum((xi - ci) * (xi - ci)) AS BIGINT) AS dist
           FROM ex JOIN c1 USING (dim) GROUP BY 1),
    p2 AS (SELECT vec_id, dist FROM d1 ORDER BY dist DESC, vec_id LIMIT 1),
    c2 AS (SELECT dim, xi AS ci FROM ex WHERE vec_id = (SELECT vec_id FROM p2)),
    d2 AS (SELECT d1.vec_id, least(d1.dist, x.dist2) AS dist
           FROM d1 JOIN (SELECT vec_id, CAST(sum((xi - ci) * (xi - ci)) AS BIGINT) AS dist2
                         FROM ex JOIN c2 USING (dim) GROUP BY 1) x USING (vec_id)),
    p3 AS (SELECT vec_id, dist FROM d2 ORDER BY dist DESC, vec_id LIMIT 1),
    c3 AS (SELECT dim, xi AS ci FROM ex WHERE vec_id = (SELECT vec_id FROM p3)),
    d3 AS (SELECT d2.vec_id, least(d2.dist, x.dist3) AS dist
           FROM d2 JOIN (SELECT vec_id, CAST(sum((xi - ci) * (xi - ci)) AS BIGINT) AS dist3
                         FROM ex JOIN c3 USING (dim) GROUP BY 1) x USING (vec_id)),
    p4 AS (SELECT vec_id, dist FROM d3 ORDER BY dist DESC, vec_id LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS sel_round,
           (SELECT min(vec_id) FROM embeddings) AS vec_id, CAST(0 AS BIGINT) AS dist
    UNION ALL SELECT CAST(2 AS BIGINT), vec_id, dist FROM p2
    UNION ALL SELECT CAST(3 AS BIGINT), vec_id, dist FROM p3
    UNION ALL SELECT CAST(4 AS BIGINT), vec_id, dist FROM p4
    """,
)
def q550(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy k-center diverse selection over embeddings
    (operators/similarity.kcenter_greedy, k=3): integer-scaled vectors
    make every squared distance an exact BIGINT and every farthest-
    point argmax tie-free under (dist DESC, id); row 4 is the coverage
    radius after the three picks.  Bounded passes, corpus never
    shuffles — the diverse-coreset seed for training-data sampling."""
    from .operators.similarity import kcenter_greedy

    emb = load_table(spark, sf, "embeddings")
    return kcenter_greedy(emb, "vec_id", "embedding", k=3, scale=1000)


# ------------------------------------------------------------------ q551
@query(
    "q551_weighted_kappa",
    r"""
    WITH r AS (
        SELECT least(n_chars // 200, 4) AS ra,
               least(CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) // 40,
                     4) AS rb
        FROM documents WHERE text IS NOT NULL
    ),
    cont AS (SELECT ra, rb, CAST(count(*) AS BIGINT) AS cnt FROM r GROUP BY 1, 2),
    wobs AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n,
               CAST(sum((ra - rb) * (ra - rb) * cnt) AS BIGINT) AS sum_w_obs
        FROM cont
    ),
    rows_ AS (SELECT ra, CAST(sum(cnt) AS BIGINT) AS row_n FROM cont GROUP BY 1),
    cols_ AS (SELECT rb, CAST(sum(cnt) AS BIGINT) AS col_n FROM cont GROUP BY 1),
    wexp AS (
        SELECT CAST(sum((ra - rb) * (ra - rb) * row_n * col_n) AS BIGINT) AS sum_w_exp
        FROM rows_ CROSS JOIN cols_
    )
    SELECT n, sum_w_obs, sum_w_exp,
           CASE WHEN sum_w_exp != 0 THEN 1 - (n * sum_w_obs) / sum_w_exp END AS kappa_w
    FROM wobs CROSS JOIN wexp
    """,
)
def q551(spark: SparkSession, sf: str) -> DataFrame:
    """Quadratically weighted Cohen's κ (functions/stats.
    weighted_kappa) between two ordinal document graders (length
    quintile vs token-count quintile): w_ij = (i−j)², all sums exact
    BIGINTs from one contingency pass + a broadcast marginal cross
    join, κ_w ONE divide — the ordinal labeling-QA metric."""
    from .functions.stats import weighted_kappa

    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    r = d.select(
        F.least(F.expr("n_chars DIV 200"), F.lit(4).cast("long")).alias("ra"),
        F.least(F.expr(
            "CAST(size(split(lower(trim(text)), '\\\\s+')) AS BIGINT) DIV 40"
        ), F.lit(4).cast("long")).alias("rb"),
    )
    return weighted_kappa(r, "ra", "rb")


# ------------------------------------------------------------------ q552
@query(
    "q552_fd_discovery",
    """
    SELECT 'o_orderkey' AS determinant, 'o_custkey' AS dependent,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS viol_groups,
           CAST(sum(greatest(nd, 1) - 1) AS BIGINT) AS excess,
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM (SELECT o_orderkey, CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd
          FROM orders GROUP BY 1)
    UNION ALL
    SELECT 'o_custkey', 'o_orderstatus',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(greatest(nd, 1) - 1) AS BIGINT),
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
    FROM (SELECT o_custkey, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd
          FROM orders GROUP BY 1)
    UNION ALL
    SELECT 'o_orderpriority', 'o_orderstatus',
           CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(greatest(nd, 1) - 1) AS BIGINT),
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
    FROM (SELECT o_orderpriority, CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS nd
          FROM orders GROUP BY 1)
    """,
)
def q552(spark: SparkSession, sf: str) -> DataFrame:
    """Functional-dependency audit over orders (operators/profile.
    fd_violations): per candidate det→dep pair, ONE count-distinct agg
    on the determinant + an integer roll-up — n_groups, violating
    groups, excess values, holds flag.  o_orderkey→o_custkey holds
    (key FD); the behavioral pairs do not."""
    from .operators.profile import fd_violations

    o = load_table(spark, sf, "orders")
    return fd_violations(
        o,
        [
            ("o_orderkey", "o_custkey"),
            ("o_custkey", "o_orderstatus"),
            ("o_orderpriority", "o_orderstatus"),
        ],
    )


# ------------------------------------------------------------------ q553
@query(
    "q553_personalized_pagerank",
    """
    WITH base AS (
        SELECT doc_id % 60 AS src, (doc_id * 11 + 5) % 60 AS dst FROM documents
        WHERE doc_id % 60 != (doc_id * 11 + 5) % 60
    ),
    edges AS (SELECT DISTINCT src, dst FROM base),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    r0 AS (SELECT node, CASE WHEN node = 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS rank FROM nodes),
    c1 AS (
        SELECT e.dst AS node, sum(r0.rank / deg.d) AS m
        FROM edges e JOIN r0 ON r0.node = e.src JOIN deg ON deg.src = e.src
        GROUP BY e.dst
    ),
    r1 AS (
        SELECT nodes.node,
               0.15 * (CASE WHEN nodes.node = 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
               + 0.85 * coalesce(c1.m, 0) AS rank
        FROM nodes LEFT JOIN c1 ON c1.node = nodes.node
    ),
    c2 AS (
        SELECT e.dst AS node, sum(r1.rank / deg.d) AS m
        FROM edges e JOIN r1 ON r1.node = e.src JOIN deg ON deg.src = e.src
        GROUP BY e.dst
    ),
    r2 AS (
        SELECT nodes.node,
               0.15 * (CASE WHEN nodes.node = 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
               + 0.85 * coalesce(c2.m, 0) AS rank
        FROM nodes LEFT JOIN c2 ON c2.node = nodes.node
    )
    SELECT node, round(rank, 9) AS rank FROM r2
    """,
)
def q553(spark: SparkSession, sf: str) -> DataFrame:
    """Personalized PageRank from seed node 0 (operators/merge.
    personalized_pagerank): the pagerank join+agg shape with ALL
    teleport mass on the seed — proximity ranking for
    recommendations; two distributed rounds replayed exactly by the
    oracle CTE chain (q175 discipline, 9dp-rounded)."""
    from .operators.merge import personalized_pagerank

    d = load_table(spark, sf, "documents")
    edges = d.select(
        (F.col("doc_id") % 60).alias("src"),
        ((F.col("doc_id") * 11 + 5) % 60).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    pr = personalized_pagerank(edges, 0, n_iter=2, damping=0.85)
    return pr.select("node", F.round("rank", 9).alias("rank"))


# ------------------------------------------------------------------ q554
def _q554_oracle() -> str:
    rounds = []
    for r in (1, 2, 3):
        rounds.append(f"""
    p{r} AS (
        SELECT t[i] || ' ' || t[i + 1] AS pair, CAST(sum(c) AS BIGINT) AS n
        FROM (SELECT c, string_split(trim(s), '  ') AS t FROM u{r - 1}) x,
             unnest(generate_series(1, len(t) - 1)) AS g(i)
        GROUP BY 1
    ),
    b{r} AS (SELECT pair, n FROM p{r} ORDER BY n DESC, pair LIMIT 1),
    u{r} AS (
        SELECT w, c,
               replace(s,
                       ' ' || split_part(b.pair, ' ', 1) || '  '
                           || split_part(b.pair, ' ', 2) || ' ',
                       ' ' || replace(b.pair, ' ', '') || ' ') AS s
        FROM u{r - 1} CROSS JOIN b{r} b
    )""")
    body = ",".join(rounds)
    return rf"""
    WITH words AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT unnest(string_split(
                regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS w
            FROM documents
        ) WHERE w != '' GROUP BY w
    ),
    u0 AS (
        SELECT w, c, ' ' || substr(base, 1, length(base) - 1) AS s
        FROM (SELECT w, c, regexp_replace(w, '(.)', '\1  ', 'g') AS base FROM words)
    ),{body}
    SELECT CAST(1 AS BIGINT) AS merge_round,
           split_part(pair, ' ', 1) AS left_sym,
           split_part(pair, ' ', 2) AS right_sym, n AS pair_count FROM b1
    UNION ALL SELECT CAST(2 AS BIGINT), split_part(pair, ' ', 1), split_part(pair, ' ', 2), n FROM b2
    UNION ALL SELECT CAST(3 AS BIGINT), split_part(pair, ' ', 1), split_part(pair, ' ', 2), n FROM b3
    """


@query("q554_bpe_train", _q554_oracle())
def q554(spark: SparkSession, sf: str) -> DataFrame:
    """BPE tokenizer merge training, 3 rounds (operators/bpe.bpe_train —
    the 100 TB design: after ONE corpus pass to (distinct word, count),
    every round runs on that small weighted relation; pair counts are
    exact BIGINT aggs tie-broken (n DESC, pair); the greedy leftmost-
    non-overlapping merge is ONE literal double-space replace).  The
    oracle replays every round — unit-string construction, pair
    explode, argmax, replace — term for term in SQL."""
    from .operators.bpe import bpe_train

    d = load_table(spark, sf, "documents")
    merges = bpe_train(d, "text", n_merges=3)
    rows = [(m["step"], m["left"], m["right"], m["n"]) for m in merges]
    return spark.createDataFrame(
        rows, "merge_round bigint, left_sym string, right_sym string, pair_count bigint"
    )


# ------------------------------------------------------------------ q555
def _q555_oracle() -> str:
    # reuse q554's training CTE chain, then segment the vocabulary with
    # the learned merges and report the subword-fertility histogram
    base = _q554_oracle()
    head = base[: base.rindex("SELECT CAST(1 AS BIGINT) AS merge_round")]
    return (
        head.rstrip()
        + """,
    seg AS (
        SELECT w, c,
               replace(replace(replace(u0.s,
                   ' ' || split_part(b1.pair, ' ', 1) || '  ' || split_part(b1.pair, ' ', 2) || ' ',
                   ' ' || replace(b1.pair, ' ', '') || ' '),
                   ' ' || split_part(b2.pair, ' ', 1) || '  ' || split_part(b2.pair, ' ', 2) || ' ',
                   ' ' || replace(b2.pair, ' ', '') || ' '),
                   ' ' || split_part(b3.pair, ' ', 1) || '  ' || split_part(b3.pair, ' ', 2) || ' ',
                   ' ' || replace(b3.pair, ' ', '') || ' ') AS s
        FROM u0 CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3
    ),
    fert AS (
        SELECT CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_units,
               length(w) AS n_chars, c
        FROM seg
    )
    SELECT n_units,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(c) AS BIGINT) AS n_occurrences,
           CAST(sum(n_chars * c) AS BIGINT) AS chars_weighted
    FROM fert GROUP BY 1
    """
    )
    # NOTE: u0's s is rebuilt from scratch here (not u3) so the replay
    # applies the merges in ORDER to the original char segmentation —
    # exactly what bpe_segment does.


@query("q555_bpe_segment", _q555_oracle())
def q555(spark: SparkSession, sf: str) -> DataFrame:
    """Subword-fertility histogram after applying the 3 learned BPE
    merges (operators/bpe.bpe_segment): per distinct word the merge
    chain replays IN ORDER as literal replaces, then words group by
    their unit count — n_words, corpus occurrences, char mass.  The
    tokenizer-quality relation (fertility = units per word) that
    decides whether a merge table is worth shipping."""
    from .operators.bpe import bpe_segment, bpe_train, word_counts

    d = load_table(spark, sf, "documents")
    merges = bpe_train(d, "text", n_merges=3)
    wc = word_counts(d, "text")
    seg = bpe_segment(d, merges, "text").dropDuplicates(["w"]).join(wc, "w")
    return (
        seg.select(
            F.size("units").cast("long").alias("n_units"),
            F.length("w").cast("long").alias("n_chars"),
            "c",
        )
        .groupBy("n_units")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("c").cast("long").alias("n_occurrences"),
            F.sum(F.col("n_chars") * F.col("c")).cast("long").alias("chars_weighted"),
        )
    )


# ------------------------------------------------------------------ q556
@query(
    "q556_dau_wau_mau",
    """
    WITH active AS (
        SELECT DISTINCT user_id, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM active),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY 1),
    contrib7 AS (
        SELECT user_id, day + o AS day
        FROM active, unnest(generate_series(0, 6)) AS t(o)
    ),
    wau AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM contrib7 GROUP BY 1
    ),
    contrib28 AS (
        SELECT user_id, day + o AS day
        FROM active, unnest(generate_series(0, 27)) AS t(o)
    ),
    mau AS (
        SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
        FROM contrib28 GROUP BY 1
    )
    SELECT d.day, dau.dau, wau.wau, mau.mau,
           (dau.dau * 1000000) // mau.mau AS stickiness_ppm
    FROM days d JOIN dau USING (day) JOIN wau USING (day) JOIN mau USING (day)
    """,
)
def q556(spark: SparkSession, sf: str) -> DataFrame:
    """DAU / WAU / MAU engagement with DAU/MAU stickiness in exact
    integer ppm: trailing-window DISTINCT users computed by exploding
    each (user, active-day) into the bounded set of future days it
    contributes to (7 / 28 rows) — turning a sliding distinct-count
    window (unbounded state) into plain hash aggs; only observed days
    report (the days relation gates the calendar)."""
    ev = load_table(spark, sf, "events")
    active = ev.select(
        "user_id",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
    ).distinct()
    days = active.select("day").distinct()
    dau = active.groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    c7 = active.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 6)).alias("day")
    )
    wau = c7.groupBy("day").agg(F.countDistinct("user_id").cast("long").alias("wau"))
    c28 = active.select(
        "user_id", F.explode(F.sequence(F.col("day"), F.col("day") + 27)).alias("day")
    )
    mau = c28.groupBy("day").agg(F.countDistinct("user_id").cast("long").alias("mau"))
    out = days.join(dau, "day").join(wau, "day").join(mau, "day")
    return out.select(
        "day", "dau", "wau", "mau",
        F.expr("(dau * 1000000) DIV mau").alias("stickiness_ppm"),
    )


# ------------------------------------------------------------------ q557
_Q557_POLY = [(100, 100), (900, 200), (700, 800), (500, 400), (200, 700)]


def _q557_oracle() -> str:
    terms = []
    n = len(_Q557_POLY)
    for i in range(n):
        x1, y1 = _Q557_POLY[i]
        x2, y2 = _Q557_POLY[(i + 1) % n]
        if y1 == y2:
            continue
        op = "<" if y2 > y1 else ">"
        terms.append(
            f"CASE WHEN ({y1} > gy) != ({y2} > gy)"
            f" AND (gx - {x1}) * ({y2 - y1}) {op} (gy - {y1}) * ({x2 - x1})"
            f" THEN 1 ELSE 0 END"
        )
    total = " + ".join(terms)
    return f"""
    WITH pts AS (
        SELECT event_id,
               (CAST(round(value * 100) AS BIGINT) * 37) % 1000 AS gx,
               (CAST(round(value * 100) AS BIGINT) * 91) % 1000 AS gy
        FROM events WHERE event_id % 7 = 0
    )
    SELECT event_id, gx, gy, ({total}) % 2 = 1 AS inside
    FROM pts
    """


@query("q557_point_in_polygon", _q557_oracle())
def q557(spark: SparkSession, sf: str) -> DataFrame:
    """Geofence tagging (operators/geo.point_in_polygon): even-odd ray
    casting against a literal concave pentagon, every edge term an
    exact integer cross product (cross-multiplied — no division, no
    epsilon), the edge set unrolled into ONE codegen expression — zero
    shuffles, zero joins."""
    from .operators.geo import point_in_polygon

    ev = load_table(spark, sf, "events").where(F.col("event_id") % 7 == 0)
    cents = F.round(F.col("value") * 100).cast("long")
    pts = ev.select(
        "event_id",
        ((cents * 37) % 1000).alias("gx"),
        ((cents * 91) % 1000).alias("gy"),
    )
    return point_in_polygon(pts, "gx", "gy", _Q557_POLY)


# ------------------------------------------------------------------ q558
def _q558_oracle() -> str:
    rounds = []
    for r in (1, 2, 3):
        rounds.append(f"""
    p1_{r} AS (SELECT x, y FROM pts ORDER BY md5(CAST(id AS VARCHAR) || ':{r}') LIMIT 1),
    p2_{r} AS (SELECT x, y FROM pts WHERE x != (SELECT x FROM p1_{r})
               ORDER BY md5(CAST(id AS VARCHAR) || ':{r}') LIMIT 1),
    r{r} AS (
        SELECT CAST({r} AS BIGINT) AS sel_round,
               a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2,
               CAST(sum(CASE WHEN abs(p.y * (b.x - a.x) - p.x * (b.y - a.y)
                                      - (a.y * (b.x - a.x) - a.x * (b.y - a.y)))
                                  <= 1000 * abs(b.x - a.x) THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_inliers
        FROM pts p CROSS JOIN p1_{r} a CROSS JOIN p2_{r} b
        GROUP BY a.x, a.y, b.x, b.y
    )""")
    body = ",".join(rounds)
    return f"""
    WITH pts AS (
        SELECT event_id AS id,
               CAST(round(value * 100) AS BIGINT) AS x,
               3 * CAST(round(value * 100) AS BIGINT) + event_id % 1000 - 500
                 + CASE WHEN event_id % 50 = 0 THEN 70000 ELSE 0 END AS y
        FROM events
    ),{body},
    m AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3)
    SELECT *, n_inliers = max(n_inliers) OVER () AS is_best FROM m
    """


@query("q558_ransac_line", _q558_oracle())
def q558(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic RANSAC line fit (functions/stats.ransac_line) on a
    synthetic noisy line with 2% gross outliers: 2-point samples drawn
    by portable md5 hash order (no RNG), exact rational models, fully
    cross-multiplied BIGINT inlier tests — the consensus flag marks
    the round(s) that dodge the outliers."""
    from .functions.stats import ransac_line

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pts = ev.select(
        F.col("event_id").alias("id"),
        cents.alias("x"),
        (
            3 * cents + F.col("event_id") % 1000 - 500
            + F.when(F.col("event_id") % 50 == 0, 70000).otherwise(0)
        ).alias("y"),
    )
    return ransac_line(pts, "id", "x", "y", n_rounds=3, threshold=1000)


# ------------------------------------------------------------------ q559
@query(
    "q559_second_price_auction",
    """
    WITH bids AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               user_id AS bidder, CAST(round(value * 100) AS BIGINT) AS bid
        FROM events
    ),
    ranked AS (
        SELECT event_type, day, bidder, bid,
               row_number() OVER (PARTITION BY event_type, day
                                  ORDER BY bid DESC, bidder) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type, day) AS BIGINT) AS n
        FROM bids
    ),
    agg AS (
        SELECT event_type, day,
               CAST(max(n) AS BIGINT) AS n_bids,
               max(CASE WHEN rn = 1 THEN bidder END) AS winner,
               max(CASE WHEN rn = 1 THEN bid END) AS win_bid,
               max(CASE WHEN rn = 2 THEN bid END) AS second
        FROM ranked WHERE rn <= 2 GROUP BY 1, 2
    )
    SELECT event_type, day, n_bids,
           CASE WHEN win_bid >= 5000 THEN winner END AS winner,
           win_bid,
           CASE WHEN win_bid >= 5000
                THEN greatest(coalesce(second, 0), 5000) END AS clearing_price,
           win_bid >= 5000 AS sold
    FROM agg
    """,
)
def q559(spark: SparkSession, sf: str) -> DataFrame:
    """Second-price auction clearing per (event_type, day) lot
    (operators/finance.second_price_auction): top-2 bids under a
    total order pivot to fixed columns, clearing price =
    max(second bid, $50 reserve) — exact integer money;
    WindowGroupLimit prunes each lot to 2 rows pre-shuffle."""
    from .operators.finance import second_price_auction

    ev = load_table(spark, sf, "events")
    bids = ev.select(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
        F.col("user_id").alias("bidder"),
        F.round(F.col("value") * 100).cast("long").alias("bid"),
    )
    return second_price_auction(bids, ["event_type", "day"], "bidder", "bid", reserve=5000)


# ------------------------------------------------------------------ q560
@query(
    "q560_vpin",
    """
    WITH p AS (
        SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS px
        FROM events
    ),
    d AS (
        SELECT user_id, ts, event_id,
               px - lag(px) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dp
        FROM p
    ),
    nz AS (SELECT * FROM d WHERE dp IS NOT NULL AND dp != 0),
    seq AS (
        SELECT user_id,
               CASE WHEN dp > 0 THEN 1 ELSE 0 END AS buy,
               (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 50
                 AS bucket
        FROM nz
    ),
    b AS (
        SELECT user_id, bucket,
               CAST(count(*) AS BIGINT) AS n_ticks,
               CAST(sum(buy) AS BIGINT) AS n_buys
        FROM seq GROUP BY 1, 2
    ),
    imb AS (
        SELECT user_id, bucket, n_ticks, n_buys,
               (abs(2 * n_buys - n_ticks) * 1000000) // n_ticks AS imb_ppm
        FROM b
    )
    SELECT user_id, bucket, n_ticks, n_buys, imb_ppm,
           CAST(sum(imb_ppm) OVER w AS BIGINT)
             / CAST(count(*) OVER w AS BIGINT) AS vpin_ppm
    FROM imb
    WINDOW w AS (PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def q560(spark: SparkSession, sf: str) -> DataFrame:
    """VPIN order-flow toxicity per user path (operators/finance.vpin):
    sign-of-Δp classification, 50-tick volume buckets, |buys−sells|
    imbalance in exact integer ppm, trailing-4-bucket mean as an
    integer rolling sum + ONE divide — the flow-toxicity monitor, all
    BIGINT until the final division."""
    from .operators.finance import vpin

    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_id", "value")
    return vpin(ev, ["user_id"], ["ts", "event_id"], "value",
                bucket_size=50, window_buckets=4, scale=100)


# ------------------------------------------------------------------ q561
@query(
    "q561_hubness",
    """
    WITH ex AS (
        SELECT vec_id, d AS dim,
               CAST(round(CAST(embedding[d] AS DOUBLE) * 1000) AS BIGINT) AS xi
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(d)
        WHERE vec_id < 300
    ),
    ids AS (SELECT DISTINCT vec_id FROM ex),
    pd AS (
        SELECT a.vec_id AS qid, b.vec_id AS nid,
               CAST(sum((a.xi - b.xi) * (a.xi - b.xi)) AS BIGINT) AS d
        FROM ex a JOIN ex b ON a.dim = b.dim AND a.vec_id != b.vec_id
        GROUP BY 1, 2
    ),
    topk AS (
        SELECT nid FROM (
            SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY d, nid) AS rn
            FROM pd
        ) WHERE rn <= 5
    ),
    occ AS (SELECT nid, CAST(count(*) AS BIGINT) AS k_occurrences FROM topk GROUP BY 1)
    SELECT ids.vec_id, coalesce(occ.k_occurrences, 0) AS k_occurrences
    FROM ids LEFT JOIN occ ON ids.vec_id = occ.nid
    """,
)
def q561(spark: SparkSession, sf: str) -> DataFrame:
    """k-occurrence hubness over a 300-vector sample
    (operators/similarity.hubness, k=5): exact integer squared
    distances make the top-k cut tie-free, the scoring pass is the
    deliberate broadcast brute-force baseline, zero-occurrence vectors
    report 0 — the ANN-pathology diagnostic."""
    from .operators.similarity import hubness

    emb = load_table(spark, sf, "embeddings").where(F.col("vec_id") < 300)
    return hubness(emb, "vec_id", "embedding", k=5, scale=1000)


# ------------------------------------------------------------------ q562
@query(
    "q562_fairness_audit",
    """
    WITH f AS (
        SELECT user_id % 3 AS grp,
               CASE WHEN CAST(round(value * 100) AS BIGINT) % 5 < 2 THEN 1 ELSE 0 END AS y_true,
               CASE WHEN (CASE WHEN CAST(round(value * 100) AS BIGINT) % 5 < 2 THEN 1 ELSE 0 END)
                         != (CASE WHEN (CAST(round(value * 100) AS BIGINT) * (user_id % 3 + 1)) % 13 = 0
                                  THEN 1 ELSE 0 END)
                    THEN 1 ELSE 0 END AS y_pred
        FROM events
    ),
    g AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y_pred) AS BIGINT) AS n_selected,
               CAST(sum(y_true) AS BIGINT) AS n_pos,
               CAST(sum(y_true * y_pred) AS BIGINT) AS tp,
               CAST(sum((1 - y_true) * y_pred) AS BIGINT) AS fp
        FROM f GROUP BY 1
    ),
    rates AS (
        SELECT grp, n, n_selected, n_pos,
               (n_selected * 1000000) // n AS sel_ppm,
               CASE WHEN n_pos > 0 THEN (tp * 1000000) // n_pos END AS tpr_ppm,
               CASE WHEN n - n_pos > 0 THEN (fp * 1000000) // (n - n_pos) END AS fpr_ppm
        FROM g
    )
    SELECT grp, n, n_selected, n_pos, sel_ppm, tpr_ppm, fpr_ppm,
           max(sel_ppm) OVER () - min(sel_ppm) OVER () AS parity_gap_ppm,
           max(tpr_ppm) OVER () - min(tpr_ppm) OVER () AS tpr_gap_ppm,
           max(fpr_ppm) OVER () - min(fpr_ppm) OVER () AS fpr_gap_ppm,
           (max(sel_ppm) OVER () - min(sel_ppm) OVER ()) <= 100000
           AND (max(tpr_ppm) OVER () - min(tpr_ppm) OVER ()) <= 100000
           AND (max(fpr_ppm) OVER () - min(fpr_ppm) OVER ()) <= 100000 AS passes
    FROM rates
    """,
)
def q562(spark: SparkSession, sf: str) -> DataFrame:
    """Group-fairness audit (functions/stats.fairness_audit): per
    protected group the selection rate / TPR / FPR in exact integer
    ppm, demographic-parity and equalized-odds gaps as cross-group
    max−min over the tiny per-group relation, pass flag at a 10% gap
    budget — a classifier with group-dependent noise trips it."""
    from .functions.stats import fairness_audit

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    truth = (cents % 5 < 2).cast("long")
    flip = ((cents * (F.col("user_id") % 3 + 1)) % 13 == 0).cast("long")
    f = ev.select(
        (F.col("user_id") % 3).alias("grp"),
        truth.alias("y_true"),
        (truth != flip).cast("long").alias("y_pred"),
    )
    return fairness_audit(f, "grp", "y_true", "y_pred", gap_threshold_ppm=100_000)


# ------------------------------------------------------------------ q563
@query(
    "q563_position_bias_em",
    """
    WITH f AS (
        SELECT CAST(round(value * 100) AS BIGINT) % 40 AS item,
               event_id % 10 + 1 AS pos,
               CASE WHEN (CAST(round(value * 100) AS BIGINT) * 7 + event_id)
                         % (event_id % 10 + 3) = 0 THEN 1 ELSE 0 END AS click
        FROM events
    ),
    cells AS (
        SELECT item, pos, CAST(count(*) AS BIGINT) AS n_ip,
               CAST(sum(click) AS BIGINT) AS c_ip
        FROM f GROUP BY 1, 2
    ),
    item_stats AS (
        SELECT item, CAST(sum(n_ip) AS BIGINT) AS n_i, CAST(sum(c_ip) AS BIGINT) AS c_i
        FROM cells GROUP BY 1
    ),
    pos_stats AS (
        SELECT pos, CAST(sum(n_ip) AS BIGINT) AS n_p, CAST(sum(c_ip) AS BIGINT) AS c_p
        FROM cells GROUP BY 1
    ),
    den1 AS (
        SELECT pos, list_reduce([CAST(0.0 AS DOUBLE)] || list((n_ip * c_i) / n_i ORDER BY item),
                                (a, b) -> a + b) AS den
        FROM cells JOIN item_stats USING (item) GROUP BY pos
    ),
    theta1 AS (
        SELECT pos, n_p, c_p, c_p / den AS theta1
        FROM pos_stats JOIN den1 USING (pos)
    ),
    den2 AS (
        SELECT item, list_reduce([CAST(0.0 AS DOUBLE)] || list(n_ip * theta1 ORDER BY pos),
                                 (a, b) -> a + b) AS den
        FROM cells JOIN theta1 USING (pos) GROUP BY item
    ),
    gamma2 AS (
        SELECT item, c_i / den AS gamma2
        FROM item_stats JOIN den2 USING (item)
    ),
    den3 AS (
        SELECT pos, list_reduce([CAST(0.0 AS DOUBLE)] || list(n_ip * gamma2 ORDER BY item),
                                (a, b) -> a + b) AS den
        FROM cells JOIN gamma2 USING (item) GROUP BY pos
    )
    SELECT t.pos, t.n_p AS n_impressions, t.c_p AS n_clicks, t.theta1, t.c_p / d.den AS theta2
    FROM theta1 t JOIN den3 d USING (pos)
    """,
)
def q563(spark: SparkSession, sf: str) -> DataFrame:
    """Position-bias model estimation, two unrolled EM rounds
    (operators/retrieval.position_bias_em): synthetic click log with
    rate ∝ 1/(pos+2); every EM denominator is an item/position-ordered
    LEFT FOLD over the aggregated contingency cells, every term
    exact-integer with one divide — the examination-probability curve
    search ranking needs before training on clicks."""
    from .operators.retrieval import position_bias_em

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pos = F.col("event_id") % 10 + 1
    f = ev.select(
        (cents % 40).alias("item"),
        pos.alias("pos"),
        ((cents * 7 + F.col("event_id")) % (pos + 2) == 0).cast("long").alias("click"),
    )
    return position_bias_em(f, "item", "pos", "click")


# ------------------------------------------------------------------ q564
def _q564_oracle() -> str:
    from .operators.mining import _MARKOV_STATES, markov_conversion_expr

    pivot = ",\n               ".join(
        f"coalesce(max(CASE WHEN i = '{i}' AND j = '{j}' THEN t END), CAST(0.0 AS DOUBLE))"
        f" AS t_{i}_{j}"
        for i in ["start"] + _MARKOV_STATES
        for j in _MARKOV_STATES + ["purchase"]
    )
    full = markov_conversion_expr("purchase", None)
    picks = []
    for c in _MARKOV_STATES:
        rem = markov_conversion_expr("purchase", c)
        picks.append(
            f"SELECT '{c}' AS channel, {full} AS conv_full, {rem} AS conv_removed,\n"
            f"       ({full} - {rem}) / {full} AS removal_effect FROM m"
        )
    body = "\nUNION ALL\n".join(picks)
    return f"""
    WITH ordered AS (
        SELECT event_type AS j,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ),
    trans AS (
        SELECT coalesce(prev, 'start') AS i, j FROM ordered
        WHERE prev IS NULL OR prev != 'purchase'
    ),
    counts AS (SELECT i, j, CAST(count(*) AS BIGINT) AS n FROM trans GROUP BY 1, 2),
    tot AS (SELECT i, CAST(sum(n) AS BIGINT) AS ni FROM counts GROUP BY 1),
    cells AS (SELECT i, j, n / ni AS t FROM counts JOIN tot USING (i)),
    m AS (SELECT {pivot} FROM cells)
    {body}
    """


@query("q564_markov_attribution", _q564_oracle())
def q564(spark: SparkSession, sf: str) -> DataFrame:
    """Markov removal-effect attribution (operators/mining.
    markov_attribution): journeys reduce to 25 transition cells on ONE
    row, the 3-step absorption polynomial and its per-channel removal
    variants are generated expression text evaluated VERBATIM by both
    engines (F.expr = oracle SQL) — float-identical by construction."""
    from .operators.mining import markov_attribution

    ev = load_table(spark, sf, "events")
    return markov_attribution(ev, "user_id", "event_type", ["ts", "event_id"], "purchase")


# ------------------------------------------------------------------ q565
@query(
    "q565_als_rank1",
    """
    WITH f AS (
        SELECT user_id AS u, CAST(round(value * 100) AS BIGINT) % 40 AS j
        FROM events
    ),
    ratings AS (SELECT u, j, CAST(count(*) AS BIGINT) AS r FROM f GROUP BY 1, 2),
    u1 AS (
        SELECT u,
               list_reduce([CAST(0.0 AS DOUBLE)] || list(r * CAST(1.0 AS DOUBLE) ORDER BY j),
                           (a, b) -> a + b)
             / list_reduce([CAST(0.0 AS DOUBLE)] || list(CAST(1.0 AS DOUBLE) * CAST(1.0 AS DOUBLE) ORDER BY j),
                           (a, b) -> a + b) AS uf
        FROM ratings GROUP BY u
    ),
    v1 AS (
        SELECT j,
               list_reduce([CAST(0.0 AS DOUBLE)] || list(r * uf ORDER BY u), (a, b) -> a + b)
             / list_reduce([CAST(0.0 AS DOUBLE)] || list(uf * uf ORDER BY u), (a, b) -> a + b) AS v
        FROM ratings JOIN u1 USING (u) GROUP BY j
    ),
    u2 AS (
        SELECT u,
               list_reduce([CAST(0.0 AS DOUBLE)] || list(r * v ORDER BY j), (a, b) -> a + b)
             / list_reduce([CAST(0.0 AS DOUBLE)] || list(v * v ORDER BY j), (a, b) -> a + b) AS uf
        FROM ratings JOIN v1 USING (j) GROUP BY u
    ),
    v2 AS (
        SELECT j,
               list_reduce([CAST(0.0 AS DOUBLE)] || list(r * uf ORDER BY u), (a, b) -> a + b)
             / list_reduce([CAST(0.0 AS DOUBLE)] || list(uf * uf ORDER BY u), (a, b) -> a + b) AS v
        FROM ratings JOIN u2 USING (u) GROUP BY j
    )
    SELECT j AS item, v FROM v2
    """,
)
def q565(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-1 ALS recommender training, two full alternating rounds
    (operators/mining.als_rank1) on implicit play-count ratings:
    every factor update is a key-ordered LEFT FOLD ratio over the
    rating relation (never a hash-agg float sum) — bit-identical item
    factors cross-engine; the classic join+grouped-agg ALS shuffle."""
    from .operators.mining import als_rank1

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    f = ev.select(F.col("user_id").alias("u"), (cents % 40).alias("j"))
    ratings = f.groupBy("u", "j").agg(F.count(F.lit(1)).cast("long").alias("r"))
    return als_rank1(ratings, "u", "j", "r", n_rounds=2).withColumnRenamed("j", "item")


# ------------------------------------------------------------------ q566
def _q566_oracle() -> str:
    n_strata = 3
    cells = []
    for k in range(n_strata):
        cells.append(
            f"coalesce(max(CASE WHEN stratum = {k} THEN n_s END), CAST(0 AS BIGINT)) AS n_s{k},\n"
            f"           max(CASE WHEN stratum = {k} AND n1 > 0 AND n0 > 0\n"
            f"                    THEN s1 / n1 - s0 / n0 END) AS diff_s{k}"
        )
    pivot = ",\n           ".join(cells)
    total = " + ".join(f"n_s{k}" for k in range(n_strata))
    ate = " + ".join(f"coalesce(n_s{k} * diff_s{k}, CAST(0.0 AS DOUBLE))" for k in range(n_strata))
    return f"""
    WITH f AS (
        SELECT CAST(round(value * 100) AS BIGINT) % 8 AS bkt,
               CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END AS t,
               CAST(round(value * 100) AS BIGINT) % 100
                 + 10 * (CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                 + 5 * (CAST(round(value * 100) AS BIGINT) % 8) AS y
        FROM events
    ),
    b AS (
        SELECT bkt, CAST(count(*) AS BIGINT) AS n_b,
               CAST(sum(t) AS BIGINT) AS nt_b,
               CAST(sum(t * y) AS BIGINT) AS sy1,
               CAST(sum((1 - t) * y) AS BIGINT) AS sy0
        FROM f GROUP BY 1
    ),
    ranked AS (
        SELECT *, (nt_b * 1000000) // n_b AS ppm FROM b
    ),
    rk AS (
        SELECT *, row_number() OVER (ORDER BY ppm, bkt) AS rk,
               CAST(count(*) OVER () AS BIGINT) AS nbkt
        FROM ranked
    ),
    strata AS (SELECT *, ((rk - 1) * 3) // nbkt AS stratum FROM rk),
    s AS (
        SELECT stratum, CAST(sum(n_b) AS BIGINT) AS n_s,
               CAST(sum(nt_b) AS BIGINT) AS n1,
               CAST(sum(n_b - nt_b) AS BIGINT) AS n0,
               CAST(sum(sy1) AS BIGINT) AS s1,
               CAST(sum(sy0) AS BIGINT) AS s0
        FROM strata GROUP BY 1
    ),
    wide AS (SELECT {pivot} FROM s)
    SELECT *, ({total}) AS n_total, ({ate}) / ({total}) AS ate FROM wide
    """


@query("q566_ps_stratified_ate", _q566_oracle())
def q566(spark: SparkSession, sf: str) -> DataFrame:
    """Propensity-stratified ATE (functions/stats.ps_stratified_ate) on
    a synthetic confounded outcome with a planted +10 effect:
    empirical propensities in exact integer ppm, integer-DIV stratum
    cut under a total order, within-stratum mean differences as
    one-divide rationals, ATE as a fixed-order pivoted expression —
    no float hash-agg sum anywhere."""
    from .functions.stats import ps_stratified_ate

    ev = load_table(spark, sf, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    t = (F.col("event_id") % 3 == 0).cast("long")
    f = ev.select(
        (cents % 8).alias("bkt"),
        t.alias("t"),
        (cents % 100 + 10 * t + 5 * (cents % 8)).alias("y"),
    )
    return ps_stratified_ate(f, "bkt", "t", "y", n_strata=3)


# ------------------------------------------------------------------ q567
def _q567_oracle() -> str:
    w = (
        "CASE WHEN abs(y - ({a} * x + {b})) <= 10 THEN CAST(1.0 AS DOUBLE) "
        "ELSE 10 / abs(y - ({a} * x + {b})) END"
    )
    folds = {
        "sw": "{w}",
        "swx": "{w} * x",
        "swy": "{w} * y",
        "swxx": "{w} * x * x",
        "swxy": "{w} * x * y",
    }

    def round_ctes(r):
        wr = w.format(a=f"a{r - 1}", b=f"b{r - 1}")
        fold_cols = ",\n               ".join(
            f"list_reduce([CAST(0.0 AS DOUBLE)] || list({t.format(w=wr)} ORDER BY id),"
            f" (p, q) -> p + q) AS {name}"
            for name, t in folds.items()
        )
        prev = "seed" if r == 1 else f"r{r - 1}b"
        carry = ", ".join(["n"] + [f"a{i}, b{i}" for i in range(r)])
        return f"""
    r{r} AS (
        SELECT {carry},
               {fold_cols}
        FROM pts CROSS JOIN {prev}
        GROUP BY {carry}
    ),
    r{r}s AS (
        SELECT *, (sw * swxy - swx * swy) / (sw * swxx - swx * swx) AS a{r} FROM r{r}
    ),
    r{r}b AS (
        SELECT * EXCLUDE (sw, swx, swy, swxx, swxy),
               (swy - a{r} * swx) / sw AS b{r}
        FROM r{r}s
    )"""

    return f"""
    WITH pts AS (
        SELECT event_id AS id, CAST(round(value) AS BIGINT) AS x,
               3 * CAST(round(value) AS BIGINT) + event_id % 11 - 5
                 + CASE WHEN event_id % 40 = 0 THEN 700 ELSE 0 END AS y
        FROM events WHERE event_id % 97 = 0
    ),
    seed0 AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
        FROM pts
    ),
    seed AS (
        SELECT n,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS a0,
               (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS b0
        FROM seed0
    ),{round_ctes(1)},{round_ctes(2)}
    SELECT n, a0, b0, a1, b1, a2, b2 FROM r2b
    """


@query("q567_huber_fit", _q567_oracle())
def q567(spark: SparkSession, sf: str) -> DataFrame:
    """Huber robust line fit, 2 IRLS rounds (functions/stats.huber_fit)
    on a planted slope-3 line with 2.5% gross outliers: exact-integer
    OLS seed, id-ordered fold weighted moments per round (staged
    columns — never re-evaluated per reference), closed-form WLS —
    the per-round slopes walk from the outlier-dragged seed toward 3."""
    from .functions.stats import huber_fit

    ev = load_table(spark, sf, "events").where(F.col("event_id") % 97 == 0)
    dollars = F.round(F.col("value")).cast("long")
    pts = ev.select(
        F.col("event_id").alias("id"),
        dollars.alias("x"),
        (
            3 * dollars + F.col("event_id") % 11 - 5
            + F.when(F.col("event_id") % 40 == 0, 700).otherwise(0)
        ).alias("y"),
    )
    return huber_fit(pts, "id", "x", "y", k=10, n_rounds=2)


# ------------------------------------------------------------------ q568
@query(
    "q568_aa_calibration",
    """
    WITH users AS (
        SELECT user_id,
               CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY 1
    ),
    splits AS (
        SELECT k, user_id, y,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 15))::BIGINT % 2
                 AS treat
        FROM users, unnest(generate_series(1, 20)) AS t(k)
    ),
    agg AS (
        SELECT k,
               CAST(sum(treat) AS BIGINT) AS n1,
               CAST(sum(1 - treat) AS BIGINT) AS n0,
               CAST(sum(treat * y) AS BIGINT) AS s1,
               CAST(sum((1 - treat) * y) AS BIGINT) AS s0
        FROM splits GROUP BY 1
    ),
    flags AS (
        SELECT CAST(k AS BIGINT) AS split_id, n1, n0, s1, s0,
               10000 * (s1 * n0 - s0 * n1) * (s1 * n0 - s0 * n1) * (n1 + n0)
                 > 38416 * (s1 + s0) * (n1 + n0 - s1 - s0) * (n1 * n0) AS significant
        FROM agg
    )
    SELECT split_id, n1, n0, s1, s0, significant,
           CAST(sum(CASE WHEN significant THEN 1 ELSE 0 END) OVER () AS BIGINT)
             AS n_false_positives
    FROM flags
    """,
)
def q568(spark: SparkSession, sf: str) -> DataFrame:
    """A/A-test calibration sweep: 20 portable-md5 hash splits of the
    user base, each tested with the two-proportion z at α=0.05 via the
    FULLY INTEGER cross-multiplied form 10⁴·(s₁n₀−s₀n₁)²·N >
    38416·S(N−S)·n₁n₀ (c² = 1.96² as the exact rational 38416/10⁴ —
    zero float ops, zero boundary risk).  The false-positive count
    audits the experimentation stack's calibration: ~1 of 20 expected."""
    ev = load_table(spark, sf, "events")
    users = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y")
    )
    splits = users.select(
        "user_id", "y", F.explode(F.sequence(F.lit(1), F.lit(20))).alias("k")
    ).select(
        "k", "y",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("user_id").cast("string"), F.lit(":"),
                                   F.col("k").cast("string"))),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            % 2
        ).alias("treat"),
    )
    agg = splits.groupBy("k").agg(
        F.sum("treat").cast("long").alias("n1"),
        F.sum(1 - F.col("treat")).cast("long").alias("n0"),
        F.sum(F.col("treat") * F.col("y")).cast("long").alias("s1"),
        F.sum((1 - F.col("treat")) * F.col("y")).cast("long").alias("s0"),
    )
    d = F.col("s1") * F.col("n0") - F.col("s0") * F.col("n1")
    n = F.col("n1") + F.col("n0")
    s = F.col("s1") + F.col("s0")
    flags = agg.select(
        F.col("k").cast("long").alias("split_id"), "n1", "n0", "s1", "s0",
        (10000 * d * d * n > 38416 * s * (n - s) * (F.col("n1") * F.col("n0")))
        .alias("significant"),
    )
    wall = Window.partitionBy()
    return flags.withColumn(
        "n_false_positives",
        F.sum(F.when(F.col("significant"), 1).otherwise(0)).over(wall).cast("long"),
    )


# ------------------------------------------------------------------ q569
@query(
    "q569_scc",
    """
    WITH RECURSIVE base AS (
        SELECT doc_id % 60 AS src, (doc_id * 13 + 7) % 60 AS dst FROM documents
        WHERE doc_id % 60 != (doc_id * 13 + 7) % 60
    ),
    edges AS (SELECT DISTINCT src, dst FROM base),
    closure AS (
        SELECT src, dst FROM edges
        UNION
        SELECT c.src, e.dst FROM closure c JOIN edges e ON c.dst = e.src
    ),
    mutual AS (
        SELECT a.src AS node, a.dst AS peer
        FROM closure a JOIN closure b ON a.src = b.dst AND a.dst = b.src
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    pairs AS (
        SELECT node, peer FROM mutual
        UNION ALL
        SELECT node, node AS peer FROM nodes
    )
    SELECT node, min(peer) AS component FROM pairs GROUP BY 1
    """,
)
def q569(spark: SparkSession, sf: str) -> DataFrame:
    """Strongly connected components (operators/merge.scc_components)
    of the synthetic 60-node digraph: path-doubling transitive closure
    (6 rounds cover length-64 paths) ∩ its reverse = mutual
    reachability, component = min mutual id — exact set algebra; the
    oracle replays with a recursive CTE."""
    from .operators.merge import scc_components

    d = load_table(spark, sf, "documents")
    edges = d.select(
        (F.col("doc_id") % 60).alias("src"),
        ((F.col("doc_id") * 13 + 7) % 60).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()
    return scc_components(edges, "src", "dst", max_doubling=6)


# ------------------------------------------------------------------ q570
_Q570_T = "(CAST(1.0 AS DOUBLE) - (((s_jac * s_jac) * s_jac) * s_jac))"
_Q570_P = (
    f"CAST(1.0 AS DOUBLE) - ((({_Q570_T} * {_Q570_T}) * ({_Q570_T} * {_Q570_T}))"
    f" * (({_Q570_T} * {_Q570_T}) * ({_Q570_T} * {_Q570_T})))"
)


def _q570_oracle() -> str:
    from .operators import dedup as _dd

    num_perm, bands, rpb, p = 32, 8, 4, _dd._MERSENNE
    params = _dd._hash_params(num_perm)
    mh_cols = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS mh{i}" for i, (a, b) in enumerate(params)
    )
    band_terms = " + ".join(
        "(CASE WHEN "
        + " AND ".join(f"sa.mh{b * rpb + r} = sb.mh{b * rpb + r}" for r in range(rpb))
        + " THEN 1 ELSE 0 END)"
        for b in range(bands)
    )
    return rf"""
    WITH docs AS (
        SELECT doc_id AS id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents WHERE doc_id < 100 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id + 100000 AS id,
               regexp_replace(lower(trim(text || ' calibration tail')), '\s+', ' ', 'g') AS t
        FROM documents WHERE doc_id < 50 AND text IS NOT NULL
    ),
    sh AS (
        SELECT id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(t, ' ')) - 2, 1) + 1),
                   i -> array_to_string((string_split(t, ' '))[i:i+2], ' ')))) AS s
        FROM docs
    ),
    hs AS (SELECT id, ('0x' || substr(md5(s), 1, 15))::BIGINT % {p} AS h FROM sh),
    sig AS (SELECT id, {mh_cols} FROM hs GROUP BY id),
    sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS ia, b.id AS ib, CAST(count(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
        GROUP BY 1, 2
    ),
    j AS (
        SELECT ia, ib, n_shared,
               n_shared / (za.sz + zb.sz - n_shared) AS s_jac
        FROM inter JOIN sizes za ON za.id = ia JOIN sizes zb ON zb.id = ib
    ),
    withsig AS (
        SELECT j.*, CAST({band_terms} AS BIGINT) AS bands_equal
        FROM j JOIN sig sa ON sa.id = j.ia JOIN sig sb ON sb.id = j.ib
    )
    SELECT ia AS doc_a, ib AS doc_b, n_shared, s_jac,
           {_Q570_P} AS p_candidate,
           bands_equal, bands_equal >= 1 AS is_candidate
    FROM withsig
    """


@query("q570_lsh_calibration", _q570_oracle())
def q570(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding calibration audit: for every shingle-sharing doc
    pair, the exact Jaccard (one rational divide), the THEORETICAL
    candidate probability 1−(1−s⁴)⁸ as a mirrored fixed-association
    double chain, and the ACTUAL number of agreeing (32-perm, 8×4)
    portable-md5 minhash bands — the self-audit that the engine's own
    dedup banding matches the S-curve it promises
    (operators/dedup.minhash_signature_df)."""
    from .operators.dedup import minhash_signature_df, shingles

    base = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    d = base.where(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        base.where(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" calibration tail")).alias("text"),
        )
    )
    sig = minhash_signature_df(d, "text", "doc_id", num_perm=32, shingle_n=3, hash_kind="md5")
    ex = d.select(F.col("doc_id").alias("id"), F.explode(shingles(F.col("text"), 3)).alias("s"))
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    za = sizes.select(F.col("id").alias("ia"), F.col("sz").alias("sza"))
    zb = sizes.select(F.col("id").alias("ib"), F.col("sz").alias("szb"))
    j = inter.join(za, "ia").join(zb, "ib").select(
        "ia", "ib", "n_shared",
        (F.col("n_shared") / (F.col("sza") + F.col("szb") - F.col("n_shared"))).alias("s_jac"),
    )
    sa = sig.select(F.col("doc_id").alias("ia"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(32)])
    sb = sig.select(F.col("doc_id").alias("ib"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(32)])
    band_terms = " + ".join(
        "(CASE WHEN "
        + " AND ".join(f"a{bb * 4 + r} = b{bb * 4 + r}" for r in range(4))
        + " THEN 1 ELSE 0 END)"
        for bb in range(8)
    )
    withsig = j.join(sa, "ia").join(sb, "ib").select(
        "ia", "ib", "n_shared", "s_jac",
        F.expr(f"CAST({band_terms} AS BIGINT)").alias("bands_equal"),
    )
    return withsig.select(
        F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b"),
        "n_shared", "s_jac",
        F.expr(_Q570_P).alias("p_candidate"),
        "bands_equal",
        (F.col("bands_equal") >= 1).alias("is_candidate"),
    )


# ---------------------------------------------------------------- q571-q574
# TPC-H Q2/Q11/Q12/Q20 shapes. The synthetic schema has no partsupp and
# no l_shipmode/commitdate/receiptdate; both engines derive them
# DETERMINISTICALLY from existing keys (identical arithmetic), so the
# remaining four TPC-H query SHAPES are exercised end to end.
_PS_SQL = """
    nsupp AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM supplier),
    ps AS (
        SELECT p_partkey,
               (p_partkey * 7 + i * 13) % ns AS ps_suppkey,
               (p_partkey * 31 + i * 7) % 100000 + 1 AS ps_supplycost,
               (p_partkey * 17 + i * 11) % 10000 + 1 AS ps_availqty
        FROM part CROSS JOIN nsupp, unnest(generate_series(0, 3)) AS t(i)
    )"""


def _synth_partsupp(spark: SparkSession, sf: str) -> DataFrame:
    """part × 4 pseudo-suppliers with hash-derived cost/availability —
    the deterministic stand-in for TPC-H partsupp (see _PS_SQL)."""
    part = load_table(spark, sf, "part")
    ns = load_table(spark, sf, "supplier").agg(
        F.count(F.lit(1)).cast("long").alias("ns")
    )
    return (
        part.crossJoin(F.broadcast(ns))
        .select("p_partkey", "ns", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i"))
        .select(
            "p_partkey",
            ((F.col("p_partkey") * 7 + F.col("i") * 13) % F.col("ns")).alias("ps_suppkey"),
            ((F.col("p_partkey") * 31 + F.col("i") * 7) % 100000 + 1).alias("ps_supplycost"),
            ((F.col("p_partkey") * 17 + F.col("i") * 11) % 10000 + 1).alias("ps_availqty"),
        )
    )


@query(
    "q571_tpch_q2",
    f"""
    WITH {_PS_SQL},
    eu AS (
        SELECT s_suppkey, s_name, CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
               n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p.p_partkey, p.p_type, e.s_name, e.n_name, e.acctbal_cents,
               CAST(ps.ps_supplycost AS BIGINT) AS cost_cents
        FROM ps JOIN eu e ON ps.ps_suppkey = e.s_suppkey
        JOIN part p ON ps.p_partkey = p.p_partkey
        WHERE p.p_size = 15
    ),
    mins AS (SELECT p_partkey, CAST(min(cost_cents) AS BIGINT) AS mc FROM cand GROUP BY 1)
    SELECT c.acctbal_cents, c.s_name, c.n_name, c.p_partkey, c.p_type, c.cost_cents
    FROM cand c JOIN mins m ON c.p_partkey = m.p_partkey AND c.cost_cents = m.mc
    """,
)
def q571(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): correlated-min rewritten as
    a per-part min-aggregate join (the scale-correct form), European
    suppliers broadcast, exact cent costs — over the deterministic
    synthetic partsupp (_synth_partsupp)."""
    ps = _synth_partsupp(spark, sf)
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region")
    part = load_table(spark, sf, "part").where(F.col("p_size") == 15)
    eu = (
        supp.join(nat, supp["s_nationkey"] == nat["n_nationkey"])
        .join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .where(F.col("r_name") == "EUROPE")
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_cents"),
            "n_name",
        )
    )
    cand = (
        ps.join(F.broadcast(eu), ps["ps_suppkey"] == eu["s_suppkey"])
        .join(part, "p_partkey")
        .select(
            "p_partkey", "p_type", "s_name", "n_name", "acctbal_cents",
            F.col("ps_supplycost").cast("long").alias("cost_cents"),
        )
    )
    mins = cand.groupBy("p_partkey").agg(F.min("cost_cents").cast("long").alias("mc"))
    mins = mins.select(F.col("p_partkey").alias("mp"), "mc")
    return cand.join(
        mins, (F.col("p_partkey") == F.col("mp")) & (F.col("cost_cents") == F.col("mc"))
    ).select("acctbal_cents", "s_name", "n_name", "p_partkey", "p_type", "cost_cents")


@query(
    "q572_tpch_q11",
    f"""
    WITH {_PS_SQL},
    asia AS (
        SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'
    ),
    vals AS (
        SELECT ps.p_partkey, CAST(sum(ps_supplycost * ps_availqty) AS BIGINT) AS pv
        FROM ps JOIN asia ON ps.ps_suppkey = asia.s_suppkey GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(pv) AS BIGINT) AS tv, CAST(count(*) AS BIGINT) AS np FROM vals)
    SELECT p_partkey, pv FROM vals CROSS JOIN tot WHERE pv * np > 2 * tv
    """,
)
def q572(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part Σ cost·qty over one
    region's suppliers, HAVING above 2× the mean share — the fraction
    threshold cross-multiplied (pv·n_parts > 2·total) so it stays
    discriminative at EVERY scale factor (the classic 0.0001 constant
    goes vacuous as parts grow)."""
    ps = _synth_partsupp(spark, sf)
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region")
    asia = (
        supp.join(nat, supp["s_nationkey"] == nat["n_nationkey"])
        .join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .where(F.col("r_name") == "ASIA")
        .select("s_suppkey")
    )
    vals = (
        ps.join(F.broadcast(asia), ps["ps_suppkey"] == asia["s_suppkey"])
        .groupBy("p_partkey")
        .agg(F.sum(F.col("ps_supplycost") * F.col("ps_availqty")).cast("long").alias("pv"))
    )
    tot = vals.agg(
        F.sum("pv").cast("long").alias("tv"), F.count(F.lit(1)).cast("long").alias("np")
    )
    return (
        vals.crossJoin(F.broadcast(tot))
        .where(F.col("pv") * F.col("np") > 2 * F.col("tv"))
        .select("p_partkey", "pv")
    )


@query(
    "q573_tpch_q12",
    """
    WITH li AS (
        SELECT l_orderkey,
               CAST(floor(epoch(l_shipdate) / 86400.0) AS BIGINT) AS d0,
               (l_orderkey * 3 + l_linenumber * 5) % 7 AS mi,
               (l_orderkey * 11 + l_linenumber * 3) % 30 + 1 AS rlag,
               (l_orderkey * 5 + l_linenumber * 7) % 35 AS clag
        FROM lineitem
    ),
    f AS (
        SELECT l_orderkey,
               CASE mi WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' WHEN 2 THEN 'AIR'
                       WHEN 3 THEN 'TRUCK' WHEN 4 THEN 'RAIL' WHEN 5 THEN 'REG AIR'
                       ELSE 'FOB' END AS shipmode,
               d0, d0 + clag AS cday, d0 + rlag AS rday
        FROM li
    )
    SELECT shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
                AS BIGINT) AS low_line_count
    FROM f JOIN orders ON l_orderkey = o_orderkey
    WHERE shipmode IN ('MAIL', 'SHIP') AND cday < rday AND d0 < cday
      AND rday >= 9496 AND rday < 9861
    GROUP BY shipmode
    """,
)
def q573(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode priority split): ship mode and
    commit/receipt lags derived deterministically from line keys,
    ALL date logic in exact epoch-day integers (receipt in 1996,
    commit < receipt, shipped before commit), one broadcast-dim join +
    one conditional agg."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    d0 = F.floor(F.unix_seconds(F.col("l_shipdate").cast("timestamp")) / 86400).cast("long")
    mi = (ok * 3 + ln * 5) % 7
    f = li.select(
        ok.alias("l_orderkey"),
        F.element_at(
            F.array(*[F.lit(m) for m in ["MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "REG AIR", "FOB"]]),
            (mi + 1).cast("int"),
        ).alias("shipmode"),
        d0.alias("d0"),
        (d0 + (ok * 5 + ln * 7) % 35).alias("cday"),
        (d0 + (ok * 11 + ln * 3) % 30 + 1).alias("rday"),
    ).where(
        F.col("shipmode").isin("MAIL", "SHIP")
        & (F.col("cday") < F.col("rday"))
        & (F.col("d0") < F.col("cday"))
        & (F.col("rday") >= 9496) & (F.col("rday") < 9861)
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        f.join(o, f["l_orderkey"] == o["o_orderkey"])
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "q574_tpch_q20",
    f"""
    WITH {_PS_SQL},
    q AS (
        SELECT l_partkey, l_suppkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem
        WHERE CAST(floor(epoch(l_shipdate) / 86400.0) AS BIGINT) >= 9131
          AND CAST(floor(epoch(l_shipdate) / 86400.0) AS BIGINT) < 9496
        GROUP BY 1, 2
    ),
    pr AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
    hits AS (
        SELECT DISTINCT ps.ps_suppkey
        FROM ps JOIN pr ON ps.p_partkey = pr.p_partkey
        JOIN q ON q.l_partkey = ps.p_partkey AND q.l_suppkey = ps.ps_suppkey
        WHERE 2 * (ps.ps_availqty % 50) > q.sq
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN hits ON s.s_suppkey = hits.ps_suppkey
    """,
)
def q574(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (excess-stock suppliers): the nested
    EXISTS/IN chain rewritten as semi-join relations — promo parts ⋈
    synthetic partsupp ⋈ 1995 shipped quantity, the half-of-shipped
    threshold cross-multiplied (2·avail > Σqty), distinct suppliers
    joined back to names."""
    ps = _synth_partsupp(spark, sf)
    li = load_table(spark, sf, "lineitem")
    d = F.floor(F.unix_seconds(F.col("l_shipdate").cast("timestamp")) / 86400).cast("long")
    q = (
        li.where((d >= 9131) & (d < 9496))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias("sq"))
    )
    pr = load_table(spark, sf, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    hits = (
        ps.join(pr, "p_partkey")
        .join(
            q,
            (q["l_partkey"] == ps["p_partkey"]) & (q["l_suppkey"] == ps["ps_suppkey"]),
        )
        .where(2 * (F.col("ps_availqty") % 50) > F.col("sq"))
        .select(F.col("ps_suppkey").alias("s_suppkey"))
        .distinct()
    )
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    return (
        s.join(hits, "s_suppkey")
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name", "n_name")
    )


# ------------------------------------------------------------------ q575
@query(
    "q575_window_funnel",
    """
    WITH ev AS (SELECT user_id AS k, event_type AS t, epoch_us(ts) AS us FROM events),
    a AS (SELECT k, us AS t1 FROM ev WHERE t = 'signup'),
    s2 AS (SELECT k, us AS s FROM ev WHERE t = 'click'),
    l2 AS (
        SELECT a.k, a.t1,
               min(CASE WHEN s2.s > a.t1 AND s2.s <= a.t1 + 86400000000 THEN s2.s END) AS t2
        FROM a LEFT JOIN s2 ON a.k = s2.k GROUP BY a.k, a.t1
    ),
    s3 AS (SELECT k, us AS s FROM ev WHERE t = 'purchase'),
    l3 AS (
        SELECT l2.k, l2.t1, l2.t2,
               min(CASE WHEN s3.s > l2.t2 AND s3.s <= l2.t1 + 86400000000 THEN s3.s END) AS t3
        FROM l2 LEFT JOIN s3 ON l2.k = s3.k GROUP BY l2.k, l2.t1, l2.t2
    ),
    d AS (SELECT k, CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth
          FROM l3)
    SELECT k AS user_id, CAST(count(*) AS BIGINT) AS n_anchors,
           CAST(max(depth) AS BIGINT) AS max_depth
    FROM d GROUP BY 1
    """,
)
def q575(spark: SparkSession, sf: str) -> DataFrame:
    """windowFunnel (operators/window.window_funnel): deepest
    strictly-ordered signup→click→purchase prefix within 24 h of each
    signup anchor — µs-integer time logic, one per-key equi-join +
    conditional min per level, anchors with out-of-window steps
    survive with NULL mins (no pre-group filter)."""
    from .operators.window import window_funnel

    ev = load_table(spark, sf, "events")
    return window_funnel(
        ev, "user_id", "event_type", "ts", ["signup", "click", "purchase"], 86400
    )


# ------------------------------------------------------------------ q576
@query(
    "q576_conformance",
    """
    WITH f AS (
        SELECT user_id, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               epoch_us(ts) AS us, event_id,
               CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
                    WHEN 'purchase' THEN 'p' WHEN 'view' THEN 'v' ELSE 'e' END AS ini
        FROM events
    ),
    paths AS (
        SELECT user_id, day, string_agg(ini, '' ORDER BY us, event_id) AS path
        FROM f GROUP BY 1, 2
    )
    SELECT user_id, day, path,
           CAST(levenshtein(path, 'scp') AS BIGINT) AS edit_dist,
           levenshtein(path, 'scp') <= 2 AS conformant
    FROM paths
    """,
)
def q576(spark: SparkSession, sf: str) -> DataFrame:
    """Process-mining conformance check: each (user, day) journey
    renders to an initial-string under the (µs, event_id) total order
    (sorted-struct fold — collect_list alone is order-nondeterministic)
    and scores its Levenshtein edit distance to the reference
    signup→click→purchase path — the deviation report."""
    ev = load_table(spark, sf, "events")
    ini = (
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "view", "v")
        .otherwise("e")
    )
    f = ev.select(
        "user_id",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        ini.alias("ini"),
    )
    paths = f.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("us", "event_id", "ini"))),
                lambda s: s.getField("ini"),
            ),
            "",
        ).alias("path")
    )
    dist = F.levenshtein(F.col("path"), F.lit("scp"))
    return paths.select(
        "user_id", "day", "path",
        dist.cast("long").alias("edit_dist"),
        (dist <= 2).alias("conformant"),
    )


# ------------------------------------------------------------------ q577
@query(
    "q577_sparse_cosine",
    r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents WHERE doc_id < 200 AND text IS NOT NULL
    ),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    capped AS (SELECT tf.* FROM tf JOIN dfreq USING (tok) WHERE dfreq.df <= 50),
    norms AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2 FROM capped GROUP BY 1),
    dots AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(sum(a.c * b.c) AS BIGINT) AS dot
        FROM capped a JOIN capped b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    cos AS (
        SELECT ia, ib, dot,
               dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
        FROM dots JOIN norms na ON na.doc_id = ia JOIN norms nb ON nb.doc_id = ib
    )
    SELECT ia AS doc_a, ib AS doc_b, dot, cosine FROM cos WHERE cosine >= 0.5
    """,
)
def q577(spark: SparkSession, sf: str) -> DataFrame:
    """Exact sparse-vector cosine similarity via the inverted-index
    join (the IR-classic scale path for sparse vectors — dot products
    only touch SHARED tokens): integer tf products, a document-
    frequency cap kills the stopword O(n²) bucket, norms √ of exact
    BIGINTs, one divide per pair."""
    d = (
        load_table(spark, sf, "documents")
        .where((F.col("doc_id") < 200) & F.col("text").isNotNull())
    )
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    capped = tf.join(dfreq, "tok").where(F.col("df") <= 50).select("doc_id", "tok", "c")
    norms = capped.groupBy("doc_id").agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("n2"))
    a = capped.select(F.col("doc_id").alias("ia"), "tok", F.col("c").alias("ca"))
    b = capped.select(F.col("doc_id").alias("ib"), "tok", F.col("c").alias("cb"))
    dots = (
        a.join(b, "tok")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("ia"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("ib"), F.col("n2").alias("nb2"))
    cos = (
        dots.join(na, "ia")
        .join(nb, "ib")
        .select(
            "ia", "ib", "dot",
            (
                F.col("dot")
                / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double")))
            ).alias("cosine"),
        )
    )
    return cos.where(F.col("cosine") >= 0.5).select(
        F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b"), "dot", "cosine"
    )


# ------------------------------------------------------------------ q578
def _q578_oracle() -> str:
    from .queries import ORACLES

    roll = ORACLES["q546_roll_spread"]
    vpin = ORACLES["q560_vpin"]
    return f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    r AS ({roll}),
    v AS ({vpin}),
    vm AS (SELECT user_id, max(vpin_ppm) AS vmax FROM v GROUP BY 1),
    g AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT)
                 - lag(CAST(floor(epoch(ts)) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events
    ),
    gc AS (SELECT user_id, gap, CAST(count(*) AS BIGINT) AS cnt
           FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
    ba AS (
        SELECT user_id,
               CAST(sum(cnt) AS BIGINT) AS n_gaps,
               CAST(sum(gap * cnt) AS BIGINT) AS span_s,
               sum(CAST(gap AS HUGEINT) * gap * cnt) AS g2
        FROM gc GROUP BY 1
    ),
    b AS (
        SELECT user_id,
               n_gaps >= 10 AND CAST(100 AS HUGEINT) * n_gaps * g2
                                < CAST(101 AS HUGEINT) * span_s * span_s AS is_beacon
        FROM ba
    ),
    sig AS (
        SELECT u.user_id,
               coalesce(r.spread_scaled > 10000, false) AS sig_bounce,
               coalesce(vm.vmax >= 200000, false) AS sig_toxic,
               coalesce(b.is_beacon, false) AS sig_beacon
        FROM users u
        LEFT JOIN r ON r.user_id = u.user_id
        LEFT JOIN vm ON vm.user_id = u.user_id
        LEFT JOIN b ON b.user_id = u.user_id
    )
    SELECT user_id, sig_bounce, sig_toxic, sig_beacon,
           CAST((CASE WHEN sig_bounce THEN 1 ELSE 0 END)
              + (CASE WHEN sig_toxic THEN 1 ELSE 0 END)
              + (CASE WHEN sig_beacon THEN 1 ELSE 0 END) AS BIGINT) AS n_signals,
           (CASE WHEN sig_bounce THEN 1 ELSE 0 END)
              + (CASE WHEN sig_toxic THEN 1 ELSE 0 END)
              + (CASE WHEN sig_beacon THEN 1 ELSE 0 END) >= 2 AS flagged
    FROM sig
    """


@query("q578_surveillance_scorecard", _q578_oracle())
def q578(spark: SparkSession, sf: str) -> DataFrame:
    """Market-surveillance capstone: per user the Roll bid-ask-bounce
    signal (q546), max VPIN flow toxicity (q560) and timer-beacon
    cadence (q509's CV test) compose into a risk scorecard — flagged
    at ≥2 signals.  The oracle replays ALL THREE pipelines by reusing
    their registered SQL verbatim (composition, one codepath per
    signal)."""
    from .operators.finance import roll_spread, vpin
    from .operators.mining import beacon_detect

    ev = load_table(spark, sf, "events")
    users = ev.select("user_id").distinct()
    r = roll_spread(
        ev.select("user_id", "ts", "event_id", "value"), ["user_id"], "value",
        ["ts", "event_id"], scale=100,
    ).select("user_id", "spread_scaled")
    vm = (
        vpin(ev.select("user_id", "ts", "event_id", "value"), ["user_id"],
             ["ts", "event_id"], "value", bucket_size=50, window_buckets=4, scale=100)
        .groupBy("user_id")
        .agg(F.max("vpin_ppm").alias("vmax"))
    )
    b = beacon_detect(
        ev.select("user_id", "ts", "event_id"), ["user_id"], "ts", "event_id",
        cv_num=1, cv_den=10, min_gaps=10,
    ).select("user_id", "is_beacon")
    sig = (
        users.join(r, "user_id", "left")
        .join(vm, "user_id", "left")
        .join(b, "user_id", "left")
        .select(
            "user_id",
            F.coalesce(F.col("spread_scaled") > 10000, F.lit(False)).alias("sig_bounce"),
            F.coalesce(F.col("vmax") >= 200000, F.lit(False)).alias("sig_toxic"),
            F.coalesce(F.col("is_beacon"), F.lit(False)).alias("sig_beacon"),
        )
    )
    n_sig = (
        F.when(F.col("sig_bounce"), 1).otherwise(0)
        + F.when(F.col("sig_toxic"), 1).otherwise(0)
        + F.when(F.col("sig_beacon"), 1).otherwise(0)
    )
    return sig.select(
        "user_id", "sig_bounce", "sig_toxic", "sig_beacon",
        n_sig.cast("long").alias("n_signals"),
        (n_sig >= 2).alias("flagged"),
    )


# ------------------------------------------------------------------ q579
@query(
    "q579_xyz_class",
    """
    WITH daily AS (
        SELECT p.p_brand, CAST(floor(epoch(l.l_shipdate) / 86400.0) AS BIGINT) AS day,
               CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2
    ),
    s AS (
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(q) AS BIGINT) AS s,
               CAST(sum(q * q) AS BIGINT) AS qq
        FROM daily GROUP BY 1
    )
    SELECT p_brand, n, s, qq,
           CASE WHEN 16 * (n * qq - s * s) <= s * s THEN 'X'
                WHEN 4 * (n * qq - s * s) <= s * s THEN 'Y'
                ELSE 'Z' END AS xyz_class
    FROM s
    """,
)
def q579(spark: SparkSession, sf: str) -> DataFrame:
    """XYZ demand-variability classification per brand (the partner of
    ABC value classification): CV thresholds 0.25/0.5 applied as the
    FULLY INTEGER cross-multiplications 16·(nQ−S²) ≤ S² and
    4·(nQ−S²) ≤ S² — no float CV can sit on a class boundary."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    day = F.floor(
        F.unix_seconds(F.col("l_shipdate").cast("timestamp")) / 86400
    ).cast("long")
    daily = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", day.alias("day"))
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias("q"))
    )
    s = daily.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("q").cast("long").alias("s"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("qq"),
    )
    m2 = F.col("n") * F.col("qq") - F.col("s") * F.col("s")
    s2 = F.col("s") * F.col("s")
    return s.select(
        "p_brand", "n", "s", "qq",
        F.when(16 * m2 <= s2, "X").when(4 * m2 <= s2, "Y").otherwise("Z").alias("xyz_class"),
    )


# ------------------------------------------------------------------ q580
@query(
    "q580_triplet_eval",
    """
    WITH ex AS (
        SELECT vec_id, label, d AS dim,
               CAST(round(CAST(embedding[d] AS DOUBLE) * 1000) AS BIGINT) AS xi
        FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(d)
        WHERE vec_id < 400
    ),
    pos_pick AS (
        SELECT vec_id, label,
               lead(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS pos_id
        FROM (SELECT DISTINCT vec_id, label FROM ex)
    ),
    neg_anchor AS (
        SELECT label, CAST(min(vec_id) AS BIGINT) AS neg_id
        FROM (SELECT DISTINCT vec_id, label FROM ex) GROUP BY 1
    ),
    trip AS (
        SELECT p.vec_id AS a, p.pos_id AS pos, na.neg_id AS neg, p.label
        FROM pos_pick p
        JOIN neg_anchor na ON na.label = (p.label + 1) % 10
        WHERE p.pos_id IS NOT NULL
    ),
    dp AS (
        SELECT t.a, t.label, CAST(sum((xa.xi - xp.xi) * (xa.xi - xp.xi)) AS BIGINT) AS d_pos
        FROM trip t JOIN ex xa ON xa.vec_id = t.a JOIN ex xp
          ON xp.vec_id = t.pos AND xp.dim = xa.dim
        GROUP BY 1, 2
    ),
    dn AS (
        SELECT t.a, CAST(sum((xa.xi - xn.xi) * (xa.xi - xn.xi)) AS BIGINT) AS d_neg
        FROM trip t JOIN ex xa ON xa.vec_id = t.a JOIN ex xn
          ON xn.vec_id = t.neg AND xn.dim = xa.dim
        GROUP BY 1
    )
    SELECT dp.label, CAST(count(*) AS BIGINT) AS n_triplets,
           CAST(sum(CASE WHEN d_pos >= d_neg THEN 1 ELSE 0 END) AS BIGINT) AS violations,
           (CAST(sum(CASE WHEN d_pos >= d_neg THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*) AS violation_ppm
    FROM dp JOIN dn ON dp.a = dn.a
    GROUP BY 1
    """,
)
def q580(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding triplet evaluation: deterministic (anchor, next same-
    label vector, min-id vector of the next label) triplets, exact
    integer squared distances, per-label margin-violation rate in
    integer ppm — the metric-learning quality check (random synthetic
    embeddings violate ~half the time; a trained space wouldn't)."""
    emb = load_table(spark, sf, "embeddings").where(F.col("vec_id") < 400)
    x = F.transform(F.col("embedding"), lambda v: F.round(v.cast("double") * 1000).cast("long"))
    base = emb.select("vec_id", "label", x.alias("x"))
    w = Window.partitionBy("label").orderBy("vec_id")
    pos_pick = base.select(
        "vec_id", "label", "x", F.lead("vec_id").over(w).alias("pos_id")
    ).where(F.col("pos_id").isNotNull())
    neg_anchor = base.groupBy("label").agg(F.min("vec_id").cast("long").alias("neg_id"))
    trip = pos_pick.join(
        neg_anchor.select(F.col("label").alias("nl"), "neg_id"),
        F.col("nl") == (F.col("label") + 1) % 10,
    )
    pv = base.select(F.col("vec_id").alias("pos_id"), F.col("x").alias("xp"))
    nv = base.select(F.col("vec_id").alias("neg_id"), F.col("x").alias("xn"))
    j = trip.join(pv, "pos_id").join(nv, "neg_id")
    dist = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda u, v: (u - v) * (u - v)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = j.select(
        "label",
        dist(F.col("x"), F.col("xp")).alias("d_pos"),
        dist(F.col("x"), F.col("xn")).alias("d_neg"),
    )
    return scored.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_triplets"),
        F.sum(F.when(F.col("d_pos") >= F.col("d_neg"), 1).otherwise(0))
        .cast("long")
        .alias("violations"),
    ).select(
        "label", "n_triplets", "violations",
        F.expr("(violations * 1000000) DIV n_triplets").alias("violation_ppm"),
    )


# ------------------------------------------------------------------ q581
@query(
    "q581_clv_geometric",
    """
    WITH f AS (
        SELECT user_id % 5 AS seg, user_id,
               CAST(floor(epoch(ts) / 604800.0) AS BIGINT) AS week,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    uw AS (SELECT seg, user_id, week, CAST(sum(cents) AS BIGINT) AS spend
           FROM f GROUP BY 1, 2, 3),
    ret AS (
        SELECT a.seg,
               CAST(count(*) AS BIGINT) AS d,
               CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n
        FROM uw a LEFT JOIN uw b
          ON a.user_id = b.user_id AND a.seg = b.seg AND b.week = a.week + 1
        GROUP BY 1
    ),
    margin AS (
        SELECT seg, CAST(sum(spend) AS BIGINT) AS sp, CAST(count(*) AS BIGINT) AS nw
        FROM uw GROUP BY 1
    ),
    base AS (
        SELECT r.seg, r.n, r.d, n / d AS rr, sp / nw AS m
        FROM ret r JOIN margin USING (seg)
    )
    SELECT seg, n, d, rr, m,
           m * ((rr * CAST('0.95' AS DOUBLE))
              + ((rr * CAST('0.95' AS DOUBLE)) * (rr * CAST('0.95' AS DOUBLE)))
              + (((rr * CAST('0.95' AS DOUBLE)) * (rr * CAST('0.95' AS DOUBLE)))
                 * (rr * CAST('0.95' AS DOUBLE)))
              + (((rr * CAST('0.95' AS DOUBLE)) * (rr * CAST('0.95' AS DOUBLE)))
                 * ((rr * CAST('0.95' AS DOUBLE)) * (rr * CAST('0.95' AS DOUBLE)))))
             AS clv_cents
    FROM base
    """,
)
def q581(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based customer lifetime value per segment: weekly repeat
    rate as ONE exact rational (user-weeks with a following active
    week / user-weeks), mean weekly spend as ONE rational, CLV =
    m·Σ_{t=1..4}(r·δ)^t with δ=0.95 shipped as a STRING-cast double
    (ORACLES rule: decimal-literal casts are not correctly rounded)
    and every power a fixed-association product — the planning
    sibling of the empirical ltv_curve."""
    ev = load_table(spark, sf, "events")
    f = ev.select(
        (F.col("user_id") % 5).alias("seg"),
        "user_id",
        F.floor(F.unix_seconds(F.col("ts")) / 604800).cast("long").alias("week"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    uw = f.groupBy("seg", "user_id", "week").agg(
        F.sum("cents").cast("long").alias("spend")
    )
    b = uw.select(
        F.col("seg").alias("bseg"), F.col("user_id").alias("bu"), F.col("week").alias("bw")
    )
    ret = (
        uw.join(
            b,
            (F.col("user_id") == F.col("bu"))
            & (F.col("seg") == F.col("bseg"))
            & (F.col("bw") == F.col("week") + 1),
            "left",
        )
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("d"),
            F.sum(F.when(F.col("bu").isNotNull(), 1).otherwise(0)).cast("long").alias("n"),
        )
    )
    margin = uw.groupBy("seg").agg(
        F.sum("spend").cast("long").alias("sp"), F.count(F.lit(1)).cast("long").alias("nw")
    )
    base = ret.join(margin, "seg").select(
        "seg", "n", "d",
        (F.col("n") / F.col("d")).alias("rr"),
        (F.col("sp") / F.col("nw")).alias("m"),
    )
    g = F.col("rr") * F.lit(0.95)
    g2 = g * g
    clv = F.col("m") * (g + g2 + (g2 * g) + (g2 * g2))
    return base.select("seg", "n", "d", "rr", "m", clv.alias("clv_cents"))


# ------------------------------------------------------------------ q582
@query(
    "q582_bradley_terry",
    """
    WITH daily AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS score
        FROM events GROUP BY 1, 2
    ),
    matches AS (
        SELECT a.event_type AS i, b.event_type AS j,
               CASE WHEN a.score > b.score THEN 1
                    WHEN a.score < b.score THEN 0 END AS won
        FROM daily a JOIN daily b
          ON a.day = b.day AND a.event_type < b.event_type
    ),
    counts AS (
        SELECT i, j, CAST(count(*) AS BIGINT) AS n_ij,
               CAST(sum(won) AS BIGINT) AS w_ij
        FROM matches WHERE won IS NOT NULL GROUP BY 1, 2
    ),
    pairs AS (
        SELECT i AS p, j AS o, n_ij AS n, w_ij AS w FROM counts
        UNION ALL
        SELECT j AS p, i AS o, n_ij AS n, n_ij - w_ij AS w FROM counts
    ),
    wins AS (SELECT p, CAST(sum(w) AS BIGINT) AS tw FROM pairs GROUP BY 1),
    r1 AS (
        SELECT p, tw / list_reduce([CAST(0.0 AS DOUBLE)]
                 || list(n / (CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE)) ORDER BY o),
                 (a, b) -> a + b) AS s
        FROM pairs JOIN wins USING (p) GROUP BY p, tw
    ),
    r2 AS (
        SELECT pr.p, wins.tw / list_reduce([CAST(0.0 AS DOUBLE)]
                 || list(pr.n / (sp.s + so.s) ORDER BY pr.o),
                 (a, b) -> a + b) AS s
        FROM pairs pr JOIN wins ON wins.p = pr.p
        JOIN r1 sp ON sp.p = pr.p JOIN r1 so ON so.p = pr.o
        GROUP BY pr.p, wins.tw
    )
    SELECT p AS player, s AS strength FROM r2
    """,
)
def q582(spark: SparkSession, sf: str) -> DataFrame:
    """Bradley-Terry pairwise-strength model over daily event-type
    score contests, two unrolled MM rounds (p_i ← W_i / Σ_j
    n_ij/(p_i+p_j), seeded at 1): every denominator an opponent-
    ordered LEFT FOLD, win counts exact BIGINTs — the SQL-replayable
    sibling of the rows-only Elo scan."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("score"))
    a = daily.select(F.col("event_type").alias("i"), "day", F.col("score").alias("sa"))
    b = daily.select(F.col("event_type").alias("j"), F.col("day").alias("bd"), F.col("score").alias("sb"))
    matches = a.join(b, (F.col("day") == F.col("bd")) & (F.col("i") < F.col("j"))).select(
        "i", "j",
        F.when(F.col("sa") > F.col("sb"), 1).when(F.col("sa") < F.col("sb"), 0).alias("won"),
    )
    counts = matches.where(F.col("won").isNotNull()).groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n_ij"),
        F.sum("won").cast("long").alias("w_ij"),
    )
    pairs = counts.select(
        F.col("i").alias("p"), F.col("j").alias("o"),
        F.col("n_ij").alias("n"), F.col("w_ij").alias("w"),
    ).unionByName(
        counts.select(
            F.col("j").alias("p"), F.col("i").alias("o"),
            F.col("n_ij").alias("n"), (F.col("n_ij") - F.col("w_ij")).alias("w"),
        )
    )
    wins = pairs.groupBy("p").agg(F.sum("w").cast("long").alias("tw"))

    def _fold(grouped_term_df, term):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("o"), term.alias("t")))),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    j1 = pairs.join(wins, "p")
    r1 = j1.groupBy("p", "tw").agg(
        _fold(j1, F.col("n") / (F.lit(1.0) + F.lit(1.0))).alias("den")
    ).select("p", (F.col("tw") / F.col("den")).alias("s"))
    sp = r1.select(F.col("p").alias("p2"), F.col("s").alias("s_self"))
    so = r1.select(F.col("p").alias("o2"), F.col("s").alias("s_opp"))
    j2 = (
        pairs.join(wins, "p")
        .join(sp, F.col("p") == F.col("p2"))
        .join(so, F.col("o") == F.col("o2"))
    )
    r2 = j2.groupBy("p", "tw").agg(
        _fold(j2, F.col("n") / (F.col("s_self") + F.col("s_opp"))).alias("den")
    ).select(F.col("p").alias("player"), (F.col("tw") / F.col("den")).alias("strength"))
    return r2


# ------------------------------------------------------------------ q583
def _q583_oracle() -> str:
    from .queries10 import _HLL_A

    return f"""
    WITH h AS (
        SELECT event_type,
               ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    r AS (
        SELECT event_type, CAST(hv >> 52 AS INT) AS bucket,
               CAST(CASE WHEN (hv & ((1::BIGINT << 52) - 1)) = 0 THEN 53
                    ELSE 52 - length(bin(hv & ((1::BIGINT << 52) - 1))) + 1 END AS INT) AS rho0
        FROM h
    ),
    regs AS (SELECT event_type, bucket, max(rho0) AS rho FROM r GROUP BY 1, 2),
    agg AS (
        SELECT event_type, count(*) AS used,
               sum((1::BIGINT << (53 - rho))) AS s
        FROM regs GROUP BY 1
    ),
    est AS (
        SELECT event_type, used,
               round(CASE WHEN {_HLL_A} / ((s + (256 - used) * (1::BIGINT << 53)))::DOUBLE
                               <= 640.0 AND (256 - used) > 0
                          THEN 256.0 * ln(256.0 / (256 - used))
                          ELSE {_HLL_A} / ((s + (256 - used) * (1::BIGINT << 53)))::DOUBLE
                     END, 6) AS estimate
        FROM agg
    ),
    exact AS (
        SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events WHERE user_id IS NOT NULL GROUP BY 1
    )
    SELECT e.event_type, exact_distinct, estimate,
           round((estimate - exact_distinct) * 1000000 / exact_distinct, 3) AS err_ppm
    FROM est e JOIN exact USING (event_type)
    """


@query("q583_hll_error_audit", _q583_oracle())
def q583(spark: SparkSession, sf: str) -> DataFrame:
    """HLL accuracy self-audit: per event type the portable-md5 HLL
    estimate (operators/sketch.hll_registers_by, p=8) side by side
    with the EXACT distinct-user count and the signed relative error
    in ppm — the sketch-governance relation that tells you whether
    p=8 is honest at your cardinalities."""
    from .operators.sketch import hll_registers_by
    from .queries10 import _HLL_A

    ev = load_table(spark, sf, "events")
    regs = hll_registers_by(ev, ["event_type"], "user_id", p=8, hash_kind="md5")
    agg = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("CAST(shiftleft(1L, 53 - rho) AS BIGINT)")).alias("s"),
    )
    a = float(_HLL_A)
    raw = F.lit(a) / (
        (F.col("s") + (F.lit(256) - F.col("used")) * F.lit(1 << 53)).cast("double")
    )
    v = F.lit(256) - F.col("used")
    est = agg.select(
        "event_type", F.col("used"),
        F.round(
            F.when(
                (raw <= 640.0) & (v > 0),
                F.lit(256.0) * F.log(F.lit(256.0) / v),
            ).otherwise(raw),
            6,
        ).alias("estimate"),
    )
    exact = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return est.join(exact, "event_type").select(
        "event_type", "exact_distinct", "estimate",
        F.round(
            (F.col("estimate") - F.col("exact_distinct")) * 1000000 / F.col("exact_distinct"),
            3,
        ).alias("err_ppm"),
    )


# ------------------------------------------------------------------ q584
_Q584_TERMS = ["slow join", "table scan", "batch batch", "spark", "lorem ipsum"]


def _q584_oracle() -> str:
    picks = []
    for t in _Q584_TERMS:
        picks.append(
            f"SELECT '{t}' AS term,\n"
            f"       CAST(sum(CASE WHEN len(regexp_extract_all(lower(text), '{t}')) > 0"
            f" THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,\n"
            f"       CAST(sum(len(regexp_extract_all(lower(text), '{t}'))) AS BIGINT)"
            f" AS total_hits\n"
            f"FROM documents WHERE text IS NOT NULL"
        )
    return "\nUNION ALL\n".join(picks)


@query("q584_blocklist_audit", _q584_oracle())
def q584(spark: SparkSession, sf: str) -> DataFrame:
    """Content-policy blocklist audit: per term the documents affected
    and total occurrences via regexp_count over the lowered text —
    pure codegen, one scan per term unioned (a handful of audited
    terms is the contract; a big lexicon would explode tokens and
    join instead — the trending_terms path)."""
    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    outs = []
    for t in _Q584_TERMS:
        c = F.expr(f"regexp_count(lower(text), '{t}')")
        outs.append(
            d.agg(
                F.sum(F.when(c > 0, 1).otherwise(0)).cast("long").alias("n_docs"),
                F.sum(c).cast("long").alias("total_hits"),
            ).select(F.lit(t).alias("term"), "n_docs", "total_hits")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ------------------------------------------------------------------ q586
@query(
    "q586_neyman_allocation",
    """
    WITH daily AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS rev
        FROM events GROUP BY 1, 2
    ),
    s AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(rev) AS BIGINT) AS sv,
               CAST(sum(rev * rev) AS BIGINT) AS q
        FROM daily GROUP BY 1
    ),
    w AS (
        SELECT event_type, n,
               n * (sqrt(CAST(n * q - sv * sv AS DOUBLE)) / n) AS wh
        FROM s
    ),
    tot AS (
        SELECT list_reduce([CAST(0.0 AS DOUBLE)] || list(wh ORDER BY event_type),
                           (a, b) -> a + b) AS tw
        FROM w
    ),
    base AS (
        SELECT event_type, n, wh,
               CAST(floor(1000 * wh / tw) AS BIGINT) AS base_n,
               1000 * wh / tw - floor(1000 * wh / tw) AS rem
        FROM w CROSS JOIN tot
    ),
    d2 AS (
        SELECT *, CAST(1000 - sum(base_n) OVER () AS BIGINT) AS deficit,
               row_number() OVER (ORDER BY rem DESC, event_type) AS rk
        FROM base
    )
    SELECT event_type, n, base_n,
           base_n + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS alloc
    FROM d2
    """,
)
def q586(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman optimal stratified-sample allocation (n_h ∝ N_h·σ_h) for
    a 1000-unit budget: stratum σ from exact integer power sums, the
    float weight total as an ORDERED sum over the 5-row stratum
    relation (deterministic association), floor + largest-remainder
    rounding so the allocation conserves exactly — survey-methods
    machinery on the engine's exactness discipline."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
    ).agg(F.sum(F.round(F.col("value")).cast("long")).cast("long").alias("rev"))
    s = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("long").alias("sv"),
        F.sum(F.col("rev") * F.col("rev")).cast("long").alias("q"),
    )
    wh = F.col("n") * (
        F.sqrt((F.col("n") * F.col("q") - F.col("sv") * F.col("sv")).cast("double"))
        / F.col("n")
    )
    w = s.select("event_type", "n", wh.alias("wh"))
    tot = w.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("event_type"), F.col("wh").alias("t")))),
                lambda x: x.getField("t"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("tw")
    )
    base = w.crossJoin(F.broadcast(tot)).select(
        "event_type", "n", "wh",
        F.floor(1000 * F.col("wh") / F.col("tw")).cast("long").alias("base_n"),
        (1000 * F.col("wh") / F.col("tw") - F.floor(1000 * F.col("wh") / F.col("tw"))).alias("rem"),
    )
    wall = Window.partitionBy()
    d2 = base.select(
        "*",
        (1000 - F.sum("base_n").over(wall)).cast("long").alias("deficit"),
        F.row_number().over(Window.partitionBy().orderBy(F.desc("rem"), "event_type")).alias("rk"),
    )
    return d2.select(
        "event_type", "n", "base_n",
        (F.col("base_n") + F.when(F.col("rk") <= F.col("deficit"), 1).otherwise(0)).alias("alloc"),
    )


# ------------------------------------------------------------------ q585
@query(
    "q585_novelty_effect",
    """
    WITH f AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS t,
               CAST(round(value) AS BIGINT) AS y
        FROM events
    ),
    daily AS (
        SELECT day,
               CAST(sum(t) AS BIGINT) AS n1,
               CAST(sum(1 - t) AS BIGINT) AS n0,
               CAST(sum(t * y) AS BIGINT) AS s1,
               CAST(sum((1 - t) * y) AS BIGINT) AS s0
        FROM f GROUP BY 1
    ),
    diffs AS (
        SELECT day - (SELECT min(day) FROM daily) AS x,
               s1 / n1 - s0 / n0 AS diff
        FROM daily WHERE n1 > 0 AND n0 > 0
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               list_reduce([CAST(0.0 AS DOUBLE)] || list(diff ORDER BY x),
                           (a, b) -> a + b) AS sy,
               list_reduce([CAST(0.0 AS DOUBLE)] || list(x * diff ORDER BY x),
                           (a, b) -> a + b) AS sxy
        FROM diffs
    )
    SELECT n, sy / n AS mean_effect,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_per_day
    FROM s
    """,
)
def q585(spark: SparkSession, sf: str) -> DataFrame:
    """Novelty-effect detector for experiments: the daily treatment
    effect (one-divide rationals) regressed on exposure day — Σ diff
    and Σ x·diff as DAY-ORDERED LEFT FOLDS (float terms never meet a
    hash agg), integer Σx/Σx², slope one closed form.  A decaying
    slope says the lift is novelty, not value."""
    ev = load_table(spark, sf, "events")
    t = (F.col("user_id") % 2 == 0).cast("long")
    f = ev.select(
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
        t.alias("t"),
        F.round(F.col("value")).cast("long").alias("y"),
    )
    daily = f.groupBy("day").agg(
        F.sum("t").cast("long").alias("n1"),
        F.sum(1 - F.col("t")).cast("long").alias("n0"),
        F.sum(F.col("t") * F.col("y")).cast("long").alias("s1"),
        F.sum((1 - F.col("t")) * F.col("y")).cast("long").alias("s0"),
    )
    dmin = daily.agg(F.min("day").alias("d0"))
    diffs = (
        daily.where((F.col("n1") > 0) & (F.col("n0") > 0))
        .crossJoin(F.broadcast(dmin))
        .select(
            (F.col("day") - F.col("d0")).alias("x"),
            (F.col("s1") / F.col("n1") - F.col("s0") / F.col("n0")).alias("diff"),
        )
    )

    def _fold(term):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("x"), term.alias("t")))),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    s = diffs.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        _fold(F.col("diff")).alias("sy"),
        _fold(F.col("x") * F.col("diff")).alias("sxy"),
    )
    return s.select(
        "n",
        (F.col("sy") / F.col("n")).alias("mean_effect"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope_per_day"),
    )


# ------------------------------------------------------------------ q587
def _q587_oracle() -> str:
    picks = []
    for r in (0, 2500, 5000, 7500):
        picks.append(f"""
    SELECT CAST({r} AS BIGINT) AS reserve,
           CAST(sum(CASE WHEN win_bid >= {r} THEN 1 ELSE 0 END) AS BIGINT) AS n_sold,
           CAST(sum(CASE WHEN win_bid >= {r}
                         THEN greatest(coalesce(second, 0), {r}) ELSE 0 END) AS BIGINT)
             AS revenue_cents
    FROM agg""")
    body = "\nUNION ALL".join(picks)
    return f"""
    WITH bids AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               user_id AS bidder, CAST(round(value * 100) AS BIGINT) AS bid
        FROM events
    ),
    ranked AS (
        SELECT event_type, day, bid,
               row_number() OVER (PARTITION BY event_type, day
                                  ORDER BY bid DESC, bidder) AS rn
        FROM bids
    ),
    agg AS (
        SELECT event_type, day,
               max(CASE WHEN rn = 1 THEN bid END) AS win_bid,
               max(CASE WHEN rn = 2 THEN bid END) AS second
        FROM ranked WHERE rn <= 2 GROUP BY 1, 2
    )
    {body}
    """


@query("q587_reserve_sweep", _q587_oracle())
def q587(spark: SparkSession, sf: str) -> DataFrame:
    """Optimal-reserve what-if for the q559 auctions: ONE top-2
    ranking pass, then every candidate reserve is a conditional
    integer aggregate over the same tiny clearing relation — lots
    sold and total revenue per reserve, all exact cents (the revenue
    curve whose argmax prices the auction)."""
    ev = load_table(spark, sf, "events")
    bids = ev.select(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
        F.col("user_id").alias("bidder"),
        F.round(F.col("value") * 100).cast("long").alias("bid"),
    )
    w = Window.partitionBy("event_type", "day").orderBy(F.desc("bid"), "bidder")
    ranked = bids.select(
        "event_type", "day", "bid", F.row_number().over(w).alias("rn")
    ).where(F.col("rn") <= 2)
    agg = ranked.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn") == 1, F.col("bid"))).alias("win_bid"),
        F.max(F.when(F.col("rn") == 2, F.col("bid"))).alias("second"),
    )
    outs = []
    for r in (0, 2500, 5000, 7500):
        sold = F.col("win_bid") >= r
        outs.append(
            agg.agg(
                F.sum(F.when(sold, 1).otherwise(0)).cast("long").alias("n_sold"),
                F.sum(
                    F.when(
                        sold,
                        F.greatest(F.coalesce(F.col("second"), F.lit(0).cast("long")),
                                   F.lit(r).cast("long")),
                    ).otherwise(0)
                ).cast("long").alias("revenue_cents"),
            ).select(F.lit(r).cast("long").alias("reserve"), "n_sold", "revenue_cents")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ------------------------------------------------------------------ q588
@query(
    "q588_kmeans1d_exact",
    """
    WITH f AS (
        SELECT event_type, CAST(round(value) AS BIGINT) AS x, event_id
        FROM events WHERE event_id % 5 = 0
    ),
    ordered AS (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type ORDER BY x, event_id) AS k,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               CAST(sum(x) OVER (PARTITION BY event_type
                                 ORDER BY x, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sl,
               CAST(sum(x * x) OVER (PARTITION BY event_type
                                     ORDER BY x, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ql,
               CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS st,
               CAST(sum(x * x) OVER (PARTITION BY event_type) AS BIGINT) AS qt
        FROM f
    ),
    costs AS (
        SELECT event_type, x AS split_at, k, n,
               (ql - CAST(sl * sl AS DOUBLE) / k)
             + ((qt - ql) - CAST((st - sl) * (st - sl) AS DOUBLE) / (n - k)) AS cost
        FROM ordered WHERE k < n
    ),
    best AS (
        SELECT event_type, min(cost) AS mc FROM costs GROUP BY 1
    )
    SELECT c.event_type,
           CAST(min(c.split_at) AS BIGINT) AS split_at,
           CAST(min(c.k) AS BIGINT) AS n_left,
           CAST(max(c.n) AS BIGINT) AS n,
           min(c.cost) AS sse
    FROM costs c JOIN best b ON c.event_type = b.event_type AND c.cost = b.mc
    GROUP BY 1
    """,
)
def q588(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT 1-D 2-means per event type (the optimal split minimizing
    within-cluster SSE — k-means' verifiable baseline): one ordered
    prefix-sum window gives every candidate split's cost from exact
    integer power sums via the bracket identity Q−S²/n (the only float
    ops are two identically-formed divides), argmin tie-broken on the
    smallest split value.  O(n log n) per key, no iteration, no seed."""
    ev = load_table(spark, sf, "events").where(F.col("event_id") % 5 == 0)
    f = ev.select(
        "event_type", F.round(F.col("value")).cast("long").alias("x"), "event_id"
    )
    wo = Window.partitionBy("event_type").orderBy("x", "event_id")
    wa = Window.partitionBy("event_type")
    run = wo.rowsBetween(Window.unboundedPreceding, 0)
    ordered = f.select(
        "event_type", "x",
        F.row_number().over(wo).alias("k"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
        F.sum("x").over(run).cast("long").alias("sl"),
        F.sum(F.col("x") * F.col("x")).over(run).cast("long").alias("ql"),
        F.sum("x").over(wa).cast("long").alias("st"),
        F.sum(F.col("x") * F.col("x")).over(wa).cast("long").alias("qt"),
    )
    cost = (
        F.col("ql") - (F.col("sl") * F.col("sl")).cast("double") / F.col("k")
    ) + (
        (F.col("qt") - F.col("ql"))
        - ((F.col("st") - F.col("sl")) * (F.col("st") - F.col("sl"))).cast("double")
        / (F.col("n") - F.col("k"))
    )
    costs = ordered.where(F.col("k") < F.col("n")).select(
        "event_type", F.col("x").alias("split_at"), "k", "n", cost.alias("cost")
    )
    best = costs.groupBy("event_type").agg(F.min("cost").alias("mc"))
    return (
        costs.join(best, "event_type")
        .where(F.col("cost") == F.col("mc"))
        .groupBy("event_type")
        .agg(
            F.min("split_at").cast("long").alias("split_at"),
            F.min("k").cast("long").alias("n_left"),
            F.max("n").cast("long").alias("n"),
            F.min("cost").alias("sse"),
        )
    )


# ------------------------------------------------------------------ q589
def _q589_oracle() -> str:
    from .operators.text import _LANG_MARKERS
    from .queries import ORACLES

    nb = ORACLES["q549_naive_bayes_lang"]
    score_cols = []
    for lang, markers in _LANG_MARKERS.items():
        s = " + ".join(
            f"contains(' ' || lower(text) || ' ', '{m}')::INT" for m in markers
        )
        score_cols.append(f"{s} AS s_{lang}")
    scores = ",\n               ".join(score_cols)
    langs = list(_LANG_MARKERS.keys())
    g = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    pick = f"CASE WHEN {g} = 0 THEN 'und' "
    for l in langs[:-1]:
        pick += f"WHEN s_{l} = {g} THEN '{l}' "
    pick += f"ELSE '{langs[-1]}' END"
    return f"""
    WITH nb AS ({nb}),
    li AS (
        SELECT doc_id, {pick} AS pred FROM (
            SELECT doc_id, {scores}
            FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL
        )
    ),
    lptrain AS (
        SELECT n_chars // 100 AS bucket, lang, CAST(count(*) AS BIGINT) AS n
        FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL GROUP BY 1, 2
    ),
    lpmap AS (
        SELECT bucket, lang AS pred FROM (
            SELECT bucket, lang,
                   row_number() OVER (PARTITION BY bucket ORDER BY n DESC, lang) AS rk
            FROM lptrain
        ) WHERE rk = 1
    ),
    gmode AS (
        SELECT lang AS m FROM (
            SELECT lang, CAST(sum(n) AS BIGINT) AS tn FROM lptrain GROUP BY 1
            ORDER BY tn DESC, lang LIMIT 1
        )
    ),
    te AS (
        SELECT doc_id, n_chars // 100 AS bucket
        FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL
    ),
    v AS (
        SELECT nb.doc_id, nb.true_lang, nb.pred_lang AS p_nb, li.pred AS p_li,
               coalesce(lpmap.pred, gmode.m) AS p_lp
        FROM nb JOIN li ON nb.doc_id = li.doc_id
        JOIN te ON te.doc_id = nb.doc_id
        LEFT JOIN lpmap ON lpmap.bucket = te.bucket
        CROSS JOIN gmode
    ),
    scored AS (
        SELECT *, CASE WHEN p_li = p_lp THEN p_li ELSE p_nb END AS p_ens FROM v
    )
    SELECT 'naive_bayes' AS method, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN p_nb = true_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           (CAST(sum(CASE WHEN p_nb = true_lang THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*) AS accuracy_ppm
    FROM scored
    UNION ALL
    SELECT 'lang_id', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p_li = true_lang THEN 1 ELSE 0 END) AS BIGINT),
           (CAST(sum(CASE WHEN p_li = true_lang THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*)
    FROM scored
    UNION ALL
    SELECT 'length_prior', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p_lp = true_lang THEN 1 ELSE 0 END) AS BIGINT),
           (CAST(sum(CASE WHEN p_lp = true_lang THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*)
    FROM scored
    UNION ALL
    SELECT 'ensemble', CAST(count(*) AS BIGINT),
           CAST(sum(CASE WHEN p_ens = true_lang THEN 1 ELSE 0 END) AS BIGINT),
           (CAST(sum(CASE WHEN p_ens = true_lang THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
             // count(*)
    FROM scored
    """


@query("q589_classifier_ensemble", _q589_oracle())
def q589(spark: SparkSession, sf: str) -> DataFrame:
    """Three-classifier ensemble with majority vote: Naive Bayes
    (q549's trained model), the marker-based lang_id heuristic, and a
    length-bucket prior (argmax train language per n_chars DIV 100) —
    vote = the pair that agrees, else NB.  The relation reports each
    method's accuracy in exact integer ppm side by side; the oracle
    reuses q549's registered SQL verbatim and replays the other two."""
    from .operators.text import lang_id, naive_bayes_classify

    d = load_table(spark, sf, "documents")
    train = d.where((F.col("doc_id") % 2 == 0) & F.col("text").isNotNull())
    test = d.where((F.col("doc_id") % 2 == 1) & F.col("text").isNotNull())
    nb = naive_bayes_classify(
        d.where(F.col("doc_id") % 2 == 0), d.where(F.col("doc_id") % 2 == 1),
        "doc_id", "lang", "text", k_tokens=12,
    ).select("doc_id", F.col("pred_lang").alias("p_nb"))
    li = test.select("doc_id", lang_id(F.col("text")).alias("p_li"))
    lptrain = train.groupBy(
        F.expr("n_chars DIV 100").alias("bucket"), "lang"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wb = Window.partitionBy("bucket").orderBy(F.desc("n"), "lang")
    lpmap = (
        lptrain.withColumn("rk", F.row_number().over(wb))
        .where(F.col("rk") == 1)
        .select("bucket", F.col("lang").alias("p_bucket"))
    )
    gmode = (
        lptrain.groupBy("lang")
        .agg(F.sum("n").cast("long").alias("tn"))
        .orderBy(F.desc("tn"), "lang")
        .limit(1)
        .select(F.col("lang").alias("m"))
    )
    te = test.select("doc_id", F.expr("n_chars DIV 100").alias("bucket"),
                     F.col("lang").alias("true_lang"))
    v = (
        te.join(nb, "doc_id")
        .join(li, "doc_id")
        .join(F.broadcast(lpmap), "bucket", "left")
        .crossJoin(F.broadcast(gmode))
        .select(
            "doc_id", "true_lang", "p_nb", "p_li",
            F.coalesce(F.col("p_bucket"), F.col("m")).alias("p_lp"),
        )
    )
    scored = v.withColumn(
        "p_ens",
        F.when(F.col("p_li") == F.col("p_lp"), F.col("p_li")).otherwise(F.col("p_nb")),
    )
    outs = []
    for name, col in [("naive_bayes", "p_nb"), ("lang_id", "p_li"),
                      ("length_prior", "p_lp"), ("ensemble", "p_ens")]:
        hit = F.when(F.col(col) == F.col("true_lang"), 1).otherwise(0)
        outs.append(
            scored.agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(hit).cast("long").alias("n_correct"),
            ).select(
                F.lit(name).alias("method"), "n_docs", "n_correct",
                F.expr("(n_correct * 1000000) DIV n_docs").alias("accuracy_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ------------------------------------------------------------------ q590
def _q590_oracle() -> str:
    from .queries import ORACLES

    lt = ORACLES["q218_last_touch_attribution"]
    us = ORACLES["q273_u_shaped_attribution"]
    mk = ORACLES["q564_markov_attribution"]
    mk_cells = ", ".join(
        f"coalesce(max(CASE WHEN channel = '{c}' THEN removal_effect END),"
        f" CAST(0.0 AS DOUBLE)) AS e_{c}"
        for c in ("click", "error", "signup", "view")
    )
    return f"""
    WITH lt AS ({lt}),
    us AS ({us}),
    mk AS ({mk}),
    lts AS (SELECT touch_type AS channel, CAST(count(*) AS BIGINT) AS n FROM lt GROUP BY 1),
    ltt AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM lts),
    uss AS (
        SELECT channel,
               list_reduce([CAST(0.0 AS DOUBLE)]
                   || list(credit_bp ORDER BY user_id, conversion_id, touch_id),
                   (a, b) -> a + b) AS bp
        FROM us GROUP BY 1
    ),
    ust AS (
        SELECT list_reduce([CAST(0.0 AS DOUBLE)] || list(bp ORDER BY channel),
                           (a, b) -> a + b) AS t
        FROM uss
    ),
    mkp AS (SELECT {mk_cells} FROM mk)
    SELECT m.channel,
           coalesce((lts.n * 1000000) // ltt.t, 0) AS lt_share_ppm,
           coalesce(CAST(floor(uss.bp * 1000000 / ust.t) AS BIGINT), 0) AS us_share_ppm,
           m.removal_effect / (((e_click + e_error) + e_signup) + e_view) AS markov_share
    FROM mk m CROSS JOIN mkp CROSS JOIN ltt CROSS JOIN ust
    LEFT JOIN lts ON lts.channel = m.channel
    LEFT JOIN uss ON uss.channel = m.channel
    """


@query("q590_attribution_comparison", _q590_oracle())
def q590(spark: SparkSession, sf: str) -> DataFrame:
    """Attribution-model comparison capstone: per channel the credit
    share under last-touch (q218), U-shaped 40-20-40 (q273) and Markov
    removal effect (q564) side by side — integer-ppm shares for the
    counting models, a fixed-order normalized double for Markov.  Both
    the Spark side and the oracle COMPOSE the three registered
    pipelines verbatim; the disagreement between columns is the
    marketing-mix insight."""
    from .queries import QUERIES

    lt = QUERIES["q218_last_touch_attribution"](spark, sf)
    us = QUERIES["q273_u_shaped_attribution"](spark, sf)
    mk = QUERIES["q564_markov_attribution"](spark, sf)
    lts = lt.groupBy(F.col("touch_type").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    ltt = lts.agg(F.sum("n").cast("long").alias("t_lt"))
    def _fold(sort_cols, term):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(*sort_cols, term.alias("t")))),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    uss = us.groupBy("channel").agg(
        _fold(
            [F.col("user_id"), F.col("conversion_id"), F.col("touch_id")],
            F.col("credit_bp"),
        ).alias("bp")
    )
    ust = uss.agg(_fold([F.col("channel")], F.col("bp")).alias("t_us"))
    mkp = mk.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("channel") == c, F.col("removal_effect"))),
                F.lit(0.0),
            ).alias(f"e_{c}")
            for c in ("click", "error", "signup", "view")
        ]
    )
    den = (
        (F.col("e_click") + F.col("e_error")) + F.col("e_signup")
    ) + F.col("e_view")
    return (
        mk.crossJoin(F.broadcast(mkp))
        .crossJoin(F.broadcast(ltt))
        .crossJoin(F.broadcast(ust))
        .join(lts.withColumnRenamed("channel", "c2"), F.col("channel") == F.col("c2"), "left")
        .join(uss.withColumnRenamed("channel", "c3"), F.col("channel") == F.col("c3"), "left")
        .select(
            "channel",
            F.coalesce(F.expr("(n * 1000000) DIV t_lt"), F.lit(0).cast("long")).alias("lt_share_ppm"),
            F.coalesce(
                F.floor(F.col("bp") * 1000000 / F.col("t_us")).cast("long"),
                F.lit(0).cast("long"),
            ).alias("us_share_ppm"),
            (F.col("removal_effect") / den).alias("markov_share"),
        )
    )


# ------------------------------------------------------------------ q591
@query(
    "q591_partition_advisor",
    """
    WITH cand_day AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS pk FROM events
    ),
    cand_type AS (SELECT event_type AS pk FROM events),
    cand_user AS (SELECT CAST(user_id % 16 AS VARCHAR) AS pk FROM events),
    s_day AS (
        SELECT 'day' AS candidate, CAST(count(DISTINCT pk) AS BIGINT) AS n_partitions,
               CAST(max(c) AS BIGINT) AS max_rows, CAST(sum(c) AS BIGINT) AS total_rows
        FROM (SELECT pk, count(*) AS c FROM cand_day GROUP BY 1)
    ),
    s_type AS (
        SELECT 'event_type', CAST(count(DISTINCT pk) AS BIGINT),
               CAST(max(c) AS BIGINT), CAST(sum(c) AS BIGINT)
        FROM (SELECT pk, count(*) AS c FROM cand_type GROUP BY 1)
    ),
    s_user AS (
        SELECT 'user_bucket16', CAST(count(DISTINCT pk) AS BIGINT),
               CAST(max(c) AS BIGINT), CAST(sum(c) AS BIGINT)
        FROM (SELECT pk, count(*) AS c FROM cand_user GROUP BY 1)
    ),
    u AS (SELECT * FROM s_day UNION ALL SELECT * FROM s_type UNION ALL SELECT * FROM s_user)
    SELECT candidate, n_partitions, max_rows, total_rows,
           (max_rows * n_partitions * 1000000) // total_rows AS skew_ppm,
           total_rows // n_partitions AS mean_rows,
           n_partitions <= 10000
             AND (max_rows * n_partitions * 1000000) // total_rows <= 3000000 AS acceptable
    FROM u
    """,
)
def q591(spark: SparkSession, sf: str) -> DataFrame:
    """Partition-key advisor: for each candidate layout (day /
    event_type / 16 user buckets) the partition count, the skew ratio
    max/mean in exact integer ppm, and an acceptance verdict
    (≤10k partitions, skew ≤3×) — the physical-design pre-flight a
    100 TB writer runs before save_bucketed/partitionBy."""
    ev = load_table(spark, sf, "events")
    cands = {
        "day": F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").cast("string"),
        "event_type": F.col("event_type"),
        "user_bucket16": (F.col("user_id") % 16).cast("string"),
    }
    outs = []
    for name, pk in cands.items():
        per = ev.groupBy(pk.alias("pk")).agg(F.count(F.lit(1)).alias("c"))
        outs.append(
            per.agg(
                F.count(F.lit(1)).cast("long").alias("n_partitions"),
                F.max("c").cast("long").alias("max_rows"),
                F.sum("c").cast("long").alias("total_rows"),
            ).select(F.lit(name).alias("candidate"), "n_partitions", "max_rows", "total_rows")
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    skew = F.expr("(max_rows * n_partitions * 1000000) DIV total_rows")
    return u.select(
        "candidate", "n_partitions", "max_rows", "total_rows",
        skew.alias("skew_ppm"),
        F.expr("total_rows DIV n_partitions").alias("mean_rows"),
        ((F.col("n_partitions") <= 10000) & (skew <= 3000000)).alias("acceptable"),
    )


# ------------------------------------------------------------------ q592
@query(
    "q592_temporal_cooccurrence",
    """
    WITH w AS (
        SELECT DISTINCT CAST(floor(epoch(ts) / 300.0) AS BIGINT) AS win, event_type
        FROM events
    ),
    n_w AS (SELECT CAST(count(DISTINCT win) AS BIGINT) AS nw FROM w),
    singles AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb, CAST(count(*) AS BIGINT) AS n_ab
        FROM w a JOIN w b ON a.win = b.win AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT ta, tb, n_ab, sa.n AS n_a, sb.n AS n_b, nw,
           (n_ab * nw * 1000000) // (sa.n * sb.n) AS lift_ppm
    FROM pairs JOIN singles sa ON sa.event_type = ta
    JOIN singles sb ON sb.event_type = tb
    CROSS JOIN n_w
    """,
)
def q592(spark: SparkSession, sf: str) -> DataFrame:
    """Temporal co-occurrence lift between event types in 5-minute
    windows: baskets are time buckets (the incident-correlation
    reading of association mining), lift = P(ab)/(P(a)P(b)) as the
    exact integer cross-product n_ab·N·10⁶ DIV (n_a·n_b) — >1e6 means
    the two types cluster in time."""
    ev = load_table(spark, sf, "events")
    w = ev.select(
        F.floor(F.unix_seconds(F.col("ts")) / 300).cast("long").alias("win"),
        "event_type",
    ).distinct()
    nw = w.select("win").distinct().agg(F.count(F.lit(1)).cast("long").alias("nw"))
    singles = w.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = w.select(F.col("win"), F.col("event_type").alias("ta"))
    b = w.select(F.col("win").alias("bw"), F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, (F.col("win") == F.col("bw")) & (F.col("ta") < F.col("tb")))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    sa = singles.select(F.col("event_type").alias("ta"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("tb"), F.col("n").alias("n_b"))
    return (
        pairs.join(sa, "ta").join(sb, "tb").crossJoin(F.broadcast(nw))
        .select(
            "ta", "tb", "n_ab", "n_a", "n_b", "nw",
            F.expr("(n_ab * nw * 1000000) DIV (n_a * n_b)").alias("lift_ppm"),
        )
    )


# ------------------------------------------------------------------ q593
@query(
    "q593_asof_native_parity",
    """
    WITH trades AS (
        SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
    ),
    quotes AS (
        SELECT user_id, ts, value AS qv FROM events WHERE event_type = 'view'
    )
    SELECT t.event_id, t.user_id,
           round(t.value, 2) AS trade_value,
           round(q.qv, 2) AS quote_value
    FROM trades t ASOF LEFT JOIN quotes q
      ON t.user_id = q.user_id AND t.ts >= q.ts
    """,
)
def q593(spark: SparkSession, sf: str) -> DataFrame:
    """merge_asof checked against DuckDB's NATIVE ``ASOF LEFT JOIN``
    syntax — a third, independent implementation of the backward-asof
    semantics (q13's oracle is hand-written SQL; this one is the
    engine's built-in operator), so the semantics are pinned by three
    codebases agreeing."""
    from .operators import merge

    ev = load_table(spark, sf, "events")
    trades = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    quotes = ev.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("qv")
    )
    j = merge.merge_asof(trades, quotes, on="ts", by="user_id", direction="backward")
    return j.select(
        "event_id", "user_id",
        F.round(F.col("value"), 2).alias("trade_value"),
        F.round(F.col("qv"), 2).alias("quote_value"),
    )


# ------------------------------------------------------------------ q594
def _q594_oracle() -> str:
    picks = []
    # pinball loss at tau = 3/4, slope grid in scaled thousandths
    for m in (2800, 3000, 3200):
        picks.append(f"""
    SELECT CAST({m} AS BIGINT) AS slope_milli,
           CAST(sum(CASE WHEN 1000 * y - {m} * x >= 0
                         THEN 3 * (1000 * y - {m} * x)
                         ELSE 1 * ({m} * x - 1000 * y) END) AS BIGINT) AS loss4x
    FROM pts""")
    body = "\nUNION ALL".join(picks)
    return f"""
    WITH pts AS (
        SELECT CAST(round(value) AS BIGINT) AS x,
               3 * CAST(round(value) AS BIGINT) + event_id % 21 - 5 AS y
        FROM events WHERE event_id % 11 = 0
    ),
    losses AS ({body})
    SELECT slope_milli, loss4x,
           loss4x = min(loss4x) OVER () AS is_best
    FROM losses
    """


@query("q594_quantile_reg_grid", _q594_oracle())
def q594(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile regression (τ=0.75) by slope grid search: each
    candidate slope scores the EXACT integer pinball loss
    Σ[3·r⁺ + 1·r⁻] on millicent-scaled residuals (τ weights as the
    integer ratio 3:1, no float loss anywhere); the argmin flag marks
    the grid winner.  The asymmetric noise (+15/−5 range) pulls the
    0.75-quantile line above the planted median slope."""
    ev = load_table(spark, sf, "events").where(F.col("event_id") % 11 == 0)
    dollars = F.round(F.col("value")).cast("long")
    pts = ev.select(
        dollars.alias("x"),
        (3 * dollars + F.col("event_id") % 21 - 5).alias("y"),
    )
    outs = []
    for m in (2800, 3000, 3200):
        r = 1000 * F.col("y") - m * F.col("x")
        loss = F.when(r >= 0, 3 * r).otherwise(1 * (-r))
        outs.append(
            pts.agg(F.sum(loss).cast("long").alias("loss4x")).select(
                F.lit(m).cast("long").alias("slope_milli"), "loss4x"
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    wall = Window.partitionBy()
    return u.withColumn("is_best", F.col("loss4x") == F.min("loss4x").over(wall))


# ------------------------------------------------------------------ q595
@query(
    "q595_hashed_centroid_classifier",
    r"""
    WITH tr AS (
        SELECT lang, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents WHERE doc_id % 2 = 0 AND text IS NOT NULL
    ),
    trh AS (
        SELECT lang,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS dim
        FROM tr
    ),
    cents AS (SELECT lang, dim, CAST(count(*) AS BIGINT) AS c FROM trh GROUP BY 1, 2),
    te AS (
        SELECT doc_id, lang AS true_lang,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')[1:24]) AS tok
        FROM documents WHERE doc_id % 2 = 1 AND text IS NOT NULL
    ),
    teh AS (
        SELECT doc_id, true_lang,
               ('0x' || substr(md5(tok), 1, 15))::BIGINT % 64 AS dim
        FROM te
    ),
    tf AS (SELECT doc_id, true_lang, dim, CAST(count(*) AS BIGINT) AS f
           FROM teh GROUP BY 1, 2, 3),
    scores AS (
        SELECT tf.doc_id, tf.true_lang, cents.lang,
               CAST(sum(tf.f * cents.c) AS BIGINT) AS dot
        FROM tf JOIN cents USING (dim)
        GROUP BY 1, 2, 3
    ),
    norms AS (SELECT lang, CAST(sum(c * c) AS BIGINT) AS n2 FROM cents GROUP BY 1),
    ranked AS (
        SELECT s.doc_id, s.true_lang, s.lang, s.dot, n.n2,
               row_number() OVER (PARTITION BY s.doc_id
                                  ORDER BY CAST(s.dot * s.dot AS DOUBLE) / n.n2 DESC, s.lang) AS rk
        FROM scores s JOIN norms n ON n.lang = s.lang
    )
    SELECT true_lang, lang AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM ranked WHERE rk = 1 GROUP BY 1, 2
    """,
)
def q595(spark: SparkSession, sf: str) -> DataFrame:
    """Hashing-trick nearest-centroid classifier: train tokens hash
    into 64 dimensions (portable md5), per-class centroids are raw
    integer counts, and each test doc picks the class maximizing
    dot²/‖c‖² — EVERY score an exact integer ratio compared via one
    identically-formed double divide, tie-broken on class.  The
    integer-exact third member of the classifier family (NB q549,
    markers q309); output is the confusion relation."""
    d = load_table(spark, sf, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    h = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long") % 64  # noqa: E731
    tr = (
        d.where((F.col("doc_id") % 2 == 0) & F.col("text").isNotNull())
        .select("lang", F.explode(toks).alias("tok"))
        .select("lang", h(F.col("tok")).alias("dim"))
    )
    cents = tr.groupBy("lang", "dim").agg(F.count(F.lit(1)).cast("long").alias("c"))
    te = (
        d.where((F.col("doc_id") % 2 == 1) & F.col("text").isNotNull())
        .select("doc_id", F.col("lang").alias("true_lang"),
                F.explode(F.slice(toks, 1, 24)).alias("tok"))
        .select("doc_id", "true_lang", h(F.col("tok")).alias("dim"))
    )
    tf = te.groupBy("doc_id", "true_lang", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    scores = (
        tf.join(F.broadcast(cents), "dim")
        .groupBy("doc_id", "true_lang", "lang")
        .agg(F.sum(F.col("f") * F.col("c")).cast("long").alias("dot"))
    )
    norms = cents.groupBy("lang").agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("n2"))
    ranked = scores.join(F.broadcast(norms), "lang").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc((F.col("dot") * F.col("dot")).cast("double") / F.col("n2")),
                F.col("lang"),
            )
        ),
    )
    return (
        ranked.where(F.col("rk") == 1)
        .groupBy("true_lang", F.col("lang").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


# ------------------------------------------------------------------ q596
def _q596_support_sql(edges: str) -> str:
    return f"""
        SELECT e.lo, e.hi, CAST(count(*) AS BIGINT) AS support
        FROM {edges} e
        JOIN (SELECT lo AS u, hi AS w FROM {edges}
              UNION ALL SELECT hi AS u, lo AS w FROM {edges}) adj
          ON adj.u = e.lo AND adj.w != e.hi
        JOIN {edges} y ON y.lo = least(adj.w, e.hi) AND y.hi = greatest(adj.w, e.hi)
        GROUP BY 1, 2
    """


@query(
    "q596_ktruss_peel",
    f"""
    WITH base AS (
        SELECT doc_id % 40 AS a, (doc_id * 17 + 3) % 40 AS b FROM documents
        WHERE doc_id % 40 != (doc_id * 17 + 3) % 40
        UNION ALL
        SELECT doc_id % 40, (doc_id * 11 + 5) % 40 FROM documents
        WHERE doc_id % 40 != (doc_id * 11 + 5) % 40
        UNION ALL
        SELECT doc_id % 40, (doc_id % 40 + 1) % 40 FROM documents
        UNION ALL
        SELECT doc_id % 40, (doc_id % 40 + 2) % 40 FROM documents
    ),
    e0 AS (
        SELECT DISTINCT least(a, b) AS lo, greatest(a, b) AS hi FROM base
    ),
    sup0 AS ({_q596_support_sql("e0")}),
    e1 AS (
        SELECT e0.lo, e0.hi FROM e0 JOIN sup0 USING (lo, hi) WHERE support >= 2
    ),
    sup1 AS ({_q596_support_sql("e1")}),
    e2 AS (
        SELECT e1.lo, e1.hi FROM e1 JOIN sup1 USING (lo, hi) WHERE support >= 2
    )
    SELECT CAST(0 AS BIGINT) AS round, CAST(count(*) AS BIGINT) AS n_edges FROM e0
    UNION ALL SELECT CAST(1 AS BIGINT), CAST(count(*) AS BIGINT) FROM e1
    UNION ALL SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT) FROM e2
    """,
)
def q596(spark: SparkSession, sf: str) -> DataFrame:
    """4-truss peeling, two rounds: each edge's triangle support
    counts third vertices adjacent to the edge's LOW endpoint in
    EITHER role (adjacency is the symmetrized edge list — anchoring
    on canonical lows alone misses triangles whose third vertex sits
    below the anchor), closed by the canonical edge lookup; edges
    with support < 2 peel, support recomputes on the survivors.
    Bounded rounds of exact set algebra — the community-core
    extractor."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    parts = [
        d.select((k % 40).alias("a"), ((k * mul + add) % 40).alias("b")).where(
            F.col("a") != F.col("b")
        )
        for mul, add in ((17, 3), (11, 5))
    ]
    # ring + chord edges guarantee triangles (x, x+1, x+2)
    parts.append(d.select((k % 40).alias("a"), ((k % 40 + 1) % 40).alias("b")))
    parts.append(d.select((k % 40).alias("a"), ((k % 40 + 2) % 40).alias("b")))
    base = parts[0]
    for p in parts[1:]:
        base = base.unionByName(p)
    e = base.select(
        F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
    ).distinct()

    def support(edges):
        adj = edges.select(F.col("lo").alias("u"), F.col("hi").alias("w")).unionByName(
            edges.select(F.col("hi").alias("u"), F.col("lo").alias("w"))
        )
        y = edges.select(F.col("lo").alias("ylo"), F.col("hi").alias("yhi"))
        return (
            edges.join(adj, (F.col("u") == F.col("lo")) & (F.col("w") != F.col("hi")))
            .join(
                y,
                (F.col("ylo") == F.least("w", "hi"))
                & (F.col("yhi") == F.greatest("w", "hi")),
            )
            .groupBy("lo", "hi")
            .agg(F.count(F.lit(1)).cast("long").alias("support"))
        )

    counts = [e.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).select(
        F.lit(0).cast("long").alias("round"), "n_edges")]
    cur = e
    for r in (1, 2):
        sup = support(cur)
        cur = cur.join(sup, ["lo", "hi"]).where(F.col("support") >= 2).select("lo", "hi")
        counts.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_edges")).select(
                F.lit(r).cast("long").alias("round"), "n_edges"
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


# ------------------------------------------------------------------ q597
def _q597_oracle() -> str:
    from .queries import ORACLES

    return f"""
    WITH hll AS ({ORACLES["q583_hll_error_audit"]}),
    cms AS ({ORACLES["q233_count_min"]}),
    kmv AS ({ORACLES["q241_kmv_sketch"]}),
    ex AS (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact
           FROM orders WHERE o_custkey IS NOT NULL)
    SELECT 'hll_p8_distinct' AS sketch, CAST(max(abs(err_ppm)) AS DOUBLE) AS worst_err_ppm
    FROM hll
    UNION ALL
    SELECT 'cms_4x256_freq',
           CAST(max(((est - exact) * 1000000) // greatest(exact, 1)) AS DOUBLE)
    FROM cms
    UNION ALL
    SELECT 'kmv64_distinct',
           round(abs(kmv.estimate - ex.exact) * 1000000 / ex.exact, 3)
    FROM kmv CROSS JOIN ex
    """


@query("q597_sketch_scorecard", _q597_oracle())
def q597(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-accuracy scorecard: worst observed relative error (ppm)
    for the three mergeable sketch families — HLL distinct (q583's
    per-group audit), Count-Min frequency (q233's probes; CMS error is
    one-sided so the worst OVERestimate is the metric), KMV distinct
    (q241 vs the exact count).  Both sides compose the registered
    pipelines verbatim — the governance table that says whether the
    sketch parameters are honest at this data scale."""
    from .queries import QUERIES

    hll = QUERIES["q583_hll_error_audit"](spark, sf)
    cms = QUERIES["q233_count_min"](spark, sf)
    kmv = QUERIES["q241_kmv_sketch"](spark, sf)
    o = load_table(spark, sf, "orders")
    ex = o.where(F.col("o_custkey").isNotNull()).agg(
        F.countDistinct("o_custkey").cast("long").alias("exact")
    )
    r1 = hll.agg(F.max(F.abs(F.col("err_ppm"))).cast("double").alias("worst_err_ppm")).select(
        F.lit("hll_p8_distinct").alias("sketch"), "worst_err_ppm"
    )
    r2 = cms.agg(
        F.max(
            F.expr("((est - exact) * 1000000) DIV greatest(exact, 1)")
        ).cast("double").alias("worst_err_ppm")
    ).select(F.lit("cms_4x256_freq").alias("sketch"), "worst_err_ppm")
    r3 = kmv.crossJoin(F.broadcast(ex)).select(
        F.lit("kmv64_distinct").alias("sketch"),
        F.round(
            F.abs(F.col("estimate") - F.col("exact")) * 1000000 / F.col("exact"), 3
        ).alias("worst_err_ppm"),
    )
    return r1.unionByName(r2).unionByName(r3)


# ------------------------------------------------------------------ q598
@query(
    "q598_median_of_means",
    """
    WITH f AS (
        SELECT CAST(round(value) AS BIGINT)
                 + CASE WHEN event_id % 30000 = 0 THEN 100000000 ELSE 0 END AS x,
               ('0x' || substr(md5(event_id::VARCHAR), 1, 15))::BIGINT % 8 AS g
        FROM events
    ),
    groups AS (
        SELECT g, CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
        FROM f GROUP BY 1
    ),
    means AS (
        SELECT g, s / n AS m,
               row_number() OVER (ORDER BY s / n, g) AS rk
        FROM groups
    ),
    tot AS (
        SELECT CAST(sum(s) AS BIGINT) AS st, CAST(sum(n) AS BIGINT) AS nt FROM groups
    )
    SELECT nt AS n,
           st / nt AS plain_mean,
           (max(CASE WHEN rk = 4 THEN m END) + max(CASE WHEN rk = 5 THEN m END)) / 2
             AS median_of_means
    FROM means CROSS JOIN tot
    GROUP BY nt, st
    """,
)
def q598(spark: SparkSession, sf: str) -> DataFrame:
    """Median-of-means robust location estimator: 8 portable-hash
    groups, each mean ONE exact rational, the median the midpoint of
    the 4th/5th order statistics under a (mean, group) total order —
    the heavy-tail-robust estimator: a handful of planted
    hundred-million-dollar rows poison at most their own hash groups,
    so the median holds while the plain mean is dragged thousands of
    dollars off."""
    ev = load_table(spark, sf, "events")
    x = F.round(F.col("value")).cast("long") + F.when(
        F.col("event_id") % 30000 == 0, 100000000
    ).otherwise(0)
    g = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("long") % 8
    )
    f = ev.select(x.alias("x"), g.alias("g"))
    groups = f.groupBy("g").agg(
        F.sum("x").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n")
    )
    means = groups.select(
        "g", (F.col("s") / F.col("n")).alias("m"),
        F.row_number()
        .over(Window.partitionBy().orderBy(F.col("s") / F.col("n"), F.col("g")))
        .alias("rk"),
    )
    tot = groups.agg(
        F.sum("s").cast("long").alias("st"), F.sum("n").cast("long").alias("nt")
    )
    return (
        means.crossJoin(F.broadcast(tot))
        .groupBy("nt", "st")
        .agg(
            (
                (F.max(F.when(F.col("rk") == 4, F.col("m")))
                 + F.max(F.when(F.col("rk") == 5, F.col("m")))) / 2
            ).alias("median_of_means")
        )
        .select(
            F.col("nt").alias("n"),
            (F.col("st") / F.col("nt")).alias("plain_mean"),
            "median_of_means",
        )
    )


# ------------------------------------------------------------------ q599
@query(
    "q599_poststrat_variance",
    """
    WITH f AS (
        SELECT user_id % 4 AS stratum,
               CAST(round(value) AS BIGINT) + 50 * (user_id % 4) AS y
        FROM events
    ),
    pooled AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS s,
               CAST(sum(y * y) AS BIGINT) AS q
        FROM f
    ),
    strata AS (
        SELECT stratum, CAST(count(*) AS BIGINT) AS n_h,
               CAST(sum(y) AS BIGINT) AS s_h,
               CAST(sum(y * y) AS BIGINT) AS q_h
        FROM f GROUP BY 1
    ),
    within AS (
        SELECT CAST(sum(n_h * q_h - s_h * s_h) AS BIGINT) AS w_num,
               CAST(sum(n_h) AS BIGINT) AS n2
        FROM (SELECT n_h, q_h, s_h FROM strata)
    )
    SELECT p.n,
           (CAST(p.n * p.q - p.s * p.s AS DOUBLE)) / (CAST(p.n AS DOUBLE) * p.n * p.n)
             AS pooled_se2,
           (CAST(w.w_num AS DOUBLE)) / (CAST(p.n AS DOUBLE) * p.n * p.n) AS strat_se2,
           CAST(floor(CAST((p.n * p.q - p.s * p.s) - w.w_num AS DOUBLE) * 1000000
                / CAST(p.n * p.q - p.s * p.s AS DOUBLE)) AS BIGINT) AS var_reduction_ppm
    FROM pooled p CROSS JOIN within w
    """,
)
def q599(spark: SparkSession, sf: str) -> DataFrame:
    """Post-stratification variance-reduction audit for experiments:
    pooled vs within-stratum variance of the outcome from exact
    integer power sums (n_h·Q_h − S_h² per stratum sums EXACTLY —
    integer, not float), reduction in integer ppm — quantifies how
    much a stratified estimator would shrink the CI before anyone
    runs the test.  The planted +50·stratum shift makes strata
    explain real variance."""
    ev = load_table(spark, sf, "events")
    f = ev.select(
        (F.col("user_id") % 4).alias("stratum"),
        (F.round(F.col("value")).cast("long") + 50 * (F.col("user_id") % 4)).alias("y"),
    )
    pooled = f.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("q"),
    )
    strata = f.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("y").cast("long").alias("s_h"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("q_h"),
    )
    within = strata.agg(
        F.sum(F.col("n_h") * F.col("q_h") - F.col("s_h") * F.col("s_h"))
        .cast("long")
        .alias("w_num"),
        F.sum("n_h").cast("long").alias("n2"),
    )
    j = pooled.crossJoin(F.broadcast(within))
    tot = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return j.select(
        "n",
        (tot.cast("double") / (F.col("n").cast("double") * F.col("n") * F.col("n"))).alias("pooled_se2"),
        (F.col("w_num").cast("double") / (F.col("n").cast("double") * F.col("n") * F.col("n"))).alias("strat_se2"),
        # the diff·1e6 cross-mult overflows int64 at sf0.1 — floor the
        # identical double ratio instead (operands < 2^53, exact)
        F.expr(
            "CAST(floor(CAST((n * q - s * s) - w_num AS DOUBLE) * 1000000"
            " / CAST(n * q - s * s AS DOUBLE)) AS BIGINT)"
        ).alias("var_reduction_ppm"),
    )


# ------------------------------------------------------------------ q600
def _q600_oracle() -> str:
    from .queries import ORACLES

    return f"""
    WITH sk AS ({ORACLES["q597_sketch_scorecard"]}),
    lsh AS ({ORACLES["q570_lsh_calibration"]}),
    ens AS ({ORACLES["q589_classifier_ensemble"]})
    SELECT 'sketch:' || sketch AS component, worst_err_ppm AS value FROM sk
    UNION ALL
    SELECT 'lsh:recall_high_jaccard_ppm',
           CAST((sum(CASE WHEN is_candidate THEN 1 ELSE 0 END) * 1000000)
                // greatest(count(*), 1) AS DOUBLE)
    FROM lsh WHERE s_jac >= CAST('0.9' AS DOUBLE)
    UNION ALL
    SELECT 'lsh:false_candidate_ppm',
           CAST((sum(CASE WHEN is_candidate THEN 1 ELSE 0 END) * 1000000)
                // greatest(count(*), 1) AS DOUBLE)
    FROM lsh WHERE s_jac < CAST('0.3' AS DOUBLE)
    UNION ALL
    SELECT 'classifier:best_accuracy_ppm', CAST(max(accuracy_ppm) AS DOUBLE) FROM ens
    """


@query("q600_engine_self_audit", _q600_oracle())
def q600(spark: SparkSession, sf: str) -> DataFrame:
    """QUERY 600 — the engine self-audit scorecard: one relation that
    composes the registered sketch-accuracy scorecard (q597), the LSH
    banding calibration (q570: recall on near-duplicates and the
    false-candidate rate on far pairs) and the classifier ensemble
    (q589: best accuracy) — every number produced AND oracle-replayed
    by pipelines this engine itself registered.  The meta-claim of the
    whole registry: the engine can measure its own approximations
    exactly."""
    from .queries import QUERIES

    sk = QUERIES["q597_sketch_scorecard"](spark, sf)
    lsh = QUERIES["q570_lsh_calibration"](spark, sf)
    ens = QUERIES["q589_classifier_ensemble"](spark, sf)
    r1 = sk.select(
        F.concat(F.lit("sketch:"), F.col("sketch")).alias("component"),
        F.col("worst_err_ppm").alias("value"),
    )

    def _rate(df, name):
        return df.agg(
            F.sum(F.when(F.col("is_candidate"), 1).otherwise(0)).alias("c"),
            F.count(F.lit(1)).alias("n"),
        ).select(
            F.lit(name).alias("component"),
            F.expr("CAST((c * 1000000) DIV greatest(n, 1) AS DOUBLE)").alias("value"),
        )

    r2 = _rate(lsh.where(F.col("s_jac") >= 0.9), "lsh:recall_high_jaccard_ppm")
    r3 = _rate(lsh.where(F.col("s_jac") < 0.3), "lsh:false_candidate_ppm")
    r4 = ens.agg(F.max("accuracy_ppm").cast("double").alias("value")).select(
        F.lit("classifier:best_accuracy_ppm").alias("component"), "value"
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)


# ------------------------------------------------------------------ q601
_Q601_EDGES_SQL = """
        SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM (
            SELECT doc_id % 30 AS a, (doc_id * 7 + 2) % 30 AS b FROM documents
            WHERE doc_id % 30 != (doc_id * 7 + 2) % 30
            UNION ALL
            SELECT doc_id % 30, (doc_id % 30 + 1) % 30 FROM documents
        )
"""


@query(
    "q601_graph_distances",
    f"""
    WITH RECURSIVE e AS ({_Q601_EDGES_SQL}),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    walk AS (
        SELECT u, v, 1 AS d FROM sym
        UNION
        SELECT w.u, s.v, w.d + 1
        FROM walk w JOIN sym s ON w.v = s.u
        WHERE w.d < 30 AND w.u != s.v
    ),
    dist AS (SELECT u, v, CAST(min(d) AS BIGINT) AS d FROM walk GROUP BY 1, 2)
    SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_nodes,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(max(d) AS BIGINT) AS diameter,
           (CAST(sum(d) AS BIGINT) * 1000000) // count(*) AS avg_dist_ppm
    FROM dist
    """,
)
def q601(spark: SparkSession, sf: str) -> DataFrame:
    """Exact all-pairs shortest-path summary on a 30-node undirected
    graph: min-plus DOUBLING (5 rounds cover 32 hops — each round one
    equi-join + min-agg, the log-depth APSP for bounded graphs) vs the
    oracle's hop-bounded recursive walk; diameter and mean distance in
    exact integers.  The small-graph exact path — web-scale swaps in
    landmark/HyperANF approximations."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    base = d.select((k % 30).alias("a"), ((k * 7 + 2) % 30).alias("b")).where(
        F.col("a") != F.col("b")
    ).unionByName(d.select((k % 30).alias("a"), ((k % 30) + 1) % 30).toDF("a", "b"))
    e = base.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")).distinct()
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    cur = sym.select("u", "v", F.lit(1).alias("d"))
    for _ in range(5):  # doubling: paths up to 2^5 = 32 > 30
        right = cur.select(F.col("u").alias("m"), F.col("v").alias("w"), F.col("d").alias("d2"))
        step = (
            cur.join(right, cur["v"] == right["m"])
            .where(F.col("u") != F.col("w"))
            .select("u", F.col("w").alias("v"), (F.col("d") + F.col("d2")).alias("d"))
        )
        cur = (
            cur.unionByName(step)
            .groupBy("u", "v")
            .agg(F.min("d").alias("d"))
            .persist()
        )
    return cur.agg(
        F.countDistinct("u").cast("long").alias("n_nodes"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.max("d").cast("long").alias("diameter"),
        F.expr("(CAST(sum(d) AS BIGINT) * 1000000) DIV count(*)").alias("avg_dist_ppm"),
    )


# ------------------------------------------------------------------ q602
@query(
    "q602_harmonic_centrality",
    f"""
    WITH RECURSIVE e AS ({_Q601_EDGES_SQL}),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    walk AS (
        SELECT u, v, 1 AS d FROM sym
        UNION
        SELECT w.u, s.v, w.d + 1
        FROM walk w JOIN sym s ON w.v = s.u
        WHERE w.d < 30 AND w.u != s.v
    ),
    dist AS (SELECT u, v, CAST(min(d) AS BIGINT) AS d FROM walk GROUP BY 1, 2)
    SELECT u AS node,
           CAST(count(*) AS BIGINT) AS n_reachable,
           list_reduce([CAST(0.0 AS DOUBLE)] || list(CAST(1 AS BIGINT) / d ORDER BY v),
                       (a, b) -> a + b) AS harmonic
    FROM dist GROUP BY 1
    """,
)
def q602(spark: SparkSession, sf: str) -> DataFrame:
    """Harmonic centrality per node — Σ 1/d(u,v) over reachable peers,
    the disconnected-graph-safe closeness: reuses q601's exact
    min-plus distances, each reciprocal ONE integer divide, the
    per-node sum a PEER-ORDERED LEFT FOLD.  The influence ranking for
    the link graph."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    base = d.select((k % 30).alias("a"), ((k * 7 + 2) % 30).alias("b")).where(
        F.col("a") != F.col("b")
    ).unionByName(d.select((k % 30).alias("a"), ((k % 30) + 1) % 30).toDF("a", "b"))
    e = base.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")).distinct()
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    cur = sym.select("u", "v", F.lit(1).alias("d"))
    for _ in range(5):
        right = cur.select(F.col("u").alias("m"), F.col("v").alias("w"), F.col("d").alias("d2"))
        step = (
            cur.join(right, cur["v"] == right["m"])
            .where(F.col("u") != F.col("w"))
            .select("u", F.col("w").alias("v"), (F.col("d") + F.col("d2")).alias("d"))
        )
        cur = cur.unionByName(step).groupBy("u", "v").agg(F.min("d").alias("d")).persist()
    return cur.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("n_reachable"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("v"), (F.lit(1).cast("long") / F.col("d")).alias("t")))
                ),
                lambda s: s.getField("t"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("harmonic"),
    )


# ------------------------------------------------------------------ q603
@query(
    "q603_hyperanf",
    f"""
    WITH e AS ({_Q601_EDGES_SQL}),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    h AS (
        SELECT u AS node,
               ('0x' || substr(md5(u::VARCHAR), 1, 15))::BIGINT AS hv
        FROM (SELECT DISTINCT u FROM sym)
    ),
    r0 AS (
        SELECT node, CAST(hv >> 52 AS INT) AS bucket,
               CAST(CASE WHEN (hv & ((1::BIGINT << 52) - 1)) = 0 THEN 53
                    ELSE 52 - length(bin(hv & ((1::BIGINT << 52) - 1))) + 1 END AS INT) AS rho
        FROM h
    ),
    r1 AS (
        SELECT node, bucket, max(rho) AS rho FROM (
            SELECT s.u AS node, r.bucket, r.rho FROM sym s JOIN r0 r ON r.node = s.v
            UNION ALL SELECT node, bucket, rho FROM r0
        ) GROUP BY 1, 2
    ),
    r2 AS (
        SELECT node, bucket, max(rho) AS rho FROM (
            SELECT s.u AS node, r.bucket, r.rho FROM sym s JOIN r1 r ON r.node = s.v
            UNION ALL SELECT node, bucket, rho FROM r1
        ) GROUP BY 1, 2
    ),
    est AS (
        SELECT 'r1' AS radius, node, count(*) AS used,
               sum((1::BIGINT << (53 - rho))) AS s
        FROM r1 GROUP BY 2
        UNION ALL
        SELECT 'r2', node, count(*), sum((1::BIGINT << (53 - rho)))
        FROM r2 GROUP BY 2
    )
    SELECT radius,
           CAST(sum(used) AS BIGINT) AS total_buckets_used,
           round(list_reduce([CAST(0.0 AS DOUBLE)] || list(
               CASE WHEN {4.2399330249068963e+20} / ((s + (256 - used) * (1::BIGINT << 53)))::DOUBLE <= 640.0
                         AND (256 - used) > 0
                    THEN 256.0 * ln(256.0 / (256 - used))
                    ELSE {4.2399330249068963e+20} / ((s + (256 - used) * (1::BIGINT << 53)))::DOUBLE
               END ORDER BY node), (a, b) -> a + b), 6) AS sum_neighborhood
    FROM est GROUP BY 1
    """,
)
def q603(spark: SparkSession, sf: str) -> DataFrame:
    """HyperANF (Boldi et al.) — the neighborhood function N(r) at
    graph scale: every node carries an HLL register set of its
    r-ball; one round = join registers across edges + per-(node,
    bucket) MAX (registers are mergeable, so the frontier never
    materializes).  Two rounds on the 30-node graph, per-node ball
    estimates summed in a NODE-ORDERED FOLD — this is the scale path
    whose exact sibling is q601's min-plus distances."""
    from .queries10 import _HLL_A
    from .operators.sketch import hll_registers_by

    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    base = d.select((k % 30).alias("a"), ((k * 7 + 2) % 30).alias("b")).where(
        F.col("a") != F.col("b")
    ).unionByName(d.select((k % 30).alias("a"), ((k % 30) + 1) % 30).toDF("a", "b"))
    e = base.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")).distinct()
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    nodes = sym.select("u").distinct()
    r0 = hll_registers_by(
        nodes.select("u", F.col("u").alias("member")), ["u"], "member", p=8, hash_kind="md5"
    ).withColumnRenamed("u", "node")
    regs = r0
    ests = []
    for rname in ("r1", "r2"):
        via = (
            sym.join(regs, regs["node"] == sym["v"])
            .select(sym["u"].alias("node"), "bucket", "rho")
        )
        regs = (
            via.unionByName(regs.select("node", "bucket", "rho"))
            .groupBy("node", "bucket")
            .agg(F.max("rho").alias("rho"))
            .persist()
        )
        agg = regs.groupBy("node").agg(
            F.count(F.lit(1)).alias("used"),
            F.sum(F.expr("CAST(shiftleft(1L, 53 - rho) AS BIGINT)")).alias("s"),
        )
        a = float(_HLL_A)
        raw = F.lit(a) / (
            (F.col("s") + (F.lit(256) - F.col("used")) * F.lit(1 << 53)).cast("double")
        )
        v = F.lit(256) - F.col("used")
        est = F.when(
            (raw <= 640.0) & (v > 0), F.lit(256.0) * F.log(F.lit(256.0) / v)
        ).otherwise(raw)
        ests.append(
            agg.select(F.lit(rname).alias("radius"), "node", "used", est.alias("est"))
        )
    u = ests[0].unionByName(ests[1])
    return u.groupBy("radius").agg(
        F.sum("used").cast("long").alias("total_buckets_used"),
        F.round(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("node"), F.col("est").alias("t")))),
                    lambda s: s.getField("t"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sum_neighborhood"),
    )


# ------------------------------------------------------------------ q604
@query(
    "q604_bipartite_check",
    f"""
    WITH RECURSIVE e AS ({_Q601_EDGES_SQL}),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    walk AS (
        SELECT u, v, 1 AS d FROM sym
        UNION
        SELECT w.u, s.v, w.d + 1
        FROM walk w JOIN sym s ON w.v = s.u
        WHERE w.d < 30 AND w.u != s.v
    ),
    dist AS (SELECT u, v, CAST(min(d) AS BIGINT) AS d FROM walk GROUP BY 1, 2),
    comp AS (
        SELECT v AS node, min(u) AS root FROM (
            SELECT u, v FROM dist UNION SELECT u, u FROM dist
        ) GROUP BY 1
    ),
    lvl AS (
        SELECT c.node, c.root,
               CASE WHEN c.node = c.root THEN 0 ELSE d.d END % 2 AS side
        FROM comp c LEFT JOIN dist d ON d.u = c.root AND d.v = c.node
    ),
    odd AS (
        SELECT CAST(count(*) AS BIGINT) AS n_odd_edges
        FROM e JOIN lvl a ON a.node = e.u JOIN lvl b ON b.node = e.v
        WHERE a.side = b.side
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           n_odd_edges, n_odd_edges = 0 AS is_bipartite
    FROM odd
    """,
)
def q604(spark: SparkSession, sf: str) -> DataFrame:
    """Bipartite test via BFS level parity: each node's side is its
    exact shortest-path distance (q601's min-plus doubling) from its
    component's min-id root, mod 2; the graph is two-colorable iff NO
    edge joins same-side endpoints (each same-side edge witnesses an
    odd cycle).  Exact set algebra end to end."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    base = d.select((k % 30).alias("a"), ((k * 7 + 2) % 30).alias("b")).where(
        F.col("a") != F.col("b")
    ).unionByName(d.select((k % 30).alias("a"), ((k % 30) + 1) % 30).toDF("a", "b"))
    e = base.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")).distinct()
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    cur = sym.select("u", "v", F.lit(1).alias("d"))
    for _ in range(5):
        right = cur.select(F.col("u").alias("m"), F.col("v").alias("w"), F.col("d").alias("d2"))
        step = (
            cur.join(right, cur["v"] == right["m"])
            .where(F.col("u") != F.col("w"))
            .select("u", F.col("w").alias("v"), (F.col("d") + F.col("d2")).alias("d"))
        )
        cur = cur.unionByName(step).groupBy("u", "v").agg(F.min("d").alias("d")).persist()
    pairs = cur.select("u", "v").unionByName(cur.select(F.col("u").alias("u"), F.col("u").alias("v")))
    comp = pairs.groupBy(F.col("v").alias("node")).agg(F.min("u").alias("root"))
    lvl = comp.join(
        cur.select(F.col("u").alias("root"), F.col("v").alias("node"), "d"),
        ["root", "node"], "left",
    ).select(
        "node", "root",
        (F.when(F.col("node") == F.col("root"), 0).otherwise(F.col("d")) % 2).alias("side"),
    )
    la = lvl.select(F.col("node").alias("u"), F.col("side").alias("sa"))
    lb = lvl.select(F.col("node").alias("v"), F.col("side").alias("sb"))
    odd = (
        e.join(la, "u").join(lb, "v")
        .where(F.col("sa") == F.col("sb"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_odd_edges"))
    )
    ne = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return ne.crossJoin(odd).select(
        "n_edges", "n_odd_edges", (F.col("n_odd_edges") == 0).alias("is_bipartite")
    )


# ------------------------------------------------------------------ q605
@query(
    "q605_percolation",
    """
    WITH RECURSIVE e AS (
        SELECT DISTINCT least(doc_id % 31, (doc_id * 12 + 5) % 31) AS u,
               greatest(doc_id % 31, (doc_id * 12 + 5) % 31) AS v
        FROM documents WHERE doc_id % 31 != (doc_id * 12 + 5) % 31
    ),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY 1),
    hubs AS (
        SELECT node FROM (
            SELECT node, row_number() OVER (ORDER BY degree DESC, node) AS rk FROM deg
        ) WHERE rk <= 2
    ),
    sym2 AS (
        SELECT s.u, s.v FROM sym s
        WHERE s.u NOT IN (SELECT node FROM hubs) AND s.v NOT IN (SELECT node FROM hubs)
    ),
    full_walk AS (
        SELECT u, v FROM sym
        UNION
        SELECT w.u, s.v FROM full_walk w JOIN sym s ON w.v = s.u WHERE w.u != s.v
    ),
    full_comp AS (
        SELECT node, min(peer) AS component FROM (
            SELECT u AS node, v AS peer FROM full_walk UNION ALL SELECT u, u FROM sym
        ) GROUP BY 1
    ),
    cut_walk AS (
        SELECT u, v FROM sym2
        UNION
        SELECT w.u, s.v FROM cut_walk w JOIN sym2 s ON w.v = s.u WHERE w.u != s.v
    ),
    cut_comp AS (
        SELECT node, min(peer) AS component FROM (
            SELECT u AS node, v AS peer FROM cut_walk UNION ALL SELECT u, u FROM sym2
        ) GROUP BY 1
    )
    SELECT 'full' AS variant,
           (SELECT CAST(count(*) AS BIGINT) FROM full_comp) AS n_nodes,
           (SELECT CAST(max(c) AS BIGINT)
            FROM (SELECT count(*) AS c FROM full_comp GROUP BY component)) AS largest_cc
    UNION ALL
    SELECT 'hubs_removed',
           (SELECT CAST(count(*) AS BIGINT) FROM cut_comp),
           (SELECT CAST(max(c) AS BIGINT)
            FROM (SELECT count(*) AS c FROM cut_comp GROUP BY component))
    """,
)
def q605(spark: SparkSession, sf: str) -> DataFrame:
    """Percolation robustness: largest connected component before and
    after removing the top-2 degree hubs (operators/dedup.
    connected_components on both graphs) — the attack-surface metric
    for link/identity graphs; exact set algebra, recursive-CTE
    replay."""
    from .operators.dedup import connected_components

    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    base = d.select((k % 31).alias("a"), ((k * 12 + 5) % 31).alias("b")).where(
        F.col("a") != F.col("b")
    )
    e = base.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")).distinct()
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    deg = sym.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
    hubs = (
        deg.withColumn(
            "rk", F.row_number().over(Window.partitionBy().orderBy(F.desc("degree"), "node"))
        )
        .where(F.col("rk") <= 2)
        .select("node")
    )
    ha = hubs.select(F.col("node").alias("u"))
    hb = hubs.select(F.col("node").alias("v"))
    sym2 = sym.join(ha, "u", "left_anti").join(hb, "v", "left_anti")

    def summary(edges, name):
        # pruned permutation graphs leave long paths: diameter can exceed
        # the default 20 label-propagation rounds, so raise the budget
        cc = connected_components(
            edges.select(F.col("u").alias("id_a"), F.col("v").alias("id_b")), max_iter=40
        )
        node_col, comp_col = cc.columns[0], cc.columns[1]
        sizes = cc.groupBy(comp_col).agg(F.count(F.lit(1)).alias("c"))
        return sizes.agg(
            F.sum("c").cast("long").alias("n_nodes"),
            F.max("c").cast("long").alias("largest_cc"),
        ).select(F.lit(name).alias("variant"), "n_nodes", "largest_cc")

    return summary(sym, "full").unionByName(summary(sym2, "hubs_removed"))


# ------------------------------------------------------------------ q606
@query(
    "q606_script_mix_audit",
    """
    WITH seeded AS (
        SELECT lang,
               text || CASE WHEN lang = 'zh' THEN ' 中文内容样本' ELSE '' END AS t
        FROM documents WHERE text IS NOT NULL
    ),
    f AS (
        SELECT lang,
               CAST(len(regexp_extract_all(t, '[a-zA-Z]')) AS BIGINT) AS latin_chars,
               CAST(len(regexp_extract_all(t, '[\\x{4e00}-\\x{9fff}]')) AS BIGINT) AS cjk_chars,
               CAST(length(t) AS BIGINT) AS total_chars
        FROM seeded
    )
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(latin_chars) AS BIGINT) AS latin_chars,
           CAST(sum(cjk_chars) AS BIGINT) AS cjk_chars,
           CAST(sum(CASE WHEN latin_chars > 0 AND cjk_chars > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_mixed,
           (CAST(sum(cjk_chars) AS BIGINT) * 1000000)
             // greatest(CAST(sum(total_chars) AS BIGINT), 1) AS cjk_ppm
    FROM f GROUP BY 1
    """,
)
def q606(spark: SparkSession, sf: str) -> DataFrame:
    """Script-mix corpus audit per language label: Latin vs CJK
    character mass (explicit \\u4e00-\\u9fff range — Java and RE2 name
    unicode classes differently, the raw range is the portable form),
    mixed-script doc counts, CJK share in integer ppm — the
    multilingual-curation hygiene check (the synthetic corpus is all-Latin, so the
    zh docs carry a deterministic planted CJK suffix on BOTH sides to
    exercise the counters)."""
    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    t = F.concat(
        F.col("text"),
        F.when(F.col("lang") == "zh", F.lit(" 中文内容样本")).otherwise(F.lit("")),
    )
    seeded = d.select("lang", t.alias("t"))
    latin = F.expr("CAST(regexp_count(t, '[a-zA-Z]') AS BIGINT)")
    cjk = F.expr("CAST(regexp_count(t, '[\\\\x{4e00}-\\\\x{9fff}]') AS BIGINT)")
    f = seeded.select(
        "lang",
        latin.alias("latin_chars"),
        cjk.alias("cjk_chars"),
        F.length("t").cast("long").alias("total_chars"),
    )
    return f.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("latin_chars").cast("long").alias("latin_chars"),
        F.sum("cjk_chars").cast("long").alias("cjk_chars"),
        F.sum(F.when((F.col("latin_chars") > 0) & (F.col("cjk_chars") > 0), 1).otherwise(0))
        .cast("long")
        .alias("n_mixed"),
        F.expr(
            "(CAST(sum(cjk_chars) AS BIGINT) * 1000000)"
            " DIV greatest(CAST(sum(total_chars) AS BIGINT), 1)"
        ).alias("cjk_ppm"),
    )


# ------------------------------------------------------------------ q607
_Q607_FKS = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _q607_oracle() -> str:
    picks = []
    for name, child, ck, parent, pk in _Q607_FKS:
        picks.append(
            f"SELECT '{name}' AS fk,\n"
            f"       (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS n_child,\n"
            f"       (SELECT CAST(count(*) AS BIGINT) FROM {child} c\n"
            f"        WHERE c.{ck} IS NOT NULL AND NOT EXISTS\n"
            f"          (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})) AS n_orphans"
        )
    body = "\nUNION ALL\n".join(picks)
    return f"SELECT fk, n_child, n_orphans, n_orphans = 0 AS intact FROM ({body})"


@query("q607_ri_audit", _q607_oracle())
def q607(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit across every foreign key of the
    star schema in one relation: each FK is ONE anti-join count
    (broadcast the parent keys — the dim side is always the small
    side), orphan counts exact — the data-contract sweep a warehouse
    runs after every load."""
    outs = []
    for name, child, ck, parent, pk in _Q607_FKS:
        c = load_table(spark, sf, child)
        p = load_table(spark, sf, parent).select(F.col(pk).alias("__pk__"))
        n_child = c.count()
        orphans = (
            c.where(F.col(ck).isNotNull())
            .join(F.broadcast(p), F.col(ck) == F.col("__pk__"), "left_anti")
            .count()
        )
        outs.append((name, int(n_child), int(orphans)))
    rows = [(n, c_, o, o == 0) for n, c_, o in outs]
    return spark.createDataFrame(rows, "fk string, n_child bigint, n_orphans bigint, intact boolean")


# ------------------------------------------------------------------ q608
@query(
    "q608_watermark_advisor",
    """
    WITH seq AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               epoch_us(ts) + ((event_id * 37) % 172800 - 86400) * 1000000 AS ak
        FROM events
    ),
    runm AS (
        SELECT user_id, us,
               max(us) OVER (PARTITION BY user_id ORDER BY ak, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen
        FROM seq
    ),
    late AS (
        SELECT greatest(seen - us, 0) AS late_us
        FROM runm WHERE seen IS NOT NULL
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS n_arrivals,
               CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
        FROM late
    ),
    hist AS (SELECT late_us, CAST(count(*) AS BIGINT) AS c FROM late GROUP BY 1),
    cum AS (
        SELECT late_us,
               CAST(sum(c) OVER (ORDER BY late_us
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cc,
               CAST(sum(c) OVER () AS BIGINT) AS n
        FROM hist
    ),
    p99 AS (
        SELECT CAST(min(late_us) AS BIGINT) AS p99_late_us
        FROM cum WHERE cc >= (99 * n + 99) // 100
    )
    SELECT a.n_arrivals, a.n_late,
           (a.n_late * 1000000) // a.n_arrivals AS late_ppm,
           p.p99_late_us,
           (p.p99_late_us + 999999) // 1000000 AS recommended_watermark_s
    FROM agg a CROSS JOIN p99 p
    """,
)
def q608(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark-sizing advisor for streaming ingest: arrival order is a
    deterministically jittered clock (±1 day from event time — the
    shuffle a real transport inflicts), lateness = how far an event's
    event time sits BEHIND the max already-arrived event time per
    user (an exact integer running max — fold-safe), late fraction in ppm, the p99 lateness by ⌈99n/100⌉ rank
    selection, and the ceil-seconds watermark that would admit 99% of
    late data.  The relation withWatermark() should be configured
    from."""
    ev = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "user_id", "event_id", us.alias("us"),
        (us + ((F.col("event_id") * 37) % 172800 - 86400) * 1000000).alias("ak"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ak", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runm = seq.select("user_id", "us", F.max("us").over(w).alias("seen"))
    late = runm.where(F.col("seen").isNotNull()).select(
        F.greatest(F.col("seen") - F.col("us"), F.lit(0).cast("long")).alias("late_us")
    )
    agg = late.agg(
        F.count(F.lit(1)).cast("long").alias("n_arrivals"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0)).cast("long").alias("n_late"),
    )
    # p99 by rank over the VALUE histogram (bounded, aggregated input) —
    # ranking raw arrivals globally is the single-task bottleneck lint
    # rightly flags
    hist = late.groupBy("late_us").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wcum = Window.partitionBy().orderBy("late_us").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "late_us",
        F.sum("c").over(wcum).cast("long").alias("cc"),
        F.sum("c").over(Window.partitionBy()).cast("long").alias("n"),
    )
    p99 = cum.where(F.col("cc") >= F.expr("(99 * n + 99) DIV 100")).agg(
        F.min("late_us").cast("long").alias("p99_late_us")
    )
    return agg.crossJoin(F.broadcast(p99)).select(
        "n_arrivals", "n_late",
        F.expr("(n_late * 1000000) DIV n_arrivals").alias("late_ppm"),
        "p99_late_us",
        F.expr("(p99_late_us + 999999) DIV 1000000").alias("recommended_watermark_s"),
    )


# ------------------------------------------------------------------ q609
@query(
    "q609_dedup_savings",
    r"""
    WITH d AS (
        SELECT source, doc_id, n_chars,
               regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents WHERE text IS NOT NULL
    ),
    keep AS (
        SELECT source, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rk
            FROM d
        ) WHERE rk = 1
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS bytes_raw,
           CAST(count(k.doc_id) AS BIGINT) AS n_kept,
           CAST(coalesce(sum(k2.n_chars), 0) AS BIGINT) AS bytes_kept,
           ((CAST(sum(d.n_chars) AS BIGINT) - CAST(coalesce(sum(k2.n_chars), 0) AS BIGINT))
              * 1000000) // greatest(CAST(sum(d.n_chars) AS BIGINT), 1) AS savings_ppm
    FROM d
    LEFT JOIN keep k ON k.doc_id = d.doc_id
    LEFT JOIN keep k2 ON k2.doc_id = d.doc_id
    GROUP BY 1
    """,
)
def q609(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup storage-savings report per source: exact dedup keeps the
    min-id doc per normalized text (the dedup_exact rule), bytes
    before/after and savings in integer ppm — the ROI line a curation
    run reports before anyone green-lights the near-dup pass."""
    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    base = d.select("source", "doc_id", "n_chars", norm.alias("norm"))
    keep = (
        base.withColumn(
            "rk", F.row_number().over(Window.partitionBy("norm").orderBy("doc_id"))
        )
        .where(F.col("rk") == 1)
        .select(F.col("doc_id").alias("kid"), F.col("n_chars").alias("kchars"))
    )
    j = base.join(keep, base["doc_id"] == keep["kid"], "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("bytes_raw"),
        F.count("kid").cast("long").alias("n_kept"),
        F.coalesce(F.sum("kchars"), F.lit(0)).cast("long").alias("bytes_kept"),
    ).select(
        "source", "n_docs", "bytes_raw", "n_kept", "bytes_kept",
        F.expr(
            "((bytes_raw - bytes_kept) * 1000000) DIV greatest(bytes_raw, 1)"
        ).alias("savings_ppm"),
    )


# ------------------------------------------------------------------ q610
@query(
    "q610_reciprocal_best_match",
    r"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        FROM documents WHERE doc_id < 200 AND text IS NOT NULL
    ),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    capped AS (SELECT tf.* FROM tf JOIN dfreq USING (tok) WHERE dfreq.df <= 50),
    dots AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, CAST(sum(a.c * b.c) AS BIGINT) AS dot
        FROM capped a JOIN capped b ON a.tok = b.tok AND a.doc_id != b.doc_id
        GROUP BY 1, 2
    ),
    best AS (
        SELECT ia, ib, dot FROM (
            SELECT ia, ib, dot,
                   row_number() OVER (PARTITION BY ia ORDER BY dot DESC, ib) AS rk
            FROM dots
        ) WHERE rk = 1
    )
    SELECT a.ia AS doc_a, a.ib AS doc_b, a.dot
    FROM best a JOIN best b ON a.ib = b.ia AND b.ib = a.ia
    WHERE a.ia < a.ib
    """,
)
def q610(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal best match entity linking: each doc's single best
    sparse-dot neighbor (inverted-index join, df-capped, tie-broken on
    id), kept only when the choice is MUTUAL — the high-precision
    pairing rule record linkage uses before any threshold tuning."""
    d = (
        load_table(spark, sf, "documents")
        .where((F.col("doc_id") < 200) & F.col("text").isNotNull())
    )
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    capped = tf.join(dfreq, "tok").where(F.col("df") <= 50).select("doc_id", "tok", "c")
    a = capped.select(F.col("doc_id").alias("ia"), "tok", F.col("c").alias("ca"))
    b = capped.select(F.col("doc_id").alias("ib"), "tok", F.col("c").alias("cb"))
    dots = (
        a.join(b, "tok")
        .where(F.col("ia") != F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("dot"))
    )
    best = (
        dots.withColumn(
            "rk", F.row_number().over(Window.partitionBy("ia").orderBy(F.desc("dot"), "ib"))
        )
        .where(F.col("rk") == 1)
        .select("ia", "ib", "dot")
    )
    rev = best.select(F.col("ia").alias("ib"), F.col("ib").alias("ia"))
    return (
        best.join(rev, ["ia", "ib"])
        .where(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("doc_a"), F.col("ib").alias("doc_b"), "dot")
    )


# ------------------------------------------------------------------ q611
@query(
    "q611_critical_path",
    """
    WITH RECURSIVE tasks AS (
        SELECT DISTINCT doc_id % 25 AS task,
               (doc_id % 25) * 13 % 47 + 1 AS dur
        FROM documents
    ),
    e AS (
        SELECT DISTINCT t.task AS u, (t.task * 7 + 3) % 25 AS v
        FROM tasks t WHERE t.task < (t.task * 7 + 3) % 25
        UNION
        SELECT DISTINCT t.task, t.task + 1 FROM tasks t WHERE t.task + 1 < 25
    ),
    wd AS (
        SELECT e.u, e.v, td.dur AS w FROM e JOIN tasks td ON td.task = e.u
    ),
    walk AS (
        SELECT u, v, w AS len FROM wd
        UNION
        SELECT wk.u, s.v, wk.len + s.w
        FROM walk wk JOIN wd s ON wk.v = s.u
    ),
    lp AS (SELECT u, v, CAST(max(len) AS BIGINT) AS longest FROM walk GROUP BY 1, 2),
    fin AS (SELECT DISTINCT v AS task FROM e WHERE v NOT IN (SELECT u FROM e)),
    ends AS (
        SELECT lp.u, lp.v, lp.longest + td.dur AS total
        FROM lp JOIN fin ON fin.task = lp.v JOIN tasks td ON td.task = lp.v
    )
    SELECT CAST(max(total) AS BIGINT) AS critical_path_len,
           CAST(min(u) FILTER (WHERE total = (SELECT max(total) FROM ends)) AS BIGINT)
             AS start_task,
           CAST(min(v) FILTER (WHERE total = (SELECT max(total) FROM ends)) AS BIGINT)
             AS end_task
    FROM ends
    """,
)
def q611(spark: SparkSession, sf: str) -> DataFrame:
    """Critical path of a task DAG (project-scheduling / pipeline-DAG
    analytics): edges always point to HIGHER task ids (acyclic by
    construction), weights are source-task durations, and the longest
    path is MAX-PLUS doubling — the mirror of q601's min-plus APSP (5
    rounds cover the 25-deep DAG); terminal tasks add their own
    duration.  Exact integers, recursive-CTE replay, deterministic
    argmax endpoints."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    tasks = d.select(
        (k % 25).alias("task"), ((k % 25) * 13 % 47 + 1).alias("dur")
    ).distinct()
    e1 = tasks.select(
        F.col("task").alias("u"), ((F.col("task") * 7 + 3) % 25).alias("v")
    ).where(F.col("u") < F.col("v"))
    e2 = tasks.select(F.col("task").alias("u"), (F.col("task") + 1).alias("v")).where(
        F.col("v") < 25
    )
    e = e1.unionByName(e2).distinct()
    wd = e.join(tasks.withColumnRenamed("task", "u"), "u").select(
        "u", "v", F.col("dur").alias("w")
    )
    cur = wd.select("u", "v", F.col("w").alias("len"))
    for _ in range(5):  # doubling: path length up to 32 > 25 hops
        right = cur.select(
            F.col("u").alias("m"), F.col("v").alias("w2"), F.col("len").alias("l2")
        )
        step = cur.join(right, cur["v"] == right["m"]).select(
            "u", F.col("w2").alias("v"), (F.col("len") + F.col("l2")).alias("len")
        )
        cur = cur.unionByName(step).groupBy("u", "v").agg(F.max("len").alias("len")).persist()
    fin = e.select(F.col("v").alias("task")).exceptAll(
        e.select(F.col("u").alias("task"))
    ).distinct()
    ends = (
        cur.join(fin, cur["v"] == fin["task"])
        .join(tasks.select(F.col("task").alias("v"), "dur"), "v")
        .select("u", "v", (F.col("len") + F.col("dur")).alias("total"))
    )
    best = ends.agg(F.max("total").alias("mt"))
    return (
        ends.crossJoin(F.broadcast(best))
        .where(F.col("total") == F.col("mt"))
        .agg(
            F.max("total").cast("long").alias("critical_path_len"),
            F.min("u").cast("long").alias("start_task"),
            F.min("v").cast("long").alias("end_task"),
        )
    )


# ------------------------------------------------------------------ q612
@query(
    "q612_cpm_schedule",
    """
    WITH RECURSIVE tasks AS (
        SELECT DISTINCT doc_id % 25 AS task,
               (doc_id % 25) * 13 % 47 + 1 AS dur
        FROM documents
    ),
    e AS (
        SELECT DISTINCT t.task AS u, (t.task * 7 + 3) % 25 AS v
        FROM tasks t WHERE t.task < (t.task * 7 + 3) % 25
        UNION
        SELECT DISTINCT t.task, t.task + 2 FROM tasks t WHERE t.task + 2 < 25
        UNION
        SELECT DISTINCT t.task, t.task + 3 FROM tasks t WHERE t.task + 3 < 25
    ),
    wd AS (SELECT e.u, e.v, td.dur AS w FROM e JOIN tasks td ON td.task = e.u),
    walk AS (
        SELECT u, v, w AS len FROM wd
        UNION
        SELECT wk.u, s.v, wk.len + s.w FROM walk wk JOIN wd s ON wk.v = s.u
    ),
    lp AS (SELECT u, v, CAST(max(len) AS BIGINT) AS longest FROM walk GROUP BY 1, 2),
    es AS (
        SELECT t.task, t.dur,
               coalesce((SELECT max(lp.longest) FROM lp WHERE lp.v = t.task), 0) AS es
        FROM tasks t
    ),
    lt AS (
        SELECT t.task,
               greatest(t.dur,
                        coalesce((SELECT max(lp.longest + t2.dur)
                                  FROM lp JOIN tasks t2 ON t2.task = lp.v
                                  WHERE lp.u = t.task), 0)) AS tail_len
        FROM tasks t
    ),
    proj AS (SELECT CAST(max(es + dur) AS BIGINT) AS plen FROM es)
    SELECT es.task, es.dur,
           CAST(es.es AS BIGINT) AS earliest_start,
           CAST(es.es + es.dur AS BIGINT) AS earliest_finish,
           CAST(proj.plen - lt.tail_len - es.es AS BIGINT) AS slack,
           proj.plen - lt.tail_len - es.es = 0 AS critical
    FROM es JOIN lt ON lt.task = es.task CROSS JOIN proj
    """,
)
def q612(spark: SparkSession, sf: str) -> DataFrame:
    """Full critical-path-method schedule over the q611 task DAG:
    earliest start = longest inbound path (max-plus doubling), latest
    start = project length − longest outbound chain (the same
    relation read from the other endpoint), slack = LS − ES, critical
    tasks at slack 0 — the zero-float scheduling relation every
    pipeline orchestrator wants."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    tasks = d.select(
        (k % 25).alias("task"), ((k % 25) * 13 % 47 + 1).alias("dur")
    ).distinct()
    e1 = tasks.select(
        F.col("task").alias("u"), ((F.col("task") * 7 + 3) % 25).alias("v")
    ).where(F.col("u") < F.col("v"))
    e2 = tasks.select(F.col("task").alias("u"), (F.col("task") + 2).alias("v")).where(
        F.col("v") < 25
    )
    e3 = tasks.select(F.col("task").alias("u"), (F.col("task") + 3).alias("v")).where(
        F.col("v") < 25
    )
    e = e1.unionByName(e2).unionByName(e3).distinct()
    wd = e.join(tasks.withColumnRenamed("task", "u"), "u").select(
        "u", "v", F.col("dur").alias("w")
    )
    cur = wd.select("u", "v", F.col("w").alias("len"))
    for _ in range(5):
        right = cur.select(
            F.col("u").alias("m"), F.col("v").alias("w2"), F.col("len").alias("l2")
        )
        step = cur.join(right, cur["v"] == right["m"]).select(
            "u", F.col("w2").alias("v"), (F.col("len") + F.col("l2")).alias("len")
        )
        cur = cur.unionByName(step).groupBy("u", "v").agg(F.max("len").alias("len")).persist()
    inbound = cur.groupBy(F.col("v").alias("task")).agg(F.max("len").alias("in_len"))
    es = tasks.join(inbound, "task", "left").select(
        "task", "dur", F.coalesce(F.col("in_len"), F.lit(0)).alias("es")
    )
    out_chain = (
        cur.join(tasks.select(F.col("task").alias("v"), F.col("dur").alias("vd")), "v")
        .groupBy(F.col("u").alias("task"))
        .agg(F.max(F.col("len") + F.col("vd")).alias("chain"))
    )
    lt = tasks.join(out_chain, "task", "left").select(
        "task",
        F.greatest(F.col("dur").cast("long"), F.coalesce(F.col("chain"), F.lit(0)).cast("long")).alias("tail_len"),
    )
    proj = es.agg(F.max(F.col("es") + F.col("dur")).cast("long").alias("plen"))
    slack = F.col("plen") - F.col("tail_len") - F.col("es")
    return (
        es.join(lt, "task")
        .crossJoin(F.broadcast(proj))
        .select(
            "task", "dur",
            F.col("es").cast("long").alias("earliest_start"),
            (F.col("es") + F.col("dur")).cast("long").alias("earliest_finish"),
            slack.cast("long").alias("slack"),
            (slack == 0).alias("critical"),
        )
    )


# ------------------------------------------------------------------ q613
@query(
    "q613_lateral_topk",
    """
    SELECT o.o_orderkey, t.l_linenumber, t.cents
    FROM orders o JOIN LATERAL (
        SELECT l_linenumber, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        ORDER BY cents DESC, l_linenumber LIMIT 2
    ) t ON true
    WHERE o.o_orderkey % 50 = 0
    """,
)
def q613(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL top-k parity: Spark 4's LATERAL subquery and
    DuckDB's LATERAL both rank each order's two priciest lines under a
    (cents DESC, linenumber) total order — the modern SQL surface for
    per-row top-k, checked engine against engine with exact cent
    values."""
    load_table(spark, sf, "orders").createOrReplaceTempView("__q613_o")
    load_table(spark, sf, "lineitem").createOrReplaceTempView("__q613_l")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.cents
        FROM __q613_o o JOIN LATERAL (
            SELECT l_linenumber, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM __q613_l l WHERE l.l_orderkey = o.o_orderkey
            ORDER BY cents DESC, l_linenumber LIMIT 2
        ) t
        WHERE o.o_orderkey % 50 = 0
        """
    )


# ------------------------------------------------------------------ q614
@query(
    "q614_unpivot_parity",
    """
    WITH wide AS (
        SELECT event_type,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS even_users,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS odd_users,
               CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS revenue
        FROM events GROUP BY 1
    )
    SELECT event_type, metric, val
    FROM (UNPIVOT wide ON even_users, odd_users, revenue INTO NAME metric VALUE val)
    """,
)
def q614(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT surface parity (the melt/wide-to-long SQL form): Spark
    4's ``UNPIVOT (val FOR metric IN …)`` vs DuckDB's ``UNPIVOT … INTO
    NAME … VALUE …`` over the same exact-integer wide aggregate —
    column-to-row semantics and name/value pairing checked engine
    against engine."""
    load_table(spark, sf, "events").createOrReplaceTempView("__q614_e")
    return spark.sql(
        """
        WITH wide AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS even_users,
                   CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS odd_users,
                   CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS revenue
            FROM __q614_e GROUP BY 1
        )
        SELECT event_type, metric, val
        FROM wide UNPIVOT (val FOR metric IN (even_users, odd_users, revenue))
        """
    )


# ------------------------------------------------------------------ q615
def _q615_oracle() -> str:
    rounds = []
    for r in (1, 2, 3):
        rounds.append(f"""
    props{r} AS (
        SELECT s.w, rk.f, rk.t_score
        FROM st{r - 1} s JOIN rk ON rk.w = s.w AND rk.wrank = s.n_prop + 1
        WHERE s.f IS NULL
    ),
    cand{r} AS (
        SELECT w, f, t_score FROM props{r}
        UNION ALL
        SELECT s.w, s.f, rk.t_score
        FROM st{r - 1} s JOIN rk ON rk.w = s.w AND rk.f = s.f
        WHERE s.f IS NOT NULL
    ),
    win{r} AS (
        SELECT w, f FROM (
            SELECT w, f, row_number() OVER (PARTITION BY f ORDER BY t_score DESC, w) AS b
            FROM cand{r}
        ) WHERE b = 1
    ),
    st{r} AS (
        SELECT s.w,
               win{r}.f AS f,
               s.n_prop + (CASE WHEN p.w IS NOT NULL THEN 1 ELSE 0 END) AS n_prop
        FROM st{r - 1} s
        LEFT JOIN props{r} p ON p.w = s.w
        LEFT JOIN win{r} ON win{r}.w = s.w
    )""")
    body = ",".join(rounds)
    return f"""
    WITH agents AS (SELECT DISTINCT doc_id % 20 AS a FROM documents),
    prefs AS (
        SELECT w.a AS w, f.a AS f,
               ('0x' || substr(md5(w.a::VARCHAR || ':' || f.a::VARCHAR), 1, 15))::BIGINT AS s_score,
               ('0x' || substr(md5(f.a::VARCHAR || '>' || w.a::VARCHAR), 1, 15))::BIGINT AS t_score
        FROM agents w CROSS JOIN agents f
    ),
    rk AS (
        SELECT w, f, s_score, t_score,
               row_number() OVER (PARTITION BY w ORDER BY s_score DESC, f) AS wrank
        FROM prefs
    ),
    st0 AS (SELECT a AS w, CAST(NULL AS BIGINT) AS f, 0 AS n_prop FROM agents),{body}
    SELECT w, f AS firm, CAST(n_prop AS BIGINT) AS n_proposals,
           f IS NOT NULL AS matched
    FROM st3
    """


@query("q615_stable_matching", _q615_oracle())
def q615(spark: SparkSession, sf: str) -> DataFrame:
    """Gale-Shapley deferred acceptance, three unrolled parallel
    rounds on a 20×20 market with portable-hash preferences: each
    round the unmatched side proposes to its next-ranked counterparty
    (rank = proposals already made + 1), every firm keeps the best of
    incumbents + proposals under its own hash preference (tie-free
    BIGINT scores), displaced workers rejoin the pool.  Bounded rounds
    ARE the algorithm (the market-design/assignment primitive);
    state is a plain (worker, firm, n_proposals) relation per round."""
    d = load_table(spark, sf, "documents")
    agents = d.select((F.col("doc_id") % 20).alias("a")).distinct()
    w = agents.select(F.col("a").alias("w"))
    f = agents.select(F.col("a").alias("f"))
    h = lambda c1, sep, c2: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(c1.cast("string"), F.lit(sep), c2.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    prefs = w.crossJoin(f).select(
        "w", "f",
        h(F.col("w"), ":", F.col("f")).alias("s_score"),
        h(F.col("f"), ">", F.col("w")).alias("t_score"),
    )
    rk = prefs.withColumn(
        "wrank",
        F.row_number().over(Window.partitionBy("w").orderBy(F.desc("s_score"), "f")),
    ).persist()
    st = agents.select(
        F.col("a").alias("w"),
        F.lit(None).cast("long").alias("f"),
        F.lit(0).alias("n_prop"),
    )
    for _ in range(3):
        props = (
            st.where(F.col("f").isNull())
            .select("w", "n_prop")
            .join(rk, ["w"])
            .where(F.col("wrank") == F.col("n_prop") + 1)
            .select("w", "f", "t_score")
        )
        incumbents = (
            st.where(F.col("f").isNotNull())
            .select("w", "f")
            .join(rk.select("w", "f", "t_score"), ["w", "f"])
        )
        cand = props.select("w", "f", "t_score").unionByName(incumbents)
        win = (
            cand.withColumn(
                "b",
                F.row_number().over(Window.partitionBy("f").orderBy(F.desc("t_score"), "w")),
            )
            .where(F.col("b") == 1)
            .select(F.col("w").alias("ww"), F.col("f").alias("wf"))
        )
        pw = props.select(F.col("w").alias("pw")).distinct()
        st = (
            st.select("w", "n_prop")
            .join(pw, st["w"] == pw["pw"], "left")
            .join(win, st["w"] == win["ww"], "left")
            .select(
                "w",
                F.col("wf").alias("f"),
                (F.col("n_prop") + F.when(F.col("pw").isNotNull(), 1).otherwise(0)).alias("n_prop"),
            )
            .persist()
        )
    return st.select(
        "w", F.col("f").alias("firm"),
        F.col("n_prop").cast("long").alias("n_proposals"),
        F.col("f").isNotNull().alias("matched"),
    )


# ------------------------------------------------------------------ q616
@query(
    "q616_revenue_equivalence",
    """
    WITH bids AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               user_id AS bidder, CAST(round(value * 100) AS BIGINT) AS bid
        FROM events
    ),
    ranked AS (
        SELECT event_type, day, bid,
               row_number() OVER (PARTITION BY event_type, day
                                  ORDER BY bid DESC, bidder) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type, day) AS BIGINT) AS n
        FROM bids
    ),
    lots AS (
        SELECT event_type, day, CAST(max(n) AS BIGINT) AS n,
               max(CASE WHEN rn = 1 THEN bid END) AS b1,
               max(CASE WHEN rn = 2 THEN bid END) AS b2
        FROM ranked WHERE rn <= 2 GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_lots,
           CAST(sum(coalesce(b2, 0)) AS BIGINT) AS second_price_revenue,
           CAST(sum((b1 * (n - 1)) // n) AS BIGINT) AS shaded_first_price_revenue
    FROM lots WHERE n >= 2
    """,
)
def q616(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue-equivalence check: per lot the second-price revenue vs
    the risk-neutral first-price equilibrium bid b·(n−1)/n (exact
    integer DIV) — auction theory says the two columns should be close
    under symmetric bidders, and the relation measures how close on
    real bid data.  One top-2 ranking pass, conditional aggregates."""
    ev = load_table(spark, sf, "events")
    bids = ev.select(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
        F.col("user_id").alias("bidder"),
        F.round(F.col("value") * 100).cast("long").alias("bid"),
    )
    w = Window.partitionBy("event_type", "day").orderBy(F.desc("bid"), "bidder")
    wc = Window.partitionBy("event_type", "day")
    ranked = bids.select(
        "event_type", "day", "bid",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).cast("long").alias("n"),
    ).where(F.col("rn") <= 2)
    lots = ranked.groupBy("event_type", "day").agg(
        F.max("n").cast("long").alias("n"),
        F.max(F.when(F.col("rn") == 1, F.col("bid"))).alias("b1"),
        F.max(F.when(F.col("rn") == 2, F.col("bid"))).alias("b2"),
    )
    return lots.where(F.col("n") >= 2).agg(
        F.count(F.lit(1)).cast("long").alias("n_lots"),
        F.sum(F.coalesce(F.col("b2"), F.lit(0))).cast("long").alias("second_price_revenue"),
        F.sum(F.expr("(b1 * (n - 1)) DIV n")).cast("long").alias("shaded_first_price_revenue"),
    )


# ------------------------------------------------------------------ q617
def _q617_oracle() -> str:
    base = _q615_oracle()
    head = base[: base.rindex("SELECT w, f AS firm")]
    return (
        head.rstrip().rstrip(",")
        + """,
    matches AS (SELECT w, f FROM st3 WHERE f IS NOT NULL),
    wcur AS (
        SELECT m.w, rk.s_score AS cur_s FROM matches m
        JOIN rk ON rk.w = m.w AND rk.f = m.f
    ),
    fcur AS (
        SELECT m.f, rk.t_score AS cur_t FROM matches m
        JOIN rk ON rk.w = m.w AND rk.f = m.f
    ),
    blocking AS (
        SELECT rk.w, rk.f
        FROM rk
        LEFT JOIN matches mm ON mm.w = rk.w AND mm.f = rk.f
        LEFT JOIN wcur ON wcur.w = rk.w
        LEFT JOIN fcur ON fcur.f = rk.f
        WHERE mm.w IS NULL
          AND (wcur.w IS NULL OR rk.s_score > wcur.cur_s)
          AND (fcur.f IS NULL OR rk.t_score > fcur.cur_t)
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM matches) AS n_matched,
           CAST(count(*) AS BIGINT) AS n_blocking_pairs,
           count(*) = 0 AS stable
    FROM blocking
    """
    )


@query("q617_blocking_pairs", _q617_oracle())
def q617(spark: SparkSession, sf: str) -> DataFrame:
    """Stability audit of q615's 3-round deferred-acceptance outcome:
    a blocking pair is an unmatched (w, f) where BOTH sides prefer
    each other to their current partners (unmatched counts as
    infinitely undesirable) — exact hash-score comparisons; after a
    bounded-round run the count is the distance-to-stability metric
    (full GS drives it to zero)."""
    from .queries import QUERIES

    st = QUERIES["q615_stable_matching"](spark, sf)
    d = load_table(spark, sf, "documents")
    agents = d.select((F.col("doc_id") % 20).alias("a")).distinct()
    wdf = agents.select(F.col("a").alias("w"))
    fdf = agents.select(F.col("a").alias("f"))
    h = lambda c1, sep, c2: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(c1.cast("string"), F.lit(sep), c2.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")
    rk = wdf.crossJoin(fdf).select(
        "w", "f",
        h(F.col("w"), ":", F.col("f")).alias("s_score"),
        h(F.col("f"), ">", F.col("w")).alias("t_score"),
    )
    matches = st.where(F.col("matched")).select("w", F.col("firm").alias("f"))
    wcur = matches.join(rk, ["w", "f"]).select("w", F.col("s_score").alias("cur_s"))
    fcur = matches.join(rk, ["w", "f"]).select("f", F.col("t_score").alias("cur_t"))
    blocking = (
        rk.join(matches.withColumn("mm", F.lit(1)), ["w", "f"], "left")
        .join(wcur, "w", "left")
        .join(fcur, "f", "left")
        .where(
            F.col("mm").isNull()
            & (F.col("cur_s").isNull() | (F.col("s_score") > F.col("cur_s")))
            & (F.col("cur_t").isNull() | (F.col("t_score") > F.col("cur_t")))
        )
    )
    nm = matches.agg(F.count(F.lit(1)).cast("long").alias("n_matched"))
    nb = blocking.agg(F.count(F.lit(1)).cast("long").alias("n_blocking_pairs"))
    return nm.crossJoin(nb).select(
        "n_matched", "n_blocking_pairs", (F.col("n_blocking_pairs") == 0).alias("stable")
    )


# ------------------------------------------------------------------ q618
def _q618_oracle() -> str:
    picks = []
    for gap in (300, 1800, 7200):
        picks.append(f"""
    SELECT CAST({gap} AS BIGINT) AS gap_s,
           CAST(sum(CASE WHEN prev IS NULL OR sec - prev > {gap} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM g""")
    body = "\nUNION ALL".join(picks)
    return f"""
    WITH g AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
               lag(CAST(floor(epoch(ts)) AS BIGINT))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    )
    {body}
    """


@query("q618_session_gap_curve", _q618_oracle())
def q618(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization sensitivity curve: total session counts at 5-min
    / 30-min / 2-h inactivity gaps from ONE lag pass (a session starts
    where the whole-second gap exceeds the threshold) — the relation
    that picks the gap parameter before anyone ships a sessionize
    job."""
    ev = load_table(spark, sf, "events")
    sec = F.floor(F.unix_seconds(F.col("ts"))).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select("user_id", "ts", "event_id", sec.alias("sec")).withColumn(
        "prev", F.lag("sec").over(w)
    )
    outs = []
    for gap in (300, 1800, 7200):
        outs.append(
            g.agg(
                F.sum(
                    F.when(F.col("prev").isNull() | (F.col("sec") - F.col("prev") > gap), 1)
                    .otherwise(0)
                ).cast("long").alias("n_sessions"),
                F.count(F.lit(1)).cast("long").alias("n_events"),
            ).select(F.lit(gap).cast("long").alias("gap_s"), "n_sessions", "n_events")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ------------------------------------------------------------------ q619
def _q619_oracle() -> str:
    rounds = []
    for r in (1, 2, 3):
        rounds.append(f"""
    h{r} AS MATERIALIZED (
        SELECT u, v, ('0x' || substr(md5(u::VARCHAR || '-' || v::VARCHAR), 1, 15))::BIGINT AS h
        FROM e{r - 1}
    ),
    mu{r} AS MATERIALIZED (
        SELECT node, min(h) AS mh FROM (
            SELECT u AS node, h FROM h{r} UNION ALL SELECT v, h FROM h{r}
        ) GROUP BY 1
    ),
    sel{r} AS MATERIALIZED (
        SELECT t.u, t.v FROM h{r} t
        JOIN mu{r} a ON a.node = t.u AND a.mh = t.h
        JOIN mu{r} b ON b.node = t.v AND b.mh = t.h
    ),
    mn{r} AS MATERIALIZED (SELECT u AS node FROM sel{r} UNION SELECT v FROM sel{r}),
    e{r} AS MATERIALIZED (
        SELECT t.u, t.v FROM e{r - 1} t
        WHERE t.u NOT IN (SELECT node FROM mn{r})
          AND t.v NOT IN (SELECT node FROM mn{r})
    )""")
    body = ",".join(rounds)
    return f"""
    WITH e0 AS MATERIALIZED (
        SELECT DISTINCT least(doc_id % 40, (doc_id * 17 + 3) % 40) AS u,
               greatest(doc_id % 40, (doc_id * 17 + 3) % 40) AS v
        FROM documents WHERE doc_id % 40 != (doc_id * 17 + 3) % 40
        UNION
        SELECT DISTINCT doc_id % 40, (doc_id % 40 + 1) % 40 FROM documents
        WHERE doc_id % 40 < (doc_id % 40 + 1) % 40
    ),{body}
    SELECT CAST(1 AS BIGINT) AS round,
           (SELECT CAST(count(*) AS BIGINT) FROM sel1) AS n_matched,
           (SELECT CAST(count(*) AS BIGINT) FROM e1) AS n_edges_remaining
    UNION ALL SELECT 2, (SELECT count(*) FROM sel2), (SELECT count(*) FROM e2)
    UNION ALL SELECT 3, (SELECT count(*) FROM sel3), (SELECT count(*) FROM e3)
    """


@query("q619_maximal_matching", _q619_oracle())
def q619(spark: SparkSession, sf: str) -> DataFrame:
    """Parallel maximal matching (the 2-approx vertex-cover kernel),
    three hash-symmetry-breaking rounds: an edge joins the matching
    when its portable-md5 id is the MINIMUM among all edges at BOTH
    endpoints (local decision, no coordination — the classic
    distributed symmetry breaker), matched endpoints drop their
    remaining edges, repeat.  Per-round matched/remaining counts;
    the remaining-edge column shows the geometric die-off."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    aff = d.select((k % 40).alias("a"), ((k * 17 + 3) % 40).alias("b")).where(
        F.col("a") != F.col("b")
    ).select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
    ring = d.select((k % 40).alias("u"), ((k % 40 + 1) % 40).alias("v")).where(
        F.col("u") < F.col("v")
    )
    e = aff.unionByName(ring).distinct()
    hcol = F.conv(
        F.substring(
            F.md5(F.concat(F.col("u").cast("string"), F.lit("-"), F.col("v").cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")
    stats = []
    for r in (1, 2, 3):
        h = e.select("u", "v", hcol.alias("h")).persist()
        mu = (
            h.select(F.col("u").alias("node"), "h")
            .unionByName(h.select(F.col("v").alias("node"), "h"))
            .groupBy("node")
            .agg(F.min("h").alias("mh"))
        )
        a = mu.select(F.col("node").alias("u"), F.col("mh").alias("mha"))
        b = mu.select(F.col("node").alias("v"), F.col("mh").alias("mhb"))
        sel = (
            h.join(a, "u").join(b, "v")
            .where((F.col("h") == F.col("mha")) & (F.col("h") == F.col("mhb")))
            .select("u", "v")
        )
        mn = sel.select(F.col("u").alias("node")).union(sel.select(F.col("v").alias("node"))).distinct()
        e = (
            e.join(mn.withColumnRenamed("node", "u"), "u", "left_anti")
            .join(mn.withColumnRenamed("node", "v"), "v", "left_anti")
            .select("u", "v")
            .localCheckpoint()  # truncate per-round lineage (CC discipline)
        )
        stats.append((r, sel.count(), e.count()))
    rows = [(int(r), int(m), int(rem)) for r, m, rem in stats]
    return spark.createDataFrame(rows, "round bigint, n_matched bigint, n_edges_remaining bigint")


# ------------------------------------------------------------------ q620
def _q620_oracle() -> str:
    from .queries import ORACLES

    return f"""
    WITH gs AS ({ORACLES["q615_stable_matching"]}),
    bp AS ({ORACLES["q617_blocking_pairs"]}),
    mm AS ({ORACLES["q619_maximal_matching"]}),
    pc AS ({ORACLES["q605_percolation"]})
    SELECT 'gale_shapley' AS kernel, 'n_matched' AS metric,
           CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT) AS value
    FROM gs
    UNION ALL
    SELECT 'gale_shapley', 'blocking_pairs', n_blocking_pairs FROM bp
    UNION ALL
    SELECT 'maximal_matching', 'edges_after_round3',
           (SELECT n_edges_remaining FROM mm WHERE round = 3)
    UNION ALL
    SELECT 'maximal_matching', 'total_matched',
           (SELECT CAST(sum(n_matched) AS BIGINT) FROM mm)
    UNION ALL
    SELECT 'percolation', 'largest_cc_drop_ppm',
           ((SELECT largest_cc FROM pc WHERE variant = 'full')
            - (SELECT largest_cc FROM pc WHERE variant = 'hubs_removed')) * 1000000
             // (SELECT largest_cc FROM pc WHERE variant = 'full')
    """


@query("q620_kernels_scorecard", _q620_oracle())
def q620(spark: SparkSession, sf: str) -> DataFrame:
    """QUERY 620 — bounded-round kernel scorecard: convergence metrics
    of the session's distributed algorithms in one relation —
    Gale-Shapley match count and its blocking-pair distance to
    stability (q615/q617), maximal-matching completion (q619), and
    the percolation robustness drop (q605) — every number composed
    from registered pipelines on BOTH sides."""
    from .queries import QUERIES

    gs = QUERIES["q615_stable_matching"](spark, sf)
    bp = QUERIES["q617_blocking_pairs"](spark, sf)
    mm = QUERIES["q619_maximal_matching"](spark, sf)
    pc = QUERIES["q605_percolation"](spark, sf)
    r1 = gs.agg(
        F.sum(F.when(F.col("matched"), 1).otherwise(0)).cast("long").alias("value")
    ).select(F.lit("gale_shapley").alias("kernel"), F.lit("n_matched").alias("metric"), "value")
    r2 = bp.select(
        F.lit("gale_shapley").alias("kernel"),
        F.lit("blocking_pairs").alias("metric"),
        F.col("n_blocking_pairs").alias("value"),
    )
    r3 = mm.where(F.col("round") == 3).select(
        F.lit("maximal_matching").alias("kernel"),
        F.lit("edges_after_round3").alias("metric"),
        F.col("n_edges_remaining").alias("value"),
    )
    r4 = mm.agg(F.sum("n_matched").cast("long").alias("value")).select(
        F.lit("maximal_matching").alias("kernel"),
        F.lit("total_matched").alias("metric"), "value",
    )
    full = pc.where(F.col("variant") == "full").select(F.col("largest_cc").alias("fc"))
    cut = pc.where(F.col("variant") == "hubs_removed").select(F.col("largest_cc").alias("cc"))
    r5 = full.crossJoin(cut).select(
        F.lit("percolation").alias("kernel"),
        F.lit("largest_cc_drop_ppm").alias("metric"),
        F.expr("((fc - cc) * 1000000) DIV fc").alias("value"),
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(r5)


# ------------------------------------------------------------------ q621
def _q621_oracle() -> str:
    rounds = []
    for r in (1, 2, 3):
        rounds.append(f"""
    pri{r} AS MATERIALIZED (
        SELECT node,
               ('0x' || substr(md5(node::VARCHAR || '#{r}'), 1, 15))::BIGINT AS p
        FROM und{r - 1}
    ),
    win{r} AS MATERIALIZED (
        SELECT a.node FROM pri{r} a
        WHERE NOT EXISTS (
            SELECT 1 FROM sym s JOIN pri{r} b ON b.node = s.v
            WHERE s.u = a.node AND (b.p < a.p OR (b.p = a.p AND b.node < a.node))
        )
    ),
    dead{r} AS MATERIALIZED (
        SELECT DISTINCT s.v AS node FROM sym s JOIN win{r} w ON w.node = s.u
    ),
    und{r} AS MATERIALIZED (
        SELECT node FROM und{r - 1}
        WHERE node NOT IN (SELECT node FROM win{r})
          AND node NOT IN (SELECT node FROM dead{r})
    )""")
    body = ",".join(rounds)
    return f"""
    WITH e AS MATERIALIZED ({_Q601_EDGES_SQL}),
    sym AS MATERIALIZED (SELECT u, v FROM e UNION SELECT v, u FROM e),
    und0 AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym),{body}
    SELECT CAST(1 AS BIGINT) AS round,
           (SELECT CAST(count(*) AS BIGINT) FROM win1) AS n_selected,
           (SELECT CAST(count(*) AS BIGINT) FROM und1) AS n_undecided
    UNION ALL SELECT 2, (SELECT count(*) FROM win2), (SELECT count(*) FROM und2)
    UNION ALL SELECT 3, (SELECT count(*) FROM win3), (SELECT count(*) FROM und3)
    """


@query("q621_luby_mis", _q621_oracle())
def q621(spark: SparkSession, sf: str) -> DataFrame:
    """Luby's maximal-independent-set, three rounds: each undecided
    node draws a fresh portable-md5 priority per round and joins the
    set when it beats EVERY undecided neighbor (tie-broken on id);
    selected nodes kill their neighbors.  The canonical distributed
    symmetry breaker (scheduling, graph coloring seeds) — per-round
    selected/undecided counts show the expected geometric collapse."""
    d = load_table(spark, sf, "documents")
    k = F.col("doc_id")
    base = d.select((k % 30).alias("a"), ((k * 7 + 2) % 30).alias("b")).where(
        F.col("a") != F.col("b")
    ).unionByName(d.select((k % 30).alias("a"), ((k % 30) + 1) % 30).toDF("a", "b"))
    e = base.select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")).distinct()
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct().persist()
    und = sym.select(F.col("u").alias("node")).distinct()
    stats = []
    for r in (1, 2, 3):
        pri = und.select(
            "node",
            F.conv(
                F.substring(F.md5(F.concat(F.col("node").cast("string"), F.lit(f"#{r}"))), 1, 15),
                16, 10,
            ).cast("long").alias("p"),
        ).persist()
        nb = (
            sym.join(pri.withColumnRenamed("node", "u").withColumnRenamed("p", "pu"), "u")
            .join(pri.withColumnRenamed("node", "v").withColumnRenamed("p", "pv"), "v")
        )
        losers = nb.where(
            (F.col("pv") < F.col("pu"))
            | ((F.col("pv") == F.col("pu")) & (F.col("v") < F.col("u")))
        ).select(F.col("u").alias("node")).distinct()
        win = pri.select("node").join(losers, "node", "left_anti").persist()
        dead = (
            sym.join(win.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        und = (
            und.join(win, "node", "left_anti")
            .join(dead, "node", "left_anti")
            .localCheckpoint()
        )
        stats.append((r, win.count(), und.count()))
    rows = [(int(r), int(w), int(u)) for r, w, u in stats]
    return spark.createDataFrame(rows, "round bigint, n_selected bigint, n_undecided bigint")


# ------------------------------------------------------------------ q622
@query(
    "q622_pacing_audit",
    """
    WITH hourly AS (
        SELECT event_type, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(floor(epoch(ts) / 3600.0) AS BIGINT) % 24 AS hr,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend
        FROM events GROUP BY 1, 2, 3
    ),
    daily AS (
        SELECT event_type, day, CAST(sum(spend) AS BIGINT) AS budget FROM hourly
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT h.event_type, h.day, h.hr, d.budget,
               CAST(sum(h.spend) OVER (PARTITION BY h.event_type, h.day ORDER BY h.hr
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_spend
        FROM hourly h JOIN daily d ON d.event_type = h.event_type AND d.day = h.day
    ),
    breach AS (
        SELECT event_type, day,
               min(CASE WHEN 24 * cum_spend > budget * (hr + 1) + budget THEN hr END)
                 AS first_breach_hr
        FROM cum GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(CASE WHEN first_breach_hr IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS days_overpaced,
           CAST(min(first_breach_hr) AS BIGINT) AS earliest_breach_hr
    FROM breach GROUP BY 1
    """,
)
def q622(spark: SparkSession, sf: str) -> DataFrame:
    """Budget-pacing audit: per (campaign=event_type, day) the first
    hour whose cumulative spend runs more than one hour AHEAD of the
    linear schedule — the overspend test 24·cum > budget·(h+2) is a
    pure integer cross-multiplication on exact cent sums (cumulative
    integer window over the tiny hourly relation).  Days overpaced
    and earliest breach hour per campaign."""
    ev = load_table(spark, sf, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long").alias("day"),
        (F.floor(F.unix_seconds(F.col("ts")) / 3600) % 24).cast("long").alias("hr"),
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("spend"))
    daily = hourly.groupBy("event_type", "day").agg(F.sum("spend").cast("long").alias("budget"))
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hourly.join(daily, ["event_type", "day"]).select(
        "event_type", "day", "hr", "budget",
        F.sum("spend").over(w).cast("long").alias("cum_spend"),
    )
    breach = cum.groupBy("event_type", "day").agg(
        F.min(
            F.when(
                24 * F.col("cum_spend") > F.col("budget") * (F.col("hr") + 1) + F.col("budget"),
                F.col("hr"),
            )
        ).alias("first_breach_hr")
    )
    return breach.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.when(F.col("first_breach_hr").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("days_overpaced"),
        F.min("first_breach_hr").cast("long").alias("earliest_breach_hr"),
    )


# ------------------------------------------------------------------ q623
@query(
    "q623_truncated_dup",
    r"""
    WITH corpus AS (
        SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents WHERE text IS NOT NULL
        UNION ALL
        SELECT doc_id + 200000,
               substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                      1, CAST(greatest(n_chars // 2, 60) AS INT))
        FROM documents WHERE doc_id < 30 AND text IS NOT NULL
    ),
    keyed AS (
        SELECT doc_id, t, length(t) AS len, substr(t, 1, 50) AS k
        FROM corpus WHERE length(t) >= 50
    ),
    cand AS (
        SELECT a.doc_id AS short_id, b.doc_id AS long_id,
               a.len AS short_len, b.len AS long_len
        FROM keyed a JOIN keyed b
          ON a.k = b.k AND a.len < b.len
        WHERE substr(b.t, 1, CAST(a.len AS INT)) = a.t
    )
    SELECT short_id, long_id, short_len, long_len,
           (short_len * 1000000) // long_len AS coverage_ppm
    FROM cand
    """,
)
def q623(spark: SparkSession, sf: str) -> DataFrame:
    """Truncated-duplicate detection (the partial-crawl curation
    hazard): candidates block on the first 50 normalized chars (an
    equi-join — never a substring scan across all pairs), then the
    exact prefix test verifies; planted half-length truncations of 30
    docs guarantee positives, coverage in integer ppm."""
    d = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    full = d.select("doc_id", norm.alias("t"))
    trunc = d.where(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.expr(
            "substr(regexp_replace(lower(trim(text)), '\\\\s+', ' '),"
            " 1, CAST(greatest(n_chars DIV 2, 60) AS INT))"
        ).alias("t"),
    )
    corpus = full.unionByName(trunc)
    keyed = corpus.where(F.length("t") >= 50).select(
        "doc_id", "t",
        F.length("t").cast("long").alias("len"),
        F.substring("t", 1, 50).alias("k"),
    )
    a = keyed.select(
        F.col("doc_id").alias("short_id"), F.col("t").alias("ta"),
        F.col("len").alias("short_len"), "k",
    )
    b = keyed.select(
        F.col("doc_id").alias("long_id"), F.col("t").alias("tb"),
        F.col("len").alias("long_len"), F.col("k").alias("kb"),
    )
    cand = (
        a.join(b, (F.col("k") == F.col("kb")) & (F.col("short_len") < F.col("long_len")))
        .where(F.expr("substr(tb, 1, CAST(short_len AS INT)) = ta"))
        .select("short_id", "long_id", "short_len", "long_len")
    )
    return cand.select(
        "*", F.expr("(short_len * 1000000) DIV long_len").alias("coverage_ppm")
    )


# ------------------------------------------------------------------ q624
def _q624_oracle() -> str:
    picks = []
    # events span epoch days 19723-19752; the +25 effect is planted at
    # >= 19743. Placebo tests run ONLY on pre-treatment data.
    for label, day, flt in (
        ("placebo_19733", 19733, "WHERE day < 19743"),
        ("placebo_19738", 19738, "WHERE day < 19743"),
        ("true_19743", 19743, ""),
    ):
        picks.append(f"""
    SELECT '{label}' AS test, CAST({day} AS BIGINT) AS cutover_day,
           CAST(sum(CASE WHEN treat = 1 AND day >= {day} THEN y ELSE 0 END) AS BIGINT) AS s_t1,
           CAST(sum(CASE WHEN treat = 1 AND day >= {day} THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
           CAST(sum(CASE WHEN treat = 1 AND day < {day} THEN y ELSE 0 END) AS BIGINT) AS s_t0,
           CAST(sum(CASE WHEN treat = 1 AND day < {day} THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
           CAST(sum(CASE WHEN treat = 0 AND day >= {day} THEN y ELSE 0 END) AS BIGINT) AS s_c1,
           CAST(sum(CASE WHEN treat = 0 AND day >= {day} THEN 1 ELSE 0 END) AS BIGINT) AS n_c1,
           CAST(sum(CASE WHEN treat = 0 AND day < {day} THEN y ELSE 0 END) AS BIGINT) AS s_c0,
           CAST(sum(CASE WHEN treat = 0 AND day < {day} THEN 1 ELSE 0 END) AS BIGINT) AS n_c0
    FROM f {flt}""")
    body = "\nUNION ALL".join(picks)
    return f"""
    WITH f AS (
        SELECT CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
               CAST(round(value) AS BIGINT)
                 + CASE WHEN user_id % 2 = 0
                             AND CAST(floor(epoch(ts) / 86400.0) AS BIGINT) >= 19743
                        THEN 25 ELSE 0 END AS y
        FROM events
    ),
    cells AS ({body})
    SELECT test, cutover_day,
           (s_t1 / n_t1 - s_t0 / n_t0) - (s_c1 / n_c1 - s_c0 / n_c0) AS did_estimate
    FROM cells
    """


@query("q624_did_placebo", _q624_oracle())
def q624(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences with PLACEBO cutovers: the 2×2 DiD
    (one fused conditional agg per test date) at the true policy day
    and two PRE-TREATMENT placebo days (placebos see only
    pre-treatment data — a placebo window crossing the real cutover
    would absorb the true effect) — the planted +25 shows only at the
    true date, the robustness check every DiD readout should ship
    with.  All cells exact BIGINTs, estimates one-divide rationals."""
    ev = load_table(spark, sf, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    treat = (F.col("user_id") % 2 == 0).cast("long")
    y = F.round(F.col("value")).cast("long") + F.when(
        (F.col("user_id") % 2 == 0) & (day >= 19743), 25
    ).otherwise(0)
    f = ev.select(day.alias("day"), treat.alias("treat"), y.alias("y"))
    outs = []
    for label, cd, pre_only in (
        ("placebo_19733", 19733, True),
        ("placebo_19738", 19738, True),
        ("true_19743", 19743, False),
    ):
        base = f.where(F.col("day") < 19743) if pre_only else f
        cells = base.agg(
            *[
                F.sum(
                    F.when((F.col("treat") == t) & cond, F.col("y") if s else 1).otherwise(0)
                ).cast("long").alias(f"{'s' if s else 'n'}_{'t' if t else 'c'}{p}")
                for t in (1, 0)
                for p, cond in ((1, F.col("day") >= cd), (0, F.col("day") < cd))
                for s in (True, False)
            ]
        )
        did = (
            F.col("s_t1") / F.col("n_t1") - F.col("s_t0") / F.col("n_t0")
        ) - (F.col("s_c1") / F.col("n_c1") - F.col("s_c0") / F.col("n_c0"))
        outs.append(
            cells.select(
                F.lit(label).alias("test"),
                F.lit(cd).cast("long").alias("cutover_day"),
                did.alias("did_estimate"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ------------------------------------------------------------------ q625
@query(
    "q625_training_set_assembly",
    """
    WITH daily AS (
        SELECT user_id, CAST(floor(epoch(ts) / 86400.0) AS BIGINT) AS day,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_buy,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, day,
           CAST(coalesce(sum(n_view) OVER w_feat, 0) AS BIGINT) AS f_views_7d,
           CAST(coalesce(sum(n_click) OVER w_feat, 0) AS BIGINT) AS f_clicks_7d,
           CAST(coalesce(sum(n_error) OVER w_feat, 0) AS BIGINT) AS f_errors_7d,
           CAST(coalesce(sum(cents) OVER w_feat, 0) AS BIGINT) AS f_spend_7d,
           coalesce(sum(n_buy) OVER w_label, 0) > 0 AS label_buys_next_7d
    FROM daily
    WINDOW w_feat AS (PARTITION BY user_id ORDER BY day RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING),
           w_label AS (PARTITION BY user_id ORDER BY day RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING)
    """,
)
def q625(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time-correct training-set assembly (the feature-store
    contract): per (user, active day) the trailing-7d behavioral
    features use STRICTLY-BEFORE range frames and the label (purchase
    within the NEXT 7 days) uses strictly-after — leakage-safe by
    window construction, no as-of join needed because features and
    labels come from one daily relation; all counts exact integers."""
    ev = load_table(spark, sf, "events")
    day = F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("long")
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("long").alias(c)
            for t, c in [("view", "n_view"), ("click", "n_click"),
                         ("error", "n_error"), ("purchase", "n_buy")]
        ],
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"),
    )
    w_feat = Window.partitionBy("user_id").orderBy("day").rangeBetween(-7, -1)
    w_label = Window.partitionBy("user_id").orderBy("day").rangeBetween(1, 7)
    z = F.lit(0).cast("long")
    return daily.select(
        "user_id", "day",
        F.coalesce(F.sum("n_view").over(w_feat), z).cast("long").alias("f_views_7d"),
        F.coalesce(F.sum("n_click").over(w_feat), z).cast("long").alias("f_clicks_7d"),
        F.coalesce(F.sum("n_error").over(w_feat), z).cast("long").alias("f_errors_7d"),
        F.coalesce(F.sum("cents").over(w_feat), z).cast("long").alias("f_spend_7d"),
        (F.coalesce(F.sum("n_buy").over(w_label), z) > 0).alias("label_buys_next_7d"),
    )


# ------------------------------------------------------------------ q626
def _q626_oracle() -> str:
    from .queries import ORACLES

    base = ORACLES["q549_naive_bayes_lang"]
    picks = []
    for k in (6, 12):
        inner = base.replace("[1:12]", f"[1:{k}]")
        picks.append(
            f"SELECT CAST({k} AS BIGINT) AS k_tokens,\n"
            f"       CAST(count(*) AS BIGINT) AS n_docs,\n"
            f"       CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,\n"
            f"       (CAST(sum(CASE WHEN correct THEN 1 ELSE 0 END) AS BIGINT) * 1000000)\n"
            f"         // count(*) AS accuracy_ppm\n"
            f"FROM ({inner})"
        )
    return "\nUNION ALL\n".join(picks)


@query("q626_nb_hyperparam", _q626_oracle())
def q626(spark: SparkSession, sf: str) -> DataFrame:
    """Hyperparameter comparison as a relation: the Naive Bayes
    classifier (q549) evaluated at scoring-prefix lengths 6 and 12
    tokens side by side, accuracy in exact integer ppm — both sides
    reuse the registered q549 pipeline verbatim with only the prefix
    parameter changed (the grid-search shape without a grid-search
    framework)."""
    from .operators.text import naive_bayes_classify

    d = load_table(spark, sf, "documents")
    train = d.where(F.col("doc_id") % 2 == 0)
    test = d.where(F.col("doc_id") % 2 == 1)
    truth = test.where(F.col("text").isNotNull()).select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    outs = []
    for k in (6, 12):
        preds = naive_bayes_classify(train, test, "doc_id", "lang", "text", k_tokens=k)
        hit = F.when(F.col("pred_lang") == F.col("true_lang"), 1).otherwise(0)
        outs.append(
            preds.join(truth, "doc_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(hit).cast("long").alias("n_correct"),
            ).select(
                F.lit(k).cast("long").alias("k_tokens"), "n_docs", "n_correct",
                F.expr("(n_correct * 1000000) DIV n_docs").alias("accuracy_ppm"),
            )
        )
    return outs[0].unionByName(outs[1])


# ------------------------------------------------------------------ q627
def _q627_oracle() -> str:
    from .operators import dedup as _dd

    p = _dd._MERSENNE
    params = _dd._hash_params(32)
    mh_cols = ", ".join(
        f"min((h * {a} + {b}) % {p}) AS mh{i}" for i, (a, b) in enumerate(params)
    )
    cfg_rows = []
    for bands, rpb in ((8, 4), (4, 8)):
        band_terms = " + ".join(
            "(CASE WHEN "
            + " AND ".join(f"sa.mh{b * rpb + r} = sb.mh{b * rpb + r}" for r in range(rpb))
            + " THEN 1 ELSE 0 END)"
            for b in range(bands)
        )
        cfg_rows.append(f"""
    SELECT '{bands}x{rpb}' AS config,
           (SELECT CAST((sum(CASE WHEN cand THEN 1 ELSE 0 END) * 1000000)
                        // greatest(count(*), 1) AS BIGINT)
            FROM (SELECT ({band_terms}) >= 1 AS cand, j.s_jac
                  FROM j JOIN sig sa ON sa.id = j.ia JOIN sig sb ON sb.id = j.ib) x
            WHERE s_jac >= CAST('0.9' AS DOUBLE)) AS recall_ppm,
           (SELECT CAST((sum(CASE WHEN cand THEN 1 ELSE 0 END) * 1000000)
                        // greatest(count(*), 1) AS BIGINT)
            FROM (SELECT ({band_terms}) >= 1 AS cand, j.s_jac
                  FROM j JOIN sig sa ON sa.id = j.ia JOIN sig sb ON sb.id = j.ib) x
            WHERE s_jac < CAST('0.3' AS DOUBLE)) AS false_candidate_ppm""")
    body = "\nUNION ALL".join(cfg_rows)
    return rf"""
    WITH docs AS (
        SELECT doc_id AS id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        FROM documents WHERE doc_id < 100 AND text IS NOT NULL
        UNION ALL
        SELECT doc_id + 100000 AS id,
               regexp_replace(lower(trim(text || ' calibration tail')), '\s+', ' ', 'g') AS t
        FROM documents WHERE doc_id < 50 AND text IS NOT NULL
    ),
    sh AS (
        SELECT id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(string_split(t, ' ')) - 2, 1) + 1),
                   i -> array_to_string((string_split(t, ' '))[i:i+2], ' ')))) AS s
        FROM docs
    ),
    hs AS (SELECT id, ('0x' || substr(md5(s), 1, 15))::BIGINT % {p} AS h FROM sh),
    sig AS (SELECT id, {mh_cols} FROM hs GROUP BY id),
    sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY 1),
    inter AS (
        SELECT a.id AS ia, b.id AS ib, CAST(count(*) AS BIGINT) AS n_shared
        FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2
    ),
    j AS (
        SELECT ia, ib, n_shared / (za.sz + zb.sz - n_shared) AS s_jac
        FROM inter JOIN sizes za ON za.id = ia JOIN sizes zb ON zb.id = ib
    )
    {body}
    """


@query("q627_lsh_band_sweep", _q627_oracle())
def q627(spark: SparkSession, sf: str) -> DataFrame:
    """LSH banding-config sweep over the SAME 32-perm signatures: 8×4
    (high recall, more false candidates) vs 4×8 (stricter) evaluated
    on the q570 planted corpus — recall on jaccard ≥ 0.9 pairs and the
    false-candidate rate on < 0.3 pairs, both exact integer ppm; the
    config table a dedup pipeline consults before committing shuffle
    budget."""
    from .operators.dedup import minhash_signature_df, shingles

    base = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    d = base.where(F.col("doc_id") < 100).select("doc_id", "text").unionByName(
        base.where(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" calibration tail")).alias("text"),
        )
    )
    sig = minhash_signature_df(d, "text", "doc_id", num_perm=32, shingle_n=3, hash_kind="md5")
    ex = d.select(F.col("doc_id").alias("id"), F.explode(shingles(F.col("text"), 3)).alias("s"))
    sizes = ex.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    za = sizes.select(F.col("id").alias("ia"), F.col("sz").alias("sza"))
    zb = sizes.select(F.col("id").alias("ib"), F.col("sz").alias("szb"))
    j = inter.join(za, "ia").join(zb, "ib").select(
        "ia", "ib",
        (F.col("n_shared") / (F.col("sza") + F.col("szb") - F.col("n_shared"))).alias("s_jac"),
    )
    sa = sig.select(F.col("doc_id").alias("ia"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(32)])
    sb = sig.select(F.col("doc_id").alias("ib"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(32)])
    scored = j.join(sa, "ia").join(sb, "ib").persist()
    outs = []
    for bands, rpb in ((8, 4), (4, 8)):
        band_terms = " + ".join(
            "(CASE WHEN "
            + " AND ".join(f"a{bb * rpb + r} = b{bb * rpb + r}" for r in range(rpb))
            + " THEN 1 ELSE 0 END)"
            for bb in range(bands)
        )
        cand = scored.select("s_jac", (F.expr(f"({band_terms})") >= 1).alias("cand"))
        hi = cand.where(F.col("s_jac") >= 0.9).agg(
            F.expr(
                "CAST((sum(CASE WHEN cand THEN 1 ELSE 0 END) * 1000000)"
                " DIV greatest(count(*), 1) AS BIGINT)"
            ).alias("recall_ppm")
        )
        lo = cand.where(F.col("s_jac") < 0.3).agg(
            F.expr(
                "CAST((sum(CASE WHEN cand THEN 1 ELSE 0 END) * 1000000)"
                " DIV greatest(count(*), 1) AS BIGINT)"
            ).alias("false_candidate_ppm")
        )
        outs.append(
            hi.crossJoin(lo).select(
                F.lit(f"{bands}x{rpb}").alias("config"), "recall_ppm", "false_candidate_ppm"
            )
        )
    return outs[0].unionByName(outs[1])


# ------------------------------------------------------------------ q628
def _q628_oracle() -> str:
    picks = []
    for p in (6, 8):
        m = 1 << p
        rem = 60 - p
        alpha = repr(0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 53))
        picks.append(f"""
    SELECT CAST({p} AS BIGINT) AS p, CAST({m} AS BIGINT) AS m, exact_distinct,
           round(CASE WHEN {alpha} / ((s + ({m} - used) * (1::BIGINT << 53)))::DOUBLE
                           <= CAST('2.5' AS DOUBLE) * {m} AND ({m} - used) > 0
                      THEN CAST({m} AS DOUBLE) * ln(CAST({m} AS DOUBLE) / ({m} - used))
                      ELSE {alpha} / ((s + ({m} - used) * (1::BIGINT << 53)))::DOUBLE
                 END, 6) AS estimate
    FROM (
        SELECT count(*) AS used, sum((1::BIGINT << (53 - rho))) AS s
        FROM (
            SELECT CAST(hv >> {rem} AS INT) AS bucket,
                   max(CAST(CASE WHEN (hv & ((1::BIGINT << {rem}) - 1)) = 0 THEN {rem + 1}
                        ELSE {rem} - length(bin(hv & ((1::BIGINT << {rem}) - 1))) + 1
                   END AS INT)) AS rho
            FROM h GROUP BY 1
        )
    ) CROSS JOIN ex""")
    body = "\nUNION ALL".join(picks)
    return f"""
    WITH h AS (
        SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS hv
        FROM events WHERE user_id IS NOT NULL
    ),
    ex AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events WHERE user_id IS NOT NULL
    )
    {body}
    """


@query("q628_hll_p_sweep", _q628_oracle())
def q628(spark: SparkSession, sf: str) -> DataFrame:
    """HLL precision sweep: the SAME portable hash stream estimated at
    p=6 (64 registers) and p=8 (256) beside the exact distinct count —
    the register-budget sizing table (4× memory buys ~2× lower
    standard error); integer-harmonic sums, the 2.5m small-range
    switch with m-scaled thresholds (operators/sketch.hll_registers_by
    parameterization)."""
    from .operators.sketch import hll_registers_by

    ev = load_table(spark, sf, "events")
    ex = ev.where(F.col("user_id").isNotNull()).agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    outs = []
    for p in (6, 8):
        m = 1 << p
        alpha = 0.7213 / (1.0 + 1.079 / m) * m * m * float(1 << 53)
        regs = hll_registers_by(
            ev.select(F.lit(1).alias("g"), "user_id"), ["g"], "user_id", p=p, hash_kind="md5"
        )
        agg = regs.agg(
            F.count(F.lit(1)).alias("used"),
            F.sum(F.expr("CAST(shiftleft(1L, 53 - rho) AS BIGINT)")).alias("s"),
        )
        raw = F.lit(alpha) / (
            (F.col("s") + (F.lit(m) - F.col("used")) * F.lit(1 << 53)).cast("double")
        )
        v = F.lit(m) - F.col("used")
        est = F.when(
            (raw <= F.lit(2.5) * m) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v),
        ).otherwise(raw)
        outs.append(
            agg.crossJoin(F.broadcast(ex)).select(
                F.lit(p).cast("long").alias("p"),
                F.lit(m).cast("long").alias("m"),
                "exact_distinct",
                F.round(est, 6).alias("estimate"),
            )
        )
    return outs[0].unionByName(outs[1])


# ------------------------------------------------------------------ q629
@query(
    "q629_bloom_fpr_audit",
    """
    WITH members AS (
        SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS key
        FROM events WHERE event_type = 'purchase'
    ),
    probes AS (
        SELECT DISTINCT 'absent' || CAST(event_id % 5000 AS VARCHAR) AS key FROM events
    ),
    ks(i) AS (VALUES (0), (1), (2)),
    bpos AS (
        SELECT DISTINCT
               (('0x' || substr(md5(key || '|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 8192)
                 AS pos
        FROM members CROSS JOIN ks
    ),
    words AS (
        SELECT pos // 63 AS w, bit_or(1::BIGINT << CAST(pos % 63 AS INT)) AS bits
        FROM bpos GROUP BY 1
    ),
    stats AS (
        SELECT CAST(sum(bit_count(bits)) AS BIGINT) AS set_bits FROM words
    ),
    ppos AS (
        SELECT key,
               (('0x' || substr(md5(key || '|' || CAST(i AS VARCHAR)), 1, 15))::BIGINT % 8192)
                 AS pos
        FROM probes CROSS JOIN ks
    ),
    hits AS (
        SELECT key FROM ppos JOIN words ON words.w = ppos.pos // 63
        WHERE ((words.bits >> CAST(pos % 63 AS INT)) & 1) = 1
        GROUP BY key HAVING count(*) = 3
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
           s.set_bits,
           (s.set_bits * 1000000) // 8192 AS density_ppm,
           (SELECT CAST(count(*) AS BIGINT) FROM probes) AS n_probes,
           ((SELECT CAST(count(*) AS BIGINT) FROM hits) * 1000000)
             // (SELECT count(*) FROM probes) AS measured_fp_ppm,
           round((s.set_bits / CAST(8192.0 AS DOUBLE))
                 * (s.set_bits / CAST(8192.0 AS DOUBLE))
                 * (s.set_bits / CAST(8192.0 AS DOUBLE)) * 1000000, 3) AS theory_fp_ppm
    FROM stats s
    """,
)
def q629(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter false-positive audit: an 8192-bit / 3-hash filter
    over purchase users is probed with a DISJOINT key namespace —
    measured FP rate in exact integer ppm beside the density³ theory
    (mirrored double chain); the bit array itself is rebuilt by both
    engines (63-bit word convention), so filter, probes, and theory
    all replay."""
    from .operators.pipeline import _bloom_pos

    m, k = 8192, 3
    ev = load_table(spark, sf, "events")
    members = (
        ev.where(F.col("event_type") == "purchase")
        .select(F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("key"))
        .distinct()
    )
    probes = ev.select(
        F.concat(F.lit("absent"), (F.col("event_id") % 5000).cast("string")).alias("key")
    ).distinct()
    entries = F.explode(
        F.array(*[_bloom_pos(F.col("key"), i, m, "md5") for i in range(k)])
    ).alias("pos")
    bpos = members.select(entries).distinct()
    words = bpos.select(
        F.expr("pos DIV 63").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("b"),
    ).groupBy("w").agg(F.bit_or("b").alias("bits"))
    stats = words.agg(F.sum(F.bit_count("bits")).cast("long").alias("set_bits"))
    ppos = probes.select("key", entries)
    hits = (
        ppos.join(words, F.col("w") == F.expr("pos DIV 63"))
        .where(F.expr("((bits >> CAST(pos % 63 AS INT)) & 1) = 1"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == k)
    )
    nm = members.agg(F.count(F.lit(1)).cast("long").alias("n_members"))
    np_ = probes.agg(F.count(F.lit(1)).cast("long").alias("n_probes"))
    nh = hits.agg(F.count(F.lit(1)).cast("long").alias("n_fp"))
    d = F.col("set_bits") / F.lit(8192.0)
    return (
        stats.crossJoin(F.broadcast(nm)).crossJoin(F.broadcast(np_)).crossJoin(F.broadcast(nh))
        .select(
            "n_members", "set_bits",
            F.expr("(set_bits * 1000000) DIV 8192").alias("density_ppm"),
            "n_probes",
            F.expr("(n_fp * 1000000) DIV n_probes").alias("measured_fp_ppm"),
            F.round(d * d * d * 1000000, 3).alias("theory_fp_ppm"),
        )
    )


# ------------------------------------------------------------------ q630
def _q630_oracle() -> str:
    from .queries import ORACLES

    return f"""
    WITH lsh AS ({ORACLES["q627_lsh_band_sweep"]}),
    hll AS ({ORACLES["q628_hll_p_sweep"]}),
    bloom AS ({ORACLES["q629_bloom_fpr_audit"]})
    SELECT 'lsh_bands:' || config AS technique, 'recall_ppm' AS metric,
           CAST(recall_ppm AS DOUBLE) AS value
    FROM lsh
    UNION ALL
    SELECT 'hll_p' || CAST(p AS VARCHAR), 'abs_err_ppm',
           round(abs(estimate - exact_distinct) * 1000000 / exact_distinct, 3)
    FROM hll
    UNION ALL
    SELECT 'bloom_8192x3', 'theory_gap_ppm',
           round(abs(measured_fp_ppm - theory_fp_ppm), 3)
    FROM bloom
    """


@query("q630_approximation_board", _q630_oracle())
def q630(spark: SparkSession, sf: str) -> DataFrame:
    """QUERY 630 — the approximation audit board: LSH banding recalls
    (q627), HLL precision errors (q628), and the Bloom measured-vs-
    theory gap (q629) in one relation, every number produced AND
    SQL-replayed by registered pipelines — the one-page answer to
    "which approximation parameters are safe on this corpus"."""
    from .queries import QUERIES

    lsh = QUERIES["q627_lsh_band_sweep"](spark, sf)
    hll = QUERIES["q628_hll_p_sweep"](spark, sf)
    bloom = QUERIES["q629_bloom_fpr_audit"](spark, sf)
    r1 = lsh.select(
        F.concat(F.lit("lsh_bands:"), F.col("config")).alias("technique"),
        F.lit("recall_ppm").alias("metric"),
        F.col("recall_ppm").cast("double").alias("value"),
    )
    r2 = hll.select(
        F.concat(F.lit("hll_p"), F.col("p").cast("string")).alias("technique"),
        F.lit("abs_err_ppm").alias("metric"),
        F.round(
            F.abs(F.col("estimate") - F.col("exact_distinct")) * 1000000
            / F.col("exact_distinct"),
            3,
        ).alias("value"),
    )
    r3 = bloom.select(
        F.lit("bloom_8192x3").alias("technique"),
        F.lit("theory_gap_ppm").alias("metric"),
        F.round(F.abs(F.col("measured_fp_ppm") - F.col("theory_fp_ppm")), 3).alias("value"),
    )
    return r1.unionByName(r2).unionByName(r3)

"""Driver-contract query registry, batch 11 (round 3, third
continuation): market analytics (VWAP, realized variance, drawdown,
Bollinger) — the reference's trading home domain re-expressed
Spark-first — plus Lorenz/Gini concentration, Benford first-digit
audits, and quality-aware dedup cluster canonicalization.
Registers into the same QUERIES/ORACLES dicts as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries import query
from .sources.io import load_table


# ------------------------------------------------------------------ q250
@query(
    "q250_vwap",
    """
    WITH t AS (
        SELECT l_suppkey,
               date_trunc('month', l_shipdate) AS bucket,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(l_quantity AS BIGINT) AS v
        FROM lineitem
    )
    SELECT l_suppkey, bucket,
           (CAST(sum(p * v) AS BIGINT) / CAST(sum(v) AS BIGINT)) / 100 AS vwap,
           CAST(sum(v) AS BIGINT) AS volume,
           count(*) AS n_trades
    FROM t GROUP BY l_suppkey, bucket
    """,
)
def q250(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly VWAP bars per supplier (price=extendedprice,
    volume=quantity): ONE two-stage hash agg; the Σ(p·v) accumulator is
    an exact integer so map-side partials combine associatively — the
    cheapest possible shape for bar-building at 100 TB of ticks."""
    from .operators import finance

    li = load_table(spark, sf, "lineitem")
    return finance.vwap(
        li, "l_suppkey", F.date_trunc("month", F.col("l_shipdate")), "l_extendedprice", "l_quantity"
    )


# ------------------------------------------------------------------ q251
@query(
    "q251_realized_variance",
    """
    WITH p AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS p,
               lag(CAST(round(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pp
        FROM events
    ),
    d AS (SELECT user_id, p - pp AS dp FROM p WHERE pp IS NOT NULL)
    SELECT user_id,
           CAST(sum(dp * dp) AS BIGINT) AS ss_change,
           count(*) AS n_changes,
           sqrt(CAST(sum(dp * dp) AS BIGINT)) / 100 AS realized_vol
    FROM d GROUP BY user_id
    """,
)
def q251(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user realized variance of the ordered value path.  Absolute
    (not log) returns keep every accumulator an exact BIGINT — ln is
    not correctly-rounded and differs by ulps across engines; sqrt IS
    correctly-rounded, so the one float op is engine-identical.  The
    lag window and the aggregation share one (user_id) exchange."""
    from .operators import finance

    ev = load_table(spark, sf, "events")
    return finance.realized_variance(ev, "user_id", ["ts", "event_id"], "value")


# ------------------------------------------------------------------ q252
@query(
    "q252_max_drawdown",
    """
    WITH r AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS p,
               max(CAST(round(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM events
    ),
    e AS (
        SELECT user_id,
               max((peak - p) * 1000000000 + peak) AS enc
        FROM r GROUP BY user_id
    )
    SELECT user_id,
           ((enc - enc % 1000000000) / 1000000000) / 100 AS max_drawdown,
           (enc % 1000000000) / 100 AS peak_at_max_dd
    FROM e
    """,
)
def q252(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user maximum drawdown with the peak it fell from.  Running
    max of integers is exact in any engine (idempotent — no float
    prefix-sum hazard); the (drawdown, peak) argmax packs into one
    BIGINT so drawdown ties resolve deterministically without
    arg_max/struct-max semantics."""
    from .operators import finance

    ev = load_table(spark, sf, "events")
    return finance.max_drawdown(ev, "user_id", ["ts", "event_id"], "value")


# ------------------------------------------------------------------ q253
@query(
    "q253_bollinger",
    """
    WITH r AS (
        SELECT user_id, ts, event_id, value,
               CAST(round(value * 100) AS BIGINT) AS p,
               count(*) OVER w AS cnt,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s1,
               CAST(sum(CAST(round(value * 100) AS BIGINT)
                        * CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS s2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts, event_id, value,
           CASE WHEN cnt = 20 THEN s1 / 2000 END AS bb_mid,
           CASE WHEN cnt = 20 THEN s1 / 2000 + 2 * (sqrt(20 * s2 - s1 * s1) / 2000) END AS bb_upper,
           CASE WHEN cnt = 20 THEN s1 / 2000 - 2 * (sqrt(20 * s2 - s1 * s1) / 2000) END AS bb_lower
    FROM r
    """,
)
def q253(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling Bollinger bands (20-row trailing, full-window NULL heads
    per the reference's rolling convention).  Moments compose from
    exact integer rolling sums — safe under DuckDB's segment-tree
    window association — and the only float ops are / and sqrt on
    identical operands."""
    from .operators import finance

    ev = load_table(spark, sf, "events")
    return finance.bollinger(ev, "user_id", ["ts", "event_id"], "value", n=20, k=2)


# ------------------------------------------------------------------ q254
@query(
    "q254_gini",
    """
    WITH v AS (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS v,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)) AS i
        FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(v) AS BIGINT) / 100 AS total,
           (2.0 * CAST(sum(i * v) AS BIGINT)) / CAST(count(*) * CAST(sum(v) AS BIGINT) AS DOUBLE)
               - (count(*) + 1.0) / count(*) AS gini
    FROM v GROUP BY o_orderpriority
    """,
)
def q254(spark: SparkSession, sf: str) -> DataFrame:
    """Per-priority Gini concentration of order value — the skew audit
    behind salting decisions and revenue-concentration reports.  Σi·xᵢ
    is tie-invariant (equal values permuting within a rank block leave
    the sum unchanged) so row_number needs no tiebreak; all sums stay
    integer until two final IEEE-exact divisions."""
    from .operators import finance

    o = load_table(spark, sf, "orders")
    return finance.lorenz_gini(o, "o_orderpriority", "o_totalprice")


# ------------------------------------------------------------------ q255
def _benford_oracle() -> str:
    from .operators.finance import BENFORD_P

    # CAST from a quoted STRING: DuckDB's decimal-literal → DOUBLE cast
    # is not correctly rounded (0.12493873660829993 lands 1 ulp off);
    # the string parse is strtod-exact and matches F.lit's Python float.
    case = " ".join(f"WHEN {d} THEN CAST('{p!r}' AS DOUBLE)" for d, p in BENFORD_P.items())
    return f"""
    WITH c AS (
        SELECT CAST(NULLIF(regexp_extract(CAST(abs(l_extendedprice) AS VARCHAR), '([1-9])', 1), '') AS INT) AS digit
        FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_extendedprice != 0
    ),
    g AS (SELECT digit, count(*) AS observed FROM c WHERE digit IS NOT NULL GROUP BY digit),
    n AS (SELECT CAST(sum(observed) AS BIGINT) AS nn FROM g),
    e AS (SELECT digit, observed, (CASE digit {case} END) * nn AS expected FROM g, n)
    SELECT digit, observed, expected,
           (observed - expected) * (observed - expected) / expected AS chi2_component
    FROM e
    """


@query("q255_benford", _benford_oracle())
def q255(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-significant-digit audit of extended prices.  The
    digit comes from the decimal rendering (regexp), not log10 — exact
    and portable; expected probabilities are repr-identical literals in
    both engines so n·p and the χ² components match bit-for-bit.  One
    ≤9-group hash agg; the per-digit components are emitted instead of
    a cross-row float total (engine summation order would differ)."""
    from .operators import finance

    li = load_table(spark, sf, "lineitem")
    return finance.benford_audit(li, "l_extendedprice")


# ------------------------------------------------------------------ q256
@query(
    "q256_dedup_keep_best",
    """
    WITH RECURSIVE base_edges AS (
        SELECT doc_id AS src, doc_id + 1 AS dst
        FROM documents
        WHERE doc_id % 10 < 3 AND doc_id + 1 <= (SELECT max(doc_id) FROM documents)
    ),
    edges AS (
        SELECT src, dst FROM base_edges
        UNION SELECT dst AS src, src AS dst FROM base_edges
    ),
    walk(node, reach) AS (
        SELECT src, src FROM (SELECT DISTINCT src FROM edges)
        UNION
        SELECT w.node, e.dst FROM walk w JOIN edges e ON w.reach = e.src
    ),
    comp AS (SELECT node, min(reach) AS component FROM walk GROUP BY node),
    q AS (
        SELECT c.component, d.doc_id, d.n_chars
        FROM comp c JOIN documents d ON d.doc_id = c.node
    ),
    enc AS (
        SELECT component, count(*) AS cluster_size,
               max(CAST(n_chars AS BIGINT) * 1000000000 + doc_id) AS e
        FROM q GROUP BY component
    )
    SELECT component, cluster_size,
           e % 1000000000 AS keep_id,
           (e - e % 1000000000) / 1000000000 AS keep_quality
    FROM enc
    """,
)
def q256(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware canonical selection per duplicate cluster: connected
    components over the q150 synthetic chain graph, then per-component
    argmax quality (n_chars, doc_id tiebreak) via a packed-BIGINT max —
    the KEEP/DROP policy step of a dedup pipeline (keep the
    highest-quality member, not an arbitrary one)."""
    from .operators import dedup

    d = load_table(spark, sf, "documents")
    ids = d.select("doc_id")
    mx = ids.agg(F.max("doc_id").alias("m"))
    pairs = (
        ids.where(F.col("doc_id") % 10 < 3)
        .crossJoin(F.broadcast(mx))
        .where(F.col("doc_id") + 1 <= F.col("m"))
        .select(F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"))
    )
    return dedup.keep_best(pairs, d, id_col="doc_id", quality_col="n_chars")

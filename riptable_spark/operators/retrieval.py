"""Keyword retrieval over the corpus: TF-IDF postings and BM25 ranked
search — the lexical side of the similarity-search family (the ANN
operators in ``similarity`` are its dense side).

Scale shape: the corpus text explodes to postings ONCE and is
immediately filtered to the query's terms (a pushed-down isin on the
exploded term — non-matching tokens never aggregate), so the per-query
cost is proportional to the query terms' posting lists, not the corpus.
Document lengths come from a horizontal ``size(split(...))`` (no
explode); corpus stats (N, avgdl) are one scalar aggregate; per-term
document frequencies are a vocabulary-of-the-query-sized relation that
broadcasts. Per-document score summation runs in FIXED literal term
order (conditional aggregates added left-to-right), which both keeps
the plan a single hash aggregation and makes the floating-point sum
deterministic and engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text


def _doc_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(normalize_text(F.col(text_col)), " ")
    toks = F.filter(toks, lambda x: x != "")
    return df.select(F.col(id_col), toks.alias("__toks__"), F.size(toks).alias("dl"))


def term_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", terms: list[str] | None = None
) -> DataFrame:
    """(id, term, tf, dl) posting rows; with ``terms`` given, tokens are
    filtered BEFORE the aggregation so only matching postings shuffle."""
    d = _doc_tokens(df, text_col, id_col)
    e = d.select(id_col, "dl", F.explode("__toks__").alias("term"))
    if terms is not None:
        e = e.where(F.col("term").isin(terms))
    return e.groupBy(id_col, "term", "dl").agg(F.count(F.lit(1)).cast("double").alias("tf"))


def tfidf_postings(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full TF-IDF posting relation: tf, df_t, idf = ln((N+1)/(df_t+1))+1
    (smoothed, sklearn-style) and tfidf = tf · idf. The doc-frequency
    relation is vocabulary-sized and broadcasts back onto postings."""
    post = term_postings(df, text_col, id_col)
    n_docs = df.select(F.count(F.lit(1)).alias("N"))
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df_t"))
    idf = F.log((F.col("N") + 1) / (F.col("df_t") + 1)) + 1
    return (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term", "tf", "df_t", idf.alias("idf"), (F.col("tf") * idf).alias("tfidf"))
    )


def bm25_search(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k (Robertson/Okapi, the +1 idf variant that keeps idf
    positive): score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    Returns (id, score, rank). Candidate generation reads only the query
    terms' postings; ranking is one TakeOrdered top-k."""
    d = _doc_tokens(df, text_col, id_col)
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("N"), F.avg("dl").alias("avgdl")
    )
    post = term_postings(df, text_col, id_col, terms)
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df_t"))
    scored = post.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    idf = F.log(1 + (F.col("N") - F.col("df_t") + 0.5) / (F.col("df_t") + 0.5))
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    scored = scored.select(
        id_col, "term", (idf * (F.col("tf") * (k1 + 1)) / denom).alias("s")
    )
    # fixed literal term order → deterministic, portable float sum
    per_term = [
        F.coalesce(F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)).alias(f"__s{i}__")
        for i, t in enumerate(terms)
    ]
    agg = scored.groupBy(id_col).agg(*per_term)
    total = None
    for i in range(len(terms)):
        c = F.col(f"__s{i}__")
        total = c if total is None else total + c
    ranked = agg.select(F.col(id_col), total.alias("score")).orderBy(
        F.col("score").desc(), id_col
    )
    # rank window runs over the ≤k-row result of TakeOrdered — global by
    # construction but bounded (the lint exemption for tiny relations)
    w = Window.orderBy(F.col("score").desc(), id_col)
    return ranked.limit(k).withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al., the standard hybrid-
    search combiner): fused(d) = Σ_r 1/(k + rank_r(d)) over the input
    rankings (BM25, ANN, recency...), documents missing from a ranking
    contribute 0.  The per-ranking terms join as SEPARATE columns in a
    FIXED order, so the float sum has one deterministic association —
    engine-portable (the bm25_search discipline).  Each input is
    already top-k-sized, so every join is broadcast-tiny.
    Returns (id, rrf_score, rank)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    base = None
    for i, r in enumerate(rankings):
        side = r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias(f"__r{i}__"),
        )
        base = side if base is None else base.join(side, on=id_col, how="full_outer")
    total = None
    for i in range(len(rankings)):
        c = F.coalesce(F.col(f"__r{i}__"), F.lit(0.0))
        total = c if total is None else total + c
    fused = base.select(F.col(id_col), total.alias("rrf_score"))
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    out = fused.orderBy(F.col("rrf_score").desc(), id_col)
    if top is not None:
        out = out.limit(top)
    return out.withColumn("rank", F.row_number().over(w))


def top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tf: int = 1,
) -> DataFrame:
    """Per-document keyword extraction: top-``k`` terms by a tf/df score.

    The ranking key is the exact integer ``tf·1_000_000 DIV df`` (term
    frequency up-weighted, document frequency down-weighted — the
    tf-idf ordering without ln, whose ulps differ across engines), with
    the term string as tiebreak, so the top-k set is deterministic and
    SQL-replayable.  Postings shuffle once on term for df, once on doc
    for the top-k window; the df relation is vocabulary-sized and
    broadcasts.
    """
    post = term_postings(df, text_col, id_col).select(
        id_col, "term", F.col("tf").cast("bigint").alias("tf")
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df_t"))
    scored = post.join(F.broadcast(dfreq), "term").where(F.col("tf") >= min_tf)
    score = F.expr("tf * 1000000 DIV df_t")
    w = Window.partitionBy(id_col).orderBy(score.desc(), F.col("term"))
    return (
        scored.withColumn("score_key", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df_t", "score_key", "rank")
    )


def positional_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    terms: list[str] | None = None,
) -> DataFrame:
    """(id, term, pos) positional posting rows — the inverted-index
    layout phrase and proximity queries need.  With ``terms`` given,
    non-matching tokens are dropped BEFORE anything shuffles, so a
    phrase query only moves the postings of its own words."""
    d = _doc_tokens(df, text_col, id_col)
    e = d.select(
        id_col, F.posexplode("__toks__").alias("pos", "term")
    )
    if terms is not None:
        e = e.where(F.col("term").isin(terms))
    return e


def phrase_search(
    df: DataFrame,
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching via positional-posting adjacency joins —
    "a b c" matches where pos(b) = pos(a)+1 and pos(c) = pos(a)+2,
    the classic inverted-index phrase algorithm (never a regex scan of
    the corpus).

    Plan: one postings build filtered to the phrase's terms, then
    k−1 equi-joins keyed on (doc, absolute position) — each join input
    is only that term's postings.  Uses the same normalization as
    BM25/term_postings, so phrase semantics match the rest of the
    retrieval stack.  Emits (id, n_matches) for documents containing
    the phrase at least once.
    """
    # phrase terms must be pre-normalized words (lowercase, no
    # punctuation) — the corpus side runs the shared normalize_text
    spark_norm = [t for t in phrase.lower().split() if t]
    if not spark_norm:
        raise ValueError("empty phrase")
    posts = positional_postings(df, text_col, id_col, terms=list(set(spark_norm)))
    base = (
        posts.where(F.col("term") == spark_norm[0])
        .select(F.col(id_col), F.col("pos").alias("__p0__"))
    )
    for i, t in enumerate(spark_norm[1:], start=1):
        nxt = posts.where(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - i).alias("__p0__")
        )
        base = base.join(nxt, on=[id_col, "__p0__"])
    return base.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_matches")
    )


def trending_terms(
    df: DataFrame,
    period: Column,
    text_col: str = "text",
    min_count: int = 3,
    lift_num: int = 2,
    lift_den: int = 1,
) -> DataFrame:
    """Trending-term detection: terms whose within-period frequency
    exceeds ``lift_num/lift_den`` times their corpus-wide rate — the
    "what changed this week" feed over a document stream.

    With c_tp the term's period count, c_t its corpus count, T_p the
    period's token total and T the corpus total, the trend test

        (c_tp/T_p) / (c_t/T) > lift  ⟺  c_tp·T·lift_den > c_t·T_p·lift_num

    is exact BIGINT cross-multiplication; the reported lift is one
    fixed-tree expression of the same integers.  One explode→(term,
    period) agg; corpus totals reduce FROM that relation (no second
    scan) and broadcast back.  Returns
    (period, term, c_tp, c_t, t_p, t_total, lift, trending).
    """
    d = _doc_tokens(df.withColumn("__per__", period), text_col, "__per__")
    e = d.select(F.col("__per__"), F.explode("__toks__").alias("term"))
    tp = e.groupBy("__per__", "term").agg(F.count(F.lit(1)).cast("long").alias("c_tp"))
    per_tot = tp.groupBy("__per__").agg(F.sum("c_tp").cast("long").alias("t_p"))
    term_tot = tp.groupBy("term").agg(F.sum("c_tp").cast("long").alias("c_t"))
    grand = per_tot.agg(F.sum("t_p").cast("long").alias("t_total"))
    out = (
        tp.where(F.col("c_tp") >= min_count)
        .join(F.broadcast(per_tot), on="__per__")
        .join(term_tot, on="term")
        .crossJoin(F.broadcast(grand))
    )
    lift = (F.col("c_tp") * F.col("t_total")) / (F.col("c_t") * F.col("t_p"))
    trending = (
        F.col("c_tp") * F.col("t_total") * lift_den
        > F.col("c_t") * F.col("t_p") * lift_num
    )
    return out.select(
        F.col("__per__").alias("period"), "term", "c_tp", "c_t", "t_p", "t_total",
        lift.alias("lift"), trending.alias("trending"),
    )


def dirichlet_qlm(
    df: DataFrame,
    terms: list[str],
    mu: int = 2000,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty) — the language-modeling counterpart of
    :func:`bm25_search`:

        score(d) = Π_t (tf_t,d + μ·p_c(t)) / (dl_d + μ)

    with p_c the corpus unigram probability.  Instead of the usual
    Σ log (a transcendental no engine pair reproduces), the ranking
    key is the PRODUCT of per-term ratios in FIXED literal term order —
    every factor is a single divide of exact integers
    ((tf·T + μ·c_t) / ((dl+μ)·T)), so the product double is
    engine-identical and the top-k selection deterministic.  Candidate
    generation reads only the query terms' postings (documents matching
    no term score 0 and never rank).  Returns (id, score, rank).
    """
    d = _doc_tokens(df, text_col, id_col)
    total = d.agg(F.sum("dl").cast("long").alias("t_total"))
    post = term_postings(df, text_col, id_col, terms)
    cfreq = (
        _doc_tokens(df, text_col, id_col)
        .select(F.explode("__toks__").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("c_t"))
    )
    scored = post.join(F.broadcast(cfreq), on="term").crossJoin(F.broadcast(total))
    per_term = [
        F.min(
            F.when(
                F.col("term") == t,
                (F.col("tf").cast("long") * F.col("t_total") + mu * F.col("c_t"))
                / ((F.col("dl") + mu) * F.col("t_total")),
            )
        ).alias(f"__f{i}__")
        for i, t in enumerate(terms)
    ]
    dl_and_factors = scored.groupBy(id_col, "dl").agg(*per_term).crossJoin(F.broadcast(total))
    cmap = cfreq.collect()
    c_by_term = {r["term"]: int(r["c_t"]) for r in cmap}
    score = None
    for i, t in enumerate(terms):
        # absent term: smoothing-only factor μ·c_t / ((dl+μ)·T)
        ct = c_by_term.get(t, 0)
        fallback = (F.lit(mu) * F.lit(ct)) / ((F.col("dl") + mu) * F.col("t_total"))
        fac = F.coalesce(F.col(f"__f{i}__"), fallback)
        score = fac if score is None else score * fac
    ranked = dl_and_factors.select(F.col(id_col), score.alias("score"))
    w = Window.orderBy(F.col("score").desc(), F.col(id_col))
    return ranked.orderBy(F.col("score").desc(), id_col).limit(k).withColumn(
        "rank", F.row_number().over(w)
    )


def position_bias_em(
    df: DataFrame,
    item_col: str,
    pos_col: str,
    click_col: str,
) -> DataFrame:
    """Position-bias model (PBM) estimation for search/ads ranking —
    P(click) = θ_position · γ_item — via two unrolled EM rounds
    (bounded rounds ARE the algorithm, the pagerank contract).

    From the (item, position) contingency cells: γ¹ is each item's CTR
    (θ⁰ ≡ 1), θ¹_p = clicks_p / Σ_i n_ip·γ¹_i, then γ²_i = c_i /
    Σ_p n_ip·θ¹_p and θ²_p = c_p / Σ_i n_ip·γ²_i.  Every denominator
    is a POSITION/ITEM-ORDERED LEFT FOLD over the tiny aggregated cell
    relation (F.aggregate / list_reduce — never a hash-agg float sum,
    ORACLES rule 22), every per-cell term is exact-integer arithmetic
    with ONE divide, so both EM rounds are engine-exact.  Returns one
    row per position: (pos, n_impressions, n_clicks, theta1, theta2).

    At 100 TB the raw log reduces to |items|×|positions| cells in one
    two-stage agg; everything after runs on that bounded relation.
    """
    i, p = F.col(item_col), F.col(pos_col)
    c = F.col(click_col).cast("long")
    cells = df.groupBy(i.alias("item"), p.alias("pos")).agg(
        F.count(F.lit(1)).cast("long").alias("n_ip"),
        F.sum(c).cast("long").alias("c_ip"),
    )
    item_stats = cells.groupBy("item").agg(
        F.sum("n_ip").cast("long").alias("n_i"),
        F.sum("c_ip").cast("long").alias("c_i"),
    )
    pos_stats = cells.groupBy("pos").agg(
        F.sum("n_ip").cast("long").alias("n_p"),
        F.sum("c_ip").cast("long").alias("c_p"),
    )

    def _fold(grouped, key_col, sort_col, term):
        return grouped.groupBy(key_col).agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col(sort_col), term.alias("t")))),
                    lambda s: s.getField("t"),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("den")
        )

    j1 = cells.join(item_stats, "item")
    den1 = _fold(j1, "pos", "item", (F.col("n_ip") * F.col("c_i")) / F.col("n_i"))
    theta1 = pos_stats.join(den1, "pos").select(
        "pos", "n_p", "c_p", (F.col("c_p") / F.col("den")).alias("theta1")
    )

    j2 = cells.join(theta1.select("pos", "theta1"), "pos")
    den2 = _fold(j2, "item", "pos", F.col("n_ip") * F.col("theta1"))
    gamma2 = item_stats.join(den2, "item").select(
        "item", (F.col("c_i") / F.col("den")).alias("gamma2")
    )

    j3 = cells.join(gamma2, "item")
    den3 = _fold(j3, "pos", "item", F.col("n_ip") * F.col("gamma2"))
    return (
        theta1.join(den3, "pos")
        .select(
            "pos",
            F.col("n_p").alias("n_impressions"),
            F.col("c_p").alias("n_clicks"),
            "theta1",
            (F.col("c_p") / F.col("den")).alias("theta2"),
        )
    )

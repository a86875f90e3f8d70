"""Driver-contract query registry, batch 6 (round 2): training-data
pipeline operators — benchmark decontamination, deterministic hash
splits, within-doc repetition metrics, sequence packing, stratified
sampling. Registers into the same QUERIES/ORACLES dicts as queries.py.

Oracle portability: split/sample queries use the md5-derived 60-bit
hash (dedup._base_hash64('md5') ≡ ('0x'||substr(md5(s),1,15))::BIGINT
in DuckDB) so the WHOLE pipeline replays in SQL; production callers use
xxhash64 (same shape, ~3-5× cheaper).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import pipeline as pl
from .operators import text as tx
from .queries import query
from .sources.io import load_table

# DuckDB word-3-gram CTE over normalized text, shared by q131's oracle.
_GRAMS_CTE = """
    toks AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
        FROM documents
    ),
    grams AS (
        SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
        FROM toks, unnest(generate_series(1, greatest(len(t)-2, 1))) AS u(i)
    )
"""

_MD5_BUCKET = "(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % {b})"


@query(
    "q131_decontaminate",
    f"""
    WITH {_GRAMS_CTE},
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
    corpus AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id >= 10)
    SELECT c.doc_id, count(*) AS n_hits
    FROM corpus c JOIN bench b USING (g)
    GROUP BY c.doc_id
    HAVING count(*) >= 5
    """,
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: word-3-gram TYPE overlap between the
    corpus (doc_id ≥ 10) and a broadcast 'benchmark' slice (doc_id < 10);
    documents with ≥5 shared gram types are the contaminated set. The
    benchmark reduces to a broadcast distinct-shingle relation, so the
    corpus text never shuffles — only (doc_id, 1) pairs for matched
    grams reach the count aggregation."""
    d = load_table(spark, sf, "documents")
    return pl.decontaminate(
        d.where(F.col("doc_id") >= 10),
        d.where(F.col("doc_id") < 10),
        "text",
        "doc_id",
        n=3,
        min_hits=5,
    )


@query(
    "q132_hash_split",
    f"""
    SELECT split, count(*) AS n, round(avg(n_chars), 4) AS avg_chars
    FROM (
        SELECT CASE WHEN {_MD5_BUCKET.format(b=1000)} < 800 THEN 'train'
                    WHEN {_MD5_BUCKET.format(b=1000)} < 900 THEN 'val'
                    ELSE 'test' END AS split,
               n_chars
        FROM documents
    ) GROUP BY split
    """,
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by hashed doc_id —
    pure codegen projection, rerun-stable (no RNG), validated here by
    per-split counts + mean doc length."""
    d = load_table(spark, sf, "documents")
    s = pl.hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, hash_kind="md5")
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("n_chars"), 4).alias("avg_chars")
    )


@query(
    "q133_repetition_stats",
    """
    WITH toks AS (
        SELECT doc_id,
               string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
        FROM documents WHERE doc_id < 200
    ),
    grams AS (
        SELECT doc_id, count(DISTINCT array_to_string(t[i:i+1], ' ')) AS nd2
        FROM toks, unnest(generate_series(1, greatest(len(t)-1, 1))) AS u(i)
        GROUP BY doc_id
    )
    SELECT toks.doc_id,
           round(1.0 - len(list_distinct(t))::DOUBLE / len(t), 6) AS dup_token_frac,
           round(1.0 - nd2::DOUBLE / greatest(len(t)-1, 1), 6) AS dup_2gram_frac,
           round(list_max(list_transform(list_distinct(t),
                 x -> len(list_filter(t, y -> y = x))))::DOUBLE / len(t), 6) AS top_token_frac
    FROM toks JOIN grams ON toks.doc_id = grams.doc_id
    """,
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition metrics (Gopher-rule family):
    duplicate-token fraction, duplicate-bigram fraction, top-token mass.
    Horizontal array algebra per row — zero shuffles."""
    d = load_table(spark, sf, "documents").where(F.col("doc_id") < 200)
    r = pl.repetition_stats(d, "text", "doc_id")
    return r.select(
        "doc_id",
        F.round("dup_token_frac", 6).alias("dup_token_frac"),
        F.round("dup_2gram_frac", 6).alias("dup_2gram_frac"),
        F.round("top_token_frac", 6).alias("top_token_frac"),
    )


@query(
    "q134_pack_sequences",
    """
    SELECT grp, bin, count(*) AS n_docs, sum(toks)::BIGINT AS sum_tokens
    FROM (
        SELECT grp, toks,
               floor(coalesce(sum(toks) OVER (PARTITION BY grp ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512)::BIGINT AS bin
        FROM (
            SELECT doc_id, doc_id % 16 AS grp,
                   len(string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS toks
            FROM documents
        )
    ) GROUP BY grp, bin
    """,
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic contiguous sequence packing into 512-token bins
    within each of 16 shard groups (the unit a pretraining pipeline
    packs); one window shuffle on the shard key, groups pack
    independently — embarrassingly parallel at any corpus size."""
    d = load_table(spark, sf, "documents")
    base = d.select(
        "doc_id",
        (F.col("doc_id") % 16).alias("grp"),
        tx.token_count(F.col("text")).alias("toks"),
    )
    packed = pl.pack_sequences(base, ["grp"], "doc_id", "toks", budget=512)
    return packed.groupBy("grp", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").cast("long").alias("sum_tokens"),
    )


@query(
    "q135_stratified_sample",
    f"""
    SELECT lang, count(*) AS n, sum(n_chars)::BIGINT AS chars
    FROM documents
    WHERE {_MD5_BUCKET.format(b=10000)} <
          CAST((CASE lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5 WHEN 'fr' THEN 0.5
                          WHEN 'es' THEN 0.25 ELSE 0.0 END) * 10000 AS BIGINT)
    GROUP BY lang
    """,
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified corpus mixing: per-language keep
    fractions (en 1.0, de/fr 0.5, es 0.25, zh dropped) decided by hashed
    doc_id — a pure filter projection, byte-identical on rerun, shuffle
    only in the validating count."""
    d = load_table(spark, sf, "documents")
    s = pl.stratified_sample(
        d, "lang", {"en": 1.0, "de": 0.5, "fr": 0.5, "es": 0.25}, "doc_id", hash_kind="md5"
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").cast("long").alias("chars")
    )


# =====================================================================
# Positional ops re-expressed relationally (r1 marked N/A-by-design;
# rowid-joins make them real — rt_utils.py:631 mbget)
# =====================================================================

@query(
    "q136_mbget",
    """
    WITH v AS (
        SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS rid, o_totalprice
        FROM orders
    ),
    p AS (
        SELECT c_custkey, (c_custkey * 7919) % ((SELECT count(*) FROM orders) + 1000) AS idx
        FROM customer
    )
    SELECT p.c_custkey, round(v.o_totalprice, 2) AS got
    FROM p LEFT JOIN v ON v.rid = p.idx
    """,
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    """mbget fancy-gather (rt_utils.py:631): positions become an explicit
    deterministic __rowid__ (range-partitioned rank over the UNIQUE key
    o_orderkey — with_rowid requires a total order for cross-engine
    reproducibility; no single-partition window) and the gather is a hash
    equi-join on the 8-byte id; out-of-range positions yield NULL (the
    sentinel bridge), preserving the reference's
    same-shape-as-index contract."""
    from .operators import positional as pos
    from .sources.io import with_rowid

    od = with_rowid(load_table(spark, sf, "orders"), "o_orderkey")
    # modulus as a LAZY 1-row broadcast instead of an eager driver
    # count() (one fewer driver job + orders pass at build; same value)
    m = load_table(spark, sf, "orders").agg(
        (F.count(F.lit(1)) + 1000).alias("__m__")
    )
    idx = load_table(spark, sf, "customer").crossJoin(F.broadcast(m)).select(
        "c_custkey", ((F.col("c_custkey") * 7919) % F.col("__m__")).alias("idx")
    )
    out = pos.mbget(od, idx, "idx", ["o_totalprice"])
    return out.select("c_custkey", F.round("o_totalprice", 2).alias("got"))


@query(
    "q137_group_links",
    """
    WITH v AS (
        SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS rid,
               o_custkey, o_totalprice
        FROM orders
    )
    SELECT rid,
           min(rid) OVER (PARTITION BY o_custkey) AS ifirst,
           max(rid) OVER (PARTITION BY o_custkey) AS ilast,
           lead(rid) OVER (PARTITION BY o_custkey ORDER BY rid) AS inext,
           lag(rid) OVER (PARTITION BY o_custkey ORDER BY rid) AS iprev
    FROM v
    """,
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    """Group linked-list index builders (rt_numpy.py:1767/1823
    makeifirst/ilast/inext/iprev): per row, the positions of its group's
    first/last/next/previous rows — the structures the reference's
    Grouping caches for iGroup walking. On Spark all four are ONE window
    shuffle on the group key over the deterministic rowid; unmatched →
    NULL (the reference's int sentinel)."""
    from .operators import positional as pos
    from .sources.io import with_rowid

    od = with_rowid(load_table(spark, sf, "orders"), "o_orderkey")
    d = pos.make_iprev(
        pos.make_inext(pos.make_ilast(pos.make_ifirst(od, ["o_custkey"]), ["o_custkey"]), ["o_custkey"]),
        ["o_custkey"],
    )
    return d.select(F.col("__rowid__").alias("rid"), "ifirst", "ilast", "inext", "iprev")


# =====================================================================
# IVF full search path (extends q113's coarse quantizer to end-to-end
# ANN: probe nprobe lists, exact-score within lists only)
# =====================================================================

def _ivf_topk_oracle() -> str:
    from .queries4 import _ivf_centroids

    cents = _ivf_centroids()
    vals = ", ".join(
        f"({i}, [" + ", ".join(repr(x) for x in c) + "]::DOUBLE[])" for i, c in enumerate(cents)
    )
    cos = (
        "list_dot_product(a.v, p.qv)"
        " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(p.qv, p.qv)))"
    )
    return f"""
    WITH cents(cid, cv) AS (VALUES {vals}),
    corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    assign AS (
        SELECT vec_id, v, cid FROM (
            SELECT vec_id, v, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY list_distance(v, cv), cid) AS rn
            FROM corpus, cents
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
    probes AS (
        SELECT qid, qv, cid FROM (
            SELECT qid, qv, cid,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY list_distance(qv, cv), cid) AS rn
            FROM q, cents
        ) WHERE rn <= 2
    ),
    scored AS (
        SELECT p.qid, a.vec_id, {cos} AS score
        FROM assign a JOIN probes p ON a.cid = p.cid
    )
    SELECT qid, vec_id, round(score, 6) AS score, rank FROM (
        SELECT qid, vec_id, score,
               row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """


@query("q138_ivf_topk", _ivf_topk_oracle())
def q138(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end IVF ANN search (beyond-reference scale path): corpus
    vectors assigned to 4 inverted lists (broadcast centroids), 3 query
    vectors probe their 2 nearest lists, exact cosine scores ONLY within
    probed lists, top-5 per query. The centroid_id equi-join with the
    broadcast probe relation is what partition-prunes a 100 TB index to
    the probed lists — no all-pairs stage anywhere."""
    from .operators import similarity
    from .queries4 import _ivf_centroids

    e = load_table(spark, sf, "embeddings")
    dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = e.select("vec_id", dvec.alias("embedding"))
    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), dvec.alias("qv")
    )
    cents = spark.createDataFrame(
        [(i, c) for i, c in enumerate(_ivf_centroids())],
        "centroid_id int, centroid_vec array<double>",
    )
    out = similarity.ivf_topk(
        corpus, cents, queries, k=5, nprobe=2,
        query_id_col="qid", query_vec_col="qv",
    )
    return out.select("qid", "vec_id", F.round("score", 6).alias("score"), "rank")

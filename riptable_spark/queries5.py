"""Driver-contract query registry, batch 5 (round 2): scale-safe LSH
embedding dedup, Categorical modes (enum/Dictionary/invalid-bin),
move_* rolling arg-ops, TimeSpan/DateSpan arithmetic, searchsorted
against an array side.
Registers into the same QUERIES/ORACLES dicts as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import similarity
from .queries import query
from .sources.io import load_table


def _sig_sql(planes: list[list[float]]) -> str:
    """DuckDB expression mirroring similarity.lsh_bucket for one table."""
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(f"{x!r}" for x in p) + "]::DOUBLE[]"
        terms.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 THEN {1 << i} ELSE 0 END"
        )
    return " + ".join(terms)


_LSH_TABLES = similarity.lsh_tables(dim=64, n_tables=4, bits_per_table=4)
_SIG_COLS = ", ".join(f"({_sig_sql(t)}) AS sig_{i}" for i, t in enumerate(_LSH_TABLES))
_SIG_MATCH = " OR ".join(f"a.sig_{i} = b.sig_{i}" for i in range(len(_LSH_TABLES)))
_COS = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
    " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


@query(
    "q114_lsh_dedup",
    f"""
    WITH sigs AS (SELECT vec_id, embedding, {_SIG_COLS} FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_COS}, 4) AS cos_sim
    FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id AND ({_SIG_MATCH})
    WHERE {_COS} >= 0.4
    """,
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    """Scale-safe embedding near-dup dedup (VERDICT r1 next-round #5):
    LSH-bucket candidate generation (equi-join on (table, bucket) — never
    a cartesian) → exact cosine verify within buckets. q108's all-pairs
    form stays as the exact-recall oracle baseline; this is the plan that
    survives 100 TB. The oracle replays the identical hyperplanes as SQL
    literals, so candidate sets match bit-for-bit."""
    e = load_table(spark, sf, "embeddings")
    out = similarity.lsh_dedup_pairs(e, dim=64, threshold=0.4, n_tables=4, bits_per_table=4)
    return out.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim"))

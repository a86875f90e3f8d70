"""Byte-pair-encoding (BPE) subword merge training, Spark-first.

The scale insight real BPE trainers use: after ONE corpus pass that
aggregates words to (distinct word, count), every merge iteration runs
on the weighted DISTINCT-WORD relation — typically 10⁵-10⁷ rows no
matter how many TB the corpus is. Each iteration is one pair-count
aggregation over that small relation plus a single-row driver
collect (the chosen merge — same driver-traffic shape as kmeans
centroids / pagerank convergence counts).

Representation: a word's current segmentation is a string of units
separated by TWO spaces, wrapped in single spaces ('␣a␣␣b␣␣c␣').
Applying merge (a, b) is then one LITERAL replace of '␣a␣␣b␣' with
'␣ab␣' — sequential leftmost non-overlapping, which is exactly BPE's
greedy left-to-right application — and stays pure codegen on Spark and
replayable verbatim in SQL (no regex, no lookarounds, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def _units_string(word: Column) -> Column:
    """'abc' → ' a  b  c ' (chars separated by double spaces, wrapped in
    single spaces). Built engine-portably: duplicate every char with a
    trailing double space, then trim one trailing space."""
    base = F.regexp_replace(word, "(.)", "$1  ")
    return F.concat(F.lit(" "), F.substring(base, 1, F.length(base) - 1))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, count): the single full-corpus pass; everything
    after runs on this reduced relation."""
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    return df.select(toks).where(F.col("w") != "").groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def _pair_counts(units: DataFrame) -> DataFrame:
    """Adjacent-unit pair frequencies, weighted by word count: explode
    index positions over the (small) distinct-word relation."""
    t = F.split(F.trim(F.col("s")), "  ")
    d = units.select("c", t.alias("t")).where(F.size("t") >= 2)
    idx = F.explode(F.sequence(F.lit(0), F.size("t") - 2)).alias("i")
    e = d.select("c", "t", idx)
    pair = F.concat(F.element_at("t", F.col("i") + 1), F.lit(" "), F.element_at("t", F.col("i") + 2))
    return e.select(pair.alias("pair"), "c").groupBy("pair").agg(F.sum("c").alias("n"))


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    sample_frac: float | None = None,
    id_col: str = "doc_id",
    hash_kind: str = "xxhash64",
) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [{step, left, right, merged, n}, ...] in merge order. Ties on pair
    frequency break lexicographically (deterministic, engine-portable).
    ``sample_frac`` hash-samples documents before the word count (the
    100 TB training path — the merge table converges long before the
    full corpus is counted)."""
    if sample_frac is not None and sample_frac < 1.0:
        from .pipeline import _hash_bucket

        df = df.where(_hash_bucket(F.col(id_col), 10_000, hash_kind) < int(sample_frac * 10_000))
    units = word_counts(df, text_col).select("w", "c", _units_string(F.col("w")).alias("s"))
    # Materialize the distinct-word relation ONCE: every round's
    # pair-count collect would otherwise re-execute the full corpus
    # word-count pass (lineage reaches the parquet scan) — n_merges
    # corpus passes instead of the one the design promises.
    units = units.localCheckpoint(eager=True)
    merges: list[dict] = []
    for step in range(1, n_merges + 1):
        top = _pair_counts(units).orderBy(F.col("n").desc(), "pair").limit(1).collect()
        if not top:
            break
        pair, n = top[0]["pair"], int(top[0]["n"])
        a, b = pair.split(" ", 1)
        merges.append({"step": step, "left": a, "right": b, "merged": a + b, "n": n})
        units = units.withColumn(
            "s",
            F.replace(F.col("s"), F.lit(f" {a}  {b} "), F.lit(f" {a + b} ")),
        )
        # keep the lineage shallow across iterations (same reason the
        # connected-components loop truncates: each round's plan would
        # otherwise nest the previous rounds')
        units = units.localCheckpoint(eager=False) if step % 8 == 0 else units
    return merges


def bpe_segment(
    df: DataFrame, merges: list[dict], text_col: str = "text", out_col: str = "units"
) -> DataFrame:
    """Apply a learned merge table to a corpus: per word, start from the
    character segmentation and replay every merge in order — a chain of
    literal replaces, all codegen (no UDF). Output is an array column of
    subword units per word row (word kept alongside)."""
    toks = F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("w")
    d = df.select(toks).where(F.col("w") != "")
    s = _units_string(F.col("w"))
    for m in merges:
        s = F.replace(s, F.lit(f" {m['left']}  {m['right']} "), F.lit(f" {m['merged']} "))
    return d.select("w", F.split(F.trim(s), "  ").alias(out_col))

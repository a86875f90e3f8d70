"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall times.

Execution is measured with the noop sink (full plan runs, nothing is
collected to the driver) — at 100 TB the driver never materializes
results, so the bench shouldn't either.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from riptable_spark import queries2, queries3, queries4, queries5, queries6, queries7  # noqa: E402,F401 — register all batches
from riptable_spark.queries import QUERIES  # noqa: E402
from riptable_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",   # scan→filter→agg (TPC-H Q1 shape)
    "q04_groupby_stats",     # heavy groupby reduce set (exact percentiles)
    "q07_merge2_inner",      # fact-fact shuffle join
    "q09_merge_lookup",      # broadcast dim join + agg
    "q13_asof_backward",     # as-of join (union+window)
    "q16_cumsum",            # window cumulative
    "q20_drop_duplicates",   # keyed dedupe window
    "q22_accum2",            # pivot cross-tab
    "q31_token_jaccard",     # explode + bucket self-join similarity
    "q32_cosine_topk",       # embedding brute-force top-k
    "q33_minhash_pairs",     # MinHash LSH banding
    "q35_ema_decay",         # applyInPandas sequential recurrence
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    # one warm scan so JVM/codegen startup doesn't pollute the first query
    QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # best-of-3: the first execution of a query pays one-off JVM codegen
    # compilation (~0.5-1 s/query); the min is the steady-state number a
    # long-running cluster job would see (3 reps also damp neighbor-load
    # noise in the recorded single-run figure)
    times: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    # Secondary (non-anchor) metrics: the md5-tax family's recorded
    # numbers pay the portable hash that only the DuckDB oracle replay
    # needs; a cluster runs xxhash64 (JVM intrinsic — no hex/conv
    # detour). Report the production-path times alongside, without
    # touching the anchor keys. (q33's twin since r5; q162/q207/q275
    # twins added in r7 per the r6 verdict — same pipelines, same
    # parameters, hash_kind='xxhash64'.)
    from pyspark.sql import functions as F  # noqa: E402

    from riptable_spark.operators import dedup  # noqa: E402
    from riptable_spark.operators import pipeline as _pl  # noqa: E402
    from riptable_spark.operators import text as _tx  # noqa: E402
    from riptable_spark.sources.io import load_table  # noqa: E402

    def _docs():
        return load_table(spark, sf_dir, "documents")

    def _q33_twin():
        d = _docs().where(F.col("doc_id") < 200)
        return dedup.minhash_lsh_pairs(
            d, "text", "doc_id", num_perm=32, bands=8, shingle_n=3,
            hash_kind="xxhash64",
        )

    def _q162_twin():
        d = _docs()
        bench_docs = d.where(F.col("doc_id") % 17 == 3).select("text")
        return _pl.decontaminate_bloom(
            d, bench_docs, n=3, min_hits=2, hash_kind="xxhash64", m=131072, k=5
        )

    def _q207_twin():
        return _tx.corpus_overlap(_docs(), "source", "text", shingle_n=3,
                                  hash_kind="xxhash64")

    def _q275_twin():
        return dedup.doc_novelty(_docs(), n=3, hash_kind="xxhash64")

    secondary = {}
    for sname, builder in (
        ("q33_minhash_pairs_xxhash64", _q33_twin),
        ("q162_bloom_decontaminate_xxhash64", _q162_twin),
        ("q207_corpus_overlap_xxhash64", _q207_twin),
        ("q275_doc_novelty_xxhash64", _q275_twin),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            builder().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        secondary[sname] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "secondary": secondary,
                "sf": sf_val,
            }
        )
    )
    # finalize the (optional) event log so scale benches read COMPLETE
    # TaskEnd metrics — without stop() the log stays .inprogress and
    # partially flushed, silently under-counting spills
    spark.stop()


if __name__ == "__main__":
    main()

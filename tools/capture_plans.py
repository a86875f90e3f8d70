"""Capture .explain('formatted') for a set of queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
       (default queries: the bench.py HEADLINE set; suffix is 'before' or
       'after' — files land at plans/<tag>/<query>_<suffix>.txt)

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) without
executing the query (explain only), so this is cheap and can run while
other work is in flight.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from riptable_spark import (  # noqa: E402,F401 — register all batches
    queries2, queries3, queries4, queries5, queries6, queries7, queries8,
    queries9, queries10, queries11, queries12, queries13, queries14,
    queries15, queries16, queries17, queries18, queries19,
)
from riptable_spark.queries import QUERIES  # noqa: E402
from riptable_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary", "q04_groupby_stats", "q07_merge2_inner",
    "q09_merge_lookup", "q13_asof_backward", "q16_cumsum",
    "q20_drop_duplicates", "q22_accum2", "q31_token_jaccard",
    "q32_cosine_topk", "q33_minhash_pairs", "q35_ema_decay",
]


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

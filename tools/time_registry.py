"""Spark-only wall-time sweep of the full query registry (noop sink).

Usage: python tools/time_registry.py [sf_dir] [--out FILE] [query ...]

Times each queries() entry once (cold-codegen included) with the noop
sink in one shared session, prints a sorted-descending table and writes
a JSON dict {query: seconds}. Unlike verify_local.py this excludes the
DuckDB oracle replay and the toPandas() collect, so it isolates the
Spark computation — the thing this optimization round works on.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from riptable_spark import (  # noqa: E402,F401 — register all batches
    queries2, queries3, queries4, queries5, queries6, queries7, queries8,
    queries9, queries10, queries11, queries12, queries13, queries14,
    queries15, queries16, queries17, queries18, queries19,
)
from riptable_spark.queries import QUERIES  # noqa: E402
from riptable_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else "/root/testdata/sf0.1"
    out_file = None
    if "--out" in args:
        i = args.index("--out")
        out_file = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or list(QUERIES)
    spark = get_spark("time_registry")
    times: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 — record and continue
            times[name] = -1.0
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
        print(f"{times[name]:9.3f}  {name}", flush=True)
    spark.sparkContext.setJobDescription(None)
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print("\n=== slowest 30 ===")
    for name, t in ranked[:30]:
        print(f"{t:9.3f}  {name}")
    print(f"\ntotal {sum(t for t in times.values() if t > 0):.1f}s over {len(times)} queries")
    if out_file:
        with open(out_file, "w") as f:
            json.dump({"sf_dir": sf_dir, "times": times}, f, indent=1, sort_keys=True)
        print(f"wrote {out_file}")
    spark.stop()


if __name__ == "__main__":
    main()

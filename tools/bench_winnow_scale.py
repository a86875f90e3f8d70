"""Winnow-family scale curve: winnow_fingerprints and winnow_shared_runs
over the documents table at several corpus sizes, with scaling exponents
and event-log spill counters (the q07/q20 treatment for the newest heavy
operator family).

The replicas rename every token per replica (tools/make_sfN.py), so the
planted shared runs survive replication without combinatorial blow-up:
shared-run DENSITY matches sf0.1 at every point, which is exactly the
100 TB shape (more documents, same per-document duplication structure).

Each point runs in its own subprocess (fresh JVM + its own event-log
dir, the bench_scale protocol). Walls are best-of-2 inside the
subprocess (first run pays codegen). Writes BENCH_WINNOW.json.

Usage: python tools/bench_winnow_scale.py [dir ...]
  (default: /root/testdata/sf0.1 .scratch/sf1 .scratch/sf3 .scratch/sf10)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scale import spill_bytes  # noqa: E402


def run_point(d: str) -> dict:
    """Subprocess body: measure the two winnow ops on one dir."""
    import time

    sys.path.insert(0, REPO)
    from pyspark.sql import functions as F

    from riptable_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_shared_runs,
    )
    from riptable_spark.session import get_spark

    spark = get_spark("bench-winnow")
    docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()

    def best_of(fn, n=2):
        best = float("inf")
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), out

    t_fp, n_fp = best_of(
        lambda: winnow_fingerprints(docs).agg(F.count(F.lit(1))).first()[0]
    )
    t_runs, n_runs = best_of(
        lambda: winnow_shared_runs(docs).agg(F.count(F.lit(1))).first()[0]
    )
    rec = {
        "dir": d,
        "n_docs": n_docs,
        "fingerprints_s": t_fp,
        "n_fingerprints": int(n_fp),
        "shared_runs_s": t_runs,
        "n_shared_runs": int(n_runs),
    }
    print("POINT " + json.dumps(rec), flush=True)
    return rec


def ols_expo(vals: list[float], rows: list[int]) -> float | None:
    if len(set(rows)) < 2:
        return None
    xs = [math.log(r) for r in rows]
    ys = [math.log(max(v, 1e-3)) for v in vals]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 3)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        run_point(sys.argv[2])
        return
    scratch = os.path.join(REPO, ".scratch")
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(scratch, "sf1"),
        os.path.join(scratch, "sf3"),
        os.path.join(scratch, "sf10"),
    ]
    points = []
    for idx, d in enumerate(dirs):
        evdir = os.path.join(scratch, f"eventlog_winnow_{idx}")
        shutil.rmtree(evdir, ignore_errors=True)
        os.makedirs(evdir, exist_ok=True)
        env = dict(os.environ, SPARK_GRAFT_EVENTLOG_DIR=evdir)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", d],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        rec = json.loads(
            [ln for ln in out.splitlines() if ln.startswith("POINT ")][-1][6:]
        )
        mem, disk, seen = spill_bytes(evdir)
        rec["spill_memory_bytes"], rec["spill_disk_bytes"] = mem, disk
        rec["taskend_events_parsed"] = seen
        print(json.dumps(rec), flush=True)
        points.append(rec)
    rows = [p["n_docs"] for p in points]
    result = {
        "metric": "winnow_scale",
        "points": points,
        "exponent_fingerprints": ols_expo(
            [p["fingerprints_s"] for p in points], rows
        ),
        "exponent_shared_runs": ols_expo(
            [p["shared_runs_s"] for p in points], rows
        ),
    }
    with open(os.path.join(REPO, "BENCH_WINNOW.json"), "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

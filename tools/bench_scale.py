"""Scale-curve bench: run the headline queries at several SFs and
compute per-query scaling exponents.

The exponent e = log(wall_b/wall_a) / log(rows_b/rows_a) between
consecutive SF points is the empirical cost growth: e < 1 means
sublinear (fixed overheads amortizing, partial aggregation collapsing),
e = 1 linear, e > 1 a scale problem.  At 100 TB what matters is that no
query's exponent exceeds ~1 except those with a documented reason and a
named scale path (brute-force cosine -> IVF/PQ).

Usage: python tools/bench_scale.py SF_DIR [SF_DIR ...]
       python tools/bench_scale.py /root/testdata/sf0.1 .scratch/sf1 .scratch/sf3

Prints one JSON line per SF dir (bench.py format) and a final JSON line
{"metric": "scale_exponents", ...} with per-query exponents between the
last two points and across the full range.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import duckdb


def spill_bytes(eventlog_dir: str) -> tuple[int, int, int]:
    """Sum (memory, disk) bytes spilled across all TaskEnd events in
    every event-log file under eventlog_dir (recursing into rolling
    event-log DIRECTORIES — silently skipping them once under-reported
    spills as zero)."""
    mem = disk = seen = 0
    paths = []
    for root, _dirs, files in os.walk(eventlog_dir):
        for name in files:
            if name.endswith((".zstd", ".lz4", ".snappy")):
                raise RuntimeError(
                    f"compressed event log {name}: run with "
                    "spark.eventLog.compress=false (session.py sets it)"
                )
            if "appstatus" in name:
                continue
            paths.append(os.path.join(root, name))
    for path in paths:
        with open(path, errors="replace") as fh:
            for line in fh:
                if '"Event":"SparkListenerTaskEnd"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                tm = (ev.get("Task Metrics") or {})
                seen += 1
                mem += tm.get("Memory Bytes Spilled", 0)
                disk += tm.get("Disk Bytes Spilled", 0)
    if seen == 0:
        raise RuntimeError(
            f"no TaskEnd events parsed under {eventlog_dir} — the spill "
            "reader is blind; a zero-spill claim would be vacuous"
        )
    return mem, disk, seen


def rows_total(sf_dir: str) -> int:
    con = duckdb.connect()
    n = 0
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        n += con.sql(f"SELECT count(*) FROM '{sf_dir}/{t}.parquet'").fetchone()[0]
    return n


def main() -> None:
    dirs = sys.argv[1:]
    if len(dirs) < 2:
        sys.exit("usage: python tools/bench_scale.py SF_DIR SF_DIR [SF_DIR ...]")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    points = []
    for idx, d in enumerate(dirs):
        evdir = os.path.join(repo, ".scratch", f"eventlog_{idx}")
        import shutil

        shutil.rmtree(evdir, ignore_errors=True)
        os.makedirs(evdir, exist_ok=True)
        env = dict(
            os.environ, SPARK_GRAFT_SF_DIR=d, SPARK_GRAFT_EVENTLOG_DIR=evdir
        )
        out = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout.strip().splitlines()[-1]
        rec = json.loads(out)
        rec["rows"] = rows_total(d)
        rec["dir"] = d
        mem, disk, seen = spill_bytes(evdir)
        rec["spill_memory_bytes"], rec["spill_disk_bytes"] = mem, disk
        rec["taskend_events_parsed"] = seen
        print(json.dumps(rec), flush=True)
        points.append(rec)

    def expo(a: dict, b: dict, q: str) -> float:
        # bench.py rounds per-query walls to 3 dp: a sub-millisecond
        # query records 0.0 — clamp so log() can't raise and discard
        # the whole multi-SF run after all benches completed.
        return round(
            math.log(max(b["queries"][q], 1e-3) / max(a["queries"][q], 1e-3))
            / math.log(b["rows"] / a["rows"]),
            3,
        )

    def ols_expo(vals: list[float], rows: list[int]) -> float:
        """OLS slope of log(wall) on log(rows) over ALL points — less
        endpoint-noise-sensitive than the two-point ratios.  Walls are
        clamped to 1 ms (bench.py's recording resolution) before log."""
        xs = [math.log(r) for r in rows]
        ys = [math.log(max(v, 1e-3)) for v in vals]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 3)

    first, last = points[0], points[-1]
    prev = points[-2]
    result = {
        "metric": "scale_exponents",
        "dirs": dirs,
        "rows": [p["rows"] for p in points],
        "total_wall": [p["value"] for p in points],
        "exponent_total_full_range": round(
            math.log(last["value"] / first["value"])
            / math.log(last["rows"] / first["rows"]), 3),
        "exponent_total_last_step": round(
            math.log(last["value"] / prev["value"])
            / math.log(last["rows"] / prev["rows"]), 3),
        "per_query_full_range": {
            q: expo(first, last, q) for q in first["queries"]
        },
        "per_query_last_step": {
            q: expo(prev, last, q) for q in first["queries"]
        },
        "per_query_ols_fit": {
            q: ols_expo([p["queries"][q] for p in points],
                        [p["rows"] for p in points])
            for q in first["queries"]
        },
        "exponent_total_ols_fit": ols_expo(
            [p["value"] for p in points], [p["rows"] for p in points]
        ),
        "spill_disk_bytes": [p["spill_disk_bytes"] for p in points],
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

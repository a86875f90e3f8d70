"""A/B the streaming fixed cost (q71/q103/q104) across state-store
backends and checkpoint-dir placement — VERDICT r6 item 5.

Axes (config-level only; semantics and the driver bench are untouched):
  provider   : hdfs (default HDFSBackedStateStoreProvider) vs rocksdb
               (SPARK_GRAFT_STATESTORE=rocksdb, session.py)
  checkpoint : /tmp (disk) vs /dev/shm (tmpfs) — the streaming queries
               create their checkpoint dirs with tempfile.mkdtemp(),
               which honors $TMPDIR.

Each config runs in a FRESH subprocess (its own JVM: the provider class
is fixed at first query start) and configs are interleaved across
rounds so box drift hits all of them equally. Per query: one untimed
warmup drain + N timed drains, min reported.

Usage: python tools/probe_stream_state.py /root/testdata/sf0.1 [reps] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["PROBE_REPO"])
import __spark_entry__ as entry
from riptable_spark.session import get_spark

sf = os.environ["PROBE_SF"]
reps = int(os.environ["PROBE_REPS"])
spark = get_spark("probe_stream_state")
qs = entry.queries()
out = {}
for name in ("q71_streaming_tumbling", "q103_stateful_stream", "q104_session_windows"):
    q = qs[name]
    q(spark, sf).write.format("noop").mode("overwrite").save()  # warmup drain
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        q(spark, sf).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    out[name] = walls
print("PROBE_JSON " + json.dumps(out))
spark.stop()
"""


def run_config(sf: str, reps: int, provider: str, tmpdir: str) -> dict:
    env = dict(os.environ)
    env["PROBE_REPO"] = REPO
    env["PROBE_SF"] = sf
    env["PROBE_REPS"] = str(reps)
    env["TMPDIR"] = tmpdir
    if provider == "rocksdb":
        env["SPARK_GRAFT_STATESTORE"] = "rocksdb"
    else:
        env.pop("SPARK_GRAFT_STATESTORE", None)
    r = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_JSON "):
            return json.loads(line[len("PROBE_JSON "):])
    raise RuntimeError(f"{provider}/{tmpdir} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    configs = [
        ("hdfs", "/tmp"),
        ("rocksdb", "/tmp"),
        ("hdfs", "/dev/shm"),
        ("rocksdb", "/dev/shm"),
    ]
    acc: dict[str, dict[str, list[float]]] = {}
    for rnd in range(rounds):
        for provider, tmpdir in configs:
            key = f"{provider}@{tmpdir}"
            res = run_config(sf, reps, provider, tmpdir)
            for qname, walls in res.items():
                acc.setdefault(key, {}).setdefault(qname, []).extend(walls)
            print(f"round {rnd} {key}: " + json.dumps(res), flush=True)
    summary = {
        key: {q: min(w) for q, w in per.items()} for key, per in acc.items()
    }
    print("SUMMARY " + json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()

"""Cold-vs-steady probe: separates one-time codegen/JIT cost from the
steady-state execution cost of a query (the q34 lesson, generalized).

For each named query, a FRESH subprocess session runs the query N times
(noop sink) and reports every rep's wall. rep1 includes session startup
+ Janino compile + JIT; rep2+ are the steady state a long-running
cluster job sees. A big rep1/rep2 ratio means the query's cost is
expression-compilation width, not plan shape.

Usage: python tools/probe_cold.py /root/testdata/sf0.1 3 q34_simhash [more...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "__REPO__")
import __spark_entry__ as entry
from riptable_spark.session import get_spark

name, sf, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
t0 = time.time()
spark = get_spark("probe_cold")
startup = time.time() - t0
q = entry.queries()[name]
walls = []
for _ in range(n):
    t0 = time.time()
    q(spark, sf).write.format("noop").mode("overwrite").save()
    walls.append(round(time.time() - t0, 3))
print("PROBE_COLD " + json.dumps({"query": name, "startup": round(startup, 3), "walls": walls}))
"""


def main() -> None:
    sf, n, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for name in names:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD.replace("__REPO__", repo), name, sf, str(n)],
            capture_output=True, text=True,
        )
        line = next((l for l in proc.stdout.splitlines() if l.startswith("PROBE_COLD ")), None)
        if line is None:
            print(f"{name}: FAILED\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line[len("PROBE_COLD "):])
        walls = rec["walls"]
        steady = min(walls[1:]) if len(walls) > 1 else walls[0]
        rec["cold"] = walls[0]
        rec["steady"] = steady
        rec["codegen_tax"] = round(walls[0] - steady, 3)
        results.append(rec)
        print(f"{name}: startup={rec['startup']:.1f}s cold={walls[0]:.2f}s "
              f"steady={steady:.2f}s tax={rec['codegen_tax']:.2f}s walls={walls}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

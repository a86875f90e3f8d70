"""Warm isolated timing for any registered queries: one session, one
untimed warmup rep each, then N timed noop-sink reps.

Usage: python tools/probe_named.py /root/testdata/sf0.1 3 q34_simhash [more...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from riptable_spark.session import get_spark  # noqa: E402

SF, N, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
spark = get_spark()
qs = entry.queries()
for name in names:
    q = qs[name]
    q(spark, SF).write.format("noop").mode("overwrite").save()  # warmup
    walls = []
    for _ in range(N):
        t0 = time.time()
        q(spark, SF).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    print(name, walls, "min:", min(walls))

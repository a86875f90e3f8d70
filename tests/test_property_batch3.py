"""Property-based checks (hypothesis) for the round-3 continuation
operators: Pareto dominance semantics, interval union length, sweep-line
concurrency — each against a brute-force Python oracle on small random
inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from riptable_spark.operators.mining import pareto_frontier
from riptable_spark.operators.window import interval_coverage, max_concurrency

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

intervals = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 20)), min_size=1, max_size=12
)
points = st.lists(
    st.tuples(st.integers(0, 20), st.integers(1, 15)), min_size=1, max_size=12
)


@given(points)
@settings(**_SETTINGS)
def test_pareto_frontier_matches_bruteforce(spark, pts):
    rows = [("g", i, float(c), s) for i, (c, s) in enumerate(pts)]
    df = spark.createDataFrame(rows, "g string, id int, cost double, sz int")
    got = {r["id"] for r in pareto_frontier(df, "g", "cost", "sz").collect()}

    def dominated(i):
        ci, si = pts[i]
        return any(
            (cj <= ci and sj >= si and (cj < ci or sj > si))
            for j, (cj, sj) in enumerate(pts) if j != i
        )

    want = {i for i in range(len(pts)) if not dominated(i)}
    assert got == want


@given(intervals)
@settings(**_SETTINGS)
def test_interval_coverage_matches_bruteforce(spark, iv):
    rows = [("k", i, s, s + ln) for i, (s, ln) in enumerate(iv)]
    df = spark.createDataFrame(rows, "k string, id int, s long, e long")
    r = interval_coverage(df, "k", "s", "e", "id").collect()[0]
    covered_pts = set()
    for s, ln in iv:
        covered_pts.update(range(s, s + ln))
    assert r["covered"] == len(covered_pts)


@given(intervals)
@settings(**_SETTINGS)
def test_max_concurrency_matches_bruteforce(spark, iv):
    rows = [("k", s, s + ln) for s, ln in iv]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    r = max_concurrency(df, "k", "s", "e").collect()[0]
    peak = max(
        sum(1 for s, ln in iv if s <= t < s + ln)
        for t in range(0, 75)
    )
    assert r["max_concurrent"] == peak

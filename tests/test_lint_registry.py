"""Registry-wide scale lint: physical-plan anti-pattern sweep over
EVERY registered query (planning only — no jobs run).  Catches a
cartesian product / raw-data global window / row-Python UDF sneaking
into ANY of the 300+ queries, not just the ones with dedicated gates.

Run with ``-m lint_registry`` (excluded from the default suite like the
oracle sweep — it builds ~300 physical plans, a few minutes).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from riptable_spark.plans import inspect as pi

# BroadcastNestedLoopJoin is tolerated sweep-wide: in this codebase it
# is exclusively the documented 1-row scalar-broadcast attach
# (crossJoin(F.broadcast(one_row_agg)) — the _with_global idiom) or a
# deliberate broadcast-side ANN scoring pass; the handful of queries
# where a non-equi join would be a REAL hazard carry dedicated
# per-query gates in test_plans.py.  This sweep hard-fails on the
# unambiguous killers: CartesianProduct, raw-data global windows,
# row-at-a-time Python, single-partition range exchanges.
ALLOWED = {
    # rank fusion operates on already-top-k (tiny) relations — the
    # global windows there rank k-row inputs, not the corpus
    "q221_rrf_fusion": "global-window",
    # (q651/q652's round-6 entries removed in round 7: the linter now
    # tracks checkpoint provenance — epoch_allocation tags its
    # checkpointed per-domain aggregate via inspect.mark_aggregated, so
    # the global windows over it are recognized as aggregate-input.
    # tests/test_lint_provenance.py pins both directions.)
}


@pytest.mark.lint_registry
def test_every_registered_query_plan_is_clean(spark):
    bad: dict[str, list[str]] = {}
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, "/root/testdata/sf0.001")
        except Exception as e:  # building must never fail
            bad[name] = [f"build failed: {e}"]
            continue
        try:
            warnings = pi.lint(df)
        except Exception as e:
            bad[name] = [f"lint failed: {e}"]
            continue
        allowed_kind = ALLOWED.get(name)
        flagged = [
            w for w in warnings
            if "BroadcastNestedLoopJoin" not in w
            and not (allowed_kind and w.startswith(allowed_kind))
        ]
        if flagged:
            bad[name] = flagged
    # Report every offender at once for triage
    assert not bad, "\n".join(f"{k}: {v}" for k, v in sorted(bad.items()))

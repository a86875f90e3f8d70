"""Registry lint: no oracle may emit an UNROUNDED ln()/exp()/pow()-derived
float output column.

Why this gate exists: Java ``Math.log(936.0)`` differs from glibc/DuckDB's
``ln`` by 1 ulp — the first concrete transcendental counterexample in this
program, caught by q644's sf0.01 hash gate (ORACLES.md rule: ln/exp-derived
float outputs must be rounded on BOTH sides, never shipped raw, even when
the downstream arithmetic is order-pinned).

Mechanics: every ``ln/exp/pow/power/log/log2/log10`` call in an oracle's
SQL must either be textually enclosed in a ``round(...)`` call, or the
query must appear in ``AUDITED_UNROUNDED`` below with a one-line reason
(the accepted reasons are "rounded downstream in an outer SELECT that the
textual enclosure check can't see" and "exact by construction, e.g.
pow(2.0, -K) with integer K"). Adding a new transcendental oracle without
either wrapping it or auditing it here fails the default pytest suite.

``sqrt`` is exempt: IEEE-754 requires it correctly rounded, so it IS
cross-engine exact (used deliberately throughout the registry as the one
allowed terminal float op).
"""

from __future__ import annotations

import re

import pytest

TRANSCENDENTAL = re.compile(r"\b(ln|exp|pow|power|log|log2|log10)\s*\(", re.I)
ROUND = re.compile(r"\bround\s*\(", re.I)

# query name -> audited reason for carrying an unenclosed transcendental.
# Every entry was hash-verified at sf0.01 AND sf0.1; the reason records WHY
# the 1-ulp ln class can't flip the hash.
AUDITED_UNROUNDED = {
    "q195_bm25_search": "ln-scored bm25 is rounded in the outer SELECT "
    "(round(score, 6)); rank ties break on doc_id",
    "q204_group_entropy": "sum(c*ln(c)) feeds round(entropy, 6) in the "
    "outer SELECT",
    "q205_mutual_info": "mi/h_a/h_b sums all pass through round(_, 6) in "
    "the outer SELECT",
    "q283_split_adjust": "pow(2.0, -K) with integer K is an exact power "
    "of two — correctly rounded by construction in both engines",
    "q311_ewm_stats": "exp-rebased window sums feed round(_, 4) outputs "
    "(ewm_mean/ewm_var) in the outer SELECT",
    "q348_ewm_cov": "exp-rebased window sums feed round(_, 4) outputs "
    "(ewm_cov/ewm_beta/ewm_corr) in the outer SELECT",
    "q378_datasheet": "entropy term feeds round(lang_entropy, 6) in the "
    "outer SELECT",
    "q644_zipf_fit": "per-rank ln values are order-pinned list_reduce "
    "folds feeding round(slope/intercept, 6) in the outer SELECT",
    "q650_cl_diversity": "entropy is round(_, 6) in the outer SELECT; the "
    "cl_diverse FLAG is an integer cross-multiplied test, not ln-derived",
}


def _round_spans(sql: str) -> list[tuple[int, int]]:
    """Character spans of every round(...) call, paren-matched."""
    spans = []
    for m in ROUND.finditer(sql):
        depth = 0
        for i in range(m.end() - 1, len(sql)):
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    spans.append((m.start(), i))
                    break
    return spans


def unenclosed_transcendentals(sql: str) -> list[str]:
    """Transcendental calls not inside any round(...) span."""
    spans = _round_spans(sql)
    return [
        m.group(1).lower()
        for m in TRANSCENDENTAL.finditer(sql)
        if not any(a <= m.start() <= b for a, b in spans)
    ]


def test_checker_flags_crafted_violation():
    assert unenclosed_transcendentals("SELECT ln(x) AS out FROM t") == ["ln"]
    assert unenclosed_transcendentals(
        "SELECT round(ln(x), 6) AS out FROM t"
    ) == []
    assert unenclosed_transcendentals(
        "SELECT round(y, 2) AS a, exp(z) AS b FROM t"
    ) == ["exp"]
    # sqrt is exempt by design
    assert unenclosed_transcendentals("SELECT sqrt(x) FROM t") == []


def _oracles() -> dict[str, str]:
    import __spark_entry__ as entry

    return entry.oracle_sql()


def test_registry_has_no_unaudited_unrounded_transcendentals():
    offenders = {
        name: sorted(set(bad))
        for name, sql in _oracles().items()
        if (bad := unenclosed_transcendentals(sql))
        and name not in AUDITED_UNROUNDED
    }
    assert not offenders, (
        "oracles with unrounded ln/exp/pow outputs (wrap in round(_, 6) on "
        f"BOTH sides, or audit in AUDITED_UNROUNDED with a reason): {offenders}"
    )


def test_audit_list_has_no_stale_entries():
    oracles = _oracles()
    for name in AUDITED_UNROUNDED:
        if name not in oracles:
            pytest.fail(f"AUDITED_UNROUNDED entry {name} is not a registered oracle")
        if not unenclosed_transcendentals(oracles[name]):
            pytest.fail(
                f"AUDITED_UNROUNDED entry {name} no longer has an unenclosed "
                "transcendental — remove the stale audit entry"
            )

"""Doc-drift guards (r4 VERDICT #7): the registry totals in COVERAGE.md are
GENERATED from harness.QUERIES by tools/gen_registry.py — hand-edited or
stale counts fail here instead of drifting (r4 shipped "92 queries" docs
against a 91-entry registry)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_coverage_registry_totals_current():
    res = subprocess.run(
        [sys.executable, str(REPO / "tools" / "gen_registry.py"), "--check"],
        capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr or res.stdout


def test_every_query_has_an_oracle():
    """Zero rows-only is a standing claim — enforce it mechanically."""
    from ai_textbook_processor_spark import harness
    from ai_textbook_processor_spark.golden_oracle import literal_oracle_names

    covered = set(harness.ORACLES) | set(literal_oracle_names())
    missing = [n for n in harness.QUERIES if n not in covered]
    assert not missing, f"queries without any oracle: {missing}"


def test_driver_window_holds_previously_uncertified_queries():
    """r4 VERDICT #1: the driver certifies queries()[0:50]; the rotation
    must spend every window slot on a never-driver-certified query.  When
    fewer than 50 are uncertified, all of them must sit in the window;
    once the uncertified set outgrows the window (r5: 54 > 50), the
    invariant is that no long-certified query occupies a slot while an
    uncertified one waits — the overflow rotates in next round."""
    from ai_textbook_processor_spark import harness

    window = list(harness.QUERIES)[:50]
    front = set(harness.QUERIES) - set(harness._CERTIFIED_R1_R4)
    if len(front) <= 50:
        out_of_window = front - set(window)
        assert not out_of_window, (
            f"never-certified queries outside the driver window: "
            f"{out_of_window}"
        )
    else:
        squatters = set(window) - front
        assert not squatters, (
            f"long-certified queries occupying window slots: {squatters}"
        )

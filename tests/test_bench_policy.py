"""Unit tests for bench.py's weather-retry policy (pure decision logic;
the live behavior was also exercised in-session: an 8-10-stolen-core
window flagged 5/7 queries and the retry refused to unflag any, then a
clean bench produced zero flags)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import retry_decision  # noqa: E402


def _m(runs, flagged):
    return {"runs": runs, "flagged": flagged}


def test_clean_faster_retry_sets_best_and_unflags():
    best, unflag = retry_decision(1.0, _m([0.8, 0.85], flagged=False))
    assert best == 0.8 and unflag


def test_clean_confirming_retry_unflags_without_changing_best():
    best, unflag = retry_decision(1.0, _m([1.25, 1.3], flagged=False))
    assert best == 1.0 and unflag


def test_clean_but_much_slower_retry_keeps_flag():
    # the contended earlier best has no corroboration
    best, unflag = retry_decision(1.0, _m([1.31, 1.5], flagged=False))
    assert best == 1.0 and not unflag


def test_flagged_retry_never_unflags_even_if_faster():
    best, unflag = retry_decision(1.0, _m([0.7, 2.9], flagged=True))
    assert best == 0.7 and not unflag


def test_rounding_matches_published_precision():
    best, unflag = retry_decision(0.9, _m([0.89961], flagged=False))
    assert best == 0.9 and unflag


from scripts.cluster_scaling_job import needs_more_runs  # noqa: E402


def test_converged_series_stops():
    assert not needs_more_runs([17.5, 16.6, 17.3, 16.6, 16.55], cap=15)


def test_still_improving_series_continues():
    assert needs_more_runs([22.7, 22.1, 22.0, 20.4, 19.3], cap=15)


def test_cap_halts_even_when_improving():
    assert not needs_more_runs([10.0, 9.0, 8.0, 7.0, 6.0], cap=5)


def test_late_single_improvement_extends():
    # only ONE of the last two needs to beat the earlier best by >2%
    assert needs_more_runs([10.0, 10.1, 10.2, 10.1, 9.7], cap=15)


def test_short_series_continues_without_crashing():
    # ADVICE r5: times[:-2] is empty below 3 runs and min() used to raise
    # ValueError; a too-short series has no baseline yet, so keep running
    # unless the cap already halts it
    assert needs_more_runs([10.0], cap=5)
    assert needs_more_runs([10.0, 9.0], cap=5)
    assert not needs_more_runs([10.0, 9.0], cap=2)

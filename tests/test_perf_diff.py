"""Pin scripts/perf_diff.py's retried-gate adjudication (VERDICT r11
item 5): min-of-two reporting must never let a slow-but-reproducing gate
pass the canary, and an absorbed transient must be classified as such —
pure-dict tests, no Spark."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))

from perf_diff import ABS_TOL, REL_TOL, analyze  # noqa: E402

REF = {"queries": {"q_fast": 1.0, "q_heavy": 4.0, "q_plain": 2.0}}


def _profile(queries, retried=None):
    return {"queries": queries, "retried": retried or {}}


def test_plain_regression_still_flags():
    cur = _profile({"q_fast": 1.0, "q_heavy": 4.1, "q_plain": 9.0})
    res = analyze(cur, REF)
    assert [n for n, _, _ in res["regressions"]] == ["q_plain"]
    assert res["reproduced"] == [] and res["absorbed"] == []


def test_reproduced_retry_is_a_regression_with_receipts():
    """Both attempts over threshold: the reported min is over too, and
    the retried walls are classified reproduced (not absorbed)."""
    walls = [14.0, 13.0]
    cur = _profile({"q_heavy": min(walls)}, {"q_heavy": walls})
    res = analyze(cur, REF)
    assert [n for n, _, _ in res["regressions"]] == ["q_heavy"]
    assert res["reproduced"] == [("q_heavy", 4.0, walls)]
    assert res["absorbed"] == []


def test_absorbed_transient_is_surfaced_not_failed():
    """First attempt over, retry at reference: min lands under threshold
    so it is NOT a regression, but the transient must be reported —
    the case r10's index-serve blowup would have produced."""
    walls = [30.45, 4.85]
    cur = _profile({"q_heavy": min(walls)}, {"q_heavy": walls})
    res = analyze(cur, REF)
    assert res["regressions"] == []
    assert res["absorbed"] == [("q_heavy", 4.0, walls)]
    assert res["reproduced"] == []


def test_retry_under_threshold_is_noise_not_classified():
    """A retried gate whose first attempt was within tolerance (retry
    fired on the relative gate but the absolute gap was jitter-sized,
    or vice versa) produces no classification at all."""
    first = 4.0 + ABS_TOL * 0.9  # over neither both-gates condition
    cur = _profile({"q_heavy": 4.2}, {"q_heavy": [first, 4.2]})
    res = analyze(cur, REF)
    assert res["regressions"] == []
    assert res["reproduced"] == [] and res["absorbed"] == []


def test_added_and_removed_listed():
    cur = _profile({"q_fast": 1.0, "q_new": 0.5})
    res = analyze(cur, REF)
    assert res["added"] == ["q_new"]
    assert res["removed"] == ["q_heavy", "q_plain"]
    assert REL_TOL > 1  # sanity: thresholds stay multiplicative


def test_contaminated_run_spikes_are_context_not_regressions():
    """The r12 failure mode (VERDICT r12 item 1): a host-load-inflated
    run whose over-threshold readings never reproduced must yield the
    contaminated-pending verdict (canary passes with adjudication
    context), while the SAME readings in a clean-run profile fail."""
    from perf_diff import verdict

    spikes = {"q_fast": 1.0, "q_heavy": 4.1, "q_plain": 9.0}
    noisy = dict(_profile(spikes), run_contaminated=True, median_ratio=1.4)
    res_noisy = analyze(noisy, REF)
    assert res_noisy["contaminated"] and res_noisy["regressions"]
    assert verdict(res_noisy) == "contaminated-pending"
    res_clean = analyze(_profile(spikes), REF)
    assert not res_clean["contaminated"]
    assert verdict(res_clean) == "regressions"


def test_contaminated_run_reproduced_regression_still_fails():
    """Even in a contaminated run, a gate over threshold on EVERY
    attempt is a real regression and must fail the canary."""
    from perf_diff import verdict

    walls = [14.0, 13.0]
    cur = dict(_profile({"q_heavy": min(walls)}, {"q_heavy": walls}),
               run_contaminated=True, median_ratio=1.35)
    res = analyze(cur, REF)
    assert verdict(res) == "contaminated-reproduced"


def test_clean_quiet_run_is_ok():
    from perf_diff import verdict

    res = analyze(_profile({"q_fast": 1.05, "q_heavy": 4.2}), REF)
    assert verdict(res) == "ok"

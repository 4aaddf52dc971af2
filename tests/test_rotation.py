"""Pin the driver-sample rotation invariants (VERDICT r10 items 1 & 6).

Round 10's certification window was burned because the hand-maintained
``_SAMPLED_R*`` lists in ``__spark_entry__.py`` were never taught the r9
sample, so the r10 driver re-sampled 49 of r9's 50 queries. The ordering
is now DERIVED from the committed ``CORRECTNESS_r*.json`` artifacts at
call time; these tests make the invariant regression-proof:

* the staleness map tracks the NEWEST CORRECTNESS file automatically, and
* the first ~50 iteration-order entries of ``queries()`` (the driver's
  sample window) barely overlap the previous round's sample.

No SparkSession needed — pure ordering logic.
"""

from __future__ import annotations

import glob
import json
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import sys

sys.path.insert(0, ROOT)

import __spark_entry__ as entry_mod  # noqa: E402

WINDOW = 50  # the driver samples the first ~50 iteration-order entries


def _correctness_files() -> dict[int, dict]:
    out = {}
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            out[int(m.group(1))] = json.load(open(p))
    return out


def test_last_seen_tracks_newest_correctness_file():
    files = _correctness_files()
    assert files, "committed CORRECTNESS artifacts must exist in repo root"
    newest = max(files)
    last_seen = entry_mod._last_seen()
    # every name in the newest file must be stamped with that round —
    # a forgotten-bookkeeping bug class can't exist, but pin it anyway
    for name in files[newest]:
        assert last_seen[name][0] == newest, name
    # and the map covers every name ever sampled
    sampled_ever = {n for data in files.values() for n in data}
    assert sampled_ever <= set(last_seen)


def test_driver_window_does_not_resample_previous_round():
    """The exact invariant r10 violated: the next driver window must not
    re-certify the previous round's sample (<20% overlap allowed — a name
    can legitimately re-enter if the inventory shrank or everything else
    is fresher)."""
    files = _correctness_files()
    newest = max(files)
    prev_sample = set(files[newest])
    window = list(entry_mod.queries())[:WINDOW]
    overlap = sum(1 for n in window if n in prev_sample)
    assert overlap < 0.2 * WINDOW, (
        f"driver window would re-sample {overlap}/{WINDOW} of round "
        f"{newest}'s queries — rotation is broken"
    )


def _oracle_less() -> set:
    from griddb_spark import workload

    return {n for n in workload.QUERIES if n not in workload.ORACLE}


def test_window_is_stalest_first_after_fresh():
    """queries() iterates: never-sampled oracle-backed names first (new
    gates need a first certification), then _FORCE_RESAMPLE (on-record
    cert no longer covers the shipped config), then ascending
    latest-certification round; oracle-less names dead last."""
    last_seen = entry_mod._last_seen()
    forced = set(entry_mod._FORCE_RESAMPLE)
    oracle_less = _oracle_less()
    names = list(entry_mod.queries())
    rounds = [last_seen[n][0] for n in names
              if n in last_seen and n not in forced and n not in oracle_less]
    assert rounds == sorted(rounds)
    # fresh and forced names all precede ordinary sampled names
    tail_started = False
    for n in names:
        if n in oracle_less:
            continue
        if n in last_seen and n not in forced:
            tail_started = True
        else:
            assert not tail_started, f"{n} sorted after sampled tail"


def test_window_targets_oldest_vintage():
    """The driver window (minus fresh/forced names) must be filled by the
    globally stalest certifiable cohorts on the official record (r6/r7
    vintage as of r11)."""
    last_seen = entry_mod._last_seen()
    forced = set(entry_mod._FORCE_RESAMPLE)
    oracle_less = _oracle_less()
    names = [n for n in entry_mod.queries()
             if n in last_seen and n not in forced and n not in oracle_less]
    k = WINDOW - len(forced)
    window_rounds = sorted(last_seen[n][0] for n in names[:k])
    all_rounds = sorted(last_seen[n][0] for n in names)
    assert window_rounds == all_rounds[:k]


def test_forced_resample_in_window():
    """Any name listed in _FORCE_RESAMPLE (shipped config drifted past its
    on-record certification) must sit inside the driver window until
    re-certified. Empty as of r12 — stream_dedup_embed's adaptive config
    landed green in CORRECTNESS_r11 (VERDICT r11 'what's wrong' item 1)."""
    names = list(entry_mod.queries())
    for n in entry_mod._FORCE_RESAMPLE:
        assert names.index(n) < WINDOW, f"{n} outside the driver window"


def test_oracle_less_names_sort_last():
    """sql_explain / sql_explain_analyze / meta_statement_resources can
    only ever produce ``err: no_oracle`` — they must never occupy a
    driver window slot that a hash-certifiable query could use
    (VERDICT r11 'what's wrong' item 2)."""
    oracle_less = _oracle_less()
    assert oracle_less, "expected the three rows-only gates to exist"
    names = list(entry_mod.queries())
    n_total = len(names)
    for n in oracle_less:
        assert names.index(n) >= n_total - len(oracle_less), (
            f"{n} has no oracle but sorted before certifiable queries"
        )
    # and therefore the whole driver window is hash-certifiable
    assert not [n for n in names[:WINDOW] if n in oracle_less]

#!/usr/bin/env python
"""Per-query perf regression canary.

Usage: python scripts/perf_diff.py [current.json] [reference.json]

Compares a bench profile (default: bench_profile.json) against the
recorded reference (default: bench_reference.json, committed at the end
of a round after a CLEAN sequential run) and reports queries slower than
REL_TOL x reference AND ABS_TOL slower in absolute terms — both gates,
because sub-second queries jitter multiplicatively and long runs carry a
roving full-GC hit that re-times away in isolation (see BASELINE.md).
Exit 1 when regressions are found, so preflight-style wiring is one line.

A missing reference is not an error (first round with the canary);
queries present in only one profile are listed informationally.
"""

from __future__ import annotations

import json
import os
import sys

REL_TOL = 2.5
ABS_TOL = 1.5  # seconds


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    cur_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        here, "..", "bench_profile.json")
    ref_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        here, "..", "bench_reference.json")
    if not os.path.exists(ref_path):
        print(f"perf_diff: no reference at {ref_path}; skipping")
        return 0
    cur = json.load(open(cur_path))["queries"]
    ref = json.load(open(ref_path))["queries"]
    regressions = []
    for name, t in sorted(cur.items()):
        r = ref.get(name)
        if r is None:
            continue
        if t > r * REL_TOL and t - r > ABS_TOL:
            regressions.append((name, r, t))
    added = sorted(set(cur) - set(ref))
    removed = sorted(set(ref) - set(cur))
    if added:
        print(f"new queries (no reference): {', '.join(added)}")
    if removed:
        print(f"queries gone since reference: {', '.join(removed)}")
    if not regressions:
        print(f"perf_diff: OK — no query over {REL_TOL}x+{ABS_TOL}s vs reference "
              f"({len(cur)} current, {len(ref)} reference)")
        return 0
    print(f"perf_diff: {len(regressions)} regression(s) (>{REL_TOL}x and >{ABS_TOL}s):")
    for name, r, t in sorted(regressions, key=lambda x: -(x[2] - x[1])):
        print(f"  {name}: {r:.2f}s -> {t:.2f}s ({t / r:.1f}x)")
    print("re-time suspects in isolation before concluding (roving-GC noise: "
          "SPARK_GRAFT_ONLY=<names> python bench.py)")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())

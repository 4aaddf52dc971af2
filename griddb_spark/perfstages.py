"""Opt-in per-stage wall-clock attribution for multi-job operators.

The embedding-family gates (ANN dedup, IVF-PQ serving, streaming embed
dedup) run as SEVERAL driver-blocking phases — k-means training sweeps,
sizing counts, per-batch verify collects, index appends — before the
final forced action. A single per-query wall number can't localize
variance across them (the r9 100×-corpus probes measured 2.5-24 s swings
on identically-ordered repeats with byte-identical plans), so the bench
asks the library to attribute time to named stages.

Zero overhead when nothing is collecting: ``stage(...)`` checks one
module global and yields straight through. The bench (or a probe script)
wraps each gate in :func:`collecting`, and instrumented library code
brackets its blocking phases in ``with stage("verify"): ...``. Stages
nest; only the innermost label accrues the wall (the outer stage is
paused so totals stay additive). Everything here is driver-side — no
state crosses into Spark tasks.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

#: the active accumulator dict, or None when no one is collecting
_ACTIVE: "dict[str, float] | None" = None
#: innermost open stage label stack (driver is single-threaded per query)
_STACK: "list[tuple[str, float]]" = []


@contextmanager
def stage(name: str):
    """Attribute the wall of this block to ``name`` in the collecting
    accumulator (no-op when none). Nested stages pause the outer one so
    per-stage walls are disjoint and sum to measured time."""
    if _ACTIVE is None:
        yield
        return
    now = time.perf_counter()
    if _STACK:  # pause the enclosing stage
        outer, t0 = _STACK[-1]
        _ACTIVE[outer] = _ACTIVE.get(outer, 0.0) + (now - t0)
    _STACK.append((name, now))
    try:
        yield
    finally:
        label, t0 = _STACK.pop()
        end = time.perf_counter()
        if _ACTIVE is not None:
            _ACTIVE[label] = _ACTIVE.get(label, 0.0) + (end - t0)
        if _STACK:  # resume the enclosing stage
            _STACK[-1] = (_STACK[-1][0], end)


@contextmanager
def collecting():
    """Collect stage walls for the enclosed block; yields the dict the
    instrumented code accrues into (seconds per stage label)."""
    global _ACTIVE
    prev, prev_stack = _ACTIVE, list(_STACK)
    acc: dict[str, float] = {}
    _ACTIVE = acc
    _STACK.clear()
    try:
        yield acc
    finally:
        _ACTIVE = prev
        _STACK[:] = prev_stack

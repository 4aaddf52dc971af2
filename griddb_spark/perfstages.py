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
state crosses into Spark tasks — but "driver-side" spans more than one
Python thread: a streaming gate's ``foreachBatch`` stages run on the
microbatch thread while the bench blocks in ``awaitTermination`` on the
main thread. The open-stage stack is therefore thread-local (two threads
can never interleave push/pop on each other's nesting); the accumulator
dict stays shared so all threads' stages land in one per-gate map (dict
item updates are atomic under the GIL, and the two threads never run
stages concurrently in practice — the main thread holds no open stage
while blocked).
"""

from __future__ import annotations

import threading
import time
from contextlib import contextmanager

#: the active accumulator dict, or None when no one is collecting
_ACTIVE: "dict[str, float] | None" = None
#: per-thread innermost open stage label stack
_TLS = threading.local()


def _stack() -> "list[tuple[str, float]]":
    st = getattr(_TLS, "stack", None)
    if st is None:
        st = _TLS.stack = []
    return st


@contextmanager
def stage(name: str):
    """Attribute the wall of this block to ``name`` in the collecting
    accumulator (no-op when none). Nested stages pause the outer one so
    per-stage walls are disjoint and sum to measured time."""
    if _ACTIVE is None:
        yield
        return
    st = _stack()
    now = time.perf_counter()
    if st:  # pause the enclosing stage
        outer, t0 = st[-1]
        _ACTIVE[outer] = _ACTIVE.get(outer, 0.0) + (now - t0)
    st.append((name, now))
    try:
        yield
    finally:
        label, t0 = st.pop()
        end = time.perf_counter()
        if _ACTIVE is not None:
            _ACTIVE[label] = _ACTIVE.get(label, 0.0) + (end - t0)
        if st:  # resume the enclosing stage
            st[-1] = (st[-1][0], end)


def note(label: str, seconds: float) -> None:
    """Accrue an INFORMATIONAL duration into the collecting accumulator
    (no-op when none). Unlike :func:`stage`, noted durations are not
    wall-clock brackets — they may overlap stages (e.g. Structured
    Streaming's own per-microbatch ``durationMs`` metrics, which happen
    INSIDE a ``stream_await`` stage). Label them with a leading ``@`` so
    consumers (bench.py's force-residual computation) can exclude them
    from the disjoint-walls sum."""
    if _ACTIVE is not None:
        _ACTIVE[label] = _ACTIVE.get(label, 0.0) + seconds


#: registered EXECUTOR-side metric readers: "@label" -> zero-arg callable
#: returning a monotone cumulative float (e.g. a Spark accumulator's
#: .value, summed task-seconds). collecting() snapshots each at entry
#: and notes the positive delta at exit, so per-gate stage maps can
#: attribute time spent inside task kernels the driver never brackets
#: (the multimodal codec kernels — VERDICT r12 item 5). Labels must be
#: "@"-prefixed: task-seconds overlap the driver's force wall, so they
#: are informational overlays, excluded from the disjoint-walls sum.
_METRICS: "dict[str, object]" = {}


def register_metric(label: str, read_fn) -> None:
    """Register (or re-point, e.g. after a new SparkContext) a cumulative
    executor-side metric for per-gate delta attribution."""
    if not label.startswith("@"):
        raise ValueError(f"metric labels must start with '@': {label!r}")
    _METRICS[label] = read_fn


@contextmanager
def collecting():
    """Collect stage walls for the enclosed block; yields the dict the
    instrumented code accrues into (seconds per stage label). Saves and
    restores only the CALLING thread's open-stage stack; other threads'
    stacks are theirs alone."""
    global _ACTIVE
    st = _stack()
    prev, prev_stack = _ACTIVE, list(st)
    acc: dict[str, float] = {}
    _ACTIVE = acc
    st.clear()
    base: dict[str, float] = {}
    for label, read in list(_METRICS.items()):
        try:
            base[label] = float(read())
        except Exception:
            pass  # a dead SparkContext's accumulator; re-registered on next use
    try:
        yield acc
    finally:
        for label, read in list(_METRICS.items()):
            # a label absent from the entry snapshot was registered
            # DURING the block (a gate creating its accumulator at build
            # time) — its cumulative value started at 0 inside the block
            try:
                delta = float(read()) - base.get(label, 0.0)
            except Exception:
                continue
            if delta > 0.0:
                acc[label] = acc.get(label, 0.0) + delta
        _ACTIVE = prev
        st[:] = prev_stack

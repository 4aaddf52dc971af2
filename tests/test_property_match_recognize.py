"""Property-style differential testing of MATCH_RECOGNIZE
(``OP_WINDOW_MATCH``, ``sql_operator_sort.h:94``): randomized patterns over
randomized event sequences, checked against Python's ``re`` engine as an
independent oracle.

The oracle trick: DEFINE conditions are restricted to mutually-exclusive
value classes (A: v<25, B: 25<=v<50, C: 50<=v<75, D: v>=75, NULL → no
class), so each row maps to exactly one class character and the partition
becomes a string. MATCH_RECOGNIZE with AFTER MATCH SKIP PAST LAST ROW and
greedy quantifiers is then exactly: repeatedly ``re.match`` at successive
positions, emit [start, end), resume after the match — both engines are
leftmost-greedy backtrackers, so (first_id, last_id) per match must agree
exactly. Deterministic seed.
"""

from __future__ import annotations

import random
import re

import pytest

SEED = 13
N_CASES = 12
N_PARTITIONS = 3
ROWS_PER_PARTITION = 60

#: mutually-exclusive classes: (var, define condition, regex char)
_CLASSES = [
    ("A", "value < 25", "a"),
    ("B", "25 <= value < 50", "b"),
    ("C", "50 <= value < 75", "c"),
    ("D", "value >= 75", "d"),
]
_CHAR = {v: ch for v, _, ch in _CLASSES}


def _classify(value) -> str:
    if value is None:
        return "x"  # NULL satisfies no DEFINE condition
    for (_, _, ch), hi in zip(_CLASSES, (25, 50, 75, float("inf"))):
        if value < hi:
            return ch
    raise AssertionError


def _gen_pattern(rng: random.Random) -> str:
    factors = []
    n = rng.randint(2, 4)
    for i in range(n):
        if rng.random() < 0.3:
            a, b = rng.sample("ABCD", 2)
            atom = f"({a} | {b})"
        else:
            atom = rng.choice("ABCD")
        # first factor must consume >=1 row so the pattern can't match empty
        quant = rng.choice(["", "+"]) if i == 0 else rng.choice(["", "+", "*", "?"])
        factors.append(atom + quant)
    return " ".join(factors)


def _to_regex(pattern: str) -> str:
    out = pattern.replace(" ", "")
    for v, ch in _CHAR.items():
        out = out.replace(v, ch)
    return out


def _ref_matches(classes: str, rx: "re.Pattern") -> list[tuple[int, int]]:
    """Leftmost matching with AFTER MATCH SKIP PAST LAST ROW."""
    out, i = [], 0
    while i < len(classes):
        m = rx.match(classes, i)
        if m and m.end() > m.start():
            out.append((m.start(), m.end() - 1))
            i = m.end()
        else:
            i += 1
    return out


def _gen_data(rng: random.Random):
    rows = []
    eid = 0
    for k in range(N_PARTITIONS):
        for _ in range(ROWS_PER_PARTITION):
            v = None if rng.random() < 0.05 else round(rng.uniform(0, 100), 3)
            rows.append((k, eid, v))
            eid += 1
    return rows


@pytest.mark.parametrize("case", range(N_CASES))
def test_random_pattern_matches_re_oracle(spark, case):
    from griddb_spark.operators import match_recognize

    rng = random.Random(SEED + case)
    pattern = _gen_pattern(rng)
    rows = _gen_data(rng)
    df = spark.createDataFrame(rows, "k int, event_id long, value double")

    got_df = match_recognize(
        df,
        pattern=pattern,
        define={v: cond for v, cond, _ in _CLASSES if v in pattern},
        measures={"first_id": "FIRST(event_id)", "last_id": "LAST(event_id)"},
        partition_by=["k"],
        order_by="event_id",
    )
    got: dict[int, list[tuple[int, int]]] = {k: [] for k in range(N_PARTITIONS)}
    for r in got_df.orderBy("k", "match_no").collect():
        got[r.k].append((r.first_id, r.last_id))

    rx = re.compile(_to_regex(pattern))
    for k in range(N_PARTITIONS):
        part = [(eid, v) for kk, eid, v in rows if kk == k]
        classes = "".join(_classify(v) for _, v in part)
        want = [
            (part[s][0], part[e][0]) for s, e in _ref_matches(classes, rx)
        ]
        assert got[k] == want, (
            f"pattern {pattern!r} partition {k}: {got[k]} != {want}"
        )


def test_jvm_fast_path_row_identical_to_nfa(spark, catalog, monkeypatch):
    """The single-variable JVM fast path must be row-identical to the
    NFA on a condition exercising NULL comparisons, boolean ops, NOT,
    PREV offsets, and match-function measures."""
    import importlib

    mr = importlib.import_module("griddb_spark.operators.match_recognize")

    ev = catalog.load("events").limit(4000)
    spec = dict(
        pattern="HOT",
        define={
            "HOT": "(value > PREV(value) * 1.5 or value > PREV(value, 2)) "
                   "and not (value < 10)"
        },
        measures={
            "hot_ts": "LAST(ts)",
            "v": "value",
            "prev_v": "PREV(value)",
            "m": "MATCH_NUMBER()",
            "who": "CLASSIFIER()",
            "mag": "ABS(value - PREV(value))",
        },
        measure_types={"m": "long", "mag": "double"},
        partition_by=["user_id"],
        order_by="ts",
    )
    fast = mr.match_recognize(ev, **spec)
    assert "FlatMapGroupsInPandas" not in fast._jdf.queryExecution().executedPlan().toString()

    monkeypatch.setattr(mr, "_try_fast_path", lambda *a, **k: None)
    slow = mr.match_recognize(ev, **spec)
    assert "FlatMapGroupsInPandas" in slow._jdf.queryExecution().executedPlan().toString()

    key = lambda r: (r.user_id, r.m)  # noqa: E731
    got_f = sorted(fast.collect(), key=key)
    got_s = sorted(slow.collect(), key=key)
    assert fast.columns == slow.columns
    assert len(got_f) == len(got_s) and len(got_f) > 0
    for a, b in zip(got_f, got_s):
        assert a == b, (a, b)


def test_jvm_fast_path_all_rows_and_undefined_var(spark, catalog, monkeypatch):
    import importlib

    mr = importlib.import_module("griddb_spark.operators.match_recognize")

    ev = catalog.load("events").limit(1000)
    spec = dict(
        pattern="ROW",
        define={},  # undefined variable matches every row
        measures={"mn": "MATCH_NUMBER()"},
        measure_types={"mn": "long"},
        partition_by=["user_id"],
        order_by="ts",
        all_rows=True,
    )
    fast = mr.match_recognize(ev, **spec)
    monkeypatch.setattr(mr, "_try_fast_path", lambda *a, **k: None)
    slow = mr.match_recognize(ev, **spec)
    key = lambda r: (r.user_id, r.mn)  # noqa: E731
    rf, rs = sorted(fast.collect(), key=key), sorted(slow.collect(), key=key)
    assert fast.columns == slow.columns and len(rf) == 1000
    assert all(a == b for a, b in zip(rf, rs))


def _two_var_spec(pattern):
    return dict(
        pattern=pattern,
        define={"A": "value >= 150", "B": "value < 150"},
        measures={
            "start_ts": "FIRST(ts)",
            "end_ts": "LAST(ts)",
            "v": "value",
            "m": "MATCH_NUMBER()",
            "who": "CLASSIFIER()",
        },
        measure_types={"m": "long"},
        partition_by=["user_id"],
        order_by="ts",
    )


@pytest.mark.parametrize("all_rows", [False, True])
@pytest.mark.parametrize("pattern", ["A+ B+", "A B", "A+ B", "A B+"])
def test_two_var_fast_path_row_identical_to_nfa(
    spark, catalog, monkeypatch, pattern, all_rows
):
    """VERDICT r5 #7: two-variable sequences (the spike-then-recover
    shape) compile to pure window Columns when the DEFINEs are
    row-disjoint; all four quantifier forms, in BOTH one-row and
    all-rows modes, must be row-identical to the NFA."""
    import importlib

    mr = importlib.import_module("griddb_spark.operators.match_recognize")

    ev = catalog.load("events").limit(4000)
    spec = _two_var_spec(pattern)
    spec["all_rows"] = all_rows
    fast = mr.match_recognize(ev, **spec)
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan, pattern

    monkeypatch.setattr(mr, "_try_fast_path_two_var", lambda *a, **k: None)
    slow = mr.match_recognize(ev, **spec)
    assert "FlatMapGroupsInPandas" in slow._jdf.queryExecution().executedPlan().toString()

    key = (
        (lambda r: (r.user_id, r.m, r.ts))
        if all_rows
        else (lambda r: (r.user_id, r.m))
    )
    got_f = sorted(fast.collect(), key=key)
    got_s = sorted(slow.collect(), key=key)
    assert fast.columns == slow.columns
    assert len(got_f) == len(got_s) > 0, pattern
    for x, y in zip(got_f, got_s):
        assert x == y, (pattern, x, y)


def test_two_var_overlapping_defines_fall_back_to_nfa(spark, catalog):
    """When some row satisfies BOTH defines, match selection is
    sequential — the runtime guard must route to the NFA (and the NFA
    result is the contract)."""
    import importlib

    mr = importlib.import_module("griddb_spark.operators.match_recognize")

    ev = catalog.load("events").limit(500)
    out = mr.match_recognize(
        ev,
        pattern="A+ B+",
        define={"A": "value > 10", "B": "value > 20"},  # overlap
        measures={"m": "MATCH_NUMBER()"},
        measure_types={"m": "long"},
        partition_by=["user_id"],
        order_by="ts",
    )
    assert "FlatMapGroupsInPandas" in (
        out._jdf.queryExecution().executedPlan().toString()
    )
    assert out.count() >= 0  # executes through the NFA


def test_two_var_fast_path_with_prev_defines_matches_nfa(
    spark, catalog, monkeypatch
):
    """PREV-based defines (the classic rise-then-fall shape) are
    row-disjoint, so they ride the fast path — values must still match
    the NFA exactly."""
    import importlib

    mr = importlib.import_module("griddb_spark.operators.match_recognize")

    ev = catalog.load("events").limit(3000)
    spec = dict(
        pattern="UP+ DOWN+",
        define={"UP": "value > PREV(value)", "DOWN": "value < PREV(value)"},
        measures={"start_ts": "FIRST(ts)", "peak": "FIRST(value)",
                  "trough": "LAST(value)", "m": "MATCH_NUMBER()"},
        measure_types={"m": "long"},
        partition_by=["user_id"],
        order_by="ts",
    )
    fast = mr.match_recognize(ev, **spec)
    assert "FlatMapGroupsInPandas" not in (
        fast._jdf.queryExecution().executedPlan().toString())
    monkeypatch.setattr(mr, "_try_fast_path_two_var", lambda *a, **k: None)
    slow = mr.match_recognize(ev, **spec)
    key = lambda r: (r.user_id, r.m)  # noqa: E731
    rf, rs = sorted(fast.collect(), key=key), sorted(slow.collect(), key=key)
    assert len(rf) == len(rs) > 0
    assert all(a == b for a, b in zip(rf, rs))


# ---------------------------------------------------------------------------
# vectorized two-variable frame matcher (compile_matcher's streaming face)
# ---------------------------------------------------------------------------

def _tv_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])


def _tv_frame(seed: int, n: int):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": np.full(n, 1, dtype="int64"),
        "ts": np.arange(n, dtype="int64"),
        "value": rng.integers(0, 300, n).astype("float64"),
    })


def _tv_run(pattern, define, measures, all_rows, pdf, offset, start_at,
            vectorized, monkeypatch):
    import importlib

    import pandas as pd

    mr = importlib.import_module("griddb_spark.operators.match_recognize")
    monkeypatch.setattr(mr, "_TWO_VAR_VECTOR_ENABLED", vectorized)
    process, out_schema, out_names = mr.compile_matcher(
        _tv_schema(), pattern, define, measures, ["user_id"], "ts",
        all_rows, {"m": "long"},
    )
    out, consumed, _ = process(pdf.copy(), offset, start_at)
    if isinstance(out, pd.DataFrame):
        frame = out.reindex(columns=out_names)
    else:
        frame = pd.DataFrame(list(out), columns=out_names)
    return frame.reset_index(drop=True), consumed


@pytest.mark.parametrize("all_rows", [False, True])
@pytest.mark.parametrize("pattern", ["A B", "A+ B", "A B+", "A+ B+"])
def test_vectorized_two_var_matcher_parity_vs_nfa(
    spark, monkeypatch, pattern, all_rows
):
    """The streaming-face vectorized two-var matcher (VERDICT r6 item 7)
    must be row-identical to the pure NFA across every quantifier form,
    both output modes, nonzero match_no offsets and start_at context
    boundaries (the streaming resume parameters)."""
    import pandas as pd

    define = {"A": "value >= 150", "B": "value < 150"}
    measures = {
        "start_ts": "FIRST(ts)", "end_ts": "LAST(ts)", "v": "value",
        "m": "MATCH_NUMBER()", "who": "CLASSIFIER()",
    }
    for seed in (0, 1, 2, 3):
        for start_at, offset in ((0, 0), (3, 7), (11, 2)):
            pdf = _tv_frame(seed, 120)
            fast, cf = _tv_run(pattern, define, measures, all_rows, pdf,
                               offset, start_at, True, monkeypatch)
            slow, cs = _tv_run(pattern, define, measures, all_rows, pdf,
                               offset, start_at, False, monkeypatch)
            assert cf == cs, (pattern, seed, start_at)
            assert len(fast) == len(slow), (pattern, seed, start_at)
            pd.testing.assert_frame_equal(
                fast, slow, check_dtype=False, check_exact=True,
            )


def test_vectorized_two_var_prev_defines_and_expr_measures(spark, monkeypatch):
    """PREV-based DEFINEs (physical shift) and arithmetic measures ride
    the vectorized path with NFA-exact values."""
    import pandas as pd

    define = {"UP": "value > PREV(value)", "DOWN": "value < PREV(value)"}
    measures = {"peak": "FIRST(value)", "twice": "value * 2",
                "m": "MATCH_NUMBER()"}
    for seed in (5, 6):
        pdf = _tv_frame(seed, 150)
        fast, cf = _tv_run("UP+ DOWN+", define, measures, False, pdf,
                           0, 0, True, monkeypatch)
        slow, cs = _tv_run("UP+ DOWN+", define, measures, False, pdf,
                           0, 0, False, monkeypatch)
        assert cf == cs and len(fast) == len(slow) > 0
        pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_vectorized_two_var_guard_falls_back_per_frame(spark, monkeypatch):
    """A frame where some row satisfies BOTH DEFINEs must produce the
    NFA's answer (the vectorized routine declines that frame)."""
    import pandas as pd

    define = {"A": "value > 10", "B": "value > 20"}  # overlapping
    measures = {"m": "MATCH_NUMBER()", "v": "LAST(value)"}
    pdf = _tv_frame(9, 80)
    fast, cf = _tv_run("A+ B+", define, measures, False, pdf, 0, 0,
                       True, monkeypatch)
    slow, cs = _tv_run("A+ B+", define, measures, False, pdf, 0, 0,
                       False, monkeypatch)
    assert cf == cs
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)

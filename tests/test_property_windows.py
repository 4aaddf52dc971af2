"""Property-style differential testing of the window-function surface
(OP_WINDOW/_PARTITION/_FRAME — ``sql_operator_sort.h:89-93``): randomized
PARTITION BY / ORDER BY / ROWS-frame combinations over ``events``, the
same SQL text run through Spark and DuckDB and compared row-for-row.

GridDB's window surface is aggregates + ROW_NUMBER/LAG/LEAD with ROWS
frames (``sql_type.h:287-294``), plus RANGE frames for the
moving-aggregate family since 5.8 (GridDB-5.8-CE-RELEASE_NOTES.md) —
exactly the grammar generated here (RANGE offsets over the integer order
key; the time-unit boundary form is covered in test_sql_frontends). ``event_id`` is unique, so the window
order is total and both engines see identical frames. Deterministic seed.
"""

from __future__ import annotations

import random

import pytest

SEED = 7
N_CASES = 22

#: (sql template, takes_frame) — {k} is a small random int
_FUNCS = [
    ("row_number()", False),
    ("lag(value, {k})", False),
    ("lead(value, {k})", False),
    ("sum(value)", True),
    ("avg(value)", True),
    ("min(value)", True),
    ("max(value)", True),
    ("count(value)", True),
]

_PARTITIONS = [
    "user_id % 7",
    "event_type",
    "user_id % 50",
    "length(event_type)",
]

_FRAMES = [
    "",  # engine default (RANGE UNBOUNDED PRECEDING .. CURRENT ROW)
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN {k} PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING",
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    "ROWS BETWEEN CURRENT ROW AND {k} FOLLOWING",
    "RANGE BETWEEN {k} PRECEDING AND CURRENT ROW",
    "RANGE BETWEEN {k} PRECEDING AND {k} FOLLOWING",
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
]


def _gen_cases():
    rng = random.Random(SEED)
    cases = []
    for _ in range(N_CASES):
        func, takes_frame = rng.choice(_FUNCS)
        func = func.format(k=rng.randint(1, 4))
        part = rng.choice(_PARTITIONS)
        frame = rng.choice(_FRAMES).format(k=rng.randint(0, 5)) if takes_frame else ""
        over = f"PARTITION BY {part} ORDER BY event_id {frame}"
        cases.append(
            f"SELECT event_id, {func} OVER ({over}) AS w "
            "FROM events ORDER BY event_id"
        )
    return cases


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize("sql", _gen_cases())
def test_random_window_matches_duckdb(spark, catalog, duck, sql):
    got = [tuple(_norm(v) for v in r) for r in spark.sql(sql).collect()]
    want = [tuple(_norm(v) for v in r) for r in duck.execute(sql).fetchall()]
    assert got == want, f"window mismatch for: {sql}"

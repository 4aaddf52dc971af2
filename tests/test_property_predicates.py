"""Property-style differential testing (SURVEY §5d): randomized TQL
predicates over `events`, evaluated through the TQL front-end and compared
row-for-row against DuckDB on the same parquet. Deterministic seed."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

SEED = 42
N_CASES = 20

#: predicate atoms: (TQL form, DuckDB form) — identical except ts casting
_ATOMS = [
    ("value > 50", "value > 50"),
    ("value <= 12.5", "value <= 12.5"),
    ("user_id >= 1200", "user_id >= 1200"),
    ("user_id BETWEEN 10 AND 40", "user_id BETWEEN 10 AND 40"),
    ("event_type = 'click'", "event_type = 'click'"),
    ("event_type IN ('view', 'purchase')", "event_type IN ('view', 'purchase')"),
    ("event_type LIKE 'c%'", "event_type LIKE 'c%'"),
    ("value IS NOT NULL", "value IS NOT NULL"),
    ("NOT (user_id < 700)", "NOT (user_id < 700)"),
    (
        "ts >= TIMESTAMP('2024-01-15T00:00:00Z')",
        "ts >= TIMESTAMP '2024-01-15 00:00:00'",
    ),
    ("value * 2 - 10 > user_id % 100", "value * 2 - 10 > user_id % 100"),
    (
        "(value > 50) XOR (user_id < 700)",
        "(value > 50) <> (user_id < 700)",
    ),
]


def _gen_cases():
    rng = random.Random(SEED)
    cases = []
    for _ in range(N_CASES):
        n = rng.randint(1, 3)
        atoms = rng.sample(_ATOMS, n)
        ops = [rng.choice([" AND ", " OR "]) for _ in range(n - 1)]
        tql, duck = atoms[0]
        for (t, d), op in zip(atoms[1:], ops):
            tql, duck = f"({tql}){op}({t})", f"({duck}){op}({d})"
        cases.append((tql, duck))
    return cases


@pytest.mark.parametrize("tql_pred,duck_pred", _gen_cases())
def test_random_predicate_matches_duckdb(catalog, duck, tql_pred, duck_pred):
    from griddb_spark.container import Collection

    col = Collection("events", catalog.load("events"))
    got = (
        col.query(f"SELECT event_id WHERE {tql_pred} ORDER BY event_id")
        .select("event_id")
        .toPandas()["event_id"]
        .tolist()
    )
    want = [
        r[0]
        for r in duck.execute(
            "SELECT event_id FROM (SELECT event_id, user_id, event_type, value,"
            " CAST(ts AS TIMESTAMP) ts FROM events)"
            f" WHERE {duck_pred} ORDER BY event_id"
        ).fetchall()
    ]
    assert got == want, f"predicate mismatch for TQL: {tql_pred}"

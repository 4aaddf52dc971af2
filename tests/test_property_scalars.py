"""Property-style differential testing of scalar string/numeric expressions
(``sql_expression_string.h:45-176``, ``sql_expression_numeric.h:45-86``):
randomized compositions of the shared Spark/DuckDB function surface over
``customer``, the same SQL text run through both engines and compared
row-for-row. Deterministic seed.
"""

from __future__ import annotations

import random

import pytest

SEED = 47
N_CASES = 15

#: string expression templates over {s} (a string column)
_STR_EXPRS = [
    "upper({s})",
    "lower({s})",
    "trim({s})",
    "substr({s}, 2, 5)",
    "replace({s}, '0', 'x')",
    "instr({s}, '1')",
    "length({s})",
    "reverse({s})",
    "lpad({s}, 12, '.')",
    "rpad({s}, 12, '.')",
    "concat({s}, '-', {s2})",
    "coalesce(nullif({s}, 'BUILDING'), 'none')",
]

_STR_COLS = ["c_name", "c_mktsegment"]

#: numeric expression templates over {n}
_NUM_EXPRS = [
    "abs({n})",
    "round({n}, 1)",
    "ceiling({n})",
    "floor({n})",
    "round(sqrt(abs({n})), 6)",
    "CAST({n} AS INT) % 97",
    "sign({n})",
    "greatest({n}, 0.0)",
    "least({n}, 100.0)",
]

_NUM_COLS = ["c_acctbal"]


def _gen_cases():
    rng = random.Random(SEED)
    cases = []
    for _ in range(N_CASES):
        exprs = []
        for t in rng.sample(_STR_EXPRS, rng.randint(1, 3)):
            s = rng.choice(_STR_COLS)
            s2 = rng.choice(_STR_COLS)
            exprs.append(t.format(s=s, s2=s2))
        for t in rng.sample(_NUM_EXPRS, rng.randint(1, 2)):
            exprs.append(t.format(n=rng.choice(_NUM_COLS)))
        aliased = [f"{e} AS e{i}" for i, e in enumerate(exprs)]
        cases.append(
            "SELECT c_custkey, "
            + ", ".join(aliased)
            + " FROM customer WHERE c_custkey <= 300 ORDER BY c_custkey"
        )
    return cases


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize("sql", _gen_cases())
def test_random_scalar_matches_duckdb(spark, catalog, duck, sql):
    got = [tuple(_norm(v) for v in r) for r in spark.sql(sql).collect()]
    want = [tuple(_norm(v) for v in r) for r in duck.execute(sql).fetchall()]
    assert got == want, f"scalar mismatch for: {sql}"

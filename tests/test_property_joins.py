"""Property-style differential testing of the join surface
(OP_JOIN_HASH/SORTED/NESTED + INNER/LEFT/RIGHT/FULL — ``sql_operator_join.h``,
``sql_type.h:232-243``; semi/anti via IN/EXISTS folds ``sql_type.h:131-134``):
randomized join types, key pairs, and side predicates, the same SQL text run
through Spark and DuckDB and compared as multisets (engines disagree on NULL
sort order, so no ORDER BY). Deterministic seed.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

SEED = 31
N_CASES = 15

#: (left table+alias, right table+alias, equi condition, projected cols)
_PAIRS = [
    (
        "customer c", "orders o", "c.c_custkey = o.o_custkey",
        ["c.c_custkey", "c.c_mktsegment", "o.o_orderkey",
         "round(o.o_totalprice, 2) AS price"],
    ),
    (
        "nation n", "customer c", "n.n_nationkey = c.c_nationkey",
        ["n.n_name", "c.c_custkey", "round(c.c_acctbal, 2) AS bal"],
    ),
    (
        "nation n", "supplier s", "n.n_nationkey = s.s_nationkey",
        ["n.n_name", "s.s_suppkey", "round(s.s_acctbal, 2) AS bal"],
    ),
]

_JOINS = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]

#: optional extra predicates per pair index (apply in WHERE)
_PREDS = {
    0: ["o.o_totalprice > 100000", "c.c_mktsegment = 'BUILDING'", None],
    1: ["c.c_acctbal > 0", "n.n_name LIKE 'A%'", None],
    2: ["s.s_acctbal < 5000", None, None],
}

#: IN/EXISTS folds (semi/anti) — GridDB has no SEMI/ANTI surface syntax
_SUBQUERY_CASES = [
    "SELECT c_custkey FROM customer WHERE c_custkey IN "
    "(SELECT o_custkey FROM orders WHERE o_totalprice > 150000)",
    "SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
    "(SELECT o_custkey FROM orders)",
    "SELECT n_name FROM nation WHERE EXISTS "
    "(SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey AND s_acctbal < 0)",
    "SELECT n_name FROM nation WHERE NOT EXISTS "
    "(SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)",
]


def _gen_cases():
    rng = random.Random(SEED)
    cases = list(_SUBQUERY_CASES)
    while len(cases) < N_CASES:
        i = rng.randrange(len(_PAIRS))
        left, right, cond, cols = _PAIRS[i]
        jt = rng.choice(_JOINS)
        pred = rng.choice(_PREDS[i])
        sql = f"SELECT {', '.join(cols)} FROM {left} {jt} {right} ON {cond}"
        if pred:
            sql += f" WHERE {pred}"
        cases.append(sql)
    return cases


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize("sql", _gen_cases())
def test_random_join_matches_duckdb(spark, catalog, duck, sql):
    got = Counter(tuple(_norm(v) for v in r) for r in spark.sql(sql).collect())
    want = Counter(tuple(_norm(v) for v in r) for r in duck.execute(sql).fetchall())
    assert got == want, f"join mismatch for: {sql}"

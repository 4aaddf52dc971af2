"""Property-style differential testing of the aggregate surface
(OP_GROUP/_DISTINCT — ``sql_operator_group.h:70-73``; aggregate registry
``sql_type.h:94-136``): randomized GROUP BY key sets and aggregate
combinations over ``lineitem``, the same SQL text run through Spark and
DuckDB and compared row-for-row. Deterministic seed.

Float-valued aggregates are rounded in-query (both engines see the same
text); magnitudes keep double summation-order error far below the rounded
digit.
"""

from __future__ import annotations

import random

import pytest

SEED = 21
N_CASES = 15

_VALUE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]

#: aggregate templates over a value column {c}
_AGGS = [
    "count(*)",
    "count({c})",
    "count(DISTINCT {c})",
    "min({c})",
    "max({c})",
    "round(sum({c}), 3)",
    "round(sum(DISTINCT {c}), 3)",
    "round(avg({c}), 6)",
    "round(stddev_samp({c}), 4)",
    "round(stddev_pop({c}), 4)",
    "round(var_pop({c}), 3)",
    "round(median({c}), 4)",
]

_KEYS = [
    "l_returnflag",
    "l_linestatus",
    "l_suppkey % 10",
    "l_orderkey % 7",
]


def _gen_cases():
    rng = random.Random(SEED)
    cases = []
    for _ in range(N_CASES):
        keys = rng.sample(_KEYS, rng.randint(1, 2))
        aggs = [
            t.format(c=rng.choice(_VALUE_COLS))
            for t in rng.sample(_AGGS, rng.randint(2, 4))
        ]
        key_aliases = [f"{k} AS k{i}" for i, k in enumerate(keys)]
        agg_aliases = [f"{a} AS a{i}" for i, a in enumerate(aggs)]
        order = ", ".join(f"k{i}" for i in range(len(keys)))
        cases.append(
            "SELECT "
            + ", ".join(key_aliases + agg_aliases)
            + " FROM lineitem GROUP BY "
            + ", ".join(keys)
            + f" ORDER BY {order}"
        )
    return cases


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize("sql", _gen_cases())
def test_random_aggregate_matches_duckdb(spark, catalog, duck, sql):
    got = [tuple(_norm(v) for v in r) for r in spark.sql(sql).collect()]
    want = [tuple(_norm(v) for v in r) for r in duck.execute(sql).fetchall()]
    assert got == want, f"aggregate mismatch for: {sql}"

"""Permanent dtype-fidelity gate: EVERY workload oracle's DuckDB logical
types must map 1:1 onto its Spark DataFrame schema (griddb_spark.oracle_audit
rules). This is the audit that caught the round-4 driver-hash failures —
HUGEINT aggregates, BIGINT-vs-DOUBLE ceil/floor, list-typed cells — as a
standing pytest so the class can never reappear silently.

One parametrized test per oracle-gated query. Each query is BUILT (lazy
plan → schema) but only streaming/DML entries actually execute work, so the
whole sweep stays cheap relative to the value-level suites.
"""

from __future__ import annotations

import pytest

from griddb_spark import workload
from griddb_spark.oracle_audit import duck_spark_mismatches
from tests.conftest import SF_DIR


def _names():
    return sorted(workload.ORACLE)


@pytest.mark.parametrize("name", _names())
def test_oracle_dtype_parity(name, spark, duck):
    sql = workload.ORACLE[name]
    rel = duck.sql(sql)
    df = workload.QUERIES[name](spark, SF_DIR)
    flags = duck_spark_mismatches(rel.columns, rel.types, df.schema)
    assert not flags, (
        f"{name}: driver-hash dtype hazards:\n"
        + "\n".join(f"  {c}: duck={d} spark={s} -- {why}"
                    for c, d, s, why in flags)
    )

"""Shared fixtures: one tuned SparkSession, the driver testdata catalog,
and a DuckDB-oracle comparison helper (SURVEY §5 adopted strategy)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from griddb_spark.session import get_spark

    s = get_spark("griddb_spark_tests")
    yield s


@pytest.fixture(scope="session")
def catalog(spark):
    from griddb_spark.catalog import ContainerCatalog

    c = ContainerCatalog(spark, SF_DIR)
    c.register_all()
    return c


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _norm(v, approx=False):
    """Dtype-faithful canonical form: the driver's gate hashes through
    pandas with dtype-aware hashing, so ``6`` (int) must NOT equal ``6.0``
    (float) and no silent rounding may paper over value drift. Each value
    becomes a (type-tag, value) pair; floats stay exact unless the column
    is explicitly declared approximate."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", round(v, 6) if approx else v)
    if isinstance(v, int):
        return ("int", v)
    if hasattr(v, "isoformat"):
        return ("ts", v.isoformat()[:26])  # µs precision, drop tz variance
    return (type(v).__name__, v)


def assert_matches_oracle(df, duck_con, sql, *, approx_cols=()):
    """Order-insensitive, column-name-sorted, DTYPE-STRICT comparison of a
    Spark DataFrame against a DuckDB query — the driver's correctness gate
    shape (row count + schema names + dtype-aware value hash). Floats
    compare exactly; pass column names in ``approx_cols`` only for columns
    deliberately declared approximate."""
    spark_rows = df.collect()
    duck_res = duck_con.execute(sql)
    duck_cols = [d[0] for d in duck_res.description]
    duck_rows = duck_res.fetchall()

    spark_cols = df.columns
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    order = sorted(spark_cols)
    s_idx = [spark_cols.index(c) for c in order]
    d_idx = [duck_cols.index(c) for c in order]
    apx = [c in approx_cols for c in order]

    s_set = sorted(
        (tuple(_norm(r[i], a) for i, a in zip(s_idx, apx)) for r in spark_rows),
        key=repr,
    )
    d_set = sorted(
        (tuple(_norm(r[i], a) for i, a in zip(d_idx, apx)) for r in duck_rows),
        key=repr,
    )
    assert len(s_set) == len(d_set), f"row count: spark={len(s_set)} duck={len(d_set)}"
    mismatches = [
        (a, b) for a, b in zip(s_set, d_set) if a != b
    ]
    assert not mismatches, f"value mismatch (first 5): {mismatches[:5]}"

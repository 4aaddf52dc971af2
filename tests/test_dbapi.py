"""DBAPI2 (PEP 249) surface over the GridDB SQL front-end (5.7 ships
Python DBAPI2 samples; the semantics here ride griddb_sql + the
ResultSet partial-fetch path)."""

import os

import pytest

from griddb_spark import dbapi

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture
def conn(spark):
    c = dbapi.connect(spark, SF_DIR)
    yield c
    c.close()


def test_module_globals():
    assert dbapi.apilevel == "2.0"
    assert dbapi.paramstyle == "qmark"
    assert issubclass(dbapi.ProgrammingError, dbapi.DatabaseError)
    assert issubclass(dbapi.DatabaseError, dbapi.Error)


def test_cursor_execute_fetch_cycle(conn):
    cur = conn.cursor()
    cur.execute(
        "SELECT o_orderpriority, count(*) AS n FROM orders "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    assert [d[0] for d in cur.description] == ["o_orderpriority", "n"]
    assert cur.description[0][1] == dbapi.STRING
    assert cur.description[1][1] == dbapi.NUMBER
    one = cur.fetchone()
    assert one is not None and len(one) == 2
    rest = cur.fetchall()
    assert len(rest) == 4  # 5 priorities total


def test_fetchmany_pages_are_size_bounded(conn):
    cur = conn.cursor()
    cur.arraysize = 7
    cur.execute("SELECT o_orderkey FROM orders ORDER BY o_orderkey")
    page = cur.fetchmany()
    assert len(page) == 7
    page2 = cur.fetchmany(100)
    assert len(page2) == 100
    assert page2[0] > page[-1]  # pages advance through the stream
    # drain
    n = 7 + 100 + len(cur.fetchall())
    cur2 = conn.cursor()
    cur2.execute("SELECT count(*) AS n FROM orders")
    assert n == cur2.fetchone()[0]


def test_qmark_parameters_bind(conn):
    cur = conn.cursor()
    cur.execute(
        "SELECT count(*) AS n FROM orders WHERE o_orderpriority = ?",
        ("1-URGENT",))
    n1 = cur.fetchone()[0]
    cur.execute(
        "SELECT count(*) AS n FROM orders "
        "WHERE o_orderpriority = '1-URGENT'")
    assert n1 == cur.fetchone()[0] > 0


def test_errors_and_closed_state(conn):
    cur = conn.cursor()
    with pytest.raises(dbapi.ProgrammingError):
        cur.fetchone()  # no execute yet
    with pytest.raises(dbapi.ProgrammingError):
        cur.execute("SELECT definitely_not_a_column FROM orders")
    with pytest.raises(dbapi.NotSupportedError):
        conn.rollback()
    cur.close()
    with pytest.raises(dbapi.InterfaceError):
        cur.execute("SELECT 1")
    conn.close()
    with pytest.raises(dbapi.InterfaceError):
        conn.cursor()


def test_executemany_insert_is_one_batch(spark, tmp_path):
    """executemany(INSERT) routes through the 5.5 batch-update path:
    one distributed append for the whole batch."""
    from griddb_spark.dml import DmlTable

    src = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string")
    path = str(tmp_path / "t")
    src.write.parquet(path)
    table = DmlTable(spark, path)
    conn = dbapi.connect(spark, SF_DIR, tables={"t": table})
    cur = conn.cursor()
    cur.executemany(
        "INSERT INTO t VALUES (?, ?)", [(3, "c"), (4, "d"), (5, "e")])
    assert cur.rowcount == 3
    got = {(r.id, r.name) for r in table.read().collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")}


def test_context_manager_and_iteration(spark):
    with dbapi.connect(spark, SF_DIR) as conn:
        cur = conn.cursor()
        cur.execute("SELECT r_name FROM region ORDER BY r_name")
        names = [row[0] for row in cur]
        assert len(names) == 5 and names == sorted(names)
    with pytest.raises(dbapi.InterfaceError):
        conn.cursor()

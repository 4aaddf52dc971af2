"""TQL + GridDB SQL translation front-ends, checked against equivalent
direct DataFrame results / DuckDB."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from griddb_spark.container import Collection, TimeSeries
from griddb_spark.sql.translate import griddb_sql, rewrite_sql


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def person(spark):
    rows = [(f"name{i:03d}", i % 2 == 0, i) for i in range(100)]
    df = spark.createDataFrame(rows, "name string, status boolean, count long")
    return Collection("person", df, row_key="name")


@pytest.fixture(scope="module")
def sensor(spark, catalog):
    df = catalog.table("events").filter(F.col("user_id") == 1)
    return TimeSeries("sensor", df, ts_col="ts")


def test_tql_select_where_order_limit_offset(person):
    # the reference guide sample: TQLSelect.java:54 + person_col fixture
    out = person.query(
        "SELECT * WHERE count >= 50 ORDER BY name LIMIT 10 OFFSET 5"
    ).collect()
    assert [r["name"] for r in out] == [f"name{i:03d}" for i in range(55, 65)]


def test_tql_predicates(person):
    got = person.query(
        "SELECT * WHERE (count BETWEEN 10 AND 20 OR name LIKE 'name09%') "
        "AND NOT status"
    ).collect()
    names = sorted(r["name"] for r in got)
    expected = sorted(
        f"name{i:03d}" for i in range(100)
        if ((10 <= i <= 20 or str(i).zfill(3).startswith("09")) and i % 2 == 1)
    )
    assert names == expected


def test_tql_aggregations(person):
    assert person.query("SELECT COUNT(*)").collect()[0][0] == 100
    assert person.query("SELECT SUM(count) WHERE count < 10").collect()[0][0] == 45
    assert person.query("SELECT MAX(count)").collect()[0][0] == 99
    got = person.query("SELECT AVG(count)").collect()[0][0]
    assert abs(got - 49.5) < 1e-9


def test_tql_projection(person):
    out = person.query("SELECT name, count * 2 WHERE count = 3").collect()
    assert out[0][1] == 6


def test_tql_time_selections(spark):
    rows = [
        (_ts("2024-01-01 00:00:00"), 10.0),
        (_ts("2024-01-01 00:00:10"), 20.0),
        (_ts("2024-01-01 00:00:30"), 40.0),
    ]
    ts = TimeSeries("s", spark.createDataFrame(rows, "ts timestamp, v double"))
    nxt = ts.query("SELECT TIME_NEXT(*, TIMESTAMP('2024-01-01T00:00:05Z'))")
    assert nxt.collect()[0]["v"] == 20.0
    interp = ts.query("SELECT TIME_INTERPOLATED(v, TIMESTAMP('2024-01-01T00:00:20Z'))")
    assert interp.collect()[0]["v"] == 30.0
    samp = ts.query(
        "SELECT TIME_SAMPLING(v, TIMESTAMP('2024-01-01T00:00:00Z'), "
        "TIMESTAMP('2024-01-01T00:00:30Z'), 10, SECOND)"
    )
    assert samp.count() == 4
    tavg = ts.query("SELECT TIME_AVG(v)")
    assert abs(tavg.collect()[0]["aggregation_result"] - (10 * 5 + 20 * 15 + 40 * 10) / 30) < 1e-9
    mx = ts.query("SELECT MAX_ROWS(v)")
    assert mx.collect()[0]["v"] == 40.0


def test_rewrite_sql_tokens():
    assert "to_timestamp('2024-01-01 00:00:00')" in rewrite_sql(
        "SELECT * FROM t WHERE ts > TIMESTAMP('2024-01-01T00:00:00Z')"
    )
    assert "RLIKE" in rewrite_sql("SELECT * FROM t WHERE name GLOB 'ab*'")
    # GridDB-specific hints stripped, Spark hints kept
    assert "/*+" not in rewrite_sql("SELECT /*+ LEADING(a b) */ * FROM t")
    assert "BROADCAST" in rewrite_sql("SELECT /*+ BROADCAST(n) */ * FROM t")
    # TableRowCount: small count -> BROADCAST hint; large count -> dropped
    small = rewrite_sql(
        "SELECT /*+ TableRowCount(nation, 25) */ * FROM nation, supplier "
        "WHERE n_nationkey = s_nationkey")
    assert "BROADCAST(nation)" in small and "TableRowCount" not in small
    big = rewrite_sql(
        "SELECT /*+ TableRowCount(lineitem, 6000000) */ * FROM lineitem")
    assert "BROADCAST" not in big and "TableRowCount" not in big
    assert "/*+" not in big
    # GridDB packs several hints in ONE comment: both must still apply
    combo = rewrite_sql(
        "SELECT /*+ Leading(orders customer) TableRowCount(nation, 25) */ "
        "count(*) AS n FROM customer, orders, nation "
        "WHERE c_custkey = o_custkey AND c_nationkey = n_nationkey")
    assert "BROADCAST(nation)" in combo
    import re
    assert re.search(r"FROM\s+orders\s*,\s*customer\s*,\s*nation", combo)


def test_griddb_sql_passthrough(spark, catalog, duck):
    from tests.conftest import assert_matches_oracle

    df = griddb_sql(
        spark, catalog,
        "SELECT r_name, count(*) AS n FROM region "
        "JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name",
    )
    assert_matches_oracle(
        df, duck,
        "SELECT r_name, count(*) AS n FROM region "
        "JOIN nation ON n_regionkey = r_regionkey GROUP BY r_name",
    )


def test_griddb_sql_group_by_range(spark, catalog):
    df = griddb_sql(
        spark, catalog,
        "SELECT ts, avg(value) AS av, count(*) AS n FROM events "
        "WHERE ts BETWEEN TIMESTAMP('2024-01-01T00:00:00Z') "
        "AND TIMESTAMP('2024-01-02T00:00:00Z') "
        "GROUP BY RANGE (ts) EVERY (1, HOUR) FILL (PREVIOUS)",
    )
    rows = df.orderBy("ts").collect()
    assert len(rows) == 25  # inclusive range → 25 hourly buckets
    assert df.columns == ["ts", "av", "n"]
    # PREVIOUS fill: any empty bucket copies the previous non-empty value
    seen_null = False
    for i, r in enumerate(rows):
        if r["n"] is None:
            seen_null = True
            assert i == 0  # only a leading empty bucket may be NULL


def test_griddb_sql_match_recognize(spark, catalog):
    df = griddb_sql(
        spark, catalog,
        """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id
          ORDER BY ts
          MEASURES FIRST(ts) AS start_time, LAST(ts) AS end_time
          PATTERN (UP UP)
          DEFINE UP AS value > PREV(value)
        )
        """,
    )
    rows = df.collect()
    assert set(df.columns) == {"user_id", "start_time", "end_time", "match_no"}
    assert len(rows) > 0


def test_griddb_sql_explain(spark, catalog):
    from griddb_spark.sql.translate import griddb_sql

    out = griddb_sql(
        spark, catalog,
        "EXPLAIN SELECT c_custkey FROM customer WHERE c_acctbal > 100",
    )
    text = "\n".join(r.plan for r in out.collect())
    assert "Filter" in text and "c_acctbal" in text
    out2 = griddb_sql(
        spark, catalog,
        "EXPLAIN ANALYZE SELECT c_custkey FROM customer WHERE c_acctbal > 100",
    )
    rows2 = out2.collect()
    # r6: EXPLAIN ANALYZE executes and returns per-node runtime actuals
    text2 = "\n".join(r.plan for r in rows2)
    assert "Scan" in text2 or "FileScan" in text2
    assert any("numOutputRows=" in r.metrics for r in rows2)


def test_collection_partial_fetch(catalog):
    from griddb_spark.container import Collection

    col = Collection("customer", catalog.load("customer"), row_key="c_custkey")
    it = col.fetch(limit=7, partial=True)
    rows = list(it)
    assert len(rows) == 7


def test_prepared_statement_placeholders(spark, catalog):
    """? placeholders bind positionally (EXPR_PLACEHOLDER, sql_type.h:42-92)
    through parameterized spark.sql — no string splicing."""
    from griddb_spark.sql.translate import griddb_sql

    out = griddb_sql(
        spark, catalog,
        "SELECT c_custkey, c_name FROM customer "
        "WHERE c_nationkey = ? AND c_acctbal > ? ORDER BY c_custkey",
        params=[3, 1000.0],
    )
    rows = out.collect()
    ref = (
        catalog.load("customer")
        .filter((F.col("c_nationkey") == 3) & (F.col("c_acctbal") > 1000.0))
        .orderBy("c_custkey")
        .select("c_custkey", "c_name")
        .collect()
    )
    assert rows == ref and len(rows) > 0


def test_range_frame_unit_boundary_rewrite(spark, catalog):
    """GridDB 5.8 FRAME-clause time-unit boundary: RANGE BETWEEN
    (10, MINUTE) PRECEDING AND CURRENT ROW -> Spark interval range frame
    over a timestamp ordering (GridDB-5.8-CE-RELEASE_NOTES.md)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from griddb_spark.sql.translate import rewrite_sql

    sql = (
        "SELECT user_id, ts, AVG(value) OVER (PARTITION BY user_id "
        "ORDER BY ts RANGE BETWEEN (10, MINUTE) PRECEDING AND CURRENT ROW)"
        " AS mov FROM events WHERE user_id < 3"
    )
    rewritten = rewrite_sql(sql)
    assert "INTERVAL 10 MINUTE PRECEDING" in rewritten

    catalog.load("events").createOrReplaceTempView("events")
    got = spark.sql(rewritten)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    want = (
        catalog.load("events")
        .filter(F.col("user_id") < 3)
        .select("user_id", "ts", F.avg("value").over(w).alias("mov"))
    )
    a = sorted((r.user_id, r.ts, round(r.mov, 9)) for r in got.collect())
    b = sorted((r.user_id, r.ts, round(r.mov, 9)) for r in want.collect())
    assert a == b and len(a) > 0


def test_prepared_statement_rebind_and_validation(spark, catalog):
    from griddb_spark.sql.translate import prepare

    stmt = prepare(
        spark, catalog,
        "SELECT count(*) AS n FROM orders WHERE o_totalprice > ? "
        "AND o_orderstatus = ?",
    )
    assert stmt.param_count == 2
    lo = stmt.execute(1000.0, "F").collect()[0].n
    hi = stmt.execute(100000.0, "F").collect()[0].n
    assert lo > hi >= 0  # rebinding actually changes the plan's literals
    with pytest.raises(ValueError):
        stmt.execute(1000.0)


def test_prepared_statement_dialect_rewrite_happens_at_prepare(spark, catalog):
    """GridDB-isms (GLOB) must survive prepare-time rewriting and bind."""
    from griddb_spark.sql.translate import prepare

    stmt = prepare(
        spark, catalog,
        "SELECT count(*) AS n FROM part WHERE p_name GLOB 'red*' "
        "AND p_size > ?",
    )
    n = stmt.execute(0).collect()[0].n
    direct = spark.sql(
        "SELECT count(*) AS n FROM part WHERE p_name LIKE 'red%'"
    ).collect()[0].n
    assert n == direct > 0


def test_batch_update_one_write_and_error_timing(spark, catalog, tmp_path):
    from griddb_spark.dml import DmlTable
    from griddb_spark.sql.translate import prepare

    t = DmlTable(spark, str(tmp_path / "t")).create(
        spark.createDataFrame([], "id int, name string, score double")
    )
    stmt = prepare(spark, catalog, "INSERT INTO t VALUES (?, ?, ?)",
                   tables={"t": t})
    # executing an update statement as a query must refuse
    with pytest.raises(ValueError):
        stmt.execute(1, "x", 0.0)
    stmt.add_batch(1, "a", 1.0)
    stmt.add_batch(2, "b", None)
    assert stmt.execute_batch() == [1, 1]
    assert stmt.execute_batch() == []  # batch drained
    got = {r.id: (r.name, r.score) for r in t.read().collect()}
    assert got == {1: ("a", 1.0), 2: ("b", None)}
    # batching a SELECT errors at executeBatch time (reference-documented
    # timing), not at addBatch
    q = prepare(spark, catalog, "SELECT count(*) AS n FROM orders")
    with pytest.raises(ValueError):
        q.execute_batch()
    # partial column list + inline literal values
    s2 = prepare(spark, catalog, "INSERT INTO t (id, name) VALUES (?, 'z')",
                 tables={"t": t})
    s2.add_batch(7)
    s2.execute_batch()
    assert {r.id for r in t.read().collect()} == {1, 2, 7}
    assert t.read().filter("id = 7").collect()[0].score is None


def test_batch_update_partial_columns_on_partitioned_target(
    spark, catalog, tmp_path
):
    """A partial column list fills the unnamed columns with typed NULLs,
    so a PARTITIONED target's partitioning expression always finds its
    source column and the appended files carry the full schema."""
    from griddb_spark.dml import DmlTable, HashPartitioning
    from griddb_spark.sql.translate import prepare

    t = DmlTable(spark, str(tmp_path / "tp"), HashPartitioning("id", 4)).create(
        spark.createDataFrame([(1, "seed", 0.5)],
                              "id int, name string, score double")
    )
    stmt = prepare(spark, catalog, "INSERT INTO tp (id, name) VALUES (?, ?)",
                   tables={"tp": t})
    stmt.add_batch(2, "two")
    stmt.add_batch(3, "three")
    assert stmt.execute_batch() == [1, 1]
    got = {r.id: (r.name, r.score) for r in t.read().collect()}
    assert got == {1: ("seed", 0.5), 2: ("two", None), 3: ("three", None)}
    # schema is identical across files: a plain (non-mergeSchema) read
    # already returned every column above; full schema asserted here
    assert [f.name for f in t.read().schema.fields] == ["id", "name", "score"]


def test_continuous_aggregate_incremental_refresh(spark, catalog, tmp_path):
    """Feeding refresh #2 ONLY the data at/after the stored high-water
    mark must converge to the one-shot rollup — old buckets come from the
    target, not from re-reading the source."""
    from pyspark.sql import functions as F

    from griddb_spark.dml import DmlTable
    from griddb_spark.operators import refresh_continuous_aggregate
    from griddb_spark.operators.continuous_agg import BUCKET_COL

    ev = catalog.load("events")
    aggs = {"n": F.count(F.lit(1)), "avg_v": F.round(F.avg("value"), 6)}

    t1 = DmlTable(spark, str(tmp_path / "full"))
    refresh_continuous_aggregate(ev, t1, "ts", 1, "DAY", aggs)
    want = {r[BUCKET_COL]: (r.n, r.avg_v) for r in t1.read().collect()}

    t2 = DmlTable(spark, str(tmp_path / "inc"))
    split = "2024-01-11"
    refresh_continuous_aggregate(
        ev.filter(F.col("ts") < F.lit(split).cast("timestamp")),
        t2, "ts", 1, "DAY", aggs)
    hwm = t2.read().agg(F.max(BUCKET_COL)).collect()[0][0]
    # second refresh sees ONLY rows from the hwm bucket onward
    tail = ev.filter(
        F.unix_millis(F.col("ts")) >= hwm)
    refresh_continuous_aggregate(tail, t2, "ts", 1, "DAY", aggs)
    got = {r[BUCKET_COL]: (r.n, r.avg_v) for r in t2.read().collect()}
    assert got == want and len(want) == 30


def test_tql_geometry_mbr_intersects_rect_and_wkt(spark):
    from griddb_spark.container import Collection

    df = spark.createDataFrame(
        [(1, "POINT(5 5)"), (2, "POINT(50 5)"),
         (3, "LINESTRING(0 0, 4 8)"),          # envelope straddles probe
         (4, "POLYGON((20 20, 30 20, 30 30, 20 30, 20 20))")],
        ["id", "geom"],
    )
    col = Collection("g", df)
    got = {r.id for r in col.query(
        "SELECT * WHERE ST_MBRINTERSECTS(geom, ST_MAKERECT(0, 0, 10, 10))"
    ).collect()}
    assert got == {1, 3}
    # literal-WKT probe: envelope folded at rewrite time
    got2 = {r.id for r in col.query(
        "SELECT * WHERE ST_MBRINTERSECTS(geom, "
        "ST_GEOMFROMTEXT('POLYGON((25 25, 60 25, 60 60, 25 60, 25 25))'))"
    ).collect()}
    assert got2 == {4}
    # composes with ordinary predicates
    got3 = {r.id for r in col.query(
        "SELECT * WHERE id > 1 AND "
        "ST_MBRINTERSECTS(geom, ST_MAKERECT(0, 0, 100, 100))"
    ).collect()}
    assert got3 == {2, 3, 4}


def test_max_dop_hint_maps_to_repartition(spark, catalog):
    """/*+ MaxDegreeOfParallelism(n) */ (sql_compiler.h:36-64) maps to
    the REPARTITION(n) hint: the hinted SELECT's shuffle lands on exactly
    n partitions."""
    from griddb_spark.sql.translate import griddb_sql, rewrite_sql

    out = rewrite_sql(
        "SELECT /*+ MaxDegreeOfParallelism(4) */ o_orderpriority, count(*)"
        " FROM orders GROUP BY o_orderpriority")
    assert "/*+ REPARTITION(4) */" in out
    assert "MaxDegreeOfParallelism" not in out
    df = griddb_sql(
        spark, catalog,
        "SELECT /*+ MaxDegreeOfParallelism(4) */ o_orderpriority, "
        "count(*) AS n FROM orders GROUP BY o_orderpriority")
    assert df.rdd.getNumPartitions() == 4
    # anchored: a hint inside a CTE body must not move, and an invalid
    # n is dropped rather than crashing
    out2 = rewrite_sql(
        "SELECT /*+ MaxDegreeOfParallelism(0) */ 1 AS x FROM orders")
    assert "REPARTITION" not in out2


def test_explain_analyze_returns_runtime_metrics(spark, catalog):
    """EXPLAIN ANALYZE executes the statement and returns per-node
    SQLMetric actuals (sql_execution.cpp:3234-3241 serializes the
    executed task plan with actual row counts)."""
    from griddb_spark.sql.translate import griddb_sql

    rows = griddb_sql(
        spark, catalog,
        "EXPLAIN ANALYZE SELECT o_orderpriority, count(*) AS n "
        "FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderpriority",
    ).collect()
    assert rows[0].__fields__ == ["id", "plan", "metrics"]
    mets = " | ".join(r.metrics for r in rows)
    assert "numOutputRows=" in mets  # actuals populated, not static plan
    n_out = [int(m.split("numOutputRows=")[1].split(",")[0].strip())
             for r in rows for m in [r.metrics] if "numOutputRows=" in m]
    assert any(v > 0 for v in n_out)
    # plain EXPLAIN stays the (non-executed) logical plan, 2 columns
    plain = griddb_sql(spark, catalog,
                       "EXPLAIN SELECT count(*) AS n FROM orders")
    assert plain.columns == ["id", "plan"]


def test_three_hint_composition(spark, catalog):
    """TableRowCount + MaxDegreeOfParallelism + Leading in ONE comment
    (GridDB packs several hints per /*+ ... */) must all apply: broadcast
    + pinned partition count + reordered FROM list."""
    from griddb_spark.sql.translate import griddb_sql, rewrite_sql

    sql = ("SELECT /*+ TableRowCount(nation, 25) MaxDegreeOfParallelism(4) "
           "Leading(nation supplier) */ n_name, count(*) AS n "
           "FROM supplier, nation WHERE s_nationkey = n_nationkey "
           "GROUP BY n_name")
    out = rewrite_sql(sql)
    assert "REPARTITION(4)" in out and "BROADCAST(nation)" in out
    assert "FROM nation, supplier" in out  # Leading applied
    df = griddb_sql(spark, catalog, sql)
    assert df.rdd.getNumPartitions() == 4
    assert "BroadcastHashJoin" in (
        df._jdf.queryExecution().executedPlan().toString())


# ---------------------------------------------------------------------------
# MaxGeneratedRows / generation budget (sql_operator_group.cpp:1378)
# ---------------------------------------------------------------------------

def test_generation_budget_exceeded_raises(spark):
    """group_by_range enforces the fill budget with the reference's error
    text once generated rows exceed the limit (guard active because
    n_buckets > limit)."""
    from griddb_spark.operators import group_by_range

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0), ("2024-01-02 00:00:00", 2.0)],
        "ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = group_by_range(
        df, "ts", 1, "MINUTE", {"av": F.avg("value")},
        start="2024-01-01 00:00:00", end="2024-01-02 00:00:00",
        fill="NULL", generation_limit=100,
    )
    with pytest.raises(Exception, match="Too many groups filled \\(limit=100\\)"):
        out.collect()


def test_generation_budget_static_pass_has_no_guard(spark):
    """When the lattice alone proves the budget can't be exceeded
    (no series keys, n_buckets <= limit), the guard must cost nothing —
    no raise_error, no extra join in the plan."""
    from griddb_spark.operators import group_by_range

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1.0)], "ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = group_by_range(
        df, "ts", 1, "HOUR", {"av": F.avg("value")},
        start="2024-01-01 00:00:00", end="2024-01-02 00:00:00",
        fill="NULL",
    )
    assert "raise_error" not in out._jdf.queryExecution().toString()
    assert out.count() == 25


def test_generation_budget_with_series_keys_passes_within_budget(spark):
    """Series keys force the runtime guard into the plan; a statement
    within budget returns the plain filled result."""
    from griddb_spark.operators import group_by_range

    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (2, "2024-01-01 06:00:00", 2.0)],
        "k long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = group_by_range(
        df, "ts", 1, "HOUR", {"av": F.avg("value")},
        start="2024-01-01 00:00:00", end="2024-01-01 23:00:00",
        fill="NULL", by=["k"],
    )
    assert "raise_error" in out._jdf.queryExecution().toString()
    rows = out.collect()
    assert len(rows) == 48  # 2 series x 24 buckets
    assert sum(r["av"] is not None for r in rows) == 2


def test_front_end_max_generated_rows_hint(spark, catalog):
    """/*+ MaxGeneratedRows(n) */ through the SQL front-end: a tiny
    budget over a minute-grained 30-day grid must fail with the
    reference's error; a generous budget returns the filled grid."""
    base = (
        "SELECT /*+ MaxGeneratedRows({n}) */ avg(value) AS av "
        "FROM events WHERE ts BETWEEN TIMESTAMP('2024-01-01T00:00:00Z') "
        "AND TIMESTAMP('2024-01-03T00:00:00Z') "
        "GROUP BY RANGE (ts) EVERY (1, MINUTE) FILL (NULL)"
    )
    with pytest.raises(Exception, match="Too many groups filled \\(limit=5\\)"):
        griddb_sql(spark, catalog, base.format(n=5)).collect()
    ok = griddb_sql(spark, catalog, base.format(n=500000))
    assert ok.count() == 2 * 24 * 60 + 1


def test_cost_hint_extraction_variants():
    """Hint-name forms (underscored/camel), multiples, and table names
    inside string literals must extract exactly."""
    from griddb_spark.sql.translate import (
        _extract_cost_hints,
        _replace_table_ref,
    )

    sql = ("SELECT /*+ No_Cost_Based_Join_Driving() CostBasedJoin() */ 1 "
           "FROM orders")
    out, confs = _extract_cost_hints(sql)
    assert "CostBased" not in out and "Cost_Based" not in out
    assert confs["spark.sql.adaptive.enabled"] == "false"
    assert confs["spark.sql.cbo.enabled"] == "true"
    # no hints → no confs, sql unchanged
    out2, confs2 = _extract_cost_hints("SELECT 1 FROM orders")
    assert confs2 == {} and out2 == "SELECT 1 FROM orders"
    # table-ref substitution: only FROM/JOIN positions rewrite (alias
    # keeps qualified refs working), string literals never do, and a
    # COLUMN named like the table is untouched
    s = "SELECT * FROM orders WHERE note = 'orders pending' AND orders.id > 0"
    r = _replace_table_ref(s, "orders", "orders__b")
    assert r == ("SELECT * FROM orders__b AS orders WHERE note = "
                 "'orders pending' AND orders.id > 0")
    s2 = "SELECT o.orders FROM orders o JOIN part ON o.orders = p_partkey"
    assert _replace_table_ref(s2, "orders", "b") == \
        "SELECT o.orders FROM b o JOIN part ON o.orders = p_partkey"
    s3 = "SELECT * FROM region, orders WHERE r_regionkey = o_custkey"
    assert _replace_table_ref(s3, "orders", "b") == \
        "SELECT * FROM region, b AS orders WHERE r_regionkey = o_custkey"
    # a non-FROM comma (select list) never rewrites
    s4 = "SELECT region, orders FROM lineitem"
    assert _replace_table_ref(s4, "orders", "b") == s4


def test_legacy_plan_hint_extraction():
    """LegacyPlan(maj, min) pins the planning version: <=5.4 falls back
    both join reordering and driving, <=5.7 driving only, >5.7 nothing;
    an explicit CostBased* hint overrides the pin (reference checks
    hasHint first)."""
    from griddb_spark.sql.translate import _extract_cost_hints

    out, c = _extract_cost_hints("SELECT /*+ LegacyPlan(5, 3) */ 1 FROM t")
    assert "LegacyPlan" not in out
    assert c["spark.sql.adaptive.enabled"] == "false"
    assert c["spark.sql.cbo.enabled"] == "false"
    _, c = _extract_cost_hints("SELECT /*+ LegacyPlan(5, 6) */ 1 FROM t")
    assert c == {"spark.sql.adaptive.enabled": "false"}
    _, c = _extract_cost_hints("SELECT /*+ LegacyPlan(5, 9) */ 1 FROM t")
    assert c == {}
    _, c = _extract_cost_hints(
        "SELECT /*+ LegacyPlan(5, 3) CostBasedJoinDriving() */ 1 FROM t")
    assert c["spark.sql.adaptive.enabled"] == "true"  # explicit hint wins
    _, c = _extract_cost_hints(
        "SELECT /*+ LegacyPlan(5, 0, 2) */ 1 FROM t")  # patch arg form
    assert c["spark.sql.adaptive.enabled"] == "false"


def test_distributed_policy_and_task_input_hints_are_noops(spark, catalog):
    """DistributedPolicy / MaxDegreeOfTaskInput: accepted-and-stripped
    is FULL PARITY, not a gap. DISTRIBUTED_POLICY is vestigial in the
    reference itself — registered (sql_compiler.cpp:24796), arg-checked
    (:25003), duplicate-warned (:25153), and never read by any execution
    path — so the reference parses-validates-ignores it exactly as we
    do. MAX_DEGREE_OF_TASK_INPUT bounds union-all merge-task fan-in
    (sql_compiler.cpp:13338), a quantity with no Spark existence (union
    concatenates partitions, no merge task). Pin: same rows with and
    without the hints; no hint text survives the rewrite."""
    from griddb_spark.sql.translate import griddb_sql, rewrite_sql

    hinted = (
        "SELECT /*+ DistributedPolicy('UNION') MaxDegreeOfTaskInput(4) */"
        " c_nationkey, COUNT(*) AS n FROM customer"
        " GROUP BY c_nationkey ORDER BY c_nationkey"
    )
    plain = (
        "SELECT c_nationkey, COUNT(*) AS n FROM customer"
        " GROUP BY c_nationkey ORDER BY c_nationkey"
    )
    rewritten = rewrite_sql(hinted)
    assert "DistributedPolicy" not in rewritten
    assert "MaxDegreeOfTaskInput" not in rewritten
    assert "/*+" not in rewritten
    assert griddb_sql(spark, catalog, hinted).collect() == \
        griddb_sql(spark, catalog, plain).collect()

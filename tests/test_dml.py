"""DML + partitioned containers: update/delete semantics and partition
pruning (the NarrowingKey analog — PartitionFilters must appear in the
physical scan)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_update_delete_roundtrip(spark, tmp_path):
    from griddb_spark.dml import DmlTable

    df = spark.createDataFrame(
        [(1, "a", -5.0), (2, "b", 3.0), (3, "a", -1.0), (4, "c", 9.0)],
        "id int, seg string, bal double",
    )
    t = DmlTable(spark, str(tmp_path / "t")).create(df)
    t.insert(spark.createDataFrame([(5, "b", -2.0)], "id int, seg string, bal double"))
    t.update(F.col("bal") < 0, {"bal": F.lit(0.0)})
    t.delete(F.col("seg") == "c")
    rows = {r.id: (r.seg, r.bal) for r in t.read().collect()}
    assert rows == {1: ("a", 0.0), 2: ("b", 3.0), 3: ("a", 0.0), 5: ("b", 0.0)}


def test_alter_add_rename_column(spark, tmp_path):
    from griddb_spark.dml import DmlTable, hash_partition_expr

    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, seg string"
    )
    t = DmlTable(spark, str(tmp_path / "t")).create(df)
    t.alter_add_column("score", "DOUBLE")
    assert dict(t.read().dtypes)["score"] == "double"
    assert [r.score for r in t.read().collect()] == [None, None]
    # new inserts carry the column; old rows stay NULL
    t.insert(
        spark.createDataFrame([(3, "c", 1.5)], "id int, seg string, score double")
    )
    rows = {r.id: r.score for r in t.read().collect()}
    assert rows == {1: None, 2: None, 3: 1.5}
    t.alter_rename_column("seg", "segment")
    assert "segment" in t.read().columns and "seg" not in t.read().columns

    # partitioned variant takes the rewrite path
    p = DmlTable(
        spark, str(tmp_path / "p"), hash_partition_expr("id", 4)
    ).create(df)
    p.alter_add_column("flag", "BOOL")
    assert dict(p.read().dtypes)["flag"] == "boolean"
    assert p.read().count() == 2


def test_hash_partitioned_update_and_pruning(spark, tmp_path, catalog):
    from griddb_spark.dml import DmlTable, range_partition_expr

    import re

    ev = catalog.load("events")
    t = DmlTable(
        spark, str(tmp_path / "ev"), range_partition_expr("ts", 1, "DAY")
    ).create(ev)
    day_ms = 86_400_000
    start = 1704067200000 + 9 * day_ms  # 2024-01-10
    day = t.scan_range(start, start + day_ms)
    plan = day._jdf.queryExecution().executedPlan().toString()
    # the derived __part bounds must reach the scan as partition filters
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__part" in m.group(1), plan
    assert day.count() > 0
    # pruned read returns exactly the day's rows
    expected = ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-11 00:00:00").cast("timestamp"))
    ).count()
    assert day.count() == expected


def test_range_hash_partitioned_pruning(spark, tmp_path, catalog):
    """RANGE_HASH composite: both __part (range bucket) and __subpart
    (hash bucket) must reach the scan as PartitionFilters, and the pruned
    read must equal the plain filtered read."""
    import re

    from griddb_spark.dml import DmlTable, range_hash_partition_expr

    ev = catalog.load("events")
    t = DmlTable(
        spark, str(tmp_path / "ev_rh"),
        range_hash_partition_expr("ts", 1, "DAY", "user_id", 4),
    ).create(ev)
    day_ms = 86_400_000
    start = 1704067200000 + 9 * day_ms  # 2024-01-10
    sel = t.scan_key_range(start, start + day_ms, 3)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "__part" in m.group(1) and "__subpart" in m.group(1), plan
    expected = ev.filter(
        (F.col("user_id") == 3)
        & (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-11 00:00:00").cast("timestamp"))
    ).count()
    assert sel.count() == expected and expected > 0
    # time-range-only scan (all hash buckets) also prunes and agrees
    allb = t.scan_range(start, start + day_ms)
    assert allb.count() == ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-11 00:00:00").cast("timestamp"))
    ).count()


def test_database_ddl_roundtrip(spark):
    """CREATE/DROP DATABASE (sql_parser.h:239-240) + #databases meta
    table: namespaces appear/disappear, ids are a dense name rank."""
    from griddb_spark.container import GridStore

    gs = GridStore(spark)
    gs.create_database("gsdb_t_a")
    gs.create_database("gsdb_t_b")
    names = {r.database_name for r in gs.databases().collect()}
    assert {"default", "gsdb_t_a", "gsdb_t_b"} <= names
    gs.drop_database("gsdb_t_b")
    names = {r.database_name for r in gs.databases().collect()}
    assert "gsdb_t_b" not in names and "gsdb_t_a" in names
    gs.drop_database("gsdb_t_a")

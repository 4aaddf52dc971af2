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


def test_row_expiration_visibility_and_vacuum(spark, tmp_path):
    import os

    from griddb_spark.dml import (
        DmlTable,
        PARTITION_COL,
        RowExpiration,
        range_partition_expr,
    )

    day = 86_400_000
    # 20 days of hourly rows starting 2024-01-01
    base = 1_704_067_200_000
    rows = [(i, base + i * 3_600_000) for i in range(20 * 24)]
    df = spark.createDataFrame(rows, "id int, ms long").select(
        "id", F.timestamp_millis(F.col("ms")).alias("ts")
    )
    now = base + 20 * day  # 2024-01-21
    t = DmlTable(
        spark, str(tmp_path / "t"), range_partition_expr("ts", 2, "DAY"),
        expiration=RowExpiration(7, "DAY", division_count=7, now_ms=now),
    ).create(df)

    # visibility: row-exact cutoff at now - 7d, before any vacuum
    cutoff = now - 7 * day
    assert t.read().count() == sum(1 for _, ms in rows if ms >= cutoff)

    dirs_before = [d for d in os.listdir(t.path)
                   if d.startswith(f"{PARTITION_COL}=")]
    dropped = t.vacuum_expired()
    dirs_after = [d for d in os.listdir(t.path)
                  if d.startswith(f"{PARTITION_COL}=")]
    # divisions wholly below the cutoff are physically gone...
    assert dropped > 0 and len(dirs_after) == len(dirs_before) - dropped
    for d in dirs_after:
        start = int(d.split("=", 1)[1])
        assert start + 2 * day > cutoff
    # ...and the boundary division still masks its dead rows
    assert t.read().count() == sum(1 for _, ms in rows if ms >= cutoff)
    assert t.read().agg(F.min(F.unix_millis("ts"))).first()[0] >= cutoff


def test_timeseries_container_row_expiration(spark):
    from griddb_spark.container import TimeSeries

    base = 1_704_067_200_000
    df = spark.createDataFrame(
        [(base + i * 86_400_000, float(i)) for i in range(10)],
        "ms long, v double",
    ).select(F.timestamp_millis(F.col("ms")).alias("ts"), "v")
    ts = TimeSeries("t", df).set_row_expiration(
        3, "DAY", now_ms=base + 9 * 86_400_000
    )
    vals = sorted(r.v for r in ts.to_df().collect())
    assert vals == [6.0, 7.0, 8.0, 9.0]


# -- partition-scoped UPDATE/DELETE: leaf-level filesystem behavior --------

def _leaf_state(path):
    """{leaf relpath: {filename: sha256}} for every Hive leaf directory."""
    import hashlib
    import os

    state = {}
    for root, _dirs, files in os.walk(path):
        rel = os.path.relpath(root, path)
        if rel == "." or not all("=" in p for p in rel.split(os.sep)):
            continue
        data = [f for f in files if not f.startswith(("_", "."))]
        if data:
            state[rel] = {
                f: hashlib.sha256(
                    open(os.path.join(root, f), "rb").read()
                ).hexdigest()
                for f in data
            }
    return state


def _day_table(spark, tmp_path, name="days"):
    from griddb_spark.dml import DmlTable, range_partition_expr

    rows = [
        (i, f"2024-01-{1 + i % 5:02d} 12:00:00", float(i))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "id int, ts string, val double").select(
        "id", F.col("ts").cast("timestamp").alias("ts"), "val"
    )
    return DmlTable(
        spark, str(tmp_path / name), range_partition_expr("ts", 1, "DAY")
    ).create(df)


def test_scoped_update_leaves_other_partitions_byte_identical(spark, tmp_path):
    t = _day_table(spark, tmp_path)
    before = _leaf_state(t.path)
    assert len(before) == 5
    # predicate touches only Jan 2 (ids with i % 5 == 1)
    t.update(F.to_date("ts") == "2024-01-02", {"val": F.col("val") + 1000})
    after = _leaf_state(t.path)
    changed = {k for k in before if before[k] != after.get(k)}
    day2 = [k for k in before if "1704153600000" in k]  # 2024-01-02 epoch ms
    assert changed == set(day2) and len(day2) == 1
    got = {r.id: r.val for r in t.read().collect()}
    assert all(got[i] == i + 1000 for i in range(50) if i % 5 == 1)
    assert all(got[i] == float(i) for i in range(50) if i % 5 != 1)


def test_scoped_update_moves_row_across_leaves(spark, tmp_path):
    t = _day_table(spark, tmp_path)
    before = _leaf_state(t.path)
    # move id=1 (Jan 2) to Jan 7 — a leaf that does not exist yet
    t.update(
        F.col("id") == 1,
        {"ts": F.lit("2024-01-07 12:00:00").cast("timestamp")},
    )
    after = _leaf_state(t.path)
    assert len(after) == 6  # new leaf materialized
    changed = {k for k in before if before[k] != after.get(k)}
    assert all("1704153600000" in k for k in changed)  # only Jan 2 rewritten
    got = {r.id: r.ts for r in t.read().collect()}
    assert str(got[1]).startswith("2024-01-07")
    assert t.read().count() == 50


def test_scoped_delete_all_in_leaf_removes_directory(spark, tmp_path):
    import os

    t = _day_table(spark, tmp_path)
    before = _leaf_state(t.path)
    t.delete(F.to_date("ts") == "2024-01-03")
    after = _leaf_state(t.path)
    assert len(after) == 4
    gone = set(before) - set(after)
    assert len(gone) == 1 and "1704240000000" in next(iter(gone))
    assert not os.path.exists(os.path.join(t.path, next(iter(gone))))
    # untouched leaves byte-identical
    assert all(before[k] == after[k] for k in after)
    assert t.read().count() == 40


def test_scoped_delete_no_match_is_zero_io(spark, tmp_path):
    t = _day_table(spark, tmp_path)
    before = _leaf_state(t.path)
    t.delete(F.col("val") > 1e9)
    assert _leaf_state(t.path) == before


def test_scoped_delete_range_hash_leaf_and_empty_parent(spark, tmp_path):
    import os

    from griddb_spark.dml import DmlTable, range_hash_partition_expr

    rows = [(i, f"2024-01-{1 + i % 2:02d} 06:00:00", i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "id int, ts string, dev int").select(
        "id", F.col("ts").cast("timestamp").alias("ts"), "dev"
    )
    t = DmlTable(
        spark,
        str(tmp_path / "rh"),
        range_hash_partition_expr("ts", 1, "DAY", "dev", 4),
    ).create(df)
    before = _leaf_state(t.path)
    # delete one (day, device) cell entirely
    t.delete((F.to_date("ts") == "2024-01-01") & (F.col("dev") == 0))
    after = _leaf_state(t.path)
    assert len(after) == len(before) - 1
    assert all(before[k] == after[k] for k in after)  # others untouched
    # delete the whole remaining Jan 1 range bucket -> parent dir pruned
    t.delete(F.to_date("ts") == "2024-01-01")
    assert not any(
        "1704067200000" in d for d in os.listdir(t.path) if "=" in d
    )
    assert t.read().count() == sum(1 for i in range(30) if i % 2 == 1)


def test_write_zordered_tightens_file_stats_in_both_dims(
    spark, catalog, tmp_path
):
    """The point of Z-order: after write_zordered on two dimensions,
    EVERY file's min/max range is tight in BOTH dimensions — so parquet
    stats skip files/row-groups for predicates on either column. A
    single-column sort can only tighten one."""
    import pyarrow.parquet as pq
    import glob
    import os

    from griddb_spark.dml import write_zordered

    li = catalog.load("lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey")
    zdir = str(tmp_path / "zordered")
    write_zordered(li, zdir, ["l_partkey", "l_suppkey"], bits=8, n_files=8)
    plaindir = str(tmp_path / "plain")
    li.repartition(8).write.parquet(plaindir)

    def mean_coverage(d, col):
        spans, lo, hi = [], None, None
        for f in glob.glob(os.path.join(d, "*.parquet")):
            md = pq.read_metadata(f)

            def stats(i):
                rg = md.row_group(i)
                j = next(j for j in range(rg.num_columns)
                         if rg.column(j).path_in_schema == col)
                return rg.column(j).statistics

            fmn = min(stats(i).min for i in range(md.num_row_groups))
            fmx = max(stats(i).max for i in range(md.num_row_groups))
            spans.append((fmn, fmx))
            lo = fmn if lo is None else min(lo, fmn)
            hi = fmx if hi is None else max(hi, fmx)
        full = hi - lo + 1
        return sum((b - a + 1) for a, b in spans) / (len(spans) * full)

    # 8 files on a 2-D Morton curve: each file ideally spans ~1/sqrt(8)
    # of each dimension plus curve-boundary straddle — well under the
    # plain layout's ~1.0 in BOTH dims (a single-column sort would be
    # tight in one and ~1.0 in the other)
    for col in ("l_partkey", "l_suppkey"):
        zc = mean_coverage(zdir, col)
        pc = mean_coverage(plaindir, col)
        assert zc < 0.75 and pc > 0.9, (col, zc, pc)


def test_compact_merges_small_files_atomically(spark, catalog, tmp_path):
    """Incremental inserts leave a file per touched partition per batch;
    compact() must merge them without changing the data (Chunk::compact
    analog, chunk.h:307)."""
    from pyspark.sql import functions as F
    import glob
    import os

    from griddb_spark.dml import DmlTable, hash_partition_expr

    ev = catalog.load("events").select("event_id", "user_id", "value")
    t = DmlTable(spark, str(tmp_path / "t"),
                 hash_partition_expr("user_id", 4)).create(ev.limit(200))
    for i in range(4):  # four insert batches -> many small files
        t = t.insert(ev.filter(
            (F.col("event_id") >= 200 + i * 100)
            & (F.col("event_id") < 300 + i * 100)))
    before = t.read().orderBy("event_id").collect()
    n_files_before = len(glob.glob(os.path.join(str(tmp_path / "t"),
                                                "*", "*.parquet")))
    stats = t.compact(max_records_per_file=1_000_000)
    n_files_after = len(glob.glob(os.path.join(str(tmp_path / "t"),
                                               "*", "*.parquet")))
    assert stats and n_files_after < n_files_before
    assert all(a == 1 for _, a in stats.values())  # one file per partition
    after = t.read().orderBy("event_id").collect()
    assert after == before  # bit-identical data


def test_compact_preserves_nested_range_hash_layout(spark, catalog, tmp_path):
    """RANGE_HASH tables nest partitions (__part=.../__subpart=...);
    compaction must rewrite LEAF directories and never flatten the
    sub-partition level (pruned scans depend on it)."""
    import glob
    import os
    import re

    from griddb_spark.dml import DmlTable, range_hash_partition_expr

    ev = catalog.load("events")
    t = DmlTable(
        spark, str(tmp_path / "rh"),
        range_hash_partition_expr("ts", 5, "DAY", "user_id", 2),
    ).create(ev.limit(300))
    t = t.insert(ev.limit(600).subtract(ev.limit(300)))
    before = t.read().count()
    stats = t.compact(max_records_per_file=1_000_000)
    assert stats  # something was merged
    # every stats key is a LEAF path containing both partition levels
    assert all("__part=" in k and "__subpart=" in k for k in stats)
    # nested layout intact: files live only under __part=*/__subpart=*
    files = glob.glob(os.path.join(str(tmp_path / "rh"), "**", "*.parquet"),
                      recursive=True)
    assert files and all(
        re.search(r"__part=[^/]+/__subpart=[^/]+/[^/]+\.parquet$", f)
        for f in files)
    assert t.read().count() == before
    # pruned scan still works after compaction
    day_ms = 86_400_000
    start = 1704067200000
    assert t.scan_key_range(start, start + 5 * day_ms, 1).count() >= 0


def test_schema_evolved_marker_lifecycle(spark, tmp_path):
    """scan() pays mergeSchema only after ALTER: the _schema_evolved
    marker appears with the first widened file, survives appends, and a
    full rewrite (rename — every file homogenized) retires it."""
    import os

    from griddb_spark.dml import SCHEMA_EVOLVED_MARKER, DmlTable

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, seg string")
    path = str(tmp_path / "t")
    t = DmlTable(spark, path).create(df)
    marker = os.path.join(path, SCHEMA_EVOLVED_MARKER)
    assert not os.path.exists(marker)  # unevolved: plain O(1) read

    t.alter_add_column("score", "DOUBLE")
    assert os.path.exists(marker)  # mixed footers: merge required
    t.insert(spark.createDataFrame([(3, "c", 1.5)],
                                   "id int, seg string, score double"))
    assert os.path.exists(marker)
    assert {r.id: r.score for r in t.read().collect()} == {
        1: None, 2: None, 3: 1.5}

    # rename rewrites every file with the merged schema → marker retired
    t.alter_rename_column("seg", "segment")
    assert not os.path.exists(marker)
    got = {r.id: (r.segment, r.score) for r in t.read().collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 1.5)}


def test_schema_evolved_marker_crash_orders(spark, tmp_path):
    """Both crash orders of alter_add_column are safe: marker-without-
    widened-file (crash after the durable mark) reads the homogeneous
    table correctly — merge of identical footers — and the marker can
    never lag the widened file (it is written first; injected-fault
    proof below)."""
    import os

    import pytest

    from griddb_spark.dml import SCHEMA_EVOLVED_MARKER, DmlTable

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, seg string")
    path = str(tmp_path / "c")
    t = DmlTable(spark, path).create(df)

    # inject a crash between the marker write and the widened-file append
    orig = t._write
    def boom(df_, mode):
        raise RuntimeError("crash before widened file")
    t._write = boom
    with pytest.raises(RuntimeError):
        t.alter_add_column("score", "DOUBLE")
    t._write = orig

    marker = os.path.join(path, SCHEMA_EVOLVED_MARKER)
    assert os.path.exists(marker)  # marker landed FIRST
    # conservative state: homogeneous table read with mergeSchema — correct
    assert {r.id for r in t.read().collect()} == {1, 2}
    assert "score" not in t.read().columns
    # re-running the alter completes it
    t.alter_add_column("score", "DOUBLE")
    assert [r.score for r in t.read().collect()] == [None, None]

"""Coverage for API surface that no gated query exercises directly:
container lifecycle, TimeSeries range query, SQLite-flavored scalar/
aggregate shims, point-lookup partition pruning plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_timeseries_query_range(spark, catalog):
    from griddb_spark.container import TimeSeries

    ev = catalog.load("events")
    ts = TimeSeries("events", ev, ts_col="ts")
    lo, hi = "2024-01-05 00:00:00", "2024-01-06 00:00:00"
    got = ts.query_range(lo, hi)
    want = ev.filter((F.col("ts") >= F.lit(lo).cast("timestamp"))
                     & (F.col("ts") <= F.lit(hi).cast("timestamp")))
    assert got.count() == want.count() > 0


def test_gridstore_drop_container_and_index(spark, catalog):
    from griddb_spark.container import GridStore

    store = GridStore(spark)
    df = spark.createDataFrame([(1, "a")], "id int, v string")
    store.put_container("tmp_c", df, row_key="id")
    store.create_index("tmp_c", "v")
    assert store.index_info().filter(
        (F.col("container_name") == "tmp_c")).count() == 1
    store.drop_index("tmp_c", "v")
    assert store.index_info().filter(
        (F.col("container_name") == "tmp_c")).count() == 0
    store.get_container("tmp_c")
    store.drop_container("tmp_c")
    with pytest.raises(KeyError):
        store.get_container("tmp_c")


def test_sqlite_scalar_shims(spark):
    from griddb_spark.functions import randomblob, typeof, zeroblob

    df = spark.createDataFrame([(1, "x", 2.5)], "i int, s string, d double")
    r = df.select(
        typeof("i").alias("ti"), typeof("s").alias("ts"),
        typeof("d").alias("td"),
        F.octet_length(zeroblob(4)).alias("zb"),
        F.octet_length(randomblob(8)).alias("rb"),
    ).collect()[0]
    assert (r.ti, r.ts, r.td) == ("int", "string", "double")
    assert r.zb == 4 and r.rb == 8
    z = df.select(zeroblob(3).alias("z")).collect()[0].z
    assert bytes(z) == b"\x00\x00\x00"


def test_stddev0_variance0_zero_for_single_row(spark):
    """SQLite *0 variants: 0 (not NULL) when fewer than 2 rows."""
    from griddb_spark.functions import stddev0, variance0

    df = spark.createDataFrame([(1, 10.0)], "g int, v double")
    r = df.groupBy("g").agg(stddev0("v").alias("s"),
                            variance0("v").alias("va")).collect()[0]
    assert r.s == 0.0 and r.va == 0.0
    df3 = spark.createDataFrame([(1, 1.0), (1, 2.0), (1, 3.0)],
                                "g int, v double")
    r3 = df3.groupBy("g").agg(stddev0("v").alias("s")).collect()[0]
    assert r3.s == pytest.approx(1.0)


def test_st_point_and_3d_mbr(spark):
    from griddb_spark.functions.gis import (
        st_make_box,
        st_mbr_intersects_3d,
        st_mbr_xyz,
        st_point,
    )

    df = spark.createDataFrame([(3.5, -2.0)], "x double, y double")
    wkt = df.select(st_point(F.col("x"), F.col("y")).alias("p")).collect()[0].p
    assert wkt == "POINT(3.5 -2.0)"
    probe = st_make_box(0, -5, -1, 5, 5, 1)
    hit = df.select(
        st_mbr_intersects_3d(
            st_mbr_xyz(st_point(F.col("x"), F.col("y"))), probe
        ).alias("h")
    ).collect()[0].h
    assert hit is True


def test_point_lookup_prunes_to_one_hash_leaf(spark, catalog, tmp_path):
    """HashPartitioning.key_filter: a key-equality predicate must reach
    the scan as a PartitionFilter selecting exactly one bucket."""
    from griddb_spark.dml import DmlTable, hash_partition_expr

    ev = catalog.load("events").limit(5000)
    t = DmlTable(spark, str(tmp_path / "h"),
                 hash_partition_expr("user_id", 8)).create(ev)
    dtype = dict(ev.dtypes)["user_id"]
    df = t.scan().filter(t.partitioning.key_filter(3, dtype))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "__part" in plan.split(
        "PartitionFilters")[1][:200]
    got = {r.user_id for r in df.select("user_id").distinct().collect()}
    assert got <= {3}


def test_fetch_partial_pages_10k_rows_at_size_100(spark):
    """ResultSet partial fetch with a fetch-size page contract
    (result_set.cpp suspended-cursor sizing): a 10k-row container walked
    at fetch_size=100 yields exactly 100 pages of 100, in order, without
    a full collect."""
    from griddb_spark.container import Collection

    df = spark.range(10_000).selectExpr("id", "id % 7 AS v")
    c = Collection("pages", df, row_key="id")
    pages = list(c.fetch(df=df.orderBy("id"), partial=True, fetch_size=100))
    assert len(pages) == 100
    assert all(len(p) == 100 for p in pages)
    assert pages[0][0].id == 0 and pages[-1][-1].id == 9_999
    # ragged tail: 250 rows at size 100 -> 100, 100, 50
    tail = list(c.fetch(df=df.limit(250), partial=True, fetch_size=100))
    assert [len(p) for p in tail] == [100, 100, 50]
    with pytest.raises(ValueError):
        c.fetch(partial=True, fetch_size=0)

"""Phase-0 vertical slice: catalog loads every driver table, the flagship
GROUP BY RANGE query runs, container API round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import TABLES, assert_matches_oracle


def test_catalog_loads_all_tables(catalog):
    for t in TABLES:
        df = catalog.table(t)
        assert df.columns, t


def test_flagship_group_by_range(catalog, duck):
    """avg(value) per 1-minute bucket over events — the SURVEY §7 slice."""
    from griddb_spark.operators import group_by_range

    events = catalog.table("events")
    bounds = events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).collect()[0]
    start = bounds["lo"].replace(second=0, microsecond=0)
    end = bounds["hi"]
    out = group_by_range(
        events, "ts", 1, "MINUTE",
        {"avg_value": F.avg("value"), "n": F.count(F.lit(1))},
        start=start, end=end,
    )
    assert_matches_oracle(
        out, duck,
        f"""
        SELECT
          make_timestamp(
            {int(start.timestamp()*1000)}*1000
            + (epoch_ms(CAST(ts AS TIMESTAMP)) - {int(start.timestamp()*1000)})
              // 60000 * 60000000) AS ts,
          avg(value) AS avg_value,
          count(*) AS n
        FROM events
        WHERE epoch_ms(CAST(ts AS TIMESTAMP)) BETWEEN
              {int(start.timestamp()*1000)} AND {int(end.timestamp()*1000)}
        GROUP BY 1
        """,
    )


def test_collection_put_get_remove(spark):
    from griddb_spark.container import GridStore

    store = GridStore(spark)
    df = spark.createDataFrame(
        [("alice", True, 10), ("bob", False, 20)], "name string, status boolean, count long"
    )
    col = store.put_container("person_col", df, row_key="name")
    assert col.get("alice").count() == 1
    col.put([{"name": "alice", "status": False, "count": 99}])
    row = col.get("alice").collect()[0]
    assert row["count"] == 99 and row["status"] is False
    col.remove("bob")
    assert col.df.count() == 1
    assert col.multi_get(["alice", "bob"]).count() == 1


def test_timeseries_api_roundtrip(catalog):
    from griddb_spark.container import TimeSeries

    events = catalog.table("events").filter(F.col("user_id") == 1)
    ts = TimeSeries("ev1", events, ts_col="ts")
    some = events.orderBy("ts").limit(3).collect()
    t1 = some[1]["ts"]
    got = ts.get_at(t1, "PREVIOUS").collect()
    assert len(got) == 1 and got[0]["ts"] == t1
    nxt = ts.get_at(t1, "NEXT_ONLY").collect()
    assert len(nxt) == 1 and nxt[0]["ts"] > t1


def test_export_import_roundtrip(spark, catalog, tmp_path):
    """gs_export/gs_import surface: container → csv/json → container is
    lossless when re-imported with the original schema."""
    from griddb_spark.container import GridStore

    store = GridStore(spark)
    nation = catalog.load("nation")
    store.put_container("nation", nation, row_key="n_nationkey")
    want = sorted(map(tuple, nation.collect()))

    for fmt in ("csv", "json", "parquet"):
        p = str(tmp_path / f"nation_{fmt}")
        store.export_container("nation", p, fmt=fmt)
        got = store.import_container(
            f"nation_{fmt}", p, fmt=fmt, schema=nation.schema,
            row_key="n_nationkey",
        )
        assert sorted(map(tuple, got.df.collect())) == want
        assert got.df.schema == nation.schema


def test_composite_key_put_remove(spark, catalog):
    """Composite row keys (CompositeKeyMultiGet sample): put upserts by the
    full key tuple; remove/get address one tuple."""
    from griddb_spark.container import Collection

    li = catalog.load("lineitem").limit(50)
    col = Collection("lineitem", li, row_key=["l_orderkey", "l_linenumber"])
    n0 = col.df.count()

    first = li.orderBy("l_orderkey", "l_linenumber").first()
    key = (first.l_orderkey, first.l_linenumber)
    # upsert the same key: count unchanged, value updated
    updated = li.filter(
        (F.col("l_orderkey") == key[0]) & (F.col("l_linenumber") == key[1])
    ).withColumn("l_quantity", F.lit(999.0))
    col.put(updated)
    assert col.df.count() == n0
    assert col.get(key).first().l_quantity == 999.0

    col.remove(key)
    assert col.df.count() == n0 - 1
    assert col.get(key).count() == 0


def test_export_import_roundtrip_csv_json(catalog, tmp_path):
    """expimp interchange (README.md:156): container → CSV/JSON → back,
    value-identical including µs timestamps."""
    src = catalog.load("events").orderBy("event_id").limit(50)
    want = [tuple(r) for r in src.collect()]
    for fmt in ("csv", "json"):
        out = catalog.export_container("events", str(tmp_path / fmt), fmt=fmt)
        back = catalog.import_container(out, fmt=fmt, schema=src.schema)
        got = sorted(
            (tuple(r) for r in back.orderBy("event_id").limit(50).collect())
        )
        assert got == sorted(want), f"{fmt} roundtrip mismatch"


def test_collection_put_lineage_stays_bounded(spark):
    """100 sequential puts must not build an unbounded plan: the
    periodic localCheckpoint compaction truncates lineage, so plan size
    is bounded by COMPACT_EVERY generations and fetch latency stays flat
    instead of replaying every generation."""
    import time

    from griddb_spark.container import Collection

    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               "id int, v double")
    col = Collection("c", df, row_key="id")

    def plan_lines(c):
        return len(
            c.df._jdf.queryExecution().analyzed().numberedTreeString()
            .splitlines()
        )

    sizes, latencies = [], []
    for gen in range(1, 101):
        col.put([{"id": gen % 25, "v": float(gen)}])
        if gen % 20 == 0:
            sizes.append(plan_lines(col))
            t0 = time.monotonic()
            col.fetch()
            latencies.append(time.monotonic() - t0)
    # bounded: every sampled plan fits within ~one compaction window of
    # stacked generations (empirically ~12 lines per generation)
    cap = Collection.COMPACT_EVERY * 20
    assert max(sizes) < cap, sizes
    assert sizes[-1] <= sizes[0] * 2, sizes  # no monotone growth
    # flat latency: the last fetch is not dramatically slower than the
    # first (unbounded lineage showed superlinear replay here)
    assert latencies[-1] < max(latencies[0] * 5, 2.0), latencies
    # correctness across compaction boundaries
    got = {r.id: r.v for r in col.fetch()}
    want = {i: float(i) for i in range(10)}
    for gen in range(1, 101):
        want[gen % 25] = float(gen)
    assert got == want


def test_catalog_invalidate_rereads_rewritten_container(spark, tmp_path,
                                                        catalog):
    """invalidate(name) drops the cached plan + view ownership so a
    rewritten container directory serves the NEW rows (the cached
    DataFrame pins the parquet file listing seen at first load)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from griddb_spark.catalog import ContainerCatalog

    base = str(tmp_path)
    pq.write_table(pa.table({"r_regionkey": [1, 2]}),
                   f"{base}/region.parquet")
    cat = ContainerCatalog(spark, base)
    assert cat.table("region").count() == 2
    pq.write_table(pa.table({"r_regionkey": [1, 2, 3]}),
                   f"{base}/region.parquet")
    cat.invalidate("region")
    assert cat.table("region").count() == 3
    assert spark.table("region").count() == 3  # view re-asserted too
    # hand the session-global view back to the shared testdata catalog
    catalog.table("region")
    assert spark.table("region").count() == 5


def test_collection_pandas_roundtrip(spark):
    """5.8 Python NoSQL interface enhancements (python_client DataFrame
    integration): put_rows ingests a pandas frame under the container
    schema (upserting by row key), fetch_rows reads back via Arrow."""
    import pandas as pd

    from griddb_spark.container import GridStore

    store = GridStore(spark)
    base = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, tag string, v double")
    col = store.put_container("pd_rt", base, row_key="id")
    col.put_rows(pd.DataFrame({"id": [2, 3], "tag": ["b2", "c"],
                               "v": [9.9, 3.5]}))
    out = col.fetch_rows().sort_values("id").reset_index(drop=True)
    assert out["id"].tolist() == [1, 2, 3]
    assert out["tag"].tolist() == ["a", "b2", "c"]  # key 2 upserted
    assert col.fetch_rows(limit=2).shape[0] == 2
    import pytest as _pytest

    with _pytest.raises(ValueError):
        col.put_rows(pd.DataFrame({"id": [4]}))  # missing columns

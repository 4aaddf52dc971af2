"""Store-level batch ops (fetchAll / multiPut) and the bounded-state
sketches: correctness vs exact references plus estimator error bounds."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def store(spark):
    from griddb_spark.container import GridStore

    return GridStore(spark, SF_DIR)


class TestFetchAll:
    def test_batch_matches_individual_queries(self, store):
        batch = store.fetch_all(
            [
                ("customer", "SELECT c_custkey, c_name WHERE c_nationkey = 1 "
                             "ORDER BY c_custkey LIMIT 10"),
                ("supplier", "SELECT s_suppkey WHERE s_nationkey = 1"),
            ]
        )
        assert len(batch) == 2
        solo = store.get_container("customer").query(
            "SELECT c_custkey, c_name WHERE c_nationkey = 1 "
            "ORDER BY c_custkey LIMIT 10")
        assert [r.asDict() for r in batch[0].collect()] == [
            r.asDict() for r in solo.collect()]

    def test_tag_col_names_source_container(self, store):
        batch = store.fetch_all(
            [("customer", "SELECT c_custkey LIMIT 3"),
             ("supplier", "SELECT s_suppkey LIMIT 3")],
            tag_col="src",
        )
        assert {r.src for r in batch[0].collect()} == {"customer"}
        assert {r.src for r in batch[1].collect()} == {"supplier"}


class TestMultiPut:
    def test_upsert_and_insert_across_containers(self, spark, store):
        cust = store.put_container(
            "customer",
            store.catalog.load("customer"),
            row_key="c_custkey",
        )
        supp = store.put_container(
            "supplier",
            store.catalog.load("supplier"),
            row_key="s_suppkey",
        )
        n_cust = cust.df.count()
        n_supp = supp.df.count()
        updated = (cust.df.filter(F.col("c_custkey") == 1)
                   .withColumn("c_acctbal", F.lit(42.5)))
        added = (supp.df.filter(F.col("s_suppkey") == 1)
                 .withColumn("s_suppkey", F.lit(777777).cast("long")))
        store.multi_put({"customer": updated, "supplier": added})
        # update hit the existing key: same row count, new value
        assert store.get_container("customer").df.count() == n_cust
        got = (store.get_container("customer").df
               .filter(F.col("c_custkey") == 1).collect())
        assert len(got) == 1 and got[0].c_acctbal == 42.5
        # insert added a row under the fresh key
        assert store.get_container("supplier").df.count() == n_supp + 1


class TestSketches:
    def test_linear_counting_error_bound(self, spark, catalog):
        from griddb_spark.pipeline.sketches import linear_counting_distinct

        ev = catalog.load("events")
        sk = linear_counting_distinct(ev, ["event_type"], "user_id", m=4096)
        exact = {
            r.event_type: r.n
            for r in ev.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        for r in sk.collect():
            n = exact[r.event_type]
            assert r.est_distinct is not None
            # linear counting std error ≈ sqrt(m(e^t - t - 1))/ (m t) rel;
            # at n << m it is well under 5% — allow 10% + small absolute slack
            assert abs(r.est_distinct - n) <= max(3.0, 0.10 * n)

    def test_linear_counting_saturation_is_null(self, spark):
        from griddb_spark.pipeline.sketches import linear_counting_distinct

        df = spark.range(0, 64).select(
            F.lit("g").alias("g"), F.col("id").alias("k"))
        # m=2 with 64 keys: both registers certainly hit → NULL estimate
        out = linear_counting_distinct(df, ["g"], "k", m=2).collect()
        assert out[0].n_registers == 2 and out[0].est_distinct is None

    def test_histogram_quantile_within_one_bucket(self, spark, catalog):
        from griddb_spark.pipeline.sketches import histogram_quantile

        ev = catalog.load("events")
        out = histogram_quantile(
            ev, ["event_type"], "value", [0.5, 0.95],
            lo=0.0, hi=512.0, n_buckets=256,
        ).collect()
        # The sketch bounds RANK error, not value distance (a sparse tail
        # can put consecutive order statistics many buckets apart): the
        # reported edge must sandwich the q-th rank — at least q*n values
        # lie strictly below the edge, and fewer than q*n below the
        # previous edge.
        vals = [(r.event_type, r.value)
                for r in ev.select("event_type", "value").collect()]
        rows: dict[str, list[float]] = {}
        for e, v in vals:
            rows.setdefault(e, []).append(v)
        width = 2.0
        for r in out:
            vs = rows[r.event_type]
            n = len(vs)
            for q, est in ((0.5, r.q_50), (0.95, r.q_95)):
                below_edge = sum(1 for v in vs if v < est)
                below_prev = sum(1 for v in vs if v < est - width)
                assert below_edge >= q * n
                assert below_prev < q * n

    def test_histogram_clamps_out_of_range(self, spark):
        from griddb_spark.pipeline.sketches import histogram_quantile

        df = spark.createDataFrame(
            [("g", -5.0), ("g", 1.0), ("g", 999.0)], "g string, v double")
        out = histogram_quantile(
            df, ["g"], "v", [0.5], lo=0.0, hi=8.0, n_buckets=8).collect()
        assert out[0].n_rows == 3
        assert math.isfinite(out[0].q_50)

    def test_sketch_plan_bounds_shuffle(self, spark, catalog):
        """The distinct sketch must pre-aggregate (partial dedup) before
        the exchange — i.e. two HashAggregates around the shuffle."""
        from griddb_spark.pipeline.sketches import linear_counting_distinct

        ev = catalog.load("events")
        plan = (
            linear_counting_distinct(ev, ["event_type"], "user_id", m=512)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert plan.lower().count("hashaggregate") >= 2


def test_statement_and_task_resources_meta(spark, catalog):
    from griddb_spark.container import GridStore

    store = GridStore(spark, "/root/testdata/sf0.001")
    sr = store.statement_resources()
    rows = sr.collect()
    assert [f.name for f in sr.schema.fields] == [
        "request_id", "node_address", "node_port", "connection_address",
        "connection_port", "user_name", "application_name",
        "statement_type", "start_time", "actual_time", "memory_use",
        "sql_store_use", "data_store_access", "network_transfer_size",
        "network_time", "available_concurrency", "resource_restrictions",
        "statement",
    ]
    sess = [r for r in rows if r.statement_type == "SESSION"]
    assert len(sess) == 1
    assert sess[0].memory_use > 0 and sess[0].available_concurrency > 0
    assert sess[0].request_id.startswith(spark.sparkContext.applicationId)

    tr = store.task_resources()
    assert [f.name for f in tr.schema.fields] == [
        "request_id", "job_ordinal", "task_ordinal", "node_address",
        "node_port", "task_type", "lead_time", "actual_time", "memory_use",
        "sql_store_use", "data_store_access", "network_transfer_size",
        "network_time", "plan",
    ]
    # snapshot task_resources while a job is actually running (the shared
    # test session is not guaranteed idle, so only the positive direction
    # is asserted: a running job must become visible to the watcher)
    import threading

    seen: list[int] = []
    done = threading.Event()

    def snap():
        while not done.is_set():
            n = store.task_resources().count()
            if n > 0:
                seen.append(n)
                return

    def run_job(scale):
        catalog.load("lineitem").crossJoin(
            spark.range(scale).select(F.col("id").alias("__x"))
        ).agg(F.sum(F.expr("l_quantity * __x"))).collect()

    # the watcher races the job under suite load — retry with a bigger
    # job before declaring the snapshot path broken
    for scale in (2000, 20000):
        t = threading.Thread(target=snap)
        t.start()
        try:
            run_job(scale)
        finally:
            done.set()
            t.join()
        if seen:
            break
        done.clear()
    assert seen and seen[0] > 0


def test_export_compression_modes(spark, tmp_path):
    """storeCompressionMode (5.6) mapping: export honors the GridDB mode
    names and the parquet footer records the codec."""
    import pyarrow.parquet as pq

    from griddb_spark.container import GridStore

    store = GridStore(spark)
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    store.put_container("c_comp", df, row_key="id")

    for mode, codec in (("COMPRESSION_ZSTD", "ZSTD"),
                        ("COMPRESSION_ZLIB", "GZIP"),
                        ("NO_COMPRESSION", "UNCOMPRESSED")):
        out = str(tmp_path / mode.lower())
        store.export_container("c_comp", out, compression=mode)
        part = next(
            p for p in os.listdir(out) if p.endswith(".parquet")
        )
        meta = pq.ParquetFile(f"{out}/{part}").metadata
        assert meta.row_group(0).column(0).compression == codec
        got = spark.read.parquet(out)
        assert got.count() == 1000

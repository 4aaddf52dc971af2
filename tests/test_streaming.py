"""Structured Streaming: windowed aggregation parity with the batch
operator, and foreachBatch keyed upsert (NoSQL put semantics)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def test_stream_group_by_range_matches_batch(spark, catalog, tmp_path):
    from griddb_spark.operators import group_by_range
    from griddb_spark.streaming import group_by_range_stream, run_to_memory
    from griddb_spark import workload

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":  # ns parquet under nanosAsLong
        ev_s = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev_s = raw
    out = group_by_range_stream(
        ev_s, "ts", 1, "HOUR",
        {"avg_value": F.round(F.avg("value"), 6), "n": F.count(F.lit(1))},
    )
    streamed = {
        r.ts: (r.avg_value, r.n)
        for r in run_to_memory(out, "t_gbr_parity", mode="complete").collect()
    }

    ev_b = catalog.load("events")
    batch = group_by_range(
        ev_b, "ts", 1, "HOUR",
        {"avg_value": F.round(F.avg("value"), 6), "n": F.count(F.lit(1))},
        start=workload.EV_START, end=workload.EV_END,
    )
    batched = {r.ts: (r.avg_value, r.n) for r in batch.collect()}
    assert streamed == batched


def test_watermark_late_data_semantics(spark, tmp_path):
    """Event-time watermark behavior of the streaming GROUP BY RANGE:
    a late row inside the watermark is merged into its (not yet final)
    bucket; a row older than the watermark is dropped; finalized buckets
    are emitted exactly once (append mode). This is the semantics GridDB's
    periodic-aggregation pattern needs from the streaming face."""
    import datetime as dt

    from griddb_spark.streaming import group_by_range_stream

    src = str(tmp_path / "wm_src")
    out = str(tmp_path / "wm_out")
    ckpt = str(tmp_path / "wm_ckpt")
    os.makedirs(src)
    base = dt.datetime(2024, 1, 1)

    def wave(minutes, fname):
        rows = [(base + dt.timedelta(minutes=m), 1.0) for m in minutes]
        spark.createDataFrame(rows, "ts timestamp, value double").coalesce(
            1
        ).write.parquet(f"{src}/{fname}")

    def run():
        stream = spark.readStream.schema("ts timestamp, value double").parquet(
            f"{src}/*"
        )
        agg = group_by_range_stream(
            stream, "ts", 10, "MINUTE",
            {"n": F.count(F.lit(1))}, watermark="30 minutes",
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # wave 1: three rows in bucket 00:00 + one at 00:30 → watermark 00:00
    wave([0, 3, 5, 30], "b1")
    run()
    # wave 2: late row at 00:05 (>= watermark → merged into open bucket
    # 00:00), row at 00:50 advances watermark to 00:20 → bucket 00:00
    # finalized with the late row counted
    wave([5, 50], "b2")
    run()
    # wave 3: too-late row at 00:02 (< watermark 00:20 → dropped), row at
    # 01:30 advances watermark past every other bucket
    wave([2, 90], "b3")
    run()

    got = {
        r.ts.strftime("%H:%M"): r.n for r in spark.read.parquet(out).collect()
    }
    assert got == {"00:00": 4, "00:30": 1, "00:50": 1}


def test_upsert_by_key_insert_or_update(spark, tmp_path):
    from griddb_spark.streaming import upsert_by_key

    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def put(batch_rows, fname):
        spark.createDataFrame(
            batch_rows, "k int, v string, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/{fname}")

    import datetime as dt

    t1, t2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    put([(1, "a", t1), (2, "b", t1)], "batch1")

    stream = (
        spark.readStream.schema("k int, v string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    writer = upsert_by_key(stream, ["k"], target, ckpt, ts_col="ts")
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()

    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "b"}

    # second wave: update key 1 (newer ts), insert key 3
    put([(1, "a2", t2), (3, "c", t2)], "batch2")
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "a2", 2: "b", 3: "c"}


def test_ema_anomaly_stateful_stream(spark, tmp_path):
    from griddb_spark.streaming.stateful import ema_anomaly_stream

    src = str(tmp_path / "ema_src")
    os.makedirs(src)
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", base + dt.timedelta(minutes=i), 10.0 if i != 8 else 100.0)
        for i in range(10)
    ]
    spark.createDataFrame(rows, "k string, ts timestamp, value double").coalesce(
        1
    ).write.parquet(f"{src}/b1")

    stream = (
        spark.readStream.schema("k string, ts timestamp, value double")
        .parquet(f"{src}/*")
    )
    out = ema_anomaly_stream(stream, ["k"], "value", "ts", min_history=3)
    q = (
        out.writeStream.format("memory")
        .queryName("t_ema")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_ema").orderBy("ts").collect()
    assert len(got) == 10
    # only the 100.0 spike is anomalous, and state must have warmed up
    anomalies = [r for r in got if r.is_anomaly]
    assert len(anomalies) == 1 and anomalies[0].value == 100.0


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Stream-stream interval join emits exactly the batch join result."""
    import datetime as dt

    from pyspark.sql import functions as F

    from griddb_spark.streaming import interval_join_stream, run_to_memory

    def ts(minute):
        return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)

    left = [(1, ts(0), "l0"), (1, ts(40), "l1"), (2, ts(10), "l2")]
    right = [(1, ts(5), "r0"), (1, ts(90), "r1"), (3, ts(10), "r2")]
    ldf = spark.createDataFrame(left, "user_id long, lts timestamp, ltag string")
    rdf = spark.createDataFrame(right, "user_id long, rts timestamp, rtag string")
    lp, rp = str(tmp_path / "l"), str(tmp_path / "r")
    ldf.write.parquet(lp)
    rdf.write.parquet(rp)

    ls = spark.readStream.schema(ldf.schema).parquet(lp)
    rs = spark.readStream.schema(rdf.schema).parquet(rp)
    got = run_to_memory(
        interval_join_stream(ls, rs, "user_id", "lts", "rts", 10),
        "sij_ut", mode="append", shuffle_partitions=4,
    )
    # only (l0, r0) is within ±10 min on a shared user
    rows = [(r.user_id, r.ltag, r.rtag) for r in got.collect()]
    assert rows == [(1, "l0", "r0")]
    tol = F.expr("INTERVAL 10 MINUTES")
    want = ldf.join(
        rdf,
        (ldf.user_id == rdf.user_id)
        & (F.col("rts") >= F.col("lts") - tol)
        & (F.col("rts") <= F.col("lts") + tol),
    ).drop(rdf.user_id)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_distinct_sketch_stream_matches_batch_sketch(spark, catalog):
    from griddb_spark.pipeline.sketches import linear_counting_distinct
    from griddb_spark.streaming import distinct_sketch_stream, run_to_memory

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev_s = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev_s = raw
    out = distinct_sketch_stream(ev_s, "ts", "user_id", 1, "HOUR", m=256)
    streamed = {
        r.ts: (r.n_registers, r.est_distinct)
        for r in run_to_memory(out, "t_lds_parity", mode="complete").collect()
    }

    ev_b = catalog.load("events").withColumn(
        "ts", F.date_trunc("hour", F.col("ts"))
    )
    batch = {
        r.ts: (r.n_registers, r.est_distinct)
        for r in linear_counting_distinct(ev_b, ["ts"], "user_id", m=256)
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_freq_sketch_stream_matches_batch_cms(spark, catalog):
    from pyspark.sql import functions as F

    from griddb_spark.streaming import freq_sketch_stream, run_to_memory

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev_s = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev_s = raw
    out = freq_sketch_stream(ev_s, "ts", "user_id", 1, "HOUR",
                             depth=2, width=128)
    streamed = {
        (r.ts, r.d, r.pos): r.cnt
        for r in run_to_memory(out, "t_cms_parity", mode="complete").collect()
    }

    from griddb_spark.pipeline.sketches import _double_hash_pos

    ev_b = catalog.load("events").withColumn(
        "ts", F.date_trunc("hour", F.col("ts"))
    )
    probe = F.explode(
        F.array(*[
            F.struct(F.lit(d).alias("d"),
                     _double_hash_pos("user_id", d, 128).alias("pos"))
            for d in range(2)
        ])
    ).alias("__r")
    batch = {
        (r.ts, r.d, r.pos): r.cnt
        for r in ev_b.select("ts", probe)
        .groupBy("ts", F.col("__r.d").alias("d"), F.col("__r.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert streamed == batch and len(streamed) > 0


def test_quantile_sketch_stream_matches_batch_histogram(spark, catalog):
    from griddb_spark.pipeline.sketches import histogram_quantile
    from griddb_spark.streaming import quantile_sketch_stream, run_to_memory

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev_s = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev_s = raw
    out = quantile_sketch_stream(ev_s, "ts", "value", 1, "HOUR",
                                 lo=0.0, hi=512.0, n_buckets=256)
    regs = run_to_memory(out, "t_hq_parity", mode="complete")
    streamed = {(r.ts, r.bucket): r.cnt for r in regs.collect()}

    # streamed per-window counts must equal the batch sketch's bucket
    # stage, and the estimator walk must equal histogram_quantile's output
    ev_b = catalog.load("events").withColumn(
        "ts", F.date_trunc("hour", F.col("ts"))
    )
    batch_q = {
        r.ts: (r.n_rows, r.q_50, r.q_95)
        for r in histogram_quantile(
            ev_b, ["ts"], "value", [0.5, 0.95], lo=0.0, hi=512.0,
            n_buckets=256,
        ).collect()
    }
    from pyspark.sql import Window

    pw = Window.partitionBy("ts").orderBy("bucket")
    tw = Window.partitionBy("ts")
    cum = regs.select(
        "ts", "bucket",
        F.sum("cnt").over(pw).alias("cm"), F.sum("cnt").over(tw).alias("tot"),
    )
    edge = (F.col("bucket") + 1).cast("double") * F.lit(2.0)
    got = {
        r.ts: (r.n_rows, r.q_50, r.q_95)
        for r in cum.groupBy("ts").agg(
            F.max("tot").alias("n_rows"),
            F.round(F.min(F.when(F.col("cm").cast("double")
                                 >= 0.5 * F.col("tot").cast("double"),
                                 edge)), 6).alias("q_50"),
            F.round(F.min(F.when(F.col("cm").cast("double")
                                 >= 0.95 * F.col("tot").cast("double"),
                                 edge)), 6).alias("q_95"),
        ).collect()
    }
    assert got == batch_q and len(got) > 0 and len(streamed) > 0


def test_match_recognize_stream_single_batch_parity(spark, catalog):
    """availableNow single-batch run == batch MATCH_RECOGNIZE row-for-row."""
    from griddb_spark.operators import match_recognize
    from griddb_spark.streaming import run_to_memory
    from griddb_spark.streaming.stateful import match_recognize_stream

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev_s = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev_s = raw
    spec = dict(
        pattern="SPIKE",
        define={"SPIKE": "value > PREV(value) * 2"},
        measures={"spike_ts": "LAST(ts)", "spike_value": "LAST(value)"},
        partition_by=["user_id"],
        order_by="ts",
    )
    out = match_recognize_stream(ev_s, **spec)
    streamed = sorted(
        (r.user_id, r.spike_ts, r.spike_value, r.match_no)
        for r in run_to_memory(out, "t_mr_parity", mode="append",
                               shuffle_partitions=8).collect()
    )
    batch = sorted(
        (r.user_id, r.spike_ts, r.spike_value, r.match_no)
        for r in match_recognize(catalog.load("events"), **spec).collect()
    )
    assert streamed == batch and len(streamed) > 0


def test_match_recognize_stream_match_spans_batches(spark, tmp_path):
    """An A-then-B match whose rows arrive in different micro-batches
    completes exactly once; PREV works across the boundary; match_no is
    continuous."""
    import datetime as dt

    from griddb_spark.streaming.stateful import match_recognize_stream

    src = str(tmp_path / "mr_src")
    os.makedirs(src)

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    # batch 1: a full match (10->30 rise then 5 drop) + a dangling rise
    b1 = [("u", ts(0), 10.0), ("u", ts(1), 30.0), ("u", ts(2), 5.0),
          ("u", ts(3), 50.0)]
    # batch 2: the drop that completes the dangling match, then noise
    b2 = [("u", ts(4), 7.0), ("u", ts(5), 8.0)]
    schema = "k string, ts timestamp, value double"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(f"{src}/b1")

    ckpt = str(tmp_path / "mr_ckpt")
    outp = str(tmp_path / "mr_out")

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1).parquet(f"{src}/*")
        out = match_recognize_stream(
            stream,
            pattern="UP DOWN",
            define={"UP": "value > PREV(value) * 2",
                    "DOWN": "value < PREV(value) / 2"},
            measures={"peak": "FIRST(value)", "trough": "LAST(value)",
                      "end_ts": "LAST(ts)"},
            partition_by=["k"], order_by="ts",
        )
        q = (out.writeStream.format("parquet").option("path", outp)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    run()
    got1 = {(r.match_no): (r.peak, r.trough) for r in
            spark.read.parquet(outp).collect()}
    assert got1 == {1: (30.0, 5.0)}  # dangling UP at ts(3) not emitted yet

    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(f"{src}/b2")
    run()
    got2 = {(r.match_no): (r.peak, r.trough) for r in
            spark.read.parquet(outp).collect()}
    # the cross-batch match completed once, with a continuous match_no
    assert got2 == {1: (30.0, 5.0), 2: (50.0, 7.0)}


def test_match_recognize_stream_all_rows(spark, tmp_path):
    """ALL ROWS PER MATCH on the stream: every matched input row emits
    with its classifier, across batch boundaries."""
    import datetime as dt

    from griddb_spark.streaming.stateful import match_recognize_stream

    src = str(tmp_path / "mra_src")
    os.makedirs(src)

    def ts(m):
        return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)

    schema = "k string, ts timestamp, value double"
    spark.createDataFrame(
        [("u", ts(0), 10.0), ("u", ts(1), 30.0)], schema
    ).coalesce(1).write.parquet(f"{src}/b1")
    spark.createDataFrame(
        [("u", ts(2), 5.0)], schema
    ).coalesce(1).write.parquet(f"{src}/b2")

    ckpt, outp = str(tmp_path / "mra_ckpt"), str(tmp_path / "mra_out")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).parquet(f"{src}/*")
    out = match_recognize_stream(
        stream,
        pattern="UP DOWN",
        define={"UP": "value > PREV(value) * 2",
                "DOWN": "value < PREV(value) / 2"},
        measures={"end_ts": "LAST(ts)"},
        partition_by=["k"], order_by="ts", all_rows=True,
    )
    q = (out.writeStream.format("parquet").option("path", outp)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = sorted(
        (r.ts, r.value, r.classifier, r.match_no)
        for r in spark.read.parquet(outp).collect()
    )
    # the match spans both batches: UP row from batch 1, DOWN from batch 2
    assert [(v, c, m) for _, v, c, m in rows] == [
        (30.0, "UP", 1), (5.0, "DOWN", 1)
    ]


def test_refresh_incremental_merges_straddled_and_late_buckets(spark, tmp_path):
    """Partial-merge refresh: a bucket split across batches merges
    stored+fresh; late data (an older bucket reappearing in a later
    batch) merges into its stored row instead of being dropped."""
    from pyspark.sql import functions as F

    from griddb_spark.dml import DmlTable
    from griddb_spark.operators import refresh_incremental

    def mk(rows):
        return spark.createDataFrame(
            rows, "ts string, k string, v double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "k", "v")

    t = DmlTable(spark, str(tmp_path / "roll"))
    specs = {"n": ("count", None), "sv": ("sum", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")}
    # batch 1: bucket 10:00 partial (2 rows), bucket 11:00 (1 row)
    refresh_incremental(mk([
        ("2024-01-01 10:05:00", "a", 1.0),
        ("2024-01-01 10:50:00", "a", 3.0),
        ("2024-01-01 11:10:00", "a", 5.0),
    ]), t, "ts", 1, "HOUR", specs, by=["k"])
    # batch 2: straddles bucket 11:00 AND delivers late rows for 10:00
    refresh_incremental(mk([
        ("2024-01-01 11:40:00", "a", 7.0),
        ("2024-01-01 10:20:00", "a", 9.0),   # late
        ("2024-01-01 12:01:00", "b", 2.0),
    ]), t, "ts", 1, "HOUR", specs, by=["k"])

    got = {(r.bucket_ms, r.k): (r.n, r.sv, r.mn, r.mx)
           for r in t.read().collect()}
    h10 = 1704103200000  # 2024-01-01 10:00 UTC epoch ms
    assert got[(h10, "a")] == (3, 13.0, 1.0, 9.0)          # late row merged
    assert got[(h10 + 3600000, "a")] == (2, 12.0, 5.0, 7.0)  # straddle merged
    assert got[(h10 + 7200000, "b")] == (1, 2.0, 2.0, 2.0)


def test_refresh_incremental_count_column_skips_nulls(spark, tmp_path):
    """('count', col) counts NON-NULL values of col; ('count', None)
    counts rows — a named column must not silently count all rows."""
    from pyspark.sql import functions as F

    from griddb_spark.dml import DmlTable
    from griddb_spark.operators import refresh_incremental

    df = spark.createDataFrame(
        [("2024-01-01 10:05:00", 1.0), ("2024-01-01 10:10:00", None),
         ("2024-01-01 10:20:00", 3.0)],
        "ts string, v double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "v")
    t = DmlTable(spark, str(tmp_path / "rollnc"))
    refresh_incremental(
        df, t, "ts", 1, "HOUR",
        {"n_rows": ("count", None), "n_v": ("count", "v")},
    )
    row = t.read().collect()[0]
    assert (row.n_rows, row.n_v) == (3, 2)


@pytest.mark.parametrize("seed", range(4))
def test_refresh_incremental_random_batches_converge(spark, tmp_path, seed):
    """ANY partition of the rows into batches, delivered in ANY order,
    must converge to the one-shot rollup — the merge is order- and
    split-independent (partials are commutative monoids)."""
    import random

    from pyspark.sql import functions as F

    from griddb_spark.dml import DmlTable
    from griddb_spark.operators import refresh_incremental
    from griddb_spark.operators.continuous_agg import BUCKET_COL

    rng = random.Random(4200 + seed)
    rows = [
        (f"2024-02-{1 + rng.randrange(3):02d} {rng.randrange(24):02d}:"
         f"{rng.randrange(60):02d}:00",
         rng.choice(["a", "b"]), float(rng.randrange(100)))
        for _ in range(120)
    ]

    def mk(rs):
        return spark.createDataFrame(
            rs, "ts string, k string, v double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "k", "v")

    specs = {"n": ("count", None), "sv": ("sum", "v"),
             "mn": ("min", "v"), "mx": ("max", "v")}

    one = DmlTable(spark, str(tmp_path / "one"))
    refresh_incremental(mk(rows), one, "ts", 1, "HOUR", specs, by=["k"])
    want = {(r[BUCKET_COL], r.k): (r.n, r.sv, r.mn, r.mx)
            for r in one.read().collect()}

    shuffled = rows[:]
    rng.shuffle(shuffled)
    n_batches = rng.randint(2, 5)
    bounds = sorted(rng.sample(range(1, len(rows)), n_batches - 1))
    pieces, prev = [], 0
    for b in bounds + [len(rows)]:
        pieces.append(shuffled[prev:b])
        prev = b
    inc = DmlTable(spark, str(tmp_path / "inc"))
    for piece in pieces:
        refresh_incremental(mk(piece), inc, "ts", 1, "HOUR", specs, by=["k"])
    got = {(r[BUCKET_COL], r.k): (r.n, r.sv, r.mn, r.mx)
           for r in inc.read().collect()}
    assert got == want


def test_embed_dedup_stream_zero_norm_and_nan_never_fold(spark, tmp_path):
    """The exact pre-collapse may fold ONLY vectors whose identical copy
    would verify as a near-dup. Zero-norm vectors (cos 0 by the verify
    kernel's den==0 convention) and NaN-containing vectors (sim NaN)
    never pair — intra-batch or cross-batch — so identical copies of
    them must all survive, while a genuine verbatim duplicate of a
    normal vector is still dropped across batches."""
    import glob
    import shutil

    from griddb_spark.streaming import embed_dedup_stream

    nan = float("nan")
    zeros = [0.0] * 8
    e1 = [1.0] + [0.0] * 7
    e2 = [0.0, 1.0] + [0.0] * 6
    nanv = [nan, 1.0] + [0.0] * 6
    batches = [
        [(1, zeros), (2, zeros), (3, e1), (5, nanv)],
        [(10, zeros), (11, e1), (12, nanv), (13, e2)],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i:02d}.parquet")
    stream = (
        spark.readStream
        .schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    index = str(tmp_path / "index")
    q = embed_dedup_stream(
        stream, index, "vec_id", "embedding", threshold=0.9, sign_bits=8,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination()
    kept = sorted(
        r.vec_id
        for r in spark.read
        .schema("vec_id long, __v array<double>, __cell int")
        .parquet(index).select("vec_id").collect()
    )
    # 11 (verbatim e1 dup of indexed 3) drops; every zero-norm / NaN
    # copy survives, intra- and cross-batch alike
    assert kept == [1, 2, 3, 5, 10, 12, 13]


def test_embed_dedup_stream_adaptive_sign_bits_migrates_index(spark, tmp_path):
    """Adaptive sign_bits (sign_bits=None): the index derives its cell
    width from the INDEXED row count so expected occupancy stays under
    target_occ without manual retuning; crossing the bound rebuckets the
    index (atomic directory swap) and cross-batch dedup still works
    against the migrated layout."""
    import glob
    import json
    import random
    import shutil

    from griddb_spark.streaming import embed_dedup_stream

    rng = random.Random(7)
    dim = 16

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    b1 = [(i, vec()) for i in range(300)]
    # batch 2: 300 fresh vectors + 50 verbatim duplicates of batch 1
    b2 = [(1000 + i, vec()) for i in range(300)]
    dups = [(2000 + i, b1[i][1]) for i in range(50)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2 + dups]):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i:02d}.parquet")
    stream = (
        spark.readStream
        .schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    index = str(tmp_path / "index")
    q = embed_dedup_stream(
        stream, index, "vec_id", "embedding", threshold=0.9,
        sign_bits=None, target_occ=1,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination()
    meta = json.load(open(f"{index}/_meta.json"))
    # batch 1 derives 9 bits from its own 300 rows (first-batch sizing),
    # 600 outgrow 1×2^9 after batch 2 (→10 bits) — one migration, no
    # manual retuning
    assert meta == {"sign_bits": 10, "rows": 600, "appends": 0}
    kept = sorted(
        r.vec_id
        for r in spark.read
        .schema("vec_id long, __v array<double>, __cell int")
        .parquet(index).select("vec_id").collect()
    )
    # all 50 cross-batch verbatim duplicates dropped DESPITE the index
    # having been rebucketed between their original and their arrival
    assert kept == sorted(r[0] for r in b1 + b2)
    # the migrated layout really is 10-bit: some cell beyond the 8-bit
    # range must exist for 600 random vectors over 1024 cells
    cells = [int(e.split("=")[1]) for e in os.listdir(index)
             if e.startswith("__cell=")]
    assert max(cells) >= 256 and max(cells) < 1024


def test_embed_dedup_stream_adaptive_refuses_unmanaged_index(spark, tmp_path):
    """Adaptive mode cannot know the layout bits of an index created
    with an explicit sign_bits (no _meta.json) — it must refuse rather
    than probe the wrong cells."""
    import glob
    import shutil

    from griddb_spark.streaming import embed_dedup_stream

    rows = [(1, [1.0] * 8)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    d = str(tmp_path / "f0")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    shutil.move(glob.glob(f"{d}/part-*.parquet")[0], f"{src}/00.parquet")
    index = str(tmp_path / "index")
    # an index created under a pinned 8-bit layout
    spark.createDataFrame(
        [(99, [1.0] * 8, 3)], "vec_id long, __v array<double>, __cell int"
    ).write.partitionBy("__cell").parquet(index)
    stream = (
        spark.readStream
        .schema("vec_id long, embedding array<double>")
        .parquet(src)
    )
    q = embed_dedup_stream(stream, index, "vec_id", "embedding",
                           sign_bits=None,
                           checkpoint_dir=str(tmp_path / "ck"))
    import pyspark.errors

    with pytest.raises(Exception, match="_meta.json"):
        q.awaitTermination()


def test_embed_dedup_stream_replay_after_crash_converges(spark, tmp_path):
    """At-least-once append semantics, now tested: the index append in
    foreachBatch runs BEFORE the engine commits the batch to the
    checkpoint. Simulate a crash in that window by deleting the LAST
    commit marker after a completed run, then restarting the stream with
    the same checkpoint: the engine re-executes the final batch, whose
    survivors match their own already-indexed copies (cos 1.0) and drop
    — the index converges with NO duplicate ids and a keep-set identical
    to the uninterrupted run."""
    import glob
    import random
    import shutil

    from griddb_spark.streaming import embed_dedup_stream

    rng = random.Random(11)
    dim = 8

    def vec():
        return [rng.uniform(-1, 1) for _ in range(dim)]

    b1 = [(i, vec()) for i in range(40)]
    b2 = [(100 + i, vec()) for i in range(40)] + \
         [(200 + i, b1[i][1]) for i in range(10)]  # 10 cross-batch dups
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate([b1, b2]):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i:02d}.parquet")

    def mk_stream():
        return (spark.readStream
                .schema("vec_id long, embedding array<double>")
                .option("maxFilesPerTrigger", 1)
                .parquet(src))

    index = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    q = embed_dedup_stream(mk_stream(), index, "vec_id", "embedding",
                           threshold=0.9, sign_bits=8, checkpoint_dir=ck)
    q.awaitTermination()
    q.stop()

    def index_ids():
        return [r.vec_id for r in spark.read
                .schema("vec_id long, __v array<double>, __cell int")
                .parquet(index).select("vec_id").collect()]

    baseline = sorted(index_ids())
    # the 10 verbatim cross-batch duplicates (ids 200+) never survive:
    # their vector equals a batch-1 vector, so whichever batch-1 member
    # canonically represents it is already indexed at cos 1.0
    assert not any(i >= 200 for i in baseline)
    assert len(baseline) == len(set(baseline))
    # crash simulation: batch 1's appends are on disk, its checkpoint
    # commit never landed
    commits = sorted(glob.glob(f"{ck}/commits/*"),
                     key=lambda p: int(os.path.basename(p)))
    os.remove(commits[-1])
    crc = os.path.join(os.path.dirname(commits[-1]),
                       f".{os.path.basename(commits[-1])}.crc")
    if os.path.exists(crc):  # local-FS checksum shadow of the commit
        os.remove(crc)
    q2 = embed_dedup_stream(mk_stream(), index, "vec_id", "embedding",
                            threshold=0.9, sign_bits=8, checkpoint_dir=ck)
    q2.awaitTermination()
    q2.stop()
    replayed = index_ids()
    assert sorted(replayed) == baseline          # same keep-set
    assert len(replayed) == len(set(replayed))   # no duplicate ids


def test_embed_dedup_stream_tiled_verify_parity(spark, tmp_path, monkeypatch):
    """The fused per-cell verify GEMM tiles its probe side so per-task
    memory is bounded by _VERIFY_TILE_ELEMS regardless of cell occupancy
    (the 1000x salted probe OOM'd the untiled kernel). Shrinking the
    budget to a few elements forces 1-row tiles, so every pair crosses a
    tile boundary -- the result must match both the untiled run and a
    brute-force python reference of the drop semantics (intra-batch
    component losers + cross-batch index dups, removed as a union)."""
    import glob
    import random
    import shutil

    import numpy as np

    from griddb_spark.pipeline.dedup import union_find_min
    from griddb_spark.streaming import embed_dedup_stream, stream_ops

    rng = random.Random(11)
    dim = 8

    def vec():
        # first 4 dims tiny-positive: every vector lands in ONE 4-bit
        # sign cell (maximal occupancy); last 4 dims set the direction,
        # so pairwise cosine is essentially that of random 4-dim vectors
        return ([rng.uniform(0.001, 0.01) for _ in range(4)]
                + [rng.uniform(-1, 1) for _ in range(4)])

    base = [vec() for _ in range(40)]
    b1 = [(i, base[i]) for i in range(40)]
    fresh = [vec() for _ in range(10)]
    b2 = ([(100 + i, [x * 1.001 for x in base[i]]) for i in range(20)]
          + [(200 + i, fresh[i]) for i in range(10)]
          + [(300 + i, [x * 1.0005 for x in fresh[i]]) for i in range(10)])

    def r6(a, b):
        s = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        return np.sign(s) * np.floor(abs(s) * 1e6 + 0.5) / 1e6

    def reference():
        kept: list[tuple[int, list]] = []
        for batch in (b1, b2):
            pairs = {
                (min(x, y), max(x, y))
                for i, (x, vx) in enumerate(batch)
                for y, vy in batch[i + 1:]
                if r6(vx, vy) >= 0.9
            }
            comp = union_find_min(pairs)
            losers = {x for x, c in comp.items() if c < x}
            dups = {
                x for x, vx in batch
                if any(r6(vx, vy) >= 0.9 for _, vy in kept)
            }
            kept += [(x, vx) for x, vx in batch
                     if x not in losers and x not in dups]
        return sorted(x for x, _ in kept)

    def run(index, ck):
        src = str(tmp_path / f"src_{os.path.basename(index)}")
        os.makedirs(src)
        for i, rows in enumerate([b1, b2]):
            d = str(tmp_path / f"f_{os.path.basename(index)}_{i}")
            spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ).coalesce(1).write.mode("overwrite").parquet(d)
            shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                        f"{src}/{i:02d}.parquet")
        stream = (
            spark.readStream
            .schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = embed_dedup_stream(
            stream, index, "vec_id", "embedding", threshold=0.9,
            sign_bits=4, checkpoint_dir=ck,
        )
        q.awaitTermination()
        return sorted(
            r.vec_id
            for r in spark.read
            .schema("vec_id long, __v array<double>, __cell int")
            .parquet(index).select("vec_id").collect()
        )

    untiled = run(str(tmp_path / "idx_a"), str(tmp_path / "ck_a"))
    # 3 elements per tile against a >=40-member cell -> 1-row tiles
    monkeypatch.setattr(stream_ops, "_VERIFY_TILE_ELEMS", 3)
    tiled = run(str(tmp_path / "idx_b"), str(tmp_path / "ck_b"))
    assert tiled == untiled == reference()
    # the harness exercised the cross-batch path: every x1.001 copy of a
    # batch-1 SURVIVOR must have been dropped against the index
    survivors_b1 = {x for x in untiled if x < 100}
    assert not {100 + i for i in range(20) if i in survivors_b1} & set(tiled)


def test_embed_dedup_stream_adaptive_first_batch_crash_replays(
        spark, tmp_path):
    """The FIRST adaptive batch's crash window: the derived layout is
    persisted to _meta.json BEFORE any index data is appended, so a
    crash between the first append and the post-append meta update
    leaves (cells + meta{bits, rows: 0}) — a replay re-reads the bits
    and converges, instead of dying on the unknowable-layout ValueError
    (cells with no meta). Simulated by resetting the meta to its
    pre-append content and deleting the only checkpoint commit."""
    import glob
    import json
    import random
    import shutil

    from griddb_spark.streaming import embed_dedup_stream

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    rows += [(100 + i, rows[i][1]) for i in range(10)]  # 10 verbatim dups
    src = str(tmp_path / "src")
    os.makedirs(src)
    d = str(tmp_path / "f0")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    shutil.move(glob.glob(f"{d}/part-*.parquet")[0], f"{src}/00.parquet")

    def mk_stream():
        return (spark.readStream
                .schema("vec_id long, embedding array<double>")
                .option("maxFilesPerTrigger", 1)
                .parquet(src))

    index = str(tmp_path / "index")
    ck = str(tmp_path / "ck")
    q = embed_dedup_stream(mk_stream(), index, "vec_id", "embedding",
                           threshold=0.9, sign_bits=None, checkpoint_dir=ck)
    q.awaitTermination()
    q.stop()

    def index_ids():
        return sorted(r.vec_id for r in spark.read
                      .schema("vec_id long, __v array<double>, __cell int")
                      .parquet(index).select("vec_id").collect())

    baseline = index_ids()
    # every verbatim dup (ids 100+) collapsed; survivors are originals
    # (random 8-dim vectors may near-dup each other too, so the exact
    # original keep-set is whatever the kernel found — the invariant
    # under test is replay convergence, asserted below)
    assert baseline and all(i < 100 for i in baseline)
    meta = json.load(open(f"{index}/_meta.json"))
    bits = meta["sign_bits"]
    # crash simulation: the append landed, the post-append meta update
    # and the checkpoint commit did not
    json.dump({"sign_bits": bits, "rows": 0},
              open(f"{index}/_meta.json", "w"))
    for c in glob.glob(f"{ck}/commits/*") + glob.glob(f"{ck}/commits/.*crc"):
        os.remove(c)
    q2 = embed_dedup_stream(mk_stream(), index, "vec_id", "embedding",
                            threshold=0.9, sign_bits=None,
                            checkpoint_dir=ck)
    q2.awaitTermination()
    q2.stop()
    assert index_ids() == baseline  # replayed survivors dropped, no dups
    meta2 = json.load(open(f"{index}/_meta.json"))
    assert meta2["sign_bits"] == bits


def test_embed_dedup_stream_compaction_bounds_file_count(
        spark, tmp_path, monkeypatch):
    """Long-stream file-growth bound: at stable occupancy the adaptive
    index never rebuckets, so without compaction a hot cell accretes one
    file per micro-batch forever (50 batches -> ~50 files). The
    appends-since-rewrite counter triggers an in-place rewrite (same
    bits, same atomic-swap machinery) at _COMPACT_APPENDS, so ~50
    micro-batches must leave files-per-cell bounded by the trigger --
    with survivors IDENTICAL to the exact first-seen-wins reference
    (compaction is layout-only; all vectors share one sign cell by
    construction, so recall is exact and the reference is closed-form).
    """
    import glob
    import json
    import random
    import shutil

    import numpy as np

    from griddb_spark.pipeline.dedup import union_find_min
    from griddb_spark.streaming import embed_dedup_stream, stream_ops

    rng = random.Random(11)
    dim, n_batches, per_batch = 16, 50, 8

    def vec():
        # first 8 dims pinned positive => every vector lands in the
        # all-ones 8-bit sign cell: one HOT cell touched by every batch
        # (the adversarial file-growth shape); the gaussian tail sets
        # the direction so most cross pairs sit below the threshold
        return [0.1] * 8 + [rng.gauss(0, 1) for _ in range(dim - 8)]

    batches = []
    fresh: list = []
    for bi in range(n_batches):
        rows = [(bi * 100 + j, vec()) for j in range(per_batch - 2)]
        if fresh:  # 2 verbatim duplicates of earlier rows per batch
            rows += [(bi * 100 + 90 + k, rng.choice(fresh)[1])
                     for k in range(2)]
        fresh += rows[:per_batch - 2]
        batches.append(rows)

    def r6(a, b):
        s = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        return np.sign(s) * np.floor(abs(s) * 1e6 + 0.5) / 1e6

    def reference():
        kept: list[tuple[int, list]] = []
        for batch in batches:
            pairs = {
                (min(x, y), max(x, y))
                for i, (x, vx) in enumerate(batch)
                for y, vy in batch[i + 1:]
                if r6(vx, vy) >= 0.9
            }
            comp = union_find_min(pairs)
            losers = {x for x, c in comp.items() if c < x}
            dups = {
                x for x, vx in batch
                if any(r6(vx, vy) >= 0.9 for _, vy in kept)
            }
            kept += [(x, vx) for x, vx in batch
                     if x not in losers and x not in dups]
        return sorted(x for x, _ in kept)

    monkeypatch.setattr(stream_ops, "_COMPACT_APPENDS", 8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i:02d}.parquet")
    index = str(tmp_path / "index")
    q = embed_dedup_stream(
        spark.readStream
        .schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1).parquet(src),
        index, "vec_id", "embedding", threshold=0.9, sign_bits=None,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination()
    q.stop()

    kept = sorted(
        r.vec_id for r in spark.read
        .schema("vec_id long, __v array<double>, __cell int")
        .parquet(index).select("vec_id").collect())
    assert kept == reference()  # compaction is layout-only
    # every cell stays within trigger+1 files: 50 appends into ONE hot
    # cell would reach ~50 files if compaction never fired
    per_cell = {
        e: len(glob.glob(f"{index}/{e}/*.parquet"))
        for e in os.listdir(index) if e.startswith("__cell=")
    }
    assert per_cell and max(per_cell.values()) <= 8 + 1
    meta = json.load(open(f"{index}/_meta.json"))
    # the counter proves rewrites fired and reset (50 appends can never
    # legally end with >= 8 uncompacted ones), at unchanged layout bits
    assert meta["appends"] < 8
    assert meta["sign_bits"] == 8


def test_compaction_never_shrinks_layout_bits(spark, tmp_path, monkeypatch):
    """A compaction-only rewrite must run at the CURRENT layout bits even
    when the triggering batch derives a narrower width (auto_sign_bits
    clamps to the batch's observed dim, so a batch of narrower or
    NULL-size embeddings yields needed < bits). Without the max(bits,
    needed) clamp the rewrite silently shrinks the whole index, then the
    next normal batch re-widens it — full-index rewrite thrash with no
    occupancy benefit. auto_sign_bits is patched to derive 8 on the
    first (layout-creating) call and 4 on every later call: the
    compaction trigger then sees needed=4 < bits=8 and must keep 8."""
    import glob
    import json
    import shutil

    from griddb_spark.pipeline import similarity as sim_mod
    from griddb_spark.streaming import stream_ops
    from griddb_spark.streaming.stream_ops import embed_dedup_stream

    calls = []

    def fake_bits(n_rows, dim, **kw):
        calls.append((n_rows, dim))
        return 8 if len(calls) == 1 else 4

    monkeypatch.setattr(sim_mod, "auto_sign_bits", fake_bits)
    monkeypatch.setattr(stream_ops, "_COMPACT_APPENDS", 2)

    rng = __import__("random").Random(7)
    batches = [
        [(bi * 10 + j, [rng.gauss(0, 1) for _ in range(16)])
         for j in range(4)]
        for bi in range(4)
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i:02d}.parquet")
    index = str(tmp_path / "index")
    q = embed_dedup_stream(
        spark.readStream
        .schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1).parquet(src),
        index, "vec_id", "embedding", threshold=0.9, sign_bits=None,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination()
    q.stop()

    assert len(calls) > 1  # the narrow derivation was actually consulted
    meta = json.load(open(f"{index}/_meta.json"))
    assert meta["sign_bits"] == 8  # compaction fired, layout NOT shrunk
    assert meta["appends"] < 2  # ...and the counter proves it fired
    # all 16 distinct gaussian vectors survive (no near-dups planted)
    n = (spark.read
         .schema("vec_id long, __v array<double>, __cell int")
         .parquet(index).count())
    assert n == 16


def test_rebucket_swap_crash_windows_pick_consistent_layout(spark, tmp_path):
    """The three rebucket-swap crash windows (stream_ops rebucket tail:
    side-dir complete -> rename(index, old) -> rename(tmp, index) ->
    rmtree(old)) each leave _index_meta_read one consistent layout:

    A. killed AFTER the side-directory _meta.json write but BEFORE any
       rename: live index untouched -> ROLL BACK (stale side dir
       removed; old bits stay live);
    B. killed BETWEEN the two renames: no live index, complete side dir
       -> ROLL FORWARD (side dir becomes the index at the new bits);
    C. killed before rmtree(old): live new index + stale old -> old
       removed.

    Layout and metadata always agree because the meta rides inside the
    renamed directory. After the window-B roll-forward, a continuing
    stream batch must dedup against the MIGRATED layout."""
    import glob
    import json
    import os as _os
    import random
    import shutil

    from griddb_spark.streaming import embed_dedup_stream
    from griddb_spark.streaming.stream_ops import (
        _index_meta_read, _index_meta_write)

    rng = random.Random(23)
    dim, n = 16, 20
    vecs = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n)]

    def cell(v, bits):
        return sum(1 << j for j in range(bits) if v[j] >= 0)

    index = str(tmp_path / "index")
    tmp = index + ".__rebucket"
    old = index + ".__old"

    def build(path, bits, rows):
        if _os.path.isdir(path):
            shutil.rmtree(path)
        spark.createDataFrame(
            [(i, v, cell(v, bits)) for i, v in enumerate(vecs)],
            "vec_id long, __v array<double>, __cell int",
        ).write.partitionBy("__cell").parquet(path)
        _index_meta_write(path, {"sign_bits": bits, "rows": rows,
                                 "appends": 0})

    def live_cells(path):
        return sorted(int(e.split("=")[1]) for e in _os.listdir(path)
                      if e.startswith("__cell="))

    # window A: side dir complete (its meta was the LAST write), crash
    # before rename(index, old) — the live 8-bit index must stay live
    build(index, 8, n)
    build(tmp, 9, n)
    meta = _index_meta_read(index)
    assert meta == {"sign_bits": 8, "rows": n, "appends": 0}
    assert not _os.path.isdir(tmp) and not _os.path.isdir(old)
    assert live_cells(index) == sorted({cell(v, 8) for v in vecs})

    # window B: crash between rename(index, old) and rename(tmp, index)
    # — roll FORWARD to the completed 9-bit side dir, drop the old copy
    build(tmp, 9, n)
    _os.rename(index, old)
    meta = _index_meta_read(index)
    assert meta == {"sign_bits": 9, "rows": n, "appends": 0}
    assert not _os.path.isdir(tmp) and not _os.path.isdir(old)
    assert live_cells(index) == sorted({cell(v, 9) for v in vecs})

    # window C: crash before rmtree(old) — stale old removed, live
    # index untouched
    shutil.copytree(index, old)
    meta = _index_meta_read(index)
    assert meta == {"sign_bits": 9, "rows": n, "appends": 0}
    assert not _os.path.isdir(old)

    # a continuing stream batch deduplicates against the ROLLED-FORWARD
    # 9-bit layout: verbatim copies of indexed vectors drop, fresh rows
    # append into 9-bit cells
    fresh = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(5)]
    rows = ([(100 + i, vecs[i]) for i in range(5)]
            + [(200 + i, v) for i, v in enumerate(fresh)])
    src = str(tmp_path / "src")
    _os.makedirs(src)
    d = str(tmp_path / "f0")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    shutil.move(glob.glob(f"{d}/part-*.parquet")[0], f"{src}/00.parquet")
    q = embed_dedup_stream(
        spark.readStream
        .schema("vec_id long, embedding array<double>").parquet(src),
        index, "vec_id", "embedding", threshold=0.9, sign_bits=None,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination()
    q.stop()
    kept = sorted(
        r.vec_id for r in spark.read
        .schema("vec_id long, __v array<double>, __cell int")
        .parquet(index).select("vec_id").collect())
    assert kept == list(range(n)) + [200 + i for i in range(5)]
    meta = json.load(open(f"{index}/_meta.json"))
    assert meta["sign_bits"] == 9 and meta["rows"] == n + 5
    assert live_cells(index) == sorted(
        {cell(v, 9) for v in vecs} | {cell(v, 9) for v in fresh})


def test_drop_memory_sinks_releases_finished_tables(spark):
    """run_to_memory registers every sink it creates; drop_memory_sinks
    drops those temp views (releasing the driver-heap row copies a long
    bench session otherwise accumulates) and is safe to call twice."""
    from griddb_spark.streaming import run_to_memory
    from griddb_spark.streaming.stream_ops import drop_memory_sinks

    src = spark.readStream.format("rate").option(
        "rowsPerSecond", "100").load().select("value")
    got = run_to_memory(src, "t_sink_reclaim", mode="append")
    assert got.count() >= 0  # consumed
    names = {t.name for t in spark.catalog.listTables()}
    assert "t_sink_reclaim" in names
    assert drop_memory_sinks(spark) >= 1
    names = {t.name for t in spark.catalog.listTables()}
    assert "t_sink_reclaim" not in names
    assert drop_memory_sinks(spark) == 0  # idempotent, registry cleared


def test_embed_dedup_stream_tolerates_corrupt_embeddings(spark, tmp_path):
    """Crawl ingest reality: NULL embeddings, vectors shorter than the
    code width, and mixed widths must neither crash the stream nor
    silently vanish. Unpairable rows (NULL / short → NULL sign cell)
    survive as permanent index rows; full-width duplicates still dedup
    across batches with the corrupt rows in play (the probe-cell set and
    the verify kernel both have to tolerate NULL cells and ragged
    widths)."""
    import glob
    import shutil

    base = [0.4] * 16
    wide = [-0.3] * 32
    batches = [
        # batch 1: two full-width rows, a NULL row, a short row
        [(1, base), (2, wide), (3, None), (4, [1.0, -2.0])],
        # batch 2: near-dups of both widths + another corrupt pair
        [(10, [x * 1.001 for x in base]),       # dup of 1 (16-dim)
         (11, [x * 1.001 for x in wide]),       # dup of 2 (32-dim)
         (12, None), (13, [3.0])],
    ]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, rows in enumerate(batches):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(d)
        shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                    f"{src}/{i:02d}.parquet")

    from griddb_spark.streaming import embed_dedup_stream

    index = str(tmp_path / "index")
    q = embed_dedup_stream(
        spark.readStream
        .schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1).parquet(src),
        index, "vec_id", "embedding", threshold=0.9, sign_bits=None,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination()
    q.stop()

    kept = sorted(
        r.vec_id for r in spark.read
        .schema("vec_id long, __v array<double>, __cell int")
        .parquet(index).select("vec_id").collect())
    # 10/11 are cross-batch dups of 1/2; every corrupt row survives
    assert kept == [1, 2, 3, 4, 12, 13]


def test_embed_dedup_stream_local_distributed_parity(spark, tmp_path):
    """The driver-local micro-batch path (stats-dispatched in
    embed_dedup_stream._batch) must be bit-for-bit identical to the
    distributed path: same surviving ids, same stored vectors (including
    -0.0 normalization of folded representatives, NULL elements kept
    NULL in storage, NaN preserved), same cell assignments, same
    _meta.json. The fixture deliberately hits every semantic edge the
    local twin re-implements: verbatim dups intra- and cross-batch,
    near-dups straddling batches, zero-norm / NaN / NULL / ragged /
    NULL-element vectors, a NULL id, and a -0.0 vs 0.0 identical pair."""
    import glob
    import json
    import math
    import shutil

    from griddb_spark.streaming import embed_dedup_stream

    nan = float("nan")
    base = [1.0, 0.5, -0.25, 0.75, -1.0, 0.3, -0.6, 0.9]
    near = [x * 1.0000001 for x in base]  # cos ≈ 1 → near-dup
    other = [-1.0, 2.0, 3.0, -4.0, 5.0, -6.0, 7.0, 8.0]
    batches = [
        [
            (1, base), (2, base),              # intra verbatim dup
            (3, other),
            (4, [0.0] * 8), (5, [0.0] * 8),    # zero-norm: never folds
            (6, [nan, 1.0] + [0.0] * 6),       # NaN: never pairs
            (7, [1.0, 2.0]),                   # ragged (< sign bits)
            (8, None),                         # NULL embedding
            (None, None),                      # corrupt row: survives
            (9, [0.0, -0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
            (10, [-0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]),  # folds w/ 9
            (11, [1.0, None, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),  # NULL elem
        ],
        [
            (20, base),                        # cross-batch verbatim dup
            (21, near),                        # cross-batch near-dup
            (22, [x * 2.0 for x in other]),    # scaled: cos 1 with 3
            (23, [8.0] * 8),
            (24, [nan, 1.0] + [0.0] * 6),      # NaN copy survives
        ],
    ]

    def run(local, sign_bits):
        src = str(tmp_path / f"src_{local}_{sign_bits}")
        os.makedirs(src, exist_ok=True)
        for i, rows in enumerate(batches):
            d = str(tmp_path / f"f_{local}_{sign_bits}_{i}")
            spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ).coalesce(1).write.mode("overwrite").parquet(d)
            shutil.move(glob.glob(f"{d}/part-*.parquet")[0],
                        f"{src}/{i:02d}.parquet")
        index = str(tmp_path / f"index_{local}_{sign_bits}")
        q = embed_dedup_stream(
            spark.readStream
            .schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1).parquet(src),
            index, "vec_id", "embedding", threshold=0.9,
            sign_bits=sign_bits, local=local,
            checkpoint_dir=str(tmp_path / f"ck_{local}_{sign_bits}"),
        )
        q.awaitTermination()
        q.stop()
        rows = (spark.read
                .schema("vec_id long, __v array<double>, __cell int")
                .parquet(index).collect())
        # float().hex() distinguishes -0.0 from 0.0 and keeps NaN
        # comparable — the parity claim is BIT equality of storage
        def hx(x):
            return "N" if x is None else float(x).hex()
        trips = [
            (r.vec_id,
             None if r["__v"] is None else tuple(hx(x) for x in r["__v"]),
             r["__cell"])
            for r in rows
        ]
        got = sorted(  # None ids/vecs/cells sort first, deterministically
            trips,
            key=lambda t: (t[0] is not None, t[0] or 0, t[1] or (),
                           t[2] is not None, t[2] or 0))
        meta = None
        mp = os.path.join(index, "_meta.json")
        if os.path.isfile(mp):
            meta = json.load(open(mp))
        return got, meta

    for sign_bits in (8, None):
        got_l, meta_l = run(True, sign_bits)
        got_d, meta_d = run(False, sign_bits)
        assert got_l == got_d, f"sign_bits={sign_bits}"
        assert meta_l == meta_d, f"sign_bits={sign_bits}"
        # sanity on the shared outcome, not just parity: intra dup 2,
        # cross verbatim 20, near-dup 21, and scaled 22 all dropped;
        # zero/NaN/NULL/ragged/NULL-elem/NULL-id all survive
        kept_ids = [t[0] for t in got_l]
        assert None in kept_ids
        ints = sorted(i for i in kept_ids if i is not None)
        assert ints == [1, 3, 4, 5, 6, 7, 8, 9, 11, 23, 24]

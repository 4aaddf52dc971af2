"""Streaming operators: windowed aggregation, keyed upsert, stream readers.

Scale notes: event-time windows + watermark bound state size (only open
windows are kept per key); the upsert sink is partition-wise idempotent
(overwrite-by-key per micro-batch) so replays are safe; file-source streams
use ``maxFilesPerTrigger`` to bound batch size at a 1000-executor scale.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from griddb_spark.operators.timeseries import UNIT_MS


def read_container_stream(
    spark: SparkSession,
    path: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream a container directory (the ingest side of TimeSeries.append).

    File-source streams need an explicit schema (no inference mid-stream).
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def group_by_range_stream(
    stream: DataFrame,
    key: str,
    every: int,
    unit: str,
    aggs: Mapping[str, Column],
    watermark: str = "1 minute",
    by: Sequence[str] = (),
    slide: tuple[int, str] | None = None,
) -> DataFrame:
    """Streaming GROUP BY RANGE EVERY(n, unit): event-time windows.

    The batch operator's fixed lattice becomes ``window(key, interval)``;
    the watermark bounds state and defines when a bucket is final (the
    streaming replacement for FILL — late rows inside the watermark still
    land in their bucket). Output column = bucket start under ``key``.

    ``slide=(n, unit)`` makes the windows sliding (overlapping): every
    event lands in duration/slide windows — the continuous face of a
    moving aggregate. Both duration and slide anchor at the epoch.
    """
    unit_ms = UNIT_MS[unit.upper()]
    interval = f"{every * unit_ms} milliseconds"
    agg_exprs = [expr.alias(name) for name, expr in aggs.items()]
    win = (
        F.window(F.col(key), interval)
        if slide is None
        else F.window(
            F.col(key), interval,
            f"{slide[0] * UNIT_MS[slide[1].upper()]} milliseconds",
        )
    )
    return (
        stream.withWatermark(key, watermark)
        .groupBy(*by, win.alias("__w"))
        .agg(*agg_exprs)
        .select(*by, F.col("__w.start").alias(key), *[F.col(n) for n in aggs])
    )


def dedup_stream(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication by key within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` keeps first-arrival per key and
    EVICTS key state once the watermark passes — bounded state, unlike a
    plain ``dropDuplicates`` whose key set grows forever. The streaming
    face of ``pipeline.dedup.exact_dedup`` (at-least-once ingest →
    exactly-once rows), sized by the dup-arrival horizon, not stream
    length.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def distinct_sketch_stream(
    stream: DataFrame,
    key: str,
    id_col: str,
    every: int,
    unit: str,
    m: int = 1024,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming windowed cardinality profiling: linear-counting distinct
    sketch (pipeline/sketches.py) over event-time windows.

    Per-window state is the SET OF HIT REGISTERS (``collect_set`` of the
    deterministic register hash), so the state store holds at most ``m``
    small integers per open window no matter how many distinct keys flow
    through — the streaming analog of the batch sketch's bounded shuffle.
    The watermark retires windows; the estimate uses the shared
    ``lc_estimate`` so streaming and batch results are comparable (and
    mergeable: register sets union).
    """
    from griddb_spark.pipeline.sketches import lc_estimate, register_col

    unit_ms = UNIT_MS[unit.upper()]
    win = F.window(F.col(key), f"{every * unit_ms} milliseconds")
    hits = (
        stream.withWatermark(key, watermark)
        .groupBy(win.alias("__w"))
        .agg(F.size(F.collect_set(register_col(F.col(id_col), m)))
             .cast("long").alias("n_registers"))
    )
    return hits.select(
        F.col("__w.start").alias(key),
        "n_registers",
        lc_estimate("n_registers", m).alias("est_distinct"),
    )


def freq_sketch_stream(
    stream: DataFrame,
    key: str,
    id_col: str,
    every: int,
    unit: str,
    depth: int = 4,
    width: int = 512,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming windowed count-min sketch: per event-time window, the
    ``depth x width`` register counts (pipeline/sketches.py hashing).

    State per open window is capped at ``depth * width`` counters no
    matter how many distinct keys flow through — the streaming frequency
    analog of ``distinct_sketch_stream``'s bounded register set. Emits
    ``(window_start, d, pos, cnt)`` — the mergeable sketch itself, which
    downstream probes (``cms_estimate``) read batch-side; sketches from
    separate streams/windows merge by adding counters.
    """
    from griddb_spark.pipeline.sketches import _double_hash_pos

    unit_ms = UNIT_MS[unit.upper()]
    win = F.window(F.col(key), f"{every * unit_ms} milliseconds")
    probe = F.explode(
        F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                _double_hash_pos(id_col, d, width).alias("pos"),
            )
            for d in range(depth)
        ])
    ).alias("__r")
    return (
        stream.withWatermark(key, watermark)
        .select(F.col(key), probe)
        .groupBy(win.alias("__w"), F.col("__r.d").alias("d"),
                 F.col("__r.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("__w.start").alias(key), "d", "pos", "cnt")
    )


def quantile_sketch_stream(
    stream: DataFrame,
    key: str,
    value_col: str,
    every: int,
    unit: str,
    lo: float,
    hi: float,
    n_buckets: int = 256,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming windowed histogram-quantile sketch: per event-time
    window, fixed-width bucket counts over ``[lo, hi)`` (the streaming
    face of ``pipeline.sketches.histogram_quantile``).

    State per open window is capped at ``n_buckets`` counters; quantile
    estimates are a batch-side cumulative walk over the materialized
    counts (same estimator, so streaming and batch results agree and
    per-window sketches merge by adding counts). Emits
    ``(window_start, bucket, cnt)``.
    """
    unit_ms = UNIT_MS[unit.upper()]
    win = F.window(F.col(key), f"{every * unit_ms} milliseconds")
    w = (hi - lo) / float(n_buckets)
    v = F.col(value_col).cast("double")
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(w)).cast("int")),
    ).alias("__bucket")
    return (
        stream.withWatermark(key, watermark)
        .select(F.col(key), bucket)
        .groupBy(win.alias("__w"), "__bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("__w.start").alias(key),
                F.col("__bucket").alias("bucket"), "cnt")
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_minutes: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join on ``key`` within ±``tolerance_minutes``.

    Both sides carry a watermark and the join condition carries the time
    bound — together they let Spark EVICT join state older than
    watermark+tolerance instead of buffering both streams forever (the
    stream-stream join state-cleanup contract). Inner matches emit as soon
    as both rows have arrived. Column names must already be disjoint
    (rename before calling).
    """
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    tol = F.expr(f"INTERVAL {tolerance_minutes} MINUTES")
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts) - tol)
        & (F.col(right_ts) <= F.col(left_ts) + tol)
    )
    return l.join(r, cond, "inner").drop(r[key])


def upsert_by_key(
    stream: DataFrame,
    key_cols: Sequence[str],
    target_dir: str,
    checkpoint_dir: str,
    ts_col: str | None = None,
):
    """Streaming NoSQL ``put`` semantics: insert-or-update by row key.

    ``foreachBatch`` merge: union the micro-batch with the current target,
    keep the newest row per key (by ``ts_col`` when given, else batch wins),
    rewrite atomically. On a production lake this is Delta ``MERGE``; plain
    parquet here keeps the environment dependency-free — the batch function
    is the part that carries over.
    """
    from pyspark.sql import Window

    keys = list(key_cols)

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.withColumn("__new", F.lit(1))
        if os.path.isdir(target_dir) and any(
            f.endswith(".parquet") for f in os.listdir(target_dir)
        ):
            # the target's schema IS the batch schema minus the __new tag
            # (every file was written from prior merged batches) — passing
            # it skips the footer-reading schema-inference job
            current = spark.read.schema(
                batch.drop("__new").schema
            ).parquet(target_dir).withColumn("__new", F.lit(0))
            unioned = current.unionByName(batch)
        else:
            unioned = batch
        order = (
            [F.col(ts_col).desc(), F.col("__new").desc()]
            if ts_col
            else [F.col("__new").desc()]
        )
        w = Window.partitionBy(*keys).orderBy(*order)
        merged = (
            unioned.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__new")
        )
        # stage-then-swap: a crash mid-write must not clobber the target;
        # the swap is a directory rename so the merged data is written
        # once (Delta MERGE replaces this whole dance on a real lake)
        import shutil

        tmp = f"{target_dir}.tmp-{epoch_id}-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(target_dir):
            trash = f"{target_dir}.old-{uuid.uuid4().hex[:8]}"
            os.rename(target_dir, trash)
            os.rename(tmp, target_dir)
            shutil.rmtree(trash, ignore_errors=True)
        else:
            os.rename(tmp, target_dir)

    return (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )


#: Every memory-sink table run_to_memory created and never dropped: the
#: sink holds the full result rows on the driver heap for the life of
#: the session (each caller names its table with a fresh uuid, so
#: nothing ever overwrites). A long bench/verify session accumulates one
#: dead result set per streaming gate run — drop_memory_sinks reclaims
#: them once the caller is done with the returned DataFrame.
_MEMORY_SINKS: list[str] = []


def drop_memory_sinks(spark) -> int:
    """Drop the temp views of all finished run_to_memory sinks,
    releasing their driver-heap row copies. Only call once returned
    DataFrames from prior run_to_memory calls are no longer needed
    (a harness boundary between queries, not mid-query)."""
    n = 0
    for t in _MEMORY_SINKS:
        try:
            spark.catalog.dropTempView(t)
            n += 1
        except Exception:
            pass  # session restarted / already dropped
    _MEMORY_SINKS.clear()
    return n


def run_to_memory(
    result: DataFrame,
    table_name: str,
    mode: str = "complete",
    shuffle_partitions: int | None = None,
    timeout_sec: float | None = None,
) -> DataFrame:
    """Run a (bounded) streaming query to completion into a memory sink and
    return the result table — used to gate streaming ops through the same
    DuckDB-oracle differential harness as batch operators.

    ``shuffle_partitions`` overrides the state-partition count for THIS
    query (read once at stream start, restored after): stateful operators
    create one state store per shuffle partition per operator — a
    stream-stream join keeps 4 — so state-store setup, not data volume,
    dominates small/bounded runs (measured 8s → 2s on the interval join by
    dropping 32 → 8). At production throughput size it to the stream rate.

    ``timeout_sec`` bounds each awaitTermination (default 600, or
    $SPARK_GRAFT_STREAM_TIMEOUT): the wait must be bounded because a
    query that died mid-teardown has been observed to hang forever, but
    a production-sized availableNow backlog can legitimately need more
    than the fixture default — without the knob, slow-but-correct became
    stop + double-cost rerun + TimeoutError (ADVICE r11)."""
    from griddb_spark.perfstages import note, stage

    if timeout_sec is None:
        timeout_sec = float(
            os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", "600"))

    spark = result.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    # deployment override for every bounded streaming gate's state-
    # partition count (state stores = partitions x stateful operators):
    # the per-gate values below are measured for the bench fixture; a
    # cluster sizing state to its stream rate sets this instead of
    # editing call sites. Also the seam the r14 state-commit sweep
    # drives.
    ov = os.environ.get("SPARK_GRAFT_STATE_PARTITIONS")
    if ov:
        shuffle_partitions = int(ov)
    if shuffle_partitions is not None:
        spark.conf.set(key, str(shuffle_partitions))
    try:
        # One retry with a FRESH sink on a terminated-with-error or hung
        # query: local-mode Spark occasionally kills a memory-sink
        # microbatch with an internal race (observed once in ~10^3 gate
        # runs: NPE in SparkPlan.resetMetrics during the sink collect,
        # "session() is null"). availableNow over static files is
        # idempotent, and the fresh table name discards any partial rows
        # the failed attempt committed. A second failure propagates —
        # this absorbs a known transient, not real bugs.
        for attempt in range(2):
            name = table_name if attempt == 0 else f"{table_name}_r1"
            _MEMORY_SINKS.append(name)
            with stage("stream_start"):
                q = (
                    result.writeStream.format("memory")
                    .queryName(name)
                    .outputMode(mode)
                    .trigger(availableNow=True)
                    .start()
                )
            with stage("stream_await"):
                # bounded wait: a query that died mid-teardown has been
                # observed to hang awaitTermination() forever
                finished = q.awaitTermination(timeout_sec)
            err = None
            try:
                err = q.exception()
            except Exception:
                pass
            if finished and err is None:
                table_name = name
                break
            try:
                q.stop()
            except Exception:
                pass
            if attempt == 1:
                if err is not None:
                    raise err
                raise TimeoutError(
                    f"streaming query {name} did not terminate")
            note("@stream_retries", 1.0)
        # Per-stage attribution for memory-sink streaming gates (VERDICT
        # r10 item 5): the kernels run inside executors where driver-side
        # stage() can't see, but Structured Streaming already attributes
        # each microbatch (durationMs: addBatch = plan+run the batch incl.
        # the kernel; walCommit/commitOffsets = progress-log commits;
        # state commit times live in stateOperators). Fold those into the
        # collecting map as informational "@" overlays so a drifting gate's
        # swing is attributable to kernel vs commit machinery without
        # re-running probes. recentProgress retains the last ~100 batches
        # — all of them for a bounded availableNow run.
        try:
            for p in q.recentProgress or []:
                for dk, dv in (p.get("durationMs") or {}).items():
                    note(f"@{dk}", float(dv) / 1000.0)
                for op in p.get("stateOperators") or []:
                    note("@stateCommit",
                         float(op.get("commitTimeMs") or 0) / 1000.0)
                    note("@stateRemove",
                         float(op.get("allRemovalsTimeMs") or 0) / 1000.0)
        except Exception:
            pass  # metrics are best-effort; never fail the query for them
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(key, prev)
    return spark.table(table_name)


#: Probe-side tile budget for the fused per-cell verify GEMM — the ONE
#: shared constant (similarity._VERIFY_TILE_ELEMS; cosine_pairs_ann
#: tiles on the same budget). Bounds per-task memory regardless of cell
#: occupancy: adaptive bits lag one batch behind growth and pinned bits
#: never widen, and untiled either case materializes O(fan-in ×
#: occupancy) GB-scale frames (the 1000× salted probe OOM'd the host
#: through 32 concurrent kernels before tiling). Bound here as a module
#: name so tests can monkeypatch stream_ops._VERIFY_TILE_ELEMS to force
#: multi-tile paths on small data.
from griddb_spark.pipeline.similarity import (  # noqa: E402
    _VERIFY_TILE_ELEMS,
    _np_rows,
    _sign_code_py,
)

#: Adaptive-index compaction trigger: a stable-occupancy stream never
#: rebuckets, yet every append adds up to one small file per touched
#: cell — unbounded file counts over a long-lived stream, growing
#: listing/open cost even for partition-pruned known-schema probe reads.
#: The _meta.json appends-since-last-rewrite counter upper-bounds
#: files-per-cell growth (≤1 file per cell per append), so when it
#: reaches this bound the index is rewritten IN PLACE at the current
#: bits through the same side-directory + atomic-swap machinery as a
#: rebucket (one file per cell afterwards; crash windows identical).
#: Worst-case probe read therefore opens ≤ _COMPACT_APPENDS + 1 files
#: per probed cell. Amortized rewrite cost is corpus/_COMPACT_APPENDS
#: bytes per append — at 64, under 2% write amplification per batch.
#: Module-level so tests can shrink it to force compactions on short
#: streams.
_COMPACT_APPENDS = 64


def _empty_verify_res():
    """The verify kernel's empty result — one shared frame per process.

    Most (pcell, width) groups emit nothing, and constructing a fresh
    three-column empty DataFrame cost ~0.25 ms x ~250 empty groups per
    driver-local batch. Consumers only read it (the local path checks
    len(); the executor path Arrow-casts it), so a singleton is safe.
    """
    global _EMPTY_VERIFY_RES
    if _EMPTY_VERIFY_RES is None:
        import pandas as pd

        _EMPTY_VERIFY_RES = pd.DataFrame(
            {"__kind": pd.Series([], dtype="int32"), "__a": [], "__b": []})
    return _EMPTY_VERIFY_RES


_EMPTY_VERIFY_RES = None

#: Driver-local micro-batch dispatch bound for embed_dedup_stream (same
#: dispatch family as similarity._LOCAL_TRAIN_MAX_BYTES): when BOTH the
#: batch's planning-time size estimate and the partition-pruned probe
#: read's estimate fit under this, the whole per-batch dedup runs on the
#: driver — one Arrow collect + NumPy instead of 5-6 scheduled jobs over
#: kilobytes. Above it (crawl-scale batches, the salted probes) the
#: distributed path below is byte-identical in results.
_LOCAL_BATCH_MAX_BYTES = 32 * 1024 * 1024

#: Driver-memory bound on embed_dedup_stream's in-run index mirror (the
#: probe-read cache of the local batch path); past it, probe reads fall
#: back to the pruned disk scan — correctness never depends on the
#: mirror, only the per-batch read cost does.
_LOCAL_MIRROR_MAX_BYTES = 256 * 1024 * 1024


def _index_meta_read(index_path: str) -> "dict | None":
    """Read the adaptive index's ``_meta.json`` (sign_bits + row count),
    first completing or rolling back any migration a crash cut short:

    - ``<index>.__rebucket`` complete (its _meta.json was the LAST file
      written) but the directory swap unfinished → finish the swap;
    - swap never reached the commit point → restore ``<index>.__old``;
    - stale leftovers of either kind are removed.

    Underscore-prefixed files are invisible to Spark's parquet reader,
    so the meta file rides inside the index directory itself — which is
    what makes the migration swap atomic for BOTH layout and metadata
    (one directory rename moves them together)."""
    import json
    import shutil

    tmp, old = index_path + ".__rebucket", index_path + ".__old"
    if not os.path.isdir(index_path):
        if os.path.isdir(tmp) and os.path.isfile(
                os.path.join(tmp, "_meta.json")):
            os.rename(tmp, index_path)
        elif os.path.isdir(old):
            os.rename(old, index_path)
    for leftover in (old, tmp):
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    mp = os.path.join(index_path, "_meta.json")
    if os.path.isfile(mp):
        with open(mp) as fh:
            return json.load(fh)
    return None


def _index_meta_write(dirpath: str, meta: dict) -> None:
    import json

    mp = os.path.join(dirpath, "_meta.json")
    tmp = mp + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, mp)  # atomic on POSIX: readers see old or new, whole


def embed_dedup_stream(
    stream: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    sign_bits: "int | None" = 8,
    checkpoint_dir: "str | None" = None,
    target_occ: "int | None" = None,
    local: "bool | None" = None,
):
    """Streaming embedding dedup against a persistent ANN index — the
    ingest-time semantic dedup shape: only first-seen members of each
    near-dup cluster enter the corpus.

    Per micro-batch (foreachBatch — the cross-batch state is the INDEX
    itself, a parquet directory Hive-partitioned by sign-code cell):

    1. intra-batch dedup: ``cosine_pairs_ann`` within the batch →
       components → min-id canonical (two same-batch near-dups collapse);
    2. cross-batch probe: the survivors' own + Hamming-1 cells are read
       from the index — a PARTITION-PRUNED scan touching only the probed
       cell directories, never the whole index — and candidates verify
       with the vectorized exact cosine; anything matching an indexed
       vector is a duplicate of earlier data and is dropped;
    3. the remaining survivors append to their cell partitions.

    Probe cost per batch tracks the batch (cells touched × occupancy),
    not corpus size — the same posture as the MinHash ``lsh_index``
    incremental path, in embedding space. Assumes ordered arrival for
    first-seen-wins determinism.

    **Replay / crash semantics (at-least-once append, converging
    index)**: the foreachBatch body appends BEFORE the engine commits
    the batch to the checkpoint, so a crash in between replays the
    batch. Replayed survivors probe the index, match their own
    already-indexed copies (cos 1.0 ≥ any threshold ≤ 1), and drop — so
    the replayed append is empty and the index converges with no
    duplicate ids. A crash MID-append is the same story one level down:
    Spark's file commit protocol exposes only task-committed part files,
    so the replay re-appends exactly the survivors whose files never
    committed and drops the rest. Tested by deleting the last checkpoint
    commit and restarting (tests/test_streaming.py).

    **Adaptive sign_bits** (``sign_bits=None``): distinct-vector
    occupancy is the residual scale knob — 2^bits cells must track
    corpus growth or the per-cell GEMM grows linearly with occupancy.
    Adaptive mode derives bits from the INDEXED row count
    (``auto_sign_bits``: expected occupancy ≤ ``target_occ``, ceiling =
    embedding width) and persists (bits, rows) in ``<index>/_meta.json``.
    When growth crosses the bound, the index is REBUCKETED — one linear
    read → recompute cell at the wider code → write to a side directory
    → atomic directory swap (crash-recovered by :func:`_index_meta_read`)
    — so widening by one bit doubles capacity and total migration bytes
    over a corpus's life stay ≤ 2× its size. An explicit ``sign_bits``
    int pins the layout (no meta, no migration, no compaction) — the
    pre-existing contract, kept for oracle-replayable gates. Adaptive
    mode refuses a pre-existing index without meta (its layout bits are
    unknowable).

    **Compaction** (adaptive mode): a stable-occupancy stream never
    rebuckets, so cell directories would accrete one small file per
    touched cell per batch forever. The meta's appends-since-rewrite
    counter (an O(1) upper bound on files-per-cell growth — no listing)
    triggers an in-place rewrite at unchanged bits through the same
    atomic-swap path once it reaches ``_COMPACT_APPENDS``, capping
    files-per-cell and keeping long-lived streams' probe reads flat.

    Returns the started StreamingQuery; the deduped corpus IS the index
    (``spark.read.parquet(index_path)``).
    """
    from griddb_spark.pipeline.dedup import union_find_min
    from griddb_spark.pipeline.similarity import (
        _plan_size_bytes,
        auto_sign_bits,
        self_pairable,
        sign_code,
    )

    adaptive = sign_bits is None
    # captured by value at closure-creation time (worker processes
    # re-import the module, so a runtime module-attr read would ignore
    # a test's monkeypatch)
    tile_elems = _VERIFY_TILE_ELEMS

    # In-run driver mirror of the index for the LOCAL batch path. Within
    # one streaming query every appended row passed through the driver,
    # so when the stream STARTED with a fresh index the mirror is a
    # complete copy of the on-disk state and the per-batch pruned probe
    # read (the dominant local-path cost: Spark job + partition
    # discovery over hundreds of tiny cell files) can be skipped
    # entirely. Disk remains the source of truth: the mirror is rebuilt
    # from it on process restart (fresh closure), dropped whenever a
    # batch takes the distributed path or a rebucket/compaction rewrites
    # the layout, and bounded by _LOCAL_MIRROR_MAX_BYTES (past that,
    # probe reads fall back to disk — correctness never depends on the
    # mirror, only the read goes away). Crash-replay converges exactly
    # as with disk state: a replayed survivor matches its own mirrored
    # copy and drops. Assumes the documented single-writer stream.
    mirror: dict = {"on": None, "cells": {}, "bytes": 0}

    def _batch(bdf: DataFrame, _bid: int) -> None:
        from griddb_spark.perfstages import stage

        spark = bdf.sparkSession
        meta: dict = {}
        if adaptive:
            meta = _index_meta_read(index_path) or {}
            bits = int(meta.get("sign_bits", 0))
            if not bits and os.path.isdir(index_path) and any(
                    e.startswith("__cell=")
                    for e in os.listdir(index_path)):
                raise ValueError(
                    "adaptive sign_bits needs <index>/_meta.json; "
                    f"{index_path} holds cell partitions without one "
                    "(created with an explicit sign_bits?) — pass "
                    "that same explicit value instead"
                )
        else:
            bits = sign_bits
        occ_kw = ({"target_occ": target_occ}
                  if target_occ is not None else {})

        def _first_bits(n_rows: int, dim0: int) -> int:
            # FIRST batch of a fresh index: derive bits from the
            # batch's own row count, not 0 — a large initial load
            # (bulk backfill through the stream) otherwise processes
            # at the floor width and pays occupancy² until the
            # post-batch rebucket reacts (1000x salted probe: 667k
            # rows/batch at 8 bits OOM'd the pre-tiling kernel).
            # Later batches stay pinned to the index's layout bits
            # (probe reads partition by the INDEX's cell code); the
            # post-append rebucket catches growth with ≤1-batch lag,
            # which the tiled verify kernel bounds in memory.
            derived = auto_sign_bits(n_rows, dim0, **occ_kw)
            # persist the derived layout BEFORE any index data
            # exists: a crash between this batch's append and the
            # post-append meta update would otherwise leave cell
            # partitions with no _meta.json, and every replay would
            # die on the unknowable-layout ValueError above. With
            # the meta written first, a replay re-reads these bits
            # and converges (worst case: rows undercounts by this
            # one batch — the documented replay bound).
            os.makedirs(index_path, exist_ok=True)
            _index_meta_write(index_path,
                              {"sign_bits": derived, "rows": 0})
            return derived
        id_t = bdf.schema[id_col].dataType.simpleString()

        def _verify_cols(pcell, side_np, vec_np, vid_np, ocell_np):
            """THE verify kernel body, columnar: one (pcell, width)
            group's rows as parallel numpy arrays in. Returns
            (kind, a, b) int32/ids arrays, or None when nothing emits.
            Shared verbatim by the executor path (via the verify_cell
            pandas adapter below) and the driver-local path (which
            groups with a stable lexsort and calls this directly —
            per-group pandas frame construction was the local verify's
            dominant cost at ~1.8 ms x 256 groups/batch)."""
            import numpy as np

            out_k: list = []
            out_a: list = []
            out_b: list = []
            pr_idx = np.flatnonzero(side_np == 0)
            if len(pr_idx):
                ma = np.stack(vec_np[pr_idx])
                na = np.linalg.norm(ma, axis=1)
                av = vid_np[pr_idx]

                def r6_sim(rows, rows_n, cols_m, cols_n):
                    den = np.outer(rows_n, cols_n)
                    den[den == 0.0] = 1.0
                    sim = (rows @ cols_m.T) / den
                    # half-away-from-zero like F.round (np.round is
                    # half-to-even; see similarity.round_half_away)
                    return np.sign(sim) * np.floor(
                        np.abs(sim) * 1e6 + 0.5) / 1e6

                def tiles(n_cols):
                    # tile the probe side so the similarity matrix (and
                    # its den/abs temporaries) stays ≤ _VERIFY_TILE_ELEMS
                    # doubles per tile — per-task memory bounded
                    # REGARDLESS of cell occupancy, like
                    # cosine_pairs_within's block loop (see the constant
                    # for the 1000× OOM this prevents).
                    step = max(1, tile_elems // max(1, n_cols))
                    for s in range(0, len(ma), step):
                        yield s, min(s + step, len(ma))

                own_idx = pr_idx[ocell_np[pr_idx] == pcell]
                if len(own_idx):  # intra-batch pairs vs this cell's members
                    mb = np.stack(vec_np[own_idx])
                    nb = np.linalg.norm(mb, axis=1)
                    bv = vid_np[own_idx]
                    for s, e in tiles(len(mb)):
                        r6 = r6_sim(ma[s:e], na[s:e], mb, nb)
                        # wholesale array emission (no per-hit Python
                        # loop): NULL ids never pair; no self-pairs
                        ii, jj = np.nonzero(r6 >= threshold)
                        if not len(ii):
                            continue
                        xs, ys = av[s + ii], bv[jj]
                        if xs.dtype.kind == "O" or ys.dtype.kind == "O":
                            ok = np.fromiter(
                                (x is not None and y is not None
                                 and x != y for x, y in zip(xs, ys)),
                                dtype=bool, count=len(xs))
                        else:
                            ok = xs != ys
                        if not ok.all():
                            xs, ys = xs[ok], ys[ok]
                        if not len(xs):
                            continue
                        sw = ys < xs
                        out_k.append(np.zeros(len(xs), dtype=np.int32))
                        out_a.append(np.where(sw, ys, xs))
                        out_b.append(np.where(sw, xs, ys))
                ix_idx = np.flatnonzero(side_np == 1)
                if len(ix_idx):  # duplicates of already-indexed vectors
                    mb = np.stack(vec_np[ix_idx])
                    nb = np.linalg.norm(mb, axis=1)
                    for s, e in tiles(len(mb)):
                        r6 = r6_sim(ma[s:e], na[s:e], mb, nb)
                        hit = np.flatnonzero((r6 >= threshold).any(axis=1))
                        if not len(hit):
                            continue
                        xs = av[s + hit]
                        if xs.dtype.kind == "O":
                            # NULL-id rows always survive
                            xs = xs[np.fromiter(
                                (x is not None for x in xs),
                                dtype=bool, count=len(xs))]
                        if not len(xs):
                            continue
                        out_k.append(np.ones(len(xs), dtype=np.int32))
                        out_a.append(xs)
                        out_b.append(xs)
            if out_k:
                return (np.concatenate(out_k), np.concatenate(out_a),
                        np.concatenate(out_b))
            return None

        def verify_cell(key, pdf):
            """applyInPandas adapter over _verify_cols — the executor
            path's entry point (the local path calls the body direct)."""
            import pandas as pd

            cols = _verify_cols(
                key[0], pdf["__side"].to_numpy(), pdf["__vec"].to_numpy(),
                pdf["__vid"].to_numpy(), pdf["__ocell"].to_numpy())
            if cols is None:
                return _empty_verify_res()
            k, a, b = cols
            return pd.DataFrame({
                "__kind": pd.Series(k, dtype="int32"), "__a": a, "__b": b,
            })

        def _post_append(cur_bits, keep_rows, dim, id_v_schema) -> bool:
            """Adaptive meta/occupancy tail shared by both batch paths;
            returns True when it rewrote the index layout (rebucket or
            compaction) so the caller can invalidate mirrored state."""
            if not adaptive:
                return False
            # adaptive occupancy control: when the indexed row count
            # outgrows target_occ per cell, REBUCKET the index at the
            # derived wider code. The new layout + its _meta.json land in
            # a side directory first, so the directory swap commits
            # layout and metadata together (crash windows roll
            # forward/back in _index_meta_read). A crash between the
            # append and the meta write below only UNDERCOUNTS rows by
            # one batch (replayed survivors drop against their indexed
            # copies, contributing keep_rows=0) — occupancy drift bounded
            # by one batch, never a layout inconsistency.
            #
            # The SAME rewrite also runs as COMPACTION at unchanged bits:
            # a stable-occupancy stream never rebuckets yet accretes one
            # file per touched cell per append forever, growing
            # listing/open cost without bound. The appends-since-last-
            # rewrite counter in _meta.json upper-bounds files-per-cell
            # growth (each append adds at most one file per cell), so
            # triggering at _COMPACT_APPENDS caps files-per-cell at
            # ~(appends bound + 1) with an O(1) decision — no directory
            # listing, which on object stores is the very cost being
            # bounded.
            import shutil

            total = int(meta.get("rows", 0)) + keep_rows
            appends = int(meta.get("appends", 0)) + 1
            needed = auto_sign_bits(total, dim, **occ_kw)
            # Rewrite width is clamped to never SHRINK the layout: auto_
            # sign_bits derives from the CURRENT batch's observed dim, so
            # a batch of narrower (or all-NULL) embeddings would
            # otherwise make a compaction-only trigger rewrite the whole
            # index at fewer bits — then the next normal batch re-widens
            # it, a full-index rewrite thrash with no occupancy benefit.
            # Compaction is documented as "in place at the current bits";
            # only a genuine occupancy overflow (needed > bits) widens.
            new_bits = max(cur_bits, needed)
            if needed > cur_bits or appends >= _COMPACT_APPENDS:
                with stage("index_rewrite"):
                    tmp = index_path + ".__rebucket"
                    old = index_path + ".__old"
                    if os.path.isdir(tmp):
                        shutil.rmtree(tmp)
                    idx_schema = id_v_schema.add("__cell", "integer")
                    n_mig = max(1, min(
                        spark.sparkContext.defaultParallelism,
                        (1 << min(new_bits, 30)) // 64 + total // 100_000,
                    ))
                    (spark.read.schema(idx_schema).parquet(index_path)
                     .select(id_col, "__v",
                             sign_code(F.col("__v"),
                                       new_bits).alias("__cell"))
                     .repartition(n_mig, F.col("__cell"))
                     .write.mode("overwrite").partitionBy("__cell")
                     .parquet(tmp))
                    _index_meta_write(tmp, {"sign_bits": new_bits,
                                            "rows": total, "appends": 0})
                    os.rename(index_path, old)
                    os.rename(tmp, index_path)
                    shutil.rmtree(old)
                return True
            _index_meta_write(index_path,
                              {"sign_bits": cur_bits, "rows": total,
                               "appends": appends})
            return False

        def _try_local() -> bool:
            """Driver-local twin of the distributed batch body below,
            dispatched when both the batch's planning-time size estimate
            and the partition-pruned probe read's estimate are provably
            driver-sized (same stats-dispatch family as the local
            quantizer trainers). One Arrow collect + NumPy replaces 5-6
            scheduled jobs (checkpoint, sizing count, shuffled verify,
            dynamic-partition append) over kilobytes of data. Semantics
            are pinned bit-for-bit against the distributed path in
            tests/test_streaming.py::test_embed_dedup_local_parity:
            Spark's NaN ordering in sign_code (NaN >= 0 is TRUE there,
            False in NumPy), -0.0 → 0.0 normalization in the exact-
            collapse group key (NormalizeFloatingNumbers), NULL array
            elements surfacing as NaN in kernel math but staying NULL in
            storage, and the literal verify_cell kernel shared with the
            executor path. Appended files appear via hidden-name write +
            rename, so a mid-append crash never exposes a partial file —
            the same reader contract as Spark's task commit."""
            import math
            import uuid as _uuid

            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq

            from pyspark.sql import types as T

            has_index = os.path.isdir(index_path) and any(
                e.startswith("__cell=") for e in os.listdir(index_path)
            )
            with stage("batch_prep"):
                tbl = bdf.select(
                    id_col,
                    F.col(vec_col).cast("array<double>").alias("__v"),
                ).toArrow()
            if not tbl.num_rows:  # empty batch: nothing to do, no side
                return True       # effects (mirrors the isEmpty early-out)
            ids = tbl.column(0).to_pylist()
            vraw = tbl.column(1).to_pylist()  # storage: NULL elems stay NULL
            nvecs = _np_rows(tbl.column(1))   # math: NULL elems → NaN
            id_at = tbl.schema.field(0).type
            # F.size(NULL) is -1 under the (default-off-ANSI) legacy
            # conf, NULL otherwise — mirrored so the all-NULL-batch dim
            # fallback matches the distributed aggregates exactly
            legacy_size = str(spark.conf.get(
                "spark.sql.legacy.sizeOfNull", "true")).lower() == "true"
            sizes0 = [len(v) for v in vraw if v is not None]
            lbits = bits or _first_bits(
                len(ids),
                max(sizes0) if sizes0 else (-1 if legacy_size else 8))

            def _code(i):
                # sign_code's exact NULL/NaN semantics, shared helper
                return _sign_code_py(vraw[i], lbits)

            thr = float(threshold)

            def _foldable(i):
                if ids[i] is None:
                    return False
                v = vraw[i]
                if v is None or any(x is None for x in v):
                    return False  # NULL vec/element → coalesce(False)
                a = nvecs[i]
                if len(a) and np.isnan(a).any():
                    return False
                # sequential left fold like F.aggregate (cumsum is
                # order-preserving; np.sum's pairwise reordering could
                # flip the inf-overflow edge)
                sq = float(np.cumsum(a * a)[-1]) if len(a) else 0.0
                self_sim = 1.0 if (0.0 < sq < math.inf) else 0.0
                return self_sim >= thr

            codes = [_code(i) for i in range(len(ids))]
            b_rows: list = []  # (id, store_vec, cell, math_vec)
            groups: dict = {}
            for i in range(len(ids)):
                if _foldable(i):
                    a = nvecs[i]
                    # Spark group keys normalize -0.0 → 0.0
                    # (NormalizeFloatingNumbers); the stored
                    # representative IS the normalized key
                    norm = np.where(a == 0.0, 0.0, a)
                    k = norm.tobytes()
                    g = groups.get(k)
                    if g is None:
                        groups[k] = [ids[i], norm, codes[i]]
                    elif ids[i] < g[0]:
                        g[0] = ids[i]
                else:
                    b_rows.append((ids[i], vraw[i], codes[i], nvecs[i]))
            for g in groups.values():
                b_rows.append((g[0], g[1].tolist(), g[2], g[1]))

            cells = {r[2] for r in b_rows}
            batch_rows = len(b_rows)
            sizes = [len(r[1]) for r in b_rows if r[1] is not None]
            dim = max(sizes) if sizes else (-1 if legacy_size else lbits)

            probe_rows: list = []  # (side, vid, math_vec, ocell, pcell)
            for vid, _sv, c, mv in b_rows:
                if c is None:
                    continue
                probe_rows.append((0, vid, mv, c, c))
                for j in range(lbits):
                    probe_rows.append((0, vid, mv, c, c ^ (1 << j)))

            id_v_schema = T.StructType([
                bdf.schema[id_col],
                T.StructField("__v", T.ArrayType(T.DoubleType()), True),
            ])
            if mirror["on"] is None:
                # first local batch decides: a pre-existing index has
                # rows the driver never saw — mirroring would need a
                # full read, so leave probe reads on disk
                mirror["on"] = not has_index
            if has_index:
                probe_cells = sorted(
                    {c ^ (1 << j) for c in cells if c is not None
                     for j in range(lbits)}
                    | {c for c in cells if c is not None}
                )
                if mirror["on"]:
                    mcells = mirror["cells"]
                    for c in probe_cells:
                        for vid, _sv, mv in mcells.get(c, ()):
                            probe_rows.append((1, vid, mv, c, c))
                else:
                    idx_read = (
                        spark.read
                        .schema(id_v_schema.add("__cell", "integer"))
                        .parquet(index_path)
                        .filter(F.col("__cell").isin(probe_cells))
                    )
                    # the pruned read must be driver-sized too; footers
                    # of only the selected cell dirs back this estimate
                    if local is not True and not (
                            0 < _plan_size_bytes(idx_read)
                            <= _LOCAL_BATCH_MAX_BYTES):
                        return False
                    with stage("batch_prep"):
                        itbl = idx_read.select(
                            id_col, "__v", "__cell").toArrow()
                    iids = itbl.column(0).to_pylist()
                    imvs = _np_rows(itbl.column(1))
                    icells = itbl.column(2).to_pylist()
                    for t in range(len(iids)):
                        probe_rows.append(
                            (1, iids[t], imvs[t], icells[t], icells[t]))

            pairs: set = set()
            drop: set = set()
            if probe_rows:
                import time as _t

                import pandas as pd

                from griddb_spark.perfstages import note

                with stage("verify"):
                    _t0 = _t.perf_counter()
                    n_pr = len(probe_rows)
                    side_np = np.fromiter(
                        (r[0] for r in probe_rows), np.int32, n_pr)
                    # the id column keeps the EXECUTOR path's exact dtype
                    # semantics by round-tripping through Arrow→pandas
                    # (numeric ids in a batch with a NULL id become
                    # float64/NaN there); the math vectors are used
                    # as-is — _np_rows already produced the float64
                    # arrays an Arrow list<double> round trip would
                    pa_vids = pa.array(
                        [r[1] for r in probe_rows], type=id_at)
                    vid_np = pa.table({"v": pa_vids}).to_pandas()[
                        "v"].to_numpy()
                    vec_np = np.empty(n_pr, dtype=object)
                    for i in range(n_pr):
                        vec_np[i] = probe_rows[i][2]
                    ocell_np = np.fromiter(
                        (r[3] for r in probe_rows), np.int64, n_pr)
                    pcell_np = np.fromiter(
                        (r[4] for r in probe_rows), np.int64, n_pr)
                    wid_np = np.fromiter(
                        (len(r[2]) for r in probe_rows), np.int64, n_pr)
                    _t1 = _t.perf_counter()
                    note("@verify_table", _t1 - _t0)
                    # stable lexsort = exactly the (pcell, width) group
                    # partition pandas groupby produced, original row
                    # order preserved within each group — minus the
                    # per-group sub-frame construction cost
                    order = np.lexsort((wid_np, pcell_np))
                    ps, ws = pcell_np[order], wid_np[order]
                    bounds = np.flatnonzero(np.r_[
                        True, (ps[1:] != ps[:-1]) | (ws[1:] != ws[:-1])])
                    bounds = np.append(bounds, n_pr)
                    _ng = len(bounds) - 1
                    for gi in range(_ng):
                        idx = order[bounds[gi]:bounds[gi + 1]]
                        cols = _verify_cols(
                            ps[bounds[gi]], side_np[idx], vec_np[idx],
                            vid_np[idx], ocell_np[idx])
                        if cols is None:
                            continue
                        kk, aa, bb = cols
                        # round-trip the emitted ids through the same
                        # pandas→Arrow cast the executor's output schema
                        # applies (__a/__b are id-typed there): numeric
                        # ids came through the bridge as float64, and
                        # without the cast a NULL id's NaN would enter
                        # union-find as NaN — whose x != x makes find()
                        # spin forever (the executor path gets None back
                        # from the cast instead)
                        sa, sb = pd.Series(aa), pd.Series(bb)
                        ka = pa.Array.from_pandas(
                            sa, mask=sa.isnull(), type=id_at).to_pylist()
                        kb = pa.Array.from_pandas(
                            sb, mask=sb.isnull(), type=id_at).to_pylist()
                        for k_, a_, b_ in zip(kk, ka, kb):
                            if k_ == 0:
                                pairs.add((a_, b_))
                            else:
                                drop.add(a_)
                    note("@verify_groups", _t.perf_counter() - _t1)
                    note("@verify_ngroups", float(_ng))
                    note("@verify_nrows", float(n_pr))
            if pairs:
                comp = union_find_min(pairs)
                drop |= {x for x, c in comp.items() if c < x}
            keep = [r for r in b_rows
                    if r[0] is None or r[0] not in drop]
            with stage("append"):
                bycell: dict = {}
                for vid, sv, c, _mv in keep:
                    slot = bycell.setdefault(c, ([], []))
                    slot[0].append(vid)
                    slot[1].append(sv)
                os.makedirs(index_path, exist_ok=True)
                for c, (cvids, cvecs) in bycell.items():
                    leaf = ("__cell=__HIVE_DEFAULT_PARTITION__"
                            if c is None else f"__cell={int(c)}")
                    d = os.path.join(index_path, leaf)
                    os.makedirs(d, exist_ok=True)
                    t_out = pa.table({
                        id_col: pa.array(cvids, type=id_at),
                        "__v": pa.array(cvecs,
                                        type=pa.list_(pa.float64())),
                    })
                    fname = f"part-{_uuid.uuid4().hex}.parquet"
                    tmp_f = os.path.join(d, f".{fname}.inprogress")
                    pq.write_table(t_out, tmp_f)
                    os.rename(tmp_f, os.path.join(d, fname))
            if mirror["on"]:
                for vid, sv, c, mv in keep:
                    mirror["cells"].setdefault(c, []).append(
                        (vid, sv, mv))
                    mirror["bytes"] += 8 * (len(sv) if sv else 0) + 64
                if mirror["bytes"] > _LOCAL_MIRROR_MAX_BYTES:
                    mirror.update(on=False, cells={}, bytes=0)
            if _post_append(lbits, max(0, batch_rows - len(drop)), dim,
                            id_v_schema):
                # rebucket/compaction rewrote the layout on disk —
                # the mirror's cell keys are stale
                mirror.update(on=False, cells={}, bytes=0)
            return True

        if local is not False and (local is True or (
                0 < _plan_size_bytes(bdf) <= _LOCAL_BATCH_MAX_BYTES)):
            if _try_local():
                return
        # the distributed path appends without driver visibility — any
        # mirrored state is no longer a complete copy
        mirror.update(on=False, cells={}, bytes=0)

        if bdf.isEmpty():
            return
        if adaptive and not bits:
            row = bdf.select(
                F.count(F.lit(1)).alias("__n"),
                F.max(F.size(F.col(vec_col))).alias("__d"),
            ).first()
            bits = _first_bits(
                int(row["__n"]),
                int(row["__d"]) if row["__d"] is not None else 8)
        b0 = bdf.select(
            id_col, F.col(vec_col).cast("array<double>").alias("__v")
        ).withColumn("__cell", sign_code(F.col("__v"), bits))
        # EXACT pre-collapse: bitwise-identical vectors fold to their
        # min-id member before any ANN work (one map-side-combinable
        # groupBy on the vector itself — no hash-collision risk). Losers
        # can never be the canonical keeper (the winner has the smaller
        # id) and their edges duplicate the winner's (identical vectors
        # have identical similarities), so dropping them is semantics-
        # preserving. This bounds the per-cell GEMM by DISTINCT-vector
        # occupancy: verbatim duplicates — the dominant kind in raw
        # crawl ingest — never reach the quadratic stage. (sign_bits
        # bounds distinct-vector occupancy; it cannot split identical
        # vectors, so this pre-stage is the scale knob for duplication
        # density, exactly the LSH path's exact-collapse pre-stage.)
        # Folding is gated on self_pairable: zero-norm vectors (cos 0 by
        # the verify kernel's den==0 convention — below any positive
        # threshold even for an identical copy) and NaN-containing
        # vectors (sim NaN, never >= threshold) pass through, so intra-
        # batch and cross-batch behavior agree for them. NULL-id rows
        # pass through untouched (they never pair).
        # coalesce(False): a NULL embedding makes self_pairable NULL, and
        # a three-valued filter split (filter(p) ∪ filter(~p)) silently
        # DROPS NULL-predicate rows from both branches — a corrupt-
        # embedding row in a crawl stream must survive (it can never
        # pair), not vanish from the corpus
        foldable = F.coalesce(
            F.col(id_col).isNotNull() & self_pairable(
                F.col("__v"), threshold),
            F.lit(False),
        )
        with stage("batch_prep"):
            b = (
                b0.filter(foldable)
                .groupBy("__v", "__cell")
                .agg(F.min(id_col).alias(id_col))
                .select(id_col, "__v", "__cell")
                .unionByName(b0.filter(~foldable))
                .localCheckpoint(eager=True)
            )
            # one tiny job serves the probe-cell set, the batch size, the
            # append task sizing, and (adaptive mode) the embedding width
            cell_counts = b.groupBy("__cell").agg(
                F.count(F.lit(1)).alias("count"),
                F.max(F.size("__v")).alias("dim"),
            ).collect()
        cells = {r["__cell"] for r in cell_counts}
        batch_rows = sum(r["count"] for r in cell_counts)
        dim = max((r["dim"] for r in cell_counts
                   if r["dim"] is not None), default=bits)
        has_index = os.path.isdir(index_path) and any(
            e.startswith("__cell=") for e in os.listdir(index_path)
        )
        # ONE fused per-cell GEMM finds BOTH the intra-batch near-dup
        # pairs and the duplicates of already-indexed data: batch vectors
        # probe their own + Hamming-1 cells; each probed-cell group holds
        # the batch members OF that cell (intra pair targets) and — when
        # the index exists — the indexed rows of that cell, read
        # PARTITION-PRUNED. The r7 form ran these as two separate job
        # chains (cosine_pairs_ann + a verify pass over survivors); the
        # fused kernel halves the per-micro-batch job count. Each vector
        # ships through Arrow once per probed cell (never per candidate
        # pair); per-cell group size is bounded by sign-space occupancy —
        # the cell-bounded-quadratic contract of cosine_pairs_within;
        # widen sign_bits as the corpus grows. Dropping intra losers and
        # index dups from the FULL batch equals dedup-then-probe: the
        # removed sets union identically (an intra loser matching the
        # index dies either way).
        # Unpairable rows (NULL embedding, or shorter than the code
        # width — ragged crawl data yields a NULL sign code) never
        # probe: they can't pair, and a NULL-key group would crash the
        # kernel's np.stack. They stay in `b`, so they append to the
        # index (= the deduped corpus) as permanent survivors; their
        # NULL cell lands in the Hive default partition, which no probe
        # read ever selects.
        probes = b.filter(F.col("__cell").isNotNull()).select(
            F.lit(0).alias("__side"),
            F.col(id_col).alias("__vid"),
            F.col("__v").alias("__vec"),
            F.col("__cell").alias("__ocell"),
            F.explode(
                F.array(
                    F.col("__cell"),
                    *[
                        F.col("__cell").bitwiseXOR(F.lit(1 << j))
                        for j in range(bits)
                    ],
                )
            ).alias("__pcell"),
        )
        both = probes
        if has_index:
            probe_cells = sorted(
                {c ^ (1 << j) for c in cells if c is not None
                 for j in range(bits)}
                | {c for c in cells if c is not None}
            )
            # the index accretes one small file per touched cell per
            # batch. Two scan-cost guards: (a) pass the KNOWN schema —
            # schema inference otherwise runs a footer-reading job over
            # EVERY index file, growing with batch count (measured 240+
            # tasks per micro-batch, the bulk of addBatch); (b) coalesce
            # bounds scan tasks at the core count without a shuffle.
            # Partition pruning still applies at planning.
            idx_schema = (
                b.select(id_col, "__v").schema
                .add("__cell", "integer")
            )
            both = probes.unionByName(
                spark.read.schema(idx_schema).parquet(index_path)
                .filter(F.col("__cell").isin(probe_cells))
                .coalesce(spark.sparkContext.defaultParallelism)
                .select(
                    F.lit(1).alias("__side"),
                    F.col(id_col).alias("__vid"),
                    F.col("__v").alias("__vec"),
                    F.col("__cell").alias("__ocell"),
                    F.col("__cell").alias("__pcell"),
                )
            )
        with stage("verify"):
            # width in the group key: vectors pair only at equal width,
            # so the kernel's np.stack is always uniform — ragged crawl
            # embeddings wider than the code width would otherwise crash
            # it (same guard as cosine_pairs_ann; free on uniform data)
            found = both.groupBy("__pcell", F.size("__vec")).applyInPandas(
                verify_cell, f"__kind int, __a {id_t}, __b {id_t}"
            ).collect()
        # pairs/dups are bounded by the batch by construction, so the
        # components + loser set resolve driver-side in the same job
        # (union-find over the collected pairs) — the distributed
        # connected_components loop spent 4-5 small jobs per micro-batch
        # on edge sets of a few thousand rows (pure job-latency)
        pairs = {(r["__a"], r["__b"]) for r in found if r["__kind"] == 0}
        drop = {r["__a"] for r in found if r["__kind"] == 1}
        if pairs:
            comp = union_find_min(pairs)
            drop |= {x for x, c in comp.items() if c < x}
        if not drop:
            keep = b  # steady-state common case: nothing to remove
        elif len(drop) <= 10_000:
            # literal NOT IN — no join, no extra job. NULL-id rows must
            # survive like the anti-join branch keeps them (NOT IN alone
            # is NULL for a NULL id → silently dropped)
            keep = b.filter(
                ~F.col(id_col).isin(sorted(drop)) | F.col(id_col).isNull()
            )
        else:
            keep = b.join(
                F.broadcast(spark.createDataFrame(
                    [(x,) for x in drop], b.select(id_col).schema)),
                id_col, "left_anti",
            )
        # cluster by cell before the partitioned append: one file per
        # touched cell per batch, not tasks × cells small files (the same
        # leaf-clustering rule as DmlTable._write). Task count is sized to
        # the work — cell-directory count plus row volume — not the global
        # shuffle default: a 32-task dynamic-partition append of a small
        # batch spends its time in per-task committer setup (measured
        # 4.5 s → 1.2 s at 1.3k rows × 256 cells), while huge batches
        # still fan out to the full parallelism.
        keep_rows = max(0, batch_rows - len(drop))
        n_tasks = max(1, min(
            spark.sparkContext.defaultParallelism,
            (1 << bits) // 64 + keep_rows // 100_000,
        ))
        with stage("append"):
            keep.select(id_col, "__v", "__cell").repartition(
                n_tasks, F.col("__cell")
            ).write.mode("append").partitionBy("__cell").parquet(index_path)
        _post_append(bits, keep_rows, dim, b.select(id_col, "__v").schema)

    writer = stream.writeStream.foreachBatch(_batch).trigger(availableNow=True)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def hll_sketch_stream(
    stream: DataFrame,
    key: str,
    id_col: str,
    every: int,
    unit: str,
    p: int = 8,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming windowed HyperLogLog registers: per event-time window,
    the per-register max leading-zero rank (pipeline/sketches.py HLL
    contract) as ONE streaming aggregation.

    Emits the MERGEABLE SKETCH itself — ``(window_start, idx, mj)``, at
    most ``2^p`` rows per open window no matter how many distinct keys
    flow through (the fixed-budget streaming distinct state
    ``distinct_sketch_stream``'s hit-set can't guarantee once n >> m) —
    and, like ``freq_sketch_stream``, leaves the estimator read to the
    batch side (``hll_estimate_from_registers``): registers from
    streams, shards, and batch runs merge by register-wise max before
    ONE estimate. ``max`` partials combine map-side, so the state-store
    update per micro-batch is bounded by registers touched, not rows.
    """
    from griddb_spark.pipeline.sketches import hll_register_cols

    unit_ms = UNIT_MS[unit.upper()]
    win = F.window(F.col(key), f"{every * unit_ms} milliseconds")
    idx, rho = hll_register_cols(F.col(id_col), p)
    return (
        stream.withWatermark(key, watermark)
        .select(F.col(key), idx.alias("idx"), rho.alias("rho"))
        .groupBy(win.alias("__w"), "idx")
        .agg(F.max("rho").alias("mj"))
        .select(F.col("__w.start").alias(key), "idx", "mj")
    )

"""Automatic time-series aggregation — the continuous-aggregate rollup.

GridDB 5.6 ships "Automatic Time-Series Data Aggregation"
(``docs/GridDB-5.6-CE-RELEASE_NOTES.md:64-69``): a scheduled job that
aggregates a time-series container into an aggregation container,
processing only data that arrived since the last run. This module is the
Spark-native face of that pattern (the hypertable continuous-aggregate /
materialized-rollup shape):

- the target is a ``DmlTable`` holding one row per (series keys, bucket);
- each ``refresh`` reads the target's HIGH-WATER MARK (max stored
  bucket), re-aggregates only source rows in buckets ``>= hwm`` — the
  boundary bucket is recomputed wholesale because an append-only source
  may have grown it since the last run — and swaps those buckets in via
  the partition-scoped DELETE + append;
- buckets ``< hwm`` are never read again: with a range-partitioned source
  the bucket predicate prunes at the scan, so the cost of a refresh
  tracks NEW data, not table size. At 100 TB that is the difference
  between an incremental rollup and a nightly full rescan.

The refresh is idempotent for append-only sources: running it twice, or
after any prefix/suffix split of the ingest, converges to exactly the
one-shot aggregation of the full source (pinned by the oracle gate).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from griddb_spark.dml import DmlTable
from griddb_spark.operators.timeseries import UNIT_MS

BUCKET_COL = "bucket_ms"


def _bucket(ts_col: str, every_ms: int) -> Column:
    t = F.unix_millis(F.col(ts_col))
    return (F.floor(t / every_ms).cast("long") * every_ms).alias(BUCKET_COL)


def refresh_continuous_aggregate(
    source: DataFrame,
    target: DmlTable,
    ts_col: str,
    every: int,
    unit: str,
    aggs: Mapping[str, Column],
    by: Sequence[str] = (),
) -> DmlTable:
    """One incremental refresh of the rollup ``target`` from ``source``.

    ``aggs`` maps output column names to aggregate Columns (as in
    ``group_by_range``); ``by`` adds series-key columns. Only buckets at
    or above the stored high-water mark are recomputed; everything older
    is untouched (and, with a range-partitioned source, unread).
    """
    import os

    every_ms = every * UNIT_MS[unit.upper()]
    bucketed = source.select(
        _bucket(ts_col, every_ms), *by,
        *[c for c in source.columns if c != ts_col and c not in by],
    )

    exists = os.path.isdir(target.path) and any(
        not e.startswith(("_", ".")) for e in os.listdir(target.path)
    )
    hwm = None
    if exists:
        hwm = target.read().agg(F.max(BUCKET_COL)).collect()[0][0]
    if hwm is not None:
        bucketed = bucketed.filter(F.col(BUCKET_COL) >= hwm)

    fresh = bucketed.groupBy(BUCKET_COL, *by).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    if hwm is None:
        if exists:
            raise ValueError("target exists but holds no bucket column data")
        target.create(fresh)
        return target
    # recompute the boundary bucket wholesale: the source may have grown
    # it since the last refresh. One replace_where rewrite: with a
    # partitioned target it stays leaf-scoped (DmlTable delegates to the
    # delete+insert pair there — only the leaves holding bucket >= hwm
    # rewrite); an unpartitioned rollup target is small by construction
    # and swaps complement ∪ fresh in a single staged write.
    target.replace_where(F.col(BUCKET_COL) >= hwm, fresh)
    return target


#: mergeable aggregate kinds: how to compute a partial from raw rows, and
#: how to merge two partials. avg/stddev are DERIVED on read from these
#: (sum/count) — exactly why continuous aggregates store partial states.
_PARTIAL_FN = {
    # ('count', None) = row count; ('count', col) = non-null count of col —
    # silently counting all rows for a named column would overstate counts
    # on nullable columns
    "count": lambda c: F.count(F.lit(1)) if c is None else F.count(c),
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}
_MERGE_FN = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def refresh_incremental(
    batch: DataFrame,
    target: DmlTable,
    ts_col: str,
    every: int,
    unit: str,
    specs: "Mapping[str, tuple[str, str | None]]",
    by: Sequence[str] = (),
) -> DmlTable:
    """Merge ONE batch of raw rows (and only those rows) into the rollup.

    Unlike ``refresh_continuous_aggregate`` — which re-reads the source
    for every bucket at/above the mark and may therefore be fed the full
    table — this variant is sound when the feed contains ONLY the new
    rows (a micro-batch): aggregates are stored as MERGEABLE PARTIALS
    (``specs`` maps output name → (kind, src_col), kind ∈ count/sum/min/
    max; derived metrics like avg divide on read), so a bucket straddling
    a batch boundary merges stored ⊕ fresh instead of being recomputed
    from an incomplete slice. Late data is handled for free: ANY bucket
    appearing in the batch — not just the newest — merges into its stored
    row, and only those buckets are touched (leaf-scoped on a
    bucket-partitioned target).
    """
    every_ms = every * UNIT_MS[unit.upper()]
    import os

    need = sorted({col for (_kind, col) in specs.values() if col})
    fresh = (
        batch.select(_bucket(ts_col, every_ms), *by, *need)
        .groupBy(BUCKET_COL, *by)
        .agg(*[
            _PARTIAL_FN[kind](col).alias(name)
            for name, (kind, col) in specs.items()
        ])
    )
    exists = os.path.isdir(target.path) and any(
        not e.startswith(("_", ".")) for e in os.listdir(target.path)
    )
    if not exists:
        # guard creation only here: an empty first batch must not
        # materialize an empty rollup (auto_aggregate_stream used to pay
        # a per-batch isEmpty job for this; steady-state batches
        # short-circuit on empty partials below instead)
        if fresh.isEmpty():
            return target
        target.create(fresh)
        return target
    if target.partitioning is None:
        # An unpartitioned rollup has no leaf to scope to: replace_where
        # stages a FULL rewrite regardless, so deriving the affected
        # buckets first (collect + pinned merge + complement filter — two
        # extra driver actions and two extra plans per micro-batch) buys
        # nothing. Merge in ONE staged write: re-aggregate stored ∪ fresh
        # wholesale. Arithmetically identical to the scoped form — the
        # table holds one partial row per (bucket, keys), so every merge
        # group has ≤2 rows (stored ⊕ fresh; count/sum/min/max over a
        # singleton is the identity, over a pair it is the same two-term
        # combine the scoped path computed).
        target._rewrite(
            target.read().unionByName(fresh)
            .groupBy(BUCKET_COL, *by)
            .agg(*[
                _MERGE_FN[kind](name).alias(name)
                for name, (kind, _col) in specs.items()
            ])
        )
        return target
    # Leaf-scoped merge (the 100 TB shape): the batch's PARTIALS (not its
    # raw rows) are one row per (bucket, keys) — collect them when the
    # planning-time estimate says they are driver-sized, derive the
    # affected buckets locally, and feed the merge union a LocalRelation
    # of the same rows. A rollup whose partials outgrow the bound (very
    # high-cardinality keys) keeps the pinned-DataFrame shape — driver
    # memory stays bounded by construction.
    from griddb_spark.pipeline.similarity import _plan_size_bytes

    rows = None
    if 0 < _plan_size_bytes(fresh) <= 32 * 1024 * 1024:
        try:
            rows = fresh.collect()
        except Exception:
            rows = None  # lying estimate: fall back to the pinned path
    if rows is not None:
        if not rows:
            return target
        affected = sorted({r[BUCKET_COL] for r in rows})
        fresh = fresh.sparkSession.createDataFrame(rows, fresh.schema)
    else:
        fresh = fresh.localCheckpoint(eager=True)
        affected = [
            r[0] for r in fresh.select(BUCKET_COL).distinct().collect()
        ]
        if not affected:
            return target
    stored = target.read().filter(F.col(BUCKET_COL).isin(affected))
    merged = (
        stored.unionByName(fresh)
        .groupBy(BUCKET_COL, *by)
        .agg(*[
            _MERGE_FN[kind](name).alias(name)
            for name, (kind, _col) in specs.items()
        ])
    )
    # pin before the leaf swap: the partitioned replace_where DELETES the
    # affected leaves before inserting, so merged must not lazily re-read
    # post-delete state
    merged = merged.localCheckpoint(eager=True)
    target.replace_where(F.col(BUCKET_COL).isin(affected), merged)
    return target


def auto_aggregate_stream(
    stream: DataFrame,
    target: DmlTable,
    ts_col: str,
    every: int,
    unit: str,
    specs: "Mapping[str, tuple[str, str | None]]",
    by: Sequence[str] = (),
    checkpoint_dir: "str | None" = None,
):
    """The truly AUTOMATIC face of 5.6's scheduled aggregation: a
    streaming query whose every micro-batch merges into the rollup
    container via ``refresh_incremental``.

    ``foreachBatch`` is the right primitive — the refresh is a
    partial-merge upsert into a DmlTable, which no built-in sink
    expresses; inside the hook it is plain batch code, so the merge logic
    (and its tests/oracles) is shared verbatim with the scheduled batch
    path. The checkpoint replays unprocessed files after a restart.

    Returns the started StreamingQuery (caller owns termination).
    """

    def _refresh(batch_df: DataFrame, _batch_id: int) -> None:
        # no isEmpty pre-check: refresh_incremental guards creation
        # itself and steady-state empty batches short-circuit on their
        # (empty) collected partials — one fewer job per micro-batch
        refresh_incremental(batch_df, target, ts_col, every, unit, specs, by)

    writer = stream.writeStream.foreachBatch(_refresh).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()

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
    # it since the last refresh. With a partitioned target the DELETE is
    # leaf-scoped (DmlTable._mutate rewrites only the leaves holding
    # bucket >= hwm — one bucket in the steady state); an unpartitioned
    # rollup target is small by construction either way.
    target.delete(F.col(BUCKET_COL) >= hwm)
    target.insert(fresh)
    return target

"""Bucketed interval (range) join — point-in-interval at scale.

A point-in-interval join (`e.ts BETWEEN w.start AND w.end`) has no
equality key, so Catalyst can only plan it as BroadcastNestedLoopJoin
(small side) or a cartesian product — the canonical non-equi-join scale
trap: at 100 TB the nested loop is O(|events|·|windows|) and the
broadcast side rarely stays small.

The standard fix, expressed declaratively: discretize the time axis into
fixed-width buckets, explode every interval into the buckets it overlaps
(fan-out = interval length / bucket width, bounded by construction),
bucket every point (one expression), equi-join on the bucket, and keep
the exact BETWEEN as a post-join residual. The shuffle is a plain hash
exchange on the bucket key, AQE handles skewed buckets, and bucket width
is the single knob trading fan-out against join selectivity (set it near
the median interval length).

Reference tie-in: GridDB's TQL time-range scans (`TIME_WINDOW_AGG`,
timeSeries range predicates) cover the single-table case; the two-table
interval join is the analytics composition of the same primitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, width_sec: int) -> Column:
    return F.floor(F.unix_timestamp(ts) / F.lit(width_sec)).cast("bigint")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_sec: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval containing them.

    Returns all columns of both frames for rows where
    ``start_col <= point_col <= end_col`` (inclusive both ends, the TQL
    range convention). ``how`` supports ``inner`` and ``left`` (points
    with no containing interval survive with nulls).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    p = points.withColumn("__pb", _bucket(F.col(point_col), bucket_sec))
    i = intervals.withColumn(
        "__ib",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_sec),
                _bucket(F.col(end_col), bucket_sec),
            )
        ),
    )
    cond = (
        (F.col("__pb") == F.col("__ib"))
        & (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    joined = p.join(i, cond, "inner").drop("__pb", "__ib")
    if how == "inner":
        return joined
    # left: re-attach points that matched nothing (anti-join, broadcast
    # decision left to the planner — the matched-point id set is
    # corpus-sized in the worst case, so no forced hint)
    matched = joined.select(*points.columns)
    missing = p.drop("__pb").join(matched, points.columns, "left_anti")
    for c in intervals.columns:
        missing = missing.withColumn(c, F.lit(None).cast(
            dict(intervals.dtypes)[c]))
    return joined.unionByName(missing)

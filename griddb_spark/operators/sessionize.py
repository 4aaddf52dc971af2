"""Gap-based sessionization of an event stream (batch and streaming).

The reference has no session operator — its closest surface is the
client-side range query loop (``TimeSeries.java:136-617``) — but any
training-data or clickstream pipeline needs one, so we expose the standard
two shapes:

- ``sessionize``: batch gaps-and-islands. One window pass per key computes
  the previous event time; a gap larger than the timeout starts a new
  session; a running sum of the start flags numbers sessions within the
  key. Exactly two narrow shuffles on the key (window + final groupBy) —
  no UDF, no state store; at 100 TB this is the shape that survives
  (partition by key, sort within partition — Spark's window exec).
- ``sessionize_stream``: the same semantics on an unbounded stream via
  ``F.session_window`` (state-store backed, watermark-evicted). Spark
  defines the session window end as ``last event + gap`` — the batch shape
  mirrors that so both return identical rows on identical input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    aggs: dict | None = None,
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    Returns (key, session_id, session_start, session_end, n_events, **aggs)
    where ``session_id`` numbers sessions per key from 1 in time order and
    ``session_end`` is ``last event + gap`` (streaming-compatible).
    """
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    w = Window.partitionBy(key).orderBy(ts)
    flagged = df.withColumn(
        "__new",
        F.when(
            F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(F.col(ts)).over(w))
            > gap_minutes * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .cast("long"),
    ).withColumn(
        "__sid",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)) + 1,
    )
    agg_cols = [
        F.min(ts).alias("session_start"),
        (F.max(ts) + gap).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ] + [c.alias(n) for n, c in (aggs or {}).items()]
    return flagged.groupBy(F.col(key), F.col("__sid").alias("session_id")).agg(
        *agg_cols
    )


def sessionize_stream(
    stream: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
    aggs: dict | None = None,
) -> DataFrame:
    """Streaming sessionization: watermark + ``session_window`` state.

    Emits one final row per closed session (append mode): sessions merge
    while events keep arriving within the gap; the watermark closes and
    evicts them. Same output columns as the batch ``sessionize`` except
    ``session_id`` (stream rows are identified by their start time).
    """
    sw = F.session_window(F.col(ts), f"{gap_minutes} minutes")
    agg_cols = [
        F.count(F.lit(1)).alias("n_events"),
    ] + [c.alias(n) for n, c in (aggs or {}).items()]
    return (
        stream.withWatermark(ts, f"{watermark_minutes} minutes")
        .groupBy(F.col(key), sw.alias("__w"))
        .agg(*agg_cols)
        .select(
            key,
            F.col("__w.start").alias("session_start"),
            F.col("__w.end").alias("session_end"),
            "n_events",
            *[n for n in (aggs or {})],
        )
    )

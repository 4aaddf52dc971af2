"""TQL time-series selections & aggregations as distributed DataFrame ops.

Reference semantics (cited into /root/reference):

- TIME_NEXT/TIME_NEXT_ONLY/TIME_PREV/TIME_PREV_ONLY — as-of row lookup
  (``selection_func.h:126-300``).
- TIME_INTERPOLATED(col, t) — exact row if present; else the *previous*
  row's image with the timestamp column set to ``t`` and ``col`` linearly
  interpolated between neighbors; empty if ``t`` is outside the data range;
  NULL result if either neighbor value is NULL; the interpolated value is
  cast back to the column's type, truncating toward zero for integers
  (``selection_func_impl.h:277-464``).
- TIME_SAMPLING(col, start, end, n, unit) — fixed grid from ``start`` every
  interval up to ``end`` inclusive; a grid point yields a row iff an exact
  row exists at it or it lies strictly between two data rows (then: previous
  row's image, ts=grid point, ``col`` interpolated); grid points before the
  first or after the last data row produce nothing
  (``selection_func_impl.h:531-719``).
- TIME_AVG(col) — time-weighted average: value_i weighted by
  ``mid(t_i, t_i+1) - mid(t_i-1, t_i)`` with integer-ms floor midpoints;
  boundary rows use their single-sided half interval; a lone row returns
  its value (``aggregation_func.h:780-880``).
- MAX_ROWS/MIN_ROWS(col) — all rows attaining the max/min
  (``selection_func.h:230``).

Scale design: every operator here is a *batch* transform. As-of / neighbor
lookups are implemented with the union-scaffold trick (tag grid vs data
rows, one partitioned sort, ``last``/``first`` ``ignorenulls`` windows) —
one shuffle, no per-point ``limit(1)`` plans, parallel across series keys
(``by`` columns). Without ``by`` the window is a single sorted partition,
which mirrors GridDB's single-container TQL scope; pass ``by`` for
multi-series data.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: GridDB time units (sql_lexer_keyword.h) → milliseconds. TQL sampling
#: units are fixed-width only (DAY..MILLISECOND).
UNIT_MS = {
    "DAY": 86_400_000,
    "HOUR": 3_600_000,
    "MINUTE": 60_000,
    "SECOND": 1_000,
    "MILLISECOND": 1,
}

_GRID = "__is_grid"
_PREV = "__prev"
_NEXT = "__next"


def _ts_lit(t) -> "F.Column":
    if isinstance(t, str):
        return F.lit(t).cast("timestamp")
    return F.lit(t)


def _to_ms(t) -> int:
    """Driver-side epoch-ms of a timestamp literal (UTC)."""
    if isinstance(t, (int, float)):
        return int(t)
    if isinstance(t, str):
        t = _dt.datetime.fromisoformat(t.replace("Z", "+00:00"))
    if isinstance(t, _dt.datetime):
        if t.tzinfo is None:
            t = t.replace(tzinfo=_dt.timezone.utc)
        return int(t.timestamp() * 1000)
    raise TypeError(f"cannot interpret {t!r} as a timestamp")


def time_next(df: DataFrame, at, ts_col: str = "ts", only: bool = False,
              by: Sequence[str] = ()) -> DataFrame:
    """TIME_NEXT(*, t) / TIME_NEXT_ONLY: the row at ``t`` or nearest after.

    ``only=True`` excludes the exact match (strictly after). One row per
    ``by`` group (a distributed top-1, not a full sort).
    """
    cond = F.col(ts_col) > _ts_lit(at) if only else F.col(ts_col) >= _ts_lit(at)
    filtered = df.filter(cond)
    if not by:
        return filtered.orderBy(ts_col).limit(1)  # TakeOrderedAndProject
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).asc())
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def time_prev(df: DataFrame, at, ts_col: str = "ts", only: bool = False,
              by: Sequence[str] = ()) -> DataFrame:
    """TIME_PREV(*, t) / TIME_PREV_ONLY: the row at ``t`` or nearest before."""
    cond = F.col(ts_col) < _ts_lit(at) if only else F.col(ts_col) <= _ts_lit(at)
    filtered = df.filter(cond)
    if not by:
        return filtered.orderBy(F.col(ts_col).desc()).limit(1)
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).desc())
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _cast_interpolated(value_col, dtype: T.DataType):
    """Cast a double interpolation result back to the source column type,
    truncating toward zero for integers (selection_func_impl.h:295-324)."""
    if isinstance(dtype, T.BooleanType):
        return (value_col.cast("long") != 0).cast("boolean")
    return value_col.cast(dtype)


def _interp_expr(t_ms, t1_ms, t2_ms, v1, v2, dtype: T.DataType):
    """v1 + (t-t1)/(t2-t1) * (v2-v1) in double, cast back to ``dtype``.
    NULL if either neighbor value is NULL (getInterpolatedValue)."""
    rate = (t_ms - t1_ms).cast("double") / (t2_ms - t1_ms).cast("double")
    raw = v1.cast("double") + rate * (v2.cast("double") - v1.cast("double"))
    return _cast_interpolated(raw, dtype)


def _with_neighbors(df: DataFrame, grid: DataFrame, ts_col: str,
                    by: Sequence[str]) -> DataFrame:
    """Union-scaffold as-of: for every grid row, attach ``__prev``/``__next``
    structs holding the nearest data row at-or-before / strictly-after it.

    Data rows sort before grid rows at equal timestamps, so an exact match
    appears as ``__prev.<ts> == grid ts``. One partitioned sort total.
    """
    data_cols = [c for c in df.columns]
    payload = F.struct(*[F.col(c) for c in data_cols]).alias("__row")
    data = df.select(*by, F.col(ts_col), F.lit(0).alias(_GRID), payload)
    gridded = grid.select(
        *by, F.col(ts_col), F.lit(1).alias(_GRID),
        F.lit(None).cast(data.schema["__row"].dataType).alias("__row"),
    )
    unioned = data.unionByName(gridded)
    w = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy()
    order = [F.col(ts_col).asc(), F.col(_GRID).asc()]
    w_prev = w.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_next = w.orderBy(*order).rowsBetween(1, Window.unboundedFollowing)
    return (
        unioned.withColumn(_PREV, F.last("__row", ignorenulls=True).over(w_prev))
        .withColumn(_NEXT, F.first("__row", ignorenulls=True).over(w_next))
        .filter(F.col(_GRID) == 1)
    )


def time_interpolated(df: DataFrame, at, col: str, ts_col: str = "ts",
                      by: Sequence[str] = ()) -> DataFrame:
    """TIME_INTERPOLATED(col, t) — selection_func_impl.h:331-459."""
    grid = (
        df.sparkSession.range(1)
        .select(_ts_lit(at).alias(ts_col))
    )
    if by:
        grid = df.select(*by).distinct().crossJoin(F.broadcast(grid))
    dtype = df.schema[col].dataType
    nb = _with_neighbors(df, grid, ts_col, by)
    p, n = F.col(_PREV), F.col(_NEXT)
    exact = p.isNotNull() & (p[ts_col] == F.col(ts_col))
    interp = _interp_expr(
        F.unix_millis(F.col(ts_col)),
        F.unix_millis(p[ts_col]), F.unix_millis(n[ts_col]),
        p[col], n[col], dtype,
    )
    out_cols = []
    for c in df.columns:
        if c == ts_col:
            out_cols.append(F.col(ts_col).alias(c))
        elif c == col:
            out_cols.append(F.when(exact, p[c]).otherwise(interp).alias(c))
        else:
            out_cols.append(p[c].alias(c))
    return (
        nb.filter(p.isNotNull() & (exact | n.isNotNull()))
        .select(*out_cols)
    )


def time_sampling(df: DataFrame, start, end, interval: int, unit: str,
                  col: str | None = None, ts_col: str = "ts",
                  by: Sequence[str] = ()) -> DataFrame:
    """TIME_SAMPLING(col, start, end, n, unit) — selection_func_impl.h:531-719.

    The grid is generated with ``spark.range`` (parallel — no driver-side
    array), then resolved with one partitioned sort via the union scaffold.
    """
    unit_ms = UNIT_MS[unit.upper()]
    step_ms = interval * unit_ms
    start_ms, end_ms = _to_ms(start), _to_ms(end)
    if step_ms <= 0 or end_ms < start_ms:
        raise ValueError("invalid sampling range/interval")
    n_steps = (end_ms - start_ms) // step_ms + 1
    grid = (
        df.sparkSession.range(n_steps)
        .select(F.timestamp_millis(F.lit(start_ms) + F.col("id") * step_ms).alias(ts_col))
    )
    if by:
        grid = df.select(*by).distinct().crossJoin(F.broadcast(grid))
    nb = _with_neighbors(df, grid, ts_col, by)
    p, n = F.col(_PREV), F.col(_NEXT)
    exact = p.isNotNull() & (p[ts_col] == F.col(ts_col))
    keep = exact | (p.isNotNull() & n.isNotNull())
    out_cols = []
    for c in df.columns:
        if c == ts_col:
            out_cols.append(F.col(ts_col).alias(c))
        elif col is not None and c == col:
            dtype = df.schema[col].dataType
            interp = _interp_expr(
                F.unix_millis(F.col(ts_col)),
                F.unix_millis(p[ts_col]), F.unix_millis(n[ts_col]),
                p[c], n[c], dtype,
            )
            out_cols.append(F.when(exact, p[c]).otherwise(interp).alias(c))
        else:
            out_cols.append(p[c].alias(c))
    return nb.filter(keep).select(*out_cols)


def time_avg(df: DataFrame, col: str, ts_col: str = "ts",
             by: Sequence[str] = ()) -> DataFrame:
    """TIME_AVG(col): time-weighted average — aggregation_func.h:780-880.

    weight_i = mid(t_i, t_{i+1}) - mid(t_{i-1}, t_i) with floor-integer
    midpoints on epoch ms; boundary rows take single-sided halves; one row
    ⇒ its own value. NULL values are skipped (TQL aggregations ignore NULL).
    Output: one row per ``by`` group with column ``time_avg``.
    """
    d = df.filter(F.col(col).isNotNull()).select(
        *by, F.unix_millis(F.col(ts_col)).alias("__t"), F.col(col).cast("double").alias("__v")
    )
    w = (Window.partitionBy(*by) if by else Window.partitionBy()).orderBy("__t")
    prev_t, next_t = F.lag("__t").over(w), F.lead("__t").over(w)
    prev_mid = F.when(prev_t.isNotNull(), prev_t + F.floor((F.col("__t") - prev_t) / 2)).otherwise(F.col("__t"))
    next_mid = F.when(next_t.isNotNull(), F.col("__t") + F.floor((next_t - F.col("__t")) / 2)).otherwise(F.col("__t"))
    weighted = d.withColumn("__w", (next_mid - prev_mid).cast("double"))
    agg = weighted.groupBy(*by).agg(
        F.sum(F.col("__v") * F.col("__w")).alias("__ws"),
        F.sum("__w").alias("__wt"),
        F.avg("__v").alias("__plain"),
    )
    result = F.when(F.col("__wt") > 0, F.col("__ws") / F.col("__wt")).otherwise(F.col("__plain"))
    return agg.select(*by, result.alias("time_avg"))


def max_rows(df: DataFrame, col: str, by: Sequence[str] = ()) -> DataFrame:
    """MAX_ROWS(col): all rows attaining max(col) — selection_func.h:230."""
    return _extreme_rows(df, col, by, is_max=True)


def min_rows(df: DataFrame, col: str, by: Sequence[str] = ()) -> DataFrame:
    """MIN_ROWS(col): all rows attaining min(col)."""
    return _extreme_rows(df, col, by, is_max=False)


def _extreme_rows(df: DataFrame, col: str, by: Sequence[str], is_max: bool) -> DataFrame:
    agg_fn = F.max if is_max else F.min
    if by:
        w = Window.partitionBy(*by)
        return (
            df.withColumn("__m", agg_fn(col).over(w))
            .filter(F.col(col) == F.col("__m"))
            .drop("__m")
        )
    # scalar aggregate broadcast — no single-partition window at scale
    extreme = df.agg(agg_fn(col).alias("__m"))
    return (
        df.join(F.broadcast(extreme), F.col(col) == F.col("__m"), "inner")
        .drop("__m")
    )


#: NoSQL API Aggregation enum (Aggregation.java:72-198) → implementation.
_API_AGGS = {
    "MINIMUM": lambda c: F.min(c),
    "MAXIMUM": lambda c: F.max(c),
    "TOTAL": lambda c: F.sum(c),
    "AVERAGE": lambda c: F.avg(c),
    "VARIANCE": lambda c: F.var_pop(c),
    "STANDARD_DEVIATION": lambda c: F.stddev_pop(c),
    "COUNT": lambda c: F.count(c),
}


def aggregate_time_range(df: DataFrame, start, end, col: str, agg: str,
                         ts_col: str = "ts", by: Sequence[str] = ()) -> DataFrame:
    """TimeSeries.aggregate(start, end, col, Aggregation) — the NoSQL API
    range aggregation (TimeSeries.java:136-617). WEIGHTED_AVERAGE is
    TIME_AVG over the range."""
    ranged = df.filter((F.col(ts_col) >= _ts_lit(start)) & (F.col(ts_col) <= _ts_lit(end)))
    agg = agg.upper()
    if agg == "WEIGHTED_AVERAGE":
        return time_avg(ranged, col, ts_col, by).withColumnRenamed("time_avg", "aggregation_result")
    if agg not in _API_AGGS:
        raise ValueError(f"unknown aggregation {agg!r}")
    return ranged.groupBy(*by).agg(_API_AGGS[agg](col).alias("aggregation_result"))


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: Sequence[str] = (), direction: str = "backward",
              tolerance_ms: int | None = None, right_prefix: str = "r_") -> DataFrame:
    """As-of join (scale path for TIME_PREV/NEXT against another table).

    For every left row, attach the nearest right row with
    ``right.on <= left.on`` (backward) or ``>=`` (forward), per ``by`` keys.
    Implemented as a tagged union + one partitioned sort — the plan GridDB's
    index-nested-loop would want, but shuffle-parallel across ``by`` keys.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    r_payload = F.struct(*[F.col(c) for c in right.columns]).alias("__r")
    r = right.select(*by, F.col(on), F.lit(0).alias("__side"), r_payload)
    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    l = left.select(*by, F.col(on), F.lit(1).alias("__side"), l_payload)
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    l = l.withColumn("__r", F.lit(None).cast(r.schema["__r"].dataType))
    unioned = r.select(*by, on, "__side", "__r", "__l").unionByName(
        l.select(*by, on, "__side", "__r", "__l"))
    w = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy()
    if direction == "backward":
        # right rows sort before left rows at equal ts → 'at or before'
        wf = w.orderBy(F.col(on).asc(), F.col("__side").asc()).rowsBetween(
            Window.unboundedPreceding, 0)
        matched = F.last("__r", ignorenulls=True).over(wf)
    else:
        wf = w.orderBy(F.col(on).desc(), F.col("__side").asc()).rowsBetween(
            Window.unboundedPreceding, 0)
        matched = F.last("__r", ignorenulls=True).over(wf)
    joined = (
        unioned.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
    )
    if tolerance_ms is not None:
        delta = F.abs(F.unix_millis(F.col(on)) - F.unix_millis(F.col("__m")[on]))
        joined = joined.withColumn(
            "__m", F.when(delta <= tolerance_ms, F.col("__m")))
    out = [F.col("__l")[c].alias(c) for c in left.columns]
    out += [F.col("__m")[c].alias(f"{right_prefix}{c}") for c in right.columns]
    return joined.select(*out)


def _empty_value(dtype: T.DataType):
    """GridDB 'empty value' per column type (Value::init, value.h): the
    type default — 0 for numerics, '' for strings, false for bool, epoch
    for timestamps, NULL for anything else."""
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.lit(0).cast(dtype)
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return F.lit(0.0).cast(dtype)
    if isinstance(dtype, T.StringType):
        return F.lit("")
    if isinstance(dtype, T.BooleanType):
        return F.lit(False)
    if isinstance(dtype, T.TimestampType):
        return F.timestamp_millis(F.lit(0))
    return F.lit(None).cast(dtype)


def time_sampling_no_interp(df: DataFrame, start, end, interval: int,
                            unit: str, ts_col: str = "ts",
                            by: Sequence[str] = ()) -> DataFrame:
    """SAMPLE without interpolation — ``TimeSeries::sampleWithoutInterp``
    (time_series.cpp:3624-3830), client ``InterpolationMode.EMPTY``.

    Grid points ``start + k*interval`` up to ``min(end, last row ts)``:
    an exact-match row is emitted as-is; otherwise the grid point emits
    ts=target and the *empty value* of every other column
    (InterpolationMode.java: "an empty value defined in Container").
    Points after the last data row are not emitted (reference loop ends
    with the row scan).

    Scale: grid is ``spark.range`` (parallel), resolved with one
    broadcast-able per-group bound + one equi join on the grid timestamp —
    no window over the full data needed for the EMPTY mode.
    """
    unit_ms = UNIT_MS[unit.upper()]
    step_ms = interval * unit_ms
    start_ms, end_ms = _to_ms(start), _to_ms(end)
    if step_ms <= 0 or end_ms < start_ms:
        raise ValueError("invalid sampling range/interval")
    n_steps = (end_ms - start_ms) // step_ms + 1
    grid = (
        df.sparkSession.range(n_steps)
        .select(F.timestamp_millis(F.lit(start_ms) + F.col("id") * step_ms)
                .alias(ts_col))
    )
    ranged = df.filter(
        (F.col(ts_col) >= F.timestamp_millis(F.lit(start_ms)))
        & (F.col(ts_col) <= F.timestamp_millis(F.lit(end_ms)))
    )
    bounds = ranged.groupBy(*by).agg(F.max(ts_col).alias("__last"))
    grid = (
        grid.crossJoin(F.broadcast(bounds))
        .filter(F.col(ts_col) <= F.col("__last"))
        .drop("__last")
    )
    joined = grid.join(
        ranged.withColumn("__present", F.lit(True)), on=[*by, ts_col], how="left"
    )
    out_cols = []
    present = F.col("__present").isNotNull()
    for c in df.columns:
        if c == ts_col or c in by:
            out_cols.append(F.col(c))
        else:
            dtype = df.schema[c].dataType
            out_cols.append(
                F.when(present, F.col(c))
                .otherwise(_empty_value(dtype))
                .alias(c)
            )
    return joined.select(*out_cols)

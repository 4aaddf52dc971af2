"""GROUP BY RANGE(key) EVERY(interval, unit[, offset]) [FILL(mode)].

GridDB's SQL time-bucketing operator (reference
``docs/GridDB-5.3-CE-RELEASE_NOTES.md:30-70``, execution
``sql_operator_group.cpp:571-1000``, ``OP_GROUP_RANGE(_MERGE)``).

Pinned reference semantics (sql_operator_group.cpp:917-1000,
``createFillExpression``):

- Buckets are the fixed lattice ``start + k*every`` covering the WHERE
  range ``[start, end]`` (both inclusive — GridDB requires a range
  predicate on the key to bound the grid); ``offset`` shifts the lattice.
- FILL(NONE)    → empty buckets are skipped.
- FILL(NULL)    → empty buckets emit NULLs for aggregate columns.
- FILL(PREVIOUS)→ empty buckets copy the previous *non-empty* bucket's
  aggregate values; NULL when there is none.
- FILL(LINEAR)  → empty buckets linearly interpolate each aggregate column
  between the previous and next non-empty buckets, x = bucket key
  (EXPR_LINEAR); NULL when either side is missing; non-numeric columns
  fill NULL; the result is cast back to the column's type.

Only *empty* buckets are filled — a non-empty bucket whose aggregate is
NULL (e.g. avg over all-NULL) stays NULL.

Scale: bucketing is a plain ``groupBy`` (partial-agg map-side combine);
the fill scaffold is ``spark.range`` (parallel) × distinct series keys,
joined on the bucket, and the fill itself is two ``ignorenulls`` windows
partitioned by the series keys. No driver-side loops, no UDFs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from griddb_spark.operators.timeseries import UNIT_MS, _to_ms

_FILL_MODES = ("NONE", "NULL", "PREVIOUS", "LINEAR")

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


#: Reference default for the fill-generation budget: a GROUP BY RANGE
#: statement may emit at most this many GENERATED (empty-bucket) rows
#: before erroring (``sql_operator_group.h:314`` ROW_GENERATION_LIMIT;
#: thrown at ``sql_operator_group.cpp:1378`` "Too many groups filled").
#: The ``/*+ MaxGeneratedRows(n) */`` hint overrides it per statement.
ROW_GENERATION_LIMIT = 100_000


def group_by_range(
    df: DataFrame,
    key: str,
    every: int,
    unit: str,
    aggs: Mapping[str, Column],
    start,
    end,
    offset: int = 0,
    fill: str = "NONE",
    by: Sequence[str] = (),
    generation_limit: "int | None" = ROW_GENERATION_LIMIT,
) -> DataFrame:
    """Aggregate ``df`` into fixed time buckets of ``every`` ``unit``.

    ``aggs`` maps output column name → aggregate Column (e.g.
    ``{"avg_value": F.avg("value")}``). The bucket start timestamp is
    returned under the key column's name. ``by`` adds series-key grouping
    (a GridDB PARTITION BY extension — one GROUP BY RANGE per series).

    ``generation_limit`` is the statement's fill budget: if FILL
    generates more than this many empty-bucket rows the query fails with
    the reference's error ("Too many groups filled",
    ``sql_operator_group.cpp:1378``; default 100k per
    ``sql_operator_group.h:314``, hint-overridable). ``None`` disables
    the guard. Enforcement is free when the lattice alone proves the
    budget can't be exceeded (no series keys and ``n_buckets <= limit``
    — the common case); otherwise it is a broadcast one-row fill count
    folded into the plan JVM-side (``raise_error``), no extra action.
    """
    fill = fill.upper()
    if fill not in _FILL_MODES:
        raise ValueError(f"fill must be one of {_FILL_MODES}")
    unit_ms = UNIT_MS[unit.upper()]
    every_ms = every * unit_ms
    if every_ms <= 0:
        raise ValueError("EVERY interval must be positive")
    start_ms = _to_ms(start) + offset * unit_ms
    end_ms = _to_ms(end)
    if end_ms < start_ms:
        raise ValueError("empty range")

    ts_ms = F.unix_millis(F.col(key))
    bucket = (
        F.lit(start_ms)
        + F.floor((ts_ms - F.lit(start_ms)) / every_ms).cast("long") * every_ms
    )
    ranged = df.filter((ts_ms >= start_ms) & (ts_ms <= end_ms))
    agg_exprs = [expr.alias(name) for name, expr in aggs.items()]
    grouped = (
        ranged.withColumn("__bucket", bucket)
        .groupBy(*by, "__bucket")
        .agg(*agg_exprs)
    )

    if fill == "NONE":
        return grouped.select(
            *by, F.timestamp_millis(F.col("__bucket")).alias(key),
            *[F.col(n) for n in aggs],
        )

    # scaffold: full bucket lattice × distinct series keys
    n_buckets = (end_ms - start_ms) // every_ms + 1
    spark = df.sparkSession
    lattice = spark.range(n_buckets).select(
        (F.lit(start_ms) + F.col("id") * every_ms).alias("__bucket")
    )
    if by:
        # alias each key to itself: the Alias mints fresh attribute ids so
        # the scaffold side never shares references with `grouped` (a raw
        # self-derived join trips conflicting-reference resolution for
        # sources that don't auto-dedup, e.g. memory-sink tables)
        keys = ranged.select(
            *[F.col(c).alias(c) for c in by]
        ).distinct()
        scaffold = keys.crossJoin(F.broadcast(lattice))
    else:
        scaffold = lattice
    joined = scaffold.join(
        grouped.withColumn("__present", F.lit(True)),
        on=[*by, "__bucket"],
        how="left",
    )

    out_aggs: list[Column] = []
    if fill == "NULL":
        out_aggs = [F.col(n) for n in aggs]
    else:
        w = Window.partitionBy(*[F.col(c) for c in by]) if by else Window.partitionBy()
        w_prev = w.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, 0)
        w_next = w.orderBy("__bucket").rowsBetween(0, Window.unboundedFollowing)
        present = F.col("__present").isNotNull()
        for name in aggs:
            # struct wrapper: keeps "non-empty bucket with NULL value"
            # distinct from "no bucket" under ignorenulls
            boxed = F.when(present, F.struct(F.col(name).alias("v"),
                                             F.col("__bucket").alias("b")))
            prev = F.last(boxed, ignorenulls=True).over(w_prev)
            if fill == "PREVIOUS":
                filled = F.when(present, F.col(name)).otherwise(prev["v"])
            else:  # LINEAR
                dtype = _agg_dtype(grouped, name)
                nxt = F.first(boxed, ignorenulls=True).over(w_next)
                if isinstance(dtype, _NUMERIC):
                    rate = (
                        (F.col("__bucket") - prev["b"]).cast("double")
                        / (nxt["b"] - prev["b"]).cast("double")
                    )
                    interp = (
                        prev["v"].cast("double")
                        + rate * (nxt["v"].cast("double") - prev["v"].cast("double"))
                    ).cast(dtype)
                else:
                    interp = F.lit(None).cast(dtype)
                filled = F.when(present, F.col(name)).otherwise(
                    F.when(prev.isNotNull() & nxt.isNotNull(), interp)
                )
            out_aggs.append(filled.alias(name))
    out = joined.select(
        *by, F.col("__present"),
        F.timestamp_millis(F.col("__bucket")).alias(key), *out_aggs,
    )
    if generation_limit is not None and (by or n_buckets > generation_limit):
        # fill budget can actually be exceeded: guard with a broadcast
        # one-row count of generated rows; raise_error keeps the check
        # inside the JVM plan (no driver action, no Python)
        fills = joined.filter(F.col("__present").isNull()).select(
            F.count(F.lit(1)).alias("__fills")
        )
        out = (
            out.crossJoin(F.broadcast(fills))
            .filter(
                F.when(
                    F.col("__fills") > F.lit(int(generation_limit)),
                    F.raise_error(F.lit(
                        "Too many groups filled "
                        f"(limit={int(generation_limit)})"
                    )),
                ).otherwise(F.lit(True))
            )
            .drop("__fills")
        )
    return out.drop("__present")


def _agg_dtype(grouped: DataFrame, name: str) -> T.DataType:
    return grouped.schema[name].dataType

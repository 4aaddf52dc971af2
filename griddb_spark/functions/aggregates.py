"""GridDB aggregate shims (reference ``sql_type.h:94-136``).

AVG/COUNT/MAX/MIN/SUM/STDDEV_SAMP/STDDEV_POP/VAR_SAMP/VAR_POP/MEDIAN/
PERCENTILE_CONT map 1:1 onto Spark built-ins; the functions here cover the
SQLite-inherited variants:

- TOTAL: always DOUBLE, 0.0 on empty/all-NULL input (SQLite semantics —
  GridDB's parser derives from SQLite, ``sql_internal_parser.cpp:26``).
- STDDEV0 / VARIANCE0: 0 instead of NULL when n <= 1.
- GROUP_CONCAT: comma-joined string casts. GridDB/SQLite concatenation
  order is input order (unspecified under parallelism) — ``sorted=True``
  (default) makes results deterministic and distributable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def total(col: Column | str) -> Column:
    """TOTAL(x) — sum as double, 0.0 on empty (sql_type.h AGG_TOTAL)."""
    return F.coalesce(F.sum(_c(col).cast("double")), F.lit(0.0))


def stddev0(col: Column | str) -> Column:
    """STDDEV0(x) — sample stddev, 0 when fewer than 2 rows."""
    return F.coalesce(F.stddev_samp(_c(col)), F.lit(0.0))


def variance0(col: Column | str) -> Column:
    """VARIANCE0(x) — sample variance, 0 when fewer than 2 rows."""
    return F.coalesce(F.var_samp(_c(col)), F.lit(0.0))


def group_concat(col: Column | str, sep: str = ",", sort: bool = True) -> Column:
    """GROUP_CONCAT(x[, sep]) — string-join of non-NULL values.

    ``sort=True`` fixes an order (GridDB's is arrival order, which is not
    reproducible on a cluster); pass False for raw collection order.
    """
    collected = F.collect_list(_c(col).cast("string"))
    if sort:
        collected = F.sort_array(collected)
    return F.array_join(collected, sep)


def median(col: Column | str) -> Column:
    """MEDIAN(x) — exact median (Spark `median`, added 3.4)."""
    return F.median(_c(col))


def percentile_cont(col: Column | str, fraction: float) -> Column:
    """PERCENTILE_CONT(x, f) — exact continuous percentile."""
    return F.percentile(_c(col), F.lit(fraction))

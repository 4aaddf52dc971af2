"""Operators — GridDB query semantics re-expressed as DataFrame transforms.

- ``timeseries``: TQL time-series selections/aggregations (TIME_NEXT/PREV,
  TIME_INTERPOLATED, TIME_SAMPLING, TIME_AVG, MAX_ROWS/MIN_ROWS) plus the
  scale-path as-of join.
- ``group_range``: SQL ``GROUP BY RANGE ... EVERY ... FILL(...)``.
- ``match_recognize``: SQL ``MATCH_RECOGNIZE`` row-pattern matching.
- ``skew``: salted join for pathologically hot keys.
"""

from griddb_spark.operators.timeseries import (
    asof_join,
    aggregate_time_range,
    max_rows,
    min_rows,
    time_avg,
    time_interpolated,
    time_next,
    time_prev,
    time_sampling,
    time_sampling_no_interp,
)
from griddb_spark.operators.continuous_agg import (  # noqa: F401
    auto_aggregate_stream,
    refresh_continuous_aggregate,
    refresh_incremental,
)
from griddb_spark.operators.group_range import group_by_range
from griddb_spark.operators.match_recognize import match_recognize
from griddb_spark.operators.range_join import range_join  # noqa: F401
from griddb_spark.operators.skew import salted_join

__all__ = [
    "asof_join",
    "salted_join",
    "aggregate_time_range",
    "group_by_range",
    "match_recognize",
    "max_rows",
    "min_rows",
    "time_avg",
    "time_interpolated",
    "time_next",
    "time_prev",
    "time_sampling",
    "time_sampling_no_interp",
]

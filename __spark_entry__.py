"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real inventory lives in ``griddb_spark.workload`` — one entry per
implemented operator from SURVEY.md §2.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: GROUP BY RANGE over events
    (1-minute buckets, avg/count) — the SURVEY §7 phase-0 vertical slice."""
    from pyspark.sql import functions as F

    from griddb_spark import workload
    from griddb_spark.operators import group_by_range

    events = workload.cat(spark, "/root/testdata/sf0.001").load("events")
    return group_by_range(
        events,
        "ts",
        1,
        "MINUTE",
        {"avg_value": F.avg("value"), "n_events": F.count(F.lit(1))},
        start=workload.EV_START,
        end=workload.EV_END,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from griddb_spark import workload

    return dict(workload.QUERIES)


def oracle_sql() -> dict[str, str]:
    from griddb_spark import workload

    return dict(workload.ORACLE)

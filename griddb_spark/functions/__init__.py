"""GridDB scalar & aggregate function library, as thin Spark shims.

Inventory from the reference (SURVEY §2.B): ``sql_type.h:94-199``, specs in
``sql_expression_string.h:45-176``, ``sql_expression_numeric.h:45-86``,
``sql_expression_time.h:47-196``; TQL registry ``function_map.cpp:52-105``.
Most are direct ``pyspark.sql.functions`` calls; the shims below cover the
SQLite-flavored semantic gaps (TOTAL, STDDEV0, GLOB, STRFTIME, ...).
"""

from griddb_spark.functions.aggregates import (
    group_concat,
    median,
    percentile_cont,
    stddev0,
    total,
    variance0,
)
from griddb_spark.functions.scalar import (
    char_,
    glob,
    glob_to_regex,
    hex_,
    hex_to_dec,
    instr,
    printf,
    quote,
    randomblob,
    translate_,
    typeof,
    zeroblob,
)
from griddb_spark.functions.time import (
    TIMESTAMP_UNITS,
    make_timestamp_ms,
    make_timestamp_us,
    now,
    strftime,
    timestamp_add,
    timestamp_diff,
    timestamp_trunc,
    to_epoch_ms,
    to_timestamp_ms,
    extract_unit,
)

__all__ = [
    "TIMESTAMP_UNITS",
    "char_",
    "extract_unit",
    "glob",
    "glob_to_regex",
    "group_concat",
    "hex_",
    "hex_to_dec",
    "instr",
    "make_timestamp_ms",
    "make_timestamp_us",
    "median",
    "now",
    "percentile_cont",
    "printf",
    "quote",
    "randomblob",
    "stddev0",
    "strftime",
    "timestamp_add",
    "timestamp_diff",
    "timestamp_trunc",
    "to_epoch_ms",
    "to_timestamp_ms",
    "total",
    "translate_",
    "typeof",
    "variance0",
    "zeroblob",
]

"""griddb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of GridDB (reference: griddb/griddb).

This is NOT a port of GridDB's C++ storage/cluster engine. It re-expresses
GridDB's three query surfaces (NoSQL container API, TQL, NewSQL/SQL — see
SURVEY.md) as an idiomatic PySpark library:

- ``griddb_spark.session``   — tuned SparkSession bootstrap
- ``griddb_spark.catalog``   — container catalog over parquet dirs
- ``griddb_spark.container`` — Collection / TimeSeries API veneer
- ``griddb_spark.operators`` — time-series + relational operators
  (as-of lookups, interpolation, sampling, GROUP BY RANGE + FILL,
  MATCH_RECOGNIZE, window helpers)
- ``griddb_spark.functions`` — GridDB scalar/aggregate function shims
- ``griddb_spark.sql``       — GridDB SQL / TQL translation front-end
- ``griddb_spark.pipeline``  — large-scale training-data ops (dedup,
  similarity search, text analysis, multimodal columns)
- ``griddb_spark.streaming`` — Structured Streaming ingest/aggregation
"""

from griddb_spark.session import get_spark
from griddb_spark.catalog import ContainerCatalog
from griddb_spark.container import Collection, TimeSeries, GridStore

__all__ = [
    "get_spark",
    "ContainerCatalog",
    "Collection",
    "TimeSeries",
    "GridStore",
]

__version__ = "0.1.0"

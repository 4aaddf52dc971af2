"""GridDB query-language front-ends.

- ``tql``: the per-container TQL dialect (``SELECT <selection> [WHERE ...]
  [ORDER BY ...] [LIMIT n [OFFSET m]]`` — reference lemon grammar
  ``tql.cpp:25``, tokens ``tql_token.h:23-82``).
- ``translate``: GridDB NewSQL → Spark SQL/DataFrame rewriting (GROUP BY
  RANGE/EVERY/FILL, MATCH_RECOGNIZE, TIMESTAMP(...) literals, GLOB,
  GridDB hints), per SURVEY §7 phase 3 — translation front-end instead of
  a Catalyst parser extension.
"""

from griddb_spark.sql.tql import run_tql
from griddb_spark.sql.translate import griddb_sql

__all__ = ["run_tql", "griddb_sql"]

"""Container catalog backed by parquet directories.

GridDB's fundamental abstraction is the *container* — a schema-full table,
either a COLLECTION or a TIME_SERIES (reference ``data_store_common.h:220-224``).
Here a container is a named parquet dataset; the catalog maps names to paths
and registers temp views so both the DataFrame API and ``spark.sql`` can
reach every container. GridDB's meta tables (``#tables``, ``#columns`` —
reference ``meta_type.h:712-731``) are served from Spark's own catalog.

At 100 TB the physical layout is what matters: containers written through
this catalog are partitioned (Hive-style) by a derived bucket column, the
Spark equivalent of GridDB's table partitioning
(``TABLE_PARTITION_TYPE_HASH/RANGE``, reference ``sql_parser.h:300-303``),
so partition pruning replaces GridDB's sub-container selection.
"""

from __future__ import annotations

import os
import weakref
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Canonical driver testdata tables (TESTDATA.md).
KNOWN_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any SF — at 100 TB these
#: stay ~KB-MB (region=5 rows, nation=25 rows in TPC-H at every SF).
BROADCAST_TABLES = frozenset({"region", "nation"})


#: session → {view name → base_dir that currently owns the temp view}.
#: Catalogs over different base_dirs share one session view namespace; the
#: owner map lets a catalog skip re-registering views it already owns while
#: still re-asserting them after a catalog at another dir took the name.
#: Weak-keyed by the live SparkSession object: a stopped/GC'd session's
#: entries vanish with it, so a later session can never inherit stale
#: ownership (``id()`` reuse after GC previously made table() skip
#: createOrReplaceTempView in a fresh session → TABLE_OR_VIEW_NOT_FOUND).
_VIEW_OWNER: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _owners(spark: SparkSession) -> dict:
    m = _VIEW_OWNER.get(spark)
    if m is None:
        m = {}
        _VIEW_OWNER[spark] = m
    return m


@dataclass
class ContainerCatalog:
    """Maps container names → parquet paths; lazily registers temp views."""

    spark: SparkSession
    base_dir: str
    _registered: set = field(default_factory=set)
    _nano_cache: dict = field(default_factory=dict)
    _df_cache: dict = field(default_factory=dict)
    #: optional access control (security.AccessControl, user, database name):
    #: when set, every load() checks READ on the database — GridDB's
    #: database-level GRANT scheme (sql_parser.h:251-256)
    acl: object | None = None
    acl_user: str | None = None
    db_name: str = "public"

    def with_access(self, acl, user: str) -> "ContainerCatalog":
        """A view of this catalog that authorizes every read as ``user``."""
        c = ContainerCatalog(self.spark, self.base_dir, acl=acl, acl_user=user,
                             db_name=self.db_name)
        c._nano_cache = self._nano_cache
        c._df_cache = self._df_cache
        return c

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, f"{name}.parquet")

    def load(self, name: str) -> DataFrame:
        """Read a container. Filters/projections push down to the scan.

        Parquet ns-precision timestamps arrive as epoch-nanos LONG (session
        sets ``spark.sql.legacy.parquet.nanosAsLong``); they are converted
        here to µs TimestampType — truncation, matching DuckDB's ns→µs cast.
        """
        if self.acl is not None:
            self.acl.authorize(self.acl_user, self.db_name, "READ")
        df = self.spark.read.parquet(self.path(name))
        for col_name in self._nano_ts_columns(name):
            # integer division — double division loses µs precision at
            # epoch-nanos magnitude (1.7e18 > 2^53)
            df = df.withColumn(
                col_name,
                F.timestamp_micros(F.expr(f"`{col_name}` div 1000")),
            )
        return df

    def _nano_ts_columns(self, name: str) -> list[str]:
        import pyarrow.parquet as pq
        import pyarrow as pa

        if name not in self._nano_cache:
            schema = pq.read_schema(self.path(name))
            self._nano_cache[name] = [
                f.name
                for f in schema
                if isinstance(f.type, pa.TimestampType) and f.type.unit == "ns"
            ]
        return self._nano_cache[name]

    # -- export / import (GridDB expimp tool formats; README.md:156) ------

    def export_container(
        self, name: str, out_dir: str, fmt: str = "csv"
    ) -> str:
        """Dump a container as CSV (the expimp interchange format) or JSON
        lines. Timestamps serialize as ISO-8601 UTC; the distributed write
        shape is one file per task (no driver collect)."""
        df = self.load(name)
        out = os.path.join(out_dir, f"{name}.{fmt}")
        w = df.write.mode("overwrite")
        if fmt == "csv":
            w.option("header", True).option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
            ).csv(out)
        elif fmt == "json":
            w.option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
            ).json(out)
        else:
            raise ValueError(f"unsupported export format: {fmt}")
        return out

    def import_container(
        self, path: str, fmt: str = "csv", schema=None
    ) -> DataFrame:
        """Read an exported container back (schema-checked when given —
        inference is a full extra pass at scale, so callers should pass
        the schema for anything big)."""
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        if fmt == "csv":
            return r.option("header", True).option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
            ).option("inferSchema", schema is None).csv(path)
        if fmt == "json":
            return r.option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
            ).json(path)
        raise ValueError(f"unsupported import format: {fmt}")

    def table(self, name: str) -> DataFrame:
        """Load and register as a temp view (idempotent).

        The loaded DataFrame is cached per instance: every ``griddb_sql``
        call does a ``register_all()``, and re-reading parquet footers for
        ten containers per statement is a real driver-side constant cost
        (at 100 TB a footer/file listing spans many thousands of files).
        The temp view is (re-)asserted only when this catalog's base_dir
        does not currently own the session-global view name."""
        if self.acl is not None:
            self.acl.authorize(self.acl_user, self.db_name, "READ")
        df = self._df_cache.get(name)
        if df is None:
            df = self.load(name)
            self._df_cache[name] = df
        owners = _owners(self.spark)
        if owners.get(name) != self.base_dir:
            df.createOrReplaceTempView(name)
            owners[name] = self.base_dir
        self._registered.add(name)
        return df

    def register_all(self, names: tuple[str, ...] = KNOWN_TABLES) -> None:
        # The cache skip below bypasses table()/load(), so the READ check
        # must happen here too — _df_cache is shared across with_access()
        # views, and a warm cache must never let an unauthorized user read.
        if self.acl is not None:
            self.acl.authorize(self.acl_user, self.db_name, "READ")
        owners = _owners(self.spark)
        for name in names:
            if name in self._df_cache and owners.get(name) == self.base_dir:
                continue
            if os.path.exists(self.path(name)):
                self.table(name)

    def invalidate(self, name: str | None = None) -> None:
        """Drop cached DataFrames/view ownership for ``name`` (or all
        containers) — call after a container directory is rewritten in
        place so the next table()/load() re-reads the new file listing
        (the cached plan pins the parquet files seen at first load)."""
        owners = _owners(self.spark)
        names = [name] if name is not None else sorted(
            set(self._df_cache) | set(self._nano_cache) | set(owners)
            | self._registered
        )
        for n in names:
            self._df_cache.pop(n, None)
            self._nano_cache.pop(n, None)
            owners.pop(n, None)
            self._registered.discard(n)

    def dim(self, name: str) -> DataFrame:
        """A dimension table, broadcast-hinted when it is known-small."""
        df = self.table(name)
        return F.broadcast(df) if name in BROADCAST_TABLES else df

    # -- meta tables (GridDB #tables / #columns, meta_store.cpp) ----------
    def meta_tables(self) -> DataFrame:
        rows = [
            (n, "TIME_SERIES" if n == "events" else "COLLECTION", self.path(n))
            for n in KNOWN_TABLES
            if os.path.exists(self.path(n))
        ]
        return self.spark.createDataFrame(
            rows, "table_name string, container_type string, location string"
        )

    def meta_columns(self, name: str) -> DataFrame:
        df = self.load(name)
        rows = [
            (name, i, f.name, f.dataType.simpleString(), f.nullable)
            for i, f in enumerate(df.schema.fields)
        ]
        return self.spark.createDataFrame(
            rows,
            "table_name string, ordinal int, column_name string, "
            "column_type string, nullable boolean",
        )

    def meta_columns_all(self) -> DataFrame:
        """#columns over every registered container — one DataFrame, no
        per-table unions (metadata is driver-side by nature; the schema
        comes from parquet footers, not a data scan)."""
        rows = []
        for name in KNOWN_TABLES:
            if not os.path.exists(self.path(name)):
                continue
            df = self.load(name)
            rows += [
                (name, i, f.name, f.dataType.simpleString(), f.nullable)
                for i, f in enumerate(df.schema.fields)
            ]
        return self.spark.createDataFrame(
            rows,
            "table_name string, ordinal int, column_name string, "
            "column_type string, nullable boolean",
        )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort_cols: "tuple[str, ...] | None" = None,
) -> None:
    """Persist ``df`` as a BUCKETED table: rows hash-cluster into
    ``n_buckets`` files by ``key`` at write time, so every later join or
    aggregation on that key is CO-LOCATED — Catalyst reads the bucket
    layout (``Bucketed: true`` scans) and plans the join with ZERO
    exchange on the bucketed side(s). At 100 TB this converts the
    recurring fact⋈fact shuffle (the single most expensive exchange in
    a star-schema workload) into a one-time write-side clustering — the
    Spark analog of GridDB keeping a table's sub-containers
    hash-partitioned by the affinity key (sql_parser.h:300-303).

    ``sort_cols`` additionally sorts within buckets (sorted-merge joins
    skip the sort stage too). Pair the bucket count across tables that
    join together.
    """
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a managed location orphaned by another session blocks saveAsTable
    # (LOCATION_ALREADY_EXISTS) even in overwrite mode — clear it
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if wh.startswith("file:"):
        wh = wh[len("file:"):]
    shutil.rmtree(os.path.join(wh, table.lower()), ignore_errors=True)
    # cluster writer tasks on the bucket key first: otherwise every task
    # writes a sliver into every bucket (tasks × buckets small files), and
    # the scan only trusts within-bucket ORDER (skipping the SMJ sort)
    # when each bucket holds a single file
    w = (df.repartition(n_buckets, F.col(key))
         .write.mode("overwrite").format("parquet")
         .bucketBy(n_buckets, key))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two bucketed tables on their bucket keys — a sort-merge join
    with no exchange on either side (both inputs arrive pre-clustered).
    The MERGE hint keeps the planner from broadcasting a small side,
    which would hide the co-location (and stops scaling when the 'small'
    side grows past the driver)."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    return lt.join(rt, F.col(left_key) == F.col(right_key))

"""NoSQL container API veneer — GridDB's client surface over DataFrames.

Mirrors the Java client (reference ``java_client/src/com/toshiba/mwcloud/gs/
Container.java:437-898``, ``TimeSeries.java:136-617``, statement types
``cluster_event_type.h:135-196``): ``put/get/remove`` by row key, multi-get,
TQL ``query``, and the TimeSeries extras ``get(t, TimeOperator)``,
``interpolate``, ``aggregate``, ``sample``.

Semantics notes:
- ``put`` is insert-or-update on the row key (GridDB putRow,
  ``base_container.cpp``). Batch-scale implementation: union + last-write-
  wins dedup by key (window on key, newest generation first). On a real
  deployment the same operation is a Delta ``MERGE``; plain parquet is the
  testbed here.
- A TimeSeries container's row key is its timestamp column
  (``data_store_common.h:220-224``).

Point lookups (``get``) are filter queries — Spark serves them through
partition pruning + predicate pushdown rather than a B-tree, which is the
right trade at analytics scale (SURVEY §1.3).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from griddb_spark.operators import timeseries as ts_ops


class Collection:
    """A COLLECTION container (data_store_common.h:221)."""

    container_type = "COLLECTION"

    def __init__(self, name: str, df: DataFrame,
                 row_key: str | Sequence[str] | None = None):
        self.name = name
        self._df = df
        self.row_key = row_key
        self._generation = 0

    @property
    def key_cols(self) -> list[str]:
        """Row-key columns (composite keys allowed, message_schema.cpp)."""
        if self.row_key is None:
            return []
        if isinstance(self.row_key, str):
            return [self.row_key]
        return list(self.row_key)

    # -- data access -------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    def to_df(self) -> DataFrame:
        return self._df

    def get(self, key) -> DataFrame:
        self._require_key()
        return self._df.filter(self._key_eq(key))

    def multi_get(self, keys: Iterable) -> DataFrame:
        """multiGet with a key list (RowKeyPredicate distinct-keys form).

        Composite keys (CompositeKeyMultiGet.java sample) are passed as
        tuples. Point lookups stay an IN / OR-of-ANDs filter that pushes
        down into the parquet scan — never a driver-side loop.
        """
        self._require_key()
        cols = self.key_cols
        if len(cols) == 1:
            return self._df.filter(F.col(cols[0]).isin(list(keys)))
        conds = [self._key_eq(k) for k in keys]
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return self._df.filter(out)

    def _key_eq(self, key):
        cols = self.key_cols
        if len(cols) == 1:
            return F.col(cols[0]) == F.lit(key)
        if len(key) != len(cols):
            raise ValueError(f"composite key arity {len(key)} != {len(cols)}")
        cond = F.col(cols[0]) == F.lit(key[0])
        for c, v in zip(cols[1:], key[1:]):
            cond = cond & (F.col(c) == F.lit(v))
        return cond

    def fetch(self, df: DataFrame | None = None, limit: int | None = None,
              partial: bool = False, fetch_size: int | None = None):
        """ResultSet fetch (result_set.cpp partial-execution mode).

        ``partial=True`` returns a row iterator (``toLocalIterator`` — the
        suspended-cursor analog: partitions stream to the driver on demand
        instead of one full collect); else a collected list.

        ``fetch_size`` (with ``partial=True``) yields size-bounded PAGES
        of rows instead of single rows — the ``ResultSet`` fetch-size page
        contract (``result_set.cpp`` suspended-cursor sizing): each page
        materializes at most ``fetch_size`` rows driver-side, and the
        underlying partition stream is still pulled on demand, so a 10⁹-row
        result is walked in bounded memory.
        """
        d = df if df is not None else self._df
        if limit is not None:
            d = d.limit(limit)
        if not partial:
            return d.collect()
        it = d.toLocalIterator()
        if fetch_size is None:
            return it
        if fetch_size <= 0:
            raise ValueError(f"fetch_size must be > 0, got {fetch_size}")

        def pages():
            page = []
            for row in it:
                page.append(row)
                if len(page) >= fetch_size:
                    yield page
                    page = []
            if page:
                yield page

        return pages()

    def multi_get_range(self, start=None, end=None) -> DataFrame:
        """multiGet with a RowKeyPredicate range."""
        self._require_key()
        first = self.key_cols[0]
        out = self._df
        if start is not None:
            out = out.filter(F.col(first) >= F.lit(start))
        if end is not None:
            out = out.filter(F.col(first) <= F.lit(end))
        return out

    # -- mutation (insert-or-update by row key) ------------------------------

    #: compact the mutation lineage every N generations: each put/remove
    #: stacks a union + window-dedup (or a filter) on the previous plan, so
    #: a long-lived container would otherwise grow an unbounded plan tree —
    #: analysis cost per fetch climbs with every put, and one action
    #: replays every generation. ``localCheckpoint`` materializes current
    #: state and truncates the lineage back to a leaf, bounding both.
    COMPACT_EVERY = 16

    def _maybe_compact(self) -> None:
        if self._generation % self.COMPACT_EVERY == 0:
            self._df = self._df.localCheckpoint(eager=True)

    def put(self, rows: DataFrame | Sequence[dict]) -> "Collection":
        new = self._as_df(rows)
        self._generation += 1
        if self.row_key is None:
            self._df = self._df.unionByName(new)
            self._maybe_compact()
            return self
        old = self._df.withColumn("__gen", F.lit(0))
        incoming = new.withColumn("__gen", F.lit(self._generation))
        w = Window.partitionBy(self.row_key).orderBy(F.col("__gen").desc())
        self._df = (
            old.unionByName(incoming)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__gen")
        )
        self._maybe_compact()
        return self

    def remove(self, key) -> "Collection":
        self._require_key()
        self._generation += 1
        self._df = self._df.filter(~self._key_eq(key))
        self._maybe_compact()
        return self

    # -- pandas-facing surface (5.8 Python NoSQL interface enhancements:
    #    the python_client gained DataFrame/NumPy integration —
    #    GridDB-5.8-CE-RELEASE_NOTES.md "Python NoSQL Interface
    #    Enhancements", github.com/griddb/python_client) ------------------

    def put_rows(self, pdf) -> "Collection":
        """Ingest a pandas DataFrame in ONE Arrow-backed conversion under
        the container's own schema (never a per-row Python put loop —
        the 5.8 python_client's DataFrame put shape)."""
        spark = self._df.sparkSession
        cols = [f.name for f in self._df.schema.fields]
        missing = [c for c in cols if c not in pdf.columns]
        if missing:
            raise ValueError(f"pandas frame missing columns: {missing}")
        return self.put(spark.createDataFrame(pdf[cols], schema=self._df.schema))

    def fetch_rows(self, limit: int | None = None):
        """The container's rows as a pandas DataFrame (Arrow transfer —
        the 5.8 python_client's fetch-into-DataFrame shape). ``limit``
        bounds the driver-side materialization; omit it only for
        driver-sized containers."""
        df = self._df.limit(limit) if limit is not None else self._df
        return df.toPandas()

    # -- query ---------------------------------------------------------------
    def query(self, tql: str) -> DataFrame:
        """Run a TQL statement against this container."""
        from griddb_spark.sql.tql import run_tql

        return run_tql(self, tql)

    # -- helpers --------------------------------------------------------------
    def _as_df(self, rows) -> DataFrame:
        if isinstance(rows, DataFrame):
            return rows
        spark = self._df.sparkSession
        return spark.createDataFrame(list(rows), schema=self._df.schema)

    def _require_key(self) -> None:
        if self.row_key is None:
            raise ValueError(f"container {self.name!r} has no row key")


class TimeSeries(Collection):
    """A TIME_SERIES container — mandatory TIMESTAMP row key
    (data_store_common.h:223, time_series.cpp)."""

    container_type = "TIME_SERIES"

    def __init__(self, name: str, df: DataFrame, ts_col: str = "ts"):
        super().__init__(name, df, row_key=ts_col)
        self.ts_col = ts_col
        self.expiration = None

    def append(self, rows) -> "TimeSeries":
        """TimeSeries.append — put with the timestamp as key."""
        self.put(rows)
        return self

    def set_row_expiration(self, count: int, unit: str,
                           division_count: int = 8,
                           now_ms: int | None = None) -> "TimeSeries":
        """TimeSeriesProperties.setRowExpiration(count, unit) +
        setExpirationDivisionCount (TimeSeriesRowExpiration.java:55-57).

        In-memory containers apply the visibility cutoff to the wrapped
        DataFrame; parquet-backed containers (``dml.DmlTable`` with an
        ``expiration``) additionally release wholly-expired range
        partitions via ``vacuum_expired``. ``now_ms`` pins the clock for
        deterministic tests/oracles.
        """
        from griddb_spark.dml import RowExpiration

        exp = RowExpiration(count, unit, division_count, now_ms)
        self.expiration = exp
        self._df = self._df.filter(exp.visible(self.ts_col))
        return self

    def get_at(self, t, time_op: str = "PREVIOUS") -> DataFrame:
        """get(t, TimeOperator) — TimeOperator.java:42-69."""
        op = time_op.upper()
        if op == "PREVIOUS":
            return ts_ops.time_prev(self._df, t, self.ts_col)
        if op == "PREVIOUS_ONLY":
            return ts_ops.time_prev(self._df, t, self.ts_col, only=True)
        if op == "NEXT":
            return ts_ops.time_next(self._df, t, self.ts_col)
        if op == "NEXT_ONLY":
            return ts_ops.time_next(self._df, t, self.ts_col, only=True)
        raise ValueError(f"unknown TimeOperator {time_op!r}")

    def interpolate(self, t, column: str) -> DataFrame:
        """interpolate(t, col) — TimeSeries.java, LINEAR interpolation."""
        return ts_ops.time_interpolated(self._df, t, column, self.ts_col)

    def aggregate(self, start, end, column: str, aggregation: str) -> DataFrame:
        """aggregate(start, end, col, Aggregation) — Aggregation.java:72-198."""
        return ts_ops.aggregate_time_range(
            self._df, start, end, column, aggregation, self.ts_col)

    def sample(self, start, end, interval: int, unit: str,
               column: str | None = None,
               mode: str = "LINEAR_OR_PREVIOUS") -> DataFrame:
        """TQL TIME_SAMPLING / client sampling query.

        ``mode`` is the client InterpolationMode (InterpolationMode.java):
        LINEAR_OR_PREVIOUS interpolates ``column`` linearly and takes the
        previous row for other fields; EMPTY emits type-default empty
        values at unmatched grid points (TimeSeries::sampleWithoutInterp).
        """
        if mode.upper() == "EMPTY":
            return ts_ops.time_sampling_no_interp(
                self._df, start, end, interval, unit, self.ts_col)
        return ts_ops.time_sampling(
            self._df, start, end, interval, unit, column, self.ts_col)

    def query_range(self, start, end) -> DataFrame:
        """query(start, end) — half-open [start, end) range per the client."""
        out = self._df
        if start is not None:
            out = out.filter(F.col(self.ts_col) >= F.lit(start))
        if end is not None:
            out = out.filter(F.col(self.ts_col) < F.lit(end))
        return out


class GridStore:
    """Factory + registry, the GridStore/StoreFactory analog."""

    def __init__(self, spark: SparkSession, base_dir: str | None = None):
        from griddb_spark.catalog import ContainerCatalog

        self.spark = spark
        self.catalog = ContainerCatalog(spark, base_dir) if base_dir else None
        self._containers: dict[str, Collection] = {}
        self._indexes: dict[tuple[str, str], str] = {}

    def put_container(self, name: str, df: DataFrame, *,
                      container_type: str = "COLLECTION",
                      row_key: str | Sequence[str] | None = None) -> Collection:
        if container_type.upper() == "TIME_SERIES":
            c: Collection = TimeSeries(name, df, ts_col=row_key or "ts")
        else:
            c = Collection(name, df, row_key=row_key)
        self._containers[name] = c
        return c

    def get_container(self, name: str) -> Collection:
        if name in self._containers:
            return self._containers[name]
        if self.catalog is None:
            raise KeyError(name)
        df = self.catalog.table(name)
        c = (
            TimeSeries(name, df, ts_col="ts")
            if "ts" in df.columns
            else Collection(name, df)
        )
        self._containers[name] = c
        return c

    def drop_container(self, name: str) -> None:
        self._containers.pop(name, None)
        self._indexes = {
            k: v for k, v in self._indexes.items() if k[0] != name
        }

    # -- database DDL (CREATE/DROP DATABASE, sql_parser.h:239-240) ---------
    def create_database(self, name: str) -> None:
        """CREATE DATABASE (``sql_parser.h:239``) — a GridDB database is a
        container namespace; the Spark-native equivalent is a catalog
        database (namespace), so the DDL maps 1:1."""
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{name}`")

    def drop_database(self, name: str) -> None:
        """DROP DATABASE (``sql_parser.h:240``)."""
        self.spark.sql(f"DROP DATABASE IF EXISTS `{name}` CASCADE")

    def databases(self) -> DataFrame:
        """#databases meta table (``meta_store.cpp:1470``): columns
        database_id (long), database_name (string)
        (``meta_type.h`` DATABASE_DATABASE_ID/_NAME). GridDB's id is an
        internal surrogate; the deterministic stand-in is a dense rank
        over the name — stable across sessions for the same namespace
        set."""
        names = self.spark.sql("SHOW DATABASES").select(
            F.col("namespace").alias("database_name")
        )
        return names.select(
            F.row_number()
            .over(Window.orderBy("database_name"))
            .cast("long")
            .alias("database_id"),
            "database_name",
        )

    # -- index DDL (CREATE/DROP INDEX, sql_processor_ddl.cpp;
    #    IndexType {TREE_RANGE, TREE_EQ}, sql_type.h:279-285) --------------
    def create_index(
        self, container: str, column: str, index_type: str = "TREE"
    ) -> None:
        """CREATE INDEX. On Spark an index is a scan-pruning property, not
        a data structure: a TREE (range) index maps to partition pruning +
        parquet min/max row-group skipping on the column; the metadata is
        recorded here and served through ``index_info`` (the #index_info
        meta table, ``meta_type.h:712-731``)."""
        self._indexes[(container, column)] = index_type.upper()

    def drop_index(self, container: str, column: str) -> None:
        self._indexes.pop((container, column), None)

    def primary_keys(self) -> DataFrame:
        """#primary_keys meta table (``meta_store.cpp:1068-1073``):
        (database_name, table_name, column_name, key_seq) — one row per
        row-key column of each registered container; composite keys emit
        one row per component with 1-based key_seq
        (``meta_type.h`` COLUMN_KEY_SEQUENCE)."""
        rows = [
            ("public", name, col, seq)
            for name, c in sorted(self._containers.items())
            for seq, col in enumerate(c.key_cols, start=1)
        ]
        return self.spark.createDataFrame(
            rows,
            "database_name string, table_name string, column_name string, "
            "key_seq int",
        )

    def index_info(self) -> DataFrame:
        """#index_info meta table: declared indexes + the physical scan
        property each maps to."""
        rows = [
            (c, col, t, "partition_pruning+parquet_minmax_skip")
            for (c, col), t in sorted(self._indexes.items())
        ]
        return self.spark.createDataFrame(
            rows,
            "container_name string, column_name string, index_type string, "
            "physical_equivalent string",
        )

    def statement_resources(self) -> DataFrame:
        """#statement_resources meta table (5.7 SQL memory monitoring,
        ``meta_store.cpp:779-798``, GridDB-5.7-CE-RELEASE_NOTES.md):
        resource statistics for running statements.

        Spark mapping: one row for the session itself plus one per active
        job (a GridDB "statement" distributes as a job here). memory_use =
        driver JVM heap in use; available_concurrency = scheduler slots;
        data_store_access is not separable from executor metrics in local
        mode and reports 0. Column set mirrors the reference order.
        """
        sc = self.spark.sparkContext
        conf = sc.getConf()
        host = conf.get("spark.driver.host", "127.0.0.1")
        port = int(conf.get("spark.driver.port", "0"))
        rt = self.spark._jvm.java.lang.Runtime.getRuntime()
        mem = int(rt.totalMemory() - rt.freeMemory())
        import datetime as _dt
        import time as _time

        now_ms = int(_time.time() * 1000)
        start = _dt.datetime.fromtimestamp(sc.startTime / 1000.0)
        para = sc.defaultParallelism
        app = sc.appName
        user = sc.sparkUser()
        rows = [
            (f"{sc.applicationId}:session", host, port, None, None, user,
             app, "SESSION", start, now_ms - sc.startTime, mem, 0, 0, 0, 0,
             para, None, None)
        ]
        st = sc.statusTracker()
        for jid in st.getActiveJobsIds():
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            rows.append(
                (f"{sc.applicationId}:job-{jid}", host, port, None, None,
                 user, app, "QUERY", start, 0, mem, 0, 0, 0, 0, para, None,
                 f"job {jid}: stages {list(ji.stageIds)}")
            )
        # governed statements (5.7 /sql/totalMemoryLimit — governor.py):
        # resource_restrictions carries the GridDB config keys + outcome,
        # memory_use the observed per-statement working set
        from griddb_spark.governor import statement_records

        for rec in statement_records():
            rows.append(
                (rec.request_id, host, port, None, None, user, app, "SQL",
                 _dt.datetime.fromtimestamp(rec.started_ms / 1000.0),
                 (rec.finished_ms or now_ms) - rec.started_ms,
                 rec.working_memory_bytes, rec.store_bytes,
                 rec.io_bytes, rec.network_bytes, 0, para,
                 "totalMemoryLimit=%d;failOnTotalMemoryLimit=%s;"
                 "resourceControlLevel=%d;pool=%s;status=%s"
                 % (rec.limit_bytes,
                    "true" if rec.fail_on_limit else "false",
                    rec.control_level, rec.pool or "default", rec.status),
                 rec.statement or None)
            )
        return self.spark.createDataFrame(
            rows,
            "request_id string, node_address string, node_port int, "
            "connection_address string, connection_port int, "
            "user_name string, application_name string, "
            "statement_type string, start_time timestamp, actual_time long, "
            "memory_use long, sql_store_use long, data_store_access long, "
            "network_transfer_size long, network_time long, "
            "available_concurrency long, resource_restrictions string, "
            "statement string",
        )

    def task_resources(self) -> DataFrame:
        """#task_resources meta table (5.7, ``meta_store.cpp:800-816``):
        per-distributed-task resource statistics — a GridDB task maps to a
        Spark stage. Emits one row per active stage (idle sessions emit
        zero rows, matching the reference's running-only semantics)."""
        sc = self.spark.sparkContext
        conf = sc.getConf()
        host = conf.get("spark.driver.host", "127.0.0.1")
        port = int(conf.get("spark.driver.port", "0"))
        rt = self.spark._jvm.java.lang.Runtime.getRuntime()
        mem = int(rt.totalMemory() - rt.freeMemory())
        st = sc.statusTracker()
        rows = []
        for jid in st.getActiveJobsIds():
            ji = st.getJobInfo(jid)
            if ji is None:
                continue
            for ordinal, sid in enumerate(ji.stageIds):
                si = st.getStageInfo(sid)
                if si is None:
                    continue
                rows.append(
                    (f"{sc.applicationId}:job-{jid}", jid, ordinal, host,
                     port, si.name, 0, 0, mem, 0, 0, 0, 0,
                     f"tasks {si.numActiveTasks}/{si.numTasks} "
                     f"completed {si.numCompletedTasks}")
                )
        return self.spark.createDataFrame(
            rows,
            "request_id string, job_ordinal long, task_ordinal int, "
            "node_address string, node_port int, task_type string, "
            "lead_time long, actual_time long, memory_use long, "
            "sql_store_use long, data_store_access long, "
            "network_transfer_size long, network_time long, plan string",
        )

    def statement_events(self) -> DataFrame:
        """#statement_events: the 5.9 resource-monitoring event stream —
        "The new scheduler can monitor detailed SQL resource usage ...
        and output it to event logs or meta tables"
        (GridDB-5.9-CE-RELEASE_NOTES.md, Resource Monitoring). One row per
        governed-statement lifecycle event: STMT_START, STMT_DONE,
        STMT_FAIL, STMT_STOP_MEMORY_LIMIT (the event-log line GridDB
        writes when a statement is forcibly stopped on the memory limit),
        and the STMT_MONITOR_{MEMORY,STORE,NETWORK,DATASTORE} warnings
        the 5.9 /sql/monitoring*Rate thresholds produce.
        Driver-side history only — no distributed work to serve it."""
        import datetime as _dt

        from griddb_spark.governor import statement_events

        rows = [
            (_dt.datetime.fromtimestamp(e.ts_ms / 1000.0), e.request_id,
             e.event_type, e.detail)
            for e in statement_events()
        ]
        return self.spark.createDataFrame(
            rows,
            "event_time timestamp, request_id string, event_type string, "
            "detail string",
        )

    # -- batch query / batch mutation (GridStore.fetchAll / multiPut,
    #    GET_MULTIPLE_CONTAINER_ROWS / PUT_MULTIPLE_CONTAINER_ROWS,
    #    cluster_event_type.h:135-196; SampleFetchAll / SampleMultiPut) ----
    def fetch_all(self, queries: Sequence[tuple[str, str]],
                  tag_col: str | None = None) -> list[DataFrame]:
        """GridStore.fetchAll(List<Query>) — execute several TQL queries,
        possibly over different containers, as one batch.

        The reference client ships all statements in a single request and
        the server fans them out per partition owner; the Spark analog is
        one job whose stages share the session's scheduler (each returned
        plan is lazy — a caller that unions or writes them gets a single
        DAG, so common scans dedupe via ReuseExchange rather than
        re-reading per query). ``tag_col`` adds a literal column naming the
        source container on each result, the usual prelude to a union.
        """
        out = []
        for name, tql in queries:
            df = self.get_container(name).query(tql)
            if tag_col is not None:
                df = df.select(F.lit(name).alias(tag_col), "*")
            out.append(df)
        return out

    def multi_put(self, rows_by_container: dict[str, "DataFrame | Sequence[dict]"]
                  ) -> "GridStore":
        """GridStore.multiPut — batch insert-or-update across containers
        (PUT_MULTIPLE_CONTAINER_ROWS). Each container applies its own
        row-key upsert semantics (``Collection.put``); containers without
        a key append. One call, N lazy upsert plans — nothing executes
        until each container's DataFrame is consumed."""
        for name, rows in rows_by_container.items():
            self.get_container(name).put(rows)
        return self

    # -- export/import (the gs_export / gs_import CLI surface) --------------

    #: GridDB storeCompressionMode (gs_node.json, 5.6:
    #: GridDB-5.6-CE-RELEASE_NOTES.md "Compression algorithm enhancement")
    #: → parquet codec. ZLIB maps to gzip (same DEFLATE stream); ZSTD is
    #: native in parquet.
    COMPRESSION_MODES = {
        "NO_COMPRESSION": "uncompressed",
        "COMPRESSION": "gzip",
        "COMPRESSION_ZLIB": "gzip",
        "COMPRESSION_ZSTD": "zstd",
    }

    def export_container(self, name: str, path: str, fmt: str = "parquet",
                         mode: str = "overwrite",
                         compression: str | None = None) -> None:
        """Write a container out as parquet/csv/json (GridDB ships CSV
        export via the gs_export tool; Spark's writers cover all three).
        CSV/JSON writers get an explicit header/schema so a re-import
        round-trips losslessly. ``compression`` takes a GridDB
        storeCompressionMode name (``COMPRESSION_ZSTD`` etc.) or a raw
        parquet codec."""
        df = self.get_container(name).df
        w = df.write.mode(mode)
        if compression is not None:
            codec = self.COMPRESSION_MODES.get(compression.upper(),
                                               compression.lower())
            w = w.option("compression", codec)
        if fmt == "csv":
            w.option("header", True).option("timestampFormat",
                                            "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            w.csv(path)
        elif fmt == "json":
            w.json(path)
        else:
            w.parquet(path)

    def import_container(self, name: str, path: str, fmt: str = "parquet",
                         schema=None, row_key: str | None = None) -> Collection:
        """Read an exported container back (gs_import). ``schema`` pins
        CSV/JSON column types — pass the original DataFrame schema for an
        exact round-trip (CSV/JSON inference widens types otherwise)."""
        r = self.spark.read
        if schema is not None:
            r = r.schema(schema)
        if fmt == "csv":
            df = r.option("header", True).option(
                "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").csv(path)
        elif fmt == "json":
            df = r.json(path)
        else:
            df = r.parquet(path)
        return self.put_container(name, df, row_key=row_key)

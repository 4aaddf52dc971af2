"""DBAPI2 (PEP 249) access layer over the GridDB SQL front-end.

GridDB 5.7 ships Python DBAPI2 samples against its JDBC/WebAPI surface
(GridDB-5.7-CE-RELEASE_NOTES.md — Python/Node.js SQL API additions); the
cursor/connection idiom here is the same contract served by
:func:`griddb_spark.sql.translate.griddb_sql` (statements, ``?``
placeholders — EXPR_PLACEHOLDER, ``sql_type.h:42-92``) and the
ResultSet partial-fetch machinery (``result_set.cpp`` suspended cursor →
``toLocalIterator`` paging).

Scale posture: a cursor never collects the full result — rows stream to
the driver partition-by-partition (``toLocalIterator``), so
``fetchmany(n)`` walks a billion-row result in bounded driver memory.
``executemany`` on an INSERT maps to the 5.5 batch-update path (ONE
distributed append for the whole batch, not N commits).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import SparkSession

apilevel = "2.0"
threadsafety = 1  # threads may share the module, not connections
paramstyle = "qmark"  # GridDB '?' placeholders


# -- exception hierarchy (PEP 249) --------------------------------------
class Warning(Exception):  # noqa: A001 - PEP 249 mandates the name
    pass


class Error(Exception):
    pass


class InterfaceError(Error):
    pass


class DatabaseError(Error):
    pass


class DataError(DatabaseError):
    pass


class OperationalError(DatabaseError):
    pass


class IntegrityError(DatabaseError):
    pass


class InternalError(DatabaseError):
    pass


class ProgrammingError(DatabaseError):
    pass


class NotSupportedError(DatabaseError):
    pass


# -- type objects + constructors (PEP 249) ------------------------------
class _TypeObject:
    def __init__(self, name: str, *dtypes: str):
        self.name = name
        self._dtypes = set(dtypes)

    def __eq__(self, other):
        if isinstance(other, _TypeObject):
            return other is self
        return other in self._dtypes

    def __hash__(self):
        return hash(self.name)

    def __repr__(self):
        return f"<dbapi type {self.name}>"


STRING = _TypeObject("STRING", "string")
BINARY = _TypeObject("BINARY", "binary")
NUMBER = _TypeObject(
    "NUMBER", "tinyint", "smallint", "int", "bigint", "float", "double",
    "decimal", "boolean",
)
DATETIME = _TypeObject(
    "DATETIME", "date", "timestamp", "timestamp_ntz")
ROWID = _TypeObject("ROWID")

Date = _dt.date
Time = _dt.time
Timestamp = _dt.datetime
Binary = bytes


def DateFromTicks(ticks):
    return _dt.date.fromtimestamp(ticks)


def TimeFromTicks(ticks):
    return _dt.datetime.fromtimestamp(ticks).time()


def TimestampFromTicks(ticks):
    return _dt.datetime.fromtimestamp(ticks)


def _type_of(simple: str) -> _TypeObject:
    base = simple.split("(")[0]
    for t in (STRING, BINARY, NUMBER, DATETIME):
        if base in t._dtypes:
            return t
    return STRING


class Cursor:
    """PEP 249 cursor over griddb_sql. Results stream (never a full
    collect); ``description``/``rowcount`` follow the spec."""

    def __init__(self, connection: "Connection"):
        self._conn = connection
        self.arraysize = 100
        self._reset()

    def _reset(self):
        self._iter = None
        self._df = None
        self.description = None
        self.rowcount = -1
        self.lastrowid = None

    def _check(self):
        if self._conn is None:
            raise InterfaceError("cursor is closed")

    # -- execution ----------------------------------------------------
    def execute(self, operation: str, parameters=None) -> "Cursor":
        self._check()
        from griddb_spark.sql.translate import griddb_sql

        self._reset()
        params = list(parameters) if parameters is not None else None
        try:
            df = griddb_sql(
                self._conn._spark, self._conn._catalog, operation,
                params=params,
            )
        except Error:
            raise
        except Exception as exc:
            raise ProgrammingError(str(exc)) from exc
        self._df = df
        self.description = [
            (f.name, _type_of(f.dataType.simpleString()), None, None, None,
             None, f.nullable)
            for f in df.schema.fields
        ]
        self._iter = df.toLocalIterator()
        return self

    def executemany(self, operation: str, seq_of_parameters) -> "Cursor":
        """Batched execution. INSERT statements route through the 5.5
        batch-update path: every bind lands in ONE distributed append."""
        self._check()
        from griddb_spark.sql.translate import PreparedStatement

        self._reset()
        ps = PreparedStatement(
            self._conn._spark, self._conn._catalog, operation,
            tables=self._conn._tables,
        )
        if ps._insert is None:
            for params in seq_of_parameters:
                self.execute(operation, params)
            return self
        for params in seq_of_parameters:
            ps.add_batch(*params)
        counts = ps.execute_batch()
        self.rowcount = sum(counts)
        return self

    # -- fetching -----------------------------------------------------
    def _require_result(self):
        self._check()
        if self._iter is None:
            raise ProgrammingError("no result set: call execute() first")

    def fetchone(self):
        self._require_result()
        try:
            row = next(self._iter)
        except StopIteration:
            return None
        return tuple(row)

    def fetchmany(self, size: int | None = None):
        self._require_result()
        n = self.arraysize if size is None else size
        if n <= 0:
            raise ProgrammingError(f"fetch size must be > 0, got {n}")
        out = []
        for row in self._iter:
            out.append(tuple(row))
            if len(out) >= n:
                break
        return out

    def fetchall(self):
        self._require_result()
        return [tuple(r) for r in self._iter]

    def __iter__(self):
        self._require_result()
        return (tuple(r) for r in self._iter)

    # -- spec niceties -------------------------------------------------
    def setinputsizes(self, sizes):
        pass

    def setoutputsize(self, size, column=None):
        pass

    def close(self):
        self._reset()
        self._conn = None


class Connection:
    """PEP 249 connection bound to a SparkSession + container catalog."""

    Warning = Warning
    Error = Error
    InterfaceError = InterfaceError
    DatabaseError = DatabaseError
    DataError = DataError
    OperationalError = OperationalError
    IntegrityError = IntegrityError
    InternalError = InternalError
    ProgrammingError = ProgrammingError
    NotSupportedError = NotSupportedError

    def __init__(self, spark: SparkSession, catalog, tables=None):
        self._spark = spark
        self._catalog = catalog
        self._tables = tables or {}
        self._closed = False

    def cursor(self) -> Cursor:
        if self._closed:
            raise InterfaceError("connection is closed")
        return Cursor(self)

    def commit(self):
        """Autocommit semantics: GridDB SQL (and every write path here)
        commits per statement; commit() is a spec-mandated no-op."""
        if self._closed:
            raise InterfaceError("connection is closed")

    def rollback(self):
        raise NotSupportedError(
            "autocommit per statement; rollback is not supported"
        )

    def close(self):
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def connect(spark: SparkSession, sf_dir_or_catalog, tables=None
            ) -> Connection:
    """Open a DBAPI2 connection. ``sf_dir_or_catalog`` is a container
    directory (a catalog is built over it) or a ready ContainerCatalog;
    ``tables`` optionally binds writable containers (DmlTable) by name
    for executemany-INSERT."""
    from griddb_spark import workload

    if isinstance(sf_dir_or_catalog, str):
        catalog = workload.cat(spark, sf_dir_or_catalog)
    else:
        catalog = sf_dir_or_catalog
    return Connection(spark, catalog, tables=tables)

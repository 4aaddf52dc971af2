"""DML over containers: INSERT / UPDATE / DELETE + partitioned tables.

Reference: EXEC_INSERT/UPDATE/DELETE plan nodes execute row mutations
through the NoSQL store (``sql_processor_dml.cpp``); SQL-level partitioned
tables shard a logical table by HASH / RANGE(interval) / RANGE_HASH
(``sql_parser.h:300-303``, ``CREATE TABLE ... PARTITION BY RANGE(col)
EVERY(n, unit)``).

Spark mapping — parquet-backed containers:

- INSERT → append write (``fastInsert``'s job-bypass shortcut is simply
  Spark's direct file append).
- UPDATE/DELETE → read-rewrite of the container (on a production lake this
  is Delta/Iceberg ``MERGE``/``DELETE``; the plan shape — predicate-pruned
  scan, projected mutation, partition-wise overwrite — is identical).
- PARTITION BY HASH(col, n) → derived bucket column ``hash(col) % n``;
  PARTITION BY RANGE(col) EVERY(n, unit) → ``date_trunc``/arithmetic
  bucket column; both written Hive-style so partition pruning is native
  (the Spark analog of GridDB's NarrowingKey sub-container pruning,
  ``sql_compiler.h:3101-3135``).

UPDATE/DELETE rewrite only the partitions whose rows match when the
container is partitioned — at 100 TB that is the difference between a
full-table rewrite and touching a handful of partitions.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from griddb_spark.operators.timeseries import UNIT_MS

PARTITION_COL = "__part"
SUBPART_COL = "__subpart"

#: Marker file (underscore-prefixed, so parquet readers ignore it) recording
#: that this table's files may carry HETEROGENEOUS schemas (alter_add_column
#: appends a zero-row widened file instead of rewriting data). Reads need
#: ``mergeSchema`` ONLY then: an unconditional mergeSchema read footer-merges
#: every file on every scan — O(files) planning work that at 100 TB (millions
#: of part-files) dwarfs the query, for a table that was never altered.
SCHEMA_EVOLVED_MARKER = "_schema_evolved"

#: GridDB DDL type names (``data_store_common.h:136-165``) → Spark SQL types.
GRIDDB_TYPES = {
    "STRING": "string", "BOOL": "boolean", "BYTE": "tinyint",
    "SHORT": "smallint", "INTEGER": "int", "LONG": "bigint",
    "FLOAT": "float", "DOUBLE": "double", "TIMESTAMP": "timestamp",
    "BLOB": "binary",
}


class RowExpiration:
    """TimeSeries row expiration (``TimeSeriesProperties.setRowExpiration``
    + ``setExpirationDivisionCount``, sample
    ``sample/guide/ja/TimeSeriesRowExpiration.java:55-57``).

    GridDB semantics, mapped 1:1: rows older than ``now - period`` are
    *immediately invisible* to every read (row-exact cutoff), while the
    storage itself is *released lazily* in division units — the period is
    split into ``division_count`` release chunks so expiry never rewrites
    data, it just unlinks whole sub-containers. The Spark analog is exact:
    a visibility predicate on the timestamp (pushes into the parquet scan
    and prunes range partitions) plus ``DmlTable.vacuum_expired`` dropping
    wholly-expired Hive partition directories.

    ``now_ms=None`` uses the wall clock; tests and oracles inject a fixed
    ``now_ms`` for determinism.
    """

    def __init__(self, count: int, unit: str, division_count: int = 8,
                 now_ms: int | None = None):
        self.period_ms = count * UNIT_MS[unit.upper()]
        self.division_count = division_count
        self.division_ms = max(self.period_ms // division_count, 1)
        self.now_ms = now_ms

    def _now(self, now_ms: int | None = None) -> int:
        import time

        if now_ms is not None:
            return now_ms
        if self.now_ms is not None:
            return self.now_ms
        return int(time.time() * 1000)

    def cutoff_ms(self, now_ms: int | None = None) -> int:
        return self._now(now_ms) - self.period_ms

    def visible(self, ts_col: str, now_ms: int | None = None) -> Column:
        """Row-exact visibility: ts >= now - period."""
        return F.unix_millis(F.col(ts_col)) >= self.cutoff_ms(now_ms)


class HashPartitioning:
    """PARTITION BY HASH(col, n): bucket id ``pmod(xxhash64(col), n)``."""

    def __init__(self, col: str, n: int):
        self.col, self.n = col, n

    def expr(self) -> Column:
        return F.pmod(F.xxhash64(F.col(self.col)), F.lit(self.n))

    def key_filter(self, value, dtype: str | None = None) -> Column:
        """Point-lookup pruning: key equality → one hash bucket.

        ``dtype`` must be the stored column type when it differs from the
        Python literal's natural Spark type — xxhash64 hashes int32 and
        int64 representations of the same value differently, so an untyped
        literal against a BIGINT column selects the wrong bucket.
        """
        lit = F.lit(value).cast(dtype) if dtype else F.lit(value)
        return (F.col(self.col) == lit) & (
            F.col(PARTITION_COL) == F.pmod(F.xxhash64(lit), F.lit(self.n))
        )


class RangePartitioning:
    """PARTITION BY RANGE(col) EVERY(n, unit): bucket start in epoch ms."""

    def __init__(self, col: str, every: int, unit: str):
        self.col = col
        self.every_ms = every * UNIT_MS[unit.upper()]

    def expr(self) -> Column:
        t = F.unix_millis(F.col(self.col))
        return F.floor(t / self.every_ms).cast("long") * self.every_ms

    def range_filter(self, start_ms: int, end_ms: int) -> Column:
        """The NarrowingKey derivation (``sql_compiler.h:3101-3135``): a
        predicate range on the key intersects with sub-container bounds →
        explicit PARTITION_COL bounds that Catalyst prunes statically."""
        lo = start_ms // self.every_ms * self.every_ms
        hi = (end_ms - 1) // self.every_ms * self.every_ms
        row = (F.unix_millis(F.col(self.col)) >= start_ms) & (
            F.unix_millis(F.col(self.col)) < end_ms
        )
        return (F.col(PARTITION_COL) >= lo) & (F.col(PARTITION_COL) <= hi) & row


class RangeHashPartitioning:
    """PARTITION BY RANGE(ts) EVERY(n, unit) SUBPARTITION BY HASH(col, m)
    (``TABLE_PARTITION_TYPE_RANGE_HASH``, ``sql_parser.h:300-303``) — the
    composite scheme GridDB users give big time-series tables: interval
    sharding for time-range pruning × hash sharding for key parallelism.

    Spark layout: two-level Hive directory
    ``__part=<range bucket ms>/__subpart=<hash bucket>``. A time-range
    predicate prunes on ``__part`` alone; adding a key equality prunes to
    a single ``(range, hash)`` leaf — the NarrowingKey intersection
    (``sql_compiler.h:3101-3135``) in directory form. At 100 TB this also
    bounds file sizes: each day × bucket directory compacts independently.
    """

    def __init__(self, range_col: str, every: int, unit: str,
                 hash_col: str, n: int):
        self._range = RangePartitioning(range_col, every, unit)
        self._hash = HashPartitioning(hash_col, n)
        self.col = range_col

    def expr(self) -> Column:
        return self._range.expr()

    def sub_expr(self) -> Column:
        return self._hash.expr()

    def range_filter(self, start_ms: int, end_ms: int) -> Column:
        """Time-range pruning on the range level only (all hash buckets)."""
        return self._range.range_filter(start_ms, end_ms)

    def key_range_filter(
        self, start_ms: int, end_ms: int, key_value, dtype: str | None = None
    ) -> Column:
        """Range × key pruning: __part bounds ∩ one __subpart bucket.
        ``dtype`` types the key literal (see ``HashPartitioning.key_filter``).
        """
        lit = F.lit(key_value).cast(dtype) if dtype else F.lit(key_value)
        return (
            self._range.range_filter(start_ms, end_ms)
            & (F.col(self._hash.col) == lit)
            & (
                F.col(SUBPART_COL)
                == F.pmod(F.xxhash64(lit), F.lit(self._hash.n))
            )
        )


def hash_partition_expr(col: str, n: int) -> "HashPartitioning":
    return HashPartitioning(col, n)


def range_hash_partition_expr(
    range_col: str, every: int, unit: str, hash_col: str, n: int
) -> "RangeHashPartitioning":
    return RangeHashPartitioning(range_col, every, unit, hash_col, n)


def range_partition_expr(col: str, every: int, unit: str) -> "RangePartitioning":
    return RangePartitioning(col, every, unit)


class DmlTable:
    """A mutable parquet-backed container (optionally Hive-partitioned)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partitioning: (
            "HashPartitioning | RangePartitioning | RangeHashPartitioning | None"
        ) = None,
        expiration: "RowExpiration | None" = None,
        ts_col: str = "ts",
    ):
        self.spark = spark
        self.path = path
        self.partitioning = partitioning
        self.expiration = expiration
        self.ts_col = ts_col

    @property
    def _part_cols(self) -> list[str]:
        if self.partitioning is None:
            return []
        if isinstance(self.partitioning, RangeHashPartitioning):
            return [PARTITION_COL, SUBPART_COL]
        return [PARTITION_COL]

    # -- DDL ---------------------------------------------------------------

    def create(self, df: DataFrame, mode: str = "error") -> "DmlTable":
        self._write(self._with_part(df), mode)
        return self

    def alter_add_column(self, name: str, dtype: str) -> "DmlTable":
        """``ALTER TABLE ADD COLUMN`` (``sql_parser.h:246-247``): append a
        zero-row file carrying the widened schema; existing rows surface
        NULL (GridDB adds nullable columns only). ``scan`` merges parquet
        footers, so this is O(1) in data size at any scale — on Delta or
        Iceberg the same operation is pure table metadata."""
        dtype = GRIDDB_TYPES.get(dtype.upper(), dtype)
        if self.partitioning is not None:
            # partitionBy writes nothing for zero rows; rewrite instead
            # (Delta/Iceberg would keep this metadata-only too)
            self._rewrite(
                self.read().withColumn(name, F.lit(None).cast(dtype))
            )
            return self
        widened = self.scan().schema.add(name, dtype)
        # mark the table schema-evolved BEFORE the widened file lands, so
        # no crash point yields a mixed-schema table read without
        # mergeSchema (the benign failure order — marker without widened
        # file — just reads a homogeneous table with mergeSchema once)
        self._mark_schema_evolved()
        # build the zero-row frame JVM-side: createDataFrame([], schema)
        # backs the write with an (empty) Python RDD, whose single task
        # still pays full Python-worker startup (~3 s); range(0)+casts is
        # a pure LocalRelation and writes in milliseconds
        empty = self.spark.range(0).select(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in widened.fields]
        ).coalesce(1)
        self._write(empty, "append")
        return self

    def alter_rename_column(self, old: str, new: str) -> "DmlTable":
        """``ALTER TABLE RENAME COLUMN`` — plain parquet stores names in
        file footers, so a rename is a read-rewrite here (Delta/Iceberg do
        it as metadata via field IDs; the semantics are identical)."""
        self._rewrite(self.read().withColumnRenamed(old, new))
        return self

    # -- DML ---------------------------------------------------------------

    def read(self) -> DataFrame:
        df = self.scan()
        return df.drop(*self._part_cols) if self.partitioning is not None else df

    def scan(self) -> DataFrame:
        """Raw scan including PARTITION_COL — use with the partitioning's
        ``range_filter``/``key_filter`` for pruned reads. ``mergeSchema``
        makes post-ALTER files (see ``alter_add_column``) visible — paid
        ONLY when the ``_schema_evolved`` marker says files may disagree:
        an unevolved table reads one footer, not every footer (O(1) vs
        O(files) planning work; the marker is written crash-safely before
        the first widened file, and full rewrites — rename/overwrite —
        drop it with the old directory, so it never understates).

        With row expiration set, the visibility predicate is applied here
        so *every* read path (read/scan_range/TQL) sees only live rows:
        a row bound on the timestamp (parquet row-group skipping) plus,
        on range-partitioned tables, a matching ``__part`` lower bound so
        expired divisions are statically pruned, not read-and-filtered.
        """
        reader = self.spark.read
        if self._schema_evolved():
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(self.path)
        if self.expiration is not None:
            df = df.filter(self.expiration.visible(self.ts_col))
            if isinstance(
                self.partitioning, (RangePartitioning, RangeHashPartitioning)
            ):
                every = (
                    self.partitioning.every_ms
                    if isinstance(self.partitioning, RangePartitioning)
                    else self.partitioning._range.every_ms
                )
                cut = self.expiration.cutoff_ms()
                df = df.filter(F.col(PARTITION_COL) >= cut // every * every)
        return df

    def table_partitions(self, name: str = "public") -> DataFrame:
        """#table_partitions meta table (``meta_store.cpp:819-834``,
        ref names :1222): one row per live physical partition of this
        container — (database_name, container_name, partition_ordinal,
        partition_name, boundary_value1, boundary_value2, status).

        RANGE partitions report their interval bounds as epoch-ms strings
        (GridDB surfaces boundary values as strings); HASH buckets report
        the bucket number; RANGE_HASH emits one row per (range, hash)
        leaf. Ordinals follow boundary order. Built from the live scan so
        expired divisions (already invisible) are not listed."""
        from pyspark.sql import Window

        table = self.path.rstrip("/").rsplit("/", 1)[-1]
        cols = self._part_cols
        if not cols:
            return self.spark.createDataFrame(
                [(name, table, 0, table, None, None, "NORMAL")],
                "database_name string, container_name string, "
                "partition_ordinal long, partition_name string, "
                "boundary_value1 string, boundary_value2 string, "
                "status string",
            )
        parts = self.scan().select(*cols).distinct()
        w = Window.orderBy(*cols)
        is_range = isinstance(
            self.partitioning, (RangePartitioning, RangeHashPartitioning)
        )
        if is_range:
            every = (
                self.partitioning.every_ms
                if isinstance(self.partitioning, RangePartitioning)
                else self.partitioning._range.every_ms
            )
            b1 = F.col(PARTITION_COL).cast("string")
            b2 = (F.col(PARTITION_COL) + every).cast("string")
        else:
            b1 = F.col(PARTITION_COL).cast("string")
            b2 = F.lit(None).cast("string")
        pname = F.concat_ws(
            "_", F.lit(table), *[F.col(c).cast("string") for c in cols]
        )
        return parts.select(
            F.lit(name).alias("database_name"),
            F.lit(table).alias("container_name"),
            (F.row_number().over(w) - 1).cast("long")
            .alias("partition_ordinal"),
            pname.alias("partition_name"),
            b1.alias("boundary_value1"),
            b2.alias("boundary_value2"),
            F.lit("NORMAL").alias("status"),
        )

    def vacuum_expired(self, now_ms: int | None = None) -> int:
        """Physically release wholly-expired divisions (GridDB frees
        expired data 'in division units' — here a division is one range
        partition directory). Returns the number of dropped partitions.

        Deletes ``__part=<start>`` directories whose *entire* interval
        lies below the cutoff (``start + every <= now - period``); the
        boundary division stays and its dead rows remain masked by the
        scan-time visibility predicate until the division fully ages out.
        """
        if self.expiration is None:
            raise ValueError("container has no row expiration")
        if not isinstance(
            self.partitioning, (RangePartitioning, RangeHashPartitioning)
        ):
            raise TypeError("vacuum_expired requires range partitioning")
        every = (
            self.partitioning.every_ms
            if isinstance(self.partitioning, RangePartitioning)
            else self.partitioning._range.every_ms
        )
        cutoff = self.expiration.cutoff_ms(now_ms)
        dropped = 0
        for entry in os.listdir(self.path):
            if not entry.startswith(f"{PARTITION_COL}="):
                continue
            try:
                start = int(entry.split("=", 1)[1])
            except ValueError:
                continue
            if start + every <= cutoff:
                shutil.rmtree(os.path.join(self.path, entry))
                dropped += 1
        return dropped

    def compact(self, max_records_per_file: int = 1_000_000):
        """Small-file compaction over this table's partition directories
        (see :func:`_compact_partitions`)."""
        return _compact_partitions(self.spark, self.path,
                                   max_records_per_file)

    def scan_range(self, start_ms: int, end_ms: int) -> DataFrame:
        """Partition-pruned range scan (range-partitioned tables)."""
        if not isinstance(
            self.partitioning, (RangePartitioning, RangeHashPartitioning)
        ):
            raise TypeError("scan_range requires range partitioning")
        return (
            self.scan()
            .filter(self.partitioning.range_filter(start_ms, end_ms))
            .drop(*self._part_cols)
        )

    def scan_key_range(self, start_ms: int, end_ms: int, key_value) -> DataFrame:
        """Composite pruning (RangeHashPartitioning): time-range bounds on
        ``__part`` ∩ one hash bucket on ``__subpart`` — the scan touches
        exactly (days in range) × 1 leaf directories."""
        if not isinstance(self.partitioning, RangeHashPartitioning):
            raise TypeError("scan_key_range requires RangeHashPartitioning")
        scan = self.scan()
        dtype = dict(scan.dtypes)[self.partitioning._hash.col]
        return scan.filter(
            self.partitioning.key_range_filter(start_ms, end_ms, key_value, dtype)
        ).drop(*self._part_cols)

    def insert(self, rows: DataFrame) -> "DmlTable":
        self._write(self._with_part(rows), "append")
        return self

    def update(self, cond: Column, assignments: Mapping[str, Column]) -> "DmlTable":
        """UPDATE ... SET assignments WHERE cond.

        Partitioned containers rewrite ONLY the leaves containing matching
        rows (see ``_mutate``); rows whose assignment moves them across a
        partition boundary land in their new leaf. Unpartitioned
        containers fall back to a whole-table stage-and-swap.
        """

        def transform(df: DataFrame) -> DataFrame:
            return df.select(
                *[
                    F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                    if c in assignments
                    else F.col(c)
                    for c in df.columns
                ]
            )

        self._mutate(cond, transform)
        return self

    def delete(self, cond: Column) -> "DmlTable":
        """DELETE FROM ... WHERE cond (keep the complement). Partitioned
        containers rewrite only the leaves that hold matching rows."""
        self._mutate(
            cond, lambda df: df.filter(~F.coalesce(cond, F.lit(False)))
        )
        return self

    def replace_where(self, cond: Column, rows: DataFrame) -> "DmlTable":
        """DELETE WHERE cond + INSERT rows as ONE rewrite — the
        MERGE/replaceWhere upsert shape (Delta's ``replaceWhere``, the
        reference's DELETE+putRow batch, ``sql_processor_dml.cpp``).

        ``delete(cond)`` then ``insert(rows)`` stages the surviving table
        once for the delete swap and appends in a second write job; on an
        unpartitioned container the same end state is one staged write of
        ``complement ∪ rows`` (half the write jobs of the two-call form —
        the continuous-aggregate refresh runs this on every micro-batch).
        Partitioned containers keep the two-call form: the leaf-scoped
        delete touches only affected leaves, which a whole-table rewrite
        would forfeit."""
        if self.partitioning is not None:
            return self.delete(cond).insert(rows)
        self._rewrite(
            self.read().filter(~F.coalesce(cond, F.lit(False)))
            .unionByName(rows)
        )
        return self

    # -- internals -----------------------------------------------------------

    def _schema_evolved(self) -> bool:
        return os.path.exists(os.path.join(self.path, SCHEMA_EVOLVED_MARKER))

    def _mark_schema_evolved(self) -> None:
        """Record (durably, before any widened file exists) that reads must
        footer-merge. fsync'd so a crash can't reorder the marker after the
        widened file it guards."""
        p = os.path.join(self.path, SCHEMA_EVOLVED_MARKER)
        fd = os.open(p, os.O_CREAT | os.O_WRONLY, 0o644)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def _mutate(self, cond: Column, transform) -> None:
        """Partition-scoped mutation (the 100 TB shape of UPDATE/DELETE).

        The reference mutates rows in place through the container store
        (``sql_processor_dml.cpp``, ``base_container.cpp`` putRow); plain
        parquet can't, so the unit of rewrite is the Hive leaf directory:

        1. discover the affected leaves — ``scan().filter(cond)`` projects
           only the partition columns, so Catalyst pushes ``cond`` into the
           parquet scan (row-group stats skip most of the table) and the
           distinct leaf list collected is bounded by the leaf count;
        2. re-read ONLY those leaves (the IN-filter on the partition
           columns is a static PartitionFilter — untouched leaves are
           never opened, let alone rewritten) and apply the mutation;
        3. stage the result partitioned, then swap per leaf: affected
           leaves are replaced wholesale (a leaf whose rows were all
           deleted simply disappears), and staged leaves that were NOT in
           the affected set — rows whose updated partition key moved them —
           are merged file-wise into their existing directories (staged
           part-file names carry a job UUID, so merges can't collide).

        A one-row UPDATE on a year-partitioned container therefore touches
        one leaf directory; every other leaf's files stay byte-identical.
        On Delta/Iceberg this whole method is MERGE with file-level
        replacement — the plan shape (pruned scan → mutate → replace
        matched files) is the same.
        """
        if self.partitioning is None:
            self._rewrite(transform(self.read()))
            return
        part_cols = self._part_cols
        cond_safe = F.coalesce(cond, F.lit(False))
        affected = [
            tuple(r)
            for r in self.scan()
            .filter(cond_safe)
            .select(*part_cols)
            .distinct()
            .collect()
        ]
        if not affected:
            return  # nothing matches: zero I/O, no leaf touched
        if len(affected) > 512:
            # a predicate touching hundreds of leaves is a (near-)full
            # mutation: a 512-literal IN / OR-of-ANDs partition filter
            # bloats the plan for no I/O savings — take the plain
            # stage-and-swap rewrite instead
            self._rewrite(transform(self.read()))
            return

        if len(part_cols) == 1:
            leaf_filter = F.col(part_cols[0]).isin([t[0] for t in affected])
        else:
            import functools

            leaf_filter = functools.reduce(
                lambda a, b: a | b,
                [
                    functools.reduce(
                        lambda x, y: x & y,
                        [F.col(c) == v for c, v in zip(part_cols, t)],
                    )
                    for t in affected
                ],
            )
        sub = self.scan().filter(leaf_filter).drop(*part_cols)
        mutated = transform(sub)

        tmp = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        staged = DmlTable(self.spark, tmp, self.partitioning)
        staged._write(staged._with_part(mutated), "error")

        # swap, stage-then-drop ordered so no crash point loses data: each
        # affected leaf moves ASIDE (one rename — never deleted yet), its
        # staged replacement renames in (one rename), and the old tree is
        # removed only after every graft landed. The aside dir sits NEXT TO
        # the table path, so a half-committed swap never leaves a dir that
        # partition discovery would misparse, and the old rows remain on
        # disk until the final cleanup.
        depth = len(part_cols)
        staged_leaves: dict[tuple, str] = {}
        for root, dirs, _files in os.walk(tmp):
            rel = os.path.relpath(root, tmp)
            parts = [] if rel == "." else rel.split(os.sep)
            if len(parts) != depth or not all("=" in p for p in parts):
                continue
            dirs[:] = []  # leaf reached; don't descend further
            staged_leaves[tuple(parts)] = root
        aside = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        os.makedirs(aside, exist_ok=True)
        for i, t in enumerate(affected):
            parts = tuple(f"{c}={v}" for c, v in zip(part_cols, t))
            d = os.path.join(self.path, *parts)
            if os.path.isdir(d):
                os.rename(d, os.path.join(aside, str(i)))
            src = staged_leaves.pop(parts, None)
            if src is not None:  # None = every row in the leaf was deleted
                os.makedirs(os.path.dirname(d), exist_ok=True)
                os.rename(src, d)
                for f in os.listdir(d):  # drop writer droppings (.crc)
                    if f.startswith(("_", ".")):
                        os.remove(os.path.join(d, f))
        # staged leaves NOT in the affected set — rows whose updated
        # partition key moved them — merge file-wise into existing leaves
        # (staged part-file names carry a job UUID, so merges can't collide)
        for parts, root in staged_leaves.items():
            dest = os.path.join(self.path, *parts)
            os.makedirs(dest, exist_ok=True)
            for f in os.listdir(root):
                if f.startswith(("_", ".")):
                    continue
                os.rename(os.path.join(root, f), os.path.join(dest, f))
        shutil.rmtree(aside, ignore_errors=True)
        shutil.rmtree(tmp, ignore_errors=True)
        # a fully-deleted range leaf may leave an empty parent (__part=x
        # with every __subpart gone) — prune so #table_partitions and
        # directory listings don't surface hollow partitions
        if depth == 2:
            for entry in os.listdir(self.path):
                d = os.path.join(self.path, entry)
                if (
                    entry.startswith(f"{PARTITION_COL}=")
                    and os.path.isdir(d)
                    and not os.listdir(d)
                ):
                    os.rmdir(d)

    def _with_part(self, df: DataFrame) -> DataFrame:
        if self.partitioning is None:
            return df
        df = df.withColumn(PARTITION_COL, self.partitioning.expr())
        if isinstance(self.partitioning, RangeHashPartitioning):
            df = df.withColumn(SUBPART_COL, self.partitioning.sub_expr())
        return df

    def _write(self, df: DataFrame, mode: str) -> None:
        if self.partitioning is not None:
            # cluster rows by leaf directory before the partitioned write:
            # without this every upstream task emits a file into every leaf
            # it touches (tasks × leaves small files — at cluster scale a
            # namenode/listing killer and here a measurable write cost).
            # One hash shuffle on the partition columns → one file per
            # task per leaf, i.e. ~one file per leaf.
            df = df.repartition(*[F.col(c) for c in self._part_cols])
            df.write.mode(mode).partitionBy(*self._part_cols).parquet(self.path)
        else:
            df.write.mode(mode).parquet(self.path)

    def _rewrite(self, df: DataFrame) -> None:
        """Stage-then-swap rewrite (a lazy plan can't overwrite its own
        source). The staged output is swapped in by directory rename —
        writing the data once, not stage+rewrite twice. On an
        object-store deployment rename isn't atomic/cheap; there this
        whole method becomes Delta/Iceberg MERGE/DELETE with
        partition-level file replacement.
        """
        tmp = f"{self.path}.stage-{uuid.uuid4().hex[:8]}"
        staged = DmlTable(self.spark, tmp, self.partitioning)
        staged._write(staged._with_part(df), "error")
        trash = f"{self.path}.old-{uuid.uuid4().hex[:8]}"
        os.rename(self.path, trash)
        os.rename(tmp, self.path)
        shutil.rmtree(trash, ignore_errors=True)


# ---------------------------------------------------------------------------
# Z-order clustering — multi-dimensional data layout for row-group skipping
# ---------------------------------------------------------------------------


def zorder_expr(
    cols: "list[tuple]",
    bits: int = 8,
) -> "F.Column":
    """Morton (Z-order) interleave of ``cols`` as a pure Column.

    ``cols`` is ``[(column, min, max), …]`` — each dimension is bucketed
    into ``2^bits`` equal-width integer cells with EXACT integer
    arithmetic (``(v - min) * 2^bits // (max - min + 1)`` — no float
    boundary hazards, bit-identical in any engine), then bit ``b`` of
    dimension ``d`` lands at z-bit ``b·ndims + d``.

    Why it matters at 100 TB: sorting by a single column clusters only
    that column's min/max file stats; a Z-value sort clusters ALL the
    interleaved dimensions at once, so parquet row-group/file skipping
    works for predicates on any of them (the Delta/Iceberg OPTIMIZE
    ZORDER capability, expressed as plain column math + a range
    repartition). GridDB's analog is its multi-column composite
    partitioning keys (sql_parser.h:300-303 NarrowingKey ranges).
    """
    ndims = len(cols)
    scale = 1 << bits
    z = F.lit(0).cast("bigint")
    for d, (c, mn, mx) in enumerate(cols):
        col = (c if isinstance(c, Column) else F.col(c)).cast("bigint")
        width = int(mx) - int(mn) + 1
        bucket = ((col - F.lit(int(mn))) * F.lit(scale) / F.lit(width)).cast(
            "bigint"
        )
        bucket = F.least(F.greatest(bucket, F.lit(0)), F.lit(scale - 1))
        for b in range(bits):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * ndims + d))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: "list[str]",
    bits: int = 8,
    n_files: int = 8,
) -> "list[tuple]":
    """Write ``df`` as parquet physically clustered by the Z-order of
    ``cols``: per-dimension min/max come from one tiny aggregate, rows
    range-repartition on the z-value (contiguous z-ranges per file) and
    sort within partitions, so every file's min/max stats are tight in
    EVERY clustered dimension — readers skip row groups for predicates
    on any of them. Returns the ``(col, min, max)`` ranges used.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("bigint")).alias(f"__mn_{c}"),
                 F.max(F.col(c).cast("bigint")).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    ranges = [(c, row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols]
    z = zorder_expr([(F.col(c), mn, mx) for c, mn, mx in ranges], bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    return ranges


def _compact_partitions(
    spark: SparkSession, path: str, max_records_per_file: int = 1_000_000
) -> "dict[str, tuple[int, int]]":
    """Merge small files inside each partition directory of a
    Hive-partitioned parquet table — the storage-compaction maintenance
    op (reference analog: ``Chunk::compact()``, chunk.h:307, which
    re-packs a chunk's live objects; the gs_backup/longArchive tooling
    runs it offline). Incremental appends (DML inserts, streaming
    micro-batches, index appends) each add a file per touched partition;
    at 100 TB the resulting small-file population is what kills scan
    task-scheduling, so compaction is the maintenance pass that
    restores one-scan-task-per-row-group economics.

    Per partition: read the leaf directory (partition values live in the
    directory name, so files round-trip without the partition column),
    rewrite into ``ceil(rows / max_records_per_file)`` files, and swap
    atomically (tmp dir + rename — readers see old or new, never a mix).
    Returns ``{partition: (files_before, files_after)}`` for every
    partition actually rewritten.
    """
    import glob

    def _leaves(d: str) -> "list[str]":
        # descend through nested partition levels (__part=…/__subpart=…,
        # the RANGE_HASH layout) to the directories that hold data files
        subs = [e for e in sorted(os.listdir(d))
                if "=" in e and os.path.isdir(os.path.join(d, e))]
        if not subs:
            return [d] if d != path else []
        out: list[str] = []
        for e in subs:
            out.extend(_leaves(os.path.join(d, e)))
        return out

    out: dict[str, tuple[int, int]] = {}
    for full in _leaves(path):
        entry = os.path.relpath(full, path)
        files = glob.glob(os.path.join(full, "*.parquet"))
        if len(files) <= 1:
            continue
        df = spark.read.parquet(full)
        n = df.count()
        n_files = max(1, -(-n // max_records_per_file))
        if n_files >= len(files):
            continue
        tmp = f"{full}.compact-{uuid.uuid4().hex[:8]}"
        df.coalesce(n_files).write.parquet(tmp)
        trash = f"{full}.old-{uuid.uuid4().hex[:8]}"
        os.rename(full, trash)
        os.rename(tmp, full)
        shutil.rmtree(trash, ignore_errors=True)
        out[entry] = (len(files), n_files)
    return out

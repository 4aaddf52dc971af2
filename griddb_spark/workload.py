"""Driver-facing workload registry: every implemented operator from
SURVEY.md §2 as a (Spark query, DuckDB oracle SQL) pair.

Conventions (driver contract, __spark_entry__.py):
- each query fn takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in Spark and oracle SQL;
- money sums accumulate in DECIMAL(18,2) (exact, order-independent) but
  the FINAL column is CAST(... AS DOUBLE): Spark's decimal(28,2) and
  DuckDB's decimal(38,2) stringify differently on trailing zeros
  ("953769.00" vs "953769.0" after the driver's normalization — the
  round-1 hash mismatches), while the same exact decimal cast to double
  is bit-identical in both engines;
- averages over big groups are computed as exact-decimal-sum / count,
  not avg(double), so accumulation order can't move the 6th decimal;
- unstable double aggregates (stddev/percentile/time-weighted) are
  rounded to 6 decimals on both sides;
- events.ts is timestamp[us] in the driver parquet (was ns in earlier
  rounds); ContainerCatalog detects the unit per-file — ns sources read as
  epoch-nanos LONG (nanosAsLong) and convert by integer div, µs sources
  pass through. Raw readers here guard on the scanned dtype the same way.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from griddb_spark.catalog import ContainerCatalog
from griddb_spark.functions import aggregates as A

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

#: fixed event-time window covering every SF's events table (Jan 2024)
EV_START = "2024-01-01 00:00:00"
EV_END = "2024-01-31 00:00:00"
EV_START_MS = 1704067200000
EV_END_MS = 1706659200000


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def prepare(spark: SparkSession) -> None:
    """Make a vanilla (driver-owned) session engine-compatible."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # parquet ms-timestamps must come up as TIMESTAMP (LTZ), not NTZ —
    # unix_millis & friends reject NTZ, and UTC session tz keeps collect()
    # values identical to DuckDB's naive-UTC timestamps.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # single-file parquet sources split per row-group; 8m keeps every core
    # busy at testdata sizes (runtime-settable, so it also applies to the
    # driver's vanilla session)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    # committer v2: task-commit moves instead of the sequential job-commit
    # merge (see session.py for the measured numbers + atomicity note);
    # spark.hadoop.* set at runtime reaches every later write's job conf
    spark.conf.set(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")


#: (session id, sf_dir) → ContainerCatalog. One catalog per (session, dir)
#: so its DataFrame/footer caches survive across queries — a fresh catalog
#: per call made every griddb_sql() re-read ten parquet footers through
#: register_all() (the r6→r7 sql_explain constant-cost creep).
_CAT_CACHE: dict = {}


def cat(spark: SparkSession, sf_dir: str) -> ContainerCatalog:
    prepare(spark)
    key = (id(spark), sf_dir)
    c = _CAT_CACHE.get(key)
    if c is None or c.spark is not spark:
        c = ContainerCatalog(spark, sf_dir)
        _CAT_CACHE[key] = c
    return c


def _dec(col, scale: int = 2):
    return (F.col(col) if isinstance(col, str) else col).cast(f"decimal(18,{scale})")


def _dsum(col, scale: int = 2) -> F.Column:
    """Exact decimal sum surfaced as a double (deterministic both engines)."""
    return F.sum(_dec(col, scale)).cast("double")


def _r6(col) -> F.Column:
    return F.round(col, 6)


# ===========================================================================
# 2.A relational core — scan/filter/project, group, sort, limit
# ===========================================================================


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flavor: OP_SCAN + OP_GROUP + every basic aggregate."""
    li = cat(spark, sf_dir).load("lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
            F.round(F.sum(_dec("l_discount", 4)).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "join_inner_5way",
    """
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def join_inner_5way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_JOIN chain (hash/broadcast): fact → dims, small dims broadcast."""
    c = cat(spark, sf_dir)
    li, orders, cust = c.load("lineitem"), c.load("orders"), c.load("customer")
    nation, region = c.dim("nation"), c.dim("region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region.filter(F.col("r_name") == "ASIA"),
              nation.n_regionkey == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_JOIN_OUTER (left): customers with zero orders kept."""
    c = cat(spark, sf_dir)
    return (
        c.load("customer")
        .join(c.load("orders"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _dsum("o_totalprice").alias("total_spend"),
        )
    )


@query(
    "join_full_outer",
    """
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(cn.n_cust, 0) AS n_cust,
           coalesce(sn.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) sn
    ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_JOIN_OUTER (full): nation presence across two dimensions."""
    c = cat(spark, sf_dir)
    cn = c.load("customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust"))
    sn = c.load("supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp"))
    return (
        cn.join(sn, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_semi_anti",
    """
    SELECT
      (SELECT count(*) FROM customer WHERE EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_with_orders,
      (SELECT count(*) FROM customer WHERE NOT EXISTS
         (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS n_without_orders
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN/EXISTS folding (AGG_FOLD_EXISTS, sql_type.h:131-134) → semi/anti."""
    c = cat(spark, sf_dir)
    cust, orders = c.load("customer"), c.load("orders")
    semi = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    anti = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        semi.agg(F.count(F.lit(1)).alias("n_with_orders"))
        .crossJoin(anti.agg(F.count(F.lit(1)).alias("n_without_orders")))
    )


@query(
    "join_cross_theta",
    """
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a, region b
    WHERE a.r_regionkey < b.r_regionkey
    """,
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_JOIN_NESTED: theta (non-equi) join via cross + filter."""
    c = cat(spark, sf_dir)
    a = c.load("region").select(F.col("r_name").alias("r1"), F.col("r_regionkey").alias("k1"))
    b = c.load("region").select(F.col("r_name").alias("r2"), F.col("r_regionkey").alias("k2"))
    return a.crossJoin(b).filter(F.col("k1") < F.col("k2")).select("r1", "r2")


@query(
    "agg_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_dist_qty,
           round(CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(DISTINCT l_quantity), 6) AS avg_dist_qty,
           CASE WHEN count(DISTINCT l_quantity) > 1 THEN
             round(sqrt((CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))
                                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                         - CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                           * CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                           / count(DISTINCT l_quantity))
                        / (count(DISTINCT l_quantity) - 1)), 6)
           ELSE NULL END AS sd_dist_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_GROUP_DISTINCT(_MERGE): DISTINCT aggregates — the full
    AGG_DISTINCT_* family (sql_type.h:116-128) incl. AVG/STDDEV forms.
    Mirrors the oracle term-for-term: exact decimal DISTINCT sums cast to
    double, avg = exact-sum/count, stddev via the sum-of-squares identity
    (q → q·q is injective here because l_quantity > 0) guarded to NULL for
    single-distinct-value groups (matching stddev_samp semantics)."""
    li = cat(spark, sf_dir).load("lineitem")
    q = _dec("l_quantity")
    s = F.sum_distinct(q).cast("double")
    sq = F.sum_distinct(q * q).cast("double")
    cd = F.count_distinct(F.col("l_quantity"))
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        s.alias("sum_dist_qty"),
        _r6(s / cd).alias("avg_dist_qty"),
        F.when(
            cd > 1, _r6(F.sqrt((sq - s * s / cd) / (cd - 1)))
        ).alias("sd_dist_qty"),
    )


@query(
    "agg_stats",
    """
    SELECT o_orderpriority,
           round(stddev_samp(o_totalprice), 4) AS sd_samp,
           round(stddev_pop(o_totalprice), 4) AS sd_pop,
           round(var_samp(o_totalprice), 1) AS v_samp,
           round(var_pop(o_totalprice), 1) AS v_pop,
           round(coalesce(sum(CAST(o_totalprice AS DOUBLE)), 0.0), 4) AS total_price,
           round(median(o_totalprice), 6) AS med,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV/VARIANCE families + TOTAL + MEDIAN + PERCENTILE_CONT."""
    o = cat(spark, sf_dir).load("orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_samp"),
        F.round(F.stddev_pop("o_totalprice"), 4).alias("sd_pop"),
        F.round(F.var_samp("o_totalprice"), 1).alias("v_samp"),
        F.round(F.var_pop("o_totalprice"), 1).alias("v_pop"),
        F.round(A.total("o_totalprice"), 4).alias("total_price"),
        _r6(A.median("o_totalprice")).alias("med"),
        _r6(A.percentile_cont("o_totalprice", 0.75)).alias("p75"),
    )


@query(
    "agg_group_concat",
    """
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP_CONCAT (sorted for determinism — aggregates.py rationale)."""
    c = cat(spark, sf_dir)
    return (
        c.load("nation")
        .join(c.dim("region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(A.group_concat("n_name").alias("nations"))
    )


@query(
    "sort_topk",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_SORT with sub-limit (top-k): TakeOrderedAndProject, no full sort."""
    o = cat(spark, sf_dir).load("orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@query(
    "limit_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_orderkey LIMIT 10 OFFSET 10
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_LIMIT with offset (CODE_LIMIT/CODE_OFFSET)."""
    o = cat(spark, sf_dir).load("orders")
    return (
        o.orderBy("o_orderkey")
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(10)
    )


@query(
    "setops",
    """
    SELECT 'union' AS op, count(*) AS n FROM (
      SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', count(*) FROM (
      SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', count(*) FROM (
      SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_all', count(*) FROM (
      SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier)
    """,
)
def setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_UNION_* family: UNION/UNION ALL/INTERSECT/EXCEPT."""
    c = cat(spark, sf_dir)
    cn = c.load("customer").select(F.col("c_nationkey").alias("nk"))
    sn = c.load("supplier").select(F.col("s_nationkey").alias("nk"))
    parts = [
        cn.union(sn).distinct().agg(F.lit("union").alias("op"), F.count(F.lit(1)).alias("n")),
        cn.intersect(sn).agg(F.lit("intersect").alias("op"), F.count(F.lit(1)).alias("n")),
        cn.subtract(sn).agg(F.lit("except").alias("op"), F.count(F.lit(1)).alias("n")),
        cn.union(sn).agg(F.lit("union_all").alias("op"), F.count(F.lit(1)).alias("n")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "window_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           row_number() OVER w AS rn,
           lag(l_quantity) OVER w AS prev_qty,
           lead(l_quantity) OVER w AS next_qty,
           sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running_qty,
           round(avg(l_extendedprice) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 6)
             AS smooth_price
    FROM lineitem
    WHERE l_orderkey < 100
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
    """,
)
def window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_WINDOW: ROW_NUMBER/LAG/LEAD + ROWS frames (sql_type.h:287-294)."""
    li = cat(spark, sf_dir).load("lineitem").filter(F.col("l_orderkey") < 100)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.sum("l_quantity").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("running_qty"),
        _r6(F.avg("l_extendedprice").over(w.rowsBetween(-1, 1))).alias("smooth_price"),
    )


@query(
    "scalar_case_in_between",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity BETWEEN 10 AND 30 THEN 'mid'
                ELSE 'high' END AS qty_band,
           CASE WHEN l_returnflag IN ('A', 'R') THEN 1 ELSE 0 END AS returned,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def scalar_case_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / IN / BETWEEN / arithmetic expression forms (sql_type.h:42-92)."""
    li = cat(spark, sf_dir).load("lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity").between(10, 30), "mid")
        .otherwise("high")
        .alias("qty_band"),
        F.when(F.col("l_returnflag").isin("A", "R"), 1).otherwise(0).alias("returned"),
        _r6(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charged"),
    )


@query(
    "scalar_string_funcs",
    """
    SELECT c_custkey,
           upper(c_name) AS up, lower(c_mktsegment) AS lo,
           substr(c_name, 1, 8) AS pre,
           length(c_name) AS len,
           replace(c_name, '#', '-') AS repl,
           instr(c_name, '0') AS pos,
           trim(c_mktsegment) AS trimmed,
           c_name || '/' || c_mktsegment AS joined,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na
    FROM customer WHERE c_custkey <= 100
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (sql_expression_string.h:45-176)."""
    c = cat(spark, sf_dir).load("customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("pre"),
        F.length("c_name").cast("long").alias("len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.instr(F.col("c_name"), F.lit("0")).cast("long").alias("pos"),
        F.trim(F.col("c_mktsegment")).alias("trimmed"),
        F.concat("c_name", F.lit("/"), "c_mktsegment").alias("joined"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("N/A")).alias("seg_or_na"),
    )


@query(
    "scalar_time_ctors",
    """
    WITH s AS (
      SELECT o_orderkey,
             '2024-01-0' || CAST((o_orderkey % 9) + 1 AS VARCHAR)
               || ' 12:34:56.'
               || lpad(CAST((o_orderkey % 999999999) + 1 AS VARCHAR), 9, '0')
               AS s9,
             '2024-01-0' || CAST((o_orderkey % 9) + 1 AS VARCHAR)
               || ' 12:34:56.'
               || lpad(CAST((o_orderkey % 999) + 1 AS VARCHAR), 3, '0') AS s3
      FROM orders WHERE o_orderkey <= 200
    )
    SELECT o_orderkey,
           -- DuckDB's VARCHAR->TIMESTAMP_NS cast truncates sub-us digits,
           -- so assemble nanos from the whole-second part + fraction
           epoch_us(CAST(substr(s9, 1, 19) AS TIMESTAMP)) * 1000
             + CAST(substr(s9, 21, 9) AS BIGINT) AS ns,
           CAST(s3 AS TIMESTAMP) AS ms_ts,
           make_timestamp(2024, 3, CAST((o_orderkey % 28) + 1 AS BIGINT),
                          0, 0, 0) AS byd
    FROM s
    """,
)
def scalar_time_ctors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp constructor/parser family (sql_expression_time.h:47-196):
    TIMESTAMP_NS(str) → epoch-nanos LONG (ns fidelity beyond Spark's µs
    cap), TIMESTAMP_MS(str), MAKE_TIMESTAMP_BY_DATE. Strings are derived
    identically in both engines from integer keys."""
    from griddb_spark.functions import time as gt

    o = cat(spark, sf_dir).load("orders").filter(F.col("o_orderkey") <= 200)
    key = F.col("o_orderkey")
    s9 = F.concat(
        F.lit("2024-01-0"), ((key % 9) + 1).cast("string"),
        F.lit(" 12:34:56."),
        F.lpad(((key % 999999999) + 1).cast("string"), 9, "0"),
    )
    s3 = F.concat(
        F.lit("2024-01-0"), ((key % 9) + 1).cast("string"),
        F.lit(" 12:34:56."),
        F.lpad(((key % 999) + 1).cast("string"), 3, "0"),
    )
    return o.select(
        "o_orderkey",
        gt.timestamp_ns(s9).alias("ns"),
        gt.timestamp_ms(s3).alias("ms_ts"),
        gt.make_timestamp_by_date(2024, 3, ((key % 28) + 1)).alias("byd"),
    )


@query(
    "scalar_time_funcs",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate)::INT AS yr,
           EXTRACT(month FROM o_orderdate)::INT AS mo,
           EXTRACT(day FROM o_orderdate)::INT AS dy,
           (EXTRACT(dow FROM o_orderdate))::INT AS dow0,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mstart,
           o_orderdate + INTERVAL 90 DAY AS due,
           epoch_ms(o_orderdate) AS ep_ms,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
    FROM orders WHERE o_orderkey <= 200
    """,
)
def scalar_time_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time function battery: EXTRACT/TIMESTAMP_TRUNC/ADD/DIFF/TO_EPOCH_MS
    (sql_expression_time.h:47-196)."""
    from griddb_spark.functions import time as gt

    o = cat(spark, sf_dir).load("orders").filter(F.col("o_orderkey") <= 200)
    return o.select(
        "o_orderkey",
        gt.extract_unit("YEAR", "o_orderdate").alias("yr"),
        gt.extract_unit("MONTH", "o_orderdate").alias("mo"),
        gt.extract_unit("DAY", "o_orderdate").alias("dy"),
        gt.extract_unit("DAY_OF_WEEK", "o_orderdate").alias("dow0"),
        gt.timestamp_trunc("MONTH", "o_orderdate").alias("mstart"),
        gt.timestamp_add("DAY", "o_orderdate", 90).alias("due"),
        gt.to_epoch_ms("o_orderdate").alias("ep_ms"),
        gt.timestamp_diff("DAY", F.lit("1995-01-01").cast("timestamp"), F.col("o_orderdate")).alias("days_since"),
    )


@query(
    "scalar_glob_like",
    """
    SELECT p_partkey, p_name,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green,
           CASE WHEN p_name GLOB '*red*' THEN 1 ELSE 0 END AS glob_red,
           CASE WHEN p_type LIKE 'STANDARD%' THEN 1 ELSE 0 END AS std
    FROM part WHERE p_partkey <= 300
    """,
)
def scalar_glob_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE + GLOB (EXPR_GLOB — SQLite semantics, case-sensitive)."""
    from griddb_spark.functions.scalar import glob

    p = cat(spark, sf_dir).load("part").filter(F.col("p_partkey") <= 300)
    return p.select(
        "p_partkey",
        "p_name",
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
        F.when(glob("p_name", "*red*"), 1).otherwise(0).alias("glob_red"),
        F.when(F.col("p_type").like("STANDARD%"), 1).otherwise(0).alias("std"),
    )


# ===========================================================================
# 2.C time-series operators (TQL selections/aggregations + GROUP BY RANGE)
# ===========================================================================

#: DuckDB bucket-start expression (epoch ms lattice anchored at EV_START).
def _duck_bucket(every_ms: int) -> str:
    return (
        f"make_timestamp(({EV_START_MS} + (epoch_ms(CAST(ts AS TIMESTAMP)) "
        f"- {EV_START_MS}) // {every_ms} * {every_ms}) * 1000)"
    )


_DUCK_EV = (
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events"
)


@query(
    "range_hour_none",
    f"""
    SELECT {_duck_bucket(3_600_000)} AS ts,
           round(avg(value), 6) AS avg_value,
           round(sum(value), 6) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(*) AS n
    FROM events
    WHERE epoch_ms(CAST(ts AS TIMESTAMP)) BETWEEN {EV_START_MS} AND {EV_END_MS}
    GROUP BY 1
    """,
)
def range_hour_none(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY RANGE EVERY(1, HOUR) FILL(NONE) — OP_GROUP_RANGE."""
    from griddb_spark.operators import group_by_range

    ev = cat(spark, sf_dir).load("events")
    out = group_by_range(
        ev, "ts", 1, "HOUR",
        {
            "avg_value_raw": F.avg("value"),
            "sum_value_raw": F.sum("value"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
            "n": F.count(F.lit(1)),
        },
        start=EV_START, end=EV_END,
    )
    return out.select(
        "ts",
        _r6(F.col("avg_value_raw")).alias("avg_value"),
        _r6(F.col("sum_value_raw")).alias("sum_value"),
        "min_value", "max_value", "n",
    )


def _duck_fill_base(every_ms: int) -> str:
    """Scaffold + per-bucket agg CTEs shared by the FILL oracles."""
    return f"""
    WITH agg AS (
      SELECT ({EV_START_MS} + (epoch_ms(CAST(ts AS TIMESTAMP)) - {EV_START_MS})
              // {every_ms} * {every_ms}) AS b,
             avg(value) AS av, count(*) AS n
      FROM events
      WHERE epoch_ms(CAST(ts AS TIMESTAMP)) BETWEEN {EV_START_MS} AND {EV_END_MS}
      GROUP BY 1
    ),
    grid AS (
      SELECT {EV_START_MS} + s.g * {every_ms} AS b
      FROM generate_series(0, ({EV_END_MS} - {EV_START_MS}) // {every_ms}) s(g)
    ),
    joined AS (
      SELECT grid.b, agg.av, agg.n, agg.b IS NOT NULL AS present
      FROM grid LEFT JOIN agg ON grid.b = agg.b
    )
    """


@query(
    "range_15m_fill_null",
    _duck_fill_base(900_000)
    + """
    SELECT make_timestamp(b * 1000) AS ts,
           round(av, 6) AS avg_value,
           n
    FROM joined
    """,
)
def range_15m_fill_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY RANGE EVERY(15, MINUTE) FILL(NULL)."""
    from griddb_spark.operators import group_by_range

    ev = cat(spark, sf_dir).load("events")
    out = group_by_range(
        ev, "ts", 15, "MINUTE",
        {"av": F.avg("value"), "n": F.count(F.lit(1))},
        start=EV_START, end=EV_END, fill="NULL",
    )
    return out.select("ts", _r6(F.col("av")).alias("avg_value"), "n")


@query(
    "range_15m_fill_prev",
    _duck_fill_base(900_000)
    + """
    SELECT make_timestamp(b * 1000) AS ts,
           round(last_value(av IGNORE NULLS) OVER
             (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS avg_value,
           last_value(n IGNORE NULLS) OVER
             (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
    FROM joined
    """,
)
def range_15m_fill_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY RANGE EVERY(15, MINUTE) FILL(PREVIOUS) — empty buckets copy
    the previous non-empty bucket (NULL when none)."""
    from griddb_spark.operators import group_by_range

    ev = cat(spark, sf_dir).load("events")
    out = group_by_range(
        ev, "ts", 15, "MINUTE",
        {"av": F.avg("value"), "n": F.count(F.lit(1))},
        start=EV_START, end=EV_END, fill="PREVIOUS",
    )
    return out.select("ts", _r6(F.col("av")).alias("avg_value"), "n")


@query(
    "range_15m_fill_linear",
    _duck_fill_base(900_000)
    + """
    , filled AS (
      SELECT b, av, present,
        last_value(av IGNORE NULLS) OVER past AS pv,
        last_value(CASE WHEN present THEN b END IGNORE NULLS) OVER past AS pb,
        first_value(av IGNORE NULLS) OVER fut AS nv,
        first_value(CASE WHEN present THEN b END IGNORE NULLS) OVER fut AS nb
      FROM joined
      WINDOW past AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fut AS (ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT make_timestamp(b * 1000) AS ts,
           round(CASE WHEN present THEN av
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   pv + (b - pb) * 1.0 / (nb - pb) * (nv - pv)
                 END, 6) AS avg_value
    FROM filled
    """,
)
def range_15m_fill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY RANGE EVERY(15, MINUTE) FILL(LINEAR) — empty buckets
    interpolate between neighbor non-empty buckets on the bucket key
    (sql_operator_group.cpp:937-963); NULL at the edges."""
    from griddb_spark.operators import group_by_range

    ev = cat(spark, sf_dir).load("events")
    out = group_by_range(
        ev, "ts", 15, "MINUTE",
        {"av": F.avg("value")},
        start=EV_START, end=EV_END, fill="LINEAR",
    )
    return out.select("ts", _r6(F.col("av")).alias("avg_value"))


@query(
    "time_avg_per_user",
    f"""
    WITH e AS ({_DUCK_EV}),
    w AS (
      SELECT user_id, value,
        epoch_ms(ts) AS t,
        lag(epoch_ms(ts)) OVER win AS pt,
        lead(epoch_ms(ts)) OVER win AS nt
      FROM e
      WINDOW win AS (PARTITION BY user_id ORDER BY epoch_ms(ts))
    ),
    wt AS (
      SELECT user_id, value,
        (CASE WHEN nt IS NULL THEN t ELSE t + (nt - t) // 2 END
         - CASE WHEN pt IS NULL THEN t ELSE pt + (t - pt) // 2 END) AS wgt
      FROM w
    )
    SELECT user_id,
           round(CASE WHEN sum(wgt) > 0
                 THEN sum(value * wgt) / sum(wgt)
                 ELSE avg(value) END, 6) AS time_avg
    FROM wt GROUP BY user_id
    """,
)
def time_avg_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_AVG(value) per series — midpoint-weighted time average
    (aggregation_func.h:780-880)."""
    from griddb_spark.operators import time_avg

    ev = cat(spark, sf_dir).load("events")
    out = time_avg(ev, "value", "ts", by=["user_id"])
    return out.select("user_id", _r6(F.col("time_avg")).alias("time_avg"))


T_MID = "2024-01-15 12:00:00"


@query(
    "time_next_per_user",
    f"""
    WITH e AS ({_DUCK_EV})
    SELECT event_id, ts, user_id, event_type, value, props
    FROM e WHERE ts >= TIMESTAMP '{T_MID}'
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts) = 1
    """,
)
def time_next_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_NEXT(*, t) per series (selection_func.h:126-300)."""
    from griddb_spark.operators import time_next

    ev = cat(spark, sf_dir).load("events")
    return time_next(ev, T_MID, "ts", by=["user_id"])


@query(
    "time_prev_only_per_user",
    f"""
    WITH e AS ({_DUCK_EV})
    SELECT event_id, ts, user_id, event_type, value, props
    FROM e WHERE ts < TIMESTAMP '{T_MID}'
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1
    """,
)
def time_prev_only_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_PREV_ONLY(*, t) per series."""
    from griddb_spark.operators import time_prev

    ev = cat(spark, sf_dir).load("events")
    return time_prev(ev, T_MID, "ts", only=True, by=["user_id"])


@query(
    "time_interpolated_per_user",
    f"""
    WITH e AS ({_DUCK_EV}),
    p AS (
      SELECT * FROM e WHERE ts <= TIMESTAMP '{T_MID}'
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) = 1
    ),
    n AS (
      SELECT * FROM e WHERE ts > TIMESTAMP '{T_MID}'
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts) = 1
    )
    SELECT p.event_id, TIMESTAMP '{T_MID}' AS ts, p.user_id, p.event_type,
           round(CASE WHEN p.ts = TIMESTAMP '{T_MID}' THEN p.value
                 ELSE p.value
                      + (epoch_ms(TIMESTAMP '{T_MID}') - epoch_ms(p.ts))
                        * 1.0 / (epoch_ms(n.ts) - epoch_ms(p.ts))
                        * (n.value - p.value) END, 6) AS value,
           p.props
    FROM p LEFT JOIN n ON p.user_id = n.user_id
    WHERE p.ts = TIMESTAMP '{T_MID}' OR n.user_id IS NOT NULL
    """,
)
def time_interpolated_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_INTERPOLATED(value, t) per series: previous row's image with ts=t
    and value linearly interpolated (selection_func_impl.h:331-459)."""
    from griddb_spark.operators import time_interpolated

    ev = cat(spark, sf_dir).load("events")
    out = time_interpolated(ev, T_MID, "value", "ts", by=["user_id"])
    return out.select(
        "event_id", "ts", "user_id", "event_type",
        _r6(F.col("value")).alias("value"), "props",
    )


@query(
    "time_sampling_user3",
    f"""
    WITH e AS ({_DUCK_EV}),
    e3 AS (SELECT * FROM e WHERE user_id = 3),
    grid AS (
      SELECT make_timestamp(({EV_START_MS} + s.g * 21600000) * 1000) AS gts
      FROM generate_series(0, ({EV_END_MS} - {EV_START_MS}) // 21600000) s(g)
    ),
    u AS (
      SELECT ts, 0 AS is_grid, event_id, user_id, event_type, value, props FROM e3
      UNION ALL
      SELECT gts, 1, NULL, NULL, NULL, NULL, NULL FROM grid
    ),
    w AS (
      SELECT ts, is_grid,
        last_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER past AS p_ts,
        last_value(CASE WHEN is_grid = 0 THEN event_id END IGNORE NULLS) OVER past AS p_event_id,
        last_value(CASE WHEN is_grid = 0 THEN event_type END IGNORE NULLS) OVER past AS p_event_type,
        last_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER past AS p_value,
        last_value(CASE WHEN is_grid = 0 THEN props END IGNORE NULLS) OVER past AS p_props,
        first_value(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS) OVER fut AS n_ts,
        first_value(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS) OVER fut AS n_value
      FROM u
      WINDOW past AS (ORDER BY ts, is_grid ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fut AS (ORDER BY ts, is_grid ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT p_event_id AS event_id, ts, 3 AS user_id, p_event_type AS event_type,
           round(CASE WHEN p_ts = ts THEN p_value
                 ELSE p_value + (epoch_ms(ts) - epoch_ms(p_ts)) * 1.0
                      / (epoch_ms(n_ts) - epoch_ms(p_ts)) * (n_value - p_value)
                 END, 6) AS value,
           p_props AS props
    FROM w
    WHERE is_grid = 1
      AND (p_ts = ts OR (p_ts IS NOT NULL AND n_ts IS NOT NULL))
    """,
)
def time_sampling_user3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_SAMPLING(value, start, end, 6, HOUR) on one series
    (selection_func_impl.h:531-719)."""
    from griddb_spark.operators import time_sampling

    ev = cat(spark, sf_dir).load("events").filter(F.col("user_id") == 3)
    out = time_sampling(ev, EV_START, EV_END, 6, "HOUR", col="value", ts_col="ts")
    return out.select(
        "event_id", "ts",
        F.lit(3).alias("user_id"),
        "event_type", _r6(F.col("value")).alias("value"), "props",
    )


@query(
    "max_min_rows",
    f"""
    WITH e AS ({_DUCK_EV})
    SELECT 'max' AS which, event_id, ts, user_id, value FROM e
    WHERE value = (SELECT max(value) FROM e)
    UNION ALL
    SELECT 'min', event_id, ts, user_id, value FROM e
    WHERE value = (SELECT min(value) FROM e)
    """,
)
def max_min_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAX_ROWS/MIN_ROWS(value) — rows attaining the extreme
    (selection_func.h:230)."""
    from griddb_spark.operators import max_rows, min_rows

    ev = cat(spark, sf_dir).load("events")
    cols = ["event_id", "ts", "user_id", "value"]
    mx = max_rows(ev, "value").select(F.lit("max").alias("which"), *cols)
    mn = min_rows(ev, "value").select(F.lit("min").alias("which"), *cols)
    return mx.unionByName(mn)


@query(
    "ts_weighted_avg_range",
    f"""
    WITH e AS (
      SELECT * FROM ({_DUCK_EV})
      WHERE ts BETWEEN TIMESTAMP '2024-01-10 00:00:00'
                   AND TIMESTAMP '2024-01-20 00:00:00'
    ),
    w AS (
      SELECT value, epoch_ms(ts) AS t,
        lag(epoch_ms(ts)) OVER win AS pt,
        lead(epoch_ms(ts)) OVER win AS nt
      FROM e WINDOW win AS (ORDER BY epoch_ms(ts))
    ),
    wt AS (
      SELECT value,
        (CASE WHEN nt IS NULL THEN t ELSE t + (nt - t) // 2 END
         - CASE WHEN pt IS NULL THEN t ELSE pt + (t - pt) // 2 END) AS wgt
      FROM w
    )
    SELECT round(CASE WHEN sum(wgt) > 0 THEN sum(value * wgt) / sum(wgt)
                 ELSE avg(value) END, 6) AS aggregation_result
    FROM wt
    """,
)
def ts_weighted_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NoSQL API aggregate(start, end, col, WEIGHTED_AVERAGE)
    (Aggregation.java:72-198, TimeSeries.java:136-617)."""
    from griddb_spark.operators import aggregate_time_range

    ev = cat(spark, sf_dir).load("events")
    out = aggregate_time_range(
        ev, "2024-01-10 00:00:00", "2024-01-20 00:00:00", "value",
        "WEIGHTED_AVERAGE", "ts",
    )
    return out.select(_r6(F.col("aggregation_result")).alias("aggregation_result"))


@query(
    "asof_join_users",
    f"""
    WITH e AS ({_DUCK_EV}),
    l AS (SELECT event_id, ts, value FROM e WHERE user_id = 1),
    r AS (SELECT ts, value FROM e WHERE user_id = 2),
    u AS (
      SELECT ts, 0 AS side, ts AS r_ts, value AS r_value,
             NULL::BIGINT AS event_id, NULL::DOUBLE AS l_value FROM r
      UNION ALL
      SELECT ts, 1, NULL, NULL, event_id, value FROM l
    ),
    w AS (
      SELECT ts, side, event_id, l_value,
        last_value(r_ts IGNORE NULLS) OVER
          (ORDER BY ts, side ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_ts,
        last_value(r_value IGNORE NULLS) OVER
          (ORDER BY ts, side ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_value
      FROM u
    )
    SELECT event_id, ts, l_value AS value, m_ts AS r_ts, m_value AS r_value
    FROM w WHERE side = 1
    """,
)
def asof_join_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each user-1 event gets the latest user-2 event
    at or before it — the scale path behind TIME_PREV against another
    container (beyond-reference, SURVEY §7 phase 5)."""
    from griddb_spark.operators import asof_join

    ev = cat(spark, sf_dir).load("events")
    left = ev.filter(F.col("user_id") == 1).select("event_id", "ts", "value")
    right = ev.filter(F.col("user_id") == 2).select("ts", "value")
    out = asof_join(left, right, on="ts", direction="backward", right_prefix="r_")
    return out.select("event_id", "ts", "value", "r_ts", "r_value")


@query(
    "asof_join_tolerance",
    f"""
    WITH e AS ({_DUCK_EV}),
    l AS (SELECT event_id, ts, value FROM e WHERE user_id = 1),
    r AS (SELECT ts, value FROM e WHERE user_id = 2),
    u AS (
      SELECT ts, 0 AS side, ts AS r_ts, value AS r_value,
             NULL::BIGINT AS event_id, NULL::DOUBLE AS l_value FROM r
      UNION ALL
      SELECT ts, 1, NULL, NULL, event_id, value FROM l
    ),
    w AS (
      SELECT ts, side, event_id, l_value,
        last_value(r_ts IGNORE NULLS) OVER
          (ORDER BY ts DESC, side ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS m_ts,
        last_value(r_value IGNORE NULLS) OVER
          (ORDER BY ts DESC, side ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW) AS m_value
      FROM u
    ),
    t AS (SELECT event_id, ts, l_value,
            CASE WHEN abs(epoch_ms(m_ts) - epoch_ms(ts)) <= 600000
                 THEN m_ts END AS r_ts,
            CASE WHEN abs(epoch_ms(m_ts) - epoch_ms(ts)) <= 600000
                 THEN m_value END AS r_value
          FROM w WHERE side = 1)
    SELECT event_id, ts, l_value AS value, r_ts, r_value FROM t
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction with a 10-minute tolerance (the
    pandas merge_asof tolerance semantics): each user-1 event gets the
    EARLIEST user-2 event at or after it, but only within the window —
    matches farther away null out instead of attaching a stale row. Same
    single-sort tagged-union plan; the tolerance is a post-predicate on
    the matched struct, so no extra join or shuffle."""
    from griddb_spark.operators import asof_join

    ev = cat(spark, sf_dir).load("events")
    left = ev.filter(F.col("user_id") == 1).select("event_id", "ts", "value")
    right = ev.filter(F.col("user_id") == 2).select("ts", "value")
    out = asof_join(left, right, on="ts", direction="forward",
                    tolerance_ms=600_000, right_prefix="r_")
    return out.select("event_id", "ts", "value", "r_ts", "r_value")


# ===========================================================================
# query-language front-ends (TQL + GridDB SQL) driven end-to-end
# ===========================================================================


@query(
    "tql_select_where_order_limit",
    """
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_acctbal >= 5000 ORDER BY c_custkey LIMIT 10 OFFSET 5
    """,
)
def tql_select_where_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TQL end-to-end (guide sample TQLSelect.java:54 shape): parse → filter
    pushdown → order/limit/offset."""
    from griddb_spark.container import Collection

    c = cat(spark, sf_dir)
    col = Collection("customer", c.load("customer"), row_key="c_custkey")
    return col.query(
        "SELECT c_custkey, c_name, c_acctbal WHERE c_acctbal >= 5000 "
        "ORDER BY c_custkey LIMIT 10 OFFSET 5"
    )


@query(
    "tql_aggregation",
    """
    SELECT round(avg(s_acctbal), 6) AS aggregation_result
    FROM supplier WHERE s_nationkey < 10
    """,
)
def tql_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TQL aggregation (guide TQLAggregation.java shape): one scalar out."""
    from griddb_spark.container import Collection

    c = cat(spark, sf_dir)
    col = Collection("supplier", c.load("supplier"))
    out = col.query("SELECT AVG(s_acctbal) WHERE s_nationkey < 10")
    return out.select(_r6(F.col("aggregation_result")).alias("aggregation_result"))


@query(
    "tql_geometry_probe",
    """
    WITH g AS (SELECT user_id, value,
                 (user_id % 100)::DOUBLE AS px, (user_id % 53)::DOUBLE AS py
               FROM events)
    SELECT user_id, round(sum(value), 6) AS sv, count(*) AS n
    FROM g
    WHERE px >= 20 AND px <= 45 AND py >= 10 AND py <= 30
    GROUP BY user_id
    """,
)
def tql_geometry_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TQL geometry condition (function_gis.h — ST_MBRINTERSECTS with an
    ST_MAKERECT probe is what GridDB's R-tree evaluates): a GEOMETRY
    (WKT) column built deterministically from event fields, probed
    through the TQL front-end; the envelope extraction + interval
    overlap run as pure SQL column math. The oracle checks the same
    containment on the raw coordinates — a wrong WKT parse or overlap
    test cannot hash-match."""
    from griddb_spark.container import Collection

    ev = cat(spark, sf_dir).load("events").select(
        "user_id", "value",
        F.concat(
            F.lit("POINT("), (F.col("user_id") % 100).cast("double"),
            F.lit(" "), (F.col("user_id") % 53).cast("double"), F.lit(")"),
        ).alias("geom"),
    )
    col = Collection("events_geo", ev)
    out = col.query(
        "SELECT user_id, value "
        "WHERE ST_MBRINTERSECTS(geom, ST_MAKERECT(20, 10, 45, 30))"
    )
    return out.groupBy("user_id").agg(
        F.round(F.sum("value"), 6).alias("sv"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "sql_frontend_group_by_range",
    _duck_fill_base(3_600_000)
    + """
    SELECT make_timestamp(b * 1000) AS ts,
           round(av, 6) AS av,
           n
    FROM joined
    """,
)
def sql_frontend_group_by_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB SQL text → GROUP BY RANGE operator via the translation
    front-end (sql/translate.py)."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    out = griddb_sql(
        spark, c,
        "SELECT ts, avg(value) AS av, count(*) AS n FROM events "
        f"WHERE ts BETWEEN TIMESTAMP('{EV_START.replace(' ', 'T')}Z') "
        f"AND TIMESTAMP('{EV_END.replace(' ', 'T')}Z') "
        "GROUP BY RANGE (ts) EVERY (1, HOUR) FILL (NULL)",
    )
    return out.select("ts", _r6(F.col("av")).alias("av"), "n")


@query(
    "sql_frontend_leading_hint",
    """
    SELECT c_mktsegment,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_mktsegment
    """,
)
def sql_frontend_leading_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB ``/*+ Leading(...) */`` join-order hint
    (sql_compiler.h:36-64, applied sql_compiler.cpp:10201) through the SQL
    front-end: the comma-list FROM clause is reordered to the hinted
    order, which Catalyst preserves (no cost-based join reorder by
    default) — so the fact table leads the left-deep tree exactly as the
    hint demands. Same result set either way (inner-join commutativity);
    the plan test pins the order."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "SELECT /*+ Leading(lineitem orders customer) */ c_mktsegment, "
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) "
        "         * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) "
        "  AS revenue, "
        "count(*) AS n_lines "
        "FROM customer, orders, lineitem "
        "WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey "
        "GROUP BY c_mktsegment",
    )


@query(
    "sql_frontend_row_count_hint",
    """
    SELECT n_name,
           count(*) AS n_suppliers,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier, nation
    WHERE s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def sql_frontend_row_count_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB ``/*+ TableRowCount(t, n) */`` statistical hint
    (sql_compiler.h:63 TABLE_ROW_COUNT; sql_compiler.cpp:12495-12520
    resolveJoinNodeApproxSize uses it to pick the small/driving join
    side). Spark's equivalent decision is broadcast-vs-shuffle, so a
    small hinted count maps to ``/*+ BROADCAST(t) */`` — here nation
    (25 rows) is force-broadcast; the plan test pins the
    BroadcastHashJoin. Result set identical either way."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "SELECT /*+ TableRowCount(nation, 25) */ n_name, "
        "count(*) AS n_suppliers, "
        "CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal "
        "FROM supplier, nation "
        "WHERE s_nationkey = n_nationkey "
        "GROUP BY n_name",
    )


@query(
    "source_csv_json_roundtrip",
    """
    SELECT 'csv' AS fmt, c_custkey, c_name, c_nationkey, c_acctbal,
           c_mktsegment
    FROM customer
    UNION ALL
    SELECT 'json' AS fmt, c_custkey, c_name, c_nationkey, c_acctbal,
           c_mktsegment
    FROM customer
    """,
)
def source_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON source/sink fidelity (GridDB's expimp interchange
    formats): export the customer container to both formats with the
    distributed writer, read each back through import_container with the
    original schema (no inference pass at scale), and return the union —
    the oracle reads the untouched parquet, so any value/dtype corruption
    in either format's round-trip hash-mismatches."""
    import tempfile

    c = cat(spark, sf_dir)
    src = c.load("customer")
    out = tempfile.mkdtemp(prefix="srcfmt_")
    parts = []
    for fmt in ("csv", "json"):
        path = c.export_container("customer", out, fmt=fmt)
        back = c.import_container(path, fmt=fmt, schema=src.schema)
        parts.append(back.select(F.lit(fmt).alias("fmt"), *src.columns))
    return parts[0].unionByName(parts[1])


@query(
    "sql_frontend_dop_hint",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders WHERE o_totalprice > 1000
    GROUP BY o_orderpriority
    """,
)
def sql_frontend_dop_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB ``/*+ MaxDegreeOfParallelism(n) */`` execution-resource
    hint (sql_compiler.h:36-64 MAX_DEGREE_OF_PARALLELISM — caps the
    statement's task parallelism). Spark's statement-level lever is the
    ``REPARTITION(n)`` hint, which pins the shuffle partition count for
    the hinted SELECT; the plan test pins the partition count. Result
    set identical either way."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "SELECT /*+ MaxDegreeOfParallelism(4) */ o_orderpriority, "
        "count(*) AS n FROM orders WHERE o_totalprice > 1000 "
        "GROUP BY o_orderpriority",
    )


@query(
    "sql_dbapi_cursor",
    """
    SELECT c_mktsegment, count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_bal
    FROM customer
    WHERE c_acctbal > ?
    GROUP BY c_mktsegment
    """.replace("?", "1000"),
)
def sql_dbapi_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBAPI2 (PEP 249) access layer (5.7 Python DBAPI2 samples):
    connect → cursor → execute with a qmark parameter → fetchmany paging
    — the whole statement drives through the cursor surface, rows stream
    through toLocalIterator (never a full collect), and the re-assembled
    pages must value-hash against the oracle's plain SQL."""
    from griddb_spark import dbapi

    conn = dbapi.connect(spark, sf_dir)
    cur = conn.cursor()
    cur.arraysize = 2
    cur.execute(
        "SELECT c_mktsegment, count(*) AS n, "
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) "
        "  AS total_bal "
        "FROM customer WHERE c_acctbal > ? GROUP BY c_mktsegment",
        (1000,),
    )
    rows = []
    while True:
        page = cur.fetchmany()
        if not page:
            break
        assert len(page) <= 2
        rows.extend(page)
    cur.close()
    conn.close()
    return spark.createDataFrame(
        rows, "c_mktsegment string, n long, total_bal double"
    )


@query(
    "sql_frontend_index_hint",
    """
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders WHERE o_totalprice > 150000
    GROUP BY o_orderstatus
    """,
)
def sql_frontend_index_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB ``/*+ NoIndexScan(t) */`` / ``/*+ IndexScan(t) */`` scan
    hints (sql_compiler.h:44-45; applyScanOption sql_compiler.cpp:
    10128-10138 sets/clears the scan node's CMD_OPT_SCAN_INDEX flag —
    index use vs. full scan). Spark's scan-acceleration analog is parquet
    filter pushdown + row-group/page skipping via min-max statistics (the
    storage-side index), so NoIndexScan pins a pushdown barrier over the
    hinted table for the statement: every file is read and the predicate
    evaluates above the scan — the full-scan posture, results unchanged.
    IndexScan is the default posture (stripped). The plan test pins
    PushedFilters present without the hint / absent with it; this gate
    proves value-identity against the oracle's plain scan."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "SELECT /*+ NoIndexScan(orders) */ o_orderstatus, count(*) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "  AS total_price "
        "FROM orders WHERE o_totalprice > 150000 "
        "GROUP BY o_orderstatus",
    )


@query(
    "sql_frontend_index_join_hint",
    """
    SELECT c_mktsegment, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 50000
    GROUP BY c_mktsegment
    """,
)
def sql_frontend_index_join_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB ``/*+ NoIndexJoin(a b) */`` / ``/*+ IndexJoin(a b) */``
    join-method hints (sql_compiler.h:47-48; consumed per table pair at
    sql_compiler.cpp:10217-10221 findJoinMethodHint — force/forbid the
    index-nested-loop join for that pair). Spark's physical analog of
    "probe the inner through a lookup structure" vs "no lookup structure"
    is ShuffledHashJoin vs SortMergeJoin, so NoIndexJoin(a b) maps to
    MERGE(b) and IndexJoin(a b) to SHUFFLE_HASH(b). Same result set
    either way; the plan test pins the physical strategy flip. This gate
    proves value-identity under NoIndexJoin against the oracle's plain
    join."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "SELECT /*+ NoIndexJoin(orders customer) */ c_mktsegment, "
        "count(*) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "  AS total_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE o_totalprice > 50000 "
        "GROUP BY c_mktsegment",
    )


@query(
    "sql_frontend_cost_hint",
    """
    SELECT n_name, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
    WHERE o_totalprice > 100000
    GROUP BY n_name
    """,
)
def sql_frontend_cost_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB's cost-based-optimizer hint family (sql_compiler.h:55-60;
    isLegacyJoinReordering/JoinDriving sql_compiler.cpp:13382-13420; 5.9
    CostBasedIndexScan, GridDB-5.9-CE-RELEASE_NOTES.md): each pair flips
    one optimizer strategy between cost-based and rule-based for the
    statement. Spark seats: (No)CostBasedJoinDriving → AQE on/off
    (runtime-stats driving-side selection vs the static initial plan),
    (No)CostBasedJoin → CBO join-reorder conf, (No)CostBasedIndexScan →
    dynamic partition pruning. This gate runs the rule-based trio —
    NoCostBasedJoinDriving() NoCostBasedJoin() NoCostBasedIndexScan() —
    and must return exactly the cost-based (default/oracle) values; the
    plan test pins the AdaptiveSparkPlan presence flip and conf
    restoration."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "SELECT /*+ NoCostBasedJoinDriving() NoCostBasedJoin() "
        "NoCostBasedIndexScan() */ n_name, count(*) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
        "  AS total_price "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_totalprice > 100000 "
        "GROUP BY n_name",
    )


@query(
    "sql_frontend_gen_rows_hint",
    _duck_fill_base(900_000)
    + """
    SELECT make_timestamp(b * 1000) AS ts,
           round(av, 6) AS avg_value,
           n
    FROM joined
    """,
)
def sql_frontend_gen_rows_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB ``/*+ MaxGeneratedRows(n) */`` (sql_compiler.h:40; read at
    sql_compiler.cpp:13354-13363 and enforced by the GROUP BY RANGE merge
    operator — "Too many groups filled", sql_operator_group.cpp:1378,
    default 100k per sql_operator_group.h:314): the statement's budget of
    FILL-generated empty-bucket rows. The front-end threads the hinted
    budget into ``group_by_range``; here the lattice (2881 buckets)
    provably fits the hinted 500k budget, so the guard costs nothing and
    the result must value-hash against the plain FILL(NULL) oracle. The
    runtime guard itself (broadcast one-row fill count + raise_error) is
    exercised by ``gbr_generation_budget`` and unit-tested for the error
    path."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    out = griddb_sql(
        spark, c,
        "SELECT /*+ MaxGeneratedRows(500000) */ avg(value) AS av, "
        "count(*) AS n FROM events "
        f"WHERE ts BETWEEN TIMESTAMP('{EV_START.replace(' ', 'T')}Z') "
        f"AND TIMESTAMP('{EV_END.replace(' ', 'T')}Z') "
        "GROUP BY RANGE (ts) EVERY (15, MINUTE) FILL (NULL)",
    )
    return out.select(
        "ts", _r6(F.col("av")).alias("avg_value"), "n"
    )


@query(
    "gbr_generation_budget",
    f"""
    WITH ev AS (
      SELECT user_id % 4 AS series, ts, value FROM events
      WHERE epoch_ms(CAST(ts AS TIMESTAMP))
            BETWEEN {EV_START_MS} AND {EV_END_MS}
    ),
    agg AS (
      SELECT series,
             ({EV_START_MS} + (epoch_ms(CAST(ts AS TIMESTAMP))
              - {EV_START_MS}) // 3600000 * 3600000) AS b,
             avg(value) AS av, count(*) AS cnt
      FROM ev GROUP BY 1, 2
    ),
    grid AS (
      SELECT {EV_START_MS} + s.g * 3600000 AS b
      FROM generate_series(0, ({EV_END_MS} - {EV_START_MS}) // 3600000) s(g)
    ),
    series AS (SELECT DISTINCT series FROM ev)
    SELECT series.series, make_timestamp(grid.b * 1000) AS ts,
           round(agg.av, 6) AS avg_value, agg.cnt AS n
    FROM series CROSS JOIN grid
    LEFT JOIN agg ON agg.series = series.series AND agg.b = grid.b
    """,
)
def gbr_generation_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY RANGE fill-generation budget with the guard ACTIVE: a
    per-series fill (series keys make the fill count data-dependent, so
    the lattice alone can't prove the budget holds and the runtime guard
    — broadcast one-row fill count + JVM-side raise_error, no extra
    action, no Python — is built into the plan). The statement stays
    within the reference's default 100k budget
    (sql_operator_group.h:314), so it must return the plain filled
    result; the error path is unit-tested
    (tests/test_sql_frontends.py)."""
    from griddb_spark.operators import group_by_range

    ev = cat(spark, sf_dir).load("events").withColumn(
        "series", F.col("user_id") % 4
    )
    out = group_by_range(
        ev, "ts", 1, "HOUR",
        {"av": F.avg("value"), "n": F.count(F.lit(1))},
        start=EV_START, end=EV_END, fill="NULL", by=["series"],
    )
    return out.select(
        "series", "ts", _r6(F.col("av")).alias("avg_value"), "n"
    )


@query(
    "match_recognize_spikes",
    f"""
    WITH e AS ({_DUCK_EV}),
    w AS (
      SELECT user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS pv
      FROM e
    )
    SELECT user_id, ts AS spike_ts, value AS spike_value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS match_no
    FROM w WHERE pv IS NOT NULL AND value > pv * 2
    """,
)
def match_recognize_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE (OP_WINDOW_MATCH, 5.9): single-variable pattern over
    per-user partitions — spikes where value more than doubles. Single-row
    matches make the NFA result SQL-checkable (no overlap ambiguity)."""
    from griddb_spark.operators import match_recognize

    ev = cat(spark, sf_dir).load("events")
    return match_recognize(
        ev,
        pattern="SPIKE",
        define={"SPIKE": "value > PREV(value) * 2"},
        measures={"spike_ts": "LAST(ts)", "spike_value": "LAST(value)"},
        partition_by=["user_id"],
        order_by="ts",
    )


@query(
    "match_recognize_two_var",
    f"""
    WITH e AS ({_DUCK_EV}),
    r0 AS (SELECT user_id, ts, value,
             value >= 150 AS a, value < 150 AS b,
             row_number() OVER w AS rn,
             coalesce(lag(value >= 150) OVER w, FALSE) AS pa,
             coalesce(lag(value < 150) OVER w, FALSE) AS pb
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    r AS (SELECT user_id, ts, value, a, b, rn,
            sum(CASE WHEN a AND NOT pa THEN 1 ELSE 0 END) OVER w AS arun,
            sum(CASE WHEN b AND NOT pb THEN 1 ELSE 0 END) OVER w AS brun
          FROM r0 WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
    r2 AS (SELECT *,
             min(ts) OVER (PARTITION BY user_id, arun, a) AS run_start_ts,
             max(ts) OVER (PARTITION BY user_id, brun, b) AS bend_ts,
             last_value(value) OVER (
               PARTITION BY user_id, brun, b ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS bend_value
           FROM r),
    anch AS (SELECT *, lead(bend_ts) OVER w2 AS end_ts,
                    lead(bend_value) OVER w2 AS end_value,
                    coalesce(lead(b) OVER w2, FALSE) AS nb
             FROM r2 WINDOW w2 AS (PARTITION BY user_id ORDER BY rn))
    SELECT user_id, run_start_ts AS start_ts, end_ts, end_value,
           row_number() OVER (PARTITION BY user_id ORDER BY rn) AS match_no
    FROM anch WHERE a AND nb
    """,
)
def match_recognize_two_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE two-variable sequence (OP_WINDOW_MATCH, 5.9): the
    spike-then-recover shape ``A+ B+`` — a maximal run of high readings
    followed by at least one recovery row, ONE ROW PER MATCH. The
    row-disjoint DEFINEs put this on the JVM window fast path (no Python
    NFA in the plan — plan-tested); the oracle replays the run/anchor
    window algebra. AFTER MATCH SKIP PAST LAST ROW semantics throughout."""
    from griddb_spark.operators import match_recognize

    ev = cat(spark, sf_dir).load("events")
    return match_recognize(
        ev,
        pattern="A+ B+",
        define={"A": "value >= 150", "B": "value < 150"},
        measures={"start_ts": "FIRST(ts)", "end_ts": "LAST(ts)",
                  "end_value": "LAST(value)"},
        partition_by=["user_id"],
        order_by="ts",
    )


# ===========================================================================
# pipeline operators — dedup / similarity / text analysis / multimodal
# (beyond the reference surface; griddb_spark.pipeline)
# ===========================================================================

#: DuckDB shingle CTE shared by the text-dedup oracles (word 3-grams,
#: mirroring pipeline.text.word_shingles)
_DUCK_SHINGLES = """
with t as (select doc_id, string_split_regex(trim(text), '\\s+') w from documents),
shingle as (select doc_id,
    list_distinct([array_to_string(w[i:i+2], ' ')
                   for i in range(1, greatest(len(w)-2, 0)+1)]) sh
  from t)
"""


@query(
    "pipe_dedup_exact",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS survivor_id,
           count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
)
def pipe_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-groupBy, map-side combine, survivor = min id."""
    from griddb_spark.pipeline import exact_dedup

    docs = cat(spark, sf_dir).load("documents")
    return exact_dedup(docs, "text", "doc_id")


@query(
    "pipe_dedup_minhash",
    _DUCK_SHINGLES
    + """,
    ex as (select doc_id, unnest(sh) g from shingle),
    cand as (select distinct x.doc_id doc_a, y.doc_id doc_b
             from ex x join ex y on x.g = y.g and x.doc_id < y.doc_id),
    j as (select doc_a, doc_b,
                 round(len(list_intersect(a.sh, b.sh))::double
                       / len(list_distinct(list_concat(a.sh, b.sh))), 6) jaccard
          from cand join shingle a on a.doc_id = doc_a
                    join shingle b on b.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= 0.8
    """,
)
def pipe_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, exact-Jaccard verified. The oracle is
    brute force — LSH (16 bands × 2 rows) recall at J≥0.8 is 1-(1-.64)^16
    ≈ 1-1e-7 and verification removes all false positives, so the outputs
    agree; a recall miss would surface as a row-count mismatch."""
    from griddb_spark.pipeline import minhash_lsh_pairs

    docs = cat(spark, sf_dir).load("documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)


#: Near-dup pair graph + recursive transitive closure (DuckDB): the CTE
#: chain behind the components/canonical oracles. `WITH` must become
#: `WITH RECURSIVE` for the closure, hence the replace on the shared
#: shingle CTE. The `cand` blocking step is exact, not approximate: any
#: pair with Jaccard >= 0.8 > 0 shares at least one shingle, so
#: restricting the Jaccard test to shingle-sharing pairs loses nothing
#: (measured 27 s -> 4 s per oracle run at sf0.01).
_DUCK_COMPONENTS = _DUCK_SHINGLES.replace("with ", "WITH RECURSIVE ", 1) + """,
    ex as (select doc_id, unnest(sh) g from shingle),
    cand as (select distinct x.doc_id doc_a, y.doc_id doc_b
             from ex x join ex y on x.g = y.g and x.doc_id < y.doc_id),
    j as (select doc_a, doc_b
          from cand join shingle a on a.doc_id = doc_a
                    join shingle b on b.doc_id = doc_b
          where len(list_intersect(a.sh, b.sh))::double
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
    e as (select doc_a a, doc_b b from j union select doc_b, doc_a from j),
    reach(src, dst) as (
        select a, b from e
        union
        select r.src, e.b from reach r join e on r.dst = e.a
    )
"""


@query(
    "pipe_dedup_components",
    _DUCK_COMPONENTS
    + """
    SELECT src AS doc_id, least(src, min(dst)) AS component
    FROM reach GROUP BY src
    """,
)
def pipe_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters: connected components over the MinHash near-dup pair
    graph (Pregel-style min-label propagation, one shuffle join + min
    groupBy per round, lineage checkpointed per iteration). The oracle
    computes the same components via brute-force pairs + a recursive
    transitive closure."""
    from griddb_spark.pipeline import connected_components, minhash_lsh_pairs

    docs = cat(spark, sf_dir).load("documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    return connected_components(pairs)


@query(
    "join_bucketed_colocated",
    """
    SELECT c_mktsegment, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables (write_bucketed/bucketed_join,
    catalog.py): orders and customer persist hash-clustered into matching
    bucket counts on the join key, so the join is a sort-merge with ZERO
    exchange on either side (Bucketed: true scans — plan-tested). The
    write-once clustering that replaces the recurring fact-join shuffle
    at 100 TB; GridDB analog: affinity-key sub-container partitioning.
    Result identical to the plain shuffled join, which is the oracle."""
    from griddb_spark.catalog import bucketed_join, write_bucketed

    c = cat(spark, sf_dir)
    write_bucketed(c.load("orders"), "bq_orders", "o_custkey", 8,
                   sort_cols=("o_custkey",))
    write_bucketed(c.load("customer"), "bq_customer", "c_custkey", 8,
                   sort_cols=("c_custkey",))
    j = bucketed_join(spark, "bq_orders", "bq_customer",
                      "o_custkey", "c_custkey")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("total"),
    )


@query(
    "join_range_bucketed",
    f"""
    WITH e AS ({_DUCK_EV}),
    w AS (SELECT event_id AS win_id, ts AS ws,
                 ts + INTERVAL 2 HOUR AS we
          FROM e WHERE event_id % 97 = 0)
    SELECT w.win_id, count(*) AS n_events,
           min(e.user_id) AS first_user
    FROM w JOIN e ON e.ts >= w.ws AND e.ts <= w.we
    GROUP BY w.win_id
    """,
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join WITHOUT the nested-loop trap (range_join,
    operators/range_join.py): intervals explode into the hour buckets
    they overlap, points bucket once, and the join is a plain hash
    equi-join on the bucket with the exact BETWEEN as residual — where
    the naive non-equi join plans as BroadcastNestedLoopJoin/cartesian
    (O(points × intervals) at scale). Windows here are 2-hour spans
    anchored at every 97th event; the oracle runs the naive BETWEEN
    join, which is fine at oracle scale and proves the bucketing loses
    no pairs."""
    from griddb_spark.operators import range_join

    ev = cat(spark, sf_dir).load("events")
    wins = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("ws"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("we"),
    )
    j = range_join(ev.select("ts", "user_id"), wins, "ts", "ws", "we",
                   bucket_sec=3600)
    return j.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("user_id").alias("first_user"),
    )


def _zorder_oracle_sql(bits: int = 4) -> str:
    """DuckDB replay of zorder_expr for (l_partkey, l_suppkey): the same
    exact-integer bucket + bit-interleave, expanded textually."""
    scale = 1 << bits
    terms = []
    for d, (col, mn, mx) in enumerate(
        [("l_partkey", "mn1", "mx1"), ("l_suppkey", "mn2", "mx2")]
    ):
        b_expr = (f"least(greatest(({col} - {mn}) * {scale} "
                  f"// ({mx} - {mn} + 1), 0), {scale - 1})")
        for b in range(bits):
            terms.append(f"((({b_expr}) >> {b}) & 1) << {b * 2 + d}")
    z = " | ".join(f"({t})" for t in terms)
    return f"""
    WITH r AS (SELECT min(l_partkey) AS mn1, max(l_partkey) AS mx1,
                      min(l_suppkey) AS mn2, max(l_suppkey) AS mx2
               FROM lineitem)
    SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
           CAST({z} AS BIGINT) AS zval
    FROM lineitem, r WHERE l_orderkey < 200
    """


@query("pipe_zorder_layout", _zorder_oracle_sql())
def pipe_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering value (zorder_expr, dml.py): exact-
    integer bucketing + bit interleave of (l_partkey, l_suppkey) — the
    multi-dimensional layout key that makes parquet row-group skipping
    work for predicates on ANY clustered dimension (the Delta/Iceberg
    OPTIMIZE ZORDER capability as plain column math; GridDB analog:
    composite NarrowingKey partitioning, sql_parser.h:300-303). The
    oracle replays the same bit algebra; write_zordered uses this value
    with a range repartition for the physical layout (file-stats
    tightness is pinned by test)."""
    from griddb_spark.dml import zorder_expr

    li = cat(spark, sf_dir).load("lineitem")
    row = li.agg(
        F.min("l_partkey").alias("mn1"), F.max("l_partkey").alias("mx1"),
        F.min("l_suppkey").alias("mn2"), F.max("l_suppkey").alias("mx2"),
    ).collect()[0]
    z = zorder_expr(
        [(F.col("l_partkey"), row["mn1"], row["mx1"]),
         (F.col("l_suppkey"), row["mn2"], row["mx2"])],
        bits=4,
    )
    return li.filter(F.col("l_orderkey") < 200).select(
        "l_orderkey", "l_linenumber", z.alias("zval")
    )


@query(
    "pipe_quality_c4",
    """
    WITH l AS (SELECT doc_id, doc_id // 5 AS gid,
                 CASE WHEN doc_id % 3 = 0 THEN text || '.' ELSE text END
                   AS line
               FROM documents),
    g AS (SELECT gid, string_agg(line, chr(10) ORDER BY doc_id) AS text
          FROM l GROUP BY gid),
    f AS (SELECT gid,
            list_filter(string_split(text, chr(10)),
              x -> regexp_matches(x, '[.!?]$')
                   AND len(string_split_regex(trim(x), ' +')) >= 5
                   AND NOT contains(lower(x), 'lorem ipsum')
                   AND NOT contains(x, '{')) AS kept,
            len(string_split(text, chr(10))) AS n_lines
          FROM g)
    SELECT gid, array_to_string(kept, chr(10)) AS clean_text,
           CAST(n_lines AS INT) AS n_lines, CAST(len(kept) AS INT) AS n_kept,
           CAST(CASE WHEN len(kept) >= 2 THEN 1 ELSE 0 END AS INT) AS keep
    FROM f
    """,
)
def pipe_quality_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2; c4_line_filter,
    pipeline/quality.py): terminal-punctuation + min-words + badword
    line rules, then a min-surviving-lines document gate — one
    higher-order filter per row, shuffle-free after the (test-only)
    multi-line document construction. The synthetic corpus is
    single-line, so the gate builds 5-line documents deterministically
    (every 3rd source line gets terminal punctuation) and the oracle
    replays both the construction and the rules."""
    from pyspark.sql import Window as _W

    from griddb_spark.pipeline.quality import c4_line_filter

    docs = cat(spark, sf_dir).load("documents")
    lines = docs.select(
        (F.col("doc_id") / 5).cast("bigint").alias("gid"),
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.concat("text", F.lit(".")))
        .otherwise(F.col("text")).alias("line"),
    )
    g = lines.groupBy("gid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("text")
    )
    return c4_line_filter(g, "gid", "text", min_words=5, min_kept_lines=2)


@query(
    "pipe_split_leakage_safe",
    _DUCK_COMPONENTS
    + """,
    comp AS (SELECT src AS doc_id, least(src, min(dst)) AS component
             FROM reach GROUP BY src),
    g AS (SELECT d.doc_id, d.source,
            coalesce(c.component, d.doc_id) AS gk
          FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
    b AS (SELECT doc_id, source,
            ('0x' || substr(md5(gk::VARCHAR), 1, 8))::BIGINT % 10000 AS bk
          FROM g),
    s AS (SELECT doc_id, source,
            CASE WHEN bk >= 0 AND bk < 9000 THEN 'train'
                 WHEN bk >= 9000 AND bk < 9500 THEN 'val'
                 WHEN bk >= 9500 AND bk < 10000 THEN 'test'
                 ELSE 'rest' END AS split
          FROM b)
    SELECT source, split, count(*) AS n, min(doc_id) AS min_id
    FROM s GROUP BY source, split
    """,
)
def pipe_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split (leakage_safe_split, pipeline/sampling.py):
    membership hashes the near-dup COMPONENT id, so a test document's
    near-twin can never sit in train — the eval-contamination failure
    mode of splitting a deduplicated-but-not-collapsed corpus. The
    oracle recomputes the MinHash components and replays the bucketing
    over the component key."""
    from griddb_spark.pipeline import (
        connected_components,
        leakage_safe_split,
        minhash_lsh_pairs,
    )

    docs = cat(spark, sf_dir).load("documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    comps = connected_components(pairs)
    out = leakage_safe_split(docs, comps, "doc_id",
                             {"train": 0.9, "val": 0.05, "test": 0.05})
    return out.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id")
    )


@query(
    "pipe_dedup_canonical",
    _DUCK_COMPONENTS
    + """,
    comp as (select src doc_id, least(src, min(dst)) component
             from reach group by src)
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.doc_id = d.doc_id AND c.component < d.doc_id)
    """,
)
def pipe_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup removal: pair graph → components → keep the
    component-min document per cluster plus every unclustered document —
    a single left-anti join of the corpus against the (small) loser list,
    so the corpus is scanned once and never shuffled."""
    from griddb_spark.pipeline import (
        canonical_filter,
        connected_components,
        minhash_lsh_pairs,
    )

    docs = cat(spark, sf_dir).load("documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    comps = connected_components(pairs)
    return canonical_filter(docs, comps).select("doc_id")


@query(
    "pipe_sample_stratified",
    """
    SELECT lang, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM documents
    WHERE ('0x'||substr(md5(cast(doc_id as varchar)),1,8))::bigint % 10000 <
          CAST(10000 * (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0
                        WHEN 'es' THEN 0.25 ELSE 0 END) AS BIGINT)
    GROUP BY lang
    """,
)
def pipe_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (content-hash of the row key, not
    seed-per-partition df.sample): keep 50% of 'en', all of 'de', 25% of
    'es', drop the rest — bit-identical keep decisions across engines,
    partitionings, and reruns (dataset reproducibility). Rates with exact
    binary representations so both engines' rate*10000 agree exactly."""
    from griddb_spark.pipeline import stratified_sample

    docs = cat(spark, sf_dir).load("documents")
    kept = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 1.0, "es": 0.25}
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "pipe_decontaminate",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
               FROM documents),
    g AS (SELECT doc_id,
            list_distinct([array_to_string(w[i:i+2], ' ')
                           FOR i IN range(1, greatest(len(w)-2, 0)+1)]) sh
          FROM t),
    bg AS (SELECT DISTINCT unnest(sh) AS gram FROM g WHERE doc_id % 41 = 0),
    cg AS (SELECT doc_id, unnest(sh) AS gram FROM g WHERE doc_id % 41 <> 0)
    SELECT cg.doc_id, count(*) AS hits
    FROM cg JOIN bg USING (gram)
    GROUP BY cg.doc_id
    HAVING count(*) >= 2
    """,
)
def pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (pipeline.decontaminate): training docs
    sharing >= 2 distinct word 3-grams with the benchmark slice
    (doc_id % 41 == 0 stands in for an eval suite; real pipelines use
    longer grams on longer documents). Benchmark gram set is broadcast —
    corpus grams never shuffle."""
    from griddb_spark.pipeline import contamination_report

    docs = cat(spark, sf_dir).load("documents")
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    return contamination_report(corpus, bench, "doc_id", "text",
                                n=3, min_hits=2)


@query(
    "pipe_pack_sequences",
    """
    WITH t AS (SELECT doc_id,
            len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
            ('0x'||substr(md5(cast(doc_id AS varchar)),1,8))::BIGINT
              % 10000 % 8 AS bucket
          FROM documents),
    s AS (SELECT doc_id, n_tokens, bucket,
            coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS strt
          FROM t)
    SELECT doc_id, n_tokens, bucket,
           (strt // 256)::BIGINT AS pack_id,
           (strt % 256)::BIGINT AS pack_offset
    FROM s
    """,
)
def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing (pipeline.packing): documents laid
    head-to-tail into 256-token packs inside 8 content-hash buckets —
    doc-level 'concatenate then chunk'. One shuffle (window by bucket)
    regardless of corpus size; bit-identical layout in both engines."""
    from griddb_spark.pipeline.packing import pack_sequences

    docs = cat(spark, sf_dir).load("documents")
    return pack_sequences(docs, "doc_id", "text", budget=256, n_buckets=8)


@query(
    "pipe_vocab_topk",
    """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
)
def pipe_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency top-k (pipeline.packing.vocab_topk): the
    seed statistics for tokenizer/vocab induction. Two-phase hash count
    with map-side combine, deterministic tie-break on token text."""
    from griddb_spark.pipeline.packing import vocab_topk

    docs = cat(spark, sf_dir).load("documents")
    return vocab_topk(docs, "text", k=50, mode="bpe")


#: DuckDB simhash CTE (mirrors pipeline.dedup.with_simhash)
_DUCK_SIMHASH = (
    "with tok as (select doc_id, md5(unnest(string_split_regex(trim(text),"
    " '\\s+'))) h from documents),\n"
    "hv as (select doc_id, [instr('0123456789abcdef', substr(h, p, 1)) - 1"
    " for p in range(1, 17)] hv from tok),\n"
    "votes as (select doc_id, "
    + ", ".join(
        f"sum(case when (hv[{j // 4 + 1}] & {1 << (3 - j % 4)}) != 0"
        f" then 1 else -1 end) > 0 b{j}"
        for j in range(64)
    )
    + " from hv group by doc_id),\n"
    "sim as (select doc_id, "
    + " || ".join(
        "substr('0123456789abcdef', ("
        + "+".join(f"(case when b{4 * d + i} then {8 >> i} else 0 end)" for i in range(4))
        + ")+1, 1)"
        for d in range(16)
    )
    + " simhash from votes),\n"
    "shv as (select doc_id, simhash, [instr('0123456789abcdef',"
    " substr(simhash, p, 1)) - 1 for p in range(1, 17)] v from sim)\n"
)


@query(
    "pipe_dedup_simhash",
    _DUCK_SIMHASH
    + """
    SELECT a.doc_id doc_a, b.doc_id doc_b,
           (SELECT sum(bit_count(xor(a.v[p]::bigint, b.v[p]::bigint)))
            FROM range(1, 17) r(p))::int AS hamming
    FROM shv a JOIN shv b ON a.doc_id < b.doc_id
    WHERE (SELECT sum(bit_count(xor(a.v[p]::bigint, b.v[p]::bigint)))
           FROM range(1, 17) r(p)) <= 3
    """,
)
def pipe_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ 3) via pigeonhole chunk banding
    (4×16-bit chunks ⇒ guaranteed recall at ≤3); oracle is brute force."""
    from griddb_spark.pipeline import simhash_pairs

    docs = cat(spark, sf_dir).load("documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


@query(
    "pipe_text_quality",
    """
    WITH t AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') w
               FROM documents)
    SELECT doc_id,
      length(text) AS n_chars,
      len(w) AS n_tokens,
      len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
        AS n_bpe_tokens,
      round(list_aggregate(list_transform(w, x -> length(x)), 'sum')::double
            / len(w), 6) AS mean_word_len,
      round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::double
            / length(text), 6) AS punct_ratio,
      round(len(list_filter(w, x -> x in ('the','a','an','of','and','or',
            'is','to','in','on')))::double / len(w), 6) AS stop_ratio,
      least(length(text)::double / 500.0, 1.0) * 0.25
            + (1.0 - round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '',
              'g'))::double / length(text), 6)) * 0.5
            + least(round(len(list_filter(w, x -> x in ('the','a','an','of',
              'and','or','is','to','in','on')))::double / len(w), 6) * 5.0,
              1.0) * 0.25 AS quality_score
    FROM t
    """,
)
def pipe_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/BPE-token/punct/stopword features + score."""
    from griddb_spark.pipeline import quality_stats

    # repartition before the interpreted higher-order feature exprs: a
    # single-file source is one scan partition, which serializes (and on a
    # cold JVM, runs the slow interpreted path) — spread across cores
    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    stats = quality_stats("text")
    return docs.select(
        "doc_id", *[c.alias(n) for n, c in stats.items()]
    )


@query(
    "pipe_lang_id",
    """
    WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') w
               FROM documents),
    m AS (SELECT doc_id, lang,
      len(list_filter(w, x -> x in ('the','and','of','is','with'))) en_n,
      len(list_filter(w, x -> x in ('der','die','und','ist','mit'))) de_n,
      len(list_filter(w, x -> x in ('el','los','las','es','con'))) es_n,
      len(list_filter(w, x -> x in ('le','les','des','est','avec'))) fr_n
      FROM t)
    SELECT doc_id, lang AS declared_lang,
      CASE WHEN en_n > 0 AND en_n >= greatest(de_n, es_n, fr_n) THEN 'en'
           WHEN de_n > 0 AND de_n >= greatest(es_n, fr_n) THEN 'de'
           WHEN es_n > 0 AND es_n >= fr_n THEN 'es'
           WHEN fr_n > 0 THEN 'fr'
           ELSE 'und' END AS pred_lang
    FROM m
    """,
)
def pipe_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon/n-gram language-ID heuristic vs the declared lang column."""
    from griddb_spark.pipeline import lang_id

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return docs.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        lang_id("text").alias("pred_lang"),
    )


@query(
    "pipe_fingerprint",
    """
    WITH g AS (SELECT doc_id,
        list_distinct([md5(substr(text, i, 8))
                       for i in range(1, greatest(length(text)-7, 1)+1)]) grams
      FROM documents)
    SELECT doc_id,
           array_to_string(list_sort(grams)[1:5], ',') AS fingerprint
    FROM g
    """,
)
def pipe_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: bottom-k sketch of rolling char-8-gram hashes."""
    from griddb_spark.pipeline import bottom_k_fingerprint

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return docs.select(
        "doc_id", bottom_k_fingerprint("text", n=8, k=5).alias("fingerprint")
    )


@query(
    "pipe_knn_cosine",
    """
    WITH q AS (SELECT vec_id q_id, embedding::double[] qv FROM embeddings
               WHERE vec_id < 5),
    c AS (SELECT vec_id n_id, embedding::double[] cv FROM embeddings),
    s AS (SELECT q_id, n_id,
            round(list_dot_product(qv, cv)
                  / (sqrt(list_dot_product(qv, qv))
                     * sqrt(list_dot_product(cv, cv))), 6) cos_sim
          FROM q CROSS JOIN c WHERE q_id != n_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cos_sim DESC, n_id) rnk FROM s)
    SELECT q_id, n_id, cos_sim, rnk AS rank FROM r WHERE rnk <= 3
    """,
)
def pipe_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for 5 query vectors (broadcast queries)."""
    from griddb_spark.pipeline import knn_bruteforce

    emb = cat(spark, sf_dir).load("embeddings")
    return knn_bruteforce(emb, emb.filter(F.col("vec_id") < 5), k=3)


@query(
    "pipe_ann_ivf",
    """
    WITH pos AS (SELECT label, generate_subscripts(embedding, 1) p,
                        unnest(embedding)::double v FROM embeddings),
    byp AS (SELECT label, p, avg(v) v FROM pos GROUP BY label, p),
    cent AS (SELECT label, list(v ORDER BY p) centroid FROM byp GROUP BY label),
    q AS (SELECT vec_id q_id, embedding::double[] qv FROM embeddings
          WHERE vec_id < 5),
    qc AS (SELECT q_id, qv, label,
             round(list_dot_product(qv, centroid)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(centroid, centroid))), 6) cc
           FROM q CROSS JOIN cent),
    probes AS (SELECT q_id, qv, label FROM
                 (SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY cc DESC, label) pr FROM qc)
               WHERE pr <= 2),
    s AS (SELECT p.q_id, e.vec_id n_id,
            round(list_dot_product(p.qv, e.embedding::double[])
                  / (sqrt(list_dot_product(p.qv, p.qv))
                     * sqrt(list_dot_product(e.embedding::double[],
                                             e.embedding::double[]))), 6) cos_sim
          FROM probes p JOIN embeddings e ON e.label = p.label
          WHERE p.q_id != e.vec_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cos_sim DESC, n_id) rnk FROM s)
    SELECT q_id, n_id, cos_sim, rnk AS rank FROM r WHERE rnk <= 3
    """,
)
def pipe_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probed ANN: label-cell centroids, nprobe=2, top-3 within
    probed cells. At scale the corpus is partitioned by cell → probe =
    partition-pruned scan."""
    from griddb_spark.pipeline import ann_ivf

    emb = cat(spark, sf_dir).load("embeddings")
    return ann_ivf(
        emb, emb.filter(F.col("vec_id") < 5), cell_col="label", k=3, nprobe=2
    )


@query(
    "pipe_multimodal_meta",
    """
    WITH b AS (SELECT doc_id, text, 32 * (strlen(text) // 32) m,
                 strlen(text) // 32 h
               FROM documents WHERE strlen(text) >= 32),
    p AS (SELECT doc_id, m, h,
                 [ascii(substr(text, i, 1)) for i in range(1, m + 1)] px
          FROM b)
    SELECT doc_id, 'image/png' AS format, CAST(32 AS INT) AS width,
      CAST(h AS INT) AS height, '89504e47' AS header_hex,
      round(list_aggregate(px, 'sum')::double / m, 6) AS mean_byte,
      round(coalesce(list_aggregate(px[1:(m//4)], 'avg'), 0.0), 6) AS f0,
      round(coalesce(list_aggregate(px[(m//4)+1:(2*m//4)], 'avg'), 0.0), 6)
        AS f1,
      round(coalesce(list_aggregate(px[(2*m//4)+1:(3*m//4)], 'avg'), 0.0), 6)
        AS f2,
      round(coalesce(list_aggregate(px[(3*m//4)+1:m], 'avg'), 0.0), 6) AS f3
    FROM p
    """,
)
def pipe_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end over REAL PNG bytes: each document's
    bytes become an 8-bit grayscale PNG (stdlib encoder, adaptive
    filters), metadata (width/height) is parsed from the IHDR chunk as a
    pure JVM Column expression — no decode, the 100 TB prune path — and
    features come from a genuine zlib-inflate + unfilter decode inside
    Arrow-batched mapInPandas (fake=False). The oracle never touches PNG:
    pixels are a deterministic function of the text bytes, so it verifies
    the whole encode→IHDR-parse→decode chain by recomputing the pixel
    statistics directly from the source bytes."""
    from griddb_spark.pipeline.multimodal import decode_features, png_pack

    # spread the single-file scan before the per-row PNG encode/decode
    # kernels: one scan partition = ONE Arrow python worker doing every
    # zlib deflate+inflate (the sibling resize/frames gates already do
    # this; isolated A/B 2.39 -> 1.71 s)
    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    packed = png_pack(docs, "text", width=32)
    feats = decode_features(packed, "media", "doc_id", fake=False)
    return (
        packed.select(
            "doc_id", "media_meta.format", "media_meta.width",
            "media_meta.height", "media_meta.header_hex",
        )
        .join(feats, "doc_id")
        .select(
            "doc_id", "format", "width", "height", "header_hex",
            _r6(F.col("mean_byte")).alias("mean_byte"),
            *[_r6(F.col("feat")[i]).alias(f"f{i}") for i in range(4)],
        )
    )


@query(
    "pipe_dedup_minhash_collapsed",
    """
    WITH c AS (SELECT min(doc_id) AS rep, count(*) AS csize
               FROM documents GROUP BY md5(text)),
    r AS (SELECT d.doc_id, d.text, c.csize FROM documents d
          JOIN c ON d.doc_id = c.rep),
    t AS (SELECT doc_id, csize, string_split_regex(trim(text), '\\s+') w
          FROM r),
    shingle AS (SELECT doc_id, csize,
        list_distinct([array_to_string(w[i:i+2], ' ')
                       for i in range(1, greatest(len(w)-2, 0)+1)]) sh
      FROM t),
    ex AS (SELECT doc_id, unnest(sh) g FROM shingle),
    cand AS (SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b
             FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id),
    j AS (SELECT doc_a, doc_b,
                 round(len(list_intersect(a.sh, b.sh))::double
                       / len(list_distinct(list_concat(a.sh, b.sh))), 6)
                   AS jaccard,
                 a.csize AS size_a, b.csize AS size_b
          FROM cand JOIN shingle a ON a.doc_id = doc_a
                    JOIN shingle b ON b.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard, size_a, size_b
    FROM j WHERE jaccard >= 0.8
    """,
)
def pipe_dedup_minhash_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup dedup with exact-duplicate pre-collapse (the web-scale
    composition): collapse identical texts to one representative per
    cluster, run MinHash-LSH on representatives only, carry cluster
    sizes through. LSH candidate pairs are bounded by DISTINCT document
    count — exact-duplicate clusters (boilerplate, mirrors, replicated
    corpora) no longer induce quadratic candidate sets."""
    from griddb_spark.pipeline import collapse_exact, minhash_lsh_pairs

    docs = cat(spark, sf_dir).load("documents")
    reps = collapse_exact(docs, "doc_id", "text")
    pairs = minhash_lsh_pairs(reps, "doc_id", "text", threshold=0.8)
    sz = reps.select(
        F.col("doc_id"), F.col("cluster_size")
    )
    return (
        pairs.join(
            sz.select(
                F.col("doc_id").alias("doc_a"),
                F.col("cluster_size").alias("size_a"),
            ),
            "doc_a",
        )
        .join(
            sz.select(
                F.col("doc_id").alias("doc_b"),
                F.col("cluster_size").alias("size_b"),
            ),
            "doc_b",
        )
        .select("doc_a", "doc_b", "jaccard", "size_a", "size_b")
    )


@query(
    "pipe_multimodal_resize",
    """
    WITH b AS (SELECT doc_id, text, strlen(text) // 32 h FROM documents
               WHERE strlen(text) >= 32)
    SELECT doc_id, CAST(64 AS INT) AS out_n,
      round(list_aggregate(
        [ascii(substr(text, (((i//8)*h)//8)*32 + ((i%8)*32)//8 + 1, 1))
         for i in range(0, 64)],
        'avg'), 6) AS r_mean
    FROM b
    """,
)
def pipe_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize stage over REAL PNGs: decode (zlib inflate +
    per-scanline unfilter) → nearest-neighbor resample of the 32×h
    grayscale image to 8×8 → re-encode PNG, inside Arrow-batched
    mapInPandas. The oracle replays the nearest-neighbor index arithmetic
    directly over the source bytes — a wrong decode (bad filter math, bad
    dimensions) cannot hash-match."""
    from griddb_spark.pipeline.multimodal import png_pack, resize_media

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    packed = png_pack(docs, "text", width=32)
    rz = resize_media(packed, "media", "doc_id", out_w=8, out_h=8)
    return rz.select(
        "doc_id",
        (F.col("r_w") * F.col("r_h")).cast("int").alias("out_n"),
        _r6(F.col("r_mean")).alias("r_mean"),
    )


@query(
    "pipe_multimodal_frames",
    """
    WITH b AS (SELECT doc_id, text, strlen(text) n FROM documents
               WHERE strlen(text) >= 32),
    u AS (SELECT doc_id, text, n, unnest(range(0, n // 32)) AS fi FROM b)
    SELECT doc_id, fi AS frame_idx,
      round(list_aggregate(
        [ascii(substr(text, fi*32 + j + 1, 1)) for j in range(0, 32)],
        'avg'), 6) AS f_mean
    FROM u WHERE fi % 2 = 0
    """,
)
def pipe_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame-sampling over REAL PNGs: every 2nd decoded
    scanline of the 32×h grayscale image is one output frame — a
    row-expanding mapInPandas whose every row passes through zlib inflate
    + unfilter (the video frame-sampler shape). Oracle unnests the same
    frame grid over the source bytes in SQL."""
    from griddb_spark.pipeline.multimodal import frame_sample, png_pack

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    packed = png_pack(docs, "text", width=32)
    fr = frame_sample(packed, "media", "doc_id", stride=2)
    return fr.select(
        "doc_id", "frame_idx", _r6(F.col("f_mean")).alias("f_mean")
    )


# ===========================================================================
# structured streaming — the continuous-ingest face (griddb_spark.streaming)
# ===========================================================================


@query(
    "stream_group_by_range",
    f"""
    SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS ts,
           round(avg(value), 6) AS avg_value,
           count(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def stream_group_by_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming GROUP BY RANGE: file-source stream over the events
    container → watermarked 1h event-time windows → memory sink run with
    availableNow. Gate: identical to the batch/DuckDB hourly aggregation
    (hour windows anchor at the epoch in both engines)."""
    import uuid as _uuid

    from griddb_spark.streaming import group_by_range_stream, run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        # file-source streams take a directory; the container dir holds
        # other tables too, so filter to the events file(s)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    # the driver testdata stores ts as parquet TIMESTAMP(NANOS), read as
    # epoch-nanos LONG under nanosAsLong; other sources may already carry
    # a plain µs timestamp — adapt to the scanned type
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = group_by_range_stream(
        ev, "ts", 1, "HOUR",
        {"avg_value": _r6(F.avg("value")), "n": F.count(F.lit(1))},
        watermark="10 minutes",
    )
    return run_to_memory(out, f"gbr_{_uuid.uuid4().hex[:8]}", mode="complete",
                         shuffle_partitions=8)


@query(
    "stream_sliding_window",
    """
    WITH e AS (SELECT CAST(ts AS TIMESTAMP) t, value FROM events),
    x AS (SELECT t, value,
                 time_bucket(INTERVAL 30 MINUTE, t)
                   - k * (INTERVAL 30 MINUTE) AS ts
          FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k))
    SELECT ts, round(avg(value), 6) AS avg_value, count(*) AS n
    FROM x GROUP BY ts
    """,
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLIDING event-time windows (1h window / 30m slide): every
    event contributes to duration/slide = 2 windows — the continuous face
    of a moving aggregate. Oracle materializes the same epoch-anchored
    window lattice by unnesting each event into its 2 windows."""
    import uuid as _uuid

    from griddb_spark.streaming import group_by_range_stream, run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = group_by_range_stream(
        ev, "ts", 1, "HOUR",
        {"avg_value": _r6(F.avg("value")), "n": F.count(F.lit(1))},
        watermark="10 minutes",
        slide=(30, "MINUTE"),
    )
    return run_to_memory(out, f"slw_{_uuid.uuid4().hex[:8]}", mode="complete",
                         shuffle_partitions=8)


# ===========================================================================
# DML + partitioned tables (EXEC_INSERT/UPDATE/DELETE, PARTITION BY)
# ===========================================================================


@query(
    "dml_update_delete",
    """
    WITH mutated AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal
      FROM customer
      WHERE NOT (c_mktsegment = 'AUTOMOBILE')
    )
    SELECT c_nationkey, count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM mutated GROUP BY c_nationkey
    """,
)
def dml_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXEC_UPDATE + EXEC_DELETE end-to-end: copy customer into a hash-
    partitioned container, UPDATE negative balances to 0, DELETE one market
    segment, aggregate the post-state. Oracle emulates the mutations with
    a SELECT over the pristine table."""
    import tempfile

    from griddb_spark.dml import DmlTable, hash_partition_expr

    cust = cat(spark, sf_dir).load("customer")
    path = tempfile.mkdtemp(prefix="dml_cust_") + "/t"
    t = DmlTable(spark, path, hash_partition_expr("c_custkey", 8)).create(cust)
    t.update(F.col("c_acctbal") < 0, {"c_acctbal": F.lit(0.0)})
    t.delete(F.col("c_mktsegment") == "AUTOMOBILE")
    return (
        t.read()
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dsum("c_acctbal").alias("bal"),
        )
    )


@query(
    "meta_index_info",
    """
    SELECT * FROM (VALUES
      ('customer', 'c_custkey', 'TREE', 'partition_pruning+parquet_minmax_skip'),
      ('events', 'ts', 'TREE', 'partition_pruning+parquet_minmax_skip'))
      AS t(container_name, column_name, index_type, physical_equivalent)
    """,
)
def meta_index_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE INDEX DDL + #index_info meta table (sql_processor_ddl.cpp,
    meta_type.h:712-731): declared indexes map to Spark scan-pruning
    properties (partition pruning + parquet min/max skipping), recorded
    as catalog metadata."""
    from griddb_spark.container import GridStore

    gs = GridStore(spark, sf_dir)
    gs.create_index("events", "ts", "TREE")
    gs.create_index("customer", "c_custkey", "TREE")
    return gs.index_info()


@query(
    "meta_primary_keys",
    """
    SELECT * FROM (VALUES
      ('public', 'customer', 'c_custkey', 1),
      ('public', 'lineitem', 'l_orderkey', 1),
      ('public', 'lineitem', 'l_linenumber', 2))
      AS t(database_name, table_name, column_name, key_seq)
    """,
)
def meta_primary_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#primary_keys meta table (meta_store.cpp:1068-1073): row-key
    declarations surface as (db, table, column, key_seq) rows; composite
    keys (lineitem) emit one row per component."""
    from griddb_spark.container import GridStore

    c = cat(spark, sf_dir)
    gs = GridStore(spark, sf_dir)
    gs.put_container("customer", c.load("customer"), row_key="c_custkey")
    gs.put_container(
        "lineitem", c.load("lineitem"), row_key=["l_orderkey", "l_linenumber"]
    )
    return gs.primary_keys()


@query(
    "meta_databases",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), 'default'), (CAST(2 AS BIGINT), 'gsdb_analytics'),
      (CAST(3 AS BIGINT), 'gsdb_ml'))
      AS t(database_id, database_name)
    """,
)
def meta_databases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE/DROP DATABASE DDL (sql_parser.h:239-240) + #databases meta
    table (meta_store.cpp:1470): GridDB databases are container
    namespaces → Spark catalog databases. Creates two, round-trips a
    third through DROP, lists the survivors. Ranks AFTER filtering so
    unrelated warehouse namespaces can't shift the surrogate ids."""
    from pyspark.sql import Window

    from griddb_spark.container import GridStore

    gs = GridStore(spark)
    gs.create_database("gsdb_analytics")
    gs.create_database("gsdb_ml")
    gs.create_database("gsdb_tmp")
    gs.drop_database("gsdb_tmp")
    return (
        gs.databases()
        .filter(
            (F.col("database_name") == "default")
            | F.col("database_name").startswith("gsdb_")
        )
        .select(
            F.row_number()
            .over(Window.orderBy("database_name"))
            .cast("long")
            .alias("database_id"),
            "database_name",
        )
    )


@query(
    "ddl_alter_table",
    """
    WITH evolved AS (
      SELECT s_suppkey, s_nationkey, s_acctbal AS balance,
             CAST(NULL AS DOUBLE) AS rating
      FROM supplier
    )
    SELECT s_nationkey, count(*) AS n, count(rating) AS n_rating,
           CAST(sum(CAST(balance AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM evolved GROUP BY s_nationkey
    """,
)
def ddl_alter_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALTER TABLE ADD/RENAME COLUMN (``sql_parser.h:246-247``): copy
    supplier into a container, ADD COLUMN rating DOUBLE (zero-row
    schema-evolution append — O(1) in data size), RENAME s_acctbal →
    balance, then aggregate the evolved schema. Oracle emulates the DDL
    with casts over the pristine table."""
    import tempfile

    from griddb_spark.dml import DmlTable

    sup = cat(spark, sf_dir).load("supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    t = DmlTable(spark, tempfile.mkdtemp(prefix="ddl_sup_") + "/t").create(sup)
    t.alter_add_column("rating", "DOUBLE")
    t.alter_rename_column("s_acctbal", "balance")
    return (
        t.read()
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("rating").alias("n_rating"),
            _dsum("balance").alias("bal"),
        )
    )


@query(
    "partition_pruned_scan",
    f"""
    SELECT user_id, round(sum(value), 6) AS sv, count(*) AS n
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
      AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-11 00:00:00'
    GROUP BY user_id
    """,
)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION BY RANGE(ts) EVERY(1, DAY) + pruned scan: write events
    Hive-partitioned by day bucket, query one day — the scan must read one
    partition (GridDB NarrowingKey pruning → Spark partition pruning)."""
    import tempfile

    from griddb_spark.dml import DmlTable, range_partition_expr

    ev = cat(spark, sf_dir).load("events")
    path = tempfile.mkdtemp(prefix="dml_ev_") + "/t"
    t = DmlTable(spark, path, range_partition_expr("ts", 1, "DAY")).create(ev)
    day_ms = 86_400_000
    start = EV_START_MS + 9 * day_ms  # 2024-01-10
    day = t.scan_range(start, start + day_ms)
    return day.groupBy("user_id").agg(
        _r6(F.sum("value")).alias("sv"), F.count(F.lit(1)).alias("n")
    )


@query(
    "partition_pruned_point_lookup",
    """
    SELECT event_type, round(sum(value), 6) AS sv, count(*) AS n
    FROM events WHERE user_id = 7 GROUP BY event_type
    """,
)
def partition_pruned_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION BY HASH(user_id, 16) + POINT lookup: the key-equality
    case of NarrowingKey pruning (sql_compiler.h:3101-3135) — the
    predicate derives the single hash bucket, so the scan touches ONE of
    the 16 leaf directories (HashPartitioning.key_filter; the typed
    literal matters: xxhash64 of int32 vs int64 picks different
    buckets)."""
    import tempfile

    from griddb_spark.dml import DmlTable, hash_partition_expr

    ev = cat(spark, sf_dir).load("events")
    path = tempfile.mkdtemp(prefix="dml_ev_h_") + "/t"
    t = DmlTable(spark, path, hash_partition_expr("user_id", 16)).create(ev)
    dtype = dict(ev.dtypes)["user_id"]
    one = t.scan().filter(
        t.partitioning.key_filter(7, dtype)
    ).drop("__part")
    return one.groupBy("event_type").agg(
        _r6(F.sum("value")).alias("sv"), F.count(F.lit(1)).alias("n")
    )


@query("sql_explain")  # no oracle: plan text is engine-specific by nature
def sql_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN (SyntaxTree::EXPLAIN_PLAN, sql_execution.h:835-838):
    optimized logical plan rows, statement NOT executed. Rows-only driver
    check — plan text differs per engine by design."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "EXPLAIN SELECT o_orderpriority, count(*) AS n "
        "FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderpriority",
    )


@query("sql_explain_analyze")  # no oracle: plan text + live metrics
def sql_explain_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPLAIN ANALYZE (SyntaxTree::EXPLAIN_ANALYZE; GridDB executes the
    statement and serializes the task plan with ACTUAL row counts,
    sql_execution.cpp:3234-3241): the statement runs once and every
    physical node is emitted with its populated SQLMetrics
    (numOutputRows, shuffle bytes, peak memory, …) — executed-plan
    actuals, not the static plan. Rows-only driver check — metric values
    are live by nature."""
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    return griddb_sql(
        spark, c,
        "EXPLAIN ANALYZE SELECT o_orderpriority, count(*) AS n "
        "FROM orders WHERE o_totalprice > 1000 GROUP BY o_orderpriority",
    )


@query(
    "sql_prepared_statement",
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_totalprice > 20000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def sql_prepared_statement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prepared statements (EXPR_PLACEHOLDER, sql_type.h:42-92; JDBC
    PreparedStatement surface): parse/rewrite once, bind ? placeholders
    per execution through Catalyst's parameterized SQL (typed literals,
    never string splicing — the bound value reaches predicate pushdown).
    The statement is executed twice with different binds; the second
    bind's result is returned and gated against the literal oracle."""
    from griddb_spark.sql.translate import prepare

    c = cat(spark, sf_dir)
    stmt = prepare(
        spark, c,
        "SELECT o_orderpriority, count(*) AS n, "
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total "
        "FROM orders WHERE o_totalprice > ? AND o_orderstatus = ? "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority",
    )
    stmt.execute(50000.0, "O").collect()  # first bind: different plan args
    return stmt.execute(20000.0, "F")


@query(
    "sql_batch_update",
    """
    SELECT id, name, CAST(score AS DOUBLE) AS score FROM (VALUES
      (1, 'alpha', 10.5), (2, 'beta', NULL), (3, 'gamma', -2.25),
      (4, 'delta', 0.0), (5, 'epsilon', 99.75))
      AS t(id, name, score)
    """,
)
def sql_batch_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch updates (5.5 — PreparedStatement addBatch/clearBatch/
    executeBatch, docs/GridDB-5.5-CE-RELEASE_NOTES.md:35-44): N batched
    binds execute as ONE append write job, not N commits. A cleared batch
    must not write; a query statement must refuse executeBatch (the error
    surfaces at executeBatch time, per the reference docs). The read-back
    of the written container is the gated result."""
    import tempfile

    from griddb_spark.dml import DmlTable
    from griddb_spark.sql.translate import prepare

    c = cat(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="batch_upd_") + "/t"
    t = DmlTable(spark, path).create(
        spark.createDataFrame([], "id int, name string, score double")
    )
    stmt = prepare(spark, c, "INSERT INTO t VALUES (?, ?, ?)", tables={"t": t})
    stmt.add_batch(99, "discarded", 1.0)
    stmt.clear_batch()  # cleared binds must not reach the container
    for row in [(1, "alpha", 10.5), (2, "beta", None), (3, "gamma", -2.25),
                (4, "delta", 0.0), (5, "epsilon", 99.75)]:
        stmt.add_batch(*row)
    counts = stmt.execute_batch()
    assert counts == [1] * 5
    return t.read()


@query(
    "ts_continuous_aggregate",
    """
    SELECT (1704067200000 + (epoch_ms(CAST(ts AS TIMESTAMP)) - 1704067200000)
            // 3600000 * 3600000) AS bucket_ms,
           event_type,
           count(*) AS n, round(avg(value), 6) AS avg_value,
           round(sum(value), 6) AS sum_value
    FROM events GROUP BY bucket_ms, event_type
    """,
)
def ts_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automatic time-series aggregation (5.6,
    docs/GridDB-5.6-CE-RELEASE_NOTES.md:64-69): the scheduled rollup that
    processes only data newer than the target's high-water mark. Run
    twice — first over the first half-month of events, then over the full
    source — the second refresh recomputes only buckets at/above the
    stored mark (boundary bucket swapped via DELETE+append). Converging
    to exactly the one-shot aggregation is the gate."""
    import tempfile

    from griddb_spark.dml import DmlTable
    from griddb_spark.operators import refresh_continuous_aggregate

    ev = cat(spark, sf_dir).load("events")
    target = DmlTable(spark, tempfile.mkdtemp(prefix="cagg_") + "/rollup")
    aggs = {
        "n": F.count(F.lit(1)),
        "avg_value": F.round(F.avg("value"), 6),
        "sum_value": F.round(F.sum("value"), 6),
    }
    first = ev.filter(F.col("ts") < F.lit("2024-01-15").cast("timestamp"))
    refresh_continuous_aggregate(
        first, target, "ts", 1, "HOUR", aggs, by=["event_type"])
    refresh_continuous_aggregate(
        ev, target, "ts", 1, "HOUR", aggs, by=["event_type"])
    return target.read()


@query(
    "stream_continuous_aggregate",
    """
    SELECT (1704067200000 + (epoch_ms(CAST(ts AS TIMESTAMP)) - 1704067200000)
            // 3600000 * 3600000) AS bucket_ms,
           event_type, count(*) AS n,
           round(sum(value), 6) AS sum_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY bucket_ms, event_type
    """,
)
def stream_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming automatic aggregation (the foreachBatch face of 5.6's
    scheduled rollup): the event history replays as THREE time-ordered
    micro-batches whose boundaries deliberately straddle hour buckets;
    each batch merges MERGEABLE PARTIALS (count/sum/min/max — avg is
    derived on read, which is exactly why continuous aggregates store
    partials) into the rollup container. A straddled bucket merges
    stored⊕fresh instead of being recomputed from an incomplete slice —
    converging to the one-shot aggregation is the gate."""
    import tempfile
    import uuid as _uuid

    from griddb_spark.dml import DmlTable
    from griddb_spark.operators import auto_aggregate_stream

    prepare(spark)
    ev = cat(spark, sf_dir).load("events")
    src_dir = tempfile.mkdtemp(prefix="cagg_stream_src_")
    # three ts-ordered slices with boundaries inside hour buckets: split
    # by ts-value terciles (one approxQuantile job) instead of a global
    # row_number sort — value-splitting is already time-ordered arrival,
    # the single-pass window sort was the gate's dominant prep cost at
    # sf0.1, and with µs event times the tercile boundary essentially
    # never lands on an hour edge (the merge converges to the one-shot
    # aggregation for ANY split — the oracle doesn't depend on it)
    t1, t2 = ev.select(
        F.unix_micros("ts").alias("t")
    ).stat.approxQuantile("t", [1 / 3, 2 / 3], 0.001)
    t_us = F.unix_micros(F.col("ts"))
    import glob
    import os
    import shutil
    import time as _time

    # ONE job writes all three arrival files (same tercile conditions as
    # the per-slice filtered-write form, which spent three jobs on the
    # same bytes): partitionBy lands each slice in its own directory and
    # explicit increasing mtimes pin the file-source arrival order.
    bcol = F.when(t_us < t1, 0).when(t_us < t2, 1).otherwise(2)
    (ev.withColumn("__b", bcol).coalesce(1).write.mode("overwrite")
     .partitionBy("__b").parquet(f"{src_dir}/all"))
    base_t = _time.time()
    for i in range(3):
        hits = glob.glob(f"{src_dir}/all/__b={i}/part-*.parquet")
        if hits:  # a degenerate tercile split can leave a slice empty
            shutil.move(hits[0], f"{src_dir}/{i:02d}.parquet")
            os.utime(f"{src_dir}/{i:02d}.parquet",
                     (base_t - 3 + i, base_t - 3 + i))
    shutil.rmtree(f"{src_dir}/all")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    target = DmlTable(spark, tempfile.mkdtemp(prefix="cagg_tgt_") + "/rollup")
    specs = {
        "n": ("count", None),
        "sum_value": ("sum", "value"),
        "min_value": ("min", "value"),
        "max_value": ("max", "value"),
    }
    q = auto_aggregate_stream(
        stream, target, "ts", 1, "HOUR", specs, by=["event_type"],
        checkpoint_dir=tempfile.mkdtemp(prefix=f"cagg_ck_{_uuid.uuid4().hex[:6]}_"),
    )
    q.awaitTermination()
    return target.read().select(
        "bucket_ms", "event_type", "n",
        _r6(F.col("sum_value")).alias("sum_value"),
        _r6(F.col("min_value")).alias("min_value"),
        _r6(F.col("max_value")).alias("max_value"),
    )


@query(
    "partition_pruned_scan_rh",
    """
    SELECT event_type, round(sum(value), 6) AS sv, count(*) AS n
    FROM events
    WHERE user_id = 3
      AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
      AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-13 00:00:00'
    GROUP BY event_type
    """,
)
def partition_pruned_scan_rh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE_HASH composite partitioning (TABLE_PARTITION_TYPE_RANGE_HASH,
    sql_parser.h:300-303): events sharded RANGE(ts) EVERY(1, DAY) ×
    HASH(user_id, 4), then a 3-day single-user query — the scan prunes to
    3 range buckets × 1 hash bucket of the 30×4 leaf directories."""
    import tempfile

    from griddb_spark.dml import DmlTable, range_hash_partition_expr

    ev = cat(spark, sf_dir).load("events")
    path = tempfile.mkdtemp(prefix="dml_ev_rh_") + "/t"
    t = DmlTable(
        spark, path, range_hash_partition_expr("ts", 1, "DAY", "user_id", 4)
    ).create(ev)
    day_ms = 86_400_000
    start = EV_START_MS + 9 * day_ms  # 2024-01-10
    sel = t.scan_key_range(start, start + 3 * day_ms, 3)
    return sel.groupBy("event_type").agg(
        _r6(F.sum("value")).alias("sv"), F.count(F.lit(1)).alias("n")
    )


@query(
    "ts_row_expiration",
    """
    SELECT event_type, count(*) AS n, min(ts) AS min_ts, max(ts) AS max_ts
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
    GROUP BY event_type
    """,
)
def ts_row_expiration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimeSeries row expiration (TimeSeriesProperties.setRowExpiration,
    TimeSeriesRowExpiration.java:55-57): events in a 2-day range-
    partitioned container with a 10-day expiration pinned at now =
    2024-01-31. vacuum_expired physically drops wholly-expired division
    directories; the scan-time visibility predicate masks dead rows in
    the boundary division — so the result is the row-exact cutoff."""
    import tempfile

    from griddb_spark.dml import DmlTable, RowExpiration, range_partition_expr

    ev = cat(spark, sf_dir).load("events")
    path = tempfile.mkdtemp(prefix="dml_ev_exp_") + "/t"
    t = DmlTable(
        spark, path, range_partition_expr("ts", 2, "DAY"),
        expiration=RowExpiration(10, "DAY", division_count=5,
                                 now_ms=EV_END_MS),
    ).create(ev)
    t.vacuum_expired()
    return t.read().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "scalar_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6)
             AS avg_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50
    GROUP BY event_type
    """,
)
def scalar_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props column: JSON path extraction predicate +
    aggregate (Spark get_json_object; beyond-reference convenience — GridDB
    stores this as STRING and has no JSON functions). The parse runs in the
    scan stage on purpose: row-group splits parallelize it at scale, while
    a zero-column repartition would add round-robin's determinism sort of
    the full rows (measured 36s vs 3.5s at 10x)."""
    ev = cat(spark, sf_dir).load("events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k") >= 50)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), _r6(F.avg("k")).alias("avg_k"))
    )


@query(
    "scalar_array_funcs",
    """
    SELECT vec_id,
           len(embedding) AS arr_len,
           round(embedding[1]::double, 6) AS first_elem,
           round(embedding[64]::double, 6) AS last_elem
    FROM embeddings WHERE vec_id < 20
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB array column functions: ARRAY_LENGTH → size, ELEMENT →
    element_at (function_array.h; 0-based in TQL, 1-based here/DuckDB)."""
    emb = cat(spark, sf_dir).load("embeddings")
    return emb.filter(F.col("vec_id") < 20).select(
        "vec_id",
        F.size("embedding").cast("long").alias("arr_len"),
        _r6(F.element_at("embedding", 1).cast("double")).alias("first_elem"),
        _r6(F.element_at("embedding", 64).cast("double")).alias("last_elem"),
    )


@query(
    "pipe_dedup_ngram",
    """
    WITH g AS (SELECT doc_id, list_distinct([substr(text, p, 4)
                 FOR p IN range(1, greatest(length(text) - 3, 1) + 1)]) grams
               FROM documents),
    n AS (SELECT doc_id, len(grams) n FROM g),
    ex AS (SELECT doc_id, unnest(grams) t FROM g),
    ov AS (SELECT x.doc_id doc_a, y.doc_id doc_b, count(*) c
           FROM ex x JOIN ex y ON x.t = y.t AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
    p AS (SELECT doc_a, doc_b,
            round(c::DOUBLE / (na.n + nb.n - c), 6) jaccard
          FROM ov JOIN n na ON na.doc_id = doc_a
                  JOIN n nb ON nb.doc_id = doc_b)
    SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= 0.7
    """,
)
def pipe_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-4-gram Jaccard near-dup pairs via PPJoin-style prefix
    filtering (exact recall, no probabilistic step); oracle is brute
    force over all pairs."""
    from griddb_spark.pipeline import ngram_jaccard_pairs

    docs = cat(spark, sf_dir).load("documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.7, n=4)


@query(
    "pipe_dedup_ngram_collapsed",
    """
    WITH c AS (SELECT min(doc_id) AS rep, count(*) AS csize
               FROM documents GROUP BY md5(text)),
    r AS (SELECT d.doc_id, d.text, c.csize FROM documents d
          JOIN c ON d.doc_id = c.rep),
    g AS (SELECT doc_id, csize, list_distinct([substr(text, p, 4)
                 FOR p IN range(1, greatest(length(text) - 3, 1) + 1)]) grams
          FROM r),
    n AS (SELECT doc_id, len(grams) n FROM g),
    ex AS (SELECT doc_id, unnest(grams) t FROM g),
    ov AS (SELECT x.doc_id doc_a, y.doc_id doc_b, count(*) cnt
           FROM ex x JOIN ex y ON x.t = y.t AND x.doc_id < y.doc_id
           GROUP BY 1, 2),
    p AS (SELECT doc_a, doc_b,
            round(cnt::DOUBLE / (na.n + nb.n - cnt), 6) jaccard
          FROM ov JOIN n na ON na.doc_id = doc_a
                  JOIN n nb ON nb.doc_id = doc_b)
    SELECT p.doc_a, p.doc_b, p.jaccard,
           ga.csize AS size_a, gb.csize AS size_b
    FROM p JOIN g ga ON ga.doc_id = p.doc_a
           JOIN g gb ON gb.doc_id = p.doc_b
    WHERE p.jaccard >= 0.7
    """,
)
def pipe_dedup_ngram_collapsed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard with the exact-duplicate pre-collapse — the same
    replica-robust composition the minhash family has: identical texts
    collapse to one representative (cluster sizes carried through), so
    the PPJoin candidate set is bounded by DISTINCT documents and
    replica-heavy corpora stop inducing quadratic candidate growth (the
    plain ngram kernel measures ~10x under 10-way replica clusters; this
    one stays ~1-2x)."""
    from griddb_spark.pipeline import collapse_exact, ngram_jaccard_pairs

    docs = cat(spark, sf_dir).load("documents")
    reps = collapse_exact(docs, "doc_id", "text")
    pairs = ngram_jaccard_pairs(reps, "doc_id", "text", threshold=0.7, n=4)
    sz = reps.select("doc_id", "cluster_size")
    return (
        pairs.join(F.broadcast(sz.select(F.col("doc_id").alias("doc_a"),
                                         F.col("cluster_size")
                                         .alias("size_a"))), "doc_a")
        .join(F.broadcast(sz.select(F.col("doc_id").alias("doc_b"),
                                    F.col("cluster_size").alias("size_b"))),
              "doc_b")
        .select("doc_a", "doc_b", "jaccard", "size_a", "size_b")
    )


@query(
    "pipe_dedup_embed_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[],
                                        b.embedding::DOUBLE[]), 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                       b.embedding::DOUBLE[]), 6) >= 0.4
    """,
)
def pipe_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: exact block-partitioned all-pairs
    with a NumPy matmul kernel per block pair (applyInPandas) — per-task
    memory bounded by 2·(n/B)·dim regardless of corpus size."""
    from griddb_spark.pipeline import cosine_pairs

    emb = cat(spark, sf_dir).load("embeddings")
    return cosine_pairs(emb, "vec_id", "embedding", threshold=0.4, blocks=4)


#: Deterministic Lloyd's k-means replay (k=8, one update round): init =
#: the 8 lowest-id vectors, assignment = max cosine rounded to 6dp with
#: ties to the lowest cluster index, update = element-wise mean rounded to
#: 6dp (the fixed-point contract that makes Spark and DuckDB agree
#: bit-for-bit on every later comparison). s2 is the final assignment.
def _adaptive_k(emb) -> int:
    """The k-means scale knob shared by every gate built on _KMEANS_CTE:
    cells stay ~250 vectors so the within-cell pairwise stage is bounded.
    The oracle CTE computes the identical value in its LIMIT expression
    (``greatest(8, count(*) // 250)``) — Spark and SQL can never disagree
    on k at any scale factor."""
    return max(8, emb.count() // 250)


#: Trained-quantizer memos. Every embedding gate that clusters trains
#: the SAME deterministic artifacts on the SAME corpus (coarse k-means
#: cents at k=_adaptive_k; PQ codebooks at m=4,k=8; the composed IVF-PQ
#: artifact) — so train ONCE per corpus state and let every dependent
#: gate reuse it, the FAISS lifecycle (train is a build step, search is
#: the recurring one; a pipeline clusters its corpus once and feeds
#: semdedup/IVF/ingest-routing from the same centroids). Keys carry a
#: source fingerprint (file names + sizes + mtimes of
#: embeddings.parquet) so any rewrite invalidates, the same contract as
#: ContainerCatalog.invalidate. Bounded driver state: k·dim scalars per
#: entry, never corpus rows. Correctness is unaffected: training is
#: deterministic (lowest-id init, 6dp fixed-point updates), so a cached
#: artifact is bit-identical to retraining — every gate still
#: value-hashes against an oracle that retrains from scratch.
_ANN_TRAIN_CACHE: dict = {}


def _ann_cache_put(key: tuple, value):
    """Insert keeping ONE generation per (kind, sf_dir): entries whose
    fingerprint was superseded by a corpus rewrite are evicted, so the
    memo stays bounded even in a session that rewrites the corpus
    repeatedly. Key shape: (kind, sf_dir, fingerprint, *params)."""
    kind, sf_dir = key[0], key[1]
    stale = [k for k in _ANN_TRAIN_CACHE
             if k[0] == kind and k[1] == sf_dir and k[2] != key[2]]
    for k in stale:
        del _ANN_TRAIN_CACHE[k]
    _ANN_TRAIN_CACHE[key] = value


def _emb_fingerprint(sf_dir: str) -> tuple:
    import os as _os

    p = _os.path.join(sf_dir, "embeddings.parquet")
    if _os.path.isdir(p):
        ents = sorted(
            (e.name, e.stat().st_size, e.stat().st_mtime_ns)
            for e in _os.scandir(p) if e.name.endswith(".parquet")
        )
        return tuple(ents)
    st = _os.stat(p)
    return ((p, st.st_size, st.st_mtime_ns),)


def _adaptive_k_cached(emb, sf_dir: str) -> int:
    """_adaptive_k with the corpus count memoized per source state (the
    count is one scan job; every embedding gate needs the same value)."""
    key = ("k", sf_dir, _emb_fingerprint(sf_dir))
    kv = _ANN_TRAIN_CACHE.get(key)
    if kv is None:
        kv = _adaptive_k(emb)
        _ann_cache_put(key, kv)
    return kv


def _shared_cents(emb, sf_dir: str) -> list:
    """kmeans_fit(k=_adaptive_k) memo — the coarse clustering every
    embedding gate shares (cluster/semdedup/prototype/IVF/stream-assign
    all train this same deterministic model)."""
    from griddb_spark.pipeline import kmeans_fit

    coarse_k = _adaptive_k_cached(emb, sf_dir)
    key = ("cents", sf_dir, _emb_fingerprint(sf_dir), coarse_k)
    cents = _ANN_TRAIN_CACHE.get(key)
    if cents is None:
        from griddb_spark.perfstages import stage

        with stage("train_kmeans"):
            cents = kmeans_fit(emb, "vec_id", "embedding", k=coarse_k,
                               iters=1)
        _ann_cache_put(key, cents)
    return cents


def _shared_books(emb, sf_dir: str, m: int = 4, k: int = 8,
                  in_dim: int = 64) -> list:
    """pq_train(m=4, k=8) memo — the PQ codebooks the compressed-domain
    gates share."""
    from griddb_spark.pipeline import pq_train

    key = ("books", sf_dir, _emb_fingerprint(sf_dir), m, k, in_dim)
    books = _ANN_TRAIN_CACHE.get(key)
    if books is None:
        from griddb_spark.perfstages import stage

        with stage("train_pq"):
            books = pq_train(emb, "vec_id", "embedding", in_dim, m=m, k=k,
                             iters=1)
        _ann_cache_put(key, books)
    return books


#: Gates that serve from the train-once memo (bench pre-trains —
#: timed as ``_ann_training`` — only when its selected names intersect
#: this set: a focused non-embedding run must not absorb minutes of
#: training no selected query uses).
ANN_TRAINED_QUERIES = frozenset({
    "pipe_cluster_kmeans", "pipe_semdedup", "pipe_ann_ivf_trained",
    "stream_cluster_assign", "pipe_prune_prototypes", "pipe_ann_pq",
    "pipe_ann_ivfpq", "pipe_ann_ivfpq_batch", "pipe_ann_index_serve",
    "pipe_ann_recall", "pipe_ann_recall_clustered",
    "pipe_ann_nprobe_curve",
})


def pretrain_ann(spark: SparkSession, sf_dir: str) -> None:
    """Train the shared embedding-family artifacts (adaptive k, coarse
    k-means cents, PQ codebooks, the composed IVF-PQ artifact) into the
    train-once memo for ``sf_dir`` — the explicit build step of the
    FAISS train-then-serve lifecycle. ``bench.py`` calls this in warmup
    and times it as its own named profile entry (``_ann_training``), so
    training cost never lands on whichever embedding gate happens to
    run first (which made per-gate timings order-dependent: semdedup
    measured 2.6 s in one run order and 9.2 s in another, the same
    work attributed differently). Idempotent: a warm memo makes this a
    no-op."""
    emb = cat(spark, sf_dir).load("embeddings")
    # trains (and memoizes) adaptive-k, cents, and books on the way;
    # then encodes the corpus once so serving gates are pure search
    # (the add()-once half of the lifecycle, VERDICT r11 item 4)
    _ivfpq_codes("codes", emb, sf_dir, _ivfpq_trained(emb, sf_dir))
    # the clustered-fixture gate's own quantizers + codes (384 rows)
    cemb = _clustered_fixture(emb)
    _ivfpq_codes("codes_clst", cemb, sf_dir,
                 _clustered_trained(cemb, sf_dir))


def _ivfpq_trained(emb, sf_dir: str, m: int = 4, k: int = 8,
                   in_dim: int = 64) -> dict:
    from griddb_spark.pipeline import ivfpq_train

    coarse_k = _adaptive_k_cached(emb, sf_dir)
    key = ("ivfpq", sf_dir, _emb_fingerprint(sf_dir), coarse_k, m, k,
           in_dim)
    art = _ANN_TRAIN_CACHE.get(key)
    if art is None:
        from griddb_spark.perfstages import stage

        cents = _shared_cents(emb, sf_dir)
        books = _shared_books(emb, sf_dir, m, k, in_dim)
        with stage("train_ivfpq"):
            art = ivfpq_train(emb, "vec_id", "embedding", in_dim,
                              coarse_k=coarse_k, m=m, k=k,
                              cents=cents, books=books)
        _ann_cache_put(key, art)
    return art


def _ivfpq_codes(kind: str, emb, sf_dir: str, trained: dict):
    """The ENCODED corpus (id + cell + m small ints, eagerly
    localCheckpointed) memoized per corpus state — the FAISS add()-once
    lifecycle extended from quantizers to codes (VERDICT r11 item 4):
    the per-query, batch, recall, and serve gates all consumed the same
    corpus under the same artifact yet each re-ran the Arrow encode
    (stage maps put encode at 4.18 s of pipe_ann_ivfpq_batch's 5.70 s).
    Encode once per corpus per session; every dependent gate passes the
    checkpointed codes via the ``codes=`` parameter. Correctness is
    unaffected — encode is deterministic, so cached codes are
    bit-identical to re-encoding, and every gate still value-hashes
    against an oracle that re-encodes from scratch. The key carries the
    Spark applicationId: a localCheckpoint dies with its session, so a
    new session must re-encode rather than read dead blocks."""
    from griddb_spark.pipeline.similarity import _ivfpq_encoded

    app_id = emb.sparkSession.sparkContext.applicationId
    key = (kind, sf_dir, _emb_fingerprint(sf_dir), app_id)
    codes = _ANN_TRAIN_CACHE.get(key)
    if codes is None:
        from griddb_spark.perfstages import stage

        with stage("encode"):
            codes = _ivfpq_encoded(emb, "vec_id", "embedding", trained)\
                .localCheckpoint(eager=True)
        _ann_cache_put(key, codes)
    return codes


#: One served-index scratch dir per corpus state, removed at interpreter
#: exit. The serve gate previously mkdtemp'd a fresh dir per invocation
#: and never removed it, so a long bench session (warmup + measured run
#: + repeats) accumulated index copies in /tmp for the life of the host
#: (VERDICT r10 item 7). Keyed by corpus fingerprint so a rewrite gets a
#: fresh dir while repeats overwrite in place.
_SERVE_IDX_DIRS: dict = {}


def _serve_index_path(sf_dir: str) -> str:
    import atexit
    import os as _os
    import shutil
    import tempfile

    key = (sf_dir, _emb_fingerprint(sf_dir))
    path = _SERVE_IDX_DIRS.get(key)
    if path is None:
        root = tempfile.mkdtemp(prefix="ivfpq_idx_")
        path = root + "/index"
        if not _SERVE_IDX_DIRS:  # register the janitor once
            atexit.register(
                lambda: [shutil.rmtree(_os.path.dirname(p),
                                       ignore_errors=True)
                         for p in _SERVE_IDX_DIRS.values()])
        _SERVE_IDX_DIRS[key] = path
    return path


_KMEANS_CTE = """
    WITH RECURSIVE v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, ev AS cv
           FROM (SELECT * FROM v ORDER BY vec_id
                 LIMIT greatest(8, (SELECT count(*) FROM v) // 250))),
    a1 AS (SELECT vec_id, ev, cidx,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY round(list_cosine_similarity(ev, cv), 6) DESC,
                        cidx ASC) AS rn
           FROM v CROSS JOIN c0),
    s1 AS (SELECT vec_id, ev, cidx FROM a1 WHERE rn = 1),
    u1 AS (SELECT cidx, list(m ORDER BY pos) AS cv FROM (
             SELECT cidx, pos, round(avg(x), 6) AS m FROM (
               SELECT cidx, generate_subscripts(ev, 1) AS pos,
                      unnest(ev) AS x
               FROM s1) GROUP BY cidx, pos) GROUP BY cidx),
    a2 AS (SELECT vec_id, ev, cidx,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY round(list_cosine_similarity(ev, cv), 6) DESC,
                        cidx ASC) AS rn
           FROM v CROSS JOIN u1),
    s2 AS (SELECT vec_id, ev, cidx FROM a2 WHERE rn = 1)
"""


@query(
    "pipe_cluster_kmeans",
    _KMEANS_CTE + "SELECT vec_id, CAST(cidx AS INT) AS cluster FROM s2",
)
def pipe_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column: no-shuffle
    broadcast-literal assignment projection + one map-side-combinable
    (cluster, pos) mean shuffle per iteration, k·dim driver collect (the
    MLlib loop shape). The oracle replays init/assign/update/reassign in
    SQL under the shared 6dp fixed-point contract."""
    from griddb_spark.pipeline import assign_clusters

    emb = cat(spark, sf_dir).load("embeddings")
    cents = _shared_cents(emb, sf_dir)
    return assign_clusters(emb, cents).select("vec_id", "cluster")


@query(
    "pipe_semdedup",
    _KMEANS_CTE + """
    , j AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
            FROM s2 x JOIN s2 y
              ON x.cidx = y.cidx AND x.vec_id < y.vec_id
            WHERE round(list_cosine_similarity(x.ev, y.ev), 6) >= 0.4),
    e AS (SELECT id_a AS a, id_b AS b FROM j
          UNION SELECT id_b, id_a FROM j),
    reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a),
    comp AS (SELECT src AS vec_id, least(src, min(dst)) AS component
             FROM reach GROUP BY src)
    SELECT s2.vec_id, CAST(s2.cidx AS INT) AS cluster FROM s2
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.vec_id = s2.vec_id AND c.component < s2.vec_id)
    """,
)
def pipe_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clusters bound the pairwise
    cosine stage (Σ_cell |cell|², never n²), then connected components +
    min-id canonical keep within each near-dup group. The oracle replays
    the same k-means and closes the pair graph with a recursive CTE."""
    from griddb_spark.pipeline import semdedup

    emb = cat(spark, sf_dir).load("embeddings")
    # the scale knob from the semdedup contract: k grows with the corpus
    # so cells stay ~250 vectors and the pairwise stage stays linear-ish
    # (measured 10x probe: 18x superlinear at fixed k=8 -> bounded with
    # adaptive k). The oracle CTE computes the SAME count-derived k via
    # its LIMIT expression, so Spark and SQL agree at every n.
    k = _adaptive_k_cached(emb, sf_dir)
    return semdedup(emb, "vec_id", "embedding", k=k, iters=1,
                    threshold=0.4, cents=_shared_cents(emb, sf_dir))


@query(
    "pipe_ann_ivf_trained",
    _KMEANS_CTE + """
    , pos2 AS (SELECT cidx, generate_subscripts(ev, 1) AS p,
                      unnest(ev) AS x FROM s2),
    byp2 AS (SELECT cidx, p, avg(x) AS x FROM pos2 GROUP BY cidx, p),
    cent2 AS (SELECT cidx, list(x ORDER BY p) AS centroid
              FROM byp2 GROUP BY cidx),
    q AS (SELECT vec_id AS q_id, ev AS qv FROM v WHERE vec_id < 5),
    qc AS (SELECT q_id, qv, cidx,
             round(list_dot_product(qv, centroid)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(centroid, centroid))), 6) AS cc
           FROM q CROSS JOIN cent2),
    probes AS (SELECT q_id, qv, cidx FROM
                 (SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY cc DESC, cidx) AS pr FROM qc)
               WHERE pr <= 2),
    s AS (SELECT p.q_id, e.vec_id AS n_id,
            round(list_dot_product(p.qv, e.ev)
                  / (sqrt(list_dot_product(p.qv, p.qv))
                     * sqrt(list_dot_product(e.ev, e.ev))), 6) AS cos_sim
          FROM probes p JOIN s2 e ON e.cidx = p.cidx
          WHERE p.q_id != e.vec_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY cos_sim DESC, n_id) AS rnk FROM s)
    SELECT q_id, n_id, cos_sim, rnk AS rank FROM r WHERE rnk <= 3
    """,
)
def pipe_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over a TRAINED coarse quantizer: k-means cells instead of
    the label column — the full unsupervised IVF pipeline (train →
    assign → probe). ann_ivf recomputes per-cell means as its quantizer
    (centroids_by), so the oracle recomputes them over the replayed
    assignment the same way."""
    from griddb_spark.pipeline import ann_ivf, assign_clusters

    emb = cat(spark, sf_dir).load("embeddings")
    cents = _shared_cents(emb, sf_dir)
    # cell-keyed exchange: the at-scale corpus layout the probe join
    # expects (partition-pruned per cell), and a barrier so the assign
    # projection isn't duplicated into pushed-down join null-checks
    # (the 100x-probe pathology class fixed for IVF-PQ serving)
    a = assign_clusters(emb, cents).repartition(
        spark.sparkContext.defaultParallelism, F.col("cluster"))
    return ann_ivf(
        a, a.filter(F.col("vec_id") < 5), cell_col="cluster", k=3, nprobe=2
    )


@query(
    "pipe_media_dedup",
    """
    WITH b AS (SELECT doc_id, text, strlen(text) // 32 h FROM documents
               WHERE strlen(text) >= 32),
    hs AS (SELECT doc_id,
      list_aggregate(
        [ ((ascii(substr(text, (((i//7)*h)//8)*32 + ((i%7)*32)//8 + 1, 1))
            < ascii(substr(text, (((i//7)*h)//8)*32
                                 + (((i%7)+1)*32)//8 + 1, 1)))::BIGINT << i)
          for i in range(0, 56) ], 'sum')::BIGINT AS dhash
      FROM b)
    SELECT dhash, min(doc_id) AS keeper, count(*) AS n_docs
    FROM hs GROUP BY dhash
    """,
)
def pipe_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL PNGs: pack → decode → 8×8
    nearest-neighbor downsample → 56-bit dHash → collapse identical
    hashes to the min-id keeper. The oracle replays the downsample index
    arithmetic and the bit packing directly over the source bytes, so a
    wrong decode or a wrong hash bit cannot hash-match. Near-dup (small
    Hamming distance) variants reuse the embedding banding machinery on
    the dhash column."""
    from griddb_spark.pipeline.multimodal import dhash_media, png_pack

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    packed = png_pack(docs, "text", width=32)
    hs = dhash_media(packed, "media", "doc_id")
    return hs.groupBy("dhash").agg(
        F.min("doc_id").alias("keeper"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "pipe_media_neardup",
    """
    WITH b AS (SELECT doc_id, text, strlen(text) // 32 h FROM documents
               WHERE strlen(text) >= 32),
    hs AS (SELECT doc_id,
      list_aggregate(
        [ ((ascii(substr(text, (((i//7)*h)//8)*32 + ((i%7)*32)//8 + 1, 1))
            < ascii(substr(text, (((i//7)*h)//8)*32
                                 + (((i%7)+1)*32)//8 + 1, 1)))::BIGINT << i)
          for i in range(0, 56) ], 'sum')::BIGINT AS dhash
      FROM b),
    reps AS (SELECT dhash, min(doc_id) AS keeper FROM hs GROUP BY dhash)
    SELECT a.keeper AS id_a, b.keeper AS id_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
    FROM reps a JOIN reps b ON a.keeper < b.keeper
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 7
    """,
)
def pipe_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-duplicate image pairs: dHash each PNG, collapse
    exact-identical hashes to a min-id representative, then find
    representative pairs within Hamming distance 7 via pigeonhole
    banding (``hamming_pairs_int``: 8 bit-slices of the 56-bit hash; a
    pair within distance 7 shares at least one untouched slice, so the
    banded join is recall-COMPLETE and the all-pairs SQL oracle checks
    that exactly). The collapse-first composition bounds band-bucket
    occupancy by distinct-hash count; verify is JVM xor+bit_count."""
    from griddb_spark.pipeline.dedup import hamming_pairs_int
    from griddb_spark.pipeline.multimodal import dhash_media, png_pack

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    packed = png_pack(docs, "text", width=32)
    hs = dhash_media(packed, "media", "doc_id")
    reps = hs.groupBy("dhash").agg(F.min("doc_id").alias("keeper"))
    return hamming_pairs_int(
        reps, "keeper", "dhash", total_bits=56, bands=8, max_hamming=7
    )


#: shared (doc, term, tf) CTE for the retrieval gates — the exact SQL twin
#: of pipeline.retrieval.doc_terms (whitespace tokens of trim(lower(text)))
_TF_CTE = """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
      FROM documents WHERE strlen(trim(text)) > 0),
    tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
           FROM toks GROUP BY doc_id, term)
"""


@query(
    "pipe_tfidf_top_terms",
    _TF_CTE + """
    , dfreq AS (SELECT term, count(*)::BIGINT AS df_t FROM tf GROUP BY term)
    , n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
    , scored AS (
        SELECT tf.doc_id, tf.term, tf.tf,
               tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df_t + 1.0)) + 1.0)
                 AS score
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n)
    , ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
        FROM scored)
    SELECT doc_id, term, tf, round(score, 6) AS score
    FROM ranked WHERE rnk <= 3
    """,
)
def pipe_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by smoothed TF-IDF
    (``tfidf_top_terms``). Document frequency aggregates the already-
    distinct tf relation (no re-explode), N rides as a broadcast 1-row
    crossJoin, and the top-k window partitions by document — no global
    sort, no driver collect. Term-asc tiebreak makes the selection a
    total order on both engines."""
    from griddb_spark.pipeline.retrieval import tfidf_top_terms

    docs = cat(spark, sf_dir).load("documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


@query(
    "pipe_bm25_search",
    _TF_CTE + """
    , dl AS (SELECT doc_id, sum(tf)::DOUBLE AS dl FROM tf GROUP BY doc_id)
    , st AS (SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM dl)
    , qtf AS (SELECT * FROM tf WHERE term IN ('hash', 'join', 'vector'))
    , dfq AS (SELECT term, count(*)::BIGINT AS df_t FROM qtf GROUP BY term)
    , c AS (
        SELECT qtf.doc_id,
               ln((st.n_docs - dfq.df_t + 0.5) / (dfq.df_t + 0.5) + 1.0)
                 * (qtf.tf * (1.2 + 1.0))
                 / (qtf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / st.avgdl))
                 AS contrib
        FROM qtf JOIN dfq ON qtf.term = dfq.term
                 JOIN dl ON qtf.doc_id = dl.doc_id
        CROSS JOIN st)
    SELECT doc_id, round(sum(contrib), 6) AS score FROM c GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 20
    """,
)
def pipe_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi-BM25 top-20 documents for the query {hash, join, vector}
    (``bm25_search``, Lucene's non-negative idf). The literal IN prunes
    the exploded relation BEFORE any shuffle — only the query terms'
    postings move; their document frequencies and the corpus stats
    (N, avgdl) are broadcast; the final top-k is a TakeOrdered."""
    from griddb_spark.pipeline.retrieval import bm25_search

    docs = cat(spark, sf_dir).load("documents")
    return bm25_search(
        docs, "doc_id", "text", ["hash", "join", "vector"], k=20
    )


@query(
    "pipe_inverted_index",
    _TF_CTE + """
    , ranked AS (
        SELECT doc_id, term,
               count(*) OVER (PARTITION BY term) AS df_t,
               row_number() OVER (
                   PARTITION BY term ORDER BY doc_id ASC) AS rn
        FROM tf)
    SELECT term, df_t,
           string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
    FROM ranked WHERE rn <= 100 GROUP BY term, df_t
    """,
)
def pipe_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: per term, full document frequency plus the first
    100 doc ids ascending as a comma-joined posting list
    (``inverted_index``). ONE term-keyed shuffle yields both (window
    count + rank); the rank filter truncates stopword-class postings
    BEFORE collect_list buffers them, so no agg row ever holds more
    than 100 entries — the formulation that survives 100 TB stopwords."""
    from griddb_spark.pipeline.retrieval import inverted_index

    docs = cat(spark, sf_dir).load("documents")
    return inverted_index(
        docs, "doc_id", "text", min_df=1, max_postings=100
    )


@query(
    "stream_cluster_assign",
    _KMEANS_CTE + """
    SELECT s2.vec_id, CAST(s2.cidx AS INT) AS cluster,
           round(list_cosine_similarity(s2.ev, u1.cv), 6) AS proto_sim
    FROM s2 JOIN u1 ON s2.cidx = u1.cidx
    """,
)
def stream_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment AT INGEST: centroids are trained offline
    (kmeans_fit on the static table), then every arriving micro-batch is
    assigned by the same shuffle-free projection — stateless, no
    watermark, the shape of routing an embedding firehose into IVF cells
    as it lands. Oracle replays the batch assignment + prototype score."""
    import uuid as _uuid

    from griddb_spark.pipeline import assign_clusters
    from griddb_spark.streaming import run_to_memory

    prepare(spark)
    static = cat(spark, sf_dir).load("embeddings")
    cents = _shared_cents(static, sf_dir)
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings*.parquet")
        .parquet(sf_dir)
    )
    out = assign_clusters(raw, cents, score_col="proto_sim").select(
        "vec_id", "cluster", "proto_sim"
    )
    return run_to_memory(out, f"ca_{_uuid.uuid4().hex[:8]}", mode="append",
                         shuffle_partitions=8)


@query(
    "pipe_prune_prototypes",
    _KMEANS_CTE + """
    , sc AS (SELECT s2.vec_id, s2.cidx,
               round(list_cosine_similarity(s2.ev, u1.cv), 6) AS proto_sim
             FROM s2 JOIN u1 ON s2.cidx = u1.cidx),
    rk AS (SELECT vec_id, cidx, proto_sim,
             row_number() OVER (PARTITION BY cidx
               ORDER BY proto_sim ASC, vec_id ASC) AS rn,
             count(*) OVER (PARTITION BY cidx) AS cnt
           FROM sc)
    SELECT vec_id, CAST(cidx AS INT) AS cluster, proto_sim
    FROM rk WHERE rn <= ceil(0.5 * cnt)
    """,
)
def pipe_prune_prototypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototype-based data pruning (Sorscher et al. 2022): keep the
    hardest half of every k-means cluster by cosine-to-centroid. The
    oracle replays the k-means and recomputes the prototype metric
    against the final centroids — which must equal the argmax cosine the
    assignment itself produced."""
    from griddb_spark.pipeline import prune_prototypes

    emb = cat(spark, sf_dir).load("embeddings")
    return prune_prototypes(
        emb, "vec_id", "embedding", k=_adaptive_k_cached(emb, sf_dir),
        iters=1, keep_frac=0.5, hardest=True,
        cents=_shared_cents(emb, sf_dir)
    )


@query(
    "meta_tables",
    """
    SELECT table_name, CAST(ordinal_position AS INT) AS ordinal, column_name
    FROM information_schema.columns
    WHERE table_name IN ('region', 'nation', 'customer', 'supplier', 'part',
                         'orders', 'lineitem', 'events', 'documents',
                         'embeddings')
    """,
)
def meta_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridDB meta/system tables (#tables/#columns, meta_type.h:712-731,
    meta_store.cpp): the container catalog served as queryable DataFrames."""
    c = cat(spark, sf_dir)
    return c.meta_columns_all().select(
        "table_name", (F.col("ordinal") + 1).alias("ordinal"), "column_name"
    )


@query(
    "time_window_agg",
    f"""
    SELECT event_type, {_duck_bucket(1_800_000)} AS ts,
           round(avg(value), 6) AS avg_value,
           min(value) AS min_value,
           max(value) AS max_value,
           count(*) AS n
    FROM events
    GROUP BY event_type, 2
    """,
)
def time_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME_WINDOW_AGG / aggregateByTimeWindow (time_series.h:153,
    selection_func.h:201): tumbling 30-min windows per series key, multiple
    aggregates — one groupBy(window()) with map-side partial agg."""
    ev = cat(spark, sf_dir).load("events")
    w = F.window("ts", "30 minutes")
    return (
        ev.groupBy("event_type", w.alias("w"))
        .agg(
            _r6(F.avg("value")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type", F.col("w.start").alias("ts"),
            "avg_value", "min_value", "max_value", "n",
        )
    )


@query(
    "gis_mbr_join",
    """
    WITH pb AS (SELECT p_partkey, (p_size * 2)::DOUBLE xmin,
                       (p_partkey % 23)::DOUBLE ymin,
                       (p_size * 2 + 3)::DOUBLE xmax,
                       (p_partkey % 23 + 3)::DOUBLE ymax
                FROM part WHERE p_partkey < 200),
         sb AS (SELECT s_suppkey, (s_suppkey % 40 * 2)::DOUBLE xmin,
                       (s_suppkey % 17)::DOUBLE ymin,
                       (s_suppkey % 40 * 2 + 2)::DOUBLE xmax,
                       (s_suppkey % 17 + 2)::DOUBLE ymax
                FROM supplier)
    SELECT p.p_partkey, s.s_suppkey
    FROM pb p JOIN sb s
      ON p.xmin <= s.xmax AND s.xmin <= p.xmax
     AND p.ymin <= s.ymax AND s.ymin <= p.ymax
    """,
)
def gis_mbr_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRY MBR-intersect join (ST_MAKERECT/ST_MBRINTERSECTS,
    function_gis.h; R-tree rtree_map.cpp): WKT rectangles built from
    columns, envelope extracted by st_mbr (pure codegen expressions), then
    an interval-overlap join. The small side broadcasts."""
    from griddb_spark.functions.gis import st_mbr, st_mbr_intersects

    c = cat(spark, sf_dir)

    def rect_wkt(x0, y0, x1, y1):
        def pt(x, y):
            return F.concat_ws(" ", x.cast("double").cast("string"),
                               y.cast("double").cast("string"))
        return F.concat(
            F.lit("POLYGON(("),
            F.concat_ws(", ", pt(x0, y0), pt(x1, y0), pt(x1, y1),
                        pt(x0, y1), pt(x0, y0)),
            F.lit("))"),
        )

    part = c.load("part").filter(F.col("p_partkey") < 200).select(
        "p_partkey",
        st_mbr(rect_wkt(
            F.col("p_size") * 2, F.col("p_partkey") % 23,
            F.col("p_size") * 2 + 3, F.col("p_partkey") % 23 + 3,
        )).alias("mbr_p"),
    )
    supp = c.load("supplier").select(
        "s_suppkey",
        st_mbr(rect_wkt(
            F.col("s_suppkey") % 40 * 2, F.col("s_suppkey") % 17,
            F.col("s_suppkey") % 40 * 2 + 2, F.col("s_suppkey") % 17 + 2,
        )).alias("mbr_s"),
    )
    return part.join(
        F.broadcast(supp), st_mbr_intersects(F.col("mbr_p"), F.col("mbr_s"))
    ).select("p_partkey", "s_suppkey")


@query(
    "gis_qsf_probe",
    """
    SELECT s_suppkey
    FROM (SELECT s_suppkey,
                 (s_suppkey % 40 * 2)::DOUBLE xmin,
                 (s_suppkey % 17)::DOUBLE ymin,
                 (s_suppkey % 9)::DOUBLE zmin,
                 (s_suppkey % 40 * 2 + 2)::DOUBLE xmax,
                 (s_suppkey % 17 + 2)::DOUBLE ymax,
                 (s_suppkey % 9 + 2)::DOUBLE zmax
          FROM supplier)
    WHERE sqrt( pow(greatest(xmin, least(xmax, 20.0)) - 20.0, 2)
              + pow(greatest(ymin, least(ymax, 8.0)) - 8.0, 2)
              + pow(greatest(zmin, least(zmax, 4.0)) - 4.0, 2)) < 7.3
    """,
)
def gis_qsf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_MAKESPHERE + ST_QSFMBRINTERSECTS (function_gis.h:408,618;
    TrPv3Test tr-cpp/TrPv3.cpp:433): per-supplier 3D boxes probed with a
    constant quadratic-surface sphere. The Spark side runs the faithful
    TrPv3 candidate-point kernel (corners / edge / face stationary points /
    anchor); the oracle is the independent closed-form clamp-distance test,
    equivalent for spheres on non-tangent data (integer box corners vs
    R=7.3 can never tie). Two genuinely different algorithms must agree."""
    from griddb_spark.functions.gis import st_make_box
    from griddb_spark.functions.qsf import st_make_sphere, st_qsf_mbr_intersects

    key = st_make_sphere(20.0, 8.0, 4.0, 7.3)
    s = cat(spark, sf_dir).load("supplier")
    k = F.col("s_suppkey")
    boxes = s.select(
        "s_suppkey",
        st_make_box(
            (k % 40 * 2).cast("double"), (k % 17).cast("double"),
            (k % 9).cast("double"), (k % 40 * 2 + 2).cast("double"),
            (k % 17 + 2).cast("double"), (k % 9 + 2).cast("double"),
        ).alias("box"),
    )
    return boxes.filter(st_qsf_mbr_intersects(key, F.col("box"))).select(
        "s_suppkey"
    )


@query(
    "nosql_multiget",
    """
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 6) AS c_acctbal
    FROM customer
    WHERE c_custkey IN (3, 7, 11, 42) OR c_custkey BETWEEN 100 AND 110
    """,
)
def nosql_multiget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NoSQL multiGet with RowKeyPredicate (Container.java:437-898,
    GET_MULTIPLE_CONTAINER_ROWS): key-list get unioned with a key-range
    get — both push into the scan as IN/range filters."""
    from griddb_spark.container import Collection

    c = cat(spark, sf_dir)
    col = Collection("customer", c.load("customer"), row_key="c_custkey")
    got = col.multi_get([3, 7, 11, 42]).unionAll(col.multi_get_range(100, 110))
    return got.select(
        "c_custkey", "c_name", "c_nationkey", _r6(F.col("c_acctbal")).alias("c_acctbal")
    )


@query(
    "scalar_numeric_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           abs(-l_quantity) AS abs_qty,
           round(l_extendedprice, 1) AS px_round,
           CAST(trunc(l_extendedprice) AS DOUBLE) AS px_trunc,
           round(sqrt(l_extendedprice), 6) AS px_sqrt,
           round(log(2, l_extendedprice + 1), 6) AS px_log2,
           ceiling(l_discount * 100) AS disc_ceil,
           floor(l_tax * 100) AS tax_floor,
           255 AS hex_ff
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def scalar_numeric_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric scalar functions (sql_expression_numeric.h:45-86): ABS,
    ROUND, TRUNC (toward zero), SQRT, LOG(base, x) — reference semantics
    log(x)/log(base), query_function_numeric.h:221 — CEILING/FLOOR
    (function_float.h), HEX_TO_DEC. All pure codegen expressions."""
    from griddb_spark.functions.scalar import hex_to_dec

    li = cat(spark, sf_dir).load("lineitem").filter(F.col("l_orderkey") < 200)
    px = F.col("l_extendedprice")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.abs(-F.col("l_quantity")).alias("abs_qty"),
        F.round(px, 1).alias("px_round"),
        px.cast("long").cast("double").alias("px_trunc"),
        _r6(F.sqrt(px)).alias("px_sqrt"),
        _r6(F.log(2.0, px + 1)).alias("px_log2"),
        F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_ceil"),
        F.floor(F.col("l_tax") * 100).cast("double").alias("tax_floor"),
        hex_to_dec(F.lit("FF")).cast("int").alias("hex_ff"),
    )


@query(
    "scalar_bitwise_ops",
    """
    SELECT l_orderkey, l_linenumber,
           l_orderkey << 2 AS shl,
           l_orderkey >> 1 AS shr,
           l_orderkey & 255 AS band,
           l_orderkey | 16 AS bor,
           xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS bxor,
           ~CAST(l_linenumber AS BIGINT) AS bnot,
           l_orderkey % 7 AS rem7
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def scalar_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit operators << >> & | ~ and %, XOR (sql_type.h:201-227 binary op
    set; TQL tql_token.h:39-67) as JVM-side Column ops."""
    li = cat(spark, sf_dir).load("lineitem").filter(F.col("l_orderkey") < 100)
    k, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"),
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(16)).alias("bor"),
        k.bitwiseXOR(ln).alias("bxor"),
        F.bitwise_not(ln).alias("bnot"),
        (k % 7).alias("rem7"),
    )


_SUBQUERY_FOLD_SQL = """
    SELECT c.c_custkey, round(c.c_acctbal, 6) AS acctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 100000)
      AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_orderstatus = 'F'
                                AND o_totalprice < 2000)
"""


@query("subquery_fold", _SUBQUERY_FOLD_SQL)
def subquery_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery decorrelation (AGG_FOLD_EXISTS/IN/NOT_IN, sql_type.h:131-135;
    pushDownSubquery sql_compiler.h:2151): correlated scalar subquery +
    EXISTS + NOT IN, all handed to Catalyst's native rewrite
    (RewriteCorrelatedScalarSubquery / semi- and anti-join folding)."""
    c = cat(spark, sf_dir)
    c.register_all(("customer", "orders"))
    return spark.sql(_SUBQUERY_FOLD_SQL)


@query(
    "ddl_create_view",
    """
    WITH nation_rev AS (
      SELECT n_name, n_nationkey,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, n_nationkey)
    SELECT n_name, revenue, n_orders FROM nation_rev
    WHERE n_orders > 10
    """,
)
def ddl_create_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL CREATE VIEW + #views meta (sql_parser.h:232-260 CommandType
    CREATE_VIEW; meta_type.h #views): define a view over a join-agg, then
    query through it — the view body inlines into the plan, so pushdown
    and broadcast behave exactly as the unnested query."""
    c = cat(spark, sf_dir)
    c.register_all(("orders", "customer", "nation"))
    spark.sql("""
        CREATE OR REPLACE TEMPORARY VIEW nation_rev AS
        SELECT n_name, n_nationkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, n_nationkey
    """)
    return spark.sql(
        "SELECT n_name, revenue, n_orders FROM nation_rev WHERE n_orders > 10"
    )


@query(
    "range_20m_offset",
    f"""
    WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    b AS (SELECT make_timestamp(({EV_START_MS + 600_000}
             + (epoch_ms(ts) - {EV_START_MS + 600_000}) // 1200000 * 1200000)
             * 1000) AS ts,
                 value
          FROM ev
          WHERE epoch_ms(ts) >= {EV_START_MS + 600_000}
            AND epoch_ms(ts) <= {EV_END_MS})
    SELECT ts, round(avg(value), 6) AS avg_value, count(*) AS n
    FROM b GROUP BY ts
    """,
)
def range_20m_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY RANGE ... EVERY(20, MINUTE, 10) — the 3-arg EVERY offset
    shifts the bucket lattice (sql_parser.h:742-782 CreateTableOption /
    range-group offset, sql_operator_group.cpp:181-440)."""
    from griddb_spark.operators.group_range import group_by_range

    ev = cat(spark, sf_dir).load("events")
    return group_by_range(
        ev, "ts", 20, "MINUTE",
        {"avg_value": _r6(F.avg("value")), "n": F.count(F.lit(1))},
        EV_START, EV_END, offset=10, fill="NONE",
    )


@query(
    "natural_join",
    """
    SELECT n.n_nationkey AS nationkey, n.n_name, n.n_regionkey AS regionkey,
           r.r_name
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def natural_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATURAL JOIN (JOIN_NATURAL_* variants, sql_type.h:232-243): shared
    column name drives the equi-join; dims broadcast."""
    c = cat(spark, sf_dir)
    c.load("nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name",
        F.col("n_regionkey").alias("regionkey"),
    ).createOrReplaceTempView("v_nation")
    c.load("region").select(
        F.col("r_regionkey").alias("regionkey"), "r_name"
    ).createOrReplaceTempView("v_region")
    return spark.sql(
        "SELECT nationkey, n_name, regionkey, r_name "
        "FROM v_nation NATURAL JOIN v_region"
    )


@query(
    "composite_key_multiget",
    """
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice, 6) AS l_extendedprice
    FROM lineitem
    WHERE (l_orderkey, l_linenumber) IN ((1, 1), (3, 2), (7, 1), (32, 3))
    """,
)
def composite_key_multiget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite row-key multiGet (CompositeKeyMultiGet.java sample;
    composite keys btree_map.h:30-55): tuple-key point lookups folded into
    one pushed-down OR-of-ANDs scan filter."""
    from griddb_spark.container import Collection

    c = cat(spark, sf_dir)
    col = Collection("lineitem", c.load("lineitem"),
                     row_key=["l_orderkey", "l_linenumber"])
    got = col.multi_get([(1, 1), (3, 2), (7, 1), (32, 3)])
    return got.select(
        "l_orderkey", "l_linenumber", "l_quantity",
        _r6(F.col("l_extendedprice")).alias("l_extendedprice"),
    )


@query(
    "nano_ts_fidelity",
    """
    SELECT event_id,
           epoch_us(ts) AS ts_us,
           epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
           CAST(ts AS TIMESTAMP) AS ts_micro
    FROM events WHERE event_id < 500
    """,
)
def nano_ts_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MICRO/NANO_TIMESTAMP handling (data_store_common.h:136-165 types
    21/22, GridDB 5.3 release notes). Dtype-adaptive like the streaming
    readers: parquet TIMESTAMP(NANOS) sources arrive as epoch-nanos LONG
    (session nanosAsLong) and are projected with integer div — double
    division loses µs at epoch-nanos magnitude (1.7e18 > 2^53); µs/ms
    sources arrive as TimestampType and project via unix_micros/millis.
    The driver fixtures are currently timestamp[us]; the ns LONG path is
    covered by a self-written ns fixture in
    tests/test_timeseries_ops.py::test_nano_ts_roundtrip."""
    c = cat(spark, sf_dir)
    prepare(spark)
    raw = spark.read.parquet(c.path("events")).filter(F.col("event_id") < 500)
    if dict(raw.dtypes)["ts"] == "bigint":  # ns parquet under nanosAsLong
        return raw.select(
            "event_id",
            F.expr("ts div 1000").alias("ts_us"),
            F.expr("ts div 1000000").alias("ts_ms"),
            F.timestamp_micros(F.expr("ts div 1000")).alias("ts_micro"),
        )
    return raw.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_millis("ts").alias("ts_ms"),
        F.col("ts").alias("ts_micro"),
    )


@query(
    "stream_ema_anomaly",
    """
    WITH RECURSIVE e AS (
      SELECT user_id, value::DOUBLE AS v,
             row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT user_id, rn, v, 0.0::DOUBLE AS prev_ema, v AS ema
      FROM e WHERE rn = 1
      UNION ALL
      SELECT e.user_id, e.rn, e.v, r.ema AS prev_ema,
             0.2::DOUBLE * e.v + 0.8::DOUBLE * r.ema AS ema
      FROM r JOIN e ON e.user_id = r.user_id AND e.rn = r.rn + 1
    )
    SELECT user_id, count(*) AS n_anomalies
    FROM r WHERE rn - 1 >= 5 AND v > 2.0 * prev_ema
    GROUP BY user_id ORDER BY user_id
    """,
)
def stream_ema_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key stateful streaming anomaly detection
    (applyInPandasWithState): one (count, EMA) state per user_id over the
    events stream, flagging values > 2x the running level — the
    Structured-Streaming replacement for GridDB's removed trigger/alert
    path (docs/GridDB-5.0-CE-RELEASE_NOTES.md). VALUE-ORACLED: the oracle
    replays the exact EMA recurrence as a recursive CTE stepping one row
    per key per iteration — `0.2*v + 0.8*prev` in doubles is bit-identical
    to the kernel's pandas ewm(adjust=False) (unit-pinned), and (user_id,
    ts) pairs are unique in the fixture so the per-key order is total."""
    import uuid as _uuid

    from griddb_spark.streaming import run_to_memory
    from griddb_spark.streaming.stateful import ema_anomaly_stream

    prepare(spark)
    raw = (
        spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        )
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":  # ns parquet under nanosAsLong
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    flagged = ema_anomaly_stream(
        ev, ["user_id"], value_col="value", ts_col="ts",
        alpha=0.2, threshold=2.0, min_history=5,
    )
    # half-core state partitions, floor 8: the vectorized EMA (pandas
    # ewm) saturates compute parallelism well below core count, and
    # per-store commit time grows superlinearly with concurrent
    # commits per host (r14 sweep: ~100 ms/store at 8 stores vs
    # ~1080 ms/store at 32; med walls 1.93 s @16 partitions vs 2.64 @32
    # vs 2.48 @8 — 16 balances matcher parallelism against the commit
    # floor on a 32-core host). Scales with the core count so the
    # driver's low-core run keeps its current shape (8 cores -> 8);
    # SPARK_GRAFT_STATE_PARTITIONS overrides for production rates.
    out = run_to_memory(
        flagged, f"ema_{_uuid.uuid4().hex[:8]}", mode="append",
        shuffle_partitions=max(8, spark.sparkContext.defaultParallelism // 2),
    )
    return (
        out.filter(F.col("is_anomaly"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_anomalies"))
        .orderBy("user_id")
    )


@query(
    "time_sampling_no_interp",
    f"""
    WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                       event_type, value
                FROM events
                WHERE user_id = 3
                  AND CAST(ts AS TIMESTAMP) >= TIMESTAMP '{EV_START}'
                  AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '{EV_END}'),
    grid AS (SELECT make_timestamp(({EV_START_MS} + g * 21600000) * 1000) ts
             FROM range(0, ({EV_END_MS} - {EV_START_MS}) // 21600000 + 1) r(g)),
    bounded AS (SELECT g.ts FROM grid g WHERE g.ts <= (SELECT max(ts) FROM ev))
    SELECT b.ts,
           coalesce(e.event_id, 0) AS event_id,
           coalesce(e.user_id, 0) AS user_id,
           coalesce(e.event_type, '') AS event_type,
           coalesce(e.value, 0.0) AS value
    FROM bounded b LEFT JOIN ev e ON b.ts = e.ts
    """,
)
def time_sampling_no_interp_user3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE without interpolation (TimeSeries::sampleWithoutInterp,
    time_series.cpp:3624; InterpolationMode.EMPTY): 6h grid over user 3's
    events — exact matches emit the row, gaps emit GridDB empty values
    (type defaults), grid stops at the last data row."""
    from griddb_spark.operators import time_sampling_no_interp

    ev = (
        cat(spark, sf_dir).load("events")
        .filter(F.col("user_id") == 3)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    return time_sampling_no_interp(ev, EV_START, EV_END, 6, "HOUR", ts_col="ts")


@query(
    "scalar_time_tz",
    """
    SELECT o_orderkey,
           CAST(date_trunc('day', o_orderdate AT TIME ZONE 'UTC'
                AT TIME ZONE 'Asia/Tokyo') AT TIME ZONE 'Asia/Tokyo'
                AT TIME ZONE 'UTC' AS TIMESTAMP) AS day_jst,
           EXTRACT(hour FROM o_orderdate AT TIME ZONE 'UTC'
                AT TIME ZONE 'Asia/Tokyo')::INT AS hr_jst,
           strftime(o_orderdate AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York', '%Y-%m-%d %H') AS fmt_ny
    FROM orders WHERE o_orderkey <= 100
    """,
)
def scalar_time_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time functions with GridDB's optional timezone argument
    (TIMESTAMP_TRUNC/EXTRACT/STRFTIME with tz, sql_expression_time.h:47-196,
    5.x zone support): boundaries/fields computed in the given zone,
    results stay UTC instants."""
    from griddb_spark.functions.time import extract_unit, strftime, timestamp_trunc

    o = cat(spark, sf_dir).load("orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        timestamp_trunc("DAY", F.col("o_orderdate"), tz="Asia/Tokyo").alias("day_jst"),
        extract_unit("HOUR", F.col("o_orderdate"), tz="Asia/Tokyo").alias("hr_jst"),
        strftime("%Y-%m-%d %H", F.col("o_orderdate"), tz="America/New_York").alias("fmt_ny"),
    )


@query(
    "scalar_string_funcs2",
    """
    SELECT c_custkey,
           hex(substr(c_name, 1, 4)) AS hx,
           chr(72) || chr(105) AS ch,
           unicode(c_name) AS uc,
           translate(c_name, '#0123', '-OIZE') AS tr,
           printf('%s:%04d', c_mktsegment, c_custkey) AS pf,
           '''' || replace(c_name, '''', '''''') || '''' AS quoted,
           ltrim(c_name, 'Cust') AS lt,
           rtrim(c_name, '0123456789#') AS rt
    FROM customer WHERE c_custkey <= 100
    """,
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery (sql_expression_string.h:45-176): HEX, CHAR,
    UNICODE, TRANSLATE, PRINTF, QUOTE, charset LTRIM/RTRIM — all engine
    shims over codegen built-ins."""
    from griddb_spark.functions import scalar as S

    c = cat(spark, sf_dir).load("customer").filter(F.col("c_custkey") <= 100)
    return c.select(
        "c_custkey",
        S.hex_(F.substring("c_name", 1, 4)).alias("hx"),
        S.char_(72, 105).alias("ch"),
        S.unicode_("c_name").alias("uc"),
        S.translate_("c_name", "#0123", "-OIZE").alias("tr"),
        S.printf("%s:%04d", "c_mktsegment", "c_custkey").alias("pf"),
        S.quote("c_name").alias("quoted"),
        F.ltrim(F.col("c_name"), F.lit("Cust")).alias("lt"),
        F.rtrim(F.col("c_name"), F.lit("0123456789#")).alias("rt"),
    )


# ===========================================================================
# pipeline: corpus-quality filters, PII, URLs, embedding preprocessing,
# sessionization (training-data operators beyond the reference surface)
# ===========================================================================


@query(
    "pipe_quality_repetition",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
               FROM documents),
    b AS (SELECT doc_id, w,
            CASE WHEN len(w) >= 2
                 THEN [w[i] || ' ' || w[i+1] for i in range(1, len(w))]
                 ELSE [] END AS bg
          FROM t)
    SELECT doc_id,
      round(1.0 - len(list_distinct(w))::double / len(w), 6) AS dup_word_ratio,
      round(list_max(list_transform(list_distinct(w),
              t -> len(list_filter(w, x -> x = t))))::double / len(w), 6)
        AS top_word_ratio,
      CASE WHEN len(bg) > 0
           THEN round(1.0 - len(list_distinct(bg))::double / len(bg), 6)
           ELSE 0.0 END AS dup_bigram_ratio,
      CASE WHEN len(bg) > 0
           THEN round(list_max(list_transform(list_distinct(bg),
                  t -> len(list_filter(bg, x -> x = t))))::double / len(bg), 6)
           ELSE 0.0 END AS top_bigram_ratio
    FROM b
    """,
)
def pipe_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText repetition signals (duplicate-token, top-unigram,
    duplicate/top-bigram fractions) — the pre-dedup low-quality filter.
    Pure per-row expressions: fuses into the scan, no shuffle."""
    from griddb_spark.pipeline import with_repetition_stats

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return with_repetition_stats(docs, "text", keep=("doc_id",))


#: deterministic synthetic-PII augmentation shared by the Spark and DuckDB
#: sides of pipe_pii_scrub (driver corpora contain no real PII)
_PII_AUG_SQL = (
    "text || ' contact user' || doc_id || '@mail.example.org or +1-555-' || "
    "lpad(doc_id::varchar, 4, '0') || ' ip 10.0.' || (doc_id % 256)::varchar "
    "|| '.7'"
)


@query(
    "pipe_pii_scrub",
    f"""
    WITH t AS (SELECT doc_id, {_PII_AUG_SQL} AS aug FROM documents)
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(aug,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
        '[+][0-9]{{1,3}}-[0-9]{{3}}-[0-9]{{3,4}}(-[0-9]{{3,4}})?', '<PHONE>', 'g'),
        '([0-9]{{1,3}}[.]){{3}}[0-9]{{1,3}}', '<IP>', 'g') AS scrubbed,
      len(regexp_extract_all(aug,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+')) AS n_emails,
      len(regexp_extract_all(aug,
        '[+][0-9]{{1,3}}-[0-9]{{3}}-[0-9]{{3,4}}(-[0-9]{{3,4}})?')) AS n_phones,
      len(regexp_extract_all(aug,
        '([0-9]{{1,3}}[.]){{3}}[0-9]{{1,3}}')) AS n_ips
    FROM t
    """,
)
def pipe_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / intl phone numbers / IPv4) with per-class
    counts. The corpus carries no PII, so both engines append the same
    deterministic synthetic contact line before scrubbing."""
    from griddb_spark.pipeline import pii_scrub

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    aug = docs.withColumn(
        "aug",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id"),
            F.lit("@mail.example.org or +1-555-"),
            F.lpad(F.col("doc_id").cast("string"), 4, "0"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
        ),
    )
    cols = pii_scrub("aug")
    return aug.select("doc_id", *[c.alias(n) for n, c in cols.items()])


@query(
    "pipe_url_domains",
    """
    WITH t AS (SELECT doc_id,
        'see https://' || source || '.example.com/d/' || doc_id ||
        ' and http://cdn.' || source || '.net/x' AS aug
      FROM documents),
    u AS (SELECT doc_id, unnest(regexp_extract_all(aug, 'https?://[^ ]+')) AS url
          FROM t)
    SELECT regexp_extract(url, 'https?://([^/ ]+)', 1) AS domain,
           count(*) AS n_urls, count(DISTINCT doc_id) AS n_docs
    FROM u GROUP BY domain
    """,
)
def pipe_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction + per-domain stats (the crawl-pipeline domain filter
    input). Both engines augment the corpus with the same deterministic
    URLs; extraction/parse is all regex built-ins."""
    from griddb_spark.pipeline import domain_of, urls

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    aug = docs.withColumn(
        "aug",
        F.concat(
            F.lit("see https://"), F.col("source"), F.lit(".example.com/d/"),
            F.col("doc_id"), F.lit(" and http://cdn."), F.col("source"),
            F.lit(".net/x"),
        ),
    )
    u = aug.select("doc_id", F.explode(urls("aug")).alias("url"))
    return u.groupBy(domain_of(F.col("url")).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "pipe_profile_stats",
    """
    SELECT 'doc_id' AS column, 'bigint' AS dtype, count(*) AS n_rows,
           sum((doc_id IS NULL)::BIGINT)::BIGINT AS n_null,
           count(DISTINCT doc_id) AS n_distinct,
           CAST(min(doc_id) AS VARCHAR) AS min_repr,
           CAST(max(doc_id) AS VARCHAR) AS max_repr,
           CAST(NULL AS DOUBLE) AS avg_len
    FROM documents
    UNION ALL
    SELECT 'text', 'string', count(*), sum((text IS NULL)::BIGINT)::BIGINT,
           count(DISTINCT text), min(text), max(text),
           round(avg(strlen(text)), 6)
    FROM documents
    UNION ALL
    SELECT 'lang', 'string', count(*), sum((lang IS NULL)::BIGINT)::BIGINT,
           count(DISTINCT lang), min(lang), max(lang),
           round(avg(strlen(lang)), 6)
    FROM documents
    UNION ALL
    SELECT 'source', 'string', count(*), sum((source IS NULL)::BIGINT)::BIGINT,
           count(DISTINCT source), min(source), max(source),
           round(avg(strlen(source)), 6)
    FROM documents
    UNION ALL
    SELECT 'n_chars', 'bigint', count(*), sum((n_chars IS NULL)::BIGINT)::BIGINT,
           count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR),
           CAST(max(n_chars) AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM documents
    """,
)
def pipe_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (the ANALYZE-TABLE / pre-training audit shape):
    per-column null counts, exact distinct cardinality, value bounds and
    string-length means — ALL columns in ONE scan (Catalyst fuses the
    aggregate battery into a single partial-agg pipeline; at 100 TB pass
    approx=True to swap exact distincts for HLL sketches). Long-format
    output: one row per column."""
    from griddb_spark.pipeline import profile_stats

    docs = cat(spark, sf_dir).load("documents")
    return profile_stats(docs)


@query(
    "pipe_url_dedup",
    """
    WITH t AS (SELECT doc_id,
        'https://www.' || source || '.example.com/page/' ||
        (doc_id % 50) || '?id=' || (doc_id % 7) AS canon
      FROM documents)
    SELECT canon AS canonical_url, count(*) AS n_dups,
           min(doc_id) AS survivor_id
    FROM t GROUP BY canon
    """,
)
def pipe_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup (the crawl-frontier shape): messy URLs
    — uppercase scheme/host, tracking parameters, fragments — normalize
    via pure Column regex algebra (canonical_url) and dedup on the
    canonical form. Both engines synthesize the same deterministic messy
    URLs from doc fields; the ORACLE constructs the clean form directly,
    so any canonicalization bug hash-fails. No UDF, one groupBy."""
    from griddb_spark.pipeline import canonical_url

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    messy = docs.withColumn(
        "url",
        F.concat(
            F.lit("HTTPS://WWW."), F.upper(F.col("source")),
            F.lit(".Example.COM/page/"), F.col("doc_id") % 50,
            F.lit("?utm_source=feed&id="), F.col("doc_id") % 7,
            F.lit("&utm_campaign=x#section-2"),
        ),
    )
    return (
        messy.withColumn("canonical_url", canonical_url(F.col("url")))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_dups"),
             F.min("doc_id").alias("survivor_id"))
    )


@query(
    "pipe_embed_rp",
    """
    WITH t AS (SELECT vec_id, embedding::double[] AS ev FROM embeddings),
    q AS (SELECT vec_id, r.i,
                 CAST(floor(ev[r.i] * 1000000 + 0.5) AS BIGINT) AS vq
          FROM t CROSS JOIN range(1, 65) AS r(i)),
    s AS (SELECT ri.i, rj.j,
                 CASE WHEN ('0x' || substr(md5(ri.i || '_' || rj.j), 1, 8))
                           ::BIGINT % 2 = 0
                      THEN 1 ELSE -1 END AS s
          FROM range(1, 65) AS ri(i) CROSS JOIN range(0, 16) AS rj(j))
    SELECT vec_id, j, sum(vq * s) / 4000000.0 AS comp
    FROM q JOIN s USING (i)
    GROUP BY vec_id, j
    """,
)
def pipe_embed_rp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64→16 (similarity.py): the
    dimensionality-reduction stage ahead of clustering/LSH at 100 TB — a
    derived ±1 sign matrix (content-hash of the index pair, no seed to
    ship) broadcast against micro-int-quantized components, summed in
    exact BIGINT so any aggregation order hash-matches. The production
    twin (``random_project``) is a shuffle-free Arrow GEMM; parity is
    pinned in tests."""
    from griddb_spark.pipeline import random_project_exact

    emb = cat(spark, sf_dir).load("embeddings")
    return random_project_exact(emb, "vec_id", "embedding", in_dim=64,
                                out_dim=16)


@query(
    "pipe_embed_normalize",
    """
    WITH t AS (SELECT vec_id, embedding::double[] AS ev FROM embeddings),
    n AS (SELECT vec_id, ev, sqrt(list_dot_product(ev, ev)) AS nrm,
                 list_max(list_transform(ev, x -> abs(x))) AS amax
          FROM t)
    SELECT vec_id,
      array_to_string(list_transform(ev,
        x -> CAST(floor(x / nrm * 1000000 + 0.5) AS BIGINT)), ',')
        AS unit_q6,
      array_to_string(list_transform(ev,
        x -> CAST(floor(x * (127.0 / amax) + 0.5) AS INT)), ',')
        AS q_int8,
      round(127.0 / amax, 6) AS q_scale
    FROM n
    """,
)
def pipe_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding preprocessing: unit-L2 normalization (emitted as exact
    micro-scaled ints — floor-based, bit-deterministic across engines) and
    symmetric int8 scalar quantization with its de-quant scale. The ingest
    stage that makes every later cosine a dot product and shrinks the ANN
    working set 4x. Norm/amax are pre-projected once per row (see
    with_unit_and_int8) — inlining them into the element lambdas is
    O(dim²) interpreted work. The int vectors gate as comma-joined strings
    (exact: integer formatting has no engine variance) because the
    driver's pandas canonicalizer cannot hash list cells."""
    from griddb_spark.pipeline.similarity import with_unit_and_int8

    emb = cat(spark, sf_dir).load("embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id")
    q = with_unit_and_int8(emb, "embedding", keep=("vec_id",))
    return q.select(
        "vec_id",
        F.array_join(F.col("unit_q6").cast("array<string>"), ",")
            .alias("unit_q6"),
        F.array_join(F.col("q_int8").cast("array<string>"), ",")
            .alias("q_int8"),
        "q_scale",
    )


#: shared gaps-and-islands oracle for both sessionization faces (12h gap →
#: ~3.3k sessions over sf0.01 events; session_end = last event + gap,
#: matching Spark's session_window convention)
_SESSION_ORACLE = """
    WITH e AS (SELECT user_id, ts, value,
          CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts)) > 43200000000
               THEN 1 ELSE 0 END AS nw
          FROM events),
    s AS (SELECT user_id, ts, value,
            (sum(nw) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) + 1)::BIGINT AS sid
          FROM e)
    SELECT user_id, {sid} min(ts) AS session_start,
           max(ts) + INTERVAL 720 MINUTE AS session_end,
           count(*) AS n_events, round(sum(value), 6) AS sum_value
    FROM s GROUP BY user_id, sid
"""


@query("sessionize_events", _SESSION_ORACLE.format(sid="sid AS session_id,"))
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (12h gap): gaps-and-islands via one
    window pass per key, then one groupBy — two narrow shuffles total."""
    from griddb_spark.operators.sessionize import sessionize

    ev = cat(spark, sf_dir).load("events")
    return sessionize(
        ev, key="user_id", ts="ts", gap_minutes=720,
        aggs={"sum_value": _r6(F.sum("value"))},
    )


@query("stream_sessionize", _SESSION_ORACLE.format(sid=""))
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization: the same 12h-gap sessions computed by
    ``F.session_window`` state (complete mode so the tail sessions flush in
    a bounded availableNow run). Oracle = the batch gaps-and-islands twin
    minus the per-key session ordinal (streams identify sessions by start
    time)."""
    import uuid as _uuid

    from griddb_spark.operators.sessionize import sessionize_stream
    from griddb_spark.streaming import run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = sessionize_stream(
        ev, key="user_id", ts="ts", gap_minutes=720,
        aggs={"sum_value": _r6(F.sum("value"))},
    )
    return run_to_memory(out, f"sess_{_uuid.uuid4().hex[:8]}", mode="complete",
                         shuffle_partitions=8)


@query(
    "stream_dedup",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 6) AS sv
    FROM events GROUP BY event_type
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark): the events
    stream unioned with itself — every row arrives twice, the at-least-once
    ingest case — dedups back to exactly-once by event_id with
    watermark-bounded state; per-type stats then match the single-copy
    batch oracle."""
    import uuid as _uuid

    from griddb_spark.streaming import dedup_stream, run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def rd():
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events*.parquet")
            .parquet(sf_dir)
        )
        if dict(raw.dtypes)["ts"] == "bigint":
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return raw

    doubled = rd().union(rd())
    dd = dedup_stream(doubled, ["event_id"], "ts", watermark="1 hour")
    tbl = run_to_memory(dd, f"dd_{_uuid.uuid4().hex[:8]}", mode="append",
                        shuffle_partitions=8)
    return tbl.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), _r6(F.sum("value")).alias("sv")
    )


@query(
    "meta_access_control",
    """
    SELECT * FROM (VALUES
      ('admin',   'public',    'ALL',  TRUE,  TRUE),
      ('analyst', 'public',    'READ', TRUE,  FALSE),
      ('etl',     'public',    'ALL',  TRUE,  TRUE),
      ('etl',     'warehouse', 'ALL',  TRUE,  TRUE))
    AS t(user_name, db_name, privilege, can_read, can_write)
    """,
)
def meta_access_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users/roles/GRANT-REVOKE (CMD_CREATE_USER..CMD_REVOKE,
    sql_parser.h:251-256): a deterministic registry — admin with ALL,
    analyst with READ, an etl role granted ALL on two databases — surfaced
    through the #access meta table with effective read/write flags per
    grant. Revoked grants (auditor) are absent, exactly like the
    reference's DROP_PRIVILEGE."""
    from griddb_spark.security import AccessControl, SecurityError

    acl = (
        AccessControl(spark)
        .create_user("admin", "pw-a")
        .create_user("analyst", "pw-b")
        .create_user("auditor", "pw-c")
        .create_role("etl")
        .grant("ALL", "public", "admin")
        .grant("READ", "public", "analyst")
        .grant("READ", "public", "auditor")
        .grant("ALL", "public", "etl")
        .grant("ALL", "warehouse", "etl")
        .revoke("READ", "public", "auditor")
    )

    def can(user, db, priv):
        try:
            acl.authorize(user, db, priv)
            return True
        except SecurityError:
            return False

    rows = [
        (u, db, p, can(u, db, "READ"), can(u, db, "ALL"))
        for (u, db, p) in sorted(acl._grants)
    ]
    return spark.createDataFrame(
        rows,
        "user_name string, db_name string, privilege string, "
        "can_read boolean, can_write boolean",
    )


@query(
    "pipe_lm_score",
    """
    WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) tok
               FROM documents),
    v AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    tot AS (SELECT count(*) AS n FROM t)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(ln(c::double / n)), 6) AS avg_logprob,
           round(exp(-round(avg(ln(c::double / n)), 6)), 2) AS ppl
    FROM t JOIN v USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def pipe_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring (mean token log-probability + perplexity
    proxy): the corpus builds its own vocabulary in one combinable count
    pass, then tokens re-join it — the KenLM-filter shape without the
    external model."""
    from griddb_spark.pipeline.quality import unigram_logprob

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return unigram_logprob(docs, "text", "doc_id")


@query(
    "pipe_audio_features",
    """
    WITH e AS (SELECT event_id AS doc_id FROM events WHERE event_id < 500),
    s AS (SELECT doc_id, j, ((doc_id * 7 + j * 13) % 256) - 128 AS v
          FROM e CROSS JOIN range(0, 160) t(j)),
    z AS (SELECT doc_id, v,
            lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
          FROM s),
    a AS (SELECT doc_id, count(*) AS n,
            sum(v * v) AS sum_sq,
            sum(CASE WHEN pv IS NOT NULL AND ((v < 0) != (pv < 0))
                THEN 1 ELSE 0 END) AS zc,
            max(abs(v)) AS peak
          FROM z GROUP BY doc_id)
    SELECT doc_id, CAST(n AS INT) AS n_samples, 8000 AS sample_rate,
           round(n * 1000.0 / 8000, 3) AS duration_ms,
           round(sqrt(sum_sq / n), 6) AS rms,
           CAST(zc AS INT) AS zero_crossings, CAST(peak AS INT) AS peak
    FROM a
    """,
)
def pipe_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio plumbing with a REAL RIFF/WAV PCM codec (stdlib wave —
    wav_pack/wav_decode/audio_features, pipeline/multimodal.py): integer
    sample arrays derived from the data encode to genuine WAV bytes,
    decode back through the real parser, and yield the filter features
    (duration, RMS from an exact integer sum-of-squares + one IEEE sqrt,
    zero-crossing count, peak). The oracle computes the same features
    from the sample FORMULA alone — so a hash match proves the container
    round-trip is lossless, the PNG-path methodology applied to audio.
    Compressed codecs stay behind NotImplementedError."""
    from griddb_spark.pipeline.multimodal import audio_features, wav_pack

    ev = cat(spark, sf_dir).load("events").filter(F.col("event_id") < 500)
    base = ev.select(
        F.col("event_id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(159)),
            lambda j: ((F.col("event_id") * 7 + j * 13) % 256 - 128)
            .cast("int"),
        ).alias("samples"),
        F.lit(8000).alias("rate"),
    )
    media = wav_pack(base, "samples", "rate", id_col="doc_id")
    return audio_features(media, "media", "doc_id")


@query(
    "pipe_audio_resample",
    """
    WITH e AS (SELECT event_id AS doc_id FROM events WHERE event_id < 500),
    s AS (SELECT doc_id, j,
            ((doc_id * 7 + (2 * j) * 13) % 256) - 128 AS v
          FROM e CROSS JOIN range(0, 80) t(j)),
    z AS (SELECT doc_id, v,
            lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
          FROM s),
    a AS (SELECT doc_id, count(*) AS n,
            sum(v * v) AS sum_sq,
            sum(CASE WHEN pv IS NOT NULL AND ((v < 0) != (pv < 0))
                THEN 1 ELSE 0 END) AS zc,
            max(abs(v)) AS peak
          FROM z GROUP BY doc_id)
    SELECT doc_id, CAST(n AS INT) AS n_samples, 4000 AS sample_rate,
           round(n * 1000.0 / 4000, 3) AS duration_ms,
           round(sqrt(sum_sq / n), 6) AS rms,
           CAST(zc AS INT) AS zero_crossings, CAST(peak AS INT) AS peak
    FROM a
    """,
)
def pipe_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio resampling through the real codec (resample_audio,
    pipeline/multimodal.py): the 8 kHz fixtures downsample to 4 kHz —
    linear interpolation at integer positions is the identity, so the
    resampled stream is exactly the even-position samples and the oracle
    scores THOSE from the formula alone: encode → resample → re-encode →
    decode → features must round-trip losslessly end to end."""
    from griddb_spark.pipeline.multimodal import (
        audio_features,
        resample_audio,
        wav_pack,
    )

    ev = cat(spark, sf_dir).load("events").filter(F.col("event_id") < 500)
    base = ev.select(
        F.col("event_id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(159)),
            lambda j: ((F.col("event_id") * 7 + j * 13) % 256 - 128)
            .cast("int"),
        ).alias("samples"),
        F.lit(8000).alias("rate"),
    )
    media = wav_pack(base, "samples", "rate", id_col="doc_id")
    rs = resample_audio(media, 4000, "media", "doc_id")
    return audio_features(
        rs.select("doc_id", F.col("media_rs").alias("media")),
        "media", "doc_id",
    )


@query(
    "stream_audio_features",
    """
    WITH e AS (SELECT event_id AS doc_id FROM events WHERE event_id < 500),
    s AS (SELECT doc_id, j, ((doc_id * 7 + j * 13) % 256) - 128 AS v
          FROM e CROSS JOIN range(0, 160) t(j)),
    z AS (SELECT doc_id, v,
            lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
          FROM s),
    a AS (SELECT doc_id, count(*) AS n,
            sum(v * v) AS sum_sq,
            sum(CASE WHEN pv IS NOT NULL AND ((v < 0) != (pv < 0))
                THEN 1 ELSE 0 END) AS zc,
            max(abs(v)) AS peak
          FROM z GROUP BY doc_id)
    SELECT doc_id, CAST(n AS INT) AS n_samples, 8000 AS sample_rate,
           round(n * 1000.0 / 8000, 3) AS duration_ms,
           round(sqrt(sum_sq / n), 6) AS rms,
           CAST(zc AS INT) AS zero_crossings, CAST(peak AS INT) AS peak
    FROM a
    """,
)
def stream_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction AT INGEST: real WAV media arrives as a
    file stream and the codec + feature mapInPandas runs per micro-batch
    — stateless, no watermark, the filter-on-write shape for an audio
    corpus (drop silence/clipped clips before they land). Media bytes
    are staged once batch-side (the same deterministic fixtures as
    pipe_audio_features), so the identical formula-only oracle gates the
    streaming path too."""
    import tempfile
    import uuid as _uuid

    from griddb_spark.pipeline.multimodal import audio_features, wav_pack
    from griddb_spark.streaming import run_to_memory

    prepare(spark)
    ev = cat(spark, sf_dir).load("events").filter(F.col("event_id") < 500)
    base = ev.select(
        F.col("event_id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(159)),
            lambda j: ((F.col("event_id") * 7 + j * 13) % 256 - 128)
            .cast("int"),
        ).alias("samples"),
        F.lit(8000).alias("rate"),
    )
    src = tempfile.mkdtemp(prefix="audio_src_")
    wav_pack(base, "samples", "rate", id_col="doc_id").repartition(3).write \
        .mode("overwrite").parquet(f"{src}/media")
    schema = spark.read.parquet(f"{src}/media").schema
    raw = spark.readStream.schema(schema).parquet(f"{src}/media")
    out = audio_features(raw, "media", "doc_id")
    return run_to_memory(out, f"af_{_uuid.uuid4().hex[:8]}", mode="append",
                         shuffle_partitions=8)


@query(
    "pipe_mix_epochs",
    """
    WITH b AS (SELECT doc_id, source,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 10000 AS bk
               FROM documents),
    whole AS (SELECT doc_id, source, unnest(range(1, CASE
                 WHEN source = 'src0' THEN 2
                 WHEN source = 'src1' THEN 0
                 ELSE 1 END + 1)) AS epoch
              FROM b),
    partial AS (SELECT doc_id, source, CASE
                  WHEN source = 'src0' THEN 3
                  WHEN source = 'src1' THEN 1 END AS epoch
                FROM b
                WHERE (source = 'src0' AND bk < 5000)
                   OR (source = 'src1' AND bk < 8000)),
    u AS (SELECT * FROM whole UNION ALL SELECT * FROM partial)
    SELECT source, CAST(epoch AS INT) AS epoch, count(*) AS n,
           min(doc_id) AS min_id
    FROM u GROUP BY source, epoch
    """,
)
def pipe_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch upsampling (mix_epochs, pipeline/sampling.py) —
    the data-recipe staple ("2.5 epochs of src0, 0.8 of src1, 1 of the
    rest"): whole epochs explode per row (no shuffle, no driver loop);
    the partial epoch is the deterministic content-hash slice, so the
    SAME rows repeat on every run/engine/append. Epoch index is emitted
    so packing can interleave epochs downstream. Oracle replays the
    explode + hash slice."""
    from griddb_spark.pipeline.sampling import mix_epochs

    docs = cat(spark, sf_dir).load("documents")
    out = mix_epochs(docs, "doc_id", "source",
                     {"src0": 2.5, "src1": 0.8})
    return out.groupBy("source", "epoch").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id")
    )


@query(
    "pipe_sketch_quantile_merge",
    """
    WITH b AS (
      SELECT least(255, greatest(0, CAST(floor(value / 2.0) AS INT)))
        AS bucket
      FROM events),
    c AS (SELECT bucket, count(*) AS n FROM b GROUP BY bucket),
    cum AS (SELECT bucket,
                   CAST(sum(n) OVER (ORDER BY bucket) AS BIGINT) AS cum,
                   CAST(sum(n) OVER () AS BIGINT) AS tot
            FROM c)
    SELECT max(tot) AS n_rows,
           round(min(CASE WHEN cum >= 0.5 * tot
                          THEN (bucket + 1) * 2.0 END), 6)::DOUBLE AS q_50,
           round(min(CASE WHEN cum >= 0.95 * tot
                          THEN (bucket + 1) * 2.0 END), 6)::DOUBLE AS q_95
    FROM cum
    """,
)
def pipe_sketch_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGE without rescan (histogram_counts/merge_histograms/
    quantiles_from_counts, pipeline/sketches.py): per-event-type
    histogram partials — the state a 100 TB pipeline stores per shard or
    per day — roll up to a single GLOBAL quantile by bucket-wise
    addition alone; the raw events are never touched again. The oracle
    recomputes the global quantiles from raw under the same bucket math,
    so the merge path must be lossless."""
    from griddb_spark.pipeline.sketches import (
        histogram_counts,
        merge_histograms,
        quantiles_from_counts,
    )

    ev = cat(spark, sf_dir).load("events")
    partials = histogram_counts(ev, ["event_type"], "value",
                                lo=0.0, hi=512.0, n_buckets=256)
    merged = merge_histograms(partials, [])
    return quantiles_from_counts(merged, [], [0.5, 0.95],
                                 lo=0.0, hi=512.0, n_buckets=256)


@query(
    "pipe_decontam_spans",
    """
    WITH corpus AS (SELECT doc_id, text FROM documents
                    WHERE doc_id % 41 != 0),
    bench AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
              FROM documents WHERE doc_id % 41 = 0),
    bg AS (SELECT DISTINCT array_to_string(w[i : i+2], ' ') AS span
           FROM (SELECT w, unnest(range(1, greatest(len(w)-2, 0)+1)) AS i
                 FROM bench)),
    t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
          FROM corpus),
    sp0 AS (SELECT doc_id,
              [{'i': i - 1,
                's': array_to_string(w[(i-1)*3+1 : (i-1)*3+3], ' ')}
               FOR i IN range(1, greatest(ceil(len(w)/3.0)::int, 1) + 1)]
                 spans
            FROM t),
    sp AS (SELECT doc_id, u.i AS span_idx, u.s AS span
           FROM (SELECT doc_id, unnest(spans) u FROM sp0)),
    mk AS (SELECT sp.doc_id, sp.span_idx, sp.span,
                  bg.span IS NOT NULL AS hit
           FROM sp LEFT JOIN bg ON bg.span = sp.span)
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN NOT hit THEN span END, ' '
                               ORDER BY span_idx), '') AS clean_text,
           count(*) AS n_spans,
           sum(hit::int)::BIGINT AS n_removed
    FROM mk GROUP BY doc_id
    """,
)
def pipe_decontam_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (decontaminate_spans,
    pipeline/decontaminate.py): cut only the 3-token spans whose exact
    text occurs among the benchmark's overlapping 3-grams, keep the rest
    of the document — the surgical alternative to doc-level dropping
    (pipe_decontaminate) for long documents quoting one snippet. Bench
    slice = doc_id % 41 (the curation-report eval split); the oracle
    replays spans + overlapping bench grams + redaction."""
    from griddb_spark.pipeline.decontaminate import decontaminate_spans

    docs = cat(spark, sf_dir).load("documents")
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    return decontaminate_spans(corpus, bench, "doc_id", "text", k=3)


@query(
    "pipe_pack_epoch_mix",
    """
    WITH b AS (SELECT doc_id, source, text,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 10000 AS bk
               FROM documents),
    whole AS (SELECT doc_id, text, unnest(range(1, CASE
                 WHEN source = 'src0' THEN 2
                 WHEN source = 'src1' THEN 0
                 ELSE 1 END + 1)) AS epoch
              FROM b),
    partial AS (SELECT doc_id, text, CASE
                  WHEN source = 'src0' THEN 3
                  WHEN source = 'src1' THEN 1 END AS epoch
                FROM b
                WHERE (source = 'src0' AND bk < 5000)
                   OR (source = 'src1' AND bk < 8000)),
    u AS (SELECT doc_id * 10 + epoch AS key, text
          FROM (SELECT * FROM whole UNION ALL SELECT * FROM partial)),
    t AS (SELECT key,
            len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
            ('0x'||substr(md5(cast(key AS varchar)),1,8))::BIGINT
              % 10000 % 8 AS bucket
          FROM u),
    s AS (SELECT key, n_tokens, bucket,
            coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY key
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS strt
          FROM t)
    SELECT key, n_tokens, bucket,
           (strt // 256)::BIGINT AS pack_id,
           (strt % 256)::BIGINT AS pack_offset
    FROM s
    """,
)
def pipe_pack_epoch_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end recipe → token stream: fractional-epoch mixing
    (mix_epochs — 2.5 epochs of src0, 0.8 of src1) feeds sequence
    packing keyed by (doc, epoch), so repeated epochs of a document land
    at distinct, deterministic pack positions — the composition a
    training loader actually consumes. Oracle replays mix + pack
    end-to-end."""
    from griddb_spark.pipeline.packing import pack_sequences
    from griddb_spark.pipeline.sampling import mix_epochs

    docs = cat(spark, sf_dir).load("documents")
    mixed = mix_epochs(docs, "doc_id", "source", {"src0": 2.5, "src1": 0.8})
    keyed = mixed.select(
        (F.col("doc_id") * 10 + F.col("epoch")).alias("key"), "text"
    )
    return pack_sequences(keyed, "key", "text", budget=256, n_buckets=8)


@query(
    "pipe_lm_bigram",
    """
    WITH t AS (SELECT doc_id,
                 generate_subscripts(string_split_regex(trim(text), '\\s+'), 1)
                   AS pos,
                 unnest(string_split_regex(trim(text), '\\s+')) AS tok
               FROM documents),
    bg AS (SELECT doc_id, tok,
             lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
           FROM t),
    b2 AS (SELECT * FROM bg WHERE prev IS NOT NULL),
    uni AS (SELECT tok, count(*) AS cu FROM t GROUP BY tok),
    tot AS (SELECT count(*) AS n FROM t),
    bc AS (SELECT prev, tok, count(*) AS cb FROM b2 GROUP BY prev, tok)
    SELECT b2.doc_id, count(*) AS n_bigrams,
           round(avg(ln(0.7 * bc.cb / up.cu + (1 - 0.7) * uw.cu / tot.n)), 6)
             AS avg_logprob,
           round(exp(-round(avg(ln(0.7 * bc.cb / up.cu
                                   + (1 - 0.7) * uw.cu / tot.n)), 6)), 2) AS ppl
    FROM b2
    JOIN bc ON bc.prev = b2.prev AND bc.tok = b2.tok
    JOIN uni up ON up.tok = b2.prev
    JOIN uni uw ON uw.tok = b2.tok
    CROSS JOIN tot
    GROUP BY b2.doc_id
    """,
)
def pipe_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated-bigram LM scoring (bigram_logprob, pipeline/quality.py)
    — Jelinek-Mercer λ=0.7 between the bigram MLE and the unigram floor,
    one doc-keyed lag window + vocabulary-bounded count tables that AQE
    broadcasts. The step from pipe_lm_score toward KenLM-style
    perplexity filters. Oracle replays the same interpolation."""
    from griddb_spark.pipeline.quality import bigram_logprob

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return bigram_logprob(docs, "text", "doc_id", lam=0.7)


@query(
    "pipe_ccnet_buckets",
    """
    WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) tok
               FROM documents),
    v AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
    tot AS (SELECT count(*) AS n FROM t),
    ppl AS (SELECT doc_id,
                   round(exp(-round(avg(ln(c::double / n)), 6)), 2) AS ppl
            FROM t JOIN v USING (tok) CROSS JOIN tot
            GROUP BY doc_id),
    cut AS (SELECT d.doc_id, d.lang, ppl.ppl,
                   ntile(3) OVER (PARTITION BY d.lang
                                  ORDER BY ppl.ppl, d.doc_id) AS tile
            FROM documents d JOIN ppl USING (doc_id))
    SELECT doc_id, lang, ppl,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                     ELSE 'tail' END AS bucket
    FROM cut
    """,
)
def pipe_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail quality partitioning (Wenzek et al.
    2020; pipeline/quality.py): per-language perplexity terciles over the
    corpus's own unigram LM — train on head(+middle), drop/down-weight
    tail. The cut is an ntile over the total order (ppl, doc_id), so
    membership is deterministic at any parallelism; the window shuffles on
    the language key only."""
    from griddb_spark.pipeline import perplexity_buckets

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return perplexity_buckets(docs, "doc_id", "text", "lang")


@query(
    "stream_interval_join",
    """
    WITH c AS (SELECT user_id, event_id AS c_id, ts AS c_ts, value AS c_value
               FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id AS p_user, event_id AS p_id, ts AS p_ts
          FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, c_id, c_ts, round(c_value, 6) AS c_value, p_id, p_ts
    FROM c JOIN p ON c.user_id = p_user
    WHERE p_ts BETWEEN c_ts - INTERVAL 30 MINUTE
                   AND c_ts + INTERVAL 30 MINUTE
    """,
)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks joined to purchases by the same
    user within ±30 minutes — the attribution-window pattern. Watermarks on
    both sides plus the range condition bound the join state; inner matches
    emit immediately, so a bounded availableNow run is exact against the
    batch oracle."""
    import uuid as _uuid

    from griddb_spark.streaming import interval_join_stream, run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def rd():
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events*.parquet")
            .parquet(sf_dir)
        )
        if dict(raw.dtypes)["ts"] == "bigint":
            return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return raw

    clicks = rd().filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
        _r6(F.col("value")).alias("c_value"),
    )
    purchases = rd().filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
    )
    joined = interval_join_stream(
        clicks, purchases, "user_id", "c_ts", "p_ts",
        tolerance_minutes=30, watermark="1 hour",
    )
    # 4 state stores per partition on a stream-stream join: size the state
    # partition count to the (bounded) run, not the batch default. 4
    # partitions = 16 stores — the r14 alternating sweep put the
    # per-host commit sweet spot near 16 concurrent stores (med walls
    # 2.43 s @4 vs 3.04 @8 vs 4.22 @16 partitions; r13's sweep agreed,
    # 2.66 @4 vs 2.88 @8). SPARK_GRAFT_STATE_PARTITIONS overrides for
    # production stream rates.
    return run_to_memory(
        joined, f"sij_{_uuid.uuid4().hex[:8]}", mode="append",
        shuffle_partitions=4,
    )


@query(
    "pipe_chunk_documents",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
               FROM documents),
    e AS (SELECT doc_id, w,
            unnest(generate_series(1, greatest(len(w) - 8, 1), 16)) AS s
          FROM t)
    SELECT doc_id, ((s - 1) // 16)::INT AS chunk_id, s::INT AS chunk_start,
           (least(s + 23, len(w)) - s + 1)::INT AS n_chunk_tokens,
           array_to_string(w[s:least(s + 23, len(w))], ' ') AS chunk_text
    FROM e
    """,
)
def pipe_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (24-token windows, 8-token
    overlap) — the embedding/retrieval chunk stage. Pure sequence/slice
    expressions fused into the scan; row count grows by the chunk factor,
    bytes stay bounded by overlap/size."""
    from griddb_spark.pipeline.packing import chunk_documents

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return chunk_documents(docs, "doc_id", "text", size=24, overlap=8)


@query(
    "stream_dedup_embed",
    """
    WITH RECURSIVE u AS (
      SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, [x * 1.001 for x in embedding::DOUBLE[]]
      FROM embeddings
    ),
    c AS (SELECT vec_id, v,
            ( (v[1] >= 0)::BIGINT * 1 + (v[2] >= 0)::BIGINT * 2
            + (v[3] >= 0)::BIGINT * 4 + (v[4] >= 0)::BIGINT * 8
            + (v[5] >= 0)::BIGINT * 16 + (v[6] >= 0)::BIGINT * 32
            + (v[7] >= 0)::BIGINT * 64 + (v[8] >= 0)::BIGINT * 128) cell
          FROM u),
    p AS (SELECT vec_id, v,
            unnest([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4),
                    xor(cell, 8), xor(cell, 16), xor(cell, 32),
                    xor(cell, 64), xor(cell, 128)]) pcell
          FROM c),
    j AS (SELECT p.vec_id id_a, m.vec_id id_b
          FROM p JOIN c m ON m.cell = p.pcell AND p.vec_id < m.vec_id
          WHERE round(list_cosine_similarity(p.v, m.v), 6) >= 0.9),
    e AS (SELECT id_a a, id_b b FROM j UNION SELECT id_b, id_a FROM j),
    reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ),
    comp AS (SELECT src vec_id, least(src, min(dst)) component
             FROM reach GROUP BY src)
    SELECT u.vec_id FROM u
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.vec_id = u.vec_id AND c.component < u.vec_id)
    """,
)
def stream_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming embedding dedup (embed_dedup_stream): vectors arrive in
    three micro-batches (originals interleaved with their ×1.001 planted
    near-duplicates, id order — clusters deliberately span batch
    boundaries); each batch dedups within itself (ANN pairs → components
    → canonical) and probes the PERSISTENT sign-code-partitioned index
    for duplicates of earlier data (partition-pruned read of only the
    probed cells), then appends its survivors. The deduped corpus IS the
    index; first-seen-wins under ordered arrival equals the batch min-id
    canonical, so the recursive-closure oracle gates it."""
    import tempfile
    import uuid as _uuid

    from griddb_spark.streaming import embed_dedup_stream

    prepare(spark)
    emb = cat(spark, sf_dir).load("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = emb.unionByName(pert)
    src_dir = tempfile.mkdtemp(prefix="embdedup_src_")
    from pyspark.sql import Window as _W

    # ONE job writes all three arrival files: the rank window, the total
    # count, and the batch index are all columns of a single pass whose
    # partitionBy lands each slice in its own directory (the count +
    # localCheckpoint + per-slice filtered-write form spent 5 jobs on the
    # same bytes). Slice boundaries are the identical i·n//3 cut points.
    w = _W.orderBy(F.col("vec_id") % 100000, "vec_id")
    wn = _W.orderBy(F.lit(1)).rowsBetween(
        _W.unboundedPreceding, _W.unboundedFollowing)
    rk, nn = F.row_number().over(w), F.count(F.lit(1)).over(wn)
    bcol = (F.when(rk <= F.floor(nn / 3), 0)
            .when(rk <= F.floor(nn * 2 / 3), 1).otherwise(2))
    import glob
    import os
    import shutil
    import time as _time

    n_batches = 3
    (corpus.withColumn("__b", bcol).coalesce(1).write.mode("overwrite")
     .partitionBy("__b").parquet(f"{src_dir}/all"))
    base_t = _time.time()
    for i in range(n_batches):
        part = glob.glob(f"{src_dir}/all/__b={i}/part-*.parquet")[0]
        shutil.move(part, f"{src_dir}/{i:02d}.parquet")
        # strictly increasing mtimes pin the file-source arrival order
        # (the per-slice-write form got this implicitly from job order;
        # first-seen-wins determinism depends on it)
        os.utime(f"{src_dir}/{i:02d}.parquet",
                 (base_t - n_batches + i, base_t - n_batches + i))
    shutil.rmtree(f"{src_dir}/all")

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    index = tempfile.mkdtemp(prefix="embdedup_idx_") + "/index"
    q = embed_dedup_stream(
        stream, index, "vec_id", "embedding", threshold=0.9, sign_bits=None,
        checkpoint_dir=tempfile.mkdtemp(
            prefix=f"embdedup_ck_{_uuid.uuid4().hex[:6]}_"),
    )
    q.awaitTermination()
    # the index holds one small file per cell per batch: pass the known
    # schema (inference reads every footer) and bound the final read's
    # scan tasks at core count (same rationale as the in-stream probe
    # read — 8m maxPartitionBytes plans ~2 tiny files per task)
    return (spark.read
            .schema("vec_id long, __v array<double>, __cell int")
            .parquet(index)
            .coalesce(spark.sparkContext.defaultParallelism)
            .select("vec_id"))


@query(
    "pipe_chunk_embed_pool",
    """
    WITH p AS (SELECT vec_id % 100 AS doc,
                 generate_subscripts(embedding, 1) - 1 AS pos,
                 unnest(embedding)::DOUBLE AS v
               FROM embeddings)
    SELECT doc, pos, round(avg(v), 6) AS v FROM p GROUP BY doc, pos
    """,
)
def pipe_chunk_embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk→document embedding pooling (mean_pool_vectors): element-wise
    mean of each group's vectors via posexplode + (group, pos) partial
    averages — the reduce width is groups×dim, never a per-group vector
    list on one reducer. Here chunks group by vec_id % 100 (the doc-key
    stand-in). Gated in long format (doc, pos, v) — scalar columns only,
    so the driver's pandas canonicalizer can hash it; ``assemble=True``
    yields the array-typed production shape."""
    from griddb_spark.pipeline import mean_pool_vectors

    emb = cat(spark, sf_dir).load("embeddings").select(
        (F.col("vec_id") % 100).alias("doc"), "embedding"
    )
    return mean_pool_vectors(emb, "doc", "embedding", "pooled", round_to=6,
                             assemble=False)


@query(
    "pipe_mix_temperature",
    """
    WITH t AS (SELECT doc_id, source, n_chars FROM documents),
    tot AS (SELECT source, sum(n_chars)::DOUBLE AS tt FROM t GROUP BY source),
    g AS (SELECT sum(tt) AS gg FROM tot),
    w AS (SELECT source, pow(tt / g.gg, 0.7 - 1.0) AS w FROM tot, g),
    wm AS (SELECT max(w) AS wm FROM w),
    r AS (SELECT source, least(1.0, w / wm.wm) AS rate FROM w, wm)
    SELECT t.source, count(*) AS n_docs, sum(n_chars)::BIGINT AS kept_chars
    FROM t JOIN r USING (source)
    WHERE ('0x'||substr(md5(cast(doc_id AS varchar)),1,8))::BIGINT % 10000
          < floor(rate * 10000)
    GROUP BY t.source
    """,
)
def pipe_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (τ=0.7 — the multilingual
    re-balancing rule): per-source weight share^(τ-1), scaled so the
    most over-represented source thins the most and nothing upsamples;
    data-driven rates + content-hash keep decision (append-stable). The
    oracle replays the power/rate arithmetic and the md5 buckets."""
    from griddb_spark.pipeline import temperature_mix

    docs = cat(spark, sf_dir).load("documents").select(
        "doc_id", "source", "n_chars"
    )
    kept = temperature_mix(docs, "doc_id", "source", "n_chars",
                           temperature=0.7)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("kept_chars"),
    )


@query(
    "pipe_dsir_select",
    r"""
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split_regex(trim(text), '\s+')) AS t
      FROM documents),
    feat AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(t), 1, 8))::BIGINT % 512 AS b
      FROM tok WHERE t <> ''),
    counts AS (
      SELECT b, count(*) AS rc,
             sum(CASE WHEN source = 'src18' THEN 1 ELSE 0 END) AS tc
      FROM feat GROUP BY b),
    w AS (
      SELECT b,
             CAST(round(
               ln((tc + 1) / CAST(sum(tc) OVER () + 512 AS DOUBLE))
             - ln((rc + 1) / CAST(sum(rc) OVER () + 512 AS DOUBLE)), 6)
             AS DECIMAL(18,6)) AS lw
      FROM counts)
    SELECT doc_id, CAST(sum(lw) AS DOUBLE) AS dsir_score
    FROM feat JOIN w USING (b)
    GROUP BY doc_id
    ORDER BY dsir_score DESC, doc_id
    LIMIT 100
    """,
)
def pipe_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, pipeline/sampling.py): rank
    the corpus by importance of its hashed-unigram bag under a target
    distribution (here the 'src18' domain) vs the raw distribution, keep
    the top 100. Bucket log-ratios are rounded once and fixed as
    DECIMAL(18,6) so the per-doc sums are exact and order-independent;
    the weight table (512 rows) broadcasts; the only data-sized shuffle
    is the per-doc sum; top-k is TakeOrdered. The oracle replays the
    identical bucket hash (md5 hex digits) and smoothing arithmetic."""
    from griddb_spark.pipeline import dsir_select

    docs = cat(spark, sf_dir).load("documents")
    return dsir_select(
        docs, "doc_id", "text", F.col("source") == "src18", k=100
    )


@query(
    "pipe_sample_fixed_k",
    """
    WITH r AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5(cast(doc_id AS varchar)), doc_id) AS rk
               FROM documents)
    SELECT source, count(*) AS n, sum(n_chars)::BIGINT AS sum_chars,
           min(doc_id) AS min_id
    FROM r WHERE rk <= 25 GROUP BY source
    """,
)
def pipe_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (the reproducible
    reservoir): rank by content hash within each source, keep the top
    25 — identical across runs/partitionings/engines, append-stable
    evictions. One hash shuffle + window rank."""
    from griddb_spark.pipeline import stratified_fixed_k

    docs = cat(spark, sf_dir).load("documents")
    kept = stratified_fixed_k(docs, "doc_id", "source", k=25)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
    )


@query(
    "pipe_mix_budget",
    """
    WITH t AS (SELECT doc_id, source,
                 len(string_split_regex(trim(text), '\\s+')) AS n_tokens
               FROM documents),
    tot AS (SELECT source, sum(n_tokens) AS tot FROM t GROUP BY source),
    r AS (SELECT source, least(1.0, 1000.0 / tot) AS rate FROM tot)
    SELECT t.source, count(*) AS n_docs, sum(n_tokens)::BIGINT AS kept_tokens
    FROM t JOIN r USING (source)
    WHERE ('0x'||substr(md5(cast(doc_id AS varchar)),1,8))::BIGINT % 10000
          < floor(rate * 10000)
    GROUP BY t.source
    """,
)
def pipe_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing to a per-source token budget: data-driven keep rates
    (one combinable sum per source, broadcast back) + the content-hash
    keep decision — downsamples oversized sources toward 1000 tokens,
    passes undersized ones through, never resamples history on append."""
    from griddb_spark.pipeline.packing import token_count
    from griddb_spark.pipeline.sampling import mix_to_token_budget

    docs = cat(spark, sf_dir).load("documents").select(
        "doc_id", "source", token_count("text").alias("n_tokens")
    )
    kept = mix_to_token_budget(docs, "doc_id", "source", "n_tokens", 1000)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("kept_tokens"),
    )


@query(
    "pipe_bpe_pairs",
    """
    WITH w AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS wd
               FROM documents),
    p AS (SELECT unnest([substr(wd, i, 2) for i in range(1, length(wd))]) AS pair
          FROM w WHERE length(wd) >= 2)
    SELECT pair, count(*) AS n FROM p
    GROUP BY pair ORDER BY n DESC, pair ASC LIMIT 20
    """,
)
def pipe_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training scoring step: corpus-wide adjacent
    character-pair counts, top 20 under a total deterministic order — one
    combinable aggregation per merge iteration at any corpus size."""
    from griddb_spark.pipeline.packing import bpe_pair_counts

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    return bpe_pair_counts(docs, "text", top_k=20)


def _bpe_train_oracle(n_merges: int) -> str:
    """DuckDB replay of the BPE merge-learning loop, unrolled.

    The greedy left-to-right merge application is expressed as string
    ``replace`` over a chr(31)-joined symbol string — ``replace`` scans
    left-to-right over non-overlapping occurrences, which is exactly the
    fold semantics of ``bpe_train``'s JVM array aggregate — so the whole
    iterative algorithm value-hash-gates instead of rows-only."""
    sep = "chr(31)"
    parts = [
        """WITH w AS (SELECT unnest(string_split_regex(trim(text), '\\s+'))
           AS wd FROM documents),
    v0 AS (SELECT count(*) AS freq,
             array_to_string([wd[i] for i in range(1, length(wd)+1)],
                             chr(31)) AS symstr
           FROM w WHERE length(wd) > 0 GROUP BY wd)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(f"""
    p{i} AS (SELECT u.l AS l, u.r AS r, sum(freq) AS n FROM (
        SELECT freq, unnest([{{'l': s[j], 'r': s[j+1]}}
                             for j in range(1, len(s))]) AS u
        FROM (SELECT freq, string_split(symstr, {sep}) AS s FROM v{i - 1})
      ) GROUP BY u.l, u.r),
    b{i} AS (SELECT l, r, n FROM p{i} ORDER BY n DESC, l, r LIMIT 1),
    v{i} AS (SELECT freq,
        replace(symstr,
                (SELECT l FROM b{i}) || {sep} || (SELECT r FROM b{i}),
                (SELECT l FROM b{i}) || (SELECT r FROM b{i})) AS symstr
      FROM v{i - 1})""")
    union = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, l AS left, r AS right, "
        f"l || r AS merged, CAST(n AS BIGINT) AS freq FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return ",".join(parts) + "\nSELECT * FROM (\n" + union + ")"


@query("pipe_bpe_train", _bpe_train_oracle(5))
def pipe_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING (the full merge-learning loop —
    pipe_bpe_pairs is its single scoring step): 5 merge rounds over the
    corpus. The iterated state is the word-frequency vocab (bounded by
    vocabulary, not corpus); each round is one combinable pair-count
    groupBy + a 1-row argmax + a JVM array-fold merge, checkpointed so
    the plan never grows. The oracle replays all 5 rounds unrolled in
    SQL (greedy merge = left-to-right string replace)."""
    from griddb_spark.pipeline.packing import bpe_train

    docs = cat(spark, sf_dir).load("documents")
    return bpe_train(docs, "text", n_merges=5)


@query(
    "pipe_quality_threshold",
    """
    WITH t AS (SELECT doc_id, source, text,
                 string_split_regex(trim(text), '\\s+') w
               FROM documents),
    q AS (SELECT doc_id, source,
            least(length(text)::double / 500.0, 1.0) * 0.25
            + (1.0 - round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '',
              'g'))::double / length(text), 6)) * 0.5
            + least(round(len(list_filter(w, x -> x in ('the','a','an','of',
              'and','or','is','to','in','on')))::double / len(w), 6) * 5.0,
              1.0) * 0.25 AS score
          FROM t),
    f AS (SELECT source, score,
            quantile_cont(score, 0.25) OVER (PARTITION BY source) AS thr
          FROM q)
    SELECT source, count(*) AS n_docs,
           sum(CASE WHEN score < thr THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
           round(min(thr), 6) AS p25_threshold
    FROM f GROUP BY source
    """,
)
def pipe_quality_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality cut: drop the bottom quartile of the composite
    quality score WITHIN each source (a global threshold would wipe out
    whole domains). Exact per-stratum percentile via one window pass;
    reports per-source doc counts, drops, and the p25 threshold."""
    from griddb_spark.pipeline import quality_stats
    from griddb_spark.pipeline.quality import quality_threshold_flag

    docs = cat(spark, sf_dir).load("documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    scored = docs.select(
        "doc_id", "source", quality_stats("text")["quality_score"].alias("score")
    )
    flagged = quality_threshold_flag(scored, "score", "source", 0.25)
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("below").cast("long")).alias("n_dropped"),
        _r6(F.min("__threshold")).alias("p25_threshold"),
    )


@query(
    "pipe_write_shards",
    """
    SELECT (('0x'||substr(md5(cast(doc_id AS varchar)),1,8))::BIGINT
            % 10000) % 8 AS shard,
           count(*) AS n_rows
    FROM documents GROUP BY shard
    """,
)
def pipe_write_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final shard writer: the corpus lands in 8 content-hash shards (one
    clustered shuffle, one file per shard, maxRecordsPerFile-bounded) and
    the returned manifest — re-read from disk, so the write itself is
    verified — matches the oracle's per-shard counts."""
    import tempfile

    from griddb_spark.pipeline.sampling import write_training_shards

    docs = cat(spark, sf_dir).load("documents")
    out = tempfile.mkdtemp(prefix="shards_") + "/docs"
    return write_training_shards(
        docs, out, "doc_id", n_shards=8, max_records_per_file=100_000
    )


@query(
    "pipe_dedup_incremental",
    _DUCK_SHINGLES
    + """,
    j as (select n.doc_id new_id, o.doc_id old_id,
                 round(len(list_intersect(n.sh, o.sh))::double
                       / len(list_distinct(list_concat(n.sh, o.sh))), 6) jaccard
          from shingle n join shingle o
            on n.doc_id % 5 = 0 and o.doc_id % 5 != 0)
    SELECT new_id, old_id, jaccard FROM j WHERE jaccard >= 0.8
    """,
)
def pipe_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: the corpus (doc_id % 5 != 0) is indexed
    once (banded MinHash signatures — the persisted artifact between
    batches); the new batch (doc_id % 5 == 0) probes only colliding
    (band, bkey) buckets and exact-verifies. Per-batch cost tracks the
    batch, not history; oracle = brute-force cross-slice Jaccard."""
    from griddb_spark.pipeline.dedup import incremental_minhash_pairs, lsh_index

    docs = cat(spark, sf_dir).load("documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    banded, sh = lsh_index(old, "doc_id", "text")
    return incremental_minhash_pairs(new, banded, sh, "doc_id", "text",
                                     threshold=0.8)


@query(
    "nosql_fetch_all",
    """
    SELECT * FROM (
      SELECT 'customer' AS src, c_custkey AS id, c_name AS name
      FROM customer WHERE c_nationkey = 3 AND c_acctbal > 1000.0
      ORDER BY c_custkey LIMIT 25)
    UNION ALL
    SELECT * FROM (
      SELECT 'supplier' AS src, s_suppkey AS id, s_name AS name
      FROM supplier WHERE s_nationkey = 3
      ORDER BY s_suppkey LIMIT 25)
    """,
)
def nosql_fetch_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridStore.fetchAll (SampleFetchAll.java; GET_MULTIPLE_CONTAINER_ROWS,
    cluster_event_type.h:135-196): one batch of TQL statements over two
    containers, results tagged and unioned. Both member queries stay lazy
    until the union executes, so the batch is one Spark job — the analog of
    the reference shipping all statements in a single client request."""
    from griddb_spark.container import GridStore

    store = GridStore(spark, sf_dir)
    cust, supp = store.fetch_all(
        [
            (
                "customer",
                "SELECT c_custkey, c_name WHERE c_nationkey = 3 "
                "AND c_acctbal > 1000.0 ORDER BY c_custkey LIMIT 25",
            ),
            (
                "supplier",
                "SELECT s_suppkey, s_name WHERE s_nationkey = 3 "
                "ORDER BY s_suppkey LIMIT 25",
            ),
        ],
        tag_col="src",
    )
    return cust.toDF("src", "id", "name").unionAll(
        supp.toDF("src", "id", "name"))


@query(
    "nosql_multiput",
    """
    SELECT 'customer' AS src, c_custkey AS id,
           round(CASE WHEN c_custkey <= 4 THEN c_acctbal + 1000.25
                      ELSE c_acctbal END, 6) AS bal
    FROM customer WHERE c_custkey <= 6
    UNION ALL
    SELECT 'supplier' AS src, s_suppkey AS id, round(s_acctbal, 6) AS bal
    FROM supplier WHERE s_suppkey <= 2
    UNION ALL
    SELECT 'supplier' AS src, 99991 AS id, 123.5 AS bal
    """,
)
def nosql_multiput(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GridStore.multiPut (SampleMultiPut.java; PUT_MULTIPLE_CONTAINER_ROWS):
    one batch mutates two keyed containers — an acctbal update on customers
    1-4 (insert-or-update hits existing keys) and a brand-new supplier row
    (insert path). The upsert is the batch-scale last-write-wins window
    over the key (container.py put); the oracle simulates it with CASE +
    UNION over the base tables."""
    from griddb_spark.container import GridStore

    c = cat(spark, sf_dir)
    store = GridStore(spark, sf_dir)
    cust = store.put_container("customer", c.load("customer"),
                               row_key="c_custkey")
    supp = store.put_container("supplier", c.load("supplier"),
                               row_key="s_suppkey")
    updated = (
        cust.df.filter(F.col("c_custkey") <= 4)
        .withColumn("c_acctbal", F.col("c_acctbal") + F.lit(1000.25))
    )
    new_supplier = (
        supp.df.filter(F.col("s_suppkey") == 1)
        .withColumn("s_suppkey", F.lit(99991).cast("long"))
        .withColumn("s_acctbal", F.lit(123.5))
    )
    store.multi_put({"customer": updated, "supplier": new_supplier})
    a = (
        store.get_container("customer").df
        .filter(F.col("c_custkey") <= 6)
        .select(
            F.lit("customer").alias("src"),
            F.col("c_custkey").alias("id"),
            _r6(F.col("c_acctbal")).alias("bal"),
        )
    )
    b = (
        store.get_container("supplier").df
        .filter((F.col("s_suppkey") <= 2) | (F.col("s_suppkey") == 99991))
        .select(
            F.lit("supplier").alias("src"),
            F.col("s_suppkey").alias("id"),
            _r6(F.col("s_acctbal")).alias("bal"),
        )
    )
    return a.unionAll(b)


@query(
    "pipe_sketch_distinct",
    """
    WITH reg AS (
      SELECT event_type,
             (((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296)::BIGINT % 4096 AS r
      FROM events),
    hits AS (
      SELECT event_type, count(DISTINCT r) AS n_registers
      FROM reg GROUP BY event_type)
    SELECT h.event_type, h.n_registers,
           CASE WHEN h.n_registers < 4096
                THEN round(-4096.0 * ln(1 - h.n_registers / 4096.0), 6)
           END AS est_distinct,
           e.n_exact
    FROM hits h
    JOIN (SELECT event_type, count(DISTINCT user_id) AS n_exact
          FROM events GROUP BY event_type) e
      ON h.event_type = e.event_type
    """,
)
def pipe_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count sketch (linear counting, pipeline/sketches.py): per
    event_type, users hash into 4096 registers; the estimate comes from the
    register hit-rate. The shuffle is bounded by 4096 rows per group no
    matter the user cardinality — the 100 TB shape for profiling distincts.
    The exact count rides along (its own agg, broadcast-joined) so the
    result exhibits estimate-vs-truth; the oracle replays the identical
    register arithmetic (deterministic Knuth hash, portable SQL)."""
    from griddb_spark.pipeline.sketches import linear_counting_distinct

    ev = cat(spark, sf_dir).load("events")
    sk = linear_counting_distinct(ev, ["event_type"], "user_id", m=4096)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"))
    return sk.join(F.broadcast(exact), "event_type")


from griddb_spark.pipeline.sketches import hll_oracle_sql as _hll_sql


@query(
    "pipe_sketch_hll",
    f"""
    WITH est AS ({_hll_sql("events", ["event_type"], "event_id", p=8)})
    SELECT est.event_type, est.n_registers, est.est_distinct, e.n_exact
    FROM est
    JOIN (SELECT event_type, count(DISTINCT event_id) AS n_exact
          FROM events GROUP BY event_type) e
      ON est.event_type = e.event_type
    """,
)
def pipe_sketch_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct sketch (pipeline/sketches.py): per event_type,
    event ids stream into 256 registers whose max leading-zero rank yields
    the Flajolet estimator. Unlike linear counting (whose register budget
    must track cardinality) the state here is CONSTANT — 256 rows per group
    through the exchange at any corpus size, merging by register-max — the
    true 100 TB distinct-count shape. The oracle replays the identical
    register math (Knuth hash + bin()-length rank + exact power-of-two
    sums, all IEEE-exact); the exact count rides along for
    estimate-vs-truth."""
    from griddb_spark.pipeline.sketches import hll_distinct

    ev = cat(spark, sf_dir).load("events")
    sk = hll_distinct(ev, ["event_type"], "event_id", p=8)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("event_id").alias("n_exact"))
    return sk.join(F.broadcast(exact), "event_type")


@query(
    "pipe_sketch_quantile",
    """
    WITH b AS (
      SELECT event_type,
             least(255, greatest(0, CAST(floor(value / 2.0) AS INT))) AS bucket
      FROM events),
    c AS (SELECT event_type, bucket, count(*) AS n FROM b GROUP BY 1, 2),
    cum AS (SELECT event_type, bucket,
                   CAST(sum(n) OVER (PARTITION BY event_type
                                     ORDER BY bucket) AS BIGINT) AS cum,
                   CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
            FROM c)
    SELECT event_type, max(tot) AS n_rows,
           round(min(CASE WHEN cum >= 0.5 * tot
                          THEN (bucket + 1) * 2.0 END), 6)::DOUBLE AS q_50,
           round(min(CASE WHEN cum >= 0.95 * tot
                          THEN (bucket + 1) * 2.0 END), 6)::DOUBLE AS q_95
    FROM cum GROUP BY event_type
    """,
)
def pipe_sketch_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (fixed-width histogram, pipeline/sketches.py): the
    portable-SQL member of the t-digest/KLL family — per-group state capped
    at 256 bucket counts, partials merge by addition, estimate error ≤ one
    bucket width. Bucket width 2.0 (a power of two) makes bucket assignment
    exact halving — bit-identical across engines."""
    from griddb_spark.pipeline.sketches import histogram_quantile

    ev = cat(spark, sf_dir).load("events")
    return histogram_quantile(
        ev, ["event_type"], "value", [0.5, 0.95],
        lo=0.0, hi=512.0, n_buckets=256)


@query(
    "pipe_dedup_canonical_best",
    _DUCK_COMPONENTS
    + """,
    comp as (select src doc_id, least(src, min(dst)) component
             from reach group by src),
    members as (select c.doc_id, c.component, d.n_chars
                from comp c join documents d using (doc_id)),
    ranked as (select doc_id,
                      row_number() OVER (PARTITION BY component
                                         ORDER BY n_chars DESC, doc_id) rn
               from members)
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM ranked r
                      WHERE r.doc_id = d.doc_id AND r.rn > 1)
    """,
)
def pipe_dedup_canonical_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup removal (canonical_best, pipeline/dedup.py):
    within each dedup cluster keep the member with the most characters
    (ties → smaller id) instead of the arbitrary min-id — the real-world
    policy is "keep the cleanest duplicate". Cluster argmax is a window
    over the (tiny) membership table; the corpus is one scan + broadcast
    anti-join."""
    from griddb_spark.pipeline import minhash_lsh_pairs
    from griddb_spark.pipeline.dedup import canonical_best, connected_components

    docs = cat(spark, sf_dir).load("documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    comp = connected_components(pairs)
    return canonical_best(docs, comp, "n_chars").select("doc_id")


@query(
    "pipe_classifier_score",
    """
    SELECT vec_id, label,
           round(1.0 / (1.0 + exp(-(list_sum(
             [CAST(embedding[i] AS DOUBLE) * ((((i * 37) % 21) - 10) / 10.0)
              for i in generate_series(1, 64)]) + 0.1))), 6) AS score
    FROM embeddings
    """,
)
def pipe_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus filtering: linear-probe (logistic head) inference
    over the embedding column (linear_probe_score, pipeline/similarity.py).
    The weight vector is a broadcast array literal, the dot product an
    element-order left fold — one narrow no-shuffle projection that scales
    with the scan; the oracle replays the identical arithmetic with a SQL
    list comprehension. Weights here are a fixed deterministic ramp (the
    stand-in for offline-trained coefficients)."""
    from griddb_spark.pipeline.similarity import linear_probe_score

    weights = [((i * 37) % 21 - 10) / 10.0 for i in range(1, 65)]
    emb = cat(spark, sf_dir).load("embeddings")
    return linear_probe_score(emb, "embedding", weights, bias=0.1).select(
        "vec_id", "label", "score")


@query(
    "pipe_classifier_train",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
                      CAST(vec_id % 2 AS DOUBLE) AS y FROM embeddings),
    nn AS (SELECT count(*)::DOUBLE AS n FROM v),
    -- iteration 1: w = 0, b = 0 -> z = 0 -> p = 0.5 exactly
    c1 AS (SELECT 0 AS pos, round(0.5 - y, 6)::DECIMAL(18,6) AS c FROM v
           UNION ALL
           SELECT generate_subscripts(ev, 1) AS pos,
                  round(unnest(ev) * (0.5 - y), 6)::DECIMAL(18,6) AS c
           FROM v),
    g1 AS (SELECT pos, sum(c) AS g FROM c1 GROUP BY pos),
    u1 AS (SELECT pos, round(0 - (0.1 * g::DOUBLE) / nn.n, 6) AS w
           FROM g1, nn),
    w1 AS (SELECT list(w ORDER BY pos) AS wl
           FROM u1 WHERE pos >= 1),
    b1 AS (SELECT w AS b FROM u1 WHERE pos = 0),
    -- iteration 2
    r2 AS (SELECT vec_id, ev, y,
             round(1.0 / (1.0 + exp(-(list_dot_product(ev, w1.wl) + b1.b))),
                   6) - y AS resid
           FROM v, w1, b1),
    c2 AS (SELECT 0 AS pos, round(resid, 6)::DECIMAL(18,6) AS c FROM r2
           UNION ALL
           SELECT generate_subscripts(ev, 1) AS pos,
                  round(unnest(ev) * resid, 6)::DECIMAL(18,6) AS c
           FROM r2),
    g2 AS (SELECT pos, sum(c) AS g FROM c2 GROUP BY pos),
    u2 AS (SELECT u1.pos,
             round(u1.w - (0.1 * g2.g::DOUBLE) / nn.n, 6) AS w
           FROM u1 JOIN g2 ON u1.pos = g2.pos, nn)
    SELECT CAST(pos - 1 AS INT) AS pos, w AS weight FROM u2
    """,
)
def pipe_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed TRAINING of the linear quality-filter head
    (logreg_train, pipeline/similarity.py) — the other half of
    pipe_classifier_score's workflow: full-batch logistic GD, one
    map-side-combinable (position, contribution) shuffle + a dim+1-scalar
    driver collect per iteration. Per-row gradient contributions are
    6dp-fixed DECIMAL so the sums are order-independent, the dot product
    is the element-order fold shared with DuckDB's list_dot_product, and
    weight updates round HALF_UP — so the oracle replays both GD
    iterations bit-for-bit. Labels derive from the data (vec_id parity)
    to keep the gate deterministic."""
    from griddb_spark.pipeline.similarity import logreg_train

    emb = cat(spark, sf_dir).load("embeddings").select(
        "embedding", (F.col("vec_id") % 2).alias("y")
    )
    res = logreg_train(emb, "embedding", "y", iters=2, lr=0.1)
    return spark.createDataFrame(res, "pos int, weight double")


@query(
    "stream_distinct_sketch",
    """
    WITH reg AS (
      SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS ts,
             (((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296)::BIGINT % 1024 AS r
      FROM events),
    hits AS (SELECT ts, count(DISTINCT r) AS n_registers FROM reg GROUP BY ts)
    SELECT ts, n_registers,
           CASE WHEN n_registers < 1024
                THEN round(-1024.0 * ln(1 - n_registers / 1024.0), 6)
           END AS est_distinct
    FROM hits
    """,
)
def stream_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed cardinality profiling: per-hour distinct-user
    sketch over the events stream (distinct_sketch_stream). State per open
    window is the ≤1024-register hit set — bounded regardless of user
    cardinality, watermark-retired; the oracle replays the identical
    register math over the batch table (hour windows anchor at the epoch
    in both engines)."""
    import uuid as _uuid

    from griddb_spark.streaming import distinct_sketch_stream, run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = distinct_sketch_stream(ev, "ts", "user_id", 1, "HOUR", m=1024,
                                 watermark="10 minutes")
    return run_to_memory(out, f"lds_{_uuid.uuid4().hex[:8]}", mode="complete",
                         shuffle_partitions=8)


@query(
    "pipe_dedup_spans",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
               FROM documents),
    sp0 AS (SELECT doc_id,
              [{'i': i - 1,
                's': array_to_string(w[(i-1)*3+1 : (i-1)*3+3], ' ')}
               FOR i IN range(1, greatest(ceil(len(w)/3.0)::int, 1) + 1)] spans
            FROM t),
    sp AS (SELECT doc_id, u.i AS span_idx, u.s AS span
           FROM (SELECT doc_id, unnest(spans) u FROM sp0)),
    rk AS (SELECT doc_id, span_idx, span,
                  row_number() OVER (PARTITION BY span
                                     ORDER BY doc_id, span_idx) rn
           FROM sp)
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' '
                               ORDER BY span_idx), '') AS clean_text,
           count(*) AS n_spans,
           sum((rn > 1)::int)::BIGINT AS n_removed
    FROM rk GROUP BY doc_id
    """,
)
def pipe_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-passage removal (span_dedup, pipeline/dedup.py):
    global first-occurrence dedup of non-overlapping 3-token spans — the
    Lee-et-al-style exact-substring hygiene pass. Every later occurrence
    of a repeated span is cut and documents are reassembled from their
    surviving spans; the oracle replays the identical spanning + global
    rank in SQL."""
    from griddb_spark.pipeline import span_dedup

    docs = cat(spark, sf_dir).load("documents")
    return span_dedup(docs, "doc_id", "text", k=3)


@query(
    "pipe_sketch_cms",
    """
    WITH h AS (SELECT ((user_id % 2147483648) * 2654435761) % 4294967296 h1,
                      ((user_id % 2147483648) * 2246822519) % 4294967296 h2
               FROM events),
    reg AS (SELECT r.range AS d,
                   (h1 + r.range * (h2 - (h2 % 2) + 1)) % 512 AS pos,
                   count(*) AS cnt
            FROM h, range(0, 4) r GROUP BY 1, 2),
    q AS (SELECT i.range AS user_id,
                 ((i.range % 2147483648) * 2654435761) % 4294967296 h1,
                 ((i.range % 2147483648) * 2246822519) % 4294967296 h2
          FROM range(0, 20) i),
    qp AS (SELECT user_id, r.range AS d,
                  (h1 + r.range * (h2 - (h2 % 2) + 1)) % 512 AS pos
           FROM q, range(0, 4) r)
    SELECT user_id, min(coalesce(cnt, 0)) AS est_count
    FROM qp LEFT JOIN reg USING (d, pos)
    GROUP BY user_id
    """,
)
def pipe_sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation (cms_build / cms_estimate,
    pipeline/sketches.py): a 4x512-counter sketch of event counts per user
    answers point frequency queries for 20 probe users without an exact
    per-key groupBy — the sketch exchange is capped at depth*width
    counters regardless of user cardinality, and the probe side joins the
    broadcast sketch. Deterministic Kirsch-Mitzenmacher double hashing so
    the oracle replays the identical register arithmetic."""
    from griddb_spark.pipeline import cms_build, cms_estimate

    ev = cat(spark, sf_dir).load("events")
    sketch = cms_build(ev, "user_id", depth=4, width=512)
    keys = spark.range(0, 20).select(F.col("id").alias("user_id"))
    return cms_estimate(sketch, keys, "user_id", depth=4, width=512)


@query(
    "pipe_decontam_bloom",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
               FROM documents),
    g AS (SELECT doc_id,
            list_distinct([array_to_string(w[i:i+2], ' ')
                           FOR i IN range(1, greatest(len(w)-2, 0)+1)]) sh
          FROM t),
    keyed AS (SELECT DISTINCT doc_id,
                     ('0x' || substr(md5(unnest.g), 1, 8))::BIGINT gk
              FROM (SELECT doc_id, unnest(sh) AS g FROM g) unnest),
    hh AS (SELECT doc_id, gk,
                  ((gk % 2147483648) * 2654435761) % 4294967296 h1,
                  ((gk % 2147483648) * 2246822519) % 4294967296 h2
           FROM keyed),
    pos AS (SELECT doc_id, gk, r.range AS j,
                   (h1 + r.range * (h2 - (h2 % 2) + 1)) % 4096 AS pos
            FROM hh, range(0, 3) r),
    bset AS (SELECT DISTINCT pos FROM pos WHERE doc_id % 41 = 0),
    hitg AS (SELECT doc_id, gk
             FROM (SELECT DISTINCT doc_id, gk, j, pos
                   FROM pos WHERE doc_id % 41 <> 0) c
             JOIN bset USING (pos)
             GROUP BY doc_id, gk HAVING count(DISTINCT j) = 3)
    SELECT doc_id, count(*) AS hits
    FROM hitg GROUP BY doc_id HAVING count(*) >= 2
    """,
)
def pipe_decontam_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination (bloom_contamination,
    pipeline/decontaminate.py): same contamination semantics as
    pipe_decontaminate but the broadcast side is a fixed 4096-bit bloom
    bit-set over the benchmark 3-grams, so executor-resident state stays
    bounded however large the eval suite grows (false positives included
    by design at this m; the oracle replays the identical md5-keyed
    double-hash bit math, so both engines agree bit-for-bit)."""
    from griddb_spark.pipeline import bloom_contamination

    docs = cat(spark, sf_dir).load("documents")
    bench = docs.filter(F.col("doc_id") % 41 == 0)
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    return bloom_contamination(corpus, bench, "doc_id", "text",
                               n=3, min_hits=2, m=4096, k=3)


@query(
    "stream_freq_sketch",
    """
    WITH e AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) ts,
                      ((user_id % 2147483648) * 2654435761) % 4294967296 h1,
                      ((user_id % 2147483648) * 2246822519) % 4294967296 h2
               FROM events),
    reg AS (SELECT ts, r.range AS d,
                   (h1 + r.range * (h2 - (h2 % 2) + 1)) % 512 AS pos,
                   count(*) AS cnt
            FROM e, range(0, 4) r GROUP BY 1, 2, 3),
    q AS (SELECT i.range AS user_id,
                 ((i.range % 2147483648) * 2654435761) % 4294967296 h1,
                 ((i.range % 2147483648) * 2246822519) % 4294967296 h2
          FROM range(0, 20) i),
    qp AS (SELECT user_id, r.range AS d,
                  (h1 + r.range * (h2 - (h2 % 2) + 1)) % 512 AS pos
           FROM q, range(0, 4) r),
    grid AS (SELECT w.ts, qp.user_id, qp.d, qp.pos
             FROM (SELECT DISTINCT ts FROM reg) w CROSS JOIN qp)
    SELECT ts, user_id, min(coalesce(cnt, 0)) AS est_count
    FROM grid LEFT JOIN reg USING (ts, d, pos)
    GROUP BY ts, user_id
    """,
)
def stream_freq_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed frequency sketch: per-hour count-min registers
    over the event stream (freq_sketch_stream) — state per open window is
    the depth*width counter grid regardless of user cardinality — then
    batch-side point probes for 20 users against the materialized sketch
    (the cms_estimate read path). The oracle replays the identical
    double-hash register arithmetic over the batch table."""
    import uuid as _uuid

    prepare(spark)
    from griddb_spark.streaming import freq_sketch_stream, run_to_memory

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = freq_sketch_stream(ev, "ts", "user_id", 1, "HOUR",
                             depth=4, width=512, watermark="10 minutes")
    regs = run_to_memory(out, f"cms_{_uuid.uuid4().hex[:8]}",
                         mode="complete", shuffle_partitions=8)
    probes = spark.range(0, 20).select(F.col("id").alias("user_id"))
    from griddb_spark.pipeline.sketches import _double_hash_pos

    qp = probes.select(
        "user_id",
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     _double_hash_pos("user_id", d, 512).alias("pos"))
            for d in range(4)
        ])).alias("__p"),
    ).select("user_id", F.col("__p.d").alias("d"), F.col("__p.pos").alias("pos"))
    # Broadcast the PROBES into the sketch, not the sketch into the
    # grid (guide §3.1: broadcast the side that fits): the materialized
    # sketch is ~300k register rows at sf0.1 — building a broadcast hash
    # relation of it on the driver was the gate's dominant tail — while
    # qp is 80 literal rows selecting ~4% of registers. est_count =
    # min_d coalesce(cnt_d, 0) is 0 whenever ANY of the 4 probed
    # registers is absent (cnt >= 1 for present ones), so an inner join
    # + present-register count is value-identical to the old
    # left-join-then-min over the full grid; (ts, user) pairs with no
    # hit at all re-enter via the tiny distinct-ts x probes grid.
    hits = (
        regs.join(F.broadcast(qp), ["d", "pos"])
        .groupBy("ts", "user_id")
        .agg(F.count(F.lit(1)).alias("__nh"), F.min("cnt").alias("__mc"))
    )
    # re-alias: grid also derives from regs, and a raw self-join of the
    # memory-sink table trips conflicting references
    hits = hits.select(
        F.col("ts").alias("__hts"), F.col("user_id").alias("__huid"),
        "__nh", "__mc",
    )
    return (
        regs.select("ts").distinct().crossJoin(F.broadcast(probes))
        .join(
            F.broadcast(hits),
            (F.col("ts") == F.col("__hts"))
            & (F.col("user_id") == F.col("__huid")),
            "left",
        )
        .select(
            "ts", "user_id",
            F.when(F.col("__nh") == 4, F.col("__mc"))
            .otherwise(F.lit(0)).cast("long").alias("est_count"),
        )
    )


@query(
    "window_range_frames",
    """
    WITH e AS (SELECT user_id, ts, value, epoch_us(ts) AS us
               FROM events WHERE user_id < 5)
    SELECT user_id, ts,
           round(avg(value) OVER w10, 6) AS mov_avg,
           count(*) OVER w10 AS mov_n,
           round(min(value) OVER w10, 6) AS mov_min,
           round(max(value) OVER w10, 6) AS mov_max,
           round(sum(value) OVER w10, 6) AS mov_sum,
           round(coalesce(sum(value) OVER w10, 0.0), 6) AS mov_total,
           CASE WHEN count(*) OVER w10 > 1 THEN
             round(stddev_samp(value) OVER w10, 4) END AS mov_sd,
           CASE WHEN count(*) OVER w10 > 1 THEN
             round(var_samp(value) OVER w10, 4) END AS mov_var
    FROM e
    WINDOW w10 AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_range_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_WINDOW_FRAME with RANGE frames (GridDB 5.8: FRAME-clause with
    ``RANGE BETWEEN (10, MINUTE) PRECEDING AND CURRENT ROW`` for the
    moving-average family AVG/COUNT/MAX/MIN/SUM/TOTAL/STDDEV/VAR —
    GridDB-5.8-CE-RELEASE_NOTES.md). Spark's rangeBetween needs a numeric
    ordering, so the time boundary becomes epoch-µs offsets — identical
    semantics to the reference's (value, unit) boundary. STDDEV/VAR are
    guarded to >1-row frames (engines disagree on n=1: NULL vs 0.0)."""
    from pyspark.sql import Window

    ev = (
        cat(spark, sf_dir).load("events")
        .filter(F.col("user_id") < 5)
        .withColumn("us", F.unix_micros(F.col("ts")))
    )
    w10 = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    n = F.count(F.lit(1)).over(w10)
    sd = F.when(n > 1, F.round(F.stddev_samp("value").over(w10), 4))
    vr = F.when(n > 1, F.round(F.var_samp("value").over(w10), 4))
    return ev.select(
        "user_id", "ts",
        _r6(F.avg("value").over(w10)).alias("mov_avg"),
        n.alias("mov_n"),
        _r6(F.min("value").over(w10)).alias("mov_min"),
        _r6(F.max("value").over(w10)).alias("mov_max"),
        _r6(F.sum("value").over(w10)).alias("mov_sum"),
        _r6(F.coalesce(F.sum("value").over(w10), F.lit(0.0))).alias("mov_total"),
        sd.alias("mov_sd"),
        vr.alias("mov_var"),
    )


@query("meta_statement_resources")  # no oracle: live resource stats
def meta_statement_resources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#statement_resources / #task_resources meta tables (5.7 SQL memory
    monitoring, meta_store.cpp:779-816): running-statement resource rows.
    Emitted via GridStore; the session row is always present (schema and
    the memory/concurrency fields are the checkable surface — values are
    live by nature, so this is a rows-only gate entry). task_resources is
    exercised by the unit test, which snapshots it inside a running job."""
    from griddb_spark.container import GridStore

    store = GridStore(spark, sf_dir)
    return store.statement_resources()


@query(
    "sql_memory_governed",
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_memory_governed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-statement working-memory governance (5.7
    /sql/totalMemoryLimit + /sql/failOnTotalMemoryLimit —
    GridDB-5.7-CE-RELEASE_NOTES.md:29-38; limiter armed per task at
    sql_job_manager_priority.cpp:7218-7232). The statement runs under a
    MemoryGovernor budget (job-group scope, status-store working-set
    monitor): within budget it must return exactly the ungoverned result
    — this gate value-hashes that. A starved budget is asserted to stop
    the statement with the GridDB-style error (the unit battery covers
    the cancel/monitor-only/meta-table surfaces)."""
    from griddb_spark.governor import (
        MemoryGovernor,
        StatementMemoryLimitError,
    )
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    q = ("SELECT o_orderpriority, count(*) AS n, "
         "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) "
         "  AS total_price "
         "FROM orders GROUP BY o_orderpriority")
    starved = MemoryGovernor(spark, total_memory_limit=1)
    try:
        starved.run(lambda: griddb_sql(spark, c, q).collect(), statement=q)
        raise AssertionError("starved budget must stop the statement")
    except StatementMemoryLimitError:
        pass
    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3)
    rows = gov.run(lambda: griddb_sql(spark, c, q).collect(), statement=q)
    return spark.createDataFrame(
        rows, "o_orderpriority string, n long, total_price double"
    )


@query(
    "sql_resource_control",
    """
    SELECT 'status' AS stmt, o_orderstatus AS k, count(*) AS n
    FROM orders GROUP BY o_orderstatus
    UNION ALL
    SELECT 'priority' AS stmt, o_orderpriority AS k, count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def sql_resource_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5.9 processing-order control (``/sql/resourceControlLevel``,
    GridDB-5.9-CE-RELEASE_NOTES.md "Processing Order Control": the new
    scheduler "assigns tasks as evenly as possible across SQL
    statements"). Two statements run CONCURRENTLY under level 0 (auto →
    level 3, the new scheduler): each gets its own FAIR scheduler pool,
    so their tasks interleave evenly instead of queueing FIFO — Spark's
    native seat for statement-fair scheduling. The result is the union
    of both statements' outputs (deterministic under any interleaving;
    this gate value-hashes it); the pool assignment itself is asserted
    here and plan-pinned in tests/test_governor.py."""
    import threading

    from griddb_spark.governor import MemoryGovernor
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    c.register_all()
    gov = MemoryGovernor(spark, total_memory_limit=8 * 1024 ** 3,
                         resource_control_level=0)
    stmts = {
        "status": ("SELECT o_orderstatus AS k, count(*) AS n "
                   "FROM orders GROUP BY o_orderstatus"),
        "priority": ("SELECT o_orderpriority AS k, count(*) AS n "
                     "FROM orders GROUP BY o_orderpriority"),
    }
    out: dict[str, list] = {}
    errs: list = []

    def _run(tag: str, q: str) -> None:
        try:
            out[tag] = gov.run(
                lambda: griddb_sql(spark, c, q).collect(), statement=q)
        except Exception as e:  # surfaced below — a thread must not die silently
            errs.append(e)

    threads = [threading.Thread(target=_run, args=(t, q))
               for t, q in stmts.items()]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errs:
        raise errs[0]
    from griddb_spark.governor import statement_records

    recs = [r for r in statement_records() if r.statement in stmts.values()]
    pools = {r.pool for r in recs[-2:]}
    assert len(pools) == 2 and None not in pools, (
        "level 3 must give each concurrent statement its own FAIR pool")
    rows = [(tag, r.k, r.n) for tag in ("status", "priority")
            for r in out[tag]]
    return spark.createDataFrame(rows, "stmt string, k string, n long")


@query(
    "sql_resource_monitor",
    """
    SELECT 'monitor:DATASTORE' AS k, CAST(1 AS BIGINT) AS n
    UNION ALL SELECT 'monitor:MEMORY', CAST(1 AS BIGINT)
    UNION ALL SELECT 'monitor:NETWORK', CAST(1 AS BIGINT)
    UNION ALL SELECT 'monitor:STORE', CAST(0 AS BIGINT)
    UNION ALL
    SELECT 'status:' || o_orderstatus AS k, count(*) AS n
    FROM orders GROUP BY o_orderstatus
    """,
)
def sql_resource_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5.9 Resource Monitoring (GridDB-5.9-CE-RELEASE_NOTES.md:
    ``/trace/resourceMonitor`` = LEVEL_WARNING + the ``/sql/
    monitoring{Memory,Store,Network}Rate`` and ``/transaction/
    monitoringStoreRate`` thresholds — "monitor detailed SQL resource
    usage (memory, I/O, communication time, etc.) and output it to
    event logs or meta tables"). A governed statement runs with
    near-zero rates armed for memory / network / datastore (its scan
    reads storage, its GROUP BY shuffles, its working set is nonzero —
    each threshold deterministically crosses) and the STORE rate at 0
    (= disabled, the reference's contract). The gate value-hashes the
    fired-warning vector alongside the statement's own result; the
    event rows themselves are served via #statement_events
    (container.py) and unit-pinned in tests/test_governor.py."""
    from griddb_spark.container import GridStore
    from griddb_spark.governor import MemoryGovernor
    from griddb_spark.sql.translate import griddb_sql

    c = cat(spark, sf_dir)
    c.register_all()
    gov = MemoryGovernor(
        spark, total_memory_limit=8 * 1024 ** 3, resource_monitor=True,
        monitoring_memory_rate=1e-9, monitoring_network_rate=1e-9,
        tx_monitoring_store_rate=1e-9, monitoring_store_rate=0.0,
    )
    q = ("SELECT o_orderstatus AS k, count(*) AS n "
         "FROM orders GROUP BY o_orderstatus")
    res = gov.run(lambda: griddb_sql(spark, c, q).collect(), statement=q)
    from griddb_spark.governor import statement_records

    rec = statement_records()[-1]
    events = (GridStore(spark, sf_dir).statement_events()
              .where(F.col("request_id") == rec.request_id)
              .where(F.col("event_type").startswith("STMT_MONITOR_"))
              .collect())
    fired = {e.event_type.removeprefix("STMT_MONITOR_") for e in events}
    rows = [(f"monitor:{cat}", 1 if cat in fired else 0)
            for cat in ("DATASTORE", "MEMORY", "NETWORK", "STORE")]
    rows += [(f"status:{r.k}", r.n) for r in res]
    return spark.createDataFrame(rows, "k string, n long")


@query(
    "pipe_dedup_embed_canonical",
    """
    WITH RECURSIVE j AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]), 6) >= 0.4),
    e AS (SELECT id_a a, id_b b FROM j UNION SELECT id_b, id_a FROM j),
    reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ),
    comp AS (SELECT src vec_id, least(src, min(dst)) component
             FROM reach GROUP BY src)
    SELECT v.vec_id FROM embeddings v
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.vec_id = v.vec_id AND c.component < v.vec_id)
    """,
)
def pipe_dedup_embed_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space end-to-end dedup: exact cosine near-dup pairs →
    connected components → keep the min-id member per cluster (the
    semantic-dedup composition — cosine_pairs + connected_components +
    canonical_filter all reused). At 100 TB the pair stage routes through
    ann_ivf cell-probing instead of exact all-pairs; the downstream
    component/canonical shapes are identical."""
    from griddb_spark.pipeline import (
        canonical_filter,
        connected_components,
        cosine_pairs,
    )

    emb = cat(spark, sf_dir).load("embeddings")
    pairs = cosine_pairs(emb, "vec_id", "embedding", threshold=0.4, blocks=4
                         ).select("id_a", "id_b")
    comps = connected_components(pairs, src="id_a", dst="id_b")
    return canonical_filter(emb, comps, id_col="vec_id").select("vec_id")


@query(
    "pipe_dedup_embed_canonical_ann",
    """
    WITH RECURSIVE u AS (
      SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, [x * 1.001 for x in embedding::DOUBLE[]]
      FROM embeddings
    ),
    grp AS (SELECT v, min(vec_id) rep FROM u GROUP BY v),
    xe AS (SELECT grp.rep a, u.vec_id b FROM u JOIN grp ON u.v = grp.v
           WHERE u.vec_id != grp.rep),
    c AS (SELECT rep vec_id, v,
            ( (v[1] >= 0)::BIGINT * 1 + (v[2] >= 0)::BIGINT * 2
            + (v[3] >= 0)::BIGINT * 4 + (v[4] >= 0)::BIGINT * 8
            + (v[5] >= 0)::BIGINT * 16 + (v[6] >= 0)::BIGINT * 32
            + (v[7] >= 0)::BIGINT * 64 + (v[8] >= 0)::BIGINT * 128) cell
          FROM grp),
    p AS (SELECT vec_id, v,
            unnest([cell, xor(cell, 1), xor(cell, 2), xor(cell, 4),
                    xor(cell, 8), xor(cell, 16), xor(cell, 32),
                    xor(cell, 64), xor(cell, 128)]) pcell
          FROM c),
    j AS (SELECT p.vec_id id_a, m.vec_id id_b
          FROM p JOIN c m ON m.cell = p.pcell AND p.vec_id < m.vec_id
          WHERE round(list_cosine_similarity(p.v, m.v), 6) >= 0.9),
    e AS (SELECT id_a a, id_b b FROM j UNION SELECT id_b, id_a FROM j
          UNION SELECT a, b FROM xe UNION SELECT b, a FROM xe),
    reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ),
    comp AS (SELECT src vec_id, least(src, min(dst)) component
             FROM reach GROUP BY src)
    SELECT u.vec_id FROM u
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.vec_id = u.vec_id AND c.component < u.vec_id)
    """,
)
def pipe_dedup_embed_canonical_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding dedup through the ANN candidate route — the 100 TB
    composition that ``pipe_dedup_embed_canonical``'s docstring promises:
    sign-code cell probing (``cosine_pairs_ann``) replaces the exact
    O(n²) pair stage; components + canonical filter are unchanged.

    The fixture corpus is the embeddings table plus a deterministic
    near-duplicate of every vector (×1.001 per component — same sign
    code, cosine ≈ 1), so at threshold 0.9 the ANN keep-set provably
    equals the exact variant's (pinned by a unit test): candidate
    generation is sub-quadratic, recall on true near-dups is complete.
    An exact-collapse pre-stage (group identical vectors, probe only the
    min-id representative — same composition as the collapsed minhash)
    keeps replica-heavy corpora linear: LSH cells full of bit-identical
    vectors would otherwise rebuild the quadratic candidate set the ANN
    route exists to avoid. The oracle replays the collapse, the sign
    codes, the Hamming-1 probe set, the verify, and the recursive
    closure in SQL."""
    from griddb_spark.pipeline import (
        canonical_filter,
        connected_components,
        cosine_pairs_ann,
    )

    emb = cat(spark, sf_dir).load("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = emb.unionByName(pert)
    g = corpus.groupBy("embedding").agg(
        F.min("vec_id").alias("rep"),
        F.collect_list("vec_id").alias("members"),
    )
    reps = g.select(F.col("rep").alias("vec_id"), "embedding")
    exact_edges = g.select(
        F.col("rep").alias("id_a"), F.explode("members").alias("id_b")
    ).filter(F.col("id_a") != F.col("id_b"))
    ann_pairs = cosine_pairs_ann(
        reps, "vec_id", "embedding", threshold=0.9, sign_bits=None
    ).select("id_a", "id_b")
    pairs = ann_pairs.unionByName(exact_edges)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    return canonical_filter(corpus, comps, id_col="vec_id").select("vec_id")


@query(
    "pipe_dedup_embed_ann_occ",
    """
    WITH RECURSIVE u AS (
      SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, [x * 1.001 for x in embedding::DOUBLE[]]
      FROM embeddings
    ),
    grp AS (SELECT v, min(vec_id) rep FROM u GROUP BY v),
    xe AS (SELECT grp.rep a, u.vec_id b FROM u JOIN grp ON u.v = grp.v
           WHERE u.vec_id != grp.rep),
    bset AS (SELECT greatest(8, least(64, CAST(ceil(log2(
               greatest(2, (SELECT count(*) FROM grp)) / 2.0)) AS INT)))
             AS bits),
    c AS (SELECT rep vec_id, v,
            list_sum([CASE WHEN v[i] >= 0 THEN 1::BIGINT << (i - 1)
                      ELSE 0 END
                      for i in range(1, (SELECT bits FROM bset) + 1)])
            cell
          FROM grp),
    p AS (SELECT vec_id, v,
            unnest(list_prepend(cell,
              [xor(cell, 1::BIGINT << j)
               for j in range(0, (SELECT bits FROM bset))])) pcell
          FROM c),
    j AS (SELECT p.vec_id id_a, m.vec_id id_b
          FROM p JOIN c m ON m.cell = p.pcell AND p.vec_id < m.vec_id
          WHERE round(list_cosine_similarity(p.v, m.v), 6) >= 0.9),
    e AS (SELECT id_a a, id_b b FROM j UNION SELECT id_b, id_a FROM j
          UNION SELECT a, b FROM xe UNION SELECT b, a FROM xe),
    reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ),
    comp AS (SELECT src vec_id, least(src, min(dst)) component
             FROM reach GROUP BY src)
    SELECT u.vec_id FROM u
    WHERE NOT EXISTS (SELECT 1 FROM comp c
                      WHERE c.vec_id = u.vec_id AND c.component < u.vec_id)
    """,
)
def pipe_dedup_embed_ann_occ(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pipe_dedup_embed_canonical_ann`` at a SECOND occupancy target
    (``target_occ=2``): the adaptive layout derives a WIDER sign code
    (9 bits on the 1000-rep fixture vs the default-occupancy 8), so the
    whole derive→bin→probe→verify pipeline is oracle-certified at two
    distinct layouts — the occupancy knob the 1000× target-occ sweep
    tuned is locked behind the value-hash gate rather than probe scripts
    alone (VERDICT r10 item 7). The oracle derives the SAME bit width
    from the corpus size in SQL (greatest(8, ceil(log2(n/occ))) — the
    auto_sign_bits closed form) and replays cell codes and the
    Hamming-1 probe set at that dynamic width, so a testdata resize
    re-derives identically on both sides."""
    from griddb_spark.pipeline import (
        canonical_filter,
        connected_components,
        cosine_pairs_ann,
    )

    emb = cat(spark, sf_dir).load("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = emb.unionByName(pert)
    g = corpus.groupBy("embedding").agg(
        F.min("vec_id").alias("rep"),
        F.collect_list("vec_id").alias("members"),
    )
    reps = g.select(F.col("rep").alias("vec_id"), "embedding")
    exact_edges = g.select(
        F.col("rep").alias("id_a"), F.explode("members").alias("id_b")
    ).filter(F.col("id_a") != F.col("id_b"))
    ann_pairs = cosine_pairs_ann(
        reps, "vec_id", "embedding", threshold=0.9, sign_bits=None,
        target_occ=2,
    ).select("id_a", "id_b")
    pairs = ann_pairs.unionByName(exact_edges)
    comps = connected_components(pairs, src="id_a", dst="id_b")
    return canonical_filter(corpus, comps, id_col="vec_id").select("vec_id")


@query(
    "pipe_encode_tokens",
    """
    WITH tf AS (SELECT unnest(string_split_regex(trim(text), '\\s+')) token
                FROM documents),
    vc AS (SELECT token, count(*) n FROM tf GROUP BY token
           ORDER BY n DESC, token LIMIT 50),
    v AS (SELECT token,
                 row_number() OVER (ORDER BY n DESC, token) AS token_id
          FROM vc),
    t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
          FROM documents),
    pe AS (SELECT doc_id, u.i AS pos, u.t AS token
           FROM (SELECT doc_id,
                        unnest([{'i': i, 't': w[i]}
                                FOR i IN range(1, len(w)+1)]) u
                 FROM t)),
    j AS (SELECT doc_id, pos, coalesce(v.token_id, 0) AS tid,
                 (v.token_id IS NULL)::int AS unk
          FROM pe LEFT JOIN v USING (token))
    SELECT doc_id,
           string_agg(tid, ',' ORDER BY pos) AS token_ids,
           count(*) AS n_tokens, sum(unk)::BIGINT AS n_unk
    FROM j GROUP BY doc_id
    """,
)
def pipe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-apply: encode every document as its ordered token-id
    sequence against the corpus top-50 vocab (vocab_with_ids +
    encode_tokens, pipeline/packing.py), OOV → 0. Vocab broadcast, corpus
    exploded once, one doc-keyed reassembly shuffle. token_ids emitted as
    a comma-joined string so both engines stringify identically."""
    from griddb_spark.pipeline.packing import encode_tokens, vocab_with_ids

    docs = cat(spark, sf_dir).load("documents")
    vocab = vocab_with_ids(docs, "text", k=50, mode="ws")
    enc = encode_tokens(docs, vocab, "doc_id", "text", mode="ws")
    return enc.select(
        "doc_id",
        F.array_join(
            F.transform(F.col("token_ids"), lambda x: x.cast("string")), ","
        ).alias("token_ids"),
        "n_tokens",
        "n_unk",
    )


#: Curation CTE chain (lang + quality + near-dup losers + contamination)
#: shared by the report and the curated-shard-write oracles.
_DUCK_CURATION_CTES = """
    WITH RECURSIVE t AS (SELECT doc_id, source, text,
                string_split_regex(trim(text), '\\s+') w
               FROM documents WHERE doc_id % 41 <> 0),
    lang AS (SELECT doc_id,
      CASE WHEN en_n > 0 AND en_n >= greatest(de_n, es_n, fr_n) THEN 'en'
           WHEN de_n > 0 AND de_n >= greatest(es_n, fr_n) THEN 'de'
           WHEN es_n > 0 AND es_n >= fr_n THEN 'es'
           WHEN fr_n > 0 THEN 'fr'
           ELSE 'und' END AS lang
      FROM (SELECT doc_id,
        len(list_filter(w, x -> x in ('the','and','of','is','with'))) en_n,
        len(list_filter(w, x -> x in ('der','die','und','ist','mit'))) de_n,
        len(list_filter(w, x -> x in ('el','los','las','es','con'))) es_n,
        len(list_filter(w, x -> x in ('le','les','des','est','avec'))) fr_n
        FROM t)),
    q AS (SELECT doc_id,
            round(least(length(text)::double / 500.0, 1.0) * 0.25
            + (1.0 - round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '',
              'g'))::double / length(text), 6)) * 0.5
            + least(round(len(list_filter(w, x -> x in ('the','a','an','of',
              'and','or','is','to','in','on')))::double / len(w), 6) * 5.0,
              1.0) * 0.25, 6) AS quality
          FROM t),
    shingle AS (SELECT doc_id,
        list_distinct([array_to_string(w[i:i+2], ' ')
                       FOR i IN range(1, greatest(len(w)-2, 0)+1)]) sh
      FROM t),
    exg AS (SELECT doc_id, unnest(sh) g FROM shingle),
    cand AS (SELECT DISTINCT x.doc_id doc_a, y.doc_id doc_b
             FROM exg x JOIN exg y ON x.g = y.g AND x.doc_id < y.doc_id),
    j AS (SELECT doc_a, doc_b
          FROM cand JOIN shingle a ON a.doc_id = doc_a
                    JOIN shingle b ON b.doc_id = doc_b
          WHERE len(list_intersect(a.sh, b.sh))::double
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
    e AS (SELECT doc_a a, doc_b b FROM j UNION SELECT doc_b, doc_a FROM j),
    reach(src, dst) AS (
        SELECT a, b FROM e
        UNION
        SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
    ),
    comp AS (SELECT src doc_id, least(src, min(dst)) component
             FROM reach GROUP BY src),
    losers AS (SELECT doc_id FROM comp WHERE component < doc_id),
    bt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
           FROM documents WHERE doc_id % 41 = 0),
    g3c AS (SELECT doc_id,
        list_distinct([array_to_string(w[i:i+2], ' ')
                       FOR i IN range(1, greatest(len(w)-2, 0)+1)]) sh3
      FROM t),
    g3b AS (SELECT doc_id,
        list_distinct([array_to_string(w[i:i+2], ' ')
                       FOR i IN range(1, greatest(len(w)-2, 0)+1)]) sh3
      FROM bt),
    bg AS (SELECT DISTINCT unnest(sh3) gram FROM g3b),
    cg AS (SELECT doc_id, unnest(sh3) gram FROM g3c),
    cont AS (SELECT cg.doc_id FROM cg JOIN bg USING (gram)
             GROUP BY cg.doc_id HAVING count(*) >= 2)
"""

_DUCK_CURATION_SELECT = """
    SELECT t.doc_id, t.source, lang.lang, q.quality,
           (t.doc_id IN (SELECT doc_id FROM losers))::int AS is_near_dup,
           (t.doc_id IN (SELECT doc_id FROM cont))::int AS is_contaminated,
           (t.doc_id NOT IN (SELECT doc_id FROM losers)
            AND t.doc_id NOT IN (SELECT doc_id FROM cont)
            AND q.quality >= 0.4)::int AS keep
    FROM t JOIN lang USING (doc_id) JOIN q USING (doc_id)
"""


@query("pipe_curation_report", _DUCK_CURATION_CTES + _DUCK_CURATION_SELECT)
def pipe_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in one pass — the pipeline a user
    actually runs: language-ID + composite quality score + near-dup loser
    flag (MinHash-LSH → components → min-id canonical) + benchmark
    contamination flag (3-gram overlap vs the doc_id%41 eval slice),
    folded into a per-document keep/drop decision (keep = not near-dup,
    not contaminated, quality >= 0.4). Every stage is an already-gated
    operator; flags arrive as broadcast left joins against the (small)
    loser/contaminated lists, so the corpus is scanned once."""
    from griddb_spark.pipeline import (
        connected_components,
        contamination_report,
        lang_id,
        minhash_lsh_pairs,
        quality_stats,
    )

    docs = cat(spark, sf_dir).load("documents")
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    bench = docs.filter(F.col("doc_id") % 41 == 0)

    pairs = minhash_lsh_pairs(corpus, "doc_id", "text", threshold=0.8)
    comps = connected_components(pairs)
    losers = comps.filter(F.col("component") < F.col("doc_id")).select(
        "doc_id", F.lit(1).alias("__dup"))
    cont = contamination_report(corpus, bench, "doc_id", "text",
                                n=3, min_hits=2).select(
        "doc_id", F.lit(1).alias("__cont"))

    spread = corpus.repartition(
        spark.sparkContext.defaultParallelism, "doc_id")
    base = spread.select(
        "doc_id", "source",
        lang_id("text").alias("lang"),
        _r6(quality_stats("text")["quality_score"]).alias("quality"),
    )
    out = (
        base.join(F.broadcast(losers), "doc_id", "left")
        .join(F.broadcast(cont), "doc_id", "left")
    )
    dup = F.coalesce(F.col("__dup"), F.lit(0))
    con = F.coalesce(F.col("__cont"), F.lit(0))
    return out.select(
        "doc_id", "source", "lang", "quality",
        dup.cast("int").alias("is_near_dup"),
        con.cast("int").alias("is_contaminated"),
        ((dup == 0) & (con == 0) & (F.col("quality") >= 0.4))
        .cast("int").alias("keep"),
    )


@query(
    "stream_quantile_sketch",
    """
    WITH b AS (SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) ts,
                      least(255, greatest(0,
                        floor(CAST(value AS DOUBLE) / 2.0)::int)) AS bucket
               FROM events),
    c AS (SELECT ts, bucket, count(*) cnt FROM b GROUP BY 1, 2),
    cum AS (SELECT ts, bucket, cnt,
                   sum(cnt) OVER (PARTITION BY ts ORDER BY bucket) AS cm,
                   sum(cnt) OVER (PARTITION BY ts) AS tot
            FROM c)
    SELECT ts, max(tot)::BIGINT AS n_rows,
           round(min(CASE WHEN cm >= 0.5 * tot
                          THEN (bucket + 1) * 2.0 END), 6)::DOUBLE AS q_50,
           round(min(CASE WHEN cm >= 0.95 * tot
                          THEN (bucket + 1) * 2.0 END), 6)::DOUBLE AS q_95
    FROM cum GROUP BY ts
    """,
)
def stream_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming windowed quantile profiling: per-hour fixed-width
    histogram sketch over event values (quantile_sketch_stream) — state
    per open window is the ≤256-bucket count grid; the p50/p95 estimates
    are the batch-side cumulative walk over the materialized counts (same
    estimator as pipeline.sketches.histogram_quantile, so streaming and
    batch agree; bucket width 2.0 is a power of two — bit-identical
    bucketing in both engines)."""
    import uuid as _uuid

    prepare(spark)
    from pyspark.sql import Window

    from griddb_spark.streaming import quantile_sketch_stream, run_to_memory

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = quantile_sketch_stream(ev, "ts", "value", 1, "HOUR",
                                 lo=0.0, hi=512.0, n_buckets=256,
                                 watermark="10 minutes")
    regs = run_to_memory(out, f"hq_{_uuid.uuid4().hex[:8]}",
                         mode="complete", shuffle_partitions=8)
    pw = Window.partitionBy("ts").orderBy("bucket")
    tw = Window.partitionBy("ts")
    cum = regs.select(
        "ts", "bucket", "cnt",
        F.sum("cnt").over(pw).alias("cm"),
        F.sum("cnt").over(tw).alias("tot"),
    )
    edge = (F.col("bucket") + 1).cast("double") * F.lit(2.0)
    return cum.groupBy("ts").agg(
        F.max("tot").alias("n_rows"),
        F.round(F.min(F.when(
            F.col("cm").cast("double") >= 0.5 * F.col("tot").cast("double"),
            edge)), 6).alias("q_50"),
        F.round(F.min(F.when(
            F.col("cm").cast("double") >= 0.95 * F.col("tot").cast("double"),
            edge)), 6).alias("q_95"),
    )


@query(
    "pipe_boilerplate_removal",
    """
    WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
               FROM documents),
    sp0 AS (SELECT doc_id,
              [{'i': i - 1,
                's': array_to_string(w[(i-1)*3+1 : (i-1)*3+3], ' ')}
               FOR i IN range(1, greatest(ceil(len(w)/3.0)::int, 1) + 1)] spans
            FROM t),
    sp AS (SELECT doc_id, u.i AS span_idx, u.s AS span
           FROM (SELECT doc_id, unnest(spans) u FROM sp0)),
    bp AS (SELECT span FROM (SELECT DISTINCT span, doc_id FROM sp)
           GROUP BY span HAVING count(*) >= 5)
    SELECT doc_id,
           coalesce(string_agg(CASE WHEN bp.span IS NULL THEN sp.span END,
                               ' ' ORDER BY span_idx), '') AS clean_text,
           count(*) AS n_spans,
           sum((bp.span IS NOT NULL)::int)::BIGINT AS n_removed
    FROM sp LEFT JOIN bp USING (span)
    GROUP BY doc_id
    """,
)
def pipe_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal by document frequency (remove_boilerplate,
    pipeline/dedup.py): 3-token spans occurring in >= 5 distinct documents
    (headers, chrome, license blurbs — the high-DF text exact dedup never
    catches) are cut from every document. The flagged-span list is
    vocabulary-bounded and broadcast; the corpus explodes once and one
    doc-keyed shuffle reassembles."""
    from griddb_spark.pipeline import remove_boilerplate

    docs = cat(spark, sf_dir).load("documents")
    return remove_boilerplate(docs, "doc_id", "text", k=3, min_df=5)


@query(
    "pipe_decontam_semantic",
    """
    WITH b AS (SELECT embedding::DOUBLE[] v FROM embeddings
               WHERE vec_id % 41 = 0),
    c AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings
          WHERE vec_id % 41 <> 0),
    m AS (SELECT c.vec_id,
                 round(max(list_cosine_similarity(c.v, b.v)), 6) max_bench_sim
          FROM c CROSS JOIN b GROUP BY c.vec_id)
    SELECT vec_id, max_bench_sim FROM m WHERE max_bench_sim >= 0.35
    """,
)
def pipe_decontam_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination: flag corpus items whose embedding is too
    close (cosine >= 0.35) to ANY benchmark embedding — the
    paraphrase-robust complement to n-gram decontamination. The benchmark
    side is tiny by nature and broadcast as ONE normalized matrix; each
    Arrow batch of the corpus runs a single vectorized matmul + row-max
    (max_sim_vs_bench) — a narrow stage over the scan, no corpus shuffle,
    no per-pair interpreted expression (the zip_with fold measured 187 s
    at the 10x probe; this runs ~2 s). At 100 TB you route the corpus
    through ann_ivf cell-probing against bench centroids first; this
    exact pass is the verifier."""
    from griddb_spark.pipeline import max_sim_vs_bench

    emb = cat(spark, sf_dir).load("embeddings")
    bench = emb.filter(F.col("vec_id") % 41 == 0)
    corpus = emb.filter(F.col("vec_id") % 41 != 0)
    scored = max_sim_vs_bench(corpus, bench, "vec_id", "embedding")
    return scored.filter(F.col("max_bench_sim") >= 0.35)


@query(
    "pipe_train_split",
    """
    WITH b AS (SELECT doc_id, source,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                   % 10000 AS bk
               FROM documents),
    s AS (SELECT doc_id, source,
            CASE WHEN bk >= 0 AND bk < 9000 THEN 'train'
                 WHEN bk >= 9000 AND bk < 9500 THEN 'val'
                 WHEN bk >= 9500 AND bk < 10000 THEN 'test'
                 ELSE 'rest' END AS split
          FROM b)
    SELECT source, split, count(*) AS n, min(doc_id) AS min_id
    FROM s GROUP BY source, split
    """,
)
def pipe_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (train_split,
    pipeline/sampling.py): content-hash bucket membership — stable under
    repartitioning, appends, and engine changes (a late shard never
    reshuffles anyone). 90/5/5; reported per (source, split)."""
    from griddb_spark.pipeline import train_split

    docs = cat(spark, sf_dir).load("documents")
    out = train_split(docs, "doc_id",
                      {"train": 0.9, "val": 0.05, "test": 0.05})
    return out.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("min_id"))


@query(
    "pipe_snapshot_diff",
    """
    WITH oldv AS (SELECT doc_id, md5(text) h FROM documents
                  WHERE doc_id % 7 <> 0),
    newv AS (SELECT doc_id,
               md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                        ELSE text END) h
             FROM documents WHERE doc_id % 7 <> 1)
    SELECT coalesce(oldv.doc_id, newv.doc_id) AS doc_id,
           CASE WHEN oldv.h IS NULL THEN 'added'
                WHEN newv.h IS NULL THEN 'removed'
                WHEN oldv.h <> newv.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM oldv FULL OUTER JOIN newv USING (doc_id)
    """,
)
def pipe_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (snapshot_diff, pipeline/sampling.py):
    added/removed/changed/unchanged between two ingest snapshots — a
    full-outer join carrying only (key, content-hash), fixed-width
    shuffle regardless of document size. Old = docs without doc_id%7==0;
    new = docs without doc_id%7==1, with every doc_id%5==0 text edited."""
    from griddb_spark.pipeline import snapshot_diff

    docs = cat(spark, sf_dir).load("documents")
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 7 != 1).withColumn(
        "text",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.col("text"), F.lit(" v2"))).otherwise(F.col("text")),
    )
    return snapshot_diff(old, new, "doc_id", "text")


# ===========================================================================
# TPC-H flavor suite (beyond q1): realistic multi-join analytics over the
# star schema — the shapes a reference SQL user runs daily. All money sums
# follow the repo DECIMAL->DOUBLE convention.
# ===========================================================================


@query(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           o.o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 flavor: 3-way selective join + grouped revenue + top-10.
    Customer is the small filtered side (broadcast via AQE); the
    orders-lineitem join shuffles on the order key."""
    c = cat(spark, sf_dir)
    cust = c.load("customer").filter(F.col("c_mktsegment") == "BUILDING")
    cut = F.lit("1998-03-15").cast("timestamp")
    orders = c.load("orders").filter(F.col("o_orderdate") < cut)
    li = c.load("lineitem").filter(F.col("l_shipdate") > cut)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice")
                  * _dec(F.lit(1) - F.col("l_discount")))
            .cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
                        AND c.c_nationkey = s.s_nationkey
         JOIN nation n ON s.s_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name ORDER BY revenue DESC
    """,
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 flavor: 6-way join through the full snowflake
    (customer-orders-lineitem-supplier-nation-region) with the
    local-supplier equality (c_nationkey = s_nationkey). Dims broadcast;
    only the orders-lineitem join shuffles at scale."""
    c = cat(spark, sf_dir)
    cust, orders, li = c.load("customer"), c.load("orders"), c.load("lineitem")
    supp, nat, reg = c.load("supplier"), c.load("nation"), c.load("region")
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(_dec("l_extendedprice")
                   * _dec(F.lit(1) - F.col("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 10
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 flavor: pure scan-filter-aggregate — every predicate must
    reach the parquet reader (PushedFilters) and the sum is one partial/
    final pair with no shuffle beyond the final reduce."""
    li = cat(spark, sf_dir).load("lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 10))
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", 4))
            .cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 flavor: returned-item revenue ranking (4-way join +
    grouped top-20)."""
    c = cat(spark, sf_dir)
    orders = c.load("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")))
    li = c.load("lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.load("customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.load("nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dec("l_extendedprice")
                   * _dec(F.lit(1) - F.col("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_effect",
    """
    SELECT round(100.00 *
             CAST(sum(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2))
                       * CAST(1 - l.l_discount AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE),
             6) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 flavor: promotion revenue share — broadcast part join +
    conditional aggregate ratio."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp")))
    disc = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(F.broadcast(c.load("part")),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(
            F.lit(100.0) * F.sum(promo).cast("double")
            / F.sum(disc).cast("double"), 6).alias("promo_revenue_pct"))
    )


@query(
    "q4_order_priority",
    """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor: EXISTS correlated subquery (AGG_FOLD_EXISTS,
    sql_type.h:131) folding to a left-semi join, grouped priority count."""
    c = cat(spark, sf_dir)
    orders = c.load("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp")))
    li = c.load("lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (semi.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@query(
    "q7_volume_shipping",
    """
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           extract(year FROM l.l_shipdate)::BIGINT AS l_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    WHERE ((cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
        OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY cust_nation, supp_nation, l_year
    ORDER BY cust_nation, supp_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 flavor: bilateral trade volume — double nation dimension
    (aliased twice), disjunctive nation-pair predicate, per-year grouped
    revenue."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    # push the nation-pair literals INTO both dimension scans: only
    # customers/suppliers of the two nations survive their (broadcast)
    # dim joins, so the big customer⋈orders⋈lineitem chain runs on ~2/N
    # of the rows — at 100 TB this pre-filter IS the query plan, the
    # residual disjunction only rejects same-nation pairs
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    cn = c.load("nation").filter(pair).select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = c.load("nation").filter(pair).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    cust = c.load("customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
    supp = c.load("supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
    j = (
        cust.join(c.load("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(
            ((F.col("cust_nation") == "NATION_1")
             & (F.col("supp_nation") == "NATION_2"))
            | ((F.col("cust_nation") == "NATION_2")
               & (F.col("supp_nation") == "NATION_1")))
    )
    return (
        j.groupBy("cust_nation", "supp_nation",
                  F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(_dec("l_extendedprice")
                   * _dec(F.lit(1) - F.col("l_discount")))
             .cast("double").alias("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    )


@query(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 flavor: customer order-count distribution — left outer
    join with a join-side filter (zero-order customers count as 0) and a
    double aggregation."""
    c = cat(spark, sf_dir)
    orders = c.load("orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.load("customer")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@query(
    "q18_large_volume",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 flavor: large-volume customers — IN over a grouped
    HAVING subquery (folds to a semi join on the aggregated key set)."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).alias("__sq"))
           .filter(F.col("__sq") > 150)
           .select("l_orderkey"))
    return (
        c.load("customer")
        .join(c.load("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .join(li.select("l_orderkey", "l_quantity"),
              F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(big.select(big.l_orderkey.alias("__bk"))),
              F.col("o_orderkey") == F.col("__bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "join_bucketed_q18",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
         JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def join_bucketed_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 over BUCKETED fact tables — the driver-gated form of the 100×
    layout receipt (scripts/probe_bucketed_100x.json: q18 8.3× faster,
    exchanges 5→3, identical results). ``write_bucketed`` hash-clusters
    lineitem and orders by their shared join key at write time (the
    Spark seat of GridDB's affinity-key sub-container placement,
    sql_parser.h:300-303), and the layout-aware join order runs the
    fact⋈fact orderkey join AND the HAVING groupBy with ZERO exchange:
    the only shuffles left are the custkey join's two. The merge hint
    pins sort-merge on the co-located join so the plan shape (pinned in
    tests/test_plans.py) is scale-independent — at tiny sf the planner
    would otherwise broadcast and hide the co-location."""
    from griddb_spark.catalog import write_bucketed

    c = cat(spark, sf_dir)
    write_bucketed(c.load("lineitem"), "li_bkt_q18", "l_orderkey", 8,
                   sort_cols=("l_orderkey",))
    write_bucketed(c.load("orders"), "ord_bkt_q18", "o_orderkey", 8,
                   sort_cols=("o_orderkey",))
    li = spark.table("li_bkt_q18")
    orders = spark.table("ord_bkt_q18")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).alias("__sq"))
           .filter(F.col("__sq") > 150)
           .select(F.col("l_orderkey").alias("__bk")))
    oli = (orders.hint("merge")
           .join(li.select("l_orderkey", "l_quantity"),
                 F.col("o_orderkey") == F.col("l_orderkey"))
           .join(F.broadcast(big),
                 F.col("o_orderkey") == F.col("__bk"), "left_semi"))
    return (
        oli.join(c.load("customer"),
                 F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice")
        .agg(_dsum("l_quantity").alias("sum_qty"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q22_global_sales",
    """
    WITH avg_bal AS (SELECT avg(CAST(c_acctbal AS DECIMAL(18,2))) a
                     FROM customer WHERE c_acctbal > 0.0),
    cust AS (SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
             FROM customer c, avg_bal
             WHERE c.c_acctbal > avg_bal.a
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey
                                 AND o.o_orderdate >=
                                     TIMESTAMP '2000-01-01 00:00:00'))
    SELECT c_nationkey % 5 AS cntry_grp, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM cust GROUP BY cntry_grp ORDER BY cntry_grp
    """,
)
def q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 flavor: positive-balance-above-average customers with no
    RECENT orders (no order since 2000 — every fixture customer has SOME
    order, so the unqualified form gated an empty result) — scalar
    aggregate subquery (broadcast single row) + NOT EXISTS anti-join,
    grouped by a country bucket."""
    c = cat(spark, sf_dir)
    cust = c.load("customer")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg(_dec("c_acctbal")).alias("__a")))
    rich = (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("__a")))
    no_orders = rich.join(
        c.load("orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"), "left_anti")
    return (
        no_orders
        .groupBy((F.col("c_nationkey") % 5).alias("cntry_grp"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"))
        .orderBy("cntry_grp")
    )


@query(
    "q2_min_cost_supplier",
    """
    WITH minp AS (SELECT l_partkey, min(l_extendedprice) mn
                  FROM lineitem GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
           CAST(s.s_acctbal AS DOUBLE) AS s_acctbal,
           CAST(l.l_extendedprice AS DOUBLE) AS price
    FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN minp ON minp.l_partkey = p.p_partkey
                AND l.l_extendedprice = minp.mn
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 10 AND r.r_name = 'EUROPE'
    ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey, price
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 flavor (no partsupp in the fixture — supply cost becomes
    shipped price): for every size-10 part, the European supplier(s) who
    shipped it at the per-part MINIMUM price. The correlated scalar-min
    subquery folds to a grouped min joined back on (part, price) — the
    AGG_FOLD rewrite shape (sql_compiler.cpp) — with all dimension sides
    broadcast; top-100 by account balance."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    minp = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("__mn"))
    p = c.load("part").filter(F.col("p_size") == 10)
    nr = (c.load("nation")
          .join(F.broadcast(c.load("region")
                            .filter(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey")))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(minp, ["l_partkey"])
        .filter(F.col("l_extendedprice") == F.col("__mn"))
        .join(F.broadcast(c.load("supplier")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("l_extendedprice").cast("double").alias("price"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                 "p_partkey", "price")
        .limit(100)
    )


@query(
    "q8_market_share",
    """
    WITH vol AS (
      SELECT extract(year FROM o.o_orderdate)::BIGINT o_year,
             CAST(l.l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
             sn.n_name supp_nation
      FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                               THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END)
                      AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 flavor: national market share — the widest snowflake in
    the suite (7-way: lineitem × orders × customer × 2 nations × region ×
    supplier × part), every dimension broadcast, conditional-aggregate
    ratio per year."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem")
    o = c.load("orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    cn = (c.load("nation").join(
            F.broadcast(c.load("region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"))
          .select(F.col("n_nationkey").alias("cnk")))
    sn = c.load("nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    p = c.load("part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    vol = _dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))
    nat = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.load("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(c.load("supplier")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("snk"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(
            F.sum(nat).cast("double") / F.sum(vol).cast("double"), 6
        ).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    """
    SELECT n.n_name AS nation,
           extract(year FROM o.o_orderdate)::BIGINT AS o_year,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS profit
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY nation, o_year ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 flavor: profit by supplier nation and year for parts
    matching a name pattern (no partsupp → profit is discounted revenue).
    LIKE-filtered part dim broadcast; two-key rollup."""
    c = cat(spark, sf_dir)
    p = c.load("part").filter(F.col("p_name").like("%widget%")).select("p_partkey")
    return (
        c.load("lineitem")
        .join(c.load("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.load("supplier")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.load("nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(_dec("l_extendedprice")
                   * _dec(F.lit(1) - F.col("l_discount")))
             .cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "q11_important_stock",
    """
    WITH pv AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
      GROUP BY l.l_partkey),
    tot AS (SELECT sum(value) t FROM pv)
    SELECT pv.l_partkey AS p_partkey, CAST(pv.value AS DOUBLE) AS value
    FROM pv, tot WHERE pv.value > 0.0011 * tot.t
    ORDER BY value DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 flavor: parts whose shipped value from a nation group
    exceeds a FRACTION OF THE GLOBAL TOTAL — grouped aggregate + scalar
    total (single-row broadcast cross join) + HAVING. The one-pass shape:
    the per-part values are computed once and reused for the total."""
    c = cat(spark, sf_dir)
    sup = (c.load("supplier")
           .join(F.broadcast(c.load("nation").filter(
               F.col("n_name").isin("NATION_5", "NATION_6", "NATION_7"))),
               F.col("s_nationkey") == F.col("n_nationkey"))
           .select("s_suppkey"))
    pv = (
        c.load("lineitem")
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("__value"))
        .localCheckpoint(eager=True)  # computed once, read twice
    )
    tot = pv.agg(F.sum("__value").alias("__t"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("__value") > F.lit(0.0011) * F.col("__t"))
        .select(F.col("l_partkey").alias("p_partkey"),
                F.col("__value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "p_partkey")
    )


@query(
    "q12_shipmode_priority",
    """
    SELECT l.l_returnflag,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 flavor (no shipmode/commitdate in the fixture — 'late'
    means shipped ≥90 days after ordering): high/low-priority line counts
    per return flag, the dual conditional-count shape with an inequality
    join predicate on top of the key equality."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        c.load("orders")
        .join(li, (F.col("o_orderkey") == F.col("l_orderkey"))
              & (F.col("l_shipdate")
                 >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")))
        .groupBy("l_returnflag")
        .agg(F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"))
        .orderBy("l_returnflag")
    )


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — the VIEW (revenue
    CTE computed once, localCheckpoint) consumed twice: once for the
    scalar max, once for the equality filter."""
    c = cat(spark, sf_dir)
    rev = (
        c.load("lineitem")
        .filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_dec("l_extendedprice")
                   * _dec(F.lit(1) - F.col("l_discount")))
             .alias("total_revenue"))
        .localCheckpoint(eager=True)
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        c.load("supplier")
        .join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select("s_suppkey", "s_name",
                F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@query(
    "q16_parts_supplier",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 flavor: distinct supplier count per (brand, type, size),
    excluding a NOT IN supplier blacklist (negative balance — the
    'complaints' analog) — anti-join + DISTINCT aggregate over the
    broadcastable part dim."""
    c = cat(spark, sf_dir)
    p = c.load("part").filter(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    bad = c.load("supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        c.load("lineitem")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity",
    """
    WITH pa AS (SELECT l_partkey, avg(l_quantity) av
                FROM lineitem GROUP BY l_partkey)
    SELECT round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)))
                      AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * pa.av
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 flavor: revenue of below-half-average-quantity orders
    for one brand — the correlated scalar-avg subquery folded to a
    grouped avg joined back on the part key (AGG_FOLD shape)."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem")
    pa = li.groupBy("l_partkey").agg(F.avg("l_quantity").alias("__av"))
    p = c.load("part").filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, ["l_partkey"])
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("__av"))
        .agg(F.round(F.sum(_dec("l_extendedprice")).cast("double")
                     / F.lit(7.0), 6).alias("avg_yearly"))
    )


@query(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: discounted revenue under an OR-of-ANDs predicate mixing
    both join sides — the disjunction can't push fully into either scan,
    but the per-side residuals (brand IN, size/qty ranges) can and do."""
    c = cat(spark, sf_dir)
    arm = lambda b, s1, s2, q1, q2: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s1, s2)
        & F.col("l_quantity").between(q1, q2))
    return (
        c.load("lineitem")
        .join(F.broadcast(c.load("part")),
              F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm("Brand#1", 1, 15, 1, 20)
                | arm("Brand#2", 10, 30, 10, 30)
                | arm("Brand#3", 20, 50, 20, 40))
        .agg(F.sum(_dec("l_extendedprice")
                   * _dec(F.lit(1) - F.col("l_discount")))
             .cast("double").alias("revenue"))
    )


@query(
    "q20_promotion_parts",
    """
    WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    shipped AS (SELECT l_suppkey, l_partkey, sum(l_quantity) qty
                FROM lineitem JOIN red ON l_partkey = p_partkey
                GROUP BY l_suppkey, l_partkey),
    supps AS (SELECT DISTINCT l_suppkey FROM shipped WHERE qty > 50)
    SELECT s.s_name, n.n_name
    FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN supps ON s.s_suppkey = supps.l_suppkey
    WHERE n.n_name IN ('NATION_4', 'NATION_8', 'NATION_12')
    ORDER BY s.s_name
    """,
)
def q20_promotion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 flavor: suppliers in a nation group who shipped >50
    units of any 'red' part — the nested-IN chain (parts → grouped
    quantities → distinct suppliers) folded to semi-join steps."""
    c = cat(spark, sf_dir)
    red = c.load("part").filter(F.col("p_name").like("red%")).select("p_partkey")
    shipped = (
        c.load("lineitem")
        .join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 50)
        .select("l_suppkey").distinct()
    )
    n = c.load("nation").filter(
        F.col("n_name").isin("NATION_4", "NATION_8", "NATION_12"))
    return (
        c.load("supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"),
              "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "q21_waiting_supplier",
    """
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, s.s_name
      FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE n.n_name = 'NATION_6' AND o.o_orderstatus = 'F')
    SELECT s_name, count(*) AS numwait
    FROM l1
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 flavor (no receipt/commit dates — 'kept waiting' is
    holding the LATEST ship date in a multi-supplier finished order):
    the double-correlated EXISTS + NOT EXISTS pair folding to a semi-
    and an anti-join against the same fact table."""
    c = cat(spark, sf_dir)
    li = c.load("lineitem")
    sup = (c.load("supplier")
           .join(F.broadcast(c.load("nation")
                             .filter(F.col("n_name") == "NATION_6")),
                 F.col("s_nationkey") == F.col("n_nationkey")))
    l1 = (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c.load("orders").filter(F.col("o_orderstatus") == "F")
              .select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", "l_shipdate", "s_name")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = li.select(F.col("l_orderkey").alias("k3"),
                   F.col("l_shipdate").alias("d3"))
    return (
        l1.join(l2, (F.col("l_orderkey") == F.col("k2"))
                & (F.col("l_suppkey") != F.col("s2")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3"))
              & (F.col("d3") > F.col("l_shipdate")), "left_anti")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "pipe_corpus_checksum",
    """
    SELECT source, count(*) AS n_docs,
           sum(('0x' || substr(md5(text), 1, 8))::BIGINT)::BIGINT AS checksum
    FROM documents GROUP BY source ORDER BY source
    """,
)
def pipe_corpus_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset integrity fingerprint: per-source order-insensitive content
    checksum (sum of md5-prefix integers) + row count — the cheap
    transfer/copy verification every data pipeline runs after a move.
    Commutative sum ⇒ map-side combinable, partitioning-independent,
    portable arithmetic both engines."""
    docs = cat(spark, sf_dir).load("documents")
    h = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("bigint")
    return (docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(h).alias("checksum"))
            .orderBy("source"))


@query(
    "stream_gbr_fill_prev",
    """
    WITH agg AS (
      SELECT user_id,
             (1704067200000 + (epoch_ms(CAST(ts AS TIMESTAMP)) - 1704067200000)
              // 3600000 * 3600000) AS b,
             round(avg(value), 6) AS av, count(*) AS n
      FROM events
      WHERE user_id < 5
        AND epoch_ms(CAST(ts AS TIMESTAMP))
              BETWEEN 1704067200000 AND 1706659200000
      GROUP BY 1, 2),
    users AS (SELECT DISTINCT user_id FROM agg),
    grid AS (SELECT u.user_id, 1704067200000 + s.g * 3600000 AS b
             FROM users u,
                  generate_series(0, (1706659200000 - 1704067200000)
                                     // 3600000) s(g)),
    joined AS (SELECT grid.user_id, grid.b, agg.av, agg.n
               FROM grid LEFT JOIN agg
                 ON grid.user_id = agg.user_id AND grid.b = agg.b)
    SELECT user_id, make_timestamp(b * 1000) AS ts,
           last_value(av IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS av,
           last_value(n IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
    FROM joined
    """,
)
def stream_gbr_fill_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming GROUP BY RANGE with gap fill: the continuous face of
    FILL(PREVIOUS). The stream maintains per-(user, hour-window) aggs
    with bounded watermarked state; the fill scaffold runs batch-side
    over the materialized buckets (group_by_range with first() pass-
    through aggs — each streamed bucket is one row). Streaming emits
    observed buckets; fill is a deterministic post-stage, so the composed
    result equals the batch FILL(PREVIOUS) exactly."""
    import uuid as _uuid

    from griddb_spark.operators import group_by_range
    from griddb_spark.streaming import group_by_range_stream, run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = group_by_range_stream(
        ev.filter(F.col("user_id") < 5), "ts", 1, "HOUR",
        {"av": _r6(F.avg("value")), "n": F.count(F.lit(1))},
        watermark="10 minutes", by=["user_id"],
    )
    streamed = run_to_memory(out, f"gbf_{_uuid.uuid4().hex[:8]}",
                             mode="complete", shuffle_partitions=8)
    filled = group_by_range(
        streamed, "ts", 1, "HOUR",
        {"av": F.first("av"), "n": F.first("n")},
        start=EV_START, end=EV_END, fill="PREVIOUS", by=["user_id"],
    )
    return filled.select("user_id", "ts", "av", "n")


@query(
    "join_salted_skew",
    """
    SELECT o.o_orderpriority, count(*) AS n,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
    GROUP BY o.o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted equi-join (operators/skew.py): the fact side
    spreads every key over 16 salt buckets, the filtered dim side
    replicates 16x — result set identical to the plain join (the oracle IS
    the plain join), with any pathologically hot key spread across salt
    reducers. This is the explicit fallback when AQE's runtime skew split
    can't see the skew (e.g. a pre-shuffled layout)."""
    from griddb_spark.operators.skew import salted_join

    c = cat(spark, sf_dir)
    li = c.load("lineitem").select("l_orderkey", "l_extendedprice")
    orders = c.load("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-02-01").cast("timestamp"))
    ).select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    joined = salted_join(li, orders, on="l_orderkey", how="inner")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
    )


@query(
    "stream_quality_at_ingest",
    """
    WITH t AS (SELECT doc_id, text,
                 string_split_regex(trim(text), '\\s+') w
               FROM documents)
    SELECT doc_id,
           round(least(length(text)::double / 500.0, 1.0) * 0.25
           + (1.0 - round(length(regexp_replace(text, '[A-Za-z0-9\\s]', '',
             'g'))::double / length(text), 6)) * 0.5
           + least(round(len(list_filter(w, x -> x in ('the','a','an','of',
             'and','or','is','to','in','on')))::double / len(w), 6) * 5.0,
             1.0) * 0.25, 6) AS quality,
           CASE WHEN len(list_filter(w, x -> x in ('the','and','of','is',
             'with'))) > 0 THEN 'en' ELSE 'other' END AS lang_hint
    FROM t
    """,
)
def stream_quality_at_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus curation AT INGEST: the quality/language expressions run
    unchanged on a document stream (stateless projection — no watermark,
    no state; each arriving batch is scored in place, the shape of a
    filter-on-write ingest pipeline). Oracle replays the batch score."""
    import uuid as _uuid

    from griddb_spark.pipeline import quality_stats
    from griddb_spark.pipeline.text import tokens as _tokens
    from griddb_spark.streaming import run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents*.parquet")
        .parquet(sf_dir)
    )
    en = F.size(F.filter(_tokens(F.col("text")),
                         lambda t: t.isin("the", "and", "of", "is", "with")))
    out = raw.select(
        "doc_id",
        _r6(quality_stats("text")["quality_score"]).alias("quality"),
        F.when(en > 0, F.lit("en")).otherwise(F.lit("other")).alias("lang_hint"),
    )
    return run_to_memory(out, f"qi_{_uuid.uuid4().hex[:8]}", mode="append",
                         shuffle_partitions=8)


@query(
    "pipe_write_curated",
    _DUCK_CURATION_CTES
    + ", rep AS ("
    + _DUCK_CURATION_SELECT
    + """)
    SELECT (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
            % 10000) % 4 AS shard,
           count(*) AS n_rows
    FROM rep WHERE keep = 1 GROUP BY shard
    """,
)
def pipe_write_curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full pipeline, write included: curation keep-set (lang +
    quality + near-dup + contamination) → deterministic content-hash
    shards on disk → manifest re-read from the written files, so the
    end-to-end result — including the write — is oracle-verified. This is
    the 'curate and publish' job a training-data team ships."""
    import tempfile

    from griddb_spark.pipeline.sampling import write_training_shards

    from griddb_spark.pipeline.dedup import _anti_join_losers

    report = pipe_curation_report(spark, sf_dir)
    # Broadcast the DROP-set, never the keep-set: what curation keeps is
    # by construction the majority of the corpus (billions of ids at
    # 100 TB — a keep-side broadcast kills the driver), while what it
    # drops is the small complement. The bench slice is excluded by
    # predicate (pushed to the scan), matching the report's own corpus
    # scope; the drop anti-join reuses the stats-guarded helper so a
    # pathological mostly-dropped corpus degrades to SMJ instead of
    # blowing the broadcast.
    drop = report.filter(F.col("keep") == 0).select("doc_id")
    docs = cat(spark, sf_dir).load("documents")
    corpus = docs.filter(F.col("doc_id") % 41 != 0)
    kept = _anti_join_losers(corpus, drop, "doc_id")
    out = tempfile.mkdtemp(prefix="curated_") + "/docs"
    return write_training_shards(
        kept, out, "doc_id", n_shards=4, max_records_per_file=100_000
    )


@query(
    "meta_table_partitions",
    f"""
    WITH b AS (SELECT DISTINCT
                 ({EV_START_MS} + (epoch_ms(CAST(ts AS TIMESTAMP))
                  - {EV_START_MS}) // 86400000 * 86400000) AS p
               FROM events)
    SELECT 'public' AS database_name, 't' AS container_name,
           row_number() OVER (ORDER BY p) - 1 AS partition_ordinal,
           't_' || p::VARCHAR AS partition_name,
           p::VARCHAR AS boundary_value1,
           (p + 86400000)::VARCHAR AS boundary_value2,
           'NORMAL' AS status
    FROM b
    """,
)
def meta_table_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """#table_partitions meta table (meta_store.cpp:819-834): list the
    live physical partitions of a RANGE-partitioned container — interval
    bounds as strings, boundary-ordered ordinals. The oracle recomputes
    the expected day-bucket set from the raw events."""
    import tempfile

    from griddb_spark.dml import DmlTable, range_partition_expr
    from griddb_spark.perfstages import stage

    ev = cat(spark, sf_dir).load("events")
    path = tempfile.mkdtemp(prefix="dml_meta_") + "/t"
    # staged so the profile attributes the gate's wall to the dynamic-
    # partition fixture WRITE (the first-invocation committer/codegen
    # cost VERDICT r12 item 4 flagged) vs the listing that IS the query
    with stage("fixture_write"):
        t = DmlTable(
            spark, path, range_partition_expr("ts", 1, "DAY")).create(ev)
    return t.table_partitions()


@query(
    "stream_match_recognize",
    f"""
    WITH e AS ({_DUCK_EV}),
    w AS (
      SELECT user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS pv
      FROM e
    )
    SELECT user_id, ts AS spike_ts, value AS spike_value,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS match_no
    FROM w WHERE pv IS NOT NULL AND value > pv * 2
    """,
)
def stream_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATCH_RECOGNIZE (match_recognize_stream): continuous
    per-key pattern detection with the pending-tail state carrying
    partial matches across micro-batches (bounded by max_pending — the
    streaming CONF_PATTERN_MATCH_MEMORY_LIMIT analog). A bounded
    availableNow run is row-identical to the batch operator, so the
    batch spikes oracle gates it; cross-batch match completion is pinned
    by the unit test."""
    import uuid as _uuid

    from griddb_spark.streaming import run_to_memory
    from griddb_spark.streaming.stateful import match_recognize_stream

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = match_recognize_stream(
        ev,
        pattern="SPIKE",
        define={"SPIKE": "value > PREV(value) * 2"},
        measures={"spike_ts": "LAST(ts)", "spike_value": "LAST(value)"},
        partition_by=["user_id"],
        order_by="ts",
    )
    # half-core state partitions, floor 8: the vectorized matcher needs
    # real parallelism (8 partitions measured worse than 16), but
    # per-store commit time grows superlinearly with concurrent commits
    # per host (r14 sweep: med walls 1.84 s @16 vs 2.38 @32 vs 2.55 @8
    # — task-summed commitTimeMs was 24.7 s at 32 stores on a 2.4 s
    # gate). Scales with core count so the low-core driver run keeps
    # its shape; SPARK_GRAFT_STATE_PARTITIONS overrides for production.
    return run_to_memory(out, f"mr_{_uuid.uuid4().hex[:8]}", mode="append",
                         shuffle_partitions=max(
                             8,
                             spark.sparkContext.defaultParallelism // 2))


@query(
    "stream_match_two_var",
    f"""
    WITH e AS ({_DUCK_EV}),
    r0 AS (SELECT user_id, ts, value,
             value >= 150 AS a, value < 150 AS b,
             row_number() OVER w AS rn,
             coalesce(lag(value >= 150) OVER w, FALSE) AS pa,
             coalesce(lag(value < 150) OVER w, FALSE) AS pb
           FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    r AS (SELECT user_id, ts, value, a, b, rn,
            sum(CASE WHEN a AND NOT pa THEN 1 ELSE 0 END) OVER w AS arun,
            sum(CASE WHEN b AND NOT pb THEN 1 ELSE 0 END) OVER w AS brun
          FROM r0 WINDOW w AS (PARTITION BY user_id ORDER BY rn)),
    r2 AS (SELECT *,
             min(ts) OVER (PARTITION BY user_id, arun, a) AS run_start_ts,
             max(ts) OVER (PARTITION BY user_id, brun, b) AS bend_ts
           FROM r),
    anch AS (SELECT *, lead(bend_ts) OVER w2 AS end_ts,
                    coalesce(lead(b) OVER w2, FALSE) AS nb
             FROM r2 WINDOW w2 AS (PARTITION BY user_id ORDER BY rn))
    SELECT user_id, run_start_ts AS start_ts, end_ts,
           row_number() OVER (PARTITION BY user_id ORDER BY rn) AS match_no
    FROM anch WHERE a AND nb
    """,
)
def stream_match_two_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming TWO-variable MATCH_RECOGNIZE: the spike-then-recover
    sequence ``A+ B+`` detected continuously at ingest — the pending-tail
    state carries a still-open A-run (or an A-run whose B-run hasn't
    closed) across micro-batch boundaries, so matches straddling batches
    complete exactly once. The same batch window-algebra oracle as
    ``match_recognize_two_var`` gates it: streaming availableNow replay
    must equal the batch result row-for-row."""
    import uuid as _uuid

    from griddb_spark.streaming import run_to_memory
    from griddb_spark.streaming.stateful import match_recognize_stream

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = match_recognize_stream(
        ev,
        pattern="A+ B+",
        define={"A": "value >= 150", "B": "value < 150"},
        measures={"start_ts": "FIRST(ts)", "end_ts": "LAST(ts)"},
        partition_by=["user_id"],
        order_by="ts",
    )
    # half-core state partitions, floor 8 (see stream_match_recognize:
    # r14 sweep med walls 1.74 s @16 vs 2.07 @32 vs 2.70 @8)
    return run_to_memory(out, f"mr2_{_uuid.uuid4().hex[:8]}", mode="append",
                         shuffle_partitions=max(
                             8,
                             spark.sparkContext.defaultParallelism // 2))


@query(
    "pipe_quality_gopher",
    r"""
    WITH t AS (SELECT doc_id, text,
                      string_split_regex(trim(text), '\s+') AS w,
                      string_split(text, chr(10)) AS lines
               FROM documents),
    m AS (SELECT doc_id,
                 len(w) AS n_words,
                 list_aggregate(list_transform(w, x -> length(x)), 'sum')
                   ::double / len(w) AS mwl,
                 (length(text) - length(replace(text, '#', ''))
                  + len(regexp_extract_all(text, '\.\.\.')))::double
                   / len(w) AS sym_ratio,
                 len(list_filter(lines,
                     l -> regexp_matches(ltrim(l), '^[-*•]')))::double
                   / len(lines) AS bullet_frac,
                 len(list_filter(lines,
                     l -> regexp_matches(l, '\.\.\.$')))::double
                   / len(lines) AS ellipsis_frac,
                 len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                   ::double / len(w) AS alpha_frac,
                 len(list_filter(['the','be','to','of','and','that',
                                  'have','with'],
                     s -> list_contains(w, s))) AS stop_hits
          FROM t)
    SELECT doc_id, n_words,
           n_words >= 50 AND n_words <= 100000 AS r_word_count,
           mwl >= 3.0 AND mwl <= 10.0 AS r_mean_word_len,
           sym_ratio < 0.1 AS r_symbol_ratio,
           bullet_frac < 0.9 AS r_bullet_lines,
           ellipsis_frac < 0.3 AS r_ellipsis_lines,
           alpha_frac > 0.8 AS r_alpha_words,
           stop_hits >= 2 AS r_stopwords,
           (n_words >= 50 AND n_words <= 100000)
             AND (mwl >= 3.0 AND mwl <= 10.0)
             AND sym_ratio < 0.1 AND bullet_frac < 0.9
             AND ellipsis_frac < 0.3 AND alpha_frac > 0.8
             AND stop_hits >= 2 AS gopher_keep
    FROM m
    """,
)
def pipe_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published Gopher/MassiveText rule battery (Rae et al. 2021,
    Appendix A; pipeline/quality.py): seven per-document keep/drop rules
    (word count, mean word length, symbol ratio, bullet/ellipsis lines,
    alpha-word fraction, required stopwords) + their conjunction. Pure
    column math fused into the scan — no shuffle, no UDF; the oracle
    replays every rule's exact integer/IEEE arithmetic."""
    from griddb_spark.pipeline import with_gopher_keep

    docs = cat(spark, sf_dir).load("documents")
    return with_gopher_keep(docs)


@query(
    "pipe_sample_weighted",
    """
    WITH r AS (
      SELECT doc_id, source, n_chars,
             round(-ln((('0x' || substr(md5(doc_id::varchar), 1, 8))::BIGINT
                        + 0.5) / 4294967296.0)
                   / n_chars::double, 6) AS akey
      FROM documents),
    k AS (SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY akey, doc_id) AS rk
          FROM r)
    SELECT doc_id, source, n_chars FROM k WHERE rk <= 5
    """,
)
def pipe_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis-Spirakis A-ES,
    pipeline/sampling.py): 5 docs per source with inclusion probability
    proportional to document length — the exponential key -ln(u)/w comes
    from the doc id's content hash, so the sample is identical across
    runs, partitionings, and engines (a true reservoir is stream-order-
    dependent). One stratum shuffle + windowed top-k."""
    from griddb_spark.pipeline import weighted_fixed_k

    docs = cat(spark, sf_dir).load("documents")
    return weighted_fixed_k(
        docs.select("doc_id", "source", "n_chars"),
        "doc_id", "n_chars", k=5, stratum_col="source",
    )


@query(
    "pipe_sketch_kmv",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             (((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296)::BIGINT AS h
      FROM events),
    r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) rk
          FROM h)
    SELECT event_type, count(*) AS n_kept,
           CASE WHEN count(*) < 64 THEN count(*)::double
                ELSE 63.0 * 4294967296.0 / max(h) END AS est_distinct
    FROM r WHERE rk <= 64
    GROUP BY event_type
    """,
)
def pipe_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002;
    pipeline/sketches.py): per event_type the 64 smallest distinct user
    hashes pin the cardinality estimate. The sketch that supports SET
    ALGEBRA downstream (union/intersect/Jaccard between sketches —
    pipe_sketch_kmv_setops) where HLL only unions; k hashes of state per
    group at any corpus size."""
    from griddb_spark.pipeline import kmv_distinct

    ev = cat(spark, sf_dir).load("events")
    return kmv_distinct(ev, ["event_type"], "user_id", k=64)


@query(
    "pipe_sketch_kmv_setops",
    """
    WITH h AS (
      SELECT DISTINCT event_type AS g,
             (((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296)::BIGINT AS h
      FROM events WHERE event_type IN ('click', 'purchase')),
    per AS (SELECT g, h,
                   row_number() OVER (PARTITION BY g ORDER BY h) rk
            FROM h QUALIFY rk <= 64),
    pool AS (SELECT h, max(CASE WHEN g = 'click' THEN 1 ELSE 0 END) ina,
                    max(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END) inb
             FROM per GROUP BY h),
    up AS (SELECT h, ina, inb,
                  row_number() OVER (ORDER BY h) rk
           FROM pool QUALIFY rk <= 64),
    u AS (SELECT CASE WHEN count(*) < 64 THEN count(*)::double
                      ELSE 63.0 * 4294967296.0 / max(h) END est_union,
                 count(*) nk, sum(ina * inb) nb FROM up),
    ea AS (SELECT CASE WHEN count(*) < 64 THEN count(*)::double
                       ELSE 63.0 * 4294967296.0 / max(h) END est_a
           FROM per WHERE g = 'click'),
    eb AS (SELECT CASE WHEN count(*) < 64 THEN count(*)::double
                       ELSE 63.0 * 4294967296.0 / max(h) END est_b
           FROM per WHERE g = 'purchase')
    SELECT est_a, est_b, est_union,
           (nb::double / nk::double) * est_union AS est_intersect,
           ((nb::double / nk::double) * est_union) / est_union AS jaccard
    FROM ea, eb, u
    """,
)
def pipe_sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-side set algebra (theta-sketch form): |click ∩ purchase|
    users, union and Jaccard, computed from two 64-hash KMV sketches alone
    — the 100 TB pattern where per-source id sketches flow to the driver
    and any pairwise overlap matrix is sketch math, never a re-scan or a
    raw-data join. Fixed-order IEEE arithmetic; the oracle replays it."""
    from griddb_spark.pipeline import kmv_set_ops

    ev = cat(spark, sf_dir).load("events")
    return kmv_set_ops(ev, "event_type", "user_id", "click", "purchase",
                       k=64)


#: PQ train+encode replay (m=4 subspaces of 16 dims, k=8 codes, one Lloyd
#: iteration) as a CTE continuation: expects ``v(vec_id, ev)`` to be
#: defined upstream; exposes ``pu1`` (codebooks) and ``ps2`` (codes).
_PQ_CTE = """
    , psub AS (SELECT vec_id, j, ev[j*16+1 : j*16+16] AS sv
               FROM v CROSS JOIN range(0, 4) r(j)),
    pc0 AS (SELECT j, row_number() OVER (PARTITION BY j ORDER BY vec_id) - 1
                     AS c, sv AS cv
            FROM psub WHERE vec_id IN (SELECT vec_id FROM v
                                       ORDER BY vec_id LIMIT 8)),
    pa1 AS (SELECT s.vec_id, s.j, s.sv, pc0.c,
              row_number() OVER (PARTITION BY s.vec_id, s.j
                ORDER BY round((SELECT sum((s.sv[i]-pc0.cv[i])^2)
                                FROM range(1,17) t(i)), 6) ASC,
                         pc0.c ASC) AS rn
            FROM psub s JOIN pc0 USING (j)),
    ps1 AS (SELECT vec_id, j, sv, c FROM pa1 WHERE rn = 1),
    pu1 AS (SELECT j, c, list(m ORDER BY pos) AS cv FROM (
              SELECT j, c, pos, round(avg(x), 6) AS m FROM (
                SELECT j, c, generate_subscripts(sv, 1) AS pos,
                       unnest(sv) AS x FROM ps1) GROUP BY j, c, pos)
            GROUP BY j, c),
    pa2 AS (SELECT s.vec_id, s.j, pu1.c,
              row_number() OVER (PARTITION BY s.vec_id, s.j
                ORDER BY round((SELECT sum((s.sv[i]-pu1.cv[i])^2)
                                FROM range(1,17) t(i)), 6) ASC,
                         pu1.c ASC) AS rn
            FROM psub s JOIN pu1 USING (j)),
    ps2 AS (SELECT vec_id, j, c FROM pa2 WHERE rn = 1)
"""


@query(
    "pipe_ann_pq",
    """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings)
    """
    + _PQ_CTE
    + """
    , q AS (SELECT vec_id AS q_id, ev AS qv FROM v WHERE vec_id < 3),
    lut AS (SELECT q.q_id, pu1.j, pu1.c,
              CAST(round((SELECT sum((q.qv[pu1.j*16+i] - pu1.cv[i])^2)
                          FROM range(1,17) t(i)), 6) AS DECIMAL(18,6)) AS ld
            FROM q CROSS JOIN pu1),
    adc AS (SELECT l.q_id, ps2.vec_id, CAST(sum(l.ld) AS DOUBLE) AS adc_dist
            FROM ps2 JOIN lut l ON ps2.j = l.j AND ps2.c = l.c
            GROUP BY l.q_id, ps2.vec_id)
    SELECT q_id, vec_id, adc_dist, CAST(rn AS INT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist, vec_id) AS rn
      FROM adc) WHERE rn <= 5
    """,
)
def pipe_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN (Jégou et al. 2011; pipeline/similarity.py):
    train m=4 subspace codebooks (one exploded scan, all subspaces
    concurrently), encode every vector to 4 small codes as a pure
    projection, then answer queries in the COMPRESSED domain — ADC = m
    lookup-table reads + an exact decimal sum per doc, never touching raw
    vectors. The memory layout that makes billion-vector search
    RAM-resident (4 bytes/vector here vs 256 raw). The oracle replays
    train→encode→ADC under the shared 6dp fixed-point contract."""
    from griddb_spark.pipeline import pq_adc_topk, pq_encode

    emb = cat(spark, sf_dir).load("embeddings")
    books = _shared_books(emb, sf_dir)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    qs = [(r.vec_id, list(r.embedding))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    return pq_adc_topk(codes, books, qs, topk=5)


@query(
    "stream_hll_sketch",
    """
    WITH h AS (
      SELECT time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)) AS ts,
             (((user_id % 4294967296)::HUGEINT * 2654435761) % 4294967296)::BIGINT AS h
      FROM events),
    r AS (SELECT ts, h % 256 AS idx,
                 CASE WHEN h // 256 = 0 THEN 25
                      ELSE 25 - length(bin(h // 256)) END AS rho
          FROM h),
    mx AS (SELECT ts, idx, max(rho) AS mj FROM r GROUP BY ts, idx),
    s AS (SELECT ts, count(*) AS n_registers,
                 sum(power(2.0, -mj)) AS s_present
          FROM mx GROUP BY ts)
    SELECT ts, n_registers,
           CAST(0.7182725932495458 AS DOUBLE) * CAST(65536 AS DOUBLE)
             / (CAST(256 - n_registers AS DOUBLE) + s_present)
             AS est_distinct
    FROM s
    """,
)
def stream_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-hour HyperLogLog cardinality over the event stream:
    the stream materializes only the mergeable (window, register, max-rho)
    sketch — ≤256 rows of state per open window at ANY user cardinality,
    the guarantee the linear-counting hit-set loses once n >> m — and the
    batch side finishes the Flajolet estimate from the materialized
    registers (hll_estimate_from_registers; the same read path merges
    stream + batch + shard sketches by register-wise max). Oracle replays
    the identical register math per hour window."""
    import uuid as _uuid

    from griddb_spark.pipeline.sketches import hll_estimate_from_registers
    from griddb_spark.streaming import hll_sketch_stream, run_to_memory

    prepare(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )
    if dict(raw.dtypes)["ts"] == "bigint":
        ev = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        ev = raw
    out = hll_sketch_stream(ev, "ts", "user_id", 1, "HOUR", p=8,
                            watermark="10 minutes")
    regs = run_to_memory(out, f"hll_{_uuid.uuid4().hex[:8]}",
                         mode="complete", shuffle_partitions=8)
    return hll_estimate_from_registers(regs, ["ts"], p=8, mj_col="mj")


@query(
    "pipe_ann_ivfpq",
    _KMEANS_CTE + _PQ_CTE + """
    , pos2 AS (SELECT cidx, generate_subscripts(ev, 1) AS p,
                      unnest(ev) AS x FROM s2),
    byp2 AS (SELECT cidx, p, avg(x) AS x FROM pos2 GROUP BY cidx, p),
    cent2 AS (SELECT cidx, list(x ORDER BY p) AS centroid
              FROM byp2 GROUP BY cidx),
    q AS (SELECT vec_id AS q_id, ev AS qv FROM v WHERE vec_id < 3),
    qc AS (SELECT q_id, qv, cidx,
             round(list_dot_product(qv, centroid)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(centroid, centroid))), 6) AS cc
           FROM q CROSS JOIN cent2),
    probes AS (SELECT q_id, qv, cidx FROM
                 (SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY cc DESC, cidx) AS pr FROM qc)
               WHERE pr <= 2),
    lut AS (SELECT q.q_id, pu1.j, pu1.c,
              CAST(round((SELECT sum((q.qv[pu1.j*16+i] - pu1.cv[i])^2)
                          FROM range(1,17) t(i)), 6) AS DECIMAL(18,6)) AS ld
            FROM q CROSS JOIN pu1),
    cand AS (SELECT DISTINCT p.q_id, e.vec_id
             FROM probes p JOIN s2 e ON e.cidx = p.cidx
             WHERE e.vec_id != p.q_id),
    adc AS (SELECT c.q_id, c.vec_id, CAST(sum(l.ld) AS DOUBLE) AS adc_dist
            FROM cand c
            JOIN ps2 ON ps2.vec_id = c.vec_id
            JOIN lut l ON l.q_id = c.q_id AND l.j = ps2.j AND l.c = ps2.c
            GROUP BY c.q_id, c.vec_id)
    SELECT q_id, vec_id, adc_dist, CAST(rn AS INT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist, vec_id) AS rn
      FROM adc) WHERE rn <= 5
    """,
)
def pipe_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, the standard billion-scale ANN index (FAISS IVFx,PQy;
    pipeline/similarity.py ivfpq_topk): a trained k-means coarse
    quantizer routes each query to its 2 nearest cells (the ann_ivf
    probe contract), and only those cells' vectors are scored — in the
    COMPRESSED domain via PQ-ADC lookup-table sums. A query touches
    nprobe/coarse_k of the corpus and m bytes per candidate; at scale
    the encoded corpus is Hive-partitioned by cell so the probe is a
    partition-pruned scan. The oracle replays coarse k-means, PQ
    train/encode, probe routing, and the exact-decimal ADC. Quantizers
    come from the shared once-per-corpus ivfpq_train artifact
    (_ANN_TRAIN_CACHE) — train is a build step, not a query step."""
    from griddb_spark.pipeline import ivfpq_topk

    emb = cat(spark, sf_dir).load("embeddings")
    qs = [(r.vec_id, list(r.embedding))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    trained = _ivfpq_trained(emb, sf_dir)
    return ivfpq_topk(emb, "vec_id", "embedding", in_dim=64, queries=qs,
                      coarse_k=_adaptive_k_cached(emb, sf_dir), m=4, k=8, nprobe=2,
                      topk=5, trained=trained,
                      codes=_ivfpq_codes("codes", emb, sf_dir, trained))


_IVFPQ_BATCH_ORACLE = _KMEANS_CTE + _PQ_CTE + """
    , pos2 AS (SELECT cidx, generate_subscripts(ev, 1) AS p,
                      unnest(ev) AS x FROM s2),
    byp2 AS (SELECT cidx, p, avg(x) AS x FROM pos2 GROUP BY cidx, p),
    cent2 AS (SELECT cidx, list(x ORDER BY p) AS centroid
              FROM byp2 GROUP BY cidx),
    q AS (SELECT vec_id AS q_id, ev AS qv FROM v WHERE vec_id < 100),
    qc AS (SELECT q_id, qv, cidx,
             round(list_dot_product(qv, centroid)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(centroid, centroid))), 6) AS cc
           FROM q CROSS JOIN cent2),
    probes AS (SELECT q_id, qv, cidx FROM
                 (SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY cc DESC, cidx) AS pr FROM qc)
               WHERE pr <= 2),
    lut AS (SELECT q.q_id, pu1.j, pu1.c,
              CAST(round((SELECT sum((q.qv[pu1.j*16+i] - pu1.cv[i])^2)
                          FROM range(1,17) t(i)), 6) AS DECIMAL(18,6)) AS ld
            FROM q CROSS JOIN pu1),
    cand AS (SELECT DISTINCT p.q_id, e.vec_id
             FROM probes p JOIN s2 e ON e.cidx = p.cidx
             WHERE e.vec_id != p.q_id),
    adc AS (SELECT c.q_id, c.vec_id, CAST(sum(l.ld) AS DOUBLE) AS adc_dist
            FROM cand c
            JOIN ps2 ON ps2.vec_id = c.vec_id
            JOIN lut l ON l.q_id = c.q_id AND l.j = ps2.j AND l.c = ps2.c
            GROUP BY c.q_id, c.vec_id)
    SELECT q_id, vec_id, adc_dist, CAST(rn AS INT) AS rn FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY adc_dist, vec_id) AS rn
      FROM adc) WHERE rn <= 5
    """


@query("pipe_ann_ivfpq_batch", _IVFPQ_BATCH_ORACLE)
def pipe_ann_ivfpq_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ BATCH serving (VERDICT r5 #3): 100 queries arrive as a
    DataFrame and the whole batch compiles to ONE join tree — windowed
    nprobe cell routing, broadcast (q_id, cell) probe join against the
    encoded corpus, broadcast DECIMAL(18,6) ADC-LUT join, exact decimal
    sum, per-query top-k window — where the point-probe form
    (pipe_ann_ivfpq) builds a plan branch per query. Same deterministic
    contracts; results match the loop path bit-for-bit (parity-tested).
    Reference capability analog: the multiGet/fetchAll batch-read
    patterns (TimeSeries.java:136-617)."""
    from griddb_spark.pipeline import ivfpq_topk_batch

    emb = cat(spark, sf_dir).load("embeddings")
    qdf = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    trained = _ivfpq_trained(emb, sf_dir)
    return ivfpq_topk_batch(emb, "vec_id", "embedding", in_dim=64,
                            queries=qdf, coarse_k=_adaptive_k_cached(emb, sf_dir), m=4,
                            k=8, nprobe=2, topk=5, trained=trained,
                            codes=_ivfpq_codes("codes", emb, sf_dir,
                                               trained))


@query("pipe_ann_index_serve", _IVFPQ_BATCH_ORACLE)
def pipe_ann_index_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ SERVED FROM DISK (ivfpq_index_write/ivfpq_index_topk):
    the encoded corpus persists Hive-partitioned by coarse cell + a JSON
    quantizer sidecar, and the 100-query batch reads ONLY the probed
    cell directories (cluster IN (...) is a partition filter —
    plan-tested). Same deterministic contracts as the in-memory batch
    path, so the same oracle gates both; this is the index layout a
    100 TB corpus would publish once and serve forever."""
    from griddb_spark.pipeline import ivfpq_index_topk, ivfpq_index_write

    emb = cat(spark, sf_dir).load("embeddings")
    path = _serve_index_path(sf_dir)
    trained = _ivfpq_trained(emb, sf_dir)
    ivfpq_index_write(emb, path, "vec_id", "embedding", in_dim=64,
                      coarse_k=_adaptive_k_cached(emb, sf_dir), m=4, k=8,
                      trained=trained,
                      codes=_ivfpq_codes("codes", emb, sf_dir, trained))
    qdf = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    return ivfpq_index_topk(spark, path, qdf, nprobe=2, topk=5)


#: IVF-PQ top-5 (the certified batch-serving CTE, re-used verbatim up to
#: `adc`) intersected per-query with the exact brute-force top-5 (the
#: certified knn formulation) → recall@5. DuckDB replays the WHOLE
#: approx pipeline (train, route, ADC) and the exact ground truth, so
#: the recall numbers gate end-to-end. The tail is shared between the
#: i.i.d. gate (queries = vec_id < 100) and the clustered-fixture gate
#: (vec_id < 64) — __QMAX__ is the only difference.
_ANN_RECALL_TAIL = """
    , pos2 AS (SELECT cidx, generate_subscripts(ev, 1) AS p,
                      unnest(ev) AS x FROM s2),
    byp2 AS (SELECT cidx, p, avg(x) AS x FROM pos2 GROUP BY cidx, p),
    cent2 AS (SELECT cidx, list(x ORDER BY p) AS centroid
              FROM byp2 GROUP BY cidx),
    q AS (SELECT vec_id AS q_id, ev AS qv FROM v WHERE vec_id < __QMAX__),
    qc AS (SELECT q_id, qv, cidx,
             round(list_dot_product(qv, centroid)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(centroid, centroid))), 6) AS cc
           FROM q CROSS JOIN cent2),
    probes AS (SELECT q_id, qv, cidx FROM
                 (SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY cc DESC, cidx) AS pr FROM qc)
               WHERE pr <= 2),
    lut AS (SELECT q.q_id, pu1.j, pu1.c,
              CAST(round((SELECT sum((q.qv[pu1.j*16+i] - pu1.cv[i])^2)
                          FROM range(1,17) t(i)), 6) AS DECIMAL(18,6)) AS ld
            FROM q CROSS JOIN pu1),
    cand AS (SELECT DISTINCT p.q_id, e.vec_id
             FROM probes p JOIN s2 e ON e.cidx = p.cidx
             WHERE e.vec_id != p.q_id),
    adc AS (SELECT c.q_id, c.vec_id, CAST(sum(l.ld) AS DOUBLE) AS adc_dist
            FROM cand c
            JOIN ps2 ON ps2.vec_id = c.vec_id
            JOIN lut l ON l.q_id = c.q_id AND l.j = ps2.j AND l.c = ps2.c
            GROUP BY c.q_id, c.vec_id),
    approx AS (SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY adc_dist, vec_id) AS rn
        FROM adc) WHERE rn <= 5),
    bfs AS (SELECT q.q_id, e.vec_id,
              round(list_dot_product(q.qv, e.ev)
                    / (sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.ev, e.ev))), 6) AS cs
            FROM q CROSS JOIN v e WHERE e.vec_id != q.q_id),
    exact AS (SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY cs DESC, vec_id) AS rk
        FROM bfs) WHERE rk <= 5),
    hits AS (SELECT a.q_id, count(*) AS h
             FROM approx a JOIN exact e
               ON e.q_id = a.q_id AND e.vec_id = a.vec_id
             GROUP BY a.q_id),
    den AS (SELECT q_id, count(*) AS n FROM exact GROUP BY q_id)
    SELECT d.q_id, round(coalesce(h.h, 0) / CAST(d.n AS DOUBLE), 6)
             AS recall
    FROM den d LEFT JOIN hits h ON h.q_id = d.q_id
    """

_ANN_RECALL_ORACLE = _KMEANS_CTE + _PQ_CTE + _ANN_RECALL_TAIL.replace(
    "__QMAX__", "100")


@query("pipe_ann_recall", _ANN_RECALL_ORACLE)
def pipe_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of IVF-PQ batch serving against exact brute-force ground
    truth (``topk_recall``) — the quality gauge an ANN deployment tunes
    nprobe/occupancy against (FAISS's recall-vs-nprobe methodology),
    as a first-class certified operator rather than a probe script. The
    approx side is the certified ``ivfpq_topk_batch`` pipeline (same
    trained artifact memo, nprobe=2, top-5); the exact side is the
    certified ``knn_bruteforce`` formulation at k=5; the recall join
    runs on |queries|·k rows regardless of corpus size. The oracle
    replays BOTH pipelines and the intersection in SQL.

    Expect LOW absolute recall on this fixture (~0.10 mean at sf0.01):
    i.i.d. gaussian vectors are the adversarial case for product
    quantization — no cluster structure, so 4×8-code ADC distances are
    near-noise. That is the measurement working, not failing; real
    embedding corpora (and wider codes) score far higher, and this gate
    certifies the recall MATH end-to-end either way."""
    from griddb_spark.pipeline import (
        ivfpq_topk_batch,
        knn_bruteforce,
        topk_recall,
    )

    emb = cat(spark, sf_dir).load("embeddings")
    qdf = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    trained = _ivfpq_trained(emb, sf_dir)
    approx = ivfpq_topk_batch(
        emb, "vec_id", "embedding", in_dim=64, queries=qdf,
        coarse_k=_adaptive_k_cached(emb, sf_dir), m=4, k=8, nprobe=2,
        topk=5, trained=trained,
        codes=_ivfpq_codes("codes", emb, sf_dir, trained),
    )
    exact = knn_bruteforce(emb, emb.filter(F.col("vec_id") < 100), k=5)
    return topk_recall(
        approx.select("q_id", "vec_id"),
        exact.select("q_id", F.col("n_id").alias("vec_id")),
    )


#: Planted-cluster fixture, derived DETERMINISTICALLY from the committed
#: embeddings table (no generated file, no RNG — both engines compute the
#: same rows from the same parquet bytes): the first 384 vectors are
#: mapped onto 64 well-separated planted clusters of 6 members each.
#: Cluster c = vec_id % 64 has digit vector (c0..c3), one digit per PQ
#: subspace j: cj = (c%8 + mj·(c//8)) % 8 with mj ∈ (0,1,3,5) — a Latin
#: construction with two properties the quantizers need:
#:   * ids 0..7 land in clusters 0..7 whose digits span 0..7 in EVERY
#:     subspace, so the lowest-id inits of BOTH trainers (coarse k-means
#:     LIMIT 64 → one seed per cluster; PQ's 8-lowest-id subvectors →
#:     all 8 one-hot patterns per subspace) start from the planted truth;
#:   * any two clusters share at most one digit (c0=a is shared iff a=a';
#:     mj invertible mod 8 forces the rest apart), so inter-cluster
#:     cosine ≤ ~0.25 while intra-cluster ≈ 0.999.
#: The vector itself: amplitude 6.0 on the one hot coordinate (16j + cj)
#: per subspace + 0.05× the original float vector as noise. Exact top-5
#: of each query = its 5 cluster-mates (cos ≈ 1 vs ≤ 0.25); ADC puts
#: mates at ≈0.2 (shared code, noise-level LUT distance) and every
#: foreign candidate at ≥ ~140 (≥3 differing one-hot subspaces), so
#: recall@5 at nprobe=2 is ~1.0 — the separable-data operating point a
#: deployment tunes nprobe against (the FAISS recall-curve regime),
#: where pipe_ann_recall's i.i.d. fixture documents the adversarial
#: ~0.10 floor.
_CLUSTERED_V_SQL = """SELECT vec_id, list(
        CASE WHEN (p-1) % 16 =
               ((vec_id % 64) % 8
                + (CASE (p-1)//16 WHEN 0 THEN 0 WHEN 1 THEN 1
                        WHEN 2 THEN 3 ELSE 5 END)
                  * ((vec_id % 64) // 8)) % 8
             THEN 6.0 + 0.05 * x ELSE 0.05 * x END ORDER BY p) AS ev
      FROM (SELECT vec_id, generate_subscripts(bv, 1) AS p, unnest(bv) AS x
            FROM (SELECT vec_id, embedding::DOUBLE[] AS bv FROM embeddings
                  WHERE vec_id < 384))
      GROUP BY vec_id"""

#: The certified k-means CTE over the clustered fixture: corpus swapped
#: for the derived vectors, init LIMIT pinned to 64 (cells = planted
#: clusters). Shared by the clustered recall gate and the nprobe curve.
_CLUSTERED_KMEANS_CTE = (
    _KMEANS_CTE
    .replace("SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings",
             _CLUSTERED_V_SQL)
    .replace("LIMIT greatest(8, (SELECT count(*) FROM v) // 250)",
             "LIMIT 64")
)

#: Same certified k-means + PQ + recall replay as _ANN_RECALL_ORACLE —
#: only the corpus (derived clustered vectors), the coarse k (64: cells
#: = planted clusters), and the query set (one per cluster) change.
_ANN_RECALL_CLUSTERED_ORACLE = (
    _CLUSTERED_KMEANS_CTE
    + _PQ_CTE
    + _ANN_RECALL_TAIL.replace("__QMAX__", "64")
)

#: Spark-side mirror of _CLUSTERED_V_SQL (same double arithmetic in the
#: same order: CASE picks the whole 6.0 + 0.05·x / 0.05·x expression so
#: even signed zeros agree).
_CLUSTERED_FIXTURE_EXPR = """transform(cast(embedding as array<double>),
  (x, i) -> CASE WHEN i % 16 =
                 ((vec_id % 64) % 8
                  + (CASE cast(i div 16 as int) WHEN 0 THEN 0
                          WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 5 END)
                    * ((vec_id % 64) div 8)) % 8
            THEN 6.0D + 0.05D * x ELSE 0.05D * x END)"""


def _clustered_fixture(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding double[64]) planted-cluster corpus — a pure
    projection over the committed table (no shuffle, no action)."""
    return emb.filter(F.col("vec_id") < 384).select(
        "vec_id", F.expr(_CLUSTERED_FIXTURE_EXPR).alias("embedding"))


def _clustered_trained(cemb, sf_dir: str) -> dict:
    """ivfpq_train on the clustered fixture (coarse_k=64 so cells = the
    planted clusters), memoized per corpus state like _ivfpq_trained —
    its own cache kind because the corpus differs from the shared
    artifacts'."""
    from griddb_spark.pipeline import ivfpq_train

    key = ("ivfpq_clst", sf_dir, _emb_fingerprint(sf_dir))
    art = _ANN_TRAIN_CACHE.get(key)
    if art is None:
        from griddb_spark.perfstages import stage

        with stage("train_ivfpq_clustered"):
            # local=True: the fixture is ≤384 rows BY CONSTRUCTION
            # (vec_id < 384) at every sf — the planning-time estimate
            # can't see through the filter, but the bound is proven
            art = ivfpq_train(cemb, "vec_id", "embedding", 64,
                              coarse_k=64, m=4, k=8, local=True)
        _ann_cache_put(key, art)
    return art


@query("pipe_ann_recall_clustered", _ANN_RECALL_CLUSTERED_ORACLE)
def pipe_ann_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF-PQ stack on SEPARABLE data (VERDICT r11 next
    item 2): pipe_ann_recall certifies the recall MATH but its i.i.d.
    gaussian fixture is the documented adversarial case for PQ (~0.10
    mean recall); this gate runs the identical ivfpq_topk_batch vs
    knn_bruteforce measurement over a planted 64-cluster derivation of
    the same table (see _CLUSTERED_V_SQL) and comes back at ~1.0 —
    together they bracket the recall-vs-structure curve a deployment
    tunes nprobe against. One query per planted cluster (vec_id < 64);
    the oracle replays BOTH pipelines and the intersection in SQL.
    Reference capability analog: the nearest-row TIME_NEXT/PREV family
    (selection_func.h:126-300) generalized to vector space."""
    from griddb_spark.pipeline import (
        ivfpq_topk_batch,
        knn_bruteforce,
        topk_recall,
    )

    emb = cat(spark, sf_dir).load("embeddings")
    cemb = _clustered_fixture(emb)
    qdf = cemb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv")
    )
    trained = _clustered_trained(cemb, sf_dir)
    approx = ivfpq_topk_batch(
        cemb, "vec_id", "embedding", in_dim=64, queries=qdf,
        coarse_k=64, m=4, k=8, nprobe=2, topk=5, trained=trained,
        codes=_ivfpq_codes("codes_clst", cemb, sf_dir, trained),
    )
    exact = knn_bruteforce(cemb, cemb.filter(F.col("vec_id") < 64), k=5)
    return topk_recall(
        approx.select("q_id", "vec_id"),
        exact.select("q_id", F.col("n_id").alias("vec_id")),
    )


#: Recall at nprobe ∈ {1, 2} against exact top-11 for BIASED-MIDPOINT
#: queries over the clustered fixture: q(i) = fixture(i) + 0.5·
#: fixture(i+1), i < 32. By construction the exact top-11 is the 5
#: cluster-mates of i (cos ≈ 0.90) plus ALL 6 members of cluster i+1
#: (cos ≈ 0.45, vs ≤ ~0.34 for any other cluster — two clusters share
#: ≤1 digit, so a third cluster can overlap q's two components by at
#: most one digit each: (36 + 0.5·36)/|q||v| ≈ 0.34). Routing probes
#: cell i first (0.90) and cell i+1 second (0.45), so the candidate set
#: is exactly the 5 mates at nprobe=1 and exactly the 11 true neighbors
#: at nprobe=2 — recall@11 is 5/11 then 1.0 DETERMINISTICALLY,
#: independent of ADC values (topk=11 ≥ |candidates| keeps every
#: candidate). The oracle needs no PQ replay for the same reason: the
#: result depends only on cell membership, which the k-means CTE fixes.
_ANN_NPROBE_CURVE_ORACLE = _CLUSTERED_KMEANS_CTE + """
    , pos2 AS (SELECT cidx, generate_subscripts(ev, 1) AS p,
                      unnest(ev) AS x FROM s2),
    byp2 AS (SELECT cidx, p, avg(x) AS x FROM pos2 GROUP BY cidx, p),
    cent2 AS (SELECT cidx, list(x ORDER BY p) AS centroid
              FROM byp2 GROUP BY cidx),
    q AS (SELECT t.vec_id AS q_id, list(t.ax + 0.5 * t.bx ORDER BY t.p)
                   AS qv
          FROM (SELECT a.vec_id, generate_subscripts(a.ev, 1) AS p,
                       unnest(a.ev) AS ax, unnest(b.ev) AS bx
                FROM v a JOIN v b ON b.vec_id = a.vec_id + 1
                WHERE a.vec_id < 32) t
          GROUP BY t.vec_id),
    qc AS (SELECT q_id, qv, cidx,
             round(list_dot_product(qv, centroid)
                   / (sqrt(list_dot_product(qv, qv))
                      * sqrt(list_dot_product(centroid, centroid))), 6)
               AS cc
           FROM q CROSS JOIN cent2),
    probes AS (SELECT q_id, cidx, pr FROM
                 (SELECT *, row_number() OVER (PARTITION BY q_id
                    ORDER BY cc DESC, cidx) AS pr FROM qc)
               WHERE pr <= 2),
    cand AS (SELECT p.q_id, e.vec_id, p.pr
             FROM probes p JOIN s2 e ON e.cidx = p.cidx
             WHERE e.vec_id != p.q_id),
    bfs AS (SELECT q.q_id, e.vec_id,
              round(list_dot_product(q.qv, e.ev)
                    / (sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.ev, e.ev))), 6) AS cs
            FROM q CROSS JOIN v e WHERE e.vec_id != q.q_id),
    exact AS (SELECT q_id, vec_id FROM (
        SELECT *, row_number() OVER (PARTITION BY q_id
                                     ORDER BY cs DESC, vec_id) AS rk
        FROM bfs) WHERE rk <= 11),
    nps AS (SELECT 1 AS np UNION ALL SELECT 2),
    hits AS (SELECT n.np, c.q_id, count(*) AS h
             FROM nps n JOIN cand c ON c.pr <= n.np
             JOIN exact e ON e.q_id = c.q_id AND e.vec_id = c.vec_id
             GROUP BY n.np, c.q_id),
    den AS (SELECT q_id, count(*) AS n FROM exact GROUP BY q_id)
    SELECT d.q_id, CAST(n.np AS INT) AS nprobe,
           round(coalesce(h.h, 0) / CAST(d.n AS DOUBLE), 6) AS recall
    FROM den d CROSS JOIN nps n
    LEFT JOIN hits h ON h.q_id = d.q_id AND h.np = n.np
    """


@query("pipe_ann_nprobe_curve", _ANN_NPROBE_CURVE_ORACLE)
def pipe_ann_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-vs-nprobe TUNING CURVE as a certified result set — the
    third point of the ANN-quality family: pipe_ann_recall gives the
    i.i.d. floor (~0.10), pipe_ann_recall_clustered the separable
    ceiling (1.0 at nprobe=2), and this gate shows recall MOVING with
    the knob a deployment actually turns. Biased-midpoint queries
    (q = home vector + 0.5 × a neighbor-cluster vector) have exact
    top-11 = 5 home mates + all 6 of the neighbor cluster; probing one
    cell captures exactly the mates (recall 5/11 ≈ 0.455), probing two
    captures everything (recall 1.0) — both values deterministic and
    independent of ADC resolution (see _ANN_NPROBE_CURVE_ORACLE). Runs
    the full ivfpq_topk_batch pipeline at nprobe=1 and 2 over the
    shared clustered trained artifact + encode-once codes."""
    from griddb_spark.pipeline import (
        ivfpq_probe_plan,
        ivfpq_topk_batch,
        knn_bruteforce,
        topk_recall,
    )

    emb = cat(spark, sf_dir).load("embeddings")
    cemb = _clustered_fixture(emb)
    trained = _clustered_trained(cemb, sf_dir)
    codes = _ivfpq_codes("codes_clst", cemb, sf_dir, trained)
    a, b = cemb.alias("a"), cemb.alias("b")
    qdf = (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .filter(F.col("a.vec_id") < 32)
        .select(
            F.col("a.vec_id").alias("q_id"),
            F.zip_with("a.embedding", "b.embedding",
                       lambda x, y: x + F.lit(0.5) * y).alias("qv"),
        )
        # pre-materialize the 32-row batch: the join-derived plan's size
        # ESTIMATE is corpus², which knn_bruteforce's driver-side cap
        # rightly rejects; the checkpoint pins the actual bytes (and
        # computes the midpoint join once for the three consumers)
        .localCheckpoint(eager=True)
    )
    exact = knn_bruteforce(
        cemb,
        qdf.select(F.col("q_id").alias("vec_id"),
                   F.col("qv").alias("embedding")),
        k=11,
        # the exact subtree feeds BOTH union branches; pin its 32x11
        # rows once instead of recomputing the crossJoin per branch
    ).localCheckpoint(eager=True)
    # nprobe-independent serve prefix computed ONCE for the sweep
    # (VERDICT r13 item 4): the ranked candidate scan and the ADC LUT
    # are identical across curve points — each point still runs its own
    # real ivfpq_topk_batch ADC join + top-k over its rank-filtered
    # candidates, so what every nprobe point serves is unchanged.
    plan = ivfpq_probe_plan(codes, qdf, trained, "vec_id", nprobe_max=2)
    parts = []
    for np_ in (1, 2):
        approx = ivfpq_topk_batch(
            cemb, "vec_id", "embedding", in_dim=64, queries=qdf,
            coarse_k=64, m=4, k=8, nprobe=np_, topk=11,
            trained=trained, codes=codes, probe_plan=plan,
        )
        parts.append(
            topk_recall(
                approx.select("q_id", "vec_id"),
                exact.select("q_id", F.col("n_id").alias("vec_id")),
            ).select(
                "q_id",
                F.lit(np_).cast("int").alias("nprobe"),
                "recall",
            )
        )
    return parts[0].unionAll(parts[1])


#: Exact brute-force knn — the same formulation as _ANN_RECALL_TAIL's
#: `bfs`/`exact` CTEs, surfaced as its own result set (q_id, n_id,
#: cos_sim, rank).
_KNN_GEMM_ORACLE = """
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
    q AS (SELECT vec_id AS q_id, ev AS qv FROM v WHERE vec_id < 100),
    bfs AS (SELECT q.q_id, e.vec_id AS n_id,
              round(list_dot_product(q.qv, e.ev)
                    / (sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.ev, e.ev))), 6) AS cos_sim
            FROM q CROSS JOIN v e WHERE e.vec_id != q.q_id)
    SELECT q_id, n_id, cos_sim, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY q_id
                 ORDER BY cos_sim DESC, n_id) AS rank
      FROM bfs) WHERE rank <= 5
    """


@query("pipe_knn_exact_gemm", _KNN_GEMM_ORACLE)
def pipe_knn_exact_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_bruteforce with the Arrow-GEMM branch FORCED (dispatch bound
    0) so the vectorized path sits behind a value-hash oracle, not just
    parity tests (VERDICT r11 item 3 — the same certify-the-second-path
    pattern as pipe_dedup_embed_ann_occ): the default 48 MB pair-volume
    bound means the sf0.01 oracle corpus always took the JVM crossJoin
    branch, so the kernel that actually runs at scale (per-batch partial
    top-k GEMM, the exact ground-truth side of pipe_ann_recall at 100×)
    had never produced an officially certified hash. Same 6dp rounding,
    NaN-greatest ordering, and id tie-break contracts as the JVM branch."""
    from griddb_spark.pipeline import knn_bruteforce

    emb = cat(spark, sf_dir).load("embeddings")
    return knn_bruteforce(emb, emb.filter(F.col("vec_id") < 100), k=5,
                          gemm_min_pair_bytes=0)

"""Driver-facing workload registry: every implemented operator from
SURVEY.md §2 as a (Spark query, DuckDB oracle SQL) pair.

Conventions (driver contract, __spark_entry__.py):
- each query fn takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in Spark and oracle SQL;
- money sums go through DECIMAL(18,2) so Spark and DuckDB agree exactly
  (double accumulation order differs between engines);
- unstable double aggregates (avg/stddev/percentile/time-weighted) are
  rounded to 6 decimals on both sides;
- events.ts is ns in parquet: Spark reads epoch-nanos → µs timestamps
  (ContainerCatalog), oracles use CAST(ts AS TIMESTAMP) (same truncation).
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


def cat(spark: SparkSession, sf_dir: str) -> ContainerCatalog:
    prepare(spark)
    return ContainerCatalog(spark, sf_dir)


def _dec(col, scale: int = 2):
    return (F.col(col) if isinstance(col, str) else col).cast(f"decimal(18,{scale})")


def _r6(col) -> F.Column:
    return F.round(col, 6)


# ===========================================================================
# 2.A relational core — scan/filter/project, group, sort, limit
# ===========================================================================


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
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
            F.sum(_dec("l_quantity")).alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).alias("sum_disc_price"),
            _r6(F.avg("l_quantity")).alias("avg_qty"),
            _r6(F.avg("l_extendedprice")).alias("avg_price"),
            _r6(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "join_inner_5way",
    """
    SELECT n_name,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS revenue,
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
            F.sum(_dec("l_extendedprice") * _dec(F.lit(1) - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_spend
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
            F.sum(_dec("o_totalprice")).alias("total_spend"),
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
           sum(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS sum_dist_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OP_GROUP_DISTINCT: DISTINCT aggregates (AGG_DISTINCT_*)."""
    li = cat(spark, sf_dir).load("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.sum_distinct(_dec("l_quantity")).alias("sum_dist_qty"),
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
        F.row_number().over(w).alias("rn"),
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
        F.length("c_name").alias("len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("repl"),
        F.instr(F.col("c_name"), F.lit("0")).alias("pos"),
        F.trim(F.col("c_mktsegment")).alias("trimmed"),
        F.concat("c_name", F.lit("/"), "c_mktsegment").alias("joined"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("N/A")).alias("seg_or_na"),
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

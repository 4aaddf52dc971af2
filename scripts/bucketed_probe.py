"""Bucketed-layout probe: q9/q18 against plain parquet vs bucketed tables.

Usage: python scripts/bucketed_probe.py [dir=/tmp/scale_100x_rel] [--buckets=64]

The 100x posture probe showed q9/q18 walls tracking SHUFFLE VOLUME
(9.13x / 7.70x at 100x data) — the lineitem⋈orders orderkey exchange plus
q18's lineitem groupBy(l_orderkey). The catalog already supports bucketed
layouts (`write_bucketed`: one-time write-side hash-clustering =
GridDB's affinity-key sub-container placement, sql_parser.h:300-303);
this probe measures what that layout buys those exact plans at 100x:

- ``lineitem`` bucketed+sorted by ``l_orderkey``, ``orders`` by
  ``o_orderkey``, same bucket count → the fact⋈fact join needs NO
  exchange and NO sort on either side, and q18's groupBy(l_orderkey)
  partial-aggregates within buckets with no exchange before the final.
- Dimension joins (supplier/nation/part, q18's customer⋈orders on
  custkey) are broadcast or stay shuffled — bucketing targets the one
  exchange that dominates bytes at scale.

Reports wall seconds per variant, the one-time bucketing cost, and the
Exchange-operator count in each physical plan (the co-location receipt).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _force(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


def _exchanges(df: DataFrame) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count shuffle exchanges only (broadcast exchanges are the point of
    # the dim joins, not the cost being probed)
    return len(re.findall(r"Exchange hashpartitioning", plan))


def q9(li: DataFrame, orders: DataFrame, part: DataFrame,
       supplier: DataFrame, nation: DataFrame) -> DataFrame:
    from griddb_spark.workload import _dec

    p = part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.sum(_dec("l_extendedprice")
                   * _dec(F.lit(1) - F.col("l_discount")))
             .cast("double").alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q18(li: DataFrame, orders: DataFrame, customer: DataFrame) -> DataFrame:
    from griddb_spark.workload import _dec, _dsum

    big = (li.groupBy("l_orderkey")
           .agg(F.sum(_dec("l_quantity")).alias("__sq"))
           .filter(F.col("__sq") > 150)
           .select("l_orderkey"))
    return (
        customer
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
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


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/tmp/scale_100x_rel"
    n_buckets = 64
    for a in sys.argv[1:]:
        if a.startswith("--buckets="):
            n_buckets = int(a.split("=", 1)[1])

    from griddb_spark import workload
    from griddb_spark.catalog import write_bucketed

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .appName("bucketed-probe").getOrCreate()
    )
    workload.prepare(spark)

    plain = {
        t: spark.read.parquet(f"{src}/{t}.parquet")
        for t in ("lineitem", "orders", "customer", "part", "supplier",
                  "nation")
    }
    # warmup: touch every table once so both variants read a warm cache
    for df in plain.values():
        df.count()

    out: dict = {"src": src, "n_buckets": n_buckets}
    q9_plain = q9(plain["lineitem"], plain["orders"], plain["part"],
                  plain["supplier"], plain["nation"])
    q18_plain = q18(plain["lineitem"], plain["orders"], plain["customer"])
    out["q9_plain_sec"] = _force(q9_plain)
    out["q18_plain_sec"] = _force(q18_plain)
    out["q9_plain_exchanges"] = _exchanges(q9_plain)
    out["q18_plain_exchanges"] = _exchanges(q18_plain)

    t0 = time.perf_counter()
    write_bucketed(plain["lineitem"], "li_b", "l_orderkey", n_buckets,
                   sort_cols=("l_orderkey",))
    write_bucketed(plain["orders"], "ord_b", "o_orderkey", n_buckets,
                   sort_cols=("o_orderkey",))
    out["bucketing_sec"] = round(time.perf_counter() - t0, 2)

    li_b, ord_b = spark.table("li_b"), spark.table("ord_b")
    q9_b = q9(li_b, ord_b, plain["part"], plain["supplier"],
              plain["nation"])
    q18_b = q18(li_b, ord_b, plain["customer"])
    out["q9_bucketed_sec"] = _force(q9_b)
    out["q18_bucketed_sec"] = _force(q18_b)
    out["q9_bucketed_exchanges"] = _exchanges(q9_b)
    out["q18_bucketed_exchanges"] = _exchanges(q18_b)

    # correctness receipt: identical results from both layouts
    out["q9_rows_equal"] = (
        q9_plain.exceptAll(q9_b).isEmpty()
        and q9_b.exceptAll(q9_plain).isEmpty()
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()

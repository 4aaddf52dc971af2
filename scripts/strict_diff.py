"""Strict (no-rounding) differential check: find exactly which values differ
between the Spark query and DuckDB oracle, at full precision."""
import os
import sys

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2].split(",") if len(sys.argv) > 2 else [
    "q1_pricing_summary", "join_left_outer", "agg_distinct", "dml_update_delete"
]

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
from griddb_spark import workload

con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")


def strict(v):
    if v is None:
        return "NULL"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


for name in NAMES:
    df = workload.QUERIES[name](spark, SF)
    res = con.execute(workload.ORACLE[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    scols = df.columns
    srows = df.collect()
    order = sorted(scols)
    si = [scols.index(c) for c in order]
    di = [dcols.index(c) for c in order]
    # multiset diff, not positional zip of sorted lists: one differing value
    # would shift sort order and cascade into spurious row mismatches, and
    # zip silently truncates unequal row counts
    from collections import Counter

    s = Counter(tuple(strict(r[i]) for i in si) for r in srows)
    d = Counter(tuple(strict(r[i]) for i in di) for r in drows)
    n_s, n_d = sum(s.values()), sum(d.values())
    only_s, only_d = s - d, d - s
    n_bad = sum(only_s.values()) + sum(only_d.values())
    count_note = "" if n_s == n_d else f"  ROW COUNTS DIFFER: spark={n_s} duck={n_d}"
    print(f"=== {name}: {n_bad} mismatched rows of {n_s}{count_note} (cols {order})")
    for label, side in (("spark-only", only_s), ("duck-only", only_d)):
        for row in list(side.elements())[:6]:
            print(f"    {label}: {dict(zip(order, row))}")

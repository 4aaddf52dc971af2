"""Dtype-fidelity audit: for EVERY workload oracle, compare the DuckDB
logical result types against the Spark DataFrame schema.

The driver's correctness gate canonicalizes both sides through pandas with a
dtype-aware hash, so `6` (int64) != `6.0` (float64), HUGEINT (int128) !=
BIGINT, and list cells crash the canonicalizer outright.  The invariant that
makes the hash safe is therefore *logical type equality at the source*: every
oracle column must carry the same logical type as its Spark twin, and no
oracle may emit HUGEINT / DECIMAL / LIST at all.

Usage: python scripts/dtype_audit.py [sf_dir]   (exit 1 if any flag)
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

from griddb_spark.oracle_audit import duck_spark_mismatches  # noqa: E402


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from griddb_spark import workload

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    only = os.environ.get("SPARK_GRAFT_ONLY")
    names = sorted(workload.ORACLE)
    if only:
        keep = {k.strip() for k in only.split(",")}
        names = [n for n in names if n in keep]

    n_flag = 0
    for name in names:
        sql = workload.ORACLE[name]
        try:
            rel = con.sql(sql)
            dcols, dtypes = rel.columns, rel.types
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: oracle failed: {str(e)[:160]}")
            n_flag += 1
            continue
        try:
            df = workload.QUERIES[name](spark, SF)
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: spark build failed: {str(e)[:160]}")
            n_flag += 1
            continue
        flags = duck_spark_mismatches(dcols, dtypes, df.schema)
        if flags:
            n_flag += 1
            print(f"FLAG {name}:")
            for col, d, s, why in flags:
                print(f"     {col}: duck={d} spark={s} -- {why}")
    print(f"\n{n_flag} flagged of {len(names)} oracles")
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()

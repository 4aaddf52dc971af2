"""Simulate the driver: vanilla session, import __spark_entry__, smoke entry(),
run every queries() entry at sf0.01 vs oracle_sql() via DuckDB."""
import os, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# SPARK_GRAFT_SIM_CPUS sweeps parallelism: results must be IDENTICAL at any
# core count (partition-order/tie nondeterminism shows up as hash mismatch)
CPUS = os.environ.get("SPARK_GRAFT_SIM_CPUS", "8")
spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.ui.enabled","false").getOrCreate())  # vanilla-ish: no UTC, no nanosAsLong
import __spark_entry__ as E

t0=time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns}, {time.time()-t0:.1f}s; sample={rows[:2]}")

con = duckdb.connect()
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

sys.path.insert(0, "/root/repo")
from tests.conftest import assert_matches_oracle
qs, os_ = E.queries(), E.oracle_sql()
only = os.environ.get("SPARK_GRAFT_ONLY")
if only:
    keep = {k.strip() for k in only.split(",") if k.strip()}
    qs = {k: v for k, v in qs.items() if k in keep}
print(f"{len(qs)} queries, {len(os_)} oracles")
fails=[]
for name, fn in qs.items():
    t0=time.time()
    try:
        d = fn(spark, SF)
        if name in os_:
            assert_matches_oracle(d, con, os_[name])
            print(f"OK   {name:30s} {time.time()-t0:5.1f}s")
        else:
            print(f"ROWS {name:30s} {d.count()} rows {time.time()-t0:5.1f}s")
    except Exception as e:
        fails.append((name,e)); print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
print(f"\n{len(qs)-len(fails)}/{len(qs)} passed")
sys.exit(1 if fails else 0)

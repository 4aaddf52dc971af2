#!/usr/bin/env python
"""Dev loop: run every workload query against its DuckDB oracle, exactly
like the driver's correctness gate. Usage:

    python scripts/check_workload.py [sf_dir] [name-filter ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
FILTERS = sys.argv[2:]

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    from griddb_spark.session import get_spark
    from griddb_spark import workload
    from tests.conftest import assert_matches_oracle

    spark = get_spark("workload_check")
    workload.prepare(spark)

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    names = [
        n for n in workload.QUERIES
        if not FILTERS or any(f in n for f in FILTERS)
    ]
    failed = []
    for name in names:
        t0 = time.time()
        try:
            df = workload.QUERIES[name](spark, SF_DIR)
            if name in workload.ORACLE:
                assert_matches_oracle(df, con, workload.ORACLE[name])
                status = "OK   "
            else:
                n = df.count()
                status = f"ROWS={n}"
        except Exception as e:  # noqa: BLE001
            status = "FAIL "
            failed.append((name, e))
        print(f"{status} {name:32s} {time.time()-t0:6.2f}s", flush=True)
    for name, e in failed:
        print(f"\n=== {name} ===")
        traceback.print_exception(type(e), e, e.__traceback__, limit=8)
    print(f"\n{len(names)-len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Dump .explain("formatted") for named workload queries to files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX name [name ...]
Writes OUTDIR/<name>_<SUFFIX>.txt for each query name. Uses the same
session bootstrap as bench.py and $SPARK_GRAFT_SF_DIR (default sf0.1).

Building the DataFrame runs any driver-side work the gate does (training
memos, streaming runs, index writes) — the dump captures the plan of the
RETURNED DataFrame, which is what the bench's noop sink forces.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from griddb_spark import workload
    from griddb_spark.session import get_spark

    spark = get_spark("griddb_spark_plans")
    workload.prepare(spark)
    if workload.ANN_TRAINED_QUERIES.intersection(names):
        workload.pretrain_ann(spark, SF_DIR)
    for name in names:
        df = workload.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

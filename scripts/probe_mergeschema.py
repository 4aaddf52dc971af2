#!/usr/bin/env python
"""Receipt probe for the DmlTable._schema_evolved marker (guide §6, §5:
driver-side planning work): time DataFrame CREATION — schema resolution,
the only step mergeSchema changes — over a many-file homogeneous table,
plain read vs mergeSchema read, and through DmlTable.scan() before/after
an ALTER flips the marker.

mergeSchema=true footer-reads EVERY part-file (a distributed job at real
file counts); a plain read resolves one footer. The fixture tables here
are small-file-count so the absolute numbers are modest — the receipt is
the RATIO and its growth with file count: O(files) vs O(1).

Writes scripts/probe_mergeschema_r14.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F


def time_read(spark, path: str, merge: bool, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        # bust the shared InMemoryFileIndex/footer caches between reps by
        # resolving through a fresh session clone with its own state
        s = spark.newSession()
        t0 = time.perf_counter()
        r = s.read
        if merge:
            r = r.option("mergeSchema", "true")
        df = r.parquet(path)
        _ = df.schema  # schema resolution is the work under test
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    from griddb_spark.dml import SCHEMA_EVOLVED_MARKER, DmlTable
    from griddb_spark.session import get_spark

    spark = get_spark("probe_mergeschema")
    out: dict = {"file_counts": {}}

    for n_files in (64, 512, 2048):
        d = tempfile.mkdtemp(prefix=f"msprobe_{n_files}_")
        path = d + "/t"
        (spark.range(n_files * 10)
         .withColumn("v", F.col("id") * 2)
         .repartition(n_files)
         .write.parquet(path))
        plain = time_read(spark, path, merge=False)
        merged = time_read(spark, path, merge=True)
        out["file_counts"][n_files] = {
            "plain_read_s": round(plain, 4),
            "merge_read_s": round(merged, 4),
            "ratio": round(merged / plain, 2),
        }
        print(n_files, out["file_counts"][n_files], flush=True)

    # the operator-level before/after: DmlTable.scan() resolution wall on
    # a 2048-file table, unevolved (marker absent → plain) vs post-ALTER
    # (marker present → merge), plus correctness of both states
    d = tempfile.mkdtemp(prefix="msprobe_dml_")
    t = DmlTable(spark, d + "/t")
    t.create(spark.range(2048 * 10).withColumn("v", F.col("id") * 2)
             .repartition(2048))

    def scan_wall(reps: int = 5) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fresh = DmlTable(spark.newSession(), t.path)
            _ = fresh.scan().schema
            best = min(best, time.perf_counter() - t0)
        return best

    unevolved = scan_wall()
    n_before = t.read().count()
    t.alter_add_column("score", "DOUBLE")
    evolved = scan_wall()
    assert os.path.exists(os.path.join(t.path, SCHEMA_EVOLVED_MARKER))
    assert t.read().count() == n_before
    assert dict(t.read().dtypes)["score"] == "double"
    out["dml_scan_2048_files"] = {
        "unevolved_plain_s": round(unevolved, 4),
        "evolved_merge_s": round(evolved, 4),
        "ratio": round(evolved / unevolved, 2),
        "rows_stable": True,
    }
    print(out["dml_scan_2048_files"], flush=True)

    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "probe_mergeschema_r14.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", dst)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

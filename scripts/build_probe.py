#!/usr/bin/env python
"""Split every gate's warm wall into DataFrame CONSTRUCTION time (the
py4j/driver-side plan-building cost bench.py's timed region includes —
plus any eager work the builder does: checkpoints, training memos,
streaming runs, index writes) vs the noop-sink force.

  python scripts/build_probe.py [out.json] [name-substr ...]

Writes a JSON profile sorted by build share and prints the top offenders.
Warm methodology matches bench.py: one sf0.001 pass first, clearCache +
memory-sink drop + gc between gates.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/build_probe.json"
    subs = sys.argv[2:]
    from griddb_spark import workload
    from griddb_spark.session import get_spark
    from griddb_spark.streaming.stream_ops import drop_memory_sinks

    spark = get_spark("build_probe")
    workload.prepare(spark)
    names = [n for n in workload.QUERIES
             if not subs or any(s in n for s in subs)]

    # warmup at sf0.001 (same as bench.py)
    for n in names:
        df = workload.QUERIES[n](spark, "/root/testdata/sf0.001")
        df.write.mode("overwrite").format("noop").save()
    if workload.ANN_TRAINED_QUERIES.intersection(names):
        workload.pretrain_ann(spark, SF_DIR)

    rows = []
    for i, n in enumerate(names):
        spark.catalog.clearCache()
        drop_memory_sinks(spark)
        gc.collect()
        if i % 8 == 0:
            spark._jvm.System.gc()
        t0 = time.perf_counter()
        df = workload.QUERIES[n](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t2 = time.perf_counter()
        rows.append({"name": n, "build": round(t1 - t0, 4),
                     "force": round(t2 - t1, 4),
                     "wall": round(t2 - t0, 4)})
    rows.sort(key=lambda r: -r["build"])
    tot_b = sum(r["build"] for r in rows)
    tot_w = sum(r["wall"] for r in rows)
    with open(out_path, "w") as f:
        json.dump({"sf_dir": SF_DIR, "total_build": round(tot_b, 2),
                   "total_wall": round(tot_w, 2), "gates": rows}, f,
                  indent=1)
    print(f"total wall {tot_w:.1f}s, build {tot_b:.1f}s "
          f"({100 * tot_b / max(tot_w, 1e-9):.0f}%) over {len(rows)} gates")
    for r in rows[:40]:
        print(f"  {r['name']:38s} build {r['build']:7.3f}  "
              f"force {r['force']:7.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

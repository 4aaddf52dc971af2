#!/usr/bin/env python
"""Reproduce + localize the full-suite ANN serving blowup (VERDICT r10
item 2): the r10 DRIVER bench read pipe_ann_index_serve at 30.4 s
(force stage 28.1 s) while isolated re-times land at 4.4-5.8 s — so the
inflation needs the suite context. This probe replicates the bench
recipe faithfully UP TO the trio (full warmup over every gate at
sf0.001, then the measured gates at $SPARK_GRAFT_SF_DIR in registration
order through pipe_ann_pq), recording per-gate wall + stage maps +
JVM/BlockManager storage snapshots, under two modes:

  control  — exactly the bench loop (clearCache + gc per gate,
             System.gc every 8)
  cleanup  — control + deep per-gate reclamation: unpersist every
             persistent RDD (localCheckpoint blocks included), drop
             memory-sink temp views, then gc

Usage: python scripts/probe_suite_serve.py [control|cleanup] [out.json]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LAST_GATE = os.environ.get("PROBE_LAST_GATE", "pipe_ann_index_serve")


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def snapshot(spark) -> dict:
    jsc = spark.sparkContext._jsc.sc()
    infos = jsc.getRDDStorageInfo()
    mem = sum(i.memSize() for i in infos)
    disk = sum(i.diskSize() for i in infos)
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return {
        "persistent_rdds": len(infos),
        "storage_mem_mb": round(mem / 1e6, 1),
        "storage_disk_mb": round(disk / 1e6, 1),
        "heap_used_mb": round(
            (rt.totalMemory() - rt.freeMemory()) / 1e6, 1),
    }


def deep_clean(spark) -> dict:
    """Deterministically reclaim per-gate leftovers instead of waiting
    for ContextCleaner: unpersist every persistent RDD (this includes
    localCheckpointed blocks — safe between gates because no cross-gate
    object holds a DataFrame; the train memos hold driver-side scalars
    only) and drop the memory-sink temp views streaming gates leave
    behind (run_to_memory registers each one)."""
    from griddb_spark.streaming.stream_ops import drop_memory_sinks

    jmap = spark.sparkContext._jsc.getPersistentRDDs()  # py4j JavaMap
    n_rdd = len(jmap)
    for jrdd in list(jmap.values()):
        jrdd.unpersist(False)
    dropped = drop_memory_sinks(spark)
    gc.collect()
    return {"unpersisted": n_rdd, "views_dropped": dropped}


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "control"
    out_path = (sys.argv[2] if len(sys.argv) > 2 else
                f"scripts/probe_suite_serve_{mode}.json")
    from griddb_spark import workload
    from griddb_spark.perfstages import collecting
    from griddb_spark.session import get_spark

    spark = get_spark("probe_suite_serve")
    workload.prepare(spark)
    names = list(workload.QUERIES)
    last = names.index(LAST_GATE)
    measured = names[: last + 1]

    # full warmup, exactly like bench.py: EVERY gate at sf0.001
    warm_dir = "/root/testdata/sf0.001"
    t0 = time.perf_counter()
    for wname in names:
        _force(workload.QUERIES[wname](spark, warm_dir))
    warm_wall = round(time.perf_counter() - t0, 1)

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).count()
    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()
    time.sleep(1.0)

    after_warm = snapshot(spark)
    record: dict = {"mode": mode, "sf_dir": SF_DIR,
                    "warmup_wall": warm_wall,
                    "after_warmup": after_warm,
                    "gates": {}}
    if os.path.exists(os.path.join(SF_DIR, "embeddings.parquet")):
        t0 = time.perf_counter()
        workload.pretrain_ann(spark, SF_DIR)
        record["ann_training"] = round(time.perf_counter() - t0, 2)
    for i, name in enumerate(measured):
        spark.catalog.clearCache()
        gc.collect()
        if i % 8 == 0:
            spark._jvm.System.gc()
        pre = snapshot(spark)
        t0 = time.perf_counter()
        with collecting() as acc:
            _force(workload.QUERIES[name](spark, SF_DIR))
        wall = round(time.perf_counter() - t0, 3)
        entry: dict = {"wall": wall, "pre": pre}
        if acc:
            acc["force"] = max(0.0, wall - sum(
                v for k, v in acc.items() if not k.startswith("@")))
            entry["stages"] = {k: round(v, 3) for k, v in acc.items()}
        if mode == "cleanup":
            entry["cleaned"] = deep_clean(spark)
        record["gates"][name] = entry
        print(f"{i:3d} {name:38s} {wall:8.2f}s "
              f"rdds={pre['persistent_rdds']:3d} "
              f"mem={pre['storage_mem_mb']:8.1f}MB "
              f"heap={pre['heap_used_mb']:8.1f}MB", flush=True)
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({n: record["gates"][n]["wall"]
                      for n in measured[-6:]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

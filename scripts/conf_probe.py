#!/usr/bin/env python
"""A/B a runtime-settable SQL conf set over a subset of gates: run each
gate twice per config (alternating order), report per-gate best-of-2.

  python scripts/conf_probe.py '{"spark.sql.adaptive.coalescePartitions.parallelismFirst":"false"}' g1,g2,...
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    confs = json.loads(sys.argv[1])
    names = sys.argv[2].split(",")
    reps = int(os.environ.get("CONF_PROBE_REPS", "2"))
    from griddb_spark import workload
    from griddb_spark.session import get_spark

    spark = get_spark("conf_probe")
    workload.prepare(spark)
    base = {k: spark.conf.get(k) for k in confs}

    def force(name):
        df = workload.QUERIES[name](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()

    for n in names:  # warmup at sf0.001
        force_dir = "/root/testdata/sf0.001"
        df = workload.QUERIES[n](spark, force_dir)
        df.write.mode("overwrite").format("noop").save()

    out = {n: {"base": [], "probe": []} for n in names}
    import gc
    for rep in range(reps):
        for tag, cset in (("base", base), ("probe", confs))[:: 1 if rep % 2 == 0 else -1]:
            for k, v in cset.items():
                spark.conf.set(k, v)
            for n in names:
                spark.catalog.clearCache()
                from griddb_spark.streaming.stream_ops import drop_memory_sinks
                drop_memory_sinks(spark)
                gc.collect()
                t0 = time.perf_counter()
                force(n)
                out[n][tag].append(round(time.perf_counter() - t0, 3))
    print(f"{'gate':34s} {'base':>8s} {'probe':>8s}")
    tb = tp = 0.0
    for n in names:
        b, p = min(out[n]["base"]), min(out[n]["probe"])
        tb += b
        tp += p
        print(f"{n:34s} {b:8.3f} {p:8.3f}   {out[n]}")
    print(f"{'TOTAL(best-of-%d)' % reps:34s} {tb:8.3f} {tp:8.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Per-job wall breakdown for one gate: run it warm N times, print each
Spark job's duration + stage task counts, plus the unattributed gap
(driver-side planning/py4j/python time between jobs).

  python scripts/job_probe.py <gate> [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from griddb_spark import workload
    from griddb_spark.session import get_spark

    spark = get_spark("job_probe")
    workload.prepare(spark)
    sc = spark.sparkContext

    def force():
        df = workload.QUERIES[name](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()

    df0 = workload.QUERIES[name](spark, "/root/testdata/sf0.001")
    df0.write.mode("overwrite").format("noop").save()
    force()  # warm at target sf

    import gc
    st = sc.statusTracker()
    for rep in range(reps):
        spark.catalog.clearCache()
        from griddb_spark.streaming.stream_ops import drop_memory_sinks
        drop_memory_sinks(spark)
        gc.collect()
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        force()
        wall = time.perf_counter() - t0
        jobs = sorted(set(st.getJobIdsForGroup(None) or []) - before)
        tot = 0.0
        lines = []
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            sids = ji.stageIds
            t_job = 0.0
            ntasks = 0
            for s in sids:
                si = st.getStageInfo(s)
                if si is not None:
                    ntasks += si.numTasks
            # job wall from the JVM status store
            jname = "?"
            try:
                jd = sc._jsc.sc().statusStore().job(j)
                jname = jd.name()
                if jd.completionTime().isDefined() and jd.submissionTime().isDefined():
                    t_job = (jd.completionTime().get().getTime()
                             - jd.submissionTime().get().getTime()) / 1000.0
            except Exception:
                pass
            tot += t_job
            lines.append((t_job, f"  job {j}: {t_job:6.3f}s {len(sids)}st/{ntasks}tk "
                          f"[{jname[:90]}]"))
        print(f"rep{rep}: wall={wall:.3f}s jobs={len(jobs)} "
              f"sum(job walls)={tot:.3f}s driver-gap={wall-tot:.3f}s")
        for t_job, ln in sorted(lines, reverse=True)[:14]:
            print(ln)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

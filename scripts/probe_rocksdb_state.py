#!/usr/bin/env python
"""State-store backend receipt (VERDICT r11 item 7): measure the
stateful streaming gates under the default HDFS-backed (in-JVM-heap)
state store vs RocksDB (spark.sql.streaming.stateStore.providerClass →
RocksDBStateStoreProvider, rocksdbjni ships in the Spark distribution).

Why this receipt exists: on local[32] fixtures the per-query state is
tiny (≤ thousands of keys), so the heap-backed store is expected to win
— RocksDB pays native-write/commit overhead per microbatch for state
that would fit in a few MB of heap. The crossover the 100 TB design
cares about is state VOLUME: the heap store keeps every open window/
join key resident in executor memory and snapshots whole maps per
commit, so at production key cardinality (billions of open dedup/join
keys) it OOMs or GC-thrashes, while RocksDB spills to local SSD with
incremental changelog commits. The probe documents the fixture-scale
cost of that insurance so BASELINE.md can state the backend choice with
numbers instead of folklore.

Each provider runs in its OWN subprocess (fresh JVM — no half-stopped
session state bleeding between configs). Writes
scripts/probe_rocksdb_state.json.

Run: python scripts/probe_rocksdb_state.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

SF_DIR = os.environ.get("ROCKSDB_PROBE_SF", "/root/testdata/sf0.1")

#: Gates with real cross-batch state: flink-style interval join (two
#: buffered sides), sessionization (session windows), cross-batch
#: dedup, the stateful sketch fold, and the embedding sign-cell index
#: (applyInPandasWithState custom state).
GATES = [
    "stream_interval_join",
    "stream_sessionize",
    "stream_dedup",
    "stream_distinct_sketch",
    "stream_dedup_embed",
    # r14: the commit-floor gates VERDICT r13 item 3 listed — retried
    # under the r14 16-store partition sizing
    "stream_ema_anomaly",
    "stream_match_recognize",
    "stream_match_two_var",
]

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


def worker(provider: str) -> None:
    from griddb_spark import workload
    from griddb_spark.session import get_spark

    spark = get_spark("rocksdb_probe")
    workload.prepare(spark)
    if provider:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       provider)
    # warmup at the smallest sf (streams run inside the gate functions)
    for name in GATES:
        workload.QUERIES[name](spark, "/root/testdata/sf0.001")
    walls: dict[str, float] = {}
    reps = int(os.environ.get("ROCKSDB_PROBE_REPS", "2"))
    for name in GATES:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            workload.QUERIES[name](spark, SF_DIR).write.mode(
                "overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        walls[name] = round(best, 3)
    print("WALLS " + json.dumps(walls), flush=True)


def main() -> int:
    out: dict = {"gates": GATES, "sf_dir": SF_DIR, "walls": {}}
    for tag, provider in (("default", ""), ("rocksdb", ROCKSDB)):
        env = dict(os.environ, ROCKSDB_PROBE_WORKER=provider or "none",
                   ROCKSDB_PROBE_SF=SF_DIR)
        res = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=3600)
        line = [ln for ln in res.stdout.splitlines()
                if ln.startswith("WALLS ")]
        if res.returncode != 0 or not line:
            sys.stderr.write(res.stderr[-4000:])
            raise SystemExit(f"{tag} worker failed rc={res.returncode}")
        out["walls"][tag] = json.loads(line[-1][len("WALLS "):])
        print(tag, out["walls"][tag], flush=True)
    ratios = [
        out["walls"]["rocksdb"][g] / out["walls"]["default"][g]
        for g in GATES if out["walls"]["default"].get(g)
    ]
    out["ratio_median"] = round(statistics.median(ratios), 3)
    out["notes"] = (
        "rocksdb/default wall ratio per stateful gate at fixture scale; "
        "state volume here is tiny so the heap-backed default is the "
        "right local choice — RocksDB is the documented backend once "
        "state exceeds executor heap (billions of open keys at 100 TB "
        "ingest), where the heap store's full-map snapshot commits and "
        "residency are the scale killer, not the per-commit constant "
        "this probe measures."
    )
    with open(os.path.join(HERE, "probe_rocksdb_state_r14.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"ratio_median": out["ratio_median"]}))
    return 0


if __name__ == "__main__":
    w = os.environ.get("ROCKSDB_PROBE_WORKER")
    if w:
        worker("" if w == "none" else w)
        raise SystemExit(0)
    if len(sys.argv) > 1:
        SF_DIR = sys.argv[1]
    raise SystemExit(main())

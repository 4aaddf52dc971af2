"""Forced-distributed probe for the driver-local dispatch paths.

The r13 optimizations dispatch quantizer training (kmeans_fit / pq_train /
ivfpq_train) and embed-dedup micro-batches to a driver-local NumPy twin
whenever the input is provably driver-sized (< 32 MB planning-time
estimate). At sf0.1 every bench input fits that gate, so the DISTRIBUTED
paths — the ones that matter at 100 TB — are dead code in the official
record (VERDICT r13 "What's wrong" #1). This probe keeps them covered:

1. Trainers at sf0.1: run each trainer auto-dispatched (local) and
   forced-distributed (`_LOCAL_TRAIN_MAX_BYTES = -1`, plus
   `ivfpq_train(local=False)`), assert the returned artifacts are
   IDENTICAL, record both walls.
2. `embed_dedup_stream` at sf0.1 gate shape: run the full three-batch
   stream with `local=False` and `local=True`, assert bit-level parity
   of the stored index (ids, vector bits via float.hex, cells), record
   both walls.
3. Optionally (``--salted DIR`` pointing at a scale_probe
   --salt-embeddings corpus, e.g. 10x ≈ 60 MB/batch): run the stream
   over batches ABOVE the 32 MB dispatch bound, assert the distributed
   path actually engaged (the local path refuses inputs that size), and
   record the wall — the standing scale probe for the distributed
   per-batch verify.

Usage:
    python scripts/probe_forced_distributed.py [--salted /tmp/salted_10x] \
        [--out scripts/probe_forced_distributed_r14.json]

Writes one JSON receipt (default path above) and exits non-zero on any
parity mismatch.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def probe_trainers(spark, record: dict) -> bool:
    """Auto (local) vs forced-distributed parity + walls for the three
    trainers, on the same corpus/params the bench's _ann_training uses."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import similarity as sim
    from griddb_spark.pipeline.similarity import ivfpq_train, kmeans_fit, pq_train
    from griddb_spark.workload import _adaptive_k, cat

    emb = cat(spark, SF_DIR).load("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    coarse_k = _adaptive_k(emb)
    ok = True
    saved = sim._LOCAL_TRAIN_MAX_BYTES

    runs = {
        "kmeans_fit": lambda: kmeans_fit(
            emb, "vec_id", "embedding", k=coarse_k, iters=1),
        "pq_train": lambda: pq_train(
            emb, "vec_id", "embedding", 64, m=4, k=8, iters=1),
    }
    for name, fn in runs.items():
        local_out, local_s = _timed(fn)
        sim._LOCAL_TRAIN_MAX_BYTES = -1  # size gate always declines
        try:
            dist_out, dist_s = _timed(fn)
        finally:
            sim._LOCAL_TRAIN_MAX_BYTES = saved
        match = local_out == dist_out
        ok = ok and match
        record[name] = {
            "local_sec": local_s, "distributed_sec": dist_s,
            "parity": match,
        }

    # ivfpq_train: local pin vs explicit local=False (sub-trainers forced
    # distributed too so the whole composed path runs on executors)
    local_out, local_s = _timed(lambda: ivfpq_train(
        emb, "vec_id", "embedding", 64, coarse_k=coarse_k, m=4, k=8,
        local=True))
    sim._LOCAL_TRAIN_MAX_BYTES = -1
    try:
        dist_out, dist_s = _timed(lambda: ivfpq_train(
            emb, "vec_id", "embedding", 64, coarse_k=coarse_k, m=4, k=8,
            local=False))
    finally:
        sim._LOCAL_TRAIN_MAX_BYTES = saved
    # cellmeans are UNROUNDED by contract (consumers round after the
    # cosine) so the two paths may differ by accumulation order; both
    # must be in ascending cell order (assign_clusters' tie-break
    # contract). Everything else is exact.
    match = all(
        local_out.get(k) == dist_out.get(k)
        for k in set(local_out) | set(dist_out) if k != "cellmeans"
    )
    lc = dict(local_out["cellmeans"])
    dc = dict(dist_out["cellmeans"])
    match = match and set(lc) == set(dc) and all(
        len(lc[c]) == len(dc[c])
        and max(abs(x - y) for x, y in zip(lc[c], dc[c])) <= 1e-9
        for c in lc
    )
    for art in (local_out, dist_out):
        cells = [c for c, _ in art["cellmeans"]]
        match = match and cells == sorted(cells)
    ok = ok and match
    record["ivfpq_train"] = {
        "local_sec": local_s, "distributed_sec": dist_s, "parity": match,
    }
    return ok


def _run_embed_stream(spark, src_dir: str, schema, local: bool | None,
                      index_root: str):
    """gate-shaped embed_dedup_stream over pre-built arrival files."""
    import uuid

    from griddb_spark.streaming import embed_dedup_stream

    index = os.path.join(index_root, f"index_{uuid.uuid4().hex[:8]}")
    q = embed_dedup_stream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src_dir),
        index, "vec_id", "embedding", threshold=0.9, sign_bits=None,
        local=local,
        checkpoint_dir=tempfile.mkdtemp(prefix="probe_fd_ck_"),
    )
    q.awaitTermination()
    q.stop()
    rows = (spark.read
            .schema("vec_id long, __v array<double>, __cell int")
            .parquet(index).collect())

    def hx(x):
        return "N" if x is None else float(x).hex()

    trips = sorted(
        ((r.vec_id, None if r["__v"] is None
          else tuple(hx(x) for x in r["__v"]), r["__cell"]) for r in rows),
        key=lambda t: (t[0] is not None, t[0] or 0, t[1] or (),
                       t[2] is not None, t[2] or 0))
    return trips


def _build_arrivals(spark, sf_dir: str, dst: str):
    """The stream_dedup_embed gate's corpus + 3 ordered arrival files."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from griddb_spark.workload import cat

    emb = cat(spark, sf_dir).load("embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # the gate's literal shift is 100000 (sf0.1 ids are < 2000); a
    # replicated probe corpus can exceed that, so derive it — identical
    # arrival semantics, collision-safe at any K
    shift = max(100000, (emb.agg(F.max("vec_id")).first()[0] or 0) + 1)
    pert = emb.select(
        (F.col("vec_id") + shift).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = emb.unionByName(pert)
    w = W.orderBy(F.col("vec_id") % shift, "vec_id")
    wn = W.orderBy(F.lit(1)).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    rk, nn = F.row_number().over(w), F.count(F.lit(1)).over(wn)
    bcol = (F.when(rk <= F.floor(nn / 3), 0)
            .when(rk <= F.floor(nn * 2 / 3), 1).otherwise(2))
    (corpus.withColumn("__b", bcol).coalesce(1).write.mode("overwrite")
     .partitionBy("__b").parquet(f"{dst}/all"))
    base_t = time.time()
    for i in range(3):
        part = glob.glob(f"{dst}/all/__b={i}/part-*.parquet")[0]
        shutil.move(part, f"{dst}/{i:02d}.parquet")
        os.utime(f"{dst}/{i:02d}.parquet",
                 (base_t - 3 + i, base_t - 3 + i))
    shutil.rmtree(f"{dst}/all")
    return corpus.schema


def probe_iterative_trainers(spark, record: dict) -> bool:
    """r14's two new local-dispatch paths: BPE merge learning and the
    logistic quality-head trainer. Same protocol as the quantizer
    trainers — auto (local at this SF) vs forced-distributed, artifact
    parity asserted, both walls recorded."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline.packing import bpe_train
    from griddb_spark.pipeline.similarity import logreg_train
    from griddb_spark.workload import cat

    ok = True

    docs = cat(spark, SF_DIR).load("documents")
    loc_out, loc_s = _timed(
        lambda: sorted(map(tuple, bpe_train(
            docs, "text", n_merges=5, local=True).collect())))
    dist_out, dist_s = _timed(
        lambda: sorted(map(tuple, bpe_train(
            docs, "text", n_merges=5, local=False).collect())))
    match = loc_out == dist_out
    ok = ok and match
    record["bpe_train"] = {
        "local_sec": loc_s, "distributed_sec": dist_s, "parity": match,
    }

    emb = cat(spark, SF_DIR).load("embeddings").select(
        "embedding", (F.col("vec_id") % 2).alias("y"))
    loc_out, loc_s = _timed(
        lambda: logreg_train(emb, "embedding", "y", iters=2, lr=0.1,
                             local=True))
    dist_out, dist_s = _timed(
        lambda: logreg_train(emb, "embedding", "y", iters=2, lr=0.1,
                             local=False))
    match = loc_out == dist_out
    ok = ok and match
    record["logreg_train"] = {
        "local_sec": loc_s, "distributed_sec": dist_s, "parity": match,
    }
    return ok


def probe_embed_stream(spark, record: dict) -> bool:
    src = tempfile.mkdtemp(prefix="probe_fd_src_")
    idx_root = tempfile.mkdtemp(prefix="probe_fd_idx_")
    try:
        schema = _build_arrivals(spark, SF_DIR, src)
        dist_out, dist_s = _timed(
            lambda: _run_embed_stream(spark, src, schema, False, idx_root))
        local_out, local_s = _timed(
            lambda: _run_embed_stream(spark, src, schema, True, idx_root))
        match = dist_out == local_out
        record["stream_dedup_embed"] = {
            "local_sec": local_s, "distributed_sec": dist_s,
            "parity": match, "survivors": len(local_out),
        }
        return match
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(idx_root, ignore_errors=True)


def probe_salted(spark, salted_dir: str, record: dict) -> bool:
    """Above-bound batches: the auto dispatch itself must go distributed.

    Spies on similarity._plan_size_bytes (embed_dedup_stream imports it
    at call time) to record the per-batch estimates the dispatch saw —
    an estimate above _LOCAL_BATCH_MAX_BYTES proves the batch ran the
    distributed per-batch verify, the path this probe exists to keep
    exercised."""
    from griddb_spark.pipeline import similarity as sim
    from griddb_spark.streaming import stream_ops

    src = tempfile.mkdtemp(prefix="probe_fd_salt_src_")
    idx_root = tempfile.mkdtemp(prefix="probe_fd_salt_idx_")
    orig_psb = sim._plan_size_bytes
    sizes: list[int] = []

    def spy(df):
        s = orig_psb(df)
        sizes.append(int(s))
        return s

    sim._plan_size_bytes = spy
    try:
        schema = _build_arrivals(spark, salted_dir, src)
        out, wall = _timed(
            lambda: _run_embed_stream(spark, src, schema, None, idx_root))
        bound = stream_ops._LOCAL_BATCH_MAX_BYTES
        engaged = any(s > bound for s in sizes)
        record["stream_dedup_embed_salted"] = {
            "dir": salted_dir, "wall_sec": wall, "survivors": len(out),
            "plan_size_estimates": sizes,
            "local_batch_max_bytes": bound,
            "distributed_engaged": engaged,
        }
        return engaged
    finally:
        sim._plan_size_bytes = orig_psb
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(idx_root, ignore_errors=True)


def main() -> int:
    out_path = os.path.join(os.path.dirname(__file__),
                            "probe_forced_distributed_r14.json")
    salted = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--salted":
            salted = args.pop(0)
        elif a == "--out":
            out_path = args.pop(0)
    from griddb_spark import workload
    from griddb_spark.session import get_spark

    spark = get_spark("probe_forced_distributed")
    workload.prepare(spark)

    record: dict = {"sf_dir": SF_DIR}
    ok = probe_trainers(spark, record)
    ok = probe_iterative_trainers(spark, record) and ok
    ok = probe_embed_stream(spark, record) and ok
    if salted:
        ok = probe_salted(spark, salted, record) and ok
    record["all_parity"] = ok
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps(record, sort_keys=True))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

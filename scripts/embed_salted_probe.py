"""Salted (distinct-content) scale probe for streaming embed-dedup.

Usage:
    python scripts/scale_probe.py K /tmp/salted_Kx --salt-embeddings \
        --tables=embeddings --replicate-only   # build the corpus
    python scripts/embed_salted_probe.py /tmp/salted_Kx [--bits=8,auto]

The verbatim key-shifted replication (scale_probe.py default) makes a K×
corpus K identical copies of every vector — maximal DUPLICATION density,
where the exact pre-collapse does all the work and sign_bits is
irrelevant (it can never split identical vectors). The salted corpus is
the complement regime: every replica is distinct content (cross-replica
cos ~0.71, within-replica near-dups destroyed by independent noise), so
the exact pre-collapse gets zero leverage and per-cell DISTINCT-vector
occupancy is the stressor — exactly what adaptive ``sign_bits=None``
exists to bound without manual retuning.

For each requested mode this probe mirrors the ``stream_dedup_embed``
gate harness (corpus + ×1.001 planted near-dups, three ordered
micro-batches through ``embed_dedup_stream``) and reports one JSON line:
wall seconds of the streaming section, the final index's sign_bits,
row/cell occupancy stats, and the survivor count (mode-invariant for
this corpus: planted pairs share every sign bit, salted vectors pair
with nothing — so equal keep counts across modes double as a
correctness check).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_mode(spark, src_dir: str, sign_bits, target_occ) -> dict:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from griddb_spark.streaming import embed_dedup_stream

    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    shift = emb.agg(F.max("vec_id")).first()[0] + 1
    pert = emb.select(
        (F.col("vec_id") + shift).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = emb.unionByName(pert)
    n = corpus.count()
    ranked = corpus.withColumn(
        "__rk",
        F.row_number().over(W.orderBy(F.col("vec_id") % shift, "vec_id")),
    ).localCheckpoint(eager=True)

    arrivals = tempfile.mkdtemp(prefix="salted_probe_src_")
    import glob

    n_batches = 3
    for i in range(n_batches):
        (ranked.filter((F.col("__rk") > i * n // n_batches)
                       & (F.col("__rk") <= (i + 1) * n // n_batches))
         .drop("__rk").coalesce(1).write.mode("overwrite")
         .parquet(f"{arrivals}/f{i}"))
        part = glob.glob(f"{arrivals}/f{i}/part-*.parquet")[0]
        shutil.move(part, f"{arrivals}/{i:02d}.parquet")
        shutil.rmtree(f"{arrivals}/f{i}")

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(arrivals)
    )
    index = tempfile.mkdtemp(prefix="salted_probe_idx_") + "/index"
    kw = {}
    if target_occ is not None:
        kw["target_occ"] = target_occ
    t0 = time.perf_counter()
    q = embed_dedup_stream(
        stream, index, "vec_id", "embedding", threshold=0.9,
        sign_bits=sign_bits,
        checkpoint_dir=tempfile.mkdtemp(prefix="salted_probe_ck_"), **kw,
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0

    idx = spark.read.schema(
        "vec_id long, __v array<double>, __cell int").parquet(index)
    occ = (idx.groupBy("__cell").agg(F.count(F.lit(1)).alias("n"))
           .agg(F.count(F.lit(1)).alias("cells"),
                F.sum("n").alias("rows"),
                F.max("n").alias("max_occ"),
                F.expr("percentile_approx(n, 0.5)").alias("med_occ"))
           .first())
    meta_path = os.path.join(index, "_meta.json")
    final_bits = None
    if os.path.isfile(meta_path):
        with open(meta_path) as fh:
            final_bits = json.load(fh)["sign_bits"]
    elif isinstance(sign_bits, int):
        final_bits = sign_bits
    shutil.rmtree(arrivals)
    shutil.rmtree(os.path.dirname(index))
    return {
        "mode": "auto" if sign_bits is None else sign_bits,
        "target_occ": target_occ,
        "stream_sec": round(wall, 2),
        "final_sign_bits": final_bits,
        "survivors": occ["rows"],
        "cells_used": occ["cells"],
        "max_cell_occ": occ["max_occ"],
        "median_cell_occ": occ["med_occ"],
        "input_rows": n,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    src = args[0] if args else "/tmp/salted_10x"
    modes: list = [8, None]
    target_occ = None
    for a in sys.argv[1:]:
        if a.startswith("--bits="):
            modes = [None if m == "auto" else int(m)
                     for m in a.split("=", 1)[1].split(",")]
        if a.startswith("--target-occ="):
            target_occ = int(a.split("=", 1)[1])

    from griddb_spark import workload
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .appName("embed-salted-probe").getOrCreate()
    )
    workload.prepare(spark)
    out = []
    for m in modes:
        r = run_mode(spark, src, m, target_occ)
        print(json.dumps(r), file=sys.stderr)
        out.append(r)
    print(json.dumps({"src": src, "results": out}))


if __name__ == "__main__":
    main()

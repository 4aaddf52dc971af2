"""Scale probe: replicate the sf tables K× (key-shifted) and re-run bench.

Usage: python scripts/scale_probe.py [K] [dst_dir] [--skip=name1,name2]
           [--salt-embeddings] [--tables=embeddings,documents]

``--salt-embeddings`` makes replicas i>0 DISTINCT CONTENT (noise-mixed
vectors, see _salt_vectors) instead of verbatim copies — the complement
probe regime where sign-space occupancy, not duplication density, is the
embedding family's stressor. ``--tables=`` restricts replication to the
tables a focused probe actually reads.

Replication is pure pyarrow so every physical parquet type survives exactly
(notably events.ts TIMESTAMP(NANOS), which the catalog detects from the
footer). Foreign keys shift by the stride of the table that owns them, so
join fan-outs stay realistic: each replica is a disjoint key universe with
the same per-key density as sf0.1. region/nation are fixed domains and are
copied as-is.

The probe answers the question the bench alone can't: which operators are
O(data) and which have fixed-overhead or super-linear behavior. Expected
shape on local[32]: scan/join/agg/window/time-series queries grow far less
than K× (fixed per-query overheads dominate at these sizes); the exact
all-pairs dedup kernels (n-gram bitmap, embedding GEMM) grow ~K² — which
is WHY the LSH/banding variants exist as the scale path.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# column -> table whose max value defines the shift stride
STRIDE_OWNERS = {
    "o_orderkey": "orders",
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "user_id": "events",
    "doc_id": "documents",
    "vec_id": "embeddings",
}

# table -> {column: stride key}
SHIFTS = {
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "events": {"user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

COPY_AS_IS = ("region", "nation")


def _salt_vectors(a: pa.ChunkedArray, replica: int) -> pa.Array:
    """Replace replica ``i>0``'s embedding column with noise-mixed
    vectors: v' = unit(v + r), r a seeded unit-norm gaussian per vector.
    E[cos(v, v')] ~ 1/sqrt(2) ~ 0.71 in 64-dim, far below the 0.9-0.95
    gate thresholds, and two originally-near-dup vectors land near
    cos ~ 0.5 after independent noise — so a salted corpus is DISTINCT
    CONTENT: exact pre-collapse gets zero leverage, near-dup structure
    exists only inside replica 0, and sign-space occupancy (not
    duplication density) is the stressor. Complements the verbatim
    key-shifted replication, which is maximal-duplication by design."""
    import numpy as np

    vecs = np.asarray(a.combine_chunks().to_pylist(), dtype=np.float64)
    rng = np.random.default_rng(0xC0FFEE + replica)
    noise = rng.standard_normal(vecs.shape)
    noise /= np.linalg.norm(noise, axis=1, keepdims=True)
    noise *= np.linalg.norm(vecs, axis=1, keepdims=True)
    out = vecs + noise
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    out = (out / norms).astype(np.float32)
    return pa.array(list(out), type=a.type)


def replicate(k: int, dst: str, salt_embeddings: bool = False,
              tables: "set[str] | None" = None) -> None:
    os.makedirs(dst, exist_ok=True)
    strides = {
        col: pc.max(
            pq.read_table(f"{SRC}/{tbl}.parquet", columns=[col])[col]
        ).as_py()
        + 1
        for col, tbl in STRIDE_OWNERS.items()
    }
    for name in COPY_AS_IS:
        if tables is not None and name not in tables:
            continue
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{dst}/{name}.parquet"
        )
    for name, shifts in SHIFTS.items():
        if tables is not None and name not in tables:
            continue
        t = pq.read_table(f"{SRC}/{name}.parquet")
        # stream one replica at a time (100x replication must not hold K
        # copies in memory); small row groups: parquet scans split on
        # ROW-GROUP boundaries, so pyarrow's 1M-row default would give the
        # 10x events table a single row group = a single scan task — every
        # scan-bound query would serialize and the probe would misreport
        # linear ops as superlinear (measured: q1 7.9x, events ~6x)
        with pq.ParquetWriter(f"{dst}/{name}.parquet", t.schema) as w:
            for i in range(k):
                cols = []
                for f in t.schema:
                    a = t[f.name]
                    if i > 0 and f.name in shifts:
                        a = pc.cast(
                            pc.add(a, i * strides[shifts[f.name]]), f.type
                        )
                    if (i > 0 and salt_embeddings
                            and name == "embeddings"
                            and f.name == "embedding"):
                        a = _salt_vectors(a, i)
                    cols.append(a)
                w.write_table(
                    pa.table(cols, schema=t.schema), row_group_size=50_000
                )
        print(f"  {name}: {t.num_rows} -> {t.num_rows * k} rows",
              file=sys.stderr)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    k = int(args[0]) if args else 10
    dst = args[1] if len(args) > 1 else f"/tmp/scale_probe_{k}x"
    skip = ""
    salt = "--salt-embeddings" in sys.argv[1:]
    tables = None
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip = a.split("=", 1)[1] if "=" in a else ""
        if a.startswith("--tables="):
            tables = set(a.split("=", 1)[1].split(","))

    t0 = time.time()
    print(f"replicating {SRC} {k}x -> {dst}"
          + (" (salted embeddings)" if salt else ""), file=sys.stderr)
    replicate(k, dst, salt_embeddings=salt, tables=tables)
    print(f"replicated in {time.time() - t0:.1f}s", file=sys.stderr)
    if "--replicate-only" in sys.argv[1:]:
        return

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=dst)
    if skip:
        env["SPARK_GRAFT_SKIP"] = skip
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        env=env,
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr[-2000:])
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    d["probe_k"] = k
    print(json.dumps(d))


if __name__ == "__main__":
    main()

"""Scale probe: replicate the sf tables K× (key-shifted) and re-run bench.

Usage: python scripts/scale_probe.py [K] [dst_dir] [--skip name1,name2]

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


def replicate(k: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    strides = {
        col: pc.max(
            pq.read_table(f"{SRC}/{tbl}.parquet", columns=[col])[col]
        ).as_py()
        + 1
        for col, tbl in STRIDE_OWNERS.items()
    }
    for name in COPY_AS_IS:
        pq.write_table(
            pq.read_table(f"{SRC}/{name}.parquet"), f"{dst}/{name}.parquet"
        )
    for name, shifts in SHIFTS.items():
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
    for a in sys.argv[1:]:
        if a.startswith("--skip"):
            skip = a.split("=", 1)[1] if "=" in a else ""

    t0 = time.time()
    print(f"replicating {SRC} {k}x -> {dst}", file=sys.stderr)
    replicate(k, dst)
    print(f"replicated in {time.time() - t0:.1f}s", file=sys.stderr)

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

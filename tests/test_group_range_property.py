"""Randomized differential test: group_by_range FILL semantics vs a
straightforward pandas reference (risk register SURVEY §7.1 — bucket-edge
and gap-fill exactness, sql_operator_group.cpp:603-760).

DuckDB has no GROUP BY RANGE, so pandas is the oracle here: buckets are a
fixed lattice start + k*every over [start, end]; FILL applies only to
EMPTY buckets; LINEAR interpolates on the bucket key with NULL when a
side is missing."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from griddb_spark.operators import group_by_range


def _pandas_reference(rows, start_ms, end_ms, every_ms, fill):
    """rows: list[(ts_ms, value|None)] -> dict bucket_ms -> avg|None|ABSENT."""
    buckets = {}
    for t, v in rows:
        if t < start_ms or t > end_ms:
            continue
        b = start_ms + (t - start_ms) // every_ms * every_ms
        buckets.setdefault(b, []).append(v)
    lattice = list(range(start_ms, end_ms + 1, every_ms))
    present = {}
    for b, vs in buckets.items():
        nn = [v for v in vs if v is not None]
        present[b] = (sum(nn) / len(nn)) if nn else None
    out = {}
    if fill == "NONE":
        return {b: present[b] for b in lattice if b in present}
    for i, b in enumerate(lattice):
        if b in present:
            out[b] = present[b]
        elif fill == "NULL":
            out[b] = None
        elif fill == "PREVIOUS":
            prev = [x for x in lattice[:i] if x in present]
            out[b] = present[prev[-1]] if prev else None
        elif fill == "LINEAR":
            prev = [x for x in lattice[:i] if x in present]
            nxt = [x for x in lattice[i + 1:] if x in present]
            if prev and nxt and present[prev[-1]] is not None \
                    and present[nxt[0]] is not None:
                p, q = prev[-1], nxt[0]
                vp, vq = present[p], present[q]
                out[b] = vp + (vq - vp) * (b - p) / (q - p)
            else:
                out[b] = None
    return out


@pytest.mark.parametrize("seed", range(8))
def test_group_by_range_random_vs_pandas(spark, seed):
    rng = random.Random(seed)
    start_ms = 1_704_067_200_000
    every_ms = rng.choice([1000, 5000, 20_000]) * rng.choice([1, 3])
    n_buckets = rng.randint(3, 12)
    end_ms = start_ms + every_ms * (n_buckets - 1) + rng.randint(0, every_ms - 1)
    fill = rng.choice(["NONE", "NULL", "PREVIOUS", "LINEAR"])
    rows = []
    for _ in range(rng.randint(0, 60)):
        t = start_ms + rng.randint(-every_ms, every_ms * (n_buckets + 1))
        v = None if rng.random() < 0.15 else round(rng.uniform(-50, 50), 3)
        rows.append((t, v))
    # ensure at least one in-range row so bounds exist
    rows.append((start_ms + rng.randint(0, every_ms - 1), 1.0))

    df = spark.createDataFrame(
        [(t, v) for t, v in rows], "t long, value double"
    ).select(F.timestamp_millis("t").alias("ts"), "value")
    got_rows = group_by_range(
        df, "ts", every_ms, "MILLISECOND",
        {"avg_value": F.avg("value")},
        start_ms, end_ms, fill=fill,
    ).collect()
    got = {
        int(r.ts.timestamp() * 1000): (None if r.avg_value is None
                                       else r.avg_value)
        for r in got_rows
    }
    want = _pandas_reference(rows, start_ms, end_ms, every_ms, fill)
    assert set(got) == set(want), f"bucket lattice mismatch fill={fill}"
    for b in want:
        w, g = want[b], got[b]
        if w is None or g is None:
            assert w is None and g is None, (fill, b, w, g)
        else:
            assert math.isclose(w, g, rel_tol=1e-9, abs_tol=1e-9), (fill, b, w, g)

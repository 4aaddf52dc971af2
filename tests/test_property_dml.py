"""Randomized DML differential tests: random INSERT/UPDATE/DELETE
sequences applied to a DmlTable (plain and hash-partitioned) and to an
independent pure-Python row-store reference, comparing the full final
table state.

Pins the EXEC_INSERT/UPDATE/DELETE semantics (sql_processor_dml.cpp):
updates are whole-predicate snapshots (no read-your-own-writes within one
statement), deletes keep the complement with NULL predicate rows
retained, and partitioning must never change visible content.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from griddb_spark.dml import DmlTable, hash_partition_expr

COLS = "id int, seg string, val double"
SEGS = ["a", "b", "c", "d"]


def _rand_rows(rng, n, next_id):
    return [
        (
            next_id + i,
            rng.choice(SEGS),
            None if rng.random() < 0.1 else round(rng.uniform(-100, 100), 2),
        )
        for i in range(n)
    ]


def _pred(rng):
    """A random predicate as (spark Column, python fn over row-dict)."""
    kind = rng.randrange(4)
    if kind == 0:
        s = rng.choice(SEGS)
        return F.col("seg") == s, lambda r: r["seg"] == s
    if kind == 1:
        x = round(rng.uniform(-50, 50), 2)
        # NULL val -> NULL predicate (neither matched nor kept by UPDATE,
        # retained by DELETE's complement)
        return F.col("val") < x, lambda r: (
            None if r["val"] is None else r["val"] < x
        )
    if kind == 2:
        m = rng.randrange(2, 5)
        return F.col("id") % m == 0, lambda r: r["id"] % m == 0
    lo = rng.randrange(0, 40)
    return F.col("id").between(lo, lo + 10), lambda r: lo <= r["id"] <= lo + 10


@pytest.mark.parametrize("seed", range(6))
def test_random_dml_sequence_vs_reference(spark, tmp_path, seed):
    rng = random.Random(7000 + seed)
    partitioned = rng.random() < 0.5
    part = hash_partition_expr("seg", 4) if partitioned else None

    init = _rand_rows(rng, rng.randint(5, 25), 0)
    next_id = len(init)
    t = DmlTable(spark, str(tmp_path / "t"), part).create(
        spark.createDataFrame(init, COLS)
    )
    ref = [dict(zip(("id", "seg", "val"), r)) for r in init]

    for _ in range(rng.randint(3, 7)):
        op = rng.choice(["insert", "update", "delete"])
        if op == "insert":
            rows = _rand_rows(rng, rng.randint(1, 10), next_id)
            next_id += len(rows)
            t.insert(spark.createDataFrame(rows, COLS))
            ref.extend(dict(zip(("id", "seg", "val"), r)) for r in rows)
        elif op == "update":
            cond, pf = _pred(rng)
            delta = round(rng.uniform(-10, 10), 2)
            seg_to = rng.choice(SEGS)
            t.update(
                cond,
                {"val": F.col("val") + delta, "seg": F.lit(seg_to)},
            )
            for r in ref:
                if pf(r):
                    r["val"] = (
                        None if r["val"] is None else round(r["val"] + delta, 10)
                    )
                    r["seg"] = seg_to
        else:
            cond, pf = _pred(rng)
            t.delete(cond)
            ref = [r for r in ref if not pf(r)]

    got = sorted(
        ((r.id, r.seg, r.val) for r in t.read().collect()),
        key=lambda x: x[0],
    )
    want = sorted(
        ((r["id"], r["seg"], r["val"]) for r in ref), key=lambda x: x[0]
    )
    assert len(got) == len(want), (seed, partitioned, len(got), len(want))
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1], (seed, partitioned, g, w)
        if w[2] is None:
            assert g[2] is None, (seed, partitioned, g, w)
        else:
            assert g[2] == pytest.approx(w[2], abs=1e-9), (
                seed, partitioned, g, w)


# -- range-partitioned battery: leaf-straddling predicates, partition-key
#    reassignment (rows must move leaves), delete-all-in-leaf -------------

DAYS = ["2024-03-01", "2024-03-02", "2024-03-03", "2024-03-04"]
DAY_MS = {d: i for i, d in enumerate(DAYS)}


def _rand_ts_rows(rng, n, next_id):
    return [
        (
            next_id + i,
            rng.choice(DAYS) + f" {rng.randrange(24):02d}:00:00",
            float(rng.randrange(100)),
        )
        for i in range(n)
    ]


def _ts_pred(rng):
    """Predicates chosen to straddle / align with day-leaf boundaries."""
    kind = rng.randrange(4)
    if kind == 0:  # exactly one leaf
        d = rng.choice(DAYS)
        return F.to_date("ts") == d, lambda r: r["ts"][:10] == d
    if kind == 1:  # straddles a leaf boundary (afternoon of d1 .. morning of d2)
        i = rng.randrange(len(DAYS) - 1)
        lo, hi = DAYS[i] + " 12:00:00", DAYS[i + 1] + " 12:00:00"
        return (F.col("ts") >= lo) & (F.col("ts") < hi), (
            lambda r: lo <= r["ts"] < hi
        )
    if kind == 2:  # value predicate, cuts across every leaf
        x = rng.randrange(100)
        return F.col("val") < x, lambda r: r["val"] < x
    m = rng.randrange(2, 5)
    return F.col("id") % m == 0, lambda r: r["id"] % m == 0


@pytest.mark.parametrize("seed", range(6))
def test_random_range_partitioned_dml_vs_reference(spark, tmp_path, seed):
    from griddb_spark.dml import DmlTable, range_partition_expr

    rng = random.Random(9100 + seed)
    schema = "id int, ts string, val double"

    def mk(rows):
        return spark.createDataFrame(rows, schema).select(
            "id", F.col("ts").cast("timestamp").alias("ts"), "val"
        )

    init = _rand_ts_rows(rng, rng.randint(10, 30), 0)
    next_id = len(init)
    t = DmlTable(
        spark, str(tmp_path / "t"), range_partition_expr("ts", 1, "DAY")
    ).create(mk(init))
    ref = [dict(zip(("id", "ts", "val"), r)) for r in init]

    for _ in range(rng.randint(3, 6)):
        op = rng.choice(["insert", "update", "move", "delete", "delete_leaf"])
        if op == "insert":
            rows = _rand_ts_rows(rng, rng.randint(1, 8), next_id)
            next_id += len(rows)
            t.insert(mk(rows))
            ref.extend(dict(zip(("id", "ts", "val"), r)) for r in rows)
        elif op == "update":
            cond, pf = _ts_pred(rng)
            delta = float(rng.randrange(1, 50))
            t.update(cond, {"val": F.col("val") + delta})
            for r in ref:
                if pf(r):
                    r["val"] += delta
        elif op == "move":  # partition-key reassignment: rows change leaves
            cond, pf = _ts_pred(rng)
            day_to = rng.choice(DAYS)
            new_ts = day_to + " 09:30:00"
            t.update(cond, {"ts": F.lit(new_ts).cast("timestamp")})
            for r in ref:
                if pf(r):
                    r["ts"] = new_ts
        elif op == "delete_leaf":  # may empty a whole leaf directory
            d = rng.choice(DAYS)
            t.delete(F.to_date("ts") == d)
            ref = [r for r in ref if r["ts"][:10] != d]
        else:
            cond, pf = _ts_pred(rng)
            t.delete(cond)
            ref = [r for r in ref if not pf(r)]
        if not ref:
            break  # table may be fully empty; parquet dir has no leaves left

    if ref:
        got = sorted(
            (r.id, str(r.ts), r.val) for r in t.read().collect()
        )
        want = sorted(
            (r["id"], r["ts"].replace("T", " "), r["val"]) for r in ref
        )
        assert got == want, (seed, got[:5], want[:5])

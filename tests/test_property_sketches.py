"""Randomized differential tests for the bounded-state sketches
(linear-counting distinct, histogram quantile) vs pure-Python references
on synthetic data: the register/bucket math must agree exactly, and the
estimators must respect their theoretical error envelopes."""

from __future__ import annotations

import math
import random

import pytest

KNUTH = 2654435761
M32 = 4294967296


def _reg(key: int, m: int) -> int:
    return ((key % M32) * KNUTH) % M32 % m


@pytest.mark.parametrize("seed", range(4))
def test_linear_counting_registers_match_reference(spark, seed):
    from pyspark.sql import functions as F

    from griddb_spark.pipeline.sketches import linear_counting_distinct

    rng = random.Random(900 + seed)
    m = rng.choice([64, 256, 1024])
    rows = [
        (f"g{rng.randint(0, 2)}", rng.randint(0, 10_000))
        for _ in range(rng.randint(20, 400))
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    got = {
        r.g: (r.n_registers, r.est_distinct)
        for r in linear_counting_distinct(df, ["g"], "k", m=m).collect()
    }
    by_g: dict[str, set] = {}
    exact: dict[str, set] = {}
    for g, k in rows:
        by_g.setdefault(g, set()).add(_reg(k, m))
        exact.setdefault(g, set()).add(k)
    for g, regs in by_g.items():
        hits = len(regs)
        n_reg, est = got[g]
        assert n_reg == hits
        if hits == m:
            assert est is None
        else:
            ref = round(-m * math.log(1 - hits / m), 6)
            assert est == pytest.approx(ref, abs=1e-6)
            # estimator sanity: within the linear-counting error envelope
            # (loose 3-sigma-ish bound for n ≲ m)
            n = len(exact[g])
            if n <= m / 2:
                assert abs(est - n) <= max(4.0, 0.25 * n)


def test_histogram_quantile_labels_full_decimals_and_rejects_collisions(spark):
    """p999-style quantiles keep their full decimal label (q_999, q_995);
    colliding labels and out-of-range quantiles are rejected eagerly."""
    from griddb_spark.pipeline.sketches import histogram_quantile

    df = spark.createDataFrame([("g", float(v)) for v in range(64)],
                               "g string, v double")
    out = histogram_quantile(df, ["g"], "v", [0.5, 0.95, 0.99, 0.995, 0.999],
                             0.0, 64.0, 32)
    assert out.columns[-4:] == ["q_95", "q_99", "q_995", "q_999"]
    with pytest.raises(ValueError, match="duplicate quantile label"):
        histogram_quantile(df, ["g"], "v", [0.5, 0.50], 0.0, 64.0, 32)
    with pytest.raises(ValueError, match="quantile must be in"):
        histogram_quantile(df, ["g"], "v", [1.5], 0.0, 64.0, 32)


@pytest.mark.parametrize("seed", range(4))
def test_histogram_quantile_bucket_math_matches_reference(spark, seed):
    from griddb_spark.pipeline.sketches import histogram_quantile

    rng = random.Random(1200 + seed)
    n_buckets = rng.choice([8, 32, 128])
    lo, hi = 0.0, float(rng.choice([64, 256]))
    w = (hi - lo) / n_buckets
    qs = [0.25, 0.5, 0.9]
    rows = [
        ("g", rng.uniform(lo - 10, hi + 10))
        for _ in range(rng.randint(10, 500))
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = histogram_quantile(df, ["g"], "v", qs, lo, hi, n_buckets).collect()[0]

    # pure-Python reference: same clamp, same cumulative rule
    buckets = sorted(
        min(n_buckets - 1, max(0, math.floor((v - lo) / w))) for _, v in rows
    )
    n = len(buckets)
    assert out.n_rows == n
    for q, name in zip(qs, ("q_25", "q_50", "q_90")):
        need = q * n
        cum = 0
        ref = None
        from collections import Counter

        cnt = Counter(buckets)
        for b in sorted(cnt):
            cum += cnt[b]
            if cum >= need:
                ref = round(lo + (b + 1) * w, 6)
                break
        assert getattr(out, name) == pytest.approx(ref, abs=1e-6)


def _hll_ref(keys, p):
    """Pure-Python replay of the HLL register math."""
    m = 1 << p
    sb = 32 - p
    regs: dict[int, int] = {}
    for k in keys:
        h = ((k % M32) * KNUTH) % M32
        idx, suffix = h % m, h // m
        rho = sb + 1 if suffix == 0 else sb + 1 - suffix.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    s = (m - len(regs)) + sum(2.0 ** -mj for mj in regs.values())
    return len(regs), alpha * float(m * m) / s


@pytest.mark.parametrize("seed", range(4))
def test_hll_registers_match_reference_bitwise(spark, seed):
    """The Spark register math (hash, idx, rho, exact power-of-two sum)
    must agree BIT-FOR-BIT with a pure-Python replay — the property the
    DuckDB oracle relies on."""
    from griddb_spark.pipeline.sketches import hll_distinct

    rng = random.Random(7200 + seed)
    p = rng.choice([6, 8, 10])
    rows = [
        (f"g{rng.randint(0, 2)}", rng.randint(0, 5_000_000))
        for _ in range(rng.randint(50, 600))
    ]
    df = spark.createDataFrame(rows, "g string, k long")
    got = {
        r.g: (r.n_registers, r.est_distinct)
        for r in hll_distinct(df, ["g"], "k", p=p).collect()
    }
    by_g: dict[str, list] = {}
    for g, k in rows:
        by_g.setdefault(g, []).append(k)
    for g, keys in by_g.items():
        n_reg, est = _hll_ref(keys, p)
        assert got[g][0] == n_reg
        assert got[g][1] == est  # exact: every op is IEEE-exact


def test_hll_sharded_merge_equals_single_pass(spark):
    """Register-wise max over disjoint shards = sketch of the union: the
    mergeability the 100 TB map-side combine depends on (here checked
    end-to-end by unioning shard DataFrames before the sketch)."""
    from griddb_spark.pipeline.sketches import hll_distinct

    rng = random.Random(42)
    a = [("g", rng.randint(0, 10**6)) for _ in range(400)]
    b = [("g", rng.randint(0, 10**6)) for _ in range(400)]
    da = spark.createDataFrame(a, "g string, k long")
    db = spark.createDataFrame(b, "g string, k long")
    merged = hll_distinct(da.unionAll(db), ["g"], "k", p=8).collect()[0]
    _, ref = _hll_ref([k for _, k in a + b], 8)
    assert merged.est_distinct == ref


def test_hll_corrected_accuracy_small_and_large_range(spark):
    """correct=True switches to linear counting in the small range; both
    regimes stay inside ~3x the 1.04/sqrt(m) theoretical error."""
    from griddb_spark.pipeline.sketches import hll_distinct

    p, m = 8, 256
    rng = random.Random(7)
    for n in (60, 5000):
        keys = rng.sample(range(50_000_000), n)
        df = spark.createDataFrame([("g", k) for k in keys], "g string, k long")
        est = hll_distinct(df, ["g"], "k", p=p, correct=True).collect()[0].est_distinct
        assert abs(est - n) / n < 3 * 1.04 / math.sqrt(m), (n, est)


def test_hll_oracle_sql_matches_spark(spark, catalog, duck):
    """The shared oracle-SQL builder replays the Spark plan bit-for-bit on
    the driver testdata (the gate's contract, pinned locally)."""
    from tests.conftest import assert_matches_oracle

    from griddb_spark.pipeline.sketches import hll_distinct, hll_oracle_sql

    ev = catalog.load("events")
    df = hll_distinct(ev, ["event_type"], "event_id", p=8)
    assert_matches_oracle(df, duck, hll_oracle_sql("events", ["event_type"], "event_id", p=8))


@pytest.mark.parametrize("seed", range(3))
def test_kmv_estimate_accuracy_and_exact_regime(spark, seed):
    """Below k the sketch is exact; above, the (k-1)/h_k estimator lands
    within ~4/sqrt(k) of truth for uniform keys."""
    from griddb_spark.pipeline.sketches import kmv_distinct

    rng = random.Random(9300 + seed)
    k = 64
    small = rng.sample(range(10**9), rng.randint(5, k - 1))
    big = rng.sample(range(10**9), 4000)
    rows = [("small", x) for x in small] + [("big", x) for x in big]
    rows += rows[: len(rows) // 3]  # duplicates must not matter
    df = spark.createDataFrame(rows, "g string, k long")
    out = {r.g: r for r in kmv_distinct(df, ["g"], "k", k=k).collect()}
    assert out["small"].est_distinct == float(len(small))
    err = abs(out["big"].est_distinct - 4000) / 4000
    assert err < 4 / math.sqrt(k), (out["big"].est_distinct, err)


def test_kmv_set_ops_recover_planted_overlap(spark):
    """Jaccard/intersection estimates from sketches alone track a planted
    50% overlap within the k=256 error envelope."""
    from griddb_spark.pipeline.sketches import kmv_set_ops

    rng = random.Random(5)
    shared = rng.sample(range(10**9), 2000)
    only_a = rng.sample(range(10**9, 2 * 10**9), 2000)
    only_b = rng.sample(range(2 * 10**9, 3 * 10**9), 2000)
    rows = ([("a", x) for x in shared + only_a]
            + [("b", x) for x in shared + only_b])
    df = spark.createDataFrame(rows, "g string, k long")
    out = kmv_set_ops(df, "g", "k", "a", "b", k=256).collect()[0]
    assert abs(out.est_a - 4000) / 4000 < 0.25
    assert abs(out.est_union - 6000) / 6000 < 0.25
    assert abs(out.est_intersect - 2000) / 2000 < 0.4
    assert abs(out.jaccard - 1 / 3) < 0.12


def test_kmv_disjoint_and_identical_groups(spark):
    """Edge cases: identical groups give Jaccard ~1; disjoint give ~0."""
    from griddb_spark.pipeline.sketches import kmv_set_ops

    rng = random.Random(11)
    xs = rng.sample(range(10**9), 1500)
    ys = rng.sample(range(10**9, 2 * 10**9), 1500)
    same = [("a", x) for x in xs] + [("b", x) for x in xs]
    dfs = spark.createDataFrame(same, "g string, k long")
    r1 = kmv_set_ops(dfs, "g", "k", "a", "b", k=128).collect()[0]
    assert r1.jaccard == 1.0
    disj = [("a", x) for x in xs] + [("b", y) for y in ys]
    dfd = spark.createDataFrame(disj, "g string, k long")
    r2 = kmv_set_ops(dfd, "g", "k", "a", "b", k=128).collect()[0]
    assert r2.jaccard < 0.05


def test_hll_stream_registers_merge_with_batch(spark, catalog):
    """The streaming sketch's materialized registers must equal the batch
    register set for the same window (the merge contract: stream ⊕ batch
    by register-wise max), and the shared estimator read path must agree
    with hll_distinct end-to-end."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline.sketches import (
        hll_distinct,
        hll_estimate_from_registers,
        hll_register_cols,
    )

    ev = catalog.load("events")
    hour = F.date_trunc("hour", "ts").alias("w")
    idx, rho = hll_register_cols(F.col("user_id"), 8)
    batch_regs = (
        ev.select(hour, idx.alias("idx"), rho.alias("rho"))
        .groupBy("w", "idx").agg(F.max("rho").alias("mj"))
    )
    est = {
        (r.w, r.n_registers): r.est_distinct
        for r in hll_estimate_from_registers(batch_regs, ["w"], 8,
                                             mj_col="mj").collect()
    }
    whole = {
        (r.w, r.n_registers): r.est_distinct
        for r in hll_distinct(
            ev.select(hour, "user_id"), ["w"], "user_id", p=8
        ).collect()
    }
    assert est == whole

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

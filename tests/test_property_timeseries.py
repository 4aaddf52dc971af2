"""Randomized differential tests for the TQL time-series selections
(SURVEY §2.C: TIME_NEXT/PREV ±ONLY, TIME_INTERPOLATED, TIME_SAMPLING —
selection_func_impl.h semantics) vs an independent pure-Python reference.

The batch operators are window/scaffold compositions (one partitioned
sort, no per-call limit(1) at scale); these tests pin their semantics on
irregular random series: query points exactly on samples, between
samples, and outside the covered range, with multiple groups and NULL
values in the interpolated column.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from griddb_spark.operators.timeseries import (
    time_interpolated,
    time_next,
    time_prev,
    time_sampling,
)

START = 1_704_067_200_000  # 2024-01-01T00:00:00Z, epoch ms


def _mk_series(rng, groups):
    """Irregular per-group series; value is NULL ~15% of the time."""
    rows = []
    for g in groups:
        n = rng.randint(2, 40)
        ts = sorted(rng.sample(range(0, 600_000, 500), n))
        for t in ts:
            v = None if rng.random() < 0.15 else round(rng.uniform(-99, 99), 3)
            rows.append((g, START + t, v))
    return rows


def _interp(t, t1, v1, t2, v2):
    if v1 is None or v2 is None:
        return None
    return v1 + (v2 - v1) * (t - t1) / (t2 - t1)


@pytest.mark.parametrize("seed", range(6))
def test_time_next_prev_random(spark, seed):
    rng = random.Random(1000 + seed)
    groups = ["a", "b", "c"]
    rows = _mk_series(rng, groups)
    df = spark.createDataFrame(rows, "g string, t long, v double").select(
        "g", F.timestamp_millis("t").alias("ts"), "v"
    )
    # query points: on-sample, off-sample, before-all, after-all
    on = rng.choice(rows)[1]
    for at in (on, START + rng.randint(0, 600_000), START - 1, START + 10**7):
        for only in (False, True):
            got_n = {
                r.g: int(r.ts.timestamp() * 1000)
                for r in time_next(df, _iso(at), only=only, by=["g"]).collect()
            }
            got_p = {
                r.g: int(r.ts.timestamp() * 1000)
                for r in time_prev(df, _iso(at), only=only, by=["g"]).collect()
            }
            for g in groups:
                ts_g = sorted(t for gg, t, _ in rows if gg == g)
                nxt = [t for t in ts_g if (t > at if only else t >= at)]
                prv = [t for t in ts_g if (t < at if only else t <= at)]
                assert got_n.get(g) == (min(nxt) if nxt else None), (
                    "next", seed, at, only, g)
                assert got_p.get(g) == (max(prv) if prv else None), (
                    "prev", seed, at, only, g)


def _iso(ms):
    import datetime as dt

    return dt.datetime.fromtimestamp(ms / 1000.0, dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%f"
    )[:-3] + "Z"


@pytest.mark.parametrize("seed", range(6))
def test_time_interpolated_random(spark, seed):
    rng = random.Random(2000 + seed)
    groups = ["g1", "g2"]
    rows = _mk_series(rng, groups)
    df = spark.createDataFrame(rows, "g string, t long, v double").select(
        "g", F.timestamp_millis("t").alias("ts"), "v"
    )
    on = rng.choice(rows)[1]
    for at in (on, START + rng.randint(0, 600_000), START - 5, START + 10**7):
        got = {
            r.g: (int(r.ts.timestamp() * 1000), r.v)
            for r in time_interpolated(df, _iso(at), "v", by=["g"]).collect()
        }
        for g in groups:
            series = sorted(
                ((t, v) for gg, t, v in rows if gg == g), key=lambda x: x[0]
            )
            exact = [(t, v) for t, v in series if t == at]
            prv = [(t, v) for t, v in series if t <= at]
            nxt = [(t, v) for t, v in series if t > at]
            if exact:
                want = (at, exact[-1][1])
            elif prv and nxt:
                t1, v1 = prv[-1]
                t2, v2 = nxt[0]
                want = (at, _interp(at, t1, v1, t2, v2))
            else:
                want = None
            if want is None:
                assert g not in got, (seed, at, g, got.get(g))
            else:
                assert g in got, (seed, at, g)
                gt, gv = got[g]
                assert gt == want[0]
                if want[1] is None:
                    assert gv is None, (seed, at, g, gv)
                else:
                    assert gv is not None and math.isclose(
                        gv, want[1], rel_tol=1e-9, abs_tol=1e-9
                    ), (seed, at, g, gv, want[1])


@pytest.mark.parametrize("seed", range(6))
def test_time_sampling_random(spark, seed):
    rng = random.Random(3000 + seed)
    rows = _mk_series(rng, ["s1", "s2"])
    df = spark.createDataFrame(rows, "g string, t long, v double").select(
        "g", F.timestamp_millis("t").alias("ts"), "v"
    )
    step = rng.choice([1, 3, 7]) * rng.choice([1000, 5000])
    start = START + rng.randint(-10_000, 10_000)
    end = start + step * rng.randint(1, 30) + rng.randint(0, step - 1)
    got = {
        (r.g, int(r.ts.timestamp() * 1000)): r.v
        for r in time_sampling(
            df, _iso(start), _iso(end), step, "MILLISECOND", col="v", by=["g"]
        ).collect()
    }
    want = {}
    for g in ("s1", "s2"):
        series = sorted(
            ((t, v) for gg, t, v in rows if gg == g), key=lambda x: x[0]
        )
        for k in range((end - start) // step + 1):
            tq = start + k * step
            exact = [(t, v) for t, v in series if t == tq]
            prv = [(t, v) for t, v in series if t <= tq]
            nxt = [(t, v) for t, v in series if t > tq]
            if exact:
                want[(g, tq)] = exact[-1][1]
            elif prv and nxt:
                want[(g, tq)] = _interp(tq, prv[-1][0], prv[-1][1],
                                        nxt[0][0], nxt[0][1])
    assert set(got) == set(want), (seed, step,
                                   set(got) ^ set(want))
    for k, w in want.items():
        g = got[k]
        if w is None:
            assert g is None, (seed, k, g)
        else:
            assert g is not None and math.isclose(
                g, w, rel_tol=1e-9, abs_tol=1e-9
            ), (seed, k, g, w)

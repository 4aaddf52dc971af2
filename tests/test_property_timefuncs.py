"""Randomized differential tests for the time-function family
(SURVEY §2.B: EXTRACT, TIMESTAMP_TRUNC, TIMESTAMP_ADD, TIMESTAMP_DIFF,
STRFTIME — sql_expression_time.h) vs a pure-Python datetime/zoneinfo
reference.

DuckDB is deliberately NOT the oracle here: its date_diff counts boundary
crossings while GridDB/Spark count complete units, and its extract
millisecond folds in seconds — Python datetime arithmetic is the
independent reference. Timezone variants (GridDB's optional tz argument)
are covered for the read-only field/format functions where DST ambiguity
cannot arise.
"""

from __future__ import annotations

import datetime as dt
import random
from zoneinfo import ZoneInfo

import pytest
from pyspark.sql import functions as F

from griddb_spark.functions import time as gt

UTC = dt.timezone.utc

# fixed interesting instants: leap day, month ends, year boundary, DST-free
EDGES_MS = [
    int(dt.datetime(2024, 2, 29, 23, 59, 59, 999000, UTC).timestamp() * 1000),
    int(dt.datetime(2023, 1, 31, 12, 0, 0, 0, UTC).timestamp() * 1000),
    int(dt.datetime(2019, 12, 31, 23, 0, 0, 1000, UTC).timestamp() * 1000),
    int(dt.datetime(2024, 1, 1, 0, 0, 0, 0, UTC).timestamp() * 1000),
    int(dt.datetime(2021, 8, 31, 6, 30, 15, 250000, UTC).timestamp() * 1000),
]


def _rand_ms(rng, n):
    lo = int(dt.datetime(2000, 1, 1, tzinfo=UTC).timestamp() * 1000)
    hi = int(dt.datetime(2030, 1, 1, tzinfo=UTC).timestamp() * 1000)
    return [rng.randrange(lo, hi) for _ in range(n)] + EDGES_MS


def _dt_of(ms, tz=UTC):
    return dt.datetime.fromtimestamp(ms / 1000.0, tz)


_EPOCH = dt.datetime(1970, 1, 1, tzinfo=UTC)


def _ms_of(d: dt.datetime) -> int:
    """Exact epoch-ms (float .timestamp()*1000 drops a ms at µs scale)."""
    return (d - _EPOCH) // dt.timedelta(milliseconds=1)


def _df(spark, ms_list):
    return spark.createDataFrame(
        [(i, m) for i, m in enumerate(ms_list)], "i long, ms long"
    ).select("i", F.timestamp_millis("ms").alias("ts"))


EXTRACT_REF = {
    "YEAR": lambda d: d.year,
    "MONTH": lambda d: d.month,
    "DAY": lambda d: d.day,
    "HOUR": lambda d: d.hour,
    "MINUTE": lambda d: d.minute,
    "SECOND": lambda d: d.second,
    "MILLISECOND": lambda d: d.microsecond // 1000,
    "DAY_OF_WEEK": lambda d: (d.weekday() + 1) % 7,  # 0=Sunday (GridDB)
    "DAY_OF_YEAR": lambda d: d.timetuple().tm_yday,
}


@pytest.mark.parametrize("seed", range(4))
def test_extract_random(spark, seed):
    rng = random.Random(4000 + seed)
    ms = _rand_ms(rng, 40)
    tz = rng.choice([None, "Asia/Tokyo", "America/New_York"])
    zone = UTC if tz is None else ZoneInfo(tz)
    df = _df(spark, ms)
    cols = [
        gt.extract_unit(u, F.col("ts"), tz=tz).alias(u)
        for u in EXTRACT_REF
    ]
    for r in df.select("i", *cols).collect():
        d = _dt_of(ms[r.i], zone)
        for u, ref in EXTRACT_REF.items():
            assert getattr(r, u) == ref(d), (seed, tz, ms[r.i], u)


TRUNC_REF = {
    "YEAR": lambda d: d.replace(month=1, day=1, hour=0, minute=0, second=0,
                                microsecond=0),
    "MONTH": lambda d: d.replace(day=1, hour=0, minute=0, second=0,
                                 microsecond=0),
    "DAY": lambda d: d.replace(hour=0, minute=0, second=0, microsecond=0),
    "HOUR": lambda d: d.replace(minute=0, second=0, microsecond=0),
    "MINUTE": lambda d: d.replace(second=0, microsecond=0),
    "SECOND": lambda d: d.replace(microsecond=0),
}


@pytest.mark.parametrize("seed", range(4))
def test_timestamp_trunc_random(spark, seed):
    rng = random.Random(4100 + seed)
    ms = _rand_ms(rng, 40)
    df = _df(spark, ms)
    cols = [
        F.unix_millis(gt.timestamp_trunc(u, F.col("ts"))).alias(u)
        for u in TRUNC_REF
    ]
    for r in df.select("i", *cols).collect():
        d = _dt_of(ms[r.i])
        for u, ref in TRUNC_REF.items():
            want = _ms_of(ref(d))
            assert getattr(r, u) == want, (seed, ms[r.i], u)


def _add_months(d: dt.datetime, n: int) -> dt.datetime:
    """Calendar month add with end-of-month day clamp."""
    y, m = divmod(d.year * 12 + (d.month - 1) + n, 12)
    m += 1
    # clamp day to the target month's length
    for day in (d.day, 30, 29, 28):
        try:
            return d.replace(year=y, month=m, day=day)
        except ValueError:
            continue
    raise AssertionError


ADD_MS = {"DAY": 86_400_000, "HOUR": 3_600_000, "MINUTE": 60_000,
          "SECOND": 1000, "MILLISECOND": 1}


@pytest.mark.parametrize("seed", range(4))
def test_timestamp_add_diff_random(spark, seed):
    rng = random.Random(4200 + seed)
    ms = _rand_ms(rng, 30)
    df = _df(spark, ms)
    n = rng.randint(-500, 500)
    nm = rng.randint(-30, 30)
    add_cols = [
        F.unix_millis(gt.timestamp_add(u, F.col("ts"), n)).alias(f"a_{u}")
        for u in ADD_MS
    ] + [
        F.unix_millis(gt.timestamp_add("MONTH", F.col("ts"), nm)).alias("a_MONTH"),
        F.unix_millis(gt.timestamp_add("YEAR", F.col("ts"), nm)).alias("a_YEAR"),
    ]
    other = rng.choice(ms)
    diff_cols = [
        gt.timestamp_diff(
            u, F.col("ts"), F.timestamp_millis(F.lit(other))
        ).alias(f"d_{u}")
        for u in ADD_MS
    ]
    for r in df.select("i", *add_cols, *diff_cols).collect():
        t = ms[r.i]
        d = _dt_of(t)
        for u, step in ADD_MS.items():
            assert getattr(r, f"a_{u}") == t + n * step, (seed, t, u, n)
        assert r.a_MONTH == _ms_of(_add_months(d, nm)), (
            seed, t, nm)
        assert r.a_YEAR == _ms_of(_add_months(d, 12 * nm)), (
            seed, t, nm)
        for u, step in ADD_MS.items():
            # complete units between, truncated toward zero
            want = int((other - t) / step) if u != "MILLISECOND" else other - t
            assert getattr(r, f"d_{u}") == want, (seed, t, other, u)


@pytest.mark.parametrize("seed", range(4))
def test_strftime_random(spark, seed):
    rng = random.Random(4300 + seed)
    ms = _rand_ms(rng, 30)
    tz = rng.choice([None, "Asia/Tokyo"])
    zone = UTC if tz is None else ZoneInfo(tz)
    fmt = "%Y-%m-%d %H:%M:%S j=%j w=%w"
    df = _df(spark, ms)
    got = {
        r.i: r.s
        for r in df.select(
            "i", gt.strftime(fmt, F.col("ts"), tz=tz).alias("s")
        ).collect()
    }
    for i, m in enumerate(ms):
        d = _dt_of(m, zone)
        want = d.strftime("%Y-%m-%d %H:%M:%S") + \
            f" j={d.strftime('%j')} w={(d.weekday() + 1) % 7}"
        assert got[i] == want, (seed, tz, m)

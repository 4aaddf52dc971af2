"""Randomized differential tests for gap-based sessionization and
document chunking vs independent pure-Python references.

Sessionization is a window composition (gaps-and-islands); chunking is a
sequence/slice expression. Both must agree with the obvious sequential
reference on irregular random inputs — including duplicate timestamps,
singleton users, and documents shorter than one window.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

BASE = dt.datetime(2024, 1, 1)


def _ref_sessions(rows, gap_minutes):
    """Sequential reference: sessions per user in time order."""
    out = {}
    by_user = {}
    for u, ts, v in rows:
        by_user.setdefault(u, []).append((ts, v))
    gap = dt.timedelta(minutes=gap_minutes)
    for u, evs in by_user.items():
        evs.sort(key=lambda e: e[0])
        sid = 0
        prev = None
        for ts, v in evs:
            if prev is None or ts - prev > gap:
                sid += 1
                out[(u, sid)] = {"start": ts, "end": ts + gap, "n": 0, "sum": 0.0}
            cur = out[(u, sid)]
            cur["end"] = ts + gap
            cur["n"] += 1
            cur["sum"] += v
            prev = ts
    return out


@pytest.mark.parametrize("seed", range(5))
def test_sessionize_random_vs_reference(spark, seed):
    from pyspark.sql import functions as F

    from griddb_spark.operators.sessionize import sessionize

    rng = random.Random(7000 + seed)
    rows = []
    for u in range(1, rng.randint(3, 8)):
        n = rng.randint(1, 30)
        # irregular offsets incl. exact duplicates (same-minute events)
        offs = sorted(rng.choices(range(0, 5000), k=n))
        for m in offs:
            rows.append((u, BASE + dt.timedelta(minutes=m), round(rng.uniform(0, 10), 3)))
    gap = rng.choice([30, 60, 240])
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.session_id): r
        for r in sessionize(
            df, gap_minutes=gap, aggs={"sum_value": F.round(F.sum("value"), 6)}
        ).collect()
    }
    want = _ref_sessions(rows, gap)
    assert set(got) == set(want)
    for key, w in want.items():
        g = got[key]
        assert g.session_start == w["start"], key
        assert g.session_end == w["end"], key
        assert g.n_events == w["n"], key
        assert abs(g.sum_value - w["sum"]) < 1e-6, key


def _ref_chunks(words, size, overlap):
    stride = size - overlap
    starts = list(range(0, max(len(words) - overlap, 1), stride))
    return [
        (ci, s + 1, words[s:s + size])
        for ci, s in enumerate(starts)
    ]


@pytest.mark.parametrize("seed", range(5))
def test_chunk_documents_random_vs_reference(spark, seed):
    from griddb_spark.pipeline.packing import chunk_documents

    rng = random.Random(8000 + seed)
    docs = []
    for i in range(rng.randint(2, 10)):
        n = rng.randint(1, 120)
        docs.append((i, " ".join(f"w{rng.randint(0, 50)}" for _ in range(n))))
    size = rng.choice([8, 24, 64])
    overlap = rng.choice([0, 2, size // 2])
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, size=size, overlap=overlap).collect():
        got[(r.doc_id, r.chunk_id)] = (r.chunk_start, r.n_chunk_tokens, r.chunk_text)
    for doc_id, text in docs:
        words = text.split()
        for ci, start, chunk in _ref_chunks(words, size, overlap):
            g = got.pop((doc_id, ci))
            assert g == (start, len(chunk), " ".join(chunk)), (doc_id, ci)
    assert not got  # no extra chunks


@pytest.mark.parametrize("seed", range(3))
def test_chunk_documents_covers_every_token(spark, seed):
    from pyspark.sql import functions as F

    from griddb_spark.pipeline.packing import chunk_documents

    rng = random.Random(9000 + seed)
    docs = [
        (i, " ".join(f"t{i}_{j}" for j in range(rng.randint(1, 99))))
        for i in range(5)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, size=16, overlap=4)
    covered = (
        out.select(F.explode(F.split("chunk_text", " ")).alias("t"))
        .distinct()
        .count()
    )
    total = sum(len(t.split()) for _, t in docs)
    assert covered == total

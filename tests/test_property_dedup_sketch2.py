"""Randomized differential tests for span dedup, count-min estimation,
and bloom-filter decontamination vs sequential pure-Python references."""

from __future__ import annotations

import hashlib
import random

import pytest

KNUTH = 2654435761
KNUTH2 = 2246822519
M31 = 2147483648
M32 = 4294967296

WORDS = ["a", "b", "c", "d", "e", "f", "g", "h"]


def _cms_pos(key: int, d: int, width: int) -> int:
    k31 = key % M31
    h1 = (k31 * KNUTH) % M32
    h2 = (k31 * KNUTH2) % M32
    h2o = h2 - (h2 % 2) + 1
    return (h1 + d * h2o) % width


def _gram_key(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)


@pytest.mark.parametrize("seed", range(4))
def test_span_dedup_matches_sequential_reference(spark, seed):
    from griddb_spark.pipeline import span_dedup

    rng = random.Random(1200 + seed)
    k = rng.choice([2, 3, 4])
    docs = []
    for i in range(rng.randint(5, 40)):
        n = rng.randint(1, 30)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(n))))
    # force guaranteed repeats: clone a doc's text under a later id
    if len(docs) >= 2:
        docs.append((len(docs), docs[0][1]))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_removed)
        for r in span_dedup(df, "doc_id", "text", k=k).collect()
    }

    # sequential reference: global first-occurrence over (doc_id, span_idx)
    seen: set[str] = set()
    want = {}
    for doc_id, text in sorted(docs):
        toks = text.split()
        spans = [
            " ".join(toks[i : i + k]) for i in range(0, max(len(toks), 1), k)
        ]
        kept = []
        removed = 0
        for s in spans:
            if s in seen:
                removed += 1
            else:
                seen.add(s)
                kept.append(s)
        want[doc_id] = (" ".join(kept), len(spans), removed)
    assert got == want


@pytest.mark.parametrize("seed", range(4))
def test_cms_estimate_matches_reference_and_bounds(spark, seed):
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import cms_build, cms_estimate

    rng = random.Random(1300 + seed)
    depth, width = rng.choice([(2, 64), (4, 128), (4, 512)])
    keys = [rng.randint(0, 50) for _ in range(rng.randint(50, 500))]
    df = spark.createDataFrame([(x,) for x in keys], "k long")
    probe = spark.createDataFrame([(x,) for x in range(0, 51)], "k long")
    sketch = cms_build(df, "k", depth=depth, width=width)
    got = {
        r.k: r.est_count
        for r in cms_estimate(sketch, probe, "k", depth, width).collect()
    }

    # reference sketch
    counters: dict[tuple[int, int], int] = {}
    for x in keys:
        for d in range(depth):
            p = (d, _cms_pos(x, d, width))
            counters[p] = counters.get(p, 0) + 1
    exact: dict[int, int] = {}
    for x in keys:
        exact[x] = exact.get(x, 0) + 1
    for q in range(0, 51):
        ref = min(
            counters.get((d, _cms_pos(q, d, width)), 0) for d in range(depth)
        )
        assert got[q] == ref
        # CMS never undercounts
        assert got[q] >= exact.get(q, 0)


@pytest.mark.parametrize("seed", range(3))
def test_bloom_contamination_superset_of_exact(spark, seed):
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import bloom_contamination, contamination_report

    rng = random.Random(1400 + seed)
    n = 2
    m, k = rng.choice([(1 << 14, 3), (1 << 16, 4)])
    docs = []
    for i in range(rng.randint(10, 60)):
        ln = rng.randint(n, 25)
        docs.append((i, " ".join(rng.choice(WORDS) for _ in range(ln))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") % 5 == 0)
    corpus = df.filter(F.col("doc_id") % 5 != 0)

    exact = {
        r.doc_id: r.hits
        for r in contamination_report(
            corpus, bench, "doc_id", "text", n=n, min_hits=1
        ).collect()
    }
    bloom = {
        r.doc_id: r.hits
        for r in bloom_contamination(
            corpus, bench, "doc_id", "text", n=n, min_hits=1, m=m, k=k
        ).collect()
    }
    # bloom has no false negatives: every exactly-contaminated doc is
    # flagged with at least its exact hit count
    for doc_id, hits in exact.items():
        assert doc_id in bloom
        assert bloom[doc_id] >= hits

    # pure-Python replay of the bloom bit math must agree exactly
    def grams(text: str) -> set[str]:
        t = text.split()
        return {
            " ".join(t[i : i + n]) for i in range(len(t) - n + 1)
        } if len(t) >= n else set()

    def positions(gram: str):
        key = _gram_key(gram)
        return {_cms_pos(key, j, m) for j in range(k)}

    bits: set[int] = set()
    for doc_id, text in docs:
        if doc_id % 5 == 0:
            for g in grams(text):
                bits |= positions(g)
    want: dict[int, int] = {}
    for doc_id, text in docs:
        if doc_id % 5 == 0:
            continue
        hits = sum(
            1
            for key in {_gram_key(g) for g in grams(text)}
            if all(
                _cms_pos(key, j, m) in bits for j in range(k)
            )
        )
        if hits >= 1:
            want[doc_id] = hits
    assert bloom == want


@pytest.mark.parametrize("seed", range(3))
def test_remove_boilerplate_matches_reference(spark, seed):
    from griddb_spark.pipeline import boilerplate_spans, remove_boilerplate

    rng = random.Random(1500 + seed)
    k = rng.choice([2, 3])
    min_df = rng.choice([2, 3])
    chrome = " ".join(rng.choice(WORDS) for _ in range(k))  # planted chrome
    docs = []
    for i in range(rng.randint(8, 30)):
        n = rng.randint(1, 20)
        body = [rng.choice(WORDS) for _ in range(n)]
        # plant the chrome span at a k-aligned offset in most docs
        text = (chrome + " " + " ".join(body)) if i % 2 == 0 else " ".join(body)
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # reference
    def spans_of(text):
        t = text.split()
        return [" ".join(t[i:i + k]) for i in range(0, max(len(t), 1), k)]

    from collections import Counter
    dfreq = Counter()
    for _, text in docs:
        for s in set(spans_of(text)):
            dfreq[s] += 1
    flagged = {s for s, c in dfreq.items() if c >= min_df}

    got_bp = {r.span: r.df for r in
              boilerplate_spans(df, "doc_id", "text", k, min_df).collect()}
    assert got_bp == {s: dfreq[s] for s in flagged}

    want = {}
    for i, text in docs:
        sp = spans_of(text)
        keptl = [s for s in sp if s not in flagged]
        want[i] = (" ".join(keptl), len(sp), len(sp) - len(keptl))
    got = {
        r.doc_id: (r.clean_text, r.n_spans, r.n_removed)
        for r in remove_boilerplate(df, "doc_id", "text", k, min_df).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", range(3))
def test_semantic_decontam_max_sim_matches_reference(spark, seed):
    import math

    from pyspark.sql import functions as F

    from griddb_spark.pipeline.similarity import cosine

    rng = random.Random(1600 + seed)
    dim = 8
    vecs = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(30)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    bench = df.filter(F.col("vec_id") % 5 == 0).select(
        F.col("embedding").alias("__bv"))
    corpus = df.filter(F.col("vec_id") % 5 != 0).select(
        "vec_id", F.col("embedding").alias("__cv"))
    got = {
        r.vec_id: r.mx
        for r in corpus.crossJoin(F.broadcast(bench))
        .groupBy("vec_id")
        .agg(F.round(F.max(cosine(F.col("__cv"), F.col("__bv"))), 6)
             .alias("mx"))
        .collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    bvs = [v for i, v in vecs if i % 5 == 0]
    for i, v in vecs:
        if i % 5 == 0:
            continue
        ref = round(max(cos(v, b) for b in bvs), 6)
        assert abs(got[i] - ref) <= 1e-6


@pytest.mark.parametrize("seed", range(3))
def test_train_split_deterministic_and_partitions(spark, seed):
    import hashlib as _h

    from pyspark.sql import functions as F

    from griddb_spark.pipeline import train_split

    rng = random.Random(1700 + seed)
    ids = rng.sample(range(100000), 200)
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r.doc_id: r.split
           for r in train_split(df, "doc_id", fr).collect()}

    def bucket(i):
        return int(_h.md5(str(i).encode()).hexdigest()[:8], 16) % 10000

    for i in ids:
        b = bucket(i)
        want = ("train" if b < 8000 else "val" if b < 9000
                else "test" if b < 10000 else "rest")
        assert got[i] == want
    # stability under repartitioning
    got2 = {r.doc_id: r.split
            for r in train_split(df.repartition(7), "doc_id", fr).collect()}
    assert got2 == got


def test_snapshot_diff_statuses(spark):
    from griddb_spark.pipeline import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, t string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, "d")], "k long, t string")
    got = {r.k: r.status for r in snapshot_diff(old, new, "k", "t").collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_union_find_matches_distributed_components(spark):
    """union_find_min (the driver path shared by connected_components'
    stats-dispatch and the streaming dedup) must agree with the
    distributed Pregel loop on random graphs, including chains that need
    multiple propagation rounds."""
    import random

    from griddb_spark.pipeline.dedup import connected_components, union_find_min

    rng = random.Random(7)
    for trial in range(5):
        n = rng.randint(2, 60)
        edges = [(rng.randint(0, n), rng.randint(0, n))
                 for _ in range(rng.randint(1, 80))]
        # long chain: worst case for min-label propagation
        edges += [(i, i + 1) for i in range(20, 20 + rng.randint(3, 15))]
        want = union_find_min(edges)
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["doc_id"]: r["component"]
            for r in connected_components(pairs, small_edges=0).collect()
        }
        assert got == {int(k): int(v) for k, v in want.items()}, trial

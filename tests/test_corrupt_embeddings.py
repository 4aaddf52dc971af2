"""Corrupt-row tolerance contract for every embedding operator.

Real crawl corpora carry NULL embeddings, vectors shorter than the
expected width, and mixed widths. The uniform contract: corrupt rows
never crash an operator, never silently vanish, and take DEFINED
degenerate values — NULL cluster/codes/similarity (both JVM and
Arrow-GEMM dispatch paths agree), no pairs (pair kernels compare only
equal-width vectors), survivor status in every dedup. The ANN operator
and streaming index have their own tests (test_pipeline /
test_streaming); this file covers the rest of the family.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

ROWS = [
    (1, [0.3] * 16),
    (2, [0.31] * 16),        # same direction as 1 → near-dup at ≥0.95
    (3, None),               # NULL embedding
    (4, [1.0, -2.0]),        # far short
    (5, [-0.2] * 32),        # off-width (wider)
    (6, [0.5] * 16),         # same direction as 1
]
CENTS = [(0, [0.3] * 16), (1, [-0.3] * 16)]


@pytest.fixture()
def corrupt(spark):
    return spark.createDataFrame(
        ROWS, "vec_id long, embedding array<double>")


def test_assign_clusters_null_for_corrupt_both_paths(corrupt):
    from griddb_spark.pipeline.similarity import assign_clusters

    got = {r.vec_id: r.cluster
           for r in assign_clusters(corrupt, CENTS).collect()}
    assert got == {1: 0, 2: 0, 3: None, 4: None, 5: None, 6: 0}
    # GEMM dispatch (k above the JVM cutoff) must agree on corrupt rows
    bigc = [(i, [0.01 * (i + 1)] * 16) for i in range(40)]
    gemm = {r.vec_id: r.cluster
            for r in assign_clusters(corrupt, bigc).collect()}
    assert {k for k, v in gemm.items() if v is None} == {3, 4, 5}


def test_pq_encode_null_codes_for_corrupt_both_paths(corrupt):
    from griddb_spark.pipeline.similarity import pq_encode

    books = [[(0, [0.1] * 4), (1, [-0.1] * 4)] for _ in range(4)]
    got = {r.vec_id: r.codes is None
           for r in pq_encode(corrupt, "vec_id", "embedding",
                              books).collect()}
    # 5 is WIDER than the codebook width: encodes its first 16 dims
    assert got == {1: False, 2: False, 3: True, 4: True,
                   5: False, 6: False}
    bigbooks = [[(c, [0.01 * (c + 1)] * 4) for c in range(40)]
                for _ in range(4)]
    gemm = {r.vec_id: r.codes is None
            for r in pq_encode(corrupt, "vec_id", "embedding",
                               bigbooks).collect()}
    assert gemm == got


def test_kmeans_fit_trains_on_modal_width_only(spark, corrupt):
    from griddb_spark.pipeline.similarity import kmeans_fit

    cents = kmeans_fit(corrupt, "vec_id", "embedding", k=2)
    assert cents and all(len(c) == 16 for _, c in cents)
    # all-corrupt corpus: no trainable rows → empty model, not a crash
    empty = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>")
    assert kmeans_fit(empty, "vec_id", "embedding", k=2) == []


def test_exact_pair_kernels_skip_corrupt_rows(corrupt):
    from griddb_spark.pipeline import cosine_pairs
    from griddb_spark.pipeline.similarity import (
        assign_clusters,
        cosine_pairs_within,
    )

    want = [(1, 2), (1, 6), (2, 6)]
    got = sorted((r.id_a, r.id_b) for r in cosine_pairs(
        corrupt, "vec_id", "embedding", threshold=0.95,
        blocks=2).collect())
    assert got == want
    within = sorted((r.id_a, r.id_b) for r in cosine_pairs_within(
        assign_clusters(corrupt, CENTS), "cluster", "vec_id",
        "embedding", 0.95).collect())
    assert within == want


def test_semdedup_keeps_corrupt_rows(corrupt):
    from griddb_spark.pipeline.similarity import semdedup

    kept = sorted(r.vec_id for r in semdedup(
        corrupt, "vec_id", "embedding", k=2, threshold=0.95).collect())
    # 2 and 6 dedup against 1; the corrupt rows all survive
    assert kept == [1, 3, 4, 5]


def test_max_sim_vs_bench_null_for_corrupt(corrupt):
    from griddb_spark.pipeline.similarity import max_sim_vs_bench

    got = {r.vec_id: r.max_bench_sim for r in max_sim_vs_bench(
        corrupt, corrupt.filter("vec_id = 1"), "vec_id",
        "embedding").collect()}
    assert got[1] == 1.0 and got[3] is None
    assert got[4] is None and got[5] is None

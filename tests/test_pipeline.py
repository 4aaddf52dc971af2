"""Operator-level tests for the LLM-pipeline module (dedup / similarity /
text analysis / multimodal) at sf0.001; the differential oracle gate runs
through workload entries (scripts/check_workload.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(catalog):
    return catalog.load("documents")


@pytest.fixture(scope="module")
def emb(catalog):
    return catalog.load("embeddings")


def test_exact_dedup_identifies_planted_dups(spark, docs):
    from griddb_spark.pipeline import exact_dedup

    dup = docs.limit(3).union(docs.limit(3))  # plant exact duplicates
    out = exact_dedup(dup, "text", "doc_id")
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.n_dups == 2 for r in rows)


def test_minhash_lsh_finds_high_jaccard_pairs(spark, docs):
    from griddb_spark.pipeline import minhash_lsh_pairs

    base = docs.select("doc_id", "text")
    # plant a near-duplicate: doc 0 with one word changed, new id
    nd = base.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
    )
    out = minhash_lsh_pairs(base.union(nd), "doc_id", "text", threshold=0.8)
    pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert (0, 100000) in pairs


def test_simhash_is_64bit_hex_and_selfdup_has_zero_hamming(spark, docs):
    from griddb_spark.pipeline import simhash_pairs, with_simhash

    sim = with_simhash(docs.limit(5), "doc_id", "text").collect()
    assert all(len(r.simhash) == 16 for r in sim)
    dup = docs.limit(2).select("text").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    both = dup.union(dup.select("text", (F.col("doc_id") + 10).alias("doc_id")))
    out = simhash_pairs(both, "doc_id", "text", max_hamming=3).collect()
    assert any(r.hamming == 0 for r in out)


def test_knn_bruteforce_topk_shape(spark, emb):
    from griddb_spark.pipeline import knn_bruteforce

    out = knn_bruteforce(emb, emb.filter(F.col("vec_id") < 2), k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
        assert r.q_id != r.n_id
        assert -1.0 <= r.cos_sim <= 1.0
    assert set(by_q) == {0, 1}
    assert all(len(v) == 3 for v in by_q.values())
    # nearest-first ordering
    for v in by_q.values():
        sims = [r.cos_sim for r in sorted(v, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_ann_ivf_agrees_with_bruteforce_on_probed_cells(spark, emb):
    from griddb_spark.pipeline import ann_ivf, knn_bruteforce

    q = emb.filter(F.col("vec_id") == 0)
    ivf = ann_ivf(emb, q, cell_col="label", k=3, nprobe=10)  # probe ALL cells
    bf = knn_bruteforce(emb, q, k=3)
    assert [(r.n_id, r.cos_sim) for r in ivf.orderBy("rank").collect()] == [
        (r.n_id, r.cos_sim) for r in bf.orderBy("rank").collect()
    ]


def test_quality_stats_ranges(spark, docs):
    from griddb_spark.pipeline import quality_stats

    stats = quality_stats("text")
    row = docs.select(*[c.alias(n) for n, c in stats.items()]).first()
    assert row.n_tokens > 0 and row.n_bpe_tokens >= row.n_tokens
    assert 0.0 <= row.punct_ratio <= 1.0
    assert 0.0 <= row.stop_ratio <= 1.0
    assert 0.0 <= row.quality_score <= 1.0


def test_lang_id_known_markers(spark):
    from griddb_spark.pipeline import lang_id

    df = spark.createDataFrame(
        [("the cat and the dog is here",), ("der hund und die katze ist da",),
         ("xyzzy plugh",)],
        ["text"],
    )
    out = [r[0] for r in df.select(lang_id("text")).collect()]
    assert out == ["en", "de", "und"]


def test_multimodal_decode_stub(spark, docs):
    from griddb_spark.pipeline.multimodal import (
        _decode_image,
        decode_features,
        pack_binary,
    )

    packed = pack_binary(docs.limit(10), "text")
    feats = decode_features(packed, "media", "doc_id", fake=True)
    rows = feats.collect()
    assert len(rows) == 10
    assert all(len(r.feat) == 4 and r.n_bytes > 0 for r in rows)
    with pytest.raises(NotImplementedError):
        _decode_image(b"abc", fake=False)

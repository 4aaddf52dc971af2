"""Operator-level tests for the LLM-pipeline module (dedup / similarity /
text analysis / multimodal) at sf0.001; the differential oracle gate runs
through workload entries (scripts/check_workload.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


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


def test_multimodal_resize_stub(spark):
    from griddb_spark.pipeline.multimodal import pack_binary, resize_media

    df = spark.createDataFrame(
        [(1, "a" * 10), (2, "b" * 200), (3, "c")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in resize_media(pack_binary(df, "text"), out_bytes=64).collect()
    }
    # every blob lands at exactly 64 bytes, shorter inputs repeat bytes
    assert all(len(out[i].resized) == 64 for i in (1, 2, 3))
    assert out[1].resized == b"a" * 64
    assert out[1].r_mean == float(ord("a"))


def test_multimodal_frame_sample_stub(spark):
    from griddb_spark.pipeline.multimodal import frame_sample, pack_binary

    df = spark.createDataFrame(
        # 100 bytes -> frames 0,1,2 complete (32B), stride 2 -> idx 0 and 2;
        # 10 bytes -> no complete frame -> no rows
        [(1, "x" * 100), (2, "y" * 10)], ["doc_id", "text"]
    )
    rows = frame_sample(
        pack_binary(df, "text"), frame_bytes=32, stride=2
    ).collect()
    assert {(r.doc_id, r.frame_idx) for r in rows} == {(1, 0), (1, 2)}
    assert all(len(r.frame) == 32 and r.f_mean == float(ord("x")) for r in rows)


def test_collapse_exact_clusters(spark):
    from griddb_spark.pipeline import collapse_exact

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (5, "same text"),
         (3, "other"), (4, "third one")],
        ["doc_id", "text"],
    )
    reps = {r.doc_id: r.cluster_size
            for r in collapse_exact(df, "doc_id", "text").collect()}
    # min-id representative per distinct text, cluster sizes carried
    assert reps == {1: 3, 3: 1, 4: 1}


def test_connected_components_chains_and_singletons(spark):
    from griddb_spark.pipeline import connected_components

    # two chains (1-2-3-4 transitively, 10-11) — components = min id even
    # for nodes connected only through intermediates
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.component
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_string_ids_distributed_path(spark):
    """Regression: the distributed loop's label-sum convergence shortcut
    is numeric-only; string labels cast to NULL and previously made every
    round look converged after one propagation. small_edges=0 forces the
    Pregel path on a chain that needs >1 round."""
    from griddb_spark.pipeline import connected_components

    pairs = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
        ["doc_a", "doc_b"],
    )
    got = {r.doc_id: r.component
           for r in connected_components(pairs, small_edges=0).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "x": "x", "y": "x"}


def test_connected_components_numeric_distributed_path(spark):
    from griddb_spark.pipeline import connected_components

    pairs = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.component
           for r in connected_components(pairs, small_edges=0).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_canonical_filter_keeps_reps_and_unclustered(spark):
    from griddb_spark.pipeline import canonical_filter, connected_components

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(2, 5), (5, 6)], ["doc_a", "doc_b"])
    comps = connected_components(pairs)
    kept = {r.doc_id for r in canonical_filter(docs, comps).collect()}
    # 5 and 6 collapse into 2; everything unclustered survives
    assert kept == {1, 2, 3, 4, 7}


def test_deterministic_sample_is_stable_and_partition_invariant(spark):
    from griddb_spark.pipeline import deterministic_sample

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    a = {r.id for r in deterministic_sample(df, "id", 0.3).collect()}
    b = {r.id for r in
         deterministic_sample(df.repartition(7), "id", 0.3).collect()}
    assert a == b, "keep decision must not depend on partitioning"
    assert 0.25 < len(a) / 2000 < 0.35
    # monotone: raising the rate only adds rows (hash-bucket thresholding)
    c = {r.id for r in deterministic_sample(df, "id", 0.6).collect()}
    assert a <= c


def test_stratified_sample_rates(spark):
    from griddb_spark.pipeline import stratified_sample

    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "grp"])
    kept = stratified_sample(df, "id", "grp", {"a": 1.0, "b": 0.2}).collect()
    na = sum(1 for r in kept if r.grp == "a")
    nb = sum(1 for r in kept if r.grp == "b")
    assert na == 1000, "rate 1.0 keeps the whole stratum"
    assert 0.13 < nb / 1000 < 0.27


def test_decontaminate_flags_overlapping_docs(spark):
    from griddb_spark.pipeline import contamination_report, decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "a quick brown fox jumps over a fence"),  # 2 shared 3-grams
            (2, "the quick brown fox runs"),              # 1 shared 3-gram
            (3, "completely unrelated words here today"),
        ],
        "doc_id long, text string",
    )
    rep = {r.doc_id: r.hits
           for r in contamination_report(corpus, bench, n=3,
                                         min_hits=1).collect()}
    # doc 1: "quick brown fox" + "brown fox jumps" + "fox jumps over";
    # doc 2: "the quick brown" + "quick brown fox"
    assert rep[1] == 3 and rep[2] == 2 and 3 not in rep
    clean = decontaminate(corpus, bench, n=3, min_hits=3)
    assert sorted(r.doc_id for r in clean.collect()) == [2, 3]


def test_pack_sequences_layout_is_head_to_tail(spark):
    from griddb_spark.pipeline.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (10 + i))) for i in range(12)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget=16, n_buckets=2).collect()
    by_bucket: dict[int, list] = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(len(v) for v in by_bucket.values()) and len(out) == 12
    for rows in by_bucket.values():
        rows.sort(key=lambda r: r.doc_id)
        start = 0
        for r in rows:
            assert r.pack_id == start // 16
            assert r.pack_offset == start % 16
            start += r.n_tokens


def test_pack_sequences_is_partition_invariant(spark):
    from griddb_spark.pipeline.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (5 + i % 7))) for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, budget=32).collect()))
    b = sorted(map(tuple,
                   pack_sequences(docs.repartition(13), budget=32).collect()))
    assert a == b


def test_vocab_topk_deterministic_tiebreak(spark):
    from griddb_spark.pipeline.packing import vocab_topk

    docs = spark.createDataFrame(
        [(1, "b a c a b c"), (2, "a b c d!")],
        "doc_id long, text string",
    )
    rows = vocab_topk(docs, "text", k=3, mode="bpe").collect()
    assert [(r.token, r.n) for r in rows] == [("a", 3), ("b", 3), ("c", 3)]


def test_incremental_minhash_finds_cross_batch_dup(spark, docs):
    from pyspark.sql import functions as F

    from griddb_spark.pipeline.dedup import incremental_minhash_pairs, lsh_index

    base = docs.select("doc_id", "text").limit(40)
    # the "new batch": doc 0 lightly edited, plus an unrelated new doc
    new = base.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    banded, sh = lsh_index(base, "doc_id", "text")
    out = incremental_minhash_pairs(new, banded, sh, "doc_id", "text",
                                    threshold=0.8)
    pairs = {(r.new_id, r.old_id) for r in out.collect()}
    assert (500000, 0) in pairs
    # a batch with no near-dups probes to an empty result
    fresh = spark.createDataFrame(
        [(900000, "completely unrelated words nowhere in corpus xyzzy")],
        "doc_id long, text string",
    )
    assert incremental_minhash_pairs(
        fresh, banded, sh, "doc_id", "text", threshold=0.8
    ).count() == 0


def test_canonical_best_keeps_highest_quality_member(spark):
    from griddb_spark.pipeline.dedup import canonical_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7), (9, 99)],
        "doc_id long, n_chars long",
    )
    # one cluster {1,2,3}: 2 and 3 tie on quality -> keep 2 (smaller id);
    # 4 clusters with itself only never appears in components; 9 unclustered
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id long, component long")
    kept = sorted(r.doc_id for r in canonical_best(docs, comp, "n_chars").collect())
    assert kept == [2, 4, 9]


def test_linear_probe_score_matches_numpy(spark, emb):
    import math

    from griddb_spark.pipeline.similarity import linear_probe_score

    w = [((i * 37) % 21 - 10) / 10.0 for i in range(1, 65)]
    out = linear_probe_score(emb, "embedding", w, bias=0.1).select(
        "vec_id", "embedding", "score").limit(20).collect()
    for r in out:
        z = sum(float(x) * wi for x, wi in zip(r.embedding, w)) + 0.1
        assert abs(r.score - 1.0 / (1.0 + math.exp(-z))) < 1e-6


def test_linear_probe_plan_has_no_shuffle(spark, emb):
    from griddb_spark.pipeline.similarity import linear_probe_score

    w = [0.1] * 64
    plan = (linear_probe_score(emb, "embedding", w)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_png_codec_roundtrip_all_filters_and_channels(spark):
    import random

    from griddb_spark.pipeline.multimodal import png_decode, png_encode

    rng = random.Random(17)
    for w, h, ch in [(32, 4, 1), (7, 3, 3), (5, 5, 4), (1, 1, 1), (16, 9, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        assert png_decode(png_encode(px, w, h, ch)) == (w, h, ch, px)
    # gradient forces non-trivial (Sub/Up) filter selection; Average and
    # Paeth reconstruction are exercised by the foreign-encoder fixtures
    px = bytes((x * 3 + y * 7) % 256 for y in range(20) for x in range(30))
    enc = png_encode(px, 30, 20)
    assert png_decode(enc)[3] == px
    # the adaptive chooser actually picked a non-None filter somewhere
    import zlib as _z

    idat = enc.split(b"IDAT")[1]
    raw = _z.decompress(idat[: len(idat) - 8])
    assert any(raw[y * 31] != 0 for y in range(20))


def test_png_decoder_reads_foreign_encoders():
    """Spec-compliance: PNGs written by real-world encoders (not our own)
    must decode — gray, RGB+palette, RGBA profiles."""
    import os

    from griddb_spark.pipeline.multimodal import png_decode

    fixtures = [
        ("/usr/share/doc/python3/_static/minus.png", 1),   # grayscale
        ("/usr/share/gitweb/static/git-logo.png", 3),      # indexed->RGB
        ("/usr/share/doc/python3/_static/file.png", 4),    # RGBA
    ]
    seen = 0
    for path, ch in fixtures:
        if not os.path.exists(path):
            continue
        w, h, c, px = png_decode(open(path, "rb").read())
        assert c == ch and len(px) == w * h * c and w > 0 and h > 0
        seen += 1
    assert seen >= 1  # at least one independent encoder exercised


def test_png_pack_meta_parses_ihdr_jvm_side(spark):
    from griddb_spark.pipeline.multimodal import png_decode, png_pack

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "xy" * 40), (3, "short")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in png_pack(df, "text", width=32).collect()}
    assert set(rows) == {1, 2}  # doc 3 (<32 bytes) dropped
    for i, n in ((1, 100), (2, 80)):
        meta = rows[i].media_meta
        assert meta.format == "image/png"
        assert (meta.width, meta.height) == (32, n // 32)
        assert meta.header_hex == "89504e47"
        # JVM-parsed dims must equal the decoded truth
        w, h, c, px = png_decode(bytes(rows[i].media))
        assert (w, h, c) == (meta.width, meta.height, 1)


def test_multimodal_resize_and_frames_real_png(spark):
    from griddb_spark.pipeline.multimodal import (
        frame_sample,
        png_decode,
        png_pack,
        resize_media,
    )

    text = "".join(chr(65 + (i * 11) % 26) for i in range(320))  # 32x10
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    packed = png_pack(df, "text", width=32)

    r = resize_media(packed, out_w=8, out_h=8).collect()[0]
    assert (r.r_w, r.r_h) == (8, 8)
    w, h, c, px = png_decode(bytes(r.resized))  # output is itself a PNG
    assert (w, h, c) == (8, 8, 1)
    want = bytes(
        ord(text[((rr * 10) // 8) * 32 + (cc * 32) // 8])
        for rr in range(8) for cc in range(8)
    )
    assert px == want and r.r_mean == sum(want) / 64

    fr = {f.frame_idx: f for f in frame_sample(packed, stride=2).collect()}
    assert set(fr) == {0, 2, 4, 6, 8}  # every 2nd scanline of 10
    for k, f in fr.items():
        line = text[k * 32:(k + 1) * 32].encode()
        assert bytes(f.frame) == line
        assert f.f_mean == sum(line) / 32


def test_cosine_pairs_ann_equals_exact_on_near_dup_corpus(spark, emb):
    """The ANN candidate route (sign-code cells + Hamming-1 multi-probe)
    must reproduce the exact kernel's output where its recall contract
    holds: a corpus whose true near-dups share sign codes."""
    from griddb_spark.pipeline import cosine_pairs, cosine_pairs_ann

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = base.unionByName(pert)
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_pairs(
            corpus, "vec_id", "embedding", threshold=0.9, blocks=4
        ).collect()
    }
    ann = {
        (r.id_a, r.id_b)
        for r in cosine_pairs_ann(
            corpus, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    n = base.count()
    assert ann == exact and len(ann) == n  # one planted pair per vector


def test_cosine_pairs_ann_candidates_are_cell_bounded(spark, emb):
    """Sanity on the sub-quadratic claim: the candidate count must be far
    below n^2/2 (the exact kernel's pair count) on a spread-out corpus."""
    from pyspark.sql import functions as SF

    from griddb_spark.pipeline.similarity import sign_code

    n = emb.count()
    v = emb.select(
        SF.col("embedding").cast("array<double>").alias("__v")
    ).withColumn("__cell", sign_code(SF.col("__v"), 8))
    occupancy = v.groupBy("__cell").count().collect()
    # candidates <= sum over cells of 9 * occupancy^2 (own + 8 probes)
    cand_bound = 9 * sum(r["count"] ** 2 for r in occupancy)
    assert cand_bound < n * n / 4


def test_cosine_pairs_ann_supports_string_ids(spark, emb):
    """The mapInPandas output schema derives the id type from the input —
    string document ids must work, not just bigint (the hardcoded
    'id_a long' schema used to die with an Arrow cast error)."""
    from griddb_spark.pipeline import cosine_pairs_ann

    base = emb.limit(50).select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    pert = base.select(
        F.concat(F.col("vec_id"), F.lit("-dup")).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    got = cosine_pairs_ann(
        base.unionByName(pert), "vec_id", "embedding", threshold=0.9
    ).collect()
    assert len(got) == 50
    assert all(isinstance(r.id_a, str) and r.id_b == r.id_a + "-dup"
               for r in got)


def test_cosine_pairs_ann_tolerates_ragged_and_null_embeddings(spark):
    """Real crawl corpora carry corrupt rows: NULL embeddings, vectors
    shorter than the code width (NULL sign cell), and mixed widths above
    it. None may crash the operator — NULL/short rows are unpairable
    (they emit no pairs; dedup callers keep them), and wider mixed
    widths pair only within their own width (width rides in the kernel
    group key, so np.stack always sees a uniform matrix)."""
    from griddb_spark.pipeline import cosine_pairs_ann

    base16 = [0.3] * 16
    base32 = [-0.2] * 32
    rows = [
        (1, base16),
        (2, [x * 1.001 for x in base16]),     # near-dup of 1 (16-dim)
        (3, base32),
        (4, [x * 1.001 for x in base32]),     # near-dup of 3 (32-dim)
        (5, None),                            # NULL embedding
        (6, [1.0, -1.0, 1.0]),                # shorter than 8 bits
        (7, [9.0, -9.0] * 8),                 # 16-dim, orthogonal to 1/2
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted((r.id_a, r.id_b) for r in cosine_pairs_ann(
        df, "vec_id", "embedding", threshold=0.9, sign_bits=8).collect())
    assert got == [(1, 2), (3, 4)]


def test_cosine_pairs_ann_multi_tile_parity(spark, emb, monkeypatch):
    """The per-cell kernel tiles its row side at _VERIFY_TILE_ELEMS so
    per-task memory is bounded regardless of occupancy. Forcing 1-row
    tiles (budget smaller than any member count) must reproduce the
    default run exactly — including cos_sim values and the tile-relative
    id indexing on both the own-cell triangular and Hamming-1 paths."""
    from griddb_spark.pipeline import cosine_pairs_ann, similarity

    base = emb.limit(120).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = base.unionByName(pert)

    def pairs():
        return sorted(
            (r.id_a, r.id_b, r.cos_sim)
            for r in cosine_pairs_ann(
                corpus, "vec_id", "embedding", threshold=0.9
            ).collect()
        )

    untiled = pairs()
    monkeypatch.setattr(similarity, "_VERIFY_TILE_ELEMS", 1)
    assert pairs() == untiled and len(untiled) == 120


def test_kmeans_matches_numpy_reference(spark, emb):
    """kmeans_fit + assign_clusters must reproduce a sequential NumPy
    Lloyd's under the same fixed-point contract (cosine and centroid
    means rounded to 6dp, argmax ties to the lowest cluster index,
    empty clusters dropped) — multi-iteration, so the update loop is
    exercised beyond what the 1-iteration oracle gate covers."""
    import numpy as np

    from griddb_spark.pipeline import assign_clusters, kmeans_fit

    k, iters = 5, 3
    rows = emb.orderBy("vec_id").collect()
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = [r["vec_id"] for r in rows]

    def ref_assign(cents):
        out = []
        for x in X:
            best = None
            for ci, c in cents:
                den = np.linalg.norm(x) * np.linalg.norm(c)
                cos = round(float(np.dot(x, c) / den), 6) if den > 0 else 0.0
                if best is None or cos > best[0]:
                    best = (cos, ci)
            out.append(best[1])
        return out

    cents = [(i, X[i].copy()) for i in range(k)]
    for _ in range(iters):
        a = ref_assign(cents)
        cents = [
            (ci, np.array([round(float(m), 6)
                           for m in X[[j for j, cj in enumerate(a) if cj == ci]]
                           .mean(axis=0)]))
            for ci in sorted(set(a))
        ]
    want = dict(zip(ids, ref_assign(cents)))

    got_cents = kmeans_fit(emb, "vec_id", "embedding", k=k, iters=iters)
    assert [ci for ci, _ in got_cents] == [ci for ci, _ in cents]
    for (_, gc), (_, wc) in zip(got_cents, cents):
        assert np.allclose(gc, wc, atol=0, rtol=0)
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(emb, got_cents).select(
            "vec_id", "cluster").collect()
    }
    assert got == want


def test_assign_clusters_dispatch_paths_agree(spark, emb, monkeypatch):
    """The all-JVM expression path (small k) and the Arrow GEMM path
    (large k) are the same operator — identical assignments on identical
    centroids, including tie-breaks."""
    from griddb_spark.pipeline import assign_clusters, kmeans_fit
    from griddb_spark.pipeline import similarity as sim

    cents = kmeans_fit(emb, "vec_id", "embedding", k=20, iters=1)
    assert len(cents) > 16  # large enough to exercise the GEMM path

    monkeypatch.setattr(sim, "_ASSIGN_JVM_MAX_K", 10_000)
    jvm = {r["vec_id"]: r["cluster"]
           for r in assign_clusters(emb, cents).select(
               "vec_id", "cluster").collect()}
    monkeypatch.setattr(sim, "_ASSIGN_JVM_MAX_K", 0)
    gemm = {r["vec_id"]: r["cluster"]
            for r in assign_clusters(emb, cents).select(
                "vec_id", "cluster").collect()}
    assert jvm == gemm


def test_semdedup_keeps_one_per_planted_group(spark, emb):
    """semdedup on a corpus of originals + scaled near-duplicates must
    keep exactly the originals: cosine is scale-invariant, so a planted
    pair always lands in the same k-means cell (same rounded cosine
    vector → same argmax) and collapses to its min id."""
    from griddb_spark.pipeline import assign_clusters, kmeans_fit, semdedup

    base = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    corpus = base.unionByName(pert)
    kept = semdedup(
        corpus, "vec_id", "embedding", k=8, iters=1, threshold=0.9
    ).collect()
    assert sorted(r["vec_id"] for r in kept) == sorted(
        r["vec_id"] for r in base.select("vec_id").collect()
    )
    # the cluster column is the final assignment, verbatim
    cents = kmeans_fit(corpus, "vec_id", "embedding", k=8, iters=1)
    want = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(corpus, cents).select(
            "vec_id", "cluster").collect()
    }
    assert all(want[r["vec_id"]] == r["cluster"] for r in kept)


def test_dhash_brightness_invariant_and_exact(spark):
    """The dHash encodes horizontal gradient SIGNS: a uniform brightness
    shift must not change it (the perceptual property), identical images
    must collide, and a horizontally-flipped gradient must differ."""
    import pandas as pd

    from griddb_spark.pipeline.multimodal import dhash_media, png_encode

    base = bytes((r * 7 + c * 11) % 200 for r in range(16) for c in range(16))
    brighter = bytes(min(255, px + 40) for px in base)  # clip-free: max 199+40
    flipped = bytes(
        base[r * 16 + (15 - c)] for r in range(16) for c in range(16)
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "media": [
                    png_encode(base, 16, 16),
                    png_encode(base, 16, 16),
                    png_encode(brighter, 16, 16),
                    png_encode(flipped, 16, 16),
                ],
            }
        )
    )
    got = {r["doc_id"]: r["dhash"]
           for r in dhash_media(df, "media", "doc_id").collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] != got[1]


def test_hamming_pairs_int_matches_bruteforce(spark):
    """Pigeonhole banding must be recall-COMPLETE: the banded candidate
    join's output equals brute-force all-pairs Hamming for every
    max_hamming <= bands-1, and invalid band configs are rejected."""
    import itertools
    import random

    import pandas as pd
    import pytest

    from griddb_spark.pipeline.dedup import hamming_pairs_int

    rng = random.Random(7)
    base = [rng.getrandbits(56) for _ in range(12)]
    # seed guaranteed near-pairs: flip 1..6 random bits of some bases
    hashes = list(base)
    for i, flips in [(0, 1), (1, 3), (2, 5), (3, 7), (4, 2)]:
        h = base[i]
        for b in rng.sample(range(56), flips):
            h ^= 1 << b
        hashes.append(h)
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(hashes)), "h": hashes})
    )
    for mh in (2, 4, 7):
        want = {
            (i, j, bin(hashes[i] ^ hashes[j]).count("1"))
            for i, j in itertools.combinations(range(len(hashes)), 2)
            if bin(hashes[i] ^ hashes[j]).count("1") <= mh
        }
        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_pairs_int(
                df, "id", "h", total_bits=56, bands=8, max_hamming=mh
            ).collect()
        }
        assert got == want
    with pytest.raises(ValueError):
        hamming_pairs_int(df, "id", "h", total_bits=56, bands=8,
                          max_hamming=8)
    with pytest.raises(ValueError):
        hamming_pairs_int(df, "id", "h", total_bits=56, bands=5,
                          max_hamming=4)


def test_retrieval_tfidf_bm25_inverted_index(spark):
    """Retrieval trio over a hand-checkable corpus: TF-IDF ranks the
    rare-but-frequent term first, BM25 prefers the doc matching more
    query terms, and the inverted index truncates postings while
    keeping the FULL document frequency."""
    import math

    import pandas as pd

    from griddb_spark.pipeline.retrieval import (
        bm25_search, inverted_index, tfidf_top_terms,
    )

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "apple apple apple banana",   # apple rare+frequent here
            "banana cherry banana",
            "cherry banana date",
            "banana date",
        ],
    }))
    top1 = {
        r["doc_id"]: r["term"]
        for r in tfidf_top_terms(df, "doc_id", "text", k=1).collect()
    }
    # doc 1: apple tf=3 df=1 beats banana tf=1 df=4
    n = 4
    s_apple = 3 * (math.log((n + 1) / (1 + 1)) + 1)
    s_banana = 1 * (math.log((n + 1) / (4 + 1)) + 1)
    assert s_apple > s_banana and top1[1] == "apple"

    bm = bm25_search(df, "doc_id", "text", ["cherry", "date"], k=4)
    rows = bm.collect()
    assert [r["doc_id"] for r in rows][0] == 3  # matches BOTH query terms
    assert all(a["score"] >= b["score"]
               for a, b in zip(rows, rows[1:]))

    inv = {
        r["term"]: (r["df_t"], r["postings"])
        for r in inverted_index(
            df, "doc_id", "text", max_postings=2
        ).collect()
    }
    assert inv["banana"] == (4, "1,2")  # df_t FULL, postings truncated asc
    assert inv["apple"] == (1, "1")


def test_cosine_pairs_within_block_path_parity(spark, emb):
    """The skew-guarded triangle-join path (forced via a tiny max_group)
    must produce exactly the single-task-per-group path's pair set —
    including in-block vs cross-block dedup and id_a<id_b
    normalization."""
    from griddb_spark.pipeline import cosine_pairs_within

    g = emb.withColumn("grp", (F.col("vec_id") % 2).cast("int"))
    direct = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cosine_pairs_within(
            g, "grp", "vec_id", "embedding", 0.4).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"], r["cos_sim"])
        for r in cosine_pairs_within(
            g, "grp", "vec_id", "embedding", 0.4, max_group=40).collect()
    }
    assert direct and blocked == direct


def test_prune_prototypes_quota_and_tail(spark, emb):
    """Per-cluster quota: exactly ceil(frac·|cluster|) kept; hardest=True
    keeps the low-similarity tail (every kept score ≤ every dropped score
    within the cluster), hardest=False the prototypical core."""
    import math

    from griddb_spark.pipeline import assign_clusters, kmeans_fit, prune_prototypes

    cents = kmeans_fit(emb, "vec_id", "embedding", k=6, iters=1)
    full = assign_clusters(
        emb, cents, score_col="proto_sim"
    ).select("vec_id", "cluster", "proto_sim").collect()
    by_c: dict = {}
    for r in full:
        by_c.setdefault(r["cluster"], []).append((r["proto_sim"], r["vec_id"]))

    for hardest in (True, False):
        kept = prune_prototypes(
            emb, "vec_id", "embedding", k=6, iters=1,
            keep_frac=0.3, hardest=hardest,
        ).collect()
        got: dict = {}
        for r in kept:
            got.setdefault(r["cluster"], set()).add(r["vec_id"])
        assert set(got) == set(by_c)
        for c, members in by_c.items():
            quota = math.ceil(0.3 * len(members))
            assert len(got[c]) == quota
            want = sorted(members, reverse=not hardest)[:quota]
            assert got[c] == {vid for _, vid in want}


def test_bpe_train_matches_python_reference(spark):
    """The distributed merge-learning loop must reproduce a sequential
    reference BPE (same greedy left-to-right apply, same count-desc /
    pair-asc tie order) merge for merge."""
    import re as _re

    from griddb_spark.pipeline.packing import bpe_train

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low newer low wide lowest",
    ]

    # -- sequential reference ------------------------------------------
    words = {}
    for t in texts:
        for w in _re.findall(r"\S+", t):
            words[w] = words.get(w, 0) + 1
    vocab = {tuple(w): f for w, f in words.items()}

    def ref_merges(n):
        v = dict(vocab)
        out = []
        for rank in range(1, n + 1):
            counts = {}
            for sym, f in v.items():
                for a, b in zip(sym, sym[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + f
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), n_best = best
            if n_best < 2:
                break
            out.append((rank, a, b, a + b, n_best))
            nv = {}
            for sym, f in v.items():
                acc = []
                for x in sym:
                    if acc and acc[-1] == a and x == b:
                        acc[-1] = a + b
                    else:
                        acc.append(x)
                nv[tuple(acc)] = nv.get(tuple(acc), 0) + f
            v = nv
        return out

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.freq)
        for r in bpe_train(df, n_merges=8).orderBy("merge_rank").collect()
    ]
    assert got == ref_merges(8) and len(got) == 8


def test_write_training_shards_empty_keepset(spark, tmp_path):
    """An aggressive curation can drop every document — the shard writer
    must return an empty manifest, not crash on schema inference."""
    from griddb_spark.pipeline.sampling import write_training_shards

    df = spark.createDataFrame([], "doc_id long, text string")
    out = write_training_shards(df, str(tmp_path / "s"), "doc_id", n_shards=4)
    assert out.collect() == []
    assert out.columns == ["shard", "n_rows"]


def test_temperature_mix_flattens_and_never_upsamples(spark, docs):
    from griddb_spark.pipeline import temperature_mix

    d = docs.select("doc_id", "source", "n_chars")
    before = {r.source: r.t for r in
              d.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()}
    kept = temperature_mix(d, "doc_id", "source", "n_chars", temperature=0.5)
    after = {r.source: r.t for r in
             kept.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()}
    # nothing upsampled; the relative spread between the biggest and
    # smallest source must shrink (flattening)
    assert all(after[s] <= before[s] for s in after)
    big, small = max(before, key=before.get), min(before, key=before.get)
    assert after[big] / max(after[small], 1) < before[big] / before[small]
    # deterministic: rerun keeps the identical set
    kept2 = temperature_mix(d, "doc_id", "source", "n_chars", temperature=0.5)
    assert sorted(r.doc_id for r in kept.collect()) == \
        sorted(r.doc_id for r in kept2.collect())


def test_stratified_fixed_k_stable_under_appends(spark, docs):
    from griddb_spark.pipeline import stratified_fixed_k

    d = docs.select("doc_id", "source")
    half = d.filter(F.col("doc_id") % 2 == 0)
    k_half = {r.doc_id for r in stratified_fixed_k(half, "doc_id", "source", 5)
              .collect()}
    k_full = {r.doc_id for r in stratified_fixed_k(d, "doc_id", "source", 5)
              .collect()}
    # per-stratum counts exactly k (every source has >5 docs)
    counts = (stratified_fixed_k(d, "doc_id", "source", 5)
              .groupBy("source").count().collect())
    assert all(r["count"] == 5 for r in counts)
    # appending only evicts (hash rank falls out of top k), never adds
    # rows that weren't hash-ranked ahead: survivors of the full run that
    # exist in the half corpus must be survivors of the half run
    half_ids = {r.doc_id for r in half.collect()}
    assert (k_full & half_ids) <= k_half


def test_png_codec_randomized_battery():
    """Randomized round-trips across sizes/channels/content shapes, plus
    decode of synthetic streams using EVERY filter type (incl. the
    Average/Paeth lines our encoder never emits but foreign encoders do)."""
    import random
    import struct
    import zlib

    from griddb_spark.pipeline.multimodal import (
        PNG_MAGIC,
        _filter_line,
        _png_chunk,
        png_decode,
        png_encode,
    )

    rng = random.Random(99)
    for _ in range(30):
        w = rng.randint(1, 40)
        h = rng.randint(1, 30)
        ch = rng.choice([1, 3, 4])
        kind = rng.randrange(3)
        n = w * h * ch
        if kind == 0:      # random noise
            px = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:    # smooth gradient (filters win big)
            px = bytes((i * 7 // (ch or 1)) % 256 for i in range(n))
        else:              # constant blocks
            px = bytes((i // max(w, 1)) % 3 * 17 for i in range(n))
        assert png_decode(png_encode(px, w, h, ch)) == (w, h, ch, px)

    # hand-built stream forcing filter types 3 (Average) and 4 (Paeth)
    for _ in range(10):
        w, h, ch = rng.randint(2, 20), rng.randint(2, 10), rng.choice([1, 3])
        stride = w * ch
        px = bytes(rng.randrange(256) for _ in range(stride * h))
        raw = bytearray()
        prev = bytes(stride)
        for y in range(h):
            line = px[y * stride:(y + 1) * stride]
            ft = rng.choice([0, 1, 2, 3, 4])
            raw.append(ft)
            raw += _filter_line(ft, line, prev, ch)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2}[ch], 0, 0, 0)
        buf = (PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _png_chunk(b"IEND", b""))
        assert png_decode(buf) == (w, h, ch, px)


def test_canonical_url_randomized_vs_python_reference(spark):
    """Randomized URL canonicalization vs an independent Python
    reference implementing the same spec (lowercase scheme+host, strip
    fragment, drop tracking params keeping others in order, trim
    trailing slash)."""
    import random
    import re as _re

    from griddb_spark.pipeline import canonical_url
    from griddb_spark.pipeline.profile import TRACKING_PARAMS

    rng = random.Random(23)

    def ref(url):
        u = _re.sub(r"#.*$", "", url)
        m = _re.match(r"(?i)^(https?://[^/?]*)(.*)$", u, _re.S)
        if m:
            u = m.group(1).lower() + m.group(2)
        host_path, sep, query = u.partition("?")
        if sep:
            parts = [p for p in query.split("&")
                     if p.split("=")[0].lower() not in TRACKING_PARAMS]
            u = host_path + ("?" + "&".join(parts) if parts else "")
        return _re.sub(r"/$", "", u)

    urls = []
    for _ in range(120):
        scheme = rng.choice(["http", "HTTP", "https", "HTTPS", "HtTpS"])
        host = rng.choice(["Example.COM", "www.site.ORG", "CDN.x.Net"])
        path = rng.choice(["", "/", "/a/b", "/Page/12", "/a/b/"])
        params = []
        for _ in range(rng.randrange(4)):
            k = rng.choice(["id", "q", "utm_source", "utm_campaign",
                            "gclid", "ref", "page"])
            params.append(f"{k}={rng.randrange(100)}")
        query = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#x", "#sec-2"])
        urls.append(f"{scheme}://{host}{path}{query}{frag}")

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c"))
           .collect()]
    for u, g in zip(urls, got):
        assert g == ref(u), (u, g, ref(u))


def test_dsir_scores_match_python_reference(spark, docs):
    """Portable-mode DSIR scores replay exactly in pure Python (md5-hex
    bucket, Laplace smoothing, 6dp-rounded decimal log-ratios)."""
    import hashlib
    import math
    from decimal import Decimal

    from griddb_spark.pipeline import dsir_scores

    B = 512
    rows = docs.select("doc_id", "source", "text").collect()
    feat = []
    for r in rows:
        for t in r.text.strip().split():
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B
            feat.append((r.doc_id, r.source == "src18", b))
    rc: dict[int, int] = {}
    tc: dict[int, int] = {}
    for _, is_t, b in feat:
        rc[b] = rc.get(b, 0) + 1
        if is_t:
            tc[b] = tc.get(b, 0) + 1
    rtot, ttot = len(feat), sum(1 for _, t, _ in feat if t)
    lw = {
        b: Decimal(
            str(round(math.log((tc.get(b, 0) + 1) / float(ttot + B))
                      - math.log((rc[b] + 1) / float(rtot + B)), 6))
        )
        for b in rc
    }
    ref: dict[int, float] = {}
    for d, _, b in feat:
        ref[d] = ref.get(d, Decimal(0)) + lw[b]
    got = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(
            docs, "doc_id", "text", F.col("source") == "src18"
        ).collect()
    }
    assert set(got) == set(ref)
    for d in got:
        assert got[d] == float(ref[d]), (d, got[d], float(ref[d]))


def test_dsir_select_prefers_target_like_docs(spark):
    """Docs drawn from the target vocabulary outrank background docs."""
    from griddb_spark.pipeline import dsir_select

    target_words = "alpha beta gamma delta epsilon".split()
    noise_words = "zero one two three four five six seven".split()
    rows = []
    for i in range(20):  # target domain
        rows.append((i, "t", " ".join(target_words[j % 5] for j in range(i, i + 12))))
    for i in range(20, 60):  # background
        rows.append((i, "b", " ".join(noise_words[j % 8] for j in range(i, i + 12))))
    for i in range(60, 70):  # target-like but unlabeled: should be selected
        rows.append((i, "b", " ".join(target_words[j % 5] for j in range(i, i + 12))))
    df = spark.createDataFrame(rows, "id long, dom string, text string")
    top = dsir_select(df, "id", "text", F.col("dom") == "t", k=30)
    ids = {r.id for r in top.collect()}
    # all 30 target-vocabulary docs (labeled + unlabeled) beat the noise
    assert ids == set(range(20)) | set(range(60, 70))


def test_dsir_fast_mode_same_docs_similar_ranking(spark, docs):
    """xxhash64 mode (the production path) scores the same doc set; the
    two hash families agree on which half of the corpus is target-like
    (rank correlation need not be exact — buckets differ)."""
    from griddb_spark.pipeline import dsir_scores

    pred = F.col("source") == "src18"
    slow = dsir_scores(docs, "doc_id", "text", pred, portable=True)
    fast = dsir_scores(docs, "doc_id", "text", pred, portable=False)
    s = {r.doc_id: r.dsir_score for r in slow.collect()}
    f = {r.doc_id: r.dsir_score for r in fast.collect()}
    assert set(s) == set(f)
    n = len(s)
    top_s = {d for d, _ in sorted(s.items(), key=lambda kv: -kv[1])[: n // 4]}
    top_f = {d for d, _ in sorted(f.items(), key=lambda kv: -kv[1])[: n // 4]}
    assert len(top_s & top_f) >= len(top_s) // 2


def test_perplexity_buckets_balanced_and_ordered(spark, docs):
    """Per language: tercile sizes differ by ≤1 and every head doc's ppl
    ≤ every tail doc's ppl (the CCNet contract)."""
    from griddb_spark.pipeline import perplexity_buckets

    out = perplexity_buckets(docs, "doc_id", "text", "lang").collect()
    by_lang: dict[str, dict[str, list]] = {}
    for r in out:
        by_lang.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.ppl)
    for lang, buckets in by_lang.items():
        sizes = [len(v) for v in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if {"head", "tail"} <= buckets.keys():
            assert max(buckets["head"]) <= min(buckets["tail"]), lang


def test_random_project_gemm_matches_exact_twin(spark, emb):
    """Production GEMM path vs exact-arithmetic twin: same sign matrix,
    agreement to ~1e-5 (the twin quantizes inputs to 1e-6 first)."""
    from griddb_spark.pipeline import random_project, random_project_exact

    exact = {
        (r.vec_id, r.j): r.comp
        for r in random_project_exact(emb, "vec_id", "embedding", 64, 16).collect()
    }
    for r in random_project(emb, "vec_id", "embedding", 64, 16).collect():
        for j, v in enumerate(r.rp):
            assert abs(v - exact[(r.vec_id, j)]) < 2e-5, (r.vec_id, j)


def test_random_project_preserves_distances(spark, emb):
    """JL contract: pairwise distances in the projected space track the
    original within a loose ε for k=16 (sanity, not a proof)."""
    import math
    import random as rnd

    from griddb_spark.pipeline import random_project

    rows = {r.vec_id: list(r.embedding) for r in emb.limit(60).collect()}
    proj = {
        r.vec_id: r.rp
        for r in random_project(emb.limit(60), "vec_id", "embedding", 64, 16).collect()
    }
    ids = sorted(rows)
    rng = rnd.Random(3)
    ratios = []
    for _ in range(40):
        a, b = rng.sample(ids, 2)
        d0 = math.dist(rows[a], rows[b])
        d1 = math.dist(proj[a], proj[b])
        if d0 > 1e-9:
            ratios.append(d1 / d0)
    mean = sum(ratios) / len(ratios)
    assert 0.75 < mean < 1.25, mean
    assert all(0.35 < r < 1.8 for r in ratios), (min(ratios), max(ratios))


def test_gopher_rules_on_synthetic_corpus(spark):
    """Each rule trips on a document built to violate exactly it."""
    from griddb_spark.pipeline import with_gopher_keep

    good = ("the quick brown fox jumps over of and that have with lazy dog "
            * 8).strip()                              # 104 words, all rules pass
    rows = [
        (1, good),
        (2, "the of and short"),                       # word count
        (3, " ".join(["ab"] * 60) + " the of"),        # mean word len < 3
        (4, good + " " + "#" * 1 + " #### ### ## # # # # # # # #"),  # symbols
        (5, "\n".join("- bullet line the of and" for _ in range(10))),  # bullets
        (6, "\n".join(f"line {i} the of and..." for i in range(10))),   # ellipsis
        (7, good + " " + " ".join(["123"] * 60)),      # alpha fraction
        (8, " ".join(f"w{i}" for i in range(80))),     # no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in with_gopher_keep(df).collect()}
    assert out[1].gopher_keep
    assert not out[2].r_word_count
    assert not out[3].r_mean_word_len
    assert not out[4].r_symbol_ratio
    assert not out[5].r_bullet_lines
    assert not out[6].r_ellipsis_lines
    assert not out[7].r_alpha_words
    assert not out[8].r_stopwords
    for i in range(2, 9):
        assert not out[i].gopher_keep, i


def test_weighted_fixed_k_matches_python_reference(spark, docs):
    """The A-ES key (-ln(u)/w from the md5 hash) replays exactly in pure
    Python; the per-stratum top-k sets are identical."""
    import hashlib
    import math

    from griddb_spark.pipeline import weighted_fixed_k

    rows = docs.select("doc_id", "source", "n_chars").collect()
    ref: dict[str, list] = {}
    for r in rows:
        u = (int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
             + 0.5) / 2**32
        ref.setdefault(r.source, []).append(
            (round(-math.log(u) / r.n_chars, 6), r.doc_id))
    want = {
        s: {d for _, d in sorted(v)[:5]} for s, v in ref.items()
    }
    got: dict[str, set] = {}
    out = weighted_fixed_k(
        docs.select("doc_id", "source", "n_chars"),
        "doc_id", "n_chars", k=5, stratum_col="source",
    ).collect()
    for r in out:
        got.setdefault(r.source, set()).add(r.doc_id)
    assert got == want


def test_weighted_fixed_k_prefers_heavy_rows(spark):
    """Inclusion tracks weight: rows with 50x the weight dominate the
    sample (statistical, margin-safe: expected ~96% heavy)."""
    from griddb_spark.pipeline import weighted_fixed_k

    rows = [(i, "s", 5000 if i < 200 else 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    out = weighted_fixed_k(df, "id", "w", k=100, stratum_col="g").collect()
    heavy = sum(1 for r in out if r.w == 5000)
    assert heavy > 75, heavy


def test_weighted_fixed_k_global_topk_no_stratum(spark):
    from griddb_spark.pipeline import weighted_fixed_k

    rows = [(i, 10 + i % 7) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    out = weighted_fixed_k(df, "id", "w", k=50)
    assert out.count() == 50
    assert set(out.columns) == {"id", "w"}


def test_pq_encode_gemm_matches_jvm_path(spark, emb):
    """The Arrow GEMM kernel (k > dispatch threshold) must produce the
    same codes as the JVM expression path for an identical codebook —
    checked by replicating a k=8 book so both paths apply to it."""
    from griddb_spark.pipeline import pq_encode, pq_train
    from griddb_spark.pipeline.similarity import _ASSIGN_JVM_MAX_K

    sub = emb.limit(200)
    books = pq_train(sub, "vec_id", "embedding", in_dim=64, m=4, k=8)
    assert all(len(b) <= _ASSIGN_JVM_MAX_K for b in books)
    jvm = {r.vec_id: r.codes for r in
           pq_encode(sub, "vec_id", "embedding", books).collect()}
    # pad each book past the dispatch threshold with far-away sentinel
    # codes that can never win the argmin -> same codes, GEMM path
    far = [1e6] * 16
    big = [b + [(len(b) + i, far) for i in range(_ASSIGN_JVM_MAX_K)]
           for b in books]
    assert all(len(b) > _ASSIGN_JVM_MAX_K for b in big)
    gemm = {r.vec_id: r.codes for r in
            pq_encode(sub, "vec_id", "embedding", big).collect()}
    assert jvm == gemm


def test_pq_adc_approximates_exact_l2_ranking(spark, emb):
    """ADC top-10 must overlap the exact squared-L2 top-10 (recall >= 0.2
    with a tiny m=4,k=8 codebook over near-uniform synthetic vectors —
    the contract is correlation, not exactness; real embedding manifolds
    quantize far better) and every query's own vector must rank first."""
    import math

    from pyspark.sql import functions as F

    from griddb_spark.pipeline import pq_adc_topk, pq_encode, pq_train

    books = pq_train(emb, "vec_id", "embedding", in_dim=64, m=4, k=8)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    qs = [(r.vec_id, list(r.embedding))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    got = pq_adc_topk(codes, books, qs, topk=10).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append((r.rn, r.vec_id))
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}
    for q_id, qv in qs:
        ranked = [v for _, v in sorted(by_q[q_id])]
        assert ranked[0] == q_id  # own vector always wins ADC
        exact = sorted(
            vecs, key=lambda d: (math.dist(qv, vecs[d]) ** 2, d)
        )[:10]
        assert len(set(ranked) & set(exact)) >= 2, (q_id, ranked, exact)


def test_pq_train_deterministic_across_partitionings(spark, emb):
    from griddb_spark.pipeline import pq_train

    b1 = pq_train(emb.repartition(17), "vec_id", "embedding", 64, m=4, k=8)
    b2 = pq_train(emb.coalesce(1), "vec_id", "embedding", 64, m=4, k=8)
    assert b1 == b2


def test_ivfpq_consistent_with_full_adc_on_probed_cells(spark, emb):
    """IVF-PQ = the full-corpus ADC ranking restricted to the probed
    cells: rebuild the pieces under the same contracts and check the
    composition (and that self-matches are excluded)."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import (
        assign_clusters,
        ivfpq_topk,
        kmeans_fit,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    qs = [(r.vec_id, list(r.embedding))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    got = ivfpq_topk(emb, "vec_id", "embedding", 64, qs,
                     coarse_k=8, m=4, k=8, nprobe=2, topk=5).collect()
    assert {r.q_id for r in got} == {0, 1, 2}
    for r in got:
        assert r.q_id != r.vec_id and 1 <= r.rn <= 5

    # full ADC over every vector, then restrict to each query's probed
    # cells: the top-5 must coincide
    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, iters=1)
    cells = {r.vec_id: r.cluster
             for r in assign_clusters(emb, cents).collect()}
    books = pq_train(emb, "vec_id", "embedding", 64, m=4, k=8)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    full = pq_adc_topk(codes, books, qs, topk=10**9).collect()
    by_q: dict[int, list] = {}
    for r in full:
        by_q.setdefault(r.q_id, []).append((r.rn, r.vec_id, r.adc_dist))
    for q_id, _ in qs:
        probed = {cells[r.vec_id] for r in got if r.q_id == q_id}
        assert len(probed) <= 2
        want = [
            (v, dist) for _, v, dist in sorted(by_q[q_id])
            if cells[v] in probed and v != q_id
        ][:5]
        have = [(r.vec_id, r.adc_dist)
                for r in sorted(got, key=lambda r: r.rn) if r.q_id == q_id]
        assert have == want, (q_id, have, want)


def test_weighted_fixed_k_excludes_invalid_weights(spark):
    """ADVICE r5: NULL/zero/negative weights must be excluded, not win
    the sample via nulls-first ascending sort."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import weighted_fixed_k

    rows = [(1, 5.0), (2, None), (3, 0.0), (4, -2.0), (5, 9.0), (6, 1.0)]
    df = spark.createDataFrame(rows, "doc_id int, w double")
    got = {r.doc_id for r in weighted_fixed_k(df, "doc_id", "w", k=4).collect()}
    assert got == {1, 5, 6}  # only the 3 valid-weight rows, k=4 notwithstanding
    # stratified branch: same exclusion
    df2 = df.withColumn("s", F.lit("a"))
    got2 = {r.doc_id
            for r in weighted_fixed_k(df2, "doc_id", "w", k=4,
                                      stratum_col="s").collect()}
    assert got2 == {1, 5, 6}


def test_round_half_away_matches_f_round(spark):
    """ADVICE r5: NumPy kernels must round half-away-from-zero like
    F.round / DuckDB, not numpy's half-to-even."""
    import numpy as np

    from griddb_spark.pipeline.similarity import round_half_away

    vals = [0.0078125, -0.0078125, 0.1234565, -0.1234565, 1.0000005,
            0.5e-6, -0.5e-6, 0.0, 0.25, -1.9999995]
    got = round_half_away(np.array(vals), 6).tolist()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    from pyspark.sql import functions as F

    want = [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]
    assert got == want, list(zip(vals, got, want))


def test_int_hash_exact_at_32bit_extremes(spark):
    """ADVICE r5: the Knuth hash must be exact (no BIGINT overflow /
    wraparound reliance) for masked keys >= 2^63/2654435761 ~ 3.47e9,
    and the HUGEINT oracle twin must agree."""
    import duckdb

    from griddb_spark.pipeline.sketches import _KNUTH, _M32, _int_hash

    keys = [0, 1, 3_470_000_000, 4_294_967_295, 4_294_967_296,
            2**63 - 1, -17, 123_456_789_012]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = [r.h for r in df.select(_int_hash("k").alias("h")).collect()]
    want = [((k % _M32) * _KNUTH) % _M32 for k in keys]
    assert got == want
    con = duckdb.connect()
    for k, w in zip(keys, want):
        if k < 0:
            continue  # DuckDB % is remainder (sign-preserving), pmod differs
        (o,) = con.execute(
            f"SELECT ((({k} % {_M32})::HUGEINT * {_KNUTH}) % {_M32})::BIGINT"
        ).fetchone()
        assert o == w, (k, o, w)


def test_batch_ann_matches_loop_path(spark, emb):
    """The DataFrame-of-queries ADC/IVF-PQ paths must return bit-identical
    results to the per-query loop paths (shared DECIMAL(18,6) LUT
    contract)."""
    from griddb_spark.pipeline import (
        ivfpq_topk,
        ivfpq_topk_batch,
        pq_adc_topk,
        pq_adc_topk_batch,
        pq_encode,
        pq_train,
    )

    books = pq_train(emb, "vec_id", "embedding", in_dim=64, m=4, k=8, iters=1)
    codes = pq_encode(emb, "vec_id", "embedding", books)
    qs = [(r.vec_id, list(r.embedding))
          for r in emb.filter(F.col("vec_id") < 5).collect()]
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    loop = sorted(map(tuple, pq_adc_topk(codes, books, qs, topk=5).collect()))
    batch = sorted(map(tuple,
                       pq_adc_topk_batch(codes, books, qdf, topk=5).collect()))
    assert loop == batch and len(loop) == 25
    loop2 = sorted(map(tuple, ivfpq_topk(
        emb, "vec_id", "embedding", 64, qs,
        coarse_k=8, m=4, k=8, nprobe=2, topk=5).collect()))
    batch2 = sorted(map(tuple, ivfpq_topk_batch(
        emb, "vec_id", "embedding", 64, qdf,
        coarse_k=8, m=4, k=8, nprobe=2, topk=5).collect()))
    assert loop2 == batch2 and len(loop2) == 25


def test_ivfpq_codes_param_parity_and_guard(spark, emb):
    """codes= (the encode-once lifecycle, VERDICT r11 item 4) must be
    bit-identical to in-call encoding, and passing codes without the
    artifact that produced them must fail loudly — silent quantizer/
    codes mismatch would return plausible-but-wrong neighbors."""
    import pytest

    from griddb_spark.pipeline import ivfpq_topk_batch, ivfpq_train
    from griddb_spark.pipeline.similarity import _ivfpq_encoded

    trained = ivfpq_train(emb, "vec_id", "embedding", 64,
                          coarse_k=8, m=4, k=8)
    codes = _ivfpq_encoded(emb, "vec_id", "embedding", trained)\
        .localCheckpoint(eager=True)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    with_codes = sorted(map(tuple, ivfpq_topk_batch(
        emb, "vec_id", "embedding", 64, qdf, nprobe=2, topk=5,
        trained=trained, codes=codes).collect()))
    without = sorted(map(tuple, ivfpq_topk_batch(
        emb, "vec_id", "embedding", 64, qdf, nprobe=2, topk=5,
        trained=trained).collect()))
    assert with_codes == without and len(with_codes) == 25
    with pytest.raises(ValueError, match="trained"):
        ivfpq_topk_batch(emb, "vec_id", "embedding", 64, qdf,
                         nprobe=2, topk=5, codes=codes)


def test_ivfpq_probe_plan_parity_and_guards(spark, emb):
    """probe_plan= (the shared multi-nprobe serve prefix, VERDICT r13
    item 4) must be bit-identical per nprobe point to the standalone
    call, and the mismatch guards must fail loudly — a plan built under
    a different artifact, id column, or a smaller nprobe_max would
    silently serve wrong candidates."""
    import pytest

    from griddb_spark.pipeline import (
        ivfpq_probe_plan,
        ivfpq_topk_batch,
        ivfpq_train,
    )
    from griddb_spark.pipeline.similarity import _ivfpq_encoded

    trained = ivfpq_train(emb, "vec_id", "embedding", 64,
                          coarse_k=8, m=4, k=8)
    codes = _ivfpq_encoded(emb, "vec_id", "embedding", trained)\
        .localCheckpoint(eager=True)
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    plan = ivfpq_probe_plan(codes, qdf, trained, "vec_id", nprobe_max=2)
    for np_ in (1, 2):
        shared = sorted(map(tuple, ivfpq_topk_batch(
            emb, "vec_id", "embedding", 64, qdf, nprobe=np_, topk=5,
            trained=trained, codes=codes, probe_plan=plan).collect()))
        solo = sorted(map(tuple, ivfpq_topk_batch(
            emb, "vec_id", "embedding", 64, qdf, nprobe=np_, topk=5,
            trained=trained, codes=codes).collect()))
        assert shared == solo and len(shared) == 25
    with pytest.raises(ValueError, match="nprobe"):
        ivfpq_topk_batch(emb, "vec_id", "embedding", 64, qdf,
                         nprobe=3, topk=5, trained=trained, codes=codes,
                         probe_plan=plan)
    other = ivfpq_train(emb.limit(30), "vec_id", "embedding", 64,
                        coarse_k=4, m=4, k=4)
    with pytest.raises(ValueError, match="different"):
        ivfpq_topk_batch(emb, "vec_id", "embedding", 64, qdf,
                         nprobe=2, topk=5, trained=other, codes=codes,
                         probe_plan=plan)
    with pytest.raises(ValueError, match="id_col"):
        ivfpq_topk_batch(emb, "other_id", "embedding", 64, qdf,
                         nprobe=2, topk=5, trained=trained, codes=codes,
                         probe_plan=plan)


def test_clustered_oracle_composition_pins():
    """The clustered-recall oracle is composed by string-replacing the
    certified k-means CTE's corpus and init-limit; if _KMEANS_CTE's text
    ever drifts, the replace silently no-ops and the oracle would replay
    the WRONG pipeline — fail fast here instead (no Spark needed)."""
    from griddb_spark import workload as w

    clustered = w.ORACLE["pipe_ann_recall_clustered"]
    assert "__QMAX__" not in clustered and "__QMAX__" not in w.ORACLE[
        "pipe_ann_recall"]
    assert "LIMIT 64" in clustered          # coarse init = 64 seeds
    assert "greatest(8" not in clustered    # adaptive-k limit replaced
    assert "WHERE vec_id < 384" in clustered  # derived-corpus subquery
    assert "WHERE vec_id < 64)" in clustered  # one query per cluster
    # the i.i.d. oracle kept its certified text byte-for-byte
    assert "WHERE vec_id < 100)" in w.ORACLE["pipe_ann_recall"]
    assert "greatest(8" in w.ORACLE["pipe_ann_recall"]


def test_clustered_fixture_recall_operating_point(spark):
    """pipe_ann_recall_clustered must show the IVF-PQ stack RETRIEVING,
    not just computing recall (VERDICT r11 item 2): on the planted
    64-cluster fixture, recall@5 at nprobe=2 is 1.0 for every query —
    exact top-5 = the 5 cluster-mates, routing sends each query to its
    own cell, and ADC separates mates (~0.2) from foreigners (≥~140).
    The i.i.d. gate (pipe_ann_recall) documents the ~0.10 adversarial
    floor; together they bracket the recall-vs-structure curve."""
    from griddb_spark import workload

    rows = workload.QUERIES["pipe_ann_recall_clustered"](
        spark, SF_DIR).collect()
    assert len(rows) == 64
    mean = sum(r.recall for r in rows) / len(rows)
    assert mean >= 0.8, f"separable-data recall degraded: {mean}"
    assert min(r.recall for r in rows) == 1.0  # deterministic by design


def test_nprobe_curve_deterministic_operating_points(spark):
    """pipe_ann_nprobe_curve must show recall MOVING with nprobe — the
    tuning curve itself, not just endpoints: biased-midpoint queries
    have exact top-11 = 5 home mates + all 6 of the neighbor cluster,
    so recall@11 is exactly 5/11 at nprobe=1 and exactly 1.0 at
    nprobe=2, for every query, independent of ADC resolution."""
    from griddb_spark import workload

    rows = workload.QUERIES["pipe_ann_nprobe_curve"](
        spark, SF_DIR).collect()
    got = {(r.nprobe, r.recall) for r in rows}
    assert got == {(1, 0.454545), (2, 1.0)}
    assert len(rows) == 64  # 32 queries x 2 nprobe points


def test_knn_queries_row_cap_fails_loudly(spark, emb):
    """A corpus-sized queries side must raise the documented error, not
    OOM the driver — and the cap check itself must be driver-safe (the
    limit bounds what collect ships)."""
    from griddb_spark.pipeline import knn_bruteforce
    from griddb_spark.pipeline import similarity as sim_mod

    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(sim_mod, "_KNN_QUERIES_MAX_ROWS", 10)
        with pytest.raises(ValueError, match="rows"):
            knn_bruteforce(emb, emb, k=3)
    # under the cap: unchanged behavior
    out = knn_bruteforce(emb, emb.filter(F.col("vec_id") < 2), k=3)
    assert out.count() == 6


def test_logreg_train_learns_separating_direction(spark, emb):
    """2 GD iterations on parity labels must move the average predicted
    probability of the two classes apart (training sanity), and the
    gradient aggregation must combine map-side (scale shape)."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import linear_probe_score, logreg_train

    df = emb.select("embedding", (F.col("vec_id") % 2).alias("y"))
    res = logreg_train(df, "embedding", "y", iters=2, lr=0.5)
    assert len(res) == 65 and res[0][0] == -1
    bias = res[0][1]
    w = [x for _, x in res[1:]]
    scored = linear_probe_score(df, "embedding", w, bias=bias)
    means = {r.y: r.m for r in scored.groupBy("y")
             .agg(F.avg("score").alias("m")).collect()}
    assert means[1] > means[0]  # learned toward the labels


def test_leakage_safe_split_keeps_clusters_together(spark, docs):
    """Every member of a near-dup component must land in the SAME split
    (the whole point); unclustered docs follow the plain content-hash
    assignment."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import (
        connected_components,
        leakage_safe_split,
        minhash_lsh_pairs,
        train_split,
    )

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    comps = connected_components(pairs)
    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = leakage_safe_split(docs, comps, "doc_id", frac)
    spread = (
        out.join(comps, "doc_id")
        .groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k"))
        .collect()[0][0]
    )
    assert spread == 1  # no component spans two splits
    # unclustered rows: identical to the plain split
    plain = train_split(docs, "doc_id", frac).select("doc_id", "split")
    un = out.join(comps, "doc_id", "left_anti").select("doc_id", "split")
    diff = un.exceptAll(
        plain.join(comps, "doc_id", "left_anti")
    ).count()
    assert diff == 0


def test_ivfpq_index_append_serves_new_vectors(spark, emb, tmp_path):
    """Appending encodes with the EXISTING sidecar quantizers (no
    retrain) and appended vectors are immediately servable from their
    cell partitions."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import (
        ivfpq_index_append,
        ivfpq_index_topk,
        ivfpq_index_write,
    )

    path = str(tmp_path / "idx")
    base = emb.filter(F.col("vec_id") < 400)
    late = emb.filter(F.col("vec_id") >= 400)
    ivfpq_index_write(base, path, "vec_id", "embedding", in_dim=64,
                      coarse_k=8, m=4, k=8)
    ivfpq_index_append(late, path)
    qdf = late.limit(3).select(F.col("vec_id").alias("q_id"),
                               F.col("embedding").alias("qv"))
    got = ivfpq_index_topk(spark, path, qdf, nprobe=8, topk=10**9)
    # with all cells probed and no k cap, every indexed vector except
    # the query itself is a candidate — appended rows included
    n_index = spark.read.parquet(path).count()
    assert n_index == emb.count()
    per_q = got.groupBy("q_id").count().collect()
    assert all(r["count"] == n_index - 1 for r in per_q)
    # appended vectors are ranked candidates like any indexed vector
    assert got.filter(F.col("vec_id") >= 400).count() > 0


def test_ivfpq_index_append_compaction_bounds_files(
        spark, emb, tmp_path, monkeypatch):
    """Persisted-index analog of the streaming index's file-growth bound
    (VERDICT r10 item 4): every append adds up to one file per touched
    cell, so N appends into a long-lived served index reach ~N files per
    hot cell without compaction. The sidecar appends counter triggers a
    one-file-per-cell rewrite through a side dir + atomic swap at
    _IVFPQ_COMPACT_APPENDS; serving results must be identical before and
    after (compaction is layout-only)."""
    import glob
    import json
    import os

    from pyspark.sql import functions as F

    from griddb_spark.pipeline import (
        ivfpq_index_append,
        ivfpq_index_topk,
        ivfpq_index_write,
        ivfpq_train,
    )
    from griddb_spark.pipeline import similarity as sim_mod

    base = emb.filter(F.col("vec_id") < 400)
    trained = ivfpq_train(base, "vec_id", "embedding", 64,
                          coarse_k=8, m=4, k=8)

    def build(p):
        ivfpq_index_write(base, p, "vec_id", "embedding", in_dim=64,
                          coarse_k=8, m=4, k=8, trained=trained)
        # 10 small appends: without compaction each touched cell
        # accretes one file per append (~10 files in the hot cells)
        for lo in range(400, 500, 10):
            ivfpq_index_append(
                emb.filter((F.col("vec_id") >= lo)
                           & (F.col("vec_id") < lo + 10)), p)

    monkeypatch.setattr(sim_mod, "_IVFPQ_COMPACT_APPENDS", 4)
    path = str(tmp_path / "idx")
    build(path)
    per_cell = {
        e: len(glob.glob(os.path.join(path, e, "*.parquet")))
        for e in os.listdir(path) if e.startswith("cluster=")
    }
    assert per_cell and max(per_cell.values()) <= 4 + 1
    meta = json.load(open(os.path.join(path, "_ivfpq_meta.json")))
    assert meta["appends"] < 4  # rewrites fired and reset the counter
    assert spark.read.parquet(path).count() == 500
    # serving is identical to the same writes WITHOUT compaction
    # (same quantizers — compaction is layout-only)
    monkeypatch.setattr(sim_mod, "_IVFPQ_COMPACT_APPENDS", 10**9)
    ref_path = str(tmp_path / "ref")
    build(ref_path)
    qdf = emb.limit(5).select(F.col("vec_id").alias("q_id"),
                              F.col("embedding").alias("qv"))
    got = sorted(map(tuple, ivfpq_index_topk(
        spark, path, qdf, nprobe=2, topk=5).collect()))
    ref = sorted(map(tuple, ivfpq_index_topk(
        spark, ref_path, qdf, nprobe=2, topk=5).collect()))
    assert got == ref


def test_ivfpq_compaction_swap_crash_windows(spark, emb, tmp_path,
                                             monkeypatch):
    """The compaction swap's crash windows must leave a servable index
    (mirrors the streaming rebucket crash matrix): (A) complete side dir
    + live index -> roll back side dir, live wins; (B) live renamed away,
    complete side dir -> roll forward; (C) swap done, stale __old left
    -> old removed. In every window serving returns the full corpus."""
    import json
    import os
    import shutil

    from pyspark.sql import functions as F

    from griddb_spark.pipeline import (
        ivfpq_index_topk,
        ivfpq_index_write,
    )
    from griddb_spark.pipeline.similarity import _ivfpq_recover

    path = str(tmp_path / "idx")
    sub = emb.filter(F.col("vec_id") < 300)
    ivfpq_index_write(sub, path, "vec_id", "embedding", in_dim=64,
                      coarse_k=8, m=4, k=8)
    qdf = emb.limit(3).select(F.col("vec_id").alias("q_id"),
                              F.col("embedding").alias("qv"))
    ref = sorted(map(tuple, ivfpq_index_topk(
        spark, path, qdf, nprobe=2, topk=5).collect()))
    side, old = path + ".__compact", path + ".__old"

    # (A) crash after side dir complete, before any rename
    shutil.copytree(path, side)
    _ivfpq_recover(path)
    assert not os.path.isdir(side) and os.path.isdir(path)
    # (B) crash between the renames: no live index, complete side dir
    shutil.copytree(path, side)
    os.rename(path, old)
    got = sorted(map(tuple, ivfpq_index_topk(
        spark, path, qdf, nprobe=2, topk=5).collect()))  # recovers
    assert got == ref and os.path.isdir(path) and not os.path.isdir(old)
    # (B') incomplete side dir (no sidecar yet): roll BACK to old
    shutil.copytree(path, side)
    os.remove(os.path.join(side, "_ivfpq_meta.json"))
    os.rename(path, old)
    _ivfpq_recover(path)
    assert os.path.isdir(path) and not os.path.isdir(side)
    assert json.load(open(os.path.join(path, "_ivfpq_meta.json")))
    # (C) swap done, stale __old left behind
    shutil.copytree(path, old)
    _ivfpq_recover(path)
    assert not os.path.isdir(old)
    got = sorted(map(tuple, ivfpq_index_topk(
        spark, path, qdf, nprobe=2, topk=5).collect()))
    assert got == ref


def test_ivfpq_index_read_across_compaction_swap(spark, emb, tmp_path,
                                                 monkeypatch):
    """Pins the reader-vs-swap contract (VERDICT r11 item 6): a LAZY
    serve DataFrame pins the file listing taken at ivfpq_index_topk
    time, so forcing it after a compaction swapped the directory
    raises file-not-found — and re-invoking serves the full corpus from
    the fresh listing. This is the documented retry-on-reinvoke
    behavior, not silent wrong answers or a hang."""
    import py4j.protocol
    from pyspark.errors import PySparkException
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import (
        ivfpq_index_append,
        ivfpq_index_topk,
        ivfpq_index_write,
    )
    from griddb_spark.pipeline import similarity as sim_mod

    path = str(tmp_path / "idx")
    base = emb.filter(F.col("vec_id") < 300)
    ivfpq_index_write(base, path, "vec_id", "embedding", in_dim=64,
                      coarse_k=8, m=4, k=8)
    qdf = emb.limit(3).select(F.col("vec_id").alias("q_id"),
                              F.col("embedding").alias("qv"))
    lazy = ivfpq_index_topk(spark, path, qdf, nprobe=8, topk=10**9)
    # compaction rewrites every pre-swap part file under a new name
    monkeypatch.setattr(sim_mod, "_IVFPQ_COMPACT_APPENDS", 1)
    ivfpq_index_append(
        emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 310)),
        path)
    assert not os.path.isdir(path + ".__compact")  # swap completed
    assert not os.path.exists(path + ".__lock")    # lock released
    with pytest.raises((PySparkException, py4j.protocol.Py4JJavaError)):
        lazy.collect()  # pre-swap listing → vanished files
    # re-invoke: fresh listing serves everything, appended rows included
    got = ivfpq_index_topk(spark, path, qdf, nprobe=8, topk=10**9)
    per_q = got.groupBy("q_id").count().collect()
    assert per_q and all(r["count"] == 310 - 1 for r in per_q)


def test_ivfpq_recover_respects_live_writer_lock(tmp_path):
    """_ivfpq_recover runs destructively (rmtree/rename) from the READ
    path; with a live writer mid-compaction in another process it must
    stand down while the lockfile is fresh and only recover once it
    ages out (ADVICE r11). Pure-filesystem test."""
    import json
    import time

    from griddb_spark.pipeline.similarity import _ivfpq_recover

    path = str(tmp_path / "idx")
    side, old, lock = (path + ".__compact", path + ".__old",
                       path + ".__lock")

    def mkidx(p):
        os.makedirs(p)
        with open(os.path.join(p, "_ivfpq_meta.json"), "w") as f:
            json.dump({"appends": 0}, f)

    # live index + complete side dir + FRESH lock: the writer is between
    # side-complete and the rename pair — recover must not touch side
    mkidx(path)
    mkidx(side)
    with open(lock, "w") as f:
        f.write("999999")
    _ivfpq_recover(path)
    assert os.path.isdir(side), "recover deleted a live writer's side dir"
    # mid-swap from the reader's view (no live index) + fresh lock:
    # must NOT roll forward under the writer either
    os.rename(path, old)
    _ivfpq_recover(path)
    assert not os.path.isdir(path) and os.path.isdir(side)
    os.rename(old, path)
    # lock ages out (crashed writer): normal recovery resumes, and the
    # dead lock itself is swept so the index state fully resets
    t = time.time() - 301
    os.utime(lock, (t, t))
    _ivfpq_recover(path)
    assert not os.path.isdir(side) and os.path.isdir(path)
    assert not os.path.exists(lock), "dead writer's lock not swept"


def test_ivfpq_compaction_lock_heartbeat_outlives_age(spark, emb, tmp_path,
                                                      monkeypatch):
    """A compaction whose side rewrite runs LONGER than the lock
    freshness age must keep the lock fresh the whole time (ADVICE r12:
    with the original touch-once scheme, a reader's _ivfpq_recover saw a
    stale lock plus a live index mid-rewrite and rmtree'd the side dir
    under the writer). Shrinks the age so the heartbeat interval is
    sub-second, injects a sleep longer than the age into the rewrite
    tail, and asserts the lock is still fresh at that point."""
    import time

    from pyspark.sql import functions as F

    from griddb_spark.pipeline import ivfpq_index_append, ivfpq_index_write
    from griddb_spark.pipeline import similarity as sim_mod

    path = str(tmp_path / "idx")
    ivfpq_index_write(emb.filter(F.col("vec_id") < 60), path,
                      "vec_id", "embedding", in_dim=64,
                      coarse_k=4, m=4, k=4)
    monkeypatch.setattr(sim_mod, "_IVFPQ_COMPACT_APPENDS", 1)
    monkeypatch.setattr(sim_mod, "_IVFPQ_LOCK_MAX_AGE_SEC", 1.0)

    real_update = sim_mod._ivfpq_meta_update
    seen = {}

    def spy(dirpath, meta):
        if dirpath.endswith(".__compact") and "fresh" not in seen:
            time.sleep(1.3)  # longer than the (shrunk) freshness age
            seen["fresh"] = sim_mod._ivfpq_lock_fresh(path)
        return real_update(dirpath, meta)

    monkeypatch.setattr(sim_mod, "_ivfpq_meta_update", spy)
    ivfpq_index_append(
        emb.filter((F.col("vec_id") >= 60) & (F.col("vec_id") < 70)), path)
    assert seen.get("fresh") is True, (
        "lock went stale during a rewrite outliving the freshness age")
    assert not os.path.exists(path + ".__lock")  # released on completion


def test_mix_epochs_fanout_and_determinism(spark, docs):
    """2.5 epochs -> every row twice + a deterministic half; 0.8 -> a
    deterministic 80% slice; unlisted strata exactly once; identical on
    re-run (the reproducible-recipe property)."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline.sampling import mix_epochs

    out = mix_epochs(docs, "doc_id", "source", {"src0": 2.5, "src1": 0.8})
    n0 = docs.filter(F.col("source") == "src0").count()
    n1 = docs.filter(F.col("source") == "src1").count()
    per = {(r.source, r.epoch): r.n for r in
           out.groupBy("source", "epoch").agg(
               F.count(F.lit(1)).alias("n")).collect()}
    assert per[("src0", 1)] == n0 and per[("src0", 2)] == n0
    assert 0 < per[("src0", 3)] < n0      # ~half, hash-decided
    assert 0 < per.get(("src1", 1), 0) < n1  # 0.8 = slice only, no whole epoch
    assert per[("src2", 1)] == docs.filter(F.col("source") == "src2").count()
    assert ("src2", 2) not in per
    # determinism: bit-identical on re-run
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, mix_epochs(
        docs, "doc_id", "source", {"src0": 2.5, "src1": 0.8}).collect()))
    assert a == b


def test_wav_codec_roundtrip_and_foreign_reader(spark):
    """The WAV bytes are REAL RIFF PCM: our encode round-trips through
    our decode, and the stdlib wave reader (the 'foreign decoder')
    agrees on rate/frames; compressed widths fail honestly."""
    import io
    import wave

    import pytest as _pytest

    from griddb_spark.pipeline.multimodal import wav_decode, wav_encode

    samples = [((i * 37) % 256) - 128 for i in range(321)]
    buf = wav_encode(samples, rate=16000)
    rate, ch, got = wav_decode(buf)
    assert (rate, ch, got) == (16000, 1, samples)
    with wave.open(io.BytesIO(buf), "rb") as w:  # independent reader
        assert w.getframerate() == 16000 and w.getnframes() == 321
    # 8-bit PCM is a different sample layout — must refuse, not garble
    b8 = io.BytesIO()
    with wave.open(b8, "wb") as w:
        w.setnchannels(1); w.setsampwidth(1); w.setframerate(8000)
        w.writeframes(bytes([128, 130, 125]))
    with _pytest.raises(NotImplementedError):
        wav_decode(b8.getvalue())


def test_resample_audio_halves_and_preserves_signal(spark):
    """Downsampling 16k -> 8k halves the sample count; on-grid samples
    (even positions) pass through exactly (linear interp at integer
    positions is identity)."""
    from pyspark.sql import functions as F  # noqa: F401

    from griddb_spark.pipeline.multimodal import (
        audio_features,
        resample_audio,
        wav_decode,
        wav_encode,
    )

    samples = [((i * 91) % 512) - 256 for i in range(400)]
    df = spark.createDataFrame(
        [(1, bytearray(wav_encode(samples, 16000)))], "doc_id int, media binary"
    )
    rs = resample_audio(df, 8000, "media", "doc_id")
    row = rs.collect()[0]
    rate, _ch, got = wav_decode(bytes(row.media_rs))
    assert rate == 8000 and row.src_rate == 16000
    assert len(got) == 200
    assert got == samples[::2]  # on-grid positions identical
    feats = audio_features(
        rs.select("doc_id", F.col("media_rs").alias("media")), "media",
        "doc_id").collect()[0]
    assert feats.sample_rate == 8000 and feats.n_samples == 200


def test_mix_epochs_invariant_under_repartitioning(spark, docs):
    """The deterministic-recipe property: identical output rows at any
    partitioning (hash decisions are content-based, never layout-based)."""
    from griddb_spark.pipeline import mix_epochs

    recipe = {"src0": 1.5, "src3": 0.4}
    a = sorted(map(tuple, mix_epochs(
        docs, "doc_id", "source", recipe).collect()))
    b = sorted(map(tuple, mix_epochs(
        docs.repartition(17), "doc_id", "source", recipe).collect()))
    c = sorted(map(tuple, mix_epochs(
        docs.coalesce(1), "doc_id", "source", recipe).collect()))
    assert a == b == c and len(a) > 0


def test_bigram_logprob_matches_python_reference(spark):
    """Property: interpolated bigram scoring == a pure-Python replay on a
    tiny corpus (counts, interpolation, and rounding all exact)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from griddb_spark.pipeline.quality import bigram_logprob

    corpus = [(1, "a b a b c"), (2, "b c a"), (3, "a a a b")]
    df = spark.createDataFrame(corpus, "doc_id int, text string")
    got = {r.doc_id: (r.n_bigrams, r.avg_logprob, r.ppl)
           for r in bigram_logprob(df, "text", "doc_id", lam=0.7).collect()}

    toks = {i: t.split() for i, t in corpus}
    uni: dict = {}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
    n = sum(uni.values())
    bc: dict = {}
    for ws in toks.values():
        for p, w in zip(ws, ws[1:]):
            bc[(p, w)] = bc.get((p, w), 0) + 1

    def r6d(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               ROUND_HALF_UP))

    for i, ws in toks.items():
        lps = [math.log(0.7 * bc[(p, w)] / uni[p] + (1.0 - 0.7) * uni[w] / n)
               for p, w in zip(ws, ws[1:])]
        avg = r6d(sum(lps) / len(lps))
        assert got[i][0] == len(lps)
        assert abs(got[i][1] - avg) < 2e-6, (i, got[i], avg)


def test_pq_encode_keep_cols_both_paths(spark, emb):
    """keep_cols passthrough: extra columns ride through both dispatch
    paths (JVM expressions and the Arrow GEMM kernel) unchanged, with
    codes identical to the plain projection."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import pq_encode, pq_train
    from griddb_spark.pipeline.similarity import _ASSIGN_JVM_MAX_K

    sub = emb.limit(200).withColumn("tag", F.col("vec_id") % 7)
    books = pq_train(sub, "vec_id", "embedding", in_dim=64, m=4, k=8)
    plain = {r.vec_id: r.codes for r in
             pq_encode(sub, "vec_id", "embedding", books).collect()}
    jvm = pq_encode(sub, "vec_id", "embedding", books,
                    keep_cols=["tag"]).collect()
    assert {r.vec_id: r.codes for r in jvm} == plain
    assert all(r.tag == r.vec_id % 7 for r in jvm)
    assert jvm[0].asDict().keys() == {"vec_id", "tag", "codes"}
    far = [1e6] * 16
    big = [b + [(len(b) + i, far) for i in range(_ASSIGN_JVM_MAX_K)]
           for b in books]
    gemm = pq_encode(sub, "vec_id", "embedding", big,
                     keep_cols=["tag"]).collect()
    assert {r.vec_id: r.codes for r in gemm} == plain
    assert all(r.tag == r.vec_id % 7 for r in gemm)


def test_ivfpq_trained_artifact_parity(spark, emb, tmp_path):
    """ivfpq_train once, serve everywhere: results through trained= are
    bit-identical to the self-training paths for the point-probe, batch,
    and persisted-index forms, and the sidecar round-trips through JSON."""
    import json

    from pyspark.sql import functions as F

    from griddb_spark.pipeline import (
        ivfpq_index_topk,
        ivfpq_index_write,
        ivfpq_topk,
        ivfpq_topk_batch,
        ivfpq_train,
    )

    sub = emb.limit(300)
    art = ivfpq_train(sub, "vec_id", "embedding", 64, coarse_k=8, m=4, k=8)
    # JSON round-trip: the artifact is pure driver-side data
    art = json.loads(json.dumps(art))
    qs = [(r.vec_id, list(r.embedding))
          for r in sub.filter(F.col("vec_id") < 3).collect()]
    base = sorted(map(tuple, ivfpq_topk(
        sub, "vec_id", "embedding", 64, qs, coarse_k=8, m=4, k=8,
        nprobe=2, topk=5).collect()))
    with_art = sorted(map(tuple, ivfpq_topk(
        sub, "vec_id", "embedding", 64, qs, coarse_k=8, m=4, k=8,
        nprobe=2, topk=5, trained=art).collect()))
    assert base == with_art
    qdf = sub.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"))
    batch = sorted(map(tuple, ivfpq_topk_batch(
        sub, "vec_id", "embedding", 64, qdf, coarse_k=8, m=4, k=8,
        nprobe=2, topk=5, trained=art).collect()))
    assert batch == base
    path = str(tmp_path / "idx")
    meta = ivfpq_index_write(sub, path, "vec_id", "embedding", in_dim=64,
                             coarse_k=8, m=4, k=8, trained=art)
    assert meta["cellmeans"] == art["cellmeans"]
    assert "cents" not in meta  # sidecar shape unchanged
    served = sorted(map(tuple, ivfpq_index_topk(
        spark, path, qdf, nprobe=2, topk=5).collect()))
    assert served == base


def test_ivfpq_build_is_join_free(spark, emb):
    """The encoded-corpus build (assign + encode with cell passthrough)
    must be a single map lineage: no Join and no Exchange anywhere in the
    physical plan — the encode-then-self-join form paid an id-keyed
    shuffle of the corpus."""
    from griddb_spark.pipeline import ivfpq_train
    from griddb_spark.pipeline.similarity import _ivfpq_encoded

    sub = emb.limit(300)
    art = ivfpq_train(sub, "vec_id", "embedding", 64, coarse_k=8, m=4, k=8)
    plan = _ivfpq_encoded(sub, "vec_id", "embedding", art)
    txt = plan._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in txt, txt
    assert "Exchange" not in txt, txt


def test_shared_trainer_cache_invalidates_on_rewrite(spark, tmp_path):
    """The workload trainer memo keys on a source fingerprint (names +
    sizes + mtimes), so a rewritten corpus retrains instead of serving
    stale quantizers — the ContainerCatalog.invalidate contract."""
    import os
    import shutil
    import time

    from griddb_spark import workload

    src = os.path.join(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
        "embeddings.parquet")
    sf_dir = str(tmp_path)
    dst = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)
    emb = spark.read.parquet(dst)
    c1 = workload._shared_cents(emb, sf_dir)
    assert workload._shared_cents(emb, sf_dir) is c1  # memo hit
    # rewrite: drop half the vectors -> different fingerprint AND model
    # (read from the pristine source, never from the path being replaced)
    spark.read.parquet(src).filter("vec_id % 2 = 0").write.mode(
        "overwrite").parquet(dst)
    time.sleep(0.01)
    emb2 = spark.read.parquet(dst)
    c2 = workload._shared_cents(emb2, sf_dir)
    assert c2 is not c1
    assert c2 != c1  # retrained on the rewritten corpus


def test_ivfpq_trained_artifact_is_authoritative(spark, emb):
    """A trained artifact fixes the precision and codebook geometry:
    serving with mismatched round_to/m/k parameters must follow the
    ARTIFACT, producing results identical to a self-trained run at the
    artifact's own params."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline import ivfpq_topk, ivfpq_train

    sub = emb.limit(200)
    art = ivfpq_train(sub, "vec_id", "embedding", 64, coarse_k=8, m=4,
                      k=8, round_to=5)
    qs = [(r.vec_id, list(r.embedding))
          for r in sub.filter(F.col("vec_id") < 2).collect()]
    self_trained = sorted(map(tuple, ivfpq_topk(
        sub, "vec_id", "embedding", 64, qs, coarse_k=8, m=4, k=8,
        nprobe=2, topk=5, round_to=5).collect()))
    # defaults (round_to=6) passed alongside the 5dp artifact: the
    # artifact wins
    served = sorted(map(tuple, ivfpq_topk(
        sub, "vec_id", "embedding", 64, qs, coarse_k=8, m=4, k=8,
        nprobe=2, topk=5, trained=art).collect()))
    assert served == self_trained


def test_ann_cache_keeps_one_generation(spark, tmp_path):
    """A corpus rewrite evicts the superseded fingerprint's entries —
    the memo holds exactly one generation per (kind, corpus)."""
    import os
    import shutil

    from griddb_spark import workload

    src = os.path.join(
        os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"),
        "embeddings.parquet")
    sf_dir = str(tmp_path)
    dst = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.isdir(src):
        shutil.copytree(src, dst)
    else:
        shutil.copy2(src, dst)
    emb = spark.read.parquet(dst)
    workload._shared_cents(emb, sf_dir)
    n0 = sum(1 for k in workload._ANN_TRAIN_CACHE
             if k[0] == "cents" and k[1] == sf_dir)
    assert n0 == 1
    spark.read.parquet(src).filter("vec_id % 2 = 0").write.mode(
        "overwrite").parquet(dst)
    workload._shared_cents(spark.read.parquet(dst), sf_dir)
    n1 = sum(1 for k in workload._ANN_TRAIN_CACHE
             if k[0] == "cents" and k[1] == sf_dir)
    assert n1 == 1  # old generation evicted, not accumulated


def test_semdedup_zero_norm_and_nan_never_fold(spark):
    """ADVICE r8: the exact pre-collapse must not fold identical
    zero-norm or NaN-containing vectors — under the documented cosine
    convention (zero norm -> cos 0, NaN -> sim NaN) their identical
    copies never verify as near-dups at a positive threshold, so the
    pairwise stage would have kept all of them. A verbatim duplicate of
    a normal vector still collapses."""
    from griddb_spark.pipeline import semdedup

    nan = float("nan")
    zeros = [0.0] * 8
    e1 = [1.0] + [0.0] * 7
    e2 = [0.0, 1.0] + [0.0] * 6
    nanv = [nan, 1.0] + [0.0] * 6
    df = spark.createDataFrame(
        [(1, zeros), (2, zeros), (3, e1), (4, e2), (5, nanv), (6, nanv),
         (7, e1)],
        "vec_id long, embedding array<double>",
    )
    kept = sorted(
        r.vec_id
        for r in semdedup(df, "vec_id", "embedding", k=2, iters=1,
                          threshold=0.9).collect()
    )
    # 7 (verbatim e1 dup) collapses to 3; both zero vectors and both
    # NaN vectors survive
    assert kept == [1, 2, 3, 4, 5, 6]


def test_cosine_pairs_ann_recall_contract_at_any_bits(spark):
    """The docstring's recall contract, pinned quantitatively: at any
    sign_bits b, the ANN output is EXACTLY the exact near-dup pair set
    intersected with {pairs whose sign codes differ in <=1 of the first
    b dims} — no more (verification is exact) and no less (own-cell +
    Hamming-1 multi-probe finds every such pair). Run at b=4 and b=12
    on a corpus of controlled ~cos 0.93 rotations, where wider codes
    legitimately shed cross-pair recall — the trade the docstring
    documents and the trained-quantizer route exists to avoid."""
    import math
    import random

    import numpy as np

    from griddb_spark.pipeline import cosine_pairs_ann
    from griddb_spark.pipeline.similarity import round_half_away

    rng = random.Random(5)
    dim, n, alpha = 16, 120, math.acos(0.93)
    rows = []
    vecs = {}
    for i in range(n):
        v = np.array([rng.gauss(0, 1) for _ in range(dim)])
        v /= np.linalg.norm(v)
        u = np.array([rng.gauss(0, 1) for _ in range(dim)])
        u -= u.dot(v) * v
        u /= np.linalg.norm(u)
        w = math.cos(alpha) * v + math.sin(alpha) * u  # cos(v, w) = 0.93
        vecs[i], vecs[1000 + i] = v, w
        rows += [(i, [float(x) for x in v]), (1000 + i, [float(x) for x in w])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    ids = sorted(vecs)
    exact = set()
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            va, vb = vecs[a], vecs[b]
            s = float(round_half_away(
                np.array([va.dot(vb)
                          / (np.linalg.norm(va) * np.linalg.norm(vb))]),
                6)[0])
            if s >= 0.9:
                exact.add((a, b))
    assert len(exact) >= n  # every planted rotation pair + any extras

    reachable_by_bits = {}
    for bits in (4, 12):
        codes = {
            i: sum((1 << j) for j in range(bits) if vecs[i][j] >= 0)
            for i in ids
        }
        reachable = {
            (a, b) for a, b in exact
            if bin(codes[a] ^ codes[b]).count("1") <= 1
        }
        reachable_by_bits[bits] = reachable
        got = {
            (r.id_a, r.id_b)
            for r in cosine_pairs_ann(
                df, "vec_id", "embedding", threshold=0.9, sign_bits=bits
            ).collect()
        }
        assert got == reachable, f"bits={bits}"
    # and the trade is real on this corpus: wider codes shed recall
    # (guards against a future probe change silently widening the
    # contract without updating the docs/tests)
    assert reachable_by_bits[12] < reachable_by_bits[4], (
        "bits=12 must be a strict subset of bits=4 on this corpus — if "
        "it is not, the probe got wider and the documented contract no "
        "longer matches the implementation")


def test_cosine_pairs_ann_rejects_zero_bits(spark):
    """sign_bits=0 would build a zero-column probe array (opaque
    IndexError pre-fix); the contract is >=1 hyperplane, enforced with
    a descriptive ValueError."""
    import pytest

    from griddb_spark.pipeline import cosine_pairs_ann

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="sign_bits must be >= 1"):
        cosine_pairs_ann(df, "vec_id", "embedding", sign_bits=0)


def test_topk_recall_semantics(spark):
    """recall = |approx ∩ exact| / |exact| per query: full overlap 1.0,
    disjoint 0.0, partial fractional, missing-from-approx query 0.0,
    duplicates in either input counted once."""
    from griddb_spark.pipeline import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21), (3, 30), (4, 40)],
        "q_id long, vec_id long")
    approx = spark.createDataFrame(
        [(1, 10), (1, 11),          # q1 full
         (2, 20), (2, 99),          # q2 half
         (3, 98), (3, 99),          # q3 none
         (1, 10)],                  # duplicate — must not double count
        "q_id long, vec_id long")   # q4 absent from approx
    got = {r.q_id: r.recall for r in topk_recall(approx, exact).collect()}
    assert got == {1: 1.0, 2: 0.5, 3: 0.0, 4: 0.0}


def test_knn_bruteforce_gemm_parity(spark, emb, monkeypatch):
    """The Arrow-GEMM dispatch must emit exactly the JVM crossJoin
    path's result — same 6dp rounding, same id tie-break, same
    corrupt-row exclusion — including with NULL/short/off-width rows
    in the corpus."""
    from pyspark.sql import functions as SF

    from griddb_spark.pipeline import similarity as S

    base = emb.limit(200).select(
        "vec_id", SF.col("embedding").cast("array<double>").alias("embedding"))
    corrupt = spark.createDataFrame(
        [(9001, None), (9002, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    corpus = base.unionByName(corrupt)
    qdf = base.filter(SF.col("vec_id") < 7)

    jvm = sorted(map(tuple, S.knn_bruteforce(
        corpus, qdf, k=4).collect()))
    monkeypatch.setattr(S, "_KNN_GEMM_MIN_PAIR_BYTES", -1)
    gemm = sorted(map(tuple, S.knn_bruteforce(
        corpus, qdf, k=4).collect()))
    assert jvm == gemm
    assert len(jvm) == qdf.count() * 4
    assert not any(r[1] in (9001, 9002) for r in jvm)  # corrupt excluded


def test_bpe_train_local_distributed_parity(spark):
    """The driver-local merge loop (auto-dispatched for driver-sized
    vocabs) must be merge-for-merge identical to the distributed loop —
    including chained merges (a fresh merge output merging again with
    the next symbol), count-desc/pair-asc tie order, and the min_freq
    early break."""
    from griddb_spark.pipeline.packing import bpe_train

    fixtures = [
        # chained merges: 'aaaa' folds [aa, aa]; then (aa, aa) can win
        ["aaaa aaaa baab", "aaaa caa aa", "aa aaaa"],
        # tie-heavy: equal counts decided by (l asc, r asc)
        ["ab cd ab cd", "ba dc ba dc", "ab dc"],
        # min_freq break: every pair unique after round 1
        ["xy", "yz", "zw", "xy"],
        # single-char words only: no pairs at all -> zero merges
        ["a b c", "a b", "c"],
    ]
    for texts in fixtures:
        df = spark.createDataFrame([(t,) for t in texts], ["text"])
        dist = [
            (r.merge_rank, r.left, r.right, r.merged, r.freq)
            for r in bpe_train(df, n_merges=6, local=False)
            .orderBy("merge_rank").collect()
        ]
        loc = [
            (r.merge_rank, r.left, r.right, r.merged, r.freq)
            for r in bpe_train(df, n_merges=6, local=True)
            .orderBy("merge_rank").collect()
        ]
        auto = [
            (r.merge_rank, r.left, r.right, r.merged, r.freq)
            for r in bpe_train(df, n_merges=6)
            .orderBy("merge_rank").collect()
        ]
        assert dist == loc == auto, (texts, dist, loc, auto)

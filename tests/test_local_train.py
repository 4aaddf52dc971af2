"""Parity pins for the driver-local quantizer-training dispatch
(`similarity._local_train_rows` and its `_kmeans_fit_rows` /
`_pq_train_rows` twins): on any input both paths must return
bit-identical artifacts, because every downstream consumer (encode,
ADC, the oracle replays) is keyed on the exact 6dp fixed-point
centroid/codebook values. The distributed path is forced by shrinking
`_LOCAL_TRAIN_MAX_BYTES` below any plan estimate."""

from __future__ import annotations

import pytest

from griddb_spark.pipeline import similarity as sim


@pytest.fixture(scope="module")
def emb(catalog):
    return catalog.load("embeddings")


def _force_distributed(monkeypatch):
    # sz > -1 for every non-empty plan -> _local_train_rows returns None
    monkeypatch.setattr(sim, "_LOCAL_TRAIN_MAX_BYTES", -1)


def _ragged(spark, emb):
    """Corpus with the corrupt-row shapes training must survive: a NULL
    vector, an off-modal-width vector, and a NULL id (orderBy asc puts
    it first, so it seeds the init on BOTH paths identically)."""
    from pyspark.sql import functions as F

    base = emb.select("vec_id", "embedding").limit(40)
    extra = spark.createDataFrame(
        [(None, [float(i) for i in range(64)]),
         (9001, None),
         (9002, [1.0, 2.0, 3.0])],
        base.schema,
    )
    return base.union(extra)


def test_kmeans_local_matches_distributed(spark, emb, monkeypatch):
    got_local = sim.kmeans_fit(_ragged(spark, emb), k=5, iters=2)
    _force_distributed(monkeypatch)
    got_dist = sim.kmeans_fit(_ragged(spark, emb), k=5, iters=2)
    assert got_local == got_dist and len(got_local) >= 1


def test_kmeans_local_empty_corpus(spark, emb, monkeypatch):
    empty = emb.filter("vec_id < 0")
    assert sim.kmeans_fit(empty) == []
    _force_distributed(monkeypatch)
    assert sim.kmeans_fit(empty) == []


def test_pq_train_local_matches_distributed(spark, emb, monkeypatch):
    clean = emb.select("vec_id", "embedding").limit(60)
    got_local = sim.pq_train(clean, "vec_id", "embedding", 64, m=4, k=8,
                             iters=2)
    _force_distributed(monkeypatch)
    got_dist = sim.pq_train(clean, "vec_id", "embedding", 64, m=4, k=8,
                            iters=2)
    assert got_local == got_dist


def test_pq_train_ragged_corpus_declines_local(spark, emb, monkeypatch):
    """A ragged corpus fails the local path's uniform-width guard and
    must fall through to the distributed body (which slices at in_dim
    unguarded — same behavior either way, so just pin the dispatch)."""
    calls = []
    orig = sim._pq_train_rows
    monkeypatch.setattr(
        sim, "_pq_train_rows",
        lambda *a, **kw: calls.append(1) or orig(*a, **kw))
    clean = emb.select("vec_id", "embedding").limit(20)
    sim.pq_train(_ragged(spark, emb).filter("embedding is not null"),
                 "vec_id", "embedding", 64, m=4, k=4)
    assert not calls  # ragged -> distributed
    sim.pq_train(clean, "vec_id", "embedding", 64, m=4, k=4)
    assert calls  # clean and tiny -> local


def test_ivfpq_train_local_matches_distributed(spark, emb, monkeypatch):
    clean = emb.select("vec_id", "embedding").limit(60)
    art_local = sim.ivfpq_train(clean, "vec_id", "embedding", 64,
                                coarse_k=6, m=4, k=8, local=True)
    art_auto = sim.ivfpq_train(clean, "vec_id", "embedding", 64,
                               coarse_k=6, m=4, k=8)
    _force_distributed(monkeypatch)
    art_dist = sim.ivfpq_train(clean, "vec_id", "embedding", 64,
                               coarse_k=6, m=4, k=8)
    assert art_local["cents"] == art_dist["cents"]
    assert art_local["codebooks"] == art_dist["codebooks"]
    assert art_auto["cents"] == art_dist["cents"]
    assert art_auto["codebooks"] == art_dist["codebooks"]
    for key in ("in_dim", "m", "k", "round_to", "id_col", "id_type"):
        assert art_local[key] == art_dist[key]
    # cellmeans are UNROUNDED by contract (consumers round after the
    # cosine): the two paths may differ in accumulation order only
    loc = dict((c, v) for c, v in art_local["cellmeans"])
    dst = dict((c, v) for c, v in art_dist["cellmeans"])
    assert set(loc) == set(dst)
    for c in loc:
        assert loc[c] == pytest.approx(dst[c], abs=1e-9)
    # BOTH paths must emit cellmeans in ascending cell order: consumers
    # (ivfpq_index_append via _ivfpq_meta.json) feed them straight into
    # assign_clusters, whose tie-break contract requires ascending
    # indices. The distributed path used raw collect order — partition
    # order, nondeterministic on a cluster (r14 forced-distributed probe).
    for art in (art_local, art_dist):
        cells = [c for c, _ in art["cellmeans"]]
        assert cells == sorted(cells)


def test_ivfpq_train_local_flag_semantics(spark, emb, monkeypatch):
    """local=False pins ivfpq_train's own combined single-collect path
    off (sub-trainers keep their independent size-gated dispatch);
    local=True overrides the size gate entirely."""
    clean = emb.select("vec_id", "embedding").limit(20)
    _force_distributed(monkeypatch)  # sub-trainer auto-dispatch off too
    seen = []
    orig = sim._kmeans_fit_rows
    monkeypatch.setattr(
        sim, "_kmeans_fit_rows",
        lambda *a, **kw: seen.append(1) or orig(*a, **kw))
    art = sim.ivfpq_train(clean, "vec_id", "embedding", 64,
                          coarse_k=4, m=4, k=4, local=False)
    assert art["cents"] and not seen  # fully distributed
    art2 = sim.ivfpq_train(clean, "vec_id", "embedding", 64,
                           coarse_k=4, m=4, k=4, local=True)
    assert seen  # force flag beat the (disabled) size gate
    assert art2["cents"] == art["cents"]
    assert art2["codebooks"] == art["codebooks"]


def test_local_dispatch_lying_estimate_falls_back(spark, emb, monkeypatch):
    """A plan whose Catalyst size estimate lies LOW (selectivity guesses
    on derived plans) must not commit the local path to an oversized
    corpus: the post-collect byte check (VERDICT r13 hardening) returns
    None = train distributed. The estimate gate is forced open by
    shrinking the cap instead of faking stats — 40 rows x 64 doubles is
    ~23 KB real, far over a 1 KB cap x4 slack."""
    clean = emb.select("vec_id", "embedding").limit(40)
    monkeypatch.setattr(sim, "_LOCAL_TRAIN_MAX_BYTES", 1024)
    monkeypatch.setattr(sim, "_plan_size_bytes", lambda df: 1)  # the lie
    assert sim._local_train_rows(clean, "vec_id", "embedding") is None
    # force=True callers prove boundedness by construction: no fallback
    rows = sim._local_train_rows(clean, "vec_id", "embedding", force=True)
    assert rows is not None and len(rows) == 40


def test_local_dispatch_collect_error_falls_back(spark, emb, monkeypatch):
    """A collect that dies (e.g. spark.driver.maxResultSize) falls back
    to distributed instead of propagating — unless force=True, where
    the caller asserted boundedness and a failure is a real bug."""

    class _Boom:
        def select(self, *a, **kw):
            return self

        def collect(self):
            raise RuntimeError("Total size of serialized results ...")

    monkeypatch.setattr(sim, "_plan_size_bytes", lambda df: 1)
    assert sim._local_train_rows(_Boom(), "vec_id", "embedding") is None
    with pytest.raises(RuntimeError):
        sim._local_train_rows(_Boom(), "vec_id", "embedding", force=True)


def test_logreg_local_distributed_parity(spark):
    """The driver-local GD loop must be weight-for-weight identical to
    the distributed loop — including the corrupt-row contract (NULL
    vec/label and ragged/NULL-element vectors poison every contribution
    of the row; a non-finite PRODUCT drops only its own position via the
    DECIMAL cast, the bias residual still counts)."""
    from pyspark.sql import functions as F

    from griddb_spark.pipeline.similarity import logreg_train

    fixtures = [
        # clean separable sample
        [([1.0, 2.0, -0.5], 1.0), ([-1.0, -2.0, 0.5], 0.0),
         ([0.5, 1.5, -1.0], 1.0), ([-0.5, -1.5, 1.0], 0.0)],
        # NULL vector, NULL label, ragged vector, NULL element
        [([1.0, 2.0, -0.5], 1.0), (None, 0.0),
         ([0.5, 1.5, -1.0], None), ([1.0, 2.0], 1.0),
         ([1.0, None, 3.0], 0.0), ([-1.0, -2.0, 0.5], 0.0)],
        # non-finite elements: Inf element keeps the bias residual,
        # NaN element poisons the row like the decimal cast does
        [([1.0, 2.0, -0.5], 1.0), ([float("inf"), 1.0, 1.0], 0.0),
         ([float("nan"), 1.0, 1.0], 1.0), ([-1.0, -2.0, 0.5], 0.0)],
    ]
    for rows in fixtures:
        df = spark.createDataFrame(
            rows, "v array<double>, y double"
        )
        dist = logreg_train(df, "v", "y", iters=3, lr=0.2, local=False)
        loc = logreg_train(df, "v", "y", iters=3, lr=0.2, local=True)
        auto = logreg_train(df, "v", "y", iters=3, lr=0.2)
        assert dist == loc == auto, (rows, dist, loc, auto)

"""Similarity search over embedding columns (``array<float>``).

- ``knn_bruteforce`` — exact cosine top-k: broadcast the (small) query set
  against the corpus, one window per query for top-k. The right baseline,
  and the right *plan* when |queries| is small: corpus-side work is a
  single scan, no shuffle of the corpus.
- ``ann_ivf`` — IVF-style cell-probed search: a coarse quantizer (centroid
  per cell) assigns every corpus vector to its nearest cell; queries probe
  only the ``nprobe`` nearest cells. At 100 TB the corpus is written
  partitioned by ``__cell`` so a probe is a partition-pruned scan, not a
  full pass.

Dot products use ``zip_with`` + ``aggregate`` (JVM higher-order functions,
double accumulation in element order — matching DuckDB's
``list_dot_product`` for the oracle twin). No Python UDFs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def round_half_away(x: "np.ndarray", nd: int) -> "np.ndarray":
    """Round half-away-from-zero, matching Spark ``F.round`` / DuckDB.

    ``np.round`` is binary half-to-even (np.round(0.0078125, 6) =
    0.007812, but F.round gives 0.007813) — every NumPy kernel that has
    a JVM or DuckDB oracle twin must use this instead so all dispatch
    paths share one rounding rule (same hazard documented in
    ``_jaccard_bitmap.py``; sign-aware because cosine can be negative).
    """
    s = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double, element order (portable accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column, round_to: int | None = None) -> Column:
    """Unit-L2 vector as array<double> (zero vectors pass through as-is).

    Done once at ingest it turns every later cosine into a plain dot
    product. ``round_to`` is optional — cross-engine-exact comparisons
    should scale to integers instead (see the workload twin): round() on
    doubles is the one op whose half-way convention differs per engine.
    """
    n = norm(a)
    unit = F.when(
        n > 0.0, F.transform(a, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(a, lambda x: x.cast("double")))
    if round_to is not None:
        unit = F.transform(unit, lambda x: F.round(x, round_to))
    return unit


def with_unit_and_int8(
    df: DataFrame, vec_col: str = "embedding", keep: tuple[str, ...] = ("vec_id",)
) -> DataFrame:
    """``keep`` + unit-L2 (µ-scaled ints) + int8 codes + scale, with the
    norm and max-|x| PRE-PROJECTED once per row.

    The column-level ``l2_normalize``/``quantize_int8`` close over the norm
    subexpression inside each ``transform`` lambda; inlined per element
    that is O(dim²) interpreted work per row (measured 52× superlinear on
    the 10× probe — 18s for 20k×64-dim vectors). Materializing the two
    scalars through a projection boundary (multi-referenced aliases survive
    CollapseProject) makes the whole thing O(dim) again.
    """
    v = F.col(vec_col)
    base = df.select(
        *keep,
        F.transform(v, lambda x: x.cast("double")).alias("__v"),
    ).select(
        *keep, "__v",
        norm(F.col("__v")).alias("__n"),
        F.array_max(F.transform(F.col("__v"), F.abs)).alias("__amax"),
    )
    n, amax = F.col("__n"), F.col("__amax")
    scale = F.when(amax > 0.0, 127.0 / amax).otherwise(F.lit(0.0))
    return base.select(
        *keep,
        F.transform(
            F.col("__v"),
            lambda x: F.floor(
                F.when(n > 0.0, x / n).otherwise(x) * 1_000_000 + 0.5
            ).cast("long"),
        ).alias("unit_q6"),
        F.transform(
            F.col("__v"), lambda x: F.floor(x * scale + 0.5).cast("int")
        ).alias("q_int8"),
        F.round(scale, 6).alias("q_scale"),
    )


def quantize_int8(a: Column) -> dict[str, Column]:
    """Symmetric int8 scalar quantization: scale = 127 / max|x| per vector.

    ``floor(x·scale + 0.5)`` instead of round() — identical half-way
    behavior in every engine (Spark HALF_UP vs DuckDB half-even would
    otherwise flip lanes). Returns the int8 code array and the (rounded)
    de-quantization scale. 4× smaller vectors; at 100 TB this is the
    difference between an in-memory and a spilling ANN probe stage.
    """
    amax = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax > 0.0, 127.0 / amax).otherwise(F.lit(0.0))
    q = F.transform(
        a, lambda x: F.floor(x.cast("double") * scale + 0.5).cast("int")
    )
    return {"q": q, "scale": F.round(scale, 6)}


def linear_probe_score(
    df: DataFrame,
    vec_col: str,
    weights: list[float],
    bias: float = 0.0,
    score_col: str = "score",
    round_to: int | None = 6,
) -> DataFrame:
    """Model-based quality filtering: score every row with a linear probe
    (logistic head) over its embedding — ``sigmoid(w·x + b)``.

    This is the inference half of the standard fastText/linear-classifier
    corpus filter (quality, toxicity, domain): train offline, then score
    100 TB with a broadcast weight vector and zero Python. The weights
    land in the plan as an array literal, the dot product is the same
    ``zip_with``+``aggregate`` left-fold as ``dot`` (element-order
    accumulation — portable across engines), and the whole thing is one
    narrow projection: no shuffle, no UDF, scales with the scan.

    For a multi-class head, call once per class column or pass the weight
    matrix flattened and argmax the resulting score columns.
    """
    w = F.array(*[F.lit(float(x)) for x in weights])
    z = dot(F.col(vec_col), w) + F.lit(float(bias))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    if round_to is not None:
        score = F.round(score, round_to)
    return df.withColumn(score_col, score)


def _logreg_train_rows(
    rows: "list[tuple[list | None, float | None]]",
    n: int,
    dim: int,
    iters: int,
    lr: float,
    round_to: int,
) -> list[tuple[int, float]]:
    """The full-batch GD loop over a collected (vec, label) sample —
    bit-identical to the distributed loop in :func:`logreg_train`:

    - z is the element-order left fold ``(…(0.0 + v₀·w₀) + v₁·w₁)…`` + b
      (the ``dot`` contract, sequential IEEE adds);
    - a ragged/NULL vector or NULL label poisons z → every contribution
      of that row is NULL (zip_with pads with NULL), i.e. skipped;
    - each contribution is rounded HALF_UP at ``round_to`` and cast to
      DECIMAL(18,6): NaN/±Inf/overflow become NULL (non-ANSI cast) and
      drop out of the sum PER POSITION (a row with an Inf element still
      contributes its bias residual);
    - per-position sums are exact Decimal adds (order-free), and weight
      updates reuse the identical ``_r`` quantize the distributed driver
      loop runs.
    """
    import math
    from decimal import ROUND_HALF_UP, Decimal

    quantum = Decimal(1).scaleb(-round_to)

    def _r(x: float) -> float:
        return float(Decimal(repr(x)).quantize(quantum, ROUND_HALF_UP))

    # F.round(double, d) == BigDecimal(Double.toString(x)) HALF_UP — the
    # same repr-quantize as _r; the DECIMAL(18,6) cast then NULLs
    # non-finite and out-of-range values (non-ANSI), skipping them
    dec_max = Decimal(10) ** 12  # DECIMAL(18,6): 12 integer digits
    def _dec(x: float) -> "Decimal | None":
        if math.isnan(x) or math.isinf(x):
            return None
        q = Decimal(repr(x)).quantize(quantum, ROUND_HALF_UP)
        if q.copy_abs() >= dec_max:
            return None
        return q

    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        sums: dict[int, Decimal | None] = {}

        def _add(pos: int, c: "float | None") -> None:
            d = None if c is None else _dec(c)
            if pos not in sums:
                sums[pos] = d
            elif d is not None:
                sums[pos] = d if sums[pos] is None else sums[pos] + d

        for v, y in rows:
            bad = (
                v is None or y is None or len(v) != dim
                or any(e is None for e in v)
            )
            if bad:
                resid = None
            else:
                acc = 0.0
                for vi, wi in zip(v, w):
                    acc = acc + vi * wi
                z = acc + b
                try:
                    ez = math.exp(-z)
                except OverflowError:
                    ez = float("inf")
                if math.isnan(ez):
                    resid = float("nan")
                else:
                    resid = _r(1.0 / (1.0 + ez)) - y
            _add(0, resid)
            if v is not None:
                for j, vi in enumerate(v):
                    _add(
                        j + 1,
                        None if (vi is None or resid is None)
                        else vi * resid,
                    )
        g = {pos: None if s is None else float(s)
             for pos, s in sums.items()}
        b = _r(b - lr * g[0] / n)
        w = [_r(w[j] - lr * g[j + 1] / n) for j in range(dim)]
    return [(-1, b)] + list(enumerate(w))


def logreg_train(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    iters: int = 2,
    lr: float = 0.1,
    round_to: int = 6,
    local: "bool | None" = None,
) -> list[tuple[int, float]]:
    """Train the linear quality-filter head ON the cluster — the other
    half of :func:`linear_probe_score`'s workflow (train on a labeled
    sample, then score 100 TB with the broadcast weights).

    Full-batch logistic gradient descent, deterministic by the repo's
    fixed-point contract: per-row gradient contributions are rounded once
    and fixed as DECIMAL(18,6), so the per-position sums are
    order-independent (any partitioning, any engine — the DSIR trick),
    and weight updates round half-away-from-zero at ``round_to``. The
    dot product is the element-order ``zip_with`` fold (IEEE-identical to
    DuckDB's ``list_dot_product``), so a SQL oracle replays training
    bit-for-bit.

    Scale shape per iteration: ONE scan → posexplode to (pos, contrib) →
    one map-side-combinable sum shuffle of ``dim+1`` groups → a
    ``dim+1``-scalar driver collect (the MLlib loop shape). The residual
    is materialized through a projection boundary (multi-referenced
    alias survives CollapseProject) so sigmoid is computed once per row,
    not once per element.

    Returns ``[(-1, bias), (0, w_0), …, (dim-1, w_{dim-1})]``.

    ``local``: driver-local dispatch for driver-sized samples (see the
    inline comment); ``None`` = auto by size, ``True``/``False`` force.
    """
    from decimal import ROUND_HALF_UP, Decimal

    quantum = Decimal(1).scaleb(-round_to)

    def _r(x: float) -> float:
        return float(Decimal(repr(x)).quantize(quantum, ROUND_HALF_UP))

    base = df.select(
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.col(label_col).cast("double").alias("__y"),
    )
    # driver-local dispatch (the quantizer-trainer pattern): a provably
    # driver-sized sample (planning-time estimate ≤ the shared 32 MB
    # bound, post-collect volume check, collect-failure fallback) runs
    # the whole GD loop on the collected rows — one collect total
    # instead of count + first + one gradient job per iteration.
    # local=None auto-dispatches by size; True/False force.
    if local is not False:
        ok = local is True or (
            0 < _plan_size_bytes(base) <= _LOCAL_TRAIN_MAX_BYTES
        )
        collected = None
        if ok:
            try:
                collected = base.collect()
            except Exception:
                if local is True:
                    raise
                collected = None  # lying estimate: distributed fallback
        if collected is not None:
            est = sum(
                64 + (0 if r[0] is None else 8 * len(r[0]))
                for r in collected
            )
            if local is True or est <= 4 * _LOCAL_TRAIN_MAX_BYTES:
                return _logreg_train_rows(
                    [
                        (None if r[0] is None else list(r[0]), r[1])
                        for r in collected
                    ],
                    n=len(collected),
                    dim=len(collected[0][0]),
                    iters=iters,
                    lr=lr,
                    round_to=round_to,
                )

    n = df.count()
    dim = len(df.select(vec_col).first()[0])
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        warr = F.array(*[F.lit(float(x)) for x in w])
        z = dot(F.col("__v"), warr) + F.lit(float(b))
        p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to)
        staged = base.select(
            "__v", (p - F.col("__y")).alias("__resid")
        )
        resid = F.col("__resid")
        contrib = F.concat(
            F.array(F.round(resid, round_to).cast("decimal(18,6)")),
            F.transform(
                F.col("__v"),
                lambda x: F.round(x * resid, round_to).cast("decimal(18,6)"),
            ),
        )
        grads = (
            staged.select(resid, F.posexplode(contrib))
            .groupBy("pos")
            .agg(F.sum("col").alias("g"))
            .collect()
        )
        g = {r["pos"]: float(r["g"]) for r in grads}
        b = _r(b - lr * g[0] / n)
        w = [_r(w[j] - lr * g[j + 1] / n) for j in range(dim)]
    return [(-1, b)] + list(enumerate(w))


#: Pair-volume proxy (|queries| × corpus plan bytes) above which
#: knn_bruteforce switches from the all-JVM crossJoin expression to the
#: Arrow GEMM kernel: the HOF cosine is interpreted (not codegen'd) at
#: O(dim) boxed ops PER PAIR, so pair count — not bytes — is the cost
#: driver (100 queries × 5k vectors measured ~12 s interpreted vs ~1 s
#: vectorized). Threshold keeps the sf0.01 oracle corpus on the JVM
#: path (the driver-certified one); parity between the paths is pinned
#: by a unit test.
_KNN_GEMM_MIN_PAIR_BYTES = 48 * 1024 * 1024

#: Both knn paths hold the query batch driver-side (collect for the GEMM
#: broadcast matrices, collect + re-broadcast for the JVM crossJoin), so
#: a corpus-sized queries DataFrame would OOM the driver instead of
#: erroring. The guard is an EXACT row cap enforced inside the collect
#: itself (``limit(cap+1).collect()`` — Spark ships at most cap+1 rows
#: to the driver, so the check can never be the OOM it guards against;
#: plan-size estimates were tried first and are useless here — a Filter
#: passes its scan's estimate through and LogicalRDD/localCheckpoint
#: inherits the pre-checkpoint stats, so derived query plans read as
#: corpus-sized however small they really are). 1M rows ≈ 0.5 GB of
#: 64-dim doubles — generous for the "queries are the small side"
#: contract; a genuinely bigger batch belongs on an ANN path.
_KNN_QUERIES_MAX_ROWS = 1_000_000


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    round_to: int = 6,
    gemm_min_pair_bytes: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (q_id, n_id, cos_sim, rank); excludes self-matches. Ties break
    on neighbor id (deterministic). ``queries`` is collected + broadcast —
    it must be the small side (guarded by ``_KNN_QUERIES_MAX_ROWS``).
    Only equal-width pairs rank (cross-width cosine is undefined; corrupt
    rows are never neighbors — the corpus-wide corrupt-row contract).

    Dispatch mirrors assign_clusters/pq_encode: small pair volumes run
    as one JVM crossJoin + window (zero Python); above
    ``gemm_min_pair_bytes`` (default ``_KNN_GEMM_MIN_PAIR_BYTES``) of
    |queries|×corpus volume, corpus batches stream through ONE Arrow
    GEMM that emits per-batch partial top-k (k rows per query per batch
    — top-k is distributive), and the same window finishes globally.
    Identical 6dp rounding, NaN-greatest ordering (Spark's double sort
    order), and id tie-break. The bound is a parameter so the GEMM
    branch can be forced on fixture-sized data under a value-hash
    oracle (pipe_knn_exact_gemm), not just parity tests.
    """
    from pyspark.sql import Window

    if gemm_min_pair_bytes is None:
        gemm_min_pair_bytes = _KNN_GEMM_MIN_PAIR_BYTES
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("n_id").asc())
    q_rows = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    ).limit(_KNN_QUERIES_MAX_ROWS + 1).collect()
    n_q = len(q_rows)
    if n_q > _KNN_QUERIES_MAX_ROWS:
        raise ValueError(
            f"knn_bruteforce queries side exceeds "
            f"{_KNN_QUERIES_MAX_ROWS} rows — it is held driver-side "
            "and broadcast (the small side by contract); swap "
            "corpus/queries, or use an ANN path (ivfpq_topk_batch) "
            "for a corpus-sized batch")
    qid_t = queries.schema[id_col].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    if n_q * _plan_size_bytes(corpus) > gemm_min_pair_bytes:
        by_w: dict[int, list] = {}
        for r in q_rows:
            if r["__qv"] is not None:
                by_w.setdefault(len(r["__qv"]), []).append(
                    (r["q_id"], r["__qv"]))
        bmats = {
            wd: (np.array([qid for qid, _ in lst]),
                 np.stack([np.asarray(qv, dtype=np.float64)
                           for _, qv in lst]))
            for wd, lst in by_w.items()
        }
        bc = corpus.sparkSession.sparkContext.broadcast(bmats)
        out_schema = f"q_id {qid_t}, n_id {nid_t}, cos_sim double"

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vals = pdf["__cv"].to_numpy()
                ids = pdf["n_id"].to_numpy()
                lens = np.fromiter(
                    (len(r) if r is not None else -1 for r in vals),
                    dtype=np.int64, count=len(vals))
                oq, on, os_ = [], [], []
                for wd, (qids, qm) in bc.value.items():
                    rows_i = np.flatnonzero(lens == wd)
                    if not len(rows_i):
                        continue
                    m = np.stack([np.asarray(vals[i], dtype=np.float64)
                                  for i in rows_i])
                    rid = ids[rows_i]
                    # IEEE like the JVM doubles: den 0 → inf/nan, and
                    # NaN ranks GREATEST (Spark's double sort order)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        sims = round_half_away(
                            (m @ qm.T) / np.outer(
                                np.linalg.norm(m, axis=1),
                                np.linalg.norm(qm, axis=1)),
                            round_to)
                    for j in range(len(qids)):
                        s = sims[:, j]
                        s2 = np.where(np.isnan(s), np.inf, s)
                        order = np.lexsort((rid, -s2))
                        take = []
                        for i in order:
                            if rid[i] != qids[j]:  # no self-match
                                take.append(i)
                                if len(take) > k:
                                    break
                        take = take[:k]
                        if take:
                            oq.append(np.full(len(take), qids[j]))
                            on.append(rid[take])
                            os_.append(s[take])
                if oq:
                    yield pd.DataFrame({
                        "q_id": np.concatenate(oq),
                        "n_id": np.concatenate(on),
                        "cos_sim": np.concatenate(os_),
                    })

        partial = corpus.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).cast("array<double>").alias("__cv"),
        ).mapInPandas(gen, schema=out_schema)
        return (
            partial.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
        )

    q = queries.sparkSession.createDataFrame(
        [(r["q_id"], r["__qv"]) for r in q_rows],
        f"q_id {qid_t}, __qv array<double>",
    )
    c = corpus.select(F.col(id_col).alias("n_id"),
                      F.col(vec_col).cast("array<double>").alias("__cv"))
    sim = F.round(cosine(F.col("__qv"), F.col("__cv")), round_to)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("q_id") != F.col("n_id"))
        # equal-width pairs only — the corrupt-row contract; a
        # truncated zip_with dot across widths is garbage, not cosine
        .filter(F.col("__cv").isNotNull() & F.col("__qv").isNotNull()
                & (F.size("__cv") == F.size("__qv")))
        .select("q_id", "n_id", sim.alias("cos_sim"))
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def centroids_by(
    df: DataFrame, cell_col: str, vec_col: str = "embedding"
) -> DataFrame:
    """Element-wise mean vector per cell (the IVF coarse quantizer).

    posexplode → (cell, pos) average → re-assemble in position order. One
    shuffle on (cell, pos); dimension count is the fan-out, not row count.
    """
    pos = df.select(
        F.col(cell_col).alias("__cell"), F.posexplode(F.col(vec_col))
    )
    by_pos = pos.groupBy("__cell", "pos").agg(F.avg("col").alias("v"))
    return by_pos.groupBy("__cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("__centroid")
    )


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    cell_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nprobe: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """IVF cell-probed approximate top-k.

    The coarse quantizer is the per-``cell_col`` centroid set (e.g. a label
    or a pre-clustered assignment). Every query scores only vectors whose
    cell is among its ``nprobe`` closest centroids. Returns
    (q_id, n_id, cos_sim, rank).
    """
    from pyspark.sql import Window

    cents = centroids_by(corpus, cell_col, vec_col)
    q = queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("__qv"))
    qc = q.crossJoin(F.broadcast(cents)).select(
        "q_id", "__qv", "__cell",
        F.round(cosine(F.col("__qv"), F.col("__centroid")), round_to).alias("__cc"),
    )
    w_cell = Window.partitionBy("q_id").orderBy(
        F.col("__cc").desc(), F.col("__cell").asc()
    )
    probes = (
        qc.withColumn("__pr", F.row_number().over(w_cell))
        .filter(F.col("__pr") <= nprobe)
        .select("q_id", "__qv", "__cell")
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("__cv"),
        F.col(cell_col).alias("__cell"),
    )
    # probe join: corpus side stays partitioned by cell — at scale this is
    # a partition-pruned read of nprobe cells per query
    scored = (
        c.join(F.broadcast(probes), "__cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .select(
            "q_id", "n_id",
            F.round(cosine(F.col("__qv"), F.col("__cv")), round_to).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    q_col: str = "q_id",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> DataFrame:
    """Per-query recall@k of an approximate top-k result against exact
    ground truth — the quality gauge every ANN deployment tunes against
    (FAISS's recall-vs-nprobe curves). Both inputs are (q_col, id_col)
    result sets (extra columns ignored); recall = |approx ∩ exact| /
    |exact| per query, with queries whose approx set is empty scoring 0.

    Scale: the inputs are top-k sets — |queries|·k rows by construction,
    regardless of corpus size — so the intersect join and both
    aggregations run on bounded data no matter what produced them; at
    100 TB the cost is wherever the two result sets came from, never
    here. Returns (q_col, recall) rounded to ``round_to``.
    """
    a = approx.select(F.col(q_col), F.col(id_col)).distinct()
    e = exact.select(F.col(q_col), F.col(id_col)).distinct()
    den = e.groupBy(q_col).agg(F.count(F.lit(1)).alias("__n"))
    hits = a.join(e, [q_col, id_col]).groupBy(q_col).agg(
        F.count(F.lit(1)).alias("__h"))
    return den.join(hits, q_col, "left").select(
        F.col(q_col),
        F.round(F.coalesce(F.col("__h"), F.lit(0)) / F.col("__n"),
                round_to).alias("recall"),
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    blocks: int = 8,
    round_to: int = 6,
) -> DataFrame:
    """All pairs with cosine(a, b) >= threshold (embedding near-dup).

    Exact (no LSH recall risk): block-partitioned all-pairs with a
    vectorized NumPy kernel. Each vector is assigned a block by id hash;
    the B*(B+1)/2 block pairs are processed independently by
    ``applyInPandas`` — each task materializes only two blocks and runs one
    f64 matrix multiply, so the O(n²) work distributes evenly across the
    cluster and per-task memory is (2n/B)·dim doubles regardless of total
    corpus size. Scale knob: ``blocks`` grows with sqrt(cluster cores).

    Returns (id_a, id_b, cos_sim) with id_a < id_b.
    """
    import pandas as pd

    spark = df.sparkSession
    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("__blk"),
    ).filter(F.col("__v").isNotNull())  # NULL rows can't pair (survive)
    pair_rows = [
        (a, b) for a in range(blocks) for b in range(blocks) if a <= b
    ]
    bp = spark.createDataFrame(pair_rows, "pa int, pb int")
    # each vector joins every block-pair involving its block: row carries
    # (pair, side) so one groupBy key gathers exactly the two blocks needed
    sides = v.join(
        F.broadcast(bp), (F.col("__blk") == F.col("pa")) | (F.col("__blk") == F.col("pb"))
    ).select(
        "pa", "pb", "__id", "__v", (F.col("__blk") == F.col("pa")).alias("__is_a")
    )

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, cos_sim double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        same = bool(pdf["pa"].iat[0] == pdf["pb"].iat[0])
        a = pdf[pdf["__is_a"]] if not same else pdf
        b = pdf[~pdf["__is_a"]] if not same else pdf
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        ma = np.stack(a["__v"].to_numpy())
        mb = np.stack(b["__v"].to_numpy())
        ma = ma / np.linalg.norm(ma, axis=1, keepdims=True)
        mb = mb / np.linalg.norm(mb, axis=1, keepdims=True)
        sim = ma @ mb.T
        ia, ib = np.nonzero(round_half_away(sim, round_to) >= threshold)
        id_a = a["__id"].to_numpy()[ia]
        id_b = b["__id"].to_numpy()[ib]
        # normalize pair order (cross-block ids are not ordered by block);
        # same-block pairs appear twice (x,y)+(y,x) and dedup via id_a<id_b
        keep = id_a != id_b
        lo = np.minimum(id_a[keep], id_b[keep])
        hi = np.maximum(id_a[keep], id_b[keep])
        cs = round_half_away(sim[ia, ib][keep], round_to)
        if same:
            first = lo == id_a[keep]
            lo, hi, cs = lo[first], hi[first], cs[first]
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": cs})

    # explicit repartition so AQE's size-based coalesce can't collapse the
    # compute-bound block-pair tasks (see _jaccard_bitmap note). Width in
    # the group key: vectors pair only at equal width (cross-width cosine
    # is undefined), so the kernel's np.stack always sees a uniform
    # matrix even on ragged crawl corpora; free when widths are uniform.
    n_pairs = blocks * (blocks + 1) // 2
    return (
        sides.repartition(2 * n_pairs, "pa", "pb")
        .groupBy("pa", "pb", F.size("__v"))
        .applyInPandas(kernel, out_schema)
        .select("id_a", "id_b", "cos_sim")
    )


def self_pairable(vec: Column, threshold: float) -> Column:
    """True iff a bitwise-identical copy of ``vec`` would verify as a
    near-duplicate of it under the documented cosine convention — the
    exact precondition for folding identical vectors in the exact
    pre-collapse stages (``semdedup``, ``embed_dedup_stream``).

    cos(v, v) is 1.0 for any finite non-zero-norm vector, 0.0 by the
    zero-norm convention (``assign_clusters``/``verify_cell`` both map a
    zero denominator to cos 0), and NaN when any component is NaN (NaN
    never compares ``>= threshold``). So identical zero-norm vectors pair
    only when ``threshold <= 0`` and NaN-containing vectors never pair —
    collapsing them at a positive threshold would CHANGE semantics
    (drop rows the pairwise stage would have kept). The same goes for
    vectors whose norm² overflows to inf (an inf component, or finite
    ~1e200 components): the verify kernels compute sim = inf/inf = NaN
    for their identical copies, so they never pair either — the sq
    bound below keeps them un-folded. NULL vectors are never pairable.
    Never returns SQL NULL (safe to negate)."""
    has_nan = F.exists(vec, lambda x: F.isnan(x.cast("double")))
    sq = F.aggregate(
        vec, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    self_sim = F.when(
        (sq > 0.0) & (sq < F.lit(float("inf"))), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return (
        vec.isNotNull()
        & F.coalesce(~has_nan, F.lit(False))
        & (self_sim >= F.lit(float(threshold)))
    )


#: Per-tile budget (in doubles) for every cell-group verify GEMM — the
#: similarity block and its den/abs temporaries stay ≤ this many float64
#: (~32 MB), so per-task memory is bounded regardless of cell occupancy.
#: Shared by cosine_pairs_ann here and the streaming fused kernel
#: (stream_ops imports it); module-level so tests can shrink it to force
#: multi-tile paths on small data.
_VERIFY_TILE_ELEMS = 4_194_304

#: Target EXPECTED per-cell occupancy for the sign-code cell family.
#: The verify stage is a per-cell GEMM (occupancy² work per cell), so
#: holding n/2^bits at or under this keeps cells O(1)-sized while still
#: amortizing Arrow batch overhead; ~2k×2k doubles is a ~32 MB GEMM —
#: milliseconds per task.
SIGN_CELL_TARGET_OCC = 2048


def auto_sign_bits(
    n_rows: int,
    dim: int,
    target_occ: int = SIGN_CELL_TARGET_OCC,
    lo: int = 8,
) -> int:
    """The smallest ``sign_bits`` that keeps expected cell occupancy
    (n_rows / 2^bits) at or under ``target_occ`` — the "widen sign_bits
    with log₂(corpus)" rule as a derived quantity instead of a manual
    knob. Clamped to [lo, dim]: :func:`sign_code` reads the first
    ``bits`` dimensions, so the embedding width is a hard ceiling (a
    corpus that saturates 2^dim cells needs a trained coarse quantizer —
    ``ivf_topk``/``ivfpq_topk`` — not more sign bits)."""
    bits = max(1, min(lo, dim))
    while n_rows > target_occ * (1 << bits) and bits < dim:
        bits += 1
    return bits


def sign_code(vec: Column, bits: int = 8) -> Column:
    """Coarse-quantizer cell id from the sign bits of the first ``bits``
    dimensions (axis-aligned random-hyperplane LSH for cosine — the
    hyperplanes are the coordinate planes, so the code is a deterministic
    pure-Column expression any engine can replay). Vectors with high
    cosine agree on most signs; Hamming-probing neighbor codes recovers
    pairs that straddle a plane."""
    terms = [
        (F.element_at(vec, j + 1) >= 0).cast("long") * F.lit(1 << j)
        for j in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _np_rows(col) -> list:
    """Per-row float64 views of an Arrow ``list<double>`` column: NULL
    rows as None, NULL elements as NaN — exactly what the Arrow→pandas
    bridge hands applyInPandas kernels — built from the flattened child
    buffer without per-element Python loops (the naive per-row
    ``np.array([... for x in v])`` costs ~0.5 s per 400k elements at
    bench scale; this is vectorized C conversion + per-row views)."""
    import numpy as np

    out: list = []
    for chunk in (col.chunks if hasattr(col, "chunks") else [col]):
        offs = chunk.offsets.to_numpy()
        # zero_copy_only=False: NULL child slots surface as NaN, the
        # same convention the pandas bridge applies
        vals = (chunk.values.to_numpy(zero_copy_only=False)
                if len(chunk) else np.empty(0, dtype=np.float64))
        if chunk.null_count:
            nulls = chunk.is_null().to_numpy(zero_copy_only=False)
            for i in range(len(chunk)):
                out.append(None if nulls[i]
                           else vals[offs[i]:offs[i + 1]])
        else:
            for i in range(len(chunk)):
                out.append(vals[offs[i]:offs[i + 1]])
    return out


def _sign_code_py(v, bits: int):
    """Driver-side twin of :func:`sign_code` over one row as the Arrow
    ``to_pylist`` representation (python list, NULL elements as None;
    NULL row as None), mirroring Spark's comparison semantics exactly:
    ``element_at`` past the end → NULL term → NULL sum; a NULL element →
    NULL; NaN sorts above every double so ``NaN >= 0`` is TRUE (NumPy
    would say False)."""
    import math

    if v is None or len(v) < bits:
        return None
    c = 0
    for j in range(bits):
        x = v[j]
        if x is None:
            return None
        if x >= 0 or math.isnan(x):
            c |= 1 << j
    return c


def cosine_pairs_ann(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    sign_bits: "int | None" = 8,
    round_to: int = 6,
    target_occ: "int | None" = None,
) -> DataFrame:
    """ANN-candidate near-dup pairs: the 100 TB route for embedding dedup
    (``cosine_pairs``' documented scale path, now a real operator).

    Candidate generation is sub-quadratic: every vector is binned by its
    ``sign_bits``-bit sign code (2^bits cells), and each vector probes its
    own cell plus the ``bits`` Hamming-1 neighbor codes (multi-probe LSH).
    Because Hamming-1 adjacency is symmetric, emitting a cross-cell pair
    only from the group where prober_id < member_id (and own-cell pairs
    triangularly) loses nothing and emits each pair exactly once.

    The SHUFFLE carries each vector once per probed cell — O(n·(bits+1))
    rows of (cell, id, vec) — never candidate PAIRS: a pair-join
    formulation ships O(Σ_cell |probers|·|members|) rows each carrying
    TWO vectors, which is ~n²·(bits+1)/2^bits·dim bytes — the salted
    100× probe measured it at 1.4 billion ~1 KB rows (21 min) where this
    per-cell form runs the same exact verification as tiled NumPy GEMMs
    inside each cell group (seconds; memory per task bounded by
    ``_VERIFY_TILE_ELEMS``-style blocks like ``cosine_pairs_within``).

    Recall contract: a pair is found iff its sign codes differ in ≤1 of
    the first ``bits`` dims. At near-dup thresholds (≥0.9) codes almost
    always agree outright; lower thresholds need more probes or a trained
    coarse quantizer — that trade-off is the definition of ANN. Scale
    knob: ``sign_bits`` grows with log₂(corpus) to keep cells O(1)-sized;
    ``sign_bits=None`` derives it (:func:`auto_sign_bits`) from the
    corpus row count and embedding width, so occupancy stays bounded
    without manual retuning.

    NOT driver-local-dispatched (unlike the quantizer trainers, r13):
    a measured A/B of a collect-once + literal-kernel-over-pandas-groups
    twin came back a wash at 256 cells (2.37 vs 2.27 s warm) and ~1 s
    SLOWER at 2048 cells (target_occ=2: 3.56 vs 2.57 s) — the per-group
    pandas-frame overhead on a serial driver loses to ONE applyInPandas
    shuffle that parallelizes the same groups across cores. The trainers
    win locally because their per-iteration output is a single bounded
    collect; here the work itself is the per-cell group fan-out.

    Returns (id_a, id_b, cos_sim) with id_a < id_b.
    """
    import pandas as pd

    if sign_bits is None:
        # ONE exact aggregate job sizes the corpus and its width. Not
        # the planning-time stats estimate: on derived plans (joins
        # without column stats) sizeInBytes is the PRODUCT of child
        # sizes — orders of magnitude high — which would walk bits to
        # the embedding width and silently gut the ≤1-Hamming recall
        # contract. Not a first-row peek either: size(NULL) is -1 under
        # the legacy sizeOfNull convention and one NULL first row would
        # yield dim=-1 → bits=1 → a 2-cell full-quadratic blowup. The
        # count is a rounding error next to the pair stage it sizes.
        from griddb_spark.perfstages import stage

        with stage("ann_size"):
            row = df.select(
                F.count(F.lit(1)).alias("__n"),
                F.max(F.size(F.col(vec_col))).alias("__d"),
            ).first()
        dim = (int(row["__d"])
               if row["__d"] is not None and int(row["__d"]) > 0 else 8)
        # target_occ widens/narrows the derived layout (the occupancy
        # knob the 1000x sweep tuned); only meaningful with derived bits
        sign_bits = auto_sign_bits(
            int(row["__n"]), dim,
            **({"target_occ": target_occ} if target_occ is not None
               else {}))
    if sign_bits < 1:
        # bits=0 would build F.array() with zero probe columns (opaque
        # IndexError) and a degenerate single-cell quadratic; the
        # contract is ≥1 hyperplane — auto_sign_bits never derives <1.
        raise ValueError(
            f"sign_bits must be >= 1 (got {sign_bits}); pass None to "
            "derive it from the corpus (auto_sign_bits)")

    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).withColumn("__cell", sign_code(F.col("__v"), sign_bits))
    # Unpairable rows emit no pairs and are dropped HERE, not in the
    # kernel: a NULL embedding (or one shorter than the code width —
    # ragged crawl data) yields a NULL sign code, and without this
    # filter every such row lands in one NULL-key group whose
    # np.stack(None) crashes the verify kernel. No pair ⟹ the caller's
    # dedup keeps the row — the same survivor semantics as a vector
    # nothing matches.
    v = v.filter(F.col("__cell").isNotNull())
    members = v.select(
        "__id", "__v", F.lit(True).alias("__own"),
        F.col("__cell").alias("__pcell"),
    )
    probers = v.select(
        "__id", "__v", F.lit(False).alias("__own"),
        F.explode(F.array(*[
            F.col("__cell").bitwiseXOR(F.lit(1 << j))
            for j in range(sign_bits)
        ])).alias("__pcell"),
    )

    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, cos_sim double"
    # captured by value at closure-creation time (worker processes
    # re-import the module, so a runtime module-attr read would ignore
    # a test's monkeypatch)
    tile_elems = _VERIFY_TILE_ELEMS

    def kernel(key, pdf):
        import numpy as np

        own = pdf[pdf["__own"]]
        out_a: list = []
        out_b: list = []
        out_s: list = []
        if len(own):
            mb = np.stack(own["__v"].to_numpy())
            nb = np.linalg.norm(mb, axis=1)
            bid = own["__id"].to_numpy()

            def sim_block(rows, rn):
                den = np.outer(rn, nb)
                den[den == 0.0] = 1.0
                return round_half_away((rows @ mb.T) / den, round_to)

            def emit(sim, row_ids):
                # wholesale array emission: on dense near-dup cells a
                # per-hit Python loop re-serializes the GEMM's win into
                # scalar appends per output pair
                ii, jj = np.nonzero(sim >= threshold)
                if not len(ii):
                    return
                xs, ys = row_ids[ii], bid[jj]
                if xs.dtype.kind == "O" or ys.dtype.kind == "O":
                    ok = np.fromiter(
                        (x is not None and y is not None
                         for x, y in zip(xs, ys)),
                        dtype=bool, count=len(xs))
                    if not ok.all():
                        ii, jj = ii[ok], jj[ok]
                        xs, ys = xs[ok], ys[ok]
                lt = xs < ys
                out_a.append(xs[lt])
                out_b.append(ys[lt])
                out_s.append(sim[ii[lt], jj[lt]])

            step = max(1, tile_elems // len(mb))
            # own-cell pairs: triangular over the members (id_a < id_b
            # keeps each unordered pair once)
            for s in range(0, len(mb), step):
                e = min(s + step, len(mb))
                emit(sim_block(mb[s:e], nb[s:e]), bid[s:e])
            # Hamming-1 pairs: probers × members, emitted only where
            # prober_id < member_id — the symmetric group (the member's
            # own probe of the prober's cell) emits the other ordering,
            # so each cross-cell pair appears exactly once overall
            pr = pdf[~pdf["__own"]]
            if len(pr):
                ma = np.stack(pr["__v"].to_numpy())
                na = np.linalg.norm(ma, axis=1)
                aid = pr["__id"].to_numpy()
                for s in range(0, len(ma), step):
                    e = min(s + step, len(ma))
                    emit(sim_block(ma[s:e], na[s:e]), aid[s:e])
        if out_a:
            return pd.DataFrame({
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cos_sim": np.concatenate(out_s).astype(np.float64),
            })
        return pd.DataFrame({"id_a": [], "id_b": [],
                             "cos_sim": np.asarray([], dtype=np.float64)})

    # Width rides in the group key: vectors pair only at equal width
    # (cosine across widths is undefined), so each kernel invocation
    # stacks a UNIFORM matrix — a mixed-width corpus (ragged crawl
    # embeddings wider than the code width) otherwise hands np.stack a
    # ragged set and crashes. Uniform corpora: one width per cell, the
    # extra key is free.
    return members.unionByName(probers).groupBy(
        "__pcell", F.size("__v")
    ).applyInPandas(kernel, out_schema)


#: above this many centroids the interpreted-HOF cost of the all-JVM
#: assignment expression dominates and assign_clusters switches to the
#: Arrow-batched GEMM projection (same math, same plan shape).
_ASSIGN_JVM_MAX_K = 16

#: above this planning-time input size (file-stat based, free to read)
#: assign_clusters and pq_encode switch to the GEMM kernel even for
#: small codebooks/centroid sets: the interpreted HOF argmin/argmax is
#: not codegen'd and costs ~1-2 ms per ROW at m=4,k=8/dim=64 (measured
#: r13: encode 3.3 s vs 0.3 s, assign 1.8 s vs 0.33 s over just 2k
#: vectors), where the vectorized kernel is per-BATCH work plus a flat
#: ~0.3 s warm-worker cost — so the break-even is a few hundred rows,
#: ~256 KB of 64-dim doubles, not megabytes. Below it, Python-worker
#: spin-up outweighs the kernel win (a cold worker costs ~2-3 s, and
#: one-off tiny calls — unit fixtures, driver smoke — stay JVM).
_GEMM_MIN_BYTES = 256 * 1024


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's planning-time size estimate for ``df`` (file-stat
    driven for scans; conservative for derived plans). Driver-side
    metadata only — no job runs."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 0


def assign_clusters(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    round_to: int = 6,
    out_col: str = "cluster",
    score_col: str | None = None,
) -> DataFrame:
    """Nearest-centroid assignment (max cosine, ties to the lowest
    cluster index) as a PURE PROJECTION: the centroid set is a driver-side
    literal (k·dim scalars), each cosine is a JVM higher-order-function
    expression, and the argmax is an array_max over (cos, -idx) structs —
    no shuffle, no Python, no join. At 100 TB this is a map-only stage
    that pipelines into whatever scan precedes it; the cosine is rounded
    to ``round_to`` BEFORE the argmax so the assignment is reproducible
    across engines and accumulation orders.

    Dispatch on k AND input size: Catalyst higher-order functions are
    interpreted (not codegen'd), so the all-JVM expression path costs
    O(k·dim) interpreted ops per row — measured ~15 s for k=80 over just
    20k rows, and ~0.9 ms/row even at k=8 (r13: 1.8 s over 2k rows where
    the warm GEMM kernel takes 0.33 s). Above ``_ASSIGN_JVM_MAX_K``
    centroids, or above ``_GEMM_MIN_BYTES`` of planning-time input at
    any k, the same argmax runs as ONE Arrow-batched
    pandas GEMM (rows × centroidsᵀ) — still a pure projection (no
    Exchange; plan-tested), identical formula (dot / (|v|·|c|), rounded,
    ties to the lowest index via first-max argmax over
    ascending-index columns)."""
    import math

    if centroids and (len(centroids) > _ASSIGN_JVM_MAX_K
                      or _plan_size_bytes(df) > _GEMM_MIN_BYTES):
        idxs = np.array([int(ci) for ci, _ in centroids])
        assert (np.diff(idxs) > 0).all()  # ascending → argmax tie = min idx
        cm = np.stack([np.asarray(c, dtype=np.float64) for _, c in centroids])
        cn = np.linalg.norm(cm, axis=1)
        d_cent = cm.shape[1]

        @F.pandas_udf("c int, s double")
        def _assign(vs: pd.Series) -> pd.DataFrame:
            arr = vs.to_numpy()
            # corrupt rows (NULL embedding / width ≠ centroid width —
            # ragged crawl data) take NULL cluster + score, matching the
            # JVM path's when() guard; np.stack would otherwise crash on
            # None or a ragged set. Fast path: clean uniform batch.
            valid = np.fromiter(
                (r is not None and len(r) == d_cent for r in arr),
                dtype=bool, count=len(arr))
            if valid.all():
                m = np.stack(arr).astype(np.float64)
            elif not valid.any():
                return pd.DataFrame(
                    {"c": pd.array([None] * len(arr), dtype="Int32"),
                     "s": np.full(len(arr), None, dtype=object)})
            else:
                m = np.stack([np.asarray(arr[i], dtype=np.float64)
                              for i in np.flatnonzero(valid)])
            vn = np.linalg.norm(m, axis=1)
            den = np.outer(vn, cn)
            den[den == 0.0] = np.inf  # zero norm → cos 0, matches JVM path
            sim = round_half_away((m @ cm.T) / den, round_to)
            am = np.argmax(sim, axis=1)
            if valid.all():
                return pd.DataFrame(
                    {"c": idxs[am].astype(np.int32),
                     "s": sim[np.arange(len(am)), am]})
            c_out = np.full(len(arr), None, dtype=object)
            s_out = np.full(len(arr), None, dtype=object)
            c_out[valid] = idxs[am]
            s_out[valid] = sim[np.arange(len(am)), am]
            return pd.DataFrame({"c": pd.array(c_out, dtype="Int32"),
                                 "s": s_out})

        picked = _assign(F.col(vec_col).cast("array<double>"))
        out = df.withColumn("__pick", picked).withColumn(
            out_col, F.col("__pick.c")
        )
        if score_col is not None:
            out = out.withColumn(score_col, F.col("__pick.s"))
        return out.drop("__pick")

    v = F.col(vec_col).cast("array<double>")
    vnorm = norm(v)
    structs = []
    for cidx, c in centroids:
        cn = math.sqrt(sum(float(x) * float(x) for x in c))
        clit = F.array(*[F.lit(float(x)) for x in c])
        den = vnorm * F.lit(cn)
        cos = F.when(den > 0.0, dot(v, clit) / den).otherwise(F.lit(0.0))
        structs.append(
            F.struct(
                F.round(cos, round_to).alias("c"),
                F.lit(-int(cidx)).cast("int").alias("ni"),
            )
        )
    # corrupt rows (NULL / width ≠ centroid width) assign to NULL, not a
    # garbage nearest-of-truncated-dot — same contract as the GEMM path
    d_cent = len(centroids[0][1]) if centroids else 0
    valid = v.isNotNull() & (F.size(v) == F.lit(d_cent))
    best = F.when(valid, F.array_max(F.array(*structs)))
    out = df.withColumn(out_col, (-best["ni"]).cast("int"))
    if score_col is not None:
        out = out.withColumn(score_col, best["c"])
    return out


#: Planning-time input size under which quantizer TRAINING collects the
#: corpus to the driver and runs the identical Lloyd/PQ math in NumPy
#: instead of as Spark jobs. Training state is driver-bounded by contract
#: already (k·dim centroids, k·in_dim codebooks — every iteration ends in
#: a driver collect of exactly that); when the INPUT is itself provably
#: driver-sized (file-stat estimate, no job runs), the distributed loop
#: is pure overhead — 5-7 jobs of fixed scheduler/shuffle latency over
#: kilobytes (measured r13: ivfpq_train on the 384-row clustered fixture
#: 4.1 s distributed vs ~0.1 s local; the 2k-row sf0.1 corpus ~3 s vs
#: ~0.1 s). 32 MB of 64-dim doubles ≈ 60k vectors — far under driver
#: heap, far over every unit fixture. At scale the estimate exceeds the
#: bound and the distributed path runs unchanged (at 100 TB training
#: reads a deterministic_sample anyway — the FAISS posture; the full-data
#: passes are encode/serve, which never dispatch here). Parity: the
#: kernels reuse round_half_away and first-occurrence argmin/argmax, the
#: same 6dp-round-before-compare contract the GEMM dispatch already pins
#: against the JVM path (tests/test_local_train.py).
_LOCAL_TRAIN_MAX_BYTES = 32 * 1024 * 1024


def _local_train_rows(
    df: DataFrame, id_col: str, vec_col: str, force: bool = False,
) -> "list[tuple] | None":
    """``[(id, vec|None), …]`` sorted by id (NULLs first — Spark's
    ``orderBy`` asc contract) when ``df`` is provably driver-sized at
    planning time, else None (= train distributed). ``force`` skips the
    size gate for inputs whose boundedness the caller proves by
    construction (e.g. the 384-row clustered fixture)."""
    if not force:
        sz = _plan_size_bytes(df)
        if sz <= 0 or sz > _LOCAL_TRAIN_MAX_BYTES:
            return None
    # The estimate can LIE low on derived plans (Catalyst selectivity
    # guesses after filters/joins), so the collect itself is hardened
    # (VERDICT r13 "what's wrong" #3): a collect that trips
    # spark.driver.maxResultSize surfaces as a Py4J error → fall back to
    # the distributed path instead of crashing the query, and a
    # successful collect that turns out far bigger than the gate
    # promised (rows × vector width, conservatively 8 B/element + 64 B
    # row overhead) also falls back — the driver survived it once, but
    # the local fixed-point loop over that volume would be the slow
    # path anyway. force=True callers prove boundedness by construction.
    try:
        collected = df.select(id_col, vec_col).collect()
    except Exception:
        if force:
            raise
        return None
    if not force:
        est = sum(
            64 + (0 if r[1] is None else 8 * len(r[1])) for r in collected
        )
        if est > 4 * _LOCAL_TRAIN_MAX_BYTES:
            return None
    rows = [
        (r[0], None if r[1] is None else [float(x) for x in r[1]])
        for r in collected
    ]
    rows.sort(key=lambda t: (t[0] is not None, t[0]))
    return rows


def _assign_rows(vecs: "np.ndarray", cents, round_to: int) -> "np.ndarray":
    """Nearest-centroid index per row of ``vecs`` — the assign_clusters
    formula verbatim: cos = dot/(|v|·|c|) with zero-denominator → 0,
    rounded half-away BEFORE the argmax, ties to the lowest centroid
    index (first-occurrence argmax over ascending indices)."""
    idxs = np.array([int(ci) for ci, _ in cents])
    assert (np.diff(idxs) > 0).all()
    cm = np.stack([np.asarray(c, dtype=np.float64) for _, c in cents])
    den = np.outer(np.linalg.norm(vecs, axis=1),
                   np.linalg.norm(cm, axis=1))
    den[den == 0.0] = np.inf
    sim = round_half_away((vecs @ cm.T) / den, round_to)
    return idxs[np.argmax(sim, axis=1)]


def _kmeans_fit_rows(
    rows: list, k: int, iters: int, round_to: int,
) -> list[tuple[int, list[float]]]:
    """Driver-local twin of the distributed ``kmeans_fit`` body: same
    modal-width corpus definition (most frequent width, ties to the
    smaller), same k-lowest-id init, same assign→mean→round-6dp
    iteration, same drop-empty-keep-index centroid update."""
    vals = [(i, v) for i, v in rows if v is not None]
    if not vals:
        return []
    widths: dict[int, int] = {}
    for _, v in vals:
        widths[len(v)] = widths.get(len(v), 0) + 1
    top = max(widths.values())
    d_train = min(w for w, c in widths.items() if c == top)
    clean = [(i, v) for i, v in vals if len(v) == d_train]
    m = np.array([v for _, v in clean], dtype=np.float64)
    cents = [(ci, list(v)) for ci, (_, v) in enumerate(clean[:k])]
    for _ in range(iters):
        assigned = _assign_rows(m, cents, round_to)
        # Python round, not round_half_away: the distributed body rounds
        # the collected F.avg on the DRIVER with built-in round(), whose
        # half-to-even differs from F.round on exact binary ties (e.g.
        # 2^-7 at 6dp) — replicate its rounding rule bit-for-bit
        by_c: dict[int, list[float]] = {
            int(ci): [
                round(float(x), round_to)
                for x in m[assigned == ci].mean(axis=0)
            ]
            for ci in np.unique(assigned)
        }
        cents = sorted(by_c.items())
    return [(ci, v) for ci, v in cents]


def _pq_train_rows(
    rows: list, in_dim: int, m: int, k: int, iters: int, round_to: int,
) -> list[list[tuple[int, list[float]]]]:
    """Driver-local twin of the distributed ``pq_train`` body: same
    k-lowest-id init, same round-6dp squared-L2 argmin (ties to the
    lowest code), same per-(subspace, code, pos) rounded means. The
    caller guarantees a clean uniform-width corpus (the same assumption
    the distributed form makes — see ``ivfpq_train``'s dispatch)."""
    d = in_dim // m
    mat = np.array([v for _, v in rows], dtype=np.float64)
    books = [
        [(c, [float(x) for x in rows[c][1][j * d:(j + 1) * d]])
         for c in range(min(k, len(rows)))]
        for j in range(m)
    ]
    for _ in range(iters):
        new_books = []
        for j in range(m):
            sub = mat[:, j * d:(j + 1) * d]
            codes = np.array([int(c) for c, _ in books[j]])
            assert (np.diff(codes) > 0).all()
            cm = np.stack([np.asarray(cv, dtype=np.float64)
                           for _, cv in books[j]])
            dist = round_half_away(
                ((sub[:, None, :] - cm[None, :, :]) ** 2).sum(axis=2),
                round_to,
            )
            best = codes[np.argmin(dist, axis=1)]
            new_books.append(sorted(
                (int(c), [
                    float(round_half_away(np.float64(x), round_to))
                    for x in sub[best == c].mean(axis=0)
                ])
                for c in np.unique(best)
            ))
        books = new_books
    return books


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 1,
    round_to: int = 6,
) -> list[tuple[int, list[float]]]:
    """Lloyd's k-means over an embedding column, Spark-shaped.

    Deterministic init: the vectors of the ``k`` lowest ids (no RNG — the
    driver contract forbids nondeterminism, and seeded-random init is a
    one-line swap). Each iteration is (a) the no-shuffle
    ``assign_clusters`` projection against the current broadcast-literal
    centroids, then (b) ONE map-side-combinable shuffle of (cluster, pos)
    partial sums — posexplode → avg — whose result is k·dim scalars
    collected to the driver (the same driver-coordinated loop structure
    Spark MLlib's KMeans uses; the collect is bounded by k·dim, never by
    rows). Updated centroid components are rounded to ``round_to`` —
    the fixed-point contract that keeps every later cosine comparable
    across engines. Clusters that lose all members are dropped (their
    index simply disappears; survivors keep their original index).

    Returns the final [(cluster_index, centroid)] list — feed it back to
    ``assign_clusters`` for the final assignment, or to ``ann_ivf`` as a
    trained coarse quantizer.

    Stats-dispatched like the GEMM kernels: a planning-time-tiny corpus
    (≤ ``_LOCAL_TRAIN_MAX_BYTES``) collects once and iterates in NumPy
    on the driver — the loop's per-iteration state was ALREADY a driver
    collect, so this removes only scheduler latency, not a scale
    property; larger inputs run the distributed loop below unchanged."""
    v = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    local = _local_train_rows(v, "__id", "__v")
    if local is not None:
        return _kmeans_fit_rows(local, k=k, iters=iters, round_to=round_to)
    # corrupt rows (NULL embedding / off-width — assign_clusters gives
    # them NULL cluster) neither seed nor weight the means; the modal
    # width defines the corpus for training purposes
    widths = (v.filter(F.col("__v").isNotNull())
              .groupBy(F.size("__v").alias("__w"))
              .count().orderBy(F.desc("count"), F.asc("__w")).limit(1)
              .collect())
    if not widths:
        return []
    d_train = int(widths[0]["__w"])
    clean = v.filter(F.size("__v") == F.lit(d_train))
    init = clean.orderBy("__id").limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, list(r["__v"])) for i, r in enumerate(init)
    ]
    for _ in range(iters):
        a = assign_clusters(clean, cents, vec_col="__v", round_to=round_to)
        rows = (
            a.select("cluster", F.posexplode("__v"))
            .groupBy("cluster", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in rows:
            if r["cluster"] is None:
                continue
            by_c.setdefault(r["cluster"], {})[r["pos"]] = round(r["m"], round_to)
        cents = [
            (ci, [d[p] for p in range(len(d))]) for ci, d in sorted(by_c.items())
        ]
    return cents


def cosine_pairs_within(
    df: DataFrame,
    group_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int = 6,
    max_group: int = 8192,
) -> DataFrame:
    """Exact cosine pairs RESTRICTED to a grouping column, as per-group
    GEMMs: rows shuffle once keyed by ``group_col`` (volume O(n·dim) —
    vectors are never duplicated per candidate pair, which a pair-join
    formulation would do at O(pairs·dim), measured 16× slower at the
    10× probe), then each group computes its |g|×|g| similarity matrix
    in NumPy. The group structure (a k-means cell, an LSH bucket, a
    language) bounds the quadratic instead of the corpus.

    Skew guard (stats-dispatched, like the repo's other kernels): one
    task per group serializes a degenerate giant group, so when any
    group exceeds ``max_group`` rows every row is hash-assigned to one
    of B = ⌈|g|/max_group⌉ sub-blocks and replicated to its B block
    PAIRS (the classic triangle join) — |g|² work unchanged but spread
    over B(B+1)/2 tasks, per-task memory ≤ 2·max_group·dim. Same
    output set either way (parity-tested). Returns (id_a, id_b,
    cos_sim) with id_a < id_b."""
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, cos_sim double"
    # NULL groups (unassignable corrupt rows) and NULL vectors can't
    # pair — excluded here so the kernels never see them; width joins
    # the group key so mixed-width groups stack uniform matrices
    # (cross-width cosine is undefined; free on uniform corpora)
    sub = df.select(
        F.col(group_col).alias("__g"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    ).filter(
        F.col(group_col).isNotNull() & F.col(vec_col).isNotNull()
    ).withColumn("__w", F.size("__v"))

    def _emit(ids_a, va, ids_b, vb, triangular):
        import numpy as np
        import pandas as pd

        def unit(m):
            nrm = np.linalg.norm(m, axis=1)
            nrm[nrm == 0.0] = 1.0
            return m / nrm[:, None]

        ua, ub = unit(va), unit(vb)
        oa, ob, oc = [], [], []
        block = 4096
        for s in range(0, len(ua), block):
            e = min(s + block, len(ua))
            sim = round_half_away(ua[s:e] @ ub.T, round_to)
            for i in range(s, e):
                lo = i + 1 if triangular else 0
                j = np.nonzero(sim[i - s, lo:] >= threshold)[0] + lo
                if len(j):
                    oa.append(np.repeat(ids_a[i], len(j)))
                    ob.append(ids_b[j])
                    oc.append(sim[i - s, j])
        if not oa:
            return pd.DataFrame(
                {"id_a": ids_a[:0], "id_b": ids_a[:0],
                 "cos_sim": np.array([], dtype=np.float64)}
            )
        a = np.concatenate(oa)
        b = np.concatenate(ob)
        c = np.concatenate(oc)
        swap = b < a  # normalize to id_a < id_b (cross-block order is hash order)
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"id_a": a2, "id_b": b2, "cos_sim": c})

    def kernel(pdf):
        import numpy as np

        pdf = pdf.sort_values("__id", kind="mergesort")
        ids = pdf["__id"].to_numpy()
        m = np.stack(pdf["__v"].to_numpy())
        return _emit(ids, m, ids, m, triangular=True)

    biggest = (sub.groupBy("__g", "__w").count()
               .agg(F.max("count")).collect()[0][0])
    if biggest is None or biggest <= max_group:
        return sub.groupBy("__g", "__w").applyInPandas(kernel, out_schema)

    nb = F.ceil(F.col("__n") / F.lit(max_group)).cast("int")
    sizes = sub.groupBy("__g", "__w").agg(F.count(F.lit(1)).alias("__n"))
    blocked = (
        sub.join(F.broadcast(sizes), ["__g", "__w"])
        .withColumn("__nb", nb)
        .withColumn(
            "__p", F.pmod(F.xxhash64(F.col("__id")), F.col("__nb")).cast("int")
        )
        .withColumn(
            "__pair",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__nb") - 1),
                    lambda q: F.struct(
                        F.least(F.col("__p"), q).alias("i"),
                        F.greatest(F.col("__p"), q).alias("j"),
                    ),
                )
            ),
        )
        .select(
            "__g", "__w",
            F.col("__pair.i").alias("__i"), F.col("__pair.j").alias("__j"),
            "__id", "__v", "__p",
        )
    )

    def pair_kernel(key, pdf):
        import numpy as np

        i, j = key[-2], key[-1]  # key = (__g, __w, __i, __j)
        pdf = pdf.sort_values("__id", kind="mergesort")
        if i == j:
            ids = pdf["__id"].to_numpy()
            m = np.stack(pdf["__v"].to_numpy())
            return _emit(ids, m, ids, m, triangular=True)
        left = pdf[pdf["__p"] == i]
        right = pdf[pdf["__p"] == j]
        if len(left) == 0 or len(right) == 0:  # hash-empty block
            import pandas as pd

            empty = pdf["__id"].to_numpy()[:0]
            return pd.DataFrame(
                {"id_a": empty, "id_b": empty,
                 "cos_sim": np.array([], dtype=np.float64)}
            )
        return _emit(
            left["__id"].to_numpy(), np.stack(left["__v"].to_numpy()),
            right["__id"].to_numpy(), np.stack(right["__v"].to_numpy()),
            triangular=False,
        )

    return blocked.groupBy("__g", "__w", "__i", "__j").applyInPandas(
        pair_kernel, out_schema
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.9,
    round_to: int = 6,
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    k-means-cluster the embeddings, find near-duplicate pairs ONLY within
    each cluster, and keep one canonical member (the component-min id) per
    near-dup group. Clustering is what makes semantic dedup tractable at
    100 TB — the pairwise stage is Σ_cell |cell|², bounded by cluster
    occupancy (grow ``k`` with corpus size to keep cells O(1)-sized),
    never n².

    Pipeline: ``kmeans_fit`` (driver-coordinated Lloyd) →
    ``assign_clusters`` (no-shuffle projection) → ``cosine_pairs_within``
    (cluster-keyed self-join + vectorized verify) →
    ``connected_components`` → broadcast anti-join of the losers.
    Returns (id_col, cluster) for every kept row.

    ``cents`` short-circuits the clustering with pre-trained centroids
    (the train-once lifecycle — a pipeline that already clustered the
    corpus feeds the same centroids to every dependent stage)."""
    from griddb_spark.pipeline.dedup import _anti_join_losers, connected_components

    if cents is None:
        # clustering trains on the FULL corpus (duplicates weight the
        # means, as the oracle's k-means replay does)
        cents = kmeans_fit(df, id_col, vec_col, k=k, iters=iters,
                           round_to=round_to)
    # exact pre-collapse (see embed_dedup_stream): bitwise-identical
    # vectors fold to their min-id member before the within-cell
    # quadratic stage, bounding it by DISTINCT-vector occupancy.
    # Semantics-preserving ONLY for vectors whose identical copy would
    # actually verify as a near-dup (self_pairable): the winner has the
    # group's smallest id, so losers can never be the canonical
    # component-min, and their edges duplicate the winner's. Zero-norm
    # vectors (cos 0 by convention, < any positive threshold) and
    # NaN-containing vectors (sim NaN, never >= threshold) would NOT
    # pair with their own copies, so they pass through uncollapsed —
    # like NULL-id rows (which never pair, the anti-join keeps them).
    v = df.select(F.col(id_col), F.col(vec_col))
    # coalesce(False): a NULL embedding makes self_pairable NULL, and a
    # three-valued filter split (filter(p) ∪ filter(~p)) would silently
    # drop such rows from BOTH branches — corrupt rows must survive
    # (NULL cluster, no pairs), not vanish from the corpus
    foldable = F.coalesce(
        F.col(id_col).isNotNull() & self_pairable(
            F.col(vec_col), threshold),
        F.lit(False),
    )
    base = (
        v.filter(foldable)
        .groupBy(vec_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, vec_col)
        .unionByName(v.filter(~foldable))
    )
    a = assign_clusters(base, cents, vec_col=vec_col, round_to=round_to)
    pairs = cosine_pairs_within(
        a, "cluster", id_col, vec_col, threshold, round_to
    ).select("id_a", "id_b")
    comps = connected_components(pairs, src="id_a", dst="id_b")
    losers = comps.filter(F.col("component") < F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return _anti_join_losers(a.select(id_col, "cluster"), losers, id_col)


def prune_prototypes(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 1,
    keep_frac: float = 0.5,
    hardest: bool = True,
    round_to: int = 6,
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """Prototype-based data pruning (Sorscher et al. 2022,
    arXiv:2206.14486): cluster the embeddings, score every example by
    cosine similarity to its assigned centroid (the self-supervised
    prototype metric), and keep ``keep_frac`` of each cluster —
    ``hardest=True`` keeps the LOW-similarity tail (the
    beats-power-law-scaling choice for abundant data), ``hardest=False``
    keeps the prototypical core (the right choice for scarce data).

    Per-cluster quota, not a global cut — pruning must not collapse small
    clusters (the paper's class-balance concern). Cost: the k-means fit +
    one projection + ONE window shuffle keyed by cluster; ties broken by
    (score, id) so the keep-set is reproducible. Returns
    (id_col, cluster, proto_sim). ``cents`` short-circuits the
    clustering with pre-trained centroids (train-once lifecycle)."""
    from pyspark.sql import Window

    if cents is None:
        cents = kmeans_fit(df, id_col, vec_col, k=k, iters=iters,
                           round_to=round_to)
    a = assign_clusters(
        df.select(F.col(id_col), F.col(vec_col)), cents,
        vec_col=vec_col, round_to=round_to, score_col="proto_sim",
    )
    first = F.col("proto_sim").asc() if hardest else F.col("proto_sim").desc()
    w = Window.partitionBy("cluster").orderBy(first, F.col(id_col).asc())
    ranked = a.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy("cluster"))
    )
    return ranked.filter(
        F.col("__rn") <= F.ceil(F.lit(float(keep_frac)) * F.col("__cnt"))
    ).select(F.col(id_col), "cluster", "proto_sim")


def max_sim_vs_bench(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Per-corpus-item max cosine against a (small) benchmark set — the
    semantic-decontamination kernel.

    The bench side is collected and broadcast as one normalized f64
    matrix (bounded by contract: eval suites are tiny next to the
    corpus); each Arrow batch of corpus vectors runs ONE vectorized
    matmul and a row-max — no per-pair interpreted expression, no
    shuffle of the corpus at all (mapInPandas is a narrow stage over the
    scan). Measured 187 s → ~2 s on the 10x probe (48.8k x 1.2k pairs at
    dim 64) vs the zip_with fold.

    Returns ``(id, max_bench_sim)``.
    """
    import numpy as np
    import pandas as pd

    rows = bench.select(
        F.col(vec_col).cast("array<double>").alias("__bv")
    ).collect()
    dims = {len(r[0]) for r in rows if r[0] is not None}
    d_bench = max(dims) if dims else 0
    # NULL / off-width bench rows can't anchor a similarity — drop them
    rows = [r for r in rows if r[0] is not None and len(r[0]) == d_bench]
    if not rows:
        raise ValueError("bench set is empty")
    bm = np.stack([r[0] for r in rows])
    nb = np.linalg.norm(bm, axis=1, keepdims=True)
    bm = bm / np.where(nb == 0.0, 1.0, nb)
    bc = corpus.sparkSession.sparkContext.broadcast(bm.T.copy())

    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_t}, max_bench_sim double"

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf["__v"].to_numpy()
            # corrupt corpus rows (NULL / width ≠ bench width) get NULL
            # similarity — undefined vs the bench, and NULL >= threshold
            # is false so decontam callers keep them (np.stack would
            # otherwise crash on None or a ragged set)
            valid = np.fromiter(
                (r is not None and len(r) == d_bench for r in vals),
                dtype=bool, count=len(vals))
            sims = np.full(len(vals), None, dtype=object)
            if valid.any():
                m = np.stack([np.asarray(vals[i], dtype=np.float64)
                              for i in np.flatnonzero(valid)])
                nm = np.linalg.norm(m, axis=1, keepdims=True)
                m = m / np.where(nm == 0.0, 1.0, nm)
                sim = m @ bc.value
                sims[valid] = round_half_away(sim.max(axis=1), round_to)
            yield pd.DataFrame({
                id_col: pdf["__id"].to_numpy(),
                "max_bench_sim": sims,
            })

    para = corpus.sparkSession.sparkContext.defaultParallelism
    return (
        corpus.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
        )
        .repartition(para, "__id")
        .mapInPandas(gen, out_schema)
    )


def mean_pool_vectors(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    out_col: str = "pooled",
    round_to: "int | None" = None,
    assemble: bool = True,
) -> DataFrame:
    """Element-wise mean of vectors per group — the chunk→document
    embedding pooling step (embed chunks, average into one doc vector).

    posexplode → (group, pos) average → reassemble in position order:
    one shuffle keyed on (group, pos) with map-side partial averages, so
    the fan-out is rows×dim but the reduce width is groups×dim — the
    same shape as ``centroids_by`` (which pools by cell instead of doc).
    At 100 TB this beats any collect_list-then-average formulation by
    never materializing a group's vector list on one reducer.
    """
    pos = df.select(
        F.col(group_col), F.posexplode(F.col(vec_col).cast("array<double>"))
    )
    by_pos = pos.groupBy(group_col, "pos").agg(F.avg("col").alias("v"))
    if round_to is not None:
        by_pos = by_pos.withColumn("v", F.round(F.col("v"), round_to))
    if not assemble:
        # long format (group, pos, v): the exchange/audit-friendly shape —
        # scalar columns only, 0-based pos as long
        return by_pos.select(
            group_col, F.col("pos").cast("long").alias("pos"), "v"
        )
    return by_pos.groupBy(group_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))),
            lambda s: s["v"],
        ).alias(out_col)
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (sign matrix, deterministic)
# ---------------------------------------------------------------------------

def _rp_sign_seed(i: int, j: int) -> int:
    """±1 entry of the deterministic JL sign matrix at (row i [1-based],
    output dim j [0-based]) — parity of the first 8 md5 hex digits of
    ``"i_j"``, identical in Python, Spark SQL, and any ANSI engine."""
    import hashlib

    h = int(hashlib.md5(f"{i}_{j}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def rp_sign_table(spark, in_dim: int, out_dim: int) -> DataFrame:
    """(i, j, s) — the JL sign matrix as a tiny broadcastable DataFrame.
    The matrix is DERIVED (content-hash of the index pair), not sampled:
    every engine, executor, and rerun reconstructs the identical matrix
    with no seed to ship."""
    rows = spark.range(1, in_dim + 1).select(F.col("id").alias("i"))
    cols = spark.range(out_dim).select(F.col("id").alias("j"))
    pair = F.concat(F.col("i").cast("string"), F.lit("_"),
                    F.col("j").cast("string"))
    bucket = F.conv(F.substring(F.md5(pair), 1, 8), 16, 10).cast("bigint")
    return rows.crossJoin(cols).select(
        "i", "j",
        F.when(F.pmod(bucket, F.lit(2)) == 0, F.lit(1)).otherwise(F.lit(-1))
        .alias("s"),
    )


def random_project_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    out_dim: int = 16,
) -> DataFrame:
    """JL random projection, exact-arithmetic twin: long-format
    ``(id, j, comp)`` where ``comp = (Σ_i s_ij · q6(v_i)) / (1e6·√k)``.

    Components quantize to micro-ints first (``floor(x·1e6+0.5)`` — the
    repo's cross-engine float contract), so the inner sums are exact
    BIGINT math at any aggregation order, and the single final division
    is IEEE-exact-rounded — the DuckDB oracle hash-matches bit-for-bit.

    Shape at scale: posexplode (rows×dim) → broadcast sign join (fan-out
    ×out_dim) → one (id, j)-keyed sum with map-side combine. Use the GEMM
    form (:func:`random_project`) when the result feeds further Spark-side
    math and bit-parity with an external engine is not required.
    """
    import math as _math

    spark = df.sparkSession
    denom = 1_000_000.0 * _math.sqrt(out_dim)
    q = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * 1_000_000 + 0.5)
                .cast("bigint"),
            )
        ).alias("pos", "vq"),
    ).select(id_col, (F.col("pos") + 1).alias("i"), "vq")
    signs = rp_sign_table(spark, in_dim, out_dim)
    return (
        q.join(F.broadcast(signs), "i")
        .groupBy(id_col, "j")
        .agg((F.sum(F.col("vq") * F.col("s")) / F.lit(denom)).alias("comp"))
    )


def random_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    out_dim: int = 16,
    out_col: str = "rp",
) -> DataFrame:
    """JL random projection, production path: per-batch NumPy GEMM against
    the same derived ±1 sign matrix, scaled by 1/√k — dimensionality
    reduction ahead of clustering/LSH/ANN so downstream distance work
    costs O(k) not O(d) per pair (Achlioptas 2003 database-friendly
    projections; distances preserved within ±ε w.h.p.).

    In-row Arrow-batched matmul: no shuffle at all — the operator is a
    projection, partitioning survives, and each batch costs one
    (batch×d)·(d×k) GEMM. Agrees with :func:`random_project_exact` to
    ~1e-5 (the exact twin quantizes inputs to 1e-6 first).
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    smat = np.array(
        [[_rp_sign_seed(i, j) for j in range(out_dim)]
         for i in range(1, in_dim + 1)],
        dtype=np.float64,
    ) / np.sqrt(out_dim)

    def gemm(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.array([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            out = v @ smat
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: list(map(list, out))}
            )

    return df.select(id_col, vec_col).mapInPandas(
        gemm, schema=f"{id_col} {id_type}, {out_col} array<double>"
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — codebooks, encoding, ADC search
# ---------------------------------------------------------------------------

def _sq_l2(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² in double, element order (portable accumulation — the
    same left-to-right contract as :func:`dot`)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 1,
    round_to: int = 6,
) -> list[list[tuple[int, list[float]]]]:
    """Train product-quantization codebooks (Jégou et al. 2011): split the
    vector into ``m`` contiguous subspaces of ``in_dim/m`` dims and run an
    independent Lloyd's k-means (squared-L2, ``k`` codes) in each — a
    vector then compresses to ``m`` small codes (m·log2(k) bits vs
    32·in_dim), the standard memory layout for billion-scale ANN.

    Deterministic contract matching ``kmeans_fit``: init = subvectors of
    the ``k`` lowest ids; assignment = argmin of the 6dp-rounded squared
    L2 with ties to the lowest code; updated centroid components rounded
    to ``round_to``.

    Scale shape: ONE scan explodes every vector into (id, subspace,
    subvector) — all m subspaces train concurrently, not in m passes; the
    assignment is a broadcast join against the m·k-row codebook + one
    windowed argmin; the update is one map-side-combinable
    (subspace, code, pos) mean shuffle; the driver collect is bounded by
    m·k·(in_dim/m) = k·in_dim scalars. (At 100 TB codebooks are trained
    on a `deterministic_sample` of the corpus, as FAISS does — encoding,
    not training, is the full-data pass.)

    Returns ``codebooks[j] = [(code, centroid), …]`` for each subspace j.
    """
    if in_dim % m:
        raise ValueError(f"in_dim {in_dim} not divisible by m {m}")
    d = in_dim // m
    spark = df.sparkSession
    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    # driver-local dispatch (see kmeans_fit): only for a clean uniform
    # corpus — the distributed form's own implicit assumption (its init
    # slices vectors at in_dim unguarded)
    local = _local_train_rows(v, "__id", "__v")
    if local is not None and local and all(
        vv is not None and len(vv) == in_dim for _, vv in local
    ):
        return _pq_train_rows(local, in_dim, m=m, k=k, iters=iters,
                              round_to=round_to)
    sub = v.select(
        "__id",
        F.posexplode(
            F.array(*[F.slice("__v", j * d + 1, d) for j in range(m)])
        ).alias("__j", "__sv"),
    )
    init = v.orderBy("__id").limit(k).collect()
    books: list[list[tuple[int, list[float]]]] = [
        [(c, [float(x) for x in r["__v"][j * d : (j + 1) * d]])
         for c, r in enumerate(init)]
        for j in range(m)
    ]
    for _ in range(iters):
        book_rows = [
            (j, c, cv) for j in range(m) for c, cv in books[j]
        ]
        bdf = spark.createDataFrame(
            book_rows, "__j int, __c int, __cv array<double>"
        )
        # argmin per (vector, subspace) as min(struct(d, c)) — a map-side-
        # combinable aggregation, NOT a row_number window: the window form
        # sort-shuffles the full n·m·k joined fan-out on (__id, __j); this
        # combines to n·m rows before the exchange (measured 2.3× faster
        # at sf0.1 and the right shape at 100 TB). (d, c) is unique per
        # group, so struct-min == the oracle's ORDER BY d, c LIMIT 1.
        assigned = (
            sub.join(F.broadcast(bdf), "__j")
            .withColumn(
                "__d", F.round(_sq_l2(F.col("__sv"), F.col("__cv")), round_to)
            )
            .groupBy("__id", "__j")
            .agg(
                F.min(F.struct("__d", "__c")).alias("__best"),
                F.first("__sv").alias("__sv"),  # constant within the group
            )
            .select("__j", F.col("__best.__c").alias("__c"), "__sv")
        )
        means = (
            assigned.select("__j", "__c", F.posexplode("__sv"))
            .groupBy("__j", "__c", "pos")
            .agg(F.round(F.avg("col"), round_to).alias("__m"))
            .collect()
        )
        upd: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            upd.setdefault((r["__j"], r["__c"]), {})[r["pos"]] = r["__m"]
        books = [
            sorted(
                (
                    (c, [comp[p] for p in sorted(comp)])
                    for (j2, c), comp in upd.items()
                    if j2 == j
                ),
            )
            for j in range(m)
        ]
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[tuple[int, list[float]]]],
    round_to: int = 6,
    out_col: str = "codes",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Encode vectors to their PQ codes — a PURE PROJECTION against the
    broadcast-literal codebooks (no shuffle, no join; at 100 TB this is
    the full-data map stage that pipelines into the scan, writing m small
    ints per vector).

    Dispatch mirrors ``assign_clusters``: per-subspace argmin as JVM
    higher-order expressions for small codebooks; one Arrow-batched NumPy
    distance kernel above ``_ASSIGN_JVM_MAX_K`` codes (identical 6dp
    rounding + lowest-code tie-break; parity pinned in tests). The GEMM
    kernel also wins on INPUT VOLUME regardless of k: the HOF argmin is
    interpreted (not codegen'd) at ~m·k·(dim/m) boxed ops per row —
    measured ~8 ms/row at m=4,k=8, i.e. minutes per million rows, where
    the vectorized kernel is milliseconds per Arrow batch — so inputs
    whose planning-time size exceeds ``_GEMM_MIN_BYTES``
    stats-dispatch to the kernel too (the JVM form stays for small
    inputs, where Python-worker spin-up dominates).

    ``keep_cols`` pass through unchanged — so an upstream projection
    (e.g. the coarse ``assign_clusters`` cell) rides along instead of
    being re-joined on ``id_col`` afterwards: encode-with-passthrough
    keeps the whole IVF-PQ build a single shuffle-free map stage where
    the encode-then-join form pays an id-keyed exchange of the corpus.

    Returns ``(id_col, *keep_cols, out_col array<int>)``.
    """
    m = len(codebooks)
    d = len(codebooks[0][0][1])
    k = max(len(b) for b in codebooks)
    keep_cols = list(keep_cols or [])
    id_type = df.schema[id_col].dataType.simpleString()
    if k > _ASSIGN_JVM_MAX_K or _plan_size_bytes(df) > _GEMM_MIN_BYTES:
        mats = [
            np.stack([np.asarray(cv, dtype=np.float64) for _, cv in b])
            for b in codebooks
        ]
        code_ids = [np.array([int(c) for c, _ in b]) for b in codebooks]
        for ids in code_ids:
            assert (np.diff(ids) > 0).all()

        def kern(batches):
            width = m * d
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vals = pdf[vec_col].to_numpy()
                # corrupt rows (NULL / shorter than the codebook width)
                # encode to NULL codes — they pass through the pipeline
                # but are never ADC-retrievable, matching the JVM path's
                # when() guard; np.stack would otherwise crash on None
                # or a ragged set. Wider vectors encode their first
                # m·d dims (the slice the JVM path takes).
                valid = np.fromiter(
                    (r is not None and len(r) >= width for r in vals),
                    dtype=bool, count=len(vals))
                out = {id_col: pdf[id_col]}
                for c in keep_cols:
                    out[c] = pdf[c]
                codes_out: list = [None] * len(vals)
                if valid.any():
                    vi = np.flatnonzero(valid)
                    x = np.stack([
                        np.asarray(vals[i], dtype=np.float64)[:width]
                        for i in vi
                    ])
                    cols = []
                    for j in range(m):
                        xs = x[:, j * d : (j + 1) * d]
                        diff = xs[:, None, :] - mats[j][None, :, :]
                        d2 = round_half_away(
                            np.einsum("abk,abk->ab", diff, diff), round_to)
                        cols.append(code_ids[j][np.argmin(d2, axis=1)])
                    codes = np.stack(cols, axis=1)
                    for i, row in zip(vi, codes):
                        codes_out[i] = list(map(int, row))
                out[out_col] = codes_out
                yield pd.DataFrame(out)

        keep_schema = "".join(
            f", {c} {df.schema[c].dataType.simpleString()}"
            for c in keep_cols
        )
        return df.select(id_col, *keep_cols, vec_col).mapInPandas(
            kern,
            schema=f"{id_col} {id_type}{keep_schema}, {out_col} array<int>",
        )

    v = F.col(vec_col).cast("array<double>")
    per_sub = []
    for j, book in enumerate(codebooks):
        sv = F.slice(v, j * d + 1, d)
        structs = [
            F.struct(
                F.round(
                    _sq_l2(sv, F.array(*[F.lit(float(x)) for x in cv])),
                    round_to,
                ).alias("d"),
                F.lit(int(c)).cast("int").alias("c"),
            )
            for c, cv in book
        ]
        per_sub.append(F.array_min(F.array(*structs))["c"])
    # corrupt rows (NULL / shorter than the codebook width) encode to
    # NULL codes — same contract as the GEMM path; wider vectors encode
    # their first m·d dims via the slice above
    valid = v.isNotNull() & (F.size(v) >= F.lit(m * d))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.when(valid, F.array(*per_sub)).alias(out_col),
    )


def _adc_dist_col(
    codebooks: list[list[tuple[int, list[float]]]],
    qv: list[float],
    codes_col: str,
    round_to: int,
) -> Column:
    """The per-document ADC distance Column for ONE query: each
    (subspace, code) LUT entry is computed driver-side, HALF_UP-rounded
    (matching F.round / SQL round, not Python's HALF_EVEN) and fixed as
    DECIMAL(18,6) so the m-term sum is exact at any evaluation order."""
    from decimal import ROUND_HALF_UP, Decimal

    d = len(codebooks[0][0][1])
    quantum = Decimal(1).scaleb(-round_to)
    luts = []
    for j, book in enumerate(codebooks):
        qs = [float(x) for x in qv[j * d : (j + 1) * d]]
        lut = {
            c: float(
                Decimal(
                    repr(sum((a - b) * (a - b) for a, b in zip(qs, cv)))
                ).quantize(quantum, ROUND_HALF_UP)
            )
            for c, cv in book
        }
        dense = [lut.get(c, float("inf")) for c in range(max(lut) + 1)]
        luts.append(
            F.element_at(
                F.array(*[F.lit(x).cast("decimal(18,6)") for x in dense]),
                F.element_at(F.col(codes_col), j + 1) + 1,
            )
        )
    return sum(luts[1:], luts[0]).cast("double")


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    queries: list[tuple[int, list[float]]],
    topk: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    round_to: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: for each query the
    per-(subspace, code) squared-L2 lookup table is computed ONCE on the
    driver (m·k scalars), and every doc's approximate distance is m table
    lookups + a sum — never a touch of the raw vectors. The compressed-
    domain scan that makes billion-vector search RAM-resident.

    Each LUT entry is rounded and fixed as DECIMAL(18,6) so the m-term
    sum is exact at any evaluation order (the engine-portability contract
    the oracle replays); the final top-k is a TakeOrdered with id
    tie-break, never a full sort.

    Returns ``(q_id, id_col, adc_dist, rn)`` with rn = 1..topk.
    """
    from pyspark.sql import Window

    from griddb_spark.perfstages import stage

    if len(queries) > 1:
        # this fans into one plan branch per query: materialize the
        # caller's codes ONCE so the (possibly pandas-UDF) encode never
        # re-executes per branch — the same hazard ivfpq_topk fixed
        # (AQE exchange reuse proved unreliable across N branches;
        # BASELINE.md §Round-10). Compressed codes only — m small ints
        # per row.
        with stage("encode"):
            codes = codes.localCheckpoint(eager=True)
    id_type = codes.schema[id_col].dataType
    per_q = []
    for q_id, qv in queries:
        adc = _adc_dist_col(codebooks, qv, codes_col, round_to)
        per_q.append(
            codes.select(
                F.lit(q_id).cast(id_type).alias("q_id"),
                F.col(id_col),
                adc.alias("adc_dist"),
            )
        )
    allq = per_q[0]
    for p in per_q[1:]:
        allq = allq.unionAll(p)
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        allq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
    )


def ivfpq_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    coarse_k: int = 8,
    m: int = 4,
    k: int = 8,
    round_to: int = 6,
    cents: list[tuple[int, list[float]]] | None = None,
    books: list[list[tuple[int, list[float]]]] | None = None,
    local: bool | None = None,
) -> dict:
    """Train the IVF-PQ quantizers ONCE and hand back a driver-side
    artifact every serving path accepts (``trained=`` on
    :func:`ivfpq_topk` / :func:`ivfpq_topk_batch` /
    :func:`ivfpq_index_write`) — the FAISS lifecycle: ``train()`` is a
    one-time build step, ``add()``/``search()`` are the recurring ones,
    and retraining per query batch would be a bug, not a feature.

    The artifact is bounded driver state (k-means cents = coarse_k·dim,
    cell means = ≤coarse_k·dim, PQ codebooks = k·in_dim scalars — never
    corpus-sized) and is JSON-serializable: it is exactly the
    ``_ivfpq_meta.json`` sidecar :func:`ivfpq_index_write` persists, plus
    the ``cents`` the coarse assignment uses at build/encode time.

    Training is fully deterministic (fixed lowest-id init, 6dp-rounded
    updates — the kmeans_fit/pq_train contracts), so reusing an artifact
    is bit-identical to retraining on unchanged data. ``cents`` /
    ``books`` accept pre-trained pieces (FAISS's pre-trained coarse
    quantizer shape) and skip the corresponding training pass.

    ``local=True`` forces the driver-local trainer (see kmeans_fit's
    dispatch) for inputs whose boundedness the caller proves by
    construction; ``None`` auto-dispatches on the planning-time size
    estimate; ``False`` pins the distributed path. The local path runs
    ONE collect for all three passes (coarse k-means, cell means, PQ)
    and requires a clean uniform-width corpus — ragged inputs fall back."""
    v = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    rows = (
        _local_train_rows(v, "__id", "__v", force=local is True)
        if local in (None, True) else None
    )
    if rows is not None and rows and all(
        vv is not None and len(vv) == in_dim for _, vv in rows
    ):
        if cents is None:
            cents = _kmeans_fit_rows(rows, k=coarse_k, iters=1,
                                     round_to=round_to)
        mat = np.array([vv for _, vv in rows], dtype=np.float64)
        acell = _assign_rows(mat, cents, round_to)
        # centroids_by collects UNROUNDED means; consumers re-round
        # after the cosine, so the ≤1e-15 accumulation-order delta vs
        # F.avg is absorbed exactly as partition-order variation is
        cellmeans_rows = [
            (int(ci), [float(x) for x in mat[acell == ci].mean(axis=0)])
            for ci in np.unique(acell)
        ]
        if books is None:
            books = _pq_train_rows(rows, in_dim, m=m, k=k, iters=1,
                                   round_to=round_to)
        return {
            "in_dim": in_dim,
            "m": m,
            "k": k,
            "round_to": round_to,
            "id_col": id_col,
            "id_type": df.schema[id_col].dataType.simpleString(),
            "cents": [(int(c), [float(x) for x in cv]) for c, cv in cents],
            "cellmeans": cellmeans_rows,
            "codebooks": [
                [(int(c), [float(x) for x in cv]) for c, cv in book]
                for book in books
            ],
        }
    if cents is None:
        cents = kmeans_fit(df, id_col, vec_col, k=coarse_k, iters=1,
                           round_to=round_to)
    assigned = assign_clusters(df, cents, vec_col=vec_col,
                               round_to=round_to)
    cellmeans = centroids_by(assigned, "cluster", vec_col)
    if books is None:
        books = pq_train(df, id_col, vec_col, in_dim, m=m, k=k, iters=1,
                         round_to=round_to)
    return {
        "in_dim": in_dim,
        "m": m,
        "k": k,
        "round_to": round_to,
        "id_col": id_col,
        # lets index readers pass the full schema instead of running a
        # footer-reading inference job over every index file
        "id_type": df.schema[id_col].dataType.simpleString(),
        "cents": [(int(c), [float(x) for x in v]) for c, v in cents],
        # sorted: collect order is partition order (nondeterministic on
        # a cluster), and downstream consumers feed cellmeans into
        # assign_clusters, whose tie-break contract REQUIRES ascending
        # cell indices (the local trainer already sorts — r14 forced-
        # distributed probe caught the mismatch)
        "cellmeans": sorted(
            (int(r["__cell"]), [float(x) for x in r["__centroid"]])
            for r in cellmeans.collect()
        ),
        "codebooks": [
            [(int(c), [float(x) for x in cv]) for c, cv in book]
            for book in books
        ],
    }


def _ivfpq_encoded(
    df: DataFrame, id_col: str, vec_col: str, trained: dict,
) -> DataFrame:
    """(id, cluster, codes) for the corpus under a trained artifact —
    ONE shuffle-free map stage: coarse assignment is a projection
    (assign_clusters) and the PQ encode passes the cell through
    (pq_encode keep_cols) instead of re-joining the corpus with itself
    on id_col, which paid a full id-keyed exchange.

    Callers that feed the result into further joins MUST put a lineage
    boundary above it (the topk paths all eagerly localCheckpoint; the
    index_write path needs none — it feeds a cell-keyed exchange into a
    write, no join above the encode):
    without one, Catalyst pushes the join's null-check and the explode's
    emptiness predicate BELOW the encode projection, duplicating the
    interpreted per-subspace argmin expressions into per-row filters and
    re-running the coarse-assign pandas UDF twice (measured 17x on the
    100x probe). The checkpointed blocks are tiny — id + cell + m small
    ints, the same volume the persisted index writes."""
    assigned = assign_clusters(
        df, [(int(c), v) for c, v in trained["cents"]], vec_col=vec_col,
        round_to=trained["round_to"],
    )
    books = [[(int(c), cv) for c, cv in b] for b in trained["codebooks"]]
    return pq_encode(assigned, id_col, vec_col, books,
                     round_to=trained["round_to"], keep_cols=["cluster"])


def _cellmeans_df(spark, trained: dict) -> DataFrame:
    return spark.createDataFrame(
        [(int(c), v) for c, v in trained["cellmeans"]],
        "__cell int, __centroid array<double>",
    )


def ivfpq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    queries: list[tuple[int, list[float]]],
    coarse_k: int = 8,
    m: int = 4,
    k: int = 8,
    nprobe: int = 2,
    topk: int = 5,
    round_to: int = 6,
    trained: dict | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ — the standard billion-scale ANN index (FAISS's IVFx,PQy):
    a trained coarse quantizer routes each query to its ``nprobe``
    nearest cells, and candidates are scored in the COMPRESSED domain by
    PQ-ADC — so a query touches nprobe/coarse_k of the corpus and reads
    m bytes per candidate instead of the raw vector.

    Composition of the repo's gated pieces under their shared
    deterministic contracts: ``kmeans_fit`` + ``assign_clusters`` (coarse
    cells), per-cell mean centroids ranked by 6dp-rounded cosine with
    cell-id tie-break (the ``ann_ivf`` probe contract), ``pq_train`` +
    ``pq_encode`` (codes), and the exact-decimal ADC LUT sum
    (``_adc_dist_col``). Self-matches are excluded, mirroring
    ``ann_ivf``.

    At scale the encoded corpus is written Hive-partitioned by cell so a
    probe is a partition-pruned scan of nprobe cells; the per-query cell
    routing collects only nprobe·|queries| (cell, query) pairs to the
    driver — bounded by the query batch, never the corpus.

    Returns ``(q_id, id_col, adc_dist, rn)`` with rn = 1..topk.

    ``codes=`` accepts the pre-encoded corpus (the ``_ivfpq_encoded``
    shape: id + cluster + codes) so a session that serves many query
    batches encodes ONCE — the FAISS add()-once lifecycle. It requires
    the ``trained=`` artifact that produced it; mixing codes from one
    artifact with quantizers from another would silently diverge.
    """
    from pyspark.sql import Window

    if codes is not None and trained is None:
        raise ValueError("codes= requires the trained= artifact that "
                         "encoded them (quantizer/codes mismatch hazard)")
    if trained is None:
        trained = ivfpq_train(df, id_col, vec_col, in_dim,
                              coarse_k=coarse_k, m=m, k=k,
                              round_to=round_to)
    else:
        # the artifact is authoritative: a trained quantizer fixes the
        # precision/codebook geometry — mixing a different round_to/m/k
        # parameter would silently diverge from the self-trained result
        # (mirrors ivfpq_topk_batch so the two forms can never disagree
        # on geometry if m/k are ever referenced below)
        round_to = trained["round_to"]
        m, k, in_dim = trained["m"], trained["k"], trained["in_dim"]
    books = [[(int(c), cv) for c, cv in b] for b in trained["codebooks"]]
    # EAGER materialization, not just an exchange barrier: this form
    # fans out into one plan branch PER QUERY below, and relying on AQE
    # ReusedExchange to share the encode across N branches proved
    # unreliable under load — identically-ordered repeats on the 100×
    # corpus swung 5-48 s with the swing isolated to re-executed Arrow
    # encode work, while a checkpointed encode repeats at a stable
    # 2.5-5 s (scripts/probe_ann_stage_variance.json + BASELINE.md
    # §Round-10). The stored blocks are the COMPRESSED codes (id + cell
    # + m small ints — the same volume the persisted index writes), not
    # raw vectors; the on-disk index (ivfpq_index_topk) remains the
    # 100 TB serve path.
    from griddb_spark.perfstages import stage

    if codes is None:
        with stage("encode"):
            # no cell_exchange here: the checkpoint truncates lineage,
            # so the pushdown hazard the exchange guarded against cannot
            # reach the encode projection, and the extra shuffle only
            # added another pandas-UDF-feeding stage to pay for
            codes = _ivfpq_encoded(df, id_col, vec_col, trained)\
                .localCheckpoint(eager=True)
    spark = df.sparkSession
    cellmeans = _cellmeans_df(spark, trained)
    q_rows = [(int(q_id), [float(x) for x in qv]) for q_id, qv in queries]
    q_df = spark.createDataFrame(q_rows, "q_id long, qv array<double>")
    qc = q_df.crossJoin(F.broadcast(cellmeans)).select(
        "q_id", "__cell",
        F.round(cosine(F.col("qv"), F.col("__centroid")), round_to)
        .alias("__cc"),
    )
    w_cell = Window.partitionBy("q_id").orderBy(
        F.col("__cc").desc(), F.col("__cell").asc()
    )
    from griddb_spark.perfstages import stage

    with stage("probe_route"):
        probes = (
            qc.withColumn("__pr", F.row_number().over(w_cell))
            .filter(F.col("__pr") <= nprobe)
            .select("q_id", "__cell")
            .collect()  # bounded: nprobe rows per query
        )
    probed: dict[int, list[int]] = {}
    for r in probes:
        probed.setdefault(r["q_id"], []).append(r["__cell"])
    id_type = codes.schema[id_col].dataType
    per_q = []
    for q_id, qv in q_rows:
        adc = _adc_dist_col(books, qv, "codes", round_to)
        per_q.append(
            codes.filter(F.col("cluster").isin(probed[q_id]))
            .filter(F.col(id_col) != q_id)
            .select(
                F.lit(q_id).cast(id_type).alias("q_id"),
                F.col(id_col),
                adc.alias("adc_dist"),
            )
        )
    allq = per_q[0]
    for p in per_q[1:]:
        allq = allq.unionAll(p)
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        allq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
    )


def adc_lut_df(
    queries: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
    round_to: int = 6,
) -> DataFrame:
    """The (q_id, subspace, code, distance) ADC lookup table as a
    DataFrame — the batch-serving twin of :func:`_adc_dist_col`.

    The loop path computes each LUT entry driver-side with Python Decimal
    HALF_UP; here the identical value comes from JVM column algebra:
    ``_sq_l2`` accumulates in element order (same IEEE result as the
    Python sum), ``F.round`` is HALF_UP on the shortest-repr BigDecimal
    (same convention as ``Decimal(repr(x)).quantize``), and the entry is
    fixed as DECIMAL(18,6) so downstream sums are exact at any evaluation
    order. |queries|·m·k rows — broadcast-sized for any realistic batch.
    """
    spark = queries.sparkSession
    m = len(codebooks)
    d = len(codebooks[0][0][1])
    book_rows = [
        (j, c, [float(x) for x in cv])
        for j in range(m)
        for c, cv in codebooks[j]
    ]
    bdf = spark.createDataFrame(book_rows, "__j int, __c int, __cv array<double>")
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
    )
    sv = F.slice(F.col("__qv"), F.col("__j") * F.lit(d) + F.lit(1), d)
    return q.join(F.broadcast(bdf)).select(
        "q_id", "__j", "__c",
        F.round(_sq_l2(sv, F.col("__cv")), round_to)
        .cast("decimal(18,6)").alias("__ld"),
    )


#: Above this many (q_id, subspace, code) LUT rows the per-executor
#: broadcast copy stops being free (the LUT grows as m·k·|queries| — fine
#: at serving batch sizes, ~10⁶-query batches would ship a multi-GB table
#: to every executor). Past the bound the ADC join switches to a shuffle
#: hash join co-partitioned on (q_id, subspace, code) — both sides large,
#: one exchange each, no driver-side collect. Same stats-dispatch pattern
#: as dedup's union-find small-edges bound.
ADC_LUT_BROADCAST_MAX_ROWS = 2_000_000


def _adc_topk_from_codes(
    cand: DataFrame,
    lut: DataFrame,
    id_col: str,
    codes_col: str,
    topk: int,
    lut_rows: "int | None" = None,
) -> DataFrame:
    """Shared batch-ADC tail: explode candidate codes, join the LUT on
    (q_id, subspace, code), sum exactly in decimal, window top-k.
    ONE join tree for the whole query batch — no per-query plan branches
    (`cand` must carry ``q_id``). The LUT side broadcasts below
    :data:`ADC_LUT_BROADCAST_MAX_ROWS` (``lut_rows``, driver-known as
    |queries|·m·k) and shuffle-hash-joins above it — values identical
    either way (plan-pinned in tests)."""
    from pyspark.sql import Window

    ex = cand.select(
        "q_id", id_col, F.posexplode(codes_col).alias("__j", "__c")
    )
    if lut_rows is not None and lut_rows > ADC_LUT_BROADCAST_MAX_ROWS:
        lut_side = lut.hint("shuffle_hash")
    else:
        lut_side = F.broadcast(lut)
    adc = (
        ex.join(lut_side, ["q_id", "__j", "__c"])
        .groupBy("q_id", id_col)
        .agg(F.sum("__ld").cast("double").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist"), F.col(id_col))
    return (
        adc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
    )


def pq_adc_topk_batch(
    codes: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    queries: DataFrame,
    topk: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
    round_to: int = 6,
) -> DataFrame:
    """Batch-serving ADC top-k: ``queries`` is a DataFrame, the LUT is a
    broadcast join, and the whole batch is ONE plan — where
    :func:`pq_adc_topk` (the TQL-style point-probe form) builds a plan
    branch per query and folds them with unionAll, which is O(|queries|)
    driver-built branches: correct at 3 queries, wrong at 10⁴.

    Results are bit-identical to the loop path: both sum the same
    DECIMAL(18,6) LUT entries (see :func:`adc_lut_df`).
    """
    n_q = queries.count()  # one tiny job over the query batch
    lut = adc_lut_df(queries, codebooks, q_id_col, q_vec_col, round_to)
    cand = codes.join(
        F.broadcast(queries.select(F.col(q_id_col).alias("q_id")))
    )
    return _adc_topk_from_codes(
        cand, lut, id_col, codes_col, topk,
        lut_rows=n_q * len(codebooks) * len(codebooks[0]),
    )


def ivfpq_probe_plan(
    codes: DataFrame,
    queries: DataFrame,
    trained: dict,
    id_col: str,
    nprobe_max: int = 2,
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
) -> dict:
    """The nprobe-independent prefix of a batch IVF-PQ serve, computed
    ONCE for a multi-nprobe sweep (the recall-vs-nprobe tuning loop):
    ranked candidate rows up to ``nprobe_max`` (each carrying its
    probe rank ``__pr``), the ADC LUT, and the batch size. A candidate
    set at probe rank <= n is BY CONSTRUCTION the nprobe=n candidate
    set — the rank window orders identically (cosine desc, cell asc) —
    so ``ivfpq_topk_batch(probe_plan=...)`` serving any nprobe <=
    nprobe_max filters the shared scan instead of re-joining the corpus
    per point, while still running its own real LUT join + exact
    decimal ADC + top-k per point. Both shared frames are eagerly
    checkpointed: bounded rows (candidates: nprobe_max cells per query;
    LUT: |queries|·m·k), one materialization for every sweep point.
    """
    from pyspark.sql import Window

    m, k = trained["m"], trained["k"]
    round_to = trained["round_to"]
    cellmeans = _cellmeans_df(queries.sparkSession, trained)
    q_df = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
    )
    qc = q_df.join(F.broadcast(cellmeans)).select(
        "q_id", "__qv", "__cell",
        F.round(cosine(F.col("__qv"), F.col("__centroid")), round_to)
        .alias("__cc"),
    )
    w_cell = Window.partitionBy("q_id").orderBy(
        F.col("__cc").desc(), F.col("__cell").asc()
    )
    probes = (
        qc.withColumn("__pr", F.row_number().over(w_cell))
        .filter(F.col("__pr") <= nprobe_max)
        .select("q_id", F.col("__cell").alias("cluster"), "__pr")
    )
    from griddb_spark.perfstages import stage

    with stage("ann_size"):
        n_q = q_df.count()
    probe_side = (F.broadcast(probes)
                  if n_q * nprobe_max <= ADC_LUT_BROADCAST_MAX_ROWS
                  else probes.hint("shuffle_hash"))
    with stage("probe_plan"):
        cand = (
            codes.join(probe_side, "cluster")
            .filter(F.col(id_col) != F.col("q_id"))
            .localCheckpoint(eager=True)
        )
        lut = adc_lut_df(q_df, [
            [(int(c), cv) for c, cv in b] for b in trained["codebooks"]
        ], "q_id", "__qv", round_to).localCheckpoint(eager=True)
    return {
        "trained": trained,
        "id_col": id_col,
        "nprobe_max": nprobe_max,
        "cand": cand,
        "lut": lut,
        "n_q": n_q,
        "m": m,
        "k": k,
    }


def ivfpq_topk_batch(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    queries: DataFrame,
    coarse_k: int = 8,
    m: int = 4,
    k: int = 8,
    nprobe: int = 2,
    topk: int = 5,
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
    round_to: int = 6,
    trained: dict | None = None,
    codes: DataFrame | None = None,
    probe_plan: dict | None = None,
) -> DataFrame:
    """IVF-PQ with a DataFrame of queries: probed-cell routing and ADC as
    cell-keyed joins — the batch-retrieval formulation (one join tree for
    any batch size), vs :func:`ivfpq_topk`'s per-query plan branches
    (the point-probe contract). Same deterministic contracts, identical
    results to the loop path for the same inputs.

    Plan shape: queries × (broadcast) cell-means → windowed nprobe
    routing → broadcast (q_id, cell) probe join against the encoded
    corpus (at scale: Hive-partitioned by cell, so this is a
    partition-pruned scan) → broadcast LUT join → exact decimal sum →
    per-query top-k window. Corpus-side cost is candidates·m LUT rows,
    never |queries| plan branches.

    ``codes=`` accepts the pre-encoded corpus (see :func:`ivfpq_topk`)
    so repeated batches against an unchanged corpus skip the encode.
    ``probe_plan=`` accepts :func:`ivfpq_probe_plan`'s shared routing
    prefix for multi-nprobe sweeps — the candidate scan and LUT are
    filtered/reused instead of rebuilt, everything downstream (the real
    per-point ADC join + top-k) runs unchanged.
    """
    from pyspark.sql import Window

    if probe_plan is not None:
        if trained is not None and trained is not probe_plan["trained"]:
            raise ValueError("probe_plan= was built under a different "
                             "trained= artifact (codes/plan mismatch)")
        if id_col != probe_plan["id_col"]:
            raise ValueError(f"probe_plan id_col {probe_plan['id_col']!r}"
                             f" != {id_col!r}")
        if nprobe > probe_plan["nprobe_max"]:
            raise ValueError(f"nprobe={nprobe} exceeds the plan's "
                             f"nprobe_max={probe_plan['nprobe_max']}")
        trained = probe_plan["trained"]
        m, k = trained["m"], trained["k"]
        cand = (
            probe_plan["cand"]
            .filter(F.col("__pr") <= nprobe)
            .drop("__pr")
        )
        return _adc_topk_from_codes(
            cand, probe_plan["lut"], id_col, "codes", topk,
            lut_rows=probe_plan["n_q"] * m * k,
        )
    if codes is not None and trained is None:
        raise ValueError("codes= requires the trained= artifact that "
                         "encoded them (quantizer/codes mismatch hazard)")
    if trained is None:
        trained = ivfpq_train(df, id_col, vec_col, in_dim,
                              coarse_k=coarse_k, m=m, k=k,
                              round_to=round_to)
    else:
        round_to = trained["round_to"]  # the artifact is authoritative
        m, k, in_dim = trained["m"], trained["k"], trained["in_dim"]
    books = [[(int(c), cv) for c, cv in b] for b in trained["codebooks"]]
    from griddb_spark.perfstages import stage

    # EAGER materialization of the compressed codes, mirroring the
    # per-query path (ivfpq_topk) and the serve path (ivfpq_index_topk):
    # the checkpoint truncates lineage (so the pushdown hazard
    # cell_exchange guarded against cannot reach the encode projection —
    # see _ivfpq_encoded), pins the Arrow encode to run EXACTLY once
    # regardless of how AQE re-plans the downstream join tree, and gives
    # the bench a named encode stage so this gate's wall is attributable
    # (it drifted 2.5× on the r10 driver bench with no stage map —
    # VERDICT r10 item 5). Stored blocks are id + cell + m small ints.
    if codes is None:
        with stage("encode"):
            codes = _ivfpq_encoded(df, id_col, vec_col, trained)\
                .localCheckpoint(eager=True)
    cellmeans = _cellmeans_df(df.sparkSession, trained)
    q_df = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
    )
    qc = q_df.join(F.broadcast(cellmeans)).select(
        "q_id", "__qv", "__cell",
        F.round(cosine(F.col("__qv"), F.col("__centroid")), round_to)
        .alias("__cc"),
    )
    w_cell = Window.partitionBy("q_id").orderBy(
        F.col("__cc").desc(), F.col("__cell").asc()
    )
    probes = (
        qc.withColumn("__pr", F.row_number().over(w_cell))
        .filter(F.col("__pr") <= nprobe)
        .select("q_id", F.col("__cell").alias("cluster"))
    )
    with stage("ann_size"):
        n_q = q_df.count()  # one tiny job over the query batch
    lut = adc_lut_df(q_df, books, "q_id", "__qv", round_to)
    probe_side = (F.broadcast(probes)
                  if n_q * nprobe <= ADC_LUT_BROADCAST_MAX_ROWS
                  else probes.hint("shuffle_hash"))
    cand = codes.join(probe_side, "cluster").filter(
        F.col(id_col) != F.col("q_id")
    )
    return _adc_topk_from_codes(cand, lut, id_col, "codes", topk,
                                lut_rows=n_q * m * k)


def ivfpq_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    coarse_k: int = 8,
    m: int = 4,
    k: int = 8,
    round_to: int = 6,
    trained: dict | None = None,
    codes: DataFrame | None = None,
) -> dict:
    """Build and PERSIST an IVF-PQ index: the encoded corpus lands on
    disk Hive-partitioned by coarse cell, so every later probe is a
    partition-pruned scan of ``nprobe`` cell directories — the layout
    that makes billion-vector serving a bounded read instead of a full
    pass (FAISS's on-disk IVF shape, expressed as a parquet dataset).

    Train (coarse k-means + PQ codebooks) happens once here — or arrives
    pre-trained via ``trained=`` (:func:`ivfpq_train`); the quantizers
    are written as a JSON sidecar (``_ivfpq_meta.json`` — k·in_dim +
    m·k·(in_dim/m) scalars) that any session can reload without touching
    the data. Encode is the projection-only ``pq_encode`` path with the
    cell passed through (no corpus self-join). Returns the sidecar dict.
    """
    import json
    import os

    if codes is not None and trained is None:
        raise ValueError("codes= requires the trained= artifact that "
                         "encoded them (quantizer/codes mismatch hazard)")
    if trained is None:
        trained = ivfpq_train(df, id_col, vec_col, in_dim,
                              coarse_k=coarse_k, m=m, k=k,
                              round_to=round_to)
    if codes is None:
        codes = _ivfpq_encoded(df, id_col, vec_col, trained)
    # one file per cell: cluster by the partition column before the
    # dynamic-partition write (leaf-clustering, as DmlTable._write).
    # Cell count comes from the artifact, not the coarse_k parameter —
    # a pre-trained quantizer may carry a different k (and may have
    # dropped empty cells).
    from griddb_spark.perfstages import stage

    # write-task count: one task per cell up to the core count (a
    # literal cap would under-parallelize a many-cell index on a big
    # cluster and over-parallelize a lower-core driver run)
    n_cells = max(1, min(
        len(trained["cellmeans"]),
        df.sparkSession.sparkContext.defaultParallelism,
    ))
    with stage("index_write"):
        codes.repartition(n_cells, F.col("cluster")).write.mode(
            "overwrite"
        ).partitionBy("cluster").parquet(path)
    meta = {k2: v for k2, v in trained.items() if k2 != "cents"}
    meta["appends"] = 0  # compaction counter, see ivfpq_index_append
    with open(os.path.join(path, "_ivfpq_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivfpq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    nprobe: int = 2,
    topk: int = 5,
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
) -> DataFrame:
    """Serve a query batch from a persisted IVF-PQ index
    (:func:`ivfpq_index_write`): quantizers reload from the sidecar,
    probed cells route as a broadcast (q_id, cluster) join, and the
    index scan carries ``cluster IN (probed cells)`` — a PARTITION
    filter on the Hive layout, so only the probed cell directories are
    read (plan-tested). ADC and top-k are the shared batch formulation
    (:func:`_adc_topk_from_codes`) — one join tree for any batch size,
    results identical to the in-memory ``ivfpq_topk_batch``.

    Concurrency contract (single WRITER, many readers): appends/
    compactions come from one process at a time (the
    :func:`ivfpq_index_append` lockfile protects its swap from reader-
    side recovery, not writer vs writer). The returned DataFrame is
    LAZY and pins the file listing taken here — forcing it after a
    compaction swapped the directory underneath raises a
    file-not-found from the scan (posix rename is atomic per path, not
    per listing). Defined behavior: re-invoke ``ivfpq_index_topk`` —
    the fresh listing serves the identical rows, since compaction
    rewrites layout, never content (pinned by
    test_ivfpq_index_read_across_compaction_swap). Force (or collect)
    promptly; don't hold serve DataFrames across ingest cycles.
    """
    import json
    import os

    from pyspark.sql import Window

    _ivfpq_recover(path)  # finish any compaction swap a crash cut short
    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    round_to = meta["round_to"]
    books = [[(int(c), cv) for c, cv in book] for book in meta["codebooks"]]
    cellmeans = spark.createDataFrame(
        [(c, v) for c, v in meta["cellmeans"]],
        "__cell int, __centroid array<double>",
    )
    q_df = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).cast("array<double>").alias("__qv"),
    )
    qc = q_df.join(F.broadcast(cellmeans)).select(
        "q_id", "__qv", "__cell",
        F.round(cosine(F.col("__qv"), F.col("__centroid")), round_to)
        .alias("__cc"),
    )
    w_cell = Window.partitionBy("q_id").orderBy(
        F.col("__cc").desc(), F.col("__cell").asc()
    )
    from griddb_spark.perfstages import stage

    with stage("probe_route"):
        probes = (
            qc.withColumn("__pr", F.row_number().over(w_cell))
            .filter(F.col("__pr") <= nprobe)
            .select("q_id", F.col("__cell").alias("cluster"))
            .localCheckpoint(eager=True)  # bounded: nprobe × |queries|
        )
        probe_cells = [int(r["cluster"]) for r in
                       probes.select("cluster").distinct().collect()]
    reader = spark.read
    if "id_type" in meta:  # skip the footer schema-inference job
        reader = reader.schema(
            f"{id_col} {meta['id_type']}, codes array<int>, cluster int"
        )
    idx = reader.parquet(path).filter(
        F.col("cluster").isin(probe_cells)  # partition-pruned read
    )
    # batch size from the already-checkpointed probes (no extra pass over
    # the possibly expensively-derived queries lineage); ceil-division is
    # exact when every query routes to nprobe cells and a safe
    # overestimate when the index has fewer cells than nprobe
    n_probe_rows = probes.count()
    n_q = max(1, -(-n_probe_rows // nprobe))
    lut = adc_lut_df(q_df, books, "q_id", "__qv", round_to)
    m, k = meta["m"], meta["k"]
    probe_side = (F.broadcast(probes)
                  if n_probe_rows <= ADC_LUT_BROADCAST_MAX_ROWS
                  else probes.hint("shuffle_hash"))
    cand = idx.join(probe_side, "cluster").filter(
        F.col(id_col) != F.col("q_id")
    )
    return _adc_topk_from_codes(cand, lut, id_col, "codes", topk,
                                lut_rows=n_q * m * k)


#: Persisted-index compaction trigger, the exact analog of the streaming
#: sign-cell index's bound (stream_ops._COMPACT_APPENDS): every
#: :func:`ivfpq_index_append` adds up to one small file per touched cell,
#: so a long-lived served index taking steady ingest grows listing/open
#: cost without bound even though probes stay partition-pruned. The
#: appends-since-last-rewrite counter in ``_ivfpq_meta.json`` caps
#: files-per-cell at ~bound+1 with an O(1) trigger decision (no directory
#: listing — on object stores the listing IS the cost being bounded).
#: Module-level so tests can shrink it to force compactions.
_IVFPQ_COMPACT_APPENDS = 64


def _ivfpq_meta_update(path: str, meta: dict) -> None:
    """Atomically replace the index sidecar (write-temp + rename, so a
    reader never sees a torn JSON)."""
    import json
    import os

    tmp = os.path.join(path, "_ivfpq_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, "_ivfpq_meta.json"))


#: A compaction lockfile (``<path>.__lock``) younger than this marks a
#: LIVE writer: recovery (which rmtree's/renames the writer's working
#: dirs) must not run from another process until it ages out. The writer
#: HEARTBEATS the lock (utime every third of this age) for the whole
#: corpus-proportional side rewrite (ADVICE r12: the rewrite can far
#: exceed any fixed age at production scale, and the original
#: touch-once-at-start scheme let a reader see a stale lock plus a live
#: index and rmtree the side dir mid-write) — so a stale lock now always
#: means a DEAD writer, recovery at age-out is safe everywhere, and
#: after a SIGKILL the index stays unreadable for at most this long
#: before any read/append path completes the recovery.
_IVFPQ_LOCK_MAX_AGE_SEC = 300.0


def _ivfpq_lock_fresh(path: str) -> bool:
    import os
    import time

    try:
        age = time.time() - os.path.getmtime(path + ".__lock")
    except OSError:
        return False
    return age < _IVFPQ_LOCK_MAX_AGE_SEC


def _ivfpq_recover(path: str) -> None:
    """Complete or roll back a compaction swap a crash cut short, before
    any read/append touches the index (mirrors the streaming index's
    ``_index_meta_read`` crash handling). The swap sequence is: side dir
    written (its ``_ivfpq_meta.json`` LAST — presence marks it complete)
    → ``rename(path, old)`` → ``rename(side, path)`` → ``rmtree(old)``.

    - fresh lockfile → a LIVE writer owns the dirs (ADVICE r11): do
      NOTHING — destructive recovery from a reader process while the
      writer is mid-compaction would delete the side dir it is still
      writing or roll forward a half-swapped state under it. The writer
      heartbeats the lock for the entire rewrite (ADVICE r12 — a slow
      rewrite must not let the lock go stale under it), so a stale lock
      always means a DEAD writer and ages out
      (``_IVFPQ_LOCK_MAX_AGE_SEC``), after which the next touch
      recovers as below and sweeps the dead lock itself;
    - live index present → swap finished or never started: remove stale
      side/old leftovers (and a dead writer's aged-out lockfile);
    - no live index, complete side dir → ROLL FORWARD (the side dir
      becomes the index);
    - no live index, old present → ROLL BACK (restore the pre-compaction
      layout; its counter still sits at the bound, so the next append
      re-triggers).
    """
    import os
    import shutil

    if _ivfpq_lock_fresh(path):
        return
    side, old = path + ".__compact", path + ".__old"
    if os.path.isfile(os.path.join(path, "_ivfpq_meta.json")):
        for d in (side, old):
            if os.path.isdir(d):
                shutil.rmtree(d)
        try:  # a dead writer's aged-out lock: sweep so state fully resets
            os.remove(path + ".__lock")
        except OSError:
            pass
        return
    if os.path.isfile(os.path.join(side, "_ivfpq_meta.json")):
        os.rename(side, path)  # roll forward
        if os.path.isdir(old):
            shutil.rmtree(old)
        return
    if os.path.isdir(old):
        if os.path.isdir(side):  # incomplete side dir: discard
            shutil.rmtree(side)
        os.rename(old, path)  # roll back


def ivfpq_index_append(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a persisted IVF-PQ index WITHOUT retraining:
    the sidecar quantizers assign + encode the arrivals (projection-only,
    no shuffle beyond the partitioned write) and the rows land in their
    cell directories — the ingest-time shape where the index grows with
    the corpus and probes stay partition-pruned. Quantizer drift is the
    operator's call (FAISS semantics: retrain when the distribution
    moves; the sidecar makes either choice explicit).

    Each append adds at most one file per touched cell, so the sidecar
    counts appends and, at ``_IVFPQ_COMPACT_APPENDS``, rewrites the index
    to one file per cell through a side directory + atomic directory
    swap (``_ivfpq_recover`` closes the crash windows) — the same
    files-per-cell bound the streaming sign-cell index enforces
    (stream_ops._COMPACT_APPENDS). Amortized rewrite cost is
    corpus/bound bytes per append; probe reads open ≤ bound+1 files per
    probed cell forever.
    """
    import json
    import os
    import shutil

    from griddb_spark.perfstages import stage

    _ivfpq_recover(path)
    with open(os.path.join(path, "_ivfpq_meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    books = [[(int(c), cv) for c, cv in book] for book in meta["codebooks"]]
    cents = [(int(c), v) for c, v in meta["cellmeans"]]
    assigned = assign_clusters(df, cents, vec_col=vec_col,
                               out_col="cluster")
    codes = pq_encode(df, id_col, vec_col, books,
                      round_to=meta["round_to"]).join(
        assigned.select(F.col(id_col), F.col("cluster")), id_col
    )
    n_cells = max(1, min(
        len(cents), df.sparkSession.sparkContext.defaultParallelism))
    with stage("index_append"):
        codes.repartition(n_cells, F.col("cluster")).write.mode(
            "append").partitionBy("cluster").parquet(path)
    # counter BEFORE any compaction: a crash mid-swap rolls back to a
    # layout whose counter already sits at the bound, so the next append
    # re-triggers instead of silently losing the rewrite
    meta["appends"] = int(meta.get("appends", 0)) + 1
    _ivfpq_meta_update(path, meta)
    if meta["appends"] < _IVFPQ_COMPACT_APPENDS:
        return
    with stage("index_compact"):
        import threading

        spark = df.sparkSession
        side, old = path + ".__compact", path + ".__old"
        # lock BEFORE touching shared dirs: a concurrent reader's
        # _ivfpq_recover must see a live writer and stand down (it would
        # otherwise rmtree the side dir mid-write or roll a half-swapped
        # state — ADVICE r11). A heartbeat thread re-touches the lock
        # for the whole rewrite (ADVICE r12: the corpus-proportional
        # side write can far outlive any fixed freshness age — with the
        # original touch-once scheme a reader would see a stale lock
        # plus a live index after 300 s and destroy the side dir under
        # the writer). Removed in the finally; a SIGKILL stops the
        # heartbeat with the process, so the lock goes stale and ages
        # out (_IVFPQ_LOCK_MAX_AGE_SEC) for the next toucher to sweep.
        lock = path + ".__lock"
        with open(lock, "w") as f:
            f.write(str(os.getpid()))
        hb_stop = threading.Event()

        def _heartbeat() -> None:
            while not hb_stop.wait(_IVFPQ_LOCK_MAX_AGE_SEC / 3.0):
                try:
                    os.utime(lock)
                except OSError:
                    return  # lock swept (writer done/crashed-and-recovered)

        hb = threading.Thread(target=_heartbeat, daemon=True)
        hb.start()
        try:
            if os.path.isdir(side):
                shutil.rmtree(side)
            reader = spark.read
            if "id_type" in meta:
                reader = reader.schema(
                    f"{id_col} {meta['id_type']}, codes array<int>, "
                    "cluster int")
            (reader.parquet(path)
             .repartition(n_cells, F.col("cluster"))
             .write.mode("overwrite").partitionBy("cluster").parquet(side))
            # re-arm freshness BEFORE the side dir becomes "complete"
            # (ADVICE r12 low): touching it after the meta write left a
            # microsecond window where a reader could see a stale lock
            # plus a complete side dir and roll it forward under the
            # writer mid-rename. With the heartbeat this is ordering
            # hygiene, not the only protection.
            os.utime(lock)
            _ivfpq_meta_update(side, {**meta, "appends": 0})  # complete
            os.rename(path, old)
            os.rename(side, path)
            shutil.rmtree(old)
        finally:
            hb_stop.set()
            try:
                os.remove(lock)
            except OSError:
                pass

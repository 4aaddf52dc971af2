"""Bounded-state sketches for corpus profiling at 100 TB.

At training-pipeline scale the common profiling questions — "how many
distinct users/documents per slice?", "where is the p95 of this score?" —
cannot be answered by exact DISTINCT or exact percentile without a shuffle
whose width tracks the *cardinality of the data*. The sketch forms here cap
the shuffle at a fixed register/bucket budget per group, are mergeable
(map-side partial aggregation does most of the work), and stay pure JVM
column expressions.

Two deliberate design choices:

1. **Deterministic hashing.** The distinct sketch hashes with a Knuth
   multiplicative hash (``key * 2654435761 mod 2^32``) instead of Spark's
   ``xxhash64`` so the identical arithmetic can be written in any ANSI SQL
   engine — the DuckDB oracle replays the exact same register math and the
   result hash-matches bit-for-bit. Estimator quality for the tested
   integer keys is equivalent.
2. **Two distinct-count regimes.** Linear counting (Whang et al. 1990)
   is exact-SQL-portable and accurate while n ≲ m·ln m, but its register
   budget must track the cardinality — the wrong trade at 100 TB. True
   HyperLogLog (Flajolet et al. 2007) keeps relative error ~1.04/√m at
   ANY cardinality with a fixed 2^p registers; its leading-zero rank IS
   portable SQL (``length(bin(suffix))`` — both Spark and DuckDB strip
   leading zeros in ``bin``), and the estimator's arithmetic (sums of
   exact powers of two, one multiply, one divide) is IEEE-exact, so the
   oracle hash-matches bit-for-bit. ``linear_counting_distinct`` stays as
   the small-range tool; ``hll_distinct`` is the scale path.

Reference tie-in: GridDB has no sketch surface (its DISTINCT aggregation is
exact, ``OP_GROUP_DISTINCT``, sql_operator_group.h:71-73); these are
beyond-reference operators in the same family as the dedup/similarity
pipeline ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Knuth's multiplicative constant (golden-ratio scaled to 2^32).
_KNUTH = 2654435761
_M32 = 4294967296


def _int_hash(col) -> F.Column:
    """Deterministic 32-bit multiplicative hash of an integer column.

    ``(key * 2654435761) mod 2^32``. The masked 32-bit key times the
    constant can exceed 2^63, so the multiply is split 16/16:
    ``k = hi·2^16 + lo``; only ``(hi·A) mod 2^16`` survives the final
    mod 2^32, keeping every intermediate below 2^48 — exact BIGINT
    arithmetic in any engine, ANSI-overflow-safe (the oracle twin casts
    to HUGEINT instead; both compute the identical value).
    """
    c = F.col(col) if isinstance(col, str) else col
    k = F.pmod(c.cast("bigint"), F.lit(_M32))
    lo = F.pmod(k, F.lit(65536))
    hi = (k / F.lit(65536)).cast("bigint")  # k>=0 → trunc == floor
    return F.pmod(
        F.pmod(lo * F.lit(_KNUTH), F.lit(_M32))
        + F.pmod(hi * F.lit(_KNUTH), F.lit(65536)) * F.lit(65536),
        F.lit(_M32),
    )


def register_col(col, m: int) -> F.Column:
    """The sketch register an integer key hashes into (0..m-1) — shared by
    the batch and streaming linear-counting forms so their results merge."""
    return F.pmod(_int_hash(col), F.lit(m))


def lc_estimate(n_registers, m: int) -> F.Column:
    """Linear-counting estimate from a register hit-count column: NULL at
    saturation, else ``-m * ln(1 - hits/m)`` rounded to 6 decimals."""
    hits = F.col(n_registers) if isinstance(n_registers, str) else n_registers
    frac = hits.cast("double") / F.lit(float(m))
    return F.when(
        hits < m, F.round(-F.lit(float(m)) * F.log(F.lit(1.0) - frac), 6)
    )


def linear_counting_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    m: int = 4096,
) -> DataFrame:
    """Distinct-count sketch: per group, hash keys into ``m`` registers and
    estimate cardinality from the register hit-rate.

    Shape at scale: stage 1 dedups ``(group, register)`` — a shuffle whose
    width is bounded by ``m`` rows per group *regardless of key
    cardinality* (map-side partial dedup collapses most traffic before the
    exchange); stage 2 is a tiny count per group. Compare exact
    ``COUNT(DISTINCT key)``, whose shuffle carries every distinct key.

    Returns ``group_cols + (n_registers, est_distinct)`` where
    ``est_distinct = -m * ln(1 - n_registers/m)`` rounded to 6 decimals,
    NULL when the sketch saturated (every register hit).
    """
    g = list(group_cols)
    reg = register_col(key_col, m).alias("__reg")
    hits = (
        df.select(*g, reg)
        .groupBy(*g, "__reg")
        .agg(F.lit(1).alias("__one"))
        .groupBy(*g)
        .agg(F.count(F.lit(1)).alias("n_registers"))
    )
    return hits.select(
        *g, "n_registers", lc_estimate("n_registers", m).alias("est_distinct")
    )


def histogram_quantile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float],
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> DataFrame:
    """Quantile sketch: fixed-width histogram over ``[lo, hi)`` with
    ``n_buckets`` buckets; a quantile estimate is the upper edge of the
    first bucket whose cumulative count reaches ``q * n``.

    This is the portable-SQL member of the t-digest/KLL family: per-group
    state is capped at ``n_buckets`` counts, partial counts merge by
    addition (map-side combine does the heavy lifting), and the final
    per-group cumulative walk is a window over ≤ ``n_buckets`` rows.
    Estimate error is bounded by one bucket width; out-of-range values
    clamp into the edge buckets.

    Pick ``(hi - lo) / n_buckets`` as a power of two when possible: bucket
    assignment is then exact halving in IEEE arithmetic, bit-identical in
    every engine.

    Returns ``group_cols + (n_rows, q_<label> ...)`` with one column per
    requested quantile (label = quantile with the dot stripped, e.g.
    ``q_50``, ``q_95`` for 0.50/0.95), rounded to 6 decimals.
    """
    counts = histogram_counts(df, group_cols, value_col, lo, hi, n_buckets)
    return quantiles_from_counts(counts, group_cols, quantiles, lo, hi,
                                 n_buckets)


def histogram_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> DataFrame:
    """The MERGEABLE sketch state behind :func:`histogram_quantile`:
    ``group_cols + (__bucket, __n)``. Partials from different shards,
    days, or groups merge by plain addition (:func:`merge_histograms`) —
    store these per shard and any rollup quantile is sketch math, never
    a rescan."""
    g = list(group_cols)
    w = (hi - lo) / float(n_buckets)
    v = F.col(value_col).cast("double")
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(w)).cast("int")),
    ).alias("__bucket")
    return df.select(*g, bucket).groupBy(*g, "__bucket").agg(
        F.count(F.lit(1)).alias("__n"))


def merge_histograms(
    counts: DataFrame, out_group_cols: Sequence[str]
) -> DataFrame:
    """Merge histogram partials down to ``out_group_cols`` (possibly
    empty → one global sketch) by bucket-wise addition."""
    g = list(out_group_cols)
    return counts.groupBy(*g, "__bucket").agg(F.sum("__n").alias("__n"))


def quantiles_from_counts(
    counts: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    lo: float,
    hi: float,
    n_buckets: int = 256,
) -> DataFrame:
    """Finish quantile estimates from (possibly merged) histogram state —
    the shared read path of the batch sketch and any shard/stream rollup."""
    g = list(group_cols)
    w = (hi - lo) / float(n_buckets)
    from pyspark.sql import Window

    pw = Window.partitionBy(*g).orderBy("__bucket")
    tot = Window.partitionBy(*g)
    cum = counts.select(
        *g,
        "__bucket",
        F.sum("__n").over(pw).alias("__cum"),
        F.sum("__n").over(tot).alias("__tot"),
    )
    aggs = [F.max("__tot").alias("n_rows")]
    seen_labels = set()
    for q in quantiles:
        if not 0.0 < q < 1.0:
            raise ValueError(f"quantile must be in (0, 1), got {q}")
        # label from the full decimal expansion: 0.5 -> q_50, 0.999 ->
        # q_999 — f'{q:.2f}' silently rounded 3-decimal quantiles (0.999
        # -> 'q_00', 0.995 collided with 0.99)
        dec = format(q, "f").rstrip("0").split(".")[1]
        label = "q_" + (dec if len(dec) >= 2 else dec.ljust(2, "0"))
        if label in seen_labels:
            raise ValueError(f"duplicate quantile label {label!r} for q={q}")
        seen_labels.add(label)
        edge = F.lit(lo) + (F.col("__bucket") + F.lit(1)).cast("double") * F.lit(w)
        aggs.append(
            F.round(
                F.min(
                    F.when(
                        F.col("__cum").cast("double")
                        >= F.lit(q) * F.col("__tot").cast("double"),
                        edge,
                    )
                ),
                6,
            ).alias(label)
        )
    return cum.groupBy(*g).agg(*aggs)


def hll_register_cols(key_col, p: int) -> tuple[F.Column, F.Column]:
    """``(idx, rho)`` register columns of a key under the shared HLL
    contract — used by the batch sketch and the streaming sketch so their
    registers merge (register-wise max) across the two worlds."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    m = 1 << p
    suffix_bits = 32 - p
    h = _int_hash(key_col)
    suffix = F.floor(h / F.lit(m)).cast("bigint")
    rho = F.when(suffix == 0, F.lit(suffix_bits + 1)).otherwise(
        F.lit(suffix_bits + 1) - F.length(F.bin(suffix))
    )
    return F.pmod(h, F.lit(m)), rho


def hll_alpha(m: int) -> float:
    """Flajolet bias-correction constant for m registers."""
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: Sequence[str], p: int, mj_col: str = "__mj"
) -> DataFrame:
    """Finish the raw Flajolet estimator from materialized ``(group…,
    idx, mj)`` register rows — the merge/read path shared by the batch
    sketch and batch-side reads of the streaming sketch."""
    m = 1 << p
    g = list(group_cols)
    summed = regs.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col(mj_col))).alias("__s_present"),
    )
    z = (F.lit(m) - F.col("n_registers")).cast("double") + F.col("__s_present")
    raw = F.lit(hll_alpha(m)) * F.lit(float(m * m)) / z
    return summed.select(*g, "n_registers", raw.alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    p: int = 10,
    correct: bool = False,
) -> DataFrame:
    """HyperLogLog distinct-count sketch: fixed ``m = 2^p`` registers per
    group, relative error ~1.04/sqrt(m) at ANY key cardinality.

    The 100 TB member of the distinct family: unlike
    ``linear_counting_distinct`` (whose m must track n), the register
    budget here is constant, the stage-1 exchange carries at most m rows
    per group after map-side ``max`` combine, and sketches over disjoint
    shards merge by register-wise max.

    Register math (Flajolet et al. 2007), all in exact BIGINT / IEEE
    arithmetic so any ANSI engine replays it bit-for-bit:

    - ``h``     = 32-bit Knuth hash of the key
    - ``idx``   = ``h mod m``; ``suffix = h div m``  (32-p bits)
    - ``rho``   = leading-zero rank of the suffix
                  = ``(32-p) - length(bin(suffix)) + 1`` (``bin`` has no
                  leading zeros in Spark and DuckDB alike), ``33-p`` for 0
    - ``M_j``   = per-register max rho
    - raw est   = ``alpha_m * m^2 / (Z_absent + sum(2^-M_j))`` where
                  absent registers contribute ``2^-0 = 1`` each. Every
                  ``2^-M_j`` is an exact power of two and the full sum
                  spans < 53 mantissa bits, so the double sum is EXACT and
                  order-independent — no decimal detour needed.

    ``correct=True`` additionally applies the standard small-range switch
    (linear counting when raw <= 2.5m and empty registers exist). That
    branch evaluates ``ln`` — correctly-rounded in practice but not
    guaranteed bit-identical across libm implementations — so oracle-gated
    callers keep the raw estimator and the correction is unit-tested for
    accuracy instead.

    Returns ``group_cols + (n_registers, est_distinct)``.
    """
    m = 1 << p
    g = list(group_cols)
    idx, rho = hll_register_cols(key_col, p)
    regs = (
        df.select(*g, idx.alias("__idx"), rho.alias("__rho"))
        .groupBy(*g, "__idx")
        .agg(F.max("__rho").alias("__mj"))
    )
    out = hll_estimate_from_registers(regs, g, p)
    if correct:
        raw = F.col("est_distinct")
        v = F.lit(m) - F.col("n_registers")
        est = F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
        ).otherwise(raw)
        return out.select(*g, "n_registers", est.alias("est_distinct"))
    return out


def hll_oracle_sql(
    table: str, group_cols: Sequence[str], key_col: str, p: int = 10
) -> str:
    """The ANSI-SQL replay of ``hll_distinct`` (raw estimator) — shared by
    the driver oracle and the parity tests so the register math can never
    drift between the two."""
    m = 1 << p
    sb = 32 - p
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    g = ", ".join(group_cols)
    return f"""
    WITH h AS (
      SELECT {g}, ((({key_col} % {_M32})::HUGEINT * {_KNUTH}) % {_M32})::BIGINT AS h
      FROM {table}),
    r AS (
      SELECT {g}, h % {m} AS idx,
             CASE WHEN h // {m} = 0 THEN {sb + 1}
                  ELSE {sb + 1} - length(bin(h // {m})) END AS rho
      FROM h),
    mx AS (SELECT {g}, idx, max(rho) AS mj FROM r GROUP BY ALL),
    s AS (SELECT {g}, count(*) AS n_registers,
                 sum(power(2.0, -mj)) AS s_present
          FROM mx GROUP BY ALL)
    SELECT {g}, n_registers,
           CAST({alpha!r} AS DOUBLE) * CAST({m * m} AS DOUBLE)
             / (CAST({m} - n_registers AS DOUBLE) + s_present) AS est_distinct
    FROM s
    """


#: Second multiplicative constant (xxhash prime 2) for double hashing.
_KNUTH2 = 2246822519
_M31 = 2147483648


def _double_hash_pos(col, d: int, width: int) -> F.Column:
    """Register position of ``col`` under the ``d``-th count-min hash.

    Kirsch-Mitzenmacher double hashing: ``(h1 + d * h2) mod width`` with
    two independent multiplicative hashes simulates d pairwise-independent
    functions. The key is masked to 31 bits before each multiply so every
    product stays below 2^63 — exact BIGINT arithmetic in any engine, so
    the DuckDB oracle replays it bit-for-bit. ``h2`` is forced odd to stay
    nonzero mod the (power-of-two) width.
    """
    c = F.col(col) if isinstance(col, str) else col
    k31 = F.pmod(c.cast("bigint"), F.lit(_M31))
    h1 = F.pmod(k31 * F.lit(_KNUTH), F.lit(_M32))
    h2 = F.pmod(k31 * F.lit(_KNUTH2), F.lit(_M32))
    h2o = h2 - F.pmod(h2, F.lit(2)) + F.lit(1)
    return F.pmod(h1 + F.lit(d) * h2o, F.lit(width))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min sketch of a key column: ``depth x width`` counters.

    Returns ``(d, pos, cnt)`` — at most ``depth * width`` rows no matter
    the key cardinality. The explode fans each row into ``depth`` register
    updates; the groupBy is map-side combinable, so the exchange carries
    at most ``depth * width`` partial counters per task (the bounded-state
    frequency analog of ``linear_counting_distinct``). Sketches over
    disjoint data merge by adding counters.
    """
    rows = F.explode(
        F.array(*[
            F.struct(
                F.lit(d).alias("d"),
                _double_hash_pos(key_col, d, width).alias("pos"),
            )
            for d in range(depth)
        ])
    ).alias("__r")
    return (
        df.select(rows)
        .groupBy(F.col("__r.d").alias("d"), F.col("__r.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point frequency estimates from a count-min sketch.

    ``keys`` is the (small) query set; each key reads its ``depth``
    registers and takes the min — the classic CMS upper-bound estimate
    (overcounts on collisions, never undercounts). The sketch is tiny
    (``depth * width`` rows) so the join broadcasts it; the query side
    never shuffles. Registers no key hashed into are absent from the
    sketch rows and read as 0.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"),
                    _double_hash_pos(key_col, d, width).alias("pos"),
                )
                for d in range(depth)
            ])
        ).alias("__p"),
    ).select(key_col, F.col("__p.d").alias("d"), F.col("__p.pos").alias("pos"))
    return (
        probes.join(F.broadcast(sketch), ["d", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


def kmv_distinct(
    df: DataFrame, group_cols: Sequence[str], key_col: str, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002; the theta
    sketch's base form): per group keep the ``k`` smallest distinct key
    hashes; the k-th smallest pins the estimate ``(k-1) · 2^32 / h_k``.

    Complements :func:`hll_distinct` where the SKETCH ITSELF must support
    set algebra downstream (union = k smallest of merged sketches,
    intersection via inclusion-exclusion on the union sketch —
    :func:`kmv_set_ops`); HLL only unions. State per group is k hashes —
    bounded through the exchange at any corpus size, and the distinct +
    rank pipeline map-side-combines on (group, hash).

    Below ``k`` distinct keys the sketch is the exact value set and the
    exact count is reported. All math is integer + one IEEE division —
    the oracle replays it bit-for-bit.

    Returns ``group_cols + (n_kept, est_distinct)``.
    """
    from pyspark.sql import Window

    g = list(group_cols)
    w = Window.partitionBy(*g).orderBy("__h")
    ranked = (
        df.select(*g, _int_hash(key_col).alias("__h"))
        .distinct()
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
    )
    return ranked.groupBy(*g).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise(
            F.lit(float(k - 1)) * F.lit(float(_M32)) / F.max("__h")
        )
        .alias("est_distinct"),
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    key_col: str,
    group_a: str,
    group_b: str,
    k: int = 64,
) -> DataFrame:
    """Distinct-set algebra between two groups from their KMV sketches
    only: |A|, |B|, |A∪B| from the merged sketch, |A∩B| via the standard
    theta-sketch ratio (fraction of the union sketch's k survivors seen in
    both sides, scaled by the union estimate), and Jaccard.

    This is what KMV buys over HLL: at 100 TB, per-source document-id
    sketches (k hashes each) flow to the driver and ANY pairwise overlap /
    Jaccard matrix is computable sketch-side — no re-scan, no pairwise
    joins over raw data. Arithmetic is integer + IEEE divisions in a fixed
    order, so the SQL oracle hash-matches.

    Returns one row: ``(est_a, est_b, est_union, est_intersect,
    jaccard)``.
    """
    from pyspark.sql import Window

    sub = df.filter(F.col(group_col).isin(group_a, group_b))
    per = (
        sub.select(F.col(group_col).alias("__g"),
                   _int_hash(key_col).alias("__h"))
        .distinct()
        .withColumn(
            "__rk",
            F.row_number().over(Window.partitionBy("__g").orderBy("__h")),
        )
        .filter(F.col("__rk") <= k)
    )
    # merged candidate pool with membership flags (sketch-only from here)
    pool = per.groupBy("__h").agg(
        F.max((F.col("__g") == group_a).cast("int")).alias("__ina"),
        F.max((F.col("__g") == group_b).cast("int")).alias("__inb"),
    )
    upool = pool.withColumn(
        "__rk", F.row_number().over(Window.partitionBy().orderBy("__h"))
    ).filter(F.col("__rk") <= k)
    est = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(_M32)) / F.max("__h"))
    u = upool.agg(
        est.alias("est_union"),
        F.count(F.lit(1)).alias("__nk"),
        F.sum(F.col("__ina") * F.col("__inb")).alias("__both"),
    )
    a = per.filter(F.col("__g") == group_a).agg(est.alias("est_a"))
    b = per.filter(F.col("__g") == group_b).agg(est.alias("est_b"))
    out = a.crossJoin(b).crossJoin(u)
    inter = (
        F.col("__both").cast("double") / F.col("__nk").cast("double")
    ) * F.col("est_union")
    return out.select(
        "est_a",
        "est_b",
        "est_union",
        inter.alias("est_intersect"),
        (inter / F.col("est_union")).alias("jaccard"),
    )

"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-dependent *per partition layout*: the same row can
be kept on one cluster run and dropped on the next when file splits change,
which breaks dataset reproducibility and incremental rebuilds. The
operators here derive the keep/drop decision from a **content hash of the
row key** — stable across partitionings, cluster sizes, and engines (the
DuckDB oracles compute the identical md5-based decision), and trivially
re-runnable on appended data without resampling history.

Scale shape: pure JVM column expressions on a single scan — no shuffle at
all for uniform sampling; stratified rates join against a broadcast-able
per-stratum rate table only when rates are data-driven.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space resolution: per-mille-of-per-cent (1/10000) rate granularity
_BUCKETS = 10_000


def hash_bucket(col: Column | str) -> Column:
    """Deterministic bucket 0-9999 from a row key: first 8 md5 hex digits
    as an integer (portable — any engine with md5 + hex parsing agrees)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _BUCKETS
    )


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float
) -> DataFrame:
    """Keep ~``rate`` of rows, decided by the key's hash bucket — stable
    under repartitioning, appends, and engine changes."""
    return df.filter(hash_bucket(key_col) < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame, key_col: str, stratum_col: str, rates: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate-
    heavy domains, keep all rare high-quality strata). ``rates`` maps
    stratum value → keep rate in [0, 1]; missing strata keep rate 0.

    The rate lookup is a literal CASE expression (broadcast-free); the
    decision is the same content-hash bucket as ``deterministic_sample``.
    """
    rate = F.lit(0.0)
    for value, r in rates.items():
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(
        hash_bucket(key_col) < (rate * _BUCKETS).cast("bigint")
    )


def mix_to_token_budget(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    token_col: Column | str,
    budget_tokens: int,
) -> DataFrame:
    """Dataset mixing: downsample each stratum (source/domain) toward a
    per-stratum token budget — keep rate = min(1, budget / stratum_tokens),
    decided by the same content-hash bucket as ``deterministic_sample``.

    The rates are DATA-DRIVEN (one combinable sum per stratum, broadcast
    back), so the mix recipe follows the corpus as it grows; the keep
    decision stays per-row deterministic, so appending data never
    resamples history. Oversized strata shrink toward the budget,
    undersized strata pass through whole.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    totals = df.groupBy(stratum_col).agg(F.sum(tok).alias("__tot"))
    rates = totals.select(
        stratum_col,
        F.least(F.lit(1.0), F.lit(float(budget_tokens)) / F.col("__tot"))
        .alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(hash_bucket(key_col) < F.floor(F.col("__rate") * _BUCKETS))
        .drop("__rate")
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    token_col: Column | str,
    temperature: float = 0.7,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/multi-domain
    re-balancing rule): each stratum's sampling weight is its token share
    raised to ``temperature`` < 1, which flattens the distribution toward
    rare sources (τ=1 keeps natural proportions, τ→0 approaches uniform).
    Keep rate per stratum = min(1, w_s / max_s w_s) with
    w_s ∝ share_s^τ / share_s — i.e. the largest stratum's rate scales
    the others so nothing is UPsampled, only over-represented strata are
    thinned (the standard no-duplication mixing form).

    Rates are data-driven (one combinable sum per stratum, broadcast
    back); the keep decision is the content-hash bucket, so appends never
    resample history. Pure column math — the oracle replays the powers
    exactly.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    totals = df.groupBy(stratum_col).agg(F.sum(tok).alias("__tot"))
    grand = totals.agg(F.sum("__tot").alias("__g"))
    # w_s = share^tau / share = share^(tau-1); rate = w_s / max(w_s).
    # max w corresponds to the SMALLEST share when tau < 1.
    w = totals.crossJoin(F.broadcast(grand)).select(
        stratum_col,
        F.pow(F.col("__tot") / F.col("__g"), F.lit(temperature - 1.0))
        .alias("__w"),
    )
    wmax = w.agg(F.max("__w").alias("__wm"))
    rates = w.crossJoin(F.broadcast(wmax)).select(
        stratum_col,
        F.least(F.lit(1.0), F.col("__w") / F.col("__wm")).alias("__rate"),
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(hash_bucket(key_col) < F.floor(F.col("__rate") * _BUCKETS))
        .drop("__rate")
    )


def stratified_fixed_k(
    df: DataFrame, key_col: str, stratum_col: str, k: int
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (the reservoir-sampling
    use case, reproducibly): rank rows within each stratum by their
    content hash (md5 of the key — a uniform, engine-portable shuffle
    order) and keep the first ``k``. Unlike a true streaming reservoir
    the result is IDENTICAL across runs, partitionings, and engines, and
    appending data only evicts rows whose hash rank falls out of the top
    k — it never reshuffles survivors arbitrarily.

    One hash shuffle on the stratum; the per-stratum top-k is a window
    rank (strata are assumed numerous/balanced — for one giant stratum
    use deterministic_sample instead).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 16,
    max_records_per_file: int | None = None,
) -> DataFrame:
    """Write the final training set as ``n_shards`` deterministic shards.

    Shard = content-hash bucket mod ``n_shards`` — the same portable md5
    scheme as sampling, so a row lands in the same shard on every engine,
    partitioning, and rerun (downstream loaders can resume/diff shards).
    One hash shuffle clusters rows by shard; the Hive-partitioned write
    gives one file per shard (plus ``maxRecordsPerFile`` splitting when
    set — bounded file sizes at any scale, no coalesce(1) anywhere).
    Returns the (shard, n_rows) manifest read back from disk.
    """
    import os

    spark = df.sparkSession
    sharded = df.withColumn("__shard", hash_bucket(key_col) % n_shards)
    w = sharded.repartition(F.col("__shard")).write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy("__shard").parquet(path)
    # an empty keep-set writes no shard directories; reading the bare
    # path would fail schema inference — an empty manifest is the honest
    # answer (seen for real when an aggressive curation drops everything)
    if not any(e.startswith("__shard=") for e in os.listdir(path)):
        return spark.createDataFrame([], "shard bigint, n_rows long")
    back = spark.read.parquet(path)
    # Hive partition discovery infers __shard as int; surface it as the
    # long it was written as (BIGINT oracle twin / shard counts can be >2^31
    # in pathological n_shards configs)
    return back.groupBy(F.col("__shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def train_split(
    df: DataFrame,
    key_col: str,
    fractions: "dict[str, float]",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in exactly
    one named split by its content-hash bucket, reproducible across
    engines, partitionings, and appends (the property random splits lack:
    a re-run or a late-arriving shard never reshuffles membership).

    ``fractions`` maps split name → fraction; fractions must sum to ≤ 1
    (any remainder is labelled ``'rest'``). Boundaries are cumulative
    bucket ranges in insertion order. Adds a ``split`` column.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    expr = F.lit("rest")
    b = hash_bucket(key_col)
    acc = 0.0
    # build from the last range backward so earlier names win their range
    bounds = []
    for name, frac in fractions.items():
        bounds.append((name, int(acc * _BUCKETS), int((acc + frac) * _BUCKETS)))
        acc += frac
    for name, lo, hi in reversed(bounds):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def leakage_safe_split(
    docs: DataFrame,
    components: DataFrame,
    key_col: str,
    fractions: "dict[str, float]",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across
    splits: membership hashes the document's dedup-COMPONENT id (the
    cluster-min representative from ``connected_components``) instead of
    its own id, so every member of a near-dup cluster lands in the same
    split. Without this, a test document's near-twin sits in train and
    the eval is contaminated — the standard failure mode of splitting a
    deduplicated-but-not-collapsed corpus.

    ``components`` is the (id, component) frame of CLUSTERED docs only —
    usually small relative to the corpus and broadcast, but on a
    mostly-duplicate corpus it is O(corpus), so the hint is
    stats-dispatched (the ``_anti_join_losers`` guard pattern): above
    the threshold the planner degrades to a shuffle join instead of
    blowing the driver. Unclustered docs hash their own id. Same
    determinism contract as :func:`train_split`.
    """
    from griddb_spark.pipeline.dedup import _BROADCAST_LOSERS_MAX

    grp = components.select(
        F.col("doc_id").alias(key_col), F.col("component")
    ).localCheckpoint(eager=True)
    if grp.count() <= _BROADCAST_LOSERS_MAX:
        grp = F.broadcast(grp)
    joined = docs.join(grp, key_col, "left")
    gkey = F.coalesce(F.col("component"), F.col(key_col).cast("bigint"))
    out = train_split(joined.withColumn("__gkey", gkey), "__gkey", fractions)
    return out.drop("__gkey", "component")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_col: str,
) -> DataFrame:
    """Corpus snapshot diff: per key, ``added`` / ``removed`` /
    ``changed`` (content hash differs) / ``unchanged`` between two
    snapshots — the audit step between ingest batches.

    One full-outer join on the key carrying only (key, content-hash) —
    fixed-width shuffle regardless of document size; content never moves.
    """
    oh = old.select(
        F.col(key_col).alias("__k"), F.md5(F.col(content_col)).alias("__oh")
    )
    nh = new.select(
        F.col(key_col).alias("__k"), F.md5(F.col(content_col)).alias("__nh")
    )
    status = (
        F.when(F.col("__oh").isNull(), "added")
        .when(F.col("__nh").isNull(), "removed")
        .when(F.col("__oh") != F.col("__nh"), "changed")
        .otherwise("unchanged")
    )
    return oh.join(nh, "__k", "full_outer").select(
        F.col("__k").alias(key_col), status.alias("status")
    )


# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

def token_bucket(token: Column | str, n_buckets: int, portable: bool = True) -> Column:
    """Hashed n-gram feature bucket of a token.

    ``portable=True`` derives the bucket from the first 8 md5 hex digits
    (identical arithmetic in any engine — the oracle path);
    ``portable=False`` uses ``xxhash64`` — the cheaper JVM-side hash for
    production runs where cross-engine parity doesn't matter. Both are
    uniform; only the bucket assignment differs.
    """
    t = F.col(token) if isinstance(token, str) else token
    if portable:
        h = F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
    else:
        h = F.abs(F.xxhash64(t))
    return F.pmod(h, F.lit(n_buckets))


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    n_buckets: int = 512,
    portable: bool = True,
) -> DataFrame:
    """Per-document DSIR importance score: how much more likely the doc's
    hashed-unigram bag is under the TARGET distribution than under the raw
    corpus distribution (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling").

    - features: whitespace tokens hashed into ``n_buckets`` buckets;
    - bucket distributions: Laplace-smoothed token counts over the target
      subset (rows satisfying ``target_pred``) and over the whole corpus;
    - score(doc) = Σ_tokens [ln p̂_target(b) − ln p̂_raw(b)].

    Determinism contract: each bucket's log-ratio is rounded to 6 decimals
    ONCE and fixed as DECIMAL(18,6); per-document scores are then exact
    decimal sums — order-independent, so the result hash-matches the SQL
    oracle at any parallelism. (A float sum of raw logs would drift with
    aggregation order.)

    Scale shape: one explode over the corpus; bucket stats collapse to
    ``n_buckets`` rows through map-side combine; the weight table
    broadcasts; the per-doc sum is the only data-sized shuffle. The target
    subset is re-scanned from the same exploded frame — no second pass
    over raw text.

    Returns ``(id_col, dsir_score double)`` for every doc with ≥1 token.
    """
    from pyspark.sql import Window

    feat = (
        df.select(
            F.col(id_col),
            target_pred.alias("__is_target"),
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("__t"),
        )
        .filter(F.col("__t") != "")
        .select(
            id_col,
            "__is_target",
            token_bucket("__t", n_buckets, portable).alias("__b"),
        )
    )
    counts = feat.groupBy("__b").agg(
        F.count(F.lit(1)).alias("__rc"),
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("__tc"),
    )
    whole = Window.partitionBy()
    bexp = F.lit(n_buckets)
    weights = counts.select(
        "__b",
        F.round(
            F.log((F.col("__tc") + 1).cast("double")
                  / (F.sum("__tc").over(whole) + bexp).cast("double"))
            - F.log((F.col("__rc") + 1).cast("double")
                    / (F.sum("__rc").over(whole) + bexp).cast("double")),
            6,
        ).cast("decimal(18,6)").alias("__lw"),
    )
    return (
        feat.join(F.broadcast(weights), "__b")
        .groupBy(id_col)
        .agg(F.sum("__lw").cast("double").alias("dsir_score"))
    )


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_pred: Column,
    k: int,
    n_buckets: int = 512,
    portable: bool = True,
) -> DataFrame:
    """Top-``k`` documents by DSIR importance score (deterministic
    tie-break on id) — the selection step of importance resampling. The
    sort is a TakeOrdered top-k, never a full global sort."""
    return (
        dsir_scores(df, id_col, text_col, target_pred, n_buckets, portable)
        .orderBy(F.desc("dsir_score"), F.col(id_col))
        .limit(k)
    )


def weighted_fixed_k(
    df: DataFrame,
    key_col: str,
    weight_col: Column | str,
    k: int,
    stratum_col: str | None = None,
) -> DataFrame:
    """Weighted reservoir sampling without replacement, deterministically
    (Efraimidis & Spirakis 2006, the A-ES scheme): each row gets an
    exponential key ``r = -ln(u)/w`` with ``u`` derived from the row key's
    content hash, and the ``k`` smallest keys win — inclusion probability
    proportional to weight, yet the SAME sample on every run, partitioning,
    and engine (a true reservoir is stream-order-dependent; this is not).

    ``u = (first-8-md5-hex + 0.5) / 2^32`` ∈ (0,1) — the repo's portable
    hash-uniform; the key is rounded to 6 decimals ONCE with the row id as
    tie-break, the same fixed-point contract the DSIR scores use, so the
    rank order is identical in the SQL oracle. Weights must be > 0:
    rows with NULL, zero, or negative weight are EXCLUDED from the sample
    (their A-ES key is nulled and null keys sort last) — without the
    guard, Spark's nulls-first ascending sort would let invalid-weight
    rows silently win every draw.

    Shape at scale: with strata, one shuffle on the stratum key and a
    windowed top-k; without, a global TakeOrdered top-k (no full sort).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.col(key_col)
    u = (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("double") + F.lit(0.5)
    ) / F.lit(4294967296.0)
    wd = w.cast("double")
    r = F.when(wd > 0.0, F.round(-F.log(u) / wd, 6))
    out = df.withColumn("__akey", r).filter(F.col("__akey").isNotNull())
    if stratum_col is not None:
        from pyspark.sql import Window

        win = Window.partitionBy(stratum_col).orderBy(F.col("__akey"), key)
        return (
            out.withColumn("__rk", F.row_number().over(win))
            .filter(F.col("__rk") <= k)
            .drop("__rk", "__akey")
        )
    return out.orderBy(F.col("__akey"), key).limit(k).drop("__akey")


def mix_epochs(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    epochs: "dict[str, float]",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Fractional-epoch upsampling — the data-recipe staple ("2.5 epochs
    of wiki, 0.8 of web"): each stratum's rows repeat ``floor(e)`` whole
    times plus a deterministic ``frac(e)`` content-hash slice, with an
    ``epoch_col`` marking the repeat index (so shuffling/packing
    downstream can interleave epochs).

    Whole epochs are a per-row ``explode(sequence(...))`` — no shuffle,
    no driver loop, output fan-out exactly ``e`` per row on average; the
    fractional slice reuses the :func:`hash_bucket` decision, so the
    SAME rows are chosen for the partial epoch on every run, engine, and
    append (the reproducible-recipe property random sampling lacks).
    Strata absent from ``epochs`` default to one epoch.
    """
    whole = F.lit(1)
    frac_keep = F.lit(False)  # unlisted strata: exactly one whole epoch
    for name, e in epochs.items():
        if e < 0:
            raise ValueError(f"epochs must be >= 0, got {name}={e}")
        w, fr = int(e), round(e - int(e), 9)
        is_s = F.col(stratum_col) == name
        whole = F.when(is_s, F.lit(w)).otherwise(whole)
        if fr > 0:
            frac_keep = F.when(
                is_s, hash_bucket(key_col) < int(fr * _BUCKETS)
            ).otherwise(frac_keep)
        else:
            frac_keep = F.when(is_s, F.lit(False)).otherwise(frac_keep)
    full = df.withColumn("__w", whole).filter(F.col("__w") >= 1).select(
        "*", F.explode(F.sequence(F.lit(1), F.col("__w"))).alias(epoch_col)
    ).drop("__w")
    partial = df.filter(frac_keep).select(
        "*", (whole + 1).alias(epoch_col)
    )
    return full.unionByName(partial)

"""Deduplication operators: exact, MinHash+LSH, SimHash.

Scale shapes (the point of each design):

- ``exact_dedup``: one hash-groupBy — map-side partial agg, one shuffle on
  the content hash, no data skew beyond true duplicates.
- ``minhash_lsh_pairs``: shingle→signature per row (narrow), explode to
  ``bands`` rows per doc carrying ONLY (id, band, band_key) — the shuffle
  is id-sized, not document-sized; candidates from an equi self-join on
  (band, band_key); exact-Jaccard verify joins the shingle sets back by id.
  At 100 TB the band join is the only O(pairs) stage and it only sees
  colliding buckets.
- ``simhash_pairs``: 64-bit SimHash per doc; pigeonhole banding (4×16-bit
  chunks ⇒ guaranteed recall for hamming ≤ 3) then exact hamming verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from griddb_spark.pipeline.text import minhash_signature, tokens, word_shingles

_HEX = "0123456789abcdef"


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup by content hash: one surviving ``id`` per distinct text.

    Returns (content_hash, survivor_id, n_dups). ``keep`` = 'min'|'max'.
    """
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(agg.alias("survivor_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def collapse_exact(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact-duplicate collapse: one representative row (min id) per
    distinct text, annotated with ``cluster_size``.

    The standard web-scale pre-stage for near-dup dedup: boilerplate /
    mirror clusters otherwise produce LSH candidate-pair sets quadratic
    in cluster size (measured 8.5x wall on the 10x scale probe, whose
    replication builds 10-way exact clusters), while collapsed near-dup
    work is bounded by the number of DISTINCT documents. One extra
    hash-groupBy + semi-join, both map-side combinable.
    """
    withh = df.select(
        F.col(id_col), F.col(text_col), F.md5(F.col(text_col)).alias("__th")
    )
    clusters = withh.groupBy("__th").agg(
        F.min(id_col).alias("__rep"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return (
        withh.join(clusters, "__th")
        .filter(F.col(id_col) == F.col("__rep"))
        .select(F.col(id_col), F.col(text_col), F.col("cluster_size"))
    )


def hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """(__id, __sh: array<long>) — each doc's distinct word shingles as
    64-bit hashes. The un-materialized stage behind ``minhash_lsh_pairs``
    (exposed so plan tests can inspect filter/exchange placement).

    Shingles are carried as hashes, not strings: ~5-10x smaller when
    materialized (the round-2 variance cliff was the string-shingle cache
    evicting under pressure and recomputing the interpreted transform),
    cheaper k-permutation hashing, and an int-typed verify join.
    |intersect|/|union| over hashed sets equals the string-set Jaccard
    w.h.p. (collision odds per pair ~ |S|²/2⁶⁴) — the oracle gate pins
    the values.
    """
    # single-file sources scan as ONE partition; signature hashing is the
    # dominant cost (higher-order exprs run interpreted, outside codegen),
    # so spread rows across cores first. Explicit numPartitions keeps AQE
    # from coalescing the tiny-by-bytes/huge-by-compute shuffle back to 1.
    para = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
        # cheap equivalent of `size(shingles) > 0` (empty iff < n words or
        # NULL), applied BEFORE the repartition: a post-shingle size filter
        # gets predicate-pushed below the exchange, which re-evaluates the
        # whole shingle expression inside the single-task scan stage
        .filter(F.size(tokens(text_col)) >= shingle_n)
        .repartition(para, "__id")
        .select(
            "__id",
            F.transform(
                word_shingles(text_col, shingle_n), lambda s: F.xxhash64(s)
            ).alias("__sh"),
        )
    )


def lsh_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """The persistable MinHash-LSH index of a corpus: ``(banded, shingles)``
    where ``banded`` = (__id, band, bkey) and ``shingles`` = (__id, __sh).

    At 100 TB this is what you WRITE once (partitioned by band/bkey) and
    keep between ingest batches — ``incremental_minhash_pairs`` probes it
    with each new batch, so per-batch dedup cost tracks the batch, not the
    historical corpus.

    The shingle table is read multiple times (signature + verify sides)
    and shingling/minhash are interpreted higher-order exprs: an eager
    localCheckpoint (NOT persist) truncates the lineage, so no join
    replan, cache eviction, or AQE re-optimization can EVER recompute the
    expensive subtree — measured 1.6s stable vs 1.4-17s jitter with
    MEMORY_AND_DISK persist at sf0.1. On a multi-executor cluster the
    trade is recompute-on-executor-loss → job retry, the right trade for
    a hot short-lived intermediate (the durable variant is the parquet
    write above).
    """
    rows = k // bands
    sh = hashed_shingles(df, id_col, text_col, shingle_n).localCheckpoint(
        eager=True
    )
    sig = sh.select("__id", minhash_signature("__sh", k).alias("__sig"))
    # one parsed expression for the whole band fan-out (see
    # minhash_signature on why: per-Column py4j latency, identical plan)
    bands_sql = "explode(array(" + ",".join(
        "named_struct('band', {b}, 'bkey', xxhash64({args}))".format(
            b=b,
            args=",".join(f"`__sig`[{b * rows + r}]" for r in range(rows)),
        )
        for b in range(bands)
    ) + "))"
    banded = (
        sig.select("__id", F.expr(bands_sql).alias("__b"))
        .select(
            "__id", F.col("__b.band").alias("band"), F.col("__b.bkey").alias("bkey")
        )
        # checkpointed, not just repartitioned: consumers read this twice
        # and rows are tiny (id, band, bkey) — eager materialization runs
        # the k minhash evaluations per doc exactly once regardless of
        # join strategy
        .localCheckpoint(eager=True)
    )
    return banded, sh


def incremental_minhash_pairs(
    new_df: DataFrame,
    index_banded: DataFrame,
    index_shingles: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental ingest dedup: near-dup pairs between a NEW batch and an
    existing corpus's LSH index (from :func:`lsh_index`).

    The new batch is signed and banded, probes the historical band table
    on (band, bkey) — a key-partitioned join touching only colliding
    buckets — and candidates are exact-Jaccard verified. Work scales with
    the batch, never with the historical corpus; the index grows by a
    union of the batch's own band/shingle tables afterward.

    Returns (new_id, old_id, jaccard).
    """
    nb, nsh = lsh_index(new_df, id_col, text_col, k, bands, shingle_n)
    cand = (
        nb.alias("n")
        .join(index_banded.alias("o"), on=["band", "bkey"], how="inner")
        .select(F.col("n.__id").alias("new_id"), F.col("o.__id").alias("old_id"))
        .distinct()
    )
    sh_n = nsh.select(F.col("__id").alias("new_id"), F.col("__sh").alias("__sha"))
    sh_o = index_shingles.select(
        F.col("__id").alias("old_id"), F.col("__sh").alias("__shb")
    )
    jac = F.round(
        F.size(F.array_intersect("__sha", "__shb")).cast("double")
        / F.size(F.array_union("__sha", "__shb")),
        6,
    )
    return (
        cand.join(sh_n, "new_id")
        .join(sh_o, "old_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "old_id", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    k: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by MinHash+LSH, verified with exact Jaccard.

    ``k`` signature elements in ``bands`` bands (rows = k/bands per band).
    With r=2, P(candidate | J=t) per band is t², so 16 bands at t=0.8 give
    miss probability (1-0.64)^16 ≈ 1e-7 — and the verify stage makes false
    positives impossible, so the output equals brute-force Jaccard ≥ t on
    any pair LSH surfaces.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    banded, sh = lsh_index(df, id_col, text_col, k, bands, shingle_n)

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, on=["band", "bkey"], how="inner")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("doc_a"), F.col("b.__id").alias("doc_b"))
        .distinct()
    )
    sh_a = sh.select(F.col("__id").alias("doc_a"), F.col("__sh").alias("__sha"))
    sh_b = sh.select(F.col("__id").alias("doc_b"), F.col("__sh").alias("__shb"))
    jac = F.round(
        F.size(F.array_intersect("__sha", "__shb")).cast("double")
        / F.size(F.array_union("__sha", "__shb")),
        6,
    )
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _hexval(h: Column, pos: int) -> Column:
    """Value 0-15 of 1-indexed hex digit ``pos`` (portable: instr lookup)."""
    return F.instr(F.lit(_HEX), F.substring(h, pos, 1)) - 1


def with_simhash(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash"
) -> DataFrame:
    """64-bit SimHash per document as a 16-hex-char string.

    Bit j of ``md5(token)`` votes ±1; simhash bit j is set iff the vote sum
    is positive. Computed via explode + 64 conditional sums — one shuffle
    on ``id_col``, all JVM-side.
    """
    para = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        df.select(F.col(id_col), F.col(text_col))
        .repartition(para, id_col)  # spread hash work; see minhash note
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
        .withColumn("__h", F.md5("__tok"))
        # decode the leading 16 hex digits as two 32-bit ints (conv) — one
        # expression per 8 digits instead of instr+substring per digit
        # keeps the per-token work and the codegen size ~3x smaller
        .withColumn("__c0", F.conv(F.substring("__h", 1, 8), 16, 10).cast("long"))
        .withColumn("__c1", F.conv(F.substring("__h", 9, 8), 16, 10).cast("long"))
    )
    # The 64 vote sums and the 16 hex-digit decodes are ONE parsed SQL
    # expression (each sum feeds exactly one digit term, so inlining
    # duplicates nothing; Catalyst extracts the aggregates into the same
    # 64-buffer Aggregate the per-Column form produced). The py4j Column
    # DSL paid a driver round trip per call — ~750 calls ≈ 1.4 s of pure
    # driver latency per query (measured r13), vs ~10 ms to parse this.
    def vote(j: int) -> str:
        d = j // 4
        chunk = "__c0" if d < 8 else "__c1"
        shift = (7 - d % 8) * 4 + (3 - j % 4)
        return (f"sum(CASE WHEN (shiftright(`{chunk}`, {shift}) & 1) != 0 "
                "THEN 1 ELSE -1 END)")

    def digit(d: int) -> str:
        idx = " + ".join(
            f"(CASE WHEN {vote(4 * d + i)} > 0 THEN {8 >> i} ELSE 0 END)"
            for i in range(4)
        )
        return f"substring('{_HEX}', 1 + {idx}, 1)"

    sim_sql = "concat(" + ",".join(digit(d) for d in range(16)) + ")"
    return tok.groupBy(id_col).agg(F.expr(sim_sql).alias(out_col))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-duplicate pairs with SimHash hamming distance ≤ ``max_hamming``.

    Candidates by pigeonhole banding: the 64-bit key splits into ``chunks``
    16-bit chunks; any pair within ``max_hamming`` ≤ chunks-1 shares at
    least one identical chunk, so recall is guaranteed; exact hamming
    (popcount over hex digits) verifies. Returns (doc_a, doc_b, hamming).
    """
    if max_hamming > chunks - 1:
        raise ValueError("pigeonhole banding needs max_hamming <= chunks-1")
    sim = with_simhash(df, id_col, text_col).select(
        F.col(id_col).alias("__id"),
        F.col("simhash"),
        # digit values decoded ONCE per doc: the pair stage then runs pure
        # integer xor/bit_count — simhash bits cluster on shared vocabulary,
        # so candidate pairs are quadratic in bucket size and per-pair cost
        # dominates at scale. One parsed expr (py4j latency; same plan).
        F.expr("array(" + ",".join(
            f"(instr('{_HEX}', substring(simhash, {p + 1}, 1)) - 1)"
            for p in range(16)
        ) + ")").alias("__hv"),
    ).localCheckpoint(eager=True)  # read by both self-join branches; the
    # 64-vote simhash aggregation runs exactly once (lineage truncated —
    # see minhash_lsh_pairs on why checkpoint beats persist here)
    width = 16 // chunks
    chunk_structs = [
        F.struct(
            F.lit(c).alias("chunk"),
            F.substring("simhash", c * width + 1, width).alias("ckey"),
        )
        for c in range(chunks)
    ]
    banded = sim.select(
        "__id", "__hv", F.explode(F.array(*chunk_structs)).alias("__c")
    ).select(
        "__id", "__hv",
        F.col("__c.chunk").alias("chunk"), F.col("__c.ckey").alias("ckey"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.expr("0 + " + " + ".join(
        f"bit_count(cast((a.`__hv`[{p}] ^ b.`__hv`[{p}]) as bigint))"
        for p in range(16)
    ))
    return (
        a.join(b, on=["chunk", "ckey"], how="inner")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(
            F.col("a.__id").alias("doc_a"),
            F.col("b.__id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_pairs_int(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    total_bits: int = 56,
    bands: int = 8,
    max_hamming: int = 4,
) -> DataFrame:
    """Near-duplicate pairs of an INTEGER hash column (a dHash, a packed
    sign-code, any ≤63-bit fingerprint) with Hamming distance ≤
    ``max_hamming``, by pigeonhole banding: the hash splits into
    ``bands`` equal bit-slices; a pair within ``max_hamming`` ≤ bands-1
    leaves at least one slice untouched, so joining on (band, slice) is
    recall-COMPLETE — the banded candidate set provably equals the
    all-pairs result, which is exactly what the SQL oracle checks.
    Verify is pure integer xor + bit_count (JVM, codegen). Shuffle
    carries ``bands`` small rows per doc; candidate volume is bounded by
    band-bucket occupancy, never n². Returns (id_a, id_b, hamming)."""
    if max_hamming > bands - 1:
        raise ValueError("pigeonhole banding needs max_hamming <= bands-1")
    if total_bits % bands:
        raise ValueError("total_bits must divide evenly into bands")
    width = total_bits // bands
    mask = (1 << width) - 1
    h = df.select(
        F.col(id_col).alias("__id"), F.col(hash_col).cast("long").alias("__h")
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("__h"), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("bkey"),
        )
        for b in range(bands)
    ]
    banded = h.select(
        "__id", "__h", F.explode(F.array(*band_structs)).alias("__b")
    ).select(
        "__id", "__h",
        F.col("__b.band").alias("band"), F.col("__b.bkey").alias("bkey"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
            F.col("a.__h").alias("__ha"), F.col("b.__h").alias("__hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming",
            F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def union_find_min(pairs_iter) -> dict:
    """Driver-side union-find with path compression over (a, b) edge
    pairs; returns {node: component} with component = min id reachable
    (the canonical-min contract shared by every dedup path). Bounded by
    contract: callers dispatch here only for edge sets that fit the
    driver (stats-dispatch in :func:`connected_components`, batch-local
    pair sets in the streaming dedup)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs_iter:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:  # union by min label → component = min reachable
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    small_edges: int = 500_000,
) -> DataFrame:
    """Connected components of the near-dup pair graph → dedup clusters.

    Pregel-style min-label propagation: every node starts labeled with its
    own id; each round, labels flow across edges and each node keeps the
    minimum seen; fixpoint when no label changes. Near-dup clusters have
    tiny diameter (duplicates of a common source), so rounds ≈ 2-4; each
    round is ONE shuffle join + map-side-combinable min-groupBy, and every
    iteration output is eagerly localCheckpoint-ed so the plan never grows
    with iteration count (the classic iterative-algorithm lineage bomb).
    The per-round driver-side convergence check reads a single scalar —
    the standard GraphX/Pregel driver loop, not a data collect. For graphs
    with genuinely long chains at 100 TB, swap the propagation loop for
    alternating large-star/small-star rounds (O(log n) convergence) — the
    join/groupBy shapes are identical.

    Returns (doc_id, component) for every node appearing in ``pairs``,
    component = min doc id reachable.
    """
    from griddb_spark.perfstages import stage

    # materialize the caller's pair lineage ONCE before the two-direction
    # union: both union branches reference it, and only the stage below
    # an exchange is reused — an expensive pair extraction (e.g. the
    # per-cell GEMM kernels) would otherwise execute twice. This eager
    # checkpoint is where the caller's pair kernel actually RUNS — the
    # stage label attributes it correctly in bench stage maps.
    with stage("pair_materialize"):
        e = pairs.select(
            F.col(src).alias("a"), F.col(dst).alias("b")
        ).localCheckpoint(eager=True)

    # Stats-dispatched strategy (same pattern as the small-vocab Jaccard
    # bitmap): a near-dup pair graph is tiny relative to the corpus — its
    # size tracks the duplicate count, not the document count — so below
    # ``small_edges`` DIRECTED edges a driver-side union-find beats the
    # per-round job overhead of the distributed loop by ~10×. The
    # dispatch count runs on the raw pair frame, and the union-find path
    # consumes it DIRECTLY — union-find is orientation-insensitive, so
    # the doubled+distinct edge frame the Pregel loop needs is built
    # only on the large-graph branch (it cost two extra jobs per dedup
    # gate on the common small path). The bounded collect is by-contract
    # and goes through Arrow (two plain columns, no Row objects — Row
    # overhead is ~10× the payload); above the bound the Pregel loop
    # below is the scale path.
    with stage("components"):
        n_pairs = e.count()
        if 2 * n_pairs <= small_edges:
            spark = pairs.sparkSession
            pdf = e.toPandas()
            comp = union_find_min(zip(pdf["a"].tolist(), pdf["b"].tolist()))
            schema = e.select(
                F.col("a").alias("doc_id"), F.col("a").alias("component")
            ).schema
            return spark.createDataFrame(list(comp.items()), schema)
        edges = (
            e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .distinct()
            .localCheckpoint(eager=True)
        )

    # fold the first propagation round into initialization: label = min of
    # self and direct neighbors. Most near-dup clusters are 2-node (a doc
    # and its duplicate), so this alone is the fixpoint and the loop exits
    # after one verification round.
    labels = (
        edges.groupBy(F.col("a").alias("id"))
        .agg(F.min("b").alias("__mb"))
        .select("id", F.least(F.col("id"), F.col("__mb")).alias("comp"))
        .localCheckpoint(eager=True)
    )

    # Convergence check, dispatched on label type. For numeric ids the
    # label total is strictly monotone decreasing until the fixpoint
    # (min-propagation only ever lowers labels), so convergence is one
    # scalar aggregate over the (checkpointed) labels — no join. Decimal
    # accumulator: an int64 sum of billions of wide ids could overflow.
    # For non-numeric ids (strings) the cast would yield NULL and the
    # shortcut would falsely report convergence after one round, so fall
    # back to the join-based changed-row count (sound for any orderable
    # type; both sides are checkpointed so the join is over tiny frames).
    numeric_labels = labels.schema["comp"].dataType.typeName() in {
        "byte", "short", "integer", "long", "float", "double", "decimal",
    }

    def _total(lb: DataFrame):
        return lb.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    def _changed(new: DataFrame, old: DataFrame) -> int:
        n, o = new.alias("n"), old.alias("o")
        return (
            n.join(o, F.col("n.id") == F.col("o.id"))
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )

    prev_total = _total(labels) if numeric_labels else None
    for _ in range(max_iter):
        nbr = edges.join(labels, edges["b"] == labels["id"]).select(
            edges["a"].alias("id"), F.col("comp")
        )
        new = (
            labels.union(nbr)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        if numeric_labels:
            total = _total(new)
            converged = total == prev_total
            prev_total = total
        else:
            converged = _changed(new, labels) == 0
        labels = new
        if converged:
            break
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("component"))


#: above this many loser rows a forced broadcast risks driver/executor
#: memory on a mostly-duplicate corpus; let the planner degrade to SMJ.
_BROADCAST_LOSERS_MAX = 5_000_000


def _anti_join_losers(docs: DataFrame, losers: DataFrame, id_col: str) -> DataFrame:
    """Anti-join the corpus against a loser-id list, broadcast-guarded.

    The loser list is usually tiny relative to the corpus but often
    arrives as a stats-less ExistingRDD (driver-side union-find path),
    which the planner would turn into a corpus-wide sort-merge join — so
    we *want* the broadcast hint. But on a corpus that is mostly
    duplicates the loser set is O(corpus) and a forced broadcast can
    exceed driver memory where the planner would have degraded
    gracefully; stats-dispatch on a cheap count (the frame is
    checkpointed first so the count isn't paid twice)."""
    losers = losers.localCheckpoint(eager=True)
    if losers.count() <= _BROADCAST_LOSERS_MAX:
        losers = F.broadcast(losers)
    return docs.join(losers, id_col, "left_anti")


def canonical_filter(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """End-to-end near-dup REMOVAL: keep one canonical document (the
    component-min id) per dedup cluster, pass through every document that
    is in no cluster. A broadcast-able anti-join against the (tiny
    relative to the corpus) non-canonical member list — the corpus itself
    is scanned once and never shuffled.
    """
    losers = components.filter(F.col("component") < F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return _anti_join_losers(docs, losers, id_col)


def canonical_best(
    docs: DataFrame,
    components: DataFrame,
    quality_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware near-dup removal: keep the HIGHEST-``quality_col``
    member of each dedup cluster (ties break to the smaller id) instead of
    ``canonical_filter``'s min-id convention — at corpus scale you want to
    keep the longest/cleanest duplicate, not an arbitrary one.

    Shape: the cluster membership table joins the corpus only to fetch the
    quality signal for *clustered* docs (components ∝ duplicate count ≪
    corpus), the per-cluster argmax is a window over those few rows, and
    the corpus itself is scanned once and anti-joined against the
    broadcast-able loser list — identical scale posture to
    ``canonical_filter``.
    """
    from pyspark.sql import Window

    comp = components.select(F.col("doc_id").alias("__m_id"), "component")
    members = comp.join(
        docs.select(F.col(id_col).alias("__m_id"), F.col(quality_col)),
        "__m_id",
    )
    w = Window.partitionBy("component").orderBy(
        F.col(quality_col).desc(), F.col("__m_id")
    )
    losers = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("__m_id").alias(id_col))
    )
    return _anti_join_losers(docs, losers, id_col)


def char_ngrams(col: Column | str, n: int = 4) -> Column:
    """Distinct character n-grams of a string (codegen-friendly, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    starts = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(starts, lambda i: c.substr(i, F.lit(n))))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    n: int = 4,
    small_vocab: int = 65536,
    blocks: int = 8,
) -> DataFrame:
    """Near-duplicate pairs by exact character-n-gram Jaccard >= threshold.

    Adaptive physical strategy, chosen from a measured corpus statistic
    (one cheap distinct-count — the Catalyst-style stats-driven pick):

    - **Large vocabulary** (real text): PPJoin-style *prefix filtering* —
      order each document's n-grams by ascending global frequency and
      index only the first ``floor((1-t)*|S|) + 1``. Two sets with J >= t
      MUST share a prefix element, so recall is exact while hot shingles
      ("the ", " and") never fan out whole posting lists. One groupBy for
      gram counts, one equi self-join on prefix grams, then an exact
      verify join — the O(pairs) stage only sees prefix collisions.

    - **Small vocabulary** (template/log-structured text, ``<=
      small_vocab`` distinct grams): prefix filtering degenerates (every
      pair shares "rare" grams), so candidates ≈ all pairs and the verify
      join becomes the bottleneck. Dispatch to the dictionary-encoded
      bitmap all-pairs kernel (``_jaccard_bitmap``): Jaccard = popcount
      math over ``vocab/64`` uint64 words, block-partitioned so per-task
      memory is bounded by 2n/``blocks`` documents.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded 6.
    """
    para = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
        # grams are empty only for NULL text — filter that BEFORE the
        # repartition (a post-hoc size filter would be predicate-pushed
        # below the exchange and re-evaluate the n-gram transform inside
        # the single-task scan stage)
        .filter(F.col(text_col).isNotNull())
        # repartition BEFORE shingling: a single-file source scans as one
        # partition, and the n-gram transform is an interpreted
        # higher-order expression — spread it across cores first
        .repartition(para, "__id")
        .select("__id", char_ngrams(text_col, n).alias("__grams"))
        # eager checkpoint: read by the freq count, the prefix index AND
        # both verify sides — lineage truncation stops any replan from
        # re-running the n-gram transform (see minhash_lsh_pairs)
        .localCheckpoint(eager=True)
    )

    grams_ex = base.select(F.explode("__grams").alias("gram"))
    # ONE dispatch probe replaces the former freq aggregation + persist +
    # count + dictionary collect (three driver-blocking actions measured
    # at ~0.7 s of the gate's wall): collect the distinct grams capped at
    # small_vocab + 1. In the small-vocabulary regime the probe result IS
    # the bitmap dictionary; for real text it proves vocab > small_vocab
    # while collecting only the cap (the partial aggregate bounds each
    # partition's distinct output, so the collect is ≤ cap × partitions
    # rows at any corpus size). The PPJoin branch then computes gram
    # frequencies lazily — read once by the prefix index, so the persist
    # is gone too.
    probe = [
        r.gram for r in grams_ex.distinct().limit(small_vocab + 1).collect()
    ]
    if len(probe) <= small_vocab:
        from griddb_spark.pipeline._jaccard_bitmap import jaccard_allpairs_bitmap

        return jaccard_allpairs_bitmap(base, probe, threshold, blocks)
    freq = grams_ex.groupBy("gram").agg(F.count(F.lit(1)).alias("gf"))
    # prefix length floor((1-t)*|S|)+1; rarest-first ordering via global freq
    pref = (
        base.select("__id", F.size("__grams").alias("sz"), F.explode("__grams").alias("gram"))
        .join(freq, "gram")
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("__id").orderBy(F.asc("gf"), F.asc("gram"))
            ),
        )
        .filter(F.col("rk") <= F.floor((1 - threshold) * F.col("sz")) + 1)
        .select("__id", "gram")
        # both self-join branches read the prefix index; eager + truncated
        .localCheckpoint(eager=True)
    )
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "gram")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id").alias("ia"), F.col("b.__id").alias("ib"))
        .distinct()
    )
    ga = base.select(F.col("__id").alias("ia"), F.col("__grams").alias("ga"))
    gb = base.select(F.col("__id").alias("ib"), F.col("__grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    jac = inter.cast("double") / union
    return (
        cand.join(ga, "ia")
        .join(gb, "ib")
        .select(
            F.col("ia").alias("doc_a"),
            F.col("ib").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _positional_spans(
    docs: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(__id, span_idx, span) — each document cut into consecutive
    ``k``-token spans (last may be short). The token array is
    pre-projected so the per-span lambda stays element-local (the
    CollapseProject recompute hazard: an inline split() subtree would
    re-tokenize the whole document per span)."""
    toked = docs.select(
        F.col(id_col).alias("__id"), tokens(text_col).alias("__toks")
    )
    toks = F.col("__toks")
    n_spans = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), F.greatest(n_spans, F.lit(1)) - 1),
        lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
    )
    return toked.select("__id", F.posexplode(spans).alias("span_idx", "span"))


def _reassemble(
    marked: DataFrame, id_col: str, kept: "F.Column", removed: "F.Column"
) -> DataFrame:
    """Doc-keyed reassembly shared by the span dedup/boilerplate ops:
    ``kept`` boxes surviving (span_idx, span) structs, ``removed`` counts
    the cut spans."""
    return (
        marked.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(removed).alias("n_removed"),
            F.array_sort(F.collect_list(kept)).alias("__kept"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.array_join(
                F.transform(F.col("__kept"), lambda s: s["span"]), " "
            ).alias("clean_text"),
            "n_spans",
            "n_removed",
        )
    )


def span_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Exact duplicate-passage removal: global first-occurrence dedup of
    non-overlapping ``k``-token spans (the tractable form of Lee et al.
    2022's exact-substring dedup — passages repeated anywhere in the
    corpus survive only at their first occurrence).

    Each document is cut into consecutive ``k``-token spans (last span may
    be shorter); a span's canonical occurrence is the lexicographically
    first ``(doc_id, span_idx)`` that contains it. Every later occurrence
    is dropped and the document re-assembled from its surviving spans.

    Scale shape: one shuffle keyed by span content to rank occurrences
    (at 100 TB you key by a 128-bit span hash — md5 here — so the
    exchange carries fixed-width keys, not span text), one shuffle keyed
    by document to reassemble. Both are plain hash exchanges whose width
    tracks corpus token count — the honest lower bound for a *global*
    passage dedup — with no driver-side state. Span construction is a
    JVM higher-order projection over the token array; no Python.

    Returns ``(id, clean_text, n_spans, n_removed)`` for every input
    document (``clean_text = ''`` when all spans were removed).
    """
    sp = _positional_spans(docs, id_col, text_col, k)
    # rank by global first occurrence; the exchange key is the span hash
    # (fixed width), the tie-break the natural corpus order
    w = W.partitionBy(F.md5("span")).orderBy("__id", "span_idx")
    ranked = sp.withColumn("__rn", F.row_number().over(w))
    kept = F.when(F.col("__rn") == 1, F.struct("span_idx", "span"))
    return _reassemble(
        ranked, id_col, kept, (F.col("__rn") > 1).cast("long")
    )


def boilerplate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_df: int = 10,
) -> DataFrame:
    """Boilerplate detection by document frequency: the distinct
    ``k``-token spans that occur in at least ``min_df`` DISTINCT documents
    (headers, navigation chrome, license blurbs — the high-DF text that
    survives exact dedup because the documents differ elsewhere).

    Returns ``(span, df)``. Count is per-document-distinct (a span
    repeated within one doc counts once), map-side combinable; output is
    bounded by corpus vocabulary, not corpus size.
    """
    sp = _positional_spans(docs, id_col, text_col, k)
    return (
        sp.select("__id", "span").distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= min_df)
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_df: int = 10,
) -> DataFrame:
    """Strip high-document-frequency spans from every document (the C4
    boilerplate-removal shape at span granularity): spans flagged by
    ``boilerplate_spans`` are cut everywhere and documents reassembled
    from the survivors.

    The flagged-span list is small (bounded by vocabulary at the
    ``min_df`` cut) and **broadcast** — the corpus explodes once to
    positional spans, left-anti-marks against the broadcast list, and one
    doc-keyed shuffle reassembles. Returns
    ``(id, clean_text, n_spans, n_removed)`` for every document.
    """
    bp = boilerplate_spans(docs, id_col, text_col, k, min_df).select("span")
    sp = _positional_spans(docs, id_col, text_col, k)
    marked = sp.join(
        F.broadcast(bp.withColumn("__bp", F.lit(1))), "span", "left"
    )
    kept = F.when(F.col("__bp").isNull(), F.struct("span_idx", "span"))
    return _reassemble(
        marked, id_col, kept, F.col("__bp").isNotNull().cast("long")
    )

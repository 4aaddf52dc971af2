"""Sequence packing: assemble documents into fixed token-budget training
rows, plus corpus token accounting.

Trainers consume fixed-length context windows; feeding one short document
per window wastes most of the batch. The standard fix is *packing*:
concatenate documents (with boundaries preserved) until a token budget is
reached. This operator assigns every document a deterministic
``(bucket, pack_id, pack_offset)`` using only scan + window arithmetic:

- documents are spread across ``n_buckets`` writer buckets by a portable
  content hash of the id (same md5 scheme as
  :mod:`griddb_spark.pipeline.sampling` — reproducible across engines,
  partitionings, and appends);
- within a bucket, documents are ordered by id and laid out head-to-tail;
  ``pack_id = floor(start_offset / budget)`` — the document-level
  equivalent of "concatenate then chunk", so a pack can spill past the
  budget by at most one document tail (exactly how block-packing
  pipelines batch; no bin-packing NP-ness, no driver loop).

Scale shape: ONE shuffle (window partitioned by bucket, keyed by id) no
matter the corpus size; bucket count sets write parallelism, so 100 TB
just means more buckets. Every expression is JVM-side; the whole layout is
reproducible bit-for-bit — the DuckDB oracle computes the identical
assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from griddb_spark.pipeline.sampling import hash_bucket
from griddb_spark.pipeline.text import BPE_RE, tokens


def token_count(col: Column | str, mode: str = "ws") -> Column:
    """Token count of a text column: ``ws`` = whitespace words,
    ``bpe`` = the BPE-ish pre-tokenizer (letter runs | digit runs |
    single punctuation glyph) from :mod:`pipeline.text`."""
    c = F.col(col) if isinstance(col, str) else col
    # long, not int: token counts get summed corpus-wide (mixing budgets,
    # pack offsets) where int32 overflows at 100 TB scale
    if mode == "ws":
        return F.size(tokens(c)).cast("long")
    if mode == "bpe":
        return F.size(F.regexp_extract_all(c, F.lit(BPE_RE), 0)).cast("long")
    raise ValueError(f"unknown token mode: {mode}")


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 2048,
    n_buckets: int = 8,
    mode: str = "ws",
) -> DataFrame:
    """Deterministic doc-level packing plan.

    Returns (id, n_tokens, bucket, pack_id, pack_offset) — enough for a
    writer to materialize packs with document boundaries intact. Documents
    longer than ``budget`` still get a slot (they start a pack and spill;
    splitting oversized docs is the tokenizer's job upstream).
    """
    n = token_count(text_col, mode).alias("n_tokens")
    bucketed = df.select(
        F.col(id_col), n, (hash_bucket(id_col) % n_buckets).alias("bucket")
    )
    w = W.partitionBy("bucket").orderBy(id_col)
    start = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    return bucketed.select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(start / budget).cast("bigint").alias("pack_id"),
        (start % budget).cast("bigint").alias("pack_offset"),
    )


def vocab_topk(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    mode: str = "bpe",
) -> DataFrame:
    """Corpus token frequency table, top-k by count (ties broken by token
    text — deterministic across engines): the seed statistics for
    tokenizer/vocab induction. Explode → two-phase hash count (map-side
    combine) → ordered top-k."""
    tok = (
        F.explode(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0))
        if mode == "bpe"
        else F.explode(tokens(text_col))
    )
    return (
        df.select(tok.alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows (the
    embedding/retrieval chunking step: stride = size − overlap).

    Chunks start at 1, 1+stride, 1+2·stride, … until the document is
    covered; the final chunk may be short. Pure per-row expressions
    (sequence + posexplode + slice) — a map-side stage that fuses into the
    scan, no shuffle, no UDF. Returns
    (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).
    """
    if overlap >= size:
        raise ValueError("overlap must be smaller than size")
    stride = size - overlap
    base = df.select(id_col, tokens(F.col(text_col)).alias("__w"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(F.col("__w")) - overlap, F.lit(1)),
        F.lit(stride),
    )
    exploded = base.select(
        id_col, "__w", F.posexplode(starts).alias("chunk_id", "__start")
    )
    chunk = F.slice(F.col("__w"), F.col("__start"), size)
    return exploded.select(
        id_col,
        "chunk_id",
        F.col("__start").alias("chunk_start"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_k: int = 20
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the scoring step
    of one BPE tokenizer-training iteration (count pairs, merge the top
    one, repeat). Words explode to their length-2 substrings JVM-side; one
    combinable groupBy carries only (pair, count); ``top_k`` with a total
    deterministic order (count desc, pair asc). Iterating the merge loop
    re-runs this over the re-segmented corpus — each iteration stays one
    combinable aggregation at any corpus size.
    """
    w = F.explode(tokens(F.col(text_col))).alias("__w")
    words = df.select(w).filter(F.length("__w") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("__w") - 1),
                lambda i: F.col("__w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    ranked = (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_k)
    )
    return ranked


def vocab_with_ids(
    df: DataFrame, text_col: str = "text", k: int = 100, mode: str = "bpe"
) -> DataFrame:
    """``vocab_topk`` with deterministic contiguous ids (1..k, frequency
    rank order, ties on token text) — the id table a tokenizer ships."""
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return vocab_topk(df, text_col, k, mode).select(
        "token", F.row_number().over(w).cast("bigint").alias("token_id")
    )


def encode_tokens(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "ws",
    unk_id: int = 0,
) -> DataFrame:
    """Tokenizer-apply (lookup stage): encode each document as its ordered
    token-id sequence against a trained vocab, OOV → ``unk_id``.

    Scale shape: the vocab is small by construction (top-k) and
    **broadcast** — the corpus explodes to positional tokens, joins
    map-side, and one doc-keyed shuffle reassembles the ordered id array.
    Shuffle width tracks corpus token count, the floor for full-corpus
    encoding; nothing is quadratic and no Python runs.

    Returns ``(id, token_ids, n_tokens, n_unk)``.
    """
    tok_arr = (
        F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), 0)
        if mode == "bpe"
        else tokens(text_col)
    )
    ex = df.select(
        F.col(id_col), F.posexplode(tok_arr).alias("__pos", "token")
    )
    joined = ex.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    )
    tid = F.coalesce(F.col("token_id"), F.lit(unk_id).cast("bigint"))
    return (
        joined.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), tid.alias("tid")))
            ).alias("__enc"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("token_id").isNull().cast("long")).alias("n_unk"),
        )
        .select(
            id_col,
            F.transform(F.col("__enc"), lambda s: s["tid"]).alias("token_ids"),
            "n_tokens",
            "n_unk",
        )
    )


def _bpe_train_rows(
    rows: "list[tuple[int, list[str]]]", n_merges: int, min_freq: int
) -> "list[tuple]":
    """The BPE merge loop over a collected (freq, symbols) vocab —
    bit-identical to the distributed loop in :func:`bpe_train`:

    - pair score = freq-weighted count over EVERY adjacent position
      (a word ``aaa`` contributes (a,a) twice, as the exploded zip does);
    - argmax order (n desc, l asc, r asc): Python str comparison is
      code-point order == Spark's binary UTF8String order;
    - the merge applies greedily left-to-right against the accumulator's
      CURRENT last element (exactly the JVM ``aggregate`` fold: ``aaaa``
      merging (a,a) → [aa, aa], and a fresh merge output can itself
      merge with the next symbol when the rule says so).
    """
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for freq, sym in rows:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_freq:
            break
        merges.append((rank, left, right, left + right, int(n)))
        nxt: list[tuple[int, list[str]]] = []
        for freq, sym in rows:
            acc: list[str] = []
            for x in sym:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = acc[-1] + x
                else:
                    acc.append(x)
            nxt.append((freq, acc))
        rows = nxt
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_freq: int = 2,
    local: "bool | None" = None,
) -> DataFrame:
    """Learn BPE merge rules over the corpus — the tokenizer-TRAINING
    loop (``bpe_pair_counts`` is its single scoring step).

    Returns the learned merge table ``(merge_rank, left, right, merged,
    freq)``, rank 1 = first merge learned.

    Distributed shape: the iterated state is the WORD-FREQUENCY VOCAB
    (distinct words × their current symbol segmentation — bounded by
    vocabulary size, not corpus size), built with one corpus pass. Each
    round is (a) one combinable groupBy over the vocab's adjacent symbol
    pairs weighted by word frequency, (b) a one-row argmax collect
    (count desc, pair asc — deterministic ties), and (c) a JVM array
    fold applying the merge greedily left-to-right, checkpointed so the
    plan never grows with iteration count. At 100 TB the corpus is
    touched once; every iteration runs over the vocab only.

    ``local`` — the same driver-local dispatch as the quantizer
    trainers: when the vocab is provably driver-sized (planning-time
    estimate ≤ the shared 32 MB bound, post-collect volume check,
    collect-failure fallback), the whole merge loop runs on the
    collected vocab (:func:`_bpe_train_rows`, bit-identical semantics),
    replacing 2 driver actions PER ROUND (argmax collect + vocab
    re-checkpoint) with one collect total. ``None`` = auto by size;
    ``True`` forces local (caller proves boundedness); ``False`` forces
    the distributed loop (scale/probe path). The symbol split stays
    JVM-side in every mode — the local loop only rearranges collected
    symbols, so engine-specific string segmentation can't diverge.
    """
    spark = df.sparkSession
    vocab_plan = (
        df.select(F.explode(tokens(F.col(text_col))).alias("__w"))
        .filter(F.length("__w") > 0)
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .select(
            F.col("__freq"),
            F.split(F.col("__w"), "").alias("__sym"),
        )
    )
    if local is not False:
        from griddb_spark.pipeline import similarity as _sim

        ok = local is True or (
            0 < _sim._plan_size_bytes(vocab_plan)
            <= _sim._LOCAL_TRAIN_MAX_BYTES
        )
        collected = None
        if ok:
            try:
                collected = vocab_plan.collect()
            except Exception:
                if local is True:
                    raise
                collected = None  # lying estimate: distributed fallback
        if collected is not None:
            est = sum(
                64 + sum(len(s) + 8 for s in r[1]) for r in collected
            )
            if local is True or est <= 4 * _sim._LOCAL_TRAIN_MAX_BYTES:
                merges = _bpe_train_rows(
                    [(int(r[0]), list(r[1])) for r in collected],
                    n_merges, min_freq,
                )
                return spark.createDataFrame(
                    merges,
                    "merge_rank int, left string, right string, "
                    "merged string, freq long",
                )
    vocab = vocab_plan.localCheckpoint(eager=True)

    def pair_counts(v: DataFrame) -> DataFrame:
        two_plus = v.filter(F.size("__sym") >= 2)
        pair = F.explode(
            F.zip_with(
                F.slice(F.col("__sym"), 1, F.size("__sym") - 1),
                F.slice(F.col("__sym"), 2, F.size("__sym") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("__p")
        return (
            two_plus.select("__freq", pair)
            .groupBy(F.col("__p.l").alias("l"), F.col("__p.r").alias("r"))
            .agg(F.sum("__freq").alias("n"))
        )

    def apply_merge(sym: Column, a: str, b: str) -> Column:
        return F.aggregate(
            sym,
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == a)
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.element_at(acc, -1), x)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )

    merges = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0].n < min_freq:
            break
        l, r, n = best[0].l, best[0].r, best[0].n
        merges.append((rank, l, r, l + r, int(n)))
        vocab = vocab.select(
            "__freq", apply_merge(F.col("__sym"), l, r).alias("__sym")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left string, right string, merged string, freq long",
    )

"""Benchmark decontamination: drop training documents that overlap an
evaluation/benchmark set by word n-grams.

The standard LLM-pipeline hygiene step (beyond the reference's surface,
first-class here): a training document is *contaminated* when it shares at
least ``min_hits`` distinct word n-grams with any benchmark document.

Scale shape: the benchmark side is small by nature (eval suites are MBs
against a 100 TB corpus), so its distinct-gram set is **broadcast** —
corpus grams never shuffle. The per-document hit count shuffles only the
matched (doc, gram) survivors, which is bounded by the benchmark's gram
count times its corpus frequency. All gram construction is JVM-side
higher-order expressions shared with the dedup operators
(``pipeline/text.word_shingles``); no Python in the hot path.

Grams are carried as xxhash64 keys on both sides (8-byte join keys, no
gram-string shuffle; collision odds per corpus ~ |grams|²/2⁶⁴ ≈ 1e-12 at
eval-set sizes — and the DuckDB oracle gate would surface one as a hits
mismatch, so the risk is monitored, not assumed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from griddb_spark.pipeline.text import word_shingles


def _gram_hashes(df: DataFrame, text_col: str, n: int):
    return F.transform(word_shingles(text_col, n), lambda s: F.xxhash64(s))


def benchmark_ngram_set(bench: DataFrame, text_col: str = "text",
                        n: int = 5) -> DataFrame:
    """Distinct word n-gram hashes of the benchmark set — one `gram`
    column (xxhash64 keys)."""
    return (
        bench.select(
            F.explode(_gram_hashes(bench, text_col, n)).alias("gram")
        ).distinct()
    )


def contamination_report(corpus: DataFrame, bench: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 5, min_hits: int = 1) -> DataFrame:
    """Per-document contamination: (id, hits) for docs meeting min_hits.

    ``hits`` = number of *distinct* corpus-doc n-grams also present in the
    benchmark gram set (each side deduplicated, so a gram repeated in the
    document counts once).
    """
    # spread before the (interpreted, CPU-bound) shingle transform: a
    # single-file corpus scans as one task otherwise — same rule as
    # dedup.hashed_shingles
    para = corpus.sparkSession.sparkContext.defaultParallelism
    spread = corpus.select(F.col(id_col), F.col(text_col)).repartition(
        para, id_col
    )
    grams = spread.select(
        F.col(id_col),
        F.explode(_gram_hashes(spread, text_col, n)).alias("gram"),
    )
    matched = grams.join(F.broadcast(benchmark_ngram_set(bench, text_col, n)),
                         "gram")
    return (
        matched.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def decontaminate(corpus: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = 5, min_hits: int = 1) -> DataFrame:
    """The cleaned corpus: anti-join against the contamination report."""
    flagged = contamination_report(corpus, bench, id_col, text_col, n,
                                   min_hits).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


#: Bloom hashing constants — shared with pipeline.sketches (Knuth / xxhash
#: multiplicative primes, 31-bit key mask keeps products in BIGINT range).
_KNUTH = 2654435761
_KNUTH2 = 2246822519
_M31 = 2147483648
_M32 = 4294967296


def _gram_key(gram) -> F.Column:
    """Portable 32-bit integer key of a gram string: the first 8 hex chars
    of its md5 — identical in any engine with md5 (DuckDB replays it as
    ``('0x' || substr(md5(g),1,8))::BIGINT``)."""
    g = F.col(gram) if isinstance(gram, str) else gram
    return F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")


def _bloom_pos(key, j: int, m: int) -> F.Column:
    """The ``j``-th of ``k`` bloom bit positions via Kirsch-Mitzenmacher
    double hashing — see pipeline.sketches._double_hash_pos."""
    k31 = F.pmod(key, F.lit(_M31))
    h1 = F.pmod(k31 * F.lit(_KNUTH), F.lit(_M32))
    h2 = F.pmod(k31 * F.lit(_KNUTH2), F.lit(_M32))
    h2o = h2 - F.pmod(h2, F.lit(2)) + F.lit(1)
    return F.pmod(h1 + F.lit(j) * h2o, F.lit(m))


def bloom_bit_set(bench: DataFrame, text_col: str = "text", n: int = 5,
                  m: int = 65536, k: int = 3) -> DataFrame:
    """The set bits of an ``m``-bit / ``k``-hash bloom filter over the
    benchmark's word n-grams — one ``pos`` column, at most ``m`` rows.

    This is the fixed-size alternative to ``benchmark_ngram_set``: the
    broadcast payload is bounded by ``m`` no matter how large the eval
    suite grows, at the price of a tunable false-positive rate
    (``(1 - e^{-kn/m})^k``). Grams are keyed by a portable md5-derived
    integer so the DuckDB oracle can replay every bit position exactly.
    """
    grams = bench.select(
        F.explode(word_shingles(text_col, n)).alias("__g")
    ).select(_gram_key("__g").alias("__key")).distinct()
    pos = F.explode(
        F.array(*[_bloom_pos(F.col("__key"), j, m) for j in range(k)])
    ).alias("pos")
    return grams.select(pos).distinct()


def bloom_contamination(corpus: DataFrame, bench: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 5, min_hits: int = 1,
                        m: int = 65536, k: int = 3) -> DataFrame:
    """Per-document contamination via a broadcast bloom filter:
    ``(id, hits)`` where ``hits`` counts the document's distinct n-grams
    that are bloom-positive against the benchmark set.

    Same join shape as ``contamination_report`` but the broadcast side is
    the ≤``m``-row bit set, not the gram set: at 100 TB with a large eval
    suite the executor-resident state stays a fixed bitmap. A gram is
    positive iff all ``k`` of its bit positions are set — the semi-join
    keeps (gram, j) survivors and the count-distinct-j == k test closes
    the AND. Includes bloom false positives by design; the oracle replays
    the identical bit math so results still hash-match.
    """
    para = corpus.sparkSession.sparkContext.defaultParallelism
    spread = corpus.select(F.col(id_col), F.col(text_col)).repartition(
        para, id_col
    )
    grams = spread.select(
        F.col(id_col),
        F.explode(word_shingles(text_col, n)).alias("__g"),
    ).select(F.col(id_col), _gram_key("__g").alias("__key"))
    probes = grams.select(
        F.col(id_col), "__key",
        F.posexplode(
            F.array(*[_bloom_pos(F.col("__key"), j, m) for j in range(k)])
        ).alias("j", "pos"),
    )
    hit = probes.join(F.broadcast(bloom_bit_set(bench, text_col, n, m, k)),
                      "pos")
    positive = (
        hit.groupBy(id_col, "__key")
        .agg(F.count_distinct("j").alias("__kj"))
        .filter(F.col("__kj") == k)
    )
    return (
        positive.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_hits)
    )


def decontaminate_spans(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """SPAN-level decontamination: instead of dropping every document
    that overlaps the benchmark (:func:`decontaminate` — wasteful on
    long documents with one quoted snippet), cut only the k-token spans
    whose exact text occurs among the benchmark's overlapping k-grams
    and keep the rest of the document.

    The benchmark gram set is vocabulary-bounded and broadcast (the
    eval-suite-is-tiny contract shared with the other decontamination
    forms); the corpus explodes once into non-overlapping positional
    spans (the ``span_dedup`` unit), left-marks against the broadcast,
    and one doc-keyed shuffle reassembles. Returns
    ``(id, clean_text, n_spans, n_removed)``.
    """
    from griddb_spark.pipeline.dedup import _positional_spans, _reassemble

    bspans = (
        bench.select(F.explode(word_shingles(text_col, k)).alias("span"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    sp = _positional_spans(corpus, id_col, text_col, k)
    marked = sp.join(F.broadcast(bspans), "span", "left")
    kept = F.when(F.col("__hit").isNull(), F.struct("span_idx", "span"))
    return _reassemble(
        marked, id_col, kept, F.col("__hit").isNotNull().cast("long")
    )

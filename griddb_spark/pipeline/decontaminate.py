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

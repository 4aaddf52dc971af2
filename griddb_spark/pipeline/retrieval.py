"""Retrieval-grade text statistics: TF-IDF, BM25, inverted index.

The missing third leg of the text-curation surface (dedup and quality
already exist): per-document salient terms, lexical search scoring, and
posting lists — the operators an LLM-data pipeline needs for corpus
inspection, query-based filtering, and decontamination triage.

Everything is built from JVM-side Column expressions over one exploded
(doc, term) relation; each operator has an exact DuckDB-SQL twin in
``griddb_spark.workload``. Scale notes per operator below — the common
skeleton is: explode → map-side-combinable groupBy(doc, term) → one
term-keyed or doc-keyed shuffle, never an all-pairs join and never a
driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: oracle twin: string_split_regex(trim(lower(text)), '\s+')
_WS = r"\s+"


def doc_terms(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) term frequencies — the shared exploded relation.

    One explode + one groupBy(id, term): the groupBy partial-aggregates
    map-side, so the shuffle carries distinct (doc, term) pairs, not raw
    token occurrences. Empty/whitespace-only docs contribute nothing.
    """
    toks = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), _WS)
        ).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    ``score = tf * (ln((N + 1) / (df_t + 1)) + 1)`` (the sklearn-style
    smooth idf: never negative, never divides by zero). Returns
    (id, term, tf, score·6dp) for window rank ≤ k, ties broken term-asc
    so the selection is a total order.

    Scale: document frequency is a second aggregate OVER the tf relation
    (already distinct per doc — no re-explode), joined back on the term
    key; N rides in as a broadcast 1-row crossJoin, not a driver
    collect; the top-k window partitions by document, so there is no
    global sort and no skew beyond a single document's vocabulary.
    """
    tf = doc_terms(df, id_col, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n = F.broadcast(df.agg(F.count(F.lit(1)).alias("n_docs")))
    scored = tf.join(dfreq, "term").crossJoin(n).withColumn(
        "score",
        F.col("tf")
        * (F.log((F.col("n_docs") + 1.0) / (F.col("df_t") + 1.0)) + 1.0),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            id_col, "term", "tf", F.round("score", 6).alias("score")
        )
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query by Okapi BM25.

    ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` (Lucene's non-negative
    form), ``contrib = idf · tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))``.
    Returns (id, score·6dp), score desc, id-asc tiebreak.

    Scale: the term filter is a literal IN over the exploded relation —
    it prunes BEFORE any shuffle, so only postings of the |Q| query
    terms move; their document frequencies are a tiny frame joined
    broadcast; corpus stats (N, avgdl) ride as a broadcast 1-row
    crossJoin. The final top-k is a TakeOrdered, not a global sort.
    """
    tf = doc_terms(df, id_col, text_col)
    # dl derives from the SAME tf frame: the (doc,term) combine exchange is
    # bit-identical across the dl/dfreq/qtf branches, so Spark reuses it
    # (ReusedExchange) instead of re-exploding the corpus per branch
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("double").alias("dl"))
    stats = F.broadcast(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        )
    )
    q = [t.lower() for t in query_terms]
    qtf = tf.filter(F.col("term").isin(q))
    dfreq = F.broadcast(
        qtf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    )
    contrib = (
        qtf.join(dfreq, "term")
        .join(dl, id_col)
        .crossJoin(stats)
        .withColumn(
            "contrib",
            F.log(
                (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
                + 1.0
            )
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
    max_postings: int = 100,
) -> DataFrame:
    """Posting lists: (term, df_t, postings) where ``postings`` is the
    first ``max_postings`` doc ids ascending, comma-joined.

    Scale: ONE term-keyed shuffle does everything — a window over the tf
    relation yields both the full document frequency (count) and a
    per-term rank, the rank filter truncates stopword-class postings
    BEFORE ``collect_list`` ever buffers them, so no aggregation buffer
    holds more than ``max_postings`` entries no matter how common the
    term. (A collect-then-slice formulation would buffer the entire
    posting list of every stopword in a single agg row — the classic
    inverted-index OOM.)
    """
    tf = doc_terms(df, id_col, text_col)
    w = Window.partitionBy("term")
    ranked = tf.withColumn(
        "df_t", F.count(F.lit(1)).over(w)
    ).withColumn(
        "rn", F.row_number().over(w.orderBy(F.col(id_col).asc()))
    )
    return (
        ranked.filter(
            (F.col("df_t") >= min_df) & (F.col("rn") <= max_postings)
        )
        .groupBy("term", "df_t")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
        .select("term", "df_t", "postings")
    )

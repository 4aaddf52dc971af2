"""Dense all-pairs exact-Jaccard kernel for small-vocabulary corpora.

Prefix filtering (PPJoin) collapses when the corpus vocabulary is tiny
relative to document length — template/log-structured text can have a few
hundred distinct n-grams across millions of documents, so nearly every
pair shares a "rare" prefix gram and the candidate set degenerates to all
pairs. In that regime the honest physical plan IS all-pairs, and the
fastest exact kernel is linear algebra: dictionary-encode grams to dense
ids, represent each document as a 0/1 row of a (docs × vocab) float32
matrix, and the pairwise intersection-count matrix is one BLAS GEMM
``A @ B.T`` (float32 is exact for counts < 2^24; vocab is capped far
below). Jaccard = inter / (|A| + |B| - inter).

Scale shape (mirrors ``similarity.cosine_pairs``): documents hash into
``blocks`` buckets by id; each of the B*(B+1)/2 block pairs is one
``applyInPandas`` task holding only 2n/B documents, so the O(n²) work
spreads evenly over the cluster and per-task memory is bounded by
(2n/B)·vocab floats regardless of corpus size. ``blocks`` grows with
sqrt(cluster cores) / corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_allpairs_bitmap(
    base: DataFrame,
    grams: "list[str]",
    threshold: float,
    blocks: int = 8,
) -> DataFrame:
    """All (doc_a, doc_b, jaccard >= threshold) pairs over gram-set rows.

    ``base`` is (__id, __grams array<string>); ``grams`` is the corpus's
    (by-assumption-small) distinct gram list, already collected by the
    caller's dispatch probe — it becomes the dense dictionary directly,
    so this kernel runs zero driver-blocking actions of its own before
    the GEMM job.
    """
    import pandas as pd

    spark = base.sparkSession
    vocab = len(grams)
    # vocabulary is small by dispatch precondition — ship the dictionary
    # as a broadcast Python dict and encode gram→gid inside one Arrow
    # batch map. The join-based alternative (explode + broadcast join +
    # collect_list) shuffles corpus×grams rows and costs more than the
    # GEMM itself at this vocab size.
    gid_of = {g: i for i, g in enumerate(sorted(grams))}
    bc = spark.sparkContext.broadcast(gid_of)

    def encode(batches):
        d = bc.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"],
                    "__gids": pdf["__grams"].map(lambda arr: [d[g] for g in arr]),
                }
            )

    ids = base.mapInPandas(encode, "__id long, __gids array<int>").withColumn(
        "__blk", F.pmod(F.xxhash64("__id"), F.lit(blocks))
    )
    bp = spark.createDataFrame(
        [(a, b) for a in range(blocks) for b in range(blocks) if a <= b],
        "pa int, pb int",
    )
    sides = ids.join(
        F.broadcast(bp),
        (F.col("__blk") == F.col("pa")) | (F.col("__blk") == F.col("pb")),
    ).select(
        "pa", "pb", "__id", "__gids", (F.col("__blk") == F.col("pa")).alias("__is_a")
    )

    n_vocab = int(vocab)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        same = bool(pdf["pa"].iat[0] == pdf["pb"].iat[0])
        a = pdf if same else pdf[pdf["__is_a"]]
        b = pdf if same else pdf[~pdf["__is_a"]]
        empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                              "doc_b": pd.Series(dtype="int64"),
                              "jaccard": pd.Series(dtype="float64")})
        if len(a) == 0 or len(b) == 0:
            return empty

        def dense(series):
            m = np.zeros((len(series), n_vocab), dtype=np.float32)
            for i, g in enumerate(series):
                m[i, np.asarray(g, dtype=np.int64)] = 1.0
            return m

        ma, mb = dense(a["__gids"]), dense(b["__gids"])
        pa = ma.sum(axis=1, dtype=np.int64)
        pb = mb.sum(axis=1, dtype=np.int64)
        ida = a["__id"].to_numpy()
        idb = b["__id"].to_numpy()

        # chunk the a-side so the GEMM output buffer stays ~64MB
        chunk = max(1, (64 << 20) // max(1, len(b) * 8))
        outs = []
        for lo in range(0, len(a), chunk):
            hi = min(lo + chunk, len(a))
            inter = (ma[lo:hi] @ mb.T).astype(np.int64)
            union = pa[lo:hi, None] + pb[None, :] - inter
            # DuckDB/Spark ROUND is half-up for positives; np.round is
            # half-to-even — floor(x*1e6+0.5) keeps the oracle exact
            jac = np.floor(inter / union * 1e6 + 0.5) / 1e6
            ia, ib = np.nonzero(jac >= threshold)
            i_a, i_b = ida[lo + ia], idb[ib]
            keep = i_a != i_b
            lo_id = np.minimum(i_a[keep], i_b[keep])
            hi_id = np.maximum(i_a[keep], i_b[keep])
            jj = jac[ia, ib][keep]
            if same:
                first = lo_id == i_a[keep]
                lo_id, hi_id, jj = lo_id[first], hi_id[first], jj[first]
            outs.append(
                pd.DataFrame({"doc_a": lo_id, "doc_b": hi_id, "jaccard": jj})
            )
        return pd.concat(outs) if outs else empty

    # explicit repartition on the block-pair key: the kernel shuffle is
    # tiny in bytes but quadratic in compute, so AQE's size-based coalesce
    # would collapse the B*(B+1)/2 tasks onto a few cores (2x key count
    # keeps hash-collision doubling rare; explicit numPartitions is never
    # coalesced)
    n_pairs = blocks * (blocks + 1) // 2
    return (
        sides.repartition(2 * n_pairs, "pa", "pb")
        .groupBy("pa", "pb")
        .applyInPandas(kernel, "doc_a long, doc_b long, jaccard double")
    )

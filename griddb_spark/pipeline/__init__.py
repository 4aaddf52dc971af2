"""LLM-training-data pipeline operators (beyond the reference surface).

GridDB itself stops at SQL/TQL (reference has no text/vector ops — grammar
keyword set ``sql_lexer_keyword.h`` contains nothing text-analytic); these
modules add the operations a 100 TB training-data pipeline needs, built on
the same container catalog:

- :mod:`griddb_spark.pipeline.text` — tokenization, language ID, quality
  scoring, document fingerprinting.
- :mod:`griddb_spark.pipeline.dedup` — exact, MinHash+LSH, SimHash
  deduplication.
- :mod:`griddb_spark.pipeline.similarity` — cosine top-k (brute force) and
  IVF cell-probed ANN over embedding columns.
- :mod:`griddb_spark.pipeline.multimodal` — opaque-binary media columns
  with typed metadata; decode stubs over ``mapInPandas``.
- :mod:`griddb_spark.pipeline.sampling` — deterministic (content-hash)
  uniform and stratified sampling for reproducible dataset builds.
- :mod:`griddb_spark.pipeline.decontaminate` — benchmark n-gram overlap
  detection and corpus cleaning (broadcast benchmark gram set).
- :mod:`griddb_spark.pipeline.packing` — token counting and doc-level
  sequence packing into fixed token-budget training rows.
- :mod:`griddb_spark.pipeline.quality` — Gopher-style repetition signals,
  PII redaction, URL/domain statistics (pre-dedup corpus filters).
- :mod:`griddb_spark.pipeline.sketches` — bounded-state profiling sketches
  (linear-counting distinct, histogram quantiles) whose shuffle width is
  capped by the register/bucket budget, not data cardinality.

Design rule: everything is expressed with JVM-side built-ins (higher-order
array functions, ``md5``; no Python UDFs) so the hot path stays inside
whole-stage codegen, and every deterministic operator has a DuckDB-oracle
twin in ``griddb_spark.workload``.
"""

from griddb_spark.pipeline.decontaminate import (  # noqa: F401
    benchmark_ngram_set,
    bloom_bit_set,
    bloom_contamination,
    contamination_report,
    decontaminate,
)
from griddb_spark.pipeline.retrieval import (  # noqa: F401
    bm25_search,
    doc_terms,
    inverted_index,
    tfidf_top_terms,
)
from griddb_spark.pipeline.dedup import (  # noqa: F401
    boilerplate_spans,
    canonical_best,
    canonical_filter,
    char_ngrams,
    collapse_exact,
    connected_components,
    exact_dedup,
    hamming_pairs_int,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    remove_boilerplate,
    simhash_pairs,
    span_dedup,
    with_simhash,
)
from griddb_spark.pipeline.sampling import (  # noqa: F401
    deterministic_sample,
    dsir_scores,
    dsir_select,
    hash_bucket,
    snapshot_diff,
    stratified_fixed_k,
    stratified_sample,
    mix_epochs,
    temperature_mix,
    token_bucket,
    leakage_safe_split,
    train_split,
    weighted_fixed_k,
)
from griddb_spark.pipeline.quality import (  # noqa: F401
    domain_of,
    gopher_rules,
    perplexity_buckets,
    with_gopher_keep,
    pii_scrub,
    repetition_stats,
    urls,
    with_repetition_stats,
)
from griddb_spark.pipeline.profile import (  # noqa: F401
    canonical_url,
    profile_stats,
)
from griddb_spark.pipeline.similarity import (  # noqa: F401
    ann_ivf,
    assign_clusters,
    cosine_pairs,
    cosine_pairs_ann,
    cosine_pairs_within,
    kmeans_fit,
    knn_bruteforce,
    l2_normalize,
    linear_probe_score,
    logreg_train,
    max_sim_vs_bench,
    adc_lut_df,
    ivfpq_topk,
    ivfpq_train,
    ivfpq_index_append,
    ivfpq_index_topk,
    ivfpq_index_write,
    ivfpq_probe_plan,
    ivfpq_topk_batch,
    mean_pool_vectors,
    pq_adc_topk,
    pq_adc_topk_batch,
    pq_encode,
    pq_train,
    prune_prototypes,
    quantize_int8,
    random_project,
    random_project_exact,
    rp_sign_table,
    semdedup,
    topk_recall,
)
from griddb_spark.pipeline.sketches import (  # noqa: F401
    cms_build,
    cms_estimate,
    histogram_quantile,
    hll_distinct,
    hll_oracle_sql,
    kmv_distinct,
    kmv_set_ops,
    linear_counting_distinct,
)
from griddb_spark.pipeline.text import (  # noqa: F401
    bottom_k_fingerprint,
    lang_id,
    minhash_signature,
    quality_stats,
    tokens,
    word_shingles,
)

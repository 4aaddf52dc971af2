"""Dataset profiling — the ANALYZE-TABLE / pre-training data-audit shape.

Before a 100 TB corpus feeds a training run, the first job anyone runs is
a profile: per-column null rates, distinct cardinalities, value bounds,
and string-length statistics. The reference surfaces this as the
#columns/#index meta tables plus per-container aggregation queries
(``meta_store.cpp``); training pipelines run it as a standalone audit.

One pass, pure JVM: every statistic is an aggregate expression over the
same scan (Catalyst fuses them into a single partial-agg pipeline — no
per-column jobs, no Python). Output is LONG format (one row per column)
so the profile of a 4000-column feature table is rows, not a 20k-column
monster schema.

``n_distinct`` is exact (``count_distinct``); at extreme cardinality call
with ``approx=True`` for ``approx_count_distinct`` (HLL sketch, bounded
memory, the 100 TB default) — the exact mode exists because the
differential oracle gate replays exact counts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
)


def profile_stats(
    df: DataFrame, cols: "Sequence[str] | None" = None, approx: bool = False
) -> DataFrame:
    """Per-column profile: (column, dtype, n_rows, n_null, n_distinct,
    min_repr, max_repr, avg_len). ``min_repr``/``max_repr`` are string
    renderings (one output schema for every input type); ``avg_len`` is
    the mean string length for string columns, NULL otherwise."""
    cols = list(cols) if cols is not None else list(df.columns)
    dtypes = dict(df.dtypes)
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            distinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
        if dtypes[c] == "string":
            aggs.append(
                F.round(F.avg(F.length(F.col(c))), 6).alias(f"__len_{c}")
            )
    row = df.agg(*aggs)
    # pivot the single wide row into long format driver-side: one row of
    # scalars, not data (the bounded collect is the profile itself)
    r = row.collect()[0].asDict()
    out = [
        (
            c, dtypes[c], r["__n"], r[f"__null_{c}"], r[f"__dist_{c}"],
            r[f"__min_{c}"], r[f"__max_{c}"], r.get(f"__len_{c}"),
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_null long, "
        "n_distinct long, min_repr string, max_repr string, avg_len double",
    )


#: tracking query parameters stripped by URL canonicalization (the
#: standard analytics/affiliate noise set)
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref",
)


def canonical_url(url):
    """Canonicalize a URL Column for dedup: lowercase scheme+host, strip
    the fragment, drop tracking query parameters (keeping the rest in
    their original order), trim a trailing slash from the path. Pure
    Column algebra — no UDF."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    # lowercase scheme://host (the case-insensitive parts only)
    head = F.lower(F.regexp_extract(u, r"(?i)^(https?://[^/?]*)", 1))
    tail = F.regexp_replace(u, r"(?i)^https?://[^/?]*", "")
    u = F.concat(head, tail)
    # drop tracking params in three positional passes so the remaining
    # parameters keep correct separators: '&p=v' (middle/end) vanishes,
    # a leading '?p=v&' hands its '?' to the next parameter, and a lone
    # leading '?p=v' removes the whole query
    for p in TRACKING_PARAMS:
        u = F.regexp_replace(u, rf"(?i)&{p}=[^&#]*", "")
    for p in TRACKING_PARAMS:
        u = F.regexp_replace(u, rf"(?i)\?{p}=[^&#]*&", "?")
    for p in TRACKING_PARAMS:
        u = F.regexp_replace(u, rf"(?i)\?{p}=[^&#]*$", "")
    u = F.regexp_replace(u, r"/$", "")            # trailing slash
    return u

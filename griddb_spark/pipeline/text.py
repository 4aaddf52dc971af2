"""Text-analysis expressions: tokenize, language-ID, quality, fingerprints.

All pure Column expressions (JVM-side, codegen-friendly). Each has an exact
DuckDB-SQL twin in ``griddb_spark.workload`` — the expressions are written
against the portable intersection of the two engines (md5, regex splits,
higher-order array functions), so the differential gate pins semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokenizer shared by every operator (oracle: string_split_regex)
_WS = r"\s+"

#: BPE-ish pre-tokenizer: letter runs | digit runs | single other glyph
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: stopword lexicon for quality scoring (deterministic, shared with oracles)
STOPWORDS = ("the", "a", "an", "of", "and", "or", "is", "to", "in", "on")

#: marker-token profiles for the n-gram/lexicon language heuristic,
#: priority-ordered for deterministic tie-breaks.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "with"),
    "de": ("der", "die", "und", "ist", "mit"),
    "es": ("el", "los", "las", "es", "con"),
    "fr": ("le", "les", "des", "est", "avec"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), _WS)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the MinHash unit). Documents shorter
    than ``n`` words yield an empty set.

    Built by zipping ``n`` shifted copies of the token array rather than
    slicing it inside the per-gram lambda: a lambda that closes over the
    tokenization subtree re-tokenizes the whole document once per gram
    (O(tokens²) interpreted work — measured 27 s vs 4.5 s on the 10×
    corpus). Here every outer expression is row-level; the lambda touches
    only its own zipped element.
    """
    w = tokens(col)
    shifted = [w] + [
        F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0)))
        for j in range(1, n)
    ]
    window = F.slice(
        F.arrays_zip(*shifted),
        1,
        F.greatest(F.size(w) - (n - 1), F.lit(0)),
    )
    grams = F.transform(
        window, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(n)])
    )
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles: Column | str, k: int = 32) -> Column:
    """k-permutation MinHash signature (array<bigint>).

    Permutation ``i`` is the seeded hash ``xxhash64(shingle, i)``; the
    signature element is its minimum. xxhash64 is JVM-native (no string
    round-trips), an order of magnitude cheaper than md5-hex schemes.
    Signatures only steer LSH *recall* — the dedup verdict always comes
    from an exact-Jaccard verify — so no cross-engine hash portability is
    needed here.

    When ``shingles`` is a plain column name the k-element tree is built
    as ONE parsed SQL expression: the py4j Column DSL costs a driver
    round trip per call (~2 ms), so k=32 permutations × ~5 calls each
    was ~0.3 s of per-query DRIVER latency (measured r13; the executed
    plan is identical either way — F.expr parses to the same operators).
    """
    if isinstance(shingles, str):
        return F.expr(
            "array(" + ",".join(
                f"array_min(transform(`{shingles}`, s -> xxhash64(s, {i})))"
                for i in range(k)
            ) + ")"
        )

    def keyed(i: int):
        # factory closure: a defaulted lambda arg would make pyspark treat
        # this as a 2-arg (element, index) lambda
        seed = F.lit(i)
        return lambda s: F.xxhash64(s, seed)

    return F.array(
        *[F.array_min(F.transform(shingles, keyed(i))) for i in range(k)]
    )


def bottom_k_fingerprint(col: Column | str, n: int = 8, k: int = 5) -> Column:
    """Document fingerprint: bottom-k sketch of rolling char ``n``-gram
    hashes (order-insensitive, locality-robust — the batch analog of a
    rolling/winnowing fingerprint). Returned as a comma-joined string."""
    c = F.col(col) if isinstance(col, str) else col
    pos = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
    grams = F.transform(pos, lambda i: F.md5(F.substring(c, i, n)))
    return F.array_join(F.slice(F.array_sort(F.array_distinct(grams)), 1, k), ",")


def quality_stats(col: Column | str) -> dict[str, Column]:
    """Quality-scoring feature columns + composite score in [0, 1].

    Features: char/whitespace-token/BPE-token counts, mean word length,
    punctuation ratio, stopword ratio. Score = 0.4·length + 0.3·(1-punct)
    + 0.3·min(5·stopword, 1) — a deterministic stand-in for a trained
    quality classifier.
    """
    if isinstance(col, str):
        # ONE parsed SQL expression per feature instead of ~200 py4j
        # Column calls (~0.44 s of driver latency per use, measured r13;
        # identical parsed operators — note the D suffixes: a bare SQL
        # `1.0` is DECIMAL(2,1), while F.lit(1.0) was DoubleType).
        c = f"`{col}`"
        w = f"split(trim({c}), '\\\\s+')"
        stops = ", ".join(f"'{s}'" for s in STOPWORDS)
        punct = (f"round(cast(length(regexp_replace({c}, '[A-Za-z0-9\\\\s]',"
                 f" '')) as double) / length({c}), 6)")
        stop = (f"round(cast(size(filter({w}, t -> t in ({stops}))) as"
                f" double) / size({w}), 6)")
        return {
            "n_chars": F.expr(f"cast(length({c}) as bigint)"),
            "n_tokens": F.expr(f"cast(size({w}) as bigint)"),
            "n_bpe_tokens": F.expr(
                f"cast(regexp_count({c},"
                " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]') as bigint)"),
            "mean_word_len": F.expr(
                f"round(cast(aggregate({w}, 0, (acc, t) -> acc +"
                f" length(t)) as double) / size({w}), 6)"),
            "punct_ratio": F.expr(punct),
            "stop_ratio": F.expr(stop),
            "quality_score": F.expr(
                f"least(cast(length({c}) as double) / 500.0D, 1.0D)"
                f" * 0.25D + (1.0D - {punct}) * 0.5D"
                f" + least({stop} * 5.0D, 1.0D) * 0.25D"),
        }
    c = col
    w = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(w)
    n_bpe = F.regexp_count(c, F.lit(BPE_RE))
    mean_word_len = F.round(
        F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens,
        6,
    )
    punct_ratio = F.round(
        F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double") / n_chars, 6
    )
    stop_ratio = F.round(
        F.size(F.filter(w, lambda t: t.isin(*STOPWORDS))).cast("double") / n_tokens, 6
    )
    # binary-exact weights (0.25/0.5/0.25) and NO final rounding: the
    # rounded component ratios are bit-identical across engines, so the
    # weighted sum is too — a final round() would reintroduce engine-
    # specific half-way behavior at .5e-6 boundaries
    score = (
        F.least(n_chars.cast("double") / 500.0, F.lit(1.0)) * 0.25
        + (F.lit(1.0) - punct_ratio) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.25
    )
    # counts surface as long: corpus-level sums of these columns overflow
    # int32 at 100 TB, and the BIGINT oracle twin must dtype-match exactly
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "n_bpe_tokens": n_bpe.cast("long"),
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "quality_score": score,
    }


def lang_id(col: Column | str) -> Column:
    """Lexicon language heuristic: count marker-token hits per language,
    argmax with fixed priority order; 'und' when no marker hits."""
    if isinstance(col, str):
        # one parsed expr (py4j latency — see quality_stats); the nested
        # CASE mirrors the Column loop below exactly: built lowest-
        # priority-first so earlier langs win ties
        w = f"split(trim(`{col}`), '\\\\s+')"
        cnt = {
            lang: "size(filter({w}, t -> t in ({m})))".format(
                w=w, m=", ".join(f"'{x}'" for x in markers))
            for lang, markers in LANG_MARKERS.items()
        }
        langs = list(LANG_MARKERS)
        sql = "'und'"
        for lang in reversed(langs):
            later = [cnt[o] for o in langs[langs.index(lang) + 1:]]
            if len(later) > 1:
                beats = f" AND {cnt[lang]} >= greatest({', '.join(later)})"
            elif later:
                beats = f" AND {cnt[lang]} >= {later[0]}"
            else:
                beats = ""
            sql = (f"CASE WHEN {cnt[lang]} > 0{beats} THEN '{lang}' "
                   f"ELSE {sql} END")
        return F.expr(sql)
    w = tokens(col)
    def count_in(markers):
        return F.size(F.filter(w, lambda t: t.isin(*markers)))

    counts = {lang: count_in(markers) for lang, markers in LANG_MARKERS.items()}
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    # build CASE from lowest priority upward so earlier langs win ties
    for lang in reversed(langs):
        later = [counts[o] for o in langs[langs.index(lang) + 1:]]
        beats = (
            counts[lang] >= F.greatest(*later) if len(later) > 1
            else (counts[lang] >= later[0] if later else F.lit(True))
        )
        expr = F.when((counts[lang] > 0) & beats, F.lit(lang)).otherwise(expr)
    return expr

"""Randomized differential tests for the corpus-quality operators
(repetition signals, unigram-LM scoring, PII scrub) vs pure-Python
references on synthetic corpora."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

VOCAB = [f"w{i}" for i in range(12)]


def _mk_docs(rng, n_docs):
    return [
        (i, " ".join(rng.choices(VOCAB, k=rng.randint(1, 60))))
        for i in range(n_docs)
    ]


@pytest.mark.parametrize("seed", range(4))
def test_repetition_stats_random_vs_reference(spark, seed):
    from griddb_spark.pipeline import with_repetition_stats

    rng = random.Random(500 + seed)
    docs = _mk_docs(rng, rng.randint(3, 12))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in with_repetition_stats(df, "text").collect()}
    for doc_id, text in docs:
        w = text.split()
        bg = [f"{a} {b}" for a, b in zip(w, w[1:])]
        r = got[doc_id]
        assert abs(r.dup_word_ratio - round(1 - len(set(w)) / len(w), 6)) < 1e-9
        assert abs(r.top_word_ratio - round(Counter(w).most_common(1)[0][1] / len(w), 6)) < 1e-9
        if bg:
            assert abs(r.dup_bigram_ratio - round(1 - len(set(bg)) / len(bg), 6)) < 1e-9
            assert abs(r.top_bigram_ratio - round(Counter(bg).most_common(1)[0][1] / len(bg), 6)) < 1e-9
        else:
            assert r.dup_bigram_ratio == 0.0 and r.top_bigram_ratio == 0.0


@pytest.mark.parametrize("seed", range(4))
def test_unigram_logprob_random_vs_reference(spark, seed):
    from griddb_spark.pipeline.quality import unigram_logprob

    rng = random.Random(600 + seed)
    docs = _mk_docs(rng, rng.randint(2, 10))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    counts = Counter(t for _, text in docs for t in text.split())
    total = sum(counts.values())
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    for doc_id, text in docs:
        toks = text.split()
        want = sum(math.log(counts[t] / total) for t in toks) / len(toks)
        r = got[doc_id]
        assert r.n_tokens == len(toks)
        assert abs(r.avg_logprob - round(want, 6)) < 1e-5, doc_id


@pytest.mark.parametrize("seed", range(4))
def test_pii_scrub_random_planted_counts(spark, seed):
    from griddb_spark.pipeline import pii_scrub

    rng = random.Random(700 + seed)
    rows = []
    for i in range(8):
        n_em = rng.randint(0, 3)
        n_ph = rng.randint(0, 2)
        n_ip = rng.randint(0, 2)
        parts = ["filler text only here"]
        parts += [f"user{i}x{j}@mail{j}.example.org" for j in range(n_em)]
        parts += [f"+{rng.randint(1, 99)}-{rng.randint(100, 999)}-{rng.randint(1000, 9999)}" for _ in range(n_ph)]
        parts += [f"10.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(1, 254)}" for _ in range(n_ip)]
        rng.shuffle(parts)
        rows.append((i, n_em, n_ph, n_ip, " ".join(parts)))
    df = spark.createDataFrame(rows, "i long, em int, ph int, ip int, text string")
    cols = pii_scrub("text")
    out = df.select("i", "em", "ph", "ip", *[c.alias(n) for n, c in cols.items()])
    for r in out.collect():
        assert (r.n_emails, r.n_phones, r.n_ips) == (r.em, r.ph, r.ip), r.i
        if r.em + r.ph + r.ip:
            assert "@" not in r.scrubbed or "<EMAIL>" in r.scrubbed
        assert "filler text only here" in r.scrubbed


def test_c4_line_filter_matches_python_reference(spark):
    """Property: c4_line_filter == a plain-Python replay of the C4 rules
    on random multi-line documents (random punctuation, word counts,
    badwords, braces)."""
    import random

    from griddb_spark.pipeline.quality import c4_line_filter

    rng = random.Random(5)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = []
    for i in range(120):
        lines = []
        for _ in range(rng.randint(0, 6)):
            ws = [rng.choice(words) for _ in range(rng.randint(1, 8))]
            line = " ".join(ws)
            r = rng.random()
            if r < 0.3:
                line += "."
            elif r < 0.4:
                line += "!"
            if rng.random() < 0.1:
                line += " {"
            if rng.random() < 0.1:
                line = "lorem ipsum " + line + "."
            lines.append(line)
        docs.append((i, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r.doc_id: (r.clean_text, r.n_lines, r.n_kept, r.keep)
           for r in c4_line_filter(df, "doc_id", "text",
                                   min_words=3, min_kept_lines=2).collect()}

    def ref(text):
        lines = text.split("\n")
        kept = [
            ln for ln in lines
            if ln and ln[-1] in ".!?"
            and len([w for w in ln.strip().split(" ") if w]) >= 3
            and "lorem ipsum" not in ln.lower()
            and "{" not in ln
        ]
        return ("\n".join(kept), len(lines), len(kept),
                1 if len(kept) >= 2 else 0)

    for i, text in docs:
        assert got[i] == ref(text), (i, text, got[i], ref(text))


def test_decontaminate_spans_matches_python_reference(spark):
    """Property: span-level decontamination == a Python replay (chunked
    corpus spans vs overlapping bench k-grams) on random word soup."""
    import random

    from griddb_spark.pipeline.decontaminate import decontaminate_spans

    rng = random.Random(9)
    vocab = [f"w{j}" for j in range(12)]
    corpus = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 20))))
              for i in range(80)]
    bench = [(1000 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9))))
             for i in range(6)]
    cdf = spark.createDataFrame(corpus, "doc_id int, text string")
    bdf = spark.createDataFrame(bench, "doc_id int, text string")
    got = {r.doc_id: (r.clean_text, r.n_spans, r.n_removed)
           for r in decontaminate_spans(cdf, bdf, "doc_id", "text",
                                        k=3).collect()}
    bgrams = set()
    for _, t in bench:
        w = t.split()
        for j in range(len(w) - 2):
            bgrams.add(" ".join(w[j:j + 3]))
    for i, t in corpus:
        w = t.split()
        spans = [" ".join(w[j:j + 3]) for j in range(0, len(w), 3)]
        kept = [s for s in spans if s not in bgrams]
        want = (" ".join(kept), len(spans), sum(s in bgrams for s in spans))
        assert got[i] == want, (i, t, got[i], want)

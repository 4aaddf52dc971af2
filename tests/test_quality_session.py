"""Unit tests for corpus-quality filters (repetition / PII / URLs),
embedding preprocessing, and gap-based sessionization. The cross-engine
differential gate runs through the workload entries; these pin the
semantics on hand-computed fixtures."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def test_repetition_stats_hand_computed(spark):
    from griddb_spark.pipeline import with_repetition_stats

    # "a a b" → 3 tokens {a:2, b:1}; bigrams ["a a", "a b"] all distinct
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    r = with_repetition_stats(df, "text").collect()[0]
    assert math.isclose(r.dup_word_ratio, 1 - 2 / 3, abs_tol=1e-6)
    assert math.isclose(r.top_word_ratio, 2 / 3, abs_tol=1e-6)
    assert r.dup_bigram_ratio == 0.0
    assert math.isclose(r.top_bigram_ratio, 0.5, abs_tol=1e-6)


def test_repetition_stats_single_token_doc(spark):
    from griddb_spark.pipeline import with_repetition_stats

    r = with_repetition_stats(
        spark.createDataFrame([(1, "hello")], "doc_id long, text string"),
        "text",
    ).collect()[0]
    assert r.dup_word_ratio == 0.0 and r.top_word_ratio == 1.0
    assert r.dup_bigram_ratio == 0.0 and r.top_bigram_ratio == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    from griddb_spark.pipeline import pii_scrub

    txt = (
        "mail bob.smith+x@corp.example.co.uk or +44-123-4567 "
        "from 192.168.0.1 twice: a@b.org"
    )
    cols = pii_scrub("text")
    r = (
        spark.createDataFrame([(txt,)], "text string")
        .select(*[c.alias(n) for n, c in cols.items()])
        .collect()[0]
    )
    assert r.n_emails == 2 and r.n_phones == 1 and r.n_ips == 1
    assert "<EMAIL>" in r.scrubbed and "<PHONE>" in r.scrubbed
    assert "<IP>" in r.scrubbed
    assert "bob.smith" not in r.scrubbed and "192.168" not in r.scrubbed


def test_pii_scrub_clean_text_untouched(spark):
    from griddb_spark.pipeline import pii_scrub

    cols = pii_scrub("text")
    r = (
        spark.createDataFrame([("no pii here at all",)], "text string")
        .select(*[c.alias(n) for n, c in cols.items()])
        .collect()[0]
    )
    assert r.scrubbed == "no pii here at all"
    assert r.n_emails == r.n_phones == r.n_ips == 0


def test_url_extraction_and_domains(spark):
    from griddb_spark.pipeline import domain_of, urls

    df = spark.createDataFrame(
        [("see https://a.example.com/x/1 and http://b.net plain text",)],
        "text string",
    )
    out = df.select(F.explode(urls("text")).alias("u")).select(
        "u", domain_of(F.col("u")).alias("d")
    )
    rows = {r.d for r in out.collect()}
    assert rows == {"a.example.com", "b.net"}


def test_l2_normalize_unit_norm_and_zero_passthrough(spark):
    from griddb_spark.pipeline import l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id long, v array<float>"
    )
    rows = {
        r.id: r.u
        for r in df.select("id", l2_normalize(F.col("v")).alias("u")).collect()
    }
    assert math.isclose(rows[1][0], 0.6, abs_tol=1e-9)
    assert math.isclose(rows[1][1], 0.8, abs_tol=1e-9)
    assert rows[2] == [0.0, 0.0]  # zero vector: no NaNs


def test_quantize_int8_roundtrip_error_bounded(spark):
    from griddb_spark.pipeline import quantize_int8

    vec = [0.1, -0.5, 0.25, 1.0, -1.0]
    qz = quantize_int8(F.col("v"))
    r = (
        spark.createDataFrame([(vec,)], "v array<float>")
        .select(qz["q"].alias("q"), qz["scale"].alias("s"))
        .collect()[0]
    )
    assert max(r.q) == 127 and min(r.q) == -127
    for orig, code in zip(vec, r.q):
        assert abs(code / r.s - orig) <= 0.5 / r.s + 1e-6


def _ts(day, hour, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


def test_sessionize_gap_splits_and_end_convention(spark):
    from griddb_spark.operators.sessionize import sessionize

    rows = [
        (1, _ts(1, 0), 1.0),
        (1, _ts(1, 0, 30), 2.0),   # same session (30m < 1h gap)
        (1, _ts(1, 3), 4.0),       # 2.5h gap → new session
        (2, _ts(1, 5), 8.0),       # other user: own numbering
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.session_id): r
        for r in sessionize(
            df, gap_minutes=60, aggs={"sum_value": F.sum("value")}
        ).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11.n_events == 2 and s11.sum_value == 3.0
    assert s11.session_start == _ts(1, 0)
    assert s11.session_end == _ts(1, 1, 30)  # last event + gap
    assert out[(1, 2)].n_events == 1 and out[(2, 1)].sum_value == 8.0


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """session_window (streaming state) and gaps-and-islands (batch) agree
    row-for-row on the same input."""
    from griddb_spark.operators.sessionize import (
        sessionize,
        sessionize_stream,
    )
    from griddb_spark.streaming import run_to_memory

    rows = [
        (1, _ts(1, 0), 1.0),
        (1, _ts(1, 0, 45), 2.0),
        (1, _ts(1, 4), 3.0),
        (2, _ts(2, 1), 5.0),
        (2, _ts(2, 1, 59), 6.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    path = str(tmp_path / "ev")
    df.write.parquet(path)

    stream = spark.readStream.schema(df.schema).parquet(path)
    got = run_to_memory(
        sessionize_stream(stream, gap_minutes=120), "sess_ut", mode="complete"
    )
    want = sessionize(df, gap_minutes=120).drop("session_id")
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert sorted(map(tuple, got.select(cols).collect())) == sorted(
        map(tuple, want.select(cols).collect())
    )


def test_unigram_logprob_hand_computed(spark):
    # corpus tokens: a,a,a,b → P(a)=3/4, P(b)=1/4
    from griddb_spark.pipeline.quality import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a"), (2, "a b")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in unigram_logprob(df).collect()}
    assert rows[1].n_tokens == 2 and rows[2].n_tokens == 2
    assert abs(rows[1].avg_logprob - math.log(0.75)) < 1e-6
    want2 = (math.log(0.75) + math.log(0.25)) / 2
    assert abs(rows[2].avg_logprob - want2) < 1e-6
    assert abs(rows[2].ppl - round(math.exp(-round(want2, 6)), 2)) < 1e-9


def test_chunk_documents_windows_and_tail(spark):
    from griddb_spark.pipeline.packing import chunk_documents

    # 10 tokens, size=5, overlap=2 → starts 1,4,7 (stride 3)
    text = " ".join(f"t{i}" for i in range(1, 11))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_start, r.n_chunk_tokens, r.chunk_text)
        for r in chunk_documents(df, size=5, overlap=2).collect()
    )
    assert [r[:3] for r in rows] == [(0, 1, 5), (1, 4, 5), (2, 7, 4)]
    assert rows[0][3] == "t1 t2 t3 t4 t5"
    assert rows[2][3] == "t7 t8 t9 t10"  # short tail covers the document
    # every token appears in some chunk
    covered = set(" ".join(r[3] for r in rows).split())
    assert covered == set(text.split())


def test_chunk_documents_short_doc_single_chunk(spark):
    from griddb_spark.pipeline.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = chunk_documents(df, size=5, overlap=2).collect()
    assert len(rows) == 1 and rows[0].chunk_text == "a b"


def test_mix_to_token_budget_rates(spark):
    from griddb_spark.pipeline.sampling import mix_to_token_budget

    # source A: 10 docs x 100 tokens = 1000; source B: 2 docs x 50 = 100
    rows = [(i, "A", 100) for i in range(10)] + [(100 + i, "B", 50) for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    kept = mix_to_token_budget(df, "doc_id", "source", "n_tokens", 500)
    by_src = {
        r.source: r.cnt
        for r in kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_src.get("B") == 2          # under budget: all kept
    assert 0 < by_src.get("A", 0) < 10   # over budget: downsampled (~half)
    # determinism: same decision under a different partitioning
    again = mix_to_token_budget(
        df.repartition(7), "doc_id", "source", "n_tokens", 500
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, kept.collect()))


def test_bpe_pair_counts_hand_computed(spark):
    from griddb_spark.pipeline.packing import bpe_pair_counts

    # words: "abab" → ab,ba,ab ; "ab" → ab ; "x" skipped (length 1)
    df = spark.createDataFrame([("abab ab x",)], "text string")
    rows = [(r.pair, r.n) for r in bpe_pair_counts(df, "text", top_k=10).collect()]
    assert rows[0] == ("ab", 3) and ("ba", 1) in rows
    assert all(len(p) == 2 for p, _ in rows)


def test_quality_threshold_flags_bottom_quartile(spark):
    from griddb_spark.pipeline.quality import quality_threshold_flag

    rows = [(i, "A", float(i)) for i in range(1, 9)]  # scores 1..8
    df = spark.createDataFrame(rows, "id long, src string, score double")
    out = {r.id: r for r in quality_threshold_flag(df, "score", "src", 0.25).collect()}
    # exact p25 of 1..8 = 2.75 → ids 1,2 below
    assert {i for i, r in out.items() if r.below} == {1, 2}
    assert abs(out[1]["__threshold"] - 2.75) < 1e-9


def test_write_training_shards_deterministic_and_bounded(spark, tmp_path):
    import glob

    from griddb_spark.pipeline.sampling import write_training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    p1 = str(tmp_path / "a")
    m1 = {r.shard: r.n_rows for r in
          write_training_shards(df, p1, "doc_id", n_shards=4).collect()}
    assert sum(m1.values()) == 200 and set(m1) <= set(range(4))
    # same assignment under a different input partitioning
    p2 = str(tmp_path / "b")
    m2 = {r.shard: r.n_rows for r in
          write_training_shards(df.repartition(13), p2, "doc_id", n_shards=4).collect()}
    assert m1 == m2
    # one file per shard (clustered write, no task x shard explosion)
    for s in m1:
        files = glob.glob(f"{p1}/__shard={s}/*.parquet")
        assert len(files) == 1, (s, files)

"""Edge-case semantics for the TQL time-series operators, checked against
hand-computed expectations pinned to the reference implementation
(selection_func_impl.h, aggregation_func.h:780-880)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from griddb_spark.operators import (
    aggregate_time_range,
    group_by_range,
    match_recognize,
    max_rows,
    time_avg,
    time_interpolated,
    time_next,
    time_prev,
    time_sampling,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        (_ts("2024-01-01 00:00:00"), 10.0, "a"),
        (_ts("2024-01-01 00:00:10"), 20.0, "b"),
        (_ts("2024-01-01 00:00:30"), 40.0, "c"),
        (_ts("2024-01-01 00:01:00"), 10.0, "d"),
    ]
    return spark.createDataFrame(rows, "ts timestamp, v double, tag string")


def test_time_next_exact_vs_only(series):
    at = "2024-01-01 00:00:10"
    assert time_next(series, at).collect()[0]["tag"] == "b"
    assert time_next(series, at, only=True).collect()[0]["tag"] == "c"
    assert time_prev(series, at).collect()[0]["tag"] == "b"
    assert time_prev(series, at, only=True).collect()[0]["tag"] == "a"
    # outside range → empty
    assert time_next(series, "2024-01-01 00:02:00").count() == 0
    assert time_prev(series, "2023-12-31 00:00:00").count() == 0


def test_time_interpolated_midpoint_and_edges(series):
    # midpoint between 20.0@10s and 40.0@30s at t=20s → 30.0; other cols
    # come from the previous row (tag='b'), ts set to t.
    row = time_interpolated(series, "2024-01-01 00:00:20", "v").collect()
    assert len(row) == 1
    assert row[0]["v"] == 30.0
    assert row[0]["tag"] == "b"
    assert row[0]["ts"] == _ts("2024-01-01 00:00:20")
    # exact hit → the row itself
    row = time_interpolated(series, "2024-01-01 00:00:30", "v").collect()
    assert row[0]["v"] == 40.0 and row[0]["tag"] == "c"
    # before first / after last → empty (selection_func_impl.h:404-409)
    assert time_interpolated(series, "2023-12-31 23:59:59", "v").count() == 0
    assert time_interpolated(series, "2024-01-01 00:02:00", "v").count() == 0


def test_time_sampling_grid(series):
    # grid every 10s from 00:00:00 to 00:01:00; all grid points lie on or
    # between data rows → 7 samples; 00:00:20 interpolates to 30,
    # 00:00:40/50 interpolate between 40@30s and 10@60s.
    out = {r["ts"]: r["v"] for r in
           time_sampling(series, "2024-01-01 00:00:00", "2024-01-01 00:01:00",
                         10, "SECOND", col="v").collect()}
    assert len(out) == 7
    assert out[_ts("2024-01-01 00:00:20")] == 30.0
    assert out[_ts("2024-01-01 00:00:40")] == 30.0
    assert abs(out[_ts("2024-01-01 00:00:50")] - 20.0) < 1e-9
    assert out[_ts("2024-01-01 00:01:00")] == 10.0
    # grid extending past the last row stops at the last row
    out2 = time_sampling(series, "2024-01-01 00:00:00", "2024-01-01 00:10:00",
                         10, "SECOND", col="v")
    assert out2.count() == 7
    # grid starting before the first row skips the unreachable points
    out3 = time_sampling(series, "2023-12-31 23:59:30", "2024-01-01 00:01:00",
                         10, "SECOND", col="v")
    assert out3.agg(F.min("ts")).collect()[0][0] == _ts("2024-01-01 00:00:00")


def test_time_avg_weights(series):
    # reference formula: w_i = mid(t_i, t_i+1) - mid(t_i-1, t_i)
    # t = [0, 10, 30, 60] s → mids = [5, 20, 45]
    # w = [5, 15, 25, 15] (s) ⇒ (10*5 + 20*15 + 40*25 + 10*15) / 60 = 1500/60
    got = time_avg(series, "v").collect()[0]["time_avg"]
    assert abs(got - 1500.0 / 60.0) < 1e-9
    # single row → its own value
    one = series.limit(1)
    assert time_avg(one, "v").collect()[0]["time_avg"] == 10.0


def test_aggregate_time_range_variants(series):
    r = aggregate_time_range(series, "2024-01-01 00:00:00",
                             "2024-01-01 00:00:30", "v", "AVERAGE")
    assert abs(r.collect()[0]["aggregation_result"] - (10 + 20 + 40) / 3) < 1e-9
    r = aggregate_time_range(series, "2024-01-01 00:00:00",
                             "2024-01-01 00:01:00", "v", "COUNT")
    assert r.collect()[0]["aggregation_result"] == 4


def test_max_rows_ties(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)], "id long, v double")
    got = sorted(r["id"] for r in max_rows(df, "v").collect())
    assert got == [2, 3]


def test_group_by_range_fill_edges(spark):
    # buckets of 10s over [0, 50]; data only in buckets 10-20s and 40-50s →
    # empty buckets at 0, 20, 30 (leading / interior)
    rows = [
        (_ts("2024-01-01 00:00:12"), 10.0),
        (_ts("2024-01-01 00:00:18"), 20.0),
        (_ts("2024-01-01 00:00:45"), 60.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    kw = dict(start="2024-01-01 00:00:00", end="2024-01-01 00:00:50")

    def run(fill):
        out = group_by_range(df, "ts", 10, "SECOND",
                             {"av": F.avg("v")}, fill=fill, **kw)
        return {r["ts"].second: r["av"] for r in out.collect()}

    assert run("NONE") == {10: 15.0, 40: 60.0}
    filled = run("NULL")
    assert filled[0] is None and filled[20] is None and filled[30] is None
    prev = run("PREVIOUS")
    assert prev[0] is None            # no previous non-empty bucket → NULL
    assert prev[20] == 15.0 and prev[30] == 15.0
    lin = run("LINEAR")
    assert lin[0] is None             # missing left neighbor → NULL
    # interpolation on the bucket key: buckets 10→15.0, 40→60.0
    assert abs(lin[20] - 30.0) < 1e-9
    assert abs(lin[30] - 45.0) < 1e-9
    assert lin[50] is None            # trailing empty, no right neighbor


def test_group_by_range_per_series(spark):
    rows = [
        ("a", _ts("2024-01-01 00:00:05"), 1.0),
        ("a", _ts("2024-01-01 00:00:25"), 3.0),
        ("b", _ts("2024-01-01 00:00:15"), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = group_by_range(df, "ts", 10, "SECOND", {"av": F.avg("v")},
                         start="2024-01-01 00:00:00", end="2024-01-01 00:00:29",
                         fill="PREVIOUS", by=["k"])
    got = {(r["k"], r["ts"].second): r["av"] for r in out.collect()}
    assert got[("a", 0)] == 1.0 and got[("a", 10)] == 1.0 and got[("a", 20)] == 3.0
    assert got[("b", 0)] is None and got[("b", 10)] == 5.0 and got[("b", 20)] == 5.0


def test_match_recognize_up_down(spark):
    # the reference 5.9 release-note example: PATTERN (UP+ DOWN+)
    rows = [
        ("devA", _ts("2025-09-01 00:00:00"), 10.0),
        ("devA", _ts("2025-09-02 00:00:00"), 12.0),
        ("devA", _ts("2025-09-03 00:00:00"), 15.0),
        ("devA", _ts("2025-09-04 00:00:00"), 13.0),
        ("devA", _ts("2025-09-05 00:00:00"), 11.0),
        ("devB", _ts("2025-09-01 00:00:00"), 5.0),
        ("devB", _ts("2025-09-02 00:00:00"), 4.0),
    ]
    df = spark.createDataFrame(rows, "device_id string, ts timestamp, value double")
    out = match_recognize(
        df,
        pattern="UP+ DOWN+",
        define={"UP": "value > PREV(value)", "DOWN": "value < PREV(value)"},
        measures={"start_time": "FIRST(ts)", "end_time": "LAST(ts)",
                  "peak": "ABS(FIRST(value) - LAST(value))"},
        partition_by=["device_id"],
        order_by="ts",
    ).collect()
    assert len(out) == 1  # devB never goes up
    m = out[0]
    assert m["device_id"] == "devA"
    # UP needs PREV → match starts at row 2 (12.0)
    assert m["start_time"] == _ts("2025-09-02 00:00:00")
    assert m["end_time"] == _ts("2025-09-05 00:00:00")
    assert m["match_no"] == 1


def test_match_recognize_all_rows_and_skip(spark):
    rows = [(i, float(v)) for i, v in enumerate([1, 2, 1, 3, 4, 2])]
    df = spark.createDataFrame(rows, "seq long, v double")
    out = match_recognize(
        df,
        pattern="UP DOWN",
        define={"UP": "v > PREV(v)", "DOWN": "v < PREV(v)"},
        measures={"mn": "MATCH_NUMBER()"},
        order_by="seq",
        all_rows=True,
    ).collect()
    # matches: rows(1,2)=2.0→1.0 and rows(4,5)=4.0→2.0 (skip past last row)
    assert [(r["seq"], r["classifier"], r["mn"]) for r in out] == [
        (1, "UP", 1), (2, "DOWN", 1), (4, "UP", 2), (5, "DOWN", 2),
    ]


def test_match_recognize_alternation_star(spark):
    rows = [(i, t) for i, t in enumerate(["a", "b", "b", "c", "a", "c"])]
    df = spark.createDataFrame(rows, "seq long, t string")
    out = match_recognize(
        df,
        pattern="A B* C",
        define={"A": "t == 'a'", "B": "t == 'b'", "C": "t == 'c'"},
        measures={"first_seq": "FIRST(seq)", "last_seq": "LAST(seq)"},
        order_by="seq",
    ).collect()
    got = sorted((r["first_seq"], r["last_seq"]) for r in out)
    assert got == [(0, 3), (4, 5)]


def test_nano_ts_roundtrip(spark, tmp_path):
    """Sub-µs fidelity on a self-written TIMESTAMP(NANOS) fixture: the
    session's nanosAsLong read preserves exactly the parquet ns values as
    epoch-nanos LONG (GridDB NANO_TIMESTAMP, data_store_common.h type 22;
    driver testdata is timestamp[us], so ns fidelity is proven here), and
    the catalog-style µs projection truncates identically to pyarrow."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_704_067_200_000_000_000  # 2024-01-01 epoch-nanos
    want = {i: base_ns + i * 1_000_000_007 + 123 for i in range(50)}
    path = str(tmp_path / "ns_events.parquet")
    pq.write_table(
        pa.table({
            "event_id": pa.array(list(want), type=pa.int64()),
            "ts": pa.array(
                list(want.values()), type=pa.timestamp("ns")
            ),
        }),
        path,
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    df = spark.read.parquet(path)
    assert dict(df.dtypes)["ts"] == "bigint", "nanosAsLong not in effect"
    got = {r.event_id: r.ts for r in df.collect()}
    assert got == want
    assert any(v % 1000 != 0 for v in want.values()), "fixture has no sub-µs"
    # µs projection (integer div, not double) truncates exactly
    micro = {
        r.event_id: r.us
        for r in df.select(
            "event_id", F.expr("ts div 1000").alias("us")
        ).collect()
    }
    assert micro == {k: v // 1000 for k, v in want.items()}

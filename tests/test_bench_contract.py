"""The bench stdout contract line must survive the driver's capture.

Two rounds lost data to tail-truncated captures of that single JSON
line (BENCH_r03: 65 of 138 timings; BENCH_r12: "parsed": null, which
blinded the whole r12→r13 per-query comparison — PERF_r13 n_common=0).
bench.py therefore emits the line with compact separators and 3-dp
rounding; this test pins the full-suite line size far under the
observed truncation range, against the REAL query inventory, so a
future registry growth or a verbose record field fails loudly here
instead of silently in the driver's artifact.
"""

from __future__ import annotations

import json

# importing the registry does not start Spark: @query only records the
# (name, fn, oracle_sql) triple at module import
from griddb_spark import workload

LINE_BYTE_CAP = 32 * 1024


def _synthetic_record() -> dict:
    names = ["_ann_training", *workload.QUERIES]
    # worst realistic shape: every timing at the 3-dp max width a real
    # gate produces (xxx.xxx), every gate retried (two attempts each),
    # plus the run-level verdict fields
    queries = {n: 123.456 for n in names}
    record = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "retried": {n: [123.456, 123.456] for n in names},
        "median_ratio": 1.2345,
        "run_contaminated": True,
    }
    return record


def test_full_suite_contract_line_under_cap():
    line = json.dumps(_synthetic_record(), separators=(",", ":"))
    assert len(line.encode()) < LINE_BYTE_CAP, (
        f"bench contract line would be {len(line)} bytes with every gate "
        f"retried — over the {LINE_BYTE_CAP} B truncation-safety cap; "
        "trim the record or revisit the serialization"
    )


def test_compact_line_matches_bench_serialization():
    """bench.py's stdout serialization: compact separators, 3-dp values.

    Guards the exact properties the cap computation assumes — no spaces
    after separators, floats at most 3 decimal places.
    """
    rec = {"queries": {"a": round(1.23456, 3)}, "value": round(9.87654, 3)}
    line = json.dumps(rec, separators=(",", ":"))
    assert " " not in line
    assert line == '{"queries":{"a":1.235},"value":9.877}'

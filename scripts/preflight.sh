#!/bin/sh
# Round snapshot gate: a round must never ship a crashed bench or a red
# oracle gate (round 2 shipped BENCH_r02.json as a stack trace because no
# such check existed). Run before snapshotting; non-zero exit = do not ship.
set -e
cd "$(dirname "$0")/.."

echo "== preflight: sample-rotation canary (window must not re-sample previous round) =="
python - <<'EOF'
# The invariant round 10 violated: the driver certifies the first ~50
# iteration-order entries of queries(); if they overlap the previous
# round's CORRECTNESS sample, the round's certification budget is burned
# re-certifying fresh queries (VERDICT r10 item 6).
import glob, json, os, re, sys
sys.path.insert(0, os.getcwd())
import __spark_entry__ as e
files = {}
for p in glob.glob("CORRECTNESS_r*.json"):
    m = re.search(r"r(\d+)\.json$", p)
    if m:
        files[int(m.group(1))] = set(json.load(open(p)))
if files:
    prev = files[max(files)]
    window = list(e.queries())[:50]
    overlap = sum(1 for n in window if n in prev)
    assert overlap < 10, (
        f"rotation broken: window re-samples {overlap}/50 of round {max(files)}"
    )
    print(f"rotation OK: {overlap}/50 overlap with round {max(files)}'s sample")
EOF

echo "== preflight: driver simulation (sf0.01 oracle gate) =="
python scripts/driver_sim.py

echo "== preflight: bench (must exit 0 and emit parseable JSON) =="
python bench.py > /tmp/preflight_bench.json
python - <<'EOF'
import json
d = json.load(open("/tmp/preflight_bench.json"))
assert d["queries"], "bench emitted no per-query timings"
print(f"bench OK: {d['value']}s total, {len(d['queries'])} queries at sf={d['sf']}")
EOF
echo "== preflight: PASS =="

#!/bin/sh
# Round snapshot gate: a round must never ship a crashed bench or a red
# oracle gate (round 2 shipped BENCH_r02.json as a stack trace because no
# such check existed). Run before snapshotting; non-zero exit = do not ship.
set -e
cd "$(dirname "$0")/.."

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

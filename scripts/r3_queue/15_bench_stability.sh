#!/bin/bash
# VERDICT round-3 item 7: two consecutive bench captures on an idle chip,
# docs must quote the artifact. Runs between campaign phases so the chip
# has no concurrent work.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
[ "$rem" -lt 1200 ] && { echo "DEADLINE: skip bench stability"; exit 0; }
for i in 1 2; do
  timeout 900 python bench.py > results/bench_r3_capture_$i.json 2> results/bench_r3_capture_$i.log
  cat results/bench_r3_capture_$i.json
done
python - <<'PY'
import json
a = json.load(open("results/bench_r3_capture_1.json"))
b = json.load(open("results/bench_r3_capture_2.json"))
lo, hi = sorted([a["value"], b["value"]])
print(json.dumps({"capture_1": a["value"], "capture_2": b["value"],
                  "spread_pct": 100.0 * (hi - lo) / hi}))
PY
echo "BENCH STABILITY DONE"

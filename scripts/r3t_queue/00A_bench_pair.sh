#!/bin/bash
# Idle-chip bench stability pair (VERDICT r2 weak #2 discipline): two
# consecutive median-of-5 captures after the deep runs, before the
# wishart filler. Written to results/ for docs-of-record comparison with
# the driver's BENCH_r03.json.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1500 ]; then echo "DEADLINE: skip bench pair"; exit 0; fi
timeout 600 python bench.py > results/bench_r3_tail_a.json 2>/dev/null \
  || echo "bench a failed"
timeout 600 python bench.py > results/bench_r3_tail_b.json 2>/dev/null \
  || echo "bench b failed"
cat results/bench_r3_tail_a.json results/bench_r3_tail_b.json
echo "BENCH PAIR DONE"

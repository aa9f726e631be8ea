#!/bin/bash
# Iters-scaling study: is the 2x bench spread (1.5e10 reconcile vs
# 3.0-3.4e10 tail pair, both forced-sync) per-dispatch tunnel latency
# contaminating short captures? Rate rising+plateauing with iters says
# yes -> bench.py should amortize; flat says real chip-state variance.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 900 ]; then echo "DEADLINE: skip amortize study"; exit 0; fi
timeout 900 python scripts/bench_amortize.py || echo "amortize failed"
echo "BENCH AMORTIZE DONE"

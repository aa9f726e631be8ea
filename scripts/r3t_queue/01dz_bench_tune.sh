#!/bin/bash
# Bench capture-size study (see scripts/bench_tune.py): find where
# attempts/s plateaus vs device-work-per-capture so bench.py measures
# the chip, not the tunnel's post-outage dispatch latency.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1200 ]; then echo "DEADLINE: skip bench tune"; exit 0; fi
timeout 1800 python scripts/bench_tune.py
echo "BENCH TUNE DONE"

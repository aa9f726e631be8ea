#!/bin/bash
# Honest forced-sync throughput of the colored Pallas kernels (the
# north-star path) on an idle chip — see scripts/bench_honest2.py.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1200 ]; then echo "DEADLINE: skip pallas honest bench"; exit 0; fi
timeout 2400 python scripts/bench_honest2.py
echo "HONEST PALLAS BENCH DONE"

#!/bin/bash
# Honest idle-chip bench with forced device->host sync (see
# scripts/bench_honest.py): the number the docs of record will quote.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 900 ]; then echo "DEADLINE: skip honest bench"; exit 0; fi
timeout 1500 python scripts/bench_honest.py
echo "HONEST BENCH DONE"

#!/bin/bash
# Resume the N=34..40 exact-verification sweep (stopped at 13:21 UTC to
# prioritize the beam chimera program); resumable JSONL, capped budget.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 2400 ]; then echo "DEADLINE: skip exact verify resume"; exit 0; fi
budget=$(( rem - 1200 )); [ "$budget" -gt 5400 ] && budget=5400
timeout $(( budget + 300 )) python scripts/run_exact_verify_tpu.py \
  --min-n 28 --max-n 40 --budget-s "$budget" \
  || echo "exact verify resume failed/timed out"
echo "EXACT VERIFY RESUME DONE"

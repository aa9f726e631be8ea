#!/bin/bash
# Re-derive EVERY shipped wishart truth at N=34..40 (63 folders, ~3150
# instances) with the exact Pallas MITM tier — host-infeasible sizes,
# seconds per instance on the MXU (int8 digit planes where the instance
# qualifies). Completes the from-scratch proof of the whole
# wishart_small gs_energies.txt set (N<=32 runs on CPU in parallel).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1800 ]; then echo "DEADLINE: skip exact verify n28-40"; exit 0; fi
budget=$(( rem - 900 )); [ "$budget" -gt 10800 ] && budget=10800
timeout $(( budget + 300 )) python scripts/run_exact_verify_tpu.py \
  --min-n 28 --max-n 40 --budget-s "$budget" \
  || echo "exact verify n34-40 failed/timed out"
echo "EXACT VERIFY N34-40 DONE"

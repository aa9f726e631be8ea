#!/bin/bash
# NMC-arm round breakdown at DCL C16 scale: isolate the LBP+cluster
# share (the NMC analogue of the Houdayer bottleneck the matmul planes
# fixed for ICM). Round-4 planning data.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 900 ]; then echo "DEADLINE: skip nmc breakdown"; exit 0; fi
timeout 780 python scripts/profile_nmc_phases.py \
  --out results/nmc_phase_breakdown.json || echo "breakdown failed (continuing)"
echo "NMC PHASE BREAKDOWN DONE"

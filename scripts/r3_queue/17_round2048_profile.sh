#!/bin/bash
# Measured backing for the BENCHMARKS headroom claims: streamed round
# kernel vs XLA round at chimera2048 scale, on an idle chip.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
[ "$rem" -lt 1500 ] && { echo "DEADLINE: skip round2048 profile"; exit 0; }
timeout 1200 env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/profile_round2048.py || echo "profile failed (continuing)"
echo "ROUND2048 PROFILE DONE"

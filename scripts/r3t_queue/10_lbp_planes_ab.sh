#!/bin/bash
# Round-4 lead #0 closed on hardware: A/B the scatter-free slotted-edge
# LBP (lbp_mode="planes", ops/lbp_planes.py) against the segment-sum
# path inside the full EnsembleNMC round at DCL C16 scale, plus the
# lbp_every isolation arms. ~4 compiles + 6 timed runs per config;
# forced scalar-fetch timing (timing-correction discipline).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 4800 ]; then echo "DEADLINE: skip lbp planes A/B"; exit 0; fi
timeout 1500 python scripts/profile_nmc_phases.py || echo "planes A/B failed/cut"
echo "LBP PLANES AB DONE"

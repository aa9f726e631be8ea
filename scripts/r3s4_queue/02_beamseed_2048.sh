#!/bin/bash
# Beam-seeded ICM on chimera2048's 32 uncovered beam misses (states
# saved for all 41 swept instances; miss residual median 0.03%). The
# same composition converted 55/64 of chimera1152's beam misses in one
# program. --skip-covered drops anything another tier already hit.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip beamseed 2048"; exit 0; fi
t=9000; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/run_beam_seeded_icm.py --family chimera2048 \
  --sweeps 3000000 --skip-covered || echo "beamseed 2048 failed/cut"
echo "BEAMSEED 2048 DONE"

#!/bin/bash
# Beam-seeded ICM on chimera2048's accumulated beam misses (states for
# every swept instance; residuals median 0.03%). On the common 10
# instances beam and plain deep ICM were disjoint (any-tier 4/10);
# seeding starts the cold chains inside the beam basin.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip beamseed 2048"; exit 0; fi
t=9000; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/run_beam_seeded_icm.py --family chimera2048 \
  --sweeps 3000000 || echo "beamseed 2048 failed/cut"
echo "BEAMSEED 2048 DONE"

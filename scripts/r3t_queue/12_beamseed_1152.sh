#!/bin/bash
# Beam-seeded ICM over chimera1152's 64 beam misses (states saved for
# every instance; miss residuals median 0.016%): the chimera512
# evidence says beam and ICM misses are complementary, and seeding the
# coldest chains from the beam basin converts instances plain ICM
# misses. This is the family's any-tier closure lever (48/100 now).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip beamseed 1152"; exit 0; fi
t=11400; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/run_beam_seeded_icm.py --family chimera1152 \
  --sweeps 5000000 || echo "beamseed 1152 failed/cut"
echo "BEAMSEED 1152 DONE"

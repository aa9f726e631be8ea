#!/bin/bash
# Retry of the LBP-planes hardware A/B: the first attempt VMEM-OOMed in
# the streamed round kernel at dcl16 scale (20.9M scoped vs 16M limit)
# because the profile script didn't set the compile-routing cap the
# production big-n runs use. NMC_TPU_ROUND_VMEM_CAP=6000000 steers the
# kernel to VMEM-fitting streamed tiles (same knob as the chimera1152/
# 2048 campaigns).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 2400 ]; then echo "DEADLINE: skip lbp planes retry"; exit 0; fi
timeout 1800 env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/profile_nmc_phases.py || echo "planes A/B retry failed/cut"
echo "LBP PLANES AB RETRY DONE"

#!/bin/bash
# LBP-planes hardware A/B retry (first attempt VMEM-OOMed at dcl16
# scale without the compile-routing cap the production big-n runs use).
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 2400 ]; then echo "DEADLINE: skip lbp planes retry"; exit 0; fi
timeout 1800 env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/profile_nmc_phases.py || echo "planes A/B retry failed/cut"
echo "LBP PLANES AB DONE"

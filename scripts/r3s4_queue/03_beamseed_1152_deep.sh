#!/bin/bash
# chimera1152 closure attempt: the 7 instances no tier has hit
# (001,015,037,041,058,069,092) all have saved beam states. The 5M
# seed-0 seeded run converted 55/64; this is the deep retry — 10M
# sweeps, seed 1, more seeded chains — on just the leftovers.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 3000 ]; then echo "DEADLINE: skip beamseed 1152 deep"; exit 0; fi
t=9000; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python scripts/run_beam_seeded_icm.py --family chimera1152 \
  --sweeps 10000000 --seed 1 --init-chains 12 --skip-covered \
  --out results/campaign/chimera1152_icm_beamseed_10000k_s1.jsonl \
  || echo "beamseed 1152 deep failed/cut"
echo "BEAMSEED 1152 DEEP DONE"

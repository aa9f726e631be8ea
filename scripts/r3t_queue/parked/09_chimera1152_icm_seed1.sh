#!/bin/bash
# chimera1152 ICM @10M, seed 1 (seed-0: 16/20; the 4 misses sit close).
# Any-seed composition targets 19-20/20. Same VMEM-cap routing to the
# streamed round kernel as the seed-0 run.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1800 ]; then echo "DEADLINE: skip chimera1152 seed1"; exit 0; fi
t=14400; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" env NMC_TPU_ROUND_VMEM_CAP=6000000 \
  python -m nmc_tpu campaign --family chimera1152 --instances 20 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm icm --subreplicas 2 --seed 1 --trace \
  --sweeps 20000000 --out results/campaign/chimera1152_icm_20M_seed1.jsonl \
  || echo "run failed/cut (continuing)"
echo "CHIMERA1152 ICM SEED1 DONE"

#!/bin/bash
# Second chimera2048 ICM @10M with a fresh RNG stream (seed 1). The
# seed-0 run got 1/10 with several instances at raw residual ~0.03-0.16
# (one excitation away); the chimera512 hybrid result (9/20 vs ICM's
# 19/20 at matched budget) says a hybrid-2048 run would be low-value, so
# this slot goes to more ICM attempts instead. Any-seed hits compose:
# report instances solved across seeds.
set -x
cd /root/repo
OUT=results/campaign

rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip chimera2048 seed1"; exit 0; fi
t=9000; [ "$rem" -lt "$t" ] && t=$rem

timeout "$t" python -m nmc_tpu campaign --family chimera2048 --instances 10 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm icm --subreplicas 2 --seed 1 --trace \
  --sweeps 10000000 --out $OUT/chimera2048_icm_10M_seed1.jsonl \
  || echo "run failed/cut (continuing)"

echo "CHIMERA2048 ICM SEED1 DONE"

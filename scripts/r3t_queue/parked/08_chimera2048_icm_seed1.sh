#!/bin/bash
# Second chimera2048 ICM @10M with a fresh RNG stream (seed 1). Seed-0
# got 1/10 with several instances one excitation away (raw residual
# 0.03-0.16); any-seed hits compose. 20M budget (STATUS round-4 lead #4:
# residuals at 10M still decaying); chunked snapshots stream, so a
# deadline cut still yields everything a 10M run would.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 1800 ]; then echo "DEADLINE: skip chimera2048 seed1"; exit 0; fi
t=12600; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" python -m nmc_tpu campaign --family chimera2048 --instances 10 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm icm --subreplicas 2 --seed 1 --trace \
  --sweeps 20000000 --out results/campaign/chimera2048_icm_20M_seed1.jsonl \
  || echo "run failed/cut (continuing)"
echo "CHIMERA2048 ICM SEED1 DONE"

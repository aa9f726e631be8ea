#!/bin/bash
# The missing dcl16 arm: ICM at the matched 1.6M budget (NMC 9/10,
# PT 9/10, hybrid 9/10 already recorded). Completes the DCL C16 table.
set -x
cd /root/repo
rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 900 ]; then echo "DEADLINE: skip dcl16 icm"; exit 0; fi
t=3600; [ "$rem" -lt "$t" ] && t=$((rem - 660))
timeout "$t" python -m nmc_tpu campaign --family dcl16 --instances 10 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm icm --subreplicas 2 \
  --sweeps 1600000 --out results/campaign/dcl16_icm_1600k.jsonl \
  || echo "run failed/cut (continuing)"
echo "DCL16 ICM DONE"

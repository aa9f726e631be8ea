#!/bin/bash
# chimera2048 hybrid arm at the round-2 matched 1.6M budget: ICM got
# 0/10 there (residuals 0.19-0.34%) and 1/10 at 10M; does the
# disagreement-seeded NMC heating (hybrid) move the needle at the
# matched budget on the marquee family?
set -x
cd /root/repo
OUT=results/campaign

rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip chimera2048 hybrid"; exit 0; fi
t=7200; [ "$rem" -lt "$t" ] && t=$rem

timeout "$t" python -m nmc_tpu campaign --family chimera2048 --instances 10 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm hybrid --subreplicas 2 --nmc-cold 6 --temp-x 20 --trace \
  --sweeps 1600000 --out $OUT/chimera2048_hybrid_1600k.jsonl \
  || echo "run failed/cut (continuing)"

echo "CHIMERA2048 HYBRID DONE"

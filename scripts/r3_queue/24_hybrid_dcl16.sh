#!/bin/bash
# Tail item (REPLANNED): dcl16 hybrid at the round-2 matched 1.6M budget.
# Original plan was chimera1152 hybrid, but the chimera512 result
# (hybrid 9/20 vs ICM 19/20 at matched budget) showed hybrid loses on
# chimera droplets, while on DCL C8 it HALVED sweeps-to-solution
# (14.4k vs 28.8k median). dcl16 is the open DCL case: NMC and PT both
# sit at 9/10 — the hybrid arm's disagreement-seeded heated cycles get
# a shot at the 10th instance.
set -x
cd /root/repo
OUT=results/campaign

rem=$(( ${DEADLINE:-9999999999} - $(date +%s) ))
if [ "$rem" -lt 600 ]; then echo "DEADLINE: skip hybrid dcl16"; exit 0; fi
t=5400; [ "$rem" -lt "$t" ] && t=$rem

timeout "$t" python -m nmc_tpu campaign --family dcl16 --instances 10 \
  --replicas 32 --beta-max 32 --chunk-rounds 25 \
  --arm hybrid --subreplicas 2 --nmc-cold 6 --temp-x 20 --trace \
  --sweeps 1600000 --out $OUT/dcl16_hybrid_1600k.jsonl \
  || echo "run failed/cut (continuing)"

echo "HYBRID DCL16 DONE"

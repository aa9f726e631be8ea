#!/bin/bash
# Round-2 campaign phase 9: chimera512 at the reference's FULL shipped
# scale — all 100 instances with exact tensor-network ground truths,
# solved per arm in ONE batched SPMD program. (Round-1 verdict: "solution
# -quality evaluation samples 5-20 instances where the reference ships
# 100" — this is the 100.)
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

C512="--family chimera512 --instances 100 --replicas 32 --beta-max 32 --chunk-rounds 50"

timeout 10800 python -m nmc_tpu campaign $C512 --arm icm --subreplicas 2 --sweeps 3200000 \
  --out $OUT/chimera512_icm_all100.jsonl
timeout 10800 python -m nmc_tpu campaign $C512 --arm pt --sweeps 3200000 \
  --out $OUT/chimera512_pt_all100.jsonl
timeout 10800 python -m nmc_tpu campaign $C512 --arm nmc --nmc-cold 6 --lbp-every 1 \
  --global-beta 3 --threshold-initial 0.9999 --threshold-cutoff 0.999 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_all100.jsonl

echo PHASE9_DONE

#!/bin/bash
# Round-2 campaign phase 5b: chimera1152 retry with chunk_rounds=10.
# The phase-5 runs (chunk 25, 20-instance grid, dense round kernel at
# n_pad=1152) crashed the axon remote-compile helper (HTTP 500, program
# size); a 1-instance chunk-5 probe compiles and runs fine.
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

C1152="--family chimera1152 --instances 20 --replicas 32 --beta-max 32 --chunk-rounds 10"
timeout 7200 python -m nmc_tpu campaign $C1152 --arm pt --sweeps 1600000 \
  --out $OUT/chimera1152_pt_1600k.jsonl
timeout 7200 python -m nmc_tpu campaign $C1152 --arm icm --subreplicas 2 --sweeps 1600000 \
  --out $OUT/chimera1152_icm_1600k.jsonl
timeout 7200 python -m nmc_tpu campaign $C1152 --arm nmc --nmc-cold 6 --lbp-every 1 --sweeps 1600000 \
  --out $OUT/chimera1152_nmc_1600k.jsonl

echo PHASE5B_DONE

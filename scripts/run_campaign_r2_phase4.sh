#!/bin/bash
# Round-2 campaign phase 4: NMC-arm diagnostics on chimera512.
# (a) fully-fresh backbones (LBP every round, the reference's per-cycle
#     policy is even fresher but each round here is only 3 cycles);
# (b) R=64 with a denser cold ladder for BOTH arms (MXU rows are cheap).
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

C512="--family chimera512 --instances 20 --chunk-rounds 50"

timeout 7200 python -m nmc_tpu campaign $C512 --replicas 32 --beta-max 32 \
  --arm nmc --nmc-cold 6 --lbp-every 1 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_lbp1_3200k.jsonl

timeout 7200 python -m nmc_tpu campaign $C512 --replicas 64 --beta-max 32 \
  --arm pt --sweeps 3200000 \
  --out $OUT/chimera512_pt_r64b32_3200k.jsonl
timeout 7200 python -m nmc_tpu campaign $C512 --replicas 64 --beta-max 32 \
  --arm nmc --nmc-cold 8 --lbp-every 4 --sweeps 3200000 \
  --out $OUT/chimera512_nmc_r64b32_3200k.jsonl

echo PHASE4_DONE

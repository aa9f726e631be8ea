#!/bin/bash
# Round-2 campaign phase 2: the 2048-spin families (streamed round kernel)
# + ICM arm for dcl8. Resumable like phase 1.
set -x
cd /root/repo
OUT=results/campaign
mkdir -p $OUT

NMC="--nmc-cold 6 --lbp-every 4"

# chimera2048 @1.6M sweeps, 10 instances (streamed whole-round kernel)
C2048="--family chimera2048 --instances 10 --replicas 32 --beta-max 32 --chunk-rounds 25"
timeout 7200 python -m nmc_tpu campaign $C2048 --arm pt  --sweeps 1600000 \
  --out $OUT/chimera2048_pt_1600k.jsonl
timeout 7200 python -m nmc_tpu campaign $C2048 --arm nmc $NMC --sweeps 1600000 \
  --out $OUT/chimera2048_nmc_1600k.jsonl

# DCL C16 @1.6M, 10 instances
DCL16="--family dcl16 --instances 10 --replicas 32 --beta-max 32 --chunk-rounds 25"
timeout 7200 python -m nmc_tpu campaign $DCL16 --arm pt  --sweeps 1600000 \
  --out $OUT/dcl16_pt_1600k.jsonl
timeout 7200 python -m nmc_tpu campaign $DCL16 --arm nmc $NMC --sweeps 1600000 \
  --out $OUT/dcl16_nmc_1600k.jsonl

# ICM baselines for the DCL families
timeout 7200 python -m nmc_tpu campaign --family dcl8 --instances 20 \
  --replicas 32 --beta-max 32 --chunk-rounds 50 --arm icm --subreplicas 2 \
  --sweeps 3200000 --out $OUT/dcl8_icm_3200k.jsonl

echo PHASE2_DONE
